// Marching-tetrahedra isosurface extraction.
//
// Native replacement for the reference's PyMCubes dependency
// (reference renderer.py:6,36): extracts the iso-surface of a dense scalar
// field sampled on a regular grid. Each cell is split into 6 tetrahedra
// sharing the main diagonal; each tetrahedron contributes 0-2 triangles via
// linear interpolation along its edges. Vertices are deduplicated with an
// edge-keyed hash map so shared edges produce shared vertices (watertight
// within the grid interior, like PyMCubes' output).
//
// Vertex coordinates are in grid-index space (0..n-1 per axis), matching the
// PyMCubes convention the reference rescales from (renderer.py:40).
//
// C API (ctypes-friendly):
//   long long mt_run(const float* field, long nx, long ny, long nz,
//                    float iso, float** out_verts, long long** out_tris,
//                    long long* n_verts, long long* n_tris);
//   void mt_free(void* p);

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

// 6-tetrahedra decomposition of a cube. Cube corners indexed 0-7 as
// (dx, dy, dz) bits: corner = dx*4 + dy*2 + dz. All tets share the main
// diagonal 0-7, guaranteeing consistent faces between neighboring cells.
constexpr int kTets[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
};

constexpr int kCornerOff[8][3] = {
    {0, 0, 0}, {0, 0, 1}, {0, 1, 0}, {0, 1, 1},
    {1, 0, 0}, {1, 0, 1}, {1, 1, 0}, {1, 1, 1},
};

struct PairHash {
  size_t operator()(const std::pair<int64_t, int64_t>& p) const {
    return std::hash<int64_t>()(p.first * 0x9E3779B97F4A7C15LL + p.second);
  }
};

class Extractor {
 public:
  Extractor(const float* field, int64_t nx, int64_t ny, int64_t nz, float iso)
      : f_(field), nx_(nx), ny_(ny), nz_(nz), iso_(iso) {}

  inline float sample(int64_t x, int64_t y, int64_t z) const {
    return f_[(x * ny_ + y) * nz_ + z];
  }

  inline int64_t corner_id(int64_t x, int64_t y, int64_t z) const {
    return (x * ny_ + y) * nz_ + z;
  }

  // vertex on the edge between two grid corners, deduplicated
  int64_t edge_vertex(int64_t ca, int64_t cb, const V3& pa, const V3& pb,
                      float va, float vb) {
    auto key = ca < cb ? std::make_pair(ca, cb) : std::make_pair(cb, ca);
    auto it = edge_map_.find(key);
    if (it != edge_map_.end()) return it->second;
    float denom = vb - va;
    float t = denom != 0.0f ? (iso_ - va) / denom : 0.5f;
    if (t < 0.0f) t = 0.0f;
    if (t > 1.0f) t = 1.0f;
    V3 p{pa.x + t * (pb.x - pa.x), pa.y + t * (pb.y - pa.y),
         pa.z + t * (pb.z - pa.z)};
    int64_t id = static_cast<int64_t>(verts_.size());
    verts_.push_back(p);
    edge_map_.emplace(key, id);
    return id;
  }

  void run() {
    int64_t cells = (nx_ - 1) * (ny_ - 1) * (nz_ - 1);
    verts_.reserve(static_cast<size_t>(cells / 8 + 64));
    tris_.reserve(static_cast<size_t>(cells / 4 + 64));

    for (int64_t x = 0; x + 1 < nx_; ++x) {
      for (int64_t y = 0; y + 1 < ny_; ++y) {
        for (int64_t z = 0; z + 1 < nz_; ++z) {
          float vals[8];
          V3 pos[8];
          int64_t ids[8];
          bool all_lo = true, all_hi = true;
          for (int c = 0; c < 8; ++c) {
            int64_t cx = x + kCornerOff[c][0];
            int64_t cy = y + kCornerOff[c][1];
            int64_t cz = z + kCornerOff[c][2];
            vals[c] = sample(cx, cy, cz);
            pos[c] = V3{static_cast<float>(cx), static_cast<float>(cy),
                        static_cast<float>(cz)};
            ids[c] = corner_id(cx, cy, cz);
            if (vals[c] > iso_) all_lo = false;
            if (vals[c] <= iso_) all_hi = false;
          }
          if (all_lo || all_hi) continue;  // no crossing in this cell
          for (const auto& tet : kTets) emit_tet(tet, vals, pos, ids);
        }
      }
    }
  }

  void emit_tet(const int t[4], const float vals[8], const V3 pos[8],
                const int64_t ids[8]) {
    // classify corners: bit set = above iso
    int code = 0;
    for (int i = 0; i < 4; ++i)
      if (vals[t[i]] > iso_) code |= 1 << i;
    if (code == 0 || code == 15) return;

    // indices of "inside" (above) and "outside" corners
    int in[4], out[4], ni = 0, no = 0;
    for (int i = 0; i < 4; ++i) {
      if (code & (1 << i)) in[ni++] = t[i];
      else out[no++] = t[i];
    }

    auto ev = [&](int a, int b) {
      return edge_vertex(ids[a], ids[b], pos[a], pos[b], vals[a], vals[b]);
    };

    if (ni == 1) {  // single triangle
      int64_t a = ev(in[0], out[0]);
      int64_t b = ev(in[0], out[1]);
      int64_t c = ev(in[0], out[2]);
      push_tri(a, b, c);
    } else if (ni == 3) {
      int64_t a = ev(out[0], in[0]);
      int64_t b = ev(out[0], in[1]);
      int64_t c = ev(out[0], in[2]);
      push_tri(a, c, b);
    } else {  // ni == 2: quad -> two triangles
      int64_t a = ev(in[0], out[0]);
      int64_t b = ev(in[0], out[1]);
      int64_t c = ev(in[1], out[1]);
      int64_t d = ev(in[1], out[0]);
      push_tri(a, b, c);
      push_tri(a, c, d);
    }
  }

  void push_tri(int64_t a, int64_t b, int64_t c) {
    if (a == b || b == c || a == c) return;  // degenerate
    tris_.push_back(a);
    tris_.push_back(b);
    tris_.push_back(c);
  }

  const float* f_;
  int64_t nx_, ny_, nz_;
  float iso_;
  std::vector<V3> verts_;
  std::vector<int64_t> tris_;
  std::unordered_map<std::pair<int64_t, int64_t>, int64_t, PairHash> edge_map_;
};

}  // namespace

extern "C" {

long long mt_run(const float* field, long long nx, long long ny, long long nz,
                 float iso, float** out_verts, long long** out_tris,
                 long long* n_verts, long long* n_tris) {
  if (!field || nx < 2 || ny < 2 || nz < 2) return -1;
  Extractor ex(field, nx, ny, nz, iso);
  ex.run();
  *n_verts = static_cast<long long>(ex.verts_.size());
  *n_tris = static_cast<long long>(ex.tris_.size() / 3);
  *out_verts = static_cast<float*>(std::malloc(ex.verts_.size() * 3 * sizeof(float)));
  *out_tris = static_cast<long long*>(
      std::malloc(ex.tris_.size() * sizeof(long long)));
  if (!*out_verts || !*out_tris) return -2;
  std::memcpy(*out_verts, ex.verts_.data(), ex.verts_.size() * 3 * sizeof(float));
  std::memcpy(*out_tris, ex.tris_.data(), ex.tris_.size() * sizeof(long long));
  return 0;
}

void mt_free(void* p) { std::free(p); }

}  // extern "C"
