"""Compound analytic scene generator (data/synthetic.py) — both backgrounds.

The textured variant is the womsk flagship-run setting: 3-channel images
with a view-consistent procedural backdrop, dummy all-white training masks
(so the reference's img*mask + (1-mask) composite is the identity), and the
true object masks under eval_mask/ for metrics only.
"""

from __future__ import annotations

import os

import cv2 as cv
import numpy as np

from vdnerf_tpu.data.synthetic import (
    backdrop_texture,
    compound_sdf,
    make_compound_scene,
)


def test_white_scene_layout(tmp_path):
    out = str(tmp_path / "white")
    make_compound_scene(out, n_images=2, H=48, W=48, background="white")
    img = cv.imread(os.path.join(out, "image", "000.png"), -1)
    assert img.shape == (48, 48, 4)  # RGBA: alpha is the object mask
    a = img[..., 3]
    assert set(np.unique(a)) <= {0, 255}
    assert 0.05 < (a > 127).mean() < 0.95
    # background pixels are pure white
    assert (img[..., :3][a == 0] == 255).all()


def test_textured_scene_layout(tmp_path):
    out = str(tmp_path / "tex")
    make_compound_scene(out, n_images=2, H=48, W=48, background="textured")
    img = cv.imread(os.path.join(out, "image", "000.png"), -1)
    assert img.shape == (48, 48, 3)  # womsk data: no alpha channel
    mask = cv.imread(os.path.join(out, "image", "mask", "000.png"), 0)
    assert (mask == 255).all()  # dummy mask -> composite is identity
    ev = cv.imread(os.path.join(out, "image", "eval_mask", "000.png"), 0)
    assert 0.05 < (ev > 127).mean() < 0.95
    # backdrop pixels carry real texture (not constant, not white)
    bg = img[ev == 0]
    assert bg.std() > 10
    assert not (bg == 255).all()
    # cameras npz at both conventional locations
    assert os.path.exists(os.path.join(out, "image", "cameras_sphere.npz"))
    assert os.path.exists(os.path.join(out, "cameras_sphere.npz"))


def test_backdrop_texture_view_consistent():
    """Texture is a function of the 3-D point only (view consistency)."""
    pts = np.random.default_rng(0).normal(size=(64, 3)) * 4.0
    a = backdrop_texture(pts)
    b = backdrop_texture(pts.copy())
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 3)
    assert (a >= 0).all() and (a <= 1).all()


def test_camlight_shading_is_view_dependent():
    """'camlight' must change a surface point's radiance with the camera
    (the shape-radiance-ambiguity setting the VDN paper targets), while
    'fixed' keeps it view-consistent."""
    from vdnerf_tpu.data.synthetic import (
        _compound_normal,
        _sphere_trace,
        look_at_pose,
        render_compound_image,
    )

    H = W = 64
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 1.4 * W
    K[0, 2] = W / 2.0
    K[1, 2] = H / 2.0

    # a visible surface point: trace the center ray from camera A
    eye_a = 2.2 * np.array([1.0, 0.0, 0.15])
    eye_b = 2.2 * np.array([np.cos(0.8), np.sin(0.8), 0.15])
    c2w_a = look_at_pose(eye_a, np.zeros(3)).astype(np.float64)
    c2w_b = look_at_pose(eye_b, np.zeros(3)).astype(np.float64)
    d = c2w_a[:3, 2] / np.linalg.norm(c2w_a[:3, 2])
    t, hit = _sphere_trace(eye_a[None], d[None], 1.0, 3.5)
    assert hit[0]
    pt = eye_a + d * t[0]

    def color_at(c2w, shading):
        # project pt into this camera and read the rendered pixel
        w2c = np.linalg.inv(c2w)
        pc = (w2c[:3, :3] @ pt + w2c[:3, 3])
        uv = (K[:3, :3] @ pc)
        px, py = int(uv[0] / uv[2]), int(uv[1] / uv[2])
        img = render_compound_image(c2w, K, H, W, background="white",
                                    shading=shading)
        assert img[py, px, 3] == 255, "point not visible/object there"
        return img[py, px, :3].astype(np.float64)

    # the point must be visible from both cameras (chosen on the +x bulge)
    fixed_diff = np.abs(
        color_at(c2w_a, "fixed") - color_at(c2w_b, "fixed")
    ).max()
    cam_diff = np.abs(
        color_at(c2w_a, "camlight") - color_at(c2w_b, "camlight")
    ).max()
    assert fixed_diff <= 25, fixed_diff  # pixel-grid tolerance
    assert cam_diff > fixed_diff + 25, (fixed_diff, cam_diff)

    # 'glossy' (fixed light + sharp Blinn-Phong lobe): highlights slide
    # across the surface with the camera, so SOME visible point must change
    # radiance strongly between views even though the light is static
    # (VERDICT r4 stretch #8 — the third view-dependence axis)
    from vdnerf_tpu.data.synthetic import render_compound_image as _rci

    img_a = _rci(c2w_a, K, H, W, background="white", shading="glossy")
    img_b = _rci(c2w_b, K, H, W, background="white", shading="glossy")
    glossy_pt_diff = np.abs(
        color_at(c2w_a, "glossy") - color_at(c2w_b, "glossy")
    ).max()
    # at least one of: the probed point's radiance moved, or the global
    # highlight structure differs far beyond the fixed-shading baseline
    hit_both = (img_a[..., 3] == 255) & (img_b[..., 3] == 255)
    assert glossy_pt_diff > 10 or (
        np.abs(img_a[..., :3].astype(float)
               - img_b[..., :3].astype(float))[hit_both].max() > 80
    ), glossy_pt_diff
    # and the specular term actually produces near-saturated highlights
    assert (img_a[..., :3][img_a[..., 3] == 255].max() > 240)


def test_compound_sdf_is_metric():
    """|sdf| is a lower bound on the distance to the zero set; gradient has
    unit norm away from the medial axis (spot check)."""
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(200, 3)) * 0.6
    eps = 1e-5
    for ax in range(3):
        d = np.zeros(3)
        d[ax] = eps
        g = (compound_sdf(pts + d) - compound_sdf(pts - d)) / (2 * eps)
        assert np.abs(g).max() <= 1.0 + 1e-3


def test_arch_sdf_is_exact_union_metric():
    """The arch SDF (second geometry family) is an exact-union metric:
    unit-norm gradient outside the surface and a jnp twin that matches the
    numpy source of truth (the Chamfer GT and the scene renderer share
    these by construction)."""
    import jax.numpy as jnp

    from vdnerf_tpu.data.synthetic import GEOMETRIES, arch_sdf, arch_sdf_jnp

    assert GEOMETRIES["arch"] == (arch_sdf, arch_sdf_jnp)
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(300, 3)) * 0.6
    eps = 1e-5
    for ax in range(3):
        d = np.zeros(3)
        d[ax] = eps
        g = (arch_sdf(pts + d) - arch_sdf(pts - d)) / (2 * eps)
        assert np.abs(g).max() <= 1.0 + 1e-3
    np.testing.assert_allclose(
        np.asarray(arch_sdf_jnp(jnp.asarray(pts))), arch_sdf(pts),
        atol=1e-6,
    )
    # the whole zero set stays inside the unit sphere (scene convention)
    on = pts[np.abs(arch_sdf(pts)) < 0.05]
    assert len(on) and np.linalg.norm(on, axis=-1).max() < 1.0


def test_arch_scene_layout_and_opening(tmp_path):
    """geometry='arch' writes the same on-disk layout, and the arch's
    see-through opening is visible: from a side-on camera there are
    background pixels INSIDE the object silhouette's bbox (the compound
    blob has no such hole at this view)."""
    from vdnerf_tpu.data.synthetic import look_at_pose, render_compound_image

    out = str(tmp_path / "arch")
    make_compound_scene(out, n_images=2, H=48, W=48, background="textured",
                        geometry="arch")
    img = cv.imread(os.path.join(out, "image", "000.png"), -1)
    assert img.shape == (48, 48, 3)
    ev = cv.imread(os.path.join(out, "image", "eval_mask", "000.png"), 0)
    assert 0.05 < (ev > 127).mean() < 0.95

    # side-on view (y axis ~ the arch plane normal): the under-beam window
    H = W = 96
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 1.4 * W
    K[0, 2] = W / 2.0
    K[1, 2] = H / 2.0
    c2w = look_at_pose(np.array([0.0, 2.2, 0.0]), np.zeros(3))
    rgba = render_compound_image(c2w, K, H, W, geometry="arch")
    m = rgba[..., 3] > 127
    ys, xs = np.nonzero(m)
    inner = ~m[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
    assert inner.mean() > 0.05, "no opening visible in the silhouette bbox"
