"""Numeric DenseNet-161 oracle: flax encoder vs a plain-torch rebuild of the
torchvision graph, with transplanted weights.

The 96-channel `features[0]` tap is THE exported VDN feature (reference
densenet_encoder.py:26-33, predict.py:190-193) — the paper's entire
view-dependence-normalization signal. torchvision itself is absent from this
environment, so the oracle defines torchvision's densenet161 graph in plain
torch (identical module topology AND state_dict key naming:
features.conv0 / norm0 / denseblockN.denselayerM.{norm1,conv1,norm2,conv2} /
transitionN.{norm,conv}), randomizes weights + BatchNorm running stats,
converts the state_dict through ``import_torchvision_densenet``, and asserts
all five taps agree to fp32 tolerance.
"""

import collections

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn


def _dense_layer(in_ch: int, growth: int, bn_size: int = 4) -> nn.Module:
    layer = nn.Module()
    layer.norm1 = nn.BatchNorm2d(in_ch)
    layer.relu1 = nn.ReLU(inplace=False)
    layer.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
    layer.norm2 = nn.BatchNorm2d(bn_size * growth)
    layer.relu2 = nn.ReLU(inplace=False)
    layer.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(x):
        h = layer.conv1(layer.relu1(layer.norm1(x)))
        h = layer.conv2(layer.relu2(layer.norm2(h)))
        return torch.cat([x, h], dim=1)

    layer.forward = forward
    return layer


def _dense_block(n_layers: int, in_ch: int, growth: int) -> nn.Module:
    block = nn.Module()
    for i in range(n_layers):
        block.add_module(
            f"denselayer{i+1}", _dense_layer(in_ch + i * growth, growth)
        )
    def forward(x):
        for child in block.children():
            x = child(x)
        return x

    block.forward = forward
    return block


def _transition(in_ch: int, out_ch: int) -> nn.Module:
    t = nn.Module()
    t.norm = nn.BatchNorm2d(in_ch)
    t.relu = nn.ReLU(inplace=False)
    t.conv = nn.Conv2d(in_ch, out_ch, 1, bias=False)
    t.pool = nn.AvgPool2d(2, stride=2)
    t.forward = lambda x: t.pool(t.conv(t.relu(t.norm(x))))
    return t


def torchvision_densenet161_features() -> nn.Module:
    """The torchvision densenet-161 `features` trunk, bit-for-bit topology."""
    growth, init_features, blocks = 48, 96, (6, 12, 36, 24)
    mods = collections.OrderedDict()
    mods["conv0"] = nn.Conv2d(3, init_features, 7, stride=2, padding=3,
                              bias=False)
    mods["norm0"] = nn.BatchNorm2d(init_features)
    mods["relu0"] = nn.ReLU(inplace=False)
    mods["pool0"] = nn.MaxPool2d(3, stride=2, padding=1)
    ch = init_features
    for i, n in enumerate(blocks):
        mods[f"denseblock{i+1}"] = _dense_block(n, ch, growth)
        ch += n * growth
        if i < len(blocks) - 1:
            mods[f"transition{i+1}"] = _transition(ch, ch // 2)
            ch //= 2
    features = nn.Sequential(mods)
    model = nn.Module()
    model.features = features
    return model


def _randomize(model: nn.Module, seed: int = 0) -> None:
    """Random weights AND nontrivial BatchNorm running statistics."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.normal_(0, 0.05, generator=gen)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.normal_(0, 0.1, generator=gen)
                m.running_mean.normal_(0, 0.1, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)


@pytest.mark.slow
def test_densenet161_tap_parity():
    import jax.numpy as jnp

    from vdnerf_tpu.wavelet.encoders import DenseEncoder
    from vdnerf_tpu.wavelet.io import import_torchvision_densenet

    t_model = torchvision_densenet161_features()
    _randomize(t_model)
    t_model.eval()

    variables = import_torchvision_densenet(t_model.state_dict(), 161)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)

    enc = DenseEncoder(num_layers=161, normalize_input=False)
    taps = enc.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )

    # torch side: taps at features[3], [4], [6], [8], [11]
    # (reference densenet_encoder.py:33)
    with torch.no_grad():
        feats = [torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))]
        for _, mod in t_model.features._modules.items():
            feats.append(mod(feats[-1]))
    t_taps = [feats[3], feats[4], feats[6], feats[8], feats[11]]

    expected = [(96, 32), (96, 16), (192, 8), (384, 4), (2208, 2)]
    for i, (ours, theirs) in enumerate(zip(taps, t_taps)):
        ours_np = np.asarray(ours)
        theirs_np = np.transpose(theirs.numpy(), (0, 2, 3, 1))
        assert ours_np.shape == theirs_np.shape, f"tap {i} shape"
        assert ours_np.shape[-1] == expected[i][0], f"tap {i} channels"
        assert ours_np.shape[1] == expected[i][1], f"tap {i} stride"
        scale = max(np.abs(theirs_np).max(), 1e-6)
        np.testing.assert_allclose(
            ours_np / scale, theirs_np / scale, atol=2e-5,
            err_msg=f"tap {i} numeric mismatch",
        )
