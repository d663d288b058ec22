"""CNN encoders for the monodepth side-car (flax, NHWC).

Capability parity with the reference's encoder zoo
(``wavelet/networks/encoders/``):

- :class:`DenseEncoder` — DenseNet (default 161: growth 48, init 96,
  blocks (6,12,36,24)) with feature taps after relu0 (/2), pool0 (/4),
  transition1 (/8), transition2 (/16) and denseblock4 (/32) — channel counts
  [96, 96, 192, 384, 2208], the first tap being the 96-channel VDN feature
  map exported by predict (reference densenet_encoder.py:26-33,
  predict.py:190-201).
- :class:`ResnetEncoder` — ResNet-18/34/50 tap stack
  (resnet_encoder.py:17-106).
- :class:`MobileNetV2Encoder` — inverted-residual tap stack
  (mobilenetv2_encoder.py:12-181).

Note on input normalization: the reference's per-channel ImageNet
normalization loop iterates over the *batch* dimension (a bug:
densenet_encoder.py:27-29) and is disabled by default in the VDN pipeline
(predict.py's ``--normalize_input`` defaults False). Here normalization is
implemented correctly per channel and gated by the same flag.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

DENSENET_CONFIGS = {
    121: dict(growth=32, init_features=64, blocks=(6, 12, 24, 16)),
    161: dict(growth=48, init_features=96, blocks=(6, 12, 36, 24)),
    169: dict(growth=32, init_features=64, blocks=(6, 12, 32, 32)),
    201: dict(growth=32, init_features=64, blocks=(6, 12, 48, 32)),
}


def normalize_imagenet(x: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


class DenseLayer(nn.Module):
    growth: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(use_running_average=not train)(x)
        h = nn.relu(h)
        h = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False)(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseBlock(nn.Module):
    n_layers: int
    growth: int

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(self.n_layers):
            x = DenseLayer(self.growth)(x, train)
        return x


class Transition(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False)(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class DenseEncoder(nn.Module):
    """DenseNet trunk with the 5 monodepth feature taps (NHWC)."""

    num_layers: int = 161
    normalize_input: bool = False

    @property
    def num_ch_enc(self) -> list[int]:
        cfg = DENSENET_CONFIGS[self.num_layers]
        ch = cfg["init_features"]
        out = [ch, ch]
        for i, n in enumerate(cfg["blocks"][:-1]):
            ch = (ch + n * cfg["growth"]) // 2
            if i < 2:
                out.append(ch)
        out.append(ch + cfg["blocks"][-1] * cfg["growth"])
        return out

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = DENSENET_CONFIGS[self.num_layers]
        if self.normalize_input:
            x = normalize_imagenet(x)

        taps = []
        # stem
        x = nn.Conv(
            cfg["init_features"], (7, 7), strides=(2, 2), padding=3,
            use_bias=False, name="conv0",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="norm0")(x)
        x = nn.relu(x)
        taps.append(x)  # relu0: [N, H/2, W/2, 96] — the VDN feature map
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        taps.append(x)  # pool0: /4

        ch = cfg["init_features"]
        for i, n_layers in enumerate(cfg["blocks"]):
            x = DenseBlock(n_layers, cfg["growth"], name=f"denseblock{i+1}")(
                x, train
            )
            ch += n_layers * cfg["growth"]
            if i < len(cfg["blocks"]) - 1:
                ch = ch // 2
                x = Transition(ch, name=f"transition{i+1}")(x, train)
                if i < 2:
                    taps.append(x)  # transition1 /8, transition2 /16
        taps.append(x)  # denseblock4 output (pre-norm5): /32
        return tuple(taps)


class BasicResBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        h = nn.Conv(self.channels, (3, 3), strides=self.stride, padding=1,
                    use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(self.channels, (1, 1), strides=self.stride,
                               use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not train)(identity)
        return nn.relu(h + identity)


class BottleneckResBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        h = nn.Conv(self.channels, (1, 1), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), strides=self.stride, padding=1,
                    use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels * 4, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.stride != 1 or x.shape[-1] != self.channels * 4:
            identity = nn.Conv(self.channels * 4, (1, 1), strides=self.stride,
                               use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not train)(identity)
        return nn.relu(h + identity)


RESNET_CONFIGS = {
    18: (BasicResBlock, (2, 2, 2, 2), 1),
    34: (BasicResBlock, (3, 4, 6, 3), 1),
    50: (BottleneckResBlock, (3, 4, 6, 3), 4),
}


class ResnetEncoder(nn.Module):
    """ResNet tap stack (reference resnet_encoder.py:17-106)."""

    num_layers: int = 18
    normalize_input: bool = False
    num_input_images: int = 1

    @property
    def num_ch_enc(self) -> list[int]:
        _, _, exp = RESNET_CONFIGS[self.num_layers]
        return [64, 64 * exp, 128 * exp, 256 * exp, 512 * exp]

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers, _ = RESNET_CONFIGS[self.num_layers]
        if self.normalize_input:
            x = normalize_imagenet(x)
        taps = []
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        taps.append(x)  # /2
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for i, (n, ch) in enumerate(zip(layers, (64, 128, 256, 512))):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block(ch, stride)(x, train)
            taps.append(x)
        return tuple(taps)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.relu6(h)
        h = nn.Conv(
            hidden, (3, 3), strides=self.stride, padding=1,
            feature_group_count=hidden, use_bias=False,
        )(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu6(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.stride == 1 and in_ch == self.out_channels:
            h = h + x
        return h


class MobileNetV2Encoder(nn.Module):
    """MobileNetV2 tap stack (reference mobilenetv2_encoder.py:12-181)."""

    normalize_input: bool = False
    use_last_layer: bool = True

    @property
    def num_ch_enc(self) -> list[int]:
        return [32, 24, 32, 64, 1280 if self.use_last_layer else 160]

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.normalize_input:
            x = normalize_imagenet(x)
        cfg = [  # t, c, n, s — the standard MNv2 schedule
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        taps = []
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu6(x)
        taps.append(x)  # /2: 32
        for t, c, n, s in cfg:
            for j in range(n):
                x = InvertedResidual(c, s if j == 0 else 1, t)(x, train)
            if c in (24, 32, 64):
                taps.append(x)
        if self.use_last_layer:
            x = nn.Conv(1280, (1, 1), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu6(x)
        taps.append(x)
        return tuple(taps[:5])
