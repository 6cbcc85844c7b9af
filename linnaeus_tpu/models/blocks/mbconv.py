"""MBConv block (EfficientNet-style inverted residual with SE), NHWC Flax.

Behavioral spec from the reference (models/blocks/mb_conv.py:131-300):
optional 1x1 expansion -> BN -> swish -> depthwise kxk (stride) -> BN ->
swish -> squeeze-excitation (ratio 0.25) -> 1x1 projection -> BN ->
drop-connect residual when shapes match. BN uses momentum 0.1 / eps 0.01
(reference constants). The reference's Conv2dStaticSamePadding becomes
Flax's "SAME" padding (identical for odd kernels at these strides).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .common import drop_path


class SqueezeExcite(nn.Module):
    channels: int
    # reference MBConv squeezes to input_filters * se_ratio (NOT the expanded
    # channel count) — mb_conv.py:182,216
    squeeze_base: int | None = None
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeezed = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        base = self.squeeze_base if self.squeeze_base is not None else self.channels
        reduced = max(1, int(base * self.se_ratio))
        s = nn.Conv(reduced, (1, 1), dtype=self.dtype, name="reduce")(squeezed)
        s = nn.swish(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConvBlock(nn.Module):
    input_filters: int
    output_filters: int
    ksize: int = 3
    expand_ratio: int = 4
    stride: int = 1
    drop_connect_rate: float = 0.0
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=deterministic,
            momentum=0.9,  # flax momentum = 1 - torch momentum (0.1)
            epsilon=0.01,
            dtype=self.dtype,
            name=name,
        )
        inputs = x
        oup = self.input_filters * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(oup, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = bn("bn0")(x)
            x = nn.swish(x)
        x = nn.Conv(
            oup,
            (self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=oup,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise_conv",
        )(x)
        x = bn("bn1")(x)
        x = nn.swish(x)
        if self.se_ratio > 0:
            x = SqueezeExcite(
                oup, squeeze_base=self.input_filters, se_ratio=self.se_ratio,
                dtype=self.dtype, name="se",
            )(x)
        x = nn.Conv(
            self.output_filters, (1, 1), use_bias=False, dtype=self.dtype,
            name="project_conv",
        )(x)
        x = bn("bn2")(x)
        if self.stride == 1 and self.input_filters == self.output_filters:
            if self.drop_connect_rate > 0 and not deterministic:
                x = drop_path(
                    x, self.drop_connect_rate, deterministic,
                    self.make_rng("dropout"),
                )
            x = x + inputs
        return x
