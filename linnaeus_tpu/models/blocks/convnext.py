"""ConvNeXt blocks in NHWC (TPU-native layout).

Behavioral spec from the reference (models/blocks/convnext.py:21-119): block =
7x7 depthwise conv -> LN -> 4x pointwise -> GELU -> pointwise -> layer-scale
-> drop-path residual; downsample = LN -> 2x2 stride-2 conv. The reference
runs NCHW with a hand-rolled channels-first LN; here everything is NHWC so
LayerNorm is a plain last-axis norm and convolutions hit XLA's native TPU
layout with no transposes.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .common import DropPath, trunc_normal_init


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    act_exact: bool = False  # erf GELU for torch parity; tanh is TPU-faster
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: (B, H, W, C)
        residual = x
        x = nn.Conv(
            self.dim,
            kernel_size=(7, 7),
            padding=3,
            feature_group_count=self.dim,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Dense(4 * self.dim, kernel_init=trunc_normal_init, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=not self.act_exact)
        x = nn.Dense(self.dim, kernel_init=trunc_normal_init, dtype=self.dtype)(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            x = x * gamma.astype(x.dtype)
        x = DropPath(self.drop_path)(x, deterministic=deterministic)
        return residual + x


class ConvNeXtDownsampleLayer(nn.Module):
    """LN -> 2x2 stride-2 conv; halves H/W and changes channels."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Conv(
            self.out_dim,
            kernel_size=(2, 2),
            strides=(2, 2),
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
        )(x)
        return x


class ConvNeXtStem(nn.Module):
    """4x4 stride-4 patchify conv + LN (mFormerV1 stem; mFormerV1.py:265-268)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_dim,
            kernel_size=(4, 4),
            strides=(4, 4),
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        return x
