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


class _LNParams(nn.Module):
    """Parameter holder scoping 'scale'/'bias' exactly like nn.LayerNorm —
    used by the fused-MLP path so both paths share one checkpoint tree."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _DenseParams(nn.Module):
    """Parameter holder scoping 'kernel'/'bias' exactly like nn.Dense."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", trunc_normal_init, (self.in_dim, self.out_dim)),
            self.param("bias", nn.initializers.zeros, (self.out_dim,)),
        )


class ConvNeXtBlock(nn.Module):
    """``fused_mlp`` routes LN->Dense->GELU->Dense->layer-scale through the
    Pallas fused kernel (ops/fused_mlp.py): True/False force it, None picks
    by measured geometry (wins at batch<=64 with >=48x48 feature maps — the
    384px stage-1/2 shapes where XLA's layout assignment collapses). The
    parameter tree is identical either way."""

    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    act_exact: bool = False  # erf GELU for torch parity; tanh is TPU-faster
    fused_mlp: bool | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        training: bool | None = None,
    ) -> jnp.ndarray:
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

        use_fused = self.fused_mlp
        if use_fused is None:
            from linnaeus_tpu.ops.fused_mlp import (
                autodiff_active,
                fused_mlp_profitable,
            )

            # auto routes training too since the hand-written Pallas
            # backward landed (train step 117.2 vs 131.6 ms at 384px
            # B=64); the rule is channel-aware — wide-channel presets
            # (lg/xl) keep XLA where the kernel measured slower. The
            # grad gate: the caller's EXPLICIT ``training`` flag when given
            # (the train step passes training=True — correct even for a
            # deterministic fine-tune under jax.checkpoint, where tracer
            # sniffing is blind); otherwise fall back to the training
            # contract (deterministic=False) or a live JVP trace.
            B, H, W, C = x.shape
            grad = (
                training
                if training is not None
                else (not deterministic or autodiff_active(x))
            )
            use_fused = fused_mlp_profitable(B, H, W, C, grad=grad)
        if use_fused:
            return self._fused_tail(x, residual, deterministic)

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

    def _fused_tail(self, y, residual, deterministic):
        from linnaeus_tpu.ops.fused_mlp import fused_convnext_mlp

        ln_scale, ln_bias = _LNParams(self.dim, name="LayerNorm_0")()
        w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="Dense_0")()
        w2, b2 = _DenseParams(4 * self.dim, self.dim, name="Dense_1")()
        gamma = None
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
        # DropPath active -> the branch must be scaled before the residual
        # add, so the kernel skips its in-kernel residual
        plain_residual = deterministic or self.drop_path == 0.0
        out = fused_convnext_mlp(
            y.astype(self.dtype),
            residual.astype(self.dtype) if plain_residual else None,
            ln_scale, ln_bias,
            w1.astype(self.dtype), b1,
            w2.astype(self.dtype), b2,
            gamma,
            approximate_gelu=not self.act_exact,
        )
        if plain_residual:
            return out
        out = DropPath(self.drop_path)(out, deterministic=deterministic)
        return residual + out


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
