"""Shared small blocks: Mlp, DropPath, ResNormLayer, initializers.

Reference parity: models/blocks/mlp.py:11, models/blocks/drop_path.py:39,
models/normalization/res_norm_layer.py:7, models/utils/initialization.py:11.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn


def gelu_exact(x):
    """erf-based GELU (parity with torch nn.GELU's default)."""
    return nn.gelu(x, approximate=False)


def gelu_tanh(x):
    """tanh-approximate GELU — measured ~1.5x faster end-to-end on v5e than
    the erf form (which dropped mFormerV1_sm inference from 5784 to 3728
    img/s); the accuracy difference is negligible for training. Models
    expose ``act_exact`` to select erf for bit-parity with torch."""
    return nn.gelu(x, approximate=True)


# trunc_normal(std=0.02) — the ViT/ConvNeXt init used throughout the reference
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def drop_path(
    x: jnp.ndarray,
    rate: float,
    deterministic: bool,
    rng: jax.Array | None,
) -> jnp.ndarray:
    """Per-sample stochastic depth. Keeps expected value via 1/keep scaling."""
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(nn.Module):
    """Stochastic-depth wrapper module (rng collection: 'dropout')."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate <= 0.0:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic, rng)


class Mlp(nn.Module):
    """Transformer MLP: Dense -> act -> drop -> Dense -> drop."""

    hidden_features: int
    out_features: int
    act: Callable | None = None
    act_exact: bool = False
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = self.act or (gelu_exact if self.act_exact else gelu_tanh)
        x = nn.Dense(
            self.hidden_features, kernel_init=trunc_normal_init, dtype=self.dtype
        )(x)
        x = act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_features, kernel_init=trunc_normal_init, dtype=self.dtype
        )(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class ResNormLayer(nn.Module):
    """Residual 2-layer MLP with LayerNorms, used inside metadata heads.

    (x -> Dense -> ReLU -> LN -> Dense -> ReLU -> LN) + x
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.dim, kernel_init=trunc_normal_init, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.Dense(self.dim, kernel_init=trunc_normal_init, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y)
        return x + y


class RMSNorm(nn.Module):
    """Root-mean-square norm (reference: models/normalization/rms.py:11)."""

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(self.dtype)


class MetaHead(nn.Module):
    """Per-component metadata embedding head: Dense->ReLU->LN->ResNorm.

    Reference parity: mFormerV1.py:286-307 (and mFormerV0's meta heads).
    """

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.out_dim, kernel_init=trunc_normal_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = ResNormLayer(self.out_dim, dtype=self.dtype)(x)
        return x


class QKVProjectHeads(nn.Module):
    """Fused-qkv projection emitting per-head q/k/v with all reshuffling on
    the weights, never the activations.

    The (C, 3C) kernel is viewed as (C, 3, H, D) so q/k/v come out of the
    matmul already (B, N, H, D) — no (B, N, 3C) activation ever needs a
    split/reshape relayout (~1.5 ms/step of copies at B=128/224px on v5e).
    ``perm`` optionally applies a static column permutation first (used by
    the RoPE path to de-interleave pair features at the weight level —
    attention scores are invariant under a head-dim permutation shared by
    q and k).

    The stored parameter tree is identical to ``nn.Dense`` (same "kernel"/
    "bias" names and shapes), so checkpoints, pretrained torch conversion
    (utils/pretrained.py) and the TP sharding rules (parallel/mesh.py) are
    unaffected; only the compute-time view changes.
    """

    dim: int
    num_heads: int
    perm: tuple | None = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        import numpy as np

        C, H = self.dim, self.num_heads
        D = C // H
        kernel = self.param("kernel", trunc_normal_init, (x.shape[-1], 3 * C))
        if self.perm is not None:
            kernel = kernel[:, jnp.asarray(np.asarray(self.perm, np.int64))]
        kp = kernel.reshape(x.shape[-1], 3, H, D).astype(self.dtype)
        xc = x.astype(self.dtype)
        # token-major outputs: the matmul's row dim stays (b, n) so the
        # result is written contiguously. (Emitting head-major
        # 'bnc,chd->bhnd' here was measured SLOWER — 62.7 vs 60.0 ms/step at
        # B=128/224px — the matmul-output scatter to (B,H,N,D) costs more
        # than the attention-einsum transposes it removes.)
        q = jnp.einsum("bnc,chd->bnhd", xc, kp[:, 0])
        k = jnp.einsum("bnc,chd->bnhd", xc, kp[:, 1])
        v = jnp.einsum("bnc,chd->bnhd", xc, kp[:, 2])
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (3 * C,))
            if self.perm is not None:
                bias = bias[jnp.asarray(np.asarray(self.perm, np.int64))]
            bp = bias.reshape(3, H, D).astype(self.dtype)
            q, k, v = q + bp[0], k + bp[1], v + bp[2]
        return q, k, v


class ProjFromHeads(nn.Module):
    """Output projection consuming (B, N, H, D) directly: the merge back to
    (B, N, C) is folded into the matmul by viewing the (C, C) kernel as
    (H, D, C) — the activation-side reshape copy disappears. Parameter tree
    identical to ``nn.Dense``."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C, H = self.dim, self.num_heads
        D = C // H
        kernel = self.param("kernel", trunc_normal_init, (C, self.dim))
        y = jnp.einsum(
            "bnhd,hdc->bnc", x, kernel.reshape(H, D, self.dim).astype(self.dtype)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return y + bias.astype(self.dtype)
