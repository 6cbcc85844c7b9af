"""Misc registered blocks: DiffTransformerBlock, ProgressivePatchEmbed.

Reference parity: models/blocks/diff_transformer.py:19 and
models/blocks/progressive_patch_embed.py:21.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from linnaeus_tpu.models.attention.zoo import DifferentialAttention
from .common import DropPath, Mlp, trunc_normal_init


class DiffTransformerBlock(nn.Module):
    """Pre-LN transformer block using DifferentialAttention."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = DifferentialAttention(
            dim=self.dim, num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(nn.LayerNorm(dtype=self.dtype, name="norm1")(x), deterministic)
        x = x + DropPath(self.drop_path)(attn, deterministic=deterministic)
        mlp = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(nn.LayerNorm(dtype=self.dtype, name="norm2")(x), deterministic)
        return x + DropPath(self.drop_path)(mlp, deterministic=deterministic)


class ProgressivePatchEmbed(nn.Module):
    """Progressive patch embedding: a stack of stride-2 convs with norms,
    reaching the target patch size gradually instead of one big conv."""

    embed_dim: int
    num_stages: int = 2  # total stride = 2**num_stages
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
        dims = [
            max(self.embed_dim // (2 ** (self.num_stages - 1 - i)), 8)
            for i in range(self.num_stages)
        ]
        dims[-1] = self.embed_dim
        for i, d in enumerate(dims):
            x = nn.Conv(
                d, (3, 3), strides=(2, 2), padding=1,
                kernel_init=trunc_normal_init, dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(x)
            if i < self.num_stages - 1:
                x = nn.gelu(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C), H, W
