"""Relative-position-bias MHSA (mFormerV0's attention) + OverlapPatchEmbed.

Behavioral spec from the reference (models/blocks/relative_mhsa.py:40-453):
bias table of ((2H-1)(2W-1) + 1) rows per head; image-token pairs index by
relative offset, ALL extra-token interactions share the final row. The
relative index matrix is a compile-time numpy constant (static grid), so the
gather lowers to one XLA take per layer and fuses into the logits add.
OverlapPatchEmbed = 3x3 stride-2 conv + LN, used by the first block of each
transformer stage.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import (
    DropPath,
    Mlp,
    ProjFromHeads,
    QKVProjectHeads,
    trunc_normal_init,
)


def build_relative_position_index(h: int, w: int, extra: int) -> np.ndarray:
    """(N, N) int32 index into the bias table, N = extra + h*w."""
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, h*w)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, hw, hw)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    idx = rel.sum(-1)  # (hw, hw)
    num_rel = (2 * h - 1) * (2 * w - 1) + 1
    pad_val = num_rel - 1
    n = extra + h * w
    out = np.full((n, n), pad_val, dtype=np.int32)
    out[extra:, extra:] = idx
    return out


class OverlapPatchEmbed(nn.Module):
    """3x3 stride-s conv patch embed + LN: (B,H,W,C) -> (B, H'W', D)."""

    embed_dim: int
    patch_size: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=self.patch_size // 2,
            dtype=self.dtype,
            name="proj",
        )(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return x, H, W


class RelativeAttention(nn.Module):
    dim: int
    img_size: tuple[int, int]
    extra_token_num: int = 1
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: float | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # fp32-stored scores (reference parity); False stores scores/probs in
    # the compute dtype — softmax math stays f32 in-fusion (serving knob,
    # same semantics as ops/attention.py:sdpa_bnhd)
    attn_fp32_softmax: bool = True
    # weight-level head split/merge (blocks/common.py QKVProjectHeads /
    # ProjFromHeads): q/k/v leave the qkv matmul already (B, N, H, D) and
    # the proj matmul consumes heads directly — no (B, N, 3C) activation
    # split or head-merge relayout copies. Mathematically equivalent, same
    # param tree. Default OFF: unlike the RoPE path (where the same rewrite
    # saved ~4 ms/step), V0 traces measured it neutral-to-slightly-slower
    # (75.0 vs 74.2 ms/step at B=128/224px) — there are no RoPE pair
    # relayouts to remove, the contiguous q/k/v lane slices were already
    # free, and the (C,3,H,D) weight view adds data-formatting cost. See
    # docs/performance.md.
    head_split: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, C = x.shape
        h, w = self.img_size
        assert N == h * w + self.extra_token_num
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        num_rel = (2 * h - 1) * (2 * w - 1) + 1
        bias_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init,
            (num_rel, self.num_heads),
        )
        rel_idx = build_relative_position_index(h, w, self.extra_token_num)

        if self.head_split:
            q, k, v = QKVProjectHeads(
                dim=self.dim, num_heads=self.num_heads,
                use_bias=self.qkv_bias, dtype=self.dtype, name="qkv",
            )(x)
        else:
            qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias,
                           kernel_init=trunc_normal_init, dtype=self.dtype,
                           name="qkv")(x)
            # Token-major (B, N, H, hd) split — the head axis stays a
            # dot_general batch dim, so no (3, B, H, N, hd) transpose copy
            # materializes (same optimization as rope_mhsa.py).
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, N, self.num_heads, head_dim)
            k = k.reshape(B, N, self.num_heads, head_dim)
            v = v.reshape(B, N, self.num_heads, head_dim)

        score_dtype = jnp.float32 if self.attn_fp32_softmax else q.dtype
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.astype(score_dtype) * jnp.asarray(scale, score_dtype),
            k.astype(score_dtype),
            preferred_element_type=score_dtype,
        )
        rel_bias = bias_table[jnp.asarray(rel_idx)]  # (N, N, heads)
        logits = logits + jnp.transpose(rel_bias, (2, 0, 1))[None].astype(score_dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if self.head_split:
            out = ProjFromHeads(dim=self.dim, num_heads=self.num_heads,
                                dtype=self.dtype, name="proj")(out)
        else:
            out = out.reshape(B, N, C)
            out = nn.Dense(self.dim, kernel_init=trunc_normal_init,
                           dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class RelativeMHSABlock(nn.Module):
    """Transformer block w/ optional stride-2 OverlapPatchEmbed downsample.

    stride=2: input is (B, H, W, C_in); patch-embeds to output_dim, prepends
    ``extra_tokens`` (list of (B, 1, D)); attention grid halves.
    stride=1: input is (B, N, C) tokens; dimension unchanged.
    """

    input_dim: int
    output_dim: int
    image_size: tuple[int, int]  # grid BEFORE this block's embed
    stride: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    extra_token_num: int = 1
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    act_exact: bool = False
    attn_fp32_softmax: bool = True
    head_split: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        extra_tokens: list[jnp.ndarray] | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.stride == 2:
            dim = self.output_dim
            x, H, W = OverlapPatchEmbed(
                embed_dim=dim, stride=2, dtype=self.dtype, name="patch_embed"
            )(x)
            if extra_tokens:
                x = jnp.concatenate([*extra_tokens, x], axis=1)
            grid = (H, W)
        else:
            dim = self.input_dim
            grid = self.image_size

        attn_out = RelativeAttention(
            dim=dim,
            img_size=grid,
            extra_token_num=self.extra_token_num,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            attn_fp32_softmax=self.attn_fp32_softmax,
            head_split=self.head_split,
            dtype=self.dtype,
            name="attn",
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x), deterministic)
        x = x + DropPath(self.drop_path)(attn_out, deterministic=deterministic)
        mlp_out = Mlp(
            hidden_features=int(dim * self.mlp_ratio),
            out_features=dim,
            drop=self.proj_drop,
            act_exact=self.act_exact,
            dtype=self.dtype,
            name="mlp",
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), deterministic)
        x = x + DropPath(self.drop_path)(mlp_out, deterministic=deterministic)
        return x
