"""Registered attention-mechanism zoo.

Reference parity: models/attention/*.py (~700 LoC) — CBAM, ECA, Linformer,
EfficientSelfAttention, DifferentialAttention, TaskSpecificAttention,
HierarchicalAttention. Registered but unused by the mFormer architectures
(SURVEY.md §2.2); available through MODEL.ATTENTION_MECHANISM configs.

All modules are Flax/NHWC (conv-feature attention) or (B, N, C) token
attention, with fp32 softmax numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from linnaeus_tpu.models.factory import register_attention
from linnaeus_tpu.models.blocks.common import trunc_normal_init


@register_attention("CBAM")
class CBAM(nn.Module):
    """Convolutional Block Attention Module: channel then spatial gates."""

    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        C = x.shape[-1]
        hidden = max(C // self.reduction, 1)
        mlp = nn.Sequential([
            nn.Dense(hidden, dtype=self.dtype),
            nn.relu,
            nn.Dense(C, dtype=self.dtype),
        ])
        avg = mlp(x.mean(axis=(1, 2)))
        mx = mlp(x.max(axis=(1, 2)))
        x = x * nn.sigmoid(avg + mx)[:, None, None, :]
        spatial = jnp.concatenate(
            [x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1
        )
        gate = nn.Conv(1, (7, 7), padding=3, dtype=self.dtype)(spatial)
        return x * nn.sigmoid(gate)


@register_attention("ECA")
class ECA(nn.Module):
    """Efficient Channel Attention: 1D conv across channel descriptors."""

    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x.mean(axis=(1, 2))  # (B, C)
        y = nn.Conv(
            1, (self.kernel_size,), padding=self.kernel_size // 2,
            dtype=self.dtype,
        )(y[..., None])[..., 0]
        return x * nn.sigmoid(y)[:, None, None, :]


@register_attention("Linformer")
class LinformerAttention(nn.Module):
    """Linear-complexity attention: project K/V sequence to k dims."""

    dim: int
    num_heads: int = 8
    proj_k: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        # length projection E: (N -> proj_k) shared across heads
        E = self.param("E", trunc_normal_init, (N, self.proj_k))
        k = jnp.einsum("bhnd,nk->bhkd", k, E.astype(k.dtype))
        v = jnp.einsum("bhnd,nk->bhkd", v, E.astype(v.dtype))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * hd**-0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


@register_attention("EfficientSelfAttention")
class EfficientSelfAttention(nn.Module):
    """SegFormer-style spatial-reduction attention over a token grid."""

    dim: int
    num_heads: int = 8
    sr_ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, H: int, W: int, deterministic: bool = True
    ) -> jnp.ndarray:
        B, N, C = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        kv_in = x
        if self.sr_ratio > 1:
            grid = x.reshape(B, H, W, C)
            grid = nn.Conv(
                self.dim, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio), dtype=self.dtype,
                name="sr",
            )(grid)
            kv_in = nn.LayerNorm(dtype=self.dtype)(
                grid.reshape(B, -1, self.dim)
            )
        kv = nn.Dense(2 * self.dim, dtype=self.dtype, name="kv")(kv_in)
        M = kv.shape[1]
        kv = kv.reshape(B, M, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * hd**-0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


@register_attention("DifferentialAttention")
class DifferentialAttention(nn.Module):
    """Diff Transformer attention: difference of two softmax maps."""

    dim: int
    num_heads: int = 8
    lambda_init: float = 0.8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, C = x.shape
        hd = self.dim // self.num_heads // 2  # split heads into two halves
        if hd == 0:
            raise ValueError("dim too small for differential attention")
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, 2, hd)
        qkv = qkv.transpose(2, 0, 3, 4, 1, 5)  # (3, B, H, 2, N, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        lam = self.param("lam", nn.initializers.constant(self.lambda_init), ())

        def attn(qi, ki):
            logits = jnp.einsum(
                "bhnd,bhmd->bhnm", qi.astype(jnp.float32), ki.astype(jnp.float32)
            ) * hd**-0.5
            return jax.nn.softmax(logits, axis=-1)

        a1 = attn(q[:, :, 0], k[:, :, 0])
        a2 = attn(q[:, :, 1], k[:, :, 1])
        diff = a1 - lam.astype(jnp.float32) * a2
        v_full = v.reshape(B, self.num_heads, 2 * hd, N).transpose(0, 1, 3, 2) \
            if False else v.transpose(0, 1, 3, 2, 4).reshape(B, self.num_heads, N, 2 * hd)
        out = jnp.einsum("bhnm,bhmd->bhnd", diff.astype(v_full.dtype), v_full)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


@register_attention("TaskSpecificAttention")
class TaskSpecificAttention(nn.Module):
    """Per-task learned attention pooling over token features."""

    dim: int
    num_tasks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, N, C) -> (B, num_tasks, C)
        queries = self.param(
            "task_queries", trunc_normal_init, (self.num_tasks, self.dim)
        )
        logits = jnp.einsum(
            "td,bnd->btn", queries.astype(jnp.float32), x.astype(jnp.float32)
        ) * self.dim**-0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        return jnp.einsum("btn,bnd->btd", probs, x)


@register_attention("HierarchicalAttention")
class HierarchicalAttention(nn.Module):
    """Coarse-to-fine task attention: each task's query is conditioned on the
    previous (coarser) task's pooled feature."""

    dim: int
    num_tasks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        base_queries = self.param(
            "task_queries", trunc_normal_init, (self.num_tasks, self.dim)
        )
        cond_proj = nn.Dense(self.dim, dtype=self.dtype, name="cond")
        outs = []
        prev = jnp.zeros((B, self.dim), self.dtype)
        for t in range(self.num_tasks):
            q = base_queries[t][None, :] + cond_proj(prev)
            logits = jnp.einsum(
                "bd,bnd->bn", q.astype(jnp.float32), x.astype(jnp.float32)
            ) * self.dim**-0.5
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            pooled = jnp.einsum("bn,bnd->bd", probs, x)
            outs.append(pooled)
            prev = pooled
        return jnp.stack(outs, axis=1)  # (B, T, C)
