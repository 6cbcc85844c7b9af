"""FlashAttention-2 forward kernel in Pallas (TPU).

Online-softmax blockwise attention (Dao 2023; PAPERS.md) — never
materializes the (N, N) score matrix in HBM. Replaces the reference's
flash-attn CUDA dependency (rope_2d_mhsa.py:29-47, 459-491) with a
TPU-native kernel.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * grid = (batch*heads, num_q_blocks, num_k_blocks); the last grid axis
    iterates sequentially on TPU, so the running max/denominator/accumulator
    live in VMEM scratch across k-blocks of one q-block.
  * blocks are (128, head_dim) tiles — MXU-aligned; inputs are zero-padded
    to block multiples and padded keys are masked to -inf before the online
    softmax (mask indices are compile-time iota, no dynamic shapes).
  * matmuls accumulate in fp32 (`preferred_element_type`); q/k/v can be bf16.
  * backward currently recomputes through the jnp reference path via
    custom_vjp (sequence lengths in this model are <=600, so the backward
    (N,N) buffer is small; a full flash backward kernel is planned).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import sdpa_reference

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, n_valid: int, block_k: int,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, BK)

    # mask padded keys (global col index >= n_valid)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_scratch[:]          # (BQ, 1)
    l_prev = l_scratch[:]          # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)         # (BQ, BK)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc = acc_scratch[:] * alpha
    acc = acc + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    m_scratch[:] = m_new
    l_scratch[:] = l_new
    acc_scratch[:] = acc

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l_scratch[:], 1e-30)).astype(
            o_ref.dtype
        )


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Fused attention. q, k, v: (B, H, N, D). Returns (B, H, N, D)."""
    return _flash_forward(q, k, v, scale, block_q, block_k)


def _flash_forward(q, k, v, scale, block_q, block_k):
    B, H, N, D = q.shape
    if scale is None:
        scale = D**-0.5

    qf = _pad_to(q.reshape(B * H, N, D), 1, block_q)
    kf = _pad_to(k.reshape(B * H, N, D), 1, block_k)
    vf = _pad_to(v.reshape(B * H, N, D), 1, block_k)
    nq_pad, nk_pad = qf.shape[1], kf.shape[1]
    grid = (B * H, nq_pad // block_q, nk_pad // block_k)

    kernel = functools.partial(
        _flash_fwd_kernel, scale=float(scale), n_valid=N, block_k=block_k
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, D), lambda bh, qi, ki: (bh, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, D), lambda bh, qi, ki: (bh, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, D), lambda bh, qi, ki: (bh, ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, D), lambda bh, qi, ki: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * D,
            bytes_accessed=(3 * B * H * N * D + B * H * N * D) * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
    )(qf, kf, vf)
    return out[:, :N, :].reshape(B, H, N, D)


def _flash_fwd_rule(q, k, v, scale, block_q, block_k):
    out = _flash_forward(q, k, v, scale, block_q, block_k)
    return out, (q, k, v)


def _flash_bwd_rule(scale, block_q, block_k, residuals, g):
    q, k, v = residuals
    # Recompute gradients through the reference path (exact same math).
    def ref(q, k, v):
        return sdpa_reference(q, k, v, scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
