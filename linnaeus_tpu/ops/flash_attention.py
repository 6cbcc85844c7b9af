"""FlashAttention-2 forward + backward kernels in Pallas (TPU).

Online-softmax blockwise attention (Dao 2023; PAPERS.md) — neither the
forward nor the backward ever materializes the (N, N) score matrix in HBM.
Replaces the reference's flash-attn CUDA dependency (rope_2d_mhsa.py:29-47,
459-491) with TPU-native kernels.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * forward grid = (batch*heads, num_q_blocks, num_k_blocks); the last grid
    axis iterates sequentially on TPU, so the running max / denominator /
    accumulator live in VMEM scratch across k-blocks of one q-block. The
    forward also emits the per-row logsumexp (lse) residual.
  * backward runs two kernels: dQ with grid (BH, nq, nk) and dK/dV with grid
    (BH, nk, nq); each recomputes p = exp(s - lse) blockwise from the saved
    q/k/v/lse and accumulates into VMEM scratch — classic FlashAttention-2
    backward, O(N) memory.
  * blocks are (128, head_dim) tiles — MXU-aligned; inputs are zero-padded
    to block multiples; padded KEY columns are masked to -inf before the
    softmax (compile-time iota); padded QUERY rows are harmless (their dO is
    zero-padded, so they contribute nothing to dK/dV, and their dQ rows are
    sliced away).
  * matmuls accumulate in fp32 (`preferred_element_type`); q/k/v can be bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
# cap on adaptive block sizes: a (1024, 1024) fp32 score tile is 4 MB of the
# ~16 MB VMEM budget, leaving room for q/k/v/o tiles and double buffering
MAX_BLOCK = 1024
NEG_INF = -1e30


def _auto_blocks(n: int) -> tuple[int, int]:
    """Pick block sizes for sequence length n.

    Per-program grid overhead dominates at small tile counts (measured: at
    N=580, 128x128 blocks -> 19200 programs -> 12.8 ms fwd, while full-row
    640x640 blocks -> 768 programs -> 3.97 ms). Use the full padded row up
    to MAX_BLOCK, then tile.
    """
    
    padded = ((n + 127) // 128) * 128
    block = min(padded, MAX_BLOCK)
    return block, block


# ---------------------------------------------------------------- forward
def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, n_valid: int, block_k: int,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    qi = pl.program_id(1)

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

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_scratch[:]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
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
        l = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)
        lse_ref[0, qi] = (m_scratch[:] + jnp.log(l))[:, 0]


# --------------------------------------------------------------- backward
def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    dq_scratch,
    *, scale: float, n_valid: int, block_k: int,
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    qi = pl.program_id(1)
    lse = lse_ref[0, qi][:, None]      # (BQ, 1)
    delta = delta_ref[0, qi][:, None]  # (BQ, 1)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)
    p = jnp.exp(s - lse)  # (BQ, BK)

    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK)
    ds = p * (dp - delta)
    dq_scratch[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = (dq_scratch[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_fused_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale: float, n_valid: int,
):
    """Single-program backward for the full-row-block case (nq = nk = 1).

    When the whole (padded) sequence fits one block — every 224/384px stage,
    since _auto_blocks caps at 1024 — the split dQ / dK-dV kernels each
    recompute s, p and dp from HBM-resident q/k/v/do. Fusing them computes
    the five N^2 D matmuls (s, dp, dv, dq, dk) exactly once: 5 instead of 9
    matmul units and one kernel launch instead of two (measured 133.5 ms
    XLA-sdpa vs 136.8 split-kernel at 384px B=64 train; this closes the
    kernel's deficit — see docs/performance.md).
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0][:, None]      # (BQ, 1)
    delta = delta_ref[0, 0][:, None]  # (BQ, 1)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, BK)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, NEG_INF)
    p = jnp.exp(s - lse)

    # dV = P^T @ dO
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta)).astype(k.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dk_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, scale: float, n_valid: int, block_k: int,
):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, qi][:, None]
    delta = delta_ref[0, qi][:, None]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, BK)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)
    p = jnp.exp(s - lse)

    # dV += P^T @ dO
    dv_scratch[:] += jax.lax.dot_general(
        p.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    # dK += dS^T @ Q
    dk_scratch[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = (dk_scratch[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


# ----------------------------------------------------------------- driver
def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(x, pad)


def _qkv_spec(block, D, is_q):
    if is_q:
        return pl.BlockSpec(
            (1, block, D), lambda bh, qi, ki: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, block, D), lambda bh, qi, ki: (bh, ki, 0),
        memory_space=pltpu.VMEM,
    )


def _vec_spec(block, n_blocks):
    # per-row vectors are stored 3D as (BH, n_blocks, block); the block spec
    # covers the FULL (n_blocks, block) tail so Mosaic's (8, 128)-or-full
    # tiling rule is satisfied; kernels index the row by program_id
    return pl.BlockSpec(
        (1, n_blocks, block), lambda bh, qi, ki: (bh, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _flash_forward_padded(qf, kf, vf, scale, n_valid, block_q, block_k):
    BH, nq_pad, D = qf.shape
    nk_pad = kf.shape[1]
    grid = (BH, nq_pad // block_q, nk_pad // block_k)
    kernel = functools.partial(
        _flash_fwd_kernel, scale=float(scale), n_valid=n_valid, block_k=block_k
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct(
                (BH, nq_pad // block_q, block_q), jnp.float32
            ),
        ),
        grid=grid,
        in_specs=[
            _qkv_spec(block_q, D, True),
            _qkv_spec(block_k, D, False),
            _qkv_spec(block_k, D, False),
        ],
        out_specs=(
            _qkv_spec(block_q, D, True),
            _vec_spec(block_q, nq_pad // block_q),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * n_valid * n_valid * D,
            bytes_accessed=4 * BH * nq_pad * D * qf.dtype.itemsize,
            transcendentals=BH * n_valid * n_valid,
        ),
    )(qf, kf, vf)
    return out, lse


# Backward strategy threshold: below this sequence length XLA's AD through
# the jnp softmax path beats the blockwise backward kernels (kernel-launch
# and pad overhead dominate at tiny N; measured 0.78 vs 3.46 ms/iter at
# N=199 on v5e). Above it, the O(N^2) fp32 residual traffic makes the
# kernels win.
KERNEL_BWD_MIN_SEQ = 512


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    bwd: str = "auto",
    auto_blocks: bool = True,
) -> jnp.ndarray:
    """Fused attention. q, k, v: (B, H, N, D). Returns (B, H, N, D).

    ``bwd``: 'kernel' (blockwise FlashAttention-2 backward kernels),
    'recompute' (XLA AD through the jnp path), or 'auto' (by seq length).
    ``auto_blocks``: size blocks to the full padded row (<= MAX_BLOCK) —
    measured much faster than fixed 128 tiles (fewer grid programs).
    """
    n = q.shape[2]
    if auto_blocks and block_q == DEFAULT_BLOCK_Q and block_k == DEFAULT_BLOCK_K:
        block_q, block_k = _auto_blocks(n)
    if bwd == "auto":
        bwd = "kernel" if n >= KERNEL_BWD_MIN_SEQ else "recompute"
    if bwd == "recompute":
        return _flash_attention_recompute(q, k, v, scale, block_q, block_k)
    return _flash_attention_kernelbwd(q, k, v, scale, block_q, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_recompute(q, k, v, scale, block_q, block_k):
    out, _ = _flash_fwd_rule(q, k, v, scale, block_q, block_k)
    return out


def _recompute_fwd_rule(q, k, v, scale, block_q, block_k):
    out = _flash_attention_recompute(q, k, v, scale, block_q, block_k)
    return out, (q, k, v)


def _recompute_bwd_rule(scale, block_q, block_k, residuals, g):
    from .attention import sdpa_reference

    q, k, v = residuals
    _, vjp = jax.vjp(lambda q, k, v: sdpa_reference(q, k, v, scale=scale), q, k, v)
    return vjp(g)


_flash_attention_recompute.defvjp(_recompute_fwd_rule, _recompute_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_kernelbwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    out, _ = _flash_fwd_rule(q, k, v, scale, block_q, block_k)
    return out


def _flash_fwd_rule(q, k, v, scale, block_q, block_k):
    B, H, N, D = q.shape
    if scale is None:
        scale = D**-0.5
    qf = _pad_to(q.reshape(B * H, N, D), 1, block_q)
    kf = _pad_to(k.reshape(B * H, N, D), 1, block_k)
    vf = _pad_to(v.reshape(B * H, N, D), 1, block_k)
    out, lse = _flash_forward_padded(qf, kf, vf, scale, N, block_q, block_k)
    o = out[:, :N, :].reshape(B, H, N, D)
    return o, (q, k, v, o, lse)  # lse: (BH, nq_blocks, block_q)


def _flash_bwd_rule(scale, block_q, block_k, residuals, g):
    q, k, v, o, lse = residuals
    B, H, N, D = q.shape
    if scale is None:
        scale = D**-0.5
    qf = _pad_to(q.reshape(B * H, N, D), 1, block_q)
    kf = _pad_to(k.reshape(B * H, N, D), 1, block_k)
    vf = _pad_to(v.reshape(B * H, N, D), 1, block_k)
    dof = _pad_to(g.reshape(B * H, N, D), 1, block_q)
    of = _pad_to(o.reshape(B * H, N, D), 1, block_q)
    BH, nq_pad, _ = qf.shape
    nk_pad = kf.shape[1]

    # delta_i = rowsum(dO * O) — cheap elementwise, fused by XLA; stored in
    # the same (BH, nq_blocks, block_q) 3D layout as lse
    delta = jnp.sum(
        dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1
    ).reshape(BH, nq_pad // block_q, block_q)
    lse_f = lse

    if nq_pad == block_q and nk_pad == block_k:
        # full-row blocks (every <=1024-token stage): one fused program per
        # (b, h) computes s/p/dp once for all three grads — 5 matmul units
        # instead of the split kernels' 9
        def fspec(block, D):
            return pl.BlockSpec(
                (1, block, D), lambda bh: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            )

        def fvec(block):
            return pl.BlockSpec(
                (1, 1, block), lambda bh: (bh, 0, 0),
                memory_space=pltpu.VMEM,
            )

        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _flash_bwd_fused_kernel, scale=float(scale), n_valid=N
            ),
            out_shape=(
                jax.ShapeDtypeStruct(qf.shape, q.dtype),
                jax.ShapeDtypeStruct(kf.shape, k.dtype),
                jax.ShapeDtypeStruct(vf.shape, v.dtype),
            ),
            grid=(BH,),
            in_specs=[
                fspec(block_q, D),   # q
                fspec(block_k, D),   # k
                fspec(block_k, D),   # v
                fspec(block_q, D),   # do
                fvec(block_q),       # lse
                fvec(block_q),       # delta
            ],
            out_specs=(fspec(block_q, D), fspec(block_k, D), fspec(block_k, D)),
            cost_estimate=pl.CostEstimate(
                flops=10 * BH * N * N * D,
                bytes_accessed=8 * BH * nq_pad * D * qf.dtype.itemsize,
                transcendentals=BH * N * N,
            ),
        )(qf, kf, vf, dof, lse_f, delta)
        dq = dq[:, :N, :].reshape(B, H, N, D)
        dk = dk[:, :N, :].reshape(B, H, N, D)
        dv = dv[:, :N, :].reshape(B, H, N, D)
        return dq, dk, dv

    grid_dq = (BH, nq_pad // block_q, nk_pad // block_k)
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=float(scale), n_valid=N, block_k=block_k
        ),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=grid_dq,
        in_specs=[
            _qkv_spec(block_q, D, True),    # q
            _qkv_spec(block_k, D, False),   # k
            _qkv_spec(block_k, D, False),   # v
            _qkv_spec(block_q, D, True),    # do
            _vec_spec(block_q, nq_pad // block_q),  # lse
            _vec_spec(block_q, nq_pad // block_q),  # delta
        ],
        out_specs=_qkv_spec(block_q, D, True),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
    )(qf, kf, vf, dof, lse_f, delta)

    # dK/dV: grid iterates q blocks innermost for each k block
    def kspec(block, D):
        return pl.BlockSpec(
            (1, block, D), lambda bh, ki, qi: (bh, ki, 0),
            memory_space=pltpu.VMEM,
        )

    def qspec(block, D):
        return pl.BlockSpec(
            (1, block, D), lambda bh, ki, qi: (bh, qi, 0),
            memory_space=pltpu.VMEM,
        )

    def qvec(block, n_blocks):
        return pl.BlockSpec(
            (1, n_blocks, block), lambda bh, ki, qi: (bh, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_dkv = (BH, nk_pad // block_k, nq_pad // block_q)
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=float(scale), n_valid=N, block_k=block_k
        ),
        out_shape=(
            jax.ShapeDtypeStruct(kf.shape, k.dtype),
            jax.ShapeDtypeStruct(vf.shape, v.dtype),
        ),
        grid=grid_dkv,
        in_specs=[
            qspec(block_q, D),   # q
            kspec(block_k, D),   # k
            kspec(block_k, D),   # v
            qspec(block_q, D),   # do
            qvec(block_q, nq_pad // block_q),  # lse
            qvec(block_q, nq_pad // block_q),  # delta
        ],
        out_specs=(kspec(block_k, D), kspec(block_k, D)),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )(qf, kf, vf, dof, lse_f, delta)

    dq = dq[:, :N, :].reshape(B, H, N, D)
    dk = dk[:, :N, :].reshape(B, H, N, D)
    dv = dv[:, :N, :].reshape(B, H, N, D)
    return dq, dk, dv


_flash_attention_kernelbwd.defvjp(_flash_fwd_rule, _flash_bwd_rule)
