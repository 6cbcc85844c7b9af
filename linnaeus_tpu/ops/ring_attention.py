"""Ring attention: sequence-parallel exact attention over a mesh axis.

Scales attention past one chip's HBM/FLOPs by sharding the TOKEN dimension
across devices: each device keeps its local query block resident while the
key/value blocks rotate around the ring via ``jax.lax.ppermute`` (one hop
per step, P steps on a P-device axis), accumulating the exact softmax with
the online (streaming max/denominator) recurrence — the same math as the
Pallas flash kernel (ops/flash_attention.py), lifted one level up so the
blocks live on *different chips* instead of different VMEM tiles.

No reference analog (the reference tops out at single-GPU flash-attn,
rope_2d_mhsa.py:459-491); this is the TPU-native path to 1024px+ inputs
where one stage-3 token tensor no longer fits a single chip: communication
rides the ICI ring and overlaps with the per-chunk matmuls, and reverse-mode
AD flows through ``lax.scan`` + ``ppermute`` (its transpose is the inverted
ring), so training works without custom VJPs.

Layout contract: q/k/v are (B, H, N, D) with N sharded over ``axis_name``
(global view); the result has the same sharding as q. When the real token
count doesn't divide by the ring size, pad N and pass ``n_valid``: padded
KEY columns are masked out of the softmax exactly (their p-mass is zeroed
before the denominator), padded QUERY rows produce garbage that the caller
slices away — the same contract as the flash kernels' padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "model",
    scale: float | None = None,
    n_valid: int | None = None,
    batch_axis: str | None = "data",
) -> jnp.ndarray:
    """Exact softmax attention with the token dim sharded over ``axis_name``.

    q, k, v: (B, H, N, D) global arrays. N must divide evenly by the axis
    size; ``n_valid`` (< N) marks trailing token padding to exclude from
    the softmax. ``batch_axis``: keep the batch dim sharded over this mesh
    axis (dropped automatically if absent from the mesh) — without it a
    dp x sp mesh would all-gather the batch over 'data' and compute
    attention redundantly on every data-parallel device. Pass None for a
    batch that must stay replicated (B not divisible by the data axis).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = q.shape[2]
    p_size = mesh.shape[axis_name]
    if n % p_size:
        raise ValueError(
            f"ring_attention: N={n} not divisible by mesh axis "
            f"'{axis_name}' of size {p_size}"
        )
    if n_valid is None or n_valid > n:
        n_valid = n
    ba = (
        batch_axis
        if batch_axis and batch_axis in mesh.shape and batch_axis != axis_name
        else None
    )
    spec = P(ba, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_attention_shard, axis_name=axis_name, scale=float(scale),
            n_valid=int(n_valid), n_global=int(n),
            vary_axes=(axis_name,) + ((ba,) if ba else ()),
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def _ring_attention_shard(
    q, k, v, *, axis_name: str, scale: float, n_valid: int, n_global: int,
    vary_axes: tuple = (),
):
    p_size = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % p_size) for i in range(p_size)]
    my_idx = jax.lax.axis_index(axis_name)

    B, H, n_loc, D = q.shape
    qs = q.astype(jnp.float32) * scale
    mask_padding = n_valid < n_global
    col_local = jnp.arange(n_loc)

    def step(carry, s_idx):
        kc, vc, m, l, acc = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, kc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if mask_padding:
            # after s_idx hops the block on this device originated on ring
            # position (my_idx - s_idx) mod P -> its global column offset
            src = jax.lax.rem(my_idx - s_idx + p_size, p_size)
            col = col_local + src * n_loc  # (n_loc,) global column ids
            valid = (col < n_valid)[None, None, None, :]
            s = jnp.where(valid, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        if mask_padding:
            # a fully-masked block would otherwise contribute exp(0)=1 mass
            p = jnp.where(valid, p, 0.0)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (kc, vc, m_new, l_new, acc_new), None

    # initial carries must be marked device-varying over every mapped mesh
    # axis (ring + batch) so the scan carry type is stable (the body's
    # outputs are varying over both)
    vary = vary_axes or (axis_name,)
    m0 = jax.lax.pvary(
        jnp.full((B, H, n_loc, 1), -jnp.inf, jnp.float32), vary
    )
    l0 = jax.lax.pvary(jnp.zeros((B, H, n_loc, 1), jnp.float32), vary)
    acc0 = jax.lax.pvary(jnp.zeros((B, H, n_loc, D), jnp.float32), vary)
    (_, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(p_size)
    )
    return (acc / jnp.maximum(l, 1e-30)).astype(v.dtype)
