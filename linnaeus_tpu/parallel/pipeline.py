"""GPipe-style pipeline parallelism over the ``model`` mesh axis.

The reference scales only by DDP (utils/distributed.py); pipeline
parallelism has no analog there. This is the TPU-native building block for
inter-layer scaling, written the JAX/SPMD way (the scaling-book recipe):

  * a tower of L **uniform** blocks has its per-block params stacked on a
    leading layer axis; that axis is sharded over the S-way ``model`` mesh
    axis, so each device holds L/S contiguous layers (weight-stationary);
  * ``shard_map`` runs one pipeline *stage* per device; activations hop to
    the next stage with ``lax.ppermute`` over ICI;
  * the batch is split into M microbatches; a ``lax.scan`` over
    M + S - 1 ticks implements GPipe fill-drain. Each tick every device
    runs its stage on its current microbatch (bubble ticks compute on
    garbage and are masked out) — no data-dependent control flow, one
    compiled program;
  * backward is ordinary ``jax.grad`` through the scan + ppermute: XLA
    emits the reverse pipeline (activation grads hop backward) without any
    hand-written schedule.

Exactness: the pipelined forward equals the sequential layer stack
bit-for-bit per microbatch (no approximation, no recomputation); tests
assert fwd and grad parity vs ``lax.scan`` over the same stacked params.

Scope: the flagship mFormerV1 configs (<= 401M params) fit one chip under
fsdp, so the Trainer does not route them through pp (docs/architecture.md);
this module is the tested primitive for towers that do need it, and
``dryrun_multichip`` exercises a pipelined train step over the 8-device
virtual mesh.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def stack_layer_params(layer_params: list) -> dict:
    """Stack per-layer param trees (identical structure) on a leading layer
    axis — the layout ``pipeline_forward`` consumes."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layer_params)


def unstack_layer_params(stacked) -> list:
    """Inverse of :func:`stack_layer_params`."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]


def pipeline_spec(stacked, mesh: Mesh, axis_name: str = MODEL_AXIS):
    """NamedShardings that put each stage's layer slice on its device:
    leading (layer) axis sharded over ``axis_name``, rest replicated."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, P(axis_name)), stacked
    )


def _stage_apply(block_fn, local_params, x):
    """Apply this device's L/S layers sequentially (scan over the local
    layer axis)."""

    def body(h, p):
        return block_fn(p, h), None

    out, _ = jax.lax.scan(body, x, local_params)
    return out


def pipeline_forward(
    block_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    num_microbatches: int,
    axis_name: str = MODEL_AXIS,
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Run ``x`` through L stacked uniform layers, pipelined S ways.

    block_fn        : ``(params_one_layer, h) -> h`` — one block, pure.
    stacked_params  : pytree with leading layer axis L (divisible by S).
    x               : (B, ...) batch; B divisible by ``num_microbatches``
                      (and by the microbatch split after any data
                      sharding).
    num_microbatches: M >= S keeps the bubble fraction at (S-1)/(M+S-1).
    batch_axis      : optional mesh axis the batch dim stays sharded over
                      (dp x pp meshes), like ring_attention's.

    Returns the tower output with ``x``'s shape.
    """
    S = int(mesh.shape[axis_name])
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"pipeline: {L} layers not divisible by {S} stages")
    M = int(num_microbatches)
    B = x.shape[0]
    if B % M:
        raise ValueError(f"pipeline: batch {B} not divisible by M={M}")
    if M < S:
        raise ValueError(
            f"pipeline: need microbatches >= stages ({M} < {S}) — smaller M "
            "leaves devices idle every tick"
        )
    if batch_axis is not None and (
        batch_axis not in mesh.shape or batch_axis == axis_name
    ):
        # a typo'd batch axis would silently replicate the batch on every
        # data-parallel device; pass batch_axis=None explicitly for a
        # replicated batch
        raise ValueError(
            f"pipeline: batch_axis {batch_axis!r} is not a usable mesh axis "
            f"(mesh has {tuple(mesh.shape)}, pipe axis is {axis_name!r})"
        )
    ba = batch_axis

    def _pipelined(params_local, xs):
        # params_local: (L/S, ...) this stage's layers
        # xs: (M, B/M, ...) microbatched input (replicated over the pipe axis)
        s_idx = jax.lax.axis_index(axis_name)
        perm_fwd = [(i, (i + 1) % S) for i in range(S)]
        mb_shape = xs.shape[1:]

        def tick(carry, t):
            recv = carry
            # stage 0 ingests microbatch t (garbage after the last one —
            # clamp keeps the gather in range; those ticks are drained
            # bubbles whose output is never selected)
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
            )
            # xs is replicated over the pipe axis; the carry is varying —
            # promote feed so the select has a consistent device-varying type
            feed = jax.lax.pvary(feed, (axis_name,))
            h_in = jnp.where(s_idx == 0, feed, recv)
            h_out = _stage_apply(block_fn, params_local, h_in)
            # last stage emits; everyone forwards to the next stage
            send = jax.lax.ppermute(h_out, axis_name, perm_fwd)
            return send, h_out

        # the scan carry is device-varying over the mapped axes; mark the
        # init accordingly so the carry type is stable (see ops/ring_attention)
        vary = (axis_name,) + ((ba,) if ba else ())
        init = jax.lax.pvary(jnp.zeros(mb_shape, x.dtype), vary)
        _, ticks = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # microbatch m finishes on the LAST stage at tick m + S - 1;
        # ticks: (M+S-1, B/M, ...) — take the drain window
        out_last = jax.lax.dynamic_slice_in_dim(ticks, S - 1, M, axis=0)
        # deliver the last stage's outputs to every pipe device replicated
        # (loss/grads run replicated over the pipe axis, like tp): psum of
        # a one-hot contribution is exact (0 + x == x) and its result is
        # replicated over the axis, which the out_specs require
        contrib = jnp.where(s_idx == S - 1, out_last, jnp.zeros_like(out_last))
        return jax.lax.psum(contrib, axis_name)

    xs = x.reshape((M, B // M) + x.shape[1:])
    spec_p = jax.tree.map(lambda _: P(axis_name), stacked_params)
    spec_x = P(None, ba)
    out = jax.shard_map(
        _pipelined,
        mesh=mesh,
        in_specs=(spec_p, spec_x),
        out_specs=spec_x,
    )(stacked_params, xs)
    return out.reshape(x.shape)
