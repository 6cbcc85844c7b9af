"""Pallas fused ConvNeXt-MLP kernel: LN -> Dense(4C) -> GELU -> Dense(C) ->
layer-scale (-> +residual), tiled over rows with the (M, 4C) intermediate
kept in VMEM.

Why this exists: XLA fuses this chain well at the 224px ConvNeXt stage
geometries, but at the 384px geometries (96x96 / 48x48 feature maps,
batch <= 64) its layout assignment around the depthwise conv materializes
the 4x intermediate with data-formatting layouts — measured ~5.5 ms per
stage-1 block at (64, 96, 96, 96) where the component floor is ~2.3 ms.
One M-tiled kernel removes the HBM round-trip and, because a Pallas call
requires default row-major layouts, anchors the surrounding layout
assignment: conv + fused kernel measures 3.3-3.4 ms in the same chained
A/B (see docs/performance.md, round-3 serving decomposition).

The kernel is forward-only; gradients run through a ``jax.custom_vjp``
whose backward is plain-XLA recompute (``jax.vjp`` of the reference chain),
so training uses it transparently with unchanged backward math.

No reference analog: the reference's ConvNeXt blocks (models/blocks/
convnext.py:21-119) run whatever cuDNN/torch emit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (patched in tests)

# VMEM-safe row-tile sizes, keyed by whether the 4C intermediate is narrow
# enough for big tiles (measured: C=96 takes bm=2048 comfortably; C=192 at
# bm=1024 exceeds the 16 MB scoped-vmem budget).
_BLOCK_M_NARROW = 2048  # C <= 128
_BLOCK_M_WIDE = 512     # C > 128


def _kernel(y_ref, x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            g_ref, o_ref, *, eps: float, approximate: bool,
            add_residual: bool):
    yf = y_ref[:].astype(jnp.float32)
    mean = jnp.mean(yf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=1, keepdims=True)
    h0 = (yf - mean) * jax.lax.rsqrt(var + eps)
    h0 = h0 * ls_ref[:] + lb_ref[:]
    h1 = jax.lax.dot_general(h0.astype(y_ref.dtype), w1_ref[:],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = jax.nn.gelu(h1 + b1_ref[:], approximate=approximate)
    out = jax.lax.dot_general(h1.astype(y_ref.dtype), w2_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = (out + b2_ref[:]) * g_ref[:]
    if add_residual:
        out = x_ref[:].astype(jnp.float32) + out
    o_ref[:] = out.astype(o_ref.dtype)


def _pallas_fused(y2, x2, ls, lb, w1, b1, w2, b2, g, eps, approximate,
                  add_residual, block_m):
    M, C = y2.shape
    H = w1.shape[1]
    pad = (-M) % block_m
    if pad:
        y2 = jnp.pad(y2, ((0, pad), (0, 0)))
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    full = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, approximate=approximate,
                          add_residual=add_residual),
        out_shape=jax.ShapeDtypeStruct((M + pad, C), x2.dtype),
        grid=((M + pad) // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, C), row),
            pl.BlockSpec((block_m, C), row),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((C, H), full),
            pl.BlockSpec((1, H), full),
            pl.BlockSpec((H, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((1, C), full),
        ],
        out_specs=pl.BlockSpec((block_m, C), row),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(y2, x2, ls, lb, w1, b1, w2, b2, g)
    return out[:M] if pad else out


def _xla_reference(y2, x2, ls, lb, w1, b1, w2, b2, g, eps, approximate,
                   add_residual):
    """The plain-ops chain the kernel replaces (same dtype contract as the
    unfused ConvNeXtBlock path); used for the custom-vjp backward."""
    dt = y2.dtype
    yf = y2.astype(jnp.float32)
    mean = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
    h0 = ((yf - mean) * jax.lax.rsqrt(var + eps) * ls[0] + lb[0]).astype(dt)
    h1 = jax.lax.dot_general(h0, w1, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = jax.nn.gelu(h1 + b1[0], approximate=approximate)
    out = jax.lax.dot_general(h1.astype(dt), w2, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = (out + b2[0]) * g[0]
    if add_residual:
        out = x2.astype(jnp.float32) + out
    return out.astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _fused_core(y2, x2, ls, lb, w1, b1, w2, b2, g, eps, approximate,
                add_residual, block_m):
    return _pallas_fused(y2, x2, ls, lb, w1, b1, w2, b2, g, eps,
                         approximate, add_residual, block_m)


def _fused_fwd(y2, x2, ls, lb, w1, b1, w2, b2, g, eps, approximate,
               add_residual, block_m):
    out = _pallas_fused(y2, x2, ls, lb, w1, b1, w2, b2, g, eps,
                        approximate, add_residual, block_m)
    return out, (y2, x2, ls, lb, w1, b1, w2, b2, g)


def _fused_bwd(eps, approximate, add_residual, block_m, saved, dout):
    y2, x2, ls, lb, w1, b1, w2, b2, g = saved
    # backward = autodiff of the reference chain (recompute) — standard XLA
    # ops, numerically the gradient of the same math the kernel computes
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, eps, approximate, add_residual),
        y2, x2, ls, lb, w1, b1, w2, b2, g,
    )
    return vjp(dout)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_convnext_mlp(
    y: jnp.ndarray,
    residual: jnp.ndarray | None,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    gamma: jnp.ndarray | None,
    *,
    eps: float = 1e-6,
    approximate_gelu: bool = True,
) -> jnp.ndarray:
    """LN -> Dense(4C) -> GELU -> Dense(C) -> *gamma [-> +residual] as one
    Pallas kernel over ``y`` of shape (..., C). ``residual=None`` skips the
    in-kernel add (the caller applies DropPath + residual outside).
    Differentiable via XLA-recompute backward."""
    shape = y.shape
    C = shape[-1]
    y2 = y.reshape(-1, C)
    x2 = y2 if residual is None else residual.reshape(-1, C)
    as_row = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)  # noqa: E731
    g = jnp.ones((C,), jnp.float32) if gamma is None else gamma
    block_m = _BLOCK_M_NARROW if C <= 128 else _BLOCK_M_WIDE
    out = _fused_core(
        y2, x2, as_row(ln_scale, C), as_row(ln_bias, C),
        w1, as_row(b1, w1.shape[1]), w2, as_row(b2, C), as_row(g, C),
        eps, approximate_gelu, residual is not None, block_m,
    )
    return out.reshape(shape)


def fused_mlp_profitable(batch: int, h: int, w: int) -> bool:
    """Measured routing rule (v5e, in-model A/B, docs/performance.md
    round-3 serving decomposition): the kernel wins at batch <= 64 with
    feature maps of 48x48+ and at least ~100k total rows — the 384px
    stage-1/2 geometries (+33% at B=64) and 224px stage 1 at mid batches
    (+5-16% at B=32/64). At batch 128 XLA's native fusion wins at every
    geometry measured (the conv layout flips with batch), and at tiny
    totals (224px B<=16) the call overhead eats the win. Auto mode
    requires a TPU backend — forcing ``fused_mlp=True`` bypasses this
    (tests run the kernel in interpret mode on CPU)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return batch <= 64 and h * w >= 2304 and batch * h * w >= 98304
