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


def _body(y_ref, x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
          g_ref, o_ref, eps: float, approximate: bool):
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
    if x_ref is not None:
        out = x_ref[:].astype(jnp.float32) + out
    o_ref[:] = out.astype(o_ref.dtype)


def _kernel(y_ref, x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            g_ref, o_ref, *, eps: float, approximate: bool):
    _body(y_ref, x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
          g_ref, o_ref, eps, approximate)


def _kernel_nores(y_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  g_ref, o_ref, *, eps: float, approximate: bool):
    _body(y_ref, None, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
          g_ref, o_ref, eps, approximate)


def _pallas_fused(y2, x2, ls, lb, w1, b1, w2, b2, g, eps, approximate,
                  add_residual, block_m):
    M, C = y2.shape
    H = w1.shape[1]
    pad = (-M) % block_m
    if pad:
        y2 = jnp.pad(y2, ((0, pad), (0, 0)))
        if add_residual:
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    full = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    tile = pl.BlockSpec((block_m, C), row)
    param_specs = [
        pl.BlockSpec((1, C), full),
        pl.BlockSpec((1, C), full),
        pl.BlockSpec((C, H), full),
        pl.BlockSpec((1, H), full),
        pl.BlockSpec((H, C), full),
        pl.BlockSpec((1, C), full),
        pl.BlockSpec((1, C), full),
    ]
    kernel = _kernel if add_residual else _kernel_nores
    in_specs = [tile] + ([tile] if add_residual else []) + param_specs
    operands = ((y2, x2) if add_residual else (y2,)) + (
        ls, lb, w1, b1, w2, b2, g)
    out = pl.pallas_call(
        functools.partial(kernel, eps=eps, approximate=approximate),
        out_shape=jax.ShapeDtypeStruct((M + pad, C), x2.dtype),
        grid=((M + pad) // block_m,),
        in_specs=in_specs,
        out_specs=tile,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(*operands)
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


def _gelu_grad(a, approximate):
    """d gelu(a) / d a, elementwise in f32."""
    if approximate:
        c = 0.7978845608028654  # sqrt(2/pi)
        k = 0.044715
        t = jnp.tanh(c * (a + k * a * a * a))
        return 0.5 * (1.0 + t) + 0.5 * a * (1.0 - t * t) * c * (
            1.0 + 3.0 * k * a * a)
    inv_sqrt2 = 0.7071067811865476
    phi = jnp.exp(-0.5 * a * a) * 0.3989422804014327  # N(0,1) pdf
    return 0.5 * (1.0 + jax.lax.erf(a * inv_sqrt2)) + a * phi


def _bwd_kernel(y_ref, do_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, g_ref,
                dy_ref, dls_ref, dlb_ref, dw1_ref, db1_ref, dw2_ref,
                db2_ref, dg_ref,
                *, eps: float, approximate: bool):
    """Recompute-in-VMEM backward: one pass over the row tiles, weight/bias
    gradients accumulated across the (sequential) grid in f32 outputs."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)

    dt = y_ref.dtype
    dn_contract = (((1,), (1,)), ((), ()))  # (bm, K) x (N, K) -> (bm, N)
    dn_weight = (((0,), (0,)), ((), ()))    # (bm, K) x (bm, N) -> (K, N)

    # ---- recompute forward in VMEM
    yf = y_ref[:].astype(jnp.float32)
    mean = jnp.mean(yf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mean), axis=1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    n = (yf - mean) * r
    h0 = n * ls_ref[:] + lb_ref[:]
    h0b = h0.astype(dt)
    a1 = jax.lax.dot_general(h0b, w1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + b1_ref[:]
    h1b = jax.nn.gelu(a1, approximate=approximate).astype(dt)
    a2 = jax.lax.dot_general(h1b, w2_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + b2_ref[:]

    # ---- backward
    do = do_ref[:].astype(jnp.float32)
    dg_ref[:] += jnp.sum(do * a2, axis=0, keepdims=True)
    da2 = do * g_ref[:]
    da2b = da2.astype(dt)
    db2_ref[:] += jnp.sum(da2, axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(h1b, da2b, dn_weight,
                                      preferred_element_type=jnp.float32)
    dh1 = jax.lax.dot_general(da2b, w2_ref[:], dn_contract,
                              preferred_element_type=jnp.float32)
    da1 = dh1 * _gelu_grad(a1, approximate)
    da1b = da1.astype(dt)
    db1_ref[:] += jnp.sum(da1, axis=0, keepdims=True)
    dw1_ref[:] += jax.lax.dot_general(h0b, da1b, dn_weight,
                                      preferred_element_type=jnp.float32)
    dh0 = jax.lax.dot_general(da1b, w1_ref[:], dn_contract,
                              preferred_element_type=jnp.float32)
    dls_ref[:] += jnp.sum(dh0 * n, axis=0, keepdims=True)
    dlb_ref[:] += jnp.sum(dh0, axis=0, keepdims=True)
    dn = dh0 * ls_ref[:]
    dy = r * (dn - jnp.mean(dn, axis=1, keepdims=True)
              - n * jnp.mean(dn * n, axis=1, keepdims=True))
    dy_ref[:] = dy.astype(dy_ref.dtype)


# bwd row tiles are smaller than fwd (4x the f32 intermediates live at once)
_BWD_BLOCK_M_NARROW = 1024
_BWD_BLOCK_M_WIDE = 256


def _pallas_bwd(y2, do2, ls, lb, w1, b1, w2, b2, g, eps, approximate):
    M, C = y2.shape
    H = w1.shape[1]
    block_m = _BWD_BLOCK_M_NARROW if C <= 128 else _BWD_BLOCK_M_WIDE
    pad = (-M) % block_m
    if pad:
        y2 = jnp.pad(y2, ((0, pad), (0, 0)))
        # padded dout rows are zero -> they contribute nothing to any grad
        do2 = jnp.pad(do2, ((0, pad), (0, 0)))
    full = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)  # noqa: E731
    tile = pl.BlockSpec((block_m, C), row)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, approximate=approximate),
        out_shape=[
            jax.ShapeDtypeStruct((M + pad, C), y2.dtype),  # dy
            jax.ShapeDtypeStruct((1, C), f32),             # dls
            jax.ShapeDtypeStruct((1, C), f32),             # dlb
            jax.ShapeDtypeStruct((C, H), f32),             # dw1
            jax.ShapeDtypeStruct((1, H), f32),             # db1
            jax.ShapeDtypeStruct((H, C), f32),             # dw2
            jax.ShapeDtypeStruct((1, C), f32),             # db2
            jax.ShapeDtypeStruct((1, C), f32),             # dg
        ],
        grid=((M + pad) // block_m,),
        in_specs=[
            tile,
            tile,
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((C, H), full),
            pl.BlockSpec((1, H), full),
            pl.BlockSpec((H, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((1, C), full),
        ],
        out_specs=[
            tile,
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((C, H), full),
            pl.BlockSpec((1, H), full),
            pl.BlockSpec((H, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((1, C), full),
        ],
        # weight grads accumulate across row tiles -> the grid must run
        # sequentially with the accumulator blocks resident
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(y2, do2, ls, lb, w1, b1, w2, b2, g)
    dy = outs[0][:M] if pad else outs[0]
    return (dy,) + tuple(outs[1:])


def _fused_bwd(eps, approximate, add_residual, block_m, saved, dout):
    y2, x2, ls, lb, w1, b1, w2, b2, g = saved
    if jax.default_backend() in ("tpu", "axon") or _FORCE_KERNEL_BWD:
        dy, dls, dlb, dw1, db1, dw2, db2, dg = _pallas_bwd(
            y2, dout, ls, lb, w1, b1, w2, b2, g, eps, approximate)
        dx = dout if add_residual else jnp.zeros_like(dout)
        return (dy, dx, dls.astype(ls.dtype), dlb.astype(lb.dtype),
                dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype),
                dg.astype(g.dtype))
    # non-TPU fallback: autodiff of the reference chain (recompute) —
    # standard XLA ops, the gradient of the same math the kernel computes
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, eps, approximate, add_residual),
        y2, x2, ls, lb, w1, b1, w2, b2, g,
    )
    return vjp(dout)


# test hook: route the backward through the Pallas kernel on CPU
# (interpret mode patches pl.pallas_call)
_FORCE_KERNEL_BWD = False


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
    Differentiable: hand-written Pallas backward on TPU (recompute in
    VMEM, grid-accumulated weight grads), XLA-recompute autodiff
    elsewhere."""
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


def autodiff_active(x) -> bool:
    """True when ``x`` is being traced for gradients (a JVP tracer sits in
    its tracer stack). FALLBACK ONLY: every in-repo gradient caller (the
    train step, the gradnorm re-forward) passes an explicit
    ``training=True`` through the model, which routes the fused-MLP grad
    gate without consulting tracers. This heuristic remains for external
    callers that differentiate a ``deterministic=True`` forward without
    setting ``training`` — there a live JVP tracer still flips the gate
    (though under ``jax.checkpoint`` the initial abstract trace carries no
    JVP tracer, which is why the explicit flag is the supported path)."""
    t, hops = x, 0
    while isinstance(t, jax.core.Tracer) and hops < 8:
        # duck-typed: a JVP tracer carries primal+tangent (the concrete
        # tracer classes moved under jax._src and are deprecated imports)
        if hasattr(t, "primal") and hasattr(t, "tangent"):
            return True
        nxt = getattr(t, "val", None)  # batching tracers wrap .val
        if nxt is None:
            break
        t, hops = nxt, hops + 1
    return False


def fused_mlp_profitable(batch: int, h: int, w: int, c: int,
                         *, grad: bool = False) -> bool:
    """Measured routing rule (v5e, in-model A/B, docs/performance.md).

    Common geometry gate: batch <= 64, feature maps of 48x48+, at least
    ~100k total rows. At batch 128 XLA's native fusion wins at every
    geometry measured (the conv layout flips with batch); at tiny totals
    (224px B<=16) the call overhead eats the win.

    Channel gate (per-preset A/B, sm/lg/xl):
    - serving (``grad=False``): wins through C=192 — sm +33% at 384px
      B=64, +5-16% at 224px B=32/64; lg (C=192 stage 1) +3-10% at
      224px. Loses at C=256 (xl, -3%) -> C <= 192.
    - training (``grad=True``, Pallas backward): wins at C=96 (sm
      stage 1: +12.3% at 384px B=64, +7.6% at 224px B=64) and at
      C=192 on maps <= 48x48 (sm 384px stage 2: ~+2 ms/step), but
      loses at C=192 on 56x56 (lg 224px stage 1: -2..-5% even with
      retuned backward tiles) -> C <= 96, or C <= 192 with
      h*w <= 2304.

    Auto mode requires a TPU backend — forcing ``fused_mlp=True``
    bypasses this (tests run the kernel in interpret mode on CPU)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if not (batch <= 64 and h * w >= 2304 and batch * h * w >= 98304):
        return False
    if grad:
        return c <= 96 or (c <= 192 and h * w <= 2304)
    return c <= 192
