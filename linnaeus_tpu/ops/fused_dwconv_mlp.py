"""Pallas fused ConvNeXt BLOCK kernel: 7x7 depthwise conv -> LN ->
Dense(4C) -> GELU -> Dense(C) -> layer-scale -> +residual, all in one
VMEM-resident pass over spatial row-tiles.

Motivation (round-4 verdict item): at the 384px stage-1 training geometry
(64, 96, 96, 96) the depthwise conv fwd+bwd measures ~15.3 ms against a
~6.4 ms component floor, and XLA's layouts around it were pathological
(38-92 GiB/s HBM). The round-3 fused MLP removed the LN->MLP HBM round
trip; this kernel additionally keeps the DWCONV OUTPUT in VMEM — the
(B,H,W,C) intermediate never touches HBM at all. The 7x7 taps run as 49
VPU fused multiply-adds per tile; the MLP rides the MXU exactly like
ops/fused_mlp.py.

Halo handling: the row-tile window needs 3 rows above and below. Pallas TPU
block indexing cannot express overlapping windows, so the input is passed
THREE times with index maps (t-1, t, t+1) (clamped); the kernel
concatenates [top[-3:], mid, bot[:3]] and zero-masks the out-of-image
slabs. Costs ~3x the input-read bandwidth of x (~0.2 ms at this geometry)
against the saved intermediate round-trip.

Gradients: ``jax.custom_vjp`` with plain-XLA recompute backward (the same
contract ops/fused_mlp.py started with; a hand-written backward is a
follow-up if the forward A/B wins in training).

VERDICT (round 4, measured — docs/performance.md "whole-block fused
dwconv+LN+MLP"): NEGATIVE RESULT; nothing routes to this kernel. At its
target geometry the production split (XLA dwconv + ops/fused_mlp.py)
wins: forward 3.43 vs 4.31 ms/block, train 8.73 vs 19.90 (interleaved
A/B via tools/fused_block_ab.py). XLA's dwconv emitter beats the 49-tap
VPU loop here, and the recompute backward pays the dwconv twice. Kept
in-tree as the measured fence extending the round-3 standalone-dwconv
negative result to the fused-block level.

No reference analog: the reference's ConvNeXt blocks run whatever
cuDNN/torch emit (models/blocks/convnext.py:21-119).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (tests patch)

_TILE_H = 8  # spatial rows per grid step (H must divide)


def _block_kernel(top_ref, mid_ref, bot_ref, k_ref, kb_ref, ls_ref, lb_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref,
                  *, eps: float, approximate: bool, n_tiles: int):
    t = pl.program_id(1)
    tile_h = mid_ref.shape[1]
    W = mid_ref.shape[2]
    C = mid_ref.shape[3]

    mid = mid_ref[0].astype(jnp.float32)  # (tile_h, W, C)
    top = jnp.where(t > 0, top_ref[0, tile_h - 3:].astype(jnp.float32), 0.0)
    bot = jnp.where(t < n_tiles - 1, bot_ref[0, :3].astype(jnp.float32), 0.0)
    win = jnp.concatenate([top, mid, bot], axis=0)  # (tile_h+6, W, C)
    win = jnp.pad(win, ((0, 0), (3, 3), (0, 0)))    # horizontal halo

    # 7x7 depthwise conv: 49 VPU fmas over the (tile_h, W, C) tile
    k = k_ref[:].astype(jnp.float32)  # (49, C)
    acc = jnp.zeros((tile_h, W, C), jnp.float32)
    for dh in range(7):
        for dw in range(7):
            acc = acc + win[dh:dh + tile_h, dw:dw + W] * k[dh * 7 + dw]
    acc = acc + kb_ref[:]  # (1, C) broadcast

    # LN -> Dense(4C) -> GELU -> Dense(C) -> *gamma, rows = tile_h*W
    y = acc.reshape(tile_h * W, C)
    mean = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=1, keepdims=True)
    h0 = (y - mean) * jax.lax.rsqrt(var + eps)
    h0 = h0 * ls_ref[:] + lb_ref[:]
    dt = mid_ref.dtype
    h1 = jax.lax.dot_general(h0.astype(dt), w1_ref[:],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = jax.nn.gelu(h1 + b1_ref[:], approximate=approximate)
    out = jax.lax.dot_general(h1.astype(dt), w2_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = (out + b2_ref[:]) * g_ref[:]
    out = out.reshape(tile_h, W, C) + mid  # residual = the block input
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_block(x, k49, kb, ls, lb, w1, b1, w2, b2, g, eps, approximate,
                  tile_h):
    B, H, W, C = x.shape
    Hdim = w1.shape[1]
    n_tiles = H // tile_h
    xtile = lambda off: pl.BlockSpec(  # noqa: E731
        (1, tile_h, W, C),
        lambda b, t: (b, jnp.clip(t + off, 0, n_tiles - 1), 0, 0),
    )
    full = lambda b, t: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_block_kernel, eps=eps, approximate=approximate,
                          n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B, n_tiles),
        in_specs=[
            xtile(-1), xtile(0), xtile(+1),
            pl.BlockSpec((49, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((C, Hdim), full),
            pl.BlockSpec((1, Hdim), full),
            pl.BlockSpec((Hdim, C), full),
            pl.BlockSpec((1, C), full),
            pl.BlockSpec((1, C), full),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, C), lambda b, t: (b, t, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, x, x, k49, kb, ls, lb, w1, b1, w2, b2, g)
    return out


def _xla_reference(x, k49, kb, ls, lb, w1, b1, w2, b2, g, eps, approximate):
    """Plain-ops chain (dwconv -> LN -> MLP -> LS -> +residual); the
    custom-vjp backward differentiates this (recompute)."""
    C = x.shape[-1]
    dt = x.dtype
    kern = k49.reshape(7, 7, 1, C).astype(dt)  # HWIO, feature groups = C
    y = jax.lax.conv_general_dilated(
        x, kern, (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    ).astype(jnp.float32) + kb[0]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    h0 = ((y - mean) * jax.lax.rsqrt(var + eps) * ls[0] + lb[0]).astype(dt)
    h1 = jax.lax.dot_general(h0, w1, (((3,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = jax.nn.gelu(h1 + b1[0], approximate=approximate)
    out = jax.lax.dot_general(h1.astype(dt), w2, (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = (out + b2[0]) * g[0]
    return (x.astype(jnp.float32) + out).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _block_core(x, k49, kb, ls, lb, w1, b1, w2, b2, g, eps, approximate,
                tile_h):
    return _pallas_block(x, k49, kb, ls, lb, w1, b1, w2, b2, g, eps,
                         approximate, tile_h)


def _block_fwd(x, k49, kb, ls, lb, w1, b1, w2, b2, g, eps, approximate,
               tile_h):
    out = _pallas_block(x, k49, kb, ls, lb, w1, b1, w2, b2, g, eps,
                        approximate, tile_h)
    return out, (x, k49, kb, ls, lb, w1, b1, w2, b2, g)


def _block_bwd(eps, approximate, tile_h, saved, dout):
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, eps, approximate), *saved
    )
    return vjp(dout)


_block_core.defvjp(_block_fwd, _block_bwd)


def fused_convnext_block(
    x: jnp.ndarray,
    dw_kernel: jnp.ndarray,   # (7, 7, 1, C) HWIO or (7, 7, C)
    dw_bias: jnp.ndarray,     # (C,)
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
    tile_h: int = _TILE_H,
) -> jnp.ndarray:
    """Whole ConvNeXt block as one Pallas kernel (see module docstring).
    Requires H % tile_h == 0 and W >= 7 (the caller gates geometry)."""
    B, H, W, C = x.shape
    if H % tile_h or W < 7:
        raise ValueError(f"geometry ({H},{W}) not tileable by {tile_h}")
    k49 = jnp.asarray(dw_kernel, jnp.float32).reshape(49, C)
    as_row = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)  # noqa: E731
    g = jnp.ones((C,), jnp.float32) if gamma is None else gamma
    return _block_core(
        x, k49, as_row(dw_bias, C), as_row(ln_scale, C), as_row(ln_bias, C),
        w1, as_row(b1, w1.shape[1]), w2, as_row(b2, C), as_row(g, C),
        eps, approximate_gelu, tile_h,
    )
