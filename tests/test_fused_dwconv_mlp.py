"""Pallas fused ConvNeXt BLOCK (dwconv+LN+MLP) correctness — interpret mode
on CPU (same approach as test_fused_mlp.py). The halo logic (three-tile
vertical window, boundary zero-masking, horizontal pad) is where the bugs
would live; these tests pin it against the plain-XLA chain at sizes that
exercise first/last tiles and multi-batch grids. Perf evidence lives in
docs/performance.md (round-4 fused-block A/B)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import linnaeus_tpu.ops.fused_dwconv_mlp as fb


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        fb.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _inputs(B=2, H=16, W=12, C=8, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    x = jax.random.normal(ks[0], (B, H, W, C), dtype)
    k = jax.random.normal(ks[1], (7, 7, C)) * 0.2
    kb = jax.random.normal(ks[2], (C,)) * 0.1
    ls = jax.random.normal(ks[3], (C,)) * 0.1 + 1.0
    lb = jax.random.normal(ks[4], (C,)) * 0.1
    w1 = (jax.random.normal(ks[5], (C, 4 * C)) * 0.1).astype(dtype)
    b1 = jax.random.normal(ks[6], (4 * C,)) * 0.1
    w2 = (jax.random.normal(ks[7], (4 * C, C)) * 0.1).astype(dtype)
    b2 = jax.random.normal(ks[8], (C,)) * 0.1
    g = jnp.full((C,), 0.5, jnp.float32)
    return x, k, kb, ls, lb, w1, b1, w2, b2, g


def _ref(x, k, kb, ls, lb, w1, b1, w2, b2, g):
    row = lambda v: jnp.asarray(v, jnp.float32)[None, :]  # noqa: E731
    return fb._xla_reference(
        x, jnp.asarray(k, jnp.float32).reshape(49, x.shape[-1]), row(kb),
        row(ls), row(lb), w1, row(b1), w2, row(b2), row(g), 1e-6, True,
    )


def test_matches_reference_multi_tile():
    # H=16 with tile_h=4 -> 4 tiles: first/last tiles exercise the
    # zero-masked halo slabs, middle tiles the three-tile window
    args = _inputs()
    out = fb.fused_convnext_block(
        args[0], *args[1:], tile_h=4
    )
    ref = _ref(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_single_tile_per_image():
    # one tile per image: BOTH halo slabs are boundary-masked
    args = _inputs(B=1, H=8, W=9, C=8)
    out = fb.fused_convnext_block(args[0], *args[1:], tile_h=8)
    ref = _ref(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_bf16_storage():
    args = _inputs(dtype=jnp.bfloat16, seed=3)
    out = fb.fused_convnext_block(args[0], *args[1:], tile_h=4)
    ref = _ref(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.15, rtol=0.08,
    )


def test_backward_matches_reference_chain():
    args = _inputs(B=1, H=8, W=8, C=8, seed=5)

    def loss_fused(x, k, kb, ls, lb, w1, b1, w2, b2, g):
        return jnp.sum(
            fb.fused_convnext_block(
                x, k, kb, ls, lb, w1, b1, w2, b2, g, tile_h=4
            ).astype(jnp.float32) ** 2
        )

    def loss_ref(x, k, kb, ls, lb, w1, b1, w2, b2, g):
        return jnp.sum(_ref(x, k, kb, ls, lb, w1, b1, w2, b2, g)
                       .astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 3, 5))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 3, 5))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_geometry_gate():
    args = _inputs(B=1, H=10, W=8, C=8)
    with pytest.raises(ValueError, match="not tileable"):
        fb.fused_convnext_block(args[0], *args[1:], tile_h=4)
