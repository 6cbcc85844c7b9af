"""Pallas flash-attention correctness (interpret mode on CPU devices).

On real TPU the same kernel compiles through Mosaic; interpret mode executes
identical index/masking logic, so these tests catch semantic bugs (padding,
online-softmax accumulation, masking) without TPU hardware.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import linnaeus_tpu.ops.flash_attention as fa
from linnaeus_tpu.ops.attention import sdpa_reference


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        fa.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


@pytest.mark.parametrize("n", [128, 300, 580])
def test_forward_matches_reference(n):
    B, H, D = 2, 3, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = [jax.random.normal(kk, (B, H, n, D)) for kk in ks]
    ref = sdpa_reference(q, k, v)
    out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_with_scale():
    B, H, N, D = 1, 2, 200, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = [jax.random.normal(kk, (B, H, N, D)) for kk in ks]
    scale = 0.5
    ref = sdpa_reference(q, k, v, scale=scale)
    out = fa.flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_inputs():
    B, H, N, D = 2, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = [
        jax.random.normal(kk, (B, H, N, D)).astype(jnp.bfloat16) for kk in ks
    ]
    ref = sdpa_reference(q, k, v)
    out = fa.flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_gradients_match_reference():
    B, H, N, D = 1, 2, 130, 32  # non-multiple of block => exercises padding
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = [jax.random.normal(kk, (B, H, N, D)) for kk in ks]

    def loss_flash(q, k, v):
        return (fa.flash_attention(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (sdpa_reference(q, k, v) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("bwd", ["recompute", "kernel"])
def test_both_backward_strategies_match(bwd):
    B, H, N, D = 1, 2, 200, 32
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = [jax.random.normal(kk, (B, H, N, D)) for kk in ks]
    g = jax.grad(
        lambda q: (fa.flash_attention(q, k, v, bwd=bwd) ** 2).sum()
    )(q)
    g_ref = jax.grad(lambda q: (sdpa_reference(q, k, v) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-3)


def test_split_backward_kernels_multiblock():
    """The tiled dQ / dK-dV kernels (used when the padded row exceeds
    MAX_BLOCK) still match reference grads — exercised explicitly with
    128-token blocks since auto_blocks makes every N<=1024 case take the
    fused single-program backward instead."""
    B, H, N, D = 1, 2, 300, 32  # 128-blocks -> 3 q-blocks x 3 k-blocks
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = [jax.random.normal(kk, (B, H, N, D)) for kk in ks]
    g = jax.grad(
        lambda q: (fa.flash_attention(
            q, k, v, bwd="kernel", block_q=128, block_k=128,
            auto_blocks=False,
        ) ** 2).sum()
    )(q)
    g_ref = jax.grad(lambda q: (sdpa_reference(q, k, v) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-3)
