"""Pallas fused ConvNeXt-MLP correctness (interpret mode on CPU devices).

On real TPU the kernel compiles through Mosaic; interpret mode executes the
same tiling/padding/LN/matmul logic, so these tests catch semantic bugs
(padding rows, layer-scale, residual routing, custom-vjp backward) without
TPU hardware. Measured routing evidence lives in docs/performance.md.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import linnaeus_tpu.ops.fused_mlp as fm
from linnaeus_tpu.models.blocks.convnext import ConvNeXtBlock


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        fm.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _inputs(M=70, C=16, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    y = jax.random.normal(ks[0], (M, C), dtype)
    x = jax.random.normal(ks[1], (M, C), dtype)
    ls = jax.random.normal(ks[2], (C,)) * 0.1 + 1.0
    lb = jax.random.normal(ks[3], (C,)) * 0.1
    w1 = (jax.random.normal(ks[4], (C, 4 * C)) * 0.1).astype(dtype)
    b1 = jax.random.normal(ks[5], (4 * C,)) * 0.1
    w2 = (jax.random.normal(ks[6], (4 * C, C)) * 0.1).astype(dtype)
    b2 = jax.random.normal(ks[7], (C,)) * 0.1
    g = jnp.full((C,), 0.5, jnp.float32)
    return y, x, ls, lb, w1, b1, w2, b2, g


def _ref(y, x, ls, lb, w1, b1, w2, b2, g, approximate=True):
    row = lambda v: jnp.asarray(v, jnp.float32)[None, :]  # noqa: E731
    return fm._xla_reference(
        y, y if x is None else x, row(ls), row(lb), w1, row(b1), w2, row(b2),
        row(g), 1e-6, approximate, x is not None,
    )


def test_matches_reference_including_padding_rows():
    # M=70 is not a multiple of any block size -> exercises the pad+slice
    y, x, *rest = _inputs(M=70)
    out = fm.fused_convnext_mlp(y, x, *rest)
    ref = _ref(y, x, *rest)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_no_residual_and_no_gamma():
    y, x, ls, lb, w1, b1, w2, b2, _ = _inputs(M=64)
    out = fm.fused_convnext_mlp(y, None, ls, lb, w1, b1, w2, b2, None)
    ref = _ref(y, None, ls, lb, w1, b1, w2, b2, jnp.ones((y.shape[-1],)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_nd_input_and_exact_gelu():
    y4 = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 6, 16))
    x4 = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, 16))
    _, _, *rest = _inputs(C=16)
    out = fm.fused_convnext_mlp(y4, x4, *rest, approximate_gelu=False)
    assert out.shape == y4.shape
    ref = _ref(y4.reshape(-1, 16), x4.reshape(-1, 16), *rest,
               approximate=False).reshape(y4.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bf16_matches_reference_chain():
    y, x, *rest = _inputs(M=64, dtype=jnp.bfloat16)
    out = fm.fused_convnext_mlp(y, x, *rest)
    assert out.dtype == jnp.bfloat16
    ref = _ref(y, x, *rest)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-2
    )


def test_custom_vjp_matches_autodiff_of_reference():
    y, x, ls, lb, w1, b1, w2, b2, g = _inputs(M=48)

    def loss_fused(args):
        return jnp.sum(jnp.square(fm.fused_convnext_mlp(*args)))

    def loss_ref(args):
        return jnp.sum(jnp.square(_ref(*args)))

    args = (y, x, ls, lb, w1, b1, w2, b2, g)
    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def _block_pair(fused):
    return ConvNeXtBlock(dim=16, drop_path=0.0, fused_mlp=fused)


def test_block_fused_param_tree_identical_and_outputs_match():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    v_plain = _block_pair(False).init(jax.random.PRNGKey(1), x)
    v_fused = _block_pair(True).init(jax.random.PRNGKey(1), x)
    ptree = lambda v: jax.tree.map(lambda a: (a.shape, a.dtype), v)  # noqa: E731
    assert ptree(v_plain) == ptree(v_fused)
    # identical init rngs -> identical params -> outputs must agree
    out_p = _block_pair(False).apply(v_plain, x)
    out_f = _block_pair(True).apply(v_plain, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-5)


def test_block_fused_gradients_match_plain():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    v = _block_pair(False).init(jax.random.PRNGKey(1), x)

    def loss(variables, fused):
        return jnp.sum(jnp.square(_block_pair(fused).apply(variables, x)))

    gp = jax.grad(loss)(v, False)
    gf = jax.grad(loss)(v, True)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_block_fused_droppath_branch():
    """drop_path > 0 and deterministic=False routes residual outside the
    kernel; with a fixed rng the surviving samples must equal the plain
    path exactly."""
    blk_f = ConvNeXtBlock(dim=16, drop_path=0.5, fused_mlp=True)
    blk_p = ConvNeXtBlock(dim=16, drop_path=0.5, fused_mlp=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 16))
    v = blk_p.init(jax.random.PRNGKey(1), x)
    rng = {"dropout": jax.random.PRNGKey(7)}
    out_f = blk_f.apply(v, x, False, rngs=rng)
    out_p = blk_p.apply(v, x, False, rngs=rng)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-5)


def test_auto_routing_is_off_on_cpu():
    # auto mode must never route into Mosaic on a CPU backend
    assert not fm.fused_mlp_profitable(64, 96, 96, 96)


def test_routing_rule_channel_gates(monkeypatch):
    # pin the measured channel cutoffs on a (pretend) TPU backend
    monkeypatch.setattr(fm.jax, "default_backend", lambda: "tpu")
    # serving: wins through C=192 (sm/lg), loses at C=256 (xl)
    assert fm.fused_mlp_profitable(64, 56, 56, 96)
    assert fm.fused_mlp_profitable(64, 56, 56, 192)
    assert not fm.fused_mlp_profitable(32, 56, 56, 256)
    # training: C=96 everywhere the geometry admits; C=192 only on
    # maps <= 48x48 (sm 384px stage 2 wins, lg 224px stage 1 loses)
    assert fm.fused_mlp_profitable(64, 96, 96, 96, grad=True)
    assert fm.fused_mlp_profitable(64, 48, 48, 192, grad=True)
    assert not fm.fused_mlp_profitable(64, 56, 56, 192, grad=True)
    assert not fm.fused_mlp_profitable(32, 96, 96, 256, grad=True)
    # geometry gate unchanged: B=128 and small totals stay off
    assert not fm.fused_mlp_profitable(128, 56, 56, 96)
    assert not fm.fused_mlp_profitable(16, 56, 56, 96)


def test_autodiff_active_detection():
    """Routing must see through tracers: a deterministic=True forward
    under jax.grad takes the training gate, a plain jit forward the
    serving gate."""
    seen = []

    def f(x):
        seen.append(fm.autodiff_active(x))
        return jnp.sum(x * x)

    x = jnp.ones((4,))
    jax.jit(f)(x)
    assert seen == [False]
    seen.clear()
    jax.grad(f)(x)
    assert seen == [True]
    seen.clear()
    jax.jit(jax.grad(f))(x)
    assert seen == [True]
    seen.clear()
    jax.vmap(jax.grad(f))(jnp.ones((2, 4)))
    assert seen and all(seen)
    # concrete values are not "under autodiff"
    assert not fm.autodiff_active(x)


@pytest.mark.parametrize("approximate", [True, False])
@pytest.mark.parametrize("add_residual", [True, False])
def test_pallas_backward_matches_autodiff(monkeypatch, approximate,
                                          add_residual):
    """The hand-written backward kernel (recompute-in-VMEM, grid-accumulated
    weight grads) must match autodiff of the reference chain."""
    monkeypatch.setattr(fm, "_FORCE_KERNEL_BWD", True)
    y, x, ls, lb, w1, b1, w2, b2, g = _inputs(M=70)  # exercises dout padding

    def loss_fused(args):
        out = fm.fused_convnext_mlp(
            args[0], args[1] if add_residual else None, *args[2:],
            approximate_gelu=approximate)
        return jnp.sum(jnp.sin(out))

    def loss_ref(args):
        out = _ref(args[0], args[1] if add_residual else None, *args[2:],
                   approximate=approximate)
        return jnp.sum(jnp.sin(out))

    args = (y, x, ls, lb, w1, b1, w2, b2, g)
    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    names = "y x ls lb w1 b1 w2 b2 g".split()
    for nm, a, b in zip(names, gf, gr):
        if nm == "x" and not add_residual:
            continue  # unused slot: kernel path returns zeros
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)


def test_pallas_backward_wide_channel_tiling(monkeypatch):
    """C > 128 takes the small row tile; weight-grad accumulation must span
    multiple grid steps."""
    monkeypatch.setattr(fm, "_FORCE_KERNEL_BWD", True)
    monkeypatch.setattr(fm, "_BWD_BLOCK_M_WIDE", 32)
    y, x, ls, lb, w1, b1, w2, b2, g = _inputs(M=80, C=136)

    def loss(fn):
        return jax.grad(
            lambda a: jnp.sum(jnp.square(fn(*a)))
        )((y, x, ls, lb, w1, b1, w2, b2, g))

    gf = loss(lambda *a: fm.fused_convnext_mlp(*a))
    gr = loss(lambda *a: _ref(*a))
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
