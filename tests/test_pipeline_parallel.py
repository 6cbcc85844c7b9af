"""GPipe pipeline-parallel combinator (parallel/pipeline.py) on the
8-device CPU mesh: exact fwd/bwd parity vs the sequential layer stack, and
a full pipelined train step (no reference analog — the reference scales by
DDP only, utils/distributed.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from linnaeus_tpu.parallel.pipeline import (
    pipeline_forward,
    pipeline_spec,
    stack_layer_params,
    unstack_layer_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)

D = 16


def _block_fn(p, h):
    """One transformer-ish block: LN-free residual MLP (uniform shape)."""
    h2 = jnp.tanh(h @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
    return h + h2


def _layer_params(rng, n_layers):
    ks = jax.random.split(rng, n_layers)
    return [
        {
            "w1": jax.random.normal(k, (D, 2 * D)) * 0.1,
            "b1": jnp.zeros((2 * D,)),
            "w2": jax.random.normal(jax.random.fold_in(k, 1), (2 * D, D)) * 0.1,
            "b2": jnp.zeros((D,)),
        }
        for k in ks
    ]


def _sequential(stacked, x):
    def body(h, p):
        return _block_fn(p, h), None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


@pytest.mark.parametrize("stages,microbatches", [(2, 4), (4, 4), (8, 8)])
def test_pipeline_forward_matches_sequential(stages, microbatches):
    mesh = Mesh(
        np.array(jax.devices()[:stages]).reshape(1, stages), ("data", "model")
    )
    layers = _layer_params(jax.random.PRNGKey(0), n_layers=stages * 2)
    stacked = stack_layer_params(layers)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 7, D))

    want = _sequential(stacked, x)
    got = pipeline_forward(
        _block_fn, stacked, x, mesh, num_microbatches=microbatches
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pipeline_grads_match_sequential():
    stages, M = 4, 4
    mesh = Mesh(
        np.array(jax.devices()[:stages]).reshape(1, stages), ("data", "model")
    )
    layers = _layer_params(jax.random.PRNGKey(2), n_layers=stages)
    stacked = stack_layer_params(layers)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 5, D))

    def loss_seq(p):
        return jnp.mean(_sequential(p, x) ** 2)

    def loss_pp(p):
        return jnp.mean(
            pipeline_forward(_block_fn, p, x, mesh, num_microbatches=M) ** 2
        )

    g_seq = jax.grad(loss_seq)(stacked)
    g_pp = jax.grad(loss_pp)(stacked)
    for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_pipeline_train_step_under_jit_with_sharded_params():
    """jit a whole optimizer step with the layer axis genuinely sharded over
    'model' and the batch over 'data' (dp x pp)."""
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))
    layers = _layer_params(jax.random.PRNGKey(4), n_layers=8)
    stacked = stack_layer_params(layers)
    stacked = jax.device_put(stacked, pipeline_spec(stacked, mesh))
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 3, D))
    y = jax.random.normal(jax.random.PRNGKey(6), (16, 3, D))
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    y = jax.device_put(y, NamedSharding(mesh, P("data")))
    tx = optax.adamw(1e-2)
    opt_state = tx.init(stacked)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = pipeline_forward(
                _block_fn, p, x, mesh, num_microbatches=4, batch_axis="data"
            )
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = stacked
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # it learns
    # params stayed sharded over the model axis
    leaf = jax.tree.leaves(params)[0]
    assert leaf.sharding.spec[0] == "model"


def test_stack_unstack_roundtrip():
    layers = _layer_params(jax.random.PRNGKey(7), n_layers=4)
    back = unstack_layer_params(stack_layer_params(layers))
    for a, b in zip(layers, back):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_pipeline_validates_divisibility():
    mesh = Mesh(
        np.array(jax.devices()[:4]).reshape(1, 4), ("data", "model")
    )
    layers = _layer_params(jax.random.PRNGKey(8), n_layers=6)  # 6 % 4 != 0
    stacked = stack_layer_params(layers)
    x = jnp.zeros((8, 2, D))
    with pytest.raises(ValueError, match="divisible"):
        pipeline_forward(_block_fn, stacked, x, mesh, num_microbatches=4)
    layers4 = _layer_params(jax.random.PRNGKey(8), n_layers=4)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_forward(
            _block_fn, stack_layer_params(layers4), x, mesh,
            num_microbatches=2,
        )
