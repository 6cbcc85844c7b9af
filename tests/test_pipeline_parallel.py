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


# ---------------------------------------------------------------- model-level
def _pp_tiny_model(pipeline_mesh=None, microbatches=0):
    """Tiny mFormerV1 with a pipelinable stage-3 tower (depth 2 = one block
    per stage on a 2-way model axis). Per-block param trees are identical
    with and without pipeline_mesh — checkpoints interoperate."""
    from linnaeus_tpu.models import MFormerV1

    return MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(2, 2),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=("taxa_L10", "taxa_L20"),
        num_classes={"taxa_L10": 11, "taxa_L20": 5},
        head_configs={
            "taxa_L10": {"TYPE": "Linear"},
            "taxa_L20": {"TYPE": "Linear"},
        },
        pipeline_mesh=pipeline_mesh,
        pipeline_microbatches=microbatches,
    )


def test_mformer_v1_pipelined_towers_match_sequential():
    """PARALLEL.PIPELINE semantics at the model level: cloning in a
    pipeline_mesh routes BOTH RoPE towers (depths divisible by the stage
    count) through pipeline_forward with logit parity vs the sequential
    path on the same params."""
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    seq = _pp_tiny_model()
    pp = _pp_tiny_model(pipeline_mesh=mesh, microbatches=2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 32, 32, 3))
    aux = jax.random.normal(jax.random.fold_in(rng, 1), (8, 5))
    params = seq.init(jax.random.PRNGKey(1), x, aux)["params"]
    want = seq.apply({"params": params}, x, aux, deterministic=True)
    got = jax.jit(
        lambda p, x, aux: pp.apply({"params": p}, x, aux, deterministic=True)
    )(params, x, aux)
    for t in ("taxa_L10", "taxa_L20"):
        np.testing.assert_allclose(
            np.asarray(got[t]), np.asarray(want[t]), atol=2e-5,
        )


def test_mformer_v1_pipelined_grads_match_sequential():
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    seq = _pp_tiny_model()
    pp = _pp_tiny_model(pipeline_mesh=mesh, microbatches=2)
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (8, 32, 32, 3))
    aux = jax.random.normal(jax.random.fold_in(rng, 1), (8, 5))
    params = seq.init(jax.random.PRNGKey(1), x, aux)["params"]

    def loss(model):
        def f(p):
            out = model.apply({"params": p}, x, aux, deterministic=True)
            return sum(jnp.mean(v**2) for v in out.values())

        return f

    g_seq = jax.grad(loss(seq))(params)
    g_pp = jax.jit(jax.grad(loss(pp)))(params)
    leaves_seq = jax.tree_util.tree_leaves_with_path(g_seq)
    leaves_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    assert len(leaves_seq) == len(leaves_pp)
    for (k1, v1), (k2, v2) in zip(leaves_seq, leaves_pp):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), atol=5e-5,
            err_msg=jax.tree_util.keystr(k1),
        )


def test_mformer_v1_pipeline_validations():
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    x = jnp.zeros((8, 32, 32, 3))
    aux = jnp.zeros((8, 5))
    from linnaeus_tpu.models import MFormerV1

    # stage-3 depth not divisible by the stage count
    bad = _pp_tiny_model(pipeline_mesh=mesh).clone(rope_depths=(3, 2))
    with pytest.raises(ValueError, match="not divisible"):
        bad.init(jax.random.PRNGKey(0), x, aux)
    # stochastic depth can't thread through the pipelined scan
    bad = _pp_tiny_model(pipeline_mesh=mesh).clone(drop_path_rate=0.1)
    with pytest.raises(ValueError, match="DROP_PATH_RATE"):
        bad.init(jax.random.PRNGKey(0), x, aux)
    # MoE towers are non-uniform
    bad = _pp_tiny_model(pipeline_mesh=mesh).clone(
        moe_num_experts=4, moe_every_n=1
    )
    with pytest.raises(ValueError, match="uniform"):
        bad.init(jax.random.PRNGKey(0), x, aux)


def test_mformer_v1_pipelined_remat_matches_sequential():
    """gradient_checkpointing must survive the pipeline route: the proto is
    blocks[0] cloned (keeps the nn.remat wrapper), so grads match the
    sequential remat'd path — and memory behavior is remat's, not full
    activation storage (the beyond-one-chip configs pp exists for need it)."""
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    seq = _pp_tiny_model().clone(gradient_checkpointing=True)
    pp = _pp_tiny_model(pipeline_mesh=mesh, microbatches=2).clone(
        gradient_checkpointing=True
    )
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (8, 32, 32, 3))
    aux = jax.random.normal(jax.random.fold_in(rng, 1), (8, 5))
    params = seq.init(jax.random.PRNGKey(1), x, aux)["params"]

    def loss(model):
        def f(p):
            out = model.apply({"params": p}, x, aux, deterministic=True)
            return sum(jnp.mean(v**2) for v in out.values())

        return f

    g_seq = jax.grad(loss(seq))(params)
    g_pp = jax.jit(jax.grad(loss(pp)))(params)
    for (k1, v1), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(g_seq),
        jax.tree_util.tree_leaves_with_path(g_pp),
    ):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v1), atol=5e-5,
            err_msg=jax.tree_util.keystr(k1),
        )
