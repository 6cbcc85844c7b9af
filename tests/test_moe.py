"""Mixture-of-Experts MLP + expert parallelism tests.

No reference analog (the reference's MLPs are dense and its only
parallelism is DDP, SURVEY §2.8); this is the capacity-scaling extension
for the 'model' mesh axis. Covers: dispatch/combine algebra (identical
experts == dense MLP), aux-loss values, capacity dropping, gradient flow,
full-model integration, train-step aux collection under both accumulation
modes, and EP sharding on the 8-device CPU mesh with loss parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from linnaeus_tpu.data.collate import MixConfig
from linnaeus_tpu.loss import soft_target_cross_entropy
from linnaeus_tpu.models import MFormerV1
from linnaeus_tpu.models.blocks.common import Mlp
from linnaeus_tpu.models.blocks.moe import MoEMlp
from linnaeus_tpu.train.state import create_train_state
from linnaeus_tpu.train.step import ScheduleScalars, make_train_step

TASKS = ("taxa_L10", "taxa_L20")
NUM_CLASSES = {"taxa_L10": 6, "taxa_L20": 3}
META_DIM = 5


def tiny_moe_model(num_experts=4, top_k=2, capacity_factor=2.0, every_n=1):
    return MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(2, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        moe_num_experts=num_experts,
        moe_top_k=top_k,
        moe_capacity_factor=capacity_factor,
        moe_every_n=every_n,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=TASKS,
        num_classes=NUM_CLASSES,
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
    )


def make_batch(rng, b=8):
    k1, k2, k3 = jax.random.split(rng, 3)
    targets = {}
    for t in TASKS:
        idx = jax.random.randint(k2, (b,), 0, NUM_CLASSES[t])
        targets[t] = jax.nn.one_hot(idx, NUM_CLASSES[t])
    return {
        "images": jax.random.normal(k1, (b, 32, 32, 3)),
        "targets": targets,
        "aux": jax.random.normal(k3, (b, META_DIM)),
        "group_ids": jnp.array([0, 0, 1, 1, 2, 2, 3, 3]),
    }


# ---------------------------------------------------------------- block unit


def test_moe_matches_dense_mlp_with_identical_experts():
    """With every expert holding the SAME weights and ample capacity, the
    routed output must equal the dense MLP exactly (gates sum to 1) — this
    pins the dispatch/combine algebra."""
    B, N, D, F, E = 4, 12, 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    dense = Mlp(hidden_features=F, out_features=D)
    dv = dense.init(jax.random.PRNGKey(2), x)
    p = dv["params"]
    moe = MoEMlp(dim=D, hidden_features=F, num_experts=E, top_k=2,
                 capacity_factor=float(E))  # C >= N*k/E * E -> no drops
    mv = moe.init(jax.random.PRNGKey(1), x)
    params = dict(mv["params"])
    params["wi"] = jnp.broadcast_to(p["Dense_0"]["kernel"], (E, D, F))
    params["bi"] = jnp.broadcast_to(p["Dense_0"]["bias"], (E, F))
    params["wo"] = jnp.broadcast_to(p["Dense_1"]["kernel"], (E, F, D))
    params["bo"] = jnp.broadcast_to(p["Dense_1"]["bias"], (E, D))
    y_moe = moe.apply({"params": params}, x, deterministic=True)
    y_dense = dense.apply(dv, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense),
                               atol=1e-5)


def test_moe_uniform_router_aux_loss_is_one():
    """Zero router -> uniform probs -> Switch load-balance loss == 1."""
    B, N, D, F, E = 2, 10, 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    moe = MoEMlp(dim=D, hidden_features=F, num_experts=E, top_k=2,
                 capacity_factor=4.0)
    v = moe.init(jax.random.PRNGKey(1), x)
    params = dict(v["params"])
    params["router"] = jnp.zeros_like(params["router"])
    _, inter = moe.apply({"params": params}, x, deterministic=True,
                         mutable=["intermediates"])
    aux = float(inter["intermediates"]["moe_aux_loss"][0])
    assert abs(aux - 1.0) < 1e-5


def test_moe_capacity_dropping_is_graceful():
    """Tiny capacity drops tokens (positive drop_frac) without NaNs; dropped
    tokens produce zero MoE output (residual passthrough in the block)."""
    B, N, D, F = 2, 16, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    moe = MoEMlp(dim=D, hidden_features=F, num_experts=4, top_k=2,
                 capacity_factor=0.25)
    v = moe.init(jax.random.PRNGKey(1), x)
    y, inter = moe.apply(v, x, deterministic=True, mutable=["intermediates"])
    drop = float(inter["intermediates"]["moe_drop_frac"][0])
    assert 0.0 < drop < 1.0
    assert bool(jnp.isfinite(y).all())


def test_moe_gradients_flow_to_router_and_experts():
    B, N, D, F = 2, 8, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    moe = MoEMlp(dim=D, hidden_features=F, num_experts=4, top_k=2,
                 capacity_factor=2.0)
    v = moe.init(jax.random.PRNGKey(1), x)

    def loss(params):
        y, inter = moe.apply({"params": params}, x, deterministic=True,
                             mutable=["intermediates"])
        # aux loss is the router's gradient path (combine gates also reach
        # it through y, but aux is the standard balance signal)
        return jnp.sum(y ** 2) + inter["intermediates"]["moe_aux_loss"][0]

    g = jax.grad(loss)(v["params"])
    assert float(jnp.linalg.norm(g["router"])) > 0
    assert float(jnp.linalg.norm(g["wi"])) > 0
    assert float(jnp.linalg.norm(g["wo"])) > 0


# ------------------------------------------------------------- model + step


def test_mformer_v1_moe_param_tree_and_forward():
    model = tiny_moe_model(every_n=2)  # stage3: blocks 0,1 -> block1 MoE
    batch = make_batch(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), batch["images"], batch["aux"])
    params = variables["params"]
    # every_n=2: stage3_block1 is MoE, stage3_block0 stays dense
    assert "wi" in params["stage3_block1"]["mlp"]
    assert "router" in params["stage3_block1"]["mlp"]
    assert "Dense_0" in params["stage3_block0"]["mlp"]
    out = model.apply({"params": params}, batch["images"], batch["aux"],
                      deterministic=True)
    for t in TASKS:
        assert out[t].shape == (8, NUM_CLASSES[t])
        assert bool(jnp.isfinite(out[t]).all())


@pytest.mark.parametrize("accum", [1, 2])
def test_train_step_collects_moe_aux(accum):
    model = tiny_moe_model(every_n=1)
    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["aux"]
    )["params"]
    tx = optax.adamw(1e-3)
    state = create_train_state(
        model, params, tx, num_tasks=len(TASKS), rng=jax.random.PRNGKey(7)
    )
    criteria = {t: soft_target_cross_entropy for t in TASKS}
    step = make_train_step(
        criteria, TASKS, MixConfig(chunk_bounds=((0, 2), (2, 5))),
        clip_grad=5.0, accumulation_steps=accum,
        moe_aux_weight=0.01, moe_z_weight=0.001,
    )
    new_state, metrics = jax.jit(step)(state, batch, ScheduleScalars.zeros(META_DIM))
    for key in ("moe_aux", "moe_z", "moe_drop_frac"):
        assert key in metrics, f"{key} missing under accum={accum}"
        assert np.isfinite(float(metrics[key]))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_moe_aux_weight_changes_total_loss():
    """The weighted aux loss must actually enter the optimized total."""
    model = tiny_moe_model(every_n=1)
    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["aux"]
    )["params"]
    tx = optax.sgd(0.0)  # frozen params -> losses comparable
    criteria = {t: soft_target_cross_entropy for t in TASKS}
    losses = {}
    for w in (0.0, 10.0):
        state = create_train_state(
            model, params, tx, num_tasks=len(TASKS), rng=jax.random.PRNGKey(7)
        )
        step = make_train_step(
            criteria, TASKS, MixConfig(chunk_bounds=((0, 2), (2, 5))),
            moe_aux_weight=w, moe_z_weight=0.0,
        )
        _, metrics = jax.jit(step)(state, batch, ScheduleScalars.zeros(META_DIM))
        losses[w] = float(metrics["loss"])
    assert losses[10.0] > losses[0.0] + 0.5  # aux ~ 1.0 at near-uniform routing


# --------------------------------------------------------------- EP sharding


def test_ep_param_sharding_specs_and_loss_parity():
    """dp x ep on the 8-CPU mesh: expert banks shard over 'model', the step
    executes, and the loss matches the fully-replicated run exactly (SPMD
    partitions the computation, not the math)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from linnaeus_tpu.parallel.mesh import (
        create_mesh, ep_param_sharding, replicate, shard_batch,
    )

    model = tiny_moe_model(num_experts=4, every_n=1)
    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["aux"]
    )["params"]
    tx = optax.adamw(1e-3)
    state = create_train_state(
        model, params, tx, num_tasks=len(TASKS), rng=jax.random.PRNGKey(7)
    )
    criteria = {t: soft_target_cross_entropy for t in TASKS}
    step = make_train_step(
        criteria, TASKS, MixConfig(chunk_bounds=((0, 2), (2, 5))),
        clip_grad=5.0, moe_aux_weight=0.01, moe_z_weight=0.001,
    )
    scalars = ScheduleScalars.zeros(META_DIM)

    # replicated dp reference
    mesh = create_mesh(devices=jax.devices()[:8])
    dp_state = replicate(state, mesh)
    dp_batch = shard_batch(batch, mesh)
    _, dp_metrics = jax.jit(step)(dp_state, dp_batch, scalars)
    dp_loss = float(dp_metrics["loss"])

    # (data=2, model=4) expert-parallel
    ep_mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model")
    )
    specs = ep_param_sharding(ep_mesh, state.params)
    from flax.traverse_util import flatten_dict

    flat_specs = flatten_dict(specs, sep="/")
    for leaf in ("wi", "wo", "bi", "bo"):
        key = f"stage3_block0/mlp/{leaf}"
        assert flat_specs[key].spec[0] == "model", key
    assert flat_specs["stage3_block0/mlp/router"].spec == P()
    assert flat_specs["stem/Conv_0/kernel"].spec == P()

    from linnaeus_tpu.parallel.mesh import reshard_train_state

    ep_state = reshard_train_state(state, ep_mesh, tx, specs)
    ep_batch = shard_batch(batch, ep_mesh)
    new_ep, ep_metrics = jax.jit(step)(ep_state, ep_batch, scalars)
    ep_loss = float(ep_metrics["loss"])
    assert abs(ep_loss - dp_loss) < 1e-3, f"{ep_loss} vs {dp_loss}"
    # updated expert banks keep their sharding (no silent gather)
    wi = new_ep.params["stage3_block0"]["mlp"]["wi"]
    assert wi.sharding.spec[0] == "model"


def test_ep_sharding_requires_moe_model():
    from linnaeus_tpu.parallel.mesh import ep_param_sharding
    from linnaeus_tpu.models import MFormerV1

    dense = MFormerV1(
        img_size=(32, 32), convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64), rope_depths=(1, 1),
        rope_dims=(32, 64), rope_num_heads=(2, 2), drop_path_rate=0.0,
        task_keys=TASKS, num_classes=NUM_CLASSES,
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
    )
    x = jnp.zeros((2, 32, 32, 3))
    params = dense.init(jax.random.PRNGKey(0), x, None)["params"]
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model")
    )
    with pytest.raises(ValueError, match="ZERO parameters"):
        ep_param_sharding(mesh, params)


def test_tp_sharding_covers_expert_banks():
    """tp on an MoE model shards BOTH the dense-block projections and the
    expert banks (tensor + expert parallelism compose)."""
    from flax.traverse_util import flatten_dict
    from linnaeus_tpu.parallel.mesh import tp_param_sharding

    model = tiny_moe_model(num_experts=4, every_n=2)
    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["aux"]
    )["params"]
    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model")
    )
    specs = flatten_dict(tp_param_sharding(mesh, params), sep="/")
    assert specs["stage3_block1/mlp/wi"].spec[0] == "model"
    assert specs["stage3_block0/mlp/Dense_0/kernel"].spec[1] == "model"


def test_build_model_rejects_moe_on_v0():
    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.models.build import build_model

    cfg = get_default_config()
    cfg.defrost()
    cfg.MODEL.TYPE = "mFormerV0"
    cfg.MODEL.MOE.ENABLED = True
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10"]
    cfg.freeze()
    with pytest.raises(ValueError, match="MOE"):
        build_model(cfg, num_classes={"taxa_L10": 4})


def test_moe_mlp_dropout_active_in_training():
    """MODEL.DROP_RATE must regularize MoE expert MLPs exactly like the
    dense Mlp path (review finding: MoE blocks silently dropped dropout)."""
    B, N, D, F, E = 2, 8, 16, 32, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    moe = MoEMlp(dim=D, hidden_features=F, num_experts=E, top_k=2,
                 capacity_factor=4.0, drop=0.5)
    v = moe.init(jax.random.PRNGKey(1), x)
    det = moe.apply(v, x, deterministic=True)
    tr1 = moe.apply(v, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    tr2 = moe.apply(v, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)})
    # dropout fires in training (stochastic, differs from eval) and eval is
    # deterministic
    assert not np.allclose(np.asarray(det), np.asarray(tr1))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    det2 = moe.apply(v, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
