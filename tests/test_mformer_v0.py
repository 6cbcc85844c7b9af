"""mFormerV0 tests: forward shapes, BatchNorm stats mutation, train step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from linnaeus_tpu.configuration import get_default_config
from linnaeus_tpu.data.collate import MixConfig
from linnaeus_tpu.loss import soft_target_cross_entropy
from linnaeus_tpu.models import MFormerV0, build_model
from linnaeus_tpu.models.blocks.relative_mhsa import build_relative_position_index
from linnaeus_tpu.train.state import create_train_state
from linnaeus_tpu.train.step import ScheduleScalars, make_train_step

TASKS = ("taxa_L10", "taxa_L20")


def tiny_v0():
    return MFormerV0(
        img_size=(64, 64),
        stage_dims=(8, 12, 24, 32, 64),
        mbconv_depths=(1, 1),
        attn_depths=(1, 1),
        num_heads=(2, 2),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=TASKS,
        num_classes={"taxa_L10": 7, "taxa_L20": 3},
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
    )


@pytest.fixture(scope="module")
def v0_setup():
    model = tiny_v0()
    x = jnp.ones((2, 64, 64, 3))
    meta = jnp.ones((2, 5))
    variables = model.init(jax.random.PRNGKey(0), x, meta)
    return model, variables


def test_forward_shapes(v0_setup):
    model, variables = v0_setup
    out = model.apply(variables, jnp.ones((2, 64, 64, 3)), jnp.ones((2, 5)))
    assert out["taxa_L10"].shape == (2, 7)
    assert out["taxa_L20"].shape == (2, 3)


def test_batch_stats_update(v0_setup):
    model, variables = v0_setup
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))
    _, mutated = model.apply(
        variables, x, jnp.ones((4, 5)), deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    # running stats moved away from init (zeros mean)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


def test_relative_position_index_properties():
    idx = build_relative_position_index(4, 4, extra=2)
    n = 2 + 16
    assert idx.shape == (n, n)
    num_rel = 7 * 7 + 1
    assert idx.max() == num_rel - 1  # extra rows use the last entry
    # extra rows/cols all share the pad value
    assert (idx[:2, :] == num_rel - 1).all()
    assert (idx[:, :2] == num_rel - 1).all()
    # diagonal of image tokens maps to the center offset (all equal)
    diag = np.diag(idx[2:, 2:])
    assert len(set(diag.tolist())) == 1


def test_v0_train_step_with_batch_stats(v0_setup):
    model, variables = v0_setup
    tx = optax.adamw(1e-3)
    state = create_train_state(
        model, variables["params"], tx, num_tasks=2,
        rng=jax.random.PRNGKey(0), batch_stats=variables["batch_stats"],
    )
    criteria = {t: soft_target_cross_entropy for t in TASKS}
    step = make_train_step(
        criteria, TASKS, MixConfig(),
        clip_grad=5.0,
        num_classes={"taxa_L10": 7, "taxa_L20": 3},
    )
    batch = {
        "images": jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)),
        "targets": {
            "taxa_L10": jnp.array([1, 2, 3, 4]),
            "taxa_L20": jnp.array([1, 2, 1, 2]),
        },
        "aux": jnp.ones((4, 5)),
        "group_ids": jnp.array([0, 0, 1, 1]),
    }
    new_state, metrics = jax.jit(step)(state, batch, ScheduleScalars.zeros(5))
    assert np.isfinite(float(metrics["loss"]))
    # batch stats advanced
    before = jax.tree.leaves(state.batch_stats)
    after = jax.tree.leaves(new_state.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_build_v0_from_config():
    cfg = get_default_config()
    cfg.MODEL.TYPE = "mFormerV0"
    cfg.MODEL.IMG_SIZE = 64
    cfg.MODEL.DROP_PATH_RATE = 0.0
    cfg.MODEL.STAGES.DIMS = [8, 12, 24, 32, 64]
    cfg.MODEL.STAGES.MBCONV_DEPTHS = [1, 1]
    cfg.MODEL.STAGES.ATTN_DEPTHS = [1, 1]
    cfg.MODEL.STAGES.NUM_HEADS = [2, 2]
    cfg.MODEL.STAGES.MLP_RATIO = [2.0, 2.0]
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
    cfg.TRAIN.MIXED_PRECISION.ENABLED = False
    model = build_model(cfg, num_classes={"taxa_L10": 5, "taxa_L20": 2})
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.ones((1, 5)))
    out = model.apply(variables, x, jnp.ones((1, 5)))
    assert out["taxa_L10"].shape == (1, 5)
