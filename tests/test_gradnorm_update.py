"""GradNorm update-fn tests: trunk masking, linear-head bypass, accumulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linnaeus_tpu.loss import (
    cross_entropy,
    init_gradnorm_state,
    make_gradnorm_update_fn,
)
from linnaeus_tpu.models import MFormerV1
from linnaeus_tpu.utils.param_filters import trunk_mask_from_exclude

TASKS = ("t1", "t2")
NC = {"t1": 5, "t2": 3}


@pytest.fixture(scope="module")
def setup():
    model = MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2),),
        task_keys=TASKS,
        num_classes=NC,
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
    )
    images = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    meta = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    params = model.init(jax.random.PRNGKey(0), images, meta)["params"]
    targets = {
        "t1": jax.nn.one_hot(jnp.arange(8) % 5, 5),
        "t2": jax.nn.one_hot(jnp.arange(8) % 3, 3),
    }

    def apply_fn(params, images, meta, deterministic=True, gradnorm_mode=True,
                 batch_stats=None):
        return model.apply({"params": params}, images, meta,
                           deterministic=deterministic,
                           gradnorm_mode=gradnorm_mode)

    exclude_cfg = {
        "TYPE": "or",
        "FILTERS": [
            {"TYPE": "name", "PATTERNS": ["head"]},
            {"TYPE": "name", "PATTERNS": ["meta_"]},
        ],
    }
    trunk_filter = lambda p: trunk_mask_from_exclude(p, exclude_cfg)  # noqa: E731
    criteria = {t: cross_entropy for t in TASKS}
    return apply_fn, trunk_filter, criteria, params, images, targets, meta


def test_gradnorm_update_runs_and_renormalizes(setup):
    apply_fn, trunk_filter, criteria, params, images, targets, meta = setup
    update = make_gradnorm_update_fn(
        apply_fn, criteria, TASKS, trunk_filter, alpha=1.5
    )
    state = init_gradnorm_state(2)
    new_state, metrics = jax.jit(update)(params, images, targets, meta, state)
    w = np.asarray(new_state.task_weights)
    np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-5)
    assert np.all(np.asarray(metrics["gradnorm/norms"]) > 0)
    assert bool(new_state.has_initted)


def test_trunk_mask_excludes_heads(setup):
    apply_fn, trunk_filter, criteria, params, images, targets, meta = setup
    mask = trunk_filter(params)
    # every head/meta leaf must be zero-masked
    from linnaeus_tpu.utils.param_filters import _path_str

    def visit(path, leaf):
        p = _path_str(path)
        if "head" in p or "meta_" in p:
            assert float(leaf) == 0.0, p
        return leaf

    jax.tree_util.tree_map_with_path(visit, mask)


def test_accum_steps_matches_full_batch(setup):
    apply_fn, trunk_filter, criteria, params, images, targets, meta = setup
    state = init_gradnorm_state(2)
    u1 = make_gradnorm_update_fn(
        apply_fn, criteria, TASKS, trunk_filter, alpha=1.5, accum_steps=1
    )
    u2 = make_gradnorm_update_fn(
        apply_fn, criteria, TASKS, trunk_filter, alpha=1.5, accum_steps=2
    )
    s1, m1 = jax.jit(u1)(params, images, targets, meta, state)
    s2, m2 = jax.jit(u2)(params, images, targets, meta, state)
    np.testing.assert_allclose(
        np.asarray(s1.task_weights), np.asarray(s2.task_weights),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(m1["gradnorm/norms"]), np.asarray(m2["gradnorm/norms"]),
        rtol=1e-4,
    )
