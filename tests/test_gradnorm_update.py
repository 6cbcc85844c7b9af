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


def test_gradnorm_reforward_sees_collated_batch():
    """VERDICT #4 regression: the GradNorm re-forward must consume the SAME
    mixed/meta-masked tensors the train step consumed (reference:
    gradient_weighting.py:367-430 re-forwards the collated batch). The
    Trainer regenerates the step's preprocess rng from the post-step state
    (state.step - 1); assert that reconstruction is exact."""
    import optax

    from linnaeus_tpu.data.collate import MixConfig
    from linnaeus_tpu.train.step import (
        ScheduleScalars,
        make_preprocess_fn,
        make_train_step,
        train_step_rngs,
    )

    mix_cfg = MixConfig(mixup_enabled=True, chunk_bounds=((0, 2),))
    preprocess = make_preprocess_fn(mix_cfg, has_meta=True, num_classes=NC)
    batch = {
        "images": jax.random.uniform(jax.random.PRNGKey(3), (8, 8, 8, 3)),
        "targets": {
            "t1": jnp.arange(8) % 5,
            "t2": jnp.arange(8) % 3,
        },
        "aux": jax.random.normal(jax.random.PRNGKey(4), (8, 2)),
        "group_ids": jnp.array([0, 0, 1, 1, 2, 2, 3, 3]),
    }
    scalars = ScheduleScalars(
        mix_prob=jnp.float32(1.0),
        use_cutmix=jnp.asarray(False),
        meta_mask_prob=jnp.float32(0.5),
        partial_mask_prob=jnp.float32(0.0),
        partial_combo_mask=jnp.zeros(2, jnp.float32),
        null_mask_prob=jnp.float32(1.0),
    )
    rng = jax.random.PRNGKey(11)
    step_before = jnp.int32(5)

    # what the train step consumed at step 5
    r_pre_train, _ = train_step_rngs(rng, step_before)
    b = dict(batch, _scalars=scalars)
    img_t, tgt_t, meta_t, mask_t = preprocess(b, r_pre_train)

    # what the Trainer's gradnorm_step reconstructs AFTER the step ran
    step_after = step_before + 1
    r_pre_gn, _ = train_step_rngs(rng, step_after - 1)
    img_g, tgt_g, meta_g, mask_g = preprocess(b, r_pre_gn)

    np.testing.assert_array_equal(np.asarray(img_t), np.asarray(img_g))
    np.testing.assert_array_equal(np.asarray(meta_t), np.asarray(meta_g))
    for t in TASKS:
        np.testing.assert_array_equal(np.asarray(tgt_t[t]), np.asarray(tgt_g[t]))
    # the batch was actually mixed (not a vacuous identity comparison)
    assert np.asarray(mask_t).any()
    assert float(np.abs(np.asarray(meta_t) - np.asarray(batch["aux"])).max()) > 0
