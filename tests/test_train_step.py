"""Train/eval step tests, including data-parallel execution on an 8-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from linnaeus_tpu.data.collate import (
    MixConfig,
    apply_meta_masking,
    apply_partial_meta_masking,
    selective_cutmix,
    selective_mixup,
)
from linnaeus_tpu.loss import cross_entropy, soft_target_cross_entropy
from linnaeus_tpu.models import MFormerV1
from linnaeus_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from linnaeus_tpu.train.state import create_train_state
from linnaeus_tpu.train.step import ScheduleScalars, make_eval_step, make_train_step

TASKS = ("taxa_L10", "taxa_L20")
NUM_CLASSES = {"taxa_L10": 6, "taxa_L20": 3}
META_DIM = 5


def tiny_model():
    return MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
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


@pytest.fixture(scope="module")
def train_setup():
    model = tiny_model()
    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["aux"]
    )["params"]
    tx = optax.adamw(1e-3)
    state = create_train_state(
        model, params, tx, num_tasks=len(TASKS), rng=jax.random.PRNGKey(7)
    )
    criteria = {t: soft_target_cross_entropy for t in TASKS}
    return model, state, batch, criteria


def test_train_step_updates_params(train_setup):
    model, state, batch, criteria = train_setup
    step = make_train_step(
        criteria, TASKS,
        MixConfig(chunk_bounds=((0, 2), (2, 5))),
        clip_grad=5.0,
    )
    scalars = ScheduleScalars.zeros(META_DIM)
    jitted = jax.jit(step)
    new_state, metrics = jitted(state, batch, scalars)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm_pre_clip"]) > 0
    # params actually changed
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_train_step_with_mixing_and_masking(train_setup):
    model, state, batch, criteria = train_setup
    step = make_train_step(
        criteria, TASKS,
        MixConfig(mixup_enabled=True, cutmix_enabled=True, chunk_bounds=((0, 2), (2, 5))),
        clip_grad=5.0,
    )
    scalars = ScheduleScalars(
        mix_prob=jnp.float32(1.0),
        use_cutmix=jnp.asarray(False),
        meta_mask_prob=jnp.float32(0.5),
        partial_mask_prob=jnp.float32(0.5),
        partial_combo_mask=jnp.asarray([1, 1, 0, 0, 0], jnp.float32),
        null_mask_prob=jnp.float32(1.0),
    )
    new_state, metrics = jax.jit(step)(state, batch, scalars)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["mixed_frac"]) > 0  # same-group pairs exist


def test_gradient_accumulation_matches_full_batch(train_setup):
    model, state, batch, criteria = train_setup
    # SGD: update is linear in the gradient, so microbatch-averaged grads
    # must give bitwise-close params (adamw would amplify fp noise on
    # exactly-zero-gradient params like the aggregate bias under LayerNorm).
    state = state.replace(tx=optax.sgd(0.1))
    state = state.replace(opt_state=state.tx.init(state.params))
    # no mixing/masking so microbatching is the only difference
    cfg = MixConfig(mixup_enabled=False, cutmix_enabled=False)
    step1 = make_train_step(criteria, TASKS, cfg, accumulation_steps=1)
    step2 = make_train_step(criteria, TASKS, cfg, accumulation_steps=2)
    scalars = ScheduleScalars.zeros(META_DIM)
    s1, m1 = jax.jit(step1)(state, batch, scalars)
    s2, m2 = jax.jit(step2)(state, batch, scalars)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    # observability parity: accumulation must report the same metric keys
    # (per-task losses, accuracy, mixed_frac) as accum=1 (reference logs
    # these regardless of accumulation, train.py:350)
    assert set(m1.keys()) == set(m2.keys())
    for t in TASKS:
        np.testing.assert_allclose(
            float(m1[f"acc1/{t}"]), float(m2[f"acc1/{t}"]), atol=1e-6
        )
        np.testing.assert_allclose(
            float(m1[f"acc3/{t}"]), float(m2[f"acc3/{t}"]), atol=1e-6
        )
        np.testing.assert_allclose(
            float(m1[f"loss/{t}"]), float(m2[f"loss/{t}"]), rtol=1e-4
        )
    np.testing.assert_allclose(
        float(m1["mixed_frac"]), float(m2["mixed_frac"]), atol=1e-6
    )


def test_eval_step_counts(train_setup):
    model, state, batch, criteria = train_setup
    eval_step = make_eval_step(criteria, TASKS)
    metrics, outputs = jax.jit(eval_step)(
        state, batch, jnp.asarray(False), jnp.zeros(META_DIM)
    )
    assert metrics["count"] == 8
    for t in TASKS:
        assert 0 <= int(metrics[f"correct1/{t}"]) <= 8
        assert int(metrics[f"correct3/{t}"]) >= int(metrics[f"correct1/{t}"])


def test_eval_step_mask_meta_changes_outputs(train_setup):
    model, state, batch, criteria = train_setup
    eval_step = jax.jit(make_eval_step(criteria, TASKS))
    _, out_plain = eval_step(state, batch, jnp.asarray(False), jnp.zeros(META_DIM))
    _, out_masked = eval_step(state, batch, jnp.asarray(True), jnp.zeros(META_DIM))
    assert not np.allclose(out_plain["taxa_L10"], out_masked["taxa_L10"])


def test_data_parallel_train_step(train_setup, eight_devices):
    model, state, batch, criteria = train_setup
    mesh = create_mesh(devices=eight_devices)
    step = make_train_step(criteria, TASKS, MixConfig(), clip_grad=5.0)
    scalars = ScheduleScalars.zeros(META_DIM)

    sharded_batch = shard_batch(
        {k: v for k, v in batch.items()}, mesh
    )
    repl_state = replicate(state, mesh)
    new_state, metrics = jax.jit(step)(repl_state, sharded_batch, scalars)
    assert np.isfinite(float(metrics["loss"]))

    # single-device result matches the 8-way sharded result (same math)
    new_state_1, metrics_1 = jax.jit(step)(state, batch, scalars)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_1["loss"]), rtol=1e-4
    )


# ---------------------------------------------------------------- collate ops
def test_selective_mixup_respects_groups():
    rng = jax.random.PRNGKey(0)
    images = jnp.stack([jnp.full((4, 4, 3), float(i)) for i in range(6)])
    targets = {"t": jax.nn.one_hot(jnp.array([1, 2, 3, 4, 5, 0]), 7)}
    group_ids = jnp.array([0, 0, 0, 1, 1, 2])
    mixed_any = False
    for seed in range(8):
        out_img, out_tgt, _, mask = selective_mixup(
            images, targets, None, group_ids,
            jax.random.PRNGKey(seed), MixConfig(),
        )
        mask = np.asarray(mask)
        mixed_any = mixed_any or mask.any()
        # sample 5 is alone in group 2 => never mixed
        assert not mask[5]
        # mixed rows' targets remain valid distributions
        np.testing.assert_allclose(
            np.asarray(out_tgt["t"]).sum(-1), np.ones(6), rtol=1e-5
        )
    assert mixed_any


def test_selective_mixup_excludes_null():
    images = jnp.zeros((4, 2, 2, 3))
    targets = {"t": jax.nn.one_hot(jnp.array([0, 1, 1, 2]), 3)}  # sample 0 null
    group_ids = jnp.zeros(4, jnp.int32)
    cfg = MixConfig(exclude_null=True, null_task_keys=("t",))
    for seed in range(8):
        _, _, _, mask = selective_mixup(
            images, targets, None, group_ids, jax.random.PRNGKey(seed), cfg
        )
        assert not bool(np.asarray(mask)[0])


def test_cutmix_preserves_target_mass():
    rng = jax.random.PRNGKey(3)
    images = jax.random.normal(rng, (4, 8, 8, 3))
    targets = {"t": jax.nn.one_hot(jnp.array([0, 1, 2, 3]), 4)}
    group_ids = jnp.zeros(4, jnp.int32)
    _, out_tgt, _, _ = selective_cutmix(
        images, targets, None, group_ids, rng, MixConfig()
    )
    np.testing.assert_allclose(np.asarray(out_tgt["t"]).sum(-1), np.ones(4), rtol=1e-5)


def test_meta_masking_probabilities():
    meta = jnp.ones((1000, 4))
    masked, flags = apply_meta_masking(meta, jax.random.PRNGKey(0), 0.5)
    frac = float(np.asarray(flags).mean())
    assert 0.4 < frac < 0.6
    # masked rows are fully zero
    assert float(jnp.abs(masked[np.asarray(flags)]).max()) == 0.0


def test_partial_meta_masking_zeroes_combo_columns():
    meta = jnp.ones((100, 4))
    combo = jnp.array([1.0, 1.0, 0.0, 0.0])
    out = apply_partial_meta_masking(
        meta, jax.random.PRNGKey(1), 1.0, combo
    )
    np.testing.assert_array_equal(np.asarray(out[:, :2]), 0.0)
    np.testing.assert_array_equal(np.asarray(out[:, 2:]), 1.0)


def test_eval_step_subset_metrics(train_setup):
    """Null/non-null, rarity-bin, and taxa-subset counts partition the batch
    and are internally consistent with the plain top-1 counts."""
    import numpy as np

    model, state, batch, criteria = train_setup
    b = batch["images"].shape[0]
    # force a couple of null labels at the first task
    targets = dict(batch["targets"])
    t0 = TASKS[0]
    idx = np.array(jnp.argmax(targets[t0], axis=-1))
    idx[:2] = 0
    targets[t0] = jax.nn.one_hot(jnp.asarray(idx), NUM_CLASSES[t0])
    batch = dict(batch, targets=targets)

    bins = np.zeros((NUM_CLASSES[t0],), np.int32)
    bins[NUM_CLASSES[t0] // 2:] = 1  # two rarity bins by class index
    eval_step = jax.jit(
        make_eval_step(
            criteria, TASKS,
            num_classes=NUM_CLASSES,
            null_tasks=(t0,),
            subset_bins={t0: bins},
            taxa_selectors={"sub0": (t0, int(idx[2]))},
        )
    )
    metrics, _ = eval_step(
        state, batch, jnp.asarray(False), jnp.zeros((META_DIM,), jnp.float32)
    )
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    # null + non-null partition the batch
    assert m[f"subset_count/null/{t0}"] == 2.0
    assert m[f"subset_count/null/{t0}"] + m[f"subset_count/non_null/{t0}"] == b
    # rarity bins partition the batch
    assert (
        m[f"subset_count/rarity_0/{t0}"] + m[f"subset_count/rarity_1/{t0}"] == b
    )
    # bucketed corrects sum to the plain top-1 count
    total_c1 = m[f"correct1/{t0}"]
    assert (
        m[f"subset_correct1/null/{t0}"] + m[f"subset_correct1/non_null/{t0}"]
        == total_c1
    )
    # taxa subset counts samples whose target class == idx[2]
    assert m["subset_count/taxa_sub0/" + t0] >= 1.0


# ------------------------------------------------------- in-group permutation
def test_ingroup_permutation_pairs_within_groups():
    from linnaeus_tpu.data.collate import ingroup_permutation

    group_ids = jnp.array([0, 0, 1, 1, 1, 2, -1, -1, 3, 3])
    for seed in range(16):
        perm = np.asarray(
            ingroup_permutation(jax.random.PRNGKey(seed), group_ids)
        )
        gids = np.asarray(group_ids)
        # permutation is a bijection
        assert sorted(perm.tolist()) == list(range(len(gids)))
        # partners always share the group id
        np.testing.assert_array_equal(gids[perm], gids)
        # every member of a group of size >= 2 gets a partner != self
        for i, g in enumerate(gids):
            if (gids == g).sum() >= 2:
                assert perm[i] != i, f"seed={seed} i={i}"
        # singleton (group 2) maps to itself
        assert perm[5] == 5


def test_mixed_frac_fires_at_mix_prob_one(train_setup):
    """Regression: with a grouped (mixed-pairs) batch and mix_prob=1, EVERY
    sample must mix. The old whole-batch random permutation gave each sample
    a ~1/B chance of drawing a same-group partner, so mixing silently almost
    never fired (reference parity: aug/gpu/selective_mixup.py in-group perm)."""
    model, state, batch, criteria = train_setup
    step = make_train_step(
        criteria, TASKS,
        MixConfig(mixup_enabled=True, chunk_bounds=((0, 2), (2, 5))),
    )
    scalars = ScheduleScalars(
        mix_prob=jnp.float32(1.0),
        use_cutmix=jnp.asarray(False),
        meta_mask_prob=jnp.float32(0.0),
        partial_mask_prob=jnp.float32(0.0),
        partial_combo_mask=jnp.zeros(META_DIM, jnp.float32),
        null_mask_prob=jnp.float32(1.0),
    )
    # batch group_ids = [0,0,1,1,2,2,3,3] -> all samples have in-batch partners
    _, metrics = jax.jit(step)(state, batch, scalars)
    assert float(metrics["mixed_frac"]) == 1.0


# -------------------------------------------- BN stats under grad accumulation
class _BNModel(__import__("flax").linen.Module):
    @__import__("flax").linen.compact
    def __call__(self, images, meta=None, deterministic=False, **kw):
        import flax.linen as nn

        x = nn.BatchNorm(use_running_average=deterministic)(images)
        x = x.mean(axis=(1, 2))
        return {t: nn.Dense(NUM_CLASSES[t])(x) for t in TASKS}


def test_accumulation_updates_batch_stats():
    """Regression: BN running stats must update when ACCUMULATION_STEPS > 1
    (they were silently discarded from the scan, leaving init-time stats)."""
    model = _BNModel()
    batch = make_batch(jax.random.PRNGKey(0))
    # shift the input distribution away from N(0,1) so stats must move
    batch = dict(batch, images=batch["images"] * 3.0 + 5.0)
    variables = model.init(jax.random.PRNGKey(0), batch["images"])
    state = create_train_state(
        model, variables["params"], optax.sgd(0.1),
        num_tasks=len(TASKS), rng=jax.random.PRNGKey(7),
        batch_stats=variables["batch_stats"],
    )
    criteria = {t: soft_target_cross_entropy for t in TASKS}
    step = make_train_step(
        criteria, TASKS, MixConfig(mixup_enabled=False, cutmix_enabled=False),
        accumulation_steps=2, has_meta=False,
    )
    new_state, _ = jax.jit(step)(state, batch, ScheduleScalars.zeros(META_DIM))
    old_mean = np.asarray(jax.tree.leaves(state.batch_stats)[0])
    new_mean = np.asarray(jax.tree.leaves(new_state.batch_stats)[0])
    assert not np.allclose(old_mean, new_mean)


# ---------------------------------------------------- unmapped-label validity
def test_unmapped_labels_excluded_from_metrics(train_setup):
    """-1 labels one-hot to all-zero rows; they must not count as class-0
    samples in accuracy numerators/denominators or subset metrics."""
    model, state, batch, criteria = train_setup
    t0 = TASKS[0]
    targets = dict(batch["targets"])
    zeroed = np.asarray(targets[t0]).copy()
    zeroed[:3] = 0.0  # three unmapped samples
    targets[t0] = jnp.asarray(zeroed)
    batch = dict(batch, targets=targets)

    eval_step = jax.jit(
        make_eval_step(criteria, TASKS, num_classes=NUM_CLASSES, null_tasks=(t0,))
    )
    metrics, _ = eval_step(
        state, batch, jnp.asarray(False), jnp.zeros((META_DIM,), jnp.float32)
    )
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    b = batch["images"].shape[0]
    assert m[f"valid_count/{t0}"] == b - 3
    # null + non-null partition the VALID samples only
    assert (
        m[f"subset_count/null/{t0}"] + m[f"subset_count/non_null/{t0}"] == b - 3
    )
    assert m[f"correct1/{t0}"] <= b - 3
    # the other task is untouched
    assert m[f"valid_count/{TASKS[1]}"] == b
