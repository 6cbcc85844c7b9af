"""Loss layer tests: criteria, masking, weighted hierarchical loss, GradNorm."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linnaeus_tpu.loss import (
    apply_null_masking,
    build_taxonomy_smoothing_matrix,
    cross_entropy,
    gradnorm_weight_update,
    init_gradnorm_state,
    label_smoothing_cross_entropy,
    soft_target_cross_entropy,
    weighted_hierarchical_loss,
)


def test_cross_entropy_hard_matches_soft():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 5))
    hard = jnp.array([0, 1, 2, 3])
    soft = jax.nn.one_hot(hard, 5)
    np.testing.assert_allclose(
        cross_entropy(logits, hard), cross_entropy(logits, soft), rtol=1e-6
    )


def test_label_smoothing_reduces_to_ce_at_zero():
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 5))
    hard = jnp.array([0, 1, 2, 3])
    np.testing.assert_allclose(
        label_smoothing_cross_entropy(logits, hard, smoothing=0.0),
        cross_entropy(logits, hard),
        rtol=1e-5,
    )


def test_soft_target_ce_mixup_interpolates():
    logits = jax.random.normal(jax.random.PRNGKey(2), (2, 4))
    a = jax.nn.one_hot(jnp.array([0, 1]), 4)
    b = jax.nn.one_hot(jnp.array([2, 3]), 4)
    lam = 0.3
    mixed = lam * a + (1 - lam) * b
    expected = lam * soft_target_cross_entropy(logits, a) + (
        1 - lam
    ) * soft_target_cross_entropy(logits, b)
    np.testing.assert_allclose(
        soft_target_cross_entropy(logits, mixed), expected, rtol=1e-6
    )


def test_null_masking_extremes():
    losses = {"t": jnp.ones((6,))}
    targets = {"t": jnp.array([0, 1, 0, 2, 0, 3])}  # 3 nulls
    rng = jax.random.PRNGKey(0)
    masked_keep, stats = apply_null_masking(losses, targets, 1.0, rng)
    np.testing.assert_array_equal(np.asarray(masked_keep["t"]), np.ones(6))
    assert int(stats["t"]["null_total"]) == 3
    assert int(stats["t"]["valid_count"]) == 6
    masked_drop, stats = apply_null_masking(losses, targets, 0.0, rng)
    np.testing.assert_array_equal(
        np.asarray(masked_drop["t"]), [0, 1, 0, 1, 0, 1]
    )
    assert int(stats["t"]["valid_count"]) == 3


def test_weighted_hierarchical_loss_total():
    outputs = {
        "taxa_L10": jax.random.normal(jax.random.PRNGKey(0), (8, 5)),
        "taxa_L20": jax.random.normal(jax.random.PRNGKey(1), (8, 3)),
    }
    targets = {
        "taxa_L10": jnp.array([1, 2, 3, 4, 1, 2, 3, 4]),
        "taxa_L20": jnp.array([1, 2, 1, 2, 1, 2, 1, 2]),
    }
    criteria = {"taxa_L10": cross_entropy, "taxa_L20": cross_entropy}
    weights = jnp.array([2.0, 0.5])
    total, comps = weighted_hierarchical_loss(
        outputs, targets, criteria, weights,
        null_mask_prob=1.0, rng=jax.random.PRNGKey(3),
        task_keys=("taxa_L10", "taxa_L20"),
    )
    expected = (
        2.0 * cross_entropy(outputs["taxa_L10"], targets["taxa_L10"]).mean()
        + 0.5 * cross_entropy(outputs["taxa_L20"], targets["taxa_L20"]).mean()
    )
    np.testing.assert_allclose(float(total), float(expected), rtol=1e-5)
    assert set(comps["weighted_tasks"]) == {"taxa_L10", "taxa_L20"}


def test_weighted_loss_is_jittable_and_differentiable():
    criteria = {"t": cross_entropy}

    @jax.jit
    def loss_fn(logits, rng):
        total, _ = weighted_hierarchical_loss(
            {"t": logits}, {"t": jnp.array([1, 2])}, criteria,
            jnp.array([1.0]), 0.5, rng, task_keys=("t",),
        )
        return total

    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 4))
    g = jax.grad(loss_fn)(logits, jax.random.PRNGKey(1))
    assert g.shape == logits.shape
    assert np.isfinite(np.asarray(g)).all()


def test_taxonomy_smoothing_matrix_rows_sum_to_one():
    dist = np.array(
        [[0, 2, 4, 4], [2, 0, 4, 4], [4, 4, 0, 2], [4, 4, 2, 0]], dtype=np.float32
    )
    m = build_taxonomy_smoothing_matrix(4, dist, alpha=0.1, beta=1.0)
    np.testing.assert_allclose(m.sum(axis=1), np.ones(4), rtol=1e-5)
    assert np.all(np.diag(m) == pytest.approx(0.9))
    # closer classes get more smoothing mass
    assert m[0, 1] > m[0, 2]


def test_gradnorm_update_equalizes():
    state = init_gradnorm_state(2)
    # reference rule (gradnorm.py:243-256): w_i *= g_i / target_i, so the
    # higher-norm task's weight grows relative to the target norm
    norms = jnp.array([3.0, 1.0])
    losses = jnp.array([1.0, 1.0])
    new_state, metrics = gradnorm_weight_update(norms, losses, state, alpha=0.0)
    w = np.asarray(new_state.task_weights)
    assert w[0] > 1.0 > w[1]
    np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-5)
    assert bool(new_state.has_initted)


def test_gradnorm_alpha_targets_slower_tasks():
    state = init_gradnorm_state(2)
    # initialize
    state, _ = gradnorm_weight_update(
        jnp.array([1.0, 1.0]), jnp.array([1.0, 1.0]), state, alpha=1.5
    )
    # task 0 progressed (loss down), task 1 stalled -> task 1's target norm is
    # higher -> with equal measured norms, task 1's weight rises
    state2, _ = gradnorm_weight_update(
        jnp.array([1.0, 1.0]), jnp.array([0.5, 1.0]), state, alpha=1.5
    )
    w = np.asarray(state2.task_weights)
    assert w[1] < w[0]  # equal norms but task1's target larger => w1 shrinks? see below


def test_label_smoothing_zero_mass_rows_carry_no_loss():
    """Unmapped samples (one-hot of -1 -> all-zero rows) must contribute
    ZERO loss under LabelSmoothingCrossEntropy — argmax-hardening would
    otherwise train them toward class 0 (the null class)."""
    from linnaeus_tpu.loss.basic import label_smoothing_cross_entropy

    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 5))
    tgt = jax.nn.one_hot(jnp.asarray([2, -1, 0, -1]), 5)  # rows 1,3 all-zero
    loss = label_smoothing_cross_entropy(logits, tgt, smoothing=0.1)
    assert float(loss[1]) == 0.0 and float(loss[3]) == 0.0
    assert float(loss[0]) > 0.0 and float(loss[2]) > 0.0


def test_null_masking_excludes_unmapped_from_valid_count():
    """valid_count must not count unmapped (all-zero-target) samples — they
    would deflate the per-task mean loss and silently deweight the task."""
    from linnaeus_tpu.loss.masking import apply_null_masking

    losses = {"t": jnp.ones((4,))}
    tgt = jax.nn.one_hot(jnp.asarray([2, -1, 0, 1]), 5)  # 1 unmapped, 1 null
    masked, stats = apply_null_masking(
        losses, {"t": tgt}, null_mask_prob=1.0, rng=jax.random.PRNGKey(0)
    )
    # nulls kept (prob 1.0), unmapped always dropped
    assert int(stats["t"]["valid_count"]) == 3
    assert float(masked["t"][1]) == 0.0
    # and with nulls excluded the unmapped row still doesn't count
    masked0, stats0 = apply_null_masking(
        losses, {"t": tgt}, null_mask_prob=0.0, rng=jax.random.PRNGKey(0)
    )
    assert int(stats0["t"]["valid_count"]) == 2
