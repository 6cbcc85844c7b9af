"""Null masking + class weighting of per-sample losses (jit-friendly).

Reference parity: loss/masking.py:19-700. A sample is "null-labeled" at a
task when its label index is 0 (hard) or its one-hot row puts mass on index 0
(soft). With probability ``null_mask_prob`` a null sample's loss is INCLUDED
(1.0 = keep all nulls, 0.0 = drop all nulls); non-null samples always count.
Randomness comes from an explicit PRNG key so the whole thing lives inside
the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def null_sample_mask(target: jnp.ndarray) -> jnp.ndarray:
    """Boolean [B]: True where the sample's label is the null class (index 0)."""
    if target.ndim == 1:
        return target == 0
    return target[:, 0] > 0.5


def apply_null_masking(
    per_task_losses: dict[str, jnp.ndarray],
    targets: dict[str, jnp.ndarray],
    null_mask_prob: jnp.ndarray | float,
    rng: jax.Array,
) -> tuple[dict[str, jnp.ndarray], dict[str, dict[str, jnp.ndarray]]]:
    """Returns (masked_losses, stats). Each stats entry has null_total /
    null_included / valid_count (scalars, on-device)."""
    masked, stats = {}, {}
    for i, (task, loss_vec) in enumerate(per_task_losses.items()):
        tgt = targets[task]
        is_null = null_sample_mask(tgt)
        # unmapped samples (label -1: all-zero one-hot row / negative index)
        # are neither null nor valid — they must not count in valid_count,
        # or a mostly-unlabeled task's mean loss deflates and the task is
        # silently deweighted (same exclusion as train/step.py _valid_mask)
        if tgt.ndim == 2:
            has_label = jnp.sum(tgt, axis=-1) > 0
        else:
            has_label = tgt >= 0
        coin = jax.random.uniform(jax.random.fold_in(rng, i), loss_vec.shape)
        include_null = coin < null_mask_prob
        keep = has_label & jnp.where(is_null, include_null, True)
        masked[task] = jnp.where(keep, loss_vec, 0.0)
        stats[task] = {
            "null_total": is_null.sum(),
            "null_included": (is_null & include_null).sum(),
            "valid_count": keep.sum(),
        }
    return masked, stats


def apply_class_weighting(
    per_task_losses: dict[str, jnp.ndarray],
    targets: dict[str, jnp.ndarray],
    class_weights: dict[str, jnp.ndarray] | None,
) -> dict[str, jnp.ndarray]:
    """Scale per-sample losses by per-class weights (dense [C] arrays)."""
    if not class_weights:
        return per_task_losses
    out = {}
    for task, loss_vec in per_task_losses.items():
        cw = class_weights.get(task)
        if cw is None:
            out[task] = loss_vec
            continue
        tgt = targets[task]
        cw = jnp.asarray(cw, dtype=loss_vec.dtype)
        if tgt.ndim == 1:
            w = cw[tgt]
        else:
            w = (tgt.astype(loss_vec.dtype) * cw[None, :]).sum(axis=-1)
        out[task] = loss_vec * w
    return out


def apply_loss_masking(
    per_task_losses: dict[str, jnp.ndarray],
    targets: dict[str, jnp.ndarray],
    null_mask_prob: jnp.ndarray | float,
    rng: jax.Array,
    class_weights: dict[str, jnp.ndarray] | None = None,
    is_validation: bool = False,
    phase1_mask_null: bool = False,
    apply_class_weights: bool = True,
) -> tuple[dict[str, jnp.ndarray], dict]:
    """Composition: null masking then class weighting (masking.py:521-700).

    ``is_validation`` / ``phase1_mask_null`` are static Python flags:
    validation disables null masking (prob=1), phase 1 forces it (prob=0).
    """
    if is_validation:
        prob = 1.0
    elif phase1_mask_null:
        prob = 0.0
    else:
        prob = null_mask_prob
    masked, stats = apply_null_masking(per_task_losses, targets, prob, rng)
    if apply_class_weights:
        masked = apply_class_weighting(masked, targets, class_weights)
    return masked, stats
