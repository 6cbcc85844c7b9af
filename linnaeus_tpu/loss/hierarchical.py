"""weighted_hierarchical_loss — the training-loss entry point.

Reference parity: loss/hierarchical_loss.py:24-406 + the task-weighting
forward in loss/gradient_weighting.py:301-358. Pipeline:

    1. per-task per-sample raw losses (criteria)
    2. null masking (scheduled probability) + class weighting
    3. task weighting: weighted[t] = (sum(masked[t]) / num_valid[t]) * w[t]
    4. total = sum over tasks

Everything is a pure function of (outputs, targets, weights, prob, rng) and
runs inside the jitted train step; per-task scalars come back in a components
dict for the metrics tracker.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .masking import apply_loss_masking

Criterion = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def compute_core_loss(
    outputs: dict[str, jnp.ndarray],
    targets: dict[str, jnp.ndarray],
    criteria: dict[str, Criterion],
) -> dict[str, jnp.ndarray]:
    """Raw per-sample loss vector [B] per task (loss/core_loss.py:19)."""
    return {task: criteria[task](outputs[task], targets[task]) for task in outputs}


def weighted_hierarchical_loss(
    outputs: dict[str, jnp.ndarray],
    targets: dict[str, jnp.ndarray],
    criteria: dict[str, Criterion],
    task_weights: jnp.ndarray,
    null_mask_prob: jnp.ndarray | float,
    rng: jax.Array,
    class_weights: dict[str, jnp.ndarray] | None = None,
    is_validation: bool = False,
    phase1_mask_null: bool = False,
    apply_class_weights: bool = True,
    task_keys: tuple[str, ...] | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Returns (total_loss, components).

    ``task_weights``: [num_tasks] array ordered by ``task_keys`` (defaults to
    the order of ``outputs``). GradNorm updates this array between steps.
    """
    keys = tuple(task_keys) if task_keys else tuple(outputs.keys())
    per_task = compute_core_loss(outputs, targets, criteria)
    raw_per_sample = dict(per_task)

    masked, null_stats = apply_loss_masking(
        per_task,
        targets,
        null_mask_prob,
        rng,
        class_weights=class_weights,
        is_validation=is_validation,
        phase1_mask_null=phase1_mask_null,
        apply_class_weights=apply_class_weights,
    )

    weighted = {}
    for i, task in enumerate(keys):
        num_valid = jnp.maximum(null_stats[task]["valid_count"].astype(jnp.float32), 1e-6)
        mean_loss = masked[task].sum() / num_valid
        weighted[task] = mean_loss * task_weights[i]

    total = jnp.sum(jnp.stack([weighted[t] for t in keys]))
    components = {
        "total": total,
        "tasks": {t: raw_per_sample[t].mean() for t in keys},
        "weighted_tasks": {t: weighted[t] for t in keys},
        "null_masking": null_stats,
        "raw_per_sample_losses": raw_per_sample,
    }
    return total, components
