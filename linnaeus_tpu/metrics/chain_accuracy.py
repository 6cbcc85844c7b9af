"""Vectorized hierarchical chain accuracy.

Reference parity: utils/metrics/chain_accuracy.py:51,185 — a sample counts
as chain-correct only if its prediction is correct at EVERY task level;
null-labeled levels (class 0) can be ignored (treated as correct) so
partially-labeled samples still contribute.
"""

from __future__ import annotations

import jax.numpy as jnp


def _true_idx(target: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(target, axis=-1) if target.ndim == 2 else target


def chain_accuracy_counts(
    outputs: dict[str, jnp.ndarray],
    targets: dict[str, jnp.ndarray],
    task_keys: tuple[str, ...],
    ignore_null: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (num_chain_correct, num_considered) as device scalars.

    With ``ignore_null``, levels whose true label is the null class (0) are
    skipped for that sample; samples that are null at EVERY level are
    excluded from the denominator.
    """
    first = targets[task_keys[0]]
    B = first.shape[0]
    all_correct = jnp.ones((B,), dtype=bool)
    any_non_null = jnp.zeros((B,), dtype=bool)
    for t in task_keys:
        true = _true_idx(targets[t])
        pred = jnp.argmax(outputs[t], axis=-1)
        correct = pred == true
        if ignore_null:
            is_null = true == 0
            correct = correct | is_null
            any_non_null = any_non_null | ~is_null
        else:
            any_non_null = jnp.ones((B,), dtype=bool)
        all_correct = all_correct & correct
    considered = any_non_null
    return (all_correct & considered).sum(), considered.sum()
