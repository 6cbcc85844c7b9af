"""Standalone validation entry points (reference parity: validation.py:49,341).

``validate_one_pass`` / ``validate_with_partial_mask`` mirror the reference's
module-level API; the Trainer uses the same logic internally
(train/loop.py::Trainer._validate). These wrappers run a validation pass over
a loader with a prebuilt eval step and return the phase summary dict.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from linnaeus_tpu.metrics.chain_accuracy import chain_accuracy_counts


def _run_pass(
    eval_step,
    state,
    loader,
    task_keys,
    num_classes,
    mask_meta: bool,
    combo_mask: np.ndarray,
) -> dict[str, float]:
    totals: dict[str, float] = {}
    count = 0.0
    chain_correct = chain_total = 0.0
    for batch in loader:
        metrics, outputs = eval_step(
            state, batch, jnp.asarray(mask_meta), jnp.asarray(combo_mask)
        )
        host = jax.device_get(metrics)
        b = float(host["count"])
        count += b
        for k, v in host.items():
            if k == "count":
                continue
            totals[k] = totals.get(k, 0.0) + float(v) * (
                b if k.startswith("loss") else 1.0
            )
        targets_soft = {
            t: jax.nn.one_hot(v, num_classes[t]) if v.ndim == 1 else v
            for t, v in batch["targets"].items()
        }
        cc, ct = chain_accuracy_counts(outputs, targets_soft, tuple(task_keys))
        chain_correct += float(jax.device_get(cc))
        chain_total += float(jax.device_get(ct))
    if count == 0:
        return {}
    summary: dict[str, float] = {}
    for k, v in totals.items():
        if k.startswith("loss"):
            summary[k] = v / count
        elif k.startswith("correct1/"):
            summary["acc1/" + k.split("/", 1)[1]] = v / count
        elif k.startswith("correct3/"):
            summary["acc3/" + k.split("/", 1)[1]] = v / count
    if chain_total > 0:
        summary["chain_accuracy"] = chain_correct / chain_total
    return summary


def validate_one_pass(
    eval_step,
    state,
    loader,
    task_keys,
    num_classes,
    meta_dim: int,
    mask_meta: bool = False,
) -> dict[str, float]:
    """Normal validation, or all-meta-masked when ``mask_meta``
    (reference: validation.py:49, zeroed aux at :174-175)."""
    return _run_pass(
        eval_step, state, loader, task_keys, num_classes,
        mask_meta, np.zeros((meta_dim,), np.float32),
    )


def validate_with_partial_mask(
    eval_step,
    state,
    loader,
    task_keys,
    num_classes,
    combo_mask: np.ndarray,
) -> dict[str, float]:
    """Validation with a specific metadata component combination masked
    (reference: validation.py:341). ``combo_mask``: [meta_dim] 0/1 columns."""
    return _run_pass(
        eval_step, state, loader, task_keys, num_classes, False,
        np.asarray(combo_mask, np.float32),
    )
