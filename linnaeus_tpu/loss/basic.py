"""Per-sample loss primitives (reference parity: loss/basic_loss.py:15-230).

All functions are pure jnp, return per-sample vectors of shape [B], and
accept either hard integer labels [B] or soft/one-hot targets [B, C].
Logits are promoted to float32 for the log-softmax (loss numerics stay fp32
under a bf16 compute dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def _as_soft(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    if target.ndim == 1:
        return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    return target.astype(jnp.float32)


def cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Plain CE; soft targets are handled like SoftTargetCrossEntropy."""
    log_probs = _log_softmax(logits)
    soft = _as_soft(target, logits.shape[-1])
    loss = -(soft * log_probs).sum(axis=-1)
    if class_weights is not None:
        w = (soft * class_weights[None, :].astype(jnp.float32)).sum(axis=-1)
        loss = loss * w
    return loss


def label_smoothing_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    smoothing: float = 0.1,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """NLL with uniform label smoothing. Soft targets are argmax-hardened
    first (reference parity: basic_loss.py:121-135).

    All-zero target rows (unmapped labels, one-hot of -1 in train/step.py)
    carry ZERO loss — argmax would otherwise harden them to class 0 and
    train the model toward null on unlabeled samples.
    """
    num_classes = logits.shape[-1]
    mass = None
    if target.ndim == 2:
        mass = jnp.sum(target, axis=-1)
        target = jnp.argmax(target, axis=-1)
    log_probs = _log_softmax(logits)
    nll = -jnp.take_along_axis(log_probs, target[:, None], axis=-1)[:, 0]
    smooth = -log_probs.mean(axis=-1)
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    if class_weights is not None:
        loss = loss * class_weights[target].astype(jnp.float32)
    if mass is not None:
        loss = loss * (mass > 0).astype(loss.dtype)
    return loss


def soft_target_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CE against a soft distribution (mixup targets)."""
    log_probs = _log_softmax(logits)
    soft = _as_soft(target, logits.shape[-1])
    loss = -(soft * log_probs).sum(axis=-1)
    if class_weights is not None:
        w = (soft * class_weights[None, :].astype(jnp.float32)).sum(axis=-1)
        loss = loss * w
    return loss


def taxonomy_smoothed_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    smoothing_matrix: jnp.ndarray,
) -> jnp.ndarray:
    """CE against taxonomy-distance-smoothed label rows.

    ``smoothing_matrix``: [C, C]; row i is the smoothed distribution for true
    class i. Soft targets mix rows by their probabilities.
    """
    log_probs = _log_softmax(logits)
    soft = _as_soft(target, logits.shape[-1])
    smoothed = soft @ smoothing_matrix.astype(jnp.float32)
    return -(smoothed * log_probs).sum(axis=-1)
