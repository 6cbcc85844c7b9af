"""Jitted train / eval steps.

One XLA computation per optimizer step (reference hot loop:
train.py:13-443): on-device mixing + meta-masking (collate semantics), bf16
forward, fp32 loss, backward, global-norm clip with pre/post measurement,
optimizer update. Under a data-sharded batch the gradient all-reduce is
inserted by XLA SPMD — the DDP-backward boundary of the reference
(train.py:176) has no explicit analog here.

Schedule-driven probabilities enter as traced scalars (``ScheduleScalars``)
so the compiled step is reused across the whole schedule; gradient
accumulation runs as a ``lax.scan`` over microbatches.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from linnaeus_tpu.data.collate import (
    MixConfig,
    apply_meta_masking,
    apply_mixing,
    apply_partial_meta_masking,
)
from linnaeus_tpu.loss.hierarchical import weighted_hierarchical_loss
from .state import TrainState


class ScheduleScalars(NamedTuple):
    """Per-step schedule operands (host-computed by OpsSchedule)."""

    mix_prob: jnp.ndarray
    use_cutmix: jnp.ndarray  # bool scalar
    meta_mask_prob: jnp.ndarray
    partial_mask_prob: jnp.ndarray
    partial_combo_mask: jnp.ndarray  # [meta_dim] 0/1
    null_mask_prob: jnp.ndarray

    @classmethod
    def from_ops_schedule(cls, ops_schedule, step: int, meta_dim: int, combo_mask=None):
        if combo_mask is None:
            combo_mask = np.zeros((meta_dim,), dtype=np.float32)
        return cls(
            mix_prob=jnp.asarray(ops_schedule.get_mixup_prob(step), jnp.float32),
            use_cutmix=jnp.asarray(ops_schedule.should_use_cutmix()),
            meta_mask_prob=jnp.asarray(
                ops_schedule.get_meta_mask_prob(step), jnp.float32
            ),
            partial_mask_prob=jnp.asarray(
                ops_schedule.get_partial_meta_mask_prob(step), jnp.float32
            ),
            partial_combo_mask=jnp.asarray(combo_mask, jnp.float32),
            null_mask_prob=jnp.asarray(
                ops_schedule.get_null_mask_prob(step), jnp.float32
            ),
        )

    @classmethod
    def zeros(cls, meta_dim: int):
        return cls(
            mix_prob=jnp.float32(0.0),
            use_cutmix=jnp.asarray(False),
            meta_mask_prob=jnp.float32(0.0),
            partial_mask_prob=jnp.float32(0.0),
            partial_combo_mask=jnp.zeros((meta_dim,), jnp.float32),
            null_mask_prob=jnp.float32(1.0),
        )


def _valid_mask(targets: jnp.ndarray) -> jnp.ndarray:
    """[B] bool: sample has a mapped label for this task.

    Unmapped labels (-1) one-hot to all-zero rows (zero loss mass); without
    this mask their argmax (0) would count them as null-class samples in
    accuracy/subset denominators."""
    if targets.ndim == 2:
        return jnp.sum(targets, axis=-1) > 0
    return targets >= 0


def _topk_correct(logits: jnp.ndarray, targets: jnp.ndarray, k: int) -> jnp.ndarray:
    """Count of VALID samples whose true class is in the top-k predictions."""
    true_idx = jnp.argmax(targets, axis=-1) if targets.ndim == 2 else targets
    _, topk = jax.lax.top_k(logits, k)
    return ((topk == true_idx[:, None]).any(axis=-1) & _valid_mask(targets)).sum()


def _accuracy_metrics(outputs, targets, prefix="") -> dict[str, jnp.ndarray]:
    m = {}
    for task, logits in outputs.items():
        tgt = targets[task]
        n = jnp.maximum(_valid_mask(tgt).sum().astype(jnp.float32), 1.0)
        m[f"{prefix}acc1/{task}"] = _topk_correct(logits, tgt, 1) / n
        k3 = min(3, logits.shape[-1])
        m[f"{prefix}acc3/{task}"] = _topk_correct(logits, tgt, k3) / n
    return m


_MOE_KEYS = ("moe_aux", "moe_z", "moe_drop_frac")


def _collect_moe_stats(intermediates) -> dict[str, jnp.ndarray] | None:
    """Average the per-layer MoE aux stats sown by blocks/moe.py.

    sow() stores each value as a 1-tuple under the sowing module's path;
    every MoE layer contributes one leaf per stat name."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(intermediates, sep="/")
    out = {}
    for short, sown in (
        ("moe_aux", "moe_aux_loss"),
        ("moe_z", "moe_z_loss"),
        ("moe_drop_frac", "moe_drop_frac"),
    ):
        vals = [
            v[0] if isinstance(v, tuple) else v
            for path, v in flat.items()
            if path.rsplit("/", 1)[-1] == sown
        ]
        if vals:
            out[short] = sum(vals) / len(vals)
    return out or None


def split_microbatches(batch: dict, accum: int, has_meta: bool = True) -> dict:
    """Reshape the leading batch dim into (accum, B/accum, ...) microbatch
    stacks. This is THE definition of the accumulation split protocol: the
    train step scans over these stacks preprocessing microbatch i with
    ``fold_in(r_pre, i)``, and the GradNorm re-forward (train/loop.py)
    replays the exact same split + rng scheme — both consume this helper so
    the two can never drift."""

    def split(x):
        return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

    micro = {
        "images": split(batch["images"]),
        "targets": {t: split(v) for t, v in batch["targets"].items()},
    }
    if batch.get("aux") is not None and has_meta:
        micro["aux"] = split(batch["aux"])
    if batch.get("group_ids") is not None:
        micro["group_ids"] = split(batch["group_ids"])
    return micro


def make_preprocess_fn(
    mix_cfg: MixConfig,
    has_meta: bool = True,
    num_classes: dict[str, int] | None = None,
    augment_fn: Callable | None = None,
):
    """On-device collate: [0,1] conversion -> augmentation -> mixing ->
    meta-masking. Shared by the train step AND the GradNorm re-forward so
    GradNorm measures norms on the SAME collated (augmented/mixed/masked)
    tensors training consumed (reference: gradient_weighting.py:367-430
    re-forwards the collated batch, not the raw one).

    Returns ``preprocess(batch, rng) -> (images, targets, meta, mixed_mask)``
    where batch carries ``_scalars`` (ScheduleScalars).
    """

    def _ensure_soft(targets):
        out = {}
        for t, v in targets.items():
            if v.ndim == 1:
                if num_classes is None:
                    raise ValueError(
                        "integer targets require num_classes in make_train_step"
                    )
                # -1 (unmapped) encodes to an all-zero row -> zero loss mass
                out[t] = jax.nn.one_hot(v, num_classes[t], dtype=jnp.float32)
            else:
                out[t] = v
        return out

    def preprocess(batch, rng):
        r_mix, r_meta, r_partial, r_aug = jax.random.split(rng, 4)
        images = batch["images"]
        if jnp.issubdtype(images.dtype, jnp.integer):
            # uint8 host pipeline -> on-device [0, 1] float
            images = images.astype(jnp.float32) * (1.0 / 255.0)
        if augment_fn is not None:
            images = augment_fn(images.astype(jnp.float32), r_aug).astype(
                images.dtype
            )
        targets = _ensure_soft(batch["targets"])
        meta = batch.get("aux") if has_meta else None
        group_ids = batch.get("group_ids")
        scalars = batch["_scalars"]
        if group_ids is None:
            group_ids = jnp.zeros(images.shape[0], jnp.int32)
        images, targets, meta, mixed_mask = apply_mixing(
            images, targets, meta, group_ids, r_mix, mix_cfg,
            scalars.mix_prob, scalars.use_cutmix,
        )
        masked_flags = None
        if meta is not None:
            meta, masked_flags = apply_meta_masking(
                meta, r_meta, scalars.meta_mask_prob
            )
            meta = apply_partial_meta_masking(
                meta, r_partial, scalars.partial_mask_prob,
                scalars.partial_combo_mask, masked_flags,
            )
        return images, targets, meta, mixed_mask

    return preprocess


def train_step_rngs(rng: jax.Array, step) -> tuple[jax.Array, jax.Array]:
    """(preprocess_rng, loss_rng) for a given optimizer step — factored out
    so the GradNorm re-forward can regenerate the exact collate randomness
    the train step used at that step."""
    step_rng = jax.random.fold_in(rng, step)
    r_pre, r_loss = jax.random.split(step_rng)
    return r_pre, r_loss


def make_train_step(
    criteria: dict[str, Callable],
    task_keys: tuple[str, ...],
    mix_cfg: MixConfig,
    clip_grad: float = 0.0,
    accumulation_steps: int = 1,
    phase1_mask_null: bool = False,
    apply_class_weights: bool = True,
    class_weights: dict[str, Any] | None = None,
    has_meta: bool = True,
    lr_schedule: Callable | None = None,
    num_classes: dict[str, int] | None = None,
    augment_fn: Callable | None = None,
    moe_aux_weight: float = 0.0,
    moe_z_weight: float = 0.0,
    ema_decay: float = 0.0,
):
    """Build the jittable train step.

    ``augment_fn``: optional batched augmentation (AutoAugment / color
    jitter / hflip / random erasing) fused into the step when
    AUG.SINGLE_AUG_DEVICE='device' — the TPU-native analog of the
    reference's per-sample preprocess-thread augmentation
    (base_prefetching_dataset.py:612-711 + aug/factory.py:14-44). Applied
    AFTER the [0,1] conversion and BEFORE mixing, matching the reference
    order (per-sample aug in preprocess, batch mixing in collate).

    Returned fn: ``train_step(state, batch, scalars) -> (state, metrics)``
    where batch = {images, targets: {task: one-hot [B,C] or int [B]}, aux,
    group_ids}. Integer labels are one-hot encoded on device (saves host->HBM
    bandwidth; requires ``num_classes``).
    """
    accum = max(int(accumulation_steps), 1)
    collect_moe = moe_aux_weight > 0.0 or moe_z_weight > 0.0
    preprocess = make_preprocess_fn(
        mix_cfg, has_meta=has_meta, num_classes=num_classes,
        augment_fn=augment_fn,
    )

    def loss_fn(params, apply_fn, images, targets, meta, scalars, rng, task_weights,
                batch_stats=None):
        r_drop, r_null, r_gumbel = jax.random.split(rng, 3)
        variables = {"params": params}
        new_batch_stats = None
        intermediates = None
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable.append("batch_stats")
        if collect_moe:
            # MoE aux losses are sown into 'intermediates' (blocks/moe.py);
            # eval/inference never mutate the collection so sow is a no-op
            # there — only the train step pays for collecting it.
            mutable.append("intermediates")
        if mutable:
            outputs, mutated = apply_fn(
                variables,
                images,
                meta,
                deterministic=False,
                training=True,
                rngs={"dropout": r_drop, "gumbel": r_gumbel},
                mutable=mutable,
            )
            new_batch_stats = mutated.get("batch_stats")
            intermediates = mutated.get("intermediates")
        else:
            outputs = apply_fn(
                variables,
                images,
                meta,
                deterministic=False,
                training=True,
                rngs={"dropout": r_drop, "gumbel": r_gumbel},
            )
        total, components = weighted_hierarchical_loss(
            outputs,
            targets,
            criteria,
            task_weights,
            scalars.null_mask_prob,
            r_null,
            class_weights=class_weights,
            phase1_mask_null=phase1_mask_null,
            apply_class_weights=apply_class_weights,
            task_keys=task_keys,
        )
        if intermediates is not None:
            moe = _collect_moe_stats(intermediates)
            if moe is not None:
                # averaged over MoE layers (V-MoE convention), weighted into
                # the scalar loss; raw values surfaced in components/metrics
                total = total + (
                    moe_aux_weight * moe["moe_aux"] + moe_z_weight * moe["moe_z"]
                )
                # the reported total is the OPTIMIZED total (incl. the
                # weighted aux terms), matching what the gradient descends
                components = dict(components, **moe, total=total)
        return total, (outputs, components, new_batch_stats)

    def train_step(state: TrainState, batch: dict, scalars: ScheduleScalars):
        r_pre, r_loss = train_step_rngs(state.rng, state.step)
        batch = dict(batch)
        batch["_scalars"] = scalars

        new_batch_stats = state.batch_stats
        if accum == 1:
            images, targets, meta, mixed_mask = preprocess(batch, r_pre)
            (total, (outputs, components, nbs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(
                state.params, state.apply_fn, images, targets, meta,
                scalars, r_loss, state.gradnorm.task_weights,
                state.batch_stats,
            )
            if nbs is not None:
                new_batch_stats = nbs
        else:
            # microbatch scan over the canonical split protocol
            micro = split_microbatches(batch, accum, has_meta)

            def body(carry, mb):
                # batch_stats rides the carry so BN running stats update on
                # every microbatch (each sees the previous microbatch's
                # stats) instead of being silently discarded under
                # accumulation. None carries through unchanged (no-BN model).
                acc_grads, acc_loss, acc_stats, bs, i = carry
                mb = dict(mb)
                mb["_scalars"] = scalars
                r_i = jax.random.fold_in(r_pre, i)
                images, targets, meta, mb_mixed = preprocess(mb, r_i)
                (total, (mb_out, mb_comp, nbs)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(
                    state.params, state.apply_fn, images, targets, meta,
                    scalars, jax.random.fold_in(r_loss, i),
                    state.gradnorm.task_weights, bs,
                )
                bs = bs if nbs is None else nbs
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                # scalar per-task stats ride the carry so accumulation runs
                # report the same metric keys as accum=1 (reference logs
                # per-task losses/accuracy regardless of accumulation,
                # train.py:350). Accuracy counts vs the RAW microbatch
                # targets (pre-mixing), like the accum=1 path.
                stats = {"mixed": mb_mixed.astype(jnp.float32).sum()}
                if collect_moe:
                    for k_moe in _MOE_KEYS:
                        stats[k_moe] = mb_comp.get(k_moe, jnp.float32(0.0))
                for t in task_keys:
                    raw_tgt = mb["targets"][t]
                    stats[f"loss/{t}"] = mb_comp["tasks"][t]
                    stats[f"correct1/{t}"] = _topk_correct(
                        mb_out[t], raw_tgt, 1
                    ).astype(jnp.float32)
                    k3 = min(3, mb_out[t].shape[-1])
                    stats[f"correct3/{t}"] = _topk_correct(
                        mb_out[t], raw_tgt, k3
                    ).astype(jnp.float32)
                    stats[f"valid/{t}"] = _valid_mask(raw_tgt).sum().astype(
                        jnp.float32
                    )
                acc_stats = jax.tree.map(jnp.add, acc_stats, stats)
                return (acc_grads, acc_loss + total, acc_stats, bs, i + 1), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            zero_stats = {"mixed": jnp.float32(0.0)}
            if collect_moe:
                for k_moe in _MOE_KEYS:
                    zero_stats[k_moe] = jnp.float32(0.0)
            for t in task_keys:
                for k in ("loss", "correct1", "correct3", "valid"):
                    zero_stats[f"{k}/{t}"] = jnp.float32(0.0)
            (grads, total, acc_stats, final_bs, _), _ = jax.lax.scan(
                body,
                (zero_grads, jnp.float32(0.0), zero_stats,
                 state.batch_stats, jnp.int32(0)),
                micro,
            )
            if final_bs is not None:
                new_batch_stats = final_bs
            grads = jax.tree.map(lambda g: g / accum, grads)
            total = total / accum
            components = {
                "total": total,
                "tasks": {
                    t: acc_stats[f"loss/{t}"] / accum for t in task_keys
                },
            }
            outputs, mixed_mask = None, None
            accum_metrics = {"mixed_frac": acc_stats["mixed"] /
                             jnp.float32(batch["images"].shape[0])}
            if collect_moe:
                for k_moe in _MOE_KEYS:
                    accum_metrics[k_moe] = acc_stats[k_moe] / accum
            for t in task_keys:
                accum_metrics[f"loss/{t}"] = components["tasks"][t]
                denom = jnp.maximum(acc_stats[f"valid/{t}"], 1.0)
                accum_metrics[f"acc1/{t}"] = acc_stats[f"correct1/{t}"] / denom
                accum_metrics[f"acc3/{t}"] = acc_stats[f"correct3/{t}"] / denom

        # fp32 grads for clip/update numerics
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        pre_clip_norm = optax.global_norm(grads)
        if clip_grad and clip_grad > 0:
            scale = jnp.minimum(1.0, clip_grad / (pre_clip_norm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        post_clip_norm = optax.global_norm(grads)

        new_state = state.apply_gradients(grads)
        if new_batch_stats is not None:
            new_state = new_state.replace(batch_stats=new_batch_stats)
        if ema_decay and ema_decay > 0:
            # in-jit EMA: one fused multiply-add per param, riding the
            # optimizer update's HBM pass (TRAIN.EMA.DECAY)
            d = jnp.float32(ema_decay)
            new_state = new_state.replace(
                ema_params=jax.tree.map(
                    lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype),
                    state.ema_params,
                    new_state.params,
                )
            )

        metrics = {
            "loss": components["total"],
            "grad_norm_pre_clip": pre_clip_norm,
            "grad_norm_post_clip": post_clip_norm,
            "task_weights": state.gradnorm.task_weights,
        }
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        if outputs is not None:
            for t in task_keys:
                metrics[f"loss/{t}"] = components["tasks"][t]
            metrics.update(_accuracy_metrics(outputs, batch["targets"]))
            metrics["mixed_frac"] = mixed_mask.astype(jnp.float32).mean()
            for k_moe in _MOE_KEYS:
                if k_moe in components:
                    metrics[k_moe] = components[k_moe]
        else:
            metrics.update(accum_metrics)
        return new_state, metrics

    return train_step


def make_eval_step(
    criteria: dict[str, Callable],
    task_keys: tuple[str, ...],
    has_meta: bool = True,
    num_classes: dict[str, int] | None = None,
    null_tasks: tuple[str, ...] = (),
    subset_bins: dict | None = None,
    taxa_selectors: dict | None = None,
):
    """Validation step: deterministic forward + unmasked loss + top-k counts.

    ``mask_meta``: zero the entire aux vector (VALIDATION_MASK_META);
    ``partial_combo_mask``: [meta_dim] 0/1 columns to zero
    (VALIDATION_PARTIAL_MASK_META). Both are operands.

    ``null_tasks``: tasks to split top-1 counts by null (class 0) vs
    non-null labels (reference: METRICS.TRACK_NULL_VS_NON_NULL,
    utils/metrics/tracker.py null-vs-non-null accumulators).
    ``subset_bins``: task -> int32 [num_classes] class->rarity-bin table
    (reference: SubsetMetricWrapper over rarity percentile subsets); bucketed
    counts come from one gather, keys ``subset_correct1/<name>/<task>`` +
    matching ``subset_count/``.
    ``taxa_selectors``: subset name -> (rank_key, class_index); samples whose
    target at rank_key equals class_index contribute per-task bucketed counts
    (reference: METRICS.TAXA_SUBSETS custom subsets,
    vectorized_dataset_processor.py:859-880).
    """

    def eval_step(
        state: TrainState,
        batch: dict,
        mask_meta: jnp.ndarray,
        partial_combo_mask: jnp.ndarray,
    ):
        images = batch["images"]
        if jnp.issubdtype(images.dtype, jnp.integer):
            images = images.astype(jnp.float32) * (1.0 / 255.0)
        targets = {}
        for t, v in batch["targets"].items():
            if v.ndim == 1:
                if num_classes is None:
                    raise ValueError(
                        "eval_step: integer targets require num_classes "
                        "(pass make_eval_step(..., num_classes=...))"
                    )
                targets[t] = jax.nn.one_hot(v, num_classes[t], dtype=jnp.float32)
            else:
                targets[t] = v
        meta = batch.get("aux") if has_meta else None
        if meta is not None:
            meta = jnp.where(mask_meta, jnp.zeros_like(meta), meta)
            meta = meta * (1.0 - partial_combo_mask)[None, :].astype(meta.dtype)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        outputs = state.apply_fn(variables, images, meta, deterministic=True)
        total, components = weighted_hierarchical_loss(
            outputs,
            targets,
            criteria,
            jnp.ones((len(task_keys),), jnp.float32),
            1.0,
            jax.random.PRNGKey(0),
            is_validation=True,
            task_keys=task_keys,
        )
        n = jnp.float32(images.shape[0])
        metrics = {"loss": total, "count": n}
        for t in task_keys:
            metrics[f"loss/{t}"] = components["tasks"][t]
            metrics[f"correct1/{t}"] = _topk_correct(outputs[t], targets[t], 1)
            k3 = min(3, outputs[t].shape[-1])
            metrics[f"correct3/{t}"] = _topk_correct(outputs[t], targets[t], k3)
            valid = _valid_mask(targets[t]).astype(jnp.float32)
            metrics[f"valid_count/{t}"] = jnp.sum(valid)
            tgt_idx = jnp.argmax(targets[t], axis=-1)
            top1 = (jnp.argmax(outputs[t], axis=-1) == tgt_idx).astype(
                jnp.float32
            ) * valid
            if t in null_tasks:
                is_null = (tgt_idx == 0).astype(jnp.float32) * valid
                metrics[f"subset_correct1/null/{t}"] = jnp.sum(top1 * is_null)
                metrics[f"subset_count/null/{t}"] = jnp.sum(is_null)
                non_null = (1.0 - (tgt_idx == 0)) * valid
                metrics[f"subset_correct1/non_null/{t}"] = jnp.sum(
                    top1 * non_null
                )
                metrics[f"subset_count/non_null/{t}"] = jnp.sum(non_null)
            table = (subset_bins or {}).get(t)
            if table is not None:
                n_bins = int(np.max(table)) + 1
                bins = jnp.asarray(table)[tgt_idx]
                for bi in range(n_bins):
                    sel = (bins == bi).astype(jnp.float32) * valid
                    metrics[f"subset_correct1/rarity_{bi}/{t}"] = jnp.sum(
                        top1 * sel
                    )
                    metrics[f"subset_count/rarity_{bi}/{t}"] = jnp.sum(sel)
            for name, (rank_key, cid) in (taxa_selectors or {}).items():
                sel = (
                    (jnp.argmax(targets[rank_key], axis=-1) == cid)
                    & _valid_mask(targets[rank_key])
                ).astype(jnp.float32) * valid
                metrics[f"subset_correct1/taxa_{name}/{t}"] = jnp.sum(top1 * sel)
                metrics[f"subset_count/taxa_{name}/{t}"] = jnp.sum(sel)
        return metrics, outputs

    return eval_step
