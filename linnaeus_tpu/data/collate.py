"""On-device batch transforms: selective mixup/cutmix + meta-masking.

The reference applies these in a 1450-line host-side ``collate_fn``
(h5data/h5dataloader.py:484-1450) in the order: stack -> mixup/cutmix ->
full meta-masking -> partial meta-masking -> stats. Here they are pure jnp
ops fused INTO the jitted train step (per the north star): probabilities
arrive as per-step scalars from OpsSchedule, randomness from the step PRNG,
so the whole pipeline compiles to one XLA program with zero host round-trips.

Selective-mixing semantics (aug/gpu/selective_mixup.py:14-41,
selective_cutmix.py:14, aug/utils.py:16-60):
  * partner = IN-GROUP permutation (aug/gpu/selective_mixup.py:328
    ``_get_ingroup_permutation``): every sample in a group with >=2 in-batch
    members gets a same-group partner != self; singletons and group id -1
    map to themselves and are excluded by the mix mask;
  * images and soft targets interpolate by lam ~ Beta(alpha, alpha);
  * metadata uses chunk-level HARD PICK per component: both-nonzero -> pick
    one at random; exactly-one-nonzero -> keep it; both-zero -> zero;
  * null-labeled samples (target idx 0 in NULL_TASK_KEYS) optionally excluded.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MixConfig(NamedTuple):
    """Static mixing configuration (baked into the jit)."""

    mixup_alpha: float = 1.0
    cutmix_alpha: float = 1.0
    # optional (min, max) bounds on the cutmix area-ratio lam — the beta
    # sample is affinely rescaled into [min, max] (reference
    # aug/cpu/selective_cutmix.py:202-204 SCHEDULE.MIX.CUTMIX.MINMAX)
    cutmix_minmax: tuple[float, float] | None = None
    mixup_enabled: bool = True
    cutmix_enabled: bool = False
    exclude_null: bool = False
    null_task_keys: tuple[str, ...] = ()
    chunk_bounds: tuple[tuple[int, int], ...] = ()


def _sample_beta(rng: jax.Array, alpha: float) -> jnp.ndarray:
    """Beta(alpha, alpha) via two gammas (jax.random.beta)."""
    return jax.random.beta(rng, alpha, alpha)


def ingroup_permutation(rng: jax.Array, group_ids: jnp.ndarray) -> jnp.ndarray:
    """Jittable in-group permutation (reference
    aug/gpu/selective_mixup.py:328-391 ``_get_ingroup_permutation``).

    The reference loops over unique group ids and randperms each group's
    member indices — data-dependent control flow that XLA can't compile.
    Here: sort positions by (group_id, uniform noise), then rotate by one
    within each equal-group run. That yields a uniformly-random cyclic
    pairing inside every group — each member of a group of size >= 2 gets a
    same-group partner != self (strictly better fire-rate than the
    reference's randperm, which can have fixed points), and singletons map
    to themselves (excluded downstream by the ``perm != arange`` check).
    """
    B = group_ids.shape[0]
    r = jax.random.uniform(rng, (B,))
    order = jnp.lexsort((r, group_ids))  # primary: group, secondary: random
    sg = group_ids[order]
    idx = jnp.arange(B)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sg[1:] != sg[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    next_same = jnp.concatenate([sg[1:] == sg[:-1], jnp.zeros((1,), bool)])
    partner_pos = jnp.where(next_same, idx + 1, run_start)
    return jnp.zeros((B,), idx.dtype).at[order].set(order[partner_pos])


def _mixable_mask(
    group_ids: jnp.ndarray,
    perm: jnp.ndarray,
    targets: dict[str, jnp.ndarray],
    cfg: MixConfig,
) -> jnp.ndarray:
    """[B] bool: sample mixes with its permuted partner."""
    same_group = group_ids == group_ids[perm]
    # group id -1 = "ungrouped" in the reference (selective_mixup.py:355-357)
    mask = same_group & (perm != jnp.arange(group_ids.shape[0])) & (group_ids != -1)
    if cfg.exclude_null and cfg.null_task_keys:
        for t in cfg.null_task_keys:
            tgt = targets[t]
            is_null = tgt[:, 0] > 0.5 if tgt.ndim == 2 else tgt == 0
            mask = mask & ~is_null & ~is_null[perm]
    return mask


def _mix_targets(
    targets: dict[str, jnp.ndarray],
    perm: jnp.ndarray,
    lam: jnp.ndarray,
    mask: jnp.ndarray,
) -> dict[str, jnp.ndarray]:
    out = {}
    for t, tgt in targets.items():
        tgt = tgt.astype(jnp.float32)
        mixed = lam * tgt + (1.0 - lam) * tgt[perm]
        out[t] = jnp.where(mask[:, None], mixed, tgt)
    return out


def _hard_pick_meta(
    meta: jnp.ndarray,
    perm: jnp.ndarray,
    rng: jax.Array,
    mask: jnp.ndarray,
    chunk_bounds: tuple[tuple[int, int], ...],
) -> jnp.ndarray:
    """Chunk-level hard pick (aug/gpu/selective_mixup.py:14-41)."""
    if meta is None or not chunk_bounds:
        return meta
    partner = meta[perm]
    out = meta
    for ci, (start, end) in enumerate(chunk_bounds):
        a = meta[:, start:end]
        b = partner[:, start:end]
        a_nz = jnp.any(a != 0, axis=1)
        b_nz = jnp.any(b != 0, axis=1)
        pick_b = jax.random.bernoulli(
            jax.random.fold_in(rng, ci), 0.5, a_nz.shape
        )
        # both nonzero -> random pick; only b -> b; only a / both zero -> a
        use_b = jnp.where(a_nz & b_nz, pick_b, (~a_nz) & b_nz)
        chunk = jnp.where((use_b & mask)[:, None], b, a)
        out = out.at[:, start:end].set(chunk)
    return out


def selective_mixup(
    images: jnp.ndarray,
    targets: dict[str, jnp.ndarray],
    meta: jnp.ndarray | None,
    group_ids: jnp.ndarray,
    rng: jax.Array,
    cfg: MixConfig,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray], jnp.ndarray | None, jnp.ndarray]:
    """Returns (images, targets, meta, mixed_mask)."""
    r_perm, r_lam, r_meta = jax.random.split(rng, 3)
    B = images.shape[0]
    perm = ingroup_permutation(r_perm, group_ids)
    mask = _mixable_mask(group_ids, perm, targets, cfg)
    lam = _sample_beta(r_lam, cfg.mixup_alpha)

    im_mask = mask.reshape((B,) + (1,) * (images.ndim - 1))
    mixed_images = lam * images + (1.0 - lam) * images[perm]
    images = jnp.where(im_mask, mixed_images.astype(images.dtype), images)
    targets = _mix_targets(targets, perm, lam, mask)
    meta = _hard_pick_meta(meta, perm, r_meta, mask, cfg.chunk_bounds)
    return images, targets, meta, mask


def _rand_bbox(rng: jax.Array, h: int, w: int, lam: jnp.ndarray):
    """Cut box with area ratio (1-lam) (aug/utils.py:16)."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cut_w = (w * cut_rat).astype(jnp.int32)
    ry, rx = jax.random.split(rng)
    cy = jax.random.randint(ry, (), 0, h)
    cx = jax.random.randint(rx, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def selective_cutmix(
    images: jnp.ndarray,
    targets: dict[str, jnp.ndarray],
    meta: jnp.ndarray | None,
    group_ids: jnp.ndarray,
    rng: jax.Array,
    cfg: MixConfig,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray], jnp.ndarray | None, jnp.ndarray]:
    """CutMix variant: paste the partner's box, targets weighted by true area."""
    r_perm, r_lam, r_box, r_meta = jax.random.split(rng, 4)
    B, H, W = images.shape[0], images.shape[1], images.shape[2]
    perm = ingroup_permutation(r_perm, group_ids)
    mask = _mixable_mask(group_ids, perm, targets, cfg)
    lam = _sample_beta(r_lam, cfg.cutmix_alpha)
    if cfg.cutmix_minmax is not None:
        lo, hi = float(cfg.cutmix_minmax[0]), float(cfg.cutmix_minmax[1])
        lam = lo + (hi - lo) * lam
    y1, y2, x1, x2 = _rand_bbox(r_box, H, W, lam)

    rows = jnp.arange(H)[None, :, None, None]
    cols = jnp.arange(W)[None, None, :, None]
    in_box = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
    im_mask = mask.reshape(B, 1, 1, 1) & in_box
    images = jnp.where(im_mask, images[perm], images)

    # adjusted lam = 1 - actual box area fraction
    box_area = ((y2 - y1) * (x2 - x1)).astype(jnp.float32)
    lam_adj = 1.0 - box_area / float(H * W)
    targets = _mix_targets(targets, perm, lam_adj, mask)
    meta = _hard_pick_meta(meta, perm, r_meta, mask, cfg.chunk_bounds)
    return images, targets, meta, mask


def apply_mixing(
    images: jnp.ndarray,
    targets: dict[str, jnp.ndarray],
    meta: jnp.ndarray | None,
    group_ids: jnp.ndarray,
    rng: jax.Array,
    cfg: MixConfig,
    mix_prob: jnp.ndarray,
    use_cutmix: jnp.ndarray,
):
    """Gate mixing by the scheduled probability; pick mixup vs cutmix.

    ``mix_prob`` and ``use_cutmix`` are traced scalars, so one compiled step
    serves the entire schedule. Both branches run under lax.cond.
    """
    r_gate, r_mix = jax.random.split(rng)
    do_mix = jax.random.uniform(r_gate, ()) < mix_prob

    def mixed(_):
        if cfg.cutmix_enabled and cfg.mixup_enabled:
            return jax.lax.cond(
                use_cutmix,
                lambda __: selective_cutmix(images, targets, meta, group_ids, r_mix, cfg),
                lambda __: selective_mixup(images, targets, meta, group_ids, r_mix, cfg),
                None,
            )
        if cfg.cutmix_enabled:
            return selective_cutmix(images, targets, meta, group_ids, r_mix, cfg)
        return selective_mixup(images, targets, meta, group_ids, r_mix, cfg)

    def unmixed(_):
        soft = {t: v.astype(jnp.float32) for t, v in targets.items()}
        return images, soft, meta, jnp.zeros(images.shape[0], dtype=bool)

    if not (cfg.mixup_enabled or cfg.cutmix_enabled):
        return unmixed(None)
    return jax.lax.cond(do_mix, mixed, unmixed, None)


def apply_meta_masking(
    meta: jnp.ndarray,
    rng: jax.Array,
    mask_prob: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Zero each sample's ENTIRE aux vector w.p. mask_prob
    (h5dataloader.py:662-760). Returns (meta, masked_flags)."""
    if meta is None:
        return meta, None
    flags = jax.random.bernoulli(rng, mask_prob, (meta.shape[0],))
    return jnp.where(flags[:, None], 0.0, meta).astype(meta.dtype), flags


def apply_partial_meta_masking(
    meta: jnp.ndarray,
    rng: jax.Array,
    partial_prob: jnp.ndarray,
    combo_mask: jnp.ndarray,
    already_masked: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Zero a whitelisted component combination per sample w.p. partial_prob.

    ``combo_mask``: [meta_dim] 0/1 vector marking the columns of the combo
    chosen by OpsSchedule this step (operand, not static => no recompiles).
    Samples already fully masked are skipped (h5dataloader.py:808+).
    """
    if meta is None:
        return meta
    flags = jax.random.bernoulli(rng, partial_prob, (meta.shape[0],))
    if already_masked is not None:
        flags = flags & ~already_masked
    zeroed = meta * (1.0 - combo_mask)[None, :].astype(meta.dtype)
    return jnp.where(flags[:, None], zeroed, meta)


def compute_actual_meta_stats(meta: jnp.ndarray | None, chunk_bounds) -> dict:
    """Fraction of samples with non-zero data per component
    (the collate_fn's "actual meta stats")."""
    if meta is None or not chunk_bounds:
        return {}
    stats = {}
    for i, (start, end) in enumerate(chunk_bounds):
        nz = jnp.any(meta[:, start:end] != 0, axis=1)
        stats[f"component_{i}_valid_frac"] = nz.mean()
    return stats
