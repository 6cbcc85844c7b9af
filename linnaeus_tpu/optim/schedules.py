"""LR schedules: cosine / linear / step / wsd, all step-indexed with warmup.

Reference parity: lr_schedulers/build.py:12-300 and
lr_schedulers/schedulers/*.py. Schedules are optax-style
``step -> lr`` callables, built after TOTAL_STEPS is known; *_FRACTION config
alternatives are resolved by utils/schedule_utils.resolve_all_schedule_params.
"""

from __future__ import annotations

import optax


def _warmup(base_schedule, warmup_steps: int, warmup_lr: float, base_lr: float):
    if warmup_steps <= 0:
        return base_schedule
    warm = optax.linear_schedule(warmup_lr, base_lr, warmup_steps)

    def sched(step):
        import jax.numpy as jnp

        return jnp.where(
            step < warmup_steps, warm(step), base_schedule(step - warmup_steps)
        )

    return sched


def cosine_schedule(base_lr, min_lr, total_steps, warmup_steps=0, warmup_lr=0.0):
    decay_steps = max(total_steps - warmup_steps, 1)
    base = optax.cosine_decay_schedule(
        base_lr, decay_steps, alpha=min_lr / max(base_lr, 1e-12)
    )
    return _warmup(base, warmup_steps, warmup_lr, base_lr)


def linear_schedule(base_lr, min_lr, total_steps, warmup_steps=0, warmup_lr=0.0):
    decay_steps = max(total_steps - warmup_steps, 1)
    base = optax.linear_schedule(base_lr, min_lr, decay_steps)
    return _warmup(base, warmup_steps, warmup_lr, base_lr)


def step_schedule(
    base_lr, decay_steps, decay_rate, total_steps, warmup_steps=0, warmup_lr=0.0
):
    base = optax.exponential_decay(
        base_lr, max(decay_steps, 1), decay_rate, staircase=True
    )
    return _warmup(base, warmup_steps, warmup_lr, base_lr)


def wsd_schedule(
    base_lr,
    min_lr,
    total_steps,
    warmup_steps=0,
    warmup_lr=0.0,
    stable_fraction=0.8,
    decay_fraction=0.1,
    decay_type="cosine",
):
    """Warmup-Stable-Decay (lr_schedulers/schedulers StableDecayScheduler:12).

    Post-warmup steps split into a stable plateau at base_lr followed by a
    cosine/linear decay to min_lr; any remainder stays at min_lr.
    """
    import jax.numpy as jnp

    post = max(total_steps - warmup_steps, 1)
    stable_steps = int(post * stable_fraction)
    decay_steps = max(int(post * decay_fraction), 1)

    def base(step):
        in_decay = jnp.clip((step - stable_steps) / decay_steps, 0.0, 1.0)
        if decay_type == "linear":
            factor = 1.0 - in_decay
        else:
            factor = 0.5 * (1.0 + jnp.cos(jnp.pi * in_decay))
        return min_lr + (base_lr - min_lr) * factor

    return _warmup(base, warmup_steps, warmup_lr, base_lr)


def resolve_warmup_steps(config, total_steps: int, steps_per_epoch: int) -> int:
    """Warmup precedence (lr_schedulers/build.py): FRACTION > EPOCHS > STEPS."""
    lr_cfg = config.LR_SCHEDULER
    frac = lr_cfg.get("WARMUP_FRACTION")
    if frac is not None and frac > 0:
        return int(total_steps * float(frac))
    epochs = lr_cfg.get("WARMUP_EPOCHS")
    if epochs and steps_per_epoch > 0:
        return int(float(epochs) * steps_per_epoch)
    return int(lr_cfg.get("WARMUP_STEPS", 0) or 0)


def build_schedule(config, total_steps: int, steps_per_epoch: int = 0):
    """Main entry: schedule from config (reference: build_scheduler:12)."""
    lr_cfg = config.LR_SCHEDULER
    name = str(lr_cfg.NAME).lower()
    base_lr = float(lr_cfg.BASE_LR)
    min_lr = float(lr_cfg.MIN_LR)
    warmup_lr = float(lr_cfg.WARMUP_LR)
    warmup_steps = resolve_warmup_steps(config, total_steps, steps_per_epoch)

    if name == "cosine":
        return cosine_schedule(base_lr, min_lr, total_steps, warmup_steps, warmup_lr)
    if name == "linear":
        return linear_schedule(base_lr, min_lr, total_steps, warmup_steps, warmup_lr)
    if name == "step":
        decay_steps = lr_cfg.get("DECAY_STEPS", 5000)
        frac = lr_cfg.get("DECAY_FRACTION")
        if frac is not None and frac > 0:
            decay_steps = int(total_steps * float(frac))
        return step_schedule(
            base_lr,
            decay_steps,
            float(lr_cfg.DECAY_RATE),
            total_steps,
            warmup_steps,
            warmup_lr,
        )
    if name == "wsd":
        return wsd_schedule(
            base_lr,
            min_lr,
            total_steps,
            warmup_steps,
            warmup_lr,
            stable_fraction=float(lr_cfg.STABLE_DURATION_FRACTION),
            decay_fraction=float(lr_cfg.DECAY_DURATION_FRACTION),
            decay_type=str(lr_cfg.DECAY_TYPE),
        )
    raise ValueError(f"Unknown LR_SCHEDULER.NAME '{name}'")


def apply_lr_scaling(config, effective_batch_size: int) -> float:
    """Linear LR scaling by effective batch — canonical implementation in
    utils/schedule_utils.py (writes the scaled LR back into the config)."""
    from linnaeus_tpu.utils.schedule_utils import (
        apply_lr_scaling as _apply,
    )

    return _apply(config, effective_batch_size)


def build_group_schedules(config, total_steps: int, steps_per_epoch: int = 0):
    """Group name -> INDEPENDENT optax schedule (reference:
    lr_schedulers/build.py:291 _build_multi_scheduler +
    multi_lr_scheduler.py:19 MultiLRScheduler).

    Each ``LR_SCHEDULER.PARAMETER_GROUPS.<GROUP>`` entry is a partial
    LR_SCHEDULER override (NAME / BASE_LR / MIN_LR / WARMUP_* / WSD knobs...)
    keyed by the same group names as OPTIMIZER.PARAMETER_GROUPS; groups
    without an entry inherit the base schedule (scaled by their
    LR_MULTIPLIER inside build_optimizer). 'default' is always present.
    """
    out = {"default": build_schedule(config, total_steps, steps_per_epoch)}
    pg = config.LR_SCHEDULER.get("PARAMETER_GROUPS", {})
    if not pg or not pg.get("ENABLED", False):
        return out
    # per-group overrides that don't match any optimizer group would build
    # schedules never attached to params — surface the mismatch
    opt_groups = {
        k for k in config.OPTIMIZER.get("PARAMETER_GROUPS", {})
        if k != "ENABLED"
    }
    scaling = float(config.LR_SCHEDULER.get("LR_SCALING_FACTOR", 1.0) or 1.0)
    for gname, gcfg in pg.items():
        if gname in ("ENABLED",) or not isinstance(gcfg, dict):
            continue
        if gname not in opt_groups:
            from linnaeus_tpu.utils.logging import get_main_logger

            get_main_logger().warning(
                f"LR_SCHEDULER.PARAMETER_GROUPS.{gname} matches no "
                f"OPTIMIZER.PARAMETER_GROUPS entry — its schedule will "
                f"never be attached to any params"
            )
        sub = config.clone()
        sub.defrost()
        for k, v in gcfg.items():
            # group BASE_LR overrides mean "LR at REFERENCE_BS", like the
            # base schedule: apply the same linear scaling factor
            if k == "BASE_LR" and scaling != 1.0:
                v = float(v) * scaling
            sub.LR_SCHEDULER[k] = v
        out[gname] = build_schedule(sub, total_steps, steps_per_epoch)
    return out
