"""Optimizer construction from config.

Reference parity: optimizers/build.py:29-720 (single + multi-optimizer with
per-group filters and LR multipliers, weight-decay skip for 1D/bias/norm
params) and optimizers/multi_optimizer.py. Multi-group dispatch maps onto
``optax.multi_transform`` with labels from the param-filter predicates — one
optimizer state pytree, one jitted update, no Python-side fan-out.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax

from linnaeus_tpu.utils.logging import get_main_logger
from linnaeus_tpu.utils.param_filters import (
    build_filter_from_config,
    param_labels,
)
from .ademamix import ademamix
from .muon import muon

logger = get_main_logger()


def _no_decay_mask(params):
    """Decoupled-WD mask: skip 1D params (biases, norm scales, cls tokens
    collapse to <=1 effective dims) — reference: set_weight_decay:687.
    MoE expert biases (blocks/moe.py 'bi'/'bo') carry a leading expert axis
    so they are 2-D, but remain biases — skipped by name."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    if isinstance(params, dict):
        flat = flatten_dict(params, sep="/")
        # non-array nodes (e.g. optax.MaskedNode under multi_transform) pass
        # through unchanged — mirroring jax.tree.map, which never visits
        # zero-leaf subtrees, so the mask tree keeps the params' structure
        mask = {
            path: (
                p
                if not hasattr(p, "ndim")
                else (
                    p.ndim > 1
                    and path.rsplit("/", 1)[-1] not in ("bi", "bo")
                )
            )
            for path, p in flat.items()
        }
        return unflatten_dict(mask, sep="/")
    return jax.tree.map(lambda p: p.ndim > 1, params)


def _make_single(
    name: str,
    schedule: optax.ScalarOrSchedule,
    config,
    weight_decay: float | None = None,
) -> optax.GradientTransformation:
    opt = config.OPTIMIZER
    wd = float(opt.WEIGHT_DECAY if weight_decay is None else weight_decay)
    name = name.lower()
    if name == "adamw":
        betas = tuple(opt.BETAS)
        return optax.adamw(
            schedule,
            b1=float(betas[0]),
            b2=float(betas[1]),
            eps=float(opt.EPS),
            weight_decay=wd,
            mask=_no_decay_mask,
        )
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(wd, mask=_no_decay_mask) if wd > 0 else optax.identity(),
            optax.sgd(schedule, momentum=float(opt.MOMENTUM), nesterov=True),
        )
    if name == "muon":
        m = opt.MUON
        return muon(
            schedule,
            momentum=float(m.MOMENTUM),
            nesterov=bool(m.NESTEROV),
            ns_steps=int(m.NS_STEPS),
            weight_decay=wd,
            apply_scaling=bool(m.APPLY_SCALING),
            strict=bool(m.STRICT),
        )
    if name == "ademamix":
        betas = tuple(opt.BETAS)
        t_ab3 = opt.get("T_ALPHA_BETA3")
        return ademamix(
            schedule,
            b1=float(betas[0]),
            b2=float(betas[1]),
            b3=float(betas[2]) if len(betas) > 2 else 0.9999,
            alpha=float(opt.ALPHA),
            t_alpha_beta3=int(t_ab3) if t_ab3 else None,
            eps=float(opt.EPS),
            weight_decay=wd,
        )
    raise ValueError(f"Unknown OPTIMIZER.NAME '{name}'")


def _scaled_schedule(schedule, multiplier: float):
    if multiplier == 1.0:
        return schedule
    if callable(schedule):
        return lambda step: schedule(step) * multiplier
    return schedule * multiplier


def lr_multipliers(config) -> dict[str, float]:
    """Group-name -> LR multiplier map; {'default': 1.0} for single-group."""
    pg = config.OPTIMIZER.get("PARAMETER_GROUPS", {})
    if not pg or not pg.get("ENABLED", False):
        return {"default": 1.0}
    out = {"default": float(pg.get("DEFAULT", {}).get("LR_MULTIPLIER", 1.0))}
    for gname, gcfg in pg.items():
        if gname in ("ENABLED", "DEFAULT") or not isinstance(gcfg, dict):
            continue
        if not gcfg.get("FILTER"):
            continue
        out[gname] = float(gcfg.get("LR_MULTIPLIER", 1.0))
    return out


def lr_dict_for_logging(
    config, schedule, step: int, group_schedules: dict | None = None
) -> dict[str, float]:
    """Per-group learning rates for wandb/console export.

    Reference parity: MultiLRScheduler.get_lr_dict_for_wandb
    (lr_schedulers/multi_lr_scheduler.py:177). Each group's LR is its own
    schedule (``group_schedules``, LR_SCHEDULER.PARAMETER_GROUPS) — falling
    back to the base schedule — times its LR_MULTIPLIER."""
    group_schedules = group_schedules or {}

    def at(s):
        return float(s(step)) if callable(s) else float(s)

    return {
        f"lr/{g}": at(group_schedules.get(g, schedule)) * m
        for g, m in lr_multipliers(config).items()
    }


def build_optimizer(
    config,
    schedule: optax.ScalarOrSchedule,
    params=None,
    group_schedules: dict | None = None,
) -> optax.GradientTransformation:
    """Build the optimizer; multi-group configs need ``params`` for labeling.

    Multi-group config surface (OPTIMIZER.PARAMETER_GROUPS):
        ENABLED: true
        DEFAULT: {OPTIMIZER, WEIGHT_DECAY, LR_MULTIPLIER}
        <GROUP_NAME>: {OPTIMIZER, WEIGHT_DECAY, LR_MULTIPLIER, FILTER: {...}}

    ``group_schedules`` (from ``build_group_schedules``) gives groups fully
    independent schedules (reference: lr_schedulers/build.py:291); a group
    without an entry uses the base ``schedule`` scaled by its LR_MULTIPLIER.
    """
    group_schedules = group_schedules or {}
    pg = config.OPTIMIZER.get("PARAMETER_GROUPS", {})
    if not pg or not pg.get("ENABLED", False):
        return _make_single(config.OPTIMIZER.NAME, schedule, config)

    if params is None:
        raise ValueError("Multi-group optimizer requires params for labeling")

    groups: dict[str, Any] = {}
    predicates: dict[str, Callable] = {}
    for gname, gcfg in pg.items():
        if gname in ("ENABLED", "DEFAULT") or not isinstance(gcfg, dict):
            continue
        fcfg = gcfg.get("FILTER")
        if not fcfg:
            logger.warning(f"Parameter group '{gname}' has no FILTER; skipping")
            continue
        predicates[gname] = build_filter_from_config(fcfg)
        groups[gname] = gcfg

    default_cfg = pg.get("DEFAULT", {})
    transforms = {
        "default": _make_single(
            str(default_cfg.get("OPTIMIZER", config.OPTIMIZER.NAME)),
            _scaled_schedule(
                group_schedules.get("default", schedule),
                float(default_cfg.get("LR_MULTIPLIER", 1.0)),
            ),
            config,
            weight_decay=default_cfg.get("WEIGHT_DECAY"),
        )
    }
    for gname, gcfg in groups.items():
        transforms[gname] = _make_single(
            str(gcfg.get("OPTIMIZER", config.OPTIMIZER.NAME)),
            _scaled_schedule(
                group_schedules.get(gname, schedule),
                float(gcfg.get("LR_MULTIPLIER", 1.0)),
            ),
            config,
            weight_decay=gcfg.get("WEIGHT_DECAY"),
        )

    labels = param_labels(params, predicates, default="default")
    from linnaeus_tpu.utils.debug import check_debug_flag

    if check_debug_flag(config, "DEBUG.OPTIMIZER"):
        flat = jax.tree_util.tree_leaves_with_path(labels)
        for path, label in flat:
            logger.debug(
                "[OPTIMIZER] "
                + "/".join(getattr(k, "key", str(k)) for k in path)
                + f" -> group '{label}'"
            )
    logger.info(
        f"Multi-group optimizer with groups: {sorted(transforms)} "
        f"(optax.multi_transform)"
    )
    # inspection report (reference: unified_filtering.py:150-250)
    from linnaeus_tpu.utils.param_filters import filtering_report

    logger.info(filtering_report(params, predicates))
    return optax.multi_transform(transforms, labels)
