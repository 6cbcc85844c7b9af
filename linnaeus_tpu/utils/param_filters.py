"""Composable parameter filters over Flax param pytrees.

Reference parity: utils/param_filters.py:23-302 (Name / Dimension / And / Or
/ Not filters) and utils/unified_filtering.py:25-250 (config-driven builder).
A filter is a predicate over ``(path_str, leaf)`` where ``path_str`` joins
the pytree path with '/'. ``build_filter_from_config`` consumes the same
EXCLUDE_CONFIG / PARAMETER_GROUPS filter dicts as the reference YAMLs.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Predicate = Callable[[str, Any], bool]


def name_filter(patterns: list[str]) -> Predicate:
    """True if any pattern is a substring of the param path."""

    def pred(path: str, leaf) -> bool:
        return any(p in path for p in patterns)

    return pred


def dimension_filter(min_ndim: int | None = None, max_ndim: int | None = None) -> Predicate:
    def pred(path: str, leaf) -> bool:
        nd = getattr(leaf, "ndim", 0)
        if min_ndim is not None and nd < min_ndim:
            return False
        if max_ndim is not None and nd > max_ndim:
            return False
        return True

    return pred


def and_filter(*preds: Predicate) -> Predicate:
    return lambda path, leaf: all(p(path, leaf) for p in preds)


def or_filter(*preds: Predicate) -> Predicate:
    return lambda path, leaf: any(p(path, leaf) for p in preds)


def not_filter(pred: Predicate) -> Predicate:
    return lambda path, leaf: not pred(path, leaf)


def build_filter_from_config(filter_cfg: dict) -> Predicate:
    """Build a predicate from the reference's filter-config dicts.

    Supported TYPEs: name (PATTERNS), dimension (MIN_NDIM/MAX_NDIM),
    and/or/not (FILTERS).
    """
    ftype = str(filter_cfg.get("TYPE", "name")).lower()
    if ftype == "name":
        return name_filter(list(filter_cfg.get("PATTERNS", [])))
    if ftype == "dimension":
        return dimension_filter(
            filter_cfg.get("MIN_NDIM"), filter_cfg.get("MAX_NDIM")
        )
    if ftype in ("and", "or"):
        subs = [build_filter_from_config(f) for f in filter_cfg.get("FILTERS", [])]
        return and_filter(*subs) if ftype == "and" else or_filter(*subs)
    if ftype == "not":
        subs = filter_cfg.get("FILTERS", [])
        if len(subs) != 1:
            raise ValueError("'not' filter requires exactly one sub-filter")
        return not_filter(build_filter_from_config(subs[0]))
    raise ValueError(f"Unknown filter TYPE '{filter_cfg.get('TYPE')}'")


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_labels(params, groups: dict[str, Predicate], default: str = "default"):
    """Label each leaf with the first matching group name (for
    optax.multi_transform). Group order matters."""

    def label(path, leaf):
        p = _path_str(path)
        for gname, pred in groups.items():
            if pred(p, leaf):
                return gname
        return default

    return jax.tree_util.tree_map_with_path(label, params)


def param_mask(params, pred: Predicate):
    """0/1 float mask pytree for leaves matching the predicate."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jnp.float32(1.0) if pred(_path_str(path), leaf) else jnp.float32(0.0),
        params,
    )


def resolve_gradnorm_exclude(gw_cfg) -> dict:
    """GradNorm exclusion filter: the structured EXCLUDE_CONFIG when it has
    filters, else the legacy EXCLUDE_PATTERNS name list wrapped into the
    same shape (reference: utils/unified_filtering.py:167-184)."""
    exclude_cfg = gw_cfg.EXCLUDE_CONFIG
    if exclude_cfg.get("FILTERS"):
        return exclude_cfg
    return {
        "TYPE": "or",
        "FILTERS": [{
            "TYPE": "name",
            "PATTERNS": list(gw_cfg.get("EXCLUDE_PATTERNS") or []),
        }],
    }


def trunk_mask_from_exclude(params, exclude_cfg: dict):
    """GradNorm trunk mask: 1 for trunk params, 0 for excluded (heads/meta).

    ``exclude_cfg`` is LOSS.GRAD_WEIGHTING.TASK.EXCLUDE_CONFIG.
    """
    excluded = build_filter_from_config(exclude_cfg)
    return param_mask(params, not_filter(excluded))


def list_matching(params, pred: Predicate) -> list[str]:
    """Paths of leaves matching the predicate (for inspection reports)."""
    out = []

    def visit(path, leaf):
        p = _path_str(path)
        if pred(p, leaf):
            out.append(p)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return sorted(out)


def filtering_report(
    params,
    groups: dict[str, Predicate],
    default: str = "default",
    max_examples: int = 8,
) -> str:
    """Human-readable group-assignment report.

    Reference parity: utils/unified_filtering.py:150-250 — the GradNorm /
    multi-optimizer inspection reports that show, per group, how many params
    matched, their total size, and example paths. First-match-wins ordering
    is identical to :func:`param_labels`, so the report shows exactly what
    optax.multi_transform will do.
    """
    labels = param_labels(params, groups, default=default)
    buckets: dict[str, list[tuple[str, int]]] = {}

    def visit(path, leaf, label):
        buckets.setdefault(label, []).append(
            (_path_str(path), int(getattr(leaf, "size", 0)))
        )
        return leaf

    jax.tree_util.tree_map_with_path(visit, params, labels)
    total = sum(sz for items in buckets.values() for _, sz in items)
    lines = [f"Parameter filtering report ({total:,} params total):"]
    for gname in list(groups) + [default]:
        items = sorted(buckets.get(gname, []))
        gsize = sum(sz for _, sz in items)
        pct = 100.0 * gsize / total if total else 0.0
        lines.append(
            f"  [{gname}] {len(items)} tensors, {gsize:,} params ({pct:.1f}%)"
        )
        for p, sz in items[:max_examples]:
            lines.append(f"      {p}  ({sz:,})")
        if len(items) > max_examples:
            lines.append(f"      ... and {len(items) - max_examples} more")
    return "\n".join(lines)
