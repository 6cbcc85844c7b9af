"""Model complexity estimation: params / FLOPs / activation memory.

Reference parity: tools/estimate_model_complexity.py (461 LoC) — produces
the per-arch table recorded in docs/models/model_complexity_estimates.json.
FLOPs come from XLA's own cost analysis of the compiled forward
(``compiled.cost_analysis()['flops']``) — measured, not hand-derived — and
activation memory from ``memory_analysis().temp_size_in_bytes``.
"""

from __future__ import annotations

import json
from typing import Any

from linnaeus_tpu.utils.logging import get_main_logger

logger = get_main_logger()


def count_params(params) -> int:
    import jax

    return int(sum(p.size for p in jax.tree.leaves(params)))


def estimate_model_complexity(
    model,
    img_size: int | tuple[int, int] = 384,
    meta_dim: int = 5,
    batch_size: int = 1,
) -> dict[str, Any]:
    import jax
    import jax.numpy as jnp

    hw = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
    images = jnp.zeros((batch_size, hw[0], hw[1], 3))
    aux = jnp.zeros((batch_size, meta_dim)) if meta_dim else None
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), images, aux)
    n_params = count_params(variables["params"])

    # real init for compile-based cost analysis
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, aux)

    def forward(variables, images, aux):
        return model.apply(variables, images, aux, deterministic=True)

    compiled = jax.jit(forward).lower(variables, images, aux).compile()
    flops = None
    cost = compiled.cost_analysis()
    if cost:
        entry = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = entry.get("flops")
    mem = compiled.memory_analysis()
    activation_bytes = int(getattr(mem, "temp_size_in_bytes", 0)) if mem else None

    result = {
        "params": n_params,
        "flops_per_sample": float(flops) / batch_size if flops else None,
        "gflops_per_sample": float(flops) / batch_size / 1e9 if flops else None,
        "activation_memory_mb": activation_bytes / 1e6 if activation_bytes else None,
        "img_size": hw[0],
    }
    logger.info(
        f"complexity: {n_params:,} params, "
        f"{result['gflops_per_sample'] or float('nan'):.2f} GFLOPs @ {hw[0]}px"
    )
    return result


def estimate_all_archs(
    arch_names: list[str] | None = None,
    img_size: int = 384,
    num_classes: dict | None = None,
    output_path: str | None = None,
) -> dict[str, dict]:
    """Sweep the registered arch presets (both families by default)."""
    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.configuration.archs import (
        MFORMER_V0_ARCHS,
        MFORMER_V1_ARCHS,
        apply_arch,
    )
    from linnaeus_tpu.models.build import build_model

    arch_names = arch_names or (
        list(MFORMER_V1_ARCHS) + list(MFORMER_V0_ARCHS)
    )
    num_classes = num_classes or {
        "taxa_L10": 1000, "taxa_L20": 400, "taxa_L30": 100, "taxa_L40": 30
    }
    results = {}
    for name in arch_names:
        cfg = get_default_config()
        cfg.MODEL.IMG_SIZE = img_size
        cfg.DATA.TASK_KEYS_H5 = list(num_classes.keys())
        cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = False
        cfg.TRAIN.MIXED_PRECISION.ENABLED = False
        apply_arch(cfg, name)
        model = build_model(cfg, num_classes=num_classes)
        results[name] = estimate_model_complexity(model, img_size)
    if output_path:
        with open(output_path, "w") as f:
            json.dump(results, f, indent=2)
    return results


def validate_complexity_estimates(
    estimates_path: str,
    arch_names: list[str] | None = None,
    img_size: int = 384,
    flops_rtol: float = 0.05,
) -> dict[str, dict]:
    """Recompute complexity and diff against a stored estimates JSON.

    Reference parity: tools/validate_complexity_estimates.py — guards the
    published docs/models/model_complexity_estimates.json against silent
    arch drift. Params must match exactly; FLOPs within ``flops_rtol``
    (cost-analysis jitter across XLA versions)."""
    with open(estimates_path) as f:
        stored = json.load(f)
    names = arch_names or list(stored)
    fresh = estimate_all_archs(names, img_size=img_size)
    report: dict[str, dict] = {}
    for name in names:
        st, fr = stored.get(name), fresh.get(name)
        ok = bool(st and fr and st["params"] == fr["params"])
        if ok and st.get("flops_per_sample") and fr.get("flops_per_sample"):
            ok = abs(st["flops_per_sample"] - fr["flops_per_sample"]) <= (
                flops_rtol * st["flops_per_sample"]
            )
        report[name] = {"ok": ok, "stored": st, "fresh": fr}
        logger.info(f"validate {name}: {'OK' if ok else 'MISMATCH'}")
    return report
