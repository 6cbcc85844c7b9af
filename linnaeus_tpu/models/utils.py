"""Init & conversion utilities (reference parity: models/utils/*.py)."""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np

from linnaeus_tpu.models.blocks.common import trunc_normal_init  # noqa: F401


def to_2tuple(x) -> tuple:
    """int -> (x, x); iterables pass through as tuples (conversion.py:9)."""
    if isinstance(x, Iterable) and not isinstance(x, str):
        return tuple(x)
    return (x, x)


def trunc_normal_(shape, std: float = 0.02, seed: int = 0) -> np.ndarray:
    """Numpy truncated-normal sample (initialization.py:11). For Flax modules
    use ``trunc_normal_init`` with the param RNG instead; this exists for
    host-side construction (e.g. tests)."""
    rng = np.random.default_rng(seed)
    out = rng.normal(0.0, std, size=shape)
    return np.clip(out, -2 * std, 2 * std).astype(np.float32)


def resolve_remat_policy(name: str | None):
    """Map a TRAIN.GRADIENT_CHECKPOINTING.POLICY string to a
    jax.checkpoint policy. 'full'/None -> None (nn.remat's default:
    save nothing, recompute the whole block); 'dots' -> save every
    dot/matmul output (recompute only elementwise/LN work in the
    backward); 'dots_no_batch' -> save only weight-shaped dot outputs.
    The policy changes memory/recompute trade only — gradients are
    bit-identical (tested in test_models.py)."""
    import jax

    if name in (None, "", "full", "nothing"):
        return None
    table = {
        "dots": jax.checkpoint_policies.checkpoint_dots,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    if name not in table:
        raise ValueError(
            f"unknown remat policy {name!r}; expected one of "
            f"'full', 'dots', 'dots_no_batch'"
        )
    return table[name]
