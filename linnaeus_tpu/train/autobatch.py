"""AutoBatch — find the largest batch size that fits device memory.

Reference parity: utils/autobatch.py:111-610 (rank-0 binary search under
TARGET_MEMORY_FRACTION with real fwd/bwd trials, result broadcast, loaders
rebuilt). TPU adaptation: OOM probing is COMPILE-time, not run-time — we AOT-
compile the train step for a candidate batch and read
``compiled.memory_analysis()`` (argument + output + temp + generated code
bytes) against the device's HBM budget, so the search runs in seconds
without ever executing a step and cannot crash the process the way CUDA OOM
probing can. Multi-host agreement is by construction: every host computes
the same deterministic answer (replacing the reference's broadcast,
main.py:1267-1272).
"""

from __future__ import annotations

from typing import Callable

import jax

from linnaeus_tpu.utils.logging import get_main_logger

logger = get_main_logger()

# v5e = 16 GiB HBM/chip; overridable for other generations/tests
DEFAULT_HBM_BYTES = 16 * 1024**3


def device_hbm_bytes() -> int:
    dev = jax.devices()[0]
    stats = None
    try:
        stats = dev.memory_stats()
    except Exception:
        pass
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return DEFAULT_HBM_BYTES


def estimate_step_memory(
    compile_step: Callable[[int], "jax.stages.Compiled"],
    batch_size: int,
) -> int:
    """Total bytes the compiled step needs (temps + args + outputs)."""
    compiled = compile_step(batch_size)
    mem = compiled.memory_analysis()
    if mem is None:
        raise RuntimeError("memory_analysis() unavailable on this backend")
    total = (
        int(getattr(mem, "temp_size_in_bytes", 0))
        + int(getattr(mem, "argument_size_in_bytes", 0))
        + int(getattr(mem, "output_size_in_bytes", 0))
        + int(getattr(mem, "generated_code_size_in_bytes", 0))
        - int(getattr(mem, "alias_size_in_bytes", 0))
    )
    return total


def auto_find_batch_size(
    compile_step: Callable[[int], "jax.stages.Compiled"],
    target_memory_fraction: float = 0.8,
    min_batch_size: int = 1,
    max_batch_size: int = 512,
    hbm_bytes: int | None = None,
    multiple_of: int = 1,
) -> int:
    """Binary search the largest batch whose compiled memory fits the budget.

    ``compile_step(batch_size)`` must AOT-compile the full train step for
    that batch size (e.g. ``jax.jit(step).lower(state, batch, scalars)
    .compile()``). ``multiple_of`` keeps the result divisible by the data-
    axis size so per-device shards stay equal.
    """
    budget = int((hbm_bytes or device_hbm_bytes()) * target_memory_fraction)
    logger.info(
        f"AutoBatch: budget {budget / 1e9:.2f} GB "
        f"(fraction {target_memory_fraction} of {(hbm_bytes or device_hbm_bytes()) / 1e9:.1f} GB)"
    )

    def fits(bs: int) -> bool:
        try:
            need = estimate_step_memory(compile_step, bs)
        except Exception as e:  # compile failure == doesn't fit
            logger.warning(f"AutoBatch: compile failed at batch {bs}: {e}")
            return False
        ok = need <= budget
        logger.info(
            f"AutoBatch trial bs={bs}: {need / 1e9:.2f} GB -> "
            f"{'fits' if ok else 'exceeds budget'}"
        )
        return ok

    def align(bs: int) -> int:
        return max((bs // multiple_of) * multiple_of, multiple_of)

    lo, hi = align(min_batch_size), align(max_batch_size)
    if not fits(lo):
        logger.warning(f"AutoBatch: even min batch {lo} exceeds budget; using it")
        return lo
    if fits(hi):
        return hi
    # invariant: fits(lo), not fits(hi)
    while hi - lo > multiple_of:
        mid = align((lo + hi) // 2)
        if mid in (lo, hi):
            break
        if fits(mid):
            lo = mid
        else:
            hi = mid
    logger.info(f"AutoBatch result: {lo}")
    return lo


def make_compile_step_fn(
    train_step: Callable,
    state,
    make_batch: Callable[[int], dict],
    scalars,
):
    """Helper producing the ``compile_step`` argument from a train step."""

    def compile_step(bs: int):
        batch = make_batch(bs)
        return jax.jit(train_step).lower(state, batch, scalars).compile()

    return compile_step
