"""AutoBatch tests: binary search over mocked memory analysis (mirrors the
reference's mocked-CUDA-stats approach, tests/test_autobatch.py:94-227) plus
a real compiled-memory probe on CPU."""

import types

import jax
import jax.numpy as jnp
import pytest

from linnaeus_tpu.train.autobatch import (
    auto_find_batch_size,
    estimate_step_memory,
    make_compile_step_fn,
)


def fake_compile_step(bytes_per_sample, fixed=0):
    def compile_step(bs):
        mem = types.SimpleNamespace(
            temp_size_in_bytes=bytes_per_sample * bs,
            argument_size_in_bytes=fixed,
            output_size_in_bytes=0,
            generated_code_size_in_bytes=0,
            alias_size_in_bytes=0,
        )
        return types.SimpleNamespace(memory_analysis=lambda: mem)

    return compile_step


def test_binary_search_finds_boundary():
    # budget = 0.8 * 1000 = 800; 10 B/sample => fits up to 80
    bs = auto_find_batch_size(
        fake_compile_step(10),
        target_memory_fraction=0.8,
        min_batch_size=1,
        max_batch_size=512,
        hbm_bytes=1000,
    )
    assert 72 <= bs <= 80


def test_multiple_of_alignment():
    bs = auto_find_batch_size(
        fake_compile_step(10),
        target_memory_fraction=0.8,
        min_batch_size=8,
        max_batch_size=512,
        hbm_bytes=1000,
        multiple_of=8,
    )
    assert bs % 8 == 0
    assert bs <= 80


def test_max_fits_returns_max():
    bs = auto_find_batch_size(
        fake_compile_step(1),
        target_memory_fraction=0.8,
        min_batch_size=1,
        max_batch_size=64,
        hbm_bytes=10**9,
    )
    assert bs == 64


def test_min_exceeding_budget_returns_min():
    bs = auto_find_batch_size(
        fake_compile_step(10**9),
        target_memory_fraction=0.5,
        min_batch_size=4,
        max_batch_size=64,
        hbm_bytes=1000,
    )
    assert bs == 4


def test_compile_failure_treated_as_oom():
    def compile_step(bs):
        if bs > 16:
            raise RuntimeError("RESOURCE_EXHAUSTED")
        return fake_compile_step(1)(bs)

    bs = auto_find_batch_size(
        compile_step, 0.8, 1, 256, hbm_bytes=10**9
    )
    assert bs <= 16


def test_real_memory_analysis_on_cpu():
    def step(x):
        return (x @ x.T).sum()

    def compile_step(bs):
        x = jnp.zeros((bs, 64), jnp.float32)
        return jax.jit(step).lower(x).compile()

    m1 = estimate_step_memory(compile_step, 8)
    m2 = estimate_step_memory(compile_step, 64)
    assert m2 > m1 > 0
