"""schedule_utils tests: fraction resolution, conflict validation, summary."""

import pytest

from linnaeus_tpu.configuration import get_default_config
from linnaeus_tpu.utils.schedule_utils import (
    apply_lr_scaling,
    resolve_all_schedule_params,
    schedule_summary,
    validate_schedule_config,
)


def test_fractions_resolve_to_steps():
    cfg = get_default_config()
    cfg.SCHEDULE.META_MASKING.END_STEPS = 0
    cfg.SCHEDULE.META_MASKING.END_FRACTION = 0.25
    cfg.SCHEDULE.NULL_MASKING.END_STEPS = 0
    cfg.SCHEDULE.NULL_MASKING.END_FRACTION = 0.5
    cfg.LR_SCHEDULER.WARMUP_STEPS = 0
    cfg.LR_SCHEDULER.WARMUP_FRACTION = 0.1
    resolve_all_schedule_params(cfg, total_steps=1000)
    assert cfg.SCHEDULE.META_MASKING.END_STEPS == 250
    assert cfg.SCHEDULE.META_MASKING.END_FRACTION is None
    assert cfg.SCHEDULE.NULL_MASKING.END_STEPS == 500
    assert cfg.LR_SCHEDULER.WARMUP_STEPS == 100
    assert cfg.LR_SCHEDULER.TOTAL_STEPS == 1000


def test_conflict_detection():
    cfg = get_default_config()
    cfg.SCHEDULE.MIX.PROB.END_STEPS = 100
    cfg.SCHEDULE.MIX.PROB.END_FRACTION = 0.5
    problems = validate_schedule_config(cfg)
    assert any("MIX.PROB" in p for p in problems)


def test_no_conflicts_on_defaults():
    cfg = get_default_config()
    assert validate_schedule_config(cfg) == []


def test_lr_scaling_writes_base_lr():
    cfg = get_default_config()
    scaled = apply_lr_scaling(cfg, effective_batch_size=1024)
    assert scaled == pytest.approx(1e-4 * 2)
    assert cfg.LR_SCHEDULER.BASE_LR == pytest.approx(scaled)


def test_summary_renders():
    cfg = get_default_config()
    resolve_all_schedule_params(cfg, 1000)
    text = schedule_summary(cfg, 1000, 100)
    assert "total steps: 1000" in text
    assert "gradnorm" in text


def test_generate_schedule_plot(tmp_path):
    from linnaeus_tpu.utils.schedule_utils import generate_schedule_plot

    cfg = get_default_config()
    resolve_all_schedule_params(cfg, 1000)
    out = generate_schedule_plot(cfg, 1000, str(tmp_path / "sched.png"))
    assert out is not None
    import os

    assert os.path.getsize(out) > 1000
