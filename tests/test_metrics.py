"""MetricsTracker / StepMetricsLogger / chain accuracy tests."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from linnaeus_tpu.configuration import get_default_config
from linnaeus_tpu.metrics import (
    AverageMeter,
    MetricsTracker,
    StepMetricsLogger,
    chain_accuracy_counts,
)
from linnaeus_tpu.ops_schedule import OpsSchedule, TrainingProgress


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.avg == pytest.approx(2.0)
    assert m.val == 4.0


def test_tracker_phases_and_best():
    tr = MetricsTracker(["t1"], primary_metric="loss")
    tr.update("val", {"loss": 1.0})
    assert tr.check_best("val", epoch=0)
    tr.reset_phase("val")
    tr.update("val", {"loss": 0.5})
    assert tr.check_best("val", epoch=1)
    tr.reset_phase("val")
    tr.update("val", {"loss": 0.9})
    assert not tr.check_best("val", epoch=2)
    assert tr.best["val"]["epoch"] == 1


def test_tracker_partial_mask_phase_naming():
    assert MetricsTracker.partial_mask_phase(["temporal", "SPATIAL"]) == (
        "val_mask_TEMPORAL_SPATIAL"
    )


def test_tracker_state_roundtrip():
    tr = MetricsTracker(["t1"])
    tr.update("train", {"loss": 2.0}, n=3)
    tr.log_lr(10, 1e-4)
    tr.log_schedule_value("mix_prob", 10, 0.5)
    tr.log_gradnorm(10, {"gradnorm/avg_norm": 1.5})
    state = tr.state_dict()
    tr2 = MetricsTracker(["t1"])
    tr2.load_state_dict(state)
    assert tr2.get("train", "loss") == pytest.approx(2.0)
    assert tr2.lr_history == [(10, 1e-4)]
    assert tr2.gradnorm_history[0]["gradnorm/avg_norm"] == 1.5


def test_chain_accuracy_ignores_nulls():
    outputs = {
        "t1": jnp.asarray([[0.1, 0.9, 0.0], [0.9, 0.1, 0.0], [0.1, 0.0, 0.9]]),
        "t2": jnp.asarray([[0.1, 0.9], [0.1, 0.9], [0.9, 0.1]]),
    }
    targets = {
        # sample 0: correct at both; sample 1: null at t1, correct t2;
        # sample 2: wrong at t2
        "t1": jnp.asarray([1, 0, 2]),
        "t2": jnp.asarray([1, 1, 1]),
    }
    correct, total = chain_accuracy_counts(
        outputs, targets, ("t1", "t2"), ignore_null=True
    )
    assert int(total) == 3
    assert int(correct) == 2


def test_step_logger_jsonl_mirror(tmp_path):
    cfg = get_default_config()
    tp = TrainingProgress(expected_total_steps=100)
    sched = OpsSchedule(cfg, tp)
    tracker = MetricsTracker(["t1"])
    path = str(tmp_path / "metrics.jsonl")
    logger = StepMetricsLogger(cfg, sched, tracker, wandb_run=None, jsonl_path=path)
    logger.start_epoch(10)
    # console cadence is 100 -> step 100 logs
    logger.log_step_metrics(100, epoch=0, metrics={"loss": 1.25}, lr=1e-4)
    logger.log_validation(100, "val", {"loss": 0.9, "acc1/t1": 0.5})
    lines = [json.loads(line) for line in open(path)]
    assert any("train/loss" in rec for rec in lines)
    assert any("val/acc1/t1" in rec for rec in lines)
    assert tracker.get("train", "loss") == pytest.approx(1.25)


def test_initialize_wandb_resume_policy(monkeypatch):
    """An explicit EXPERIMENT.WANDB.RESUME policy (e.g. 'must') wins over the
    'allow' fallback a detected run id would pick (reference
    utils/logging/wandb.py:132-137); ALLOW_WANDB_VAL_CHANGE passes through."""
    import sys
    import types

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.metrics.step_logger import initialize_wandb

    captured = {}
    fake = types.ModuleType("wandb")

    def fake_init(**kw):
        captured.update(kw)
        return object()

    fake.init = fake_init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    cfg = get_default_config()
    cfg.EXPERIMENT.WANDB.ENABLED = True

    # run id alone -> 'allow' fallback
    initialize_wandb(cfg, resume_run_id="abc")
    assert captured["resume"] == "allow" and captured["id"] == "abc"
    assert captured["allow_val_change"] is True  # default True, like the reference

    # explicit policy wins even with a run id
    cfg.EXPERIMENT.WANDB.RESUME = "must"
    cfg.TRAIN.ALLOW_WANDB_VAL_CHANGE = False
    initialize_wandb(cfg, resume_run_id="abc")
    assert captured["resume"] == "must"
    assert captured["allow_val_change"] is False

    # neither -> no resume
    cfg.EXPERIMENT.WANDB.RESUME = None
    initialize_wandb(cfg)
    assert captured["resume"] is None and captured["id"] is None
