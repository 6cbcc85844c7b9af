"""OpsSchedule / TrainingProgress tests."""

import pytest

from linnaeus_tpu.configuration import get_default_config
from linnaeus_tpu.ops_schedule import (
    EarlyStopState,
    OpsSchedule,
    TrainingProgress,
    TrainingStage,
)


def make_schedule(**overrides):
    cfg = get_default_config()
    tp = TrainingProgress(expected_total_steps=overrides.pop("total_steps", 1000))
    for dotted, value in overrides.items():
        node = cfg
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    return OpsSchedule(cfg, tp), tp, cfg


def test_meta_mask_prob_ramp():
    sched, tp, _ = make_schedule(**{"SCHEDULE.META_MASKING.END_STEPS": 100})
    assert sched.get_meta_mask_prob(0) == pytest.approx(1.0)
    assert sched.get_meta_mask_prob(50) == pytest.approx(0.5)
    assert sched.get_meta_mask_prob(100) == pytest.approx(0.0)
    assert sched.get_meta_mask_prob(500) == pytest.approx(0.0)


def test_meta_mask_prob_fraction_resolution():
    sched, _, _ = make_schedule(
        total_steps=200,
        **{
            "SCHEDULE.META_MASKING.END_STEPS": 0,
            "SCHEDULE.META_MASKING.END_FRACTION": 0.5,
        },
    )
    # end at 100 steps
    assert sched.get_meta_mask_prob(50) == pytest.approx(0.5)


def test_null_mask_disabled_means_include_all():
    sched, _, _ = make_schedule()
    assert sched.get_null_mask_prob(0) == 1.0


def test_null_mask_ramp():
    sched, _, _ = make_schedule(
        **{
            "SCHEDULE.NULL_MASKING.ENABLED": True,
            "SCHEDULE.NULL_MASKING.END_STEPS": 100,
        }
    )
    assert sched.get_null_mask_prob(0) == pytest.approx(0.0)
    assert sched.get_null_mask_prob(100) == pytest.approx(1.0)


def test_mixup_group_level_switching():
    sched, _, _ = make_schedule(
        **{"SCHEDULE.MIX.LEVEL_SWITCH_STEPS": [100, 200]}
    )
    assert sched.get_mixup_group_level(0) == "taxa_L40"
    assert sched.get_mixup_group_level(150) == "taxa_L30"
    assert sched.get_mixup_group_level(250) == "taxa_L20"


def test_gradnorm_cadence():
    sched, _, _ = make_schedule(
        **{
            "LOSS.GRAD_WEIGHTING.TASK.UPDATE_INTERVAL": 50,
            "LOSS.GRAD_WEIGHTING.TASK.GRADNORM_WARMUP_STEPS": 100,
        }
    )
    assert not sched.should_update_gradnorm(50)  # within warmup
    assert sched.should_update_gradnorm(100)
    assert sched.should_update_gradnorm(150)
    assert not sched.should_update_gradnorm(151)


def test_validation_epoch_trigger():
    sched, tp, _ = make_schedule(**{"SCHEDULE.VALIDATION.INTERVAL_EPOCHS": 2})
    tp.current_epoch = 0
    assert not sched.should_validate()
    tp.current_epoch = 1
    assert sched.should_validate()


def test_validation_step_trigger():
    sched, tp, _ = make_schedule(**{"SCHEDULE.VALIDATION.INTERVAL_STEPS": 10})
    tp.global_step = 10
    assert sched.should_validate(at_epoch_boundary=False)
    tp.global_step = 11
    assert not sched.should_validate(at_epoch_boundary=False)


def test_checkpoint_fraction_trigger():
    sched, tp, _ = make_schedule(
        total_steps=100,
        **{
            "SCHEDULE.CHECKPOINT.INTERVAL_EPOCHS": 0,
            "SCHEDULE.CHECKPOINT.INTERVAL_FRACTION": 0.25,
        },
    )
    tp.global_step = 25
    assert sched.should_save_checkpoint(at_epoch_boundary=False)
    tp.global_step = 26
    assert not sched.should_save_checkpoint(at_epoch_boundary=False)


def test_partial_mask_combo_pick():
    sched, _, _ = make_schedule(
        **{
            "SCHEDULE.META_MASKING.PARTIAL.ENABLED": True,
            "SCHEDULE.META_MASKING.PARTIAL.WHITELIST": [["TEMPORAL"], ["SPATIAL"]],
        }
    )
    combos = {tuple(sched.pick_partial_mask_combo()) for _ in range(50)}
    assert combos <= {("TEMPORAL",), ("SPATIAL",)}
    assert len(combos) == 2  # both eventually picked


def test_early_stop_patience():
    sched, tp, cfg = make_schedule(
        **{
            "TRAIN.EARLY_STOP.ACTIVE": True,
            "TRAIN.EARLY_STOP.PATIENCE_STEPS": 100,
        }
    )
    es = EarlyStopState()
    es.update(1.0, step=0)
    es.update(1.2, step=150)  # no improvement for 150 steps
    tp.global_step = 150
    assert sched.should_stop_early(early_stop_state=es)


def test_early_stop_accuracy_metric_direction():
    """Higher-is-better metrics: improvement resets patience; MAX_LOSS is
    gated off for non-loss metrics (reference: ops_schedule.py:164-170,
    242-249)."""
    sched, tp, _ = make_schedule(
        **{
            "TRAIN.EARLY_STOP.ACTIVE": True,
            "TRAIN.EARLY_STOP.PATIENCE_STEPS": 100,
            "TRAIN.EARLY_STOP.MAX_LOSS": 0.5,
        }
    )
    es = EarlyStopState(metric_name="val_chain_accuracy", higher_is_better=True)
    assert es.update(0.30, step=0)
    assert not es.update(0.25, step=50)  # worse -> no improvement
    tp.global_step = 50
    # accuracy metrics must not trip the MAX_LOSS guard even when
    # best_value numerically exceeds MAX_LOSS
    es_acc = EarlyStopState(metric_name="val_acc", higher_is_better=True)
    es_acc.update(0.9, step=0)  # 0.9 > MAX_LOSS=0.5, but it's an accuracy
    assert not sched.should_stop_early(early_stop_state=es_acc)
    assert es.update(0.40, step=120)  # improvement resets the clock
    assert es.steps_since_improvement == 0
    tp.global_step = 250
    es.update(0.35, step=250)  # 130 steps without improvement
    assert sched.should_stop_early(early_stop_state=es)


def test_early_stop_state_roundtrip():
    es = EarlyStopState(metric_name="val_acc1/taxa_L10", higher_is_better=True)
    es.update(0.5, step=10)
    es.update(0.4, step=30)
    clone = EarlyStopState()
    clone.load_state_dict(es.state_dict())
    assert clone.metric_name == "val_acc1/taxa_L10"
    assert clone.higher_is_better is True
    assert clone.best_value == pytest.approx(0.5)
    assert clone.best_step == 10
    assert clone.steps_since_improvement == 20


def test_training_progress_roundtrip():
    tp = TrainingProgress(global_step=42, current_epoch=3, expected_total_steps=100)
    tp.queue_validation(TrainingStage.VALIDATION_NORMAL)
    tp.queue_validation(
        TrainingStage.VALIDATION_PARTIAL_MASK_META, partial_combo=["TEMPORAL"]
    )
    state = tp.state_dict()
    tp2 = TrainingProgress()
    tp2.load_state_dict(state)
    assert tp2.global_step == 42
    assert tp2.current_epoch == 3
    assert tp2.has_pending_validations()
    first = tp2.pop_validation()
    assert first["stage"] == "VALIDATION_NORMAL"
    second = tp2.pop_validation()
    assert second["partial_combo"] == ["TEMPORAL"]
    assert not tp2.has_pending_validations()


def test_ops_schedule_rng_state_roundtrip():
    sched, _, _ = make_schedule(
        **{
            "SCHEDULE.META_MASKING.PARTIAL.ENABLED": True,
            "SCHEDULE.META_MASKING.PARTIAL.WHITELIST": [["A"], ["B"], ["C"]],
        }
    )
    state = sched.state_dict()
    seq1 = [tuple(sched.pick_partial_mask_combo()) for _ in range(5)]
    sched.load_state_dict(state)
    seq2 = [tuple(sched.pick_partial_mask_combo()) for _ in range(5)]
    assert seq1 == seq2
