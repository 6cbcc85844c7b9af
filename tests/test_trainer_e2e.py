"""End-to-end Trainer test: tiny mFormerV1 on synthetic HDF5 through the full
orchestration (epochs, GradNorm cadence, validation passes, checkpoint,
resume). The closest analog in the reference test suite is the inference
bundle fixture (SURVEY.md §4); this goes further and drives training."""

import os

import h5py
import numpy as np
import pytest

from linnaeus_tpu.configuration import get_default_config

N = 48


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    species = rng.integers(1, 7, N)
    species[:4] = 0
    genus = np.where(species > 0, 100 + (species - 1) // 3, 0)
    with h5py.File(d / "labels.h5", "w") as f:
        f.create_dataset(
            "img_identifiers",
            data=np.array([f"i{i}" for i in range(N)], dtype="S8"),
        )
        f.create_dataset("taxa_L10", data=species.astype(np.int64))
        f.create_dataset("taxa_L20", data=genus.astype(np.int64))
        f.create_dataset("temporal", data=rng.normal(size=(N, 2)).astype(np.float32))
        f.create_dataset("spatial", data=rng.normal(size=(N, 3)).astype(np.float32))
    with h5py.File(d / "images.h5", "w") as f:
        f.create_dataset(
            "images", data=rng.integers(0, 256, (N, 32, 32, 3), dtype=np.uint8)
        )
    return d


def make_config(data_dir, out_dir, epochs=2):
    cfg = get_default_config()
    cfg.EXPERIMENT.NAME = "e2e"
    cfg.ENV.OUTPUT.BASE_DIR = str(out_dir)
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
    cfg.DATA.PARTIAL.LEVELS = True
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.BATCH_SIZE = 8
    cfg.DATA.BATCH_SIZE_VAL = 8
    cfg.DATA.H5.LABELS_PATH = str(data_dir / "labels.h5")
    cfg.DATA.H5.IMAGES_PATH = str(data_dir / "images.h5")
    cfg.DATA.H5.TRAIN_VAL_SPLIT_RATIO = 0.8
    cfg.DATA.PREFETCH.MEM_CACHE_SIZE = 1 << 20
    cfg.DATA.SAMPLER.GROUPED_MODE = "mixed-pairs"
    cfg.SCHEDULE.MIX.GROUP_LEVELS = ["taxa_L20"]
    cfg.SCHEDULE.MIX.PROB.END_STEPS = 100
    cfg.SCHEDULE.META_MASKING.END_STEPS = 100
    cfg.MODEL.TYPE = "mFormerV1"
    cfg.MODEL.NAME = "tiny"
    cfg.MODEL.IMG_SIZE = 32
    cfg.MODEL.DROP_PATH_RATE = 0.0
    cfg.MODEL.CONVNEXT_STAGES.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.CONVNEXT_STAGES.DIMS = [8, 16, 32, 64]
    cfg.MODEL.ROPE_STAGES.DEPTHS = [1, 1]
    cfg.MODEL.ROPE_STAGES.DIMS = [32, 64]
    cfg.MODEL.ROPE_STAGES.NUM_HEADS = [2, 2]
    cfg.MODEL.ROPE_STAGES.MLP_RATIO = [2.0, 2.0]
    cfg.MODEL.CLASSIFICATION.HEADS.merge_from_other_cfg(
        type(cfg)(
            {
                "taxa_L10": {"TYPE": "HierarchicalSoftmax"},
                "taxa_L20": {"TYPE": "HierarchicalSoftmax"},
            },
            new_allowed=True,
        )
    )
    # keep e2e compiles light: augmentation wiring has dedicated tests
    # (test_augmentation.py::test_train_step_applies_augmentation)
    cfg.AUG.AUTOAUG.POLICY = ""
    cfg.AUG.AUTOAUG.COLOR_JITTER = 0.0
    cfg.AUG.RANDOM_ERASE.PROB = 0.0
    cfg.TRAIN.EPOCHS = epochs
    cfg.TRAIN.MIXED_PRECISION.ENABLED = False
    cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = False
    cfg.TRAIN.ACCUMULATION_STEPS = 0
    cfg.LOSS.GRAD_WEIGHTING.TASK.UPDATE_INTERVAL = 2
    cfg.LOSS.TASK_SPECIFIC.TRAIN.FUNCS = ["SoftTargetCrossEntropy"] * 2
    cfg.LOSS.TASK_SPECIFIC.VAL.FUNCS = ["SoftTargetCrossEntropy"] * 2
    cfg.LR_SCHEDULER.WARMUP_EPOCHS = 0
    cfg.LR_SCHEDULER.WARMUP_STEPS = 1
    # factor-1 LR scaling: BASE_LR means "LR at REFERENCE_BS" (the Trainer
    # scales by effective_bs/REFERENCE_BS unconditionally, like the reference)
    cfg.LR_SCHEDULER.REFERENCE_BS = 8
    cfg.SCHEDULE.VALIDATION.INTERVAL_EPOCHS = 1
    cfg.SCHEDULE.VALIDATION.MASK_META_INTERVAL_EPOCHS = 1
    cfg.SCHEDULE.CHECKPOINT.INTERVAL_EPOCHS = 1
    return cfg


@pytest.mark.slow
def test_trainer_end_to_end(data_dir, tmp_path):
    from linnaeus_tpu.metrics.tracker import MetricsTracker
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out", epochs=2)
    trainer = Trainer(cfg)
    assert trainer.steps_per_epoch >= 1
    trainer.train()

    # training advanced and recorded metrics
    assert trainer.progress.global_step >= 2 * trainer.steps_per_epoch
    assert trainer.metrics.get(MetricsTracker.VAL, "loss") is not None
    assert trainer.metrics.get(MetricsTracker.VAL, "acc1/taxa_L10") is not None
    assert trainer.metrics.get(MetricsTracker.VAL_MASK_META, "loss") is not None
    assert trainer.metrics.get(MetricsTracker.VAL, "chain_accuracy") is not None
    # gradnorm ran (interval=2) and weights renormalize to num_tasks
    import jax

    w = np.asarray(jax.device_get(trainer.state.gradnorm.task_weights))
    np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-4)
    assert trainer.metrics.gradnorm_history

    # checkpoints exist
    ckpts = os.listdir(cfg.ENV.OUTPUT.DIRS.CHECKPOINTS)
    assert any(c.startswith("checkpoint_step_") for c in ckpts)

    # dataset assets persisted at train start, so the finished run is
    # directly consumable by tools/prepare_inference_bundle.py
    assets = os.listdir(cfg.ENV.OUTPUT.DIRS.ASSETS)
    assert "dataset_metadata.json" in assets
    assert "taxonomy.json" in assets

    # resume: fresh trainer picks up state
    trainer2 = Trainer(cfg)
    assert trainer2.try_resume()
    assert trainer2.progress.global_step == trainer.progress.global_step
    # resume advertises itself in the config (reference checkpoint.py:927,946)
    assert bool(trainer2.config.LOADING_FROM_CHECKPOINT)
    assert trainer2.config.TRAIN.START_EPOCH == trainer2.progress.current_epoch
    w2 = np.asarray(jax.device_get(trainer2.state.gradnorm.task_weights))
    np.testing.assert_allclose(w2, w, rtol=1e-6)
    trainer.train_loader.close()
    trainer2.train_loader.close()


@pytest.mark.slow
def test_early_stop_plateaued_accuracy_and_resume(data_dir, tmp_path):
    """TRAIN.EARLY_STOP.METRIC selects an accuracy metric (direction-aware),
    patience fires on plateau, and best/patience survive checkpoint resume
    (reference: ops_schedule.py:175-249, early_stop_state.py:9)."""
    from linnaeus_tpu.train.loop import Trainer

    epochs = 6
    cfg = make_config(data_dir, tmp_path / "out", epochs=epochs)
    cfg.TRAIN.EARLY_STOP.ACTIVE = True
    cfg.TRAIN.EARLY_STOP.METRIC = "val_chain_accuracy"
    cfg.TRAIN.EARLY_STOP.PATIENCE_STEPS = 1
    # MIN_DELTA larger than any possible accuracy gain: the first validation
    # sets best, every later one is a deterministic "no improvement"
    cfg.TRAIN.EARLY_STOP.MIN_DELTA = 10.0
    trainer = Trainer(cfg)
    trainer.train()
    # stopped after epoch 2's validation, far short of 6 epochs
    assert trainer.progress.global_step < epochs * trainer.steps_per_epoch
    assert trainer.early_stop.higher_is_better is True
    assert trainer.early_stop.metric_name == "val_chain_accuracy"
    assert trainer.early_stop.best_value is not None
    assert trainer.early_stop.steps_since_improvement >= 1

    # resume restores early-stop state from the sidecar
    trainer2 = Trainer(cfg)
    assert trainer2.try_resume()
    assert trainer2.early_stop.best_value == pytest.approx(
        trainer.early_stop.best_value
    )
    assert trainer2.early_stop.best_step == trainer.early_stop.best_step
    assert (
        trainer2.early_stop.steps_since_improvement
        == trainer.early_stop.steps_since_improvement
    )
    assert trainer2.early_stop.higher_is_better is True
    trainer.train_loader.close()
    trainer2.train_loader.close()


@pytest.mark.slow
def test_trainer_mformer_v0_end_to_end(data_dir, tmp_path):
    """mFormerV0 through the Trainer: exercises BatchNorm stats threading."""
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_v0", epochs=1)
    cfg.MODEL.TYPE = "mFormerV0"
    cfg.MODEL.NAME = "tiny_v0"
    cfg.MODEL.STAGES.DIMS = [8, 12, 24, 32, 64]
    cfg.MODEL.STAGES.MBCONV_DEPTHS = [1, 1]
    cfg.MODEL.STAGES.ATTN_DEPTHS = [1, 1]
    cfg.MODEL.STAGES.NUM_HEADS = [2, 2]
    cfg.MODEL.STAGES.MLP_RATIO = [2.0, 2.0]
    trainer = Trainer(cfg)
    assert trainer.state.batch_stats is not None
    import jax

    before = jax.device_get(jax.tree.leaves(trainer.state.batch_stats)[0])
    trainer.train()
    after = jax.device_get(jax.tree.leaves(trainer.state.batch_stats)[0])
    import numpy as np

    assert not np.allclose(before, after)  # BN stats advanced during training
    assert trainer.metrics.get("val", "loss") is not None
    trainer.train_loader.close()


@pytest.mark.slow
def test_trainer_fsdp_param_sharding(data_dir, tmp_path):
    """FSDP-style param sharding over the 8-device CPU mesh."""
    import jax

    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_fsdp", epochs=1)
    cfg.PARALLEL.PARAM_SHARDING = "fsdp"
    trainer = Trainer(cfg)
    # at least one large param should actually be sharded across devices
    sharded = [
        p for p in jax.tree.leaves(trainer.state.params)
        if hasattr(p, "sharding") and not p.sharding.is_fully_replicated
    ]
    assert sharded, "no parameter was sharded under fsdp mode"
    trainer.train()
    assert trainer.metrics.get("val", "loss") is not None
    trainer.train_loader.close()


@pytest.mark.slow
def test_trainer_with_muon_optimizer(data_dir, tmp_path):
    """Muon optimizer end-to-end through the Trainer."""
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_muon", epochs=1)
    cfg.OPTIMIZER.NAME = "muon"
    cfg.LOSS.GRAD_WEIGHTING.TASK.TYPE = "static"
    trainer = Trainer(cfg)
    trainer.train()
    assert trainer.progress.global_step >= trainer.steps_per_epoch
    assert trainer.metrics.get("val", "loss") is not None
    trainer.train_loader.close()


@pytest.mark.slow
def test_trainer_val_autobatch(data_dir, tmp_path):
    """DATA.AUTOBATCH.ENABLED_VAL probes the eval step's compiled memory and
    rewrites DATA.BATCH_SIZE_VAL (reference: utils/autobatch.py val mode)."""
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_vab", epochs=1)
    cfg.DATA.BATCH_SIZE_VAL = 16  # deliberately larger than the search cap
    cfg.DATA.AUTOBATCH.ENABLED_VAL = True
    cfg.DATA.AUTOBATCH.MIN_BATCH_SIZE_VAL = 8
    cfg.DATA.AUTOBATCH.MAX_BATCH_SIZE_VAL = 8
    trainer = Trainer(cfg)
    # the probe rewrites BATCH_SIZE_VAL and rebuilds the val loader
    assert int(cfg.DATA.BATCH_SIZE_VAL) == 8
    assert int(cfg.DATA.BATCH_SIZE_VAL) % trainer.mesh.devices.shape[0] == 0
    from linnaeus_tpu.ops_schedule import TrainingStage

    trainer._validate(TrainingStage.VALIDATION_NORMAL)
    assert trainer.metrics.get("val", "loss") is not None
    trainer.train_loader.close()


@pytest.mark.slow
def test_mid_validation_resume(data_dir, tmp_path):
    """A validation pass interrupted mid-way stays queued with its partial
    accumulators and replays from the next batch (reference:
    training_progress.py:61-130 partial indices)."""
    from linnaeus_tpu.ops_schedule import TrainingStage
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_midval", epochs=1)
    cfg.DATA.H5.TRAIN_VAL_SPLIT_RATIO = 0.6  # ~19 val samples -> 2 full batches of 8
    trainer = Trainer(cfg)
    phase = "val"

    # simulate death after the first eval batch
    real_step = trainer._eval_step
    calls = {"n": 0}

    def dying_step(*a, **kw):
        if calls["n"] >= 1:
            raise KeyboardInterrupt("preempted")
        calls["n"] += 1
        return real_step(*a, **kw)

    trainer._eval_step = dying_step
    trainer.progress.queue_validation(TrainingStage.VALIDATION_NORMAL)
    with pytest.raises(KeyboardInterrupt):
        trainer._run_pending_validations()
    assert trainer.progress.has_pending_validations()  # still queued
    partial = trainer.progress.partial_validation_indices[phase]
    assert partial["next_index"] == 1 and partial["count"] > 0

    # progress state round-trips through serialization (checkpoint path)
    import copy

    state = copy.deepcopy(trainer.progress.state_dict())
    trainer.progress.load_state_dict(state)

    # resume: completes from batch 1 without re-running batch 0
    trainer._eval_step = real_step
    trainer._run_pending_validations()
    assert not trainer.progress.has_pending_validations()
    assert phase not in trainer.progress.partial_validation_indices
    resumed_loss = trainer.metrics.get(phase, "loss")
    assert resumed_loss is not None

    # equals an uninterrupted pass over the same loader/state
    trainer.metrics.reset_phase(phase)
    trainer._validate(TrainingStage.VALIDATION_NORMAL)
    full_loss = trainer.metrics.get(phase, "loss")
    assert abs(resumed_loss - full_loss) < 1e-5
    trainer.train_loader.close()


@pytest.mark.slow
def test_null_and_rarity_validation_metrics(data_dir, tmp_path):
    """METRICS.TRACK_NULL_VS_NON_NULL and TRACK_RARITY produce bucketed
    validation accuracies (reference: tracker.py null-vs-non-null counters +
    SubsetMetricWrapper over rarity percentile subsets)."""
    from linnaeus_tpu.ops_schedule import TrainingStage
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_subsets", epochs=1)
    cfg.METRICS.TRACK_NULL_VS_NON_NULL = True
    cfg.METRICS.NULL_VS_NON_NULL_TASKS = ["taxa_L10"]
    cfg.METRICS.TRACK_RARITY = True
    cfg.METRICS.RARITY_PERCENTILES = [50]
    trainer = Trainer(cfg)
    trainer._validate(TrainingStage.VALIDATION_NORMAL)
    summary = trainer.metrics.phase_summary("val")
    # non-null bucket always present (most labels are non-null)
    assert "acc1_non_null/taxa_L10" in summary
    # rarity buckets: at least one bin observed per task
    assert any(k.startswith("acc1_rarity_") for k in summary)
    for k, v in summary.items():
        if k.startswith("acc1_"):
            assert 0.0 <= v <= 1.0
    trainer.train_loader.close()


@pytest.mark.slow
def test_taxa_subset_validation_metrics(data_dir, tmp_path):
    """METRICS.TAXA_SUBSETS buckets per-task validation accuracy by
    membership in a named taxon subset (reference:
    vectorized_dataset_processor.py:859-880)."""
    from linnaeus_tpu.ops_schedule import TrainingStage
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_taxa", epochs=1)
    cfg.METRICS.TAXA_SUBSETS = [["g100", "taxa_L20", 100]]
    trainer = Trainer(cfg)
    sel = trainer.bundle["processor"].taxa_subset_selectors()
    assert "g100" in sel and sel["g100"][0] == "taxa_L20"
    trainer._validate(TrainingStage.VALIDATION_NORMAL)
    summary = trainer.metrics.phase_summary("val")
    assert any(k.startswith("acc1_taxa_g100/") for k in summary)
    trainer.train_loader.close()


@pytest.mark.slow
def test_preemption_checkpoint_and_resume(data_dir, tmp_path):
    """SIGUSR1/SIGTERM-style preemption: the trainer saves an emergency
    checkpoint with the in-flight validation state and stops cleanly;
    AUTO_RESUME recovers (reference: utils/hpc_utils.py:16-43 +
    main.py:104-352 shutdown registry)."""
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_preempt", epochs=3)
    trainer = Trainer(cfg)

    # preempt after the first optimizer step of epoch 0
    orig_increment = trainer.progress.increment_step

    def increment_and_preempt():
        orig_increment()
        trainer.shutdown.preempted.set()

    trainer.progress.increment_step = increment_and_preempt
    trainer.train()
    step_at_preempt = trainer.progress.global_step
    assert step_at_preempt >= 1
    # drain() fires the registered callback -> emergency checkpoint
    trainer.shutdown.drain()
    ckpts = os.listdir(cfg.ENV.OUTPUT.DIRS.CHECKPOINTS)
    assert any(c.startswith("checkpoint_step_") for c in ckpts)

    # fresh process resumes from the emergency checkpoint
    import linnaeus_tpu.utils.hpc as hpc

    hpc._registry = None  # new process would start with a fresh registry
    trainer2 = Trainer(cfg)
    assert trainer2.try_resume()
    assert trainer2.progress.global_step == step_at_preempt
    trainer2.train_loader.close()


@pytest.mark.slow
def test_gradnorm_remat_toggle(data_dir, tmp_path):
    """ENABLED_GRADNORM_STEPS != ENABLED_NORMAL_STEPS builds a remat variant
    for the GradNorm re-forward; weights update identically in value
    (reference: train.py:94-112 checkpointing flag toggling)."""
    import jax
    import numpy as np

    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_gnremat", epochs=1)
    cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = False
    cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_GRADNORM_STEPS = True
    trainer = Trainer(cfg)
    assert trainer._gradnorm_update is not None
    batch = next(iter(trainer.train_loader))
    from linnaeus_tpu.train.step import ScheduleScalars

    scalars = ScheduleScalars.from_ops_schedule(
        trainer.ops_schedule, 0, trainer.meta_dim
    )
    new_state, metrics = trainer._gradnorm_update(trainer.state, batch, scalars)
    w = np.asarray(jax.device_get(new_state.gradnorm.task_weights))
    np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-4)
    assert np.isfinite(float(jax.device_get(metrics["gradnorm/avg_norm"])))
    trainer.train_loader.close()


def test_standalone_validation_api(data_dir, tmp_path):
    """Module-level validate_one_pass / validate_with_partial_mask (reference
    validation.py:49,341) share accumulate/summarize with Trainer._validate."""
    import numpy as np

    from linnaeus_tpu.train.loop import Trainer
    from linnaeus_tpu.train.validation import (
        validate_one_pass,
        validate_with_partial_mask,
    )

    cfg = make_config(data_dir, tmp_path / "out_valapi", epochs=1)
    trainer = Trainer(cfg)
    summary = validate_one_pass(
        trainer._eval_step, trainer.state, trainer.val_loader,
        trainer.task_keys, trainer.num_classes, trainer.meta_dim,
    )
    assert "loss" in summary and "chain_accuracy" in summary
    for t in trainer.task_keys:
        assert 0.0 <= summary[f"acc1/{t}"] <= 1.0

    masked = validate_one_pass(
        trainer._eval_step, trainer.state, trainer.val_loader,
        trainer.task_keys, trainer.num_classes, trainer.meta_dim,
        mask_meta=True,
    )
    assert masked["loss"] != summary["loss"]

    combo = np.zeros((trainer.meta_dim,), np.float32)
    combo[:2] = 1.0  # TEMPORAL columns
    partial = validate_with_partial_mask(
        trainer._eval_step, trainer.state, trainer.val_loader,
        trainer.task_keys, trainer.num_classes, combo,
    )
    assert "loss" in partial
    trainer.train_loader.close()


@pytest.fixture(scope="module")
def learnable_data_dir(tmp_path_factory):
    """Synthetic data where the label IS the image: class k paints the whole
    image with a distinct color, so a working training loop must reach
    near-perfect accuracy in a few epochs (far above the 1/7 chance rate)."""
    d = tmp_path_factory.mktemp("learnable")
    rng = np.random.default_rng(7)
    n = 64
    species = rng.integers(1, 7, n)  # classes 1..6 (0 = null, unused here)
    genus = 100 + (species - 1) // 3
    colors = np.stack([
        np.linspace(20, 235, 7).astype(np.uint8),
        np.linspace(235, 20, 7).astype(np.uint8),
        (np.arange(7) * 36 % 256).astype(np.uint8),
    ], axis=1)  # (7, 3) distinct RGB per class
    imgs = colors[species][:, None, None, :] * np.ones(
        (n, 32, 32, 3), np.uint8
    )
    noise = rng.integers(0, 12, imgs.shape).astype(np.uint8)
    imgs = np.clip(imgs.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    with h5py.File(d / "labels.h5", "w") as f:
        f.create_dataset(
            "img_identifiers",
            data=np.array([f"i{i}" for i in range(n)], dtype="S8"),
        )
        f.create_dataset("taxa_L10", data=species.astype(np.int64))
        f.create_dataset("taxa_L20", data=genus.astype(np.int64))
        f.create_dataset("temporal", data=rng.normal(size=(n, 2)).astype(np.float32))
        f.create_dataset("spatial", data=rng.normal(size=(n, 3)).astype(np.float32))
    with h5py.File(d / "images.h5", "w") as f:
        f.create_dataset("images", data=imgs)
    return d


@pytest.mark.slow
def test_trainer_learns_separable_data(learnable_data_dir, tmp_path):
    """Learning sanity (the reference has no equivalent test): train loss
    falls by >2x and train accuracy clears chance on trivially separable
    data. Guards against silent optimizer/loss/label-plumbing breakage that
    shape tests cannot catch. (Val-side generalization is deliberately NOT
    asserted: at this 60-step scale the tiny hybrid leans on sample metadata
    as much as pixels, and val accuracy is measured on 8 samples.)"""
    from linnaeus_tpu.metrics.tracker import MetricsTracker
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(learnable_data_dir, tmp_path / "out", epochs=10)
    # plain supervised setup: no mixing, no meta masking, linear heads
    cfg.SCHEDULE.MIX.PROB.ENABLED = False
    cfg.SCHEDULE.MIX.PROB.START_PROB = 0.0
    cfg.SCHEDULE.MIX.PROB.END_PROB = 0.0
    cfg.SCHEDULE.META_MASKING.START_PROB = 0.0
    cfg.SCHEDULE.META_MASKING.END_PROB = 0.0
    cfg.MODEL.CLASSIFICATION.HEADS.taxa_L10.TYPE = "Linear"
    cfg.MODEL.CLASSIFICATION.HEADS.taxa_L20.TYPE = "Linear"
    cfg.LOSS.GRAD_WEIGHTING.TASK.TYPE = "static"
    cfg.OPTIMIZER.WEIGHT_DECAY = 0.0
    cfg.LR_SCHEDULER.BASE_LR = 1e-2
    cfg.LR_SCHEDULER.MIN_LR = 5e-3
    cfg.SCHEDULE.VALIDATION.INTERVAL_EPOCHS = 5
    cfg.SCHEDULE.METRICS.CONSOLE_INTERVAL = 1
    trainer = Trainer(cfg)
    trainer.train()

    # TRAIN phase resets each epoch -> this is the FINAL epoch's average.
    # Untrained hierarchical CE starts near ln(7)+ln(3) ~ 3.05; measured
    # final-epoch loss ~1.1 at this config.
    last_loss = trainer.metrics.get(MetricsTracker.TRAIN, "loss")
    assert last_loss is not None and float(last_loss) < 1.7, (
        f"final-epoch train loss {last_loss} did not fall below 1.7"
    )
    acc = trainer.metrics.get(MetricsTracker.TRAIN, "acc1/taxa_L10")
    assert acc is not None and float(acc) >= 0.2, (
        f"final-epoch train acc1/taxa_L10={acc} not above chance (~0.14)"
    )
    trainer.train_loader.close()


@pytest.mark.slow
def test_trainer_tensor_parallel(data_dir, tmp_path):
    """Megatron-style TP through the full Trainer on a (data=2, model=4)
    mesh: projections shard over 'model', training completes, validation
    produces metrics.

    Runs in a SUBPROCESS: compiling the reshaped-mesh SPMD train step late
    in a long-lived pytest process segfaults inside XLA:CPU's
    backend_compile (observed deterministically at the same suite position
    across four full runs, cache on or off; the same compile succeeds in a
    fresh process)."""
    import subprocess
    import sys

    if os.environ.get("LINNAEUS_TP_TEST_INNER") != "1":
        env = {**os.environ, "LINNAEUS_TP_TEST_INNER": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             f"{__file__}::test_trainer_tensor_parallel", "-x", "-q"],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, (
            f"inner TP test failed:\n{r.stdout[-3000:]}\n{r.stderr[-2000:]}"
        )
        return

    import jax

    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_tp", epochs=1)
    cfg.PARALLEL.MESH.DATA = 2
    cfg.PARALLEL.MESH.MODEL = 4
    cfg.PARALLEL.PARAM_SHARDING = "tp"
    trainer = Trainer(cfg)
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(trainer.state.params, sep="/")
    qkv = next(v for k, v in flat.items() if k.endswith("attn/qkv/kernel"))
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    trainer.train()
    assert trainer.metrics.get("val", "loss") is not None
    trainer.train_loader.close()


@pytest.mark.slow
def test_trainer_fsdp_with_batchnorm_model(data_dir, tmp_path):
    """mFormerV0 (BatchNorm stats in TrainState) + FSDP param sharding:
    batch_stats must be placed on the mesh like every other state leaf, or
    the first jitted step fails on a multi-host mesh with mixed
    global/local arrays (round-2 review finding)."""
    import jax

    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_v0_fsdp", epochs=1)
    cfg.MODEL.TYPE = "mFormerV0"
    cfg.MODEL.NAME = "tiny_v0_fsdp"
    cfg.MODEL.STAGES.DIMS = [8, 12, 24, 32, 64]
    cfg.MODEL.STAGES.MBCONV_DEPTHS = [1, 1]
    cfg.MODEL.STAGES.ATTN_DEPTHS = [1, 1]
    cfg.MODEL.STAGES.NUM_HEADS = [2, 2]
    cfg.MODEL.STAGES.MLP_RATIO = [2.0, 2.0]
    cfg.PARALLEL.PARAM_SHARDING = "fsdp"
    trainer = Trainer(cfg)
    assert trainer.state.batch_stats is not None
    for leaf in jax.tree.leaves(trainer.state.batch_stats):
        # every BN stat is a global array on the trainer's mesh (replicated)
        assert leaf.sharding.mesh.shape == dict(
            zip(trainer.mesh.axis_names, trainer.mesh.devices.shape)
        )
        assert leaf.sharding.is_fully_replicated
    trainer.train()
    assert trainer.metrics.get("val", "loss") is not None
    trainer.train_loader.close()


@pytest.mark.slow
def test_trainer_train_autobatch_rebuilds_schedule(data_dir, tmp_path):
    """Train-side AutoBatch changes DATA.BATCH_SIZE after schedules and
    optimizer were built; the Trainer must re-scale the LR for the new
    effective batch and rebuild schedules/optimizer/step (round-2 review:
    previously the LR stayed scaled for the pre-AutoBatch batch).

    Runs in a SUBPROCESS: this test compiles the train step TWICE (probe +
    rebuilt), and that second compile segfaults inside XLA:CPU late in a
    long-lived pytest process (xdist pinpointed the worker crash here;
    the same test passes in a fresh process)."""
    import subprocess
    import sys

    if os.environ.get("LINNAEUS_AB_TEST_INNER") != "1":
        env = {**os.environ, "LINNAEUS_AB_TEST_INNER": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             f"{__file__}::test_trainer_train_autobatch_rebuilds_schedule",
             "-x", "-q"],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, (
            f"inner autobatch test failed:\n{r.stdout[-3000:]}\n"
            f"{r.stderr[-2000:]}"
        )
        return

    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_tab", epochs=1)
    base_lr_at_ref = 1e-4  # default BASE_LR; REFERENCE_BS=8 (make_config)
    cfg.DATA.AUTOBATCH.ENABLED = True
    # force the search to land on 16 (2x the configured batch of 8)
    cfg.DATA.AUTOBATCH.MIN_BATCH_SIZE = 16
    cfg.DATA.AUTOBATCH.MAX_BATCH_SIZE = 16
    trainer = Trainer(cfg)
    assert int(cfg.DATA.BATCH_SIZE) == 16
    # initial scaling: 8/8 = 1x; autobatch rescale: 16/8 = 2x
    assert float(cfg.LR_SCHEDULER.BASE_LR) == pytest.approx(
        2.0 * base_lr_at_ref
    )
    # the live schedule reflects the rebuilt BASE_LR (post-warmup peak)
    lrs = [float(trainer.lr_schedule(s)) for s in range(
        int(cfg.LR_SCHEDULER.TOTAL_STEPS) + 1)]
    assert max(lrs) == pytest.approx(2.0 * base_lr_at_ref, rel=1e-6)
    trainer.train()
    assert trainer.progress.global_step >= trainer.steps_per_epoch
    trainer.train_loader.close()


@pytest.mark.slow
def test_trainer_sequence_parallel(data_dir, tmp_path):
    """PARALLEL.SEQUENCE_PARALLEL routes attention through the ppermute
    ring (ops/ring_attention.py) inside the full jitted train step on a
    (data=2, model=4) mesh; training and validation must run end-to-end.

    Runs in a SUBPROCESS like the TP test: a fresh SPMD train-step compile
    late in a long-lived pytest process trips the XLA:CPU segfault."""
    import subprocess
    import sys

    if os.environ.get("LINNAEUS_SP_TEST_INNER") != "1":
        env = {**os.environ, "LINNAEUS_SP_TEST_INNER": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             f"{__file__}::test_trainer_sequence_parallel", "-x", "-q"],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, (
            f"inner SP test failed:\n{r.stdout[-3000:]}\n{r.stderr[-2000:]}"
        )
        return

    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_sp", epochs=1)
    cfg.PARALLEL.MESH.DATA = 2
    cfg.PARALLEL.MESH.MODEL = 4
    cfg.PARALLEL.SEQUENCE_PARALLEL = True
    trainer = Trainer(cfg)
    assert trainer.model.ring_mesh is not None
    trainer.train()
    assert trainer.metrics.get("val", "loss") is not None
    trainer.train_loader.close()


def test_sequence_parallel_requires_model_axis(data_dir, tmp_path):
    """SEQUENCE_PARALLEL on a model=1 mesh must raise, not silently no-op."""
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_sp_bad", epochs=1)
    cfg.PARALLEL.SEQUENCE_PARALLEL = True
    with pytest.raises(ValueError, match="MESH.MODEL"):
        Trainer(cfg)


def test_sequence_parallel_rejects_tp_combination(data_dir, tmp_path):
    """SP and TP both shard the model axis; the combination would reshard
    qkv activations token-wise and back at every layer — must raise."""
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_sp_tp", epochs=1)
    cfg.PARALLEL.MESH.DATA = 2
    cfg.PARALLEL.MESH.MODEL = 4
    cfg.PARALLEL.SEQUENCE_PARALLEL = True
    cfg.PARALLEL.PARAM_SHARDING = "tp"
    with pytest.raises(ValueError, match="SEQUENCE_PARALLEL"):
        Trainer(cfg)


@pytest.mark.slow
def test_trainer_expert_parallel(data_dir, tmp_path):
    """MODEL.MOE.ENABLED + PARAM_SHARDING='ep' on a (data=2, model=4) mesh:
    the full Trainer builds the MoE variant, shards the expert banks over
    the model axis, and trains + validates end-to-end with the MoE aux
    metrics flowing through the step logger.

    Runs in a SUBPROCESS like the TP/SP tests: a fresh SPMD train-step
    compile late in a long-lived pytest process trips the XLA:CPU
    segfault."""
    import subprocess
    import sys

    if os.environ.get("LINNAEUS_EP_TEST_INNER") != "1":
        env = {**os.environ, "LINNAEUS_EP_TEST_INNER": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             f"{__file__}::test_trainer_expert_parallel", "-x", "-q"],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, (
            f"inner EP test failed:\n{r.stdout[-3000:]}\n{r.stderr[-2000:]}"
        )
        return

    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_ep", epochs=1)
    cfg.SCHEDULE.METRICS.CONSOLE_INTERVAL = 1  # record train-phase metrics
    cfg.MODEL.MOE.ENABLED = True
    cfg.MODEL.MOE.NUM_EXPERTS = 4
    cfg.MODEL.MOE.EVERY_N = 1
    cfg.PARALLEL.MESH.DATA = 2
    cfg.PARALLEL.MESH.MODEL = 4
    cfg.PARALLEL.PARAM_SHARDING = "ep"
    trainer = Trainer(cfg)
    # expert banks actually sharded over 'model'
    wi = trainer.state.params["stage3_block0"]["mlp"]["wi"]
    assert wi.sharding.spec[0] == "model"
    trainer.train()
    assert trainer.metrics.get("val", "loss") is not None
    assert trainer.metrics.get("train", "moe_aux") is not None
    trainer.train_loader.close()


def test_ep_sharding_requires_model_axis(data_dir, tmp_path):
    """PARAM_SHARDING='ep' on a model=1 mesh must raise, not silently
    replicate."""
    from linnaeus_tpu.train.loop import Trainer

    cfg = make_config(data_dir, tmp_path / "out_ep_bad", epochs=1)
    cfg.MODEL.MOE.ENABLED = True
    cfg.PARALLEL.PARAM_SHARDING = "ep"
    with pytest.raises(ValueError, match="MESH.MODEL"):
        Trainer(cfg)


def test_trainer_pipeline_parallel_loss_parity(data_dir, tmp_path):
    """PARALLEL.PIPELINE through the full Trainer: a (data=4, model=2) mesh
    pipelines BOTH RoPE towers (depth 2 = one block per stage) with
    per-step training-loss parity vs the identical run on the pure-dp mesh
    — the pipelined forward/backward is exact, not approximate
    (parallel/pipeline.py). Subprocess for the same XLA:CPU reshaped-mesh
    late-compile segfault the TP test documents."""
    import json
    import subprocess
    import sys

    if os.environ.get("LINNAEUS_PP_TEST_INNER") != "1":
        env = {**os.environ, "LINNAEUS_PP_TEST_INNER": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             f"{__file__}::test_trainer_pipeline_parallel_loss_parity",
             "-x", "-q"],
            env=env, capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, (
            f"inner PP test failed:\n{r.stdout[-3000:]}\n{r.stderr[-2000:]}"
        )
        return

    from linnaeus_tpu.train.loop import Trainer

    def losses(out_dir):
        rows = []
        with open(os.path.join(out_dir, "logs", "metrics.jsonl")) as f:
            for line in f:
                row = json.loads(line)
                if "train/loss" in row:
                    rows.append((row["step"], float(row["train/loss"])))
        return dict(rows)

    def run(name, **parallel):
        cfg = make_config(data_dir, tmp_path / name, epochs=1)
        cfg.EXPERIMENT.NAME = name
        cfg.MODEL.ROPE_STAGES.DEPTHS = [2, 2]
        cfg.SCHEDULE.METRICS.CONSOLE_INTERVAL = 1
        # train/loss reaches metrics.jsonl on the WANDB cadence
        cfg.SCHEDULE.METRICS.WANDB_INTERVAL = 1
        for k, v in parallel.items():
            setattr(cfg.PARALLEL.MESH, k.upper(), v) if k in (
                "data", "model") else None
        if parallel.get("pp"):
            cfg.PARALLEL.PIPELINE.STAGES = 2
            cfg.PARALLEL.PIPELINE.MICROBATCHES = 2
        trainer = Trainer(cfg)
        trainer.train()
        trainer.train_loader.close()
        run_dir = cfg.ENV.OUTPUT.DIRS.EXP_BASE
        return losses(run_dir)

    dp = run("pp_parity_dp")
    pp = run("pp_parity_pp", data=4, model=2, pp=True)
    assert dp and pp, (dp, pp)
    common = sorted(set(dp) & set(pp))
    assert len(common) >= 3
    for s in common:
        assert abs(dp[s] - pp[s]) < 1e-3, (
            f"step {s}: dp loss {dp[s]} vs pp loss {pp[s]}"
        )
