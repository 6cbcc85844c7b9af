"""Trainer — full training orchestration.

Reference parity: linnaeus/main.py:426-2537 + train.py:13-443 +
validation.py:49-637, reorganized around the JAX execution model:

  build datasets -> model -> schedule -> optimizer -> TrainState -> mesh
  -> epoch loop { train epoch -> checkpoint trigger -> validation passes }
  with auto-resume (incl. pending-validation replay), GradNorm cadence,
  early stop, retention policy, and phase-keyed metrics.

One jitted train step + one jitted eval step serve the whole run; schedule
values enter as operands. The mesh shards batches along 'data'; state is
replicated (PARALLEL.PARAM_SHARDING='replicated').
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from linnaeus_tpu.configuration.utils import setup_output_dirs
from linnaeus_tpu.data.build import build_datasets, build_loaders
from linnaeus_tpu.data.collate import MixConfig
from linnaeus_tpu.loss import prepare_loss_functions
from linnaeus_tpu.loss.gradnorm import make_gradnorm_update_fn
from linnaeus_tpu.metrics.chain_accuracy import chain_accuracy_counts
from linnaeus_tpu.metrics.tracker import MetricsTracker
from linnaeus_tpu.models.build import build_model, resolve_compute_dtype
from linnaeus_tpu.optim import build_optimizer, lr_dict_for_logging
from linnaeus_tpu.ops_schedule import EarlyStopState, OpsSchedule, TrainingProgress
from linnaeus_tpu.ops_schedule.training_progress import TrainingStage
from linnaeus_tpu.parallel.mesh import (
    create_mesh,
    get_process_count,
    initialize_multi_host,
    is_main_process,
    replicate,
    replicated_sharding,
    shard_batch,
)
from linnaeus_tpu.train.state import create_train_state
from linnaeus_tpu.train.step import ScheduleScalars, make_eval_step, make_train_step
from linnaeus_tpu.utils import checkpoint as ckpt
from linnaeus_tpu.utils.logging import get_main_logger
from linnaeus_tpu.utils.meta import (
    compute_meta_chunk_bounds,
    compute_meta_chunk_bounds_by_name,
    total_meta_dim,
)
from linnaeus_tpu.utils.debug import check_debug_flag
from linnaeus_tpu.utils.param_filters import trunk_mask_from_exclude

logger = get_main_logger()


def combo_to_mask(combo: list[str] | None, bounds_by_name: dict, meta_dim: int):
    mask = np.zeros((meta_dim,), np.float32)
    if combo:
        for name in combo:
            b = bounds_by_name.get(name.upper()) or bounds_by_name.get(name)
            if b:
                mask[b[0]:b[1]] = 1.0
    return mask


class Trainer:
    def __init__(self, config, skip_validation: bool = False):
        self.config = config
        self.skip_validation = skip_validation
        initialize_multi_host(config)
        setup_output_dirs(config)
        self.ckpt_dir = config.ENV.OUTPUT.DIRS.CHECKPOINTS
        # async flush: the hot loop resumes while arrays write in the
        # background (SCHEDULE.CHECKPOINT.ASYNC); waited at resume/exit/
        # preemption and before bucket syncs
        self.ckpt_writer = ckpt.CheckpointWriter(
            async_save=bool(config.SCHEDULE.CHECKPOINT.get("ASYNC", True))
        )

        from linnaeus_tpu.utils.hpc import get_shutdown_registry

        self.shutdown = get_shutdown_registry()
        self.shutdown.install_handlers()

        # ---------------- data
        self.bundle = build_datasets(config)
        self.num_classes = self.bundle["num_classes"]
        self.task_keys = tuple(config.DATA.TASK_KEYS_H5)
        self.taxonomy_tree = self.bundle["taxonomy_tree"]
        # persist class maps / densities / taxonomy so a finished run is
        # directly consumable by tools/prepare_inference_bundle.py
        # (reference writes these at train start: utils/dataset_metadata.py)
        if is_main_process() and config.ENV.OUTPUT.DIRS.get("ASSETS"):
            from linnaeus_tpu.data.processor import (
                process_and_save_dataset_metadata,
            )

            process_and_save_dataset_metadata(
                self.bundle["processor"], config.ENV.OUTPUT.DIRS.ASSETS
            )

        # ---------------- mesh
        self.mesh = create_mesh(config)
        device_put = lambda b: shard_batch(b, self.mesh)  # noqa: E731
        self.train_loader, self.val_loader = build_loaders(
            config, self.bundle, device_put_fn=device_put
        )
        self.shutdown.register(self.train_loader)
        if self.val_loader is not None:
            self.shutdown.register(self.val_loader)
        self.steps_per_epoch = max(len(self.train_loader), 1)
        total_steps = self.steps_per_epoch * int(config.TRAIN.EPOCHS)
        from linnaeus_tpu.utils.schedule_utils import (
            resolve_all_schedule_params,
            schedule_summary,
            validate_schedule_config,
        )

        validate_schedule_config(config)
        resolve_all_schedule_params(config, total_steps)
        # linear LR scaling by effective global batch (reference applies this
        # unconditionally, main.py:924). Here DATA.BATCH_SIZE is the per-host
        # PER-OPTIMIZER-STEP batch: the accumulation path SPLITS the loader
        # batch into microbatches (train/step.py), so accumulation does NOT
        # multiply the effective batch (unlike the reference, whose loader
        # yields per-microbatch batches).
        from linnaeus_tpu.utils.schedule_utils import apply_lr_scaling

        effective_bs = int(config.DATA.BATCH_SIZE) * get_process_count()
        apply_lr_scaling(config, effective_bs)
        config.freeze()

        # ---------------- progress & schedule
        self.progress = TrainingProgress(expected_total_steps=total_steps)
        self.metrics = MetricsTracker(list(self.task_keys))
        self.ops_schedule = OpsSchedule(config, self.progress, self.metrics)
        # direction inferred from the metric name, reference convention
        # (ops_schedule.py:164-170: 'loss' in name -> lower is better)
        es_metric = str(config.TRAIN.EARLY_STOP.METRIC)
        self.early_stop = EarlyStopState(
            metric_name=es_metric,
            higher_is_better="loss" not in es_metric.lower(),
        )
        if is_main_process():
            logger.info(
                "\n" + schedule_summary(config, total_steps, self.steps_per_epoch)
            )
            # render the schedule plot at startup (reference:
            # schedule_utils.py:1118, called from main.py)
            try:
                from linnaeus_tpu.utils.schedule_utils import (
                    generate_schedule_plot,
                )

                plot_path = generate_schedule_plot(
                    config, total_steps,
                    f"{config.ENV.OUTPUT.DIRS.LOGS}/schedule.png",
                )
                if plot_path:
                    logger.info(f"Schedule plot written to {plot_path}")
            except Exception as e:
                logger.warning(f"Schedule plot failed: {e}")
        from linnaeus_tpu.utils.training_consistency import (
            TrainingConsistencyChecker,
            validate_training_schedule,
        )

        validate_training_schedule(config, total_steps, self.steps_per_epoch)
        self.consistency = TrainingConsistencyChecker(config, total_steps)

        from linnaeus_tpu.metrics.step_logger import (
            StepMetricsLogger,
            initialize_wandb,
        )

        self.wandb_run = initialize_wandb(config) if is_main_process() else None
        jsonl_path = None
        if config.ENV.OUTPUT.DIRS.LOGS:
            jsonl_path = f"{config.ENV.OUTPUT.DIRS.LOGS}/metrics.jsonl"
        self.step_logger = StepMetricsLogger(
            config, self.ops_schedule, self.metrics,
            wandb_run=self.wandb_run, jsonl_path=jsonl_path,
        )

        # ---------------- model / optimizer / state
        self.model = build_model(config, self.num_classes, self.taxonomy_tree)
        if (
            str(config.PARALLEL.get("PARAM_SHARDING", "replicated")) == "tp"
            and getattr(self.model, "rope_deinterleave", False)
        ):
            # the de-interleave applies a static column permutation to the
            # qkv kernel each forward (blocks/common.py); head blocks (64
            # cols) straddle the column-parallel shard chunks, so GSPMD
            # would all-gather every qkv kernel per step to resolve the
            # gather. The permutation is a single-chip layout optimization
            # (~1.3 ms/step at B=128/224) — shard locality wins under tp.
            self.model = self.model.clone(rope_deinterleave=False)
            logger.info(
                "PARAM_SHARDING='tp': ROPE_DEINTERLEAVE disabled (the "
                "per-forward kernel permutation crosses column-shard "
                "boundaries and would force per-step kernel all-gathers)"
            )
        if bool(config.PARALLEL.get("SEQUENCE_PARALLEL", False)):
            if int(self.mesh.shape.get("model", 1)) < 2:
                raise ValueError(
                    "PARALLEL.SEQUENCE_PARALLEL requires PARALLEL.MESH.MODEL"
                    " > 1 (the token dim shards over the model axis)"
                )
            if str(config.PARALLEL.get("PARAM_SHARDING", "replicated")) == "tp":
                raise ValueError(
                    "PARALLEL.SEQUENCE_PARALLEL and PARAM_SHARDING='tp' both"
                    " shard the model axis incompatibly (head-sharded qkv"
                    " activations would be resharded token-wise and back at"
                    " every layer — a full all-to-all each direction); pick"
                    " one, or use fsdp+sp"
                )
            if not hasattr(self.model, "ring_mesh"):
                raise ValueError(
                    f"PARALLEL.SEQUENCE_PARALLEL: {config.MODEL.TYPE} has no"
                    " ring-attention path (mFormerV1 only)"
                )
            self.model = self.model.clone(ring_mesh=self.mesh)
            logger.info(
                f"Sequence parallelism: attention rings over the "
                f"{int(self.mesh.shape['model'])}-way model axis"
            )
        pp_stages = int(config.PARALLEL.get("PIPELINE", {}).get("STAGES", 1))
        if pp_stages > 1:
            # GPipe pipeline over the model axis (parallel/pipeline.py):
            # the RoPE towers' blocks spread one stage per device;
            # microbatched activations ppermute along ICI. Param trees (and
            # checkpoints) are identical to the sequential path — stacking
            # happens inside the jitted forward.
            model_axis = int(self.mesh.shape.get("model", 1))
            if model_axis != pp_stages:
                raise ValueError(
                    f"PARALLEL.PIPELINE.STAGES={pp_stages} requires "
                    f"PARALLEL.MESH.MODEL={pp_stages} (the stage count IS "
                    f"the model-axis size; mesh has {model_axis})"
                )
            sharding_mode = str(
                config.PARALLEL.get("PARAM_SHARDING", "replicated")
            )
            if sharding_mode in ("tp", "ep"):
                raise ValueError(
                    f"PARALLEL.PIPELINE and PARAM_SHARDING='{sharding_mode}'"
                    " both claim the model axis; use 'replicated' or 'fsdp'"
                    " with pipelining"
                )
            if bool(config.PARALLEL.get("SEQUENCE_PARALLEL", False)):
                raise ValueError(
                    "PARALLEL.PIPELINE and PARALLEL.SEQUENCE_PARALLEL both "
                    "claim the model axis; pick one"
                )
            if not hasattr(self.model, "pipeline_mesh"):
                raise ValueError(
                    f"PARALLEL.PIPELINE: {config.MODEL.TYPE} has no "
                    "pipelined tower path (mFormerV1 only)"
                )
            micro = int(
                config.PARALLEL.PIPELINE.get("MICROBATCHES", 0)
            ) or pp_stages
            self.model = self.model.clone(
                pipeline_mesh=self.mesh,
                pipeline_microbatches=micro,
                pipeline_batch_axis="data"
                if int(self.mesh.shape.get("data", 1)) > 1 else None,
            )
            s4 = int(self.model.rope_depths[1])
            logger.info(
                f"Pipeline parallelism: stage-3 tower over {pp_stages} "
                f"stages, {micro} microbatches"
                + ("" if s4 % pp_stages == 0 else
                   f" (stage-4 depth {s4} not divisible — runs sequential)")
            )
        from linnaeus_tpu.optim import build_group_schedules

        self.group_schedules = build_group_schedules(
            config, total_steps, self.steps_per_epoch
        )
        self.lr_schedule = self.group_schedules["default"]
        rng = jax.random.PRNGKey(int(config.MISC.SEED))
        meta_dim = total_meta_dim(config)
        init_images = jnp.zeros(
            (2, *self._img_hw(), int(config.MODEL.IN_CHANS)),
            resolve_compute_dtype(config),
        )
        init_aux = jnp.zeros((2, meta_dim), jnp.float32) if meta_dim else None
        variables = jax.jit(self.model.init)(rng, init_images, init_aux)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        n_params = sum(p.size for p in jax.tree.leaves(params))
        logger.info(f"Model params: {n_params:,}")

        # pretrained init (MODEL.PRETRAINED* — torch ckpt conversion, with
        # sparse upcycling into MoE banks; reference: checkpoint.py:513
        # load_pretrained in main.py's build sequence). Auto-resume wins:
        # a checkpoint in the output dir means this run already trained past
        # init, so pretrained weights must not clobber it.
        if config.MODEL.get("PRETRAINED") or config.MODEL.get(
            "PRETRAINED_CONVNEXT"
        ) or config.MODEL.get("PRETRAINED_ROPEVIT"):
            if bool(config.TRAIN.AUTO_RESUME) and ckpt.auto_resume_helper(
                self.ckpt_dir
            ):
                logger.info(
                    "MODEL.PRETRAINED set but an auto-resume checkpoint "
                    "exists — skipping pretrained init (resume wins)"
                )
            else:
                from linnaeus_tpu.utils.pretrained import load_pretrained

                params, batch_stats = load_pretrained(
                    config, self.model, params, batch_stats
                )
                params = jax.tree.map(jnp.asarray, params)
                if batch_stats is not None:
                    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
        self.tx = build_optimizer(
            config, self.lr_schedule, params=params,
            group_schedules=self.group_schedules,
        )

        init_weights = list(config.LOSS.GRAD_WEIGHTING.TASK.INIT_WEIGHTS or [])
        if not init_weights and (
            str(config.LOSS.GRAD_WEIGHTING.TASK.INIT_STRATEGY) == "inverse_density"
        ):
            dens = self.bundle["processor"].task_label_density
            vals = [
                1.0 / max(dens.get(t, {}).get("train", dens.get(t, {}).get("all", 1.0)), 1e-3)
                for t in self.task_keys
            ]
            init_weights = vals
        self.ema_enabled = bool(config.TRAIN.get("EMA", {}).get("ENABLED", False))
        self.ema_eval = self.ema_enabled and bool(
            config.TRAIN.EMA.get("EVAL", True)
        )
        self.state = create_train_state(
            self.model, params, self.tx,
            num_tasks=len(self.task_keys),
            rng=jax.random.fold_in(rng, 1),
            init_task_weights=init_weights if init_weights else None,
            batch_stats=batch_stats,
            ema=self.ema_enabled,
        )
        sharding_mode = str(config.PARALLEL.get("PARAM_SHARDING", "replicated"))
        if sharding_mode in ("fsdp", "tp", "ep"):
            # fsdp: shard each param's largest divisible axis along the data
            # axis. tp: Megatron column/row-parallel over the model axis.
            # ep: MoE expert banks over the model axis (expert parallelism).
            # Optimizer state follows via the same tree structure either way.
            from linnaeus_tpu.parallel.mesh import PARAM_SHARDING_FNS

            if sharding_mode in ("tp", "ep") and self.mesh.devices.shape[1] == 1:
                raise ValueError(
                    f"PARAM_SHARDING='{sharding_mode}' with "
                    "PARALLEL.MESH.MODEL=1: the model axis has one device, "
                    "so nothing would shard — set PARALLEL.MESH.MODEL > 1"
                )
            param_shardings = PARAM_SHARDING_FNS[sharding_mode](
                self.mesh, self.state.params
            )
            sharded_params = jax.tree.map(
                lambda p, s: jax.device_put(p, s),
                self.state.params, param_shardings,
            )
            # optimizer state re-inits on the sharded params, so its moments
            # inherit the param shardings; small leaves replicate.
            # batch_stats (BatchNorm, mFormerV0) are per-channel vectors —
            # replicate them too: leaving them process-local would make the
            # first jitted step fail on a multi-host mesh (mixed global/local
            # arrays).
            repl = replicated_sharding(self.mesh)
            self.state = self.state.replace(
                params=sharded_params,
                opt_state=self.tx.init(sharded_params),
                step=jax.device_put(self.state.step, repl),
                rng=jax.device_put(self.state.rng, repl),
                gradnorm=jax.tree.map(
                    lambda x: jax.device_put(x, repl), self.state.gradnorm
                ),
                batch_stats=(
                    jax.tree.map(
                        lambda x: jax.device_put(x, repl),
                        self.state.batch_stats,
                    )
                    if self.state.batch_stats is not None
                    else None
                ),
                # EMA mirrors the params tree -> identical shardings
                ema_params=(
                    jax.tree.map(
                        lambda p, s: jax.device_put(p, s),
                        self.state.ema_params, param_shardings,
                    )
                    if self.state.ema_params is not None
                    else None
                ),
            )
        else:
            self.state = replicate(self.state, self.mesh)

        # ---------------- losses & steps
        self.train_criteria, self.val_criteria = prepare_loss_functions(
            config, self.num_classes, self.taxonomy_tree
        )
        self.meta_dim = meta_dim
        self.chunk_bounds = tuple(compute_meta_chunk_bounds(config))
        self.bounds_by_name = compute_meta_chunk_bounds_by_name(config)
        mix = config.SCHEDULE.MIX
        if list(mix.LEVEL_SWITCH_STEPS or []) or list(
            mix.LEVEL_SWITCH_EPOCHS or []
        ):
            # reference parity: scheduled group-level switching is explicitly
            # unsupported there too (main.py:483-491 raises the same way)
            raise NotImplementedError(
                "SCHEDULE.MIX.LEVEL_SWITCH_STEPS/EPOCHS are not supported; "
                "use a fixed GROUP_LEVELS priority list"
            )
        mix_cfg = MixConfig(
            mixup_alpha=float(mix.MIXUP.ALPHA),
            cutmix_alpha=float(mix.CUTMIX.ALPHA),
            cutmix_minmax=(
                tuple(float(v) for v in mix.CUTMIX.MINMAX)
                if mix.CUTMIX.MINMAX else None
            ),
            mixup_enabled=bool(mix.MIXUP.ENABLED),
            cutmix_enabled=bool(mix.CUTMIX.ENABLED),
            exclude_null=bool(mix.EXCLUDE_NULL_SAMPLES),
            null_task_keys=tuple(mix.NULL_TASK_KEYS or []),
            chunk_bounds=self.chunk_bounds,
        )
        # AutoAugment/jitter/erase fused into the jitted step when
        # AUG.SINGLE_AUG_DEVICE='device' (the TPU-native default); the 'cpu'
        # path is wired into the loader by build_loaders (reference:
        # aug/factory.py:14-44 device dispatch).
        augment_fn = None
        if str(config.AUG.SINGLE_AUG_DEVICE) == "device":
            from linnaeus_tpu.data.augmentation.autoaugment import (
                AugmentationPipelineFactory,
            )

            augment_fn = AugmentationPipelineFactory.create(config)
            if augment_fn is not None:
                logger.info(
                    "On-device augmentation enabled: policy="
                    f"{config.AUG.AUTOAUG.POLICY!r} jitter="
                    f"{config.AUG.AUTOAUG.COLOR_JITTER} erase="
                    f"{config.AUG.RANDOM_ERASE.PROB}"
                )
        from linnaeus_tpu.train.step import make_preprocess_fn

        self._mix_cfg = mix_cfg
        self._augment_fn = augment_fn
        self._preprocess = make_preprocess_fn(
            mix_cfg, has_meta=meta_dim > 0, num_classes=self.num_classes,
            augment_fn=augment_fn,
        )
        self._build_train_step()
        null_tasks = ()
        if bool(config.METRICS.get("TRACK_NULL_VS_NON_NULL", False)):
            null_tasks = tuple(
                t for t in config.METRICS.NULL_VS_NON_NULL_TASKS
                if t in self.task_keys
            )
        subset_bins = None
        taxa_selectors = None
        proc = self.bundle.get("processor")
        if bool(config.METRICS.get("TRACK_RARITY", False)) and proc is not None:
            subset_bins = {
                t: b for t in self.task_keys
                if (b := proc.rarity_class_bins(t)) is not None
            }
        if proc is not None and getattr(proc, "taxa_subsets", None):
            taxa_selectors = proc.taxa_subset_selectors()
        self._eval_step = jax.jit(
            make_eval_step(
                self.val_criteria, self.task_keys,
                has_meta=meta_dim > 0, num_classes=self.num_classes,
                null_tasks=null_tasks, subset_bins=subset_bins,
                taxa_selectors=taxa_selectors,
            )
        )

        # ---------------- GradNorm
        gw = config.LOSS.GRAD_WEIGHTING.TASK
        self._gradnorm_update = None
        if str(gw.TYPE) == "gradnorm" and bool(gw.get("GRADNORM_ENABLED", True)):
            # The gradnorm re-forward may use a different remat setting than
            # normal steps (reference: TRAIN.GRADIENT_CHECKPOINTING
            # .ENABLED_GRADNORM_STEPS vs ENABLED_NORMAL_STEPS,
            # train.py:94-112). Flax modules are stateless, so a second
            # module instance with the gradnorm remat flag applies the SAME
            # params.
            gc = config.TRAIN.GRADIENT_CHECKPOINTING
            gn_ckpt = bool(gc.get("ENABLED_GRADNORM_STEPS", False))
            if gn_ckpt != bool(gc.get("ENABLED_NORMAL_STEPS", False)):
                gcfg = config.clone()
                gcfg.defrost()
                gcfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = gn_ckpt
                gcfg.freeze()
                gradnorm_model = build_model(
                    gcfg, self.num_classes, self.taxonomy_tree
                )
                if getattr(self.model, "ring_mesh", None) is not None:
                    # keep the gradnorm re-forward on the same ring-attention
                    # path as normal steps (same memory envelope under SP)
                    gradnorm_model = gradnorm_model.clone(
                        ring_mesh=self.model.ring_mesh
                    )
            else:
                gradnorm_model = self.model

            def apply_fn(params, images, meta, deterministic=True,
                         gradnorm_mode=True, batch_stats=None):
                variables = {"params": params}
                if batch_stats is not None:
                    variables["batch_stats"] = batch_stats
                # training=True: the gradnorm re-forward differentiates a
                # deterministic forward — exactly the case where fused-MLP
                # tracer-sniffing is blind under jax.checkpoint; the explicit
                # flag routes the training channel unconditionally
                return gradnorm_model.apply(
                    variables, images, meta,
                    deterministic=deterministic, gradnorm_mode=gradnorm_mode,
                    training=True,
                )

            from linnaeus_tpu.utils.param_filters import resolve_gradnorm_exclude

            exclude_cfg = resolve_gradnorm_exclude(gw)
            trunk_filter = lambda params: trunk_mask_from_exclude(  # noqa: E731
                params, exclude_cfg
            )
            update = make_gradnorm_update_fn(
                apply_fn,
                self.train_criteria,
                self.task_keys,
                trunk_filter,
                alpha=float(gw.ALPHA),
                zero_aux_info=bool(gw.ZERO_AUX_INFO),
                use_linear_heads=bool(gw.USE_LINEAR_HEADS_FOR_GRADNORM_REFORWARD),
                accum_steps=max(int(gw.get("GRADNORM_ACCUM_STEPS", 1) or 1), 1),
            )
            if check_debug_flag(config, "DEBUG.LOSS.GRADNORM_MEMORY"):
                logger.debug(
                    "[GRADNORM_MEMORY] re-forward config: "
                    f"accum_steps={gw.get('GRADNORM_ACCUM_STEPS', 1)} "
                    f"remat={gn_ckpt} zero_aux={gw.ZERO_AUX_INFO} "
                    f"linear_heads={gw.USE_LINEAR_HEADS_FOR_GRADNORM_REFORWARD}"
                )

            train_accum = max(int(config.TRAIN.ACCUMULATION_STEPS), 1)

            def gradnorm_step(state, batch, scalars):
                # Re-forward the SAME collated batch the train step consumed
                # (reference: gradient_weighting.py:367-430): regenerate the
                # step's preprocess randomness (the train step that processed
                # this batch already incremented state.step, hence -1) and
                # re-derive the mixed/augmented/meta-masked tensors. Under
                # gradient accumulation the train step preprocesses each
                # microbatch with fold_in(r_pre, i) — mirror that split so
                # mixing partners and augmentation draws match exactly.
                from linnaeus_tpu.train.step import train_step_rngs

                batch = dict(batch)
                batch["_scalars"] = scalars
                r_pre, _ = train_step_rngs(state.rng, state.step - 1)
                if train_accum == 1:
                    images, targets, meta, _ = self._preprocess(batch, r_pre)
                else:
                    from linnaeus_tpu.train.step import split_microbatches

                    stacked = split_microbatches(batch, train_accum)
                    imgs_l, tgts_l, meta_l = [], [], []
                    for i in range(train_accum):
                        mb = jax.tree.map(lambda x: x[i], stacked)
                        mb["_scalars"] = scalars
                        im, tg, me, _ = self._preprocess(
                            mb, jax.random.fold_in(r_pre, i)
                        )
                        imgs_l.append(im)
                        tgts_l.append(tg)
                        meta_l.append(me)
                    images = jnp.concatenate(imgs_l)
                    targets = {
                        t: jnp.concatenate([tg[t] for tg in tgts_l])
                        for t in tgts_l[0]
                    }
                    meta = (
                        jnp.concatenate(meta_l)
                        if meta_l[0] is not None else None
                    )
                new_gn, metrics = update(
                    state.params, images, targets,
                    meta, state.gradnorm, state.batch_stats,
                )
                return state.replace(gradnorm=new_gn), metrics

            self._gradnorm_update = jax.jit(gradnorm_step)

        self._last_batch = None
        if config.DATA.AUTOBATCH.get("ENABLED", False):
            self._run_autobatch()
        if config.DATA.AUTOBATCH.get("ENABLED_VAL", False):
            self._run_autobatch_val()
        # callbacks run before resources close during drain(), so the
        # emergency checkpoint lands before the loaders shut down
        self.shutdown.register_callback(self._on_preempt)

    def _build_train_step(self) -> None:
        """(Re)jit the train step. Called at build time and again after
        AutoBatch rebuilds the LR schedule (the step closes over
        self.lr_schedule for the lr metric). The input state is donated so
        XLA aliases new params/opt-state onto the old buffers."""
        from linnaeus_tpu.train.step import make_train_step

        cfg = self.config
        self._train_step = jax.jit(
            make_train_step(
                self.train_criteria,
                self.task_keys,
                self._mix_cfg,
                clip_grad=float(cfg.TRAIN.CLIP_GRAD or 0.0),
                accumulation_steps=max(int(cfg.TRAIN.ACCUMULATION_STEPS), 1),
                phase1_mask_null=bool(cfg.TRAIN.PHASE1_MASK_NULL_LOSS),
                has_meta=self.meta_dim > 0,
                lr_schedule=self.lr_schedule,
                num_classes=self.num_classes,
                augment_fn=self._augment_fn,
                moe_aux_weight=(
                    float(cfg.MODEL.MOE.get("AUX_LOSS_WEIGHT", 0.01))
                    if bool(cfg.MODEL.get("MOE", {}).get("ENABLED", False))
                    else 0.0
                ),
                moe_z_weight=(
                    float(cfg.MODEL.MOE.get("ROUTER_Z_LOSS_WEIGHT", 0.001))
                    if bool(cfg.MODEL.get("MOE", {}).get("ENABLED", False))
                    else 0.0
                ),
                ema_decay=(
                    float(cfg.TRAIN.EMA.DECAY) if self.ema_enabled else 0.0
                ),
            ),
            donate_argnums=(0,),
        )

    def _rebuild_optimizer_for_batch(self, old_bs: int, new_bs: int,
                                     total_steps: int) -> None:
        """AutoBatch changed the effective batch AFTER schedules/optimizer
        were built: re-scale the LR for the new batch (relative factor — the
        absolute scaling already ran once), rebuild the per-group schedules
        against the new total_steps, rebuild the optimizer, and re-init its
        state on the existing (already mesh-placed) params."""
        from linnaeus_tpu.optim import build_group_schedules, build_optimizer

        factor = new_bs / max(old_bs, 1)
        self.config.defrost()
        self.config.LR_SCHEDULER.BASE_LR = (
            float(self.config.LR_SCHEDULER.BASE_LR) * factor
        )
        self.config.freeze()
        logger.info(
            f"AutoBatch: re-scaled base LR by x{factor:.3f} -> "
            f"{self.config.LR_SCHEDULER.BASE_LR:.3e}; rebuilding schedules "
            f"for total_steps={total_steps}"
        )
        self.group_schedules = build_group_schedules(
            self.config, total_steps, self.steps_per_epoch
        )
        self.lr_schedule = self.group_schedules["default"]
        self.tx = build_optimizer(
            self.config, self.lr_schedule, params=self.state.params,
            group_schedules=self.group_schedules,
        )
        self.state = self.state.replace(
            tx=self.tx, opt_state=self.tx.init(self.state.params)
        )
        self._build_train_step()

    def _run_autobatch(self) -> None:
        """Compiled-memory AutoBatch (reference: main.py:1249-1396): probe the
        largest train batch under TARGET_MEMORY_FRACTION, then rebuild the
        loaders and schedule around it. Deterministic across hosts (no
        broadcast needed)."""
        from linnaeus_tpu.train.autobatch import auto_find_batch_size
        from linnaeus_tpu.train.step import ScheduleScalars

        ab = self.config.DATA.AUTOBATCH
        hw = self._img_hw()
        n_data = self.mesh.devices.shape[0]

        def make_batch(bs: int):
            return {
                "images": jnp.zeros((bs, *hw, int(self.config.MODEL.IN_CHANS))),
                "targets": {
                    t: jnp.zeros((bs,), jnp.int32) for t in self.task_keys
                },
                "aux": jnp.zeros((bs, self.meta_dim)) if self.meta_dim else None,
                "group_ids": jnp.zeros((bs,), jnp.int32),
            }

        scalars = ScheduleScalars.zeros(self.meta_dim)

        def compile_step(bs: int):
            return self._train_step.lower(
                self.state, make_batch(bs), scalars
            ).compile()

        found = auto_find_batch_size(
            compile_step,
            target_memory_fraction=float(ab.TARGET_MEMORY_FRACTION),
            min_batch_size=int(ab.MIN_BATCH_SIZE),
            max_batch_size=int(ab.MAX_BATCH_SIZE),
            multiple_of=max(n_data, 1),
        )
        if found == int(self.config.DATA.BATCH_SIZE):
            return
        logger.info(f"AutoBatch: updating DATA.BATCH_SIZE -> {found}")
        old_bs = int(self.config.DATA.BATCH_SIZE)
        self.config.defrost()
        self.config.DATA.BATCH_SIZE = found
        self.config.freeze()
        device_put = lambda b: shard_batch(b, self.mesh)  # noqa: E731
        self.train_loader, self.val_loader = build_loaders(
            self.config, self.bundle, device_put_fn=device_put
        )
        self.steps_per_epoch = max(len(self.train_loader), 1)
        total_steps = self.steps_per_epoch * int(self.config.TRAIN.EPOCHS)
        self.progress.expected_total_steps = total_steps
        self.config.defrost()
        self.config.LR_SCHEDULER.TOTAL_STEPS = total_steps
        self.config.freeze()
        # schedules/optimizer were built for the old batch and total_steps
        self._rebuild_optimizer_for_batch(old_bs, found, total_steps)

    def _run_autobatch_val(self) -> None:
        """Eval-side AutoBatch (reference: DATA.AUTOBATCH.ENABLED_VAL,
        utils/autobatch.py:111-173 val mode): probe the largest validation
        batch by AOT-compiling the eval step — no optimizer state or grads,
        so the result is typically several times the train batch."""
        from linnaeus_tpu.train.autobatch import auto_find_batch_size

        ab = self.config.DATA.AUTOBATCH
        hw = self._img_hw()
        n_data = self.mesh.devices.shape[0]

        def make_batch(bs: int):
            return {
                "images": jnp.zeros((bs, *hw, int(self.config.MODEL.IN_CHANS))),
                "targets": {
                    t: jnp.zeros((bs,), jnp.int32) for t in self.task_keys
                },
                "aux": jnp.zeros((bs, self.meta_dim)) if self.meta_dim else None,
                "group_ids": jnp.zeros((bs,), jnp.int32),
            }

        def compile_step(bs: int):
            return self._eval_step.lower(
                self.state,
                make_batch(bs),
                jnp.asarray(False),
                jnp.zeros((self.meta_dim,), jnp.float32),
            ).compile()

        found = auto_find_batch_size(
            compile_step,
            target_memory_fraction=float(ab.TARGET_MEMORY_FRACTION_VAL),
            min_batch_size=int(ab.MIN_BATCH_SIZE_VAL),
            max_batch_size=int(ab.MAX_BATCH_SIZE_VAL),
            multiple_of=max(n_data, 1),
        )
        if found == int(self.config.DATA.BATCH_SIZE_VAL):
            return
        logger.info(f"AutoBatch(val): updating DATA.BATCH_SIZE_VAL -> {found}")
        self.config.defrost()
        self.config.DATA.BATCH_SIZE_VAL = found
        self.config.freeze()
        device_put = lambda b: shard_batch(b, self.mesh)  # noqa: E731
        self.train_loader, self.val_loader = build_loaders(
            self.config, self.bundle, device_put_fn=device_put
        )

    def _img_hw(self):
        s = self.config.MODEL.IMG_SIZE
        return (s, s) if isinstance(s, int) else tuple(s)

    # ------------------------------------------------------------ resume
    def try_resume(self) -> bool:
        if not self.config.TRAIN.AUTO_RESUME:
            return False
        self.ckpt_writer.wait()  # a same-process save must finalize first
        latest = ckpt.auto_resume_helper(self.ckpt_dir)
        if latest is None:
            return False
        self.state, sidecar = ckpt.load_checkpoint(latest, self.state)
        if "training_progress" in sidecar and not bool(
            self.config.TRAIN.PRESERVE_CHECKPOINT_SCHEDULE
        ):
            self.progress.load_state_dict(sidecar["training_progress"])
        if "metrics" in sidecar:
            self.metrics.load_state_dict(sidecar["metrics"])
        if "ops_schedule" in sidecar:
            self.ops_schedule.load_state_dict(sidecar["ops_schedule"])
        if "early_stop" in sidecar:
            self.early_stop.load_state_dict(sidecar["early_stop"])
        # reference parity: resume advertises itself in the config BEFORE
        # any wandb init reads config.to_dict() (checkpoint.py:927,946)
        self.config.defrost()
        self.config.TRAIN.START_EPOCH = int(self.progress.current_epoch)
        self.config.LOADING_FROM_CHECKPOINT = True
        self.config.freeze()
        # wandb run continuity (reference: checkpoint.py:1051-1054)
        run_id = sidecar.get("wandb_run_id")
        if run_id and self.wandb_run is None and is_main_process():
            from linnaeus_tpu.metrics.step_logger import initialize_wandb

            self.wandb_run = initialize_wandb(self.config, resume_run_id=run_id)
            self.step_logger.wandb_run = self.wandb_run
        elif self.wandb_run is not None:
            # a run initialized pre-resume snapshotted the config without
            # the resume stamp — push the update (needs ALLOW_WANDB_VAL_CHANGE)
            try:
                self.wandb_run.config.update(
                    {"LOADING_FROM_CHECKPOINT": True,
                     "RESUMED_AT_EPOCH": int(self.progress.current_epoch)},
                    allow_val_change=bool(
                        self.config.TRAIN.get("ALLOW_WANDB_VAL_CHANGE", False)
                    ),
                )
            except Exception as e:  # wandb policy rejection is non-fatal
                logger.warning(f"wandb config update on resume failed: {e}")
        logger.info(f"Resumed from {latest} at step {self.progress.global_step}")
        # replay validations that were pending when interrupted
        if self.progress.has_pending_validations() and not self.skip_validation:
            logger.info(
                f"Replaying {len(self.progress.pending_validations)} pending validations"
            )
            self._run_pending_validations()
        return True

    # ---------------------------------------------------------- preemption
    def _on_preempt(self) -> None:
        """Shutdown-registry callback: on SIGUSR1/SIGTERM save an emergency
        checkpoint (incl. pending-validation queue + partial indices) and tag
        the wandb run preempting, then rely on AUTO_RESUME (reference:
        utils/hpc_utils.py:16-43 + main.py signal handlers)."""
        if not self.shutdown.preempted.is_set():
            return
        from linnaeus_tpu.utils.hpc import mark_wandb_preempting

        mark_wandb_preempting(self.wandb_run)
        try:
            self._save_checkpoint()
            self.ckpt_writer.wait()  # durable before the process dies
            logger.warning("Preemption checkpoint saved")
        except Exception as e:
            logger.error(f"Preemption checkpoint failed: {e}")

    # ------------------------------------------------------------ training
    def train(self) -> None:
        self.try_resume()
        start_epoch = self.progress.current_epoch
        for epoch in range(start_epoch, int(self.config.TRAIN.EPOCHS)):
            self.progress.start_epoch(epoch)
            self._train_one_epoch(epoch)
            if self.shutdown.preempted.is_set():
                logger.warning("Preempted; stopping training loop")
                return

            at_boundary = True
            if self.ops_schedule.should_save_checkpoint(at_boundary):
                self._save_checkpoint()
            self._queue_epoch_validations(at_boundary)
            self._run_pending_validations()

            current_lr = float(self.lr_schedule(self.progress.global_step))
            if self.ops_schedule.should_stop_early(
                current_lr=current_lr, early_stop_state=self.early_stop
            ):
                logger.info("Early stopping triggered")
                break
            self.progress.end_epoch()
        self._save_checkpoint()
        self.ckpt_writer.wait()
        self._sync_outputs()
        logger.info("Training complete")

    def _sync_outputs(self) -> None:
        """End-of-training remote sync (reference: utils/backblaze.py:10-54,
        invoked from main.py at training end). No-op unless
        ENV.OUTPUT.BUCKET.ENABLED."""
        if not is_main_process():
            return
        if not self.config.ENV.OUTPUT.BUCKET.get("ENABLED", False):
            return
        from linnaeus_tpu.utils.remote_sync import sync_to_bucket

        try:
            sync_to_bucket(self.config, self.config.ENV.OUTPUT.DIRS.EXP_BASE)
        except Exception as e:
            logger.error(f"Remote output sync failed: {e}")

    def _train_one_epoch(self, epoch: int) -> None:
        cfg = self.config
        level = self.ops_schedule.get_mixup_group_level()
        if level in self.bundle["train_dataset"].labels.group_ids:
            self.train_loader.set_group_level(level)
        self.train_loader.set_epoch(epoch)
        self.metrics.reset_phase(MetricsTracker.TRAIN)

        epoch_start = time.perf_counter()
        n_seen = 0
        self.step_logger.start_epoch(len(self.train_loader))
        prof = self.config.DEBUG.PROFILE
        prof_start = int(prof.get("START_STEP", 0) or 0)
        prof_end = int(prof.get("END_STEP", 0) or 0)
        for batch in self.train_loader:
            step = self.progress.global_step
            if prof_end > prof_start and step == prof_start and is_main_process():
                jax.profiler.start_trace(
                    f"{self.config.ENV.OUTPUT.DIRS.LOGS}/profile"
                )
            if prof_end > prof_start and step == prof_end and is_main_process():
                jax.profiler.stop_trace()
                logger.info(f"Wrote jax profiler trace for steps "
                            f"{prof_start}-{prof_end}")
            combo = None
            if self.ops_schedule.get_partial_mask_enabled(step):
                combo = self.ops_schedule.pick_partial_mask_combo()
            scalars = ScheduleScalars.from_ops_schedule(
                self.ops_schedule, step, self.meta_dim,
                combo_mask=combo_to_mask(combo, self.bounds_by_name, self.meta_dim),
            )
            self.state, step_metrics = self._train_step(self.state, batch, scalars)
            self._last_batch = batch
            self.progress.increment_step()
            n_seen += int(batch["images"].shape[0])
            if check_debug_flag(self.config, "DEBUG.TRAINING_LOOP"):
                host = jax.device_get(step_metrics)
                logger.debug(
                    f"[TRAINING_LOOP] step={self.progress.global_step} "
                    f"loss={float(host.get('loss', 0.0)):.6f} "
                    f"grad_norm={float(host.get('grad_norm_pre_clip', 0.0)):.4f} "
                    f"mixed_frac={float(host.get('mixed_frac', 0.0)):.3f}"
                )
            if check_debug_flag(self.config, "DEBUG.SCHEDULING"):
                logger.debug(
                    f"[SCHEDULING] step={step} mix_prob={float(scalars.mix_prob):.4f} "
                    f"meta_mask={float(scalars.meta_mask_prob):.4f} "
                    f"partial_mask={float(scalars.partial_mask_prob):.4f} "
                    f"null_mask={float(scalars.null_mask_prob):.4f} combo={combo}"
                )

            if self.ops_schedule.should_update_gradnorm(self.progress.global_step):
                if self._gradnorm_update is not None:
                    self.state, gn_metrics = self._gradnorm_update(
                        self.state, batch, scalars
                    )
                    gn_host = jax.device_get(gn_metrics)
                    if check_debug_flag(
                        self.config, "DEBUG.LOSS.VERBOSE_GRADNORM_LOGGING"
                    ) or check_debug_flag(
                        self.config, "DEBUG.LOSS.GRADNORM_METRICS"
                    ):
                        logger.debug(
                            f"[GRADNORM] step={self.progress.global_step} "
                            + " ".join(
                                f"{k}={np.asarray(v).tolist()}"
                                for k, v in sorted(gn_host.items())
                            )
                        )
                    self.metrics.log_gradnorm(self.progress.global_step, gn_host)
                    if is_main_process():
                        flat = {}
                        for k, v in gn_host.items():
                            if np.ndim(v) == 0:
                                flat[k] = float(v)
                            else:
                                for i, t in enumerate(self.task_keys):
                                    flat[f"{k}/{t}"] = float(np.asarray(v)[i])
                        self.step_logger._emit_wandb(
                            flat, self.progress.global_step
                        )

            gstep = self.progress.global_step
            if self.ops_schedule.should_log_to_console(
                gstep
            ) or self.ops_schedule.should_log_to_wandb(gstep):
                host = jax.device_get(step_metrics)
                lr_now = float(self.lr_schedule(gstep))
                self.consistency.check_step(gstep, loss=float(host.get("loss", 0.0)))
                # phase-keyed train metrics (reference: MetricsTracker train
                # phase, utils/metrics/tracker.py). Sampled at log cadence —
                # a per-step device_get would sync the host every step.
                self.metrics.update(
                    MetricsTracker.TRAIN,
                    {k: float(v) for k, v in host.items() if np.ndim(v) == 0},
                )
                if is_main_process():
                    self.step_logger.log_step_metrics(gstep, epoch, host, lr=lr_now)
                    sched_values = {
                        "meta_mask_prob": self.ops_schedule.get_meta_mask_prob(gstep),
                        "mix_prob": self.ops_schedule.get_mixup_prob(gstep),
                        "null_mask_prob": self.ops_schedule.get_null_mask_prob(gstep),
                    }
                    # per-group LR export (reference:
                    # multi_lr_scheduler.py:177 get_lr_dict_for_wandb)
                    lr_groups = lr_dict_for_logging(
                        self.config, self.lr_schedule, gstep,
                        group_schedules=self.group_schedules,
                    )
                    if len(lr_groups) > 1:
                        sched_values.update(lr_groups)
                    self.step_logger.log_schedule_values(gstep, sched_values)
            if check_debug_flag(
                self.config, "DEBUG.METRICS.AVG_METER_VERBOSE_ACTUAL_META_STATS"
            ) and batch.get("aux") is not None:
                from linnaeus_tpu.data.collate import compute_actual_meta_stats

                stats = jax.device_get(
                    compute_actual_meta_stats(batch["aux"], self.chunk_bounds)
                )
                logger.debug(
                    f"[ACTUAL_META_STATS] step={gstep} "
                    + " ".join(f"{k}={float(v):.3f}" for k, v in stats.items())
                )
            if self.ops_schedule.should_log_lr(gstep):
                self.metrics.log_lr(gstep, float(self.lr_schedule(gstep)))
            if self.ops_schedule.should_log_pipeline_metrics(gstep) and is_main_process():
                self.step_logger.log_pipeline_metrics(
                    gstep, self.train_loader.pipeline_metrics()
                )

            limit = int(self.config.DEBUG.EARLY_EXIT_AFTER_N_OPTIMIZER_STEPS or 0)
            if limit and self.progress.global_step >= limit:
                logger.info(f"DEBUG early exit after {limit} steps")
                break
            if self.shutdown.preempted.is_set():
                break

        elapsed = time.perf_counter() - epoch_start
        batch_size = max(int(self.config.DATA.BATCH_SIZE), 1)
        self.consistency.check_epoch_boundary(
            epoch, n_seen // batch_size, self.steps_per_epoch
        )
        if is_main_process():
            logger.info(
                f"epoch {epoch} done: {n_seen} samples in {elapsed:.1f}s "
                f"({n_seen / max(elapsed, 1e-9):.1f} img/s)"
            )

    # ---------------------------------------------------------- validation
    def _queue_epoch_validations(self, at_boundary: bool) -> None:
        if self.skip_validation or self.val_loader is None:
            return
        if self.ops_schedule.should_validate(at_boundary):
            self.progress.queue_validation(TrainingStage.VALIDATION_NORMAL)
        if self.ops_schedule.should_validate_mask_meta(at_boundary):
            self.progress.queue_validation(TrainingStage.VALIDATION_MASK_META)
        if self.ops_schedule.should_validate_partial_mask_meta(at_boundary):
            for combo in self.ops_schedule.get_partial_mask_meta_whitelist():
                self.progress.queue_validation(
                    TrainingStage.VALIDATION_PARTIAL_MASK_META, partial_combo=combo
                )
        if self.ops_schedule.should_run_exhaustive_final_validation():
            comps = self.ops_schedule.get_exhaustive_meta_components()
            import itertools

            for r in range(1, len(comps) + 1):
                for combo in itertools.combinations(comps, r):
                    self.progress.queue_validation(
                        TrainingStage.VALIDATION_PARTIAL_MASK_META,
                        partial_combo=list(combo),
                    )

    def _run_pending_validations(self) -> None:
        # Peek-run-pop (not pop-run): if the process dies mid-validation the
        # entry is still queued in the checkpointed TrainingProgress and the
        # resume path replays it from its partial index (reference:
        # training_progress.py:61-130, main.py:1439-1727).
        while self.progress.has_pending_validations():
            entry = self.progress.pending_validations[0]
            stage = TrainingStage(entry["stage"])
            combo = entry.get("partial_combo")
            self._validate(stage, combo)
            if self.shutdown.preempted.is_set():
                return  # entry stays queued; partial indices checkpointed
            self.progress.pop_validation()

    def _validate(self, stage: TrainingStage, combo: list[str] | None = None) -> None:
        if self.val_loader is None:
            return
        # EXPERIMENT.LOG_LEVEL_VALIDATION: temporarily switch the main
        # logger's level for the duration of a validation pass (reference:
        # main.py:1899-1908). DEBUG.VERBOSE_DEBUG wins — a run that forced
        # DEBUG everywhere must not be demoted exactly where it is debugging.
        val_level = self.config.EXPERIMENT.get("LOG_LEVEL_VALIDATION")
        prev_level = None
        if val_level and not bool(self.config.DEBUG.get("VERBOSE_DEBUG", False)):
            import logging as _logging

            prev_level = logger.level
            logger.setLevel(getattr(_logging, str(val_level).upper(), logger.level))
        try:
            self._validate_inner(stage, combo)
        finally:
            if prev_level is not None:
                logger.setLevel(prev_level)

    def _validate_inner(
        self, stage: TrainingStage, combo: list[str] | None = None
    ) -> None:
        self.progress.enter_stage(stage)
        if stage == TrainingStage.VALIDATION_NORMAL:
            phase = MetricsTracker.VAL
            mask_meta, combo_mask = False, np.zeros((self.meta_dim,), np.float32)
        elif stage == TrainingStage.VALIDATION_MASK_META:
            phase = MetricsTracker.VAL_MASK_META
            mask_meta, combo_mask = True, np.zeros((self.meta_dim,), np.float32)
        else:
            phase = MetricsTracker.partial_mask_phase(combo or [])
            mask_meta = False
            combo_mask = combo_to_mask(combo, self.bounds_by_name, self.meta_dim)

        self.metrics.reset_phase(phase)
        # mid-validation resume: restore partial accumulators if this pass
        # was interrupted (reference: training_progress.py partial indices)
        partial = self.progress.partial_validation_indices.get(phase)
        if isinstance(partial, dict):
            start_index = int(partial.get("next_index", 0))
            totals = dict(partial.get("totals", {}))
            count = float(partial.get("count", 0.0))
            chain_correct = float(partial.get("chain_correct", 0.0))
            chain_total = float(partial.get("chain_total", 0.0))
            if start_index:
                logger.info(
                    f"[{phase}] resuming validation at batch {start_index}"
                )
        else:
            start_index = 0
            totals = {}
            count = 0.0
            chain_correct = 0.0
            chain_total = 0.0
        # TRAIN.EMA.EVAL: validate on the EMA weights (same pytree structure
        # as the raw state, so the jitted eval step does not recompile)
        eval_state = self.state
        if self.ema_eval and self.state.ema_params is not None:
            eval_state = self.state.replace(params=self.state.ema_params)
        for i, batch in enumerate(self.val_loader):
            if i < start_index:
                continue
            if self.shutdown.preempted.is_set():
                # partial accumulators stay in TrainingProgress for resume
                return
            metrics, outputs = self._eval_step(
                eval_state, batch, jnp.asarray(mask_meta), jnp.asarray(combo_mask)
            )
            host = jax.device_get(metrics)
            if check_debug_flag(self.config, "DEBUG.VALIDATION_METRICS"):
                logger.debug(
                    f"[VALIDATION_METRICS] {phase} batch={i} "
                    + " ".join(
                        f"{k}={float(v):.4f}" for k, v in sorted(host.items())
                    )
                )
            from linnaeus_tpu.train.validation import accumulate_batch

            totals, count = accumulate_batch(totals, count, host)
            targets_soft = {
                t: jax.nn.one_hot(v, self.num_classes[t]) if v.ndim == 1 else v
                for t, v in batch["targets"].items()
            }
            cc, ct = chain_accuracy_counts(outputs, targets_soft, self.task_keys)
            chain_correct += float(jax.device_get(cc))
            chain_total += float(jax.device_get(ct))
            self.progress.partial_validation_indices[phase] = {
                "next_index": i + 1,
                "totals": dict(totals),
                "count": count,
                "chain_correct": chain_correct,
                "chain_total": chain_total,
            }
        self.progress.partial_validation_indices.pop(phase, None)

        if count == 0:
            return
        from linnaeus_tpu.train.validation import summarize_totals

        summary = summarize_totals(totals, count, chain_correct, chain_total)
        self.metrics.update(phase, summary, n=count)
        if check_debug_flag(self.config, "DEBUG.DUMP_METRICS") and is_main_process():
            import json

            dump_path = (
                f"{self.config.ENV.OUTPUT.DIRS.LOGS}/metrics_state_"
                f"{self.progress.global_step}.json"
            )
            with open(dump_path, "w") as f:
                json.dump(self.metrics.state_dict(), f, indent=2, default=str)
            logger.debug(f"[DUMP_METRICS] wrote {dump_path}")
        improved = self.metrics.check_best(phase, self.progress.current_epoch)
        if phase == MetricsTracker.VAL:
            self.early_stop.update(
                self._early_stop_metric(summary), self.progress.global_step,
                min_delta=self.config.TRAIN.EARLY_STOP.get("MIN_DELTA"),
            )
        if is_main_process():
            logger.info(
                f"[{phase}] step {self.progress.global_step} "
                + " ".join(f"{k}={v:.4f}" for k, v in sorted(summary.items()))
                + (" (best)" if improved else "")
            )
            self.step_logger.log_validation(
                self.progress.global_step, phase, summary
            )
        self.progress.enter_stage(TrainingStage.TRAINING)

    def _early_stop_metric(self, summary: dict[str, float]) -> float:
        """Resolve TRAIN.EARLY_STOP.METRIC against the validation summary
        (reference: ops_schedule.py:216 pulls the configured metric from the
        tracker, e.g. 'val_loss' or 'val_chain_accuracy'). Accepts the
        reference's 'val_*' / 'val/*' prefixes; summary keys themselves
        ('loss', 'chain_accuracy', 'acc1/taxa_L10') also work."""
        name = self.early_stop.metric_name
        key = name
        for prefix in ("val_", "val/"):
            if key.lower().startswith(prefix):
                key = key[len(prefix):]
                break
        if key in summary:
            return float(summary[key])
        if not getattr(self, "_warned_es_metric", False):
            self._warned_es_metric = True
            logger.warning(
                f"TRAIN.EARLY_STOP.METRIC={name!r} not found in validation "
                f"summary (keys: {sorted(summary)}); falling back to loss"
            )
        fallback = summary.get("loss", float("inf"))
        return float(-fallback if self.early_stop.higher_is_better else fallback)

    # ---------------------------------------------------------- checkpoint
    def _save_checkpoint(self) -> None:
        # With fsdp/tp param sharding the params span non-addressable devices
        # on a multi-host mesh: device_get would raise, and every process must
        # participate in the Orbax save. Pass the sharded state through.
        sharded = (
            str(self.config.PARALLEL.get("PARAM_SHARDING", "replicated"))
            in ("fsdp", "tp", "ep")
        )
        if not sharded and not is_main_process():
            return
        state_to_save = self.state if sharded else jax.device_get(self.state)
        if check_debug_flag(self.config, "DEBUG.CHECKPOINT"):
            n_leaves = len(jax.tree.leaves(state_to_save.params))
            logger.debug(
                f"[CHECKPOINT] saving step={int(jax.device_get(self.state.step))} "
                f"param_leaves={n_leaves} sharded={sharded} dir={self.ckpt_dir}"
            )
        metric = self.metrics.get(MetricsTracker.VAL, "loss")
        wandb_run_id = getattr(self.wandb_run, "id", None) if self.wandb_run else None
        path = self.ckpt_writer.save(
            self.ckpt_dir,
            state_to_save,
            training_progress=self.progress,
            metrics_state=self.metrics.state_dict(),
            ops_schedule_state=self.ops_schedule.state_dict(),
            early_stop_state=self.early_stop.state_dict(),
            config_dump=self.config.dump(),
            metric_value=metric,
            wandb_run_id=wandb_run_id,
        )
        if not is_main_process():
            return path
        if self.config.ENV.OUTPUT.BUCKET.get("SYNC_ON_CHECKPOINT", False):
            self.ckpt_writer.wait()  # upload only finalized files
            self._sync_outputs()
        sc = self.config.SCHEDULE.CHECKPOINT
        ckpt.manage_checkpoints(
            self.ckpt_dir,
            keep_top_n=int(sc.KEEP_TOP_N),
            keep_last_n=int(sc.KEEP_LAST_N),
            higher_is_better=False,
            # the just-saved checkpoint may still be flushing async; it
            # faces retention on the next save
            protect=[path],
        )
        return path
