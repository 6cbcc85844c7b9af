"""Checkpointing: Orbax train-state PyTree + JSON sidecars.

Reference parity: utils/checkpoint.py:513-1332. A checkpoint bundles the
TrainState (params/opt-state/step/GradNorm/rng) plus JSON sidecars for
TrainingProgress (incl. pending-validation replay state), metrics tracker,
OpsSchedule RNG, config snapshot, and the wandb run id. Retention implements
KEEP_TOP_N (by metric) + KEEP_LAST_N (checkpoint.py:1202) and
``auto_resume_helper`` finds the latest checkpoint in a directory
(checkpoint.py:1308).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from linnaeus_tpu.utils.logging import get_main_logger

logger = get_main_logger()

SIDECAR_NAME = "sidecar.json"
STATE_DIR = "state"


def _ckpt_name(step: int) -> str:
    return f"checkpoint_step_{step:010d}"


class CheckpointWriter:
    """Checkpoint writer with optional async array flush.

    With ``async_save`` the Orbax save returns as soon as device arrays are
    snapshotted to host memory and the (de)serialization + disk write runs
    on a background thread — the train loop resumes immediately instead of
    stalling for the full write (the reference blocks its hot loop on
    ``torch.save``, utils/checkpoint.py:513+). One save may be outstanding
    at a time; ``wait()`` must be called before reading a just-written
    checkpoint, before process exit, and before uploading the directory.
    Orbax finalizes atomically (tmp-dir rename), so a crash mid-flush
    leaves no ``state`` dir and ``auto_resume_helper`` skips the partial
    checkpoint.
    """

    def __init__(self, async_save: bool = False):
        self.async_save = bool(async_save)
        if self.async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.StandardCheckpointer()

    def save(
        self,
        checkpoint_dir: str,
        state,
        training_progress=None,
        metrics_state: dict | None = None,
        ops_schedule_state: dict | None = None,
        early_stop_state: dict | None = None,
        config_dump: str | None = None,
        wandb_run_id: str | None = None,
        metric_value: float | None = None,
    ) -> str:
        """Save one checkpoint; returns its path."""
        self.wait()  # one outstanding async save at a time
        step = int(jax.device_get(state.step))
        path = os.path.abspath(os.path.join(checkpoint_dir, _ckpt_name(step)))
        os.makedirs(checkpoint_dir, exist_ok=True)

        self._ckptr.save(
            os.path.join(path, STATE_DIR), _as_pytree(state), force=True
        )

        if jax.process_index() != 0:
            # multi-host (e.g. FSDP-sharded) saves: every process
            # participates in the Orbax array write above; sidecar JSON is
            # written once
            return path

        sidecar: dict[str, Any] = {
            "step": step,
            "metric_value": metric_value,
            "wandb_run_id": wandb_run_id,
        }
        if training_progress is not None:
            sidecar["training_progress"] = training_progress.state_dict()
        if metrics_state is not None:
            sidecar["metrics"] = metrics_state
        if ops_schedule_state is not None:
            sidecar["ops_schedule"] = ops_schedule_state
        if early_stop_state is not None:
            # patience/best must survive resume or a run that should have
            # stopped keeps training (reference: early_stop_state serialized
            # with the checkpoint, utils/checkpoint.py)
            sidecar["early_stop"] = early_stop_state
        with open(os.path.join(path, SIDECAR_NAME), "w") as f:
            json.dump(sidecar, f, indent=2, default=_json_default)
        if config_dump is not None:
            with open(os.path.join(path, "config.yaml"), "w") as f:
                f.write(config_dump)
        logger.info(
            f"Saved checkpoint at step {step} -> {path}"
            + (" (flushing async)" if self.async_save else "")
        )
        return path

    def wait(self) -> None:
        """Block until any outstanding async write has finalized."""
        wait = getattr(self._ckptr, "wait_until_finished", None)
        if wait is not None:
            wait()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def save_checkpoint(
    checkpoint_dir: str,
    state,
    training_progress=None,
    metrics_state: dict | None = None,
    ops_schedule_state: dict | None = None,
    early_stop_state: dict | None = None,
    config_dump: str | None = None,
    wandb_run_id: str | None = None,
    metric_value: float | None = None,
) -> str:
    """One-shot synchronous save (tools/tests; the Trainer holds a
    CheckpointWriter so epoch saves can flush asynchronously)."""
    writer = CheckpointWriter(async_save=False)
    try:
        return writer.save(
            checkpoint_dir,
            state,
            training_progress=training_progress,
            metrics_state=metrics_state,
            ops_schedule_state=ops_schedule_state,
            early_stop_state=early_stop_state,
            config_dump=config_dump,
            wandb_run_id=wandb_run_id,
            metric_value=metric_value,
        )
    finally:
        writer.close()


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


def _as_pytree(state):
    """TrainState -> pure-array pytree for Orbax (drop static fields)."""
    tree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "gradnorm": {
            "task_weights": state.gradnorm.task_weights,
            "initial_losses": state.gradnorm.initial_losses,
            "has_initted": state.gradnorm.has_initted,
        },
        "rng": state.rng,
    }
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    return tree


def _on_disk_keys(state_path: str) -> set[str] | None:
    """Top-level pytree keys actually stored in a checkpoint, or None if
    Orbax metadata is unavailable (old/foreign checkpoint — fall back to
    the strict template restore). Parses the checkpoint's ``_METADATA``
    tree_metadata, whose entries are per-leaf key chains."""
    try:
        with open(os.path.join(state_path, "_METADATA")) as f:
            md = json.load(f)
        keys: set[str] = set()
        for leaf in md["tree_metadata"].values():
            keys.add(leaf["key_metadata"][0]["key"])
        return keys or None
    except Exception:
        return None


def jnp_copy(x):
    """Sharding-preserving on-device copy that is a GENUINE new buffer.

    Used to seed EMA from restored params when EMA was enabled after the
    checkpoint was written. ``jnp.array`` would fetch to host — raising on
    multi-host restores (non-addressable global arrays) and losing the
    restore sharding on single-host meshes. ``device_put`` with the source's
    own sharding stays on-device but is a NO-OP that ALIASES the buffer
    (measured: the first donated train step after an EMA-toggle-on resume
    then dies with "buffer was previously donated"). A jitted ``jnp.copy``
    is an SPMD computation: it runs on the arrays where they live, keeps
    the input sharding, works on non-addressable global arrays, and its
    output is always a fresh buffer.

    The jit wrapper is a module-level singleton: a fresh ``jax.jit`` per
    call would defeat the jit cache and pay one trace+compile round trip
    per param leaf when mapped over a full tree (seconds locally, far
    worse on a remote backend where each compile is an RPC).
    """
    import jax.numpy as jnp

    if hasattr(x, "sharding"):
        return _jit_copy()(x)
    return jnp.array(x)


_JIT_COPY = None


def _jit_copy():
    global _JIT_COPY
    if _JIT_COPY is None:
        import jax
        import jax.numpy as jnp

        _JIT_COPY = jax.jit(jnp.copy)
    return _JIT_COPY


def load_checkpoint(path: str, state_template):
    """Restore (state, sidecar) from a checkpoint directory.

    ``state_template`` is a TrainState with the right structure (e.g. freshly
    initialized) used as the abstract target.

    ``ema_params`` may be toggled across a resume: Orbax's restore raises on
    ANY template/on-disk tree-structure mismatch, so the template is adapted
    to the checkpoint's actual top-level keys — resuming with EMA newly
    enabled seeds the EMA from the restored params; resuming with EMA
    disabled drops the stored EMA buffers.
    """
    from linnaeus_tpu.loss.gradnorm import GradNormState

    template = _as_pytree(state_template)
    state_path = os.path.join(os.path.abspath(path), STATE_DIR)
    with ocp.StandardCheckpointer() as ckptr:
        disk_keys = _on_disk_keys(state_path)
        if disk_keys is not None:
            if "ema_params" in template and "ema_params" not in disk_keys:
                logger.warning(
                    "Checkpoint has no ema_params (EMA was enabled after it "
                    "was written); seeding EMA from the restored params"
                )
                del template["ema_params"]
            elif "ema_params" in disk_keys and "ema_params" not in template:
                logger.warning(
                    "Checkpoint carries ema_params but EMA is disabled; "
                    "the stored EMA buffers are dropped"
                )
                # same tree/shape/dtype as params by construction
                # (train/state.py: ema_params starts as a copy of params)
                template["ema_params"] = jax.tree.map(lambda x: x,
                                                      template["params"])
        restored = ckptr.restore(
            state_path,
            jax.tree.map(ocp.utils.to_shape_dtype_struct, template),
        )
    if state_template.ema_params is not None and "ema_params" not in restored:
        restored["ema_params"] = jax.tree.map(jnp_copy, restored["params"])
    if state_template.ema_params is None:
        restored.pop("ema_params", None)
    state = state_template.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        gradnorm=GradNormState(
            task_weights=restored["gradnorm"]["task_weights"],
            initial_losses=restored["gradnorm"]["initial_losses"],
            has_initted=restored["gradnorm"]["has_initted"],
        ),
        rng=restored["rng"],
        batch_stats=restored.get("batch_stats", state_template.batch_stats),
        ema_params=restored.get("ema_params", state_template.ema_params),
    )
    sidecar_path = os.path.join(path, SIDECAR_NAME)
    sidecar = {}
    if os.path.exists(sidecar_path):
        with open(sidecar_path) as f:
            sidecar = json.load(f)
    logger.info(f"Loaded checkpoint from {path} (step {sidecar.get('step')})")
    return state, sidecar


def list_checkpoints(checkpoint_dir: str) -> list[str]:
    if not os.path.isdir(checkpoint_dir):
        return []
    entries = [
        os.path.join(checkpoint_dir, d)
        for d in sorted(os.listdir(checkpoint_dir))
        if d.startswith("checkpoint_step_")
        and os.path.isdir(os.path.join(checkpoint_dir, d))
    ]
    return entries


def auto_resume_helper(checkpoint_dir: str) -> str | None:
    """Latest FINALIZED checkpoint path in dir, or None (checkpoint.py:1308).

    A directory whose ``state`` subdir is absent is a save that was cut off
    mid-flight (async flush interrupted by a crash/preemption before Orbax's
    atomic finalize rename) — resume from the previous complete one.
    """
    for c in reversed(list_checkpoints(checkpoint_dir)):
        if os.path.isdir(os.path.join(c, STATE_DIR)):
            return c
        logger.warning(f"Skipping incomplete checkpoint (no state dir): {c}")
    return None


def manage_checkpoints(
    checkpoint_dir: str,
    keep_top_n: int = 0,
    keep_last_n: int = 0,
    higher_is_better: bool = True,
    protect: list[str] | None = None,
) -> list[str]:
    """Apply retention policy; returns deleted paths (checkpoint.py:1202).

    Keeps the union of the N best (by sidecar metric_value) and the N most
    recent; with both 0, keeps everything. ``protect`` paths are never
    deleted — the Trainer passes the checkpoint whose async flush may still
    be in flight (it faces retention on the next save instead).
    """
    if keep_top_n <= 0 and keep_last_n <= 0:
        return []
    ckpts = list_checkpoints(checkpoint_dir)
    keep: set[str] = {os.path.abspath(p) for p in (protect or [])}
    if keep_last_n > 0:
        keep.update(ckpts[-keep_last_n:])
    if keep_top_n > 0:
        scored = []
        for c in ckpts:
            try:
                with open(os.path.join(c, SIDECAR_NAME)) as f:
                    mv = json.load(f).get("metric_value")
            except (OSError, json.JSONDecodeError):
                mv = None
            if mv is not None:
                scored.append((mv, c))
        scored.sort(key=lambda x: x[0], reverse=higher_is_better)
        keep.update(c for _, c in scored[:keep_top_n])
    keep = {os.path.abspath(p) for p in keep}
    deleted = []
    for c in ckpts:
        if os.path.abspath(c) not in keep:
            shutil.rmtree(c, ignore_errors=True)
            deleted.append(c)
            logger.info(f"Retention: deleted {c}")
    return deleted
