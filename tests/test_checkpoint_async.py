"""Async checkpoint writer: background flush, finalize-before-read,
retention protection, and incomplete-checkpoint resume skipping."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

import linnaeus_tpu.utils.checkpoint as ckpt
from linnaeus_tpu.train.state import create_train_state


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(3)(x)


@pytest.fixture()
def tiny_state():
    model = _Tiny()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))["params"]
    return create_train_state(
        model, params, optax.sgd(0.1), num_tasks=2, rng=jax.random.PRNGKey(1)
    )


def test_async_save_matches_sync_after_wait(tmp_path, tiny_state):
    sync_dir = str(tmp_path / "sync")
    async_dir = str(tmp_path / "async")
    ckpt.save_checkpoint(sync_dir, tiny_state)

    writer = ckpt.CheckpointWriter(async_save=True)
    path = writer.save(async_dir, tiny_state, metric_value=1.5)
    writer.wait()
    assert os.path.isdir(os.path.join(path, ckpt.STATE_DIR))

    restored, sidecar = ckpt.load_checkpoint(path, tiny_state)
    assert sidecar["metric_value"] == 1.5
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.device_get(restored.params),
        jax.device_get(tiny_state.params),
    )
    # a second save through the same writer (waits internally) also lands
    writer.save(async_dir, tiny_state.replace(step=tiny_state.step + 1))
    writer.close()
    assert len(ckpt.list_checkpoints(async_dir)) == 2


def test_retention_protects_in_flight_path(tmp_path, tiny_state):
    d = str(tmp_path / "ck")
    paths = []
    for step in range(3):
        s = tiny_state.replace(step=jnp.asarray(step))
        paths.append(ckpt.save_checkpoint(d, s, metric_value=float(step)))
    # keep_last_n=1 would delete paths[0] and paths[1]; protecting paths[0]
    # (as if its async flush were still running) keeps it alive
    deleted = ckpt.manage_checkpoints(
        d, keep_last_n=1, protect=[paths[0]]
    )
    assert paths[1] in deleted
    assert os.path.isdir(paths[0]) and os.path.isdir(paths[2])


def test_auto_resume_skips_unfinalized(tmp_path, tiny_state):
    d = str(tmp_path / "ck")
    complete = ckpt.save_checkpoint(d, tiny_state)
    # a later checkpoint whose async flush never finalized: sidecar written,
    # no state dir (Orbax's atomic rename never happened)
    partial = os.path.join(d, "checkpoint_step_0000000099")
    os.makedirs(partial)
    with open(os.path.join(partial, ckpt.SIDECAR_NAME), "w") as f:
        f.write("{}")
    assert ckpt.auto_resume_helper(d) == complete
