"""Parameter EMA (TRAIN.EMA): in-jit recurrence correctness, eval-state
selection, checkpoint round-trip, and bundle export selection."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from linnaeus_tpu.loss import soft_target_cross_entropy
from linnaeus_tpu.data.collate import MixConfig
from linnaeus_tpu.train.state import create_train_state
from linnaeus_tpu.train.step import ScheduleScalars, make_train_step

from tests.test_train_step import TASKS, META_DIM, make_batch, tiny_model


@pytest.fixture(scope="module")
def ema_setup():
    model = tiny_model()
    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["aux"]
    )["params"]
    state = create_train_state(
        model, params, optax.adamw(1e-3), num_tasks=len(TASKS),
        rng=jax.random.PRNGKey(7), ema=True,
    )
    criteria = {t: soft_target_cross_entropy for t in TASKS}
    return model, state, batch, criteria


def test_ema_matches_manual_recurrence(ema_setup):
    """state.ema_params after N jitted steps equals the hand-rolled
    recurrence over the per-step params."""
    model, state, batch, criteria = ema_setup
    decay = 0.9
    step = jax.jit(
        make_train_step(
            criteria, TASKS, MixConfig(chunk_bounds=((0, 2), (2, 5))),
            clip_grad=5.0, ema_decay=decay,
        )
    )
    scalars = ScheduleScalars.zeros(META_DIM)
    manual = jax.device_get(state.params)
    for _ in range(3):
        state, _ = step(state, batch, scalars)
        p = jax.device_get(state.params)
        manual = jax.tree.map(
            lambda e, q: e * decay + (1 - decay) * q, manual, p
        )
    np.testing.assert_allclose(
        jax.tree.leaves(jax.device_get(state.ema_params))[0],
        jax.tree.leaves(manual)[0], rtol=1e-5, atol=1e-6,
    )
    # EMA trails the raw params (decay < 1 keeps history)
    diff = jax.tree.map(
        lambda e, q: float(jnp.abs(e - q).max()),
        state.ema_params, state.params,
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_ema_disabled_keeps_none(ema_setup):
    model, _, batch, criteria = ema_setup
    params = model.init(
        jax.random.PRNGKey(1), batch["images"], batch["aux"]
    )["params"]
    state = create_train_state(
        model, params, optax.adamw(1e-3), num_tasks=len(TASKS),
        rng=jax.random.PRNGKey(3), ema=False,
    )
    step = jax.jit(
        make_train_step(
            criteria, TASKS, MixConfig(chunk_bounds=((0, 2), (2, 5))),
        )
    )
    state, _ = step(state, batch, ScheduleScalars.zeros(META_DIM))
    assert state.ema_params is None


def test_ema_checkpoint_round_trip(ema_setup, tmp_path):
    import linnaeus_tpu.utils.checkpoint as ckpt

    model, state, batch, criteria = ema_setup
    step = jax.jit(
        make_train_step(
            criteria, TASKS, MixConfig(chunk_bounds=((0, 2), (2, 5))),
            ema_decay=0.5,
        )
    )
    state, _ = step(state, batch, ScheduleScalars.zeros(META_DIM))
    path = ckpt.save_checkpoint(str(tmp_path / "ck"), jax.device_get(state))
    template = create_train_state(
        model, state.params, optax.adamw(1e-3), num_tasks=len(TASKS),
        rng=jax.random.PRNGKey(0), ema=True,
    )
    restored, _ = ckpt.load_checkpoint(path, template)
    np.testing.assert_array_equal(
        jax.tree.leaves(jax.device_get(restored.ema_params))[0],
        jax.tree.leaves(jax.device_get(state.ema_params))[0],
    )


def test_ema_toggle_across_resume(ema_setup, tmp_path):
    """Flipping TRAIN.EMA.ENABLED between save and resume must not crash
    the restore (Orbax raises on template/on-disk tree mismatch): enabling
    seeds the EMA from the restored params; disabling drops the buffers."""
    import linnaeus_tpu.utils.checkpoint as ckpt

    model, state, batch, criteria = ema_setup
    tx = optax.adamw(1e-3)

    # saved WITHOUT ema -> resumed WITH ema: seeded from restored params
    no_ema = create_train_state(
        model, state.params, tx, num_tasks=len(TASKS),
        rng=jax.random.PRNGKey(3), ema=False,
    )
    p1 = ckpt.save_checkpoint(str(tmp_path / "a"), jax.device_get(no_ema))
    with_ema_tmpl = create_train_state(
        model, state.params, tx, num_tasks=len(TASKS),
        rng=jax.random.PRNGKey(0), ema=True,
    )
    restored, _ = ckpt.load_checkpoint(p1, with_ema_tmpl)
    assert restored.ema_params is not None
    np.testing.assert_array_equal(
        jax.tree.leaves(jax.device_get(restored.ema_params))[0],
        jax.tree.leaves(jax.device_get(restored.params))[0],
    )
    # the seeded EMA must be a genuine copy, not an alias of params:
    # the production hot loop donates the state, and a donated buffer
    # referenced twice dies with "buffer was previously donated"
    # (jax.device_put(x, x.sharding) is an aliasing no-op — regression)
    donated_step = jax.jit(
        make_train_step(
            criteria, TASKS, MixConfig(chunk_bounds=((0, 2), (2, 5))),
            ema_decay=0.5,
        ),
        donate_argnums=(0,),
    )
    stepped_seeded, _ = donated_step(
        restored, batch, ScheduleScalars.zeros(META_DIM)
    )
    assert stepped_seeded.ema_params is not None

    # saved WITH ema -> resumed WITHOUT ema: buffers dropped, restore ok
    step = jax.jit(
        make_train_step(
            criteria, TASKS, MixConfig(chunk_bounds=((0, 2), (2, 5))),
            ema_decay=0.5,
        )
    )
    stepped, _ = step(state, batch, ScheduleScalars.zeros(META_DIM))
    p2 = ckpt.save_checkpoint(str(tmp_path / "b"), jax.device_get(stepped))
    no_ema_tmpl = create_train_state(
        model, state.params, tx, num_tasks=len(TASKS),
        rng=jax.random.PRNGKey(0), ema=False,
    )
    restored2, _ = ckpt.load_checkpoint(p2, no_ema_tmpl)
    assert restored2.ema_params is None
    np.testing.assert_array_equal(
        jax.tree.leaves(jax.device_get(restored2.params))[0],
        jax.tree.leaves(jax.device_get(stepped.params))[0],
    )


def test_reshard_carries_ema(ema_setup):
    from linnaeus_tpu.parallel.mesh import create_mesh, reshard_train_state

    model, state, batch, criteria = ema_setup
    mesh = create_mesh(devices=jax.devices()[:1])
    tx = optax.adamw(1e-3)
    moved = reshard_train_state(state, mesh, tx)
    assert moved.ema_params is not None
    np.testing.assert_array_equal(
        jax.tree.leaves(jax.device_get(moved.ema_params))[0],
        jax.tree.leaves(jax.device_get(state.ema_params))[0],
    )
