"""Optimizer & schedule tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from linnaeus_tpu.configuration import get_default_config
from linnaeus_tpu.optim import (
    ademamix,
    apply_lr_scaling,
    build_optimizer,
    build_schedule,
    muon,
    wsd_schedule,
    zeropower_via_newtonschulz5,
)


def test_newton_schulz_orthogonalizes():
    g = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    o = np.asarray(zeropower_via_newtonschulz5(g, steps=5), dtype=np.float32)
    gram = o.T @ o
    # singular values pushed toward 1 (bf16 NS => loose tolerance)
    s = np.linalg.svd(o, compute_uv=False)
    assert s.max() < 1.6 and s.min() > 0.4
    # direction preserved: sign pattern correlates with original
    assert np.sign((g * o).sum()) == 1.0
    del gram


def test_muon_step_reduces_quadratic():
    w = jnp.ones((8, 8))
    opt = muon(0.1, momentum=0.9)
    state = opt.init(w)

    def loss(w):
        return 0.5 * jnp.sum(w**2)

    for _ in range(10):
        g = jax.grad(loss)(w)
        updates, state = opt.update(g, state, w)
        w = optax.apply_updates(w, updates)
    assert float(loss(w)) < 0.5 * 64


def test_muon_passthrough_for_1d():
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    opt = muon(0.1)
    state = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(g, state, params)
    # bias gets plain momentum-sgd (no orthogonalization crash)
    assert updates["b"].shape == (4,)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_ademamix_converges():
    w = jnp.array([5.0, -3.0])
    opt = ademamix(0.5, alpha=2.0)
    state = opt.init(w)

    def loss(w):
        return jnp.sum(w**2)

    for _ in range(50):
        g = jax.grad(loss)(w)
        updates, state = opt.update(g, state, w)
        w = optax.apply_updates(w, updates)
    assert float(loss(w)) < 1.0


def test_cosine_schedule_shape():
    cfg = get_default_config()
    cfg.LR_SCHEDULER.NAME = "cosine"
    cfg.LR_SCHEDULER.BASE_LR = 1e-3
    cfg.LR_SCHEDULER.MIN_LR = 1e-5
    cfg.LR_SCHEDULER.WARMUP_STEPS = 10
    cfg.LR_SCHEDULER.WARMUP_EPOCHS = 0
    cfg.LR_SCHEDULER.WARMUP_LR = 1e-6
    sched = build_schedule(cfg, total_steps=110, steps_per_epoch=0)
    assert float(sched(0)) == pytest.approx(1e-6, rel=1e-3)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(110)) == pytest.approx(1e-5, rel=1e-2)


def test_wsd_schedule_phases():
    sched = wsd_schedule(
        1e-3, 1e-5, total_steps=100, warmup_steps=10,
        stable_fraction=0.5, decay_fraction=0.4,
    )
    # stable plateau after warmup
    assert float(sched(20)) == pytest.approx(1e-3, rel=1e-4)
    assert float(sched(50)) == pytest.approx(1e-3, rel=1e-4)
    # decays toward min
    assert float(sched(95)) < 2e-4


def test_lr_scaling():
    cfg = get_default_config()
    # reference_lr * bs / reference_bs
    # scales the configured BASE_LR (1e-4 default) by effective/reference
    assert apply_lr_scaling(cfg, 1024) == pytest.approx(1e-4 * 1024 / 512)


def test_multi_group_optimizer():
    cfg = get_default_config()
    cfg.OPTIMIZER.PARAMETER_GROUPS.ENABLED = True
    cfg.OPTIMIZER.PARAMETER_GROUPS.merge_from_other_cfg(
        type(cfg)(
            {
                "HEADS": {
                    "OPTIMIZER": "adamw",
                    "LR_MULTIPLIER": 10.0,
                    "WEIGHT_DECAY": 0.0,
                    "FILTER": {"TYPE": "name", "PATTERNS": ["head"]},
                }
            },
            new_allowed=True,
        )
    )
    params = {"backbone": {"kernel": jnp.ones((4, 4))}, "head": {"kernel": jnp.ones((4, 2))}}
    opt = build_optimizer(cfg, 1e-3, params=params)
    state = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(g, state, params)
    # heads get 10x LR => 10x larger updates (both adamw, same normalized grad)
    ratio = float(jnp.abs(updates["head"]["kernel"]).mean() / jnp.abs(updates["backbone"]["kernel"]).mean())
    assert ratio == pytest.approx(10.0, rel=0.05)


def test_lr_dict_for_logging_groups():
    from linnaeus_tpu.optim import lr_dict_for_logging

    cfg = get_default_config()
    assert lr_dict_for_logging(cfg, lambda s: 1e-3, 5) == {"lr/default": 1e-3}
    cfg.OPTIMIZER.PARAMETER_GROUPS.ENABLED = True
    cfg.OPTIMIZER.PARAMETER_GROUPS.merge_from_other_cfg(
        type(cfg)(
            {
                "HEADS": {
                    "LR_MULTIPLIER": 10.0,
                    "FILTER": {"TYPE": "name", "PATTERNS": ["head"]},
                }
            },
            new_allowed=True,
        )
    )
    d = lr_dict_for_logging(cfg, lambda s: 1e-3, 5)
    assert d["lr/HEADS"] == pytest.approx(1e-2)
    assert d["lr/default"] == pytest.approx(1e-3)


def test_filtering_report():
    from linnaeus_tpu.utils.param_filters import filtering_report, name_filter

    params = {
        "backbone": {"kernel": jnp.ones((4, 4))},
        "head": {"kernel": jnp.ones((4, 2))},
    }
    report = filtering_report(params, {"HEADS": name_filter(["head"])})
    assert "[HEADS] 1 tensors, 8 params" in report
    assert "[default] 1 tensors, 16 params" in report
    assert "head/kernel" in report


def test_independent_per_group_schedulers():
    """VERDICT #6: each parameter group can carry its own scheduler type and
    warmup (reference: lr_schedulers/build.py:291 _build_multi_scheduler);
    a cosine default + wsd group produce distinct logged LRs and distinct
    update trajectories."""
    from linnaeus_tpu.optim import build_group_schedules, lr_dict_for_logging

    cfg = get_default_config()
    cfg.LR_SCHEDULER.NAME = "cosine"
    cfg.LR_SCHEDULER.BASE_LR = 1e-3
    cfg.LR_SCHEDULER.MIN_LR = 1e-5
    cfg.LR_SCHEDULER.WARMUP_STEPS = 10
    cfg.LR_SCHEDULER.WARMUP_EPOCHS = 0
    cfg.LR_SCHEDULER.PARAMETER_GROUPS.ENABLED = True
    cfg.LR_SCHEDULER.PARAMETER_GROUPS.merge_from_other_cfg(
        type(cfg)(
            {
                "HEADS": {
                    "NAME": "wsd",
                    "BASE_LR": 5e-3,
                    "WARMUP_STEPS": 0,
                    "STABLE_DURATION_FRACTION": 0.8,
                    "DECAY_DURATION_FRACTION": 0.2,
                }
            },
            new_allowed=True,
        )
    )
    total = 1000
    scheds = build_group_schedules(cfg, total)
    assert set(scheds) == {"default", "HEADS"}
    # wsd group: flat at BASE_LR through the stable phase
    assert float(scheds["HEADS"](100)) == pytest.approx(5e-3)
    assert float(scheds["HEADS"](700)) == pytest.approx(5e-3)
    assert float(scheds["HEADS"](999)) < 5e-3  # decay phase
    # cosine default: decays monotonically post-warmup
    assert float(scheds["default"](500)) < float(scheds["default"](20))

    # distinct per-group LRs in the wandb export
    cfg.OPTIMIZER.PARAMETER_GROUPS.ENABLED = True
    cfg.OPTIMIZER.PARAMETER_GROUPS.merge_from_other_cfg(
        type(cfg)(
            {
                "HEADS": {
                    "LR_MULTIPLIER": 1.0,
                    "FILTER": {"TYPE": "name", "PATTERNS": ["head"]},
                }
            },
            new_allowed=True,
        )
    )
    d = lr_dict_for_logging(cfg, scheds["default"], 100, group_schedules=scheds)
    assert d["lr/HEADS"] == pytest.approx(5e-3)
    assert d["lr/HEADS"] != pytest.approx(d["lr/default"])

    # the optimizer actually consumes the per-group schedules: at step 100
    # the head (wsd, 5e-3) update dwarfs the backbone (cosine ~1e-3)
    params = {
        "backbone": {"kernel": jnp.ones((4, 4))},
        "head": {"kernel": jnp.ones((4, 2))},
    }
    opt = build_optimizer(
        cfg, scheds["default"], params=params, group_schedules=scheds
    )
    state = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    # advance to step 100 so the schedules diverge
    for _ in range(100):
        _, state = opt.update(g, state, params)
    updates, _ = opt.update(g, state, params)
    ratio = float(
        jnp.abs(updates["head"]["kernel"]).mean()
        / jnp.abs(updates["backbone"]["kernel"]).mean()
    )
    expected = 5e-3 / float(scheds["default"](100))
    assert ratio == pytest.approx(expected, rel=0.05)


def test_muon_strict_rejects_odd_ranks():
    """OPTIMIZER.MUON.STRICT raises on params Muon can't orthogonalize
    (reference optimizers/muon.py:115-121)."""
    import pytest

    from linnaeus_tpu.optim.muon import muon

    good = {"w": jnp.ones((8, 4)), "b": jnp.ones((4,))}
    tx = muon(1e-3, strict=True)
    tx.init(good)  # 2D + 1D: fine
    bad = {"cls": jnp.ones((1, 1, 8))}
    with pytest.raises(ValueError, match="strict"):
        muon(1e-3, strict=True).init(bad)
    muon(1e-3, strict=False).init(bad)  # non-strict passes through


def test_resolve_gradnorm_exclude_fallback():
    """Legacy EXCLUDE_PATTERNS kicks in when EXCLUDE_CONFIG has no filters
    (reference utils/unified_filtering.py:167-184)."""
    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.utils.param_filters import resolve_gradnorm_exclude

    gw = get_default_config().LOSS.GRAD_WEIGHTING.TASK
    # default EXCLUDE_CONFIG has filters -> used as-is
    assert resolve_gradnorm_exclude(gw)["FILTERS"] == gw.EXCLUDE_CONFIG.FILTERS
    gw.EXCLUDE_CONFIG.FILTERS = []
    gw.EXCLUDE_PATTERNS = ["head", "meta_"]
    resolved = resolve_gradnorm_exclude(gw)
    assert resolved["FILTERS"][0]["PATTERNS"] == ["head", "meta_"]
