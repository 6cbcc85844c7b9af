"""Device augmentation tests: op semantics, policies, batched pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import linnaeus_tpu.data.augmentation.ops as A
from linnaeus_tpu.data.augmentation.autoaugment import (
    make_autoaugment,
    make_batched_augment,
    make_train_augment,
)
from linnaeus_tpu.data.augmentation.policies import get_policy


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))


def test_invert(img):
    out = A.invert(img, 5.0, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), 1.0 - np.asarray(img), atol=1e-6)


def test_solarize_threshold(img):
    out = np.asarray(A.solarize(img, 10.0, jax.random.PRNGKey(0)))  # threshold 0
    np.testing.assert_allclose(out, 1.0 - np.asarray(img), atol=1e-6)
    out0 = np.asarray(A.solarize(img, 0.0, jax.random.PRNGKey(0)))  # threshold 1
    np.testing.assert_allclose(out0, np.asarray(img), atol=1e-6)


def test_autocontrast_stretches(img):
    scaled = img * 0.4 + 0.3  # compress to [0.3, 0.7]
    out = np.asarray(A.autocontrast(scaled, 0.0, jax.random.PRNGKey(0)))
    assert out.min() == pytest.approx(0.0, abs=1e-5)
    assert out.max() == pytest.approx(1.0, abs=1e-5)


def test_equalize_flattens_histogram():
    # strongly skewed image -> equalized histogram should be far flatter
    rng = np.random.default_rng(1)
    skew = jnp.asarray((rng.uniform(0, 1, (32, 32, 3)) ** 3).astype(np.float32))
    out = np.asarray(A.equalize(skew, 0.0, jax.random.PRNGKey(0)))

    def flatness(x):  # std of the 10-bin histogram; lower = flatter
        h, _ = np.histogram(x, bins=10, range=(0, 1))
        return h.std()

    assert flatness(out[..., 0]) < flatness(np.asarray(skew)[..., 0]) / 3


def test_rotate_preserves_shape_and_range(img):
    out = np.asarray(A.rotate(img, 9.0, jax.random.PRNGKey(0)))
    assert out.shape == img.shape
    assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5
    assert not np.allclose(out, np.asarray(img))


def test_translate_moves_content():
    img = jnp.zeros((16, 16, 3)).at[8, 8, :].set(1.0)
    out = np.asarray(A.translate_x_rel(img, 10.0, jax.random.PRNGKey(0)))
    assert out[8, 8, 0] < 0.5  # peak moved away


def test_posterize_reduces_levels(img):
    out = np.asarray(A.posterize_increasing(img, 10.0, jax.random.PRNGKey(0)))
    # 4 bits => at most 16 distinct quantized values per channel
    assert len(np.unique(np.round(out[..., 0] * 255))) <= 16


def test_gaussian_blur_smooths(img):
    out = np.asarray(A.gaussian_blur_rand(img, 10.0, jax.random.PRNGKey(0)))
    # blurred image has lower local variance
    def tv(x):
        return np.abs(np.diff(x, axis=0)).mean()

    assert tv(out) < tv(np.asarray(img))


def test_policy_tables_resolve():
    for name in ("original", "originalr", "v0r", "3a", "hybrid_v0"):
        policy = get_policy(name)
        assert policy
        for sub in policy:
            for op_name, prob, mag in sub:
                assert op_name in A.OP_REGISTRY
                assert 0.0 <= prob <= 1.0
                assert 0 <= mag <= 10


def test_autoaugment_runs_and_varies(img):
    fn = jax.jit(make_autoaugment("original"))
    outs = [np.asarray(fn(img, jax.random.PRNGKey(s))) for s in range(6)]
    assert all(o.shape == img.shape for o in outs)
    # across several draws, at least some must modify the image and at least
    # two draws must disagree with each other
    changed = [not np.allclose(o, np.asarray(img)) for o in outs]
    assert any(changed)
    assert any(
        not np.allclose(outs[i], outs[j])
        for i in range(len(outs))
        for j in range(i + 1, len(outs))
    )


def test_batched_pipeline(img):
    single = make_train_augment("3a", color_jitter=0.2, random_erase_prob=0.5)
    batched = make_batched_augment(single)
    images = jnp.stack([img] * 8)
    out = np.asarray(batched(images, jax.random.PRNGKey(0)))
    assert out.shape == (8, 16, 16, 3)
    assert np.isfinite(out).all()
    # per-sample rngs => samples differ even with identical input
    assert not np.allclose(out[0], out[1])


# ----------------------------------------------------------- training wiring
def test_factory_returns_none_when_all_disabled():
    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.data.augmentation.autoaugment import (
        AugmentationPipelineFactory,
    )

    cfg = get_default_config()
    cfg.AUG.AUTOAUG.POLICY = ""
    cfg.AUG.AUTOAUG.COLOR_JITTER = 0.0
    cfg.AUG.RANDOM_ERASE.PROB = 0.0
    assert AugmentationPipelineFactory.create(cfg) is None
    cfg.AUG.AUTOAUG.POLICY = "3a"
    assert AugmentationPipelineFactory.create(cfg) is not None


def test_train_step_applies_augmentation():
    """Wiring regression (VERDICT: AutoAugment had zero call sites): with
    AUG policy '3a' fused into the step, augmented pixels differ from the
    no-aug step's pixels and the loss path still trains."""
    import optax

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.data.augmentation.autoaugment import (
        AugmentationPipelineFactory,
    )
    from linnaeus_tpu.data.collate import MixConfig
    from linnaeus_tpu.train.state import create_train_state
    from linnaeus_tpu.train.step import (
        ScheduleScalars,
        make_preprocess_fn,
        make_train_step,
        train_step_rngs,
    )

    cfg = get_default_config()
    cfg.AUG.AUTOAUG.POLICY = "3a"
    aug_fn = AugmentationPipelineFactory.create(cfg)
    assert aug_fn is not None

    tasks = ("t1",)
    nc = {"t1": 4}
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, images, meta=None, deterministic=False, **kw):
            x = images.mean(axis=(1, 2))
            return {"t1": nn.Dense(4)(x)}

    model = Tiny()
    images = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3))
    batch = {
        "images": images,
        "targets": {"t1": jnp.arange(4) % 4},
        "group_ids": jnp.zeros(4, jnp.int32),
        "_scalars": ScheduleScalars.zeros(0),
    }
    params = model.init(jax.random.PRNGKey(0), images)["params"]

    # augmented preprocess output differs from unaugmented
    pre_aug = make_preprocess_fn(
        MixConfig(mixup_enabled=False), has_meta=False, num_classes=nc,
        augment_fn=aug_fn,
    )
    pre_plain = make_preprocess_fn(
        MixConfig(mixup_enabled=False), has_meta=False, num_classes=nc,
    )
    r_pre, _ = train_step_rngs(jax.random.PRNGKey(7), 0)
    img_aug, _, _, _ = pre_aug(batch, r_pre)
    img_plain, _, _, _ = pre_plain(batch, r_pre)
    assert not np.allclose(np.asarray(img_aug), np.asarray(img_plain))

    # and the full train step with augmentation still trains
    from linnaeus_tpu.loss import soft_target_cross_entropy

    state = create_train_state(
        model, params, optax.sgd(0.1), num_tasks=1,
        rng=jax.random.PRNGKey(7),
    )
    step = jax.jit(make_train_step(
        {"t1": soft_target_cross_entropy}, tasks,
        MixConfig(mixup_enabled=False), has_meta=False, num_classes=nc,
        augment_fn=aug_fn,
    ))
    new_state, metrics = step(
        state, {k: v for k, v in batch.items() if k != "_scalars"},
        ScheduleScalars.zeros(0),
    )
    assert np.isfinite(float(metrics["loss"]))
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_random_erase_count_monotone():
    """COUNT=3 erases at least the pixels COUNT=1 does (same rng: the first
    rectangle is shared, extra rectangles only add)."""
    from linnaeus_tpu.data.augmentation.autoaugment import make_train_augment

    ones = jnp.ones((24, 24, 3), jnp.float32)
    rng = jax.random.PRNGKey(7)
    kw = dict(
        policy_name="", color_jitter=0.0, hflip_prob=0.0,
        random_erase_prob=1.0, random_erase_mode="const",
    )
    out1 = make_train_augment(random_erase_count=1, **kw)(ones, rng)
    out3 = make_train_augment(random_erase_count=3, **kw)(ones, rng)
    z1 = int(jnp.sum(out1 == 0.0))
    z3 = int(jnp.sum(out3 == 0.0))
    assert z1 > 0 and z3 >= z1


def test_cutmix_minmax_bounds_box_area():
    """CUTMIX.MINMAX rescales lam: with lam in [0.8, 0.9] the cut box covers
    at most ~20% of the image (reference selective_cutmix.py:202-204)."""
    from linnaeus_tpu.data.collate import MixConfig, selective_cutmix

    B, H, W = 8, 32, 32
    images = jnp.zeros((B, H, W, 3))
    donor = jnp.ones((B, H, W, 3))
    # interleave so each sample's partner is all-ones
    imgs = jnp.concatenate([images[:4], donor[:4]], axis=0)
    targets = {"t": jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 4)}
    gids = jnp.zeros((B,), jnp.int32)  # one big group
    cfg = MixConfig(cutmix_enabled=True, mixup_enabled=False,
                    cutmix_minmax=(0.8, 0.9))
    for seed in range(5):
        out, tgt, _, mask = selective_cutmix(
            imgs, targets, None, gids, jax.random.PRNGKey(seed), cfg
        )
        # pasted-box fraction = 1 - lam_adj <= 1 - 0.8 (+ integer slack)
        frac = float(jnp.mean(out[0] != imgs[0]))
        assert frac <= 0.25, frac
