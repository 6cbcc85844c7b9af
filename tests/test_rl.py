"""RL abstention suite: rewards, verifier, provider, env, GAE, PPO update.

Mirrors the reference's tests/rl_env/* coverage using scripted fake loaders.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from linnaeus_tpu.rl import (
    EpisodeOutcomeReward,
    LinnaeusPolicyWrapper,
    LinnaeusRLProblemProvider,
    PPOConfig,
    SimpleAbstentionReward,
    TaxonomicClassificationEnv,
    TaxonomicRLVerifier,
    compute_gae_and_returns,
    make_ppo_update,
)
from linnaeus_tpu.utils.taxonomy import TaxonomyTree

TASKS = ["taxa_L10", "taxa_L20"]


@pytest.fixture
def tree():
    return TaxonomyTree(
        {"taxa_L10": {1: 1, 2: 1, 3: 2}},
        task_keys=TASKS,
        num_classes={"taxa_L10": 4, "taxa_L20": 3},
    )


class FakeLoader:
    """Scripted loader: always yields one batch of 4 samples."""

    def __init__(self, n=4):
        rng = np.random.default_rng(0)
        self.batch = {
            "images": rng.normal(size=(n, 8, 8, 3)).astype(np.float32),
            "aux": rng.normal(size=(n, 5)).astype(np.float32),
            "targets": {
                "taxa_L10": np.eye(4, dtype=np.float32)[[0, 1, 2, 3]],
                "taxa_L20": np.eye(3, dtype=np.float32)[[0, 1, 1, 2]],
            },
        }

    def __iter__(self):
        yield self.batch


def test_simple_abstention_reward():
    r = SimpleAbstentionReward()
    # correct classification at both ranks
    assert r.compute_reward({"a": 1, "b": 2}, {"a": 1, "b": 2}) == 2.0
    # correct abstention on null rank
    assert r.compute_reward({"a": None}, {"a": None}) == 0.5
    # misclassification
    assert r.compute_reward({"a": 1}, {"a": 2}) == -1.0
    # unnecessary abstention
    assert r.compute_reward({"a": None}, {"a": 2}) == -0.5
    # predicting at a null rank
    assert r.compute_reward({"a": 3}, {"a": None}) == -1.0


def test_episode_outcome_reward():
    r = EpisodeOutcomeReward()
    assert r.compute_reward({"a": 1, "b": None}, {"a": 1, "b": None}) == 1.0
    assert r.compute_reward({"a": 1, "b": 2}, {"a": 1, "b": None}) == -1.0
    assert r.compute_reward({"a": 2, "b": None}, {"a": 1, "b": None}) == -1.0


def test_verifier_diagnostics(tree):
    v = TaxonomicRLVerifier(tree)
    reward, diags = v.verify(
        {"taxa_L10": 1, "taxa_L20": None},
        {"taxa_L10": 1, "taxa_L20": 2},
    )
    assert diags["taxa_L10"] == "correct"
    assert diags["taxa_L20"] == "unnecessary_abstention"


def test_provider_converts_nulls(tree):
    provider = LinnaeusRLProblemProvider(FakeLoader(), tree)
    obs, gt = provider.reset()
    assert obs["image"].shape == (8, 8, 3)
    assert gt["taxa_L10"] is None  # first sample's label idx 0 => null
    obs2, gt2 = provider.reset()
    assert gt2["taxa_L10"] == 1


def test_env_sequential_episode(tree):
    env = TaxonomicClassificationEnv(
        dataloader=FakeLoader(), taxonomy_tree=tree, mode="sequential",
        image_shape=(8, 8, 3),
    )
    obs, info = env.reset()
    assert obs["current_rank_index"] == 0
    total_reward = 0.0
    done = False
    steps = 0
    while not done:
        obs, reward, done, truncated, info = env.step(env.abstain_action_index)
        total_reward += reward
        steps += 1
    assert steps == 2
    assert "final_predictions" in info
    assert info["final_predictions"]["taxa_L10"] is None


def test_env_multitask_single_step(tree):
    env = TaxonomicClassificationEnv(
        dataloader=FakeLoader(), taxonomy_tree=tree, mode="multitask",
        image_shape=(8, 8, 3),
    )
    env.reset()
    obs, reward, done, truncated, info = env.step(np.array([1, 1]))
    assert done
    assert info["final_predictions"] == {"taxa_L10": 1, "taxa_L20": 1}


def test_gae_shapes_and_terminal():
    rewards = np.array([1.0, 0.0, 1.0, 0.0])
    values = np.array([0.5, 0.5, 0.5, 0.5])
    dones = np.array([False, True, False, True])
    adv, ret = compute_gae_and_returns(rewards, values, dones, gamma=0.9)
    assert adv.shape == (4,)
    # terminal steps don't bootstrap: adv[1] = r - v = -0.5
    np.testing.assert_allclose(adv[1], -0.5, rtol=1e-6)
    np.testing.assert_allclose(ret, adv + values, rtol=1e-6)


def test_ppo_update_improves_objective(tree):
    from linnaeus_tpu.models import MFormerV1

    backbone = MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        task_keys=tuple(TASKS),
        num_classes=tree.num_classes,
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
    )
    policy = LinnaeusPolicyWrapper(
        backbone=backbone,
        task_keys=tuple(TASKS),
        num_classes=tree.num_classes,
    )
    images = jnp.zeros((4, 32, 32, 3))
    params = policy.init(jax.random.PRNGKey(0), images, None)

    def policy_apply(p, images, aux, actions_arr):
        actions = {t: actions_arr[:, i] for i, t in enumerate(TASKS)}
        return policy.apply(
            p, images, aux, actions,
            deterministic=True, method=policy.evaluate_actions,
        )

    tx = optax.adam(1e-3)
    update = make_ppo_update(policy_apply, tx, PPOConfig())
    batch = {
        "images": images,
        "aux": None,
        "actions": jnp.asarray([[1, 1], [2, 0], [0, 2], [3, 1]], jnp.int32),
        "old_log_prob": jnp.full((4,), -2.0),
        "advantages": jnp.asarray([1.0, -1.0, 0.5, -0.5]),
        "returns": jnp.asarray([1.0, 0.0, 0.5, 0.2]),
    }
    opt_state = tx.init(params)
    p1, opt_state, m1 = update(params, opt_state, batch)
    p2, opt_state, m2 = update(p1, opt_state, batch)
    assert np.isfinite(float(m1["total_loss"]))
    # value loss decreases as the critic fits the returns
    assert float(m2["value_loss"]) < float(m1["value_loss"])


def test_provider_normalizes_uint8_images(tree):
    """uint8 host batches must reach the policy in [0,1] — the jitted train
    step normalizes on device (train/step.py:186-188), so the RL path has
    to do it itself or a warm-started backbone sees 255x-scaled inputs."""

    class U8Loader:
        def __iter__(self):
            yield {
                "images": np.full((2, 8, 8, 3), 128, np.uint8),
                "aux": np.zeros((2, 5), np.float32),
                "targets": {
                    "taxa_L10": np.array([1, 0]),
                    "taxa_L20": np.array([2, 0]),
                },
            }

    provider = LinnaeusRLProblemProvider(U8Loader(), tree)
    obs, gt = provider.reset()
    assert obs["image"].dtype == np.float32
    np.testing.assert_allclose(obs["image"], 128 / 255.0, atol=1e-6)
    # float loaders (host-augment path) pass through untouched
    provider_f = LinnaeusRLProblemProvider(FakeLoader(), tree)
    obs_f, _ = provider_f.reset()
    assert obs_f["image"].dtype == np.float32


def test_evaluate_abstention_metrics(tree):
    """Precision/recall bookkeeping on a scripted policy: abstains on the
    null sample + one known sample -> recall 1.0, precision 0.5."""
    from linnaeus_tpu.rl.train_abstention import evaluate_abstention

    class ScriptedPolicy:
        def apply(self, params, im, aux, deterministic=True):
            n = im.shape[0]
            # leaf taxa_L10 has 4 classes + abstain (index 4):
            # sample 0 -> abstain, 1 -> class 1 (correct), 2 -> abstain,
            # 3 -> class 0 (wrong; target 3)
            logits = np.full((n, 5), -10.0, np.float32)
            choice = [4, 1, 4, 0]
            for i in range(n):
                logits[i, choice[i % 4]] = 10.0
            return (
                {"taxa_L10": jnp.asarray(logits),
                 "taxa_L20": jnp.zeros((n, 4), jnp.float32)},
                jnp.zeros((n,), jnp.float32),
            )

    class Loader:
        def __iter__(self):
            yield {
                "images": np.zeros((4, 8, 8, 3), np.float32),
                "aux": None,
                # sample 0 is null (target 0); others known classes 1,2,3
                "targets": {"taxa_L10": np.array([0, 1, 2, 3])},
            }

    m = evaluate_abstention(
        ScriptedPolicy(), {}, Loader(), ("taxa_L10", "taxa_L20"),
        {"taxa_L10": 4, "taxa_L20": 3}, max_samples=4,
    )
    assert m["samples"] == 4 and m["null_samples"] == 1
    assert m["abstain_recall"] == 1.0      # the null sample was abstained
    assert m["abstain_precision"] == 0.5   # 1 of 2 abstains was a null
    # committed on samples 1 (correct) and 3 (wrong) -> 0.5
    assert m["acc_when_committing_on_known"] == 0.5


def test_abstain_prior_initializes_action_mass(tree):
    """abstain_prior=0.2 must put ~20% softmax mass on the abstain action
    at init (exploration prior — without it the 1-of-1000 abstain action is
    never sampled and PPO gets no abstention gradient)."""
    from linnaeus_tpu.models import MFormerV1
    from linnaeus_tpu.rl.policies import LinnaeusPolicyWrapper

    backbone = MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        task_keys=TASKS,
        num_classes={"taxa_L10": 4, "taxa_L20": 3},
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
    )
    policy = LinnaeusPolicyWrapper(
        backbone=backbone, task_keys=TASKS,
        num_classes={"taxa_L10": 4, "taxa_L20": 3},
        abstain_prior=0.2,
    )
    x = jnp.zeros((2, 32, 32, 3))
    params = policy.init(jax.random.PRNGKey(0), x, None)
    logits, _ = policy.apply(params, x, None)
    for t in TASKS:
        p_abstain = float(jax.nn.softmax(logits[t], -1)[0, -1])
        assert 0.1 < p_abstain < 0.35, (t, p_abstain)
    # prior off -> near-uniform abstain mass
    flat_policy = policy.clone(abstain_prior=0.0)
    params0 = flat_policy.init(jax.random.PRNGKey(0), x, None)
    logits0, _ = flat_policy.apply(params0, x, None)
    p0 = float(jax.nn.softmax(logits0["taxa_L10"], -1)[0, -1])
    assert p0 < 0.5  # no special mass


def test_warm_start_actor_heads_from_classifier():
    """Phase-2 actor warm start: the Linear classification head's weights
    land in the actor's class columns; the abstain column/bias (the
    exploration prior) is preserved; mismatched geometries are skipped."""
    from linnaeus_tpu.rl.train_abstention import warm_start_actor_heads

    F, N = 8, 5
    rng = np.random.default_rng(0)
    head_k = rng.normal(size=(F, N)).astype(np.float32)
    head_b = rng.normal(size=(N,)).astype(np.float32)
    backbone_params = {
        "head": {
            "head_taxa_L10": {"Dense_0": {"kernel": jnp.asarray(head_k),
                                          "bias": jnp.asarray(head_b)}},
            # wrong geometry (hierarchical head): must be skipped
            "head_taxa_L20": {"Dense_0": {"kernel": jnp.zeros((F, 9)),
                                          "bias": jnp.zeros((9,))}},
        }
    }
    actor_k = jnp.full((F, N + 1), 7.0)
    actor_b = jnp.asarray([0.0] * N + [2.3])  # abstain prior bias
    policy_params = {
        "params": {
            "actor_taxa_L10": {"kernel": actor_k, "bias": actor_b},
            "actor_taxa_L20": {"kernel": jnp.full((F, 4), 7.0),
                               "bias": jnp.zeros((4,))},
        }
    }
    warmed = warm_start_actor_heads(
        policy_params, backbone_params, ("taxa_L10", "taxa_L20")
    )
    assert warmed == ["taxa_L10"]
    ap = policy_params["params"]["actor_taxa_L10"]
    np.testing.assert_allclose(np.asarray(ap["kernel"][:, :N]), head_k)
    np.testing.assert_allclose(np.asarray(ap["kernel"][:, N]), 7.0)  # abstain col kept
    np.testing.assert_allclose(np.asarray(ap["bias"][:N]), head_b)
    assert abs(float(ap["bias"][N]) - 2.3) < 1e-6  # abstain prior kept
    # untouched head
    np.testing.assert_allclose(
        np.asarray(policy_params["params"]["actor_taxa_L20"]["kernel"]), 7.0
    )
