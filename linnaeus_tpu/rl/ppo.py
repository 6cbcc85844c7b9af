"""PPO for abstention fine-tuning (phase 2).

Reference parity: rl_train_abstention.py:38-531 — GAE advantage estimation
and the clipped-surrogate PPO update, plus a rollout/update driver over the
multitask abstention environment. The update itself is one jitted function.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from linnaeus_tpu.utils.logging import get_main_logger

logger = get_main_logger()


def compute_gae_and_returns(
    rewards: np.ndarray,
    values: np.ndarray,
    dones: np.ndarray,
    gamma: float = 0.99,
    gae_lambda: float = 0.95,
    last_value: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Generalized advantage estimation (rl_train_abstention.py:38)."""
    T = len(rewards)
    advantages = np.zeros(T, dtype=np.float32)
    gae = 0.0
    for t in reversed(range(T)):
        next_value = last_value if t == T - 1 else values[t + 1]
        next_nonterminal = 1.0 - float(dones[t])
        delta = rewards[t] + gamma * next_value * next_nonterminal - values[t]
        gae = delta + gamma * gae_lambda * next_nonterminal * gae
        advantages[t] = gae
    returns = advantages + values
    return advantages, returns


class PPOConfig(NamedTuple):
    clip_eps: float = 0.2
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    gamma: float = 0.99
    gae_lambda: float = 0.95
    epochs: int = 4
    lr: float = 3e-5


def make_ppo_update(policy_apply: Callable, tx: optax.GradientTransformation,
                    cfg: PPOConfig):
    """policy_apply(params, images, aux, actions) -> (log_prob, entropy, value).

    Returns jitted ``update(params, opt_state, batch) -> (params, opt_state,
    metrics)`` implementing the clipped surrogate objective
    (rl_train_abstention.py:57-120).
    """

    def loss_fn(params, batch):
        log_prob, entropy, value = policy_apply(
            params, batch["images"], batch.get("aux"), batch["actions"]
        )
        ratio = jnp.exp(log_prob - batch["old_log_prob"])
        adv = batch["advantages"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
        policy_loss = -jnp.minimum(surr1, surr2).mean()
        value_loss = jnp.square(value - batch["returns"]).mean()
        entropy_bonus = entropy.mean()
        total = (
            policy_loss
            + cfg.value_coef * value_loss
            - cfg.entropy_coef * entropy_bonus
        )
        return total, {
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy_bonus,
            "approx_kl": (batch["old_log_prob"] - log_prob).mean(),
        }

    @jax.jit
    def update(params, opt_state, batch):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total_loss"] = total
        return params, opt_state, metrics

    return update


def collect_rollout(env, act_fn: Callable, num_steps: int):
    """Roll the multitask env; act_fn(obs) -> (actions dict, log_prob, value).

    Returns stacked numpy arrays for the PPO update.
    """
    obs_images, obs_aux, acts, log_probs, values, rewards, dones = (
        [], [], [], [], [], [], [],
    )
    obs, info = env.reset()
    for _ in range(num_steps):
        actions, log_prob, value = act_fn(obs, info)
        next_obs, reward, done, truncated, next_info = env.step(
            np.asarray([actions[t] for t in env.rank_order])
        )
        obs_images.append(obs["image"])
        obs_aux.append(info.get("aux"))
        acts.append([actions[t] for t in env.rank_order])
        log_probs.append(log_prob)
        values.append(value)
        rewards.append(reward)
        dones.append(done)
        if done or truncated:
            obs, info = env.reset()
        else:
            obs, info = next_obs, next_info
    batch = {
        "images": np.stack(obs_images).astype(np.float32),
        "aux": (
            np.stack([a if a is not None else np.zeros(0) for a in obs_aux])
            if obs_aux[0] is not None
            else None
        ),
        "actions": np.asarray(acts, np.int32),  # (T, num_ranks)
        "old_log_prob": np.asarray(log_probs, np.float32),
        "values": np.asarray(values, np.float32),
        "rewards": np.asarray(rewards, np.float32),
        "dones": np.asarray(dones, bool),
    }
    return batch


def train_abstention_ppo(
    policy,
    params,
    env,
    cfg: PPOConfig = PPOConfig(),
    num_iterations: int = 10,
    steps_per_rollout: int = 64,
    rng=None,
):
    """Full phase-2 driver (rl_train_abstention.py main loop)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    task_keys = tuple(env.rank_order)

    from .policies import sample_actions

    @jax.jit
    def policy_forward(params, images, aux):
        return policy.apply(params, images, aux, deterministic=True)

    def act_fn(obs, info):
        nonlocal rng
        rng, sub = jax.random.split(rng)
        images = jnp.asarray(obs["image"])[None]
        aux = info.get("aux")
        aux = jnp.asarray(aux)[None] if aux is not None else None
        logits, value = policy_forward(params, images, aux)
        actions, log_prob = sample_actions(logits, sub)
        return (
            {t: int(actions[t][0]) for t in task_keys},
            float(log_prob[0]),
            float(value[0]),
        )

    def eval_actions(params, images, aux, actions_arr):
        actions = {t: actions_arr[:, i] for i, t in enumerate(task_keys)}
        return policy.apply(
            params, images, aux, actions,
            deterministic=True, method=policy.evaluate_actions,
        )

    update = make_ppo_update(
        lambda p, im, aux, act: eval_actions(p, im, aux, act), tx, cfg
    )

    history = []
    for it in range(num_iterations):
        rollout = collect_rollout(env, act_fn, steps_per_rollout)
        adv, ret = compute_gae_and_returns(
            rollout["rewards"], rollout["values"], rollout["dones"],
            cfg.gamma, cfg.gae_lambda,
        )
        batch = {
            "images": jnp.asarray(rollout["images"]),
            "aux": jnp.asarray(rollout["aux"]) if rollout["aux"] is not None else None,
            "actions": jnp.asarray(rollout["actions"]),
            "old_log_prob": jnp.asarray(rollout["old_log_prob"]),
            "advantages": jnp.asarray(adv),
            "returns": jnp.asarray(ret),
        }
        for _ in range(cfg.epochs):
            params, opt_state, metrics = update(params, opt_state, batch)
        mean_reward = float(rollout["rewards"].mean())
        history.append({"iteration": it, "mean_reward": mean_reward,
                        **{k: float(v) for k, v in jax.device_get(metrics).items()}})
        logger.info(
            f"PPO iter {it}: reward {mean_reward:.3f} "
            f"kl {history[-1]['approx_kl']:.4f}"
        )
    return params, history
