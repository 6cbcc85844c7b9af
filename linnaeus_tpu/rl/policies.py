"""Actor-critic policy wrapper around a linnaeus backbone.

Reference parity: rl_env/policies.py:13-402 (LinnaeusPolicyWrapper) — adapts
a classification model into an actor-critic: per-rank actor logits with an
extra abstain action, plus a scalar value head over the backbone features.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import flax.linen as nn

from linnaeus_tpu.models.blocks.common import trunc_normal_init


class LinnaeusPolicyWrapper(nn.Module):
    """Wraps a backbone (any module with ``forward_features``) into an
    actor-critic for the abstention environment (multitask mode).

    ``abstain_prior`` > 0 initializes each actor head's abstain-action bias
    so the policy starts with ~that much probability mass on "abstain".
    Without it the abstain action is 1 of n_cls+1 (1,000-way at the leaf) —
    categorical sampling almost never explores it, so PPO gets no gradient
    toward the abstention behavior the phase exists to learn (measured:
    30 on-chip iterations moved reward -3.9→-3.0 purely through coarse-rank
    classification; abstain_rate stayed 0.000). With the prior, PPO's job
    becomes CALIBRATING the abstain/commit decision, which is the actual
    phase-2 task."""

    backbone: nn.Module
    task_keys: tuple[str, ...]
    num_classes: Mapping[str, int]
    dtype: jnp.dtype = jnp.float32
    abstain_prior: float = 0.0

    def _abstain_bias_init(self, n_actions: int):
        import numpy as np

        p = float(min(max(self.abstain_prior, 1e-4), 0.95))
        b = float(np.log(n_actions - 1) + np.log(p / (1.0 - p)))

        def init(key, shape, dtype=jnp.float32):
            return jnp.zeros(shape, dtype).at[-1].set(b)

        return init

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        aux: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> tuple[dict[str, jnp.ndarray], jnp.ndarray]:
        """Returns ({task: action_logits [B, n_cls+1]}, value [B])."""
        feats = self.backbone.forward_features(images, aux, deterministic)
        action_logits = {}
        for t in self.task_keys:
            n = int(self.num_classes[t]) + 1  # + abstain
            bias_init = (
                self._abstain_bias_init(n)
                if self.abstain_prior > 0
                else nn.initializers.zeros
            )
            action_logits[t] = nn.Dense(
                n, kernel_init=trunc_normal_init, bias_init=bias_init,
                dtype=self.dtype, name=f"actor_{t}",
            )(feats).astype(jnp.float32)
        value = nn.Dense(
            1, kernel_init=trunc_normal_init, dtype=self.dtype, name="critic"
        )(feats)[:, 0].astype(jnp.float32)
        return action_logits, value

    def evaluate_actions(
        self, images, aux, actions: dict[str, jnp.ndarray],
        deterministic: bool = True,
    ):
        """(log_probs [B], entropy [B], value [B]) summed over ranks
        (reference: policies.py:198)."""
        logits, value = self(images, aux, deterministic)
        log_prob = 0.0
        entropy = 0.0
        for t in self.task_keys:
            lp = jax.nn.log_softmax(logits[t], axis=-1)
            log_prob = log_prob + jnp.take_along_axis(
                lp, actions[t][:, None], axis=-1
            )[:, 0]
            p = jnp.exp(lp)
            entropy = entropy - (p * lp).sum(-1)
        return log_prob, entropy, value


def sample_actions(logits: dict[str, jnp.ndarray], rng: jax.Array):
    """Per-rank categorical sampling. Returns ({task: action [B]}, log_prob [B])."""
    actions, log_prob = {}, 0.0
    for i, (t, lg) in enumerate(logits.items()):
        r = jax.random.fold_in(rng, i)
        a = jax.random.categorical(r, lg, axis=-1)
        lp = jax.nn.log_softmax(lg, axis=-1)
        log_prob = log_prob + jnp.take_along_axis(lp, a[:, None], axis=-1)[:, 0]
        actions[t] = a
    return actions, log_prob
