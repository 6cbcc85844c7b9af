"""AdEMAMix optimizer as an optax transform.

Behavioral spec from the reference (optimizers/ademamix.py:16-175): Adam's
fast EMA (beta1) plus a slow EMA (beta3) mixed with coefficient alpha:

    update = (m1_hat + alpha_t * m2) / (sqrt(v_hat) + eps)

with warmup schedules on alpha and beta3 over T_alpha_beta3 steps
(ademamix.py:145-160) and decoupled weight decay.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdEMAMixState(NamedTuple):
    count: jnp.ndarray
    m1: optax.Updates
    m2: optax.Updates
    nu: optax.Updates


def scale_by_ademamix(
    b1: float = 0.9,
    b2: float = 0.999,
    b3: float = 0.9999,
    alpha: float = 5.0,
    t_alpha_beta3: int | None = None,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return AdEMAMixState(
            count=jnp.zeros([], jnp.int32), m1=zeros(), m2=zeros(), nu=zeros()
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        step = count.astype(jnp.float32)

        if t_alpha_beta3 is not None:
            alpha_t = jnp.minimum(step * alpha / t_alpha_beta3, alpha)
            ln_b1, ln_b3 = math.log(b1), math.log(b3)
            frac = jnp.clip(step / t_alpha_beta3, 0.0, 1.0)
            beta3_t = jnp.minimum(
                jnp.exp(ln_b1 * ln_b3 / ((1 - frac) * ln_b3 + frac * ln_b1)), b3
            )
        else:
            alpha_t = alpha
            beta3_t = b3

        m1 = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.m1, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        m2 = jax.tree.map(
            lambda m, g: beta3_t * m + (1 - beta3_t) * g, state.m2, updates
        )

        bc1 = 1 - b1**step
        bc2 = 1 - b2**step
        new_updates = jax.tree.map(
            lambda m1_, m2_, v_: (m1_ / bc1 + alpha_t * m2_)
            / (jnp.sqrt(v_ / bc2) + eps),
            m1,
            m2,
            nu,
        )
        return new_updates, AdEMAMixState(count=count, m1=m1, m2=m2, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def ademamix(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    b3: float = 0.9999,
    alpha: float = 5.0,
    t_alpha_beta3: int | None = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    chain = [scale_by_ademamix(b1, b2, b3, alpha, t_alpha_beta3, eps)]
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
