"""TrainState: one pytree carrying everything the jitted step mutates.

Params + optimizer state + step counter + GradNorm state + PRNG key. Kept as
a flax struct so Orbax checkpoints the whole thing atomically (SURVEY.md §5:
"Orbax checkpointing of a single train-state PyTree").
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from linnaeus_tpu.loss.gradnorm import GradNormState, init_gradnorm_state


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: optax.OptState
    gradnorm: GradNormState
    rng: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # non-trainable collections (e.g. BatchNorm running stats for mFormerV0);
    # None for purely-LayerNorm models like mFormerV1
    batch_stats: Any = None
    # exponential moving average of params (TRAIN.EMA; None when disabled).
    # Updated inside the jitted step; validation/serving can read it in
    # place of params. No reference analog (beyond-reference, SURVEY §8).
    ema_params: Any = None

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    model,
    params,
    tx: optax.GradientTransformation,
    num_tasks: int,
    rng: jax.Array,
    init_task_weights=None,
    batch_stats=None,
    ema: bool = False,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        gradnorm=init_gradnorm_state(num_tasks, init_task_weights),
        rng=rng,
        apply_fn=model.apply,
        tx=tx,
        batch_stats=batch_stats,
        # EMA starts at a COPY of the initial params (timm convention).
        # Distinct buffers are required: the jitted step donates the whole
        # state, and XLA rejects the same buffer appearing twice in a
        # donated argument.
        ema_params=(
            jax.tree.map(lambda p: jnp.array(p), params) if ema else None
        ),
    )
