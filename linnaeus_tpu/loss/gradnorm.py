"""GradNorm multitask loss balancing — functional JAX implementation.

Reference parity: loss/gradnorm.py:33-312 + loss/gradient_weighting.py:367-650.

Algorithm (per update, every ``UPDATE_INTERVAL`` optimizer steps):
    1. per-task unweighted losses L_i and per-task trunk-gradient L2 norms
       g_i = || d(w_i * L_i) / d(trunk params) ||
    2. g_avg = mean_i(g_i); ratio_i = (L_i / L_i(0)) normalized to sum=n
    3. target_i = g_avg * ratio_i**alpha
    4. w_i <- w_i * g_i / target_i, renormalized so sum(w) = n_tasks

The reference needs an elaborate re-forward that dodges DDP hooks
(gradient_weighting.py:367: ``torch.autograd.grad`` against filtered
backbone params, optional sub-batching + checkpointing + linear-head
bypass). In JAX this collapses to one ``jax.jacrev``-style loop of
``jax.grad`` calls over a trunk-masked parameter subtree inside a jitted
function; data-parallel gradient averaging falls out of pjit's psum — no
explicit collectives (replaces the reference's
``distributed_allreduce_mean``, gradnorm.py:226).

State is a small pytree (``GradNormState``) carried in the train state, so
updates stay on-device and checkpoint with everything else.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class GradNormState(NamedTuple):
    task_weights: jnp.ndarray  # [T]
    initial_losses: jnp.ndarray  # [T]
    has_initted: jnp.ndarray  # bool scalar
    last_metrics: dict[str, jnp.ndarray] | None = None


def init_gradnorm_state(num_tasks: int, init_weights=None) -> GradNormState:
    w = (
        jnp.asarray(init_weights, dtype=jnp.float32)
        if init_weights is not None
        else jnp.ones((num_tasks,), dtype=jnp.float32)
    )
    # normalize to sum = num_tasks (reference: gradient_weighting.py init)
    w = w * (num_tasks / jnp.maximum(w.sum(), 1e-8))
    return GradNormState(
        task_weights=w,
        initial_losses=jnp.zeros((num_tasks,), dtype=jnp.float32),
        has_initted=jnp.asarray(False),
    )


def gradnorm_weight_update(
    grad_norms: jnp.ndarray,
    loss_values: jnp.ndarray,
    state: GradNormState,
    alpha: float,
) -> tuple[GradNormState, dict[str, jnp.ndarray]]:
    """Steps 2-4 above, given measured per-task norms and losses."""
    n = grad_norms.shape[0]
    initial = jnp.where(state.has_initted, state.initial_losses, loss_values)
    g_avg = grad_norms.mean()
    if alpha > 0:
        ratio = loss_values / jnp.maximum(initial, 1e-8)
        ratio = ratio * (n / jnp.maximum(ratio.sum(), 1e-8))
        target = g_avg * ratio**alpha
    else:
        target = g_avg * jnp.ones_like(grad_norms)
    scale = jnp.where(target > 1e-8, grad_norms / jnp.maximum(target, 1e-8), 1.0)
    new_w = state.task_weights * scale
    new_w = new_w * (n / jnp.maximum(new_w.sum(), 1e-8))
    metrics = {
        "gradnorm/avg_norm": g_avg,
        "gradnorm/norms": grad_norms,
        "gradnorm/targets": target,
        "gradnorm/weights": new_w,
        "gradnorm/losses": loss_values,
    }
    return (
        GradNormState(
            task_weights=new_w,
            initial_losses=initial,
            has_initted=jnp.asarray(True),
        ),
        metrics,
    )


def make_gradnorm_update_fn(
    apply_fn: Callable,
    criteria: dict[str, Callable],
    task_keys: tuple[str, ...],
    trunk_filter: Callable[[Any], Any],
    alpha: float,
    zero_aux_info: bool = True,
    use_linear_heads: bool = True,
    accum_steps: int = 1,
) -> Callable:
    """Build the jittable GradNorm update.

    Args:
        apply_fn: ``fn(params, images, meta, deterministic, gradnorm_mode) ->
            {task: logits}``.
        trunk_filter: maps the param pytree to a same-structure pytree of 0/1
            masks selecting the shared trunk (excludes heads/meta by default —
            LOSS.GRAD_WEIGHTING.TASK.EXCLUDE_CONFIG).
        zero_aux_info: reference's ZERO_AUX_INFO — re-forward with zeroed
            metadata so meta heads don't contribute.
        use_linear_heads: bypass hierarchical refinement during the re-forward
            (reference: USE_LINEAR_HEADS_FOR_GRADNORM_REFORWARD).

    Returns:
        ``update(params, batch, gradnorm_state) -> (new_state, metrics)``.
    """

    accum = max(int(accum_steps), 1)

    def update(params, images, targets, meta, state: GradNormState,
               batch_stats=None):
        if zero_aux_info and meta is not None:
            meta_in = jnp.zeros_like(meta)
        else:
            meta_in = meta

        mask = trunk_filter(params)

        def task_grads(ti, task, imgs, tgts, mta):
            def loss_fn(p):
                outputs = apply_fn(
                    p, imgs, mta,
                    deterministic=True, gradnorm_mode=use_linear_heads,
                    batch_stats=batch_stats,
                )
                per_sample = criteria[task](outputs[task], tgts)
                unweighted = per_sample.mean()
                return state.task_weights[ti] * unweighted, unweighted

            return jax.grad(loss_fn, has_aux=True)(params)

        norms, losses = [], []
        for ti, task in enumerate(task_keys):
            if accum == 1:
                grads, unweighted = task_grads(
                    ti, task, images, targets[task], meta_in
                )
            else:
                # GRADNORM_ACCUM_STEPS sub-batching (reference:
                # gradient_weighting.py GRADNORM_ACCUM_STEPS): scan over
                # microbatches, averaging gradients — caps activation memory
                # at 1/accum of the full re-forward.
                def split(x):
                    return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

                micro = (
                    split(images),
                    split(targets[task]),
                    split(meta_in) if meta_in is not None else None,
                )

                def body(carry, mb):
                    acc_g, acc_l = carry
                    imgs_mb, tgt_mb, meta_mb = mb
                    g, unw = task_grads(ti, task, imgs_mb, tgt_mb, meta_mb)
                    acc_g = jax.tree.map(jnp.add, acc_g, g)
                    return (acc_g, acc_l + unw), None

                zero = jax.tree.map(jnp.zeros_like, params)
                (grads, total_l), _ = jax.lax.scan(
                    body, (zero, jnp.float32(0.0)), micro
                )
                grads = jax.tree.map(lambda g: g / accum, grads)
                unweighted = total_l / accum

            masked = jax.tree.map(
                lambda g, m: g.astype(jnp.float32) * m, grads, mask
            )
            sq = sum(
                jnp.sum(jnp.square(g)) for g in jax.tree.leaves(masked)
            )
            norms.append(jnp.sqrt(sq))
            losses.append(unweighted)

        grad_norms = jnp.stack(norms)
        loss_values = jnp.stack(losses).astype(jnp.float32)
        return gradnorm_weight_update(grad_norms, loss_values, state, alpha)

    return update
