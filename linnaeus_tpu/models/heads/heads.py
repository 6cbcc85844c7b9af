"""Classification heads: Linear, Conv1d, HierarchicalSoftmax, ConditionalClassifier.

Behavioral spec from the reference (models/heads/*.py). The hierarchical
heads refine per-level logits top-down using dense parent->child taxonomy
matrices:

    refined[child] = base[child] + log(parent_probs @ M[parent, child] + eps)

with parent probabilities computed by plain softmax (HierarchicalSoftmax,
hierarchical_softmax_head.py:160-196) or a routing strategy — soft /
hard-argmax (eval only) / gumbel (train only) — (ConditionalClassifier,
conditional_classifier_head.py:150-235).

Design differences vs the reference (both intentional, TPU-first):

* All tasks are computed by ONE module (``MultiTaskHeads``) in a single pass.
  The reference instantiates a head per task and each instance recomputes
  every level's logits, relying on shared ``nn.Linear``s for DDP safety
  (heads/utils.py:218-231); in a functional jit there is no aliasing hazard
  and computing each level once is strictly less FLOPs.
* The reference heads look up matrices under ``f"{task_keys[i]}_{task_keys[i+1]}"``
  while its TaxonomyTree stores ``f"{task_keys[i+1]}_{task_keys[i]}"`` —
  refinement silently no-ops there. Here both use the tree's convention and
  refinement iterates coarse->fine so it actually fires.
* GradNorm bypass (``set_gradnorm_mode`` in the reference,
  loss/gradient_weighting.py:419-430) is the ``gradnorm_mode`` call argument:
  when True, hierarchical refinement is skipped and raw per-level linear
  logits are returned.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from linnaeus_tpu.models.factory import register_head
from linnaeus_tpu.models.blocks.common import trunc_normal_init


@register_head("Linear")
class LinearHead(nn.Module):
    out_features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.out_features,
            use_bias=self.use_bias,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
        )(x)


@register_head("Conv1d")
class Conv1dHead(nn.Module):
    """1x1 Conv1d over a singleton length axis — equivalent to a Dense layer
    with conv-style init (reference: conv1d_head.py:14-59)."""

    out_features: int
    kernel_size: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # (B, C) -> (B, 1, C): conv over the singleton spatial axis
        y = nn.Conv(
            self.out_features,
            kernel_size=(self.kernel_size,),
            use_bias=self.use_bias,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
        )(x[:, None, :])
        return jnp.mean(y, axis=1)


def _routing_probs(
    logits: jnp.ndarray,
    strategy: str,
    temperature: float,
    deterministic: bool,
    gumbel_rng: jax.Array | None,
) -> jnp.ndarray:
    """Routing probabilities (ConditionalClassifier strategies)."""
    if strategy == "hard" and deterministic:
        idx = jnp.argmax(logits, axis=-1)
        return jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    if strategy == "gumbel" and not deterministic and gumbel_rng is not None:
        g = jax.random.gumbel(gumbel_rng, logits.shape, dtype=logits.dtype)
        return jax.nn.softmax((logits + g) / temperature, axis=-1)
    return jax.nn.softmax(logits / temperature, axis=-1)


class MultiTaskHeads(nn.Module):
    """All per-task classification heads in a single module.

    Attributes:
        task_keys: ordered fine->coarse task keys.
        num_classes: per-task class counts (dict, insertion order = task_keys).
        head_configs: per-task dict with at least TYPE; optional
            ROUTING_STRATEGY / TEMPERATURE / USE_BIAS / KERNEL_SIZE.
        hierarchy_matrices: output of TaxonomyTree.build_hierarchy_matrices()
            (numpy), baked as compile-time constants.
    """

    task_keys: tuple[str, ...]
    num_classes: Mapping[str, int]
    head_configs: Mapping[str, Mapping[str, Any]]
    hierarchy_matrices: Mapping[str, np.ndarray] | None = None
    dtype: jnp.dtype = jnp.float32

    def _head_cfg(self, task: str) -> Mapping[str, Any]:
        return self.head_configs.get(task, {"TYPE": "Linear"})

    def _is_hierarchical(self, task: str) -> bool:
        return str(self._head_cfg(task).get("TYPE", "Linear")) in (
            "HierarchicalSoftmax",
            "ConditionalClassifier",
        )

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        deterministic: bool = True,
        gradnorm_mode: bool = False,
    ) -> dict[str, jnp.ndarray]:
        any_hier = any(self._is_hierarchical(t) for t in self.task_keys)

        # Base (level) logits — one Dense per task. For hierarchical heads
        # these are the shared "level classifiers"; fp32 output for loss
        # numerics regardless of compute dtype.
        base_logits: dict[str, jnp.ndarray] = {}
        for task in self.task_keys:
            cfg = self._head_cfg(task)
            head_type = str(cfg.get("TYPE", "Linear"))
            use_bias = bool(cfg.get("USE_BIAS", True))
            n_cls = int(self.num_classes[task])
            if head_type == "Conv1d":
                logits = Conv1dHead(
                    n_cls,
                    kernel_size=int(cfg.get("KERNEL_SIZE", 1)),
                    use_bias=use_bias,
                    dtype=self.dtype,
                    name=f"head_{task}",
                )(feats)
            else:  # Linear or the shared level classifier of hierarchical heads
                logits = LinearHead(
                    n_cls, use_bias=use_bias, dtype=self.dtype, name=f"head_{task}"
                )(feats)
            base_logits[task] = logits.astype(jnp.float32)

        if gradnorm_mode or not any_hier or not self.hierarchy_matrices:
            return base_logits

        # Top-down refinement: coarsest level (last task key) is unrefined;
        # each finer level adds the log-prior from its parent's probabilities.
        refined = dict(base_logits)
        for i in range(len(self.task_keys) - 2, -1, -1):
            child_task = self.task_keys[i]
            parent_task = self.task_keys[i + 1]
            pair_key = f"{parent_task}_{child_task}"
            matrix = self.hierarchy_matrices.get(pair_key)
            if matrix is None or not self._is_hierarchical(child_task):
                continue
            cfg = self._head_cfg(child_task)
            head_type = str(cfg.get("TYPE", "Linear"))
            if head_type == "ConditionalClassifier":
                strategy = str(cfg.get("ROUTING_STRATEGY", "soft"))
                temperature = float(cfg.get("TEMPERATURE", 1.0))
                gumbel_rng = (
                    self.make_rng("gumbel")
                    if (strategy == "gumbel" and not deterministic)
                    else None
                )
                parent_probs = _routing_probs(
                    refined[parent_task],
                    strategy,
                    temperature,
                    deterministic,
                    gumbel_rng,
                )
            else:  # HierarchicalSoftmax
                parent_probs = jax.nn.softmax(refined[parent_task], axis=-1)
            m = jnp.asarray(matrix, dtype=jnp.float32)
            prior = parent_probs @ m + 1e-10
            refined[child_task] = base_logits[child_task] + jnp.log(prior)
        return refined


def configure_classification_heads(
    heads_config: Mapping[str, Mapping[str, Any]],
    num_classes_dict: Mapping[str, int],
    task_keys: list[str],
    taxonomy_tree=None,
    dtype: jnp.dtype = jnp.float32,
) -> MultiTaskHeads:
    """Build the combined heads module (reference: heads/utils.py:162-280)."""
    matrices = None
    needs_tree = any(
        str(cfg.get("TYPE", "Linear"))
        in ("HierarchicalSoftmax", "ConditionalClassifier")
        for cfg in heads_config.values()
        if isinstance(cfg, Mapping)
    )
    if needs_tree:
        if taxonomy_tree is None:
            raise ValueError(
                "Hierarchical head TYPE requested but no taxonomy_tree provided"
            )
        matrices = taxonomy_tree.build_hierarchy_matrices()
    # freeze configs into plain tuples/dicts for module hashability
    head_configs = {
        t: dict(heads_config.get(t, {"TYPE": "Linear"})) for t in task_keys
    }
    return MultiTaskHeads(
        task_keys=tuple(task_keys),
        num_classes={t: int(num_classes_dict[t]) for t in task_keys},
        head_configs=head_configs,
        hierarchy_matrices=matrices,
        dtype=dtype,
    )
