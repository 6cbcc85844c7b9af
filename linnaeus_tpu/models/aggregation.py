"""Aggregation layers and feature resolvers (registered components).

Reference parity: models/aggregation/*.py and models/resolvers/*.py (~500
LoC) — AdaptivePooling / Concatenation / Conv1d / Identity aggregations over
token stacks, and LearnedProjection / AdaptivePooling / Concatenation /
Identity feature resolvers, built from MODEL.AGGREGATION and
MODEL.FEATURE_RESOLVER configs (aggregation/utils.py:10,
resolvers/utils.py:15).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from linnaeus_tpu.models.factory import (
    register_aggregation,
    register_resolver,
)
from linnaeus_tpu.models.blocks.common import trunc_normal_init


@register_aggregation("AdaptivePooling")
class AdaptivePoolingAggregation(nn.Module):
    """Mean-pool a (B, N, C) token stack to (B, C)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return tokens.mean(axis=1)


@register_aggregation("Concatenation")
class ConcatenationAggregation(nn.Module):
    """Concatenate tokens then project back to out_features."""

    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        B, N, C = tokens.shape
        flat = tokens.reshape(B, N * C)
        return nn.Dense(
            self.out_features, kernel_init=trunc_normal_init, dtype=self.dtype
        )(flat)


@register_aggregation("Conv1d")
class Conv1dAggregation(nn.Module):
    """N->1 channel 1x1 Conv1d over the feature axis (the mFormer dual-CLS
    aggregator; mFormerV1.py:512-527)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        # (B, N, C): Dense over the token axis after transposing
        out = nn.Dense(
            1, kernel_init=trunc_normal_init, dtype=self.dtype
        )(jnp.transpose(tokens, (0, 2, 1)))
        return out[..., 0]


@register_aggregation("Identity")
@register_aggregation("default")
class IdentityAggregation(nn.Module):
    # accepted for registry-uniform construction (callers pass dtype=)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return tokens[:, 0] if tokens.ndim == 3 else tokens


def configure_aggregation_layer(config, dtype=jnp.float32):
    """Build from MODEL.AGGREGATION (aggregation/utils.py:10)."""
    from linnaeus_tpu.models.factory import AGGREGATION_REGISTRY

    agg_type = str(config.MODEL.AGGREGATION.TYPE)
    params = config.MODEL.AGGREGATION.get("PARAMETERS", {})
    cls = AGGREGATION_REGISTRY.get(agg_type)
    if cls is None:
        raise ValueError(f"Unknown aggregation TYPE '{agg_type}'")
    if agg_type == "Concatenation":
        return cls(out_features=int(params.get("out_channels", 768)), dtype=dtype)
    return cls(dtype=dtype)


# ------------------------------------------------------------------ resolvers
@register_resolver("LearnedProjection")
class LearnedProjectionResolver(nn.Module):
    projection_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.projection_dim, kernel_init=trunc_normal_init, dtype=self.dtype
        )(feats)


@register_resolver("AdaptivePooling")
class AdaptivePoolingResolver(nn.Module):
    projection_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        # adaptive 1D pooling of the feature axis to projection_dim
        B, C = feats.shape
        if C == self.projection_dim:
            return feats
        ratio = C / self.projection_dim
        idx = (jnp.arange(self.projection_dim) * ratio).astype(jnp.int32)
        return feats[:, idx]


@register_resolver("Concatenation")
class ConcatenationResolver(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, *feats: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate(feats, axis=-1)


@register_resolver("Identity")
class IdentityResolver(nn.Module):
    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        return feats


def configure_feature_resolver(config, dtype=jnp.float32):
    """Build from MODEL.FEATURE_RESOLVER (resolvers/utils.py:15)."""
    from linnaeus_tpu.models.factory import RESOLVER_REGISTRY

    rtype = str(config.MODEL.FEATURE_RESOLVER.TYPE)
    params = config.MODEL.FEATURE_RESOLVER.get("PARAMETERS", {})
    cls = RESOLVER_REGISTRY.get(rtype)
    if cls is None:
        raise ValueError(f"Unknown resolver TYPE '{rtype}'")
    if rtype in ("LearnedProjection", "AdaptivePooling"):
        return cls(projection_dim=int(params.get("projection_dim", 512)), dtype=dtype)
    return cls()
