"""Decorator registries for models / heads / attention / aggregation / resolvers.

Mirrors the reference factory pattern (models/model_factory.py:111-243) —
the registry maps a TYPE string from config to a builder. Builders here
produce Flax modules (``flax.linen.Module`` subclasses) rather than torch
``nn.Module``s, but the dispatch surface is identical: ``create_model``,
``register_model``, ``list_models`` etc.
"""

from __future__ import annotations

from typing import Any, Callable

from linnaeus_tpu.utils.logging import get_main_logger

logger = get_main_logger()

MODEL_REGISTRY: dict[str, Callable] = {}
HEAD_REGISTRY: dict[str, Callable] = {}
ATTENTION_REGISTRY: dict[str, Callable] = {}
AGGREGATION_REGISTRY: dict[str, Callable] = {}
RESOLVER_REGISTRY: dict[str, Callable] = {}

_REGISTRIES = {
    "model": MODEL_REGISTRY,
    "head": HEAD_REGISTRY,
    "attention": ATTENTION_REGISTRY,
    "aggregation": AGGREGATION_REGISTRY,
    "resolver": RESOLVER_REGISTRY,
}


def _register(kind: str, name: str):
    registry = _REGISTRIES[kind]

    def decorator(cls_or_fn):
        if name in registry:
            logger.warning(f"Overwriting {kind} registry entry '{name}'")
        registry[name] = cls_or_fn
        return cls_or_fn

    return decorator


def register_model(name: str):
    return _register("model", name)


def register_head(name: str):
    return _register("head", name)


def register_attention(name: str):
    return _register("attention", name)


def register_aggregation(name: str):
    return _register("aggregation", name)


def register_resolver(name: str):
    return _register("resolver", name)


def create_model(model_type: str, *args: Any, **kwargs: Any):
    if model_type not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model type '{model_type}'. Available: {list_models()}"
        )
    return MODEL_REGISTRY[model_type](*args, **kwargs)


def create_head(head_type: str, *args: Any, **kwargs: Any):
    if head_type not in HEAD_REGISTRY:
        raise ValueError(f"Unknown head type '{head_type}'. Available: {list_heads()}")
    return HEAD_REGISTRY[head_type](*args, **kwargs)


def create_attention(name: str, *args: Any, **kwargs: Any):
    if name not in ATTENTION_REGISTRY:
        raise ValueError(
            f"Unknown attention type '{name}'. Available: {sorted(ATTENTION_REGISTRY)}"
        )
    return ATTENTION_REGISTRY[name](*args, **kwargs)


def create_aggregation(name: str, *args: Any, **kwargs: Any):
    if name not in AGGREGATION_REGISTRY:
        raise ValueError(
            f"Unknown aggregation type '{name}'. "
            f"Available: {sorted(AGGREGATION_REGISTRY)}"
        )
    return AGGREGATION_REGISTRY[name](*args, **kwargs)


def create_resolver(name: str, *args: Any, **kwargs: Any):
    if name not in RESOLVER_REGISTRY:
        raise ValueError(
            f"Unknown resolver type '{name}'. Available: {sorted(RESOLVER_REGISTRY)}"
        )
    return RESOLVER_REGISTRY[name](*args, **kwargs)


def list_models() -> list[str]:
    return sorted(MODEL_REGISTRY)


def list_heads() -> list[str]:
    return sorted(HEAD_REGISTRY)


def list_attention() -> list[str]:
    return sorted(ATTENTION_REGISTRY)


def list_aggregations() -> list[str]:
    return sorted(AGGREGATION_REGISTRY)


def list_resolvers() -> list[str]:
    return sorted(RESOLVER_REGISTRY)
