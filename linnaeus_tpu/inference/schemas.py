"""Result & request schemas (typus-compatible pydantic models).

The reference returns ``typus.models.classification.HierarchicalClassificationResult``;
these local models carry the same fields so downstream consumers (LitServe
handlers, HF demos) see the same JSON shape without requiring typus.
Reference parity: inference/api_schemas.py:11-60.
"""

from __future__ import annotations

from typing import Any

from pydantic import BaseModel, Field


class TaskPrediction(BaseModel):
    rank_level: int = Field(description="Numeric rank level (e.g., 10 for taxa_L10)")
    task_key: str = Field(description="Linnaeus task key (e.g., 'taxa_L10')")
    # list of (taxon_id, probability), sorted descending by probability
    predictions: list[tuple[int, float]]


class HierarchicalClassificationResult(BaseModel):
    taxonomy_context: dict[str, Any] = Field(default_factory=dict)
    tasks: list[TaskPrediction] = Field(default_factory=list)


class InferenceRequestMetadata(BaseModel):
    """Per-request options (reference: api_schemas.py:11)."""

    top_k: int | None = None
    aux_override: list[float] | None = None


class ModelInformation(BaseModel):
    """`info()` endpoint payload (reference: api_schemas.py:33)."""

    handler_version: str
    architecture_name: str
    model_description: str | None = None
    task_keys: list[str]
    num_classes_per_task: list[int]
    input_image_size: list[int]
    metadata_components: dict[str, bool]
    taxonomy_source: str
    default_top_k: int


def maybe_to_typus(result: HierarchicalClassificationResult):
    """Convert a local result into a GENUINE typus
    ``HierarchicalClassificationResult`` when the optional ``typus`` package
    is installed (the reference returns typus models from ``predict()``,
    inference/handler.py:203-231, so typed downstream consumers —
    LitServe handlers written for the reference — type-check). Returns the
    local clone unchanged when typus is absent.
    """
    try:
        from typus.constants import RankLevel
        from typus.models.classification import (
            HierarchicalClassificationResult as TypusHCR,
        )
        from typus.models.classification import TaskPrediction as TypusTask
        from typus.models.classification import TaxonomyContext
    except ImportError:
        return result

    tasks = [
        TypusTask(
            rank_level=RankLevel(int(t.rank_level)),
            temperature=1.0,
            predictions=[tuple(p) for p in t.predictions],
        )
        for t in result.tasks
    ]
    # reference sorts most-specific first (handler.py:218)
    tasks.sort(key=lambda t: t.rank_level.value, reverse=True)
    ctx = result.taxonomy_context
    root = ctx.get("root")
    return TypusHCR(
        taxonomy_context=TaxonomyContext(
            source=ctx.get("source"), version=ctx.get("version")
        ),
        tasks=tasks,
        subtree_roots={int(root)} if root is not None else None,
    )
