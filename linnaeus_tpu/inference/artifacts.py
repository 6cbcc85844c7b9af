"""Artifact loaders: taxonomy tree + class-index maps.

Reference parity: inference/artifacts.py:18-150. Rank levels are plain ints
(the numeric part of 'taxa_L{n}'); the optional ``typus`` package's RankLevel
enum maps 1:1 onto these values.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from pydantic import BaseModel, ConfigDict

from linnaeus_tpu.utils.taxonomy import TaxonomyTree


def rank_level_from_task_key(task_key: str) -> int:
    """'taxa_L10' -> 10 (typus RankLevel integer value)."""
    numeric = task_key.split("_L")[-1].replace("_", "").replace(".", "")
    return int("".join(ch for ch in numeric if ch.isdigit()))


class TaxonomyData(BaseModel):
    model_config = ConfigDict(arbitrary_types_allowed=True)

    taxonomy_tree: TaxonomyTree
    source: str
    version: str | None = None
    root_id: Any | None = None
    linnaeus_task_keys: list[str]


class ClassIndexMapData(BaseModel):
    """Per-rank class-index <-> taxon-id maps (rank keyed by int level)."""

    idx_to_taxon_id: dict[int, dict[int, int]]
    taxon_id_to_idx: dict[int, dict[int, int]]
    null_taxon_ids: dict[int, int]
    num_classes_per_rank: dict[int, int]


def load_taxonomy_tree_artifact(
    taxonomy_file_path: str | Path,
    taxonomy_source_name: str = "unknown",
    taxonomy_version_name: str | None = None,
    taxonomy_root_identifier: Any | None = None,
) -> TaxonomyData:
    path = Path(taxonomy_file_path)
    if not path.is_file():
        raise FileNotFoundError(f"Taxonomy tree file not found: {path}")
    tree = TaxonomyTree.load(str(path))
    return TaxonomyData(
        taxonomy_tree=tree,
        source=taxonomy_source_name,
        version=taxonomy_version_name,
        root_id=taxonomy_root_identifier,
        linnaeus_task_keys=tree.task_keys,
    )


def load_class_index_maps_artifact(
    class_map_file_path: str | Path,
    model_linnaeus_task_keys_ordered: list[str],
    num_classes_per_task: list[int],
    null_class_indices: dict[str, int],
) -> ClassIndexMapData:
    """Load {task_key: {class_idx_str: taxon_id}} JSON into rank-keyed maps."""
    path = Path(class_map_file_path)
    if not path.is_file():
        raise FileNotFoundError(f"Class index map file not found: {path}")
    with open(path) as f:
        raw = json.load(f)

    idx_to_taxon: dict[int, dict[int, int]] = {}
    taxon_to_idx: dict[int, dict[int, int]] = {}
    null_taxon_ids: dict[int, int] = {}
    num_classes: dict[int, int] = {}
    for task_key, n_cls in zip(model_linnaeus_task_keys_ordered, num_classes_per_task):
        rank = rank_level_from_task_key(task_key)
        task_map = raw.get(task_key, {})
        fwd = {int(k): int(v) for k, v in task_map.items()}
        idx_to_taxon[rank] = fwd
        taxon_to_idx[rank] = {v: k for k, v in fwd.items()}
        num_classes[rank] = int(n_cls)
        null_idx = int(null_class_indices.get(task_key, 0))
        null_taxon_ids[rank] = fwd.get(null_idx, 0)
    return ClassIndexMapData(
        idx_to_taxon_id=idx_to_taxon,
        taxon_id_to_idx=taxon_to_idx,
        null_taxon_ids=null_taxon_ids,
        num_classes_per_rank=num_classes,
    )
