"""Pydantic configuration for the inference handler.

Reference parity: inference/config.py:12-120 — same section structure
(ModelConfig / InputConfig / MetaConfig / TaxonomyConfig /
InferenceOptionsConfig) so existing inference-bundle YAMLs load unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import yaml
from pydantic import BaseModel, Field, field_validator


class ModelConfig(BaseModel):
    architecture_name: str = Field(
        description="Model architecture name (e.g., mFormerV1_sm)."
    )
    architecture_variant_config_path: str | None = None
    weights_path: str = Field(
        description="Path or 'hf://org/repo/...' ID for model weights "
        "(an Orbax/msgpack checkpoint)."
    )
    model_task_keys_ordered: list[str] = Field(
        description="Ordered list of task keys the model predicts."
    )
    num_classes_per_task: list[int] = Field(
        description="Number of classes (incl. null) per task, same order."
    )
    null_class_indices: dict[str, int] = Field(
        description="task key -> null class index (typically 0)."
    )
    expected_aux_vector_length: int | None = None


class InputConfig(BaseModel):
    image_size: list[int] = Field(default=[3, 224, 224])
    image_mean: list[float] = Field(default=[0.485, 0.456, 0.406])
    image_std: list[float] = Field(default=[0.229, 0.224, 0.225])
    image_interpolation: str = "bilinear"

    @field_validator("image_size")
    @classmethod
    def check_image_size(cls, v):
        if not (len(v) == 3 and v[0] in (1, 3)):
            raise ValueError("image_size must be [C, H, W] with C in {1, 3}")
        return v


class MetaConfig(BaseModel):
    use_geolocation: bool = True
    use_temporal: bool = True
    temporal_use_julian_day: bool = False
    temporal_use_hour: bool = False
    use_elevation: bool = True
    elevation_scales: list[float] = Field(default=[100.0, 1000.0, 5000.0])


class TaxonomyConfig(BaseModel):
    source_name: str = "CoL2024"
    version: str | None = None
    root_identifier: Any | None = None
    taxonomy_tree_path: str
    class_index_map_path: str


class InferenceOptionsConfig(BaseModel):
    default_top_k: int = Field(5, gt=0)
    device: str = "auto"
    batch_size: int = Field(8, gt=0)
    enable_hierarchical_consistency_check: bool = True
    handler_version: str = "0.1.0"
    artifacts_source_uri: str | None = None
    # Data-parallel serving over a 1-axis device mesh (beyond-reference:
    # the torch handler is single-device). "auto" uses the largest device
    # count that divides batch_size (1 on a single chip); an int forces
    # that many devices (must divide batch_size); 1 disables.
    data_parallel: int | str = "auto"


class InferenceConfig(BaseModel):
    model: ModelConfig
    input_preprocessing: InputConfig
    metadata_preprocessing: MetaConfig
    taxonomy_data: TaxonomyConfig
    inference_options: InferenceOptionsConfig
    model_description: str | None = None

    def aux_vector_length(self) -> int:
        """Packed aux width: the explicit override, else derived from the
        enabled metadata components (single source of truth for model init,
        warmup, and preprocessing padding)."""
        if self.model.expected_aux_vector_length is not None:
            return int(self.model.expected_aux_vector_length)
        mc = self.metadata_preprocessing
        return (
            (4 if mc.temporal_use_hour else 2) * int(mc.use_temporal)
            + 3 * int(mc.use_geolocation)
            + 2 * len(mc.elevation_scales) * int(mc.use_elevation)
        )


def load_inference_config(config_path: str | Path) -> InferenceConfig:
    config_path = Path(config_path)
    if not config_path.is_file():
        raise FileNotFoundError(f"Inference config not found: {config_path}")
    with open(config_path) as f:
        raw = yaml.safe_load(f)
    return InferenceConfig(**raw)
