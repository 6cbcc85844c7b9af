"""LinnaeusInferenceHandler — load artifacts, predict, info.

Reference parity: inference/handler.py:37-300. ``load_from_artifacts``
assembles config + taxonomy + class maps + weights; ``predict`` preprocesses
images/metadata, runs one jitted forward, produces per-task softmax top-k as
typus-shaped ``HierarchicalClassificationResult``s with optional
hierarchical-consistency enforcement; ``info`` describes the model.

The forward is compiled once per (batch size) and padded to the configured
max batch so serving never recompiles.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from linnaeus_tpu.utils.logging import get_main_logger
from .artifacts import (
    ClassIndexMapData,
    TaxonomyData,
    load_class_index_maps_artifact,
    load_taxonomy_tree_artifact,
    rank_level_from_task_key,
)
from .config import InferenceConfig, load_inference_config
from .model_utils import load_model_for_inference
from .postprocessing import enforce_hierarchical_consistency
from .preprocessing import preprocess_image_batch, preprocess_metadata_batch
from .schemas import (
    HierarchicalClassificationResult,
    InferenceRequestMetadata,
    ModelInformation,
    TaskPrediction,
)

logger = get_main_logger()


def _resolve_data_parallel(spec, n_devices: int, batch_size: int) -> int:
    """'auto' -> the largest device count <= n_devices dividing batch_size;
    an int -> validated as-is; 1/'off' -> single device."""
    if spec in (1, "1", "off", False, None):
        return 1
    if spec == "auto":
        d = n_devices
        while d > 1 and batch_size % d:
            d -= 1
        return d
    d = int(spec)
    if d < 1 or d > n_devices:
        raise ValueError(
            f"data_parallel={spec} but only {n_devices} devices are visible"
        )
    if batch_size % d:
        raise ValueError(
            f"data_parallel={d} must divide inference batch_size={batch_size}"
        )
    return d


class LinnaeusInferenceHandler:
    def __init__(
        self,
        config: InferenceConfig,
        model,
        variables: dict,
        taxonomy_data: TaxonomyData,
        class_maps: ClassIndexMapData,
    ):
        import jax

        self.config = config
        self.model = model
        self.variables = variables
        self.taxonomy = taxonomy_data
        self.class_maps = class_maps
        self.task_keys = list(config.model.model_task_keys_ordered)
        self._max_batch = int(config.inference_options.batch_size)

        def forward(variables, images, aux):
            outputs = model.apply(variables, images, aux, deterministic=True)
            return {
                t: jax.nn.softmax(outputs[t].astype(jax.numpy.float32), axis=-1)
                for t in self.task_keys
            }

        # Data-parallel serving: shard the padded batch over a 1-axis mesh
        # (weights replicated, rows split — per-sample compute has no
        # cross-batch reduction, so results are identical to one device).
        # The padded batch is always exactly ``batch_size`` rows, so the
        # divisibility check at resolve time guarantees even shards.
        self._dp = _resolve_data_parallel(
            config.inference_options.data_parallel,
            len(jax.devices()),
            self._max_batch,
        )
        if self._dp > 1:
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            mesh = Mesh(np.asarray(jax.devices()[: self._dp]), ("data",))
            rep = NamedSharding(mesh, P())
            rows = NamedSharding(mesh, P("data"))
            self._forward = jax.jit(
                forward, in_shardings=(rep, rows, rows), out_shardings=rep
            )
            logger.info(
                f"inference: data-parallel over {self._dp} devices "
                f"(batch {self._max_batch} -> {self._max_batch // self._dp}/device)"
            )
        else:
            self._forward = jax.jit(forward)

    # ----------------------------------------------------------- constructors
    @classmethod
    def load_from_artifacts(
        cls,
        config_path: str | Path,
        artifacts_dir: str | Path | None = None,
    ) -> "LinnaeusInferenceHandler":
        config = load_inference_config(config_path)
        base = Path(artifacts_dir) if artifacts_dir else Path(config_path).parent

        def resolve(p: str) -> str:
            path = Path(p)
            return str(path if path.is_absolute() else base / path)

        taxonomy_data = load_taxonomy_tree_artifact(
            resolve(config.taxonomy_data.taxonomy_tree_path),
            config.taxonomy_data.source_name,
            config.taxonomy_data.version,
            config.taxonomy_data.root_identifier,
        )
        class_maps = load_class_index_maps_artifact(
            resolve(config.taxonomy_data.class_index_map_path),
            config.model.model_task_keys_ordered,
            config.model.num_classes_per_task,
            config.model.null_class_indices,
        )
        weights = config.model.weights_path
        if not weights.startswith("hf://") and not Path(weights).is_absolute():
            config.model.weights_path = resolve(weights)
        model, variables = load_model_for_inference(
            config, taxonomy_tree=taxonomy_data.taxonomy_tree
        )
        return cls(config, model, variables, taxonomy_data, class_maps)

    # ------------------------------------------------------------------ predict
    def predict(
        self,
        images: list[Any],
        metadata: list[dict[str, Any] | None] | None = None,
        request_options: (
            InferenceRequestMetadata | list[InferenceRequestMetadata | None] | None
        ) = None,
    ) -> list[HierarchicalClassificationResult]:
        """request_options: one InferenceRequestMetadata applied to every
        sample, or a per-sample list (the reference's api_schemas.py models
        per-sample top_k / aux overrides)."""
        import jax.numpy as jnp

        default_k = self.config.inference_options.default_top_k
        if isinstance(request_options, list):
            per_sample = list(request_options)
            if len(per_sample) != len(images):
                raise ValueError(
                    f"request_options list length {len(per_sample)} != "
                    f"number of images {len(images)}"
                )
        else:
            per_sample = [request_options] * len(images)

        results: list[HierarchicalClassificationResult] = []
        bs = self._max_batch
        for start in range(0, len(images), bs):
            chunk = images[start : start + bs]
            metas = metadata[start : start + bs] if metadata else None
            opts = per_sample[start : start + bs]
            pixels = preprocess_image_batch(chunk, self.config)
            aux = preprocess_metadata_batch(metas, len(chunk), self.config)
            for i, o in enumerate(opts):
                if o is not None and o.aux_override is not None:
                    aux[i] = np.asarray(o.aux_override, np.float32)
            # pad to the compiled batch size (no recompiles while serving)
            n = len(chunk)
            if n < bs:
                pixels = np.concatenate(
                    [pixels, np.zeros((bs - n,) + pixels.shape[1:], pixels.dtype)]
                )
                aux = np.concatenate(
                    [aux, np.zeros((bs - n,) + aux.shape[1:], aux.dtype)]
                )
            probs = self._forward(
                self.variables, jnp.asarray(pixels), jnp.asarray(aux)
            )
            probs = {t: np.asarray(v)[:n] for t, v in probs.items()}
            for i in range(n):
                o = opts[i]
                top_k = o.top_k if (o is not None and o.top_k) else default_k
                results.append(self._build_result(probs, i, top_k))
        return results

    def _build_result(
        self, probs: dict[str, np.ndarray], i: int, top_k: int
    ) -> HierarchicalClassificationResult:
        tasks = []
        for t in self.task_keys:
            rank = rank_level_from_task_key(t)
            p = probs[t][i]
            k = min(top_k, len(p))
            top_idx = np.argsort(-p)[:k]
            idx_map = self.class_maps.idx_to_taxon_id.get(rank, {})
            preds = [
                (int(idx_map.get(int(ci), int(ci))), float(p[ci])) for ci in top_idx
            ]
            tasks.append(
                TaskPrediction(rank_level=rank, task_key=t, predictions=preds)
            )
        result = HierarchicalClassificationResult(
            taxonomy_context={
                "source": self.taxonomy.source,
                "version": self.taxonomy.version,
                "root": self.taxonomy.root_id,
            },
            tasks=tasks,
        )
        if self.config.inference_options.enable_hierarchical_consistency_check:
            result = enforce_hierarchical_consistency(
                result, self.taxonomy, self.class_maps
            )
        # genuine typus models when the optional dep is installed
        # (reference returns typus HCRs, handler.py:215-231)
        from linnaeus_tpu.inference.schemas import maybe_to_typus

        return maybe_to_typus(result)

    # ------------------------------------------------------------------- info
    def info(self) -> ModelInformation:
        mc = self.config.metadata_preprocessing
        return ModelInformation(
            handler_version=self.config.inference_options.handler_version,
            architecture_name=self.config.model.architecture_name,
            model_description=self.config.model_description,
            task_keys=self.task_keys,
            num_classes_per_task=list(self.config.model.num_classes_per_task),
            input_image_size=list(self.config.input_preprocessing.image_size),
            metadata_components={
                "temporal": mc.use_temporal,
                "geolocation": mc.use_geolocation,
                "elevation": mc.use_elevation,
            },
            taxonomy_source=self.config.taxonomy_data.source_name,
            default_top_k=self.config.inference_options.default_top_k,
        )
