"""LinnaeusInferenceHandler — load artifacts, predict, info.

Reference parity: inference/handler.py:37-300. ``load_from_artifacts``
assembles config + taxonomy + class maps + weights; ``predict`` preprocesses
images/metadata, runs one jitted forward, produces per-task softmax top-k as
typus-shaped ``HierarchicalClassificationResult``s with optional
hierarchical-consistency enforcement; ``info`` describes the model.

The forward takes uint8 pixels (normalization fused on device), computes
top-k on device, and returns ONE packed buffer per call (a single host
fetch — per-RPC latency dominates on remote chips). Batches pad to the
smallest power-of-two bucket; each (bucket, k) pair compiles once and
caches, so steady serving never recompiles.
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

# predict_async keeps at most this many dispatched-but-unfetched max-batch
# chunks on the device (see the comment in predict_async).
_MAX_INFLIGHT_CHUNKS = 2


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
        self._n_classes = [int(n) for n in config.model.num_classes_per_task]

        mean = np.asarray(config.input_preprocessing.image_mean, np.float32)
        std = np.asarray(config.input_preprocessing.image_std, np.float32)

        # Remote/tunneled-chip serving economics (measured,
        # docs/performance.md serving-latency section): each host<->device
        # round trip costs ~0.5-0.7 s regardless of size, so the forward
        # (a) takes UINT8 pixels and normalizes on device (4x less upload
        # than f32 — same design as the training loader), (b) computes
        # top-k ON DEVICE and packs every task's (values, indices) into ONE
        # f32 buffer so the host does exactly one fetch (indices are exact
        # in f32 up to 2^24 classes), and (c) runs at the smallest padded
        # batch bucket >= the live batch instead of always max_batch.
        # k is static: a new (bucket, k) pair compiles once, then caches.
        def forward(variables, images_u8, aux, k: int):
            jnp = jax.numpy
            x = images_u8.astype(jnp.float32) / 255.0
            x = (x - mean.reshape(1, 1, 1, -1)) / std.reshape(1, 1, 1, -1)
            outputs = model.apply(variables, x, aux, deterministic=True)
            packed = []
            for t, n_t in zip(self.task_keys, self._n_classes):
                p = jax.nn.softmax(outputs[t].astype(jnp.float32), axis=-1)
                k_t = min(k, n_t)
                vals, idx = jax.lax.top_k(p, k_t)
                if k_t < k:  # pad to the common k for one rectangular pack
                    pad = ((0, 0), (0, k - k_t))
                    vals = jnp.pad(vals, pad, constant_values=-1.0)
                    idx = jnp.pad(idx, pad, constant_values=0)
                packed.append(vals)
                packed.append(idx.astype(jnp.float32))
            return jnp.stack(packed, axis=1)  # (B, 2*n_tasks, k)

        # Data-parallel serving: shard the padded batch over a 1-axis mesh
        # (weights replicated, rows split — per-sample compute has no
        # cross-batch reduction, so results are identical to one device).
        # Batch buckets are multiples of the device count, so shards stay
        # even at every bucket size.
        self._dp = _resolve_data_parallel(
            config.inference_options.data_parallel,
            len(jax.devices()),
            self._max_batch,
        )
        self._forward_fns: dict[int, Any] = {}
        if self._dp > 1:
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            mesh = Mesh(np.asarray(jax.devices()[: self._dp]), ("data",))
            rep = NamedSharding(mesh, P())
            rows = NamedSharding(mesh, P("data"))

            def make_forward(k: int):
                return jax.jit(
                    lambda v, im, ax: forward(v, im, ax, k),
                    in_shardings=(rep, rows, rows), out_shardings=rep,
                )

            logger.info(
                f"inference: data-parallel over {self._dp} devices "
                f"(batch {self._max_batch} -> {self._max_batch // self._dp}/device)"
            )
            param_sharding = rep
        else:
            def make_forward(k: int):
                return jax.jit(lambda v, im, ax: forward(v, im, ax, k))

            param_sharding = jax.devices()[0]

        self._make_forward = make_forward
        # Pin the weights on device ONCE. msgpack restore yields host numpy
        # arrays, and jit re-uploads host operands on EVERY call — measured
        # 2.4 s/forward for the 121 MB sm param tree through the tunnel,
        # which silently dominated serving latency (docs/performance.md).
        self.variables = jax.device_put(self.variables, param_sharding)

    def _forward(self, variables, images, aux, k: int):
        fn = self._forward_fns.get(k)
        if fn is None:
            fn = self._forward_fns[k] = self._make_forward(k)
        return fn(variables, images, aux)

    def warmup(self) -> int:
        """Pre-compile every batch bucket at the default top-k so steady
        serving never hits a lazy compile (a mid-traffic bucket compile
        shows up as a multi-second p99 outlier on remote chips). Returns
        the number of buckets warmed. Call at server start (tools/serve.py
        does)."""
        c, h, w = self.config.input_preprocessing.image_size
        aux_dim = self.config.aux_vector_length()
        k = self.config.inference_options.default_top_k
        warmed = 0
        b = max(self._dp, 1)
        buckets = []
        while b < self._max_batch:
            buckets.append(b)
            b *= 2
        buckets.append(self._max_batch)
        import jax.numpy as jnp

        for b in buckets:
            out = self._forward(
                self.variables,
                jnp.zeros((b, h, w, c), jnp.uint8),
                jnp.zeros((b, aux_dim), jnp.float32),
                int(k),
            )
            np.asarray(out)  # force completion (remote clients report early)
            warmed += 1
        return warmed

    def _bucket(self, n: int) -> int:
        """Smallest padded batch size >= n: powers of two (multiples of the
        data-parallel width when sharded), capped at the configured max."""
        step = max(self._dp, 1)
        b = step
        while b < n:
            b *= 2
        return min(b, self._max_batch)

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
        return self.predict_async(images, metadata, request_options)()

    def predict_async(
        self,
        images: list[Any],
        metadata: list[dict[str, Any] | None] | None = None,
        request_options: (
            InferenceRequestMetadata | list[InferenceRequestMetadata | None] | None
        ) = None,
    ):
        """Preprocess and DISPATCH the forward(s), returning a zero-argument
        finisher that blocks on the device result and builds the
        ``HierarchicalClassificationResult`` list. Dispatch-side errors
        (decode failures, bad options) raise here; device-side errors
        surface from the finisher. Lets a serving loop overlap the next
        batch's host work with the current batch's device execution (the
        MicroBatcher's pipelined mode).

        request_options: one InferenceRequestMetadata applied to every
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

        bs = self._max_batch
        # Bound in-flight device work: at most _MAX_INFLIGHT_CHUNKS
        # dispatched-but-unfetched chunks at a time. A bulk predict() over a
        # long image list would otherwise upload EVERY chunk's pixels and
        # keep every packed output alive in HBM before the first fetch —
        # device OOM at a few thousand 384px images. A window of 2 keeps
        # the dispatch/fetch overlap (the point of predict_async) with a
        # fixed memory ceiling; rows already fetched land in `completed`.
        completed: list[tuple[np.ndarray, int, list, int]] = []
        dispatched: list[tuple[Any, int, list, int]] = []

        def drain_oldest():
            out, n, opts, k = dispatched.pop(0)
            completed.append((np.asarray(out)[:n], n, opts, k))

        for start in range(0, len(images), bs):
            chunk = images[start : start + bs]
            metas = metadata[start : start + bs] if metadata else None
            opts = per_sample[start : start + bs]
            pixels = preprocess_image_batch(chunk, self.config, as_uint8=True)
            aux = preprocess_metadata_batch(metas, len(chunk), self.config)
            for i, o in enumerate(opts):
                if o is not None and o.aux_override is not None:
                    aux[i] = np.asarray(o.aux_override, np.float32)
            # pad to the smallest compiled batch bucket (each bucket
            # compiles once; no recompiles while serving at steady load)
            n = len(chunk)
            bucket = self._bucket(n)
            if n < bucket:
                pixels = np.concatenate(
                    [pixels,
                     np.zeros((bucket - n,) + pixels.shape[1:], pixels.dtype)]
                )
                aux = np.concatenate(
                    [aux, np.zeros((bucket - n,) + aux.shape[1:], aux.dtype)]
                )
            # device-side top-k: k covers the largest per-sample request,
            # rounded up to the default (or a power of two above it) so
            # distinct compiled k values stay rare
            want_k = max(
                [default_k]
                + [o.top_k for o in opts if o is not None and o.top_k]
            )
            k = default_k
            while k < want_k:
                k *= 2
            k = min(k, max(self._n_classes))
            # drain BEFORE dispatching so at most _MAX_INFLIGHT_CHUNKS
            # packed outputs are ever live in HBM (the documented ceiling)
            while len(dispatched) >= _MAX_INFLIGHT_CHUNKS:
                drain_oldest()
            out = self._forward(self.variables, jnp.asarray(pixels),
                                jnp.asarray(aux), int(k))  # async dispatch
            dispatched.append((out, n, opts, k))

        def finish() -> list[HierarchicalClassificationResult]:
            while dispatched:
                drain_oldest()
            results: list[HierarchicalClassificationResult] = []
            for packed_all, n, opts, k in completed:
                # ONE host fetch per chunk: (n, 2*n_tasks, k)
                packed = packed_all
                for i in range(n):
                    o = opts[i]
                    top_k = o.top_k if (o is not None and o.top_k) else default_k
                    results.append(
                        self._build_result(packed[i], min(top_k, k))
                    )
            return results

        return finish

    def _build_result(
        self, packed_row: np.ndarray, top_k: int
    ) -> HierarchicalClassificationResult:
        """packed_row: (2*n_tasks, k) — per task, its top-k values row then
        its indices row (f32-encoded), as packed by the jitted forward."""
        tasks = []
        for ti, (t, n_t) in enumerate(zip(self.task_keys, self._n_classes)):
            rank = rank_level_from_task_key(t)
            vals = packed_row[2 * ti]
            idx = packed_row[2 * ti + 1]
            k = min(top_k, n_t)
            idx_map = self.class_maps.idx_to_taxon_id.get(rank, {})
            preds = [
                (int(idx_map.get(int(ci), int(ci))), float(v))
                for v, ci in zip(vals[:k], idx[:k])
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
