"""Model construction + weight loading for inference.

Reference parity: inference/model_utils.py:20-200 (pydantic -> build config
bridge, local / HF Hub weights). Weight formats supported:
  * a flax msgpack file (``.msgpack``) holding {'params': ..., optionally
    'batch_stats': ...}
  * a training checkpoint directory produced by utils/checkpoint.py (Orbax)
  * ``hf://org/repo/path`` via huggingface_hub when available
"""

from __future__ import annotations

import os
from typing import Any

from linnaeus_tpu.configuration import get_default_config
from linnaeus_tpu.configuration.archs import apply_arch
from linnaeus_tpu.models.build import build_model
from linnaeus_tpu.utils.logging import get_main_logger
from .config import InferenceConfig

logger = get_main_logger()


def _resolve_weights_path(weights_path: str, cache_dir: str | None = None) -> str:
    if weights_path.startswith("hf://"):
        from huggingface_hub import hf_hub_download

        rest = weights_path[len("hf://"):]
        parts = rest.split("/")
        repo_id = "/".join(parts[:2])
        filename = "/".join(parts[2:])
        return hf_hub_download(repo_id, filename, cache_dir=cache_dir)
    return weights_path


def build_config_for_inference(inf_cfg: InferenceConfig):
    """pydantic InferenceConfig -> training-style config for build_model."""
    cfg = get_default_config()
    cfg.DATA.TASK_KEYS_H5 = list(inf_cfg.model.model_task_keys_ordered)
    c, h, w = inf_cfg.input_preprocessing.image_size
    cfg.MODEL.IMG_SIZE = h
    cfg.MODEL.IN_CHANS = c
    cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = False
    arch = inf_cfg.model.architecture_name
    try:
        apply_arch(cfg, arch)
    except ValueError:
        logger.warning(f"Unknown arch preset '{arch}'; relying on variant config")
    if inf_cfg.model.architecture_variant_config_path:
        from linnaeus_tpu.configuration.utils import load_config, merge_configs

        variant = load_config(inf_cfg.model.architecture_variant_config_path)
        cfg = merge_configs(cfg, variant)
    # mFormerV1_sm defaults to 3 meta components in the presets; align the
    # enabled components with the inference MetaConfig
    mc = inf_cfg.metadata_preprocessing
    cfg.DATA.META.COMPONENTS.TEMPORAL.ENABLED = bool(mc.use_temporal)
    cfg.DATA.META.COMPONENTS.TEMPORAL.DIM = 4 if mc.temporal_use_hour else 2
    cfg.DATA.META.COMPONENTS.SPATIAL.ENABLED = bool(mc.use_geolocation)
    cfg.DATA.META.COMPONENTS.SPATIAL.DIM = 3
    cfg.DATA.META.COMPONENTS.ELEVATION.ENABLED = bool(mc.use_elevation)
    cfg.DATA.META.COMPONENTS.ELEVATION.DIM = 2 * len(mc.elevation_scales)
    return cfg


def load_model_for_inference(
    inf_cfg: InferenceConfig,
    taxonomy_tree=None,
    cache_dir: str | None = None,
) -> tuple[Any, dict]:
    """Returns (model, variables)."""
    import jax
    import jax.numpy as jnp

    cfg = build_config_for_inference(inf_cfg)
    num_classes = dict(
        zip(
            inf_cfg.model.model_task_keys_ordered,
            inf_cfg.model.num_classes_per_task,
        )
    )
    model = build_model(cfg, num_classes=num_classes, taxonomy_tree=taxonomy_tree)

    weights_path = _resolve_weights_path(
        inf_cfg.model.weights_path, cache_dir=cache_dir
    )

    c, h, w = inf_cfg.input_preprocessing.image_size
    meta_dim = inf_cfg.aux_vector_length()
    init_vars = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, c)),
        jnp.zeros((1, meta_dim)) if meta_dim else None,
    )

    if weights_path.endswith(".msgpack"):
        from flax.serialization import from_bytes

        with open(weights_path, "rb") as f:
            variables = from_bytes(init_vars, f.read())
    elif os.path.isdir(weights_path):
        from linnaeus_tpu.utils import checkpoint as ckpt

        with_state = os.path.join(weights_path, ckpt.STATE_DIR)
        if os.path.isdir(with_state):
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(
                    os.path.abspath(with_state),
                    jax.tree.map(
                        ocp.utils.to_shape_dtype_struct,
                        {
                            "params": init_vars["params"],
                            **(
                                {"batch_stats": init_vars["batch_stats"]}
                                if "batch_stats" in init_vars
                                else {}
                            ),
                        },
                    ),
                    partial_restore=True,
                )
            variables = {"params": restored["params"]}
            if "batch_stats" in restored:
                variables["batch_stats"] = restored["batch_stats"]
        else:
            raise FileNotFoundError(f"No checkpoint state in {weights_path}")
    else:
        raise ValueError(f"Unsupported weights format: {weights_path}")

    logger.info(f"Loaded inference weights from {weights_path}")
    return model, variables
