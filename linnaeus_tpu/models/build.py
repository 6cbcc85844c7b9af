"""Model construction from config (reference parity: models/build.py:52-110).

``build_model(config, num_classes=..., taxonomy_tree=...)`` resolves
MODEL.TYPE through the registry and translates the YACS-style config into the
static fields of the corresponding Flax module.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp

from linnaeus_tpu.models.factory import MODEL_REGISTRY
from linnaeus_tpu.utils.logging import get_main_logger
from linnaeus_tpu.utils.meta import get_enabled_meta_components

logger = get_main_logger()

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve_compute_dtype(config) -> jnp.dtype:
    mp = config.TRAIN.get("MIXED_PRECISION")
    if mp is not None and mp.get("ENABLED", False):
        return _DTYPES.get(str(mp.get("DTYPE", "bfloat16")), jnp.bfloat16)
    # legacy AMP_OPT_LEVEL mapping: O0 -> fp32, otherwise bf16
    if str(config.TRAIN.get("AMP_OPT_LEVEL", "O1")) != "O0":
        return jnp.bfloat16
    return jnp.float32


def _meta_component_pairs(config) -> tuple[tuple[str, int], ...]:
    return tuple(
        (name, int(cfg.get("DIM", 0)))
        for name, cfg in get_enabled_meta_components(config)
    )


def _head_configs(config, task_keys) -> dict[str, dict]:
    heads = config.MODEL.CLASSIFICATION.get("HEADS", {})
    out = {}
    for task in task_keys:
        cfg = heads.get(task)
        out[task] = dict(cfg) if isinstance(cfg, Mapping) else {"TYPE": "Linear"}
    return out


def build_model(
    config,
    num_classes: Mapping[str, int] | None = None,
    taxonomy_tree=None,
):
    """Build the Flax model declared by ``config.MODEL.TYPE``."""
    model_type = config.MODEL.TYPE
    if model_type not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown MODEL.TYPE '{model_type}'. Registered: {sorted(MODEL_REGISTRY)}"
        )

    task_keys = tuple(config.DATA.TASK_KEYS_H5)
    if num_classes is None:
        listed = list(config.MODEL.get("NUM_CLASSES", []) or [])
        if len(listed) != len(task_keys):
            raise ValueError(
                "num_classes not provided and MODEL.NUM_CLASSES does not match "
                "DATA.TASK_KEYS_H5"
            )
        num_classes = dict(zip(task_keys, listed))

    head_configs = _head_configs(config, task_keys)
    needs_tree = any(
        str(c.get("TYPE", "Linear")) in ("HierarchicalSoftmax", "ConditionalClassifier")
        for c in head_configs.values()
    )
    matrices = taxonomy_tree.build_hierarchy_matrices() if (needs_tree and taxonomy_tree) else None
    if needs_tree and matrices is None:
        raise ValueError("Hierarchical heads configured but no taxonomy_tree provided")

    if (
        bool(config.MODEL.get("MOE", {}).get("ENABLED", False))
        and model_type != "mFormerV1"
    ):
        raise ValueError(
            "MODEL.MOE.ENABLED requires MODEL.TYPE=mFormerV1 (the MoE MLP "
            "replaces RoPE-block MLPs; mFormerV0 has no MoE substrate)"
        )

    dtype = resolve_compute_dtype(config)
    img_size = config.MODEL.IMG_SIZE
    img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)

    common = dict(
        img_size=img_size,
        in_chans=int(config.MODEL.IN_CHANS),
        drop_rate=float(config.MODEL.DROP_RATE),
        attn_drop_rate=float(config.MODEL.ATTN_DROP_RATE),
        drop_path_rate=float(config.MODEL.DROP_PATH_RATE),
        only_last_cls=bool(config.MODEL.ONLY_LAST_CLS),
        meta_components=_meta_component_pairs(config),
        task_keys=task_keys,
        num_classes={k: int(v) for k, v in num_classes.items()},
        head_configs=head_configs,
        hierarchy_matrices=matrices,
        gradient_checkpointing=bool(
            config.TRAIN.GRADIENT_CHECKPOINTING.get("ENABLED_NORMAL_STEPS", False)
        ),
        act_exact=bool(config.MODEL.get("ACT_EXACT_GELU", False)),
        use_flash_attn=bool(config.MODEL.get("USE_FLASH_ATTN", False)),
        attn_fp32_softmax=bool(config.MODEL.get("ATTN_FP32_SOFTMAX", True)),
        dtype=dtype,
    )

    if model_type == "mFormerV1":
        cs = config.MODEL.CONVNEXT_STAGES
        rs = config.MODEL.ROPE_STAGES
        moe = config.MODEL.get("MOE", {})
        moe_enabled = bool(moe.get("ENABLED", False))
        model = MODEL_REGISTRY[model_type](
            moe_num_experts=int(moe.get("NUM_EXPERTS", 8)) if moe_enabled else 0,
            moe_top_k=int(moe.get("TOP_K", 2)),
            moe_capacity_factor=float(moe.get("CAPACITY_FACTOR", 1.25)),
            moe_every_n=int(moe.get("EVERY_N", 2)),
            moe_noise_std=float(moe.get("NOISE_STD", 0.0)),
            convnext_depths=tuple(cs.DEPTHS),
            convnext_dims=tuple(cs.DIMS),
            convnext_ls_init=float(cs.get("LAYER_SCALE_INIT_VALUE", 1e-6)),
            rope_depths=tuple(rs.DEPTHS),
            rope_dims=tuple(rs.DIMS),
            rope_num_heads=tuple(rs.NUM_HEADS),
            rope_mlp_ratio=tuple(float(r) for r in rs.MLP_RATIO),
            rope_theta=float(rs.get("ROPE_THETA", 10000.0)),
            rope_mixed=bool(rs.get("ROPE_MIXED", True)),
            rope_fidelity=str(config.MODEL.get("ROPE_FIDELITY", "rotate")),
            rope_deinterleave=bool(config.MODEL.get("ROPE_DEINTERLEAVE", True)),
            fused_convnext_mlp={"auto": None, "on": True, "off": False}[
                str(config.MODEL.get("FUSED_CONVNEXT_MLP", "auto")).lower()
            ],
            remat_policy=str(
                config.TRAIN.GRADIENT_CHECKPOINTING.get("POLICY", "full")
            ),
            aggregation=str(
                config.MODEL.get("AGGREGATION", {}).get("TYPE", "default")
            ),
            **common,
        )
    elif model_type == "mFormerV0":
        st = config.MODEL.get("STAGES", {})
        model = MODEL_REGISTRY[model_type](
            stage_dims=tuple(st.get("DIMS", (64, 96, 192, 384, 768))),
            mbconv_depths=tuple(st.get("MBCONV_DEPTHS", (2, 3))),
            attn_depths=tuple(st.get("ATTN_DEPTHS", (5, 2))),
            num_heads=tuple(st.get("NUM_HEADS", (8, 8))),
            mlp_ratio=tuple(float(r) for r in st.get("MLP_RATIO", (4.0, 4.0))),
            head_split=bool(config.MODEL.get("ATTN_HEAD_SPLIT", False)),
            **common,
        )
    else:
        model = MODEL_REGISTRY[model_type](**common)

    from linnaeus_tpu.utils.debug import check_debug_flag

    if check_debug_flag(config, "DEBUG.MODEL_BUILD"):
        logger.debug(f"[MODEL_BUILD] {model_type} fields: {common}")
    logger.info(f"Built model {model_type} ({config.MODEL.NAME})")
    return model
