"""Pretrained torch-checkpoint conversion into Flax params.

Reference parity: utils/checkpoint.py:117-513 — ``load_pretrained`` driven by
each model's ``pretrained_ckpt_handling_metadata``, the MetaFormer key remap
(map_metaformer_checkpoint:117), and the stitched ConvNeXt + RoPE-ViT init
for mFormerV1 (load_stitched_pretrained:216-340).

Torch tensors are converted to Flax conventions:
  * Conv2d weight OIHW -> HWIO kernel (depthwise OIHW(O=C,I=1) -> HWIO(I=1,O=C))
  * Linear weight (out, in) -> (in, out) kernel
  * LayerNorm/BatchNorm weight -> scale
Loading is non-strict: heads/meta/pos-embed params are dropped per the
model's metadata; anything unmapped keeps its random init.
"""

from __future__ import annotations


import numpy as np

from linnaeus_tpu.utils.logging import get_main_logger

logger = get_main_logger()


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "module"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return out


def convert_conv_kernel(w: np.ndarray, depthwise: bool = False) -> np.ndarray:
    """OIHW -> HWIO. Depthwise torch convs are (C, 1, H, W) -> (H, W, 1, C)."""
    if depthwise:
        return np.transpose(w, (2, 3, 1, 0))
    return np.transpose(w, (2, 3, 1, 0))


def convert_linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: list[str], value: np.ndarray, report: dict) -> None:
    node = tree
    for p in path[:-1]:
        if p not in node or not isinstance(node[p], dict):
            report["missing"].append("/".join(path))
            return
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        report["missing"].append("/".join(path))
        return
    target = node[leaf]
    if tuple(target.shape) != tuple(value.shape):
        report["shape_mismatch"].append(
            f"{'/'.join(path)}: {value.shape} -> expected {target.shape}"
        )
        return
    node[leaf] = value.astype(np.asarray(target).dtype)
    report["loaded"].append("/".join(path))


def _convnext_block_entries(src_prefix: str, dst_prefix: str):
    """(torch key suffix, flax path, converter) triples for one ConvNeXtBlock."""
    return [
        (f"{src_prefix}.dwconv.weight", [dst_prefix, "Conv_0", "kernel"],
         convert_conv_kernel),
        (f"{src_prefix}.dwconv.bias", [dst_prefix, "Conv_0", "bias"], None),
        (f"{src_prefix}.norm.weight", [dst_prefix, "LayerNorm_0", "scale"], None),
        (f"{src_prefix}.norm.bias", [dst_prefix, "LayerNorm_0", "bias"], None),
        (f"{src_prefix}.pwconv1.weight", [dst_prefix, "Dense_0", "kernel"],
         convert_linear_kernel),
        (f"{src_prefix}.pwconv1.bias", [dst_prefix, "Dense_0", "bias"], None),
        (f"{src_prefix}.pwconv2.weight", [dst_prefix, "Dense_1", "kernel"],
         convert_linear_kernel),
        (f"{src_prefix}.pwconv2.bias", [dst_prefix, "Dense_1", "bias"], None),
        (f"{src_prefix}.gamma", [dst_prefix, "gamma"], None),
    ]


def load_convnext_into_mformer_v1(
    params: dict,
    state_dict: dict[str, np.ndarray],
    convnext_depths: tuple[int, ...],
) -> dict:
    """Map ConvNeXt trunk weights (official facebookresearch layout) onto the
    mFormerV1 stem / stage1 / stage2 / downsamplers."""
    import copy

    params = copy.deepcopy(jax_to_py(params))
    report = {"loaded": [], "missing": [], "shape_mismatch": []}
    entries = [
        ("downsample_layers.0.0.weight", ["stem", "Conv_0", "kernel"],
         convert_conv_kernel),
        ("downsample_layers.0.0.bias", ["stem", "Conv_0", "bias"], None),
        ("downsample_layers.0.1.weight", ["stem", "LayerNorm_0", "scale"], None),
        ("downsample_layers.0.1.bias", ["stem", "LayerNorm_0", "bias"], None),
    ]
    for stage_idx, flax_stage in ((0, "stage1"), (1, "stage2")):
        for j in range(convnext_depths[stage_idx]):
            entries += _convnext_block_entries(
                f"stages.{stage_idx}.{j}", f"{flax_stage}_block{j}"
            )
    # downsamplers 1..3 (LN + 2x2 conv)
    for t_idx, flax_name in ((1, "downsample1"), (2, "downsample2"),
                             (3, "downsample3")):
        entries += [
            (f"downsample_layers.{t_idx}.0.weight",
             [flax_name, "LayerNorm_0", "scale"], None),
            (f"downsample_layers.{t_idx}.0.bias",
             [flax_name, "LayerNorm_0", "bias"], None),
            (f"downsample_layers.{t_idx}.1.weight",
             [flax_name, "Conv_0", "kernel"], convert_conv_kernel),
            (f"downsample_layers.{t_idx}.1.bias",
             [flax_name, "Conv_0", "bias"], None),
        ]
    _apply_entries(params, state_dict, entries, report)
    _log_report("ConvNeXt", report)
    return params


def _rope_block_entries(src_prefix: str, dst_prefix: str):
    return [
        (f"{src_prefix}.norm1.weight", [dst_prefix, "norm1", "scale"], None),
        (f"{src_prefix}.norm1.bias", [dst_prefix, "norm1", "bias"], None),
        (f"{src_prefix}.attn.qkv.weight", [dst_prefix, "attn", "qkv", "kernel"],
         convert_linear_kernel),
        (f"{src_prefix}.attn.qkv.bias", [dst_prefix, "attn", "qkv", "bias"], None),
        (f"{src_prefix}.attn.proj.weight", [dst_prefix, "attn", "proj", "kernel"],
         convert_linear_kernel),
        (f"{src_prefix}.attn.proj.bias", [dst_prefix, "attn", "proj", "bias"], None),
        (f"{src_prefix}.norm2.weight", [dst_prefix, "norm2", "scale"], None),
        (f"{src_prefix}.norm2.bias", [dst_prefix, "norm2", "bias"], None),
        (f"{src_prefix}.mlp.fc1.weight", [dst_prefix, "mlp", "Dense_0", "kernel"],
         convert_linear_kernel),
        (f"{src_prefix}.mlp.fc1.bias", [dst_prefix, "mlp", "Dense_0", "bias"], None),
        (f"{src_prefix}.mlp.fc2.weight", [dst_prefix, "mlp", "Dense_1", "kernel"],
         convert_linear_kernel),
        (f"{src_prefix}.mlp.fc2.bias", [dst_prefix, "mlp", "Dense_1", "bias"], None),
    ]


def load_ropevit_into_mformer_v1(
    params: dict,
    state_dict: dict[str, np.ndarray],
    rope_depths: tuple[int, int],
) -> dict:
    """Map RoPE-ViT (rope-vit repo layout) blocks onto stage3/stage4.

    The first rope_depths[0] source blocks fill stage3; the next
    rope_depths[1] fill stage4 where shapes allow (dim mismatches are
    reported + skipped — strict=False per pretrained_ckpt_handling_metadata).
    Learnable mixed-RoPE frequencies (``freqs`` / ``attn.freqs``) map onto the
    per-block 'freqs' param.
    """
    import copy

    params = copy.deepcopy(jax_to_py(params))
    report = {"loaded": [], "missing": [], "shape_mismatch": []}
    entries = []
    blk = 0
    for stage, depth in (("stage3", rope_depths[0]), ("stage4", rope_depths[1])):
        for j in range(depth):
            src = f"blocks.{blk}"
            dst = f"{stage}_block{j}"
            entries += _rope_block_entries(src, dst)
            for freq_key in (f"{src}.attn.freqs", f"freqs_{blk}", f"{src}.freqs"):
                if freq_key in state_dict:
                    entries.append(
                        (freq_key, [dst, "attn", "freqs"], None)
                    )
                    break
            blk += 1
    _apply_entries(params, state_dict, entries, report)
    _log_report("RoPE-ViT", report)
    return params


def load_stitched_pretrained(
    params: dict,
    convnext_path: str | None,
    ropevit_path: str | None,
    convnext_depths: tuple[int, ...] = (3, 3, 9, 3),
    rope_depths: tuple[int, int] = (5, 2),
) -> dict:
    """mFormerV1 stitched init (reference: checkpoint.py:216-340)."""
    if convnext_path:
        sd = load_torch_state_dict(convnext_path)
        params = load_convnext_into_mformer_v1(params, sd, convnext_depths)
    if ropevit_path:
        sd = load_torch_state_dict(ropevit_path)
        params = load_ropevit_into_mformer_v1(params, sd, rope_depths)
    return params


def _apply_entries(params, state_dict, entries, report):
    for src_key, dst_path, conv in entries:
        if src_key not in state_dict:
            report["missing"].append(f"src:{src_key}")
            continue
        value = state_dict[src_key]
        if hasattr(value, "detach"):  # raw torch tensor
            value = value.detach().cpu().numpy()
        value = np.asarray(value)
        if conv is not None:
            value = conv(value)
        _set(params, dst_path, value, report)


def _log_report(name: str, report: dict):
    logger.info(
        f"[pretrained:{name}] loaded {len(report['loaded'])} tensors; "
        f"{len(report['missing'])} missing, "
        f"{len(report['shape_mismatch'])} shape mismatches"
    )
    for m in report["shape_mismatch"][:10]:
        logger.warning(f"[pretrained:{name}] shape mismatch: {m}")


def jax_to_py(tree):
    """jax arrays -> numpy (deepcopy-safe plain dict tree)."""
    import jax

    return jax.tree.map(np.asarray, dict(tree))


# --------------------------------------------------------------- mFormerV0
def _bn_entries(src: str, dst: list[str]):
    return [
        (f"{src}.weight", dst + ["scale"], None),
        (f"{src}.bias", dst + ["bias"], None),
        (f"{src}.running_mean", dst + ["mean"], None),
        (f"{src}.running_var", dst + ["var"], None),
    ]


def load_metaformer_into_mformer_v0(
    params: dict,
    batch_stats: dict,
    state_dict: dict[str, np.ndarray],
    mbconv_depths: tuple[int, int] = (2, 3),
    attn_depths: tuple[int, int] = (5, 2),
    meta_names: tuple[str, ...] = (),
    task_keys: tuple[str, ...] = (),
) -> tuple[dict, dict]:
    """Map a MetaFG ("MetaFormer") torch checkpoint onto mFormerV0.

    Reference parity: utils/checkpoint.py:117 (map_metaformer_checkpoint).
    Covers: 3-conv stem (+BNs), MBConv stages (expand/depthwise/SE/project
    convs + BNs), RelativeAttention stages (patch_embed, qkv/proj,
    bias tables, MLPs), CLS tokens, meta heads, aggregator. Non-strict:
    anything absent/shape-mismatched keeps its init.
    """
    import copy

    params = copy.deepcopy(jax_to_py(params))
    batch_stats = copy.deepcopy(jax_to_py(batch_stats)) if batch_stats else {}
    p_report = {"loaded": [], "missing": [], "shape_mismatch": []}
    b_report = {"loaded": [], "missing": [], "shape_mismatch": []}

    # stem (stage_0.{0,3,6} convs + bns 1,4 + bn1)
    p_entries = [
        ("stage_0.0.weight", ["stem_conv0", "kernel"], convert_conv_kernel),
        ("stage_0.3.weight", ["stem_conv1", "kernel"], convert_conv_kernel),
        ("stage_0.6.weight", ["stem_conv2", "kernel"], convert_conv_kernel),
    ]
    b_entries = []
    for src, dst in (("stage_0.1", "stem_bn0"), ("stage_0.4", "stem_bn1"),
                     ("bn1", "bn1")):
        p_entries += [
            (f"{src}.weight", [dst, "scale"], None),
            (f"{src}.bias", [dst, "bias"], None),
        ]
        b_entries += [
            (f"{src}.running_mean", [dst, "mean"], None),
            (f"{src}.running_var", [dst, "var"], None),
        ]

    # MBConv stages
    for stage_idx, (name, depth) in enumerate(
        (("stage1", mbconv_depths[0]), ("stage2", mbconv_depths[1])), start=1
    ):
        for j in range(depth):
            src = f"stage_{stage_idx}.{j}"
            dst = f"{name}_block{j}"
            p_entries += [
                (f"{src}._expand_conv.weight",
                 [dst, "expand_conv", "kernel"], convert_conv_kernel),
                (f"{src}._depthwise_conv.weight",
                 [dst, "depthwise_conv", "kernel"],
                 lambda w: convert_conv_kernel(w, depthwise=True)),
                (f"{src}._se_reduce.weight",
                 [dst, "se", "reduce", "kernel"], convert_conv_kernel),
                (f"{src}._se_reduce.bias", [dst, "se", "reduce", "bias"], None),
                (f"{src}._se_expand.weight",
                 [dst, "se", "expand", "kernel"], convert_conv_kernel),
                (f"{src}._se_expand.bias", [dst, "se", "expand", "bias"], None),
                (f"{src}._project_conv.weight",
                 [dst, "project_conv", "kernel"], convert_conv_kernel),
            ]
            for bn_src, bn_dst in ((f"{src}._bn0", "bn0"), (f"{src}._bn1", "bn1"),
                                   (f"{src}._bn2", "bn2")):
                p_entries += [
                    (f"{bn_src}.weight", [dst, bn_dst, "scale"], None),
                    (f"{bn_src}.bias", [dst, bn_dst, "bias"], None),
                ]
                b_entries += [
                    (f"{bn_src}.running_mean", [dst, bn_dst, "mean"], None),
                    (f"{bn_src}.running_var", [dst, bn_dst, "var"], None),
                ]

    # attention stages
    for stage_idx, (name, depth) in enumerate(
        (("stage3", attn_depths[0]), ("stage4", attn_depths[1])), start=3
    ):
        for j in range(depth):
            src = f"stage_{stage_idx}.{j}"
            dst = f"{name}_block{j}"
            if j == 0:
                p_entries += [
                    (f"{src}.patch_embed.proj.weight",
                     [dst, "patch_embed", "proj", "kernel"], convert_conv_kernel),
                    (f"{src}.patch_embed.proj.bias",
                     [dst, "patch_embed", "proj", "bias"], None),
                    (f"{src}.patch_embed.norm.weight",
                     [dst, "patch_embed", "LayerNorm_0", "scale"], None),
                    (f"{src}.patch_embed.norm.bias",
                     [dst, "patch_embed", "LayerNorm_0", "bias"], None),
                ]
            p_entries += [
                (f"{src}.norm1.weight", [dst, "norm1", "scale"], None),
                (f"{src}.norm1.bias", [dst, "norm1", "bias"], None),
                (f"{src}.attn.qkv.weight",
                 [dst, "attn", "qkv", "kernel"], convert_linear_kernel),
                (f"{src}.attn.qkv.bias", [dst, "attn", "qkv", "bias"], None),
                (f"{src}.attn.proj.weight",
                 [dst, "attn", "proj", "kernel"], convert_linear_kernel),
                (f"{src}.attn.proj.bias", [dst, "attn", "proj", "bias"], None),
                (f"{src}.attn.relative_position_bias_table",
                 [dst, "attn", "relative_position_bias_table"], None),
                (f"{src}.norm2.weight", [dst, "norm2", "scale"], None),
                (f"{src}.norm2.bias", [dst, "norm2", "bias"], None),
                (f"{src}.mlp.fc1.weight",
                 [dst, "mlp", "Dense_0", "kernel"], convert_linear_kernel),
                (f"{src}.mlp.fc1.bias", [dst, "mlp", "Dense_0", "bias"], None),
                (f"{src}.mlp.fc2.weight",
                 [dst, "mlp", "Dense_1", "kernel"], convert_linear_kernel),
                (f"{src}.mlp.fc2.bias", [dst, "mlp", "Dense_1", "bias"], None),
            ]

    # norms, cls tokens, aggregator
    p_entries += [
        ("norm_1.weight", ["norm_1", "scale"], None),
        ("norm_1.bias", ["norm_1", "bias"], None),
        ("norm_2.weight", ["norm_2", "scale"], None),
        ("norm_2.bias", ["norm_2", "bias"], None),
        ("cls_token_1", ["cls_token_1"], None),
        ("cls_token_2", ["cls_token_2"], None),
        ("norm.weight", ["final_norm", "scale"], None),
        ("norm.bias", ["final_norm", "bias"], None),
        ("cl_1_fc.0.fc1.weight", ["cl_1_fc", "Dense_0", "kernel"],
         convert_linear_kernel),
        ("cl_1_fc.0.fc1.bias", ["cl_1_fc", "Dense_0", "bias"], None),
        ("cl_1_fc.0.fc2.weight", ["cl_1_fc", "Dense_1", "kernel"],
         convert_linear_kernel),
        ("cl_1_fc.0.fc2.bias", ["cl_1_fc", "Dense_1", "bias"], None),
        ("cl_1_fc.1.weight", ["cl_1_norm", "scale"], None),
        ("cl_1_fc.1.bias", ["cl_1_norm", "bias"], None),
        ("aggregate.weight", ["aggregate", "kernel"],
         lambda w: np.transpose(w[:, :, 0], (1, 0))),
        ("aggregate.bias", ["aggregate", "bias"], None),
    ]
    for s_idx in (1, 2):
        for mname in meta_names:
            src = f"meta_{mname.lower()}_head_{s_idx}"
            dst = src
            p_entries += [
                (f"{src}.0.weight", [dst, "Dense_0", "kernel"],
                 convert_linear_kernel),
                (f"{src}.0.bias", [dst, "Dense_0", "bias"], None),
                (f"{src}.2.weight", [dst, "LayerNorm_0", "scale"], None),
                (f"{src}.2.bias", [dst, "LayerNorm_0", "bias"], None),
                (f"{src}.3.w1.weight",
                 [dst, "ResNormLayer_0", "Dense_0", "kernel"],
                 convert_linear_kernel),
                (f"{src}.3.w1.bias",
                 [dst, "ResNormLayer_0", "Dense_0", "bias"], None),
                (f"{src}.3.norm_fn1.weight",
                 [dst, "ResNormLayer_0", "LayerNorm_0", "scale"], None),
                (f"{src}.3.norm_fn1.bias",
                 [dst, "ResNormLayer_0", "LayerNorm_0", "bias"], None),
                (f"{src}.3.w2.weight",
                 [dst, "ResNormLayer_0", "Dense_1", "kernel"],
                 convert_linear_kernel),
                (f"{src}.3.w2.bias",
                 [dst, "ResNormLayer_0", "Dense_1", "bias"], None),
                (f"{src}.3.norm_fn2.weight",
                 [dst, "ResNormLayer_0", "LayerNorm_1", "scale"], None),
                (f"{src}.3.norm_fn2.bias",
                 [dst, "ResNormLayer_0", "LayerNorm_1", "bias"], None),
            ]
    for task in task_keys:
        p_entries += [
            (f"head.{task}.fc.weight",
             ["head", f"head_{task}", "Dense_0", "kernel"],
             convert_linear_kernel),
            (f"head.{task}.fc.bias",
             ["head", f"head_{task}", "Dense_0", "bias"], None),
        ]

    _apply_entries(params, state_dict, p_entries, p_report)
    if batch_stats:
        _apply_entries(batch_stats, state_dict, b_entries, b_report)
    _log_report("MetaFormer", p_report)
    _log_report("MetaFormer/bn-stats", b_report)
    return params, batch_stats


# ------------------------------------------------- reference-native mFormerV1
def convert_aggregate_conv1d(w: np.ndarray) -> np.ndarray:
    """Conv1d(2->1, k=1) weight (1, 2, 1) -> Dense kernel (2, 1)."""
    return np.transpose(w[:, :, 0], (1, 0))


def _reference_v1_entries(
    convnext_depths: tuple[int, ...],
    rope_depths: tuple[int, int],
    meta_names: tuple[str, ...] = (),
    task_keys: tuple[str, ...] = (),
) -> list:
    """(torch key, flax path, converter) triples for the reference's OWN
    mFormerV1 state_dict — shared by the importer
    (:func:`load_reference_mformer_v1`) and the exporter
    (:func:`export_reference_mformer_v1`), so the mapping can never drift.

    Key layout (reference mFormerV1.py): stem.{0,1}, stages.{0,1}.{j} ConvNeXt
    blocks, downsample_layers.{0,1,2}, stages.{2,3}.{j} RoPE blocks (attn.qkv/
    proj/freqs), norm_1/norm_2, cls_token_{1,2},
    meta_{name}_head_{s}.{0=Linear,2=LN,3=ResNormLayer}, cl_1_fc.{0=Mlp,1=LN},
    aggregate (Conv1d 2->1), final_norm, head.{task}.fc.
    """
    entries = [
        ("stem.0.weight", ["stem", "Conv_0", "kernel"], convert_conv_kernel),
        ("stem.0.bias", ["stem", "Conv_0", "bias"], None),
        ("stem.1.weight", ["stem", "LayerNorm_0", "scale"], None),
        ("stem.1.bias", ["stem", "LayerNorm_0", "bias"], None),
    ]
    for stage_idx, flax_stage in ((0, "stage1"), (1, "stage2")):
        for j in range(convnext_depths[stage_idx]):
            entries += _convnext_block_entries(
                f"stages.{stage_idx}.{j}", f"{flax_stage}_block{j}"
            )
    for t_idx, flax_name in ((0, "downsample1"), (1, "downsample2"),
                             (2, "downsample3")):
        entries += [
            (f"downsample_layers.{t_idx}.norm.weight",
             [flax_name, "LayerNorm_0", "scale"], None),
            (f"downsample_layers.{t_idx}.norm.bias",
             [flax_name, "LayerNorm_0", "bias"], None),
            (f"downsample_layers.{t_idx}.conv.weight",
             [flax_name, "Conv_0", "kernel"], convert_conv_kernel),
            (f"downsample_layers.{t_idx}.conv.bias",
             [flax_name, "Conv_0", "bias"], None),
        ]
    for stage_idx, (flax_stage, depth) in (
        (2, ("stage3", rope_depths[0])), (3, ("stage4", rope_depths[1]))
    ):
        for j in range(depth):
            src = f"stages.{stage_idx}.{j}"
            dst = f"{flax_stage}_block{j}"
            entries += _rope_block_entries(src, dst)
            entries.append((f"{src}.attn.freqs", [dst, "attn", "freqs"], None))
    entries += [
        ("norm_1.weight", ["norm_1", "scale"], None),
        ("norm_1.bias", ["norm_1", "bias"], None),
        ("norm_2.weight", ["norm_2", "scale"], None),
        ("norm_2.bias", ["norm_2", "bias"], None),
        ("cls_token_1", ["cls_token_1"], None),
        ("cls_token_2", ["cls_token_2"], None),
        ("cl_1_fc.0.fc1.weight", ["cl_1_fc", "Dense_0", "kernel"],
         convert_linear_kernel),
        ("cl_1_fc.0.fc1.bias", ["cl_1_fc", "Dense_0", "bias"], None),
        ("cl_1_fc.0.fc2.weight", ["cl_1_fc", "Dense_1", "kernel"],
         convert_linear_kernel),
        ("cl_1_fc.0.fc2.bias", ["cl_1_fc", "Dense_1", "bias"], None),
        ("cl_1_fc.1.weight", ["cl_1_norm", "scale"], None),
        ("cl_1_fc.1.bias", ["cl_1_norm", "bias"], None),
        ("aggregate.weight", ["aggregate", "kernel"],
         convert_aggregate_conv1d),
        ("aggregate.bias", ["aggregate", "bias"], None),
        ("final_norm.weight", ["final_norm", "scale"], None),
        ("final_norm.bias", ["final_norm", "bias"], None),
    ]
    for s in (1, 2):
        for name in meta_names:
            src = f"meta_{name.lower()}_head_{s}"
            dst = f"meta_{name.lower()}_head_{s}"
            entries += [
                (f"{src}.0.weight", [dst, "Dense_0", "kernel"],
                 convert_linear_kernel),
                (f"{src}.0.bias", [dst, "Dense_0", "bias"], None),
                (f"{src}.2.weight", [dst, "LayerNorm_0", "scale"], None),
                (f"{src}.2.bias", [dst, "LayerNorm_0", "bias"], None),
                (f"{src}.3.w1.weight",
                 [dst, "ResNormLayer_0", "Dense_0", "kernel"],
                 convert_linear_kernel),
                (f"{src}.3.w1.bias", [dst, "ResNormLayer_0", "Dense_0", "bias"], None),
                (f"{src}.3.norm_fn1.weight",
                 [dst, "ResNormLayer_0", "LayerNorm_0", "scale"], None),
                (f"{src}.3.norm_fn1.bias",
                 [dst, "ResNormLayer_0", "LayerNorm_0", "bias"], None),
                (f"{src}.3.w2.weight",
                 [dst, "ResNormLayer_0", "Dense_1", "kernel"],
                 convert_linear_kernel),
                (f"{src}.3.w2.bias", [dst, "ResNormLayer_0", "Dense_1", "bias"], None),
                (f"{src}.3.norm_fn2.weight",
                 [dst, "ResNormLayer_0", "LayerNorm_1", "scale"], None),
                (f"{src}.3.norm_fn2.bias",
                 [dst, "ResNormLayer_0", "LayerNorm_1", "bias"], None),
            ]
    for task in task_keys:
        entries += [
            (f"head.{task}.fc.weight",
             ["head", f"head_{task}", "Dense_0", "kernel"], convert_linear_kernel),
            (f"head.{task}.fc.bias",
             ["head", f"head_{task}", "Dense_0", "bias"], None),
        ]
    return entries


def load_reference_mformer_v1(
    params: dict,
    state_dict: dict[str, np.ndarray],
    convnext_depths: tuple[int, ...],
    rope_depths: tuple[int, int],
    meta_names: tuple[str, ...] = (),
    task_keys: tuple[str, ...] = (),
) -> dict:
    """Map the reference framework's OWN mFormerV1 state_dict (torch) onto
    this framework's Flax params — used for logit-parity verification and for
    migrating checkpoints trained with the reference."""
    import copy

    params = copy.deepcopy(jax_to_py(params))
    report = {"loaded": [], "missing": [], "shape_mismatch": []}
    entries = _reference_v1_entries(
        convnext_depths, rope_depths, meta_names, task_keys
    )
    _apply_entries(params, state_dict, entries, report)
    _log_report("reference-mFormerV1", report)
    return params


# ------------------------------------------------------------- torch export
def _invert_conv_kernel(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (3, 2, 0, 1))  # HWIO -> OIHW


def _invert_linear_kernel(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (1, 0))


def _invert_aggregate_conv1d(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (1, 0))[:, :, None]  # (2,1) -> (1,2,1)


_INVERSES = {
    convert_conv_kernel: _invert_conv_kernel,
    convert_linear_kernel: _invert_linear_kernel,
    convert_aggregate_conv1d: _invert_aggregate_conv1d,
}


def export_reference_mformer_v1(
    params: dict,
    convnext_depths: tuple[int, ...],
    rope_depths: tuple[int, int],
    meta_names: tuple[str, ...] = (),
    task_keys: tuple[str, ...] = (),
) -> dict[str, np.ndarray]:
    """Inverse of :func:`load_reference_mformer_v1`: produce a torch
    state_dict (numpy values) the REFERENCE's own mFormerV1 can
    ``load_state_dict`` — the migration path back. Walks the exact same
    entry list with each layout converter inverted, so importer/exporter
    cannot drift. Leaves missing from the flax tree are skipped (the
    reference carries a few torch-only buffers)."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(jax_to_py(params), sep="/")
    out: dict[str, np.ndarray] = {}
    for torch_key, flax_path, fwd in _reference_v1_entries(
        convnext_depths, rope_depths, meta_names, task_keys
    ):
        v = flat.get("/".join(flax_path))
        if v is None:
            continue
        inv = _INVERSES.get(fwd) if fwd is not None else None
        out[torch_key] = np.asarray(inv(v) if inv else v)
    return out


# --------------------------------------------------------------------- MoE
_MOE_LEAF_TO_DENSE = {
    "wi": ("Dense_0", "kernel"),
    "bi": ("Dense_0", "bias"),
    "wo": ("Dense_1", "kernel"),
    "bo": ("Dense_1", "bias"),
}


def _moe_to_dense_walk(moe_params: dict, bank_to_dense) -> dict:
    """Rewrite every MoE expert-bank mlp subtree (router/wi/bi/wo/bo,
    models/blocks/moe.py) into the dense Dense_0/Dense_1 layout; the
    ``bank_to_dense(bank_array)`` callback decides the dense leaf value
    (zero template for loading, expert mean for export). Routers drop.
    Single walk shared by :func:`densify_moe_params` and
    :func:`average_experts_into_dense` so the path convention cannot drift.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(jax_to_py(moe_params), sep="/")
    out = {}
    for path, v in flat.items():
        leaf = path.rsplit("/", 1)[-1]
        if leaf in _MOE_LEAF_TO_DENSE and "/mlp/" in f"/{path}":
            base = path.rsplit("/", 1)[0]
            mod, name = _MOE_LEAF_TO_DENSE[leaf]
            out[f"{base}/{mod}/{name}"] = bank_to_dense(np.asarray(v))
        elif leaf == "router" and "/mlp/" in f"/{path}":
            continue
        else:
            out[path] = v
    return unflatten_dict(out, sep="/")


def densify_moe_params(moe_params: dict) -> dict:
    """Dense-MLP-shaped ZERO template for an MoE tree, so the
    torch-checkpoint loaders — which map onto the DENSE param layout — can
    run unchanged. Pair with ``upcycle_dense_to_moe`` to push the loaded
    weights back into the bank."""
    return _moe_to_dense_walk(
        moe_params, lambda bank: np.zeros(bank.shape[1:], bank.dtype)
    )


def average_experts_into_dense(moe_params: dict) -> dict:
    """Collapse each (E, ...) expert bank to its mean in the dense layout —
    the export path (exact while experts are replicas, e.g. freshly
    upcycled; a best-effort distillation otherwise)."""
    return _moe_to_dense_walk(moe_params, lambda bank: bank.mean(axis=0))


def upcycle_dense_to_moe(dense_params: dict, moe_params: dict) -> dict:
    """Sparse upcycling (Komatsuzaki et al. 2023, arXiv:2212.05055):
    initialize an MoE model from a DENSE checkpoint by replicating the
    dense MLP into every expert of each MoE block. The router keeps the MoE
    model's fresh (small trunc-normal) init — a zero router would tie-break
    every token onto experts 0..k-1 and overflow their capacity. With
    identical experts and normalized top-k gates the upcycled model's
    forward equals the dense model's exactly (up to capacity drops), so
    fine-tuning starts from dense-model quality.

    ``dense_params`` may be the matching dense twin
    (``model.clone(moe_num_experts=0)``) or the output of a checkpoint
    loader run on ``densify_moe_params(moe_params)``.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    dflat = flatten_dict(jax_to_py(dense_params), sep="/")
    mflat = flatten_dict(jax_to_py(moe_params), sep="/")
    out = {}
    n_upcycled = 0
    for path, tgt in mflat.items():
        leaf = path.rsplit("/", 1)[-1]
        if leaf in _MOE_LEAF_TO_DENSE and "/mlp/" in f"/{path}":
            base = path.rsplit("/", 1)[0]
            mod, name = _MOE_LEAF_TO_DENSE[leaf]
            src = dflat.get(f"{base}/{mod}/{name}")
            if src is None:
                raise KeyError(
                    f"upcycle: dense source missing for {path} "
                    f"(expected {base}/{mod}/{name})"
                )
            if src.shape != tgt.shape[1:]:
                raise ValueError(
                    f"upcycle: {path} expert shape {tgt.shape[1:]} != dense "
                    f"{src.shape}"
                )
            out[path] = np.broadcast_to(
                src, (tgt.shape[0],) + src.shape
            ).copy().astype(tgt.dtype)
            n_upcycled += 1
        elif leaf == "router" and "/mlp/" in f"/{path}":
            out[path] = tgt  # fresh router init
        else:
            src = dflat.get(path)
            out[path] = tgt if src is None else src.astype(tgt.dtype)
    logger.info(f"Sparse upcycling: replicated {n_upcycled} dense MLP leaves "
                "into expert banks")
    return unflatten_dict(out, sep="/")


def _is_moe_params(params: dict) -> bool:
    from flax.traverse_util import flatten_dict

    return any(
        p.rsplit("/", 1)[-1] == "wi" and "/mlp/" in f"/{p}"
        for p in flatten_dict(params, sep="/")
    )


# ------------------------------------------------------- config-driven entry
def load_pretrained(config, model, params: dict,
                    batch_stats: dict | None = None):
    """Config-driven pretrained initialization (reference:
    utils/checkpoint.py:513 ``load_pretrained`` called from main.py's build
    sequence). Consumes:

      MODEL.PRETRAINED           torch checkpoint path (hf:// / b2:// ok)
      MODEL.PRETRAINED_SOURCE    'metaformer' (v0) | 'reference' (v1) |
                                 'stitched'; inferred from MODEL.TYPE when
                                 unset
      MODEL.PRETRAINED_CONVNEXT  ConvNeXt trunk ckpt (stitched v1 init)
      MODEL.PRETRAINED_ROPEVIT   RoPE-ViT ckpt (stitched v1 init)

    For an MoE model the checkpoint is loaded into a dense-shaped template
    and sparse-upcycled into the expert banks (router keeps fresh init).

    Returns ``(params, batch_stats)`` — unchanged when nothing is
    configured. The Trainer calls this only when no auto-resume checkpoint
    exists (resume wins, like the reference).
    """
    from linnaeus_tpu.utils.remote_sync import resolve_checkpoint_path

    path = config.MODEL.get("PRETRAINED")
    cn_path = config.MODEL.get("PRETRAINED_CONVNEXT")
    rv_path = config.MODEL.get("PRETRAINED_ROPEVIT")
    if not path and not cn_path and not rv_path:
        return params, batch_stats

    source = config.MODEL.get("PRETRAINED_SOURCE")
    if not source:
        if cn_path or rv_path:
            source = "stitched"
        elif str(config.MODEL.TYPE) == "mFormerV0":
            source = "metaformer"
        else:
            source = "reference"
    source = str(source).lower()
    if source.startswith("stitched"):  # e.g. 'stitched_convnext_ropevit'
        source = "stitched"

    moe = _is_moe_params(params)
    target = densify_moe_params(params) if moe else params

    meta_names = tuple(
        name for name, _ in getattr(model, "meta_components", ()) or ()
    )
    task_keys = tuple(getattr(model, "task_keys", ()) or ())

    if source == "stitched":
        target = load_stitched_pretrained(
            target,
            resolve_checkpoint_path(cn_path) if cn_path else None,
            resolve_checkpoint_path(rv_path) if rv_path else None,
            convnext_depths=tuple(model.convnext_depths),
            rope_depths=tuple(model.rope_depths),
        )
    elif source == "metaformer":
        sd = load_torch_state_dict(resolve_checkpoint_path(path))
        target, batch_stats = load_metaformer_into_mformer_v0(
            target, batch_stats, sd,
            mbconv_depths=tuple(model.mbconv_depths),
            attn_depths=tuple(model.attn_depths),
            meta_names=meta_names,
            task_keys=task_keys,
        )
    elif source == "reference":
        sd = load_torch_state_dict(resolve_checkpoint_path(path))
        target = load_reference_mformer_v1(
            target, sd,
            convnext_depths=tuple(model.convnext_depths),
            rope_depths=tuple(model.rope_depths),
            meta_names=meta_names,
            task_keys=task_keys,
        )
    else:
        raise ValueError(
            f"Unknown MODEL.PRETRAINED_SOURCE {source!r} "
            "(expected 'metaformer', 'reference', or 'stitched')"
        )

    if moe:
        params = upcycle_dense_to_moe(target, params)
        logger.info("Pretrained weights sparse-upcycled into the MoE banks")
    else:
        params = target
    return params, batch_stats
