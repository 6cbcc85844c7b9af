"""Assemble an inference artifact bundle from a training run.

Reference parity: tools/prepare_inference_bundle.py (250 LoC). Collects:
weights (converted to flax msgpack), taxonomy.json, class_map.json, and the
pydantic inference config YAML into one directory servable by
LinnaeusInferenceHandler.
"""

from __future__ import annotations

import argparse
import json
import os


def prepare_bundle(
    checkpoint_path: str,
    assets_dir: str,
    output_dir: str,
    architecture_name: str,
    task_keys: list[str],
    num_classes: list[int],
    image_size: int = 224,
    description: str | None = None,
    use_ema: bool = False,
) -> str:
    """Build the bundle; returns the output directory."""
    import shutil

    import jax
    import yaml
    from flax.serialization import to_bytes

    os.makedirs(output_dir, exist_ok=True)

    # 1) taxonomy + class maps from assets
    tax_src = os.path.join(assets_dir, "taxonomy.json")
    shutil.copy(tax_src, os.path.join(output_dir, "taxonomy.json"))
    meta_path = os.path.join(assets_dir, "dataset_metadata.json")
    with open(meta_path) as f:
        ds_meta = json.load(f)
    # class_map: task -> {model_idx: taxon_id} inverted from class_to_idx
    class_map = {}
    for task, mapping in ds_meta["class_to_idx"].items():
        class_map[task] = {
            str(idx): (0 if key == "null" else int(key))
            for key, idx in mapping.items()
        }
    with open(os.path.join(output_dir, "class_map.json"), "w") as f:
        json.dump(class_map, f, indent=2)

    # 2) weights: restore train state params -> msgpack
    from linnaeus_tpu.utils import checkpoint as ckpt

    import orbax.checkpoint as ocp

    state_dir = os.path.join(checkpoint_path, ckpt.STATE_DIR)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(state_dir))
    if use_ema:
        if "ema_params" not in restored:
            raise ValueError(
                "--ema requested but the checkpoint carries no ema_params "
                "(train with TRAIN.EMA.ENABLED)"
            )
        params = restored["ema_params"]
    else:
        params = restored["params"]
    variables = {"params": params}
    if "batch_stats" in restored:
        variables["batch_stats"] = restored["batch_stats"]
    with open(os.path.join(output_dir, "weights.msgpack"), "wb") as f:
        f.write(to_bytes(jax.tree.map(lambda x: x, variables)))

    # 3) metadata flags derived from the checkpoint's own meta heads —
    # the model only creates heads for enabled components (mFormerV1
    # meta_<component>_head_<stage>), so the params are ground truth;
    # writing {} would fall back to pydantic defaults (elevation ON) and
    # break restores of runs trained without elevation
    def _meta_in_dim(name: str) -> int | None:
        head = params.get(name) or params.get(name.replace("_1", "_2"))
        if head is None or "Dense_0" not in head:
            return None
        return int(head["Dense_0"]["kernel"].shape[0])

    t_dim = _meta_in_dim("meta_temporal_head_1")
    s_dim = _meta_in_dim("meta_spatial_head_1")
    e_dim = _meta_in_dim("meta_elevation_head_1")
    meta_pre: dict = {
        "use_temporal": t_dim is not None,
        "temporal_use_hour": t_dim == 4,
        "use_geolocation": s_dim is not None,
        "use_elevation": e_dim is not None,
    }
    if e_dim:
        # 2 sinusoidal features per scale; scale VALUES are training-config
        # knowledge the checkpoint doesn't carry — write defaults of the
        # right count (editable in the emitted yaml)
        scales = [100.0, 1000.0, 5000.0][: e_dim // 2]
        while len(scales) < e_dim // 2:
            scales.append(scales[-1] * 10.0)
        meta_pre["elevation_scales"] = scales
    else:
        meta_pre["elevation_scales"] = []
    aux_len = (t_dim or 0) + (s_dim or 0) + (e_dim or 0)

    config = {
        "model": {
            "architecture_name": architecture_name,
            "weights_path": "weights.msgpack",
            "model_task_keys_ordered": list(task_keys),
            "num_classes_per_task": [int(n) for n in num_classes],
            "null_class_indices": {t: 0 for t in task_keys},
            "expected_aux_vector_length": aux_len,
        },
        "input_preprocessing": {"image_size": [3, image_size, image_size]},
        "metadata_preprocessing": meta_pre,
        "taxonomy_data": {
            "source_name": "linnaeus_tpu",
            "taxonomy_tree_path": "taxonomy.json",
            "class_index_map_path": "class_map.json",
        },
        "inference_options": {},
        "model_description": description,
    }
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
    return output_dir


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("prepare_inference_bundle")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--assets", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--arch", required=True)
    parser.add_argument("--task-keys", nargs="+", required=True)
    parser.add_argument("--num-classes", nargs="+", type=int, required=True)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument(
        "--ema", action="store_true",
        help="bundle the EMA weights instead of the raw params",
    )
    args = parser.parse_args(argv)
    out = prepare_bundle(
        args.checkpoint, args.assets, args.output, args.arch,
        args.task_keys, args.num_classes, args.image_size,
        use_ema=args.ema,
    )
    print(f"bundle written to {out}")


if __name__ == "__main__":
    main()
