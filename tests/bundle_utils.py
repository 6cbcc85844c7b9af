"""Shared tiny inference-artifact bundle for handler/serving tests
(mirrors the reference's session-scoped fixture-bundle approach,
tests/test_inference_handler.py:53+)."""

import json

import yaml

TASKS = ["taxa_L10", "taxa_L20"]


def make_test_bundle(d):
    """Write a complete artifact bundle (weights + taxonomy + class maps +
    config.yaml) for a tiny mFormerV1 into directory ``d``; returns ``d``."""
    import jax
    import jax.numpy as jnp
    from flax.serialization import to_bytes

    from linnaeus_tpu.configuration import archs
    from linnaeus_tpu.inference.config import InferenceConfig
    from linnaeus_tpu.inference.model_utils import build_config_for_inference
    from linnaeus_tpu.models.build import build_model
    from linnaeus_tpu.utils.taxonomy import TaxonomyTree

    # taxonomy: 4 species (+null) under 2 genera (+null)
    tree = TaxonomyTree(
        {"taxa_L10": {1: 1, 2: 1, 3: 2, 4: 2}},
        task_keys=TASKS,
        num_classes={"taxa_L10": 5, "taxa_L20": 3},
    )
    tree.save(str(d / "taxonomy.json"))

    class_map = {
        "taxa_L10": {"0": 0, "1": 5001, "2": 5002, "3": 5003, "4": 5004},
        "taxa_L20": {"0": 0, "1": 61, "2": 62},
    }
    (d / "class_map.json").write_text(json.dumps(class_map))

    config_dict = {
        "model": {
            "architecture_name": "tiny_v1",
            "weights_path": "weights.msgpack",
            "model_task_keys_ordered": TASKS,
            "num_classes_per_task": [5, 3],
            "null_class_indices": {t: 0 for t in TASKS},
            "expected_aux_vector_length": 11,
        },
        "input_preprocessing": {"image_size": [3, 32, 32]},
        "metadata_preprocessing": {
            "use_temporal": True,
            "use_geolocation": True,
            "use_elevation": True,
            "elevation_scales": [100.0, 1000.0, 5000.0],
        },
        "taxonomy_data": {
            "source_name": "TestTax",
            "taxonomy_tree_path": "taxonomy.json",
            "class_index_map_path": "class_map.json",
        },
        "inference_options": {"default_top_k": 3, "batch_size": 4},
        "model_description": "tiny test bundle",
    }
    (d / "config.yaml").write_text(yaml.safe_dump(config_dict))

    archs.MFORMER_V1_ARCHS["tiny_v1"] = {
        "CONVNEXT": {"DEPTHS": [1, 1, 1, 1], "DIMS": [8, 16, 32, 64]},
        "ROPE": {"DEPTHS": [1, 1], "DIMS": [32, 64], "NUM_HEADS": [2, 2]},
        "DROP_PATH_RATE": 0.0,
    }
    inf_cfg = InferenceConfig(**config_dict)
    cfg = build_config_for_inference(inf_cfg)
    model = build_model(
        cfg, num_classes={"taxa_L10": 5, "taxa_L20": 3}, taxonomy_tree=tree
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 11))
    )
    (d / "weights.msgpack").write_bytes(to_bytes(variables))
    return d
