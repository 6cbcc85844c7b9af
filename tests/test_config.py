"""Config system tests: defaults, merge precedence, freeze, --opts."""

import pytest
import yaml

from linnaeus_tpu.configuration import (
    CfgNode,
    build_config,
    get_default_config,
    merge_configs,
)


def test_defaults_shape():
    cfg = get_default_config()
    assert cfg.DATA.TASK_KEYS_H5 == ["taxa_L10", "taxa_L20", "taxa_L30", "taxa_L40"]
    assert cfg.MODEL.TYPE == "mFormerV0"
    assert cfg.OPTIMIZER.NAME == "adamw"
    assert cfg.TRAIN.MIXED_PRECISION.DTYPE == "bfloat16"
    assert cfg.PARALLEL.MESH.DATA == -1


def test_clone_independent():
    a = get_default_config()
    b = get_default_config()
    a.MODEL.TYPE = "mFormerV1"
    assert b.MODEL.TYPE == "mFormerV0"


def test_freeze_blocks_mutation():
    cfg = get_default_config()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.TYPE = "x"
    cfg.defrost()
    cfg.MODEL.TYPE = "x"
    assert cfg.MODEL.TYPE == "x"


def test_merge_from_list():
    cfg = get_default_config()
    cfg.merge_from_list(["MODEL.TYPE", "mFormerV1", "DATA.BATCH_SIZE", "32"])
    assert cfg.MODEL.TYPE == "mFormerV1"
    assert cfg.DATA.BATCH_SIZE == 32


def test_merge_from_list_rejects_unknown_key():
    cfg = get_default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])


def test_new_allowed_sections_accept_new_keys():
    cfg = get_default_config()
    cfg.DATA.META.COMPONENTS.merge_from_other_cfg(
        CfgNode({"CUSTOM": {"ENABLED": True, "DIM": 7, "IDX": 3}}, new_allowed=True)
    )
    assert cfg.DATA.META.COMPONENTS.CUSTOM.DIM == 7


def test_merge_precedence():
    low = CfgNode({"A": 1, "B": {"C": 2, "D": 3}})
    high = CfgNode({"B": {"C": 9}})
    merged = merge_configs(low, high)
    assert merged.A == 1
    assert merged.B.C == 9
    assert merged.B.D == 3


def test_build_config_with_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"DATA": {"IMG_SIZE": 224}, "MODEL": {"NAME": "base"}}))
    exp = tmp_path / "exp.yaml"
    exp.write_text(
        yaml.safe_dump(
            {"BASE": [str(base)], "MODEL": {"NAME": "exp_override"}}
        )
    )
    cfg = build_config(str(exp), opts=["DATA.BATCH_SIZE", "16"])
    assert cfg.DATA.IMG_SIZE == 224  # from BASE
    assert cfg.MODEL.NAME == "exp_override"  # exp wins over BASE
    assert cfg.DATA.BATCH_SIZE == 16  # opts win over all


def test_model_base_inheritance(tmp_path):
    model_base = tmp_path / "model.yaml"
    model_base.write_text(
        yaml.safe_dump(
            {"MODEL": {"TYPE": "mFormerV1", "ROPE_STAGES": {"DEPTHS": [5, 2]}}}
        )
    )
    exp = tmp_path / "exp.yaml"
    exp.write_text(
        yaml.safe_dump(
            {"MODEL": {"BASE": [str(model_base)], "NAME": "from_exp"}}
        )
    )
    cfg = build_config(str(exp))
    assert cfg.MODEL.TYPE == "mFormerV1"
    assert cfg.MODEL.ROPE_STAGES.DEPTHS == [5, 2]
    assert cfg.MODEL.NAME == "from_exp"


def test_dump_roundtrip():
    cfg = get_default_config()
    text = cfg.dump()
    loaded = yaml.safe_load(text)
    assert loaded["MODEL"]["TYPE"] == "mFormerV0"


def test_reference_config_key_coverage():
    """Every key settable in the reference's config.py exists here, so any
    reference experiment YAML merges without AttributeError."""
    import os
    import re

    ref = "/root/reference/linnaeus/config.py"
    if not os.path.exists(ref):
        pytest.skip("reference tree not mounted")
    ref_keys = set()
    for line in open(ref):
        m = re.match(r"(_C[A-Z0-9_.]*)\.([A-Z0-9_]+)\s*=", line.strip())
        if m:
            ref_keys.add((m.group(1) + "." + m.group(2)).replace("_C.", ""))

    def walk(node, prefix=""):
        out = set()
        for k, v in node.items():
            p = f"{prefix}.{k}" if prefix else k
            out.add(p)
            if hasattr(v, "items") and not isinstance(v, (str, bytes)):
                out |= walk(v, p)
        return out

    mine = walk(get_default_config())
    missing = sorted(k for k in ref_keys if k not in mine)
    assert not missing, f"reference config keys missing: {missing}"


def test_enable_compile_cache(tmp_path, monkeypatch):
    """ENV.COMPILE_CACHE wires the persistent XLA compilation cache."""
    import jax

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.train.main import enable_compile_cache

    cfg = get_default_config()
    cfg.ENV.COMPILE_CACHE.DIR = str(tmp_path / "xla-cache")
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compile_cache(cfg)
        # dir carries a CPU-feature suffix (stale-machine AOT executables
        # segfault on load after VM migration)
        got = jax.config.jax_compilation_cache_dir
        assert got.startswith(str(tmp_path / "xla-cache"))
        import os
        assert os.path.isdir(got)
        # opt-out leaves config untouched
        jax.config.update("jax_compilation_cache_dir", None)
        cfg.ENV.COMPILE_CACHE.ENABLED = False
        enable_compile_cache(cfg)
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
