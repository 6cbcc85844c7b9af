"""Tool tests: dataset analyzer, taxonomy validator, log filter, complexity,
inference bundle preparation."""

import json

import h5py
import numpy as np
import pytest

from linnaeus_tpu.tools.dataset_analyzer import analyze_labels_h5
from linnaeus_tpu.tools.filter_logs import filter_lines
from linnaeus_tpu.tools.validate_taxonomy_h5 import validate
from linnaeus_tpu.utils.ibrida import AncestralLevels


@pytest.fixture(scope="module")
def labels_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tools") / "labels.h5")
    rng = np.random.default_rng(0)
    n = 40
    species = rng.integers(1, 5, n)
    genus = np.where(species > 0, 100 + (species - 1) // 2, 0)
    species[:4] = 0
    genus[:2] = 0
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "img_identifiers", data=np.array([f"i{i}" for i in range(n)], "S8")
        )
        f.create_dataset("taxa_L10", data=species.astype(np.int64))
        f.create_dataset("taxa_L20", data=genus.astype(np.int64))
        f.create_dataset("temporal", data=rng.normal(size=(n, 2)).astype(np.float32))
    return path


def test_dataset_analyzer(labels_h5):
    out = analyze_labels_h5(labels_h5, ["taxa_L10", "taxa_L20"], ["temporal"])
    assert out["num_samples"] == 40
    assert out["tasks"]["taxa_L10"]["present"]
    assert 0 < out["tasks"]["taxa_L10"]["label_density"] < 1
    assert out["meta"]["temporal"]["dim"] == 2
    assert "taxa_L10->taxa_L20" in out["hierarchy"]
    assert out["hierarchy"]["taxa_L10->taxa_L20"]["multi_parent_violations"] == 0


def test_validate_taxonomy_h5(labels_h5):
    result = validate(labels_h5, ["taxa_L10", "taxa_L20"])
    assert result["valid"]
    assert result["num_classes"]["taxa_L10"] == 5  # 4 species + null


def test_filter_logs():
    lines = [
        "[t] (a.py:1) INFO: hello world",
        "[t] (b.py:2) DEBUG: noise",
        "[t] (a.py:3) ERROR: boom",
    ]
    assert len(list(filter_lines(lines, "INFO"))) == 2
    assert len(list(filter_lines(lines, "ERROR"))) == 1
    assert len(list(filter_lines(lines, "DEBUG", pattern="boom"))) == 1
    assert len(list(filter_lines(lines, "DEBUG", component="a.py"))) == 2


def test_ancestral_levels():
    al = AncestralLevels(["taxa_L10", "taxa_L20", "taxa_L40"])
    assert al.levels == [10, 20, 40]
    assert al.names() == ["species", "genus", "order"]
    assert al.finest() == "taxa_L10"
    assert al.coarsest() == "taxa_L40"


def test_complexity_estimator_tiny():
    from linnaeus_tpu.evaluation import estimate_model_complexity
    from linnaeus_tpu.models import MFormerV1

    model = MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        task_keys=("t1",),
        num_classes={"t1": 4},
        head_configs={"t1": {"TYPE": "Linear"}},
    )
    result = estimate_model_complexity(model, img_size=32, meta_dim=5)
    assert result["params"] > 10_000
    # flops may be None on some backends, but when present must be positive
    if result["flops_per_sample"] is not None:
        assert result["flops_per_sample"] > 0


def test_prepare_inference_bundle(tmp_path, labels_h5):
    import jax

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.data.processor import (
        DatasetProcessor,
        process_and_save_dataset_metadata,
    )
    from linnaeus_tpu.tools.prepare_inference_bundle import prepare_bundle
    from linnaeus_tpu.utils import checkpoint as ckpt

    cfg = get_default_config()
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
    cfg.DATA.PARTIAL.LEVELS = True
    cfg.DATA.META.ACTIVE = False
    proc = DatasetProcessor(cfg)
    proc.process_single_file(labels_h5, 0.8, 0)
    assets = tmp_path / "assets"
    process_and_save_dataset_metadata(proc, str(assets))

    # minimal checkpoint with a params tree
    import optax

    from linnaeus_tpu.models import MFormerV1
    from linnaeus_tpu.train.state import create_train_state

    model = MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        meta_components=(),
        task_keys=("taxa_L10", "taxa_L20"),
        num_classes=proc.num_classes,
        head_configs={t: {"TYPE": "Linear"} for t in proc.task_keys},
    )
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), None)[
        "params"
    ]
    state = create_train_state(
        model, params, optax.sgd(0.1), num_tasks=2, rng=jax.random.PRNGKey(0)
    )
    ckpt_dir = str(tmp_path / "ckpts")
    path = ckpt.save_checkpoint(ckpt_dir, state)

    out = prepare_bundle(
        path, str(assets), str(tmp_path / "bundle"), "tiny",
        proc.task_keys, [proc.num_classes[t] for t in proc.task_keys],
        image_size=32,
    )
    import os

    assert os.path.exists(os.path.join(out, "weights.msgpack"))
    assert os.path.exists(os.path.join(out, "taxonomy.json"))
    with open(os.path.join(out, "class_map.json")) as f:
        cm = json.load(f)
    assert cm["taxa_L10"]["0"] == 0  # null idx -> taxon id 0
    # metadata flags derived from the checkpoint's params: no meta heads
    # trained -> every component off (pydantic defaults would say elevation
    # ON and break the restore)
    import yaml

    with open(os.path.join(out, "config.yaml")) as f:
        bundle_cfg = yaml.safe_load(f)
    mp = bundle_cfg["metadata_preprocessing"]
    assert mp == {
        "use_temporal": False, "temporal_use_hour": False,
        "use_geolocation": False, "use_elevation": False,
        "elevation_scales": [],
    }
    assert bundle_cfg["model"]["expected_aux_vector_length"] == 0

    # same checkpoint geometry but trained WITH temporal(2)+spatial(3):
    # flags come back on and the aux length matches the heads
    model_m = MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=("taxa_L10", "taxa_L20"),
        num_classes=proc.num_classes,
        head_configs={t: {"TYPE": "Linear"} for t in proc.task_keys},
    )
    params_m = model_m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 5))
    )["params"]
    state_m = create_train_state(
        model_m, params_m, optax.sgd(0.1), num_tasks=2,
        rng=jax.random.PRNGKey(0),
    )
    path_m = ckpt.save_checkpoint(str(tmp_path / "ckpts_m"), state_m)
    out_m = prepare_bundle(
        path_m, str(assets), str(tmp_path / "bundle_m"), "tiny",
        proc.task_keys, [proc.num_classes[t] for t in proc.task_keys],
        image_size=32,
    )
    with open(os.path.join(out_m, "config.yaml")) as f:
        mp_m = yaml.safe_load(f)
    assert mp_m["metadata_preprocessing"]["use_temporal"] is True
    assert mp_m["metadata_preprocessing"]["temporal_use_hour"] is False
    assert mp_m["metadata_preprocessing"]["use_geolocation"] is True
    assert mp_m["metadata_preprocessing"]["use_elevation"] is False
    assert mp_m["model"]["expected_aux_vector_length"] == 5


def test_interpolate_rel_pos_bias():
    from linnaeus_tpu.utils.model_utils import interpolate_rel_pos_bias

    h = 4
    rows = (2 * h - 1) ** 2 + 1
    table = np.random.default_rng(0).normal(size=(rows, 3)).astype(np.float32)
    out = interpolate_rel_pos_bias(table, (4, 4), (6, 6))
    assert out.shape == ((2 * 6 - 1) ** 2 + 1, 3)
    # extra-token row preserved exactly
    np.testing.assert_array_equal(out[-1], table[-1])
    # identity when grids match
    np.testing.assert_array_equal(
        interpolate_rel_pos_bias(table, (4, 4), (4, 4)), table
    )


def test_analyze_all_datasets(labels_h5, tmp_path):
    from linnaeus_tpu.tools.dataset_analyzer import analyze_all

    out_path = str(tmp_path / "combined.json")
    reports = analyze_all(
        [labels_h5, labels_h5], ["taxa_L10", "taxa_L20"], ["temporal"],
        output_path=out_path,
    )
    assert len(reports) == 1  # same path deduped by dict key
    combined = json.load(open(out_path))
    assert combined[labels_h5]["num_samples"] == 40


def test_validate_complexity_estimates(tmp_path, monkeypatch):
    """Validator diff logic: exact-params + rtol-FLOPs comparison."""
    import linnaeus_tpu.evaluation.complexity as cx

    path = str(tmp_path / "estimates.json")
    stored = {"mFormerV1_sm": {"params": 100, "flops_per_sample": 1e9,
                               "gflops_per_sample": 1.0,
                               "activation_memory_mb": 10.0, "img_size": 64}}
    json.dump(stored, open(path, "w"))
    fresh_ok = {"mFormerV1_sm": dict(stored["mFormerV1_sm"],
                                     flops_per_sample=1.02e9)}
    monkeypatch.setattr(cx, "estimate_all_archs", lambda *a, **k: fresh_ok)
    report = cx.validate_complexity_estimates(path, ["mFormerV1_sm"])
    assert report["mFormerV1_sm"]["ok"]  # 2% FLOPs drift within rtol
    fresh_bad = {"mFormerV1_sm": dict(stored["mFormerV1_sm"], params=101)}
    monkeypatch.setattr(cx, "estimate_all_archs", lambda *a, **k: fresh_bad)
    report = cx.validate_complexity_estimates(path, ["mFormerV1_sm"])
    assert not report["mFormerV1_sm"]["ok"]  # params drift detected


def test_profile_step_gviz_parse(capsys):
    """profile_step converts xprof's gviz table and aggregates by category."""
    from linnaeus_tpu.tools.profile_step import _gviz_to_rows, summarize

    table = {
        "cols": [
            {"id": "category", "label": "HLO op category", "type": "string"},
            {"id": "hlo_op_name", "label": "HLO op name", "type": "string"},
            {"id": "hlo_op_expression", "label": "HLO op text", "type": "string"},
            {"id": "occurrences", "label": "#Occurrences", "type": "number"},
            {"id": "total_self_time", "label": "Total self time (us)", "type": "number"},
            {"id": "model_flop_rate", "label": "rate", "type": "number"},
            {"id": "hbm_bw", "label": "bw", "type": "number"},
            {"id": "bound_by", "label": "Bound by", "type": "string"},
        ],
        "rows": [
            {"c": [{"v": "convolution fusion"}, {"v": "fusion.1"},
                   {"v": "%fusion.1 = ..."}, {"v": 8}, {"v": 8000.0},
                   {"v": 1234.5}, {"v": 600.0}, {"v": "HBM"}]},
            {"c": [{"v": "loop fusion"}, {"v": "fusion.2"}, None,
                   {"v": 8}, {"v": 4000.0}, {"v": 0}, {"v": 0},
                   {"v": "Compute"}]},
        ],
    }
    rows = _gviz_to_rows(table)
    assert rows[0]["category"] == "convolution fusion"
    assert rows[0]["total_self_time"] == 8000.0
    assert rows[1]["hlo_op_expression"] is None  # null cells survive

    summarize(rows, top=5, steps=8)
    out = capsys.readouterr().out
    # 12000 us over 8 steps = 1.50 ms/step total; conv fusion is 2/3
    assert "1.50 ms/step" in out
    assert "convolution fusion" in out and "66.7%" in out


def test_export_torch_tool_roundtrip(tmp_path):
    """tools/export_torch drives export_checkpoint from a config + Orbax
    checkpoint; an MoE checkpoint exports its dense twin (bank averages)."""
    import optax
    import pytest

    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.models import MFormerV1
    from linnaeus_tpu.tools.export_torch import export_checkpoint
    from linnaeus_tpu.train.state import create_train_state
    from linnaeus_tpu.utils import checkpoint as ckpt
    from linnaeus_tpu.utils.pretrained import convert_linear_kernel

    cfg = get_default_config()
    cfg.MODEL.TYPE = "mFormerV1"
    cfg.DATA.TASK_KEYS_H5 = ["t1"]
    cfg.MODEL.CONVNEXT_STAGES.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.ROPE_STAGES.DEPTHS = [1, 1]
    # disable meta so the export maps no meta heads
    for comp in cfg.DATA.META.COMPONENTS:
        cfg.DATA.META.COMPONENTS[comp].ENABLED = False

    model = MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        task_keys=("t1",),
        num_classes={"t1": 4},
        head_configs={"t1": {"TYPE": "Linear"}},
        moe_num_experts=2,
        moe_every_n=1,
    )
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, None)["params"]
    state = create_train_state(
        model, params, optax.adamw(1e-3), num_tasks=1,
        rng=jax.random.PRNGKey(1),
    )
    path = ckpt.save_checkpoint(str(tmp_path / "ckpts"), state)

    out = str(tmp_path / "exported.pth")
    sd = export_checkpoint(cfg, path, out)
    assert len(sd) > 40
    loaded = torch.load(out, weights_only=False)
    assert set(loaded) == set(sd)
    # MoE averaging: exported fc1 weight == mean over the expert bank,
    # converted back to torch (out, in) layout
    import numpy as np

    bank = np.asarray(params["stage3_block0"]["mlp"]["wi"])  # (E, D, F)
    want = convert_linear_kernel(bank.mean(axis=0))  # (F, D) torch layout
    np.testing.assert_allclose(
        loaded["stages.2.0.mlp.fc1.weight"].numpy(), want, rtol=1e-6
    )


# ---------------------------------------------------------------- shard_plan
@pytest.fixture(scope="module")
def _tiny_plan_model():
    from linnaeus_tpu.models import MFormerV1

    return MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=("taxa_L10", "taxa_L20"),
        num_classes={"taxa_L10": 11, "taxa_L20": 5},
        head_configs={
            "taxa_L10": {"TYPE": "Linear"},
            "taxa_L20": {"TYPE": "Linear"},
        },
    )


def test_shard_plan_dp_census_matches_params(_tiny_plan_model):
    """dp: the gradient all-reduce payload must be ~the full param tree
    (every grad leaf crosses the wire once per step)."""
    from linnaeus_tpu.tools.shard_plan import build_plan

    plan = build_plan(
        "tiny", {"data": 8}, "dp", batch=16, img=32,
        model=_tiny_plan_model,
        num_classes={"taxa_L10": 11, "taxa_L20": 5},
    )
    assert plan["param_bytes_per_device"] == plan["param_bytes_total"]
    ar = plan["collectives_per_step"].get("all-reduce")
    assert ar is not None and ar["count"] >= 1
    # payload within 25% of param bytes (cond-branch dupes / small extras
    # on either side; the point is the ORDER is right, not the last byte)
    ratio = ar["bytes"] / plan["param_bytes_total"]
    assert 0.75 < ratio < 2.5, f"all-reduce/params ratio {ratio}"
    mem = plan["memory_analysis"]
    assert mem is None or mem["per_device_total"] > 0


def test_shard_plan_fsdp_shards_params(_tiny_plan_model):
    from linnaeus_tpu.tools.shard_plan import build_plan

    plan = build_plan(
        "tiny", {"data": 8}, "fsdp", batch=16, img=32,
        model=_tiny_plan_model,
        num_classes={"taxa_L10": 11, "taxa_L20": 5},
    )
    # most leaves shard 8-ways; opt state mirrors the param shardings
    assert plan["param_bytes_per_device"] < plan["param_bytes_total"] / 2
    assert plan["opt_ema_bytes_per_device"] < plan["opt_ema_bytes_total"] / 2
    assert plan["params_sharded"] > plan["params_total_leaves"] / 2
    assert plan["collectives_per_step"]  # gathers/reduces present


def test_shard_plan_tp_mesh(_tiny_plan_model):
    from linnaeus_tpu.tools.shard_plan import build_plan

    plan = build_plan(
        "tiny", {"data": 4, "model": 2}, "tp", batch=16, img=32,
        model=_tiny_plan_model,
        num_classes={"taxa_L10": 11, "taxa_L20": 5},
    )
    assert plan["params_sharded"] > 0
    assert plan["batch_per_device"] == 4
    assert plan["param_bytes_per_device"] < plan["param_bytes_total"]


def test_shard_plan_collective_census_parses_tuple_shapes():
    """The gradient all-reduce is one giant tuple with /*index=N*/
    comments — regression for the census parser."""
    from linnaeus_tpu.tools.shard_plan import collective_census

    hlo = (
        "%all-reduce.5 = (f32[8]{0}, f32[4,2]{1,0}, /*index=2*/bf16[16]{0}) "
        "all-reduce(%a, %b, %c), replica_groups={}\n"
        "%ag = f32[64,3]{1,0} all-gather(%x), dimensions={0}\n"
        "%use = f32[8]{0} get-tuple-element(%all-reduce.5), index=0\n"
        "%ar2 = f32[2]{0} all-reduce-start(%y)\n"
        "%ar2d = f32[2]{0} all-reduce-done(%ar2)\n"
    )
    c = collective_census(hlo)
    assert c["all-reduce"]["count"] == 2  # tuple + start (done skipped)
    assert c["all-reduce"]["bytes"] == (8 * 4 + 8 * 4 + 16 * 2) + 2 * 4
    assert c["all-gather"] == {"count": 1, "bytes": 64 * 3 * 4}


def test_shard_plan_pp_mode(_tiny_plan_model):
    """pp: replicated state + pipelined towers — the census must show
    collective-permute traffic (the stage-to-stage activation hops) that
    no other replicated mode produces."""
    from linnaeus_tpu.tools.shard_plan import build_plan

    model = _tiny_plan_model.clone(rope_depths=(2, 2))
    plan = build_plan(
        "tiny", {"data": 4, "model": 2}, "pp", batch=16, img=32,
        model=model,
        num_classes={"taxa_L10": 11, "taxa_L20": 5},
        microbatches=2,
    )
    assert plan["param_bytes_per_device"] == plan["param_bytes_total"]
    cp = plan["collectives_per_step"].get("collective-permute")
    assert cp is not None and cp["count"] >= 1, plan["collectives_per_step"]
    assert cp["bytes"] > 0
