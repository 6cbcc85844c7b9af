"""Inference handler end-to-end on a tiny artifact bundle.

Mirrors the reference's session-scoped fixture-bundle approach
(tests/test_inference_handler.py:53+, SURVEY.md §4): write weights +
taxonomy.json + class_map.json + config.yaml to tmp dirs, then exercise the
real handler.
"""

import json

import numpy as np
import pytest
import yaml

from linnaeus_tpu.inference import (
    InferenceRequestMetadata,
    LinnaeusInferenceHandler,
)
from linnaeus_tpu.inference.projections import (
    datetime_to_temporal_sinusoids,
    elevation_to_sinusoids,
    latlon_to_unit_sphere,
)
from linnaeus_tpu.utils.taxonomy import TaxonomyTree

TASKS = ["taxa_L10", "taxa_L20"]


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    from tests.bundle_utils import make_test_bundle

    return make_test_bundle(tmp_path_factory.mktemp("bundle"))


def test_handler_load_and_info(bundle):
    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    info = handler.info()
    assert info.architecture_name == "tiny_v1"
    assert info.task_keys == TASKS
    assert info.num_classes_per_task == [5, 3]
    assert info.metadata_components["temporal"]


def test_handler_predict_shapes(bundle):
    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(3)]
    metas = [
        {"lat": 40.0, "lon": -105.0, "datetime": "2024-06-15T12:00:00",
         "elevation_m": 1600.0},
        None,
        {"lat": -10.0, "lon": 30.0},
    ]
    results = handler.predict(images, metas)
    assert len(results) == 3
    for r in results:
        assert len(r.tasks) == 2
        for task in r.tasks:
            assert len(task.predictions) <= 3
            probs = [p for _, p in task.predictions]
            assert all(0 <= p <= 1 for p in probs)
            # sorted descending
            assert probs == sorted(probs, reverse=True)
    # taxon ids come from the class map
    all_ids = {tid for r in results for t in r.tasks for tid, _ in t.predictions}
    assert all_ids <= {0, 5001, 5002, 5003, 5004, 61, 62}


def test_handler_top_k_override(bundle):
    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    images = [np.zeros((32, 32, 3), np.uint8)]
    results = handler.predict(
        images, None, InferenceRequestMetadata(top_k=1)
    )
    assert all(len(t.predictions) == 1 for t in results[0].tasks)


def test_handler_batch_larger_than_max(bundle):
    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    images = [np.zeros((32, 32, 3), np.uint8)] * 6  # max batch is 4
    results = handler.predict(images)
    assert len(results) == 6


def test_batch_buckets_and_device_topk(bundle):
    """Serving fast-path invariants: batches pad to the smallest
    power-of-two bucket (not always max batch), distinct k values compile
    once each, and a per-sample top_k above the default still returns the
    full k predictions (device-side lax.top_k path)."""
    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    assert handler._bucket(1) == max(handler._dp, 1)
    assert handler._bucket(handler._max_batch) == handler._max_batch
    # monotone, power-of-two-of-dp steps, capped
    prev = 0
    for n in range(1, handler._max_batch + 1):
        b = handler._bucket(n)
        assert b >= n or b == handler._max_batch
        assert b >= prev
        prev = b

    # disable consistency enforcement so raw top-k counts are observable
    # (an untrained model's chain is inconsistent -> finer ranks null out)
    cfg = handler.config.model_copy(deep=True)
    cfg.inference_options.enable_hierarchical_consistency_check = False
    raw = LinnaeusInferenceHandler(
        cfg, handler.model, handler.variables, handler.taxonomy,
        handler.class_maps,
    )
    # warmup pre-compiles one forward per bucket (dp..max_batch)
    import math

    expected_buckets = 1 + max(
        0, math.ceil(math.log2(handler._max_batch / max(handler._dp, 1)))
    )
    assert handler.warmup() == expected_buckets

    img = np.zeros((32, 32, 3), np.uint8)
    # default_top_k=3; ask for 5 -> k rounds to 6 internally, clamps at the
    # class count; 5 predictions returned
    r = raw.predict([img], None, InferenceRequestMetadata(top_k=5))
    assert len(r[0].tasks[0].predictions) == 5  # taxa_L10 has 5 classes
    assert len(r[0].tasks[1].predictions) == 3  # taxa_L20: clamped to classes
    # probabilities still sorted and normalized
    probs = [p for _, p in r[0].tasks[0].predictions]
    assert probs == sorted(probs, reverse=True)
    assert 0.99 < sum(probs) < 1.01  # k == n_classes -> full distribution


def test_uint8_preprocess_parity(bundle):
    """(u8/255 - mean)/std on device must equal the normalized f32 host
    path bit-for-bit up to f32 rounding."""
    from linnaeus_tpu.inference.preprocessing import preprocess_image_batch

    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    cfg = handler.config
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(2)]
    u8 = preprocess_image_batch(imgs, cfg, as_uint8=True)
    assert u8.dtype == np.uint8
    f32 = preprocess_image_batch(imgs, cfg)
    mean = np.asarray(cfg.input_preprocessing.image_mean, np.float32)
    std = np.asarray(cfg.input_preprocessing.image_std, np.float32)
    np.testing.assert_allclose(
        (u8.astype(np.float32) / 255.0 - mean) / std, f32, atol=1e-6
    )
    # float [0,1] array inputs quantize to u8 without scale confusion
    fimg = imgs[0].astype(np.float32) / 255.0
    u8f = preprocess_image_batch([fimg], cfg, as_uint8=True)
    np.testing.assert_array_equal(u8f[0], imgs[0])


def test_wide_integer_inputs_rescale_not_wrap(bundle):
    """16-bit imagery (uint16 TIFF/PNG decodes) must rescale by the dtype
    range — a bare astype(np.uint8) would wrap each pixel modulo 256."""
    from linnaeus_tpu.inference.preprocessing import preprocess_image_u8

    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    cfg = handler.config
    u8 = np.random.default_rng(5).integers(
        0, 256, (32, 32, 3), dtype=np.uint8
    )
    # exact 8->16-bit upscale (x * 257 spans 0..65535); must round-trip
    u16 = (u8.astype(np.uint16)) * 257
    got = preprocess_image_u8(u16, cfg)
    np.testing.assert_allclose(
        got.astype(np.int32), u8.astype(np.int32), atol=1
    )
    # int32 input with negatives clips at 0 rather than wrapping
    i32 = u8.astype(np.int32) * (2**31 // 256) - 1000
    got32 = preprocess_image_u8(i32, cfg)
    assert got32.dtype == np.uint8
    assert got32.shape == (32, 32, 3)


def test_wide_integer_holding_u8_values_passes_through(bundle):
    """An int64/int32 array holding ordinary 0-255 pixels (np.asarray of a
    nested Python list defaults to int64) must pass through value-exact —
    rescaling by 255/iinfo.max would crush it to an all-black image."""
    from linnaeus_tpu.inference.preprocessing import preprocess_image_u8

    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    cfg = handler.config
    u8 = np.random.default_rng(7).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    for dtype in (np.int64, np.int32, np.uint16):
        got = preprocess_image_u8(u8.astype(dtype), cfg)
        np.testing.assert_array_equal(got, u8)
    # the nested-list path users actually hit
    got = preprocess_image_u8(u8.tolist(), cfg)
    np.testing.assert_array_equal(got, u8)


def test_bool_mask_image_does_not_crash(bundle):
    """Boolean mask images must produce a valid 0/1 uint8 image (historical
    behavior) — np.iinfo raises ValueError on bool dtypes."""
    from linnaeus_tpu.inference.preprocessing import preprocess_image_u8

    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    cfg = handler.config
    mask = np.zeros((32, 32, 3), dtype=bool)
    mask[8:24, 8:24] = True
    got = preprocess_image_u8(mask, cfg)
    assert got.dtype == np.uint8
    assert set(np.unique(got)) <= {0, 1}
    assert got[16, 16, 0] == 1 and got[0, 0, 0] == 0


def test_bulk_predict_bounded_inflight_matches_per_image(bundle):
    """A bulk predict over many max-batch chunks (the path that now drains
    eagerly to bound in-flight device memory) must return the same
    results, in order, as per-image predicts."""
    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    rng = np.random.default_rng(11)
    # max batch is 4 -> 13 images = 4 chunks, exceeding the window of 2
    images = [rng.integers(0, 256, (32, 32, 3), np.uint8) for _ in range(13)]
    bulk = handler.predict(images)
    assert len(bulk) == 13
    for i in (0, 5, 12):  # spot-check across chunk boundaries
        single = handler.predict([images[i]])[0]
        for tb, ts in zip(bulk[i].tasks, single.tasks):
            assert [tid for tid, _ in tb.predictions] == [
                tid for tid, _ in ts.predictions
            ]
            np.testing.assert_allclose(
                [p for _, p in tb.predictions],
                [p for _, p in ts.predictions], rtol=1e-5,
            )


def test_data_parallel_resolution():
    from linnaeus_tpu.inference.handler import _resolve_data_parallel as r

    assert r("auto", 8, 8) == 8
    assert r("auto", 8, 4) == 4
    assert r("auto", 8, 6) == 6  # largest divisor <= device count
    assert r("auto", 1, 128) == 1  # single chip -> off
    assert r(1, 8, 8) == 1
    assert r("off", 8, 8) == 1
    assert r(2, 8, 8) == 2
    with pytest.raises(ValueError):
        r(16, 8, 8)  # more than visible devices
    with pytest.raises(ValueError):
        r(3, 8, 8)  # does not divide the compiled batch


def test_data_parallel_serving_matches_single_device(bundle):
    """Sharding the padded batch over the 8-device CPU mesh must be
    invisible in the results (per-sample compute, no cross-batch
    reduction)."""
    h_dp = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    assert h_dp._dp == 4  # auto: batch 4 over 8 visible devices
    cfg1 = h_dp.config.model_copy(deep=True)
    cfg1.inference_options.data_parallel = 1
    h_1 = LinnaeusInferenceHandler(
        cfg1, h_dp.model, h_dp.variables, h_dp.taxonomy, h_dp.class_maps
    )
    assert h_1._dp == 1
    rng = np.random.default_rng(7)
    images = [
        rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(3)
    ]
    metas = [{"lat": 40.0, "lon": -105.0}, None, {"lat": -10.0, "lon": 30.0}]
    r_dp = h_dp.predict(images, metas)
    r_1 = h_1.predict(images, metas)
    for a, b in zip(r_dp, r_1):
        for ta, tb in zip(a.tasks, b.tasks):
            assert [tid for tid, _ in ta.predictions] == [
                tid for tid, _ in tb.predictions
            ]
            for (_, pa), (_, pb) in zip(ta.predictions, tb.predictions):
                assert abs(pa - pb) < 1e-6


def test_projections():
    v = latlon_to_unit_sphere(0.0, 0.0)
    np.testing.assert_allclose(v, [1, 0, 0], atol=1e-6)
    assert np.linalg.norm(latlon_to_unit_sphere(45.0, 123.0)) == pytest.approx(1.0)
    from datetime import datetime

    t = datetime_to_temporal_sinusoids(datetime(2024, 1, 1))
    np.testing.assert_allclose(t, [0, 1], atol=1e-6)
    e = elevation_to_sinusoids(0.0, [100.0, 1000.0])
    np.testing.assert_allclose(e, [0, 1, 0, 1], atol=1e-6)


def test_maybe_to_typus_converts_with_stubbed_typus(monkeypatch):
    """VERDICT #9: when ``typus`` is importable, predict() results convert to
    genuine typus models (stubbed here with the reference's API surface:
    RankLevel enum, TaskPrediction(rank_level, temperature, predictions),
    HierarchicalClassificationResult(taxonomy_context, tasks, subtree_roots))."""
    import enum
    import sys
    import types

    from pydantic import BaseModel

    class RankLevel(enum.Enum):
        L10 = 10
        L20 = 20

    class TaxonomyContext(BaseModel):
        source: str | None = None
        version: str | None = None

    class TypusTask(BaseModel):
        rank_level: RankLevel
        temperature: float
        predictions: list[tuple[int, float]]

    class TypusHCR(BaseModel):
        taxonomy_context: TaxonomyContext
        tasks: list[TypusTask]
        subtree_roots: set[int] | None = None

    constants = types.ModuleType("typus.constants")
    constants.RankLevel = RankLevel
    classification = types.ModuleType("typus.models.classification")
    classification.HierarchicalClassificationResult = TypusHCR
    classification.TaskPrediction = TypusTask
    classification.TaxonomyContext = TaxonomyContext
    models_mod = types.ModuleType("typus.models")
    models_mod.classification = classification
    typus_mod = types.ModuleType("typus")
    typus_mod.constants = constants
    typus_mod.models = models_mod
    for name, mod in [
        ("typus", typus_mod),
        ("typus.constants", constants),
        ("typus.models", models_mod),
        ("typus.models.classification", classification),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    from linnaeus_tpu.inference.schemas import (
        HierarchicalClassificationResult,
        TaskPrediction,
        maybe_to_typus,
    )

    local = HierarchicalClassificationResult(
        taxonomy_context={"source": "test", "version": "1", "root": 42},
        tasks=[
            TaskPrediction(
                rank_level=10, task_key="taxa_L10",
                predictions=[(101, 0.9), (102, 0.1)],
            ),
            TaskPrediction(
                rank_level=20, task_key="taxa_L20", predictions=[(7, 1.0)],
            ),
        ],
    )
    out = maybe_to_typus(local)
    assert isinstance(out, TypusHCR)
    # most-specific rank first (reference handler.py:218)
    assert [t.rank_level for t in out.tasks] == [RankLevel.L20, RankLevel.L10]
    assert out.tasks[1].predictions[0] == (101, 0.9)
    assert out.subtree_roots == {42}
    assert out.taxonomy_context.source == "test"


def test_maybe_to_typus_fallback_without_typus():
    from linnaeus_tpu.inference.schemas import (
        HierarchicalClassificationResult,
        maybe_to_typus,
    )

    local = HierarchicalClassificationResult(taxonomy_context={}, tasks=[])
    assert maybe_to_typus(local) is local


def test_hot_pixel_does_not_trigger_dtype_rescale(bundle):
    """A single outlier above 255 in an otherwise 0-255-scale integer image
    must CLIP, not flip the whole image into a 255/iinfo.max rescale
    (one stitching artifact would otherwise blacken the input)."""
    from linnaeus_tpu.inference.preprocessing import preprocess_image_u8

    handler = LinnaeusInferenceHandler.load_from_artifacts(bundle / "config.yaml")
    cfg = handler.config
    u8 = np.random.default_rng(13).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    hot = u8.astype(np.int32)
    hot[5, 5, 0] = 300  # the artifact
    got = preprocess_image_u8(hot, cfg)
    expect = u8.copy()
    expect[5, 5, 0] = 255  # clipped
    np.testing.assert_array_equal(got, expect)
