"""Native C++ data-plane: build, batched JPEG decode (files + memory), and
the hybrid batch read path through PrefetchingDataset.

The library compiles on first use (g++ + libjpeg, both in the image); every
test skips cleanly where that toolchain is absent, because every production
caller falls back to the Python pipeline in exactly that case.
"""

import os

import numpy as np
import pytest

from linnaeus_tpu.native import get_dataplane

dp = get_dataplane()
pytestmark = pytest.mark.skipif(
    dp is None, reason="native dataplane unavailable (no g++/libjpeg)"
)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    """JPEG files at several stored resolutions (224 exact, 448/896 trigger
    DCT-domain prescaled decode, 100 triggers upscale)."""
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    sizes = [224, 448, 896, 100, 224, 640]
    paths = []
    for i, size in enumerate(sizes):
        x = np.linspace(0, 255, size, dtype=np.float32)
        img = (
            np.add.outer(x, x)[:, :, None] / 2
            + rng.normal(0, 5, (size, size, 1))
        ).clip(0, 255).astype(np.uint8)
        img = np.repeat(img, 3, axis=2)
        p = str(d / f"img_{i:04d}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    return d, paths, sizes


def test_decode_batch_parity_vs_pil(jpeg_dir):
    """Native decode (with DCT prescale) matches PIL decode+resize within
    JPEG-decoder tolerance at every stored resolution."""
    from PIL import Image

    _, paths, _ = jpeg_dir
    imgs, status = dp.decode_jpeg_batch(paths, 224)
    assert imgs.shape == (len(paths), 224, 224, 3)
    assert imgs.dtype == np.uint8
    assert (status == 0).all()
    for i, p in enumerate(paths):
        ref = np.asarray(
            Image.open(p).convert("RGB").resize((224, 224), Image.BILINEAR)
        ).astype(np.float32)
        diff = np.abs(imgs[i].astype(np.float32) - ref).mean()
        assert diff < 3.0, f"sample {i}: mean abs diff {diff}"


def test_decode_missing_and_corrupt(jpeg_dir, tmp_path):
    d, paths, _ = jpeg_dir
    missing = str(d / "not_there.jpg")
    imgs, status = dp.decode_jpeg_batch(
        [paths[0], missing], 64, allow_missing=True
    )
    assert status.tolist() == [0, 1]
    assert imgs[1].max() == 0  # zero placeholder
    with pytest.raises(FileNotFoundError):
        dp.decode_jpeg_batch([missing], 64, allow_missing=False)
    # undecodable content does NOT raise wholesale: status 2 marks the row
    # and the caller retries it with the content-sniffing per-sample decoder
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8this is not a jpeg")
    imgs, status = dp.decode_jpeg_batch([str(paths[0]), str(bad)], 64)
    assert status.tolist() == [0, 2]


def test_png_content_behind_jpg_name_falls_back(jpeg_dir):
    """A PNG saved with a .jpg extension (common in scraped datasets) must
    decode through the per-sample content-sniffing fallback instead of
    killing the batch — the cv2/PIL path always handled these."""
    from PIL import Image
    from linnaeus_tpu.data.datasets import DirImageSource

    d, paths, _ = jpeg_dir
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
    Image.fromarray(arr).save(str(d / "sneaky_png.jpg"), "PNG")
    idents = [os.path.basename(p)[:-4] for p in paths] + ["sneaky_png"]
    src = DirImageSource(str(d), idents, 64, native="on")
    rows = src.read_batch_rows(np.array([0, len(idents) - 1]))
    assert rows.shape == (2, 64, 64, 3)
    # the fallback IS the per-sample content-sniffing path: exact match
    np.testing.assert_array_equal(rows[1], src.read(len(idents) - 1))
    assert rows[1].max() > 0  # decoded content, not a zero placeholder
    # genuinely corrupt content still raises (from the fallback decoder)
    (d / "truly_bad.jpg").write_bytes(b"\xff\xd8garbage")
    src2 = DirImageSource(str(d), idents + ["truly_bad"], 64, native="on")
    with pytest.raises(Exception):
        src2.read_batch_rows(np.array([len(idents)]))


def test_dir_source_batch_path_through_dataset(jpeg_dir):
    """PrefetchingDataset routes hybrid reads through the native batch
    decode, and the result matches the per-sample Python path within
    decoder tolerance (cv2/PIL and libjpeg differ in IDCT rounding)."""
    from linnaeus_tpu.data.datasets import DirImageSource, PrefetchingDataset
    from linnaeus_tpu.data.processor import ProcessedLabels

    d, paths, _ = jpeg_dir
    idents = [os.path.basename(p)[:-4] for p in paths]
    labels = ProcessedLabels()
    labels.img_identifiers = idents
    labels.labels = {"taxa_L10": np.arange(len(idents), dtype=np.int32)}
    labels.aux = np.zeros((len(idents), 2), np.float32)
    labels.group_ids = {}

    native_ds = PrefetchingDataset(
        labels,
        DirImageSource(str(d), idents, 112, native="on"),
        ["taxa_L10"],
    )
    python_ds = PrefetchingDataset(
        labels,
        DirImageSource(str(d), idents, 112, native="off"),
        ["taxa_L10"],
    )
    assert native_ds._can_bulk_read()
    assert not python_ds._can_bulk_read()
    idx = np.array([2, 0, 5, 1])
    a = native_ds.read_batch(idx)["images"].astype(np.float32)
    b = python_ds.read_batch(idx)["images"].astype(np.float32)
    assert a.shape == b.shape == (4, 112, 112, 3)
    assert np.abs(a - b).mean() < 3.0
    np.testing.assert_array_equal(
        native_ds.read_batch(idx)["targets"]["taxa_L10"], idx.astype(np.int32)
    )


def test_dir_source_native_missing_placeholder(jpeg_dir):
    """ALLOW_MISSING zero-placeholder semantics carry through the native
    batch path; strict mode raises like the per-sample path."""
    from linnaeus_tpu.data.datasets import DirImageSource

    d, paths, _ = jpeg_dir
    idents = [os.path.basename(p)[:-4] for p in paths] + ["missing_one"]
    src = DirImageSource(str(d), idents, 64, allow_missing=True, native="on")
    rows = src.read_batch_rows(np.array([0, len(idents) - 1]))
    assert rows[1].max() == 0
    strict = DirImageSource(str(d), idents, 64, native="on")
    with pytest.raises(FileNotFoundError):
        strict.read_batch_rows(np.array([len(idents) - 1]))


def test_concurrent_batch_calls_share_the_pool(jpeg_dir):
    """Several threads decoding batches at once (the loader's
    BATCH_CONCURRENCY shape) all complete correctly through the shared
    persistent worker pool — no per-call thread spawning, no deadlock."""
    import threading

    _, paths, _ = jpeg_dir
    want, _ = dp.decode_jpeg_batch(paths, 96)
    results = [None] * 4
    errs = []

    def worker(slot):
        try:
            for _ in range(3):
                imgs, status = dp.decode_jpeg_batch(paths, 96)
                assert (status == 0).all()
            results[slot] = imgs
        except Exception as e:  # surfaced below
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs, errs
    for r in results:
        assert r is not None, "worker did not finish (pool deadlock?)"
        np.testing.assert_array_equal(r, want)


def test_non_jpeg_extension_falls_back():
    from linnaeus_tpu.data.datasets import DirImageSource

    src = DirImageSource("/tmp", ["a"], 64, file_extension=".png")
    assert not src.supports_batch_read()


def test_serving_batch_preprocess_native_parity():
    """preprocess_image_batch routes JPEG request bytes through the native
    decoder and matches the PIL path within decoder tolerance; corrupt
    bytes raise exactly like the PIL path (per-sample fallback)."""
    import io

    from PIL import Image

    from linnaeus_tpu.inference.config import InferenceConfig
    from linnaeus_tpu.inference.preprocessing import preprocess_image_batch

    cfg = InferenceConfig(
        model={
            "architecture_name": "tiny_v1",
            "weights_path": "w.msgpack",
            "model_task_keys_ordered": ["taxa_L10"],
            "num_classes_per_task": [5],
            "null_class_indices": {"taxa_L10": 0},
            "expected_aux_vector_length": 11,
        },
        input_preprocessing={"image_size": [3, 224, 224]},
        metadata_preprocessing={},
        taxonomy_data={
            "source_name": "t",
            "taxonomy_tree_path": "t.json",
            "class_index_map_path": "c.json",
        },
        inference_options={},
    )
    rng = np.random.default_rng(4)
    bufs = []
    for size in (224, 448):
        x = np.linspace(0, 255, size, dtype=np.float32)
        img = np.repeat(
            (np.add.outer(x, x)[:, :, None] / 2
             + rng.normal(0, 4, (size, size, 1))).clip(0, 255).astype(
                np.uint8
            ),
            3, 2,
        )
        b = io.BytesIO()
        Image.fromarray(img).save(b, "JPEG", quality=92)
        bufs.append(b.getvalue())

    native = preprocess_image_batch(bufs, cfg)
    # force the PIL path by mixing in a non-bytes input type
    pil = np.stack(
        [
            preprocess_image_batch([np.asarray(Image.open(io.BytesIO(b)))],
                                   cfg)[0]
            for b in bufs
        ]
    )
    assert native.shape == (2, 224, 224, 3)
    # normalized space: JPEG decoder tolerance of ~1-2 u8 -> ~0.02 here
    assert np.abs(native - pil).mean() < 0.05

    with pytest.raises(Exception):
        preprocess_image_batch([bufs[0], b"\xff\xd8corrupt"], cfg)
