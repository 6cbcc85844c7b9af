"""Data pipeline tests on a synthetic HDF5 fixture (SURVEY.md §4 approach)."""

import h5py
import numpy as np
import pytest

from linnaeus_tpu.configuration import get_default_config
from linnaeus_tpu.data.build import build_datasets, build_loaders
from linnaeus_tpu.data.processor import DatasetProcessor
from linnaeus_tpu.data.sampler import GroupedBatchSampler

N = 64
TASKS = ["taxa_L10", "taxa_L20"]


@pytest.fixture(scope="module")
def labels_h5(tmp_path_factory):
    """Synthetic labels file: 64 samples, 8 species under 3 genera, temporal
    (2) + spatial (3) metadata, some nulls and some missing spatial."""
    path = str(tmp_path_factory.mktemp("h5") / "labels.h5")
    rng = np.random.default_rng(0)
    species = rng.integers(1, 9, N)  # taxon ids 1..8
    species[:6] = 0  # nulls
    genus_of = {s: 100 + (s - 1) // 3 for s in range(1, 9)}
    genus = np.array([genus_of.get(int(s), 0) for s in species])
    temporal = rng.normal(size=(N, 2)).astype(np.float32)
    spatial = rng.normal(size=(N, 3)).astype(np.float32)
    spatial[10:16] = 0.0  # missing spatial
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "img_identifiers",
            data=np.array([f"img_{i:04d}" for i in range(N)], dtype="S16"),
        )
        f.create_dataset("taxa_L10", data=species.astype(np.int64))
        f.create_dataset("taxa_L20", data=genus.astype(np.int64))
        f.create_dataset("temporal", data=temporal)
        f.create_dataset("spatial", data=spatial)
    return path


@pytest.fixture(scope="module")
def images_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("h5img") / "images.h5")
    rng = np.random.default_rng(1)
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "images",
            data=rng.integers(0, 256, (N, 16, 16, 3), dtype=np.uint8),
        )
    return path


def small_config(labels_path, images_path):
    cfg = get_default_config()
    cfg.DATA.TASK_KEYS_H5 = list(TASKS)
    cfg.DATA.PARTIAL.LEVELS = True
    cfg.DATA.IMG_SIZE = 16
    cfg.DATA.BATCH_SIZE = 8
    cfg.DATA.BATCH_SIZE_VAL = 8
    cfg.DATA.H5.LABELS_PATH = labels_path
    cfg.DATA.H5.IMAGES_PATH = images_path
    cfg.DATA.H5.TRAIN_VAL_SPLIT_RATIO = 0.75
    cfg.DATA.PREFETCH.MEM_CACHE_SIZE = 1 << 20
    cfg.SCHEDULE.MIX.GROUP_LEVELS = ["taxa_L20", "taxa_L10"]
    cfg.DATA.SAMPLER.GROUPED_MODE = "mixed-pairs"
    return cfg


def test_processor_class_maps(labels_h5):
    cfg = small_config(labels_h5, None)
    proc = DatasetProcessor(cfg)
    data, _, train_idx, val_idx = proc.process_single_file(labels_h5, 0.75, 42)
    # null class occupies index 0 under PARTIAL.LEVELS
    assert proc.class_to_idx["taxa_L10"]["null"] == 0
    assert proc.num_classes["taxa_L10"] == 9  # 8 species + null
    assert proc.num_classes["taxa_L20"] == 4  # 3 genera + null
    # null samples map to index 0
    assert (data.labels["taxa_L10"][:6] == 0).all()
    # split partitions valid indices
    assert len(set(train_idx) & set(val_idx)) == 0
    assert len(train_idx) + len(val_idx) == N  # all valid under partial levels


def test_processor_hierarchy_and_tree(labels_h5):
    cfg = small_config(labels_h5, None)
    proc = DatasetProcessor(cfg)
    proc.process_single_file(labels_h5, 0.75, 42)
    tree = proc.taxonomy_tree
    assert tree is not None
    # every non-null species has a genus parent
    for sp_idx in range(1, 9):
        parent = tree.get_parent(("taxa_L10", sp_idx))
        assert parent is not None and parent[0] == "taxa_L20"
    mats = tree.build_hierarchy_matrices()
    m = mats["taxa_L20_taxa_L10"]
    assert m.shape == (4, 9)
    # column sums: each non-null child has exactly one parent
    assert (m.sum(axis=0)[1:] == 1).all()


def test_processor_densities(labels_h5):
    cfg = small_config(labels_h5, None)
    proc = DatasetProcessor(cfg)
    proc.process_single_file(labels_h5, 0.75, 42)
    d = proc.task_label_density["taxa_L10"]["all"]
    assert d == pytest.approx((N - 6) / N)
    assert proc.meta_label_density["SPATIAL"]["all"] == pytest.approx((N - 6) / N)


def test_grouped_sampler_mixed_pairs(labels_h5):
    cfg = small_config(labels_h5, None)
    proc = DatasetProcessor(cfg)
    data, _, train_idx, _ = proc.process_single_file(labels_h5, 0.75, 42)
    sampler = GroupedBatchSampler(
        data.group_ids, train_idx, batch_size=8, mode="mixed-pairs", seed=0,
        initial_level="taxa_L20",
    )
    batches = sampler.batches()
    assert batches, "no batches emitted"
    gids = data.group_ids["taxa_L20"]
    for b in batches:
        assert len(b) == 8
        # consecutive pairs share a group
        for i in range(0, 8, 2):
            assert gids[b[i]] == gids[b[i + 1]]
            assert gids[b[i]] >= 0


def test_grouped_sampler_epoch_determinism(labels_h5):
    cfg = small_config(labels_h5, None)
    proc = DatasetProcessor(cfg)
    data, _, train_idx, _ = proc.process_single_file(labels_h5, 0.75, 42)
    s1 = GroupedBatchSampler(data.group_ids, train_idx, 8, "mixed-pairs", seed=1)
    s2 = GroupedBatchSampler(data.group_ids, train_idx, 8, "mixed-pairs", seed=1)
    s1.set_epoch(3)
    s2.set_epoch(3)
    for a, b in zip(s1.batches(), s2.batches()):
        np.testing.assert_array_equal(a, b)
    s2.set_epoch(4)
    assert any(
        not np.array_equal(a, b) for a, b in zip(s1.batches(), s2.batches())
    )


def test_strict_group_sharding(labels_h5):
    cfg = small_config(labels_h5, None)
    proc = DatasetProcessor(cfg)
    data, _, train_idx, _ = proc.process_single_file(labels_h5, 0.75, 42)
    seen = {}
    for pidx in range(2):
        s = GroupedBatchSampler(
            data.group_ids, train_idx, 4, "strict-group",
            process_index=pidx, process_count=2, seed=0,
            initial_level="taxa_L20",
        )
        for b in s.batches():
            for i in b:
                gid = int(data.group_ids["taxa_L20"][i])
                if gid >= 0:
                    assert seen.setdefault(gid, pidx) == pidx, (
                        f"group {gid} on two hosts"
                    )


def test_build_datasets_and_loader_end_to_end(labels_h5, images_h5):
    cfg = small_config(labels_h5, images_h5)
    bundle = build_datasets(cfg)
    assert bundle["num_classes"]["taxa_L10"] == 9
    train_loader, val_loader = build_loaders(cfg, bundle)
    batches = list(train_loader)
    assert batches
    b = batches[0]
    assert b["images"].shape == (8, 16, 16, 3)
    # uint8 stays uint8 on the host; normalization happens on device
    assert b["images"].dtype == np.uint8
    assert b["targets"]["taxa_L10"].shape == (8,)
    assert b["aux"].shape == (8, 5)
    assert b["group_ids"].shape == (8,)
    assert val_loader is not None
    vb = list(val_loader)
    assert vb and vb[0]["images"].shape[0] == 8
    stats = train_loader.pipeline_metrics()
    assert stats["batches_emitted"] == len(batches)
    train_loader.close()
    val_loader.close()


def test_read_sample_retries_transient_io():
    """Transient OSError reads retry with backoff before surfacing
    (reference: the RETRY sentinel in base_prefetching_dataset.py:148-164)."""
    from linnaeus_tpu.data.datasets import PrefetchingDataset, SyntheticImageSource
    from linnaeus_tpu.data.processor import ProcessedLabels

    labels = ProcessedLabels()
    labels.img_identifiers = [f"i{i}" for i in range(4)]
    labels.labels = {"taxa_L10": np.zeros(4, np.int32)}

    class FlakySource(SyntheticImageSource):
        def __init__(self):
            super().__init__(8)
            self.calls = 0

        def read(self, idx):
            self.calls += 1
            if self.calls == 1:
                raise OSError("transient NFS hiccup")
            return super().read(idx)

    ds = PrefetchingDataset(labels, FlakySource(), ["taxa_L10"])
    img = ds.read_sample(0)  # first call fails once, then succeeds
    assert img.shape[0] == 8

    class AlwaysDown(SyntheticImageSource):
        def read(self, idx):
            raise OSError("gone")

    ds2 = PrefetchingDataset(labels, AlwaysDown(8), ["taxa_L10"])
    with pytest.raises(OSError):
        ds2.read_sample(0)


def test_host_augmentation_cpu_mode(labels_h5, images_h5):
    """AUG.SINGLE_AUG_DEVICE='cpu' applies the batched augmentation on host
    batches before device transfer; validation stays unaugmented."""
    cfg = small_config(labels_h5, images_h5)
    cfg.AUG.SINGLE_AUG_DEVICE = "cpu"
    cfg.AUG.AUTOAUG.POLICY = "3a"
    bundle = build_datasets(cfg)
    train_loader, val_loader = build_loaders(cfg, bundle)
    train_loader.set_epoch(0)
    b = next(iter(train_loader))
    # augmented batches are float32 in [0,1]
    assert b["images"].dtype == np.float32
    assert 0.0 <= b["images"].min() and b["images"].max() <= 1.0

    # raw pixels for the same indices differ from the augmented output
    idx = train_loader.sampler.batches()[0]
    raw = bundle["train_dataset"].read_batch(idx)["images"].astype(np.float32) / 255.0
    assert not np.allclose(raw, b["images"])

    # val loader untouched (uint8 straight from the reader)
    vb = next(iter(val_loader))
    assert vb["images"].dtype == np.uint8
    train_loader.close()
    val_loader.close()


def test_device_mode_leaves_host_batches_raw(labels_h5, images_h5):
    cfg = small_config(labels_h5, images_h5)
    cfg.AUG.SINGLE_AUG_DEVICE = "device"
    cfg.AUG.AUTOAUG.POLICY = "3a"
    bundle = build_datasets(cfg)
    train_loader, _ = build_loaders(cfg, bundle)
    b = next(iter(train_loader))
    assert b["images"].dtype == np.uint8  # augmentation happens in the step
    train_loader.close()


# ------------------------------------------------------ vectorized mixed-pairs
def _loop_mixed_pairs(groups, indices, rng):
    """The pre-vectorization reference implementation (per-sample Python
    loop, mirrors grouped_batch_sampler.py:289): pair samples in shuffled
    encounter order within each group."""
    order = rng.permutation(len(indices))
    pairs, buckets = [], {}
    for pos in order:
        gid = int(groups[pos])
        if gid < 0:
            continue
        if gid in buckets:
            pairs.append((indices[buckets.pop(gid)], indices[pos]))
        else:
            buckets[gid] = pos
    return pairs


def test_mixed_pairs_vectorized_distribution_equivalence():
    """Same pair-count per group, same-group invariant, no duplicates —
    the vectorized sampler is distribution-equivalent to the loop version."""
    from linnaeus_tpu.data.sampler import GroupedBatchSampler

    rng = np.random.default_rng(0)
    n = 5000
    groups = rng.integers(-1, 40, n).astype(np.int64)
    indices = np.arange(n, dtype=np.int64)
    s = GroupedBatchSampler({"L": groups}, indices, batch_size=8, mode="mixed-pairs")
    s.set_epoch(3)
    batches = s.batches()
    flat = np.concatenate(batches)
    # no sample appears twice
    assert len(np.unique(flat)) == len(flat)
    # every adjacent pair is same-group
    pairs = flat.reshape(-1, 2)
    np.testing.assert_array_equal(groups[pairs[:, 0]], groups[pairs[:, 1]])
    assert (groups[pairs[:, 0]] >= 0).all()

    # pair count per group matches the loop implementation exactly
    loop_pairs = _loop_mixed_pairs(groups, indices, np.random.default_rng(1))
    import collections

    def per_group(ps):
        return collections.Counter(int(groups[a]) for a, b in ps)

    # batching drops the ragged tail; compare at the pair-construction level
    vec_all = GroupedBatchSampler(
        {"L": groups}, indices, batch_size=2, mode="mixed-pairs"
    )
    vec_all.set_epoch(3)
    vec_pairs = [tuple(b.reshape(-1, 2)[0]) for b in vec_all.batches()]
    assert per_group(vec_pairs) == per_group(loop_pairs)


def test_mixed_pairs_vectorized_speed_1m():
    """VERDICT #5 done-criterion: <1s/epoch at 1M samples."""
    import time

    from linnaeus_tpu.data.sampler import GroupedBatchSampler

    rng = np.random.default_rng(0)
    n = 1_000_000
    groups = rng.integers(0, 50_000, n).astype(np.int64)
    indices = np.arange(n, dtype=np.int64)
    s = GroupedBatchSampler({"L": groups}, indices, batch_size=256, mode="mixed-pairs")
    batches = s.batches()  # warm-up epoch (first call pays page faults)
    assert batches
    s.set_epoch(1)
    t0 = time.perf_counter()
    batches = s.batches()
    elapsed = time.perf_counter() - t0
    assert batches
    assert elapsed < 1.0, f"mixed-pairs epoch took {elapsed:.2f}s at 1M samples"


def test_strict_group_vectorized_speed_1m():
    """VERDICT r2 #7 done-criterion: <1s/epoch at 1M rows / 100k groups
    (the per-group boolean-scan loop was O(G*N))."""
    import time

    from linnaeus_tpu.data.sampler import GroupedBatchSampler

    rng = np.random.default_rng(0)
    n = 1_000_000
    groups = rng.integers(0, 100_000, n).astype(np.int64)
    indices = np.arange(n, dtype=np.int64)
    s = GroupedBatchSampler(
        {"L": groups}, indices, batch_size=256, mode="strict-group"
    )
    assert s.batches()  # warm-up epoch (first call pays page faults)
    s.set_epoch(1)
    t0 = time.perf_counter()
    batches = s.batches()
    elapsed = time.perf_counter() - t0
    assert batches
    assert elapsed < 1.0, f"strict-group epoch took {elapsed:.2f}s at 1M rows"


def test_strict_group_vectorized_distribution():
    """The one-sort implementation keeps the loop version's properties:
    whole groups stay contiguous, group-block order and within-group order
    are shuffled per epoch, sample multiset is exactly the shard."""
    from linnaeus_tpu.data.sampler import GroupedBatchSampler

    rng = np.random.default_rng(7)
    n = 4096
    groups = rng.integers(0, 37, n).astype(np.int64)
    groups[:64] = -1  # some ungrouped
    indices = np.arange(n, dtype=np.int64)
    s = GroupedBatchSampler(
        {"L": groups}, indices, batch_size=64, mode="strict-group"
    )
    orders = []
    for epoch in (0, 1):
        s.set_epoch(epoch)
        flat = np.concatenate(s.batches())
        # group-coherence: each group's samples occupy one contiguous run
        # in the pre-batch ordering (check via first/last occurrence spans)
        g_of = groups[flat]
        seen_done = set()
        prev = None
        for g in g_of:
            if g != prev:
                assert g not in seen_done, f"group {g} split into two runs"
                if prev is not None:
                    seen_done.add(prev)
                prev = g
        orders.append(flat)
    # different epochs produce different orders (group blocks shuffled)
    assert not np.array_equal(orders[0], orders[1])
    # within-group order is shuffled, not sorted by index
    g0 = orders[0][groups[orders[0]] == groups[orders[0]][0]]
    assert not np.array_equal(g0, np.sort(g0))
    # multiset preservation across the two epochs
    assert np.array_equal(np.sort(orders[0]), np.sort(orders[1]))


# ----------------------------------------------------------- multi-host tests
def test_mixed_pairs_multi_host_disjoint_exact_cover():
    """VERDICT #3: across process_index 0..7 the per-host batches are a
    disjoint cover of the global pair set with identical pair structure
    (reference rank logic: grouped_batch_sampler.py:289-425)."""
    from linnaeus_tpu.data.sampler import GroupedBatchSampler

    rng = np.random.default_rng(2)
    n = 4096
    groups = rng.integers(0, 300, n).astype(np.int64)
    indices = np.arange(n, dtype=np.int64)
    P = 8
    all_pairs = []
    seen = set()
    for pidx in range(P):
        s = GroupedBatchSampler(
            {"L": groups}, indices, batch_size=8, mode="mixed-pairs",
            process_index=pidx, process_count=P,
        )
        s.set_epoch(1)
        flat = np.concatenate(s.batches()) if s.batches() else np.array([], np.int64)
        pairs = {tuple(p) for p in flat.reshape(-1, 2)}
        # disjoint across hosts
        assert not (pairs & seen)
        seen |= pairs
        all_pairs.append(pairs)
        # same-group structure everywhere
        for a, b in pairs:
            assert groups[a] == groups[b]

    # exact cover: the union equals the single-host pair set minus only the
    # round-robin tails each host drops to fixed batch shapes
    s_all = GroupedBatchSampler(
        {"L": groups}, indices, batch_size=2, mode="mixed-pairs",
        process_index=0, process_count=1,
    )
    s_all.set_epoch(1)
    global_pairs = {
        tuple(p)
        for b in s_all.batches()
        for p in b.reshape(-1, 2)
    }
    assert seen <= global_pairs
    # hosts cover nearly everything (each host drops < batch_size/2 pairs)
    assert len(global_pairs) - len(seen) < P * 4


def test_strict_group_multi_host_partition():
    from linnaeus_tpu.data.sampler import GroupedBatchSampler

    rng = np.random.default_rng(3)
    n = 2048
    groups = rng.integers(0, 100, n).astype(np.int64)
    indices = np.arange(n, dtype=np.int64)
    P = 4
    owner = {}
    for pidx in range(P):
        s = GroupedBatchSampler(
            {"L": groups}, indices, batch_size=8, mode="strict-group",
            process_index=pidx, process_count=P,
        )
        for b in s.batches():
            for i in b:
                g = int(groups[i])
                # a group never spans two hosts
                assert owner.setdefault(g, pidx) == pidx


def test_image_verifier_excludes_missing_under_threshold(labels_h5, tmp_path):
    """DATA.HYBRID.VERIFY_IMAGES: under-threshold missing files warn and get
    excluded from the train/val indices; over-threshold raises (reference:
    vectorized_dataset_processor.py:263-337, image_verifier.py:16-180)."""
    from PIL import Image

    from linnaeus_tpu.data.build import build_datasets

    with h5py.File(labels_h5, "r") as f:
        idents = [x.decode() for x in f["img_identifiers"][...]]
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for ident in idents:
        arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{ident}.png")

    cfg = get_default_config()
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.H5.LABELS_PATH = str(labels_h5)
    cfg.DATA.H5.TRAIN_VAL_SPLIT_RATIO = 0.8
    cfg.DATA.HYBRID.USE_HYBRID = True
    cfg.DATA.HYBRID.IMAGES_DIR = str(img_dir)
    cfg.DATA.HYBRID.FILE_EXTENSION = ".png"
    cfg.DATA.HYBRID.ALLOW_MISSING_IMAGES = True
    cfg.DATA.HYBRID.VERIFY_IMAGES.ENABLED = True

    # baseline: all image files present, verification a no-op
    bundle0 = build_datasets(cfg)
    all0 = set(int(i) for i in bundle0["train_indices"]) | set(
        int(i) for i in bundle0["val_indices"]
    )
    # delete 3 baseline-valid images (avoid samples other validity rules
    # already exclude)
    missing = set(sorted(all0)[:3])
    for k in missing:
        (img_dir / f"{idents[k]}.png").unlink()

    # thresholds at 0 = disabled (reference semantics): exclude + proceed
    bundle = build_datasets(cfg)
    survivors = set(int(i) for i in bundle["train_indices"]) | set(
        int(i) for i in bundle["val_indices"]
    )
    assert missing.isdisjoint(survivors)
    assert len(survivors) == len(all0) - len(missing)

    # over-threshold: MAX_MISSING_COUNT=2 < 3 missing -> abort
    cfg.DATA.HYBRID.VERIFY_IMAGES.ENABLED = True
    cfg.DATA.HYBRID.VERIFY_IMAGES.MAX_MISSING_COUNT = 2
    cfg.DATA.HYBRID.VERIFY_IMAGES.MAX_MISSING_RATIO = 0.001
    with pytest.raises(RuntimeError, match="missing"):
        build_datasets(cfg)
    # generous thresholds pass again
    cfg.DATA.HYBRID.VERIFY_IMAGES.MAX_MISSING_COUNT = 10
    cfg.DATA.HYBRID.VERIFY_IMAGES.MAX_MISSING_RATIO = 0.5
    bundle2 = build_datasets(cfg)
    assert missing.isdisjoint(set(bundle2["train_indices"]))


def test_hybrid_dir_image_source_end_to_end(labels_h5, tmp_path):
    """Hybrid mode: labels in HDF5, images in a directory keyed by
    img_identifier (reference: prefetching_hybrid_dataset.py), including
    the ALLOW_MISSING_IMAGES placeholder path."""
    from PIL import Image

    from linnaeus_tpu.data.build import build_datasets, build_loaders

    # identifiers in the fixture are i0..iN-1; write a png per sample
    # EXCEPT i1 (exercises the placeholder)
    with h5py.File(labels_h5, "r") as f:
        idents = [x.decode() for x in f["img_identifiers"][...]]
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for k, ident in enumerate(idents):
        if k == 1:  # leave the second identifier missing
            continue
        arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{ident}.png")

    cfg = get_default_config()
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.BATCH_SIZE = 4
    cfg.DATA.BATCH_SIZE_VAL = 4
    cfg.DATA.H5.LABELS_PATH = str(labels_h5)
    cfg.DATA.H5.TRAIN_VAL_SPLIT_RATIO = 0.8
    cfg.DATA.HYBRID.USE_HYBRID = True
    cfg.DATA.HYBRID.IMAGES_DIR = str(img_dir)
    cfg.DATA.HYBRID.FILE_EXTENSION = ".png"
    cfg.DATA.HYBRID.ALLOW_MISSING_IMAGES = True
    cfg.DATA.SAMPLER.GROUPED_MODE = "standard"

    bundle = build_datasets(cfg)
    train_loader, _ = build_loaders(cfg, bundle)
    train_loader.set_epoch(0)
    batch = next(iter(train_loader))
    assert batch["images"].shape == (4, 32, 32, 3)
    assert batch["images"].dtype == np.uint8
    train_loader.close()

    # direct source checks: resize happened, missing id gives zeros
    src = bundle["train_dataset"].source
    i1 = 1
    np.testing.assert_array_equal(
        src.read(i1), np.zeros((32, 32, 3), np.uint8)
    )
    some = 0
    img = src.read(some)
    assert img.shape == (32, 32, 3) and img.any()

    # strict mode raises on the missing file
    cfg.DATA.HYBRID.ALLOW_MISSING_IMAGES = False
    bundle2 = build_datasets(cfg)
    src2 = bundle2["train_dataset"].source
    with pytest.raises(FileNotFoundError):
        src2.read(i1)


def test_min_group_size_marks_small_groups(labels_h5):
    """Groups smaller than SCHEDULE.MIX.MIN_GROUP_SIZE get group id -1 —
    they can never produce an in-group partner (reference:
    vectorized_dataset_processor.py:845,1220)."""
    cfg = small_config(labels_h5, None)
    cfg.SCHEDULE.MIX.MIN_GROUP_SIZE = 10_000  # nothing is big enough
    proc = DatasetProcessor(cfg)
    data, _, _, _ = proc.process_single_file(labels_h5, 0.75, 42)
    for task in TASKS:
        assert (data.group_ids[task] == -1).all()

    cfg2 = small_config(labels_h5, None)
    cfg2.SCHEDULE.MIX.MIN_GROUP_SIZE = 1
    proc2 = DatasetProcessor(cfg2)
    data2, _, _, _ = proc2.process_single_file(labels_h5, 0.75, 42)
    # with threshold 1 only nulls are ungrouped
    for task in TASKS:
        nonnull = data2.labels[task] != 0
        assert (data2.group_ids[task][nonnull] >= 0).all()


def test_loader_max_processed_batches_still_yields_all(labels_h5, tmp_path):
    """The MAX_PROCESSED_BATCHES host-memory cap must not drop batches."""
    import h5py

    from linnaeus_tpu.data.build import build_datasets, build_loaders

    cfg = small_config(labels_h5, None)
    images_path = str(tmp_path / "images.h5")
    with h5py.File(labels_h5, "r") as lf:
        n = len(lf["img_identifiers"])
    rng = np.random.default_rng(0)
    with h5py.File(images_path, "w") as f:
        f.create_dataset(
            "images", data=rng.integers(0, 255, (n, 16, 16, 3), dtype=np.uint8)
        )
    cfg.DATA.H5.IMAGES_PATH = images_path
    cfg.DATA.BATCH_SIZE = 2
    cfg.DATA.PREFETCH.MAX_PROCESSED_BATCHES = 2
    cfg.DATA.PREFETCH.BATCH_CONCURRENCY = 4
    cfg.DATA.PREFETCH.NUM_PREPROCESS_THREADS = 2
    bundle = build_datasets(cfg)
    train_loader, _ = build_loaders(cfg, bundle)
    n_batches = sum(1 for _ in train_loader)
    assert n_batches == len(train_loader) and n_batches > 0


# ---------------------------------------------------------------- direct-chunk
def _chunked_images(tmp_path, n=40, size=16, **dset_kw):
    path = str(tmp_path / "chunked.h5")
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)
    with h5py.File(path, "w") as f:
        f.create_dataset("images", data=data,
                         chunks=(1, size, size, 3), **dset_kw)
    return path, data


def test_h5_direct_chunk_gather_equals_per_row(tmp_path):
    from linnaeus_tpu.data.datasets import H5ImageSource

    path, data = _chunked_images(tmp_path)
    src = H5ImageSource(path, 16)
    assert src.supports_batch_read()
    idx = np.asarray([5, 0, 17, 39, 5])  # duplicates + unsorted
    got = src.read_batch_rows(idx)
    np.testing.assert_array_equal(got, data[idx])
    np.testing.assert_array_equal(src.read(7), data[7])  # per-row parity
    src.close()


def test_h5_direct_chunk_gating(tmp_path):
    from linnaeus_tpu.data.datasets import H5ImageSource

    # eligible layout, explicitly disabled
    path, _ = _chunked_images(tmp_path)
    off = H5ImageSource(path, 16, direct_chunk="off")
    assert not off.supports_batch_read()
    off.close()

    # compressed -> ineligible under auto, raises under 'on'
    zpath, zdata = _chunked_images(tmp_path, compression="gzip")
    z = H5ImageSource(zpath, 16)
    assert not z.supports_batch_read()
    np.testing.assert_array_equal(z.read(3), zdata[3])
    z.close()
    with pytest.raises(ValueError, match="ineligible"):
        H5ImageSource(zpath, 16, direct_chunk="on").supports_batch_read()

    # stored size != target (needs resize) -> ineligible
    rdir = tmp_path / "r"
    rdir.mkdir()
    rpath, _ = _chunked_images(rdir, size=16)
    r = H5ImageSource(rpath, 8)
    assert not r.supports_batch_read()
    assert r.read(0).shape == (8, 8, 3)
    r.close()


def test_h5_close_is_terminal_for_direct_chunk(tmp_path):
    """close() parks the direct-chunk path in a terminal 'unavailable'
    state: a post-close read must fall back to per-row h5py reads instead
    of silently reopening the closed fd."""
    from linnaeus_tpu.data.datasets import H5ImageSource

    path, data = _chunked_images(tmp_path)
    src = H5ImageSource(path, 16)
    assert src.supports_batch_read()
    src.close()
    assert not src.supports_batch_read()  # no re-resolution after close
    np.testing.assert_array_equal(src.read(2), data[2])  # h5py fallback
    assert not src.supports_batch_read()
    src.close()  # idempotent


def test_h5_direct_chunk_contiguous_layout_falls_back(images_h5):
    # the module fixture writes a CONTIGUOUS dataset (no chunks)
    from linnaeus_tpu.data.datasets import H5ImageSource

    src = H5ImageSource(images_h5, 16)
    assert not src.supports_batch_read()
    src.close()


def test_loader_batches_identical_direct_vs_per_row(tmp_path, labels_h5):
    """Same loader output images whether batch reads take the direct-chunk
    gather or per-row h5py reads."""
    import os

    os.makedirs(tmp_path / "a", exist_ok=True)
    path, _ = _chunked_images(tmp_path / "a", n=N)

    def batches(mode):
        cfg = small_config(labels_h5, path)
        cfg.DATA.H5.DIRECT_CHUNK_READS = mode
        cfg.DATA.PREFETCH.MEM_CACHE_SIZE = 0
        bundle = build_datasets(cfg)
        loader, _ = build_loaders(cfg, bundle, device_put_fn=None)
        loader.set_epoch(0)
        out = [np.asarray(b["images"]) for b in loader]
        loader.close()
        return out

    a = batches("on")
    b = batches("off")
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
