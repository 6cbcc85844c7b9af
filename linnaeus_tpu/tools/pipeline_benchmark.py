"""Input-pipeline throughput benchmark (host side).

Measures samples/sec of the prefetching loader in isolation — the host must
sustain the device's consumption rate (>=5k img/s north star for
mFormerV1_sm inference). Usage:

    python -m linnaeus_tpu.tools.pipeline_benchmark --labels labels.h5 \
        --images images.h5 --img-size 224 --batch-size 128
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def benchmark_loader(loader, max_batches: int = 100) -> dict:
    n = 0
    start = time.perf_counter()
    for i, batch in enumerate(loader):
        n += batch["images"].shape[0]
        if i + 1 >= max_batches:
            break
    elapsed = max(time.perf_counter() - start, 1e-9)
    # loader.pipeline_metrics() finalizes only at full-epoch end; an early
    # break leaves its throughput at 0, so report our own timer only
    return {
        "samples": n,
        "seconds": elapsed,
        "samples_per_sec": n / elapsed,
    }


def generate_real_dataset(path_prefix: str, n: int, img_size: int) -> tuple[str, str]:
    """Write a REAL file-backed HDF5 dataset (random uint8 pixels + labels)
    so the benchmark measures actual HDF5 chunk reads, not an in-memory
    source. ~n * img_size^2 * 3 bytes on disk; 20k @ 224px ~= 2.8 GB."""
    import h5py

    labels_path = f"{path_prefix}_labels.h5"
    images_path = f"{path_prefix}_images.h5"
    rng = np.random.default_rng(0)
    with h5py.File(labels_path, "w") as f:
        f.create_dataset(
            "img_identifiers", data=np.array([f"i{i}" for i in range(n)], "S12")
        )
        f.create_dataset("taxa_L10", data=rng.integers(1, 500, n))
        f.create_dataset("taxa_L20", data=rng.integers(501, 600, n))
        f.create_dataset("temporal", data=rng.normal(size=(n, 2)).astype("f4"))
        f.create_dataset("spatial", data=rng.normal(size=(n, 3)).astype("f4"))
    with h5py.File(images_path, "w") as f:
        # chunk = one image: the random-access unit of the grouped sampler
        dset = f.create_dataset(
            "images", shape=(n, img_size, img_size, 3), dtype="u1",
            chunks=(1, img_size, img_size, 3),
        )
        block = 512
        for s in range(0, n, block):
            e = min(s + block, n)
            dset[s:e] = rng.integers(0, 256, (e - s, img_size, img_size, 3), "u1")
    return labels_path, images_path


def generate_jpeg_dataset(
    dir_prefix: str, n: int, stored_size: int
) -> tuple[str, str]:
    """Write a REAL on-disk JPEG directory + labels HDF5 (hybrid mode): the
    production layout the reference's PrefetchingHybridDataset reads."""
    import h5py
    from PIL import Image

    import os

    images_dir = f"{dir_prefix}_jpegs"
    labels_path = f"{dir_prefix}_labels.h5"
    os.makedirs(images_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    idents = [f"img_{i:06d}" for i in range(n)]
    x = np.linspace(0, 255, stored_size, dtype=np.float32)
    base = np.add.outer(x, x)[:, :, None] / 2
    for i, ident in enumerate(idents):
        p = os.path.join(images_dir, ident + ".jpg")
        if os.path.exists(p):
            continue
        img = (base + rng.normal(0, 12, (stored_size, stored_size, 1))).clip(
            0, 255
        ).astype(np.uint8)
        Image.fromarray(np.repeat(img, 3, axis=2)).save(p, quality=88)
    with h5py.File(labels_path, "w") as f:
        f.create_dataset("img_identifiers", data=np.array(idents, "S16"))
        f.create_dataset("taxa_L10", data=rng.integers(1, 500, n))
        f.create_dataset("taxa_L20", data=rng.integers(501, 600, n))
        f.create_dataset("temporal", data=rng.normal(size=(n, 2)).astype("f4"))
        f.create_dataset("spatial", data=rng.normal(size=(n, 3)).astype("f4"))
    return labels_path, images_dir


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("pipeline_benchmark")
    parser.add_argument("--labels", default=None)
    parser.add_argument("--images", default=None)
    parser.add_argument("--img-size", type=int, default=224)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--synthetic-samples", type=int, default=4096,
                        help="used when no --labels given")
    parser.add_argument("--io-threads", type=int, default=8)
    parser.add_argument("--max-batches", type=int, default=50)
    parser.add_argument(
        "--gen-real", type=int, default=0, metavar="N",
        help="generate a file-backed HDF5 dataset of N samples first",
    )
    parser.add_argument("--gen-prefix", default="/tmp/pipebench")
    parser.add_argument(
        "--sweep-threads", default=None,
        help="comma list (e.g. 1,4,8): benchmark each IO-thread count",
    )
    parser.add_argument("--batch-concurrency", type=int, default=None)
    parser.add_argument(
        "--grouped", action="store_true",
        help="use the mixed-pairs grouped sampler (production train path)",
    )
    parser.add_argument(
        "--gen-jpeg", type=int, default=0, metavar="N",
        help="generate an on-disk JPEG dataset of N files (hybrid mode)",
    )
    parser.add_argument(
        "--stored-size", type=int, default=0,
        help="stored JPEG resolution (default 2x --img-size: exercises the "
        "native DCT-prescaled decode)",
    )
    parser.add_argument(
        "--native", default="auto", choices=["auto", "off", "on"],
        help="DATA.NATIVE_DATAPLANE for the hybrid read path",
    )
    args = parser.parse_args(argv)

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.data.build import build_datasets, build_loaders

    cfg = get_default_config()
    cfg.DATA.IMG_SIZE = args.img_size
    cfg.DATA.BATCH_SIZE = args.batch_size
    cfg.DATA.PREFETCH.NUM_IO_THREADS = args.io_threads
    if args.batch_concurrency:
        cfg.DATA.PREFETCH.BATCH_CONCURRENCY = args.batch_concurrency
    if args.grouped:
        cfg.DATA.SAMPLER.TYPE = "grouped"
        cfg.DATA.SAMPLER.GROUPED_MODE = "mixed-pairs"
        cfg.SCHEDULE.MIX.GROUP_LEVELS = ["taxa_L20"]
    else:
        cfg.DATA.SAMPLER.TYPE = "standard"

    cfg.DATA.NATIVE_DATAPLANE = args.native

    if args.gen_real:
        args.labels, args.images = generate_real_dataset(
            args.gen_prefix, args.gen_real, args.img_size
        )
        cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
        cfg.DATA.PARTIAL.LEVELS = True

    if args.gen_jpeg:
        stored = args.stored_size or 2 * args.img_size
        labels_path, images_dir = generate_jpeg_dataset(
            args.gen_prefix, args.gen_jpeg, stored
        )
        args.labels, args.images = labels_path, None
        cfg.DATA.HYBRID.USE_HYBRID = True
        cfg.DATA.HYBRID.IMAGES_DIR = images_dir
        cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
        cfg.DATA.PARTIAL.LEVELS = True

    if args.labels:
        cfg.DATA.H5.LABELS_PATH = args.labels
        cfg.DATA.H5.IMAGES_PATH = args.images
        # restrict tasks to what the labels file actually carries
        import h5py

        with h5py.File(args.labels, "r") as f:
            cfg.DATA.TASK_KEYS_H5 = [
                t for t in cfg.DATA.TASK_KEYS_H5 if t in f
            ] or ["taxa_L10"]
        cfg.DATA.PARTIAL.LEVELS = True
    else:
        # synthetic labels file in tmp
        import tempfile

        import h5py

        tmp = tempfile.NamedTemporaryFile(suffix=".h5", delete=False)
        n = args.synthetic_samples
        rng = np.random.default_rng(0)
        with h5py.File(tmp.name, "w") as f:
            f.create_dataset(
                "img_identifiers",
                data=np.array([f"i{i}" for i in range(n)], "S12"),
            )
            f.create_dataset("taxa_L10", data=rng.integers(1, 100, n))
            f.create_dataset("taxa_L20", data=rng.integers(101, 120, n))
            f.create_dataset("temporal", data=rng.normal(size=(n, 2)).astype("f4"))
            f.create_dataset("spatial", data=rng.normal(size=(n, 3)).astype("f4"))
        cfg.DATA.H5.LABELS_PATH = tmp.name
        cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
        cfg.DATA.PARTIAL.LEVELS = True
        # no images file -> synthetic pixels

    thread_counts = (
        [int(t) for t in args.sweep_threads.split(",")]
        if args.sweep_threads
        else [args.io_threads]
    )
    for n_threads in thread_counts:
        cfg.DATA.PREFETCH.NUM_IO_THREADS = n_threads
        bundle = build_datasets(cfg)
        train_loader, _ = build_loaders(cfg, bundle)
        result = benchmark_loader(train_loader, args.max_batches)
        train_loader.close()
        out = {
            "io_threads": n_threads,
            "batch_concurrency": int(cfg.DATA.PREFETCH.BATCH_CONCURRENCY),
            "grouped": bool(args.grouped),
            "native": args.native,
            "hybrid": bool(args.gen_jpeg),
            **{k: v for k, v in result.items() if not isinstance(v, dict)},
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
