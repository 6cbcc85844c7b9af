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
    return {
        "samples": n,
        "seconds": elapsed,
        "samples_per_sec": n / elapsed,
        **loader.pipeline_metrics(),
    }


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
    args = parser.parse_args(argv)

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.data.build import build_datasets, build_loaders

    cfg = get_default_config()
    cfg.DATA.IMG_SIZE = args.img_size
    cfg.DATA.BATCH_SIZE = args.batch_size
    cfg.DATA.PREFETCH.NUM_IO_THREADS = args.io_threads
    cfg.DATA.SAMPLER.TYPE = "standard"

    if args.labels:
        cfg.DATA.H5.LABELS_PATH = args.labels
        cfg.DATA.H5.IMAGES_PATH = args.images
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

    bundle = build_datasets(cfg)
    train_loader, _ = build_loaders(cfg, bundle)
    result = benchmark_loader(train_loader, args.max_batches)
    train_loader.close()
    print(json.dumps({k: v for k, v in result.items() if not isinstance(v, dict)},
                     indent=2))


if __name__ == "__main__":
    main()
