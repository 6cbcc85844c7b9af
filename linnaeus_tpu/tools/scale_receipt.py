"""Data-pipeline scale receipt: wall time + peak RSS at 16k/100k/1M rows.

The reference's processor and sampler are explicitly engineered for
multi-million-sample HDF5 (one-pass vectorized scan,
vectorized_dataset_processor.py:58-243; grouped pair-building,
grouped_batch_sampler.py:289-425). This tool proves OUR pipeline holds the
same scale: every phase runs in its OWN subprocess so ``ru_maxrss`` is that
phase's true peak, and phase walls can be compared across row counts for
super-linear cliffs.

Phases per row count:
  * ``processor`` — DatasetProcessor.process_single_file one-pass scan
    (class maps, label projection, hierarchy map, TaxonomyTree build —
    the tree is also timed separately), wall + peak RSS;
  * ``sampler``   — GroupedBatchSampler mixed-pairs epoch construction
    (two epochs: build + reshuffle), wall + peak RSS;
  * ``loader``    — the production prefetching loader's steady host feed
    over the first ``--feed-batches`` batches (requires ``--with-images``);
  * ``cli``       — full train-CLI startup-to-first-step (config load ->
    processor -> sampler -> model init/compile -> step 1), measured by
    watching the run log (requires ``--with-images``).

Usage (the committed receipt: docs/performance.md scale table):
    python -m linnaeus_tpu.tools.scale_receipt --rows 16384 100000 1000000 \
        --with-images --out docs/receipts/scale_receipt.json
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np


# ----------------------------------------------------------------- dataset
def generate_labels(path: str, n: int) -> None:
    """Hierarchy-consistent 4-level labels + 5-dim meta via the SHARED
    taxonomy generator (tools/e2e_train_bench.py::hierarchy_labels — one
    source so the scale receipt can't drift from the e2e bench); ~2%
    all-level nulls keep the partial-label path exercised."""
    import h5py

    from linnaeus_tpu.tools.e2e_train_bench import hierarchy_labels

    rng = np.random.default_rng(0)
    l10, l20, l30, l40, _ = hierarchy_labels(n, null_frac=0.02, rng=rng)
    l10 = l10.astype(np.int64)
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "img_identifiers",
            data=np.char.add("i", np.arange(n).astype(str)).astype("S12"),
        )
        f.create_dataset("taxa_L10", data=l10)
        f.create_dataset("taxa_L20", data=l20)
        f.create_dataset("taxa_L30", data=l30)
        f.create_dataset("taxa_L40", data=l40)
        f.create_dataset("temporal", data=rng.normal(size=(n, 2)).astype("f4"))
        f.create_dataset("spatial", data=rng.normal(size=(n, 3)).astype("f4"))


def generate_images(path: str, n: int, img: int) -> None:
    """Production chunk layout (one image per chunk); content is a cheap
    per-row byte pattern — feed-rate probes read chunks, not semantics."""
    import h5py

    with h5py.File(path, "w") as f:
        dset = f.create_dataset(
            "images", shape=(n, img, img, 3), dtype="u1",
            chunks=(1, img, img, 3),
        )
        block = 4096
        buf = np.empty((block, img, img, 3), np.uint8)
        for s in range(0, n, block):
            e = min(s + block, n)
            buf[: e - s] = (np.arange(s, e, dtype=np.int64) % 251)[
                :, None, None, None
            ].astype(np.uint8)
            dset[s:e] = buf[: e - s]


def _cfg(labels: str, images: str | None, img: int):
    from linnaeus_tpu.configuration import get_default_config

    cfg = get_default_config()
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20", "taxa_L30", "taxa_L40"]
    cfg.DATA.PARTIAL.LEVELS = True
    cfg.DATA.IMG_SIZE = img
    cfg.DATA.H5.LABELS_PATH = labels
    if images:
        cfg.DATA.H5.IMAGES_PATH = images
    return cfg


def _phase_result(t0: float, **extra) -> dict:
    return {
        "wall_s": round(time.perf_counter() - t0, 2),
        "peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1
        ),
        **extra,
    }


# ------------------------------------------------------------------ phases
def phase_processor(labels: str, img: int) -> dict:
    from linnaeus_tpu.data.processor import DatasetProcessor
    from linnaeus_tpu.utils.taxonomy.tree import TaxonomyTree

    cfg = _cfg(labels, None, img)
    t0 = time.perf_counter()
    proc = DatasetProcessor(cfg)
    data, _, train_idx, val_idx = proc.process_single_file(labels, 0.9)
    t_proc = time.perf_counter() - t0
    t1 = time.perf_counter()
    TaxonomyTree(
        hierarchy_map=proc.hierarchy_map,
        task_keys=proc.task_keys,
        num_classes=proc.num_classes,
    )
    t_tree = time.perf_counter() - t1
    return _phase_result(
        t0,
        processor_wall_s=round(t_proc, 2),
        tree_wall_s=round(t_tree, 3),
        n_train=int(len(train_idx)),
        n_val=int(len(val_idx)),
        n_classes=dict(proc.num_classes),
    )


def phase_sampler(labels: str, img: int, batch: int) -> dict:
    from linnaeus_tpu.data.processor import DatasetProcessor
    from linnaeus_tpu.data.sampler import GroupedBatchSampler

    cfg = _cfg(labels, None, img)
    proc = DatasetProcessor(cfg)
    data, _, train_idx, _ = proc.process_single_file(labels, 0.9)
    groups = {
        t: np.asarray(data.labels[t], np.int64) for t in proc.task_keys[:2]
    }
    t0 = time.perf_counter()
    s = GroupedBatchSampler(
        groups, train_idx, batch, mode="mixed-pairs",
        initial_level=proc.task_keys[1],
    )
    n_b0 = len(s.batches())
    t_epoch0 = time.perf_counter() - t0
    t1 = time.perf_counter()
    s.set_epoch(1)
    n_b1 = len(s.batches())
    t_epoch1 = time.perf_counter() - t1
    return _phase_result(
        t0,
        epoch0_s=round(t_epoch0, 2),
        epoch1_s=round(t_epoch1, 2),
        batches=int(n_b0),
        batches_epoch1=int(n_b1),
    )


def phase_loader(labels: str, images: str, img: int, batch: int,
                 feed_batches: int) -> dict:
    from linnaeus_tpu.tools.e2e_train_bench import _steady_feed

    t0 = time.perf_counter()
    cold, steady = _steady_feed(
        labels, images, batch, io_threads=8, window=4, depth=2,
        direct_chunk="auto", feed_warmup=10, feed_steady=feed_batches,
    )
    return _phase_result(
        t0,
        host_feed_images_per_sec_cold=round(cold, 1),
        host_feed_images_per_sec_steady=round(steady, 1),
    )


def phase_cli(labels: str, images: str, img: int, batch: int,
              out_dir: str, timeout_s: float = 1200.0) -> dict:
    """Spawn the REAL training CLI and measure wall from exec to the first
    optimizer-step log line, then terminate. This is the number a user
    feels at 1M rows: config -> processor -> sampler -> loader warm ->
    model init + first compile + step 1."""
    import re
    import shutil

    import yaml

    # UNIQUE output tree per invocation, wiped up front: TRAIN.AUTO_RESUME
    # defaults True, so a leftover checkpoint from a previous size would be
    # silently resumed (wrong dataset + schedule) and "step 1" never logs
    tag = os.path.basename(labels).replace(".h5", "")
    run_base = os.path.join(out_dir, f"cli_out_{tag}")
    shutil.rmtree(run_base, ignore_errors=True)
    cfg_path = os.path.join(out_dir, f"scale_cli_{tag}.yaml")
    cfg = {
        "EXPERIMENT": {"NAME": "scale_cli"},
        "ENV": {"OUTPUT": {"BASE_DIR": run_base}},
        "DATA": {
            "TASK_KEYS_H5": ["taxa_L10", "taxa_L20", "taxa_L30", "taxa_L40"],
            "PARTIAL": {"LEVELS": True},
            "IMG_SIZE": img,
            "BATCH_SIZE": batch,
            "BATCH_SIZE_VAL": batch,
            "H5": {
                "LABELS_PATH": labels,
                "IMAGES_PATH": images,
                "TRAIN_VAL_SPLIT_RATIO": 0.9,
            },
            "SAMPLER": {"GROUPED_MODE": "mixed-pairs"},
            "PREFETCH": {"MEM_CACHE_SIZE": 0},
        },
        "AUG": {
            "AUTOAUG": {"POLICY": "", "COLOR_JITTER": 0.0},
            "RANDOM_ERASE": {"PROB": 0.0},
        },
        "MODEL": {
            "TYPE": "mFormerV1", "NAME": "tiny", "IMG_SIZE": img,
            "DROP_PATH_RATE": 0.0,
            "CONVNEXT_STAGES": {"DEPTHS": [1, 1, 1, 1],
                                "DIMS": [8, 16, 32, 64]},
            "ROPE_STAGES": {"DEPTHS": [1, 1], "DIMS": [32, 64],
                            "NUM_HEADS": [2, 2], "MLP_RATIO": [2.0, 2.0]},
            "CLASSIFICATION": {"HEADS": {
                t: {"TYPE": "Linear"}
                for t in ("taxa_L10", "taxa_L20", "taxa_L30", "taxa_L40")
            }},
        },
        "TRAIN": {"EPOCHS": 1, "MIXED_PRECISION": {"ENABLED": False},
                  "AUTO_RESUME": False},
        "LR_SCHEDULER": {"WARMUP_EPOCHS": 0, "WARMUP_STEPS": 1,
                         "REFERENCE_BS": batch},
        "SCHEDULE": {"METRICS": {"CONSOLE_INTERVAL": 1}},
    }
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "linnaeus_tpu.train.main", "--cfg", cfg_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
    )
    first_step_s = None
    lines: list[str] = []
    step_re = re.compile(r"epoch \d+ step \d+ ")
    try:
        for line in proc.stdout:
            lines.append(line)
            if step_re.search(line):
                first_step_s = round(time.perf_counter() - t0, 1)
                break
            if time.perf_counter() - t0 > timeout_s:
                break
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
    return {
        "wall_s": round(time.perf_counter() - t0, 1),
        "startup_to_first_step_s": first_step_s,
        "tail": "".join(lines[-3:])[-400:],
    }


PHASES = {
    "processor": phase_processor,
    "sampler": phase_sampler,
    "loader": phase_loader,
    "cli": phase_cli,
}


def _run_phase_subprocess(phase: str, args_json: str) -> dict:
    """Re-exec this module for ONE phase — its ru_maxrss is then that
    phase's true peak, not the max over everything run before it."""
    r = subprocess.run(
        [sys.executable, "-m", "linnaeus_tpu.tools.scale_receipt",
         "--phase", phase, "--phase-args", args_json],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    if r.returncode != 0:
        return {"error": (r.stdout + r.stderr)[-500:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def main(argv=None) -> None:
    p = argparse.ArgumentParser("scale_receipt")
    p.add_argument("--rows", type=int, nargs="+",
                   default=[16384, 100000, 1000000])
    p.add_argument("--img", type=int, default=32)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--feed-batches", type=int, default=100)
    p.add_argument("--with-images", action="store_true",
                   help="also generate images + run loader/cli phases")
    p.add_argument("--dir", default="/tmp/scale_receipt")
    p.add_argument("--out", default="")
    p.add_argument("--keep", action="store_true",
                   help="keep generated HDF5 (default: delete per size)")
    # internal: single-phase child invocation
    p.add_argument("--phase", default="")
    p.add_argument("--phase-args", default="{}")
    args = p.parse_args(argv)

    if args.phase:
        kwargs = json.loads(args.phase_args)
        print(json.dumps(PHASES[args.phase](**kwargs)))
        return

    os.makedirs(args.dir, exist_ok=True)
    record: dict = {"img": args.img, "batch": args.batch, "sizes": []}
    for n in args.rows:
        labels = os.path.join(args.dir, f"labels_{n}.h5")
        images = os.path.join(args.dir, f"images_{n}.h5")
        row: dict = {"rows": n}
        t0 = time.perf_counter()
        if not os.path.isfile(labels):
            generate_labels(labels, n)
        if args.with_images and not os.path.isfile(images):
            generate_images(images, n, args.img)
        row["gen_s"] = round(time.perf_counter() - t0, 1)

        row["processor"] = _run_phase_subprocess(
            "processor", json.dumps({"labels": labels, "img": args.img})
        )
        row["sampler"] = _run_phase_subprocess(
            "sampler",
            json.dumps({"labels": labels, "img": args.img,
                        "batch": args.batch}),
        )
        if args.with_images:
            row["loader"] = _run_phase_subprocess(
                "loader",
                json.dumps({"labels": labels, "images": images,
                            "img": args.img, "batch": args.batch,
                            "feed_batches": args.feed_batches}),
            )
            row["cli"] = _run_phase_subprocess(
                "cli",
                json.dumps({"labels": labels, "images": images,
                            "img": args.img, "batch": args.batch,
                            "out_dir": args.dir}),
            )
        record["sizes"].append(row)
        print(json.dumps(row), flush=True)
        if not args.keep:
            for f in (labels, images):
                if os.path.isfile(f):
                    os.remove(f)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
    print(json.dumps({"scale_receipt": record["sizes"]}))


if __name__ == "__main__":
    main()
