"""End-to-end training throughput: real HDF5 loader feeding the real step.

The reference reports samples/sec with the input pipeline in the loop
(main.py:1822-1842 epoch timing). ``train_bench.py`` measures the device
step alone (synthetic, fori_loop); this tool closes the gap: a file-backed
HDF5 dataset is read by the production ``H5DataLoader`` (threaded chunk
reads, bounded futures window, ``jax.device_put`` double-buffering) and fed
to the production jitted+donated train step, one dispatch per batch exactly
like ``Trainer._train_one_epoch``.

Reported:
  * ``e2e_ms_per_step`` / ``e2e_images_per_sec`` — steady-state wall clock
    per step with the feed in the loop (forced complete by a final host
    read; per-step dispatches chain through the donated TrainState so the
    final read transitively waits on every step);
  * ``device_ms_per_step`` — the same geometry measured device-only in the
    same process (fori_loop differencing, see train_bench.py);
  * ``feed_overlap`` — device/e2e: 1.0 means the feed fully hides under the
    step; lower means host-bound;
  * ``avg_wait_ms`` — loader-side time blocked on batch futures;
  * ``device_put_ms`` — one-off host->device transfer cost per batch
    (diagnostic: through the remote-TPU tunnel this can dominate).

Usage:
    python -m linnaeus_tpu.tools.e2e_train_bench --steps 150
    python -m linnaeus_tpu.tools.e2e_train_bench --gen 25600  # regenerate
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def hierarchy_labels(n: int, species: int = 999, null_frac: float = 0.0,
                     learnable: bool = True,
                     rng: np.random.Generator | None = None):
    """The canonical synthetic 4-level taxonomy (999/399/99/29 id ranges):
    returns ``(l10, l20, l30, l40, nulls)``. Shared by this bench's
    generator AND tools/scale_receipt.py so the two cannot drift."""
    rng = rng or np.random.default_rng(0)
    if learnable:
        # fixed per-row species id; ``species`` < 999 concentrates samples
        # per class (e.g. the CPU abstention receipt wants a backbone that
        # actually classifies well, so fewer, denser classes)
        l10 = 1 + (np.arange(n) * 7919) % species
        l20 = 1001 + (l10 - 1) % 399
        l30 = 1401 + (l20 - 1001) % 99
        l40 = 1501 + (l30 - 1401) % 29
    else:
        l10 = rng.integers(1, 1000, n)
        l20 = rng.integers(1001, 1400, n)
        l30 = rng.integers(1401, 1500, n)
        l40 = rng.integers(1501, 1530, n)
    nulls = np.zeros(n, bool)
    if null_frac > 0:
        nulls = rng.random(n) < float(null_frac)
        for lv in (l10, l20, l30, l40):
            lv[nulls] = 0
    return l10, l20, l30, l40, nulls


def generate_dataset(prefix: str, n: int, img: int,
                     learnable: bool = False,
                     null_frac: float = 0.0,
                     species: int = 999) -> tuple[str, str]:
    """File-backed HDF5 with the flagship's 4 task levels + 5-dim meta.
    Chunked one image per chunk (the random-access unit of the grouped
    sampler).

    ``learnable=True`` makes the dataset trainable rather than pure noise:
    the taxonomy is hierarchy-consistent (each L10 id maps deterministically
    up the levels) and every image carries its class's signal — a
    class-keyed color cast plus a class-positioned bright patch under
    heavy noise — so a real training run shows a falling loss and
    above-chance validation accuracy (the on-chip training receipt,
    docs/performance.md).

    ``null_frac`` > 0 marks that fraction of rows null (label 0) at EVERY
    level; in learnable mode their images stay pure noise (no class
    signature), so null-vs-known is visually decidable — the signal the RL
    abstention phase needs (reference rl_train_abstention.py:38-120 trains
    the policy to abstain on exactly such samples)."""
    import h5py

    labels_path = f"{prefix}_labels.h5"
    images_path = f"{prefix}_images.h5"
    rng = np.random.default_rng(0)
    l10, l20, l30, l40, nulls = hierarchy_labels(
        n, species=species, null_frac=null_frac, learnable=learnable, rng=rng
    )
    with h5py.File(labels_path, "w") as f:
        f.create_dataset(
            "img_identifiers", data=np.array([f"i{i}" for i in range(n)], "S12")
        )
        f.create_dataset("taxa_L10", data=l10)
        f.create_dataset("taxa_L20", data=l20)
        f.create_dataset("taxa_L30", data=l30)
        f.create_dataset("taxa_L40", data=l40)
        f.create_dataset("temporal", data=rng.normal(size=(n, 2)).astype("f4"))
        f.create_dataset("spatial", data=rng.normal(size=(n, 3)).astype("f4"))
    # per-class visual signatures (learnable mode)
    if learnable:
        crng = np.random.default_rng(1234)
        colors = crng.integers(40, 216, (1000, 3)).astype(np.int16)
    with h5py.File(images_path, "w") as f:
        dset = f.create_dataset(
            "images", shape=(n, img, img, 3), dtype="u1",
            chunks=(1, img, img, 3),
        )
        block = 512
        for s in range(0, n, block):
            e = min(s + block, n)
            noise = rng.integers(0, 256, (e - s, img, img, 3), np.int16)
            if learnable:
                cls = l10[s:e]
                cast = colors[cls][:, None, None, :]  # (b,1,1,3)
                blend = (noise + cast) // 2
                # bright patch whose position encodes the class
                p = img // 8
                for bi, c in enumerate(cls):
                    if c == 0:  # null row: pure noise, no class signature
                        blend[bi] = noise[bi]
                        continue
                    y = (int(c) * 37) % (img - p)
                    x = (int(c) * 101) % (img - p)
                    blend[bi, y:y + p, x:x + p] = colors[c] // 2 + 128
                dset[s:e] = blend.astype("u1")
            else:
                dset[s:e] = noise.astype("u1")
    return labels_path, images_path


def build_loader(labels: str, images: str, batch: int, io_threads: int,
                 window: int, depth: int, device_put_fn,
                 direct_chunk: str = "auto"):
    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.data.build import build_datasets, build_loaders

    cfg = get_default_config()
    cfg.DATA.IMG_SIZE = 224
    cfg.DATA.BATCH_SIZE = batch
    cfg.DATA.H5.LABELS_PATH = labels
    cfg.DATA.H5.IMAGES_PATH = images
    cfg.DATA.H5.DIRECT_CHUNK_READS = direct_chunk
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20", "taxa_L30", "taxa_L40"]
    cfg.DATA.PARTIAL.LEVELS = True
    cfg.DATA.PREFETCH.NUM_IO_THREADS = io_threads
    cfg.DATA.PREFETCH.BATCH_CONCURRENCY = window
    cfg.DATA.PREFETCH.DEVICE_PREFETCH_DEPTH = depth
    cfg.DATA.PREFETCH.MEM_CACHE_SIZE = 0  # force real HDF5 chunk reads
    cfg.DATA.SAMPLER.TYPE = "grouped"
    cfg.DATA.SAMPLER.GROUPED_MODE = "mixed-pairs"
    cfg.SCHEDULE.MIX.GROUP_LEVELS = ["taxa_L20"]
    bundle = build_datasets(cfg)
    train_loader, _ = build_loaders(cfg, bundle, device_put_fn=device_put_fn)
    return train_loader


def _steady_feed(labels: str, images: str, batch: int, io_threads: int,
                 window: int, depth: int, direct_chunk: str,
                 feed_warmup: int = 10,
                 feed_steady: int = 50) -> tuple[float, float]:
    """Host-feed rate probe (img/s) on the production loader with NO
    device transfer. Returns ``(cold, steady)``: the COLD window covers
    the first ``feed_warmup`` batches (thread spawn, cold HDF5 chunk
    cache, futures ramp-up all inside); STEADY times the next
    ``feed_steady`` batches with the pipeline warm — the number to
    compare against the device-only step rate (feed_margin)."""
    import time as _t

    loader = build_loader(labels, images, batch, io_threads, window, depth,
                          None, direct_chunk=direct_chunk)
    n = 0
    t0 = _t.perf_counter()
    t_warm = t0
    cold = 0.0
    epoch = 0
    while n < feed_warmup + feed_steady:
        loader.set_epoch(epoch)
        for _ in loader:
            n += 1
            if n == feed_warmup:
                cold = feed_warmup * batch / max(_t.perf_counter() - t0, 1e-9)
                t_warm = _t.perf_counter()
            if n >= feed_warmup + feed_steady:
                break
        epoch += 1
    steady = feed_steady * batch / max(_t.perf_counter() - t_warm, 1e-9)
    loader.close()
    return round(cold, 1), round(steady, 1)


def feed_ab(labels: str, images: str, batch: int = 128, pairs: int = 3,
            window: int = 4, depth: int = 2) -> dict:
    """Interleaved A/B of the direct-chunk gather vs per-row h5py reads on
    the production loader (steady-state), plus the per-io-thread scaling
    curve for each path. The honest pipeline-health receipt behind
    DATA.H5.DIRECT_CHUNK_READS (docs/performance.md)."""
    record: dict = {"batch": batch, "pairs": pairs}
    direct, per_row = [], []
    for _ in range(pairs):
        direct.append(_steady_feed(labels, images, batch, 8, window, depth,
                                   "on")[1])
        per_row.append(_steady_feed(labels, images, batch, 8, window, depth,
                                    "off")[1])
    record["direct_img_per_sec"] = direct
    record["per_row_img_per_sec"] = per_row
    record["direct_median"] = sorted(direct)[pairs // 2]
    record["per_row_median"] = sorted(per_row)[pairs // 2]
    record["speedup"] = round(
        record["direct_median"] / max(record["per_row_median"], 1e-9), 2
    )
    for mode in ("on", "off"):
        record[f"scaling_{mode}"] = {
            t: _steady_feed(labels, images, batch, t, window, depth, mode,
                            feed_steady=30)[1]
            for t in (1, 2, 4, 8)
        }
    return record


def run_e2e(steps: int = 150, warmup: int = 10, batch: int = 128,
            gen: int = 0, prefix: str = "/tmp/e2ebench",
            io_threads: int = 8, window: int = 4, depth: int = 2,
            skip_device_only: bool = False, progress: bool = False,
            dataset_samples: int | None = None,
            transfer_probe: bool = False) -> dict:
    """Run the end-to-end benchmark; returns the record dict. Reuses an
    existing dataset at ``prefix`` unless ``gen`` forces regeneration;
    ``dataset_samples`` caps the generated size (epochs wrap)."""
    t_origin = time.perf_counter()

    def mark(msg: str) -> None:
        if progress:
            print(f"[{time.perf_counter() - t_origin:7.1f}s] {msg}",
                  flush=True)

    labels = f"{prefix}_labels.h5"
    images = f"{prefix}_images.h5"
    need = gen or (
        0 if os.path.exists(labels) and os.path.exists(images)
        else (dataset_samples or (steps + warmup + 4) * batch)
    )
    if need:
        t0 = time.perf_counter()
        labels, images = generate_dataset(prefix, need, 224)
        mark(f"generated {need} samples in "
             f"{time.perf_counter() - t0:.1f}s")

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_model
    from linnaeus_tpu.data.collate import MixConfig
    from linnaeus_tpu.loss import soft_target_cross_entropy
    from linnaeus_tpu.train.state import create_train_state
    from linnaeus_tpu.train.step import ScheduleScalars, make_train_step

    mark("imports done")
    model = _flagship_model(attn_fp32_softmax=False)
    tasks = model.task_keys
    nc = dict(model.num_classes)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((2, 224, 224, 3), jnp.bfloat16),
        jnp.zeros((2, 5), jnp.float32),
    )
    state = create_train_state(
        model, variables["params"], optax.adamw(1e-4), num_tasks=len(tasks),
        rng=rng, batch_stats=variables.get("batch_stats"),
    )
    mark("model init done")
    criteria = {t: soft_target_cross_entropy for t in tasks}
    step_j = jax.jit(
        make_train_step(
            criteria, tasks,
            MixConfig(mixup_enabled=True, chunk_bounds=((0, 2), (2, 5))),
            clip_grad=5.0, has_meta=True, num_classes=nc,
        ),
        donate_argnums=(0,),
    )
    scalars = ScheduleScalars(
        mix_prob=jnp.float32(0.5),
        use_cutmix=jnp.asarray(False),
        meta_mask_prob=jnp.float32(0.3),
        partial_mask_prob=jnp.float32(0.0),
        partial_combo_mask=jnp.zeros(5, jnp.float32),
        null_mask_prob=jnp.float32(1.0),
    )

    record = {"batch": batch, "io_threads": io_threads,
              "window": window, "depth": depth}

    # one-off transfer diagnostic (opt-in: through the tunnel this probe is
    # bimodal — usually ~0.7 s for a 19 MB batch, occasionally minutes when
    # the shared chip is contended — so the default path skips it)
    if transfer_probe:
        probe = {
            "images": np.random.default_rng(1).integers(
                0, 256, (batch, 224, 224, 3), np.uint8
            ),
            "aux": np.zeros((batch, 5), np.float32),
        }
        mark("state built; probing device_put")
        jax.device_put(probe)  # warm the transfer path
        t0 = time.perf_counter()
        dev = jax.device_put(probe)
        _ = float(jnp.sum(dev["aux"])) + float(dev["images"][0, 0, 0, 0])
        record["device_put_ms"] = round(
            1000 * (time.perf_counter() - t0), 1
        )
        mark(f"device_put probe done: {record['device_put_ms']} ms")
    # pure host-feed probe (_steady_feed): the same production loader with
    # NO device transfer, so the record separates host-pipeline health from
    # the host->device path (through the tunneled chip the latter dominates
    # e2e; on a real TPU host it rides PCIe/DMA and disappears). Reference
    # analog: the saturated prefetching pipeline of
    # h5data/base_prefetching_dataset.py:22-803.
    cold, steady = _steady_feed(labels, images, batch, io_threads,
                                window, depth, "auto")
    record["host_feed_images_per_sec_cold"] = cold
    record["host_feed_images_per_sec_steady"] = steady
    # legacy key: kept pointing at the steady number
    record["host_feed_images_per_sec"] = steady
    mark(f"host-feed probe: cold {record['host_feed_images_per_sec_cold']} "
         f"/ steady {record['host_feed_images_per_sec_steady']} img/s")

    loader = build_loader(labels, images, batch, io_threads,
                          window, depth, jax.device_put)
    total_batches = len(loader)
    needed = warmup + steps
    record["steps"] = steps

    done = 0
    epoch = 0
    if len(loader) == 0:
        raise ValueError(
            f"loader yields zero batches (dataset shard < batch size "
            f"{loader.sampler.batch_size}) — regenerate with a larger --gen "
            "or lower --batch"
        )
    # the timing window opens immediately (includes the first dispatch) and
    # re-opens after the warmup steps complete (see `done == warmup` below)
    t_timed_start = time.perf_counter()
    while done < needed:
        loader.set_epoch(epoch)
        for host_batch in loader:
            state, metrics = step_j(state, host_batch, scalars)
            done += 1
            if done == 1 or done % 20 == 0:
                mark(f"step {done}/{needed}")
            if done == warmup:
                # force everything dispatched so far to completion, then
                # open the timing window
                _ = float(jax.tree.leaves(state.params)[0]
                          .astype(jnp.float32).sum())
                t_timed_start = time.perf_counter()
            if done >= needed:
                break
        epoch += 1
    # the donated-state chain means this read waits on every timed step
    final = float(jax.tree.leaves(state.params)[0].astype(jnp.float32).sum())
    assert final == final, "NaN"
    elapsed = time.perf_counter() - t_timed_start
    e2e_ms = 1000.0 * elapsed / steps
    record["e2e_ms_per_step"] = round(e2e_ms, 2)
    record["e2e_images_per_sec"] = round(batch / (e2e_ms / 1000.0), 1)
    record["loader"] = {k: (round(v, 2) if isinstance(v, float) else v)
                        for k, v in loader.pipeline_metrics().items()
                        if not isinstance(v, dict)}
    record["total_batches_per_epoch"] = total_batches
    loader.close()

    if not skip_device_only:
        from linnaeus_tpu.tools.train_bench import measure

        dev = measure(batch=batch, img=224, fp32_scores=False)
        record["device_ms_per_step"] = dev["train_ms_per_step"]
        record["feed_overlap"] = round(
            dev["train_ms_per_step"] / e2e_ms, 4
        )
        # honest pipeline-health criterion: can the warm host pipeline
        # outrun the device-only step rate? (>1.0 = yes)
        record["feed_margin"] = round(
            record["host_feed_images_per_sec_steady"]
            / dev["train_images_per_sec"], 3
        )
    return record


def main(argv=None) -> None:
    p = argparse.ArgumentParser("e2e_train_bench")
    p.add_argument("--steps", type=int, default=150,
                   help="timed steps (after warmup)")
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--gen", type=int, default=0, metavar="N",
                   help="(re)generate the dataset with N samples")
    p.add_argument("--gen-learnable", action="store_true",
                   help="with --gen: hierarchy-consistent labels + class-"
                        "signal images (for real training-run receipts)")
    p.add_argument("--gen-only", action="store_true",
                   help="generate the dataset and exit (no benchmark)")
    p.add_argument("--prefix", default="/tmp/e2ebench")
    p.add_argument("--io-threads", type=int, default=8)
    p.add_argument("--window", type=int, default=4)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--skip-device-only", action="store_true")
    p.add_argument("--progress", action="store_true",
                   help="print stage markers (diagnostics)")
    p.add_argument("--transfer-probe", action="store_true",
                   help="measure one-off device_put latency (can hang on a "
                        "contended tunnel)")
    p.add_argument("--feed-ab", action="store_true",
                   help="interleaved steady-state A/B: direct-chunk gather "
                        "vs per-row h5py reads + io-thread scaling curves "
                        "(no device work)")
    args = p.parse_args(argv)
    if args.feed_ab:
        print(json.dumps(feed_ab(
            f"{args.prefix}_labels.h5", f"{args.prefix}_images.h5",
            batch=args.batch, window=args.window, depth=args.depth,
        )))
        return
    if args.gen_only:
        t0 = time.perf_counter()
        labels, images = generate_dataset(
            args.prefix, args.gen or 16384, 224,
            learnable=args.gen_learnable,
        )
        print(json.dumps({
            "labels": labels, "images": images,
            "gen_s": round(time.perf_counter() - t0, 1),
        }))
        return
    record = run_e2e(
        steps=args.steps, warmup=args.warmup, batch=args.batch,
        gen=args.gen, prefix=args.prefix, io_threads=args.io_threads,
        window=args.window, depth=args.depth,
        skip_device_only=args.skip_device_only, progress=args.progress,
        transfer_probe=args.transfer_probe,
    )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
