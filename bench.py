"""Benchmark harness: the four headline numbers on the available chip.

Prints ONE JSON line at the end:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Additionally, after EVERY completed probe the full record-so-far is written
atomically to ``BENCH_partial.json`` next to this file — a kill mid-run
leaves per-probe evidence (elapsed + compile seconds for each probe that
finished) instead of nothing. stdout stays a single JSON line.

Probes, in priority order — ALL are attempted (no fixed-budget skips; the
r2/r3 records lost probes #2-#3 to miscalibrated wall budgets). Under time
pressure the iteration counts shrink (recorded via ``noisy_*`` flags) and a
probe is skipped only when the measured remaining clock cannot fit even its
minimal form:
  1. 224px mFormerV1_sm inference (the north-star metric; vs_baseline =
     measured / 5000 img/s/chip, BASELINE.json);
  2. 384px flash-routed inference (stage-3 N=580 takes the Pallas flash
     kernels — the high-resolution serving config);
  3. synthetic train step (full jitted step: on-device collate, bf16
     fwd/bwd, clip, adamw);
  4. end-to-end train (REAL file-backed HDF5 loader feeding the real step —
     reference main.py:1822-1842 reports samples/sec with the pipeline in
     the loop), including the STEADY-STATE host-feed rate (warm loader,
     ramp-up batches discarded) and ``feed_margin`` = steady host feed /
     device-only train rate — the honest pipeline-health criterion.

Budgeting: a soft deadline (env ``BENCH_DEADLINE_S``, default 2400 s) is
compared against per-probe cost estimates derived from the MEASURED compile
time of probe #1 — on a cold persistent cache the remote compiles dominate
everything (40-200 s each through the tunnel) while the measurement loops
themselves are <2 s, so the estimates track compiles, not iterations.

Methodology notes (hard-won on this platform):
  * the remote-TPU client reports buffers ready before chained programs
    finish, so ``block_until_ready`` timings are invalid — only a host read
    (``float(x)``) forces completion;
  * therefore iterations run INSIDE one jitted ``lax.fori_loop`` whose carry
    feeds the next iteration's input (no caching/elision possible), ended by
    a single scalar read;
  * fixed dispatch/read overhead is cancelled by differencing two iteration
    counts: throughput = batch * (n2 - n1) / (t2 - t1).
"""

from __future__ import annotations

import json
import os
import sys
import time

DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "2400"))
PARTIAL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_partial.json"
)


def _emit_partial(record: dict, note: str) -> None:
    """Atomically persist the record-so-far; never fatal."""
    try:
        tmp = PARTIAL_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, PARTIAL_PATH)
    except OSError:
        pass
    print(f"[bench] {note}", file=sys.stderr, flush=True)


def main() -> None:
    t_start = time.perf_counter()

    def elapsed() -> float:
        return time.perf_counter() - t_start

    def remaining() -> float:
        return DEADLINE_S - elapsed()

    # Watchdog: the tunneled chip can HANG mid-RPC (observed 2026-08-21:
    # ~30 min of futex-wait with the main thread hard-blocked in the
    # client). An exception path can't fire then — so a daemon thread
    # guarantees the driver ALWAYS gets one JSON line on stdout: at
    # deadline-20s it prints the record-so-far (with an honest flag) and
    # hard-exits.
    import threading

    watchdog_record: dict = {}
    done = threading.Event()

    def _watchdog():
        if done.wait(max(DEADLINE_S - 20.0, 30.0)):
            return
        try:  # main may be mutating the dict mid-copy; retry once
            rec = dict(watchdog_record)
        except RuntimeError:
            time.sleep(0.5)
            rec = dict(watchdog_record)
        # guarantee the core schema even when the hang hit mid-probe-1
        # (cache-meta keys land before the metric does)
        rec.setdefault(
            "metric", "mFormerV1_sm_inference_images_per_sec_per_chip"
        )
        rec.setdefault("value", 0.0)
        rec.setdefault("unit", "images/sec")
        rec.setdefault("vs_baseline", 0.0)
        rec.setdefault("valid", False)
        rec["watchdog_fired"] = True
        rec["watchdog_note"] = (
            "main thread hard-blocked (tunnel stall); record-so-far emitted "
            f"at {elapsed():.0f}s by the watchdog thread"
        )
        print(json.dumps(rec), flush=True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    # persistent compile cache — the shared host-keyed helper (CPU-feature
    # suffix guards against stale XLA:CPU AOT executables after VM
    # migration; the TPU backend just sees a stable dir). Same dir as the
    # tools, so the train probe's later enable_compile_cache() call is a
    # no-op instead of a mid-run cache switch.
    cache_dir = None
    try:
        from linnaeus_tpu.utils.compile_cache import enable_compile_cache

        cache_dir = enable_compile_cache()
    except Exception:
        pass

    # ---- compile-cache forensics (the r4 record burned 197 s / 44% of its
    # wall on the 224px compile with no way to tell WHY): snapshot the cache
    # before/after each probe — new files => that probe's programs MISSED
    # the persistent cache (key churn from code edits or a cold dir), no new
    # files + fast compile => hit. Recorded per probe as cache_miss_<name>.
    def _cache_entries() -> set[str]:
        try:
            return set(os.listdir(cache_dir)) if cache_dir else set()
        except OSError:
            return set()

    def _cache_probe(record: dict, name: str, before: set[str]) -> None:
        after = _cache_entries()
        record[f"cache_new_entries_{name}"] = len(after - before)

    start_entries = _cache_entries()
    record_cache_meta = {
        # measured 2026-08-21: with cache_new_entries_224 == 0 (a TRUE
        # persistent-cache hit) t_224_compile_s still ranged 15-450 s
        # depending on host load — the time is cached-executable
        # deserialization + remote program registration through the
        # tunnel, not XLA compilation. Read t_*_compile_s as
        # "first-call setup"; the cache_new_entries_* fields say whether
        # XLA actually compiled.
        "compile_note": "t_*_compile_s = first-call setup (cache load + "
                        "remote registration); cache_new_entries_* = 0 "
                        "means no XLA compile happened",
        "compile_cache_dir": cache_dir,
        "compile_cache_entries_at_start": len(start_entries),
    }
    try:  # entries can be evicted between listdir and stat — never fatal
        record_cache_meta["compile_cache_bytes_at_start"] = sum(
            os.path.getsize(os.path.join(cache_dir, f))
            for f in start_entries
        ) if cache_dir else 0
    except OSError:
        record_cache_meta["compile_cache_bytes_at_start"] = -1

    def _cpu_init_params(model, img: int):
        """Initialize params on the LOCAL CPU backend and ship them to the
        chip: the remote (tunneled) compile of ``model.init`` costs 30-60 s
        and contributes nothing to the measurement. Pallas-routed models
        init through a flash-off clone (identical parameter tree — the
        kernel has no params) because Mosaic kernels can't trace on CPU."""
        cpu = jax.devices("cpu")[0]
        init_model = model
        for kw in ({"use_flash_attn": False}, {"fused_convnext_mlp": False}):
            try:  # force Pallas routes off for the CPU init trace only —
                init_model = init_model.clone(**kw)  # param tree unchanged
            except Exception:
                pass
        with jax.default_device(cpu):
            params = jax.jit(init_model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((2, img, img, 3), jnp.bfloat16),
                jnp.zeros((2, 5), jnp.bfloat16),
            )["params"]
        return jax.device_put(params, jax.devices()[0])

    from __graft_entry__ import _flagship_model

    # Serving configuration: attention scores stored in bf16 (softmax math
    # still f32 in-fusion). This mirrors the reference's own production
    # attention path, which casts q/k/v to fp16 for flash-attn
    # (rope_2d_mhsa.py:459-491); fp32-score storage remains the default for
    # checkpoint-parity work and is what the parity tests run.
    def measure_inference(model, batch: int, img: int,
                          n1: int, n2: int) -> tuple[float, float, float]:
        """Returns (images_per_sec, compile_s, measure_s)."""
        images = jax.random.normal(
            jax.random.PRNGKey(0), (batch, img, img, 3), jnp.bfloat16
        )
        aux = jax.random.normal(jax.random.PRNGKey(1), (batch, 5), jnp.bfloat16)
        # init on the local CPU backend (remote init compile = pure waste)
        params = _cpu_init_params(model, img)

        def run(params, images, aux, n):
            def body(i, carry):
                # perturb the input by the carry so each iteration depends on
                # the previous one and no two iterations see identical inputs
                imgs = images + (carry * 1e-12).astype(images.dtype)
                out = model.apply(
                    {"params": params}, imgs, aux, deterministic=True
                )
                return carry + sum(
                    jnp.sum(v.astype(jnp.float32)) for v in out.values()
                )

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        run_j = jax.jit(run)  # n stays a traced loop bound -> one compilation

        def timed(n: int) -> float:
            t0 = time.perf_counter()
            acc = float(run_j(params, images, aux, jnp.int32(n)))  # host read
            assert acc == acc, "NaN"
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        timed(2)  # compile (init compile included above) + warm
        compile_s = time.perf_counter() - t0
        t1 = timed(n1)
        t2 = timed(n2)
        ips = batch * (n2 - n1) / max(t2 - t1, 1e-9)
        return ips, compile_s, t1 + t2

    record = watchdog_record  # shared so the watchdog can emit it
    record["bench_deadline_s"] = DEADLINE_S
    record.update(record_cache_meta)
    model = _flagship_model(attn_fp32_softmax=False)
    batch = 128
    target = 5000.0  # images/sec/chip north-star (BASELINE.json)

    # ---------------------------------------------------- probe 1: 224px
    t_probe = time.perf_counter()
    cache_before = _cache_entries()
    compile_224 = 0.0
    try:
        ips, compile_224, _meas = measure_inference(model, batch, 224,
                                                    n1=10, n2=40)
        record.update({
            "metric": "mFormerV1_sm_inference_images_per_sec_per_chip",
            "value": round(float(ips), 2),
            "unit": "images/sec",
            "vs_baseline": round(float(ips) / target, 4),
            "t_224_compile_s": round(compile_224, 1),
        })
    except Exception as e:
        # the tunneled chip is occasionally UNAVAILABLE for a stretch
        # (backend setup/compile error; observed 2026-08-17) — emit the
        # headline record WITH the error rather than dying output-less,
        # and let the later probes try again in case the backend recovers
        record.update({
            "metric": "mFormerV1_sm_inference_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": 0.0,
            "valid": False,  # NOT a measurement — backend was unavailable
            "bench_224_error": str(e)[:300],
        })
    _cache_probe(record, "224", cache_before)
    record["t_224_total_s"] = round(time.perf_counter() - t_probe, 1)
    _emit_partial(record, f"224px done at {elapsed():.0f}s: "
                          f"{record.get('value')} img/s")

    # compile-cost model for the remaining probes: each needs ~2 fresh
    # programs (init + loop); measured probe-1 compile is the unit. On a
    # warm persistent cache compile_224 is seconds and everything fits.
    unit_compile = max(compile_224, 10.0)

    # --------------------------------------- probe 2: 384px flash serving
    t_probe = time.perf_counter()
    cache_before = _cache_entries()
    est_384 = 1.6 * unit_compile + 15.0
    n1, n2 = (5, 15) if remaining() > est_384 + 120 else (2, 6)
    if remaining() > min(est_384, 45.0):
        if n2 == 6:  # reduced iterations under time pressure; only
            record["noisy_384"] = True  # meaningful when the probe runs
        try:
            model384 = model.clone(img_size=(384, 384), use_flash_attn=True)
            ips384, c384, _ = measure_inference(model384, batch=64, img=384,
                                                n1=n1, n2=n2)
            record["inference_images_per_sec_384px_flash"] = round(
                float(ips384), 2
            )
            record["t_384_compile_s"] = round(c384, 1)
        except Exception as e:
            record["bench_384_error"] = str(e)[:200]
    else:
        record["bench_384_skipped"] = (
            f"deadline: {remaining():.0f}s left < est {est_384:.0f}s"
        )
    _cache_probe(record, "384", cache_before)
    record["t_384_total_s"] = round(time.perf_counter() - t_probe, 1)
    _emit_partial(record, f"384px done at {elapsed():.0f}s")

    # ------------------------------------- probe 3: synthetic train step
    # (same production config: bf16-stored scores — the training default;
    # full step incl. on-device mixing/masking/clip/adamw)
    t_probe = time.perf_counter()
    cache_before = _cache_entries()
    est_train = 2.2 * unit_compile + 20.0
    n1, n2 = (4, 12) if remaining() > est_train + 120 else (2, 6)
    if remaining() > min(est_train, 60.0):
        if n2 == 6:
            record["noisy_train"] = True
        try:
            from linnaeus_tpu.tools.train_bench import measure

            train = measure(batch=128, img=224, fp32_scores=False,
                            n1=n1, n2=n2)
            record["train_ms_per_step_b128_224px"] = train["train_ms_per_step"]
            record["train_images_per_sec"] = train["train_images_per_sec"]
            record["t_train_compile_s"] = train.get("compile_s")
        except Exception as e:  # never let the train probe kill the headline
            record["train_bench_error"] = str(e)[:200]
    else:
        record["train_bench_skipped"] = (
            f"deadline: {remaining():.0f}s left < est {est_train:.0f}s"
        )
    _cache_probe(record, "train", cache_before)
    record["t_train_total_s"] = round(time.perf_counter() - t_probe, 1)
    _emit_partial(record, f"train done at {elapsed():.0f}s")

    # ------------------------------------------- probe 4: end-to-end train
    # real HDF5 -> threaded loader -> device_put -> jitted step per batch
    # (the reference's epoch-loop samples/sec), plus the steady-state
    # host-feed rate and its margin over the device-only step
    t_probe = time.perf_counter()
    est_e2e = 2.2 * unit_compile + 120.0
    steps = 50 if remaining() > est_e2e + 120 else 25
    if remaining() > min(est_e2e, 90.0):
        if steps == 25:
            record["noisy_e2e"] = True
        try:
            from linnaeus_tpu.tools.e2e_train_bench import run_e2e

            e2e = run_e2e(steps=steps, warmup=5, batch=128,
                          prefix="/tmp/bench_e2e", dataset_samples=8192,
                          skip_device_only=True)
            record["e2e_train_images_per_sec"] = e2e["e2e_images_per_sec"]
            record["e2e_train_ms_per_step"] = e2e["e2e_ms_per_step"]
            record["e2e_feed_wait_ms_per_batch"] = e2e["loader"]["avg_wait_ms"]
            record["host_feed_images_per_sec_cold"] = e2e.get(
                "host_feed_images_per_sec_cold"
            )
            record["host_feed_images_per_sec_steady"] = e2e.get(
                "host_feed_images_per_sec_steady"
            )
            dev_ips = record.get("train_images_per_sec")
            steady = record.get("host_feed_images_per_sec_steady")
            if dev_ips and steady:
                # >1.0: the warm host pipeline outruns the device-only step
                # (feed can hide under compute); <1.0: host-bound, by how much
                record["feed_margin"] = round(steady / dev_ips, 3)
            if "train_ms_per_step_b128_224px" in record:
                record["e2e_feed_overlap"] = round(
                    record["train_ms_per_step_b128_224px"]
                    / max(e2e["e2e_ms_per_step"], 1e-9), 4,
                )
            record["e2e_note"] = (
                "tunnel host->device ~30-60 MB/s serializes with compute; "
                "feed_margin (steady host feed / device-only rate) is the "
                "pipeline-health metric"
            )
        except Exception as e:
            record["e2e_bench_error"] = str(e)[:200]
    else:
        record["e2e_bench_skipped"] = (
            f"deadline: {remaining():.0f}s left < est {est_e2e:.0f}s"
        )
    record["t_e2e_total_s"] = round(time.perf_counter() - t_probe, 1)
    _emit_partial(record, f"e2e done at {elapsed():.0f}s")

    # ----------------------------------- probe 5: 384px flash TRAIN step
    # the geometry both Pallas kernel families exist for (flash fwd+bwd in
    # stages 3-4 + fused ConvNeXt-MLP fwd+bwd at B<=64 with >=48x48 maps) —
    # driver-captured at last (the r1-r4 records only carried 384px
    # INFERENCE; the training claim lived in docs/performance.md alone)
    t_probe = time.perf_counter()
    cache_before = _cache_entries()
    est_t384 = 2.2 * unit_compile + 20.0
    n1, n2 = (4, 12) if remaining() > est_t384 + 120 else (2, 6)
    if remaining() > min(est_t384, 60.0):
        if n2 == 6:
            record["noisy_train_384"] = True
        try:
            from linnaeus_tpu.tools.train_bench import measure

            t384 = measure(batch=64, img=384, fp32_scores=False,
                           flash=True, n1=n1, n2=n2)
            record["train_ms_per_step_b64_384px"] = t384["train_ms_per_step"]
            record["train_images_per_sec_384px"] = t384[
                "train_images_per_sec"
            ]
            record["t_train384_compile_s"] = t384.get("compile_s")
        except Exception as e:
            record["train384_bench_error"] = str(e)[:200]
    else:
        record["train384_bench_skipped"] = (
            f"deadline: {remaining():.0f}s left < est {est_t384:.0f}s"
        )
    _cache_probe(record, "train_384", cache_before)
    record["t_train384_total_s"] = round(time.perf_counter() - t_probe, 1)

    # ------------------------------------------ committed training receipt
    # a real multi-epoch CLI run on the chip (loss curve down, validation,
    # checkpoint + mid-run resume) distilled by tools/train_run_receipt.py;
    # embed the summary so the driver record carries the receipt too
    for key, fname in (
        ("train_run", "train_run_tpu.json"),          # 224px, flash off
        ("train_run_384", "train_run_tpu_384.json"),  # 384px, Pallas live
    ):
        try:
            receipt_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "docs", "receipts", fname,
            )
            if os.path.isfile(receipt_path):
                with open(receipt_path) as f:
                    r = json.load(f)
                record[key] = {
                    "device": r.get("device"),
                    "steps": r.get("steps"),
                    "epochs": len(r.get("epochs", [])),
                    "loss_first": r.get("loss_first"),
                    "loss_last": r.get("loss_last"),
                    "img_per_sec_steady": r.get("img_per_sec_steady"),
                    "validations": len(r.get("validation", [])),
                    "resumes": len(r.get("resumes", [])),
                    "checkpoint_saves": r.get("checkpoint_saves"),
                }
                for extra in ("kernels", "flash_off_control"):
                    if extra in r:
                        record[key][extra] = r[extra]
        except Exception as e:
            record[key + "_error"] = str(e)[:200]

    record["t_bench_total_s"] = round(elapsed(), 1)
    _emit_partial(record, f"all probes done at {elapsed():.0f}s")

    done.set()  # disarm the watchdog before the real emission
    print(json.dumps(record))


if __name__ == "__main__":
    main()
