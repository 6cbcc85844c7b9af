"""Benchmark harness: the four headline numbers on the available chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Probes, in priority order (each budget-guarded so the headline line always
prints even when remote compiles eat the clock):
  1. 224px mFormerV1_sm inference (the north-star metric; vs_baseline =
     measured / 5000 img/s/chip, BASELINE.json);
  2. 384px flash-routed inference (stage-3 N=580 takes the Pallas flash
     kernels — the high-resolution serving config; was skipped in r2);
  3. synthetic train step (full jitted step: on-device collate, bf16
     fwd/bwd, clip, adamw);
  4. end-to-end train (REAL file-backed HDF5 loader feeding the real step —
     reference main.py:1822-1842 reports samples/sec with the pipeline in
     the loop). Through the tunneled single-chip setup host->device runs at
     ~30-60 MB/s and serializes with compute, so this number is
     transfer-bound here; feed health is judged by the loader's avg_wait
     (host-side stall per batch) — see docs/performance.md.

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
import time

BUDGET_384 = 330.0   # start 384px probe only if elapsed < this
BUDGET_TRAIN = 460.0
BUDGET_E2E = 560.0


def main() -> None:
    t_start = time.perf_counter()
    import jax
    import jax.numpy as jnp

    # persistent compile cache — the shared host-keyed helper (CPU-feature
    # suffix guards against stale XLA:CPU AOT executables after VM
    # migration; the TPU backend just sees a stable dir). Same dir as the
    # tools, so the train probe's later enable_compile_cache() call is a
    # no-op instead of a mid-run cache switch.
    try:
        from linnaeus_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
    except Exception:
        pass

    from __graft_entry__ import _flagship_model

    # Serving configuration: attention scores stored in bf16 (softmax math
    # still f32 in-fusion). This mirrors the reference's own production
    # attention path, which casts q/k/v to fp16 for flash-attn
    # (rope_2d_mhsa.py:459-491); fp32-score storage remains the default for
    # checkpoint-parity work and is what the parity tests run.
    def measure_inference(model, batch: int, img: int,
                          n1: int = 10, n2: int = 40) -> float:
        images = jax.random.normal(
            jax.random.PRNGKey(0), (batch, img, img, 3), jnp.bfloat16
        )
        aux = jax.random.normal(jax.random.PRNGKey(1), (batch, 5), jnp.bfloat16)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), images, aux
        )["params"]

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

        timed(2)  # compile + warm
        t1 = timed(n1)
        t2 = timed(n2)
        return batch * (n2 - n1) / max(t2 - t1, 1e-9)

    model = _flagship_model(attn_fp32_softmax=False)
    batch = 128
    target = 5000.0  # images/sec/chip north-star (BASELINE.json)
    try:
        images_per_sec = measure_inference(model, batch, 224)
        record = {
            "metric": "mFormerV1_sm_inference_images_per_sec_per_chip",
            "value": round(float(images_per_sec), 2),
            "unit": "images/sec",
            "vs_baseline": round(float(images_per_sec) / target, 4),
        }
    except Exception as e:
        # the tunneled chip is occasionally UNAVAILABLE for a stretch
        # (backend setup/compile error; observed 2026-08-17) — emit the
        # headline record WITH the error rather than dying output-less,
        # and let the later probes try again in case the backend recovers
        record = {
            "metric": "mFormerV1_sm_inference_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": 0.0,
            "valid": False,  # NOT a measurement — backend was unavailable
            "bench_224_error": str(e)[:300],
        }

    # 384px flash-routed serving config (stage-3 N=580 takes the Pallas
    # flash kernels, stage-4 keeps XLA sdpa — docs/performance.md). Probe
    # #2 by priority: it was squeezed out of the r2 record.
    if time.perf_counter() - t_start < BUDGET_384:
        try:
            model384 = model.clone(img_size=(384, 384), use_flash_attn=True)
            ips384 = measure_inference(model384, batch=64, img=384, n1=5, n2=15)
            record["inference_images_per_sec_384px_flash"] = round(
                float(ips384), 2
            )
        except Exception as e:
            record["bench_384_error"] = str(e)[:200]
    else:
        record["bench_384_skipped"] = "time budget"

    # synthetic train-step (same production config: bf16-stored scores —
    # the training default; full step incl. on-device mixing/masking/
    # clip/adamw)
    if time.perf_counter() - t_start < BUDGET_TRAIN:
        try:
            from linnaeus_tpu.tools.train_bench import measure

            train = measure(batch=128, img=224, fp32_scores=False)
            record["train_ms_per_step_b128_224px"] = train["train_ms_per_step"]
            record["train_images_per_sec"] = train["train_images_per_sec"]
        except Exception as e:  # never let the train probe kill the headline
            record["train_bench_error"] = str(e)[:200]
    else:
        record["train_bench_skipped"] = "time budget"

    # end-to-end train: real HDF5 -> threaded loader -> device_put ->
    # jitted step per batch (the reference's epoch-loop samples/sec)
    if time.perf_counter() - t_start < BUDGET_E2E:
        try:
            from linnaeus_tpu.tools.e2e_train_bench import run_e2e

            e2e = run_e2e(steps=50, warmup=5, batch=128,
                          prefix="/tmp/bench_e2e", dataset_samples=8192,
                          skip_device_only=True)
            record["e2e_train_images_per_sec"] = e2e["e2e_images_per_sec"]
            record["e2e_train_ms_per_step"] = e2e["e2e_ms_per_step"]
            record["e2e_feed_wait_ms_per_batch"] = e2e["loader"]["avg_wait_ms"]
            record["host_feed_images_per_sec"] = e2e.get(
                "host_feed_images_per_sec"
            )
            if "train_ms_per_step_b128_224px" in record:
                record["e2e_feed_overlap"] = round(
                    record["train_ms_per_step_b128_224px"]
                    / max(e2e["e2e_ms_per_step"], 1e-9), 4,
                )
            record["e2e_note"] = (
                "tunnel host->device ~30-60 MB/s serializes with compute; "
                "loader avg_wait is the host-pipeline health metric"
            )
        except Exception as e:
            record["e2e_bench_error"] = str(e)[:200]
    else:
        record["e2e_bench_skipped"] = "time budget"

    print(json.dumps(record))


if __name__ == "__main__":
    main()
