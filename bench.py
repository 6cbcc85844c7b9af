"""Benchmark harness: mFormerV1_sm inference throughput on the available chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no wall-clock numbers; the
north-star target is >=5000 images/sec/chip inference for mFormerV1_sm
(per-chip share of the v5e-8 target). vs_baseline is measured/5000.

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


def main() -> None:
    t_start = time.perf_counter()
    import jax
    import jax.numpy as jnp

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
    images_per_sec = measure_inference(model, batch, 224)

    target = 5000.0  # images/sec/chip north-star (BASELINE.json)
    record = {
        "metric": "mFormerV1_sm_inference_images_per_sec_per_chip",
        "value": round(float(images_per_sec), 2),
        "unit": "images/sec",
        "vs_baseline": round(float(images_per_sec) / target, 4),
    }
    # train-step numbers alongside inference (same production config:
    # bf16-stored scores — now the training default; full step incl.
    # on-device mixing/masking/clip/adamw)
    try:
        from linnaeus_tpu.tools.train_bench import measure

        train = measure(batch=128, img=224, fp32_scores=False)
        record["train_ms_per_step_b128_224px"] = train["train_ms_per_step"]
        record["train_images_per_sec"] = train["train_images_per_sec"]
    except Exception as e:  # never let the train probe kill the headline
        record["train_bench_error"] = str(e)[:200]
    # 384px flash-routed serving config (stage-3 N=580 takes the Pallas
    # flash kernels, stage-4 keeps XLA sdpa — docs/performance.md): the
    # high-resolution first-class bench, n reduced to bound wall time.
    # Skipped when the earlier probes already ate the budget (slow remote
    # compiles) so the headline line always gets printed.
    if time.perf_counter() - t_start < 420.0:
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
    print(json.dumps(record))


if __name__ == "__main__":
    main()
