"""Benchmark harness: mFormerV1_sm inference throughput on the available chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no wall-clock numbers; the
north-star target is >=5000 images/sec/chip inference for mFormerV1_sm on a
v5e (per-chip share of the v5e-8 target). vs_baseline is measured/5000.

Methodology: inputs vary per iteration (fold_in'd PRNG) so no layer of the
stack can serve cached results; each iteration's output is reduced to a
scalar that the host reads back, making the timing loop fully synchronous
with device completion.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    batch = 128

    @jax.jit
    def make_inputs(key):
        images = jax.random.normal(key, (batch, 224, 224, 3), jnp.bfloat16)
        aux = jax.random.normal(key, (batch, 5), jnp.bfloat16)
        return images, aux

    # pre-generate distinct device-resident batches (input creation excluded
    # from timing; distinct data defeats any result caching)
    n_inputs = 4
    inputs = [make_inputs(jax.random.PRNGKey(i)) for i in range(n_inputs)]
    jax.block_until_ready(inputs)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs[0])["params"]

    @jax.jit
    def forward_sum(params, images, aux):
        out = model.apply({"params": params}, images, aux, deterministic=True)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())

    # warmup / compile
    float(forward_sum(params, *inputs[0]))

    iters = 30
    start = time.perf_counter()
    results = [
        forward_sum(params, *inputs[i % n_inputs]) for i in range(iters)
    ]  # async dispatch
    jax.block_until_ready(results)  # one sync at the end
    elapsed = time.perf_counter() - start
    acc = sum(float(r) for r in results)
    assert acc == acc, "NaN in outputs"

    images_per_sec = batch * iters / elapsed
    target = 5000.0  # images/sec/chip north-star (BASELINE.json)
    print(
        json.dumps(
            {
                "metric": "mFormerV1_sm_inference_images_per_sec_per_chip",
                "value": round(float(images_per_sec), 2),
                "unit": "images/sec",
                "vs_baseline": round(float(images_per_sec) / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
