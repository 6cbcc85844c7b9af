"""Benchmark harness: mFormerV1_sm inference throughput on the available chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no wall-clock numbers; the
north-star target is >=5000 images/sec/chip inference for mFormerV1_sm on a
v5e (per-chip share of the v5e-8 target). vs_baseline is measured/5000.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    batch = 256
    images = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    aux = jnp.zeros((batch, 5), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, aux)["params"]

    @jax.jit
    def forward(params, images, aux):
        return model.apply({"params": params}, images, aux, deterministic=True)

    # warmup / compile
    out = forward(params, images, aux)
    jax.block_until_ready(out)

    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        out = forward(params, images, aux)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

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
