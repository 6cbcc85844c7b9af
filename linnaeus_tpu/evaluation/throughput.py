"""Synthetic throughput tester (reference parity: evaluation/throughput_tester.py:13).

Sweeps batch sizes with synthetic data, reporting images/sec for inference
and (optionally) full train steps. Inputs are regenerated per iteration from
a folded PRNG so no caching layer can fake the numbers.
"""

from __future__ import annotations

import time
from typing import Any

from linnaeus_tpu.utils.logging import get_main_logger

logger = get_main_logger()


def generate_synthetic_data(rng_key, batch_size: int, img_hw, meta_dim: int,
                            dtype=None):
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    images = jax.random.normal(
        rng_key, (batch_size, img_hw[0], img_hw[1], 3), dtype
    )
    aux = (
        jax.random.normal(rng_key, (batch_size, meta_dim), dtype)
        if meta_dim else None
    )
    return images, aux


def throughput_test(
    config=None,
    model=None,
    params=None,
    batch_sizes: list[int] | None = None,
    warmup: int = 3,
    iters: int = 10,
    meta_dim: int = 5,
) -> dict[int, dict[str, Any]]:
    import jax
    import jax.numpy as jnp

    if model is None:
        from linnaeus_tpu.models.build import build_model, resolve_compute_dtype

        num_classes = None
        if config.MODEL.NUM_CLASSES:
            num_classes = dict(
                zip(config.DATA.TASK_KEYS_H5, config.MODEL.NUM_CLASSES)
            )
        model = build_model(config, num_classes=num_classes)
        dtype = resolve_compute_dtype(config)
        img = config.MODEL.IMG_SIZE
        img_hw = (img, img) if isinstance(img, int) else tuple(img)
    else:
        dtype = jnp.float32
        img_hw = model.img_size

    if params is not None:
        # pin caller-provided (possibly host-numpy) trees on device once:
        # jit re-uploads host operands EVERY call, which would charge the
        # throughput number for transfers (see the serving-latency receipt)
        params = jax.device_put(params)

    batch_sizes = batch_sizes or [32, 64, 128, 256]
    results = {}
    for bs in batch_sizes:
        @jax.jit
        def forward_sum(params, key, _bs=bs):
            images, aux = generate_synthetic_data(key, _bs, img_hw, meta_dim, dtype)
            out = model.apply({"params": params}, images, aux, deterministic=True)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())

        if params is None:
            images, aux = generate_synthetic_data(
                jax.random.PRNGKey(0), bs, img_hw, meta_dim, dtype
            )
            params = jax.jit(model.init)(jax.random.PRNGKey(0), images, aux)[
                "params"
            ]
        for w in range(warmup):
            float(forward_sum(params, jax.random.PRNGKey(w)))
        start = time.perf_counter()
        for i in range(iters):
            float(forward_sum(params, jax.random.PRNGKey(100 + i)))
        elapsed = time.perf_counter() - start
        ips = bs * iters / elapsed
        results[bs] = {"images_per_sec": ips, "latency_ms": 1000 * elapsed / iters}
        logger.info(
            f"throughput bs={bs}: {ips:.1f} img/s, "
            f"{results[bs]['latency_ms']:.2f} ms/batch"
        )
    return results


def train_step_throughput(
    train_step,
    state,
    batch,
    scalars,
    iters: int = 20,
    warmup_iters: int = 2,
) -> dict[str, float]:
    """Steady-state train-step timing via lax.scan inside ONE jit.

    Remote-TPU clients can report buffers ready before chained programs
    complete, so per-step host timing is unreliable; scanning ``iters`` steps
    inside a single compiled program and forcing a host read of the final
    loss (which depends on the whole chain) gives honest numbers. Fixed
    dispatch overhead is cancelled by differencing two iteration counts.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    def run(state, batch, n):
        def body(carry, _):
            st, _prev = carry
            st, metrics = train_step(st, batch, scalars)
            return (st, metrics["loss"]), None

        (final_state, last_loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), None, length=n
        )
        return last_loss

    del warmup_iters
    timings = {}
    for n in (iters // 4 or 1, iters):
        fn = jax.jit(lambda s, b, _n=n: run(s, b, _n))
        float(fn(state, batch))  # compile + warm (remote compile time varies)
        t0 = _time.perf_counter()
        loss = float(fn(state, batch))
        timings[n] = _time.perf_counter() - t0
        assert loss == loss, "NaN loss"
    n1, n2 = iters // 4 or 1, iters
    step_time = (timings[n2] - timings[n1]) / max(n2 - n1, 1)
    bs = batch["images"].shape[0]
    result = {
        "step_time_ms": 1000 * step_time,
        "images_per_sec": bs / max(step_time, 1e-9),
    }
    logger.info(
        f"train step: {result['step_time_ms']:.2f} ms "
        f"({result['images_per_sec']:.0f} img/s)"
    )
    return result
