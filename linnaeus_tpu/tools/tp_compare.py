"""dp vs dp×tp vs dp×sp train-step comparison on the virtual 8-device CPU mesh.

Runs the SAME scaled-up mFormerV1 geometry and batch through the full
jitted train step under (data=8, model=1) pure data-parallel,
(data=2, model=4) Megatron-style tensor-parallel, and (data=2, model=4)
sequence-parallel (ring attention) shardings, asserts loss parity, and
reports step wall-clock for each. On the 1-core CPU host the
absolute times measure partitioning/collective overhead (all 8 "devices"
share one core), NOT real TPU scaling — the point is that the TP program
compiles, runs, matches dp losses, and has bounded overhead. Run on a real
multi-chip mesh for true scaling numbers.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -m linnaeus_tpu.tools.tp_compare
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    import numpy as np
    import jax

    from linnaeus_tpu.utils.backend import honor_jax_platforms_env

    honor_jax_platforms_env()  # the axon TPU plugin ignores the env var
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from linnaeus_tpu.data.collate import MixConfig
    from linnaeus_tpu.loss import soft_target_cross_entropy
    from linnaeus_tpu.models import MFormerV1
    from linnaeus_tpu.parallel.mesh import shard_batch, tp_param_sharding
    from linnaeus_tpu.train.state import create_train_state
    from linnaeus_tpu.train.step import ScheduleScalars, make_train_step

    devices = jax.devices()[:8]
    assert len(devices) == 8, f"need 8 devices, have {len(devices)}"

    tasks = ("taxa_L10", "taxa_L20")
    nc = {"taxa_L10": 1000, "taxa_L20": 400}
    # scaled-up geometry: stage-3/4 dims 256/512 so the sharded projections
    # are big enough that partitioning overhead is not the whole measurement
    model = MFormerV1(
        img_size=(64, 64),
        convnext_depths=(1, 1, 2, 1),
        convnext_dims=(64, 128, 256, 512),
        rope_depths=(2, 1),
        rope_dims=(256, 512),
        rope_num_heads=(4, 8),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=tasks,
        num_classes=nc,
        head_configs={t: {"TYPE": "Linear"} for t in tasks},
    )
    B = 32
    rng = jax.random.PRNGKey(0)
    batch = {
        "images": jax.random.normal(rng, (B, 64, 64, 3)),
        "aux": jax.random.normal(jax.random.fold_in(rng, 1), (B, 5)),
        "targets": {
            t: jax.random.randint(
                jax.random.fold_in(rng, i + 2), (B,), 0, nc[t]
            )
            for i, t in enumerate(tasks)
        },
        "group_ids": jnp.arange(B, dtype=jnp.int32) // 2,
    }
    params = model.init(rng, batch["images"][:2], batch["aux"][:2])["params"]
    tx = optax.adamw(1e-4)
    state = create_train_state(
        model, params, tx, num_tasks=len(tasks), rng=rng
    )
    criteria = {t: soft_target_cross_entropy for t in tasks}
    step = make_train_step(
        criteria, tasks, MixConfig(mixup_enabled=True,
                                   chunk_bounds=((0, 2), (2, 5))),
        clip_grad=5.0, has_meta=True, num_classes=nc,
    )
    scalars = ScheduleScalars.zeros(5)

    def bench(mesh, param_specs, label, base_state=None):
        st_base = base_state if base_state is not None else state
        from linnaeus_tpu.parallel.mesh import reshard_train_state

        st = reshard_train_state(st_base, mesh, tx, param_specs)
        b = shard_batch(batch, mesh)
        step_j = jax.jit(step)
        st2, metrics = step_j(st, b, scalars)
        loss = float(jax.device_get(metrics["loss"]))  # warm + force
        t0 = time.perf_counter()
        n = 6
        for _ in range(n):
            st2, metrics = step_j(st2, b, scalars)
        _ = float(jax.device_get(metrics["loss"]))
        ms = 1000.0 * (time.perf_counter() - t0) / n
        return {"label": label, "loss_step1": round(loss, 6),
                "ms_per_step": round(ms, 1)}

    dp_mesh = Mesh(np.asarray(devices).reshape(8, 1), ("data", "model"))
    tp_mesh = Mesh(np.asarray(devices).reshape(2, 4), ("data", "model"))
    dp = bench(dp_mesh, None, "dp (8x1)")
    tp = bench(tp_mesh, tp_param_sharding(tp_mesh, state.params),
               "dp x tp (2x4)")
    assert abs(dp["loss_step1"] - tp["loss_step1"]) < 1e-3, (
        f"tp loss diverges: {tp['loss_step1']} vs {dp['loss_step1']}"
    )
    # sequence parallel: same mesh shape, params replicated, token dim
    # ringed inside attention (PARALLEL.SEQUENCE_PARALLEL in the Trainer)
    sp_state = create_train_state(
        model.clone(ring_mesh=tp_mesh), state.params, tx,
        num_tasks=len(tasks), rng=rng,
    )
    sp = bench(tp_mesh, None, "dp x sp (2x4 ring)", base_state=sp_state)
    assert abs(dp["loss_step1"] - sp["loss_step1"]) < 1e-3, (
        f"sp loss diverges: {sp['loss_step1']} vs {dp['loss_step1']}"
    )
    print(json.dumps({"dp": dp, "tp": tp, "sp": sp,
                      "tp_overhead": round(
                          tp["ms_per_step"] / dp["ms_per_step"], 3),
                      "sp_overhead": round(
                          sp["ms_per_step"] / dp["ms_per_step"], 3)}))


if __name__ == "__main__":
    main()
