"""Worker for the REAL multi-process integration test
(test_multihost_integration.py). Runs as `python multihost_worker.py
<proc_id> <num_procs> <port> <data_dir> <out_json>`.

Each process: joins jax.distributed (Gloo on CPU), builds the datasets and
grouped loader (the sampler picks up jax.process_index() on its own),
records which samples THIS host feeds in epoch 0, assembles its first
batch into a global jax.Array via shard_batch's multi-host branch, and
runs one real jitted train step over the 2x(local devices) mesh.
"""

import json
import os
import sys


def main() -> None:
    proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_dir, out_json = sys.argv[4], sys.argv[5]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_TEST_CACHE_DIR")
    if cache:
        # per-process dir: both workers compile IDENTICAL HLO, and two
        # processes racing to write the same cache entry corrupt it
        jax.config.update("jax_compilation_cache_dir", f"{cache}-w{proc_id}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_index() == proc_id
    assert jax.process_count() == num_procs

    import numpy as np
    import jax.numpy as jnp
    import optax

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.data.build import build_datasets, build_loaders
    from linnaeus_tpu.data.collate import MixConfig
    from linnaeus_tpu.loss import soft_target_cross_entropy
    from linnaeus_tpu.models import MFormerV1
    from linnaeus_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from linnaeus_tpu.train.state import create_train_state
    from linnaeus_tpu.train.step import ScheduleScalars, make_train_step

    cfg = get_default_config()
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
    cfg.DATA.IMG_SIZE = 32
    cfg.DATA.BATCH_SIZE = 8  # per-host
    cfg.DATA.BATCH_SIZE_VAL = 8
    cfg.DATA.H5.LABELS_PATH = os.path.join(data_dir, "labels.h5")
    cfg.DATA.H5.IMAGES_PATH = os.path.join(data_dir, "images.h5")
    cfg.DATA.H5.TRAIN_VAL_SPLIT_RATIO = 0.9
    cfg.DATA.SAMPLER.GROUPED_MODE = "mixed-pairs"
    cfg.SCHEDULE.MIX.GROUP_LEVELS = ["taxa_L20"]

    bundle = build_datasets(cfg)
    train_loader, _ = build_loaders(cfg, bundle)
    train_loader.set_epoch(0)

    # sample identity = the global dataset indices this host feeds
    batches = train_loader.sampler.batches()
    fed = sorted(int(i) for b in batches for i in b)

    mesh = create_mesh(cfg)  # all 8 global devices, data axis
    tasks = ("taxa_L10", "taxa_L20")
    nc = bundle["num_classes"]
    model = MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1), convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1), rope_dims=(32, 64), rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=tasks, num_classes=nc,
        head_configs={t: {"TYPE": "Linear"} for t in tasks},
    )
    first = next(iter(train_loader))
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 5))
    )["params"]
    state = create_train_state(
        model, params, optax.adamw(1e-3), num_tasks=2, rng=rng
    )
    step = make_train_step(
        {t: soft_target_cross_entropy for t in tasks}, tasks,
        MixConfig(), clip_grad=5.0, has_meta=True, num_classes=nc,
    )

    # tie the sampler's PLAN to what was actually FED: the loader's first
    # batch must contain exactly the rows of the first planned batch
    np.testing.assert_allclose(
        np.asarray(first["aux"]),
        bundle["train_dataset"].labels.aux[batches[0]].astype(np.float32),
    )

    gbatch = shard_batch(
        {k: first[k] for k in ("images", "targets", "aux", "group_ids")},
        mesh,
    )
    # the assembled global batch = per-host batch x process count
    assert gbatch["images"].shape[0] == 8 * num_procs, gbatch["images"].shape
    state = replicate(state, mesh)
    _, metrics = jax.jit(step)(state, gbatch, ScheduleScalars.zeros(5))
    loss = float(jax.device_get(metrics["loss"]))
    train_loader.close()

    with open(out_json, "w") as f:
        json.dump({"proc": proc_id, "loss": loss, "fed": fed,
                   "global_batch": int(gbatch["images"].shape[0])}, f)
    print(f"proc {proc_id} OK loss={loss}", flush=True)


if __name__ == "__main__":
    main()
