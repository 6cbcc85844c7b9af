"""Deployment planner: compile a sharded train step ahead-of-time and
report what a multi-chip run will actually cost.

For an arch preset + mesh shape + sharding mode this tool AOT-compiles the
PRODUCTION train step (``train/step.py::make_train_step`` — the same
program the Trainer jits) against abstract inputs carrying real
``jax.sharding.NamedSharding``s, then reads the plan off the compiled
executable:

  * per-device parameter/optimizer bytes (from the sharding specs),
  * per-device HBM footprint (XLA ``memory_analysis``: temps + args +
    outputs + code − aliased),
  * a collective census from the optimized HLO — count and total payload
    bytes per collective kind (all-reduce, all-gather, reduce-scatter,
    collective-permute, all-to-all) — i.e. the bytes the ICI will move
    every step,
  * the largest replicated leaves (the next sharding candidates).

No parameters are materialized and nothing executes: ``jax.eval_shape`` +
``jit(...).lower(...).compile()`` only, so planning an xl-scale mesh works
on any host (use ``--virtual N`` for N virtual CPU devices). This is the
"pick a mesh → annotate shardings → let XLA insert collectives → read the
cost" recipe as a tool; the reference has no analog (its distributed story
is torch DDP, utils/distributed.py).

Usage:
    python -m linnaeus_tpu.tools.shard_plan --arch mFormerV1_sm \
        --mesh data=4,model=2 --mode tp --batch 128 --img 224 --virtual 8
    python -m linnaeus_tpu.tools.shard_plan --arch mFormerV1_xl \
        --mesh data=8 --mode fsdp --batch 256 --img 384 --virtual 8 --json -
"""

from __future__ import annotations

import argparse
import json
import re
import sys

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f8e4m3fn": 1, "f8e5m2": 1, "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of every ``dtype[dims]`` token in an HLO shape string
    (handles tuple shapes)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        nb = _DTYPE_BYTES.get(dt)
        if nb is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * nb
    return total


def collective_census(hlo_text: str) -> dict[str, dict]:
    """Count + payload bytes per collective kind in optimized HLO text.

    Bytes are the collective's RESULT shape — what lands on each device —
    summed over instruction occurrences. Implemented with plain string
    scanning because the result of a gradient all-reduce is one giant
    TUPLE shape, hundreds of entries long with ``/*index=N*/`` comments,
    which defeats naive shape regexes (it contains ``=`` and ``(``).
    ``-start`` variants count; the matching ``-done`` re-states the same
    shape and is skipped."""
    census: dict[str, dict] = {
        k: {"count": 0, "bytes": 0} for k in _COLLECTIVES
    }
    for line in hlo_text.splitlines():
        eq = line.find(" = ")
        if eq < 0:
            continue
        for kind in _COLLECTIVES:
            for suffix in ("(", "-start("):
                pos = line.find(" " + kind + suffix, eq)
                if pos > 0:
                    census[kind]["count"] += 1
                    census[kind]["bytes"] += _shape_bytes(line[eq + 3:pos])
                    break
            else:
                continue
            break
    return {k: v for k, v in census.items() if v["count"]}


def _spec_shards(sharding) -> int:
    """How many ways a NamedSharding splits its array (product of the mesh
    axis sizes its spec names)."""
    spec = getattr(sharding, "spec", None)
    mesh = getattr(sharding, "mesh", None)
    if spec is None or mesh is None:
        return 1
    n = 1
    for entry in spec:
        if entry is None:
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        for ax in axes:
            n *= int(mesh.shape[ax])
    return n


def _path_key(path) -> tuple:
    out = []
    for k in path:
        out.append(str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))))
    return tuple(out)


def build_plan(arch: str, mesh_axes: dict[str, int], mode: str,
               batch: int, img: int, model=None,
               num_classes: dict[str, int] | None = None,
               meta_dim: int = 5, remat: bool = False,
               microbatches: int = 0) -> dict:
    """``model``/``num_classes`` override the arch-preset construction
    (tests plan a tiny model so compiles stay fast). ``remat`` plans with
    gradient checkpointing (policy 'dots'), the knob that decides whether
    a geometry fits HBM at all — e.g. xl@384 B=64 on (data=4, model=2)
    needs 34.8 GB/device without it."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.configuration.archs import apply_arch
    from linnaeus_tpu.data.collate import MixConfig
    from linnaeus_tpu.loss import soft_target_cross_entropy
    from linnaeus_tpu.models.build import build_model
    from linnaeus_tpu.parallel.mesh import PARAM_SHARDING_FNS
    from linnaeus_tpu.train.state import create_train_state
    from linnaeus_tpu.train.step import ScheduleScalars, make_train_step

    n_dev = 1
    for v in mesh_axes.values():
        n_dev *= v
    devices = jax.devices()
    if len(devices) < n_dev:
        raise SystemExit(
            f"mesh {mesh_axes} needs {n_dev} devices, have {len(devices)} "
            f"(use --virtual {n_dev} for virtual CPU devices)"
        )
    mesh = Mesh(
        np.asarray(devices[:n_dev]).reshape(tuple(mesh_axes.values())),
        tuple(mesh_axes.keys()),
    )

    if num_classes is None:
        num_classes = {
            "taxa_L10": 1000, "taxa_L20": 400, "taxa_L30": 100, "taxa_L40": 30
        }
    tasks = tuple(num_classes)
    if model is None:
        cfg = get_default_config()
        cfg.MODEL.IMG_SIZE = img
        cfg.DATA.TASK_KEYS_H5 = list(tasks)
        cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = bool(remat)
        cfg.TRAIN.MIXED_PRECISION.ENABLED = True  # production bf16 compute
        apply_arch(cfg, arch)
        model = build_model(cfg, num_classes=num_classes)

    if mode == "pp":
        # GPipe pipeline over the model axis (the Trainer's
        # PARALLEL.PIPELINE wiring): params stay replicated; the census
        # shows the pipeline's collective-permute activation traffic.
        # drop-path is forced off (the pp gate rejects stochastic depth,
        # and planning doesn't execute numerics anyway).
        if not hasattr(model, "pipeline_mesh"):
            raise SystemExit(
                "pp planning: this model has no pipelined tower path "
                "(mFormerV1 only)"
            )
        if "model" not in mesh_axes or int(mesh_axes["model"]) < 2:
            raise SystemExit(
                "pp planning needs a model axis with >= 2 stages — e.g. "
                "--mesh data=4,model=2 (the stage count IS the model-axis "
                "size)"
            )
        model = model.clone(
            pipeline_mesh=mesh,
            pipeline_microbatches=int(microbatches)
            or int(mesh_axes.get("model", 1)),
            pipeline_batch_axis="data"
            if int(mesh_axes.get("data", 1)) > 1 else None,
            drop_path_rate=0.0, drop_rate=0.0, attn_drop_rate=0.0,
        )

    # meta_dim default 5: TEMPORAL(2) + SPATIAL(3), the default components
    rng = jax.random.PRNGKey(0)
    images_sds = jax.ShapeDtypeStruct((batch, img, img, 3), jnp.float32)
    aux_sds = jax.ShapeDtypeStruct((batch, meta_dim), jnp.float32)
    variables_sds = jax.eval_shape(model.init, rng, images_sds, aux_sds)
    params_sds = variables_sds["params"]

    repl = NamedSharding(mesh, P())
    if mode in ("dp", "pp"):  # pp: replicated state, pipelined compute
        param_shardings = jax.tree.map(lambda _: repl, params_sds)
    else:
        fn = PARAM_SHARDING_FNS.get(mode)
        if fn is None:
            raise SystemExit(
                f"unknown mode {mode!r}; choose "
                f"dp|pp|{'|'.join(PARAM_SHARDING_FNS)}"
            )
        param_shardings = fn(mesh, params_sds)

    tx = optax.adamw(1e-3)
    state_sds = jax.eval_shape(
        lambda p: create_train_state(
            model, p, tx, num_tasks=len(tasks), rng=rng
        ),
        params_sds,
    )

    # Attach shardings: params take the mode's specs; every optimizer /
    # EMA leaf whose key-path ENDS WITH a param's key-path (optax nests the
    # params tree inside mu/nu/...) mirrors that param's sharding;
    # everything else replicates — exactly reshard_train_state's policy.
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    p_flat, _ = tree_flatten_with_path(param_shardings)
    by_path = {_path_key(path): s for path, s in p_flat}
    max_len = max((len(k) for k in by_path), default=0)

    def sharding_for(path, leaf):
        key = _path_key(path)
        for start in range(max(0, len(key) - max_len), len(key)):
            s = by_path.get(key[start:])
            if s is not None and len(getattr(s, "spec", ())) <= len(leaf.shape):
                return s
        return repl

    s_flat, s_def = tree_flatten_with_path(state_sds)
    state_in = tree_unflatten(
        s_def,
        [
            jax.ShapeDtypeStruct(l.shape, l.dtype,
                                 sharding=sharding_for(path, l))
            for path, l in s_flat
        ],
    )

    def bsh(ndim):
        return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))

    batch_in = {
        "images": jax.ShapeDtypeStruct((batch, img, img, 3), jnp.float32,
                                       sharding=bsh(4)),
        "targets": {
            t: jax.ShapeDtypeStruct((batch, n), jnp.float32, sharding=bsh(2))
            for t, n in num_classes.items()
        },
        "aux": jax.ShapeDtypeStruct((batch, meta_dim), jnp.float32,
                                    sharding=bsh(2)),
        "group_ids": jax.ShapeDtypeStruct((batch,), jnp.int32,
                                          sharding=bsh(1)),
    }

    step = make_train_step(
        {t: soft_target_cross_entropy for t in tasks},
        tasks,
        MixConfig(mixup_enabled=True, cutmix_enabled=True,
                  chunk_bounds=((0, 2), (2, 5))),
        clip_grad=5.0,
    )
    scalars = ScheduleScalars.zeros(meta_dim)
    with mesh:
        # donate the state exactly like the production hot loop — without
        # it the memory report double-counts state-in + state-out
        compiled = (
            jax.jit(step, donate_argnums=(0,))
            .lower(state_in, batch_in, scalars)
            .compile()
        )

    # ------------------------------------------------------------- report
    def tree_bytes(sds_tree, shardings=None):
        total = per_dev = 0
        leaves = jax.tree.leaves(sds_tree)
        shard_leaves = (
            jax.tree.leaves(shardings) if shardings is not None
            else [None] * len(leaves)
        )
        for leaf, s in zip(leaves, shard_leaves):
            nb = leaf.size * leaf.dtype.itemsize
            total += nb
            per_dev += nb // (_spec_shards(s) if s is not None else 1)
        return total, per_dev

    p_total, p_dev = tree_bytes(params_sds, param_shardings)
    # optimizer + EMA bytes follow the same mirroring rule used above
    o_total = o_dev = 0
    for path, leaf in s_flat:
        key = _path_key(path)
        if key[:1] == ("params",):
            continue
        nb = leaf.size * leaf.dtype.itemsize
        o_total += nb
        o_dev += nb // _spec_shards(sharding_for(path, leaf))

    replicated_big = sorted(
        (
            (leaf.size * leaf.dtype.itemsize, "/".join(_path_key(path)))
            for path, leaf in tree_flatten_with_path(params_sds)[0]
            if _spec_shards(
                by_path.get(_path_key(path), repl)
            ) == 1
        ),
        reverse=True,
    )[:8]

    mem = compiled.memory_analysis()
    mem_report = None
    if mem is not None:
        mem_report = {
            k: int(getattr(mem, f"{k}_size_in_bytes", 0))
            for k in ("argument", "output", "temp", "generated_code", "alias")
        }
        mem_report["per_device_total"] = (
            mem_report["argument"] + mem_report["output"]
            + mem_report["temp"] + mem_report["generated_code"]
            - mem_report["alias"]
        )

    n_sharded = sum(1 for s in jax.tree.leaves(param_shardings)
                    if _spec_shards(s) > 1)

    return {
        "arch": arch,
        "mesh": mesh_axes,
        "mode": mode,
        "batch_global": batch,
        "batch_per_device": batch // mesh_axes.get("data", 1),
        "img": img,
        "param_count": int(sum(l.size for l in jax.tree.leaves(params_sds))),
        "param_bytes_total": p_total,
        "param_bytes_per_device": p_dev,
        "opt_ema_bytes_total": o_total,
        "opt_ema_bytes_per_device": o_dev,
        "params_sharded": n_sharded,
        "params_total_leaves": len(jax.tree.leaves(param_shardings)),
        "largest_replicated": [
            {"path": p, "mbytes": round(b / 1e6, 2)}
            for b, p in replicated_big
        ],
        "memory_analysis": mem_report,
        "collectives_per_step": collective_census(compiled.as_text()),
    }


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("shard_plan")
    ap.add_argument("--arch", default="mFormerV1_sm")
    ap.add_argument("--mesh", default="data=8",
                    help="comma list of axis=size, e.g. data=4,model=2")
    ap.add_argument("--mode", default="fsdp",
                    help="dp | fsdp | tp | ep (parallel/mesh.py) | pp "
                         "(PARALLEL.PIPELINE: GPipe towers over the model "
                         "axis, replicated state)")
    ap.add_argument("--microbatches", type=int, default=0,
                    help="pp mode: microbatches per step (0 -> stage count)")
    ap.add_argument("--batch", type=int, default=128,
                    help="GLOBAL batch (must divide by the data axis)")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (set before jax init)")
    ap.add_argument("--json", default=None,
                    help="write the plan JSON here ('-' = stdout only)")
    ap.add_argument("--remat", action="store_true",
                    help="plan with gradient checkpointing (policy 'dots')")
    args = ap.parse_args(argv)

    if args.virtual:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        # the axon TPU plugin ignores JAX_PLATFORMS; force via config too
        from linnaeus_tpu.utils.backend import honor_jax_platforms_env

        honor_jax_platforms_env()

    mesh_axes: dict[str, int] = {}
    for part in args.mesh.split(","):
        k, _, v = part.partition("=")
        mesh_axes[k.strip()] = int(v)

    plan = build_plan(args.arch, mesh_axes, args.mode, args.batch, args.img,
                      remat=args.remat, microbatches=args.microbatches)
    plan["remat"] = bool(args.remat)

    out = json.dumps(plan, indent=2)
    if args.json and args.json != "-":
        with open(args.json, "w") as f:
            f.write(out)
    print(out)

    gb = 1 / 1e9
    print(
        f"\n[{args.arch} | {args.mesh} | {args.mode}] "
        f"params {plan['param_count']/1e6:.1f}M: "
        f"{plan['param_bytes_per_device']*gb:.3f} GB/device "
        f"(+ {plan['opt_ema_bytes_per_device']*gb:.3f} GB opt state)",
        file=sys.stderr,
    )
    if plan["memory_analysis"]:
        print(
            f"compiled step HBM/device: "
            f"{plan['memory_analysis']['per_device_total']*gb:.3f} GB",
            file=sys.stderr,
        )
    for kind, v in plan["collectives_per_step"].items():
        print(
            f"  {kind}: {v['count']} ops, {v['bytes']*gb:.4f} GB/step",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
