"""Device mesh and sharding helpers.

Replaces the reference's NCCL/DDP layer (main.py:2599-2628,
utils/distributed.py) with a single ``jax.sharding.Mesh``: data parallelism
is batch sharding along the ``data`` axis; gradient all-reduce is inserted by
XLA's SPMD partitioner (rides ICI within a slice, DCN across slices). A
``model`` axis is reserved for future tensor parallelism.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from linnaeus_tpu.utils.logging import get_main_logger

logger = get_main_logger()

DATA_AXIS = "data"
MODEL_AXIS = "model"


_multi_host_initialized = False


def initialize_multi_host(config) -> None:
    """jax.distributed.initialize() for multi-host pods (coordinator from env).

    Idempotent: the CLI calls it BEFORE its first backend touch
    (jax.distributed.initialize must precede backend init) and the Trainer
    calls it again for non-CLI entry points — the second call is a no-op.
    """
    global _multi_host_initialized
    if not config.PARALLEL.get("MULTI_HOST", False) or _multi_host_initialized:
        return
    jax.distributed.initialize()
    _multi_host_initialized = True
    logger.info(
        f"Initialized multi-host JAX: process {jax.process_index()} / "
        f"{jax.process_count()}"
    )


def create_mesh(config=None, devices=None) -> Mesh:
    """Build the (data, model) mesh. DATA=-1 takes all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = 1
    if config is not None:
        model = int(config.PARALLEL.MESH.get("MODEL", 1))
        data = int(config.PARALLEL.MESH.get("DATA", -1))
        if data == -1:
            data = n // model
    else:
        data = n
    if data * model != n:
        raise ValueError(
            f"Mesh {data}x{model} does not cover {n} devices; adjust PARALLEL.MESH"
        )
    arr = np.asarray(devices).reshape(data, model)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    logger.info(f"Created mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    if config is not None:
        from linnaeus_tpu.utils.debug import check_debug_flag

        if check_debug_flag(config, "DEBUG.DISTRIBUTED"):
            logger.debug(
                f"[DISTRIBUTED] process {jax.process_index()}/{jax.process_count()} "
                f"local_devices={[str(d) for d in jax.local_devices()]} "
                f"mesh_devices={[str(d) for d in arr.flat]}"
            )
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim along the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch onto the mesh, sharded along 'data'.

    Single-host: a plain device_put with the batch sharding. Multi-host:
    each process feeds only ITS slice of the global batch (the
    GroupedBatchSampler round-robins pairs/groups across processes, mirroring
    the reference's per-rank sharding, grouped_batch_sampler.py:289-425), so
    the local arrays are assembled into one global jax.Array with
    ``make_array_from_process_local_data`` — the JAX analog of feeding a
    per-rank DataLoader under DDP.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def reshard_train_state(state, mesh: Mesh, tx, param_shardings: Any = None):
    """Re-place a TrainState onto ``mesh``: params per ``param_shardings``
    (replicated when None), optimizer state re-initialized on the new
    placement, and step/rng/gradnorm replicated. The one way every
    bench/test/dryrun moves a state between placements — keep in sync with
    TrainState's fields here, not at each call site."""
    repl = replicated_sharding(mesh)
    if param_shardings is None:
        params = jax.tree.map(lambda x: jax.device_put(x, repl), state.params)
    else:
        params = jax.tree.map(jax.device_put, state.params, param_shardings)
    if state.ema_params is not None:
        # EMA mirrors the params tree exactly, so it takes the same shardings
        if param_shardings is None:
            ema = jax.tree.map(
                lambda x: jax.device_put(x, repl), state.ema_params
            )
        else:
            ema = jax.tree.map(
                jax.device_put, state.ema_params, param_shardings
            )
    else:
        ema = None
    return state.replace(
        params=params,
        opt_state=tx.init(params),
        step=jax.device_put(state.step, repl),
        rng=jax.device_put(state.rng, repl),
        gradnorm=jax.tree.map(lambda x: jax.device_put(x, repl), state.gradnorm),
        ema_params=ema,
    )


def fsdp_param_sharding(mesh: Mesh, params: Any) -> Any:
    """Shard each param's largest divisible axis along 'data' (FSDP-style,
    PARALLEL.PARAM_SHARDING='fsdp'). Falls back to replication per-leaf."""
    n_data = mesh.devices.shape[0]

    def spec_for(p):
        if not hasattr(p, "shape") or p.ndim == 0:
            return NamedSharding(mesh, P())
        sizes = list(p.shape)
        best_axis = int(np.argmax(sizes))
        if sizes[best_axis] % n_data == 0 and sizes[best_axis] >= n_data:
            spec = [None] * p.ndim
            spec[best_axis] = DATA_AXIS
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def tp_param_sharding(mesh: Mesh, params: Any) -> Any:
    """Megatron-style tensor-parallel specs over the 'model' axis
    (PARALLEL.PARAM_SHARDING='tp'; requires PARALLEL.MESH.MODEL > 1).

    The reference is DP-only (SURVEY §2.8); this is the TPU-native
    extension the reserved 'model' axis exists for. Transformer-stage
    projections shard column-/row-parallel:

      attn/qkv kernel  (in, 3*dim)   -> (None, model)   column-parallel
      attn/proj kernel (dim, dim)    -> (model, None)   row-parallel
      mlp fc1 kernel   (dim, hidden) -> (None, model)   column-parallel
      mlp fc2 kernel   (hidden, dim) -> (model, None)   row-parallel

    plus the matching biases on the sharded output dims, and the per-task
    head classifiers column-parallel (``head/*/kernel`` — the 1000-way L10
    classifier is the single largest matrix in the flagship). Everything
    else (conv trunk, norms, meta heads) replicates over 'model'. XLA's
    SPMD partitioner derives the activation shardings and inserts the
    all-reduces after the row-parallel matmuls.

    Raises if the mesh's model axis is 1 (nothing would shard — a config
    error, not a silent no-op) or if no parameter matched the path
    patterns (a module rename silently de-sharding the model).
    """
    n_model = mesh.devices.shape[1]
    if n_model <= 1:
        raise ValueError(
            "PARAM_SHARDING='tp' requires PARALLEL.MESH.MODEL > 1 "
            f"(mesh model axis has {n_model} device)"
        )
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params, sep="/")
    specs: dict[str, NamedSharding] = {}
    n_sharded = 0
    for path, p in flat.items():
        spec = P()
        if hasattr(p, "ndim"):
            if path.endswith("attn/qkv/kernel") or path.endswith(
                "mlp/Dense_0/kernel"
            ):
                if p.shape[1] % n_model == 0:
                    spec = P(None, MODEL_AXIS)
            elif path.endswith("attn/proj/kernel") or path.endswith(
                "mlp/Dense_1/kernel"
            ):
                if p.shape[0] % n_model == 0:
                    spec = P(MODEL_AXIS, None)
            elif path.endswith("attn/qkv/bias") or path.endswith(
                "mlp/Dense_0/bias"
            ):
                if p.shape[0] % n_model == 0:
                    spec = P(MODEL_AXIS)
            elif (
                path.rsplit("/", 1)[-1] in _EP_LEAVES
                and "/mlp/" in f"/{path}"
                and p.ndim >= 1
                and p.shape[0] % n_model == 0
            ):
                # MoE expert banks (blocks/moe.py): expert axis over 'model'
                # — TP on an MoE model composes tensor + expert parallelism
                spec = P(*((MODEL_AXIS,) + (None,) * (p.ndim - 1)))
            elif (
                path.startswith("head/")
                and path.endswith("/kernel")
                and p.ndim == 2
                and p.shape[1] % n_model == 0
            ):
                # column-parallel classifier: logits all-gather is B*C*2
                # bytes — negligible next to holding a replicated
                # (dim, num_classes) matrix + its adamw moments per device
                spec = P(None, MODEL_AXIS)
        if spec != P():
            n_sharded += 1
        specs[path] = NamedSharding(mesh, spec)
    if n_sharded == 0:
        raise ValueError(
            "tensor-parallel sharding matched ZERO parameters — a module "
            "rename has de-sharded the model (expected attn/qkv, attn/proj, "
            "mlp/Dense_0, mlp/Dense_1, head/*/kernel paths)"
        )
    logger.info(
        f"TP sharding: {n_sharded}/{len(flat)} params sharded over "
        f"{n_model} model-parallel devices"
    )
    return unflatten_dict(specs, sep="/")


# MoE expert-bank leaf names (blocks/moe.py): leading axis = expert index
_EP_LEAVES = ("wi", "wo", "bi", "bo")


def ep_param_sharding(mesh: Mesh, params: Any) -> Any:
    """Expert parallelism (PARALLEL.PARAM_SHARDING='ep'): MoE expert banks
    (leading expert axis of mlp wi/wo/bi/bo, blocks/moe.py) shard over the
    'model' mesh axis; everything else — including each MoE layer's router —
    replicates. XLA's SPMD partitioner turns the dispatch/combine einsums
    into the expert all-to-alls (the NCCL-free analog of Switch/GShard
    expert dispatch). Requires an MoE model (raises if no expert bank is
    found) and MESH.MODEL > 1.
    """
    n_model = mesh.devices.shape[1]
    if n_model <= 1:
        raise ValueError(
            "PARAM_SHARDING='ep' requires PARALLEL.MESH.MODEL > 1 "
            f"(mesh model axis has {n_model} device)"
        )
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params, sep="/")
    specs: dict[str, NamedSharding] = {}
    n_sharded = 0
    for path, p in flat.items():
        spec = P()
        leaf = path.rsplit("/", 1)[-1]
        if (
            leaf in _EP_LEAVES
            and "/mlp/" in f"/{path}"
            and hasattr(p, "ndim")
            and p.ndim >= 1
            and p.shape[0] % n_model == 0
        ):
            spec = P(*((MODEL_AXIS,) + (None,) * (p.ndim - 1)))
            n_sharded += 1
        specs[path] = NamedSharding(mesh, spec)
    if n_sharded == 0:
        raise ValueError(
            "expert-parallel sharding matched ZERO parameters — "
            "PARAM_SHARDING='ep' requires MODEL.MOE.ENABLED (no mlp/wi|wo|"
            "bi|bo expert banks found, or NUM_EXPERTS not divisible by the "
            "model axis)"
        )
    logger.info(
        f"EP sharding: {n_sharded}/{len(flat)} expert-bank params sharded "
        f"over {n_model} model-parallel devices"
    )
    return unflatten_dict(specs, sep="/")


PARAM_SHARDING_FNS = {
    "fsdp": fsdp_param_sharding,
    "tp": tp_param_sharding,
    "ep": ep_param_sharding,
}


def get_process_index() -> int:
    return jax.process_index()


def get_process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """This host's [start, end) slice of the global batch (per-host feeding)."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return start, start + per_host
