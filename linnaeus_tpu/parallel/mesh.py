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


def initialize_multi_host(config) -> None:
    """jax.distributed.initialize() for multi-host pods (coordinator from env)."""
    if config.PARALLEL.get("MULTI_HOST", False):
        jax.distributed.initialize()
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
