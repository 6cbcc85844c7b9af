"""Collective helpers — the utils/distributed.py surface, TPU-native.

Reference parity: utils/distributed.py:23-374. Under pjit most collectives
are implicit (XLA inserts them from shardings); these helpers cover the
explicit cases: cross-host scalar/object agreement, shard_map-level reduce
ops, and the rank/world-size surface mapped onto JAX processes.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def get_rank_safely() -> int:
    """Process index (0 when single-host) — distributed.py:23."""
    try:
        return jax.process_index()
    except RuntimeError:
        return 0


def get_world_size() -> int:
    try:
        return jax.process_count()
    except RuntimeError:
        return 1


def is_distributed() -> bool:
    return get_world_size() > 1


def master_only(fn):
    """Decorator: run only on process 0 (distributed.py:160)."""

    def wrapper(*args, **kwargs):
        if get_rank_safely() == 0:
            return fn(*args, **kwargs)
        return None

    return wrapper


def reduce_tensor_mean(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """Mean across the mesh axis — for use INSIDE shard_map/pmap bodies
    (distributed.py:180/203)."""
    return jax.lax.pmean(x, axis_name)


def all_gather_tensor(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """Gather along the mesh axis — INSIDE shard_map/pmap (distributed.py:229)."""
    return jax.lax.all_gather(x, axis_name)


def broadcast_host_value(value: Any, root: int = 0) -> Any:
    """Agree on a host-side value across processes (distributed.py:265-283).

    Uses jax's multihost broadcast when running multi-process; identity
    otherwise. Works for scalars and small numpy arrays.
    """
    if get_world_size() == 1:
        return value
    from jax.experimental import multihost_utils

    arr = np.asarray(value)
    out = multihost_utils.broadcast_one_to_all(arr, is_source=get_rank_safely() == root)
    return type(value)(out) if np.isscalar(value) else out


def all_gather_object(obj: Any) -> list[Any]:
    """Gather small python objects from all processes (distributed.py:247)."""
    if get_world_size() == 1:
        return [obj]
    import json

    from jax.experimental import multihost_utils

    payload = json.dumps(obj).encode()
    maxlen = 65536
    buf = np.zeros(maxlen, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for row in np.asarray(gathered).reshape(get_world_size(), maxlen):
        raw = bytes(row.tobytes()).rstrip(b"\x00")
        out.append(json.loads(raw) if raw else None)
    return out


def synchronize() -> None:
    """Barrier across processes (distributed.py:307)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("linnaeus_tpu_barrier")


class DistributedContext:
    """Convenience bundle (distributed.py:374)."""

    def __init__(self):
        self.rank = get_rank_safely()
        self.world_size = get_world_size()
        self.is_main = self.rank == 0

    def __repr__(self) -> str:
        return f"DistributedContext(rank={self.rank}, world={self.world_size})"
