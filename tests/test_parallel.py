"""Mesh / sharding helper tests, incl. the multi-host shard_batch branch
(VERDICT #3: exercise make_array_from_process_local_data in CI)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linnaeus_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    fsdp_param_sharding,
    replicate,
    shard_batch,
)


def test_shard_batch_single_host(eight_devices):
    mesh = create_mesh(devices=eight_devices)
    batch = {
        "images": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
        "targets": {"t": np.arange(8, dtype=np.int32)},
    }
    out = shard_batch(batch, mesh)
    assert out["images"].sharding.spec == batch_sharding(mesh).spec
    np.testing.assert_array_equal(np.asarray(out["images"]), batch["images"])
    # each device holds exactly B/8 rows
    shard_shapes = {s.data.shape for s in out["images"].addressable_shards}
    assert shard_shapes == {(1, 4)}


def test_shard_batch_multi_host_branch(eight_devices, monkeypatch):
    """Force the process_count > 1 branch: with all devices addressable in
    this (single) process, make_array_from_process_local_data must assemble
    the same global array device_put would. A regression here (wrong global
    shape math, wrong tree mapping) would only surface on a real pod."""
    mesh = create_mesh(devices=eight_devices)
    batch = {
        "images": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
        "aux": np.ones((8, 3), np.float32),
    }
    expected = shard_batch(batch, mesh)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    out = shard_batch(batch, mesh)
    for k in batch:
        assert out[k].sharding.spec == expected[k].sharding.spec
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(expected[k]))


def test_replicate_and_fsdp_sharding(eight_devices):
    mesh = create_mesh(devices=eight_devices)
    params = {
        "w": jnp.ones((16, 4)),     # 16 % 8 == 0 -> sharded on axis 0
        "b": jnp.ones((3,)),        # 3 % 8 != 0 -> replicated
        "s": jnp.float32(1.0),      # scalar -> replicated
    }
    specs = fsdp_param_sharding(mesh, params)
    assert specs["w"].spec == jax.sharding.PartitionSpec("data", None)
    assert specs["b"].spec == jax.sharding.PartitionSpec()
    assert specs["s"].spec == jax.sharding.PartitionSpec()

    repl = replicate(params, mesh)
    assert repl["w"].sharding.spec == jax.sharding.PartitionSpec()
