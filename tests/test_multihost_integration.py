"""REAL multi-process integration test: two jax.distributed processes on
CPU (4 virtual devices each -> 8 global), running the production data path
(grouped mixed-pairs sampler with per-process sharding) and one real train
step over a global batch assembled with make_array_from_process_local_data.

This goes beyond the mocked multi-host tests (test_parallel.py,
test_data_pipeline.py): the process group, the global-array assembly, and
the SPMD step all actually execute across two OS processes — the closest a
single machine gets to a pod. Reference analog: none (the reference tests
multi-rank behavior only with a mocked torch.distributed; SURVEY.md §4).
"""

import json
import os
import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mh_data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(3)
    n = 96
    species = rng.integers(1, 7, n)
    genus = 100 + (species - 1) // 3
    with h5py.File(d / "labels.h5", "w") as f:
        f.create_dataset(
            "img_identifiers",
            data=np.array([f"i{i}" for i in range(n)], dtype="S8"),
        )
        f.create_dataset("taxa_L10", data=species.astype(np.int64))
        f.create_dataset("taxa_L20", data=genus.astype(np.int64))
        f.create_dataset("temporal", data=rng.normal(size=(n, 2)).astype(np.float32))
        f.create_dataset("spatial", data=rng.normal(size=(n, 3)).astype(np.float32))
    with h5py.File(d / "images.h5", "w") as f:
        f.create_dataset(
            "images", data=rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
        )
    return d


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("PYTEST_XDIST_WORKER") is not None,
    reason="spawns two jax.distributed subprocesses; under xdist the "
    "4 concurrent heavy processes starve a small host — run this module "
    "without -n",
)
def test_two_process_data_sharding_and_train_step(mh_data_dir, tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"out{p}.json") for p in range(2)]
    env = dict(os.environ)
    # the workers set their own JAX env; strip the conftest's 8-device flag
    env.pop("XLA_FLAGS", None)
    # Workers get per-process cache dirs, ISOLATED from the main suite's
    # cache: both workers compile identical HLO (same key), and concurrent
    # writes of the same entry corrupted the shared cache — the parent
    # process then SEGFAULTED deserializing it in a later trainer test
    # (observed twice at the same suite position).
    base_cache = env.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_compile_cache")
    env["JAX_TEST_CACHE_DIR"] = base_cache + "-mhworker"
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    def launch(port):
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(p), "2", str(port),
                 str(mh_data_dir), outs[p]],
                env=env, cwd=os.path.dirname(os.path.dirname(worker)),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for p in range(2)
        ]
        logs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out.decode(errors="replace"))
        return procs, logs

    procs, logs = launch(port)
    if any(p.returncode != 0 for p in procs) and any(
        "bind" in log.lower() or "address" in log.lower() for log in logs
    ):
        # _free_port has a close-then-rebind window; retry once on a
        # coordinator bind collision
        procs, logs = launch(_free_port())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    res = [json.load(open(o)) for o in outs]
    # the two hosts feed DISJOINT sample sets with identical sizes
    fed0, fed1 = set(res[0]["fed"]), set(res[1]["fed"])
    assert fed0 and fed1
    assert not (fed0 & fed1), "hosts fed overlapping samples"
    assert abs(len(fed0) - len(fed1)) <= 8  # within one batch of each other
    # global batch really was assembled across processes
    assert res[0]["global_batch"] == res[1]["global_batch"] == 16
    # the SPMD step computed ONE global loss, identical on both hosts
    assert res[0]["loss"] == pytest.approx(res[1]["loss"], rel=1e-6)
    assert np.isfinite(res[0]["loss"])
