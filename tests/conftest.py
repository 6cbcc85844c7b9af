"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device data-parallel logic is tested on host CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — a genuine upgrade over
the reference's mocked torch.distributed tests (SURVEY.md §4).

Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force via config as well.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA CPU compiles
# of near-identical tiny-model step functions (a full run is ~35 min cold,
# most of it compiles). Caching compiled executables across tests and runs
# cuts warm reruns to a fraction; keyed on HLO, so correctness is
# unaffected. Override the location with JAX_TEST_CACHE_DIR='' to disable.
#
# The cache dir is suffixed with a hash of the host's CPU feature flags:
# XLA:CPU AOT executables embed the compile machine's features, and loading
# one on a host without them SEGFAULTS (observed on this VM, which migrates
# across heterogeneous machines mid-round).


def _cpu_feature_tag() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.md5(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nocpuinfo"


_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_compile_cache")
if _cache_dir:
    _cache_dir = f"{_cache_dir}-{_cpu_feature_tag()}"
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, f"expected >=8 virtual devices, got {len(devices)}"
    return devices
