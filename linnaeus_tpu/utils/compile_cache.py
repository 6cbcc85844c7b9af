"""Persistent XLA compile-cache wiring shared by the CLI and the tools.

Second runs of an identical program skip the compile entirely — this works
both for XLA:CPU (AOT executables on disk) and for the tunneled remote-TPU
backend (verified: repeat bench runs skip the 40-90 s remote compiles).

XLA:CPU AOT executables embed the compile host's CPU features; loading one
on a host without them segfaults. The cache dir is therefore keyed by an
md5 of /proc/cpuinfo flags so VM migrations across heterogeneous machines
get a fresh cache instead of SIGILL/SIGSEGV.
"""

from __future__ import annotations

import hashlib
import os


def cpu_feature_suffix() -> str:
    """Short stable hash of the host's CPU feature flags ('' if unknown)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return "-" + hashlib.md5(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    return ""


def enable_compile_cache(
    base_dir: str = "~/.cache/linnaeus_tpu/xla-cache",
    min_compile_secs: float = 1.0,
) -> str | None:
    """Point jax at a persistent, host-keyed compile cache. Never fatal."""
    import jax

    cache_dir = os.path.expanduser(base_dir) + cpu_feature_suffix()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_secs),
        )
        return cache_dir
    except Exception:  # the cache is an optimization, never fatal
        return None
