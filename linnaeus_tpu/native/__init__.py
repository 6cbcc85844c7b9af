"""Native host data-plane: build + ctypes bindings for dataplane.cpp.

The shared library is compiled on first use (g++, ~2 s) and cached next to
the source; everything degrades gracefully to the pure-Python pipeline when
a compiler or libjpeg is unavailable (``get_dataplane()`` returns None and
the callers keep their numpy/cv2 paths). No pybind11: the ABI is plain C
consumed via ctypes, so there is no build-time Python dependency at all.

Measured role (docs/performance.md, host-pipeline section): the hybrid
dir-image read path — file IO + JPEG decode + resize per sample — runs
entirely in C++ worker threads with DCT-domain prescaling, one Python call
per batch.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from linnaeus_tpu.utils.logging import get_main_logger

logger = get_main_logger()

_SRC = os.path.join(os.path.dirname(__file__), "dataplane.cpp")
_LOCK = threading.Lock()
_CACHED: "DataPlane | None | bool" = False  # False = not attempted yet


def _lib_path() -> str:
    # next to the source when writable (repo checkout), else the user cache
    d = os.path.dirname(_SRC)
    if os.access(d, os.W_OK):
        return os.path.join(d, "_dataplane.so")
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "linnaeus_tpu"
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "_dataplane.so")


def build_library(force: bool = False) -> str | None:
    """Compile dataplane.cpp if needed; returns the .so path or None."""
    so = _lib_path()
    if (
        not force
        and os.path.exists(so)
        and os.path.getmtime(so) >= os.path.getmtime(_SRC)
    ):
        return so
    # compile to a private temp file, then atomically rename into place:
    # concurrent builders (multi-process training on one host, parallel
    # test runs) otherwise race g++ on the same output path and one can
    # dlopen a partially written file
    tmp = f"{so}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread",
        _SRC, "-ljpeg", "-o", tmp,
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.info(f"native dataplane unavailable (compiler): {e}")
        return None
    if proc.returncode != 0:
        logger.info(
            "native dataplane build failed (falling back to Python "
            f"pipeline): {proc.stderr[-500:]}"
        )
        return None
    os.replace(tmp, so)
    return so


class DataPlane:
    """ctypes facade over the compiled library."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.ln_version.restype = ctypes.c_int32
        lib.ln_decode_jpeg_batch.restype = ctypes.c_int32
        lib.ln_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ln_decode_jpeg_mem_batch.restype = ctypes.c_int32
        lib.ln_decode_jpeg_mem_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        self.version = int(lib.ln_version())
        if self.version < 3:
            # A stale compiled _dataplane.so that passed the mtime check but
            # predates the current contract (v2: EACCES/EMFILE raise instead
            # of zero-filling; v3: n_threads actually bounds pool concurrency
            # and all non-OK rows are zero-filled). AttributeError routes
            # get_dataplane() into its rebuild-from-source path.
            raise AttributeError(
                f"stale native dataplane ABI v{self.version} (< 3)"
            )
        self.default_threads = max(os.cpu_count() or 1, 1)

    # ------------------------------------------------------------- decode
    def decode_jpeg_batch(
        self,
        paths: list[str],
        target: int,
        allow_missing: bool = False,
        threads: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode+resize a batch of JPEG files -> (images [n,t,t,3] u8,
        status [n] i32 with 0 ok / 1 missing / 2 decode error / 3 open
        error). Raises FileNotFoundError on missing-when-not-allowed and
        OSError on open failures that are NOT missing files (EACCES/EMFILE/
        EIO — retryable, never zero-filled). Rows with status 2 (content
        libjpeg can't parse: PNG bytes behind a .jpg name, CMYK JPEG,
        truncation) do NOT raise — the caller retries them with the
        content-sniffing per-sample decoder (DirImageSource.read)."""
        n = len(paths)
        out = np.empty((n, target, target, 3), np.uint8)
        status = np.empty(n, np.int32)
        arr = (ctypes.c_char_p * n)(
            *[os.fsencode(p) for p in paths]
        )
        self._lib.ln_decode_jpeg_batch(
            arr, n, int(target),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(threads or self.default_threads),
            1 if allow_missing else 0,
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        unreadable = [paths[i] for i in np.nonzero(status == 3)[0][:3]]
        if unreadable:
            raise OSError(
                f"{int((status == 3).sum())} image files exist but could "
                f"not be opened (fd exhaustion / permissions / IO?), "
                f"e.g. {unreadable}"
            )
        if not allow_missing and (status == 1).any():
            missing = [paths[i] for i in np.nonzero(status == 1)[0][:3]]
            raise FileNotFoundError(
                f"{int((status == 1).sum())} missing image files, "
                f"e.g. {missing}"
            )
        return out, status

    def decode_jpeg_mem_batch(
        self,
        buffers: list[bytes],
        target: int,
        threads: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode+resize in-memory JPEG buffers (serving request bytes) ->
        (images [n,t,t,3] u8, status [n] i32, 0 ok / 2 decode error with a
        zero-filled row). Never raises on bad buffers — the caller decides
        per-sample (a shared serving batch must not fail wholesale)."""
        n = len(buffers)
        out = np.empty((n, target, target, 3), np.uint8)
        status = np.empty(n, np.int32)
        ptrs = (ctypes.c_void_p * n)(
            *[
                ctypes.cast(ctypes.c_char_p(b), ctypes.c_void_p)
                for b in buffers
            ]
        )
        lens = np.array([len(b) for b in buffers], np.int64)
        self._lib.ln_decode_jpeg_mem_batch(
            ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, int(target),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(threads or self.default_threads),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out, status

def get_dataplane() -> DataPlane | None:
    """Singleton accessor; compiles on first call, None when unavailable
    or disabled via LINNAEUS_TPU_NATIVE=0."""
    global _CACHED
    with _LOCK:
        if _CACHED is not False:
            return _CACHED  # type: ignore[return-value]
        if os.environ.get("LINNAEUS_TPU_NATIVE", "1") == "0":
            _CACHED = None
            return None
        so = build_library()
        if so is None:
            _CACHED = None
            return None
        try:
            _CACHED = DataPlane(ctypes.CDLL(so))
        except (OSError, AttributeError) as e:
            # a stale/foreign binary (built on another arch/libc, or an
            # older ABI without today's symbols) — rebuild from source
            # once before giving up
            logger.info(
                f"native dataplane load failed ({e}); rebuilding from source"
            )
            so = build_library(force=True)
            try:
                _CACHED = DataPlane(ctypes.CDLL(so)) if so else None
            except (OSError, AttributeError) as e2:  # libjpeg missing etc.
                logger.info(f"native dataplane rebuild also failed: {e2}")
                _CACHED = None
        return _CACHED
