"""Serving latency under concurrent load: p50/p95/p99 vs batch timeout.

The MicroBatcher trades tail latency for batched throughput — the property
LitServe users ask about first (reference deployment doc:
docs/inference/litserve.md). This tool measures it honestly: a local
``make_server`` instance (real HTTP round trips through
ThreadingHTTPServer, real base64 decode, real padded device forwards) is
hammered by N closed-loop client threads, each firing sequential
single-image /predict requests; per-request wall-clock latency is recorded
after a warmup window and summarized per ``--batch-timeout-ms`` setting.

Reported per setting: p50/p95/p99 latency (ms), achieved throughput
(req/s), and the mean collated batch size (from the batcher's own
observability window) — the direct evidence that the timeout converts
queueing delay into batch fill.

Usage:
    python -m linnaeus_tpu.tools.serve_latency_bench \
        --config bundle/config.yaml --clients 16 --requests 30 \
        --timeouts 0 5 20
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
import urllib.request


def _png_b64(size: int) -> str:
    import numpy as np
    from PIL import Image

    img = np.random.default_rng(0).integers(
        0, 256, (size, size, 3), dtype=np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    return base64.b64encode(buf.getvalue()).decode()


class _Deadline504(RuntimeError):
    """Server answered 504: the per-request deadline fired."""


def _fire(port: int, body: bytes) -> None:
    import urllib.error

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=body,
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            if resp.status != 200:
                raise RuntimeError(f"status {resp.status}")
            resp.read()
    except urllib.error.HTTPError as e:
        if e.code == 504:
            e.read()
            raise _Deadline504("deadline") from None
        raise


def _percentile(sorted_vals: list[float], q: float) -> float:
    """Nearest-rank percentile on a pre-sorted list."""
    if not sorted_vals:
        return float("nan")
    k = max(0, min(len(sorted_vals) - 1,
                   round(q / 100.0 * (len(sorted_vals) - 1))))
    return sorted_vals[k]


def run_setting(handler, timeout_ms: float, max_batch: int, clients: int,
                requests_per_client: int, warmup: int, body: bytes,
                deadline_ms: float = 0.0) -> dict:
    """One server instance at one batch-timeout setting; closed-loop load.

    ``deadline_ms`` > 0 enables the server's per-request deadline: requests
    the server can't answer in time 504 instead of waiting out a device
    stall. 504s are counted separately (``deadline_504s``) and excluded
    from the latency percentiles — the row shows what the deadline costs in
    completed requests and what it buys in bounded tails."""
    from linnaeus_tpu.tools.serve import make_server

    server = make_server(handler, "127.0.0.1", 0,
                         max_batch=max_batch, batch_timeout_ms=timeout_ms,
                         request_deadline_ms=deadline_ms)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # warmup outside the measurement: compile the padded forward +
        # prime the HTTP thread pool, concurrently so batched shapes warm
        barrier = threading.Barrier(clients)
        lat_lock = threading.Lock()
        latencies: list[float] = []
        errors: list[str] = []
        deadline_hits = [0]
        t_start = [0.0]
        t_end = [0.0]

        def worker() -> None:
            for _ in range(warmup):
                try:
                    _fire(port, body)
                except Exception:  # noqa: BLE001 — a warmup failure (first
                    pass  # compile > timeout) must not kill the worker:
                    # a dead worker deadlocks the barrier for everyone else
            i = barrier.wait()
            if i == 0:
                server.batcher.batch_sizes.clear()
                t_start[0] = time.perf_counter()
            for _ in range(requests_per_client):
                t0 = time.perf_counter()
                try:
                    _fire(port, body)
                except _Deadline504:
                    with lat_lock:
                        deadline_hits[0] += 1
                    continue
                except Exception as e:  # noqa: BLE001 — record, keep going
                    with lat_lock:
                        errors.append(repr(e)[:200])
                    continue
                dt = (time.perf_counter() - t0) * 1e3
                with lat_lock:
                    latencies.append(dt)
            if barrier.wait() == 0:
                t_end[0] = time.perf_counter()

        threads = [threading.Thread(target=worker) for _ in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = t_end[0] - t_start[0]
        lat = sorted(latencies)
        sizes = list(server.batcher.batch_sizes)
        return {
            "batch_timeout_ms": timeout_ms,
            "request_deadline_ms": deadline_ms,
            "clients": clients,
            "requests": len(lat),
            "errors": len(errors),
            "deadline_504s": deadline_hits[0],
            "p50_ms": round(_percentile(lat, 50), 1),
            "p95_ms": round(_percentile(lat, 95), 1),
            "p99_ms": round(_percentile(lat, 99), 1),
            "throughput_req_per_s": round(len(lat) / wall, 1) if wall else 0,
            "mean_batch_fill": (
                round(sum(sizes) / len(sizes), 2) if sizes else 0.0
            ),
            "n_batches": len(sizes),
        }
    finally:
        server.shutdown()
        server.batcher.stop()


def main(argv=None) -> None:
    p = argparse.ArgumentParser("serve_latency_bench")
    p.add_argument("--config", required=True, help="bundle config.yaml")
    p.add_argument("--timeouts", type=float, nargs="+",
                   default=[0.0, 5.0, 20.0],
                   help="batch-timeout-ms settings to sweep")
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=30,
                   help="measured requests per client")
    p.add_argument("--warmup", type=int, default=4,
                   help="unmeasured warmup requests per client")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--deadline-ms", type=float, default=0.0,
                   help="also run each timeout setting with the per-request "
                        "server deadline enabled at this value (extra rows)")
    args = p.parse_args(argv)

    from linnaeus_tpu.inference import LinnaeusInferenceHandler

    handler = LinnaeusInferenceHandler.load_from_artifacts(args.config)
    if hasattr(handler, "warmup"):
        handler.warmup()  # pre-compile buckets: p99 measures serving, not XLA
    body = json.dumps(
        {"instances": [{"image": _png_b64(args.image_size)}]}
    ).encode()
    rows = []
    deadlines = [0.0] + ([args.deadline_ms] if args.deadline_ms > 0 else [])
    for t in args.timeouts:
        for d in deadlines:
            row = run_setting(handler, t, args.max_batch, args.clients,
                              args.requests, args.warmup, body,
                              deadline_ms=d)
            print(json.dumps(row), flush=True)
            rows.append(row)
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
