"""Serving latency/throughput bench: p50/p99 under concurrent load.

Measures the full HTTP serving path — base64 JPEG request -> MicroBatcher
dynamic batching -> native batch decode -> padded jitted forward ->
postprocess — at several ``--batch-timeout-ms`` settings, quantifying the
latency/throughput trade the batcher exposes (the property LitServe users
ask about; reference deployment doc: docs/inference/litserve.md).

A flagship-geometry (mFormerV1_sm, 224px) bundle is generated with random
weights on first use and cached; the forward cost is identical to
production serving. Clients run closed-loop (one in-flight request each),
so concurrency == number of clients.

Usage:
    python -m linnaeus_tpu.tools.serve_latency_bench \
        --timeouts 0,5,20 --clients 8 --seconds 20
"""

from __future__ import annotations

import argparse
import base64
import http.client
import io
import json
import os
import threading
import time

import numpy as np

TASKS = ["taxa_L10", "taxa_L20", "taxa_L30", "taxa_L40"]
NUM_CLASSES = [1000, 400, 100, 30]


def make_sm_bundle(d: str) -> str:
    """Flagship-geometry inference bundle (random weights) at 224px."""
    import yaml
    import jax
    import jax.numpy as jnp
    from flax.serialization import to_bytes

    from linnaeus_tpu.inference.config import InferenceConfig
    from linnaeus_tpu.inference.model_utils import build_config_for_inference
    from linnaeus_tpu.models.build import build_model
    from linnaeus_tpu.utils.taxonomy import TaxonomyTree

    os.makedirs(d, exist_ok=True)
    cfg_path = os.path.join(d, "config.yaml")
    if os.path.exists(cfg_path) and os.path.exists(
        os.path.join(d, "weights.msgpack")
    ):
        return cfg_path

    # consistent synthetic taxonomy: class 0 is null at every level
    hierarchy = {
        "taxa_L10": {i: (i - 1) % 400 + 1 for i in range(1, 1000)},
        "taxa_L20": {i: (i - 1) % 100 + 1 for i in range(1, 400)},
        "taxa_L30": {i: (i - 1) % 30 + 1 for i in range(1, 100)},
    }
    tree = TaxonomyTree(
        hierarchy, task_keys=TASKS,
        num_classes=dict(zip(TASKS, NUM_CLASSES)),
    )
    tree.save(os.path.join(d, "taxonomy.json"))
    class_map = {
        t: {str(i): (0 if i == 0 else 10_000 * (k + 1) + i)
            for i in range(n)}
        for k, (t, n) in enumerate(zip(TASKS, NUM_CLASSES))
    }
    with open(os.path.join(d, "class_map.json"), "w") as f:
        json.dump(class_map, f)

    config_dict = {
        "model": {
            "architecture_name": "mFormerV1_sm",
            "weights_path": "weights.msgpack",
            "model_task_keys_ordered": TASKS,
            "num_classes_per_task": NUM_CLASSES,
            "null_class_indices": {t: 0 for t in TASKS},
            "expected_aux_vector_length": 11,
        },
        "input_preprocessing": {"image_size": [3, 224, 224]},
        "metadata_preprocessing": {
            "use_temporal": True,
            "use_geolocation": True,
            "use_elevation": True,
            "elevation_scales": [100.0, 1000.0, 5000.0],
        },
        "taxonomy_data": {
            "source_name": "LatencyBench",
            "taxonomy_tree_path": "taxonomy.json",
            "class_index_map_path": "class_map.json",
        },
        "inference_options": {"default_top_k": 5, "batch_size": 32},
        "model_description": "serve_latency_bench synthetic sm bundle",
    }
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config_dict, f)

    inf_cfg = InferenceConfig(**config_dict)
    cfg = build_config_for_inference(inf_cfg)
    model = build_model(
        cfg, num_classes=dict(zip(TASKS, NUM_CLASSES)), taxonomy_tree=tree
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
        jnp.zeros((1, 11)),
    )
    with open(os.path.join(d, "weights.msgpack"), "wb") as f:
        f.write(to_bytes(variables))
    return cfg_path


def _jpeg_b64(img_px: int, seed: int = 0) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (img_px, img_px, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=85)
    return base64.b64encode(buf.getvalue()).decode()


def run_load(handler, *, max_batch: int, timeout_ms: float, clients: int,
             seconds: float, body: bytes, port_holder: list | None = None
             ) -> dict:
    """One server instance, ``clients`` closed-loop clients for ``seconds``."""
    from linnaeus_tpu.tools.serve import make_server

    server = make_server(handler, "127.0.0.1", 0, max_batch, timeout_ms)
    port = server.server_address[1]
    if port_holder is not None:
        port_holder.append(port)
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()

    # warm: pads + compiles the fixed serving batch before the timed window
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/predict", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200, resp.read()[:200]
    resp.read()
    conn.close()

    lat_lock = threading.Lock()
    latencies: list[float] = []
    errors = [0]
    t_end = time.perf_counter() + seconds

    def client_loop():
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        local = []
        while time.perf_counter() < t_end:
            t0 = time.perf_counter()
            try:
                c.request("POST", "/predict", body,
                          {"Content-Type": "application/json"})
                r = c.getresponse()
                r.read()
                if r.status != 200:
                    errors[0] += 1
                    continue
            except Exception:
                errors[0] += 1
                c.close()
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
                continue
            local.append(time.perf_counter() - t0)
        c.close()
        with lat_lock:
            latencies.extend(local)

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client_loop) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    server.shutdown()
    server.batcher.stop()
    server.server_close()

    arr = np.sort(np.asarray(latencies))
    pct = lambda q: (  # noqa: E731
        round(1000 * float(arr[min(int(q * len(arr)), len(arr) - 1)]), 1)
        if len(arr) else None
    )
    sizes = list(server.batcher.batch_sizes)
    return {
        "batch_timeout_ms": timeout_ms,
        "clients": clients,
        "requests": len(arr),
        "errors": errors[0],
        "req_per_sec": round(len(arr) / wall, 1),
        "p50_ms": pct(0.50),
        "p90_ms": pct(0.90),
        "p99_ms": pct(0.99),
        "mean_batch_size": round(float(np.mean(sizes)), 2) if sizes else None,
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser("serve_latency_bench")
    p.add_argument("--bundle-dir", default="/tmp/serve_latency_bundle_sm")
    p.add_argument("--timeouts", default="0,5,20",
                   help="comma-separated batch-timeout-ms settings")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--max-batch", type=int, default=32)
    args = p.parse_args(argv)

    from linnaeus_tpu.inference import LinnaeusInferenceHandler

    cfg_path = make_sm_bundle(args.bundle_dir)
    handler = LinnaeusInferenceHandler.load_from_artifacts(cfg_path)
    body = json.dumps({
        "instances": [{
            "image": _jpeg_b64(224),
            "metadata": {"lat": 45.0, "lon": -120.0, "elevation_m": 500.0,
                         "datetime": "2025-06-15T12:00:00"},
        }]
    }).encode()

    for spec in args.timeouts.split(","):
        rec = run_load(
            handler, max_batch=args.max_batch, timeout_ms=float(spec),
            clients=args.clients, seconds=args.seconds, body=body,
        )
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
