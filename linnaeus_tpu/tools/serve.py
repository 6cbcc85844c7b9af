"""Dependency-free HTTP serving for LinnaeusInferenceHandler.

The reference deploys its handler behind LitServe
(docs/inference/litserve.md); this module provides the same request surface
with only the standard library (ThreadingHTTPServer), so the bundle can be
served anywhere the framework runs. LitServe remains a drop-in option — the
handler API is identical.

Endpoints:
  GET  /info     -> ModelInformation JSON
  GET  /healthz  -> {"status": "ok"}
  POST /predict  -> {"instances": [{"image": <base64>, "metadata": {...}?,
                     "top_k": int?}, ...]}
                 -> {"predictions": [HierarchicalClassificationResult...]}

Usage:
    python -m linnaeus_tpu.tools.serve --config bundle/config.yaml --port 8000
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _decode_image(b64: str):
    import numpy as np
    from PIL import Image

    raw = base64.b64decode(b64)
    return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))


def make_server(handler, host: str = "0.0.0.0", port: int = 8000):
    """Build (but don't start) a ThreadingHTTPServer around an inference
    handler. The jitted forward is thread-safe (pure function of arrays);
    a lock still serializes predict() so padded-batch compilations are
    never raced."""
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # route to framework logger
            from linnaeus_tpu.utils.logging import get_main_logger

            get_main_logger().debug("serve: " + fmt % args)

        def do_GET(self):
            if self.path == "/healthz":
                return self._json(200, {"status": "ok"})
            if self.path == "/info":
                return self._json(200, handler.info().model_dump(mode="json"))
            return self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                return self._json(404, {"error": f"unknown path {self.path}"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                instances = req.get("instances")
                if not isinstance(instances, list) or not instances:
                    return self._json(
                        400, {"error": "body must carry a non-empty 'instances' list"}
                    )
                from linnaeus_tpu.inference.schemas import (
                    InferenceRequestMetadata,
                )

                images, metas, options = [], [], []
                for inst in instances:
                    if "image" not in inst:
                        return self._json(
                            400, {"error": "every instance needs an 'image' (base64)"}
                        )
                    images.append(_decode_image(inst["image"]))
                    metas.append(inst.get("metadata"))
                    top_k = inst.get("top_k")
                    options.append(
                        InferenceRequestMetadata(top_k=int(top_k))
                        if top_k else None
                    )
                with lock:
                    results = handler.predict(
                        images, metas,
                        options if any(o is not None for o in options) else None,
                    )
                # mode="json" keeps typus results serializable (their
                # model_dump() python mode emits set-valued fields)
                return self._json(
                    200,
                    {"predictions": [r.model_dump(mode="json") for r in results]},
                )
            except Exception as e:  # malformed input must not kill the server
                return self._json(400, {"error": str(e)[:500]})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("linnaeus_tpu serve")
    parser.add_argument("--config", required=True, help="bundle config.yaml")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args(argv)

    from linnaeus_tpu.inference import LinnaeusInferenceHandler
    from linnaeus_tpu.utils.logging import get_main_logger

    handler = LinnaeusInferenceHandler.load_from_artifacts(args.config)
    server = make_server(handler, args.host, args.port)
    get_main_logger().info(
        f"Serving {handler.config.model.architecture_name} on "
        f"{args.host}:{args.port} (/predict /info /healthz)"
    )
    server.serve_forever()


if __name__ == "__main__":
    main()
