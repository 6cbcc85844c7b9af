"""HTTP serving tests: dependency-free server around the inference handler
(reference deploys via LitServe, docs/inference/litserve.md — same request
surface)."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests.bundle_utils import make_test_bundle


@pytest.fixture(scope="module")
def server_port(tmp_path_factory):
    from linnaeus_tpu.inference import LinnaeusInferenceHandler
    from linnaeus_tpu.tools.serve import make_server

    d = make_test_bundle(tmp_path_factory.mktemp("serve_bundle"))
    handler = LinnaeusInferenceHandler.load_from_artifacts(d / "config.yaml")
    server = make_server(handler, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield server.server_address[1]
    server.shutdown()


def _req(port, path, payload=None):
    r = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode() if payload is not None else None,
        headers={"Content-Type": "application/json"},
        method="POST" if payload is not None else "GET",
    )
    try:
        with urllib.request.urlopen(r) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _png_b64():
    from PIL import Image

    img = np.random.default_rng(0).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_healthz_and_info(server_port):
    assert _req(server_port, "/healthz") == (200, {"status": "ok"})
    st, info = _req(server_port, "/info")
    assert st == 200
    assert info["architecture_name"] == "tiny_v1"
    assert info["task_keys"] == ["taxa_L10", "taxa_L20"]


def test_predict_roundtrip(server_port):
    b64 = _png_b64()
    st, out = _req(server_port, "/predict", {
        "instances": [
            {"image": b64, "metadata": {"lat": 40.0, "lon": -105.0},
             "top_k": 2},
            {"image": b64},
        ]
    })
    assert st == 200
    assert len(out["predictions"]) == 2
    tasks = out["predictions"][0]["tasks"]
    assert {t["task_key"] for t in tasks} == {"taxa_L10", "taxa_L20"}
    for t in tasks:
        for taxon_id, prob in t["predictions"]:
            assert 0.0 <= prob <= 1.0


def test_predict_error_paths(server_port):
    st, out = _req(server_port, "/predict", {"instances": []})
    assert st == 400 and "instances" in out["error"]
    st, out = _req(server_port, "/predict", {"instances": [{"metadata": {}}]})
    assert st == 400 and "image" in out["error"]
    st, _ = _req(server_port, "/predict", {"instances": [{"image": "!!bad"}]})
    assert st == 400
    st, _ = _req(server_port, "/nope")
    assert st == 404
