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
def inference_handler(tmp_path_factory):
    from linnaeus_tpu.inference import LinnaeusInferenceHandler

    d = make_test_bundle(tmp_path_factory.mktemp("serve_bundle"))
    return LinnaeusInferenceHandler.load_from_artifacts(d / "config.yaml")


@pytest.fixture(scope="module")
def server_port(inference_handler):
    from linnaeus_tpu.tools.serve import make_server

    server = make_server(inference_handler, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield server.server_address[1]
    server.shutdown()
    server.batcher.stop()


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


class _CountingHandler:
    """Proxy that records every forward's image count (and can fail on a
    marker) — the observable for the dynamic-batching tests. Intercepts
    BOTH predict and predict_async: the MicroBatcher prefers the async
    form, and __getattr__ would otherwise route it straight to the real
    handler, uncounted."""

    def __init__(self, handler, poison_key=None):
        self._h = handler
        self._poison = poison_key
        self.call_sizes = []

    def __getattr__(self, name):
        return getattr(self._h, name)

    def _check_poison(self, metas):
        if self._poison and any(
            isinstance(m, dict) and self._poison in m for m in (metas or [])
        ):
            raise ValueError("poisoned instance")

    def predict(self, images, metas=None, options=None):
        self.call_sizes.append(len(images))
        self._check_poison(metas)
        return self._h.predict(images, metas, options)

    def predict_async(self, images, metas=None, options=None):
        self._check_poison(metas)
        finisher = self._h.predict_async(images, metas, options)
        # count only successfully dispatched forwards (a dispatch-side
        # failure falls back to the sync path, which counts itself)
        self.call_sizes.append(len(images))
        return finisher


@pytest.fixture()
def batching_server(inference_handler):
    from linnaeus_tpu.tools.serve import make_server

    proxy = _CountingHandler(inference_handler, poison_key="poison")
    # generous timeout so concurrently-fired clients land in one batch
    # deterministically even on a loaded 1-core box
    server = make_server(proxy, "127.0.0.1", 0,
                         max_batch=16, batch_timeout_ms=2000.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield server.server_address[1], proxy
    server.shutdown()
    server.batcher.stop()


def _fire_concurrent(port, payloads):
    out = [None] * len(payloads)

    def worker(i):
        out[i] = _req(port, "/predict", payloads[i])

    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(len(payloads))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return out


def test_concurrent_requests_are_batched(batching_server):
    """The LitServe-parity property: N concurrent single-image requests run
    through fewer than N handler forwards (reference delegates this to
    LitServe's request batching, docs/inference/litserve.md)."""
    port, proxy = batching_server
    b64 = _png_b64()
    results = _fire_concurrent(
        port, [{"instances": [{"image": b64}]} for _ in range(6)]
    )
    assert all(st == 200 for st, _ in results)
    assert all(len(out["predictions"]) == 1 for _, out in results)
    assert len(proxy.call_sizes) < 6, proxy.call_sizes
    assert max(proxy.call_sizes) >= 2, proxy.call_sizes


def test_max_batch_caps_collation():
    """--max-batch bounds how many images reach one forward; the worker
    must split an over-full queue, not drain it wholesale."""
    from linnaeus_tpu.tools.serve import MicroBatcher

    class Recorder:
        def __init__(self):
            self.sizes = []

        def predict(self, images, metas=None, options=None):
            self.sizes.append(len(images))
            return ["r"] * len(images)

    rec = Recorder()
    b = MicroBatcher(rec, max_batch=4, timeout_ms=200.0)
    try:
        results = _fire_concurrent_batcher(
            b, [([f"i{j}{k}" for k in range(3)]) for j in range(4)]
        )
        assert all(r == ["r"] * 3 for r in results)
        # 12 images at cap 4 with 3-image requests -> one request per
        # forward (3+3 would exceed 4)
        assert rec.sizes and max(rec.sizes) <= 4, rec.sizes
    finally:
        b.stop()


def _fire_concurrent_batcher(batcher, image_lists):
    out = [None] * len(image_lists)

    def worker(i):
        imgs = image_lists[i]
        out[i] = batcher.predict(imgs, [None] * len(imgs),
                                 [None] * len(imgs))

    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(len(image_lists))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return out


def test_worker_survives_pathological_handler():
    """A handler returning a short result list must error that request —
    not kill the worker and hang the queue forever."""
    from linnaeus_tpu.tools.serve import MicroBatcher

    class Short:
        def predict(self, images, metas=None, options=None):
            return []  # wrong length

    b = MicroBatcher(Short(), max_batch=8, timeout_ms=1.0)
    try:
        for _ in range(2):  # a second call proves the worker is alive
            with pytest.raises(RuntimeError, match="returned"):
                b.predict(["img"], [None], [None])
    finally:
        b.stop()


def test_poisoned_request_is_isolated(batching_server):
    """A handler-level failure in one request of a batch 400s only that
    client; batchmates are retried individually and succeed."""
    port, proxy = batching_server
    b64 = _png_b64()
    results = _fire_concurrent(port, [
        {"instances": [{"image": b64}]},
        {"instances": [{"image": b64, "metadata": {"poison": 1}}]},
        {"instances": [{"image": b64}]},
    ])
    codes = sorted(st for st, _ in results)
    assert codes == [200, 200, 400], results
    bad = next(out for st, out in results if st == 400)
    assert "poison" in bad["error"]


def test_corrupt_image_in_shared_batch_is_triaged_host_side(batching_server):
    """Corrupt image bytes inside a shared batch must 400 only their own
    client, found by HOST-SIDE preprocess triage — the innocent batchmates
    re-run as ONE shared forward, not one padded forward each."""
    import base64

    port, proxy = batching_server
    b64 = _png_b64()
    corrupt = base64.b64encode(b"\x89PNGnot really an image").decode()
    before = len(proxy.call_sizes)
    results = _fire_concurrent(port, [
        {"instances": [{"image": b64}]},
        {"instances": [{"image": corrupt}]},
        {"instances": [{"image": b64}]},
    ])
    codes = sorted(st for st, _ in results)
    assert codes == [200, 200, 400], results
    # device forwards: the initial shared batch + ONE survivor re-run —
    # never a per-request padded forward per innocent client
    assert len(proxy.call_sizes) - before <= 2, proxy.call_sizes


def test_pipelined_dispatch_overlaps_fetch():
    """With predict_async available, the worker dispatches batch N+1 while
    batch N's finisher is still blocking — the pipelining that hides host
    preprocess under device execution."""
    import time

    from linnaeus_tpu.tools.serve import MicroBatcher

    events = []
    lock = threading.Lock()

    class Async:
        def predict(self, images, metas=None, options=None):
            return ["r"] * len(images)

        def predict_async(self, images, metas=None, options=None):
            with lock:
                events.append("dispatch")

            def finish():
                time.sleep(0.15)  # device "executing"
                with lock:
                    events.append("finish")
                return ["r"] * len(images)

            return finish

    b = MicroBatcher(Async(), max_batch=1, timeout_ms=1.0, pipeline_depth=2)
    try:
        results = _fire_concurrent_batcher(b, [["a"], ["b"], ["c"], ["d"]])
        assert all(r == ["r"] for r in results)
        # a second dispatch must land before the first finish completes
        first_finish = events.index("finish")
        assert events[:first_finish].count("dispatch") >= 2, events
    finally:
        b.stop()


def test_pipeline_depth_truly_bounds_inflight():
    """pipeline_depth is a hard bound on dispatched-but-unfetched batches:
    the worker acquires the in-flight permit BEFORE dispatching, so the
    device never holds more than `depth` batches of buffers (the promise
    in the --pipeline-depth help)."""
    import time

    from linnaeus_tpu.tools.serve import MicroBatcher

    lock = threading.Lock()
    state = {"inflight": 0, "max_inflight": 0}

    class Async:
        def predict(self, images, metas=None, options=None):
            return ["r"] * len(images)

        def predict_async(self, images, metas=None, options=None):
            with lock:
                state["inflight"] += 1
                state["max_inflight"] = max(
                    state["max_inflight"], state["inflight"]
                )

            def finish():
                time.sleep(0.05)  # device "executing"
                with lock:
                    state["inflight"] -= 1
                return ["r"] * len(images)

            return finish

    b = MicroBatcher(Async(), max_batch=1, timeout_ms=1.0, pipeline_depth=1)
    try:
        results = _fire_concurrent_batcher(b, [["a"], ["b"], ["c"], ["d"]])
        assert all(r == ["r"] for r in results)
        assert state["max_inflight"] == 1, state
    finally:
        b.stop()


def test_pipelined_fetch_failure_falls_back_to_sync():
    """A device/fetch-side failure in pipelined mode re-runs the batch
    through the synchronous triage path — clients still get results."""
    from linnaeus_tpu.tools.serve import MicroBatcher

    class FlakyFetch:
        def __init__(self):
            self.sync_calls = 0

        def predict(self, images, metas=None, options=None):
            self.sync_calls += 1
            return ["ok"] * len(images)

        def predict_async(self, images, metas=None, options=None):
            def finish():
                raise RuntimeError("transfer aborted")

            return finish

    h = FlakyFetch()
    b = MicroBatcher(h, max_batch=8, timeout_ms=1.0, pipeline_depth=2)
    try:
        assert b.predict(["img"], [None], [None]) == ["ok"]
        assert h.sync_calls == 1
    finally:
        b.stop()


def test_predict_error_paths(server_port):
    st, out = _req(server_port, "/predict", {"instances": []})
    assert st == 400 and "instances" in out["error"]
    st, out = _req(server_port, "/predict", {"instances": [{"metadata": {}}]})
    assert st == 400 and "image" in out["error"]
    st, _ = _req(server_port, "/predict", {"instances": [{"image": "!!bad"}]})
    assert st == 400
    st, _ = _req(server_port, "/nope")
    assert st == 404


def test_request_deadline_times_out_stalled_device(inference_handler):
    """Tail bound BY POLICY (the latency receipt's ~1.1-1.2 s p99 cluster is
    tunnel stalls): with --request-deadline-ms set, a client waiting on a
    stalled device call gets HTTP 504 within its deadline, and the server
    stays healthy for the next request once the stall clears."""
    import time

    from linnaeus_tpu.tools.serve import make_server

    class Stall:
        """Sync-only proxy (pipeline_depth=0 keeps the batcher off
        predict_async) whose first forward stalls like a wedged tunnel."""

        def __init__(self, inner):
            self._inner = inner
            self.stalled_once = False

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def predict(self, images, metas=None, options=None):
            if not self.stalled_once:
                self.stalled_once = True
                time.sleep(1.0)  # >> deadline
            return self._inner.predict(images, metas, options)

    server = make_server(Stall(inference_handler), "127.0.0.1", 0,
                         pipeline_depth=0, request_deadline_ms=200.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        b64 = _png_b64()
        t0 = time.monotonic()
        st, out = _req(port, "/predict", {"instances": [{"image": b64}]})
        waited = time.monotonic() - t0
        assert st == 504 and "deadline" in out["error"]
        assert waited < 0.9  # answered by the deadline, not the stall
        time.sleep(1.2)  # let the stalled batch drain
        st, out = _req(port, "/predict", {"instances": [{"image": b64}]})
        assert st == 200 and len(out["predictions"]) == 1
    finally:
        server.shutdown()
        server.batcher.stop()


def test_expired_queued_request_never_dispatches():
    """A request that expires while still QUEUED behind a stalled batch is
    dropped before dispatch — no device time spent on a client that already
    got its 504."""
    import time

    from linnaeus_tpu.tools.serve import DeadlineExceededError, MicroBatcher

    seen = []
    gate = threading.Event()

    class Slow:
        def predict(self, images, metas=None, options=None):
            seen.append(tuple(images))
            gate.wait(3.0)
            return ["r"] * len(images)

    b = MicroBatcher(Slow(), max_batch=1, timeout_ms=1.0, pipeline_depth=0,
                     request_deadline_ms=150.0)
    try:
        errs = []

        def call(img):
            try:
                b.predict([img], [None], [None])
            except DeadlineExceededError as e:
                errs.append((img, e))

        t1 = threading.Thread(target=call, args=("a",))
        t1.start()
        time.sleep(0.05)  # let "a" dispatch and block the worker
        t2 = threading.Thread(target=call, args=("b",))
        t2.start()
        t1.join(2.0)
        t2.join(2.0)
        assert {img for img, _ in errs} == {"a", "b"}  # both timed out
        gate.set()  # unblock the worker; it must NOT then run "b"
        time.sleep(0.3)
        assert seen == [("a",)]
    finally:
        gate.set()
        b.stop()
