"""Dependency-free HTTP serving for LinnaeusInferenceHandler.

The reference deploys its handler behind LitServe
(docs/inference/litserve.md); this module provides the same request surface
with only the standard library (ThreadingHTTPServer), so the bundle can be
served anywhere the framework runs. LitServe remains a drop-in option — the
handler API is identical. LitServe's cross-request batching role ("by
default LitServe will batch concurrent requests") is covered by
``MicroBatcher``: concurrent /predict requests are collated into one padded
forward, so concurrent load rides the chip's batched throughput instead of
serialized single-request latency.

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
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _decode_image(b64: str):
    """Base64 -> raw image bytes, passed through to the handler undecoded:
    preprocess_image_batch decodes whole batches in the native C++
    data-plane when the bytes are JPEG (PIL per-image otherwise), so the
    server must not eagerly decode here. Undecodable bytes fail inside the
    shared batch and the MicroBatcher's host-side preprocess triage 400s
    only the offending request (no per-request device forwards)."""
    return base64.b64decode(b64)


class DeadlineExceededError(RuntimeError):
    """A request outlived the server's per-request deadline (HTTP 504)."""


class _Pending:
    __slots__ = ("images", "metas", "options", "done", "results", "error",
                 "expired")

    def __init__(self, images, metas, options):
        self.images = images
        self.metas = metas
        self.options = options
        self.done = threading.Event()
        self.results = None
        self.error = None
        self.expired = False  # client gave up (deadline); drop if undispatched


class MicroBatcher:
    """Cross-request dynamic batching (the role LitServe's request batching
    plays in the reference deployment). A worker thread drains the pending
    queue: after the first request arrives it waits up to ``timeout_ms``
    for more (or until ``max_batch`` images are pending), runs ONE
    handler.predict over the concatenation, and splits the results back per
    request. The worker inherently serializes predict(), so padded-batch
    compilations are never raced. A handler-level failure in a multi-request
    batch is isolated by retrying each request individually."""

    def __init__(self, handler, max_batch: int = 32, timeout_ms: float = 5.0,
                 pipeline_depth: int = 2,
                 request_deadline_ms: float = 0.0):
        import collections
        import queue

        self.handler = handler
        self.max_batch = max(1, int(max_batch))
        self.timeout = max(0.0, float(timeout_ms)) / 1e3
        # per-request deadline (0 = unbounded, the pre-r5 behavior): bounds
        # the tail BY POLICY — a stalled device call (the latency receipt's
        # ~1.1-1.2 s p99 cluster traces to tunnel stalls,
        # docs/performance.md) otherwise holds its whole batch's clients
        # indefinitely. An expired request still queued is dropped before
        # dispatch (no wasted forward); one already in a dispatched batch
        # returns 504 to ITS client while the batch finishes for the rest.
        self.request_deadline = max(0.0, float(request_deadline_ms)) / 1e3
        self._queue: list[_Pending] = []
        self._cv = threading.Condition()
        self._stopped = False
        # bounded observability window (tests; a long-lived server must not
        # accumulate one entry per batch forever)
        self.batch_sizes = collections.deque(maxlen=1024)
        # Pipelined mode: when the handler exposes predict_async (dispatch
        # now, fetch later), the worker dispatches batch N+1's preprocess +
        # device call while batch N executes; a completion thread blocks on
        # the fetch and distributes results. Depth is a TRUE bound on
        # dispatched-but-unfetched batches: the worker acquires _inflight
        # BEFORE dispatching and the completion thread releases it after
        # the fetch (a bounded queue alone would let dispatch run ahead of
        # the blocking put by up to two batches). 0 disables.
        self._completion_q = None
        self._completion_thread = None
        self._inflight = None
        if pipeline_depth > 0 and hasattr(handler, "predict_async"):
            self._inflight = threading.Semaphore(max(1, int(pipeline_depth)))
            self._completion_q = queue.Queue()
            self._completion_thread = threading.Thread(
                target=self._completion_loop, name="serve-complete",
                daemon=True,
            )
            self._completion_thread.start()
        self._worker = threading.Thread(
            target=self._loop, name="serve-microbatch", daemon=True
        )
        self._worker.start()

    def predict(self, images, metas, options):
        p = _Pending(images, metas, options)
        with self._cv:
            if self._stopped:
                raise RuntimeError("server is shutting down")
            self._queue.append(p)
            self._cv.notify_all()
        if not p.done.wait(self.request_deadline or None):
            with self._cv:
                # mark BEFORE removing, under the lock: if the worker is
                # between "saw p queued" and "popped p", the expired flag
                # makes _take_batch_locked's skip a real second line of
                # defense rather than dead code
                p.expired = True
                if p in self._queue:  # never dispatched — free to drop
                    self._queue.remove(p)
            raise DeadlineExceededError(
                f"request exceeded the {self.request_deadline * 1e3:.0f} ms "
                f"server deadline"
            )
        if p.error is not None:
            raise p.error
        return p.results

    def stop(self) -> None:
        with self._cv:
            self._stopped = True
            self._cv.notify_all()
        self._worker.join(timeout=5.0)
        if self._completion_thread is not None:
            self._completion_q.put(None)  # sentinel after the worker drains
            self._completion_thread.join(timeout=30.0)

    # -- worker side ------------------------------------------------------
    def _n_pending_images(self) -> int:
        return sum(len(p.images) for p in self._queue)

    def _take_batch_locked(self) -> list[_Pending]:
        """Pop requests up to the max_batch image cap (always at least one
        request); the remainder stays queued for the next round."""
        batch, total = [], 0
        while self._queue:
            if self._queue[0].expired:  # client already got its 504
                self._queue.pop(0)
                continue
            nxt = len(self._queue[0].images)
            if batch and total + nxt > self.max_batch:
                break
            batch.append(self._queue.pop(0))
            total += nxt
        return batch

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._stopped:
                    self._cv.wait()
                if self._stopped and not self._queue:
                    return
                deadline = time.monotonic() + self.timeout
                while (self._n_pending_images() < self.max_batch
                       and not self._stopped):
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(remaining)
                batch = self._take_batch_locked()
            if not batch:  # everything pending expired while queued
                continue
            # the worker must survive anything _run throws (a dead worker
            # would hang every in-flight and future request), and done must
            # fire no matter what
            deferred = False
            try:
                deferred = self._run(batch)
            except BaseException as e:  # noqa: BLE001 — worker must live
                for p in batch:
                    if p.error is None and p.results is None:
                        p.error = RuntimeError(
                            f"batch execution failed: {e!r}")
            finally:
                if not deferred:  # deferred batches complete in the
                    for p in batch:  # completion thread
                        p.done.set()

    def _run_one(self, p: _Pending) -> None:
        try:
            results = self.handler.predict(
                p.images, p.metas,
                p.options if any(o is not None for o in p.options) else None,
            )
            if len(results) != len(p.images):
                raise RuntimeError(
                    f"handler returned {len(results)} results for "
                    f"{len(p.images)} images")
            p.results = results
        except Exception as e:
            p.error = e

    def _run(self, batch: list[_Pending]) -> bool:
        """Returns True when the batch was handed to the completion thread
        (results + done fire there); False when fully handled here."""
        if self._completion_q is not None:
            self.batch_sizes.append(sum(len(p.images) for p in batch))
            images = [img for p in batch for img in p.images]
            metas = [m for p in batch for m in p.metas]
            options = [o for p in batch for o in p.options]
            # blocks when `pipeline_depth` batches are already dispatched —
            # the backpressure that bounds device-queue growth (released by
            # the completion thread once the batch's fetch finishes)
            self._inflight.acquire()
            try:
                finisher = self.handler.predict_async(
                    images, metas,
                    options if any(o is not None for o in options) else None,
                )
            except Exception:
                # dispatch-side failure (bad bytes/options): the sync path
                # owns triage; already counted at dispatch
                self._inflight.release()
                self._run_sync(batch, count=False)
                return False
            self._completion_q.put((batch, finisher, len(images)))
            return True
        self._run_sync(batch)
        return False

    def _completion_loop(self) -> None:
        while True:
            item = self._completion_q.get()
            if item is None:
                return
            batch, finisher, n_images = item
            try:
                results = finisher()
                if len(results) != n_images:
                    raise RuntimeError("handler returned a short result list")
                i = 0
                for p in batch:
                    p.results = results[i : i + len(p.images)]
                    i += len(p.images)
            except BaseException:  # noqa: BLE001 — thread must live
                # device/fetch-side failure: re-run synchronously, which
                # triages offenders and isolates survivors exactly like the
                # non-pipelined path
                try:
                    self._run_sync(batch, count=False)
                except BaseException as e:  # noqa: BLE001
                    for p in batch:
                        if p.error is None and p.results is None:
                            p.error = RuntimeError(
                                f"batch execution failed: {e!r}")
            finally:
                self._inflight.release()
                for p in batch:
                    p.done.set()

    def _run_sync(self, batch: list[_Pending], count: bool = True) -> None:
        if count:
            self.batch_sizes.append(sum(len(p.images) for p in batch))
        if len(batch) == 1:
            return self._run_one(batch[0])
        images = [img for p in batch for img in p.images]
        metas = [m for p in batch for m in p.metas]
        options = [o for p in batch for o in p.options]
        try:
            results = self.handler.predict(
                images, metas,
                options if any(o is not None for o in options) else None,
            )
            if len(results) != len(images):
                raise RuntimeError("handler returned a short result list")
        except Exception:
            # Triage HOST-SIDE first: run preprocess alone (no device
            # forward) per request to find the offenders — a client
            # streaming corrupt bytes must not cost the innocent requests
            # one full padded forward each. Offenders get their own error;
            # survivors re-run as ONE shared batch.
            from linnaeus_tpu.inference.preprocessing import (
                preprocess_image_batch,
                preprocess_metadata_batch,
            )

            # A handler without a real InferenceConfig (test doubles) can't
            # be triaged — detect that ONCE up front so a genuine
            # AttributeError raised inside preprocess marks the request as
            # an offender like any other exception instead of silently
            # downgrading triage to per-request padded forwards.
            config = getattr(self.handler, "config", None)
            if config is None or not hasattr(config, "input_preprocessing"):
                survivors = list(batch)
            else:
                survivors = []
                for p in batch:
                    try:
                        preprocess_image_batch(p.images, config)
                        preprocess_metadata_batch(
                            p.metas, len(p.images), config
                        )
                        survivors.append(p)
                    except Exception as e:
                        p.error = e
            if len(survivors) == len(batch):
                # not a preprocess failure — isolate by individual runs
                for p in batch:
                    self._run_one(p)
            elif survivors:
                self._run_sync(survivors, count=False)
            return
        i = 0
        for p in batch:
            p.results = results[i : i + len(p.images)]
            i += len(p.images)


def make_server(handler, host: str = "0.0.0.0", port: int = 8000,
                max_batch: int = 32, batch_timeout_ms: float = 5.0,
                pipeline_depth: int = 2,
                request_deadline_ms: float = 0.0):
    """Build (but don't serve_forever) a ThreadingHTTPServer around an
    inference handler. Concurrent /predict requests are dynamically batched
    through one MicroBatcher worker (which also serializes predict(), so
    padded-batch compilations are never raced). The batcher is exposed as
    ``server.batcher``; call ``server.batcher.stop()`` after shutdown.
    The worker thread starts only after the socket binds, so a bind
    failure leaks nothing."""
    batcher = None  # assigned after the socket binds; read at request time

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
                try:
                    results = batcher.predict(images, metas, options)
                except DeadlineExceededError as e:
                    return self._json(504, {"error": str(e)})
                # mode="json" keeps typus results serializable (their
                # model_dump() python mode emits set-valued fields)
                return self._json(
                    200,
                    {"predictions": [r.model_dump(mode="json") for r in results]},
                )
            except Exception as e:  # malformed input must not kill the server
                return self._json(400, {"error": str(e)[:500]})

    server = ThreadingHTTPServer((host, port), Handler)  # binds here
    batcher = MicroBatcher(handler, max_batch, batch_timeout_ms,
                           pipeline_depth=pipeline_depth,
                           request_deadline_ms=request_deadline_ms)
    server.batcher = batcher
    return server


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("linnaeus_tpu serve")
    parser.add_argument("--config", required=True, help="bundle config.yaml")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=32,
                        help="dynamic-batching cap: max images collated "
                             "into one forward across concurrent requests")
    parser.add_argument("--batch-timeout-ms", type=float, default=5.0,
                        help="how long the batcher waits for more "
                             "concurrent requests before running")
    parser.add_argument("--pipeline-depth", type=int, default=2,
                        help="max dispatched-but-unfetched batches on the "
                             "device: the worker preprocesses+dispatches "
                             "batch N+1 while N executes (0 = fully "
                             "synchronous)")
    parser.add_argument("--request-deadline-ms", type=float, default=0.0,
                        help="per-request wall deadline; a request not "
                             "answered in time gets HTTP 504 instead of "
                             "waiting on a stalled device call (0 = "
                             "unbounded)")
    args = parser.parse_args(argv)

    from linnaeus_tpu.inference import LinnaeusInferenceHandler
    from linnaeus_tpu.utils.logging import get_main_logger

    handler = LinnaeusInferenceHandler.load_from_artifacts(args.config)
    n = handler.warmup()  # compile every batch bucket before taking traffic
    get_main_logger().info(f"warmed {n} batch buckets")
    server = make_server(handler, args.host, args.port,
                         args.max_batch, args.batch_timeout_ms,
                         pipeline_depth=args.pipeline_depth,
                         request_deadline_ms=args.request_deadline_ms)
    get_main_logger().info(
        f"Serving {handler.config.model.architecture_name} on "
        f"{args.host}:{args.port} (/predict /info /healthz; dynamic "
        f"batching <= {args.max_batch} imgs, {args.batch_timeout_ms} ms)"
    )
    server.serve_forever()


if __name__ == "__main__":
    main()
