"""Production pose-serving server: dynamic micro-batching over HTTP.

The reference has no serving story (its inference.py handles one image from
argv, reference inference.py:60-128); this is the deployment front of the
superset serving stack. Two layers, separately usable:

* `MicroBatcher` — the batching core, HTTP-free. Concurrent callers
  `submit(frame, boxes)` crops; a dispatcher thread coalesces everything
  pending (across requests) into one padded bucket-size batch per device
  dispatch, so p99 latency under concurrent load rides the chip's
  throughput path instead of serializing one tiny program per request.
  Buckets bound compilation exactly like `predict_frame`; padding rows
  replicate a real crop and are stripped before completion. Results are
  per-request futures.

* `PoseHTTPServer` / `main` — a stdlib ThreadingHTTPServer front end:

      python -m probpose_pytorch_tpu.serve.server \
          --checkpoint runs/flagship/checkpoints --port 8000
      # or: --bundle export_dir/   (serve a StableHLO bundle, no model code)

  POST /predict   {"frame_b64": <base64 raw HxWx3 uint8>,
                   "shape": [H, W, 3], "boxes": [[x,y,w,h], ...]}
                  -> {"keypoints": ..., "scores": ..., ...} (JSON lists)
  GET  /healthz   -> {"ok": true}
  GET  /stats     -> request/crop counts, batch-size histogram, latency
                     quantiles (ms) since start.

The JSON+base64 protocol is deliberately dependency-free (no proto/grpc in
this environment); the batching core is transport-agnostic, so a different
front end can wrap `MicroBatcher` directly.

Frames are zero-padded to the server's fixed frame shape (the semantics-free
padding of ops/preprocess.py — out-of-extent samples are black); each crop
row carries its request's padded frame, so crops from different requests
batch together in one (B, Hf, Wf, 3) dispatch.
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
import time
from collections import deque
from concurrent.futures import Future
from pathlib import Path
from typing import Any, Callable, Sequence

import numpy as np

__all__ = ["MicroBatcher", "BottomUpRunner", "PoseHTTPServer", "main"]

# One 4K RGB frame base64-encodes to ~33 MB; 128 MB bounds any sane request
# while keeping a ThreadingHTTPServer from buffering unbounded bodies.
MAX_REQUEST_BYTES = 128 * 1024 * 1024


class _SplitAggregate:
    """Reassembles an oversized request's pipelined chunks in order and
    resolves its future once all arrive (completion-thread only, plus a
    fail() that may race from the dispatcher — guarded)."""

    def __init__(self, fut: Future, n_chunks: int, total: int, t0: float):
        self.fut = fut
        self.parts: list = [None] * n_chunks
        self.remaining = n_chunks
        self.total = total
        self.t0 = t0
        self._lock = threading.Lock()
        self._failed = False

    def add(self, idx: int, out: dict) -> bool:
        with self._lock:
            if self._failed:
                return False
            self.parts[idx] = out
            self.remaining -= 1
            if self.remaining:
                return False
        self.fut.set_result({
            k: np.concatenate([p[k] for p in self.parts])
            for k in self.parts[0]
        })
        return True

    def fail(self, e: Exception) -> None:
        with self._lock:
            if self._failed:
                return
            self._failed = True
        self.fut.set_exception(e)


class MicroBatcher:
    """Coalesce concurrent (frame, boxes) requests into bucket-size batches.

    runner: callable (frames (B, Hf, Wf, 3) uint8, boxes (B, 4) f32) ->
    dict of (B, ...) arrays — a `TopDownPredictor` or `ServingBundle`.
    buckets: ascending batch sizes the runner accepts (compilation bound).
    max_wait_ms: how long the dispatcher waits for more work after the
    first pending crop before dispatching a partial batch — the classic
    latency/throughput knob (0 disables coalescing delay).
    frame_shape: (Hf, Wf) all frames are zero-padded to.
    indexed: the runner supports frame_ids (a live TopDownPredictor) —
    each request's frame then crosses the host->device link once instead
    of once per crop; the unique-frame count pads to a power of two so the
    program set stays log2(batch)-bounded. Leave False for ServingBundles
    (exported programs take per-crop frames).
    """

    def __init__(
        self,
        runner: Callable[..., dict],
        buckets: Sequence[int],
        frame_shape: tuple[int, int],
        max_wait_ms: float = 5.0,
        indexed: bool = False,
    ):
        self.runner = runner
        self.buckets = tuple(sorted(int(b) for b in buckets))
        if not self.buckets or self.buckets[0] < 1:
            raise ValueError(f"invalid buckets {self.buckets}")
        self.frame_shape = (int(frame_shape[0]), int(frame_shape[1]))
        self.max_wait_ms = float(max_wait_ms)
        self.indexed = bool(indexed)
        # Non-blocking device enqueue when the runner offers one
        # (TopDownPredictor._dispatch / ServingBundle.dispatch): the
        # dispatcher thread then pipelines batch i+1's assembly + upload
        # under batch i's compute, and a completion thread does the
        # blocking readback — the server-side mirror of predict_stream.
        self._dispatch_fn = (
            getattr(runner, "dispatch", None)
            or getattr(runner, "_dispatch", None)
            or runner
        )
        self._queue: deque = deque()  # (frame, boxes, future, t0)
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._closed = False
        self.stats = {
            "requests": 0,
            "crops": 0,
            "dispatches": 0,
            "batch_sizes": [],
            "latency_ms": [],
        }
        import queue as _queue

        # bounded: at most 2 batches in flight on the device
        self._done: _queue.Queue = _queue.Queue(maxsize=2)
        self._completion = threading.Thread(
            target=self._completion_loop, name="microbatcher-read",
            daemon=True,
        )
        self._completion.start()
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="microbatcher", daemon=True
        )
        self._thread.start()

    # -- client side -------------------------------------------------------

    def submit(self, frame: np.ndarray, boxes: np.ndarray) -> Future:
        """Enqueue one request (one frame, N boxes). The future resolves to
        a dict of (N, ...) numpy arrays, or raises the dispatch error."""
        if self._closed:
            raise RuntimeError("batcher is closed")
        frame = self._pad_frame(np.asarray(frame, np.uint8))
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        fut: Future = Future()
        if len(boxes) == 0:
            fut.set_result({})
            return fut
        # the frame is stored ONCE per request; _run_batch replicates it
        # per crop (non-indexed runners) or passes frame_ids (indexed)
        with self._lock:
            self._queue.append((frame, boxes, fut, time.perf_counter()))
            self.stats["requests"] += 1
            self.stats["crops"] += len(boxes)
        self._wake.set()
        return fut

    def warmup(self, verbose: bool = False) -> int:
        """Compile every program the batcher can dispatch BEFORE taking
        traffic: one dummy dispatch per (bucket, unique-frame-count)
        combination (indexed mode walks the power-of-two frame ladder).
        Without this, the first request mix that produces a new frame
        count compiles under load (~tens of seconds per program on TPU) —
        the classic serving compile storm. Returns the program count."""
        Hf, Wf = self.frame_shape
        frame = np.zeros((Hf, Wf, 3), np.uint8)
        n = 0
        for b in self.buckets:
            fs = [1]
            if self.indexed and b > 1:
                f = 1
                fs = []
                while f < b:
                    fs.append(f)
                    f *= 2
                fs.append(b)
            for f in fs:
                f = min(f, b)
                # f*(b//f) <= b crops; _dispatch_device pads the remainder
                boxes = [
                    np.tile(
                        np.array([[0, 0, Wf, Hf]], np.float32),
                        (max(b // f, 1), 1),
                    )
                ] * f
                dev = self._dispatch_device([frame] * len(boxes), boxes, b)
                {k: np.asarray(v) for k, v in dev.items()}
                n += 1
                if verbose:
                    print(
                        f"[warmup] bucket {b}, frames {len(boxes)} ready",
                        flush=True,
                    )
        return n

    def close(self) -> None:
        self._closed = True
        self._wake.set()
        self._thread.join(timeout=10)
        self._done.put(None)  # completion-thread sentinel
        self._completion.join(timeout=30)
        with self._lock:
            pending = list(self._queue)
            self._queue.clear()
        for _, _, fut, _ in pending:
            fut.set_exception(RuntimeError("batcher closed"))

    # -- dispatcher --------------------------------------------------------

    def _pad_frame(self, frame: np.ndarray) -> np.ndarray:
        Hf, Wf = self.frame_shape
        H, W, C = frame.shape
        if (H, W) == (Hf, Wf):
            return frame
        if H > Hf or W > Wf:
            raise ValueError(
                f"frame {(H, W)} exceeds the server frame shape {(Hf, Wf)}"
            )
        return np.pad(frame, ((0, Hf - H), (0, Wf - W), (0, 0)))

    def _dispatch_loop(self) -> None:
        while True:
            self._wake.wait()
            if self._closed:
                return
            # coalescing window: let concurrent requests pile up
            if self.max_wait_ms > 0:
                deadline = time.perf_counter() + self.max_wait_ms / 1e3
                while time.perf_counter() < deadline:
                    with self._lock:
                        pending = sum(len(b) for _, b, _, _ in self._queue)
                    if pending >= self.buckets[-1]:
                        break
                    time.sleep(min(0.001, self.max_wait_ms / 1e3))
            batch = []
            count = 0
            with self._lock:
                self._wake.clear()
                # re-check AFTER the clear: close() may have set _closed +
                # woken us in the window since wait() returned — clearing
                # would otherwise swallow its signal and leave this thread
                # blocked in wait() forever (close() then eats its full
                # join timeout and leaks the thread)
                if self._closed:
                    return
                # pop requests while they fit in the top bucket (always at
                # least one, so a single oversized request still dispatches
                # — _run_batch splits it)
                while self._queue:
                    n = len(self._queue[0][1])
                    if batch and count + n > self.buckets[-1]:
                        break
                    batch.append(self._queue.popleft())
                    count += n
                    if count >= self.buckets[-1]:
                        break
            if not batch:
                continue
            self._run_batch(batch, count)
            with self._lock:
                if self._queue:
                    self._wake.set()

    def _run_batch(self, batch, count: int) -> None:
        bucket = next((b for b in self.buckets if b >= count), None)
        if bucket is None:
            # only a single request can exceed the top bucket (the dispatch
            # loop never coalesces past it): split into top-bucket chunks
            # and pipeline each chunk like a normal batch
            top = self.buckets[-1]
            frame, boxes, fut, t0 = batch[0]
            chunks = [
                boxes[i:i + top] for i in range(0, len(boxes), top)
            ]
            agg = _SplitAggregate(fut, len(chunks), len(boxes), t0)
            for ci, chunk in enumerate(chunks):
                try:
                    dev = self._dispatch_device([frame], [chunk], top)
                except Exception as e:  # noqa: BLE001 — future carries it
                    agg.fail(e)
                    return
                self._done.put(("chunk", dev, len(chunk), agg, ci))
                with self._lock:
                    self.stats["dispatches"] += 1
            with self._lock:
                self.stats["batch_sizes"].append(int(len(boxes)))
            return
        try:
            dev = self._dispatch_device(
                [f for f, _, _, _ in batch],
                [b for _, b, _, _ in batch],
                bucket,
            )
        except Exception as e:  # noqa: BLE001 — futures carry it
            for _, _, fut, _ in batch:
                fut.set_exception(e)
            return
        self._done.put(("batch", dev, count, batch, None))
        with self._lock:
            self.stats["dispatches"] += 1
            self.stats["batch_sizes"].append(int(count))

    def _completion_loop(self) -> None:
        """Blocking device->host readback + result fan-out, off the
        dispatcher thread so the next batch's assembly/upload overlaps
        this batch's compute."""
        while True:
            item = self._done.get()
            if item is None:
                return
            kind, dev, n, target, ci = item
            try:
                out = {k: np.asarray(v)[:n] for k, v in dev.items()}
            except Exception as e:  # noqa: BLE001 — futures carry it
                if kind == "batch":
                    for _, _, fut, _ in target:
                        fut.set_exception(e)
                else:
                    target.fail(e)
                continue
            if kind == "batch":
                i = 0
                for _, b, fut, t0 in target:
                    m = len(b)
                    fut.set_result(
                        {k: v[i:i + m] for k, v in out.items()}
                    )
                    self._note(m, t0)
                    i += m
            else:
                done = target.add(ci, out)
                if done:
                    self._note(target.total, target.t0)

    def _dispatch_device(self, req_frames, req_boxes, bucket: int) -> dict:
        """Assemble one padded device batch for a list of (frame, boxes)
        requests and ENQUEUE it (non-blocking when the runner exposes a
        dispatch method): crops pad to `bucket` (repeating the last crop);
        indexed mode passes each unique frame once + frame_ids (frame count
        padded to a power of two), non-indexed replicates frames per
        crop. Returns in-flight device arrays."""
        counts = [len(b) for b in req_boxes]
        boxes = np.concatenate(req_boxes).astype(np.float32)
        pad = bucket - sum(counts)
        if pad:
            boxes = np.concatenate(
                [boxes, np.repeat(boxes[-1:], pad, axis=0)]
            )
        if self.indexed:
            ids = np.repeat(
                np.arange(len(req_frames), dtype=np.int32), counts
            )
            if pad:
                ids = np.concatenate(
                    [ids, np.full((pad,), ids[-1], np.int32)]
                )
            f = len(req_frames)
            fcap = 1 << (f - 1).bit_length() if f > 1 else 1
            fcap = min(fcap, bucket)  # export ladder tops out at the bucket
            frames = np.stack(
                list(req_frames)
                + [np.zeros_like(req_frames[0])] * (fcap - f)
            )
            return self._dispatch_fn(frames, boxes, ids)
        rows = [
            np.broadcast_to(fr[None], (c,) + fr.shape)
            for fr, c in zip(req_frames, counts)
        ]
        if pad:
            last = req_frames[-1]
            rows.append(np.broadcast_to(last[None], (pad,) + last.shape))
        return self._dispatch_fn(
            np.ascontiguousarray(np.concatenate(rows)), boxes
        )

    def _note(self, n: int, t0: float) -> None:
        ms = (time.perf_counter() - t0) * 1e3
        with self._lock:
            self.stats["latency_ms"].append(ms)
            # bound the in-memory windows (quantiles reflect recent load)
            if len(self.stats["latency_ms"]) > 10_000:
                del self.stats["latency_ms"][:5_000]
            if len(self.stats["batch_sizes"]) > 10_000:
                del self.stats["batch_sizes"][:5_000]

    def stats_snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self.stats["latency_ms"])
            sizes = list(self.stats["batch_sizes"])
            out = {
                "requests": self.stats["requests"],
                "crops": self.stats["crops"],
                "dispatches": self.stats["dispatches"],
            }
        if lat:
            q = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))]
            out["latency_ms"] = {
                "p50": round(q(0.50), 3),
                "p90": round(q(0.90), 3),
                "p99": round(q(0.99), 3),
                "max": round(lat[-1], 3),
            }
        if sizes:
            out["mean_batch"] = round(float(np.mean(sizes)), 2)
            out["max_batch"] = int(max(sizes))
        return out


class BottomUpRunner:
    """Adapts the single-stage pose family (a live `detect.pipeline.
    BottomUpPredictor` or a loaded `serve.BottomUpBundle`) to the
    MicroBatcher runner contract. Each request is ONE frame = one batch
    row; the synthesized full-frame box rows the batcher assembles are
    ignored (the model consumes whole frames by construction — that is the
    family's point: cost per frame, not per person). `kind = "bottomup"`
    tells the HTTP handler to post-process rows with score thresholding
    instead of the top-down per-crop contract."""

    kind = "bottomup"

    def __init__(self, predictor):
        self.predictor = predictor
        self.score_threshold = float(predictor.score_threshold)

    def dispatch(self, frames: np.ndarray, boxes: np.ndarray) -> dict:
        del boxes  # full-frame rows, one per request — nothing to crop
        return self.predictor.dispatch(frames)

    __call__ = dispatch


class FusedRunner:
    """Adapts the fused two-stage predictor (a live
    `detect.fused.FusedTwoStagePredictor` or a loaded `FusedBundle`) to
    the MicroBatcher runner contract: whole-frame rows like the bottom-up
    family (requests omit 'boxes'), but the program runs detector ->
    crops -> top-down pose in one dispatch and rows threshold on
    `det_scores`. `kind = "fused"`."""

    kind = "fused"

    def __init__(self, predictor):
        self.predictor = predictor
        self.score_threshold = float(predictor.score_threshold)

    def dispatch(self, frames: np.ndarray, boxes: np.ndarray) -> dict:
        del boxes  # full-frame rows, one per request
        return self.predictor.dispatch(frames)

    __call__ = dispatch


def _make_handler(
    batchers: dict[str, MicroBatcher],
    default: str,
    request_timeout_s: float = 300.0,
    detector=None,
):
    # generous default: the FIRST request on each bucket pays the XLA
    # compile (~20-40 s on TPU); steady-state requests return in ms.
    # batchers: one MicroBatcher per served model; requests pick one with
    # the JSON "model" field (default: the first configured model).
    # detector: a detect.DetectorPredictor — requests that OMIT "boxes"
    # then auto-detect people in the frame (standalone mode); the response
    # carries the boxes used. Detection runs synchronously in the handler
    # thread (its own jitted program), the pose forward still micro-batches.
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/models":
                self._reply(200, {"models": sorted(batchers),
                                  "default": default})
            elif self.path == "/stats":
                if len(batchers) == 1:
                    self._reply(200, batchers[default].stats_snapshot())
                else:
                    self._reply(200, {
                        name: mb.stats_snapshot()
                        for name, mb in batchers.items()
                    })
            elif self.path == "/metrics":
                # Prometheus text exposition, one label set per model
                lines = [
                    "# TYPE pose_requests_total counter",
                    "# TYPE pose_crops_total counter",
                    "# TYPE pose_dispatches_total counter",
                    "# TYPE pose_request_latency_ms summary",
                    "# TYPE pose_mean_batch_size gauge",
                ]
                for name, mb in sorted(batchers.items()):
                    s = mb.stats_snapshot()
                    m = f'model="{name}"'
                    lines += [
                        f"pose_requests_total{{{m}}} {s['requests']}",
                        f"pose_crops_total{{{m}}} {s['crops']}",
                        f"pose_dispatches_total{{{m}}} {s['dispatches']}",
                    ]
                    if "latency_ms" in s:
                        for q, key in (("0.5", "p50"), ("0.9", "p90"),
                                       ("0.99", "p99")):
                            lines.append(
                                f"pose_request_latency_ms{{{m},"
                                f'quantile="{q}"}} '
                                f"{s['latency_ms'][key]}"
                            )
                    if "mean_batch" in s:
                        lines.append(
                            f"pose_mean_batch_size{{{m}}} "
                            f"{s['mean_batch']}"
                        )
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length > MAX_REQUEST_BYTES:
                    self._reply(413, {
                        "error": f"request {length} B exceeds the "
                        f"{MAX_REQUEST_BYTES} B limit"
                    })
                    return
                req = json.loads(self.rfile.read(length))
                shape = tuple(int(v) for v in req["shape"])
                if len(shape) != 3 or shape[2] != 3:
                    raise ValueError(f"shape {shape} != (H, W, 3)")
                raw = base64.b64decode(req["frame_b64"])
                frame = np.frombuffer(raw, np.uint8)
                if frame.size != shape[0] * shape[1] * shape[2]:
                    raise ValueError(
                        f"{frame.size} bytes != shape {shape}"
                    )
                frame = frame.reshape(shape)
                boxes = (
                    np.asarray(req["boxes"], np.float32).reshape(-1, 4)
                    if "boxes" in req
                    else None
                )
                model = req.get("model", default)
            except Exception as e:  # noqa: BLE001 — client error -> 400
                self._reply(400, {"error": str(e)})
                return
            batcher = batchers.get(model)
            if batcher is None:
                self._reply(404, {
                    "error": f"unknown model {model!r} "
                    f"(serving: {sorted(batchers)})"
                })
                return
            kind = getattr(batcher.runner, "kind", None)
            bottomup = kind in ("bottomup", "fused")
            if bottomup:
                if boxes is not None:
                    fam = (
                        "fused two-stage" if kind == "fused"
                        else "bottom-up"
                    )
                    self._reply(400, {
                        "error": f"{fam} models take whole frames — "
                        "omit 'boxes' (pass 'score_threshold' to filter)"
                    })
                    return
                H, W = frame.shape[:2]
                boxes = np.array([[0.0, 0.0, W, H]], np.float32)
            elif boxes is None and detector is None:
                self._reply(400, {
                    "error": "request has no 'boxes' and the server has "
                    "no --detector configured"
                })
                return
            detected = None
            if boxes is None:
                from probpose_pytorch_tpu.video import detector_boxes

                try:
                    boxes = detector_boxes(
                        detector, frame, batcher.runner.input_size,
                        threshold=req.get("detector_threshold"),
                    )
                except Exception as e:  # noqa: BLE001
                    self._reply(500, {"error": f"detector: {e}"})
                    return
                detected = boxes
                if len(boxes) == 0:
                    self._reply(200, {"boxes": [], "keypoints": []})
                    return
            try:
                fut = batcher.submit(frame, boxes)
            except ValueError as e:
                # synchronous validation (e.g. frame exceeds the server
                # frame shape) is the client's fault, not a server fault
                self._reply(400, {"error": str(e)})
                return
            try:
                out = fut.result(timeout=request_timeout_s)
            except Exception as e:  # noqa: BLE001 — server error -> 500
                self._reply(500, {"error": str(e)})
                return
            if bottomup:
                # one row per request: (1, K, ...) -> threshold over the
                # K detection slots, return (n, ...) kept poses. Fused
                # rows carry the detector score under det_scores.
                thr = float(req.get(
                    "score_threshold", batcher.runner.score_threshold
                ))
                skey = "det_scores" if kind == "fused" else "scores"
                keep = np.asarray(out[skey][0]) >= thr
                payload = {
                    k: np.asarray(v[0])[keep].tolist()
                    for k, v in out.items()
                }
            else:
                payload = {k: v.tolist() for k, v in out.items()}
            if detected is not None:
                payload["boxes"] = detected.tolist()
            self._reply(200, payload)

    return Handler


class PoseHTTPServer:
    """ThreadingHTTPServer wrapping one or more MicroBatchers;
    `serve_forever` in the calling thread or `start()`/`shutdown()` for
    embedding (tests). Pass a dict {name: MicroBatcher} to serve several
    models from one port (requests route with the JSON "model" field;
    the `default` name — or the sole/first model — serves unrouted
    requests)."""

    def __init__(self, batcher, host: str = "0.0.0.0",
                 port: int = 8000, request_timeout_s: float = 300.0,
                 default: str | None = None, detector=None):
        from http.server import ThreadingHTTPServer

        if isinstance(batcher, MicroBatcher):
            batchers = {"default": batcher}
        else:
            batchers = dict(batcher)
        if not batchers:
            raise ValueError("no batchers to serve")
        self.batchers = batchers
        self.batcher = next(iter(batchers.values()))  # back-compat alias
        default = default or next(iter(batchers))
        if default not in batchers:
            raise ValueError(f"default model {default!r} not in {sorted(batchers)}")
        self.httpd = ThreadingHTTPServer(
            (host, port),
            _make_handler(batchers, default, request_timeout_s,
                          detector=detector),
        )
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=10)
        for mb in self.batchers.values():
            mb.close()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="pose serving server")
    parser.add_argument("--checkpoint", action="append", default=[],
                        metavar="[NAME=]DIR",
                        help="Orbax checkpoint directory (live predictor); "
                        "repeat with NAME=DIR to serve several models")
    parser.add_argument("--bundle", action="append", default=[],
                        metavar="[NAME=]DIR",
                        help="exported StableHLO bundle directory; repeat "
                        "with NAME=DIR to serve several models")
    parser.add_argument("--bottomup", action="append", default=[],
                        metavar="[NAME=]DIR",
                        help="single-stage pose model (detect.train "
                        "--keypoints run dir or an exported bottom-up "
                        "bundle): requests send whole frames, no 'boxes' "
                        "field; cost is per frame, not per person")
    parser.add_argument("--fused", action="append", default=[],
                        metavar="[NAME=]DIR",
                        help="FUSED two-stage model: DIR is an exported "
                        "fused bundle (serve.export --fused-detector), or "
                        "a pose checkpoint dir composed live with the "
                        "global --detector; requests send whole frames "
                        "(no 'boxes'), detector -> crops -> pose runs as "
                        "ONE program per dispatch")
    parser.add_argument("--max-people", type=int, default=8,
                        help="pose slots per frame for live --fused models")
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--frame-shape", type=str, default="1080,1920",
                        help="H,W all frames are padded to")
    parser.add_argument("--buckets", type=str, default=None,
                        help="comma-separated batch buckets "
                        "(default: autotuned ladder)")
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    parser.add_argument("--detector", type=Path, default=None,
                        help="person-detector run directory (detect.train "
                        "output): requests may then omit 'boxes' and the "
                        "server detects people itself (standalone mode; "
                        "the response carries the boxes used)")
    parser.add_argument("--detector-threshold", type=float, default=0.3)
    parser.add_argument("--ema", action="store_true")
    parser.add_argument("--warmup", action="store_true",
                        help="compile every (bucket, frame-count) program "
                        "before accepting traffic (avoids compile storms "
                        "under load; adds startup time)")
    args = parser.parse_args(argv)
    if (not args.checkpoint and not args.bundle and not args.bottomup
            and not args.fused):
        parser.error(
            "need at least one --checkpoint / --bundle / --bottomup "
            "/ --fused"
        )

    # Graceful stop on SIGTERM (orchestrators send it; also the only
    # reliable stop for `&`-launched processes, whose SIGINT is SIG_IGN in
    # non-interactive shells) — same preemption contract as the train
    # loop's checkpoint-and-exit. Installed BEFORE model loading so a stop
    # during the (possibly ~30 s) startup also exits promptly.
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)

    multi = (
        len(args.checkpoint) + len(args.bundle) + len(args.bottomup)
        + len(args.fused) > 1
    )

    def parse_named(entries, prefix):
        out = []
        for i, e in enumerate(entries):
            name, _, path = e.rpartition("=")
            if not name:
                name = f"{prefix}{i}" if multi else "default"
            out.append((name, Path(path)))
        return out

    cli_frame_shape = tuple(int(v) for v in args.frame_shape.split(","))
    batchers: dict[str, MicroBatcher] = {}

    # Loaded up front: live --fused models compose with it, and the
    # handler's standalone (boxes-omitted top-down) path uses it.
    detector = None
    if args.detector is not None:
        from probpose_pytorch_tpu.detect.train import load_detector

        det_dir = args.detector
        if (det_dir / "checkpoints").exists():
            det_dir = det_dir / "checkpoints"
        detector = load_detector(
            det_dir, score_threshold=args.detector_threshold,
            # shared by the classic standalone path (its default ceiling)
            # and live --fused composition (which slices its max_people)
            max_detections=max(args.max_people, 64),
        )
        print(f"detector: {det_dir} (threshold {args.detector_threshold})")

    def add(name, runner, buckets, frame_shape, indexed):
        if args.buckets:
            buckets = tuple(int(b) for b in args.buckets.split(","))
        if name in batchers:
            raise ValueError(f"duplicate model name {name!r}")
        batchers[name] = MicroBatcher(
            runner, buckets, frame_shape,
            max_wait_ms=args.max_wait_ms,
            indexed=indexed,
        )
        print(
            f"model {name!r}: buckets {tuple(buckets)}, frame "
            f"{tuple(frame_shape)}, indexed={indexed}"
        )

    for name, path in parse_named(args.bundle, "bundle"):
        from probpose_pytorch_tpu.serve.export import ServingBundle

        bundle = ServingBundle.load(path)
        add(name, bundle, bundle.buckets, bundle.frame_shape,
            bool(bundle.indexed_buckets))
    for name, path in parse_named(args.checkpoint, "model"):
        from probpose_pytorch_tpu.inference import (
            load_predictor,
            tuned_bucket_ladder,
            tuned_serving_batch,
        )

        predictor = load_predictor(path, args.config, ema=args.ema)
        add(name, predictor,
            tuned_bucket_ladder() or (tuned_serving_batch(),),
            cli_frame_shape, True)
    for name, path in parse_named(args.bottomup, "bottomup"):
        from probpose_pytorch_tpu.detect.train import load_bottomup

        bu = load_bottomup(
            path, score_threshold=args.detector_threshold
        )
        if hasattr(bu, "batches"):  # exported bundle: fixed shape ladder
            buckets = bu.batches
            frame_shape = bu._fit_shape(*cli_frame_shape)
        else:  # live predictor: jits per shape, any ladder works
            buckets = (1, 2, 4, 8)
            frame_shape = cli_frame_shape
        add(name, BottomUpRunner(bu), buckets, frame_shape, False)
    for name, path in parse_named(args.fused, "fused"):
        manifest = path / "manifest.json"
        if manifest.exists() and json.loads(
            manifest.read_text()
        ).get("kind") == "fused":
            from probpose_pytorch_tpu.serve.export import FusedBundle

            fb = FusedBundle.load(path)
            add(name, FusedRunner(fb), fb.batches,
                fb._fit_shape(*cli_frame_shape), False)
            continue
        if detector is None:
            parser.error(
                f"--fused {path}: not a fused bundle, so it must be a "
                "pose checkpoint composed live — pass --detector too"
            )
        if hasattr(detector, "batches"):
            parser.error(
                "live --fused composition needs a live --detector "
                "checkpoint (exported detector bundles are "
                "already-lowered programs)"
            )
        from probpose_pytorch_tpu.detect.fused import FusedTwoStagePredictor
        from probpose_pytorch_tpu.inference import load_predictor

        pose = load_predictor(path, args.config, ema=args.ema)
        fp = FusedTwoStagePredictor(
            detector=detector, pose=pose, max_people=args.max_people,
            score_threshold=args.detector_threshold,
        )
        add(name, FusedRunner(fp), (1, 2, 4), cli_frame_shape, False)

    if args.warmup:
        t0 = time.perf_counter()
        n = sum(mb.warmup(verbose=True) for mb in batchers.values())
        print(
            f"warmed {n} programs in {time.perf_counter() - t0:.1f}s"
        )
    server = PoseHTTPServer(batchers, args.host, args.port,
                            detector=detector)
    print(
        f"serving {sorted(batchers)} on {args.host}:{server.port} "
        f"(wait {args.max_wait_ms} ms)"
    )

    try:
        server.serve_forever()
    except KeyboardInterrupt:
        t0 = time.perf_counter()
        server.shutdown()
        print(f"shut down in {time.perf_counter() - t0:.2f}s "
              "(remaining wait is device-client teardown)", flush=True)


if __name__ == "__main__":
    main()
