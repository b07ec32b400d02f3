"""Serving server: micro-batching core and the HTTP front end.

The MicroBatcher must coalesce concurrent requests into bucket-size
dispatches without corrupting per-request results (order, padding strip,
splitting); the HTTP layer must round-trip the JSON+base64 protocol.
"""

import base64
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from probpose_pytorch_tpu.serve.server import MicroBatcher, PoseHTTPServer


class EchoRunner:
    """Identifies every crop row in the output so tests can check that
    batching/padding/splitting never mixes rows up."""

    def __init__(self, buckets):
        self.buckets = set(buckets)
        self.calls = []

    def __call__(self, frames, boxes):
        assert len(frames) == len(boxes)
        assert len(frames) in self.buckets, (
            f"dispatch size {len(frames)} not an allowed bucket"
        )
        self.calls.append(len(frames))
        return {
            "echo_box": np.asarray(boxes, np.float32).copy(),
            "frame_mean": frames.reshape(len(frames), -1).astype(
                np.float64
            ).mean(axis=1),
        }


def _frame(seed, h=16, w=16):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


class TestMicroBatcher:
    def test_single_request_pads_and_strips(self):
        runner = EchoRunner({4})
        mb = MicroBatcher(runner, (4,), (16, 16), max_wait_ms=0)
        try:
            boxes = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], np.float32)
            out = mb.submit(_frame(0), boxes).result(timeout=10)
            np.testing.assert_array_equal(out["echo_box"], boxes)
            assert out["echo_box"].shape == (2, 4)  # padding stripped
            assert runner.calls == [4]
        finally:
            mb.close()

    def test_concurrent_requests_coalesce(self):
        runner = EchoRunner({1, 8})
        mb = MicroBatcher(runner, (1, 8), (16, 16), max_wait_ms=50)
        try:
            boxes = [
                np.array([[i, i, 10, 10]], np.float32) for i in range(6)
            ]
            futs = [
                mb.submit(_frame(i), boxes[i]) for i in range(6)
            ]
            outs = [f.result(timeout=10) for f in futs]
            for i, out in enumerate(outs):
                np.testing.assert_array_equal(out["echo_box"], boxes[i])
                # each crop carried its own request's frame
                np.testing.assert_allclose(
                    out["frame_mean"][0],
                    _frame(i).astype(np.float64).mean(),
                )
            assert len(runner.calls) < 6, (
                f"no coalescing happened: {runner.calls}"
            )
        finally:
            mb.close()

    def test_oversized_request_splits(self):
        runner = EchoRunner({4})
        mb = MicroBatcher(runner, (4,), (16, 16), max_wait_ms=0)
        try:
            boxes = np.arange(10 * 4, dtype=np.float32).reshape(10, 4)
            out = mb.submit(_frame(3), boxes).result(timeout=10)
            np.testing.assert_array_equal(out["echo_box"], boxes)
            assert runner.calls == [4, 4, 4]
        finally:
            mb.close()

    def test_empty_boxes(self):
        runner = EchoRunner({2})
        mb = MicroBatcher(runner, (2,), (16, 16), max_wait_ms=0)
        try:
            out = mb.submit(
                _frame(4), np.zeros((0, 4), np.float32)
            ).result(timeout=10)
            assert out == {}
            assert runner.calls == []
        finally:
            mb.close()

    def test_runner_error_propagates(self):
        def broken(frames, boxes):
            raise RuntimeError("chip on fire")

        mb = MicroBatcher(broken, (2,), (16, 16), max_wait_ms=0)
        try:
            fut = mb.submit(_frame(5), np.ones((1, 4), np.float32))
            with pytest.raises(RuntimeError, match="chip on fire"):
                fut.result(timeout=10)
        finally:
            mb.close()

    def test_oversized_frame_rejected(self):
        mb = MicroBatcher(EchoRunner({2}), (2,), (16, 16), max_wait_ms=0)
        try:
            with pytest.raises(ValueError, match="exceeds"):
                mb.submit(_frame(6, h=17), np.ones((1, 4), np.float32))
        finally:
            mb.close()

    def test_stats(self):
        runner = EchoRunner({2})
        mb = MicroBatcher(runner, (2,), (16, 16), max_wait_ms=0)
        try:
            mb.submit(_frame(7), np.ones((2, 4), np.float32)).result(
                timeout=10
            )
            s = mb.stats_snapshot()
            assert s["requests"] == 1 and s["crops"] == 2
            assert s["dispatches"] == 1
            assert s["latency_ms"]["p50"] > 0
        finally:
            mb.close()

    def test_closed_rejects(self):
        mb = MicroBatcher(EchoRunner({2}), (2,), (16, 16), max_wait_ms=0)
        mb.close()
        with pytest.raises(RuntimeError, match="closed"):
            mb.submit(_frame(8), np.ones((1, 4), np.float32))

    def test_indexed_mode_deduplicates_frames(self):
        """indexed=True: the runner receives each request's frame ONCE
        plus frame_ids mapping crops to frames — and results still come
        back per request, rows intact."""
        calls = []

        def runner(frames, boxes, frame_ids):
            assert len(boxes) == len(frame_ids)
            assert frames.shape[0] & (frames.shape[0] - 1) == 0  # pow2
            assert frames.shape[0] < len(boxes)  # deduplicated
            calls.append((frames.shape[0], len(boxes)))
            per_crop = frames[frame_ids]
            return {
                "echo_box": np.asarray(boxes, np.float32).copy(),
                "frame_mean": per_crop.reshape(
                    len(per_crop), -1
                ).astype(np.float64).mean(axis=1),
            }

        mb = MicroBatcher(runner, (8,), (16, 16), max_wait_ms=50,
                          indexed=True)
        try:
            boxes = [
                np.array([[i, i, 10, 10], [i, i, 5, 5]], np.float32)
                for i in range(3)
            ]
            futs = [mb.submit(_frame(10 + i), boxes[i]) for i in range(3)]
            outs = [f.result(timeout=10) for f in futs]
            for i, out in enumerate(outs):
                np.testing.assert_array_equal(out["echo_box"], boxes[i])
                np.testing.assert_allclose(
                    out["frame_mean"],
                    np.full(2, _frame(10 + i).astype(np.float64).mean()),
                )
            assert calls, "runner never invoked"
        finally:
            mb.close()


@pytest.fixture(scope="module")
def http_env():
    """A live PoseHTTPServer over a real tiny predictor on an OS-assigned
    port; yields (server, base_url, predictor)."""
    from probpose_pytorch_tpu.inference import TopDownPredictor
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.models.vit import ViTConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer

    ViTConfig.PRESETS.setdefault(
        "vit-tiny-e2e",
        dict(embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
    )
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), num_keypoints=5, backbone="vit-tiny-e2e",
            compute_dtype="float32", deconv_out_channels=(16, 16),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        out_dir="/tmp/server-test-run",
    )
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    predictor = TopDownPredictor(
        model=trainer.model,
        variables={
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        },
        codec=trainer.encode_codec,
        input_size=cfg.model.img_size,
    )
    batcher = MicroBatcher(
        predictor, (1, 4), (64, 64), max_wait_ms=2.0, indexed=True
    )
    server = PoseHTTPServer(batcher, host="127.0.0.1", port=0)
    server.start()
    try:
        yield server, f"http://127.0.0.1:{server.port}", predictor
    finally:
        server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestHTTP:
    def test_healthz_and_stats(self, http_env):
        _, base, _ = http_env
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read()) == {"ok": True}
        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            s = json.loads(r.read())
        assert "requests" in s

    def test_prometheus_metrics(self, http_env):
        _, base, _ = http_env
        rng = np.random.default_rng(9)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        _post(base + "/predict", {
            "frame_b64": base64.b64encode(frame.tobytes()).decode(),
            "shape": [64, 64, 3],
            "boxes": [[0.0, 0.0, 30.0, 30.0]],
        })
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            assert "text/plain" in r.headers["Content-Type"]
            text = r.read().decode()
        assert 'pose_requests_total{model="default"}' in text
        assert 'pose_request_latency_ms{model="default",quantile="0.5"}' in (
            text
        )

    def test_predict_matches_direct(self, http_env):
        _, base, predictor = http_env
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (60, 62, 3), dtype=np.uint8)
        boxes = [[2.0, 3.0, 30.0, 40.0], [10.0, 5.0, 25.0, 35.0]]
        status, out = _post(base + "/predict", {
            "frame_b64": base64.b64encode(frame.tobytes()).decode(),
            "shape": list(frame.shape),
            "boxes": boxes,
        })
        assert status == 200
        # direct reference: pad the frame like the server does
        padded = np.pad(frame, ((0, 4), (0, 2), (0, 0)))
        direct = predictor(
            np.stack([padded, padded]), np.asarray(boxes, np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(out["keypoints"]), direct["keypoints"],
            rtol=1e-5, atol=1e-5,
        )

    def test_concurrent_http_batching(self, http_env):
        server, base, _ = http_env
        rng = np.random.default_rng(1)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        payload = {
            "frame_b64": base64.b64encode(frame.tobytes()).decode(),
            "shape": [64, 64, 3],
            "boxes": [[0.0, 0.0, 30.0, 30.0]],
        }
        results = [None] * 4

        def worker(i):
            results[i] = _post(base + "/predict", payload)

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        ref = None
        for status, out in results:
            assert status == 200
            kp = np.asarray(out["keypoints"])
            assert kp.shape == (1, 5, 2)
            if ref is None:
                ref = kp
            else:
                np.testing.assert_allclose(kp, ref, rtol=1e-5, atol=1e-5)

    def test_bad_request_400(self, http_env):
        _, base, _ = http_env
        status, out = _post(base + "/predict", {
            "frame_b64": base64.b64encode(b"abc").decode(),
            "shape": [64, 64, 3],
            "boxes": [[0, 0, 1, 1]],
        })
        assert status == 400 and "error" in out

    def test_oversized_frame_400_not_500(self, http_env):
        """A frame larger than the server frame shape is the CLIENT's
        mistake: the synchronous ValueError from submit() must map to 400,
        not be lumped with genuine server faults as 500."""
        _, base, _ = http_env
        big = np.zeros((128, 128, 3), np.uint8)
        status, out = _post(base + "/predict", {
            "frame_b64": base64.b64encode(big.tobytes()).decode(),
            "shape": [128, 128, 3],
            "boxes": [[0, 0, 10, 10]],
        })
        assert status == 400 and "exceeds" in out["error"]

    def test_unknown_path_404(self, http_env):
        _, base, _ = http_env
        status, out = _post(base + "/nope", {})
        assert status == 404

    def test_omitted_boxes_without_detector_400(self, http_env):
        _, base, _ = http_env
        frame = _frame(3, 64, 64)
        status, out = _post(base + "/predict", {
            "frame_b64": base64.b64encode(frame.tobytes()).decode(),
            "shape": list(frame.shape),
        })
        assert status == 400 and "detector" in out["error"]


class TestHTTPDetector:
    def test_standalone_mode(self, http_env):
        """A server configured with a detector serves requests that omit
        'boxes': the response carries the auto-detected (aspect-expanded)
        boxes plus the pose fields; an empty detection returns boxes=[]."""
        _, _, predictor = http_env

        calls = []

        class FakeDetector:
            def detect_frame(self, frame, thr=None):
                calls.append(thr)
                if thr is not None and thr > 1.0:
                    return (np.zeros((0, 4), np.float32),
                            np.zeros((0,), np.float32))
                return (
                    np.array([[8.0, 8.0, 24.0, 24.0],
                              [30.0, 20.0, 20.0, 28.0]], np.float32),
                    np.array([0.9, 0.7], np.float32),
                )

        batcher = MicroBatcher(
            predictor, (1, 4), (64, 64), max_wait_ms=0, indexed=True
        )
        server = PoseHTTPServer(
            batcher, host="127.0.0.1", port=0, detector=FakeDetector()
        )
        server.start()
        try:
            base = f"http://127.0.0.1:{server.port}"
            frame = _frame(7, 64, 64)
            payload = {
                "frame_b64": base64.b64encode(frame.tobytes()).decode(),
                "shape": list(frame.shape),
            }
            status, out = _post(base + "/predict", payload)
            assert status == 200, out
            assert len(out["boxes"]) == 2
            assert len(out["keypoints"]) == 2
            # boxes were expanded to the pose crop aspect
            H, W = predictor.input_size
            for b in out["boxes"]:
                assert abs(b[2] / b[3] - W / H) < 1e-5
            # explicit-boxes requests still work on the same server
            status, out2 = _post(base + "/predict", dict(
                payload, boxes=[[0.0, 0.0, 32.0, 32.0]],
            ))
            assert status == 200 and "boxes" not in out2
            assert len(out2["keypoints"]) == 1
            # detector_threshold plumbs through; empty detection -> []
            status, out3 = _post(base + "/predict", dict(
                payload, detector_threshold=2.0,
            ))
            assert status == 200 and out3["boxes"] == []
            assert calls == [None, 2.0]
        finally:
            server.shutdown()


def test_warmup_compiles_all_programs():
    """warmup() touches every (bucket, frame-count) combination once; after
    it, any request mix dispatches without new program shapes."""
    shapes = set()

    def runner(frames, boxes, frame_ids):
        shapes.add((frames.shape[0], len(boxes)))
        return {"echo_box": np.asarray(boxes, np.float32).copy()}

    mb = MicroBatcher(runner, (1, 4), (16, 16), max_wait_ms=0, indexed=True)
    try:
        n = mb.warmup()
        assert n == 1 + 3  # bucket 1 (f=1); bucket 4 (f=1,2,4)
        warm = set(shapes)
        assert (2, 4) in warm and (4, 4) in warm and (1, 4) in warm
        # a mixed request load only reuses warmed shapes
        futs = [
            mb.submit(_frame(20 + i), np.ones((1, 4), np.float32))
            for i in range(3)
        ]
        [f.result(timeout=10) for f in futs]
        assert shapes == warm, f"new shapes appeared: {shapes - warm}"
    finally:
        mb.close()


def test_multi_model_routing():
    """Two models behind one server: requests route with the JSON "model"
    field; unknown names 404; /models lists; /stats keys per model."""
    a = EchoRunner({2})
    b_runner = EchoRunner({2})

    def tag(runner, tag_val):
        def run(frames, boxes):
            out = runner(frames, boxes)
            out["tag"] = np.full((len(boxes),), tag_val, np.float32)
            return out
        return run

    mba = MicroBatcher(tag(a, 1.0), (2,), (16, 16), max_wait_ms=0)
    mbb = MicroBatcher(tag(b_runner, 2.0), (2,), (16, 16), max_wait_ms=0)
    srv = PoseHTTPServer({"small": mba, "big": mbb}, host="127.0.0.1",
                         port=0, default="small")
    srv.start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        frame = _frame(30)
        payload = {
            "frame_b64": base64.b64encode(frame.tobytes()).decode(),
            "shape": [16, 16, 3],
            "boxes": [[0.0, 0.0, 8.0, 8.0]],
        }
        status, out = _post(base + "/predict", payload)
        assert status == 200 and out["tag"] == [1.0]  # default = small
        status, out = _post(base + "/predict",
                            payload | {"model": "big"})
        assert status == 200 and out["tag"] == [2.0]
        status, out = _post(base + "/predict",
                            payload | {"model": "nope"})
        assert status == 404 and "unknown model" in out["error"]
        with urllib.request.urlopen(base + "/models", timeout=30) as r:
            models = json.loads(r.read())
        assert models == {"models": ["big", "small"], "default": "small"}
        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert set(stats) == {"small", "big"}
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            text = r.read().decode()
        assert 'pose_requests_total{model="big"}' in text
    finally:
        srv.shutdown()


def test_close_during_coalescing_window_is_prompt():
    """close() must terminate the dispatcher even when it lands inside the
    coalescing window: the dispatcher's _wake.clear() used to swallow the
    close signal, leaving the thread parked in wait() forever and close()
    eating its full 10 s join timeout (regression: wake-clear race)."""
    mb = MicroBatcher(EchoRunner({4}), (4,), (16, 16), max_wait_ms=500)
    fut = mb.submit(_frame(0), np.ones((1, 4), np.float32))
    time.sleep(0.05)  # dispatcher is inside the 500 ms coalescing window
    t0 = time.perf_counter()
    mb.close()
    assert time.perf_counter() - t0 < 5, "close() hit the join timeout"
    assert not mb._thread.is_alive()
    # the pending request fails cleanly instead of hanging
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=1)


class TestHTTPBottomUp:
    """Single-stage pose over HTTP: whole frames in, thresholded poses
    out, no 'boxes' field (rejected if present)."""

    @pytest.fixture(scope="class")
    def bu_http(self):
        from probpose_pytorch_tpu.detect.pipeline import BottomUpPredictor
        from probpose_pytorch_tpu.detect.train import DetectorTrainer
        from probpose_pytorch_tpu.serve.server import BottomUpRunner

        trainer = DetectorTrainer.create(
            img_size=(64, 64), preset="conv-t", total_steps=1,
            num_keypoints=5,
        )
        predictor = BottomUpPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            score_threshold=0.0,
            max_detections=4,
        )
        mb = MicroBatcher(
            BottomUpRunner(predictor), (1, 2), (64, 64), max_wait_ms=0
        )
        server = PoseHTTPServer({"pose": mb}, host="127.0.0.1", port=0)
        server.start()
        try:
            yield server, f"http://127.0.0.1:{server.port}", predictor
        finally:
            server.shutdown()

    def _payload(self, frame):
        return {
            "frame_b64": base64.b64encode(frame.tobytes()).decode(),
            "shape": list(frame.shape),
        }

    def test_frame_only_request_matches_direct(self, bu_http):
        _, base, predictor = bu_http
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        code, out = _post(base + "/predict", self._payload(frame))
        assert code == 200, out
        # the batcher pads the frame to the 64x64 server shape; the live
        # predictor on the padded frame is the ground truth
        padded = np.pad(frame, ((0, 16), (0, 0), (0, 0)))
        ref = predictor.predict_frame(padded)
        np.testing.assert_allclose(
            np.asarray(out["keypoints"], np.float32),
            ref["keypoints"], atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["scores"], np.float32), ref["scores"],
            atol=1e-5,
        )
        assert np.asarray(out["boxes"]).shape == ref["boxes"].shape

    def test_boxes_field_rejected(self, bu_http):
        _, base, _ = bu_http
        frame = np.zeros((64, 64, 3), np.uint8)
        payload = self._payload(frame)
        payload["boxes"] = [[0, 0, 10, 10]]
        code, out = _post(base + "/predict", payload)
        assert code == 400
        assert "bottom-up" in out["error"]

    def test_score_threshold_filters(self, bu_http):
        _, base, _ = bu_http
        frame = np.zeros((64, 64, 3), np.uint8)
        payload = self._payload(frame)
        payload["score_threshold"] = 2.0
        code, out = _post(base + "/predict", payload)
        assert code == 200
        assert out["keypoints"] == [] and out["scores"] == []

    def test_concurrent_requests_batch(self, bu_http):
        """Concurrent frame requests coalesce into multi-frame dispatches
        without mixing rows up (each frame's result equals its solo run)."""
        server, base, predictor = bu_http
        rng = np.random.default_rng(1)
        frames = [
            rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            for _ in range(4)
        ]
        # re-enable coalescing for this test
        mb = server.batchers["pose"]
        mb.max_wait_ms = 20.0
        try:
            results = [None] * 4

            def call(i):
                results[i] = _post(
                    base + "/predict", self._payload(frames[i])
                )

            threads = [
                threading.Thread(target=call, args=(i,)) for i in range(4)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
        finally:
            mb.max_wait_ms = 0.0
        for i, (code, out) in enumerate(results):
            assert code == 200, out
            ref = predictor.predict_frame(frames[i])
            # batch-2 dispatches compile a different XLA tiling than the
            # solo batch-1 reference; decoded coords agree to well under a
            # twentieth of a pixel, not bit-exactly
            np.testing.assert_allclose(
                np.asarray(out["keypoints"], np.float32),
                ref["keypoints"], atol=0.05,
            )


class TestHTTPFused:
    """Fused two-stage over HTTP: whole frames in, detector -> crops ->
    pose in one dispatch, rows thresholded on det_scores."""

    @pytest.fixture(scope="class")
    def fused_http(self):
        import jax
        import jax.numpy as jnp

        from probpose_pytorch_tpu.detect import (
            DetectorPredictor,
            FusedTwoStagePredictor,
            PersonDetector,
        )
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.serve.server import FusedRunner
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        det_model = PersonDetector(img_size=(64, 64), preset="conv-t")
        det_vars = det_model.init(
            jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 3)), train=False
        )
        detector = DetectorPredictor(
            model=det_model, variables=det_vars, max_detections=4
        )
        ViTConfig.PRESETS.setdefault(
            "vit-tiny-eval",
            dict(embed_dim=16, depth=1, num_heads=2, mlp_ratio=2.0),
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48), num_keypoints=5,
                backbone="vit-tiny-eval", compute_dtype="float32",
                deconv_out_channels=(8, 8), deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)), normalize=1.0,
            ),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        pose = TopDownPredictor(
            model=trainer.model,
            variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            codec=trainer.encode_codec,
            input_size=cfg.model.img_size,
        )
        predictor = FusedTwoStagePredictor(
            detector=detector, pose=pose, max_people=3,
            score_threshold=-1.0,  # untrained: keep every slot
        )
        mb = MicroBatcher(
            FusedRunner(predictor), (1, 2), (64, 64), max_wait_ms=0
        )
        server = PoseHTTPServer({"pose": mb}, host="127.0.0.1", port=0)
        server.start()
        try:
            yield server, f"http://127.0.0.1:{server.port}", predictor
        finally:
            server.shutdown()

    def _payload(self, frame):
        return {
            "frame_b64": base64.b64encode(frame.tobytes()).decode(),
            "shape": list(frame.shape),
        }

    def test_frame_request_matches_direct(self, fused_http):
        _, base, predictor = fused_http
        rng = np.random.default_rng(2)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        code, out = _post(base + "/predict", self._payload(frame))
        assert code == 200, out
        ref = predictor.predict_frame(frame)
        assert len(out["keypoints"]) == 3  # every slot kept at thr=-1
        np.testing.assert_allclose(
            np.asarray(out["keypoints"], np.float32),
            ref["keypoints"], atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["det_scores"], np.float32),
            ref["det_scores"], atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["boxes"], np.float32), ref["boxes"], atol=1e-3
        )

    def test_boxes_field_rejected(self, fused_http):
        _, base, _ = fused_http
        frame = np.zeros((64, 64, 3), np.uint8)
        payload = self._payload(frame)
        payload["boxes"] = [[0, 0, 10, 10]]
        code, out = _post(base + "/predict", payload)
        assert code == 400
        assert "fused two-stage" in out["error"]

    def test_score_threshold_filters(self, fused_http):
        _, base, _ = fused_http
        frame = np.zeros((64, 64, 3), np.uint8)
        payload = self._payload(frame)
        payload["score_threshold"] = 2.0
        code, out = _post(base + "/predict", payload)
        assert code == 200
        assert out["keypoints"] == [] and out["det_scores"] == []
