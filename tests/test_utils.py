"""Utils coverage: profiling timers, metrics logging, viz, prefetcher,
expected-method PCK."""

import json
import time

import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.data.pipeline import Prefetcher
from probpose_pytorch_tpu.utils.logging import MetricsLogger
from probpose_pytorch_tpu.utils.profiling import StepTimer, measure_fn_time


class TestProfiling:
    def test_measure_fn_time_positive_and_plausible(self):
        x = jnp.ones((256, 256))
        t = measure_fn_time(
            lambda a: (a @ a).mean(axis=0), x, short_n=2, long_n=10, repeats=2
        )
        assert 0 < t < 1.0

    def test_step_timer(self):
        timer = StepTimer(warmup_steps=2)
        for _ in range(5):
            timer.tick(n_items=10)
            time.sleep(0.01)
        assert timer.steps_per_sec > 0
        assert timer.items_per_sec > 0


class TestLogging:
    def test_jsonl_records(self, tmp_path):
        logger = MetricsLogger(tmp_path, tensorboard=False)
        logger.log(5, {"loss": 1.5, "acc": 0.25}, prefix="training")
        logger.close()
        rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
        assert rec["step"] == 5
        assert rec["training/loss"] == 1.5


class TestViz:
    def test_overlay_and_draw(self):
        import PIL.Image

        from probpose_pytorch_tpu.viz import draw_keypoints, overlay_heatmaps

        img = np.zeros((32, 32, 3), np.uint8)
        hm = np.zeros((2, 32, 32))
        hm[0, 10, 10] = 1.0
        out = overlay_heatmaps(img, hm)
        assert out.shape == (32, 32, 3)
        assert out[10, 10].sum() > 0
        assert out[0, 0].sum() == 0  # below-threshold stays transparent

        pil = PIL.Image.fromarray(img)
        drawn = draw_keypoints(
            pil, np.array([[16.0, 16.0], [5.0, 5.0]]),
            np.array([0.95, 0.1]),
        )
        arr = np.asarray(drawn)
        assert arr[16, 16, 0] == 255  # high-prob keypoint drawn
        assert arr[5, 5, 0] == 0  # low-prob skipped


class TestPrefetcher:
    def test_yields_all_and_propagates_errors(self):
        items = list(Prefetcher(iter(range(7)), depth=2))
        assert items == list(range(7))

        def boom():
            yield 1
            raise RuntimeError("bad batch")

        import pytest

        with pytest.raises(RuntimeError, match="bad batch"):
            list(Prefetcher(boom()))


class TestExpectedPCK:
    def test_expected_method_matches_argmax_on_clean_maps(self):
        from probpose_pytorch_tpu.losses import pose_pck_accuracy
        from probpose_pytorch_tpu.ops.heatmap import build_oks_conv_operators

        from oracles import numpy_probmaps

        rng = np.random.default_rng(0)
        K, H, W = 4, 48, 36
        kpts = rng.uniform([5, 5], [W - 6, H - 6], (2, K, 2)).astype(np.float32)
        sigmas = np.full(K, 0.05, np.float32)
        maps, _ = numpy_probmaps((W, H), kpts, np.ones((2, K)), sigmas, 2.0)
        ops = build_oks_conv_operators(sigmas, H, W)
        m = jnp.ones((2, K), bool)
        _, acc_e, _ = pose_pck_accuracy(
            jnp.asarray(maps), jnp.asarray(maps), m,
            method="expected", conv_ops=ops,
        )
        assert float(acc_e) == 1.0


def test_doctor_healthy(capsys):
    """The environment self-check passes on the test rig and prints one
    line per check."""
    from probpose_pytorch_tpu.doctor import main as doctor_main

    doctor_main([])
    out = capsys.readouterr().out
    assert "verdict: healthy" in out
    assert "jax devices" in out and "model forward" in out
