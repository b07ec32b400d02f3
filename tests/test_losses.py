"""Loss parity tests against hand-computed NumPy oracles.

Supersedes the intent of the reference's tests/test_loss.py (which always
raised to print a value) with actual assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.codec import ArgMaxProbMap, Codec
from probpose_pytorch_tpu.losses import (
    ProbPoseLoss,
    balanced_binary_accuracy,
    binary_cross_entropy,
    l1_log_loss,
    masked_mae,
    mse_loss,
    oks_heatmap_loss,
    pose_pck_accuracy,
)

from oracles import numpy_probmaps


def _np_sobel_grad_sq(x):
    kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
    ky = kx.T
    B, K, H, W = x.shape
    pad = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    gx = np.zeros_like(x)
    gy = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            gx += kx[dy, dx] * pad[:, :, dy : dy + H, dx : dx + W]
            gy += ky[dy, dx] * pad[:, :, dy : dy + H, dx : dx + W]
    return gx**2 + gy**2


class TestOKSHeatmapLoss:
    def setup_method(self, _):
        rng = np.random.default_rng(0)
        self.out = rng.random((2, 4, 16, 12), dtype=np.float32)
        self.tgt = rng.random((2, 4, 16, 12), dtype=np.float32)
        self.w = (rng.random((2, 4)) > 0.3).astype(np.float32)

    def test_default_reduction(self):
        loss = oks_heatmap_loss(
            jnp.asarray(self.out),
            jnp.asarray(self.tgt),
            jnp.asarray(self.w),
            smoothing_weight=0.05,
        )
        grad = _np_sobel_grad_sq(self.out) * self.w[:, :, None, None]
        oks = (self.out * (1 - self.tgt)) * self.w[:, :, None, None]
        ref = (
            0.95 * oks.sum((2, 3)) + 0.05 * grad.reshape(2, 4, -1).max(-1)
        ).mean()
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_per_pixel_and_oks_types(self):
        for oks_type, term in [
            ("minus", self.out * (1 - self.tgt)),
            ("plus", (1 - self.out) * self.tgt),
            ("both", (self.out * (1 - self.tgt) + (1 - self.out) * self.tgt) / 2),
        ]:
            loss = oks_heatmap_loss(
                jnp.asarray(self.out),
                jnp.asarray(self.tgt),
                jnp.asarray(self.w),
                oks_type=oks_type,
                smoothing_weight=0.1,
                gaussian_weight=0.2,
                per_pixel=True,
            )
            mask = self.w[:, :, None, None]
            ref = (
                0.1 * _np_sobel_grad_sq(self.out) * mask
                + 0.7 * term * mask
                + 0.2 * ((self.out - self.tgt) ** 2) * mask
            )
            np.testing.assert_allclose(np.asarray(loss), ref, rtol=1e-4, atol=1e-6)

    def test_skip_empty_channel(self):
        tgt = self.tgt.copy()
        tgt[0, 1] = 0.0
        loss = oks_heatmap_loss(
            jnp.asarray(self.out),
            jnp.asarray(tgt),
            skip_empty_channel=True,
            smoothing_weight=0.0,
            per_pixel=True,
        )
        assert np.asarray(loss)[0, 1].max() == 0.0


class TestSimpleLosses:
    def test_bce_from_probs(self):
        p = np.array([[0.9, 0.2], [0.5, 0.99]], np.float32)
        t = np.array([[1.0, 0.0], [1.0, 0.0]], np.float32)
        ref = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
        np.testing.assert_allclose(
            float(binary_cross_entropy(jnp.asarray(p), jnp.asarray(t), from_probs=True)),
            ref,
            rtol=1e-6,
        )

    def test_bce_saturated_probs_finite_value_and_grad(self):
        """p exactly 0.0 / 1.0 (a saturated sigmoid reaches them in f32)
        must give finite loss AND finite gradients — regression for a
        train-killing NaN: the old 1e-12 clip was a no-op near 1.0 in f32
        (1 - 1e-12 rounds to 1.0), so log(1-p) = -inf and 0 * -inf = NaN.
        torch's F.binary_cross_entropy (the reference's BCELoss backend)
        clamps its logs at -100; we mirror by clipping p to
        f32-representable (normal, unflushed) bounds."""

        p = np.array([[1.0, 1.0, 0.0, 0.0, 0.5]], np.float32)
        t = np.array([[1.0, 0.0, 0.0, 1.0, 1.0]], np.float32)

        def f(p_):
            return binary_cross_entropy(p_, jnp.asarray(t), from_probs=True)

        val = float(f(jnp.asarray(p)))
        assert np.isfinite(val), val
        g = np.asarray(jax.grad(f)(jnp.asarray(p)))
        assert np.isfinite(g).all(), g
        # matched-saturation entries contribute ~0; mismatched ones are
        # large (about the torch -100 clamp) but finite
        per = -(
            t * np.log(np.clip(p, 1.1754944e-38, 1 - 6e-8))
            + (1 - t) * np.log1p(-np.clip(p, 1.1754944e-38, 1 - 6e-8))
        )
        assert per[0, 0] < 1e-6 and per[0, 2] < 1e-6
        assert 15.0 < per[0, 1] < 101.0 and 80.0 < per[0, 3] < 101.0

    def test_bce_saturated_matches_torch(self):
        """Value parity with the reference's BCELoss backend at and near
        saturation."""
        torch = pytest.importorskip("torch")

        p = np.array(
            [[1.0, 0.0, 1e-7, 1 - 1e-7, 0.3, 0.999999]], np.float32
        )
        t = np.array([[1.0, 0.0, 1.0, 0.0, 1.0, 0.0]], np.float32)
        ours = float(
            binary_cross_entropy(jnp.asarray(p), jnp.asarray(t),
                                 from_probs=True)
        )
        want = float(
            torch.nn.functional.binary_cross_entropy(
                torch.from_numpy(p), torch.from_numpy(t)
            )
        )
        # saturated mismatches floor differently (torch -100 vs our
        # representable-clip ~-16.6/-100) but there are none here; interior
        # values must match tightly
        np.testing.assert_allclose(ours, want, rtol=1e-4)

    def test_bce_from_logits_matches_sigmoid_path(self):
        z = np.array([[2.0, -3.0, 0.0]], np.float32)
        t = np.array([[1.0, 0.0, 1.0]], np.float32)
        p = 1 / (1 + np.exp(-z))
        ref = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
        np.testing.assert_allclose(
            float(binary_cross_entropy(jnp.asarray(z), jnp.asarray(t))),
            ref,
            rtol=1e-6,
        )

    def test_mse_with_weight(self):
        rng = np.random.default_rng(1)
        o, t = rng.random((3, 5)).astype(np.float32), rng.random((3, 5)).astype(np.float32)
        w = (rng.random((3, 5)) > 0.5).astype(np.float32)
        ref = (((o * w) - (t * w)) ** 2).mean()
        np.testing.assert_allclose(
            float(mse_loss(jnp.asarray(o), jnp.asarray(t), jnp.asarray(w))),
            ref,
            rtol=1e-6,
        )

    def test_l1log(self):
        o = np.array([[0.0, 1.0, 10.0]], np.float32)
        t = np.array([[0.5, 1.0, 0.0]], np.float32)
        d = np.log1p(o) - np.log1p(t)
        ref = np.where(np.abs(d) < 1, 0.5 * d**2, np.abs(d) - 0.5).mean()
        np.testing.assert_allclose(
            float(l1_log_loss(jnp.asarray(o), jnp.asarray(t))), ref, rtol=1e-6
        )


class TestMetrics:
    def test_pck_perfect_and_shifted(self):
        K = 4
        kpts = np.array([[[10, 12], [30, 8], [20, 40], [5, 5]]], np.float32)
        maps, _ = numpy_probmaps((48, 64), kpts, np.ones((1, K)), np.full(K, 0.05), 2.0)
        _, avg, cnt = pose_pck_accuracy(
            jnp.asarray(maps), jnp.asarray(maps), jnp.ones((1, K), bool)
        )
        assert float(avg) == 1.0 and int(cnt) == K

        shifted = np.roll(maps, 30, axis=-1)  # 30px >> thr*norm
        _, avg, _ = pose_pck_accuracy(
            jnp.asarray(shifted), jnp.asarray(maps), jnp.ones((1, K), bool)
        )
        assert float(avg) < 0.6

    def test_balanced_accuracy_separable(self):
        dt = jnp.asarray([[0.9, 0.8, 0.1, 0.2]])
        gt = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        acc, thr = balanced_binary_accuracy(dt, gt, jnp.ones((1, 4), bool))
        assert float(acc) == 1.0
        assert 0.2 < float(thr) < 0.8

    def test_balanced_accuracy_degenerate_class(self):
        acc, _ = balanced_binary_accuracy(
            jnp.asarray([[0.9, 0.8]]),
            jnp.asarray([[1.0, 1.0]]),
            jnp.ones((1, 2), bool),
        )
        assert float(acc) == 0.0

    def test_masked_mae(self):
        dt = jnp.asarray([[1.0, 2.0, 3.0]])
        gt = jnp.asarray([[1.5, 2.0, 0.0]])
        m = jnp.asarray([[True, True, False]])
        np.testing.assert_allclose(float(masked_mae(dt, gt, m)), 0.25)


class TestProbPoseLoss:
    def _setup(self, freeze_error=True, freeze_oks=False):
        K = 6
        am = ArgMaxProbMap((384, 384), (96, 96), sigmas=np.full(K, 0.05))
        codec = Codec(am)
        loss_fn = ProbPoseLoss(codec, freeze_error=freeze_error, freeze_oks=freeze_oks)
        rng = np.random.default_rng(7)
        B = 3
        kpts = rng.uniform(30, 350, (B, K, 2)).astype(np.float32)
        vis = (rng.random((B, K)) > 0.2).astype(np.float32)
        enc = am.encode(kpts, vis)
        gt = dict(
            heatmaps=enc["heatmaps"],
            in_image=enc["in_image"],
            keypoints_visible=vis,
            keypoints_visibility=vis,
        )
        pred = (
            jnp.asarray(
                np.clip(
                    np.asarray(enc["heatmaps"])
                    + 0.05 * rng.random((B, K, 96, 96), dtype=np.float32),
                    0,
                    1,
                )
            ),
            jnp.asarray(rng.random((B, K, 1, 1), dtype=np.float32)),
            jnp.asarray(rng.random((B, K, 1, 1), dtype=np.float32)),
            jnp.asarray(rng.random((B, K, 1, 1), dtype=np.float32)),
            jnp.asarray(rng.random((B, K, 1, 1), dtype=np.float32)),
        )
        return loss_fn, gt, pred

    def test_losses_finite_and_jittable(self):
        loss_fn, gt, pred = self._setup()
        losses = jax.jit(lambda g, p: loss_fn(g, p))(gt, pred)
        assert set(losses) == {"kpt", "probability", "visibility", "oks", "error"}
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        # freeze_error=True -> error target is zeros
        assert float(losses["error"]) >= 0

    def test_gt_oks_near_one_for_matching_heatmaps(self):
        """When pred heatmaps == gt heatmaps, decoded coords coincide, so the
        derived OKS target is ~1 for every valid keypoint; with dt_oks == 1
        the oks loss must be ~0."""
        loss_fn, gt, pred = self._setup()
        pred_same = (
            jnp.asarray(gt["heatmaps"]),
            pred[1],
            pred[2],
            jnp.ones_like(pred[3]),
            pred[4],
        )
        losses = loss_fn(gt, pred_same)
        valid_frac = float(
            jnp.mean((jnp.asarray(gt["in_image"]) & (jnp.asarray(gt["keypoints_visible"]) > 0)))
        )
        # oks MSE over all entries; invalid entries are zeroed on both sides.
        assert float(losses["oks"]) < 1e-4 * max(valid_frac, 0.1)

    def test_compute_acc(self):
        loss_fn, gt, pred = self._setup()
        losses, acc = jax.jit(
            lambda g, p: loss_fn(g, p, compute_acc=True)
        )(gt, pred)
        assert set(acc) == {"kpt", "probability", "visibility", "oks", "error"}
        for v in acc.values():
            assert np.isfinite(float(v))
        # Perfect prediction heatmaps give PCK 1.0
        _, acc2 = loss_fn(gt, (jnp.asarray(gt["heatmaps"]), *pred[1:]), compute_acc=True)
        assert float(acc2["kpt"]) == 1.0

    def test_error_targets_when_unfrozen(self):
        loss_fn, gt, pred = self._setup(freeze_error=False)
        losses = jax.jit(lambda g, p: loss_fn(g, p))(gt, pred)
        assert np.isfinite(float(losses["error"]))
