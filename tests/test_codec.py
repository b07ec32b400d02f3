"""End-to-end codec tests: encode -> decode round trips and facade semantics.

Covers BASELINE config #1 (codec encode->decode round-trip with parity) and
the reference Codec facade behavior (codec.py:242-279).
"""

import jax.numpy as jnp
import numpy as np

from probpose_pytorch_tpu.codec import ArgMaxProbMap, Codec, ProbMap

from oracles import cv2_udp_refine, numpy_argmax_decode, numpy_probmaps


def test_encode_matches_reference_schema_and_values():
    K = 5
    pm = ProbMap((384, 384), (96, 96), sigmas=np.full(K, 0.05), sigma=2.0)
    rng = np.random.default_rng(0)
    kpts = rng.uniform(-30, 420, size=(4, K, 2)).astype(np.float32)
    vis = (rng.random((4, K)) > 0.25).astype(np.float32)
    enc = pm.encode(kpts, vis)

    scale = (np.array([384.0, 384.0]) - 1) / (np.array([96.0, 96.0]) - 1)
    ref_maps, ref_w = numpy_probmaps(
        (96, 96), kpts / scale.astype(np.float32), vis, np.full(K, 0.05), 2.0
    )
    np.testing.assert_allclose(
        np.asarray(enc["heatmaps"]), ref_maps, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(enc["keypoint_weights"]), ref_w)
    ref_in = (
        (kpts[:, :, 0] >= 0)
        & (kpts[:, :, 0] < 384)
        & (kpts[:, :, 1] >= 0)
        & (kpts[:, :, 1] < 384)
    )
    np.testing.assert_array_equal(np.asarray(enc["in_image"]), ref_in)
    np.testing.assert_array_equal(np.asarray(enc["annotated"]), vis > 0)


def test_probmap_roundtrip_recovers_keypoints():
    """Encode keypoints, decode the clean target maps: recovered coordinates
    must land within one input-space pixel of the originals."""
    K = 8
    pm = ProbMap((256, 192), (64, 48), sigmas=np.full(K, 0.05), sigma=2.0)
    rng = np.random.default_rng(1)
    # Keep away from borders: subpixel refinement is skipped at edges.
    kpts = rng.uniform([24, 24], [232, 168], size=(2, K, 2)).astype(np.float32)
    enc = pm.encode(kpts, np.ones((2, K), np.float32))
    dec, scores = pm.decode(enc["heatmaps"])
    err = np.abs(np.asarray(dec) - kpts).max()
    # Heatmap stride is 4px: sub-pixel decode should do far better than 1px.
    assert err < 1.0, f"round-trip error {err}px"
    assert np.all(np.asarray(scores) > 0.9)


def test_argmax_codec_roundtrip_matches_oracle():
    K = 6
    am = ArgMaxProbMap((384, 384), (96, 96), sigmas=np.full(K, 0.05))
    rng = np.random.default_rng(2)
    kpts = rng.uniform(40, 340, size=(3, K, 2)).astype(np.float32)
    enc = am.encode(kpts, np.ones((3, K), np.float32))
    hm = np.asarray(enc["heatmaps"])

    dec, scores = am.decode(hm)

    ref_locs, ref_vals = numpy_argmax_decode(hm)
    ref = cv2_udp_refine(ref_locs, hm.copy(), 11)
    ref = ref / np.array([95.0, 95.0]) * np.array([384.0, 384.0])
    drift = np.abs(np.asarray(dec) - ref).max()
    assert drift <= 1e-2, f"argmax decode drift {drift}px"
    np.testing.assert_allclose(np.asarray(scores), ref_vals, atol=1e-6)


def test_codec_facade_decode_shapes_and_error_normalization():
    K, B, H, W = 4, 2, 48, 64
    codec = Codec(ProbMap((256, 192), (W, H), sigmas=np.full(K, 0.05)))
    rng = np.random.default_rng(3)
    heatmaps = jnp.asarray(rng.random((B, K, H, W), dtype=np.float32))
    scalars = [
        jnp.asarray(rng.random((B, K, 1, 1), dtype=np.float32))
        for _ in range(4)
    ]
    preds, probs, vis, oks, errs = codec.decode((heatmaps, *scalars))
    assert preds[0].shape == (B, K, 2)
    assert probs.shape == (B, 1, K)
    diag = np.sqrt(H**2 + W**2)
    np.testing.assert_allclose(
        np.asarray(errs), np.asarray(scalars[3]).reshape(B, 1, K) / diag,
        rtol=1e-6,
    )


def test_single_instance_unbatched_input():
    K = 3
    pm = ProbMap((128, 128), (32, 32), sigmas=np.full(K, 0.1))
    enc = pm.encode(np.array([[60.0, 70.0], [10.0, 10.0], [100.0, 30.0]]))
    assert np.asarray(enc["heatmaps"]).shape == (1, K, 32, 32)
    dec, _ = pm.decode(np.asarray(enc["heatmaps"])[0])
    assert dec.shape == (1, K, 2)


def test_udp_max_step_clamps_degenerate_refinement():
    K = 2
    am_free = ArgMaxProbMap((64, 64), (32, 32), sigmas=np.full(K, 0.05))
    am_clamped = ArgMaxProbMap(
        (64, 64), (32, 32), sigmas=np.full(K, 0.05), udp_max_step=1.0
    )
    # Flat-ish noisy maps produce degenerate Hessians and wild Newton steps.
    rng = np.random.default_rng(0)
    hm = (1e-3 * rng.random((2, K, 32, 32))).astype(np.float32)
    locs_free, _ = am_free.decode(hm)
    locs_clamped, _ = am_clamped.decode(hm)
    raw, _ = __import__("probpose_pytorch_tpu.ops.heatmap", fromlist=["heatmap_maximum"]).heatmap_maximum(jnp.asarray(hm))
    raw_in = np.asarray(raw) / 31.0 * 64.0
    step_clamped = np.abs(np.asarray(locs_clamped) - raw_in)
    # clamp bounds refinement to 1 heatmap px = 64/31 input px
    assert step_clamped.max() <= 64 / 31 + 1e-3
