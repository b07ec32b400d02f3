"""int8 quantization tests: primitive correctness and quantized-ViT fidelity
vs the f32 flax forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.models.vit import ViTBackbone
from probpose_pytorch_tpu.models.vit_int8 import (
    quantize_vit_params,
    vit_forward_int8,
)
from probpose_pytorch_tpu.ops.quant import (
    dynamic_quantize_rows,
    int8_matmul,
    quantize_weight,
)


class TestPrimitives:
    def test_weight_quant_roundtrip_error(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(64, 128)).astype(np.float32)
        q, s = quantize_weight(jnp.asarray(w))
        deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
        rel = np.abs(deq - w).max() / np.abs(w).max()
        assert rel < 0.01  # <=0.5 LSB of 127

    def test_int8_matmul_close_to_f32(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(32, 96)).astype(np.float32)
        w = rng.normal(size=(96, 64)).astype(np.float32)
        b = rng.normal(size=(64,)).astype(np.float32)
        q, s = quantize_weight(jnp.asarray(w))
        y = np.asarray(
            int8_matmul(jnp.asarray(x), q, s, jnp.asarray(b),
                        out_dtype=jnp.float32)
        )
        ref = x @ w + b
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 0.02, rel

    def test_dynamic_row_quant_zero_row_safe(self):
        x = jnp.zeros((3, 8))
        q, s = dynamic_quantize_rows(x)
        assert np.isfinite(np.asarray(s)).all()
        assert np.asarray(q).max() == 0

    def test_weight_only_matmul_close_to_f32(self):
        """Weight-only variant: activations untouched, so the only error is
        the int8 weight rounding (tighter than dynamic int8_matmul)."""
        from probpose_pytorch_tpu.ops.quant import weight_only_matmul

        rng = np.random.default_rng(2)
        x = rng.normal(size=(32, 96)).astype(np.float32)
        w = rng.normal(size=(96, 64)).astype(np.float32)
        b = rng.normal(size=(64,)).astype(np.float32)
        q, s = quantize_weight(jnp.asarray(w))
        y = np.asarray(
            weight_only_matmul(jnp.asarray(x), q, s, jnp.asarray(b))
        )
        ref = x @ w + b
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 0.01, rel


class TestQuantizedPredictor:
    @pytest.mark.parametrize("mode", ["int8", "int8_wo"])
    def test_int8_predictor_tracks_f32(self, tmp_path, mode):
        """TopDownPredictor(quantize='int8') runs the full serving path
        (fused crop -> int8 backbone -> head -> decode -> untransform) and
        its keypoints track the f32 predictor within the quantization
        error budget."""
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.models.model import ModelConfig
        from probpose_pytorch_tpu.models.vit import ViTConfig
        from probpose_pytorch_tpu.train import TrainConfig, Trainer

        ViTConfig.PRESETS.setdefault(
            "vit-tiny-q",
            dict(embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0),
        )
        cfg = TrainConfig(
            model=ModelConfig(
                img_size=(64, 48),
                num_keypoints=5,
                backbone="vit-tiny-q",
                compute_dtype="float32",
                deconv_out_channels=(32, 32),
                deconv_kernel_sizes=(4, 4),
                pool_sizes=((2, 2), (2, 2)),
                normalize=1.0,
            ),
            out_dir=str(tmp_path / "run"),
        )
        trainer = Trainer.create(cfg, steps_per_epoch=1)
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        kw = dict(
            model=trainer.model,
            codec=trainer.encode_codec,
            input_size=cfg.model.img_size,
            return_heatmaps=True,
        )
        pred_f32 = TopDownPredictor(variables=variables, **kw)
        pred_int8 = TopDownPredictor(
            variables=variables, quantize=mode, **kw
        )
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (4, 128, 96, 3), dtype=np.uint8)
        boxes = np.tile(
            np.array([[8, 8, 80, 112]], np.float32), (4, 1)
        )
        out8 = pred_int8(frames, boxes)
        outf = pred_f32(frames, boxes)
        assert out8["keypoints"].shape == outf["keypoints"].shape
        assert np.isfinite(out8["keypoints"]).all()
        assert (out8["probabilities"] >= 0).all()
        assert (out8["probabilities"] <= 1).all()
        # An untrained model's heatmaps are diffuse, so decoded argmax
        # locations are chaotic under any perturbation — the fidelity
        # signal is the heatmap field itself (cf. the 0.9998 correlation
        # measured on trained ViT-S features, docs/PERF.md).
        corr = np.corrcoef(
            out8["heatmaps"].ravel().astype(np.float64),
            outf["heatmaps"].ravel().astype(np.float64),
        )[0, 1]
        assert corr > 0.95, corr

    def test_rejects_prefix_token_backbones(self, tmp_path):
        from probpose_pytorch_tpu.inference import TopDownPredictor
        from probpose_pytorch_tpu.models.head import ProbMapHead
        from probpose_pytorch_tpu.models.model import ProbPoseModel

        bb = ViTBackbone(
            img_size=(64, 48), patch_size=16, embed_dim=64, depth=2,
            num_heads=2, dtype=jnp.float32, num_prefix_tokens=2,
        )
        head = ProbMapHead(
            out_channels=5,
            pool_sizes=((2, 2), (2, 2)),
            deconv_out_channels=(32, 32),
            deconv_kernel_sizes=(4, 4),
        )
        model = ProbPoseModel(backbone=bb, head=head)
        x = jnp.zeros((1, 64, 48, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        import pytest

        with pytest.raises(ValueError, match="prefix"):
            TopDownPredictor(
                model=model,
                variables=variables,
                codec=None,
                input_size=(64, 48),
                quantize="int8",
            )


class TestQuantizedViT:
    def test_matches_f32_forward(self):
        m = ViTBackbone(
            img_size=(64, 48), patch_size=16, embed_dim=64, depth=3,
            num_heads=2, dtype=jnp.float32,
        )
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 48, 3))
        variables = m.init(jax.random.PRNGKey(1), x)
        ref = np.asarray(m.apply(variables, x))

        qparams = quantize_vit_params(variables["params"], depth=3)
        out = np.asarray(
            vit_forward_int8(qparams, x, patch_size=16, depth=3, num_heads=2)
        )
        assert out.shape == ref.shape
        rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 0.1, rel  # dynamic int8: a few percent feature error
        # correlation stays near 1
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.99, corr

    def test_weight_only_tracks_f32_tighter_than_dynamic(self):
        """weight_only=True never quantizes activations, so its feature
        error vs the f32 forward must be no worse than dynamic int8's."""
        m = ViTBackbone(
            img_size=(64, 48), patch_size=16, embed_dim=64, depth=3,
            num_heads=2, dtype=jnp.float32,
        )
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 48, 3))
        variables = m.init(jax.random.PRNGKey(3), x)
        ref = np.asarray(m.apply(variables, x))
        qparams = quantize_vit_params(variables["params"], depth=3)
        dyn = np.asarray(
            vit_forward_int8(qparams, x, patch_size=16, depth=3,
                             num_heads=2)
        )
        wo = np.asarray(
            vit_forward_int8(qparams, x, patch_size=16, depth=3,
                             num_heads=2, weight_only=True)
        )
        err = lambda y: np.abs(y - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert err(wo) < 0.1
        assert err(wo) <= err(dyn) * 1.05, (err(wo), err(dyn))
        assert np.corrcoef(wo.ravel(), ref.ravel())[0, 1] > 0.99
