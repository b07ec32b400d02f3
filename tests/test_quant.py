"""int8 quantization tests: primitive correctness and quantized-ViT fidelity
vs the f32 flax forward."""

import jax
import jax.numpy as jnp
import numpy as np

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
