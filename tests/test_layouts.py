"""qkv layout conversions (compat/layouts.py): the head-major packing that
tensor-parallelizes the packed Pallas attention (attn_impl='fused_tp') is a
lossless column permutation of the default qkv-major parameters — a model in
either layout computes identical outputs once converted."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.compat import (
    qkv_head_major_permutation,
    qkv_to_head_major,
    qkv_to_qkv_major,
)
from probpose_pytorch_tpu.models.model import ModelConfig, build_model

HEADS = 2


def _cfg(**kw):
    return ModelConfig(
        img_size=(64, 48),
        num_keypoints=5,
        backbone="vit-nano",
        compute_dtype="float32",
        deconv_out_channels=(32, 32),
        deconv_kernel_sizes=(4, 4),
        pool_sizes=((2, 2), (2, 2)),
        normalize=1.0,
        **kw,
    )


def test_permutation_is_a_bijection_and_roundtrips():
    C, H = 12, 3
    perm = qkv_head_major_permutation(C, H)
    assert sorted(perm.tolist()) == list(range(3 * C))
    # head 1's query starts at 3*d in head-major and d in qkv-major
    d = C // H
    assert perm[3 * d] == d
    # kernel roundtrip through both conversions is the identity
    rng = np.random.default_rng(0)
    params = {"blocks_0": {"attn": {"qkv": {
        "kernel": rng.normal(size=(C, 3 * C)).astype(np.float32),
        "bias": rng.normal(size=(3 * C,)).astype(np.float32),
    }}}}
    back = qkv_to_qkv_major(qkv_to_head_major(params, H), H)
    for leaf, orig in zip(
        jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(leaf), orig)


@pytest.mark.parametrize("interpret_kernel", [False, True])
def test_fused_tp_with_converted_params_matches_einsum(
    monkeypatch, interpret_kernel
):
    """einsum model (qkv-major params) == fused_tp model (converted
    head-major params), through both the einsum fallback and the interpret-
    mode Pallas kernel."""
    if interpret_kernel:
        monkeypatch.setenv("PROBPOSE_PALLAS_INTERPRET", "1")
    else:
        monkeypatch.delenv("PROBPOSE_PALLAS_INTERPRET", raising=False)

    cfg = _cfg(attn_impl="einsum")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 48, 3), jnp.float32)
    variables = model.init(rng, x, train=False)
    ref = model.apply(variables, x, train=False)

    model_tp = build_model(_cfg(attn_impl="fused_tp"))
    converted = qkv_to_head_major(variables, HEADS)
    out = model_tp.apply(converted, x, train=False)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5
        )
