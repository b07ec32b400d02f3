"""conv_transpose2 (ops/deconv.py): identical forward to
nn.ConvTranspose(strides=2, padding="SAME"), and custom-VJP gradients equal
to jax autodiff of lax.conv_transpose — plus head param-tree interchange
between deconv_impl="fastvjp" and "lax".

The custom backward was built to probe a suspected slow autodiff of strided
conv_transpose on TPU; the paired A/B measured it e2e-neutral-to-negative,
so "lax" stays the default (ops/deconv.py docstring, docs/PERF.md). Either
way it must be a pure re-expression, not an approximation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from probpose_pytorch_tpu.ops.deconv import conv_transpose2


def _ref(x, kern):
    return jax.lax.conv_transpose(
        x, kern, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("k", [2, 3, 4])
def test_matches_flax_conv_transpose(k):
    rng = np.random.default_rng(k)
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 3)), jnp.float32)
    m = nn.ConvTranspose(
        4, (k, k), strides=(2, 2), padding="SAME", use_bias=False
    )
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)
    got = conv_transpose2(x, v["params"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("k", [2, 3, 4])
def test_custom_vjp_matches_autodiff(k):
    rng = np.random.default_rng(10 + k)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 3)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(k, k, 3, 4)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 8, 12, 4)), jnp.float32)

    gx_o, gw_o = jax.grad(
        lambda x, w: jnp.sum(conv_transpose2(x, w) * t), argnums=(0, 1)
    )(x, kern)
    gx_r, gw_r = jax.grad(
        lambda x, w: jnp.sum(_ref(x, w) * t), argnums=(0, 1)
    )(x, kern)
    np.testing.assert_allclose(
        np.asarray(gx_o), np.asarray(gx_r), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gw_o), np.asarray(gw_r), rtol=1e-5, atol=1e-5
    )


def test_head_impls_interchange():
    """Same param tree, same outputs: a checkpoint trained with either
    deconv impl loads into the other."""
    from probpose_pytorch_tpu.models.head import ProbMapHead

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 6, 32)), jnp.float32
    )
    kw = dict(
        out_channels=5,
        deconv_out_channels=(16, 16),
        deconv_kernel_sizes=(4, 4),
        pool_sizes=((2, 2), (2, 2)),
        normalize=1.0,
        dtype=jnp.float32,
    )
    fast = ProbMapHead(deconv_impl="fastvjp", **kw)
    lax_head = ProbMapHead(deconv_impl="lax", **kw)
    vs = jax.jit(fast.init)(jax.random.PRNGKey(0), x)
    vl = jax.jit(lax_head.init)(jax.random.PRNGKey(0), x)
    ts = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vs)
    tl = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vl)
    assert ts == tl
    # cross-load: lax params through the fastvjp path and vice versa
    out_f = fast.apply(vl, x)
    out_l = lax_head.apply(vl, x)
    for a, b in zip(out_f, out_l):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
