"""Multi-branch probabilistic keypoint head (flax.linen, NHWC).

Rebuild of the reference `ProbMapHead` (/root/reference/probpose/head.py:18-594)
— five branches off a shared feature grid:
  1. heatmaps: deconv upsampling stack -> optional convs -> 1x1 conv ->
     optional sparsemax normalization over pixels (temperature 0.5) -> clamp
  2. in-image probability, 3. visibility, 4. predicted OKS: conv/BN/maxpool
     stacks -> 1x1 conv -> sigmoid
  5. predicted euclidean error: same stack with ReLU output

TPU-native differences:
  * NHWC layout; heatmaps transposed to (B, K, H, W) only at the API boundary.
  * Sparsemax is our bisection-projection op (ops/sparsemax.py) instead of a
    pip package's sort-based one — computed in f32 even under bf16.
  * `.detach()` becomes `jax.lax.stop_gradient` (head.py:547-549, 563-565,
    578, 592).
  * Branch freezing is expressed as an optax mask (train/state.py), not
    requires_grad mutation; the head exposes `frozen_param_labels()` for it.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from probpose_pytorch_tpu.ops.sparsemax import sparsemax_auto

__all__ = ["ProbMapHead"]

_conv_init = nn.initializers.normal(stddev=0.001)


class _ConvTransposeParams(nn.Module):
    """Declares the ConvTranspose kernel without computing, so the shuffle
    deconv path's param tree stays byte-identical to nn.ConvTranspose
    (checkpoints and torch imports interchange)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", _conv_init, self.shape)


class _ConvParams(nn.Module):
    """Declares an nn.Conv's kernel+bias without computing (param-tree
    mirror for the fused scalar-branch path)."""

    shape: tuple  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", _conv_init, self.shape),
            self.param("bias", nn.initializers.zeros, (self.shape[-1],)),
        )


class _BnParams(nn.Module):
    """Declares an nn.BatchNorm's params + running stats; optionally folds a
    batch-stat update (momentum semantics identical to nn.BatchNorm)."""

    channels: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, new_mean=None, new_var=None):
        scale = self.param(
            "scale", nn.initializers.ones, (self.channels,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.channels,), jnp.float32
        )
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.channels,))
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.channels,))
        )
        if new_mean is not None and not self.is_initializing():
            mean.value = (
                self.momentum * mean.value + (1.0 - self.momentum) * new_mean
            )
            var.value = (
                self.momentum * var.value + (1.0 - self.momentum) * new_var
            )
        return scale, bias, mean.value, var.value


class _ScalarBranchParams(nn.Module):
    """Parameter mirror of _ScalarBranch: declares the identical
    conv{i}/bn{i}/final tree (params AND batch_stats) without computing,
    so the fused path's checkpoints interchange with the unfused one.
    Call once with stats=None to read params; in train mode call again
    with the computed per-stage batch stats to update the running stats."""

    out_channels: int
    n_stages: int
    channels: int

    @nn.compact
    def __call__(self, stats=None):
        convs, bns = [], []
        for i in range(self.n_stages):
            convs.append(
                _ConvParams(
                    (3, 3, self.channels, self.channels), name=f"conv{i}"
                )()
            )
            s = (None, None) if stats is None else stats[i]
            bns.append(_BnParams(self.channels, name=f"bn{i}")(*s))
        final = _ConvParams(
            (1, 1, self.channels, self.out_channels), name="final"
        )()
        return convs, bns, final


class _ScalarBranch(nn.Module):
    """[3x3 conv (C->C), BN, maxpool(k), relu] x len(pool_sizes) -> 1x1 conv
    (C->K) -> activation. Mirrors head.py:255-405."""

    out_channels: int
    pool_sizes: Sequence[tuple[int, int]]
    final_activation: str  # "sigmoid" | "relu"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        C = x.shape[-1]
        for i, pool in enumerate(self.pool_sizes):
            x = nn.Conv(
                C,
                (3, 3),
                padding=1,
                kernel_init=_conv_init,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=jnp.float32,
                name=f"bn{i}",
            )(x)
            ph, pw = (pool, pool) if isinstance(pool, int) else tuple(pool)
            # Clamp windows to the remaining extent so aspect-ratio grids
            # (e.g. 4x3 features at 256x192/p16) never pool to zero.
            ph, pw = min(ph, x.shape[1]), min(pw, x.shape[2])
            x = nn.max_pool(x, (ph, pw), strides=(ph, pw), padding="VALID")
            x = nn.relu(x)
        # Collapse any residual spatial extent so outputs are (B, 1, 1, K)
        # regardless of feature-grid aspect (the reference requires the pool
        # schedule to hit exactly 1x1; we are shape-robust).
        if x.shape[1] > 1 or x.shape[2] > 1:
            x = jnp.max(x, axis=(1, 2), keepdims=True)
        x = nn.Conv(
            self.out_channels,
            (1, 1),
            kernel_init=_conv_init,
            dtype=self.dtype,
            name="final",
        )(x)
        x = x.astype(jnp.float32)
        if self.final_activation == "sigmoid":
            x = nn.sigmoid(x)
        else:
            x = nn.relu(x)
        return x


class ProbMapHead(nn.Module):
    """Five-branch probabilistic keypoint head.

    Args:
        out_channels: number of keypoints K.
        pool_sizes: per-stage maxpool windows of the scalar branches
            (reference `alt_head_kernel_sizes`).
        deconv_out_channels / deconv_kernel_sizes: transpose-conv upsampling
            stack (each stage doubles resolution; kernel sizes 2/3/4 supported
            as in head.py:433-474).
        conv_out_channels / conv_kernel_sizes: optional extra conv stack.
        final_layer_kernel_size: kernel of the last heatmap conv (None = skip).
        normalize: None disables sparsemax; a float enables sparsemax over
            flattened pixels at temperature 0.5 and scales the result
            (head.py:237-245, 513-534).
        detach_probability / detach_visibility: stop-gradient the shared
            features entering those branches (oks/error always detach).
    """

    out_channels: int
    pool_sizes: Sequence = ((4, 4), (2, 2), (2, 2))
    deconv_out_channels: Sequence[int] = (256, 256)
    deconv_kernel_sizes: Sequence[int] = (4, 4)
    conv_out_channels: Sequence[int] = ()
    conv_kernel_sizes: Sequence[int] = ()
    final_layer_kernel_size: int | None = 1
    normalize: float | None = None
    temperature: float = 0.5
    detach_probability: bool = True
    detach_visibility: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # "fastvjp" keeps XLA's optimal conv_transpose forward but installs the
    # MXU-friendly custom backward (ops/deconv.py) — numerically identical,
    # same param tree; "lax" keeps plain nn.ConvTranspose (autodiff bwd).
    deconv_impl: str = "lax"
    # "fused" evaluates the four scalar branches as 3 channel-grouped convs
    # instead of 12 tiny sequential ones — numerically identical, identical
    # param/batch_stats tree. Measured SLOWER e2e on TPU v5e (paired A/B:
    # 30.9 vs 27.8 ms serving batch; XLA lowers feature_group_count convs
    # poorly), so "separate" is the default; the fused path stays as tested
    # infrastructure for hardware where grouped convs lower well.
    scalar_impl: str = "separate"

    @nn.compact
    def __call__(
        self, feats: jax.Array, train: bool = False
    ) -> tuple[jax.Array, ...]:
        """(B, h, w, C) features -> (heatmaps (B,K,H,W), probability,
        visibility, oks, error — each (B,K,1,1))."""
        heatmaps = self._heatmap_branch(feats, train)

        if (
            self.scalar_impl == "fused"
            and self.detach_probability
            and self.detach_visibility
            and len(self.pool_sizes) > 0
        ):
            probability, visibility, oks, error = self._fused_scalar_branches(
                feats, train
            )
            return heatmaps, probability, visibility, oks, error

        def branch(name: str, act: str, detach: bool) -> jax.Array:
            x = jax.lax.stop_gradient(feats) if detach else feats
            out = _ScalarBranch(
                self.out_channels,
                self.pool_sizes,
                act,
                dtype=self.dtype,
                name=name,
            )(x, train)
            # (B, 1, 1, K) -> (B, K, 1, 1) reference layout
            return jnp.transpose(out, (0, 3, 1, 2))

        probability = branch("probability", "sigmoid", self.detach_probability)
        visibility = branch("visibility", "sigmoid", self.detach_visibility)
        oks = branch("oks", "sigmoid", True)
        error = branch("error", "relu", True)
        return heatmaps, probability, visibility, oks, error

    _SCALAR_ORDER = ("probability", "visibility", "oks", "error")

    def _fused_scalar_branches(self, feats, train):
        """All four scalar branches in 3 grouped convs + 1 grouped 1x1.

        Channel-concatenation is exact: conv, per-channel BN, maxpool, and
        relu all commute with concatenation along channels (stage 1 shares
        the input, so its concat conv is a plain wide conv; later stages use
        feature_group_count=4 so each branch's channels stay private).
        Param and batch_stats trees are byte-identical to the per-branch
        modules (declared via _ScalarBranchParams), so checkpoints and torch
        imports interchange — pinned by tests/test_models.py."""
        C = feats.shape[-1]
        n = len(self.pool_sizes)
        x = jax.lax.stop_gradient(feats)
        mods = {
            name: _ScalarBranchParams(self.out_channels, n, C, name=name)
            for name in self._SCALAR_ORDER
        }
        parms = {name: mods[name](None) for name in self._SCALAR_ORDER}
        G = len(self._SCALAR_ORDER)

        stats_acc: dict[str, list] = {name: [] for name in self._SCALAR_ORDER}
        for i, pool in enumerate(self.pool_sizes):
            kcat = jnp.concatenate(
                [parms[name][0][i][0] for name in self._SCALAR_ORDER], axis=-1
            ).astype(self.dtype)
            bcat = jnp.concatenate(
                [parms[name][0][i][1] for name in self._SCALAR_ORDER], axis=-1
            ).astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kcat,
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=1 if i == 0 else G,
            ) + bcat
            xf = x.astype(jnp.float32)
            bm = jnp.mean(xf, axis=(0, 1, 2))
            bv = jnp.var(xf, axis=(0, 1, 2))
            scales, biases, means, variances = [], [], [], []
            for g, name in enumerate(self._SCALAR_ORDER):
                scale, bias, rmean, rvar = parms[name][1][i]
                scales.append(scale)
                biases.append(bias)
                means.append(rmean)
                variances.append(rvar)
                stats_acc[name].append(
                    (bm[g * C : (g + 1) * C], bv[g * C : (g + 1) * C])
                )
            if train:
                m, v = bm, bv
            else:
                m = jnp.concatenate(means)
                v = jnp.concatenate(variances)
            xf = (xf - m) * jax.lax.rsqrt(v + 1e-5)
            xf = xf * jnp.concatenate(scales) + jnp.concatenate(biases)
            ph, pw = (pool, pool) if isinstance(pool, int) else tuple(pool)
            ph, pw = min(ph, xf.shape[1]), min(pw, xf.shape[2])
            xf = nn.max_pool(xf, (ph, pw), strides=(ph, pw), padding="VALID")
            x = nn.relu(xf)
        if x.shape[1] > 1 or x.shape[2] > 1:
            x = jnp.max(x, axis=(1, 2), keepdims=True)
        kf = jnp.concatenate(
            [parms[name][2][0] for name in self._SCALAR_ORDER], axis=-1
        ).astype(self.dtype)
        bf = jnp.concatenate(
            [parms[name][2][1] for name in self._SCALAR_ORDER], axis=-1
        ).astype(self.dtype)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kf,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=G,
        ) + bf
        x = x.astype(jnp.float32)
        if train:
            for name in self._SCALAR_ORDER:
                mods[name](stats_acc[name])
        K = self.out_channels
        outs = []
        for g, name in enumerate(self._SCALAR_ORDER):
            part = x[..., g * K : (g + 1) * K]
            part = (
                nn.relu(part) if name == "error" else nn.sigmoid(part)
            )
            outs.append(jnp.transpose(part, (0, 3, 1, 2)))
        return tuple(outs)

    def _heatmap_branch(self, x: jax.Array, train: bool) -> jax.Array:
        for i, (ch, k) in enumerate(
            zip(self.deconv_out_channels, self.deconv_kernel_sizes)
        ):
            if k not in (2, 3, 4):
                raise ValueError(f"unsupported deconv kernel size {k}")
            if self.deconv_impl == "fastvjp":
                from probpose_pytorch_tpu.ops.deconv import conv_transpose2

                kernel = _ConvTransposeParams(
                    (k, k, x.shape[-1], ch), name=f"deconv{i}"
                )()
                x = conv_transpose2(
                    x.astype(self.dtype), kernel.astype(self.dtype)
                )
            else:
                x = nn.ConvTranspose(
                    ch,
                    (k, k),
                    strides=(2, 2),
                    padding="SAME",
                    use_bias=False,
                    kernel_init=_conv_init,
                    dtype=self.dtype,
                    name=f"deconv{i}",
                )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=jnp.float32,
                name=f"deconv_bn{i}",
            )(x)
            x = nn.relu(x)
        for i, (ch, k) in enumerate(
            zip(self.conv_out_channels, self.conv_kernel_sizes)
        ):
            x = nn.Conv(
                ch,
                (k, k),
                padding=(k - 1) // 2,
                kernel_init=_conv_init,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=jnp.float32,
                name=f"conv_bn{i}",
            )(x)
            x = nn.relu(x)
        if self.final_layer_kernel_size is not None:
            k = self.final_layer_kernel_size
            x = nn.Conv(
                self.out_channels,
                (k, k),
                padding=k // 2,
                kernel_init=_conv_init,
                dtype=self.dtype,
                name="final",
            )(x)

        B, H, W, K = x.shape
        x = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)  # (B,K,H,W)
        flat = x.reshape(B, K, H * W)
        if self.normalize is not None:
            flat = sparsemax_auto(flat / self.temperature) * self.normalize
        flat = jnp.clip(flat, 0.0, 1.0)
        return flat.reshape(B, K, H, W)

    @staticmethod
    def frozen_param_labels(
        params: dict,
        freeze_heatmaps: bool = False,
        freeze_probability: bool = False,
        freeze_visibility: bool = False,
        freeze_oks: bool = False,
        freeze_error: bool = False,
        prefix: str = "head",
    ):
        """Label head params "frozen"/"trainable" for an optax mask —
        the JAX analogue of the reference's per-branch requires_grad flags
        (head.py:96-100)."""
        frozen_branches = set()
        if freeze_probability:
            frozen_branches.add("probability")
        if freeze_visibility:
            frozen_branches.add("visibility")
        if freeze_oks:
            frozen_branches.add("oks")
        if freeze_error:
            frozen_branches.add("error")
        heatmap_prefixes = ("deconv", "conv", "final")

        def label(path: tuple, _) -> str:
            names = [str(getattr(p, "key", p)) for p in path]
            if prefix not in names:
                return "trainable"
            i = names.index(prefix)
            sub = names[i + 1] if i + 1 < len(names) else ""
            if sub in frozen_branches:
                return "frozen"
            if freeze_heatmaps and sub.startswith(heatmap_prefixes):
                return "frozen"
            return "trainable"

        import jax.tree_util as jtu

        return jtu.tree_map_with_path(label, params)
