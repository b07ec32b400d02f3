"""Numerical verification of the torch-checkpoint importer.

Builds small torch modules with the reference's layer layout (oracles for the
*checkpoint format*, not copies of reference code), imports their weights,
and checks our flax modules reproduce the torch forward pass.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import nn  # noqa: E402

from probpose_pytorch_tpu.compat.torch_import import (  # noqa: E402
    import_head_params,
)
from probpose_pytorch_tpu.models.head import ProbMapHead  # noqa: E402


def _torch_head(in_ch=16, out_ch=3, deconv=(8, 8), pools=((2, 2), (2, 2))):
    """Reference-layout torch head: Sequential indices must match
    head.py's construction order for the importer's positional mapping."""
    m = nn.Module()
    layers, c = [], in_ch
    for oc in deconv:
        layers += [
            nn.ConvTranspose2d(c, oc, 4, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(oc),
            nn.ReLU(),
        ]
        c = oc
    m.deconv_layers = nn.Sequential(*layers)
    m.final_layer = nn.Conv2d(c, out_ch, 1)

    def scalar_branch(final_act):
        seq, cc = [], in_ch
        for k in pools:
            seq += [
                nn.Conv2d(cc, cc, 3, padding=1),
                nn.BatchNorm2d(cc),
                nn.MaxPool2d(k, stride=k),
                nn.ReLU(),
            ]
        seq += [nn.Conv2d(cc, out_ch, 1), final_act]
        return nn.Sequential(*seq)

    m.probability_layers = scalar_branch(nn.Sigmoid())
    m.visibility_layers = scalar_branch(nn.Sigmoid())
    m.oks_layers = scalar_branch(nn.Sigmoid())
    m.error_layers = scalar_branch(nn.ReLU())
    # Non-trivial weights
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    m.eval()
    return m


def test_head_import_matches_torch_forward():
    torch.manual_seed(0)
    tm = _torch_head()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_head_params(
        sd, num_deconv=2, num_conv=0, num_pool_stages=2
    )

    head = ProbMapHead(
        out_channels=3,
        pool_sizes=((2, 2), (2, 2)),
        deconv_out_channels=(8, 8),
        deconv_kernel_sizes=(4, 4),
        normalize=None,  # torch oracle has no sparsemax here
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    # 4x4 features: the (2,2)x(2,2) pool schedule reaches exactly 1x1, so the
    # torch oracle and our head agree on the final-conv input extent.
    feats = rng.normal(size=(2, 4, 4, 16)).astype(np.float32)

    ours = head.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats),
        train=False,
    )

    with torch.no_grad():
        tfeats = torch.from_numpy(feats.transpose(0, 3, 1, 2))
        t_hm = tm.final_layer(tm.deconv_layers(tfeats)).clamp(0, 1)
        t_prob = tm.probability_layers(tfeats)
        t_vis = tm.visibility_layers(tfeats)
        t_oks = tm.oks_layers(tfeats)
        t_err = tm.error_layers(tfeats)

    np.testing.assert_allclose(
        np.asarray(ours[0]), t_hm.numpy(), rtol=1e-4, atol=1e-5
    )
    for o, t in zip(ours[1:], (t_prob, t_vis, t_oks, t_err)):
        np.testing.assert_allclose(
            np.asarray(o), t.numpy(), rtol=1e-4, atol=1e-5
        )


def test_deconv_layout_conversion_exact():
    """Isolated ConvTranspose k4s2p1 equivalence: torch vs flax 'SAME'."""
    from flax import linen as fnn

    torch.manual_seed(1)
    tconv = nn.ConvTranspose2d(4, 6, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.randn_like(tconv.weight))
    x = np.random.default_rng(0).normal(size=(1, 5, 7, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    w = tconv.weight.detach().numpy()[:, :, ::-1, ::-1]
    kernel = np.ascontiguousarray(w.transpose(2, 3, 0, 1))
    fconv = fnn.ConvTranspose(6, (4, 4), strides=(2, 2), padding="SAME",
                              use_bias=False)
    out = fconv.apply({"params": {"kernel": jnp.asarray(kernel)}},
                      jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_convert_cli_roundtrip(tmp_path):
    """Build a reference-layout torch head checkpoint, convert it to Orbax,
    reload it with the predictor loader, and check the imported weights are
    actually in the restored state."""
    import jax.numpy as jnp

    from probpose_pytorch_tpu.compat.convert import main as convert_main
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.models.vit import ViTConfig
    from probpose_pytorch_tpu.train import TrainConfig

    ViTConfig.PRESETS.setdefault(
        "vit-tiny-conv", dict(embed_dim=16, depth=1, num_heads=2, mlp_ratio=2.0)
    )
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 64), num_keypoints=3, backbone="vit-tiny-conv",
            compute_dtype="float32", deconv_out_channels=(8, 8),
            deconv_kernel_sizes=(4, 4), pool_sizes=((2, 2), (2, 2)),
            normalize=None,
        ),
        out_dir=str(tmp_path / "unused"),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.save(cfg_path)

    torch.manual_seed(0)
    tm = _torch_head(in_ch=16, out_ch=3, deconv=(8, 8), pools=((2, 2), (2, 2)))
    ckpt_path = tmp_path / "head.pth"
    torch.save(tm.state_dict(), ckpt_path)

    out = tmp_path / "imported"
    convert_main([
        "--torch-checkpoint", str(ckpt_path),
        "--config", str(cfg_path),
        "--out", str(out),
        "--head-only",
    ])

    from probpose_pytorch_tpu.inference import load_predictor

    predictor = load_predictor(out / "checkpoints", out / "config.json")
    got = np.asarray(
        predictor.variables["params"]["head"]["final"]["kernel"]
    )
    want = tm.final_layer.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# RADIO-style ViT import (reference backbone.py:4-21: frozen torch-hub RADIO
# with class/register tokens + optional trainable token-MLP adapter)
# ---------------------------------------------------------------------------


class _TorchViTBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h, d = self.heads, C // self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, N, 3, h, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * d**-0.5
        a = a.softmax(dim=-1)
        y = (a @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class _TorchRadioViT(nn.Module):
    """RADIO-checkpoint-layout oracle: timm-style ViT with a class token and
    register tokens that participate in attention, pos_embed covering
    prefix+patches, exact-erf gelu."""

    def __init__(self, img=32, patch=8, dim=32, depth=2, heads=2, regs=2):
        super().__init__()
        n = (img // patch) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.reg_token = nn.Parameter(torch.randn(1, regs, dim) * 0.02)
        self.pos_embed = nn.Parameter(
            torch.randn(1, 1 + regs + n, dim) * 0.02
        )
        self.blocks = nn.ModuleList(
            _TorchViTBlock(dim, heads) for _ in range(depth)
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.regs = regs

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat(
            [
                self.cls_token.expand(B, -1, -1),
                self.reg_token.expand(B, -1, -1),
                x,
            ],
            dim=1,
        )
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 1 + self.regs :]  # patch tokens only


def test_radio_import_matches_torch_forward():
    from probpose_pytorch_tpu.compat.torch_import import (
        import_radio_adapter_params,
        import_radio_vit_params,
    )
    from probpose_pytorch_tpu.models.vit import ViTBackbone

    torch.manual_seed(0)
    tm = _TorchRadioViT()
    adapter = nn.Sequential(nn.Linear(32, 24), nn.ReLU(), nn.Linear(24, 32))
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.update(
        {f"mlp.{k}": v.detach().numpy() for k, v in adapter.state_dict().items()}
    )

    params = import_radio_vit_params(
        sd,
        depth=2,
        src_grid=(4, 4),
        num_prefix_tokens=1,
        num_register_tokens=2,
    )
    params.update(import_radio_adapter_params(sd))

    vit = ViTBackbone(
        img_size=(32, 32),
        patch_size=8,
        embed_dim=32,
        depth=2,
        num_heads=2,
        dtype=jnp.float32,
        frozen=True,
        num_prefix_tokens=3,
        exact_gelu=True,
        adapter_hidden=(24, 32),
    )
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(vit.apply({"params": params}, jnp.asarray(x)))

    with torch.no_grad():
        feats = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))  # (B, N, C)
        feats = adapter(feats)
    want = feats.numpy().reshape(2, 4, 4, 32)

    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)
    # the frozen+adapter contract mirrors backbone.py:10-21
    corr = np.corrcoef(ours.ravel(), want.ravel())[0, 1]
    assert corr > 0.999


def test_radio_import_linear_patchifier_and_no_registers():
    """RADIO's ViTPatchGenerator uses a linear patch embedder (C, 3*p*p);
    the importer folds it into the equivalent convolution."""
    from probpose_pytorch_tpu.compat.torch_import import import_radio_vit_params
    from probpose_pytorch_tpu.models.vit import ViTBackbone

    torch.manual_seed(1)
    tm = _TorchRadioViT(regs=1)  # keep a register so state dict is uniform
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # rewrite the conv patchifier as its linear form
    w = sd.pop("patch_embed.proj.weight")  # (C, 3, p, p)
    sd["patch_embed.proj.weight"] = w.reshape(w.shape[0], -1)

    params = import_radio_vit_params(
        sd, depth=2, src_grid=(4, 4),
        num_prefix_tokens=1, num_register_tokens=1,
    )
    vit = ViTBackbone(
        img_size=(32, 32), patch_size=8, embed_dim=32, depth=2, num_heads=2,
        dtype=jnp.float32, frozen=True, num_prefix_tokens=2, exact_gelu=True,
    )
    x = np.random.default_rng(1).normal(size=(1, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(vit.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        ours, want.reshape(1, 4, 4, 32), rtol=1e-4, atol=1e-5
    )


def test_pos_embed_interpolation():
    from probpose_pytorch_tpu.compat.torch_import import interpolate_pos_embed

    rng = np.random.default_rng(2)
    pos = rng.normal(size=(1, 6 * 6, 8)).astype(np.float32)
    out = interpolate_pos_embed(pos, (6, 6), (12, 9))
    assert out.shape == (1, 12 * 9, 8)
    # identity when grids match
    same = interpolate_pos_embed(pos, (6, 6), (6, 6))
    np.testing.assert_array_equal(same, pos)
    # a constant embedding stays constant under resampling
    const = np.ones((1, 36, 8), np.float32)
    np.testing.assert_allclose(
        interpolate_pos_embed(const, (6, 6), (10, 7)), 1.0, rtol=1e-5
    )


def test_radio_input_stats():
    from probpose_pytorch_tpu.compat.torch_import import radio_input_stats

    sd = {
        "input_conditioner.norm_mean": np.array([[[0.48]], [[0.46]], [[0.41]]]),
        "input_conditioner.norm_std": np.array([[[0.27]], [[0.26]], [[0.28]]]),
    }
    mean, std = radio_input_stats(sd)
    assert mean.shape == (3,) and std.shape == (3,)
    assert radio_input_stats({}) is None


def test_radio_only_convert_then_train(tmp_path):
    """The 'given radio.pth, do X' one-command path (docs/MIGRATION.md §3):
    `compat.convert --radio-checkpoint` with NO head checkpoint writes a
    step-0 Orbax checkpoint (frozen imported trunk + fresh head), and the
    training CLI trains one real step from it."""
    import json

    from probpose_pytorch_tpu.compat.convert import main as convert_main
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig
    from probpose_pytorch_tpu.train.cli import main as train_main

    dim, depth, mlp, grid, regs = 64, 2, 128, 4, 2
    rng = np.random.default_rng(0)

    def t(*s):
        return torch.tensor(rng.normal(0, 0.02, s).astype(np.float32))

    sd = {
        "model.patch_embed.proj.weight": t(dim, 3, 16, 16),
        "model.patch_embed.proj.bias": t(dim),
        "model.cls_token": t(1, 1, dim),
        "model.reg_token": t(1, regs, dim),
        "model.pos_embed": t(1, 1 + regs + grid * grid, dim),
        "model.norm.weight": t(dim),
        "model.norm.bias": t(dim),
    }
    for i in range(depth):
        p = f"model.blocks.{i}."
        sd.update({
            p + "norm1.weight": t(dim), p + "norm1.bias": t(dim),
            p + "attn.qkv.weight": t(3 * dim, dim),
            p + "attn.qkv.bias": t(3 * dim),
            p + "attn.proj.weight": t(dim, dim),
            p + "attn.proj.bias": t(dim),
            p + "norm2.weight": t(dim), p + "norm2.bias": t(dim),
            p + "mlp.fc1.weight": t(mlp, dim), p + "mlp.fc1.bias": t(mlp),
            p + "mlp.fc2.weight": t(dim, mlp), p + "mlp.fc2.bias": t(dim),
        })
    # trainable token-MLP adapter (reference backbone.py:15-21)
    sd.update({
        "mlp.0.weight": t(24, dim), "mlp.0.bias": t(24),
        "mlp.2.weight": t(dim, 24), "mlp.2.bias": t(dim),
    })
    radio_pth = tmp_path / "radio.pth"
    torch.save(sd, radio_pth)

    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48), patch_size=16, num_keypoints=5,
            backbone="vit-nano", compute_dtype="float32",
            frozen_backbone=True, adapter_hidden=(24, dim),
            num_prefix_tokens=1 + regs, exact_gelu=True,
            deconv_out_channels=(16, 16), deconv_kernel_sizes=(4, 4),
            pool_sizes=((2, 2), (2, 2)), normalize=1.0,
        ),
        epochs=1, train_batch_size=4, val_batch_size=4, val_every=1000,
        dataset_format="synthetic", num_workers=1, resume=True,
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.save(cfg_path)

    out = tmp_path / "imported"
    convert_main([
        "--radio-checkpoint", str(radio_pth),
        "--radio-src-grid", str(grid), str(grid),
        "--radio-registers", str(regs),
        "--config", str(cfg_path),
        "--out", str(out),
    ])
    assert (out / "checkpoints").exists()
    assert (out / "config.json").exists()

    train_main([str(out), "--config", str(out / "config.json"),
                "--max-steps", "1"])
    lines = [
        json.loads(l)
        for l in (out / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [l["training/loss"] for l in lines if "training/loss" in l]
    assert losses and np.isfinite(losses[-1])

    # the frozen trunk must be byte-identical to the imported weights
    # after the training step (only adapter + head train)
    from probpose_pytorch_tpu.compat.torch_import import (
        import_radio_vit_params,
    )
    from probpose_pytorch_tpu.train import Trainer
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    trainer = Trainer.create(
        TrainConfig.load(out / "config.json"), steps_per_epoch=1
    )
    state = CheckpointManager(out / "checkpoints").restore(trainer.state)
    assert int(state.step) >= 1
    want = import_radio_vit_params(
        {k: v.numpy() for k, v in sd.items()},
        depth=depth, src_grid=(grid, grid), dst_grid=(4, 3),
        num_prefix_tokens=1, num_register_tokens=regs, prefix="model.",
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["block0"]["attn"]["qkv"]["kernel"]),
        np.asarray(want["block0"]["attn"]["qkv"]["kernel"]),
    )
