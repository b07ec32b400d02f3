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


def test_checkpoint_cross_layout_resume(tmp_path):
    """A checkpoint saved by a single-device 'fused' (qkv-major) run resumes
    onto a tensor-parallel 'fused_tp' trainer EXACTLY: the sidecar layout
    metadata triggers a column permutation of params AND the Adam moments
    (train/loop.py:restore_state_with_layout), so the post-resume step loss
    equals the uninterrupted single-device run's."""
    import dataclasses

    from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator
    from probpose_pytorch_tpu.parallel import make_mesh, shard_batch
    from probpose_pytorch_tpu.train import (
        TrainConfig,
        Trainer,
        layout_metadata,
        restore_state_with_layout,
    )
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    cfg = TrainConfig(
        model=_cfg(attn_impl="fused"),
        train_batch_size=8,
        out_dir=str(tmp_path / "run"),
    )
    ds = SyntheticPoseDataset(8, cfg.model.img_size, cfg.model.num_keypoints)
    batch = {
        k: jnp.asarray(v)
        for k, v in next(iter(batch_iterator(ds, 8, num_workers=1))).items()
    }

    trainer1 = Trainer.create(cfg, steps_per_epoch=2)
    state1, _ = trainer1.train_step(trainer1.state, batch)
    ckpt = CheckpointManager(tmp_path / "ck", keep=1)
    ckpt.save(1, state1, metadata=layout_metadata(trainer1.cfg))
    assert ckpt.read_metadata()["qkv_layout"] == "qkv_major"
    _, m_ref = trainer1.train_step(state1, batch)  # uninterrupted step 2

    mesh = make_mesh(8, model_parallel=2)
    trainer_tp = Trainer.create(
        dataclasses.replace(cfg, out_dir=str(tmp_path / "tp")),
        steps_per_epoch=2,
        mesh=mesh,
    )
    assert trainer_tp.cfg.model.attn_impl == "fused_tp"
    restored = restore_state_with_layout(
        ckpt, trainer_tp.state, trainer_tp.cfg
    )
    assert int(restored.step) == 1
    _, m_tp = trainer_tp.train_step(restored, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_tp["loss"]), rtol=1e-5
    )
