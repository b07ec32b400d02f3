"""Multi-device SPMD tests on the virtual 8-device CPU mesh:
data-parallel + tensor-parallel train step compiles, executes, and matches
the single-device step numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator
from probpose_pytorch_tpu.models.model import ModelConfig
from probpose_pytorch_tpu.models.vit import ViTConfig
from probpose_pytorch_tpu.parallel import (
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from probpose_pytorch_tpu.train import TrainConfig, Trainer

ViTConfig.PRESETS.setdefault(
    "vit-tiny-par", dict(embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0)
)


def _cfg(tmp_path):
    model = ModelConfig(
        img_size=(64, 48),
        num_keypoints=5,
        backbone="vit-tiny-par",
        compute_dtype="float32",
        deconv_out_channels=(32, 32),
        deconv_kernel_sizes=(4, 4),
        pool_sizes=((2, 2), (2, 2)),
        normalize=1.0,
    )
    return TrainConfig(
        model=model,
        epochs=1,
        train_batch_size=8,
        out_dir=str(tmp_path / "run"),
    )


def _batch(cfg):
    ds = SyntheticPoseDataset(8, cfg.model.img_size, cfg.model.num_keypoints)
    return next(iter(batch_iterator(ds, 8, num_workers=1)))


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, model_parallel=3)


def test_param_shardings_split_attention_and_mlp(tmp_path):
    cfg = _cfg(tmp_path)
    trainer = Trainer.create(cfg, steps_per_epoch=2)
    mesh = make_mesh(8, model_parallel=2)
    sh = param_shardings(trainer.state.params, mesh)
    flat = {
        jax.tree_util.keystr(p): s
        for p, s in jax.tree_util.tree_leaves_with_path(sh)
    }
    qkv = [v for k, v in flat.items() if "qkv" in k and "kernel" in k]
    assert qkv and all("model" in str(s.spec) for s in qkv)
    ln = [v for k, v in flat.items() if "norm1" in k]
    assert ln and all(s.spec == jax.sharding.PartitionSpec() for s in ln)


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step_matches_single_device(tmp_path, model_parallel):
    cfg = _cfg(tmp_path)
    trainer = Trainer.create(cfg, steps_per_epoch=2)
    batch = {k: jnp.asarray(v) for k, v in _batch(cfg).items()}

    # Single-device result.
    state1, metrics1 = trainer.train_step(trainer.state, batch)

    # Same compiled step over the mesh. Rebuild only the initial state (same
    # seed -> identical params); train_step donated the original.
    from probpose_pytorch_tpu.train.state import create_train_state

    H, W = cfg.model.img_size
    fresh = create_train_state(
        trainer.model, jax.random.PRNGKey(cfg.seed),
        jnp.zeros((1, H, W, 3), jnp.float32), trainer.tx,
    )
    mesh = make_mesh(8, model_parallel=model_parallel)
    sharded_state = fresh.replace(params=shard_params(fresh.params, mesh))
    sharded_batch = shard_batch(batch, mesh)
    state2, metrics2 = trainer.train_step(sharded_state, sharded_batch)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics2["loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(state1.params)[0]
    l2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_batch_sharding_layout(tmp_path):
    mesh = make_mesh(8, model_parallel=2)
    batch = shard_batch({"x": jnp.zeros((16, 4))}, mesh)
    shards = batch["x"].sharding
    assert shards.spec == jax.sharding.PartitionSpec("data")


def test_head_batch_spec():
    """Head-input reshard spec: batch-shard over every >1 mesh axis; None
    under dp-only meshes or indivisible batches."""
    from jax.sharding import PartitionSpec as P

    from probpose_pytorch_tpu.parallel import head_batch_spec

    assert head_batch_spec(None, 8) is None
    assert head_batch_spec(make_mesh(8, 1), 8) is None  # dp-only
    assert head_batch_spec(make_mesh(8, 2), 8) == P(("data", "model"))
    assert head_batch_spec(
        make_mesh(8, 2, pipeline_parallel=2), 8
    ) == P(("data", "model", "pipe"))
    assert head_batch_spec(make_mesh(8, 2), 4) is None  # 4 % 8 != 0


def test_head_reshard_on_tp_mesh(tmp_path):
    """On a tensor-parallel mesh the model reshards the trunk output so the
    head runs data-parallel over BOTH axes (no redundant head compute on
    the model axis): outputs match the no-mesh model exactly and carry the
    all-axes batch sharding."""
    from jax.sharding import PartitionSpec as P

    from probpose_pytorch_tpu.models.model import build_model

    cfg = _cfg(tmp_path).model
    mesh = make_mesh(8, model_parallel=2)
    m_ref = build_model(cfg)
    m_mesh = build_model(cfg, mesh=mesh)
    x = jnp.asarray(
        np.random.RandomState(3).rand(8, 64, 48, 3), jnp.float32
    )
    variables = m_ref.init(jax.random.PRNGKey(0), x)
    out_ref = m_ref.apply(variables, x)
    out = jax.jit(lambda v, a: m_mesh.apply(v, a))(
        variables, shard_batch(x, mesh)
    )
    for a, b in zip(out, out_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert out[0].sharding.spec == P(("data", "model"))


def test_hybrid_mesh_single_slice_fallback():
    from probpose_pytorch_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_data_parallel_serving(tmp_path):
    """TopDownPredictor over the 8-device mesh matches single-device output."""
    from probpose_pytorch_tpu.inference import TopDownPredictor
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig, Trainer

    cfg = _cfg(tmp_path)
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (8, 100, 120, 3), dtype=np.uint8)
    boxes = rng.uniform([0, 0, 40, 50], [50, 40, 70, 60], (8, 4)).astype(
        np.float32
    )
    single = TopDownPredictor(
        model=trainer.model, variables=variables,
        codec=trainer.encode_codec, input_size=cfg.model.img_size,
    )(frames, boxes)
    mesh = make_mesh(8, model_parallel=2)
    sharded = TopDownPredictor(
        model=trainer.model, variables=variables,
        codec=trainer.encode_codec, input_size=cfg.model.img_size,
        mesh=mesh,
    )(frames, boxes)
    np.testing.assert_allclose(
        single["keypoints"], sharded["keypoints"], atol=1e-4
    )


def test_trainer_fit_over_mesh(tmp_path):
    """Trainer.create(mesh=...) + fit(): batches shard automatically, state
    checkpoints and steps advance."""
    from probpose_pytorch_tpu.data import SyntheticPoseDataset, batch_iterator

    cfg = _cfg(tmp_path)
    mesh = make_mesh(8, model_parallel=2)
    trainer = Trainer.create(cfg, steps_per_epoch=2, mesh=mesh)
    ds = SyntheticPoseDataset(16, cfg.model.img_size, cfg.model.num_keypoints)

    def batches():
        return batch_iterator(ds, 8, num_workers=1)

    state = trainer.fit(batches, max_steps=2)
    assert int(state.step) == 2
    assert (tmp_path / "run" / "checkpoints").exists()


def _fused_cfg(tmp_path, **model_kw):
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.train import TrainConfig

    return TrainConfig(
        model=ModelConfig(
            img_size=(64, 48),
            num_keypoints=5,
            backbone="vit-nano",
            compute_dtype="float32",
            deconv_out_channels=(32, 32),
            deconv_kernel_sizes=(4, 4),
            pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
            attn_impl="fused",
            **model_kw,
        ),
        train_batch_size=4,
        out_dir=str(tmp_path / "run"),
    )


def test_checkpoint_restore_onto_mesh(tmp_path):
    """Orbax restore onto a mesh-sharded TrainState preserves both numerics
    and shardings (train/checkpoint.py CheckpointManager.restore takes the
    target state's shardings) — the resume-on-mesh path where silent
    resharding bugs live."""
    import dataclasses

    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    cfg = _cfg(tmp_path)
    mesh = make_mesh(8, model_parallel=2)
    trainer = Trainer.create(cfg, steps_per_epoch=2, mesh=mesh)
    batch = shard_batch(
        {k: jnp.asarray(v) for k, v in _batch(cfg).items()}, mesh
    )
    state, _ = trainer.train_step(trainer.state, batch)

    ckpt = CheckpointManager(tmp_path / "ck", keep=1)
    ckpt.save(1, state)

    # Fresh trainer with a DIFFERENT seed: restore must overwrite its params
    # while keeping the mesh shardings of the target state.
    trainer2 = Trainer.create(
        dataclasses.replace(
            cfg, seed=cfg.seed + 1, out_dir=str(tmp_path / "run2")
        ),
        steps_per_epoch=2,
        mesh=mesh,
    )
    restored = ckpt.restore(trainer2.state)
    ckpt.close()

    assert int(restored.step) == 1
    saved_leaves = jax.tree_util.tree_leaves_with_path(state.params)
    restored_leaves = jax.tree_util.tree_leaves_with_path(restored.params)
    assert len(saved_leaves) == len(restored_leaves)
    n_model_sharded = 0
    for (path_s, leaf_s), (path_r, leaf_r) in zip(
        saved_leaves, restored_leaves
    ):
        assert path_s == path_r
        # numerics survive the round trip exactly
        np.testing.assert_array_equal(np.asarray(leaf_s), np.asarray(leaf_r))
        # shardings survive (restore did not silently replicate);
        # compare specs modulo trailing-None normalization
        def _norm(spec):
            t = tuple(spec)
            while t and t[-1] is None:
                t = t[:-1]
            return t

        assert _norm(leaf_r.sharding.spec) == _norm(leaf_s.sharding.spec), (
            path_r
        )
        if "model" in str(leaf_r.sharding.spec):
            n_model_sharded += 1
    assert n_model_sharded > 0  # tp shardings present, not all-replicated

    # the restored state trains on the mesh
    state2, metrics = trainer2.train_step(restored, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_fused_attention_mesh_policy(tmp_path, capsys):
    """attn_impl='fused' on a model-parallel mesh upgrades to 'fused_tp'
    (head-major qkv layout, heads shard over the model axis) when heads
    divide the axis, and downgrades to einsum when they don't. Data-parallel
    meshes KEEP the kernel — it rides shard_map over the data axis
    (ops/pallas/attention_kernel.py:sharded_packed_attention)."""
    import dataclasses

    from probpose_pytorch_tpu.parallel import make_mesh
    from probpose_pytorch_tpu.train import Trainer

    cfg = _fused_cfg(tmp_path)
    mesh = make_mesh(4, model_parallel=2)  # vit-nano: 2 heads % 2 == 0
    trainer = Trainer.create(cfg, steps_per_epoch=2, mesh=mesh)
    assert trainer.cfg.model.attn_impl == "fused_tp"
    assert "fused_tp" in capsys.readouterr().out
    # heads (2) don't divide the model axis (4): einsum fallback.
    mesh4 = make_mesh(8, model_parallel=4)
    trainer4 = Trainer.create(
        dataclasses.replace(cfg, out_dir=str(tmp_path / "run4")),
        steps_per_epoch=2,
        mesh=mesh4,
    )
    assert trainer4.cfg.model.attn_impl == "einsum"
    assert "einsum" in capsys.readouterr().out
    # dp-only mesh: fused survives, and the backbone carries the mesh so
    # attention wraps itself in shard_map.
    mesh_dp = make_mesh(4, model_parallel=1)
    trainer_dp = Trainer.create(
        dataclasses.replace(cfg, out_dir=str(tmp_path / "run2")),
        steps_per_epoch=2,
        mesh=mesh_dp,
    )
    assert trainer_dp.cfg.model.attn_impl == "fused"
    assert trainer_dp.model.backbone.mesh is mesh_dp
    # no mesh: the fused kernel config is untouched
    trainer_1 = Trainer.create(
        dataclasses.replace(cfg, out_dir=str(tmp_path / "run3")),
        steps_per_epoch=2,
    )
    assert trainer_1.cfg.model.attn_impl == "fused"
    assert trainer_1.model.backbone.mesh is None


def test_sharded_packed_attention_matches_einsum():
    """shard_map-wrapped kernel == plain einsum attention, forward and
    gradient, on the 8-device dp mesh (interpret mode on CPU)."""
    from probpose_pytorch_tpu.ops.pallas import sharded_packed_attention

    B, N, H, d = 8, 12, 2, 16
    C = H * d
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)).astype(np.float32))
    mesh = make_mesh(8, model_parallel=1)

    def einsum_ref(x):
        q, k, v = jnp.split(x, 3, axis=-1)
        q, k, v = (t.reshape(B, N, H, d) for t in (q, k, v))
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(d)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(B, N, C)

    def kernel(x):
        return sharded_packed_attention(x, H, mesh, interpret=True)

    sharded_in = jax.device_put(
        qkv, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    )
    out = jax.jit(kernel)(sharded_in)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(einsum_ref(qkv)), atol=1e-5
    )
    # the output stays batch-sharded — no all-gather snuck in
    assert out.sharding.spec == jax.sharding.PartitionSpec("data")

    g_k = jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(kernel(x)))))(sharded_in)
    g_r = jax.grad(lambda x: jnp.sum(jnp.sin(einsum_ref(x))))(qkv)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), atol=1e-5)


def test_fused_train_step_on_dp_mesh_matches_single_device(
    tmp_path, monkeypatch
):
    """Full train step with the fused attention kernel under shard_map on the
    8-device dp mesh == the single-device fused step (interpret mode)."""
    monkeypatch.setenv("PROBPOSE_PALLAS_INTERPRET", "1")
    from probpose_pytorch_tpu.train import Trainer

    cfg = _fused_cfg(tmp_path)
    ds = SyntheticPoseDataset(8, cfg.model.img_size, cfg.model.num_keypoints)
    batch = {
        k: jnp.asarray(v)
        for k, v in next(iter(batch_iterator(ds, 8, num_workers=1))).items()
    }

    trainer1 = Trainer.create(cfg, steps_per_epoch=2)
    assert trainer1.cfg.model.attn_impl == "fused"
    _, metrics1 = trainer1.train_step(trainer1.state, batch)

    import dataclasses

    mesh = make_mesh(8, model_parallel=1)
    trainer8 = Trainer.create(
        dataclasses.replace(cfg, out_dir=str(tmp_path / "dp")),
        steps_per_epoch=2,
        mesh=mesh,
    )
    assert trainer8.cfg.model.attn_impl == "fused"
    state8, metrics8 = trainer8.train_step(
        trainer8.state, shard_batch(batch, mesh)
    )
    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics8["loss"]), rtol=1e-5
    )
    jax.block_until_ready(state8.params)


def test_sharded_packed_attention_tp_matches_einsum():
    """Tensor-parallel kernel: head-major qkv shard_mapped over
    (data, model) == the head-major einsum reference, forward and gradient.
    The model axis splits heads; no collectives are added by the wrapper."""
    from probpose_pytorch_tpu.ops.pallas import sharded_packed_attention

    B, N, H, d = 8, 12, 2, 16
    C = H * d
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)).astype(np.float32))
    mesh = make_mesh(8, model_parallel=2)  # {data: 4, model: 2}

    def einsum_ref(x):
        # head-major layout: [h0(q|k|v) | h1(q|k|v) | ...]
        q, k, v = jnp.moveaxis(x.reshape(B, N, H, 3, d), 3, 0)
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(d)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(B, N, C)

    def kernel(x):
        return sharded_packed_attention(
            x, H, mesh, axis="data", model_axis="model", interpret=True
        )

    P = jax.sharding.PartitionSpec
    sharded_in = jax.device_put(
        qkv, jax.sharding.NamedSharding(mesh, P("data", None, "model"))
    )
    out = jax.jit(kernel)(sharded_in)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(einsum_ref(qkv)), atol=1e-5
    )
    # output stays (batch, model)-sharded — no all-gather snuck in
    assert out.sharding.spec == P("data", None, "model")

    g_k = jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(kernel(x)))))(sharded_in)
    g_r = jax.grad(lambda x: jnp.sum(jnp.sin(einsum_ref(x))))(qkv)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), atol=1e-5)


def test_fused_tp_train_step_on_tp_mesh_matches_single_device(
    tmp_path, monkeypatch
):
    """Full train step with attn_impl='fused' on the (data=4, model=2) mesh —
    auto-upgraded to 'fused_tp', heads sharded over the model axis — matches
    the single-device 'fused_tp' step numerically (same init rng => identical
    head-major params)."""
    monkeypatch.setenv("PROBPOSE_PALLAS_INTERPRET", "1")
    import dataclasses

    from probpose_pytorch_tpu.train import Trainer

    cfg = _fused_cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, attn_impl="fused_tp"),
        train_batch_size=8,
    )
    ds = SyntheticPoseDataset(8, cfg.model.img_size, cfg.model.num_keypoints)
    batch = {
        k: jnp.asarray(v)
        for k, v in next(iter(batch_iterator(ds, 8, num_workers=1))).items()
    }

    trainer1 = Trainer.create(cfg, steps_per_epoch=2)
    _, metrics1 = trainer1.train_step(trainer1.state, batch)

    mesh = make_mesh(8, model_parallel=2)
    cfg_tp = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, attn_impl="fused"),
        out_dir=str(tmp_path / "tp"),
    )
    trainer_tp = Trainer.create(cfg_tp, steps_per_epoch=2, mesh=mesh)
    assert trainer_tp.cfg.model.attn_impl == "fused_tp"
    state_tp = trainer_tp.state.replace(
        params=shard_params(trainer_tp.state.params, mesh)
    )
    state_tp2, metrics_tp = trainer_tp.train_step(
        state_tp, shard_batch(batch, mesh)
    )
    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics_tp["loss"]), rtol=1e-5
    )
    jax.block_until_ready(state_tp2.params)


def test_zero1_opt_state_sharding(tmp_path):
    """shard_opt_state=True (ZeRO-1 over the data axis): Adam moments shard
    their largest axis over "data", the layout survives the donated train
    step, and two-step training matches the unsharded trainer exactly (the
    second step's loss depends on the first update's moments)."""
    import dataclasses

    from jax.sharding import NamedSharding

    cfg = _cfg(tmp_path)
    batch = {k: jnp.asarray(v) for k, v in _batch(cfg).items()}

    trainer_ref = Trainer.create(cfg, steps_per_epoch=4)
    s1, _ = trainer_ref.train_step(trainer_ref.state, batch)
    _, m_ref = trainer_ref.train_step(s1, batch)

    mesh = make_mesh(8, model_parallel=1)
    cfg_z = dataclasses.replace(
        cfg, shard_opt_state=True, out_dir=str(tmp_path / "zero1")
    )
    trainer = Trainer.create(cfg_z, steps_per_epoch=4, mesh=mesh)

    def sharded_moment_leaves(opt_state):
        return [
            leaf
            for leaf in jax.tree_util.tree_leaves(opt_state)
            if isinstance(leaf, jax.Array) and leaf.size >= 1024
        ]

    moments = sharded_moment_leaves(trainer.state.opt_state)
    assert moments, "expected large moment leaves in the optimizer state"
    for leaf in moments:
        assert isinstance(leaf.sharding, NamedSharding)
        assert "data" in tuple(leaf.sharding.spec)
        # each device holds 1/dp of the leaf
        local = leaf.addressable_shards[0].data.size
        assert local * 8 == leaf.size

    sb = shard_batch(batch, mesh)
    z1, _ = trainer.train_step(trainer.state, sb)
    for leaf in sharded_moment_leaves(z1.opt_state):
        assert "data" in tuple(leaf.sharding.spec)
    _, m_z = trainer.train_step(z1, sb)
    np.testing.assert_allclose(
        float(m_z["loss"]), float(m_ref["loss"]), rtol=1e-5
    )


def test_tp_mesh_predictor_matches_single_device(tmp_path, monkeypatch):
    """Tensor-parallel serving: TopDownPredictor on a (data=2, model=2) mesh
    auto-upgrades the fused backbone to 'fused_tp' (converting the qkv-major
    variables to head-major before Megatron sharding) and matches the
    single-device fused predictor numerically."""
    monkeypatch.setenv("PROBPOSE_PALLAS_INTERPRET", "1")
    from probpose_pytorch_tpu.inference import TopDownPredictor

    cfg = _fused_cfg(tmp_path)
    trainer = Trainer.create(cfg, steps_per_epoch=1)
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    kw = dict(
        codec=trainer.encode_codec, input_size=cfg.model.img_size
    )
    single = TopDownPredictor(
        model=trainer.model, variables=variables, **kw
    )
    mesh = make_mesh(4, model_parallel=2)  # {data: 2, model: 2}
    tp = TopDownPredictor(
        model=trainer.model, variables=variables, mesh=mesh, **kw
    )
    assert tp.model.backbone.attn_impl == "fused_tp"
    assert tp.model.mesh is mesh  # head reshards over every axis
    # Megatron sharding actually applied to the converted qkv kernel
    qkv_sh = tp.variables["params"]["backbone"]["block0"]["attn"]["qkv"][
        "kernel"
    ].sharding
    assert qkv_sh.spec == jax.sharding.PartitionSpec(None, "model")

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (4, 80, 96, 3), dtype=np.uint8)
    boxes = rng.uniform([0, 0, 30, 40], [40, 30, 60, 50], (4, 4)).astype(
        np.float32
    )
    out1 = single(frames, boxes)
    out2 = tp(frames, boxes)
    assert set(out1) == set(out2)
    for k in out1:
        np.testing.assert_allclose(
            out2[k], out1[k], rtol=1e-4, atol=1e-4, err_msg=k
        )


@pytest.mark.parametrize("optimizer", ["lion", "adafactor"])
def test_optimizer_families_on_dp_mesh(tmp_path, optimizer):
    """lion / adafactor train identically on an 8-way dp mesh and
    single-device (two steps, so the second depends on the first update's
    optimizer state), including with ZeRO-1 opt-state sharding (adafactor's
    factored vectors simply stay replicated below the size cutoff)."""
    import dataclasses

    from probpose_pytorch_tpu.train.config import OptimConfig

    cfg = dataclasses.replace(
        _cfg(tmp_path),
        optim=OptimConfig(peak_lr=1e-4, optimizer=optimizer),
    )
    batch = {k: jnp.asarray(v) for k, v in _batch(cfg).items()}

    trainer_ref = Trainer.create(cfg, steps_per_epoch=4)
    s1, _ = trainer_ref.train_step(trainer_ref.state, batch)
    _, m_ref = trainer_ref.train_step(s1, batch)

    mesh = make_mesh(8, model_parallel=1)
    cfg_m = dataclasses.replace(
        cfg, shard_opt_state=True, out_dir=str(tmp_path / "mesh")
    )
    trainer = Trainer.create(cfg_m, steps_per_epoch=4, mesh=mesh)
    sb = shard_batch(batch, mesh)
    z1, _ = trainer.train_step(trainer.state, sb)
    _, m_mesh = trainer.train_step(z1, sb)
    np.testing.assert_allclose(
        float(m_mesh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )


def test_simcc_train_step_on_dp_mesh(tmp_path):
    """The SimCC family trains identically on an 8-way dp mesh and
    single-device (the codec/loss path is mesh-transparent)."""
    import dataclasses

    cfg = _cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, head_type="simcc")
    )
    batch = {k: jnp.asarray(v) for k, v in _batch(cfg).items()}

    trainer_ref = Trainer.create(cfg, steps_per_epoch=4)
    _, m_ref = trainer_ref.train_step(trainer_ref.state, batch)

    mesh = make_mesh(8, model_parallel=1)
    cfg_m = dataclasses.replace(cfg, out_dir=str(tmp_path / "mesh"))
    trainer = Trainer.create(cfg_m, steps_per_epoch=4, mesh=mesh)
    _, m_mesh = trainer.train_step(trainer.state, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m_mesh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
