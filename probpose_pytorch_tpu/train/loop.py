"""The training loop: one fused jitted step (encode -> forward -> loss ->
backward -> update), an eval step with accuracies, and `fit()`.

Rebuild of /root/reference/probpose/train.py with the three host/device
round-trips of the reference's step (target encode in DataLoader workers,
dataset.py:128; OKS target decode on CPU, loss.py:550-640) eliminated: the
entire step is one XLA program, data-parallel over a mesh (SURVEY.md §7
step 5-6; BASELINE config #5).
"""

from __future__ import annotations

import math
import signal
import threading
import time
from dataclasses import dataclass
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from probpose_pytorch_tpu.codec import ArgMaxProbMap, Codec, ProbMap
from probpose_pytorch_tpu.losses import ProbPoseLoss
from probpose_pytorch_tpu.models.model import build_model
from probpose_pytorch_tpu.parallel.sharding import shard_batch, shard_params
from probpose_pytorch_tpu.train.checkpoint import CheckpointManager
from probpose_pytorch_tpu.train.config import TrainConfig
from probpose_pytorch_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
)
from probpose_pytorch_tpu.utils.logging import MetricsLogger

__all__ = [
    "build_codecs",
    "make_train_step",
    "make_train_step_1f1b",
    "make_eval_step",
    "Trainer",
]


def qkv_layout_of(model_cfg) -> str:
    """Semantic layout of the attention qkv kernel/bias columns for a model
    config: 'fused_tp' packs them head-major (compat/layouts.py); every other
    attn_impl keeps the torch/timm qkv-major order."""
    return (
        "head_major" if model_cfg.attn_impl == "fused_tp" else "qkv_major"
    )


def trunk_layout_of(model_cfg) -> str:
    """'stacked' when the trunk runs pipeline-parallel (block params stacked
    along a leading depth axis, models/vit.py:_StackedBlockParams);
    'per_block' (block0..block{D-1} subtrees) otherwise."""
    return "stacked" if model_cfg.pp_stages > 1 else "per_block"


def layout_metadata(cfg: TrainConfig) -> dict:
    """Checkpoint sidecar metadata recording the qkv and trunk layouts, so a
    restore onto a trainer with another layout (e.g. a single-device 'fused'
    run resumed onto a tensor-parallel 'fused_tp' mesh, or onto a
    pipeline-parallel mesh) converts instead of silently misinterpreting the
    columns / failing on the tree structure."""
    from probpose_pytorch_tpu.models.vit import ViTConfig

    heads = ViTConfig.PRESETS.get(cfg.model.backbone, {}).get("num_heads", 0)
    return {
        "qkv_layout": qkv_layout_of(cfg.model),
        "trunk_layout": trunk_layout_of(cfg.model),
        "num_heads": heads,
        "backbone": cfg.model.backbone,
    }


def restore_state_with_layout(
    ckpt: CheckpointManager,
    target_state: TrainState,
    cfg: TrainConfig,
    step: int | None = None,
) -> TrainState:
    """CheckpointManager.restore + automatic qkv-layout conversion.

    Reads the checkpoint's sidecar metadata (checkpoints without one are all
    qkv-major — they predate 'fused_tp') and, when the stored layout differs
    from the trainer's, permutes the qkv kernels/biases across the whole
    TrainState — params, EMA, and the optimizer's Adam moments alike, so the
    resume is numerically exact, not merely forward-correct. Converted leaves
    are pinned back to the restored shardings (mesh placement survives)."""
    meta = ckpt.read_metadata(step)
    own_qkv = qkv_layout_of(cfg.model)
    stored_qkv = meta.get("qkv_layout", "qkv_major")
    own_trunk = trunk_layout_of(cfg.model)
    stored_trunk = meta.get("trunk_layout", "per_block")
    heads = meta.get("num_heads") or layout_metadata(cfg)["num_heads"]

    if stored_trunk != own_trunk:
        # Structural mismatch: the checkpoint's tree cannot restore into
        # `target_state` directly. Restore into a host-side target built in
        # the STORED structure (converting the fresh target's trunks — the
        # conversion pulls trunk leaves to host numpy), convert back, then
        # re-pin every leaf to the target's sharding.
        from probpose_pytorch_tpu.compat import (
            convert_qkv_layout,
            convert_trunk_layout,
        )

        stored_target = convert_trunk_layout(
            target_state, own_trunk, stored_trunk
        )
        restored = ckpt.restore(stored_target, step=step)
        if stored_qkv != own_qkv and heads:
            restored = convert_qkv_layout(
                restored, heads, stored_qkv, own_qkv
            )
            print(
                f"[checkpoint] converted qkv layout: {stored_qkv} -> "
                f"{own_qkv}"
            )
        converted = convert_trunk_layout(restored, stored_trunk, own_trunk)
        # Re-pin to the target's shardings, replicating leaves the target
        # never meshed over the target's mesh (same convention as
        # CheckpointManager.restore — a mixed committed placement would
        # fail the next jitted step with 'incompatible devices').
        from jax.sharding import NamedSharding, PartitionSpec

        target_mesh = None
        for leaf in jax.tree_util.tree_leaves(target_state):
            sh = getattr(leaf, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh.size > 1:
                target_mesh = sh.mesh
                break

        def pin(c, t):
            sh = getattr(t, "sharding", None)
            if target_mesh is not None and not isinstance(sh, NamedSharding):
                sh = NamedSharding(target_mesh, PartitionSpec())
            return jax.device_put(c, sh) if sh is not None else jnp.asarray(c)

        converted = jax.tree_util.tree_map(pin, converted, target_state)
        print(
            f"[checkpoint] converted trunk layout: {stored_trunk} -> "
            f"{own_trunk}"
        )
        return converted

    restored = ckpt.restore(target_state, step=step)
    if stored_qkv == own_qkv or not heads:
        return restored
    from probpose_pytorch_tpu.compat import convert_qkv_layout

    converted = convert_qkv_layout(restored, heads, stored_qkv, own_qkv)
    converted = jax.tree_util.tree_map(
        lambda c, r: c if c is r else jax.device_put(c, r.sharding),
        converted,
        restored,
    )
    print(f"[checkpoint] converted qkv layout: {stored_qkv} -> {own_qkv}")
    return converted


def build_codecs(cfg: TrainConfig) -> tuple[Any, Any]:
    """(encode codec, fast loss-decode codec) — the reference's pairing of a
    ProbMap data codec with an ArgMaxProbMap loss decoder (train.py:46-48).
    The SimCC family uses one codec for both roles (its argmax+parabola
    decode IS the fast decode)."""
    sigmas = np.full(cfg.model.num_keypoints, cfg.kpt_sigma_value, np.float32)
    img_wh = (cfg.model.img_size[1], cfg.model.img_size[0])
    if cfg.model.head_type == "simcc":
        from probpose_pytorch_tpu.codec_simcc import SimCCCodec, SimCCLabel

        codec = SimCCCodec(
            SimCCLabel(
                img_wh,
                split_ratio=cfg.model.simcc_split_ratio,
                sigma=cfg.model.simcc_sigma,
                sigmas=sigmas,
            )
        )
        return codec, codec
    W, H = cfg.model.heatmap_size
    encode_codec = Codec(
        ProbMap(img_wh, (W, H), sigmas=sigmas, sigma=cfg.sigma)
    )
    fast_codec = Codec(
        ArgMaxProbMap(img_wh, (W, H), sigmas=sigmas, sigma=cfg.decode_sigma)
    )
    return encode_codec, fast_codec


def _prepare_images(batch: dict[str, Any]) -> jax.Array:
    img = batch["image"]
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    return img


def state_is_finite(state: TrainState) -> bool:
    """True when every param / BN-stat / EMA leaf is finite.

    Checkpoint hygiene: `optax.apply_if_finite` deliberately lets NaNs
    through after `max_nonfinite_skips` consecutive bad steps, and a NaN
    forward can poison BatchNorm running stats outside the optimizer
    entirely — saving such a state destroys the recovery path, because the
    keep-N rotation evicts the clean checkpoints and the non-finite-loss
    monitor then restores garbage. One device round-trip per call; callers
    are checkpoint-save sites, so the cost is per-save, not per-step."""
    leaves = jax.tree_util.tree_leaves(
        (state.params, state.batch_stats, state.ema_params)
    )
    ok = jnp.stack(
        [jnp.all(jnp.isfinite(l.astype(jnp.float32))) for l in leaves]
    ).all()
    return bool(ok)


def _encode_targets(codec: Any, batch: dict[str, Any]) -> dict[str, Any]:
    enc = codec.encode(
        batch["keypoints"],
        batch["keypoints_visible"],
        keypoints_visibility=batch["keypoints_visibility"],
    )
    gt = dict(
        in_image=enc["in_image"],
        keypoints_visible=batch["keypoints_visible"],
        keypoints_visibility=batch["keypoints_visibility"],
        keypoint_weights=enc["keypoint_weights"],
    )
    if "heatmaps" in enc:
        gt["heatmaps"] = enc["heatmaps"]
    else:  # SimCC family: per-axis bin labels
        gt["x_labels"] = enc["x_labels"]
        gt["y_labels"] = enc["y_labels"]
    return gt


def _load_teacher(cfg: TrainConfig) -> tuple[Any, Any]:
    """Build the frozen distillation teacher: (model, variables).

    The teacher can be any architecture as long as its crop size, keypoint
    count, and heatmap geometry match the student's (the MSE targets must
    share shapes) — e.g. a trained ViT-L teaching a ViT-S student."""
    from pathlib import Path

    d = cfg.distill
    ckpt_dir = Path(d.teacher_checkpoint)
    config_path = (
        Path(d.teacher_config)
        if d.teacher_config
        else ckpt_dir.parent / "config.json"
    )
    tcfg = TrainConfig.load(config_path)
    if tcfg.model.head_type != cfg.model.head_type:
        raise ValueError(
            "distillation teacher/student head families must match: "
            f"teacher {tcfg.model.head_type!r} vs student "
            f"{cfg.model.head_type!r}"
        )
    if tcfg.model.img_size != cfg.model.img_size or (
        tcfg.model.num_keypoints != cfg.model.num_keypoints
    ):
        raise ValueError(
            "distillation teacher geometry mismatch: teacher "
            f"img_size={tcfg.model.img_size} K={tcfg.model.num_keypoints} "
            f"vs student img_size={cfg.model.img_size} "
            f"K={cfg.model.num_keypoints}"
        )
    teacher_trainer = Trainer.create(tcfg, steps_per_epoch=1)
    tstate = restore_state_with_layout(
        CheckpointManager(ckpt_dir), teacher_trainer.state, tcfg
    )
    params = (
        tstate.ema_params
        if (d.ema_teacher and tstate.ema_params is not None)
        else tstate.params
    )
    tvars = {"params": params, "batch_stats": tstate.batch_stats}
    return teacher_trainer.model, tvars


def _augment_encode(
    cfg: TrainConfig,
    encode_codec: Codec,
    base_key: jax.Array,
    hb_base_key: jax.Array,
    step: jax.Array,
    batch: dict[str, Any],
) -> tuple[jax.Array, dict[str, Any]]:
    """Shared train-step preamble: frame-mode cropping, augmentation, and
    on-device target encoding. Returns (images, gt) — identical between the
    single-program step (make_train_step) and the 1F1B pipelined step."""
    aug = cfg.augment
    H, W = cfg.model.img_size
    if "frame" in batch:
        from probpose_pytorch_tpu.ops.augment import augment_boxes
        from probpose_pytorch_tpu.ops.preprocess import (
            crop_resize,
            transform_keypoints,
        )

        boxes = jnp.asarray(batch["box"], jnp.float32)
        if aug is not None and aug.half_body_prob > 0:
            from probpose_pytorch_tpu.ops.augment import half_body_boxes

            # Separate root key (seed-derived): the 2*step / 2*step+1
            # fold_in domains are taken by flip/rot/color and box
            # jitter, and any arithmetic third domain collides with
            # one of them at some step.
            kh = jax.random.fold_in(hb_base_key, step)
            boxes = half_body_boxes(
                kh,
                boxes,
                jnp.asarray(batch["keypoints"], jnp.float32),
                jnp.asarray(batch["keypoints_visibility"]),
                aug,
                aspect=W / H,
            )
        if aug is not None and (aug.scale_jitter or aug.shift_jitter):
            kb = jax.random.fold_in(base_key, step * 2 + 1)
            boxes = augment_boxes(kb, boxes, aug)
        images = crop_resize(
            batch["frame"], boxes, (H, W), cfg.preprocess_method
        )
        batch = dict(
            batch,
            keypoints=transform_keypoints(
                jnp.asarray(batch["keypoints"], jnp.float32),
                boxes,
                (H, W),
            ),
        )
    else:
        images = _prepare_images(batch)
    if aug is not None and aug.enabled:
        from probpose_pytorch_tpu.ops.augment import (
            color_jitter,
            flip_crops_and_keypoints,
            rotate_crops_and_keypoints,
        )

        # fold_in domain 2*step (box jitter above uses 2*step+1): the
        # two per-step streams must never share a fold_in index or
        # flip/rot/color draws at step 2t+1 correlate with the box
        # jitter drawn at step t.
        key = jax.random.fold_in(base_key, step * 2)
        k_flip, k_rot, k_color = jax.random.split(key, 3)
        images, kpts, vis, visibility = flip_crops_and_keypoints(
            k_flip,
            images,
            batch["keypoints"],
            batch["keypoints_visible"],
            batch["keypoints_visibility"],
            aug,
        )
        images, kpts = rotate_crops_and_keypoints(k_rot, images, kpts, aug)
        images = color_jitter(k_color, images, aug)
        batch = dict(
            batch,
            keypoints=kpts,
            keypoints_visible=vis,
            keypoints_visibility=visibility,
        )
    return images, _encode_targets(encode_codec, batch)


def make_train_step(
    model,
    encode_codec: Codec,
    loss_fn: ProbPoseLoss,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    teacher: tuple[Any, Any] | None = None,
) -> Callable:
    """Build the fused train step: (state, batch) -> (state, metrics).

    Two batch layouts are accepted:
      * crop mode — image (B,H,W,3) uint8/f32 crops, keypoints (B,K,2) in
        crop space;
      * frame mode — frame (B,Hs,Ws,3) full frames + box (B,4) xywh +
        keypoints (B,K,2) in FRAME space. Cropping (and box-jitter
        augmentation, when configured) then happens **inside the step** on
        device — the fully fused preprocess path (BASELINE north star).
    Plus keypoints_visible / keypoints_visibility (B,K) in both modes.
    """
    weights = cfg.loss_weights.as_dict()
    base_key = jax.random.PRNGKey(cfg.seed)
    hb_base_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 2**31 - 1)

    def step(state: TrainState, batch: dict[str, Any]):
        images, gt = _augment_encode(
            cfg, encode_codec, base_key, hb_base_key, state.step, batch
        )

        def compute_loss(params):
            pred, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            losses = loss_fn(
                gt,
                pred,
                learn_heatmaps_from_zeros=cfg.learn_heatmaps_from_zeros,
            )
            total = sum(losses[k] * w for k, w in weights.items())
            if teacher is not None:
                # knowledge distillation: MSE toward the frozen teacher's
                # heatmaps and scalar branches on the SAME (augmented)
                # crops, in the same compiled step — no extra host round
                # trips. Teacher variables ride the closure (replicated on
                # meshes, like the loss constants).
                tmodel, tvars = teacher
                d = cfg.distill
                tpred = jax.tree_util.tree_map(
                    jax.lax.stop_gradient,
                    tmodel.apply(tvars, images, train=False),
                )
                mse = lambda a, b: jnp.mean(
                    (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2
                )
                loc_s, loc_t = pred[0], tpred[0]
                if isinstance(loc_s, (tuple, list)):
                    # SimCC family: (x_logits, y_logits) localization pair.
                    d_hm = sum(
                        mse(a, b) for a, b in zip(loc_s, loc_t)
                    ) / len(loc_s)
                else:
                    d_hm = mse(loc_s, loc_t)
                d_sc = (
                    mse(pred[1], tpred[1])
                    + mse(pred[2], tpred[2])
                    + mse(pred[3], tpred[3])
                ) / 3.0
                losses = dict(
                    losses, distill_heatmap=d_hm, distill_scalar=d_sc
                )
                total = total + d.weight * (
                    d.heatmap_weight * d_hm + d.scalar_weight * d_sc
                )
            return total, (losses, updates)

        (total, (losses, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(
            grads, tx, ema_decay=cfg.optim.ema_decay
        ).replace(batch_stats=updates["batch_stats"])
        metrics = {"loss": total, **{f"loss/{k}": v for k, v in losses.items()}}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def make_train_step_1f1b(
    model,
    encode_codec: Codec,
    loss_fn: ProbPoseLoss,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    mesh: Mesh,
) -> Callable:
    """The flagship train step scheduled through the 1F1B pipeline engine
    (parallel/pipeline.py:pipeline_1f1b) — TrainConfig.pipeline_schedule
    '1f1b' on a mesh whose "pipe" axis exceeds 1.

    Structure (vs make_train_step's single model.apply):
      1. the shared preamble (_augment_encode) runs unchanged;
      2. patch embed runs as its own jax.vjp'd segment
         (ViTBackbone segment="embed");
      3. the trunk blocks + final norm + head + composite loss run inside
         pipeline_1f1b — the head and ProbPoseLoss are the engine's
         last-stage `loss_fn`, so backward for microbatch i starts as soon
         as its loss exists (O(S) activation memory instead of GPipe's
         O(M) per stage);
      4. the engine's dx cotangent chains into the embed segment's vjp and
         the two outer-gradient trees sum (disjoint support);
      5. the usual optimizer/EMA update applies to the reassembled grads.

    Semantics deltas vs the GPipe path, both inherent to pipelined losses:
      * head BatchNorm normalizes with per-microbatch batch statistics
        (running stats update with the microbatch-averaged estimate) —
        gradient-accumulation semantics;
      * loss terms whose reduction is not a plain per-example mean (masked
        OKS means) are averaged per microbatch then across microbatches.
    Knowledge distillation is not composed with this schedule (the teacher
    would have to ride every pipeline stage); Trainer.create rejects it.
    """
    weights = cfg.loss_weights.as_dict()
    base_key = jax.random.PRNGKey(cfg.seed)
    hb_base_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 2**31 - 1)
    from probpose_pytorch_tpu.models.vit import ViTConfig, pp_block_fns
    from probpose_pytorch_tpu.parallel.pipeline import pipeline_1f1b

    vit_kw = ViTConfig.PRESETS[cfg.model.backbone]
    tp = dict(mesh.shape).get("model", 1)
    block_fn, seq_block_fn, param_specs = pp_block_fns(
        num_heads=vit_kw["num_heads"],
        mlp_ratio=vit_kw["mlp_ratio"],
        embed_dim=vit_kw["embed_dim"],
        dtype=cfg.model.dtype,
        softmax_dtype=jnp.dtype(cfg.model.softmax_dtype),
        attn_impl=cfg.model.attn_impl,
        mlp_impl=cfg.model.mlp_impl,
        exact_gelu=cfg.model.exact_gelu,
        tp=tp,
        remat=cfg.model.remat,
        vjp_boundaries=True,  # tp_enter/tp_leave form for the in-scan vjp
    )

    def embed_method(m, x):
        return m.backbone(x, segment="embed")

    def post_trunk_method(m, tokens):
        feats = m.backbone(tokens, train=True, segment="post_trunk")
        return m.head(feats, train=True)

    def step(state: TrainState, batch: dict[str, Any]):
        images, gt = _augment_encode(
            cfg, encode_codec, base_key, hb_base_key, state.step, batch
        )
        stacked = state.params["backbone"]["blocks"]
        outer = dict(state.params)
        outer["backbone"] = {
            k: v for k, v in state.params["backbone"].items() if k != "blocks"
        }

        def embed_fn(op, img):
            return model.apply({"params": op}, img, method=embed_method)

        tokens, embed_vjp = jax.vjp(embed_fn, outer, images)

        def pp_loss(lp, h, t_mb):
            op, bs = lp
            pred, updates = model.apply(
                {"params": op, "batch_stats": bs},
                h,
                method=post_trunk_method,
                mutable=["batch_stats"],
            )
            losses = loss_fn(
                t_mb,
                pred,
                learn_heatmaps_from_zeros=cfg.learn_heatmaps_from_zeros,
            )
            total = sum(losses[k] * w for k, w in weights.items())
            return total, (losses, updates["batch_stats"])

        loss, d_stacked, d_lp, dx, (losses_avg, new_bs) = pipeline_1f1b(
            block_fn,
            stacked,
            pp_loss,
            (outer, state.batch_stats),
            tokens,
            gt,
            mesh,
            model_axis="model" if tp > 1 else None,
            microbatches=cfg.model.pp_microbatches,
            param_specs=param_specs,
            seq_block_fn=seq_block_fn,
            loss_has_aux=True,
        )
        # Outer grads arrive from two disjoint-support trees: the embed
        # segment's vjp (patch_embed/pos_embed/prefix leaves) and the
        # engine's loss-side grads (norm/adapter/head leaves); the rest of
        # each tree is zeros, so the elementwise sum is the full gradient.
        d_outer_embed, _d_images = embed_vjp(dx)
        d_outer = jax.tree_util.tree_map(
            lambda a, b: a + b, d_lp[0], d_outer_embed
        )
        grads = dict(d_outer)
        grads["backbone"] = dict(d_outer["backbone"], blocks=d_stacked)
        new_state = state.apply_gradients(
            grads, tx, ema_decay=cfg.optim.ema_decay
        ).replace(batch_stats=new_bs)
        metrics = {
            "loss": loss,
            **{f"loss/{k}": v for k, v in losses_avg.items()},
        }
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def make_eval_step(
    model, encode_codec: Codec, loss_fn: ProbPoseLoss, cfg: TrainConfig
) -> Callable:
    weights = cfg.loss_weights.as_dict()
    H, W = cfg.model.img_size

    def step(state: TrainState, batch: dict[str, Any]):
        if "frame" in batch:
            # frame-mode batches (frame + box), same crop path as the
            # train step minus augmentation — validation must accept
            # whatever layout training runs on.
            from probpose_pytorch_tpu.ops.preprocess import (
                crop_resize,
                transform_keypoints,
            )

            boxes = jnp.asarray(batch["box"], jnp.float32)
            images = crop_resize(
                batch["frame"], boxes, (H, W), cfg.preprocess_method
            )
            batch = dict(
                batch,
                keypoints=transform_keypoints(
                    jnp.asarray(batch["keypoints"], jnp.float32),
                    boxes,
                    (H, W),
                ),
            )
        else:
            images = _prepare_images(batch)
        gt = _encode_targets(encode_codec, batch)
        pred = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        losses, acc = loss_fn(gt, pred, compute_acc=True)
        total = sum(losses[k] * w for k, w in weights.items())
        metrics = {
            "loss": total,
            **{f"loss/{k}": v for k, v in losses.items()},
            **{f"acc/{k}": v for k, v in acc.items()},
            "max_heatmap": (
                jnp.max(pred[0][0])
                if isinstance(pred[0], (tuple, list))
                else jnp.max(pred[0])
            ),
            "mean_prob": jnp.mean(pred[1]),
        }
        return metrics

    return step


@dataclass
class Trainer:
    """End-to-end trainer: model/codecs/optimizer/jitted steps/checkpointing.

    Usage:
        trainer = Trainer.create(cfg, steps_per_epoch)
        trainer.fit(train_batches, val_batches)

    Note: `train_step` donates its input state (buffers are reused for the
    new state on device) — always continue from the returned state, never
    reuse the state object passed in.
    """

    cfg: TrainConfig
    model: Any
    encode_codec: Codec
    fast_codec: Codec
    loss_fn: ProbPoseLoss
    tx: optax.GradientTransformation
    state: TrainState
    train_step: Callable
    eval_step: Callable
    mesh: Mesh | None = None

    @classmethod
    def create(
        cls,
        cfg: TrainConfig,
        steps_per_epoch: int,
        mesh: Mesh | None = None,
    ) -> "Trainer":
        model_size = (
            dict(mesh.shape).get("model", 1) if mesh is not None else 1
        )
        if model_size > 1 and cfg.model.attn_impl in ("fused", "fused_tp"):
            # Under tensor parallelism the qkv activations are channel-
            # sharded (Megatron layout, parallel/sharding.py). The packed
            # kernel tensor-parallelizes via the head-major qkv layout
            # (attn_impl='fused_tp'): each model shard's contiguous column
            # slice is exactly its own heads' [q|k|v] pack, so shard_map
            # over (data, model) adds zero collectives
            # (ops/pallas/attention_kernel.py:sharded_packed_attention).
            # Upgrading 'fused' -> 'fused_tp' changes the SEMANTICS of the
            # qkv kernel/bias columns (head-major); params initialized here
            # are consistent, but qkv-major checkpoints (single-device
            # 'fused' runs, torch imports) must be converted with
            # compat.qkv_to_head_major before restoring onto this trainer.
            # Heads that don't divide the model axis fall back to einsum
            # (identical math; the Megatron shardings still apply).
            import dataclasses

            from probpose_pytorch_tpu.models.vit import ViTConfig

            heads = ViTConfig.PRESETS.get(cfg.model.backbone, {}).get(
                "num_heads", 0
            )
            if heads and heads % model_size == 0:
                if cfg.model.attn_impl == "fused":
                    print(
                        "[trainer] tensor-parallel mesh: using "
                        "attn_impl='fused_tp' (head-major qkv layout; "
                        "convert qkv-major checkpoints with "
                        "compat.qkv_to_head_major)"
                    )
                    cfg = dataclasses.replace(
                        cfg,
                        model=dataclasses.replace(
                            cfg.model, attn_impl="fused_tp"
                        ),
                    )
            else:
                print(
                    f"[trainer] attn heads ({heads}) don't divide the model "
                    f"axis ({model_size}); using 'einsum' on this mesh"
                )
                cfg = dataclasses.replace(
                    cfg,
                    model=dataclasses.replace(cfg.model, attn_impl="einsum"),
                )
        pipe_size = (
            dict(mesh.shape).get("pipe", 1) if mesh is not None else 1
        )
        if pipe_size > 1:
            # Pipeline-parallel trunk (parallel/pipeline.py): stage the ViT
            # blocks over the mesh "pipe" axis. Parameters switch to the
            # stacked layout — convert per-block checkpoints with
            # compat.stack_vit_blocks before restoring onto this trainer.
            import dataclasses

            if model_size > 1 and cfg.model.attn_impl != "fused_tp":
                # TP inside a pipeline stage needs the head-major qkv
                # packing (models/vit.py:tp_block_apply) — the einsum
                # fallback the heads-don't-divide case selects above has
                # qkv-major checkpoint semantics, which the model-axis
                # column shard would slice mid-head.
                raise ValueError(
                    "tensor parallelism inside a pipeline stage requires "
                    "attn_impl='fused'/'fused_tp' with heads divisible by "
                    f"model_parallel (got attn_impl="
                    f"{cfg.model.attn_impl!r}, model axis {model_size})"
                )

            from probpose_pytorch_tpu.models.vit import ViTConfig

            depth = ViTConfig.PRESETS.get(cfg.model.backbone, {}).get(
                "depth", 0
            )
            if cfg.model.backbone.startswith("conv") or depth % pipe_size:
                raise ValueError(
                    f"pipeline parallelism needs a ViT backbone whose depth "
                    f"divides the pipe axis (backbone={cfg.model.backbone}, "
                    f"pipe={pipe_size})"
                )
            if cfg.model.pp_stages != pipe_size:
                cfg = dataclasses.replace(
                    cfg,
                    model=dataclasses.replace(
                        cfg.model, pp_stages=pipe_size
                    ),
                )
        model = build_model(cfg.model, mesh=mesh)
        encode_codec, fast_codec = build_codecs(cfg)
        if cfg.model.head_type == "simcc":
            from probpose_pytorch_tpu.losses_simcc import SimCCLoss

            loss_fn = SimCCLoss(
                fast_codec,
                freeze_error=cfg.freeze_error,
                freeze_oks=cfg.freeze_oks,
            )
        else:
            loss_fn = ProbPoseLoss(
                fast_codec,
                freeze_error=cfg.freeze_error,
                freeze_oks=cfg.freeze_oks,
            )
        total_steps = steps_per_epoch * cfg.epochs
        frozen_labels = None
        if cfg.model.frozen_backbone:
            # stop_gradient (models/vit.py:_finish) already zeroes the
            # trunk's gradients, but AdamW's DECOUPLED weight decay applies
            # to params regardless of their gradient — over a full schedule
            # it would exponentially shrink the frozen pretrained trunk
            # (sum(lr)*wd ~ 2.5 on the flagship recipe: x0.08). Mask the
            # optimizer to set_to_zero on trunk leaves; adapters (and
            # everything outside the backbone) keep training.
            import jax.tree_util as jtu

            def frozen_labels(params):
                def label(path, _leaf):
                    keys = [
                        str(p.key)
                        for p in path
                        if isinstance(p, jtu.DictKey)
                    ]
                    if (
                        keys
                        and keys[0] == "backbone"
                        and not any("adapter" in k for k in keys)
                    ):
                        return "frozen"
                    return "trainable"

                return jtu.tree_map_with_path(label, params)

        if cfg.train_lora_only:
            if cfg.model.lora_rank <= 0:
                raise ValueError(
                    "train_lora_only requires model.lora_rank > 0"
                )
            from probpose_pytorch_tpu.models.lora import lora_frozen_labels

            # Passed as a callable: optax.multi_transform resolves it
            # against the actual param tree at init time.
            frozen_labels = lora_frozen_labels
        tx = make_optimizer(cfg.optim, total_steps, frozen_labels)
        rng = jax.random.PRNGKey(cfg.seed)
        H, W = cfg.model.img_size
        sample = jnp.zeros((1, H, W, 3), jnp.float32)
        state = create_train_state(
            model, rng, sample, tx, ema=cfg.optim.ema_decay is not None
        )
        if mesh is not None:
            state = state.replace(params=shard_params(state.params, mesh))
            if cfg.shard_opt_state:
                if model_size > 1 or pipe_size > 1:
                    raise ValueError(
                        "shard_opt_state (ZeRO-1 over the data axis) is "
                        "supported on dp-only meshes; with tensor/pipeline "
                        "parallelism the moments inherit the param layouts"
                    )
                from probpose_pytorch_tpu.parallel import shard_opt_state

                state = state.replace(
                    opt_state=shard_opt_state(state.opt_state, mesh)
                )
        teacher = None
        if cfg.distill is not None and cfg.distill.teacher_checkpoint:
            teacher = _load_teacher(cfg)
            if mesh is not None:
                # the restored teacher arrays are committed to one device;
                # replicate them over the mesh so the sharded step's
                # captured constants have a compatible placement
                from jax.sharding import NamedSharding, PartitionSpec

                tmodel, tvars = teacher
                teacher = (
                    tmodel,
                    jax.device_put(
                        tvars, NamedSharding(mesh, PartitionSpec())
                    ),
                )
        if cfg.pipeline_schedule not in ("gpipe", "1f1b"):
            raise ValueError(
                f"unknown pipeline_schedule {cfg.pipeline_schedule!r} "
                "(expected gpipe | 1f1b)"
            )
        if pipe_size > 1 and cfg.pipeline_schedule == "1f1b":
            if teacher is not None:
                raise ValueError(
                    "distillation does not compose with "
                    "pipeline_schedule='1f1b' (the frozen teacher would "
                    "have to run on every pipeline stage); use 'gpipe'"
                )
            train_step = jax.jit(
                make_train_step_1f1b(
                    model, encode_codec, loss_fn, tx, cfg, mesh
                ),
                donate_argnums=(0,),
            )
        else:
            train_step = jax.jit(
                make_train_step(
                    model, encode_codec, loss_fn, tx, cfg, teacher=teacher
                ),
                donate_argnums=(0,),
            )
        eval_step = jax.jit(make_eval_step(model, encode_codec, loss_fn, cfg))
        return cls(
            cfg=cfg,
            model=model,
            encode_codec=encode_codec,
            fast_codec=fast_codec,
            loss_fn=loss_fn,
            tx=tx,
            state=state,
            train_step=train_step,
            eval_step=eval_step,
            mesh=mesh,
        )

    def _device_batch(self, batch: dict[str, Any]) -> dict[str, Any]:
        """Move a host batch onto the mesh.

        Single-process: whole-batch device_put with the data-parallel
        sharding. Multi-process (jax.process_count() > 1): each process
        holds only its LOCAL shard of the global batch, and
        `jax.make_array_from_process_local_data` assembles the global
        jax.Array from the per-host pieces without any cross-host data
        movement — the standard multi-host feeding path (greenfield;
        the reference is single-process, SURVEY.md §2.3).
        """
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from probpose_pytorch_tpu.parallel.sharding import batch_sharding

        sh = batch_sharding(self.mesh)
        if jax.process_count() > 1:
            return {
                k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()
            }
        return shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, self.mesh)

    def _prefetched(self, batches) -> Any:
        """Iterate `batches` with `device_prefetch` device batches kept
        ready: uploads (`_device_batch`) run on a worker thread so the next
        batch's host->device transfer overlaps the current step's compute.
        Uploads block the thread that issues them, so the plain loop cannot
        overlap them with the (async-dispatched) step; the worker thread
        can. Order is preserved; <=1 falls back to synchronous uploads."""
        depth = int(getattr(self.cfg, "device_prefetch", 0))
        if depth <= 1:
            for batch in batches:
                yield self._device_batch(batch)
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pending: deque = deque()
        with ThreadPoolExecutor(max_workers=1) as pool:
            for batch in batches:
                pending.append(pool.submit(self._device_batch, batch))
                if len(pending) >= depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()

    def fit(
        self,
        train_batches: Callable[[], Iterable[dict[str, Any]]],
        val_batches: Callable[[], Iterable[dict[str, Any]]] | None = None,
        max_steps: int | None = None,
    ) -> TrainState:
        cfg = self.cfg
        logger = MetricsLogger(cfg.out_dir)
        ckpt = CheckpointManager(
            f"{cfg.out_dir}/checkpoints",
            keep=cfg.keep_checkpoints,
            async_save=cfg.async_checkpoint,
        )
        start_step = 0
        if cfg.resume and ckpt.latest_step() is not None:
            self.state = restore_state_with_layout(ckpt, self.state, cfg)
            start_step = int(self.state.step)
            print(f"[trainer] resumed from step {start_step}")

        best_ckpt = None
        best_value = None
        best_sign = 1.0
        if cfg.track_best_metric:
            mode = cfg.track_best_mode
            if mode == "auto":
                mode = "min" if "loss" in cfg.track_best_metric else "max"
            if mode not in ("min", "max"):
                raise ValueError(f"track_best_mode {cfg.track_best_mode!r}")
            best_sign = 1.0 if mode == "min" else -1.0
            best_ckpt = CheckpointManager(
                f"{cfg.out_dir}/checkpoints_best", keep=1
            )
            prior = best_ckpt.read_metadata()
            if prior.get("best_value") is not None:
                best_value = float(prior["best_value"])

        # Preemption containment: TPU-pod / spot eviction arrives as
        # SIGTERM with a grace window. Finish the in-flight step, fall
        # through to the final checkpoint save, and exit cleanly so
        # `resume: true` continues on the replacement VM.
        preempted = threading.Event()
        prev_sigterm = None
        if cfg.handle_preemption:

            def _on_sigterm(signum, frame):
                if not preempted.is_set():
                    preempted.set()
                    print(
                        "[trainer] SIGTERM: checkpointing at the next "
                        "step boundary, then exiting cleanly"
                    )

            try:
                prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
            except ValueError:
                prev_sigterm = None  # fit() running off the main thread

        try:
            self._fit_loop(
                cfg, train_batches, val_batches, max_steps, logger, ckpt,
                best_ckpt, best_value, best_sign, start_step, preempted,
            )
        finally:
            if prev_sigterm is not None:
                signal.signal(signal.SIGTERM, prev_sigterm)
        return self.state

    def _fit_loop(
        self, cfg, train_batches, val_batches, max_steps, logger, ckpt,
        best_ckpt, best_value, best_sign, start_step, preempted,
    ) -> None:
        step_idx = start_step
        t0 = time.time()
        last_log = None  # step index of the previous log point
        done = False
        strikes = 0  # consecutive non-finite losses observed at log points
        recoveries = 0
        for epoch in range(cfg.epochs):
            if done:
                break
            for batch in self._prefetched(train_batches()):
                self.state, metrics = self.train_step(self.state, batch)
                if step_idx % cfg.log_every == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    # Honest throughput: steps actually elapsed since the
                    # previous log point (not cfg.log_every — wrong on the
                    # first window after start/resume/recovery), over
                    # train-only wall time (validation time is subtracted
                    # below).
                    dt = time.time() - t0
                    host["steps_per_sec"] = (
                        (step_idx - last_log) / dt
                        if last_log is not None and dt > 0
                        else 0.0
                    )
                    last_log = step_idx
                    t0 = time.time()
                    logger.log(step_idx, host, prefix="training")
                    # Failure containment (config.py:recover_on_nonfinite):
                    # persistent divergence -> restore last checkpoint. Uses
                    # the loss the log step already transferred — no extra
                    # device sync on the hot path.
                    if cfg.recover_on_nonfinite and not math.isfinite(
                        host.get("loss", 0.0)
                    ):
                        strikes += 1
                        if strikes >= 2:
                            if recoveries >= cfg.max_recoveries:
                                raise RuntimeError(
                                    f"loss non-finite at step {step_idx} "
                                    f"after {recoveries} checkpoint "
                                    "recoveries; aborting"
                                )
                            strikes = 0
                            recoveries += 1
                            restore_step = ckpt.latest_step()
                            if restore_step is not None:
                                self.state = restore_state_with_layout(
                                    ckpt, self.state, cfg
                                )
                                print(
                                    f"[trainer] non-finite loss at step "
                                    f"{step_idx}; restored checkpoint step "
                                    f"{restore_step} (recovery {recoveries}/"
                                    f"{cfg.max_recoveries})"
                                )
                                # Rewind the loop counter with the state:
                                # checkpoint labels must keep matching
                                # state.step or a later resume restores a
                                # stale higher-labeled checkpoint.
                                step_idx = int(self.state.step)
                                last_log = None
                            else:
                                print(
                                    "[trainer] non-finite loss with no "
                                    "checkpoint yet; relying on the "
                                    "optimizer's non-finite skip guard"
                                )
                    else:
                        strikes = 0
                if (
                    val_batches is not None
                    and step_idx % cfg.val_every == 0
                ):
                    tv0 = time.time()
                    val = self._validate(val_batches, logger, step_idx)
                    t0 += time.time() - tv0  # keep steps_per_sec train-only
                    if best_ckpt is not None and val is not None:
                        if cfg.track_best_metric not in val:
                            raise ValueError(
                                f"track_best_metric "
                                f"{cfg.track_best_metric!r} not among "
                                f"validation metrics {sorted(val)}"
                            )
                        v = float(val[cfg.track_best_metric])
                        if (
                            math.isfinite(v)
                            and (
                                best_value is None
                                or best_sign * v < best_sign * best_value
                            )
                            and state_is_finite(self.state)
                        ):
                            best_value = v
                            best_ckpt.save(
                                int(self.state.step),
                                self.state,
                                force=True,
                                metadata=dict(
                                    layout_metadata(cfg),
                                    best_value=v,
                                    best_metric=cfg.track_best_metric,
                                ),
                            )
                            print(
                                f"[trainer] new best "
                                f"{cfg.track_best_metric}={v:.5g} at step "
                                f"{step_idx} -> checkpoints_best"
                            )
                step_idx += 1
                if preempted.is_set():
                    done = True
                    break
                if max_steps is not None and step_idx - start_step >= max_steps:
                    done = True
                    break
            # Checkpoint labels come from state.step — the counter resume
            # actually restores — NOT the loop counter, which can run ahead
            # of a state rewound by non-finite recovery (a higher-labeled
            # stale checkpoint would then shadow every later save).
            true_step = int(self.state.step)
            if (epoch % cfg.checkpoint_every_epochs == 0 or done) and (
                ckpt.latest_step() != true_step
            ):
                if state_is_finite(self.state):
                    ckpt.save(
                        true_step, self.state, metadata=layout_metadata(cfg)
                    )
                else:
                    print(
                        f"[trainer] NOT saving checkpoint at step {true_step}:"
                        " state has non-finite leaves (keeping the last"
                        " clean checkpoint for recovery)"
                    )
        ckpt.wait()  # commit any in-flight async save before the check
        true_step = int(self.state.step)
        if ckpt.latest_step() != true_step:
            if state_is_finite(self.state):
                ckpt.save(
                    true_step,
                    self.state,
                    force=True,
                    metadata=layout_metadata(cfg),
                )
            else:
                print(
                    f"[trainer] NOT saving final checkpoint at step "
                    f"{true_step}: state has non-finite leaves (latest clean "
                    f"checkpoint: step {ckpt.latest_step()})"
                )
        ckpt.close()
        if best_ckpt is not None:
            best_ckpt.close()
        logger.close()
        if preempted.is_set():
            print(
                f"[trainer] preempted: latest checkpoint at step "
                f"{ckpt.latest_step()}; resume will continue from there"
            )

    def _validate(self, val_batches, logger, step_idx) -> dict | None:
        # Accumulate metric sums on device; a single host transfer at the
        # end (device_get of the summed tree) instead of one blocking
        # float() per metric per batch (VERDICT r1 weak #4).
        total: dict[str, jax.Array] | None = None
        n = 0
        for batch in val_batches():
            metrics = self.eval_step(self.state, self._device_batch(batch))
            total = (
                metrics
                if total is None
                else jax.tree_util.tree_map(jnp.add, total, metrics)
            )
            n += 1
        if total is None:
            return None
        host = jax.device_get(total)
        averaged = {k: float(v) / n for k, v in host.items()}
        logger.log(step_idx, averaged, prefix="validation")
        return averaged
