"""Person detector training CLI.

    python -m probpose_pytorch_tpu.detect.train \
        --data-root synth_coco/ --out runs/detector \
        [--steps 1500] [--batch-size 16] [--img-size 320]

Greenfield (the reference has no detector). The train step is one compiled
XLA program — on-device full-frame resize (the pose pipeline's fused
crop_resize), in-jit target encoding (detect/codec.py — like the pose
trainer's in-jit probmap encoding), forward, focal+L1 loss, AdamW — with the
host only decoding JPEGs and padding box lists (detect/data.py). Checkpoints
are Orbax TrainStates, reloadable via `load_detector`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Sequence

import numpy as np

from probpose_pytorch_tpu.detect.codec import encode_boxes
from probpose_pytorch_tpu.detect.loss import detection_loss
from probpose_pytorch_tpu.detect.model import PersonDetector

__all__ = ["DetectorTrainer", "load_detector", "load_bottomup", "main"]


@dataclasses.dataclass
class DetectorTrainer:
    """Jitted detector train step + state. Single-device (the detector is
    ~100x lighter than the pose model it feeds; dp-mesh it only if a real
    corpus ever makes it the bottleneck)."""

    model: PersonDetector
    state: Any
    tx: Any

    @classmethod
    def create(
        cls,
        img_size: tuple[int, int] = (512, 512),
        preset: str = "conv-t",
        lr: float = 2.5e-4,
        total_steps: int = 1500,
        weight_decay: float = 1e-4,
        seed: int = 0,
        num_keypoints: int = 0,
        kpt_heatmaps: bool = False,
    ) -> "DetectorTrainer":
        import jax
        import jax.numpy as jnp
        import optax

        from probpose_pytorch_tpu.train.state import TrainState

        model = PersonDetector(
            img_size=img_size,
            preset=preset,
            num_keypoints=num_keypoints,
            kpt_heatmaps=kpt_heatmaps and num_keypoints > 0,
        )
        variables = model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, *img_size, 3), jnp.float32),
            train=True,
        )
        warmup = max(total_steps // 20, 1)
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(
                optax.warmup_cosine_decay_schedule(
                    lr / 25, lr, warmup, max(total_steps, warmup + 1)
                ),
                weight_decay=weight_decay,
            ),
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )
        trainer = cls(model=model, state=state, tx=tx)
        trainer._step = jax.jit(trainer._make_step(), donate_argnums=0)
        return trainer

    def _make_step(self):
        import jax
        import jax.numpy as jnp

        from probpose_pytorch_tpu.ops.preprocess import crop_resize

        model, tx = self.model, self.tx
        Hd, Wd = model.img_size
        feat_hw = model.feat_hw
        stride = model.out_stride

        def step(state, batch):
            frames = batch["frame"]  # (B, Hf, Wf, 3) uint8, one native size
            B, Hf, Wf, _ = frames.shape
            full = jnp.tile(
                jnp.array([[0.0, 0.0, Wf, Hf]], jnp.float32), (B, 1)
            )
            imgs = crop_resize(frames, full, (Hd, Wd), "bilinear_matmul")
            scale = jnp.array(
                [Wd / Wf, Hd / Hf, Wd / Wf, Hd / Hf], jnp.float32
            )
            kpts = None
            if model.num_keypoints > 0:
                kp = batch["keypoints"].astype(jnp.float32)  # (B, M, K, 3)
                kpts = kp.at[..., 0].mul(Wd / Wf).at[..., 1].mul(Hd / Hf)
            targets = encode_boxes(
                batch["boxes"] * scale,
                batch["box_mask"],
                feat_hw,
                stride,
                ignore_boxes=batch["ignore_boxes"] * scale,
                ignore_mask=batch["ignore_mask"],
                keypoints=kpts,
                kpt_heatmaps=model.kpt_heatmaps,
            )

            def loss_fn(params):
                pred, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs,
                    train=True,
                    mutable=["batch_stats"],
                )
                total, terms = detection_loss(pred, targets)
                return total, (terms, mut["batch_stats"])

            (_, (terms, new_bn)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads, tx)
            new_state = new_state.replace(batch_stats=new_bn)
            return new_state, terms

        return step

    def train_step(self, batch: dict[str, np.ndarray]) -> dict[str, float]:
        self.state, terms = self._step(self.state, batch)
        return terms


def load_detector(
    checkpoint_dir: str | Path,
    score_threshold: float = 0.3,
    max_detections: int = 64,
    mesh=None,
):
    """Build a DetectorPredictor from a detector checkpoint directory
    (config JSON beside it, written by the CLI). A directory holding an
    exported detector bundle (serve.export_detector_bundle) loads as a
    codeless DetectorBundle instead — same detect_frame contract, so every
    --detector surface accepts either."""
    from probpose_pytorch_tpu.detect.pipeline import DetectorPredictor
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    checkpoint_dir = Path(checkpoint_dir)
    manifest = checkpoint_dir / "manifest.json"
    if manifest.exists():
        import json as _json

        if _json.loads(manifest.read_text()).get("kind") == "detector":
            if mesh is not None:
                raise ValueError(
                    "mesh serving needs a live checkpoint; exported "
                    "bundles are single-device programs"
                )
            from probpose_pytorch_tpu.serve.export import DetectorBundle

            return DetectorBundle.load(checkpoint_dir)
    cfg_path = checkpoint_dir.parent / "detector.json"
    cfg = json.loads(cfg_path.read_text()) if cfg_path.exists() else {}
    trainer = DetectorTrainer.create(
        img_size=tuple(cfg.get("img_size", (512, 512))),
        preset=cfg.get("preset", "conv-t"),
        num_keypoints=int(cfg.get("num_keypoints", 0)),
    )
    ckpt = CheckpointManager(checkpoint_dir)
    state = ckpt.restore(trainer.state)
    return DetectorPredictor(
        model=trainer.model,
        variables={
            "params": state.params,
            "batch_stats": state.batch_stats,
        },
        score_threshold=score_threshold,
        max_detections=max_detections,
        mesh=mesh,
    )


def load_bottomup(
    checkpoint_dir: str | Path,
    score_threshold: float = 0.3,
    max_detections: int = 32,
    mesh=None,
):
    """Build a BottomUpPredictor (single-stage multi-person pose) from a
    detector checkpoint trained with --keypoints > 0. A directory holding
    an exported bottom-up bundle (serve.export_bottomup_bundle) loads as a
    codeless BottomUpBundle instead — same predict_frame contract, so
    eval.run --bottomup and the video pipeline accept either."""
    from probpose_pytorch_tpu.detect.pipeline import BottomUpPredictor
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    checkpoint_dir = Path(checkpoint_dir)
    manifest = checkpoint_dir / "manifest.json"
    if manifest.exists():
        import json as _json

        if _json.loads(manifest.read_text()).get("kind") == "bottomup":
            if mesh is not None:
                raise ValueError(
                    "mesh serving needs a live checkpoint; exported "
                    "bundles are single-device programs"
                )
            from probpose_pytorch_tpu.serve.export import BottomUpBundle

            return BottomUpBundle.load(checkpoint_dir)
    if (checkpoint_dir / "checkpoints").exists():
        checkpoint_dir = checkpoint_dir / "checkpoints"
    cfg_path = checkpoint_dir.parent / "detector.json"
    cfg = json.loads(cfg_path.read_text()) if cfg_path.exists() else {}
    num_keypoints = int(cfg.get("num_keypoints", 0))
    if num_keypoints <= 0:
        raise ValueError(
            f"{cfg_path}: not a single-stage pose checkpoint "
            "(num_keypoints == 0; train with detect.train --keypoints K)"
        )
    trainer = DetectorTrainer.create(
        img_size=tuple(cfg.get("img_size", (512, 512))),
        preset=cfg.get("preset", "conv-t"),
        num_keypoints=num_keypoints,
        kpt_heatmaps=bool(cfg.get("kpt_heatmaps", False)),
    )
    ckpt = CheckpointManager(checkpoint_dir)
    state = ckpt.restore(trainer.state)
    return BottomUpPredictor(
        model=trainer.model,
        variables={
            "params": state.params,
            "batch_stats": state.batch_stats,
        },
        score_threshold=score_threshold,
        max_detections=max_detections,
        mesh=mesh,
    )


def main(argv: Sequence[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="Person detector training")
    parser.add_argument("--data-root", type=Path, required=True,
                        help="COCO layout root (annotations/ + train2017/)")
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--img-size", type=int, default=512,
                        help="square detector input size")
    parser.add_argument("--preset", type=str, default="conv-t",
                        choices=("conv-t", "conv-s"))
    parser.add_argument("--keypoints", type=int, default=0,
                        help=">0: train the SINGLE-STAGE pose family "
                        "(CenterNet objects-as-points: a joint-offset head "
                        "on the same trunk; one forward -> all poses). "
                        "Load with load_bottomup / eval with "
                        "eval.run --bottomup")
    parser.add_argument("--kpt-heatmaps", action="store_true",
                        help="with --keypoints: add per-joint heatmap + "
                        "sub-cell offset heads and snap-refine the "
                        "regressed joints at decode (the CenterNet pose "
                        "refinement; also yields per-joint confidences)")
    parser.add_argument("--lr", type=float, default=2.5e-4)
    parser.add_argument("--max-boxes", type=int, default=16)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from probpose_pytorch_tpu.data.pipeline import Prefetcher, batch_iterator
    from probpose_pytorch_tpu.detect.data import FrameDetectionDataset
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    ds = FrameDetectionDataset(
        args.data_root / "annotations" / "person_keypoints_train2017.json",
        args.data_root / "train2017",
        max_boxes=args.max_boxes,
        num_keypoints=args.keypoints,
    )
    print(f"[detect] {len(ds)} training frames")
    trainer = DetectorTrainer.create(
        img_size=(args.img_size, args.img_size),
        preset=args.preset,
        lr=args.lr,
        total_steps=args.steps,
        seed=args.seed,
        num_keypoints=args.keypoints,
        kpt_heatmaps=args.kpt_heatmaps,
    )
    args.out.mkdir(parents=True, exist_ok=True)
    (args.out / "detector.json").write_text(
        json.dumps(
            dict(img_size=[args.img_size, args.img_size],
                 preset=args.preset,
                 num_keypoints=args.keypoints,
                 kpt_heatmaps=bool(
                     args.kpt_heatmaps and args.keypoints > 0
                 ))
        )
    )
    ckpt = CheckpointManager(args.out / "checkpoints")

    step = 0
    epoch = 0
    t0 = time.perf_counter()
    while step < args.steps:
        batches = Prefetcher(
            batch_iterator(
                ds,
                args.batch_size,
                shuffle=True,
                seed=args.seed,
                epoch=epoch,
                num_workers=args.num_workers,
            ),
            depth=2,
        )
        for batch in batches:
            terms = trainer.train_step(batch)
            step += 1
            if step % args.log_every == 0 or step == args.steps:
                vals = {k: float(v) for k, v in terms.items()}
                rate = step * args.batch_size / (
                    time.perf_counter() - t0
                )
                kpt_part = (
                    f" kpts {vals['kpts']:.4f}" if "kpts" in vals else ""
                )
                if "kpt_heat" in vals:
                    kpt_part += (
                        f" kpt_heat {vals['kpt_heat']:.4f}"
                        f" kpt_off {vals['kpt_offset']:.4f}"
                    )
                print(
                    f"[detect] step {step}/{args.steps} "
                    f"loss {vals['total']:.4f} "
                    f"(center {vals['center']:.4f} size {vals['size']:.4f} "
                    f"offset {vals['offset']:.4f}{kpt_part}) "
                    f"{rate:.0f} frames/s",
                    flush=True,
                )
            if step >= args.steps:
                break
        epoch += 1
    ckpt.save(step, trainer.state)
    print(f"[detect] saved checkpoint at step {step} -> "
          f"{args.out / 'checkpoints'}")


if __name__ == "__main__":
    main()
