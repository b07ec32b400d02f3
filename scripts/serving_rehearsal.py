"""Serving-stack dress rehearsal on a TRAINED checkpoint.

The pipeline rehearsal (scripts/dress_rehearsal.py) proves
generate→train→resume→AP; this one proves the DEPLOYMENT stack behaves on
a model that actually learned something (untrained heatmaps are diffuse,
so argmax behavior, NMS, and tracking are only meaningful post-training):

  1. generate + train — synth COCO (data/synth_coco.py), train CLI, EMA
  2. predictor        — predict_frame on val frames with GT boxes; OKS vs GT
  3. averaging        — SWA CLI over the last checkpoints; predictor loads
                        it; keypoint drift vs the unaveraged model recorded
  4. bundle           — indexed StableHLO export → reload → parity
  5. server           — HTTP micro-batching over the bundle, concurrent
                        clients, parity + stats
  6. video            — a synthetic moving sequence (known translation):
                        track-id stability + one-euro jitter reduction,
                        per-frame vs stream-mode parity
  7. torch export     — backbone/head .pth → imported back → forward parity

Writes one JSON record (--record, default docs/rehearsal_serving_r3.json)
and prints a summary line per phase.

Usage: python scripts/serving_rehearsal.py [--steps 1200] [--root ...]
"""

from __future__ import annotations

import argparse
import base64
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def oks_to_gt(kpts, gt_xy, gt_vis, areas):
    """Mean COCO OKS of predictions vs ground truth over instances."""
    from probpose_pytorch_tpu.data.coco import COCO_SIGMAS

    var = (2.0 * np.asarray(COCO_SIGMAS, np.float32)) ** 2
    oks = []
    for p, g, v, a in zip(kpts, gt_xy, gt_vis, areas):
        m = v > 0
        if not m.any():
            continue
        d2 = ((p[m] - g[m]) ** 2).sum(-1)
        e = d2 / var[m] / (a + np.spacing(1)) / 2.0
        oks.append(float(np.exp(-e).mean()))
    return float(np.mean(oks)) if oks else float("nan")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/probpose_serving_rehearsal")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--train-images", type=int, default=160)
    ap.add_argument("--record", default="docs/rehearsal_serving_r3.json")
    ap.add_argument("--head-type", default="probmap",
                    choices=["probmap", "simcc"],
                    help="keypoint head family (models/model.py)")
    args = ap.parse_args()

    from probpose_pytorch_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax

    from probpose_pytorch_tpu.data.synth_coco import generate_coco_synth
    from probpose_pytorch_tpu.models.model import ModelConfig
    from probpose_pytorch_tpu.models.vit import ViTConfig
    from probpose_pytorch_tpu.ops.augment import AugmentConfig
    from probpose_pytorch_tpu.train.config import OptimConfig, TrainConfig

    root = Path(args.root)
    data = root / "data"
    run = root / "run"
    record: dict = {"device": str(jax.devices()[0])}

    # ---- 1. generate + train ------------------------------------------
    t0 = time.perf_counter()
    generate_coco_synth(
        data, n_train_images=args.train_images, n_val_images=24, seed=0
    )
    ViTConfig.PRESETS.setdefault(
        "vit-rehearsal-quick",
        dict(embed_dim=64, depth=2, num_heads=2, mlp_ratio=2.0),
    )
    cfg = TrainConfig(
        model=ModelConfig(
            img_size=(64, 48),
            num_keypoints=17,
            backbone="vit-rehearsal-quick",
            head_type=args.head_type,
            compute_dtype="float32",
            deconv_out_channels=(32, 32),
            deconv_kernel_sizes=(4, 4),
            pool_sizes=((2, 2), (2, 2)),
            normalize=1.0,
        ),
        optim=OptimConfig(ema_decay=0.99),
        augment=AugmentConfig(
            flip_prob=0.5,
            scale_jitter=0.15,
            shift_jitter=0.05,
            flip_pairs=(
                (1, 2), (3, 4), (5, 6), (7, 8), (9, 10),
                (11, 12), (13, 14), (15, 16),
            ),
        ),
        epochs=10_000,  # bounded by --max-steps
        train_batch_size=16,
        val_batch_size=16,
        val_every=100_000,
        log_every=200,
        checkpoint_every_epochs=10,
        seed=0,
        data_root=str(data),
        dataset_format="coco",
        cache_dir=str(run / "cache"),
        num_workers=4,
        out_dir=str(run),
    )
    run.mkdir(parents=True, exist_ok=True)
    cfg.save(run / "config.json")

    from probpose_pytorch_tpu.train.cli import main as train_main

    train_main([
        str(run), "--config", str(run / "config.json"),
        "--max-steps", str(args.steps),
    ])
    losses = [
        json.loads(l)
        for l in (run / "metrics.jsonl").read_text().splitlines()
        if "training/loss" in l
    ]
    record["train"] = dict(
        steps=args.steps,
        first_loss=round(losses[0]["training/loss"], 4),
        last_loss=round(losses[-1]["training/loss"], 4),
        seconds=round(time.perf_counter() - t0, 1),
    )
    print(f"[serving-rehearsal] train: {record['train']}", flush=True)

    # ---- 2. predictor on val frames -----------------------------------
    from probpose_pytorch_tpu.inference import load_predictor

    predictor = load_predictor(run / "checkpoints", run / "config.json",
                               ema=True)
    ann = json.loads(
        (data / "annotations/person_keypoints_val2017.json").read_text()
    )
    import PIL.Image

    by_img: dict = {}
    for a in ann["annotations"]:
        if a["iscrowd"] or a["num_keypoints"] == 0:
            continue
        by_img.setdefault(a["image_id"], []).append(a)
    images = {im["id"]: im for im in ann["images"]}
    all_oks, n_inst = [], 0
    t0 = time.perf_counter()
    sample = None
    for img_id, anns in sorted(by_img.items())[:12]:
        frame = np.asarray(PIL.Image.open(
            data / "val2017" / images[img_id]["file_name"]
        ).convert("RGB"), np.uint8)
        boxes = np.asarray([a["bbox"] for a in anns], np.float32)
        out = predictor.predict_frame(frame, boxes)
        gt = np.asarray(
            [np.asarray(a["keypoints"], np.float32).reshape(-1, 3)
             for a in anns]
        )
        all_oks.append(oks_to_gt(
            out["keypoints"], gt[..., :2], gt[..., 2],
            boxes[:, 2] * boxes[:, 3],
        ))
        n_inst += len(anns)
        if sample is None:
            sample = (frame, boxes)
    record["predictor"] = dict(
        mean_oks_vs_gt=round(float(np.mean(all_oks)), 4),
        instances=n_inst,
        seconds=round(time.perf_counter() - t0, 1),
    )
    print(f"[serving-rehearsal] predictor: {record['predictor']}",
          flush=True)

    # ---- 3. checkpoint averaging ---------------------------------------
    from probpose_pytorch_tpu.train.average import main as avg_main
    from probpose_pytorch_tpu.train.checkpoint import CheckpointManager

    ck = CheckpointManager(run / "checkpoints")
    steps_avail = sorted(ck._mgr.all_steps())
    frame, boxes = sample
    base_out = predictor.predict_frame(frame, boxes)
    if len(steps_avail) >= 2:
        avg_dir = root / "avg"
        avg_main(["--checkpoint", str(run / "checkpoints"),
                  "--last", "2", "--out", str(avg_dir)])
        avg_pred = load_predictor(
            avg_dir / "checkpoints", avg_dir / "config.json", ema=True
        )
        # quality, not drift: the averaged model must score in the same
        # OKS ballpark as the final checkpoint on the same val instances
        avg_oks = []
        for img_id, anns in sorted(by_img.items())[:12]:
            fr = np.asarray(PIL.Image.open(
                data / "val2017" / images[img_id]["file_name"]
            ).convert("RGB"), np.uint8)
            bx = np.asarray([a["bbox"] for a in anns], np.float32)
            o = avg_pred.predict_frame(fr, bx)
            gt = np.asarray(
                [np.asarray(a["keypoints"], np.float32).reshape(-1, 3)
                 for a in anns]
            )
            avg_oks.append(oks_to_gt(
                o["keypoints"], gt[..., :2], gt[..., 2],
                bx[:, 2] * bx[:, 3],
            ))
        record["averaging"] = dict(
            steps_averaged=steps_avail[-2:],
            mean_oks_vs_gt=round(float(np.mean(avg_oks)), 4),
            final_ckpt_oks=record["predictor"]["mean_oks_vs_gt"],
        )
    else:
        record["averaging"] = dict(skipped=f"only {steps_avail} available")
    print(f"[serving-rehearsal] averaging: {record['averaging']}",
          flush=True)

    # ---- 4. bundle -----------------------------------------------------
    from probpose_pytorch_tpu.serve import (
        ServingBundle,
        export_predictor_bundle,
    )

    t0 = time.perf_counter()
    Hf = -(-frame.shape[0] // 64) * 64
    Wf = -(-frame.shape[1] // 64) * 64
    bundle_dir = export_predictor_bundle(
        predictor, root / "bundle", buckets=(1, 4, 8),
        frame_shape=(Hf, Wf),
    )
    bundle = ServingBundle.load(bundle_dir)
    b_out = bundle.predict_frame(frame, boxes)
    parity = float(np.abs(
        b_out["keypoints"] - base_out["keypoints"]
    ).max())
    record["bundle"] = dict(
        buckets=list(bundle.buckets),
        indexed={str(k): list(v) for k, v in bundle.indexed_buckets.items()},
        max_kpt_diff_vs_live_px=parity,
        seconds=round(time.perf_counter() - t0, 1),
    )
    print(f"[serving-rehearsal] bundle: {record['bundle']}", flush=True)

    # ---- 5. HTTP server -------------------------------------------------
    from probpose_pytorch_tpu.serve.server import (
        MicroBatcher,
        PoseHTTPServer,
    )

    mb = MicroBatcher(bundle, bundle.buckets, bundle.frame_shape,
                      max_wait_ms=3.0, indexed=True)
    srv = PoseHTTPServer(mb, host="127.0.0.1", port=0)
    srv.start()
    base_url = f"http://127.0.0.1:{srv.port}"
    payload = {
        "frame_b64": base64.b64encode(frame.tobytes()).decode(),
        "shape": list(frame.shape),
        "boxes": boxes.tolist(),
    }

    def post():
        req = urllib.request.Request(
            base_url + "/predict", data=json.dumps(payload).encode()
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    first = post()  # warm
    results = [None] * 6
    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=lambda i=i: results.__setitem__(i, post()))
        for i in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    http_parity = float(np.abs(
        np.asarray(first["keypoints"]) - base_out["keypoints"]
    ).max())
    with urllib.request.urlopen(base_url + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    srv.shutdown()
    record["server"] = dict(
        max_kpt_diff_vs_live_px=http_parity,
        concurrent_6_wall_ms=round(wall * 1e3, 1),
        dispatches=stats["dispatches"],
        mean_batch=stats.get("mean_batch"),
    )
    print(f"[serving-rehearsal] server: {record['server']}", flush=True)

    # ---- 6. video --------------------------------------------------------
    from probpose_pytorch_tpu.video import run_video, run_video_stream

    T, shift = 24, 3
    vframes = [np.roll(frame, s * shift, axis=1) for s in range(T)]
    vboxes = [
        np.asarray(
            [[b[0] + s * shift, b[1], b[2], b[3]] for b in boxes[:2]],
            np.float32,
        )
        for s in range(T)
    ]
    kw = dict(boxes=vboxes, nms=None, track_threshold=0.2, fps=30.0)
    recs = list(run_video(predictor, iter(vframes), **kw))
    ids = np.asarray([r["track_ids"] for r in recs])
    stable = bool((ids == ids[0]).all())
    # tracking error vs the KNOWN per-frame translation: the rolled frames
    # are pixel-identical under the boxes, so raw predictions follow the
    # motion exactly (error 0 = deterministic pipeline) and the smoothed
    # track shows only the one-euro filter's bounded lag under motion.
    raw = np.asarray([r["keypoints"] for r in recs])
    smo = np.asarray([r["smoothed"] for r in recs])
    true = np.zeros_like(raw)
    true[..., 0] = shift
    err = lambda x: float(
        np.abs(np.diff(x, axis=0) - true[1:]).mean()
    )
    srecs = list(run_video_stream(predictor, iter(vframes), batch=8, **kw))
    sparity = float(np.abs(
        np.asarray([r["keypoints"] for r in srecs]) - raw
    ).max())
    record["video"] = dict(
        frames=T,
        tracks_stable=stable,
        raw_motion_err_px=round(err(raw), 3),
        smoother_lag_px=round(err(smo), 3),
        stream_vs_perframe_max_px=round(sparity, 4),
    )
    print(f"[serving-rehearsal] video: {record['video']}", flush=True)

    # ---- 7. torch export --------------------------------------------------
    if args.head_type != "probmap":
        # SimCC checkpoints have no reference torch layout (the export CLI
        # rejects them with guidance); skip the phase.
        record["torch_export"] = "skipped: no torch layout for simcc heads"
        Path(args.record).write_text(json.dumps(record, indent=2))
        print(f"[serving-rehearsal] wrote {args.record}")
        return

    from probpose_pytorch_tpu.compat.torch_export import main as texp_main

    t0 = time.perf_counter()
    texp_main(["--checkpoint", str(run / "checkpoints"),
               "--out", str(root / "torch"), "--ema"])
    from probpose_pytorch_tpu.compat.torch_import import (
        import_head_params,
        import_timm_vit_params,
        state_dict_from_checkpoint,
    )

    bsd = state_dict_from_checkpoint(str(root / "torch/backbone.pth"))
    rp = import_timm_vit_params(bsd, depth=2)
    orig = jax.tree_util.tree_map(
        np.asarray,
        jax.device_get(predictor.variables["params"])["backbone"],
    )
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        rp, orig,
    )
    max_diff = max(jax.tree_util.tree_leaves(diffs))
    hsd = state_dict_from_checkpoint(str(root / "torch/head.pth"))
    import_head_params(hsd, num_deconv=2, num_conv=0, num_pool_stages=2)
    record["torch_export"] = dict(
        backbone_roundtrip_max_abs=max_diff,
        head_tensors=len(hsd),
        seconds=round(time.perf_counter() - t0, 1),
    )
    print(f"[serving-rehearsal] torch_export: {record['torch_export']}",
          flush=True)

    Path(args.record).write_text(json.dumps(record, indent=2))
    print(f"[serving-rehearsal] wrote {args.record}")


if __name__ == "__main__":
    main()
