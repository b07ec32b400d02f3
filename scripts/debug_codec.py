"""Render ground-truth OKS heatmaps for visual inspection.

Working replacement for the reference's stale root debug_codec.py (its calls
no longer match its own codec API — SURVEY.md §2.1 #19). Renders encoded
target maps for either a YOLO dataset sample or a synthetic sample.

Usage:
    python scripts/debug_codec.py out_dir [--data-root ROOT --split train]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--data-root", type=str, default=None)
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("--input-size", type=str, default="256,192")
    parser.add_argument("--num-keypoints", type=int, default=17)
    args = parser.parse_args()

    H, W = (int(v) for v in args.input_size.split(","))
    if args.data_root:
        from probpose_pytorch_tpu.data import YOLOPoseDataset

        ds = YOLOPoseDataset(args.data_root, args.split, (H, W))
    else:
        from probpose_pytorch_tpu.data import SyntheticPoseDataset

        ds = SyntheticPoseDataset(8, (H, W), args.num_keypoints)
    sample = ds[args.index]

    from probpose_pytorch_tpu.codec import ProbMap
    from probpose_pytorch_tpu.viz import overlay_heatmaps

    K = sample["keypoints"].shape[0]
    pm = ProbMap((W, H), (W // 4, H // 4), sigmas=np.full(K, 0.05))
    enc = pm.encode(
        sample["keypoints"][None], sample["keypoints_visible"][None]
    )
    heatmaps = np.asarray(enc["heatmaps"])[0]

    args.out_dir.mkdir(parents=True, exist_ok=True)
    import PIL.Image

    up = np.kron(heatmaps, np.ones((4, 4)))  # heatmap space -> input space
    overlay = overlay_heatmaps(sample["image"], up)
    PIL.Image.fromarray(overlay).save(args.out_dir / "gt_overlay.png")
    for k in range(K):
        arr = (heatmaps[k] * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(args.out_dir / f"gt_heatmap_{k}.png")
    print(f"wrote {args.out_dir}/gt_overlay.png and {K} channel maps")


if __name__ == "__main__":
    main()
