"""Visualization helpers (rebuild of /root/reference/probpose/viz.py plus
keypoint drawing used by the reference inference script, inference.py:115-128).
Host-side, matplotlib-gated."""

from __future__ import annotations

import numpy as np

__all__ = ["overlay_heatmaps", "draw_keypoints"]


def overlay_heatmaps(
    image: np.ndarray,
    heatmaps: np.ndarray,
    colormap: str = "jet",
    threshold: float = 0.01,
) -> np.ndarray:
    """Overlay (K, H, W) heatmaps on an (H, W, 3) uint8 image.

    Near-zero heatmap pixels stay transparent (viz.py:27-29); channels are
    colored, summed, scaled to [0,255] and added to the image with clipping.
    """
    from matplotlib import colormaps

    cmap = colormaps[colormap]
    combined = np.zeros((*heatmaps.shape[1:], 3), np.float64)
    for k in range(heatmaps.shape[0]):
        colored = cmap(heatmaps[k])[:, :, :3]
        colored[heatmaps[k] < threshold] = 0
        combined += colored
    combined = np.clip((combined * 255), 0, 255).astype(np.uint8)
    return np.clip(
        image.astype(np.int32) + combined.astype(np.int32), 0, 255
    ).astype(np.uint8)


def draw_keypoints(
    image,
    keypoints: np.ndarray,
    probabilities: np.ndarray | None = None,
    prob_threshold: float = 0.9,
    radius: int = 5,
):
    """Draw keypoints (K, 2) on a PIL image, skipping low-probability ones —
    the reference inference script's rendering (inference.py:115-128)."""
    import PIL.ImageDraw

    draw = PIL.ImageDraw.Draw(image)
    w, h = image.size
    for j, kp in enumerate(keypoints):
        prob = 1.0 if probabilities is None else float(probabilities[j])
        if prob < prob_threshold:
            continue
        x, y = int(kp[0]), int(kp[1])
        if 0 <= x < w and 0 <= y < h:
            draw.ellipse(
                (x - radius, y - radius, x + radius, y + radius),
                fill=(255, 0, 0),
            )
            draw.text((x + 10, y - 10), f"{j}: {prob:.2f}", fill=(255, 255, 255))
    return image
