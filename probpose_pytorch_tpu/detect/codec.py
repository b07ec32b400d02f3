"""Detection codec: person boxes <-> center-point targets, fully on-device.

Greenfield superset: the reference has no detector at all — its inference
resizes the whole image (/root/reference/probpose/inference.py:74-75) and its
multi-person story ends at "bring your own boxes". This codec is the
TPU-native half of a CenterNet-style anchor-free person detector that makes
the framework standalone end to end (detect -> top-down pose).

TPU-first design points:

* `encode_boxes` runs INSIDE the jitted train step (like the pose target
  encoder): the center heatmap is a broadcasted max of per-box Gaussians
  over the feature grid — one fused elementwise program, no host loop and
  no scatter.
* Size/offset supervision is formulated as a GATHER, not a scatter: targets
  stay sparse per box (B, M, 2) with an index array into the flattened grid;
  the loss gathers predictions at those indices. XLA gathers are cheap and
  static-shaped; scatters are not.
* `decode_boxes` is static-shape end to end: 3x3 max-pool peak NMS (one
  reduce_window) + `lax.top_k` with a fixed K, so serving compiles one
  program per frame bucket. Score thresholding happens on host where
  dynamic shapes are free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "gaussian_radius",
    "encode_boxes",
    "decode_boxes",
    "decode_poses",
]


def gaussian_radius(
    height: jax.Array, width: jax.Array, min_iou: float = 0.7
) -> jax.Array:
    """Largest center-splat radius (in feature cells) such that any corner
    placed within it still yields IoU >= min_iou with the true box.

    The three quadratic cases bound the three ways a radius-r shifted box
    can overlap the (height, width) ground-truth box: both corners inside,
    both outside, and one in / one out. Each solves
    a*r^2 + b*r + c = 0 for the IoU-= min_iou boundary; the binding
    constraint is the minimum root.
    """
    t = min_iou

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1.0 - t) / (1.0 + t)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))) / (2 * a1)

    a2 = 4.0
    b2 = 2.0 * (height + width)
    c2 = (1.0 - t) * width * height
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))) / (2 * a2)

    a3 = 4.0 * t
    b3 = -2.0 * t * (height + width)
    c3 = (t - 1.0) * width * height
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))) / (2 * a3)

    return jnp.minimum(jnp.minimum(r1, r2), r3)


def encode_boxes(
    boxes: jax.Array,
    mask: jax.Array,
    feat_hw: tuple[int, int],
    stride: int,
    ignore_boxes: jax.Array | None = None,
    ignore_mask: jax.Array | None = None,
    min_iou: float = 0.7,
    keypoints: jax.Array | None = None,
    kpt_heatmaps: bool = False,
) -> dict[str, jax.Array]:
    """Encode padded person boxes into center-point detection targets.

    boxes: (B, M, 4) xywh in input pixels; mask: (B, M) valid flags.
    ignore_boxes/ignore_mask: (B, Mi, 4)/(B, Mi) regions excluded from the
    negative loss (COCO crowds and unlabeled-person instances — the same
    records the keypoint evaluator treats as detection-absorbing).
    keypoints: optional (B, M, K, 3) frame keypoints in input pixels with
    COCO v flags — adds single-stage pose targets (joint offsets from the
    integer center cell, in feature cells).

    Returns dict:
      heat       (B, H, W)  splatted center heatmap, exactly 1.0 at centers
      ind        (B, M)     int32 flat index of each center in the grid
      size       (B, M, 2)  (w, h) targets in feature cells
      offset     (B, M, 2)  sub-cell center remainders in [0, 1)
      mask       (B, M)     valid AND center-in-grid
      neg_weight (B, H, W)  0 inside ignore regions, 1 elsewhere
      kpts       (B, M, K, 2)  joint - center displacement in cells
      kpt_mask   (B, M, K)     labeled (v > 0) AND instance valid

    With `kpt_heatmaps=True` (and keypoints given), also:
      kpt_heat      (B, H, W, K)  per-joint-type splat maps, 1.0 at joints
      kpt_ind       (B, M, K)     int32 flat index of each joint's cell
      kpt_off       (B, M, K, 2)  sub-cell joint remainders in [0, 1)
      kpt_cell_mask (B, M, K)     labeled AND instance valid AND in grid
    (the CenterNet pose refinement targets: the regression head proposes,
    the joint heatmaps + shared sub-cell offset snap-refine at decode).
    """
    H, W = feat_hw
    boxes = boxes.astype(jnp.float32)
    x, y, w, h = (boxes[..., i] for i in range(4))  # (B, M)
    cx = (x + w / 2.0) / stride
    cy = (y + h / 2.0) / stride
    cxi = jnp.floor(cx)
    cyi = jnp.floor(cy)
    in_grid = (cxi >= 0) & (cxi < W) & (cyi >= 0) & (cyi < H)
    valid = mask.astype(bool) & in_grid & (w > 0) & (h > 0)
    cxi = jnp.clip(cxi, 0, W - 1)
    cyi = jnp.clip(cyi, 0, H - 1)

    radius = jnp.maximum(
        gaussian_radius(h / stride, w / stride, min_iou), 1.0
    )
    sigma = (2.0 * radius + 1.0) / 6.0  # (B, M)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    # Splat around the INTEGER center cell so the peak value is exactly
    # exp(0) == 1.0 there — the focal loss keys positives off heat == 1.
    d2 = (
        (xs[None, None, None, :] - cxi[..., None, None]) ** 2
        + (ys[None, None, :, None] - cyi[..., None, None]) ** 2
    )  # (B, M, H, W)
    g = jnp.exp(-d2 / (2.0 * sigma[..., None, None] ** 2))
    g = jnp.where(valid[..., None, None], g, 0.0)
    heat = jnp.max(g, axis=1)  # (B, H, W)

    ind = (cyi * W + cxi).astype(jnp.int32)
    size_t = jnp.stack([w, h], axis=-1) / stride
    off_t = jnp.stack([cx - cxi, cy - cyi], axis=-1)

    if ignore_boxes is not None:
        ib = ignore_boxes.astype(jnp.float32) / stride
        ix, iy, iw, ih = (ib[..., i] for i in range(4))  # (B, Mi)
        im = (
            ignore_mask.astype(bool)
            if ignore_mask is not None
            else jnp.ones(ib.shape[:2], bool)
        ) & (iw > 0) & (ih > 0)
        # Cell-center membership test against each ignore box.
        px = xs[None, None, None, :] + 0.5
        py = ys[None, None, :, None] + 0.5
        inside = (
            (px >= ix[..., None, None])
            & (px <= (ix + iw)[..., None, None])
            & (py >= iy[..., None, None])
            & (py <= (iy + ih)[..., None, None])
            & im[..., None, None]
        )
        neg_weight = 1.0 - jnp.any(inside, axis=1).astype(jnp.float32)
    else:
        neg_weight = jnp.ones_like(heat)

    out = dict(
        heat=heat,
        ind=ind,
        size=size_t,
        offset=off_t,
        mask=valid,
        neg_weight=neg_weight,
    )
    if keypoints is not None:
        kp = keypoints.astype(jnp.float32)  # (B, M, K, 3)
        # Displacement from the INTEGER center cell (the decode adds it
        # back at the same cell), in feature cells.
        kx = kp[..., 0] / stride - cxi[..., None]
        ky = kp[..., 1] / stride - cyi[..., None]
        out["kpts"] = jnp.stack([kx, ky], axis=-1)
        out["kpt_mask"] = (kp[..., 2] > 0) & valid[..., None]
        if kpt_heatmaps:
            jx = kp[..., 0] / stride  # (B, M, K)
            jy = kp[..., 1] / stride
            jxi = jnp.floor(jx)
            jyi = jnp.floor(jy)
            j_in = (jxi >= 0) & (jxi < W) & (jyi >= 0) & (jyi < H)
            jvalid = (kp[..., 2] > 0) & valid[..., None] & j_in
            jxi = jnp.clip(jxi, 0, W - 1)
            jyi = jnp.clip(jyi, 0, H - 1)
            out["kpt_ind"] = (jyi * W + jxi).astype(jnp.int32)
            out["kpt_off"] = jnp.stack([jx - jxi, jy - jyi], axis=-1)
            out["kpt_cell_mask"] = jvalid
            # Per-joint-type splat maps, one channel per joint. Same
            # integer-cell Gaussian as the center splat, with the PERSON's
            # radius (the CenterNet pose recipe). Built with a sequential
            # lax.map over joint types so the transient stays one
            # (B, M, H, W) buffer — the K-way broadcast would be K x that.
            jsig = jnp.broadcast_to(sigma[..., None], jxi.shape)

            def _one_joint(args):
                xi_k, yi_k, sg_k, va_k = args  # (B, M) each
                dd = (
                    (xs[None, None, None, :] - xi_k[..., None, None]) ** 2
                    + (ys[None, None, :, None] - yi_k[..., None, None]) ** 2
                )
                gg = jnp.exp(-dd / (2.0 * sg_k[..., None, None] ** 2))
                gg = jnp.where(va_k[..., None, None], gg, 0.0)
                return jnp.max(gg, axis=1)  # (B, H, W)

            kheat = jax.lax.map(
                _one_joint,
                (
                    jnp.moveaxis(jxi, -1, 0),
                    jnp.moveaxis(jyi, -1, 0),
                    jnp.moveaxis(jsig, -1, 0),
                    jnp.moveaxis(jvalid, -1, 0),
                ),
            )  # (K, B, H, W)
            out["kpt_heat"] = jnp.moveaxis(kheat, 0, -1)
    return out


def decode_boxes(
    center_logits: jax.Array,
    size: jax.Array,
    offset: jax.Array,
    k: int = 64,
    stride: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Decode detector outputs into the top-K boxes per image, on device.

    center_logits (B, H, W, 1), size/offset (B, H, W, 2) -> boxes
    (B, K, 4) xywh in input pixels + scores (B, K), score-descending.
    Peak NMS is a 3x3 max-pool equality test (a plateau of tied scores
    keeps every tied cell — ties are measure-zero with real logits);
    thresholding is left to the host, keeping shapes static under jit.
    """
    B, H, W, _ = center_logits.shape
    p = jax.nn.sigmoid(center_logits.astype(jnp.float32)[..., 0])
    pmax = jax.lax.reduce_window(
        p,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )
    peaks = jnp.where(p >= pmax, p, 0.0).reshape(B, H * W)
    scores, ind = jax.lax.top_k(peaks, k)  # (B, K)
    xi = (ind % W).astype(jnp.float32)
    yi = (ind // W).astype(jnp.float32)

    def gather2(m: jax.Array) -> jax.Array:  # (B, H, W, 2) -> (B, K, 2)
        flat = m.astype(jnp.float32).reshape(B, H * W, 2)
        return jnp.take_along_axis(flat, ind[..., None], axis=1)

    off = gather2(offset)
    wh = jnp.maximum(gather2(size), 0.0)
    cxp = (xi + off[..., 0]) * stride
    cyp = (yi + off[..., 1]) * stride
    bw = wh[..., 0] * stride
    bh = wh[..., 1] * stride
    boxes = jnp.stack([cxp - bw / 2, cyp - bh / 2, bw, bh], axis=-1)
    return boxes, scores


def decode_poses(
    center_logits: jax.Array,
    size: jax.Array,
    offset: jax.Array,
    kpts: jax.Array,
    k: int = 32,
    stride: int = 4,
    kpt_heat: jax.Array | None = None,
    kpt_offset: jax.Array | None = None,
    snap_candidates: int = 16,
    snap_threshold: float = 0.1,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Decode single-stage pose outputs into the top-K poses per image.

    center_logits (B, H, W, 1), size/offset (B, H, W, 2),
    kpts (B, H, W, 2K) joint-offset maps -> (boxes (B, K, 4) xywh px,
    scores (B, K), poses (B, K, Kj, 2) px, kpt_scores (B, K, Kj)),
    score-descending. Same static-shape design as decode_boxes (3x3 peak
    NMS + top_k; host thresholds).

    Without `kpt_heat`, joint positions are the regressed displacements
    from each peak's integer cell (the pure objects-as-points decode) and
    every joint inherits its person's center score.

    With `kpt_heat` (B, H, W, Kj) joint heatmaps (and optionally
    `kpt_offset` (B, H, W, 2) shared sub-cell offsets), each regressed
    joint SNAPS to the nearest same-type heatmap peak that clears
    `snap_threshold` and lies inside the person's box — the CenterNet
    pose refinement, kept static-shape: per joint type the top
    `snap_candidates` 3x3-NMS peaks are extracted once per image and every
    person picks by masked argmin distance. Joints with no admissible peak
    keep the regression. `kpt_scores` carries the snapped peak's
    probability (or the heatmap probability at the regressed cell when
    unsnapped) — the family's per-joint confidence."""
    B, H, W, _ = center_logits.shape
    Kj = kpts.shape[-1] // 2
    p = jax.nn.sigmoid(center_logits.astype(jnp.float32)[..., 0])
    pmax = jax.lax.reduce_window(
        p,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )
    peaks = jnp.where(p >= pmax, p, 0.0).reshape(B, H * W)
    scores, ind = jax.lax.top_k(peaks, k)  # (B, K)
    xi = (ind % W).astype(jnp.float32)
    yi = (ind // W).astype(jnp.float32)

    def gather(m: jax.Array, c: int) -> jax.Array:
        flat = m.astype(jnp.float32).reshape(B, H * W, c)
        return jnp.take_along_axis(flat, ind[..., None], axis=1)

    off = gather(offset, 2)
    wh = jnp.maximum(gather(size, 2), 0.0)
    cxp = (xi + off[..., 0]) * stride
    cyp = (yi + off[..., 1]) * stride
    bw = wh[..., 0] * stride
    bh = wh[..., 1] * stride
    boxes = jnp.stack([cxp - bw / 2, cyp - bh / 2, bw, bh], axis=-1)

    jo = gather(kpts, 2 * Kj).reshape(B, k, Kj, 2)  # cells from int cell
    px = (xi[..., None] + jo[..., 0]) * stride
    py = (yi[..., None] + jo[..., 1]) * stride
    poses = jnp.stack([px, py], axis=-1)

    if kpt_heat is None:
        kpt_scores = jnp.tile(scores[..., None], (1, 1, Kj))
        return boxes, scores, poses, kpt_scores

    # --- CenterNet snap refinement, static shapes throughout ---
    P = min(snap_candidates, H * W)
    ph = jax.nn.sigmoid(kpt_heat.astype(jnp.float32))  # (B, H, W, Kj)
    phm = jax.lax.reduce_window(
        ph,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    jpeaks = jnp.where(ph >= phm, ph, 0.0)
    jflat = jnp.moveaxis(jpeaks, -1, 1).reshape(B, Kj, H * W)
    cs, ci = jax.lax.top_k(jflat, P)  # (B, Kj, P)
    cxi = (ci % W).astype(jnp.float32)
    cyi = (ci // W).astype(jnp.float32)
    if kpt_offset is not None:
        joff = kpt_offset.astype(jnp.float32).reshape(B, H * W, 2)
        idx = ci.reshape(B, Kj * P)
        ox = jnp.take_along_axis(joff[..., 0], idx, axis=1)
        oy = jnp.take_along_axis(joff[..., 1], idx, axis=1)
        cxi = cxi + ox.reshape(B, Kj, P)
        cyi = cyi + oy.reshape(B, Kj, P)
    cand_x = cxi * stride  # (B, Kj, P) input px
    cand_y = cyi * stride

    # Distances regressed joint -> candidate, per person: (B, k, Kj, P).
    dx = poses[..., 0][..., None] - cand_x[:, None]
    dy = poses[..., 1][..., None] - cand_y[:, None]
    d2 = dx * dx + dy * dy
    x0 = boxes[..., 0][..., None, None]
    y0 = boxes[..., 1][..., None, None]
    x1 = (boxes[..., 0] + boxes[..., 2])[..., None, None]
    y1 = (boxes[..., 1] + boxes[..., 3])[..., None, None]
    cx4 = cand_x[:, None]
    cy4 = cand_y[:, None]
    ok = (
        (cs[:, None] >= snap_threshold)
        & (cx4 >= x0) & (cx4 <= x1)
        & (cy4 >= y0) & (cy4 <= y1)
    )
    best = jnp.argmin(jnp.where(ok, d2, jnp.inf), axis=-1)  # (B, k, Kj)
    any_ok = ok.any(axis=-1)

    def pick(c: jax.Array) -> jax.Array:  # (B, Kj, P) -> (B, k, Kj)
        full = jnp.broadcast_to(c[:, None], (B, k, Kj, P))
        return jnp.take_along_axis(full, best[..., None], axis=-1)[..., 0]

    snapped = jnp.stack([pick(cand_x), pick(cand_y)], axis=-1)
    poses_out = jnp.where(any_ok[..., None], snapped, poses)

    # Per-joint confidence: snapped peak probability, else the heatmap
    # probability at the regressed joint's cell.
    rxi = jnp.clip(jnp.round(poses[..., 0] / stride), 0, W - 1)
    ryi = jnp.clip(jnp.round(poses[..., 1] / stride), 0, H - 1)
    cell = (ryi * W + rxi).astype(jnp.int32)  # (B, k, Kj)
    comb = cell * Kj + jnp.arange(Kj, dtype=jnp.int32)[None, None, :]
    reg_val = jnp.take_along_axis(
        ph.reshape(B, H * W * Kj), comb.reshape(B, k * Kj), axis=1
    ).reshape(B, k, Kj)
    kpt_scores = jnp.where(any_ok, pick(cs), reg_val)
    return boxes, scores, poses_out, kpt_scores
