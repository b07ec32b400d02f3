"""Detection loss: penalty-reduced focal on the center heatmap + gathered
L1 on size/offset (the CenterNet objective, expressed TPU-first).

Everything is one fused elementwise program under jit: the focal term is a
single (B, H, W) map select, and the regression terms GATHER predictions at
the M encoded center indices instead of scattering targets into dense maps
(see detect/codec.py — gathers keep shapes static and XLA happy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["detection_loss"]


def detection_loss(
    pred: dict,
    targets: dict,
    size_weight: float = 0.1,
    offset_weight: float = 1.0,
    kpt_weight: float = 1.0,
    kpt_heat_weight: float = 1.0,
    kpt_offset_weight: float = 1.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """pred: model output dict (center logits / size / offset maps).
    targets: encode_boxes output dict. Returns (total, per-term dict).

    Focal form (alpha=2, beta=4): positives are the exactly-1.0 splat
    centers; every other cell is a negative down-weighted by (1 - heat)^4
    so the Gaussian shoulders near a true center barely penalize confident
    predictions there. Negatives inside ignore regions (crowds / unlabeled
    people) carry neg_weight 0 — the detection-side analogue of the COCO
    keypoint evaluator's detection-absorbing ignore machinery.
    Normalization is by the true positive count (clipped to 1), per the
    standard objective.
    """
    logits = pred["center"].astype(jnp.float32)[..., 0]  # (B, H, W)
    heat = targets["heat"]
    pos = heat >= 1.0 - 1e-6
    p = jax.nn.sigmoid(logits)
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    pos_term = -((1.0 - p) ** 2) * log_p
    neg_term = -((1.0 - heat) ** 4) * (p**2) * log_np
    neg_term = neg_term * targets.get("neg_weight", 1.0)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    center_loss = jnp.sum(jnp.where(pos, pos_term, neg_term)) / n_pos

    ind = targets["ind"]  # (B, M)
    mask = targets["mask"].astype(jnp.float32)[..., None]  # (B, M, 1)
    B = ind.shape[0]

    def gather2(m: jax.Array) -> jax.Array:  # (B, H, W, 2) -> (B, M, 2)
        flat = m.astype(jnp.float32).reshape(B, -1, 2)
        return jnp.take_along_axis(flat, ind[..., None], axis=1)

    denom = jnp.maximum(jnp.sum(mask) * 2.0, 1.0)
    size_loss = (
        jnp.sum(jnp.abs(gather2(pred["size"]) - targets["size"]) * mask)
        / denom
    )
    offset_loss = (
        jnp.sum(jnp.abs(gather2(pred["offset"]) - targets["offset"]) * mask)
        / denom
    )
    total = (
        center_loss + size_weight * size_loss + offset_weight * offset_loss
    )
    terms = dict(center=center_loss, size=size_loss, offset=offset_loss)
    if "kpts" in pred and "kpts" in targets:
        # Single-stage pose: gathered L1 on the joint-offset regression at
        # each center, masked to labeled joints of valid instances —
        # the CenterNet pose objective (same gather formulation as
        # size/offset; no dense scatter).
        Kj = targets["kpts"].shape[2]
        flat = pred["kpts"].astype(jnp.float32).reshape(B, -1, 2 * Kj)
        at_ctr = jnp.take_along_axis(flat, ind[..., None], axis=1)
        at_ctr = at_ctr.reshape(B, -1, Kj, 2)
        km = targets["kpt_mask"].astype(jnp.float32)[..., None]
        kdenom = jnp.maximum(jnp.sum(km) * 2.0, 1.0)
        kpt_loss = (
            jnp.sum(jnp.abs(at_ctr - targets["kpts"]) * km) / kdenom
        )
        terms["kpts"] = kpt_loss
        total = total + kpt_weight * kpt_loss
    if "kpt_heat" in pred and "kpt_heat" in targets:
        # Joint-heatmap refinement heads (model kpt_heatmaps=True): the
        # same penalty-reduced focal, per joint-type channel, plus
        # gathered L1 on the shared sub-cell joint offset at each labeled
        # joint's cell (the CenterNet pose refinement objective).
        klog = pred["kpt_heat"].astype(jnp.float32)  # (B, H, W, K)
        kheat = targets["kpt_heat"]
        kpos = kheat >= 1.0 - 1e-6
        kp_ = jax.nn.sigmoid(klog)
        kpos_term = -((1.0 - kp_) ** 2) * jax.nn.log_sigmoid(klog)
        kneg_term = (
            -((1.0 - kheat) ** 4)
            * (kp_**2)
            * jax.nn.log_sigmoid(-klog)
        )
        if "neg_weight" in targets:
            kneg_term = kneg_term * targets["neg_weight"][..., None]
        kn_pos = jnp.maximum(jnp.sum(kpos), 1.0)
        kpt_heat_loss = (
            jnp.sum(jnp.where(kpos, kpos_term, kneg_term)) / kn_pos
        )
        terms["kpt_heat"] = kpt_heat_loss
        total = total + kpt_heat_weight * kpt_heat_loss

        joff = pred["kpt_offset"].astype(jnp.float32).reshape(B, -1, 2)
        kind = targets["kpt_ind"]  # (B, M, K)
        _, M, Kj = kind.shape
        at = jnp.take_along_axis(
            joff, kind.reshape(B, M * Kj)[..., None], axis=1
        ).reshape(B, M, Kj, 2)
        km2 = targets["kpt_cell_mask"].astype(jnp.float32)[..., None]
        kodenom = jnp.maximum(jnp.sum(km2) * 2.0, 1.0)
        kpt_offset_loss = (
            jnp.sum(jnp.abs(at - targets["kpt_off"]) * km2) / kodenom
        )
        terms["kpt_offset"] = kpt_offset_loss
        total = total + kpt_offset_weight * kpt_offset_loss
    terms["total"] = total
    return total, terms
