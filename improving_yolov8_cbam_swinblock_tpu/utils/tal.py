"""Task-Aligned Assigner — functional, fixed-shape, fully vectorized.

Re-implementation of the reference TaskAlignedAssigner
(/root/reference/ultralytics/utils/tal.py:14-326) for XLA: the torch
version builds sparse masked tensors with boolean indexing and
scatter_add_; here everything is dense masked math on static shapes —
which is also the faster layout on TPU (the (B, max_gt, A) metric
tensor maps onto the VPU; no data-dependent shapes anywhere).

Semantics parity notes:
  * candidate gate: anchor center strictly inside GT (delta > eps);
  * align metric = score^alpha * CIoU^beta, computed densely then
    masked (identical values where the reference computes sparsely,
    both are exactly 0 outside the mask);
  * top-k duplicate suppression (reference tal.py:196-228) reduces to
    a one-hot scatter of the per-GT top-k — duplicates are impossible
    within a row, and invalid GTs are masked wholesale;
  * multi-GT conflicts resolved by highest CIoU (tal.py:298-326);
  * the CUDA-OOM CPU fallback (tal.py:76-83) is moot: fixed shapes
    mean memory is static and known at compile time.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


class TALResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, A) int32
    target_bboxes: jnp.ndarray  # (B, A, 4)
    target_scores: jnp.ndarray  # (B, A, nc)
    fg_mask: jnp.ndarray  # (B, A) bool
    target_gt_idx: jnp.ndarray  # (B, A) int32


def select_candidates_in_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """(A, 2), (B, G, 4 xyxy) -> (B, G, A) bool: center strictly inside box.

    Written as four fused comparisons instead of the reference's
    stacked-deltas min (tal.py:275-296): `min(deltas) > eps` ==
    `all(delta_i > eps)`, and the comparison form never materializes
    the (B, G, A, 4) delta tensor (4x the HBM traffic of the result at
    train shapes)."""
    xc, yc = xy_centers[None, None, :, 0], xy_centers[None, None, :, 1]  # (1, 1, A)
    lx, ly = gt_bboxes[..., 0, None], gt_bboxes[..., 1, None]  # (B, G, 1)
    rx, ry = gt_bboxes[..., 2, None], gt_bboxes[..., 3, None]
    return (xc - lx > eps) & (yc - ly > eps) & (rx - xc > eps) & (ry - yc > eps)


def select_highest_overlaps(mask_pos: jnp.ndarray, overlaps: jnp.ndarray):
    """Resolve anchors claimed by multiple GTs to the highest-IoU GT
    (reference tal.py:298-326).

    Args:
        mask_pos: (B, G, A) float 0/1.
        overlaps: (B, G, A).

    Returns:
        target_gt_idx (B, A), fg_mask (B, A) float, mask_pos (B, G, A).
    """
    fg_mask = mask_pos.sum(-2)  # (B, A)
    multi = (fg_mask[:, None, :] > 1.0)  # (B, 1->G, A)
    max_idx = overlaps.argmax(1)  # (B, A)
    is_max = jax.nn.one_hot(max_idx, mask_pos.shape[1], axis=1, dtype=mask_pos.dtype)  # (B, G, A)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2)
    target_gt_idx = mask_pos.argmax(-2)  # (B, A)
    return target_gt_idx, fg_mask, mask_pos


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta", "use_kernel"))
def task_aligned_assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) — sigmoid scores
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy, image units
    anc_points: jnp.ndarray,  # (A, 2)
    gt_labels: jnp.ndarray,  # (B, G, 1)
    gt_bboxes: jnp.ndarray,  # (B, G, 4) xyxy
    mask_gt: jnp.ndarray,  # (B, G, 1) float 0/1
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
    use_kernel: bool = True,
) -> TALResult:
    b, a, nc = pd_scores.shape

    # fused Pallas path: the whole per-image assignment lives in VMEM
    # (one HBM read of predictions/targets, one write of targets) vs
    # ~15 round-trips of (B, G, A) fp32 here — measured 12.6 -> ~1 ms
    # at (128, 32, 8400). Same semantics incl. tie-breaking; parity is
    # tested in tests/test_tal_kernel.py.
    if use_kernel and jax.default_backend() not in ("cpu", "METAL"):
        from ..ops.pallas.tal_kernel import tal_assign_fused, tal_kernel_supported

        if tal_kernel_supported(a, gt_bboxes.shape[1], nc, alpha, beta):
            return tal_assign_fused(
                pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt,
                topk=topk, num_classes=num_classes, eps=eps,
            )
    g = gt_bboxes.shape[1]
    compute_dtype = jnp.float32
    pd_scores = pd_scores.astype(compute_dtype)
    pd_bboxes = pd_bboxes.astype(compute_dtype)
    gt_bboxes = gt_bboxes.astype(compute_dtype)
    gt_mask = (mask_gt[..., 0] > 0).astype(compute_dtype)  # (B, G)

    # ---- positive-candidate mask + metrics (reference get_pos_mask) ----
    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes).astype(compute_dtype)  # (B,G,A)
    cand = mask_in_gts * gt_mask[..., None]

    # per-GT class scores of every anchor: (B, G, A).
    # A gather (take_along_axis) here lowers to TPU scalar gathers and
    # measured ~20 ms at (128,32,8400) together with the target gathers
    # below; the one-hot contraction is an MXU matmul and BIT-EXACT
    # (each one-hot row selects exactly one term; HIGHEST precision).
    gt_cls = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, nc - 1)
    oh_cls = jax.nn.one_hot(gt_cls, nc, dtype=compute_dtype)  # (B, G, nc)
    bbox_scores = jnp.einsum(
        "bgc,bac->bga", oh_cls, pd_scores, precision=jax.lax.Precision.HIGHEST
    )  # (B, G, A)
    bbox_scores = bbox_scores * cand

    # dense CIoU between every GT and every predicted box, masked
    iou = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True)[..., 0]
    overlaps = jnp.clip(iou, 0, None) * cand  # (B, G, A)

    align_metric = bbox_scores**alpha * overlaps**beta

    # ---- top-k per GT (reference select_topk_candidates) ----
    # lax.top_k lowers to a full stable sort of the A axis (measured
    # 31.7 ms at (128,32,8400) vs 2.5 ms for this loop; a scatter-based
    # variant measured 10.6 ms — TPU scatters serialize); we only need
    # the MEMBERSHIP mask, so extract k maxima iteratively — identical
    # tie-breaking (first index wins, like top_k) and no (B,G,k,A)
    # one-hot blowup. The compare + where bodies fuse with the argmax.
    k = min(topk, a)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, a), 2)
    mask_topk = jnp.zeros_like(align_metric)
    live = align_metric
    for _ in range(k):
        hit = (col == live.argmax(-1)[..., None]).astype(compute_dtype)  # (B,G,A)
        mask_topk = mask_topk + hit
        live = jnp.where(hit > 0, -jnp.inf, live)
    # invalid GT rows contribute nothing (reference masks via topk_mask)
    mask_pos = mask_topk * mask_in_gts * gt_mask[..., None]

    # ---- conflict resolution ----
    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps)

    # ---- gather targets (reference get_targets) ----
    # gather-free: contract one-hot(target_gt_idx) over the G axis on
    # the MXU instead of per-anchor gathers (exact — one term per row;
    # labels are small ints, exact in f32).
    oh_tgt = jax.nn.one_hot(target_gt_idx, g, dtype=compute_dtype)  # (B, A, G)
    tgt_labels = jnp.einsum(
        "bag,bg->ba", oh_tgt, gt_cls.astype(compute_dtype), precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.int32)  # (B, A)
    tgt_bboxes = jnp.einsum(
        "bag,bgc->bac", oh_tgt, gt_bboxes, precision=jax.lax.Precision.HIGHEST
    )  # (B, A, 4)
    fg_bool = fg_mask > 0
    tgt_scores = jax.nn.one_hot(tgt_labels, num_classes, dtype=compute_dtype)
    tgt_scores = jnp.where(fg_bool[..., None], tgt_scores, 0.0)

    # ---- normalization (reference _forward tail) ----
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(axis=-1, keepdims=True)  # (B, G, 1)
    pos_overlaps = (overlaps * mask_pos).max(axis=-1, keepdims=True)
    norm = (align_metric * pos_overlaps / (pos_align + eps)).max(-2)[..., None]  # (B, A, 1)
    tgt_scores = tgt_scores * norm

    return TALResult(
        target_labels=tgt_labels.astype(jnp.int32),
        target_bboxes=tgt_bboxes,
        target_scores=tgt_scores,
        fg_mask=fg_bool,
        target_gt_idx=target_gt_idx.astype(jnp.int32),
    )
