"""RT-DETR detection loss: Hungarian matching + focal/varifocal + L1/GIoU.

Fixed-shape re-design of reference models/utils/loss.py:13-444
(DETRLoss / RTDETRDetectionLoss) and models/utils/ops.py:12-127
(HungarianMatcher):

  * GT arrives dense-padded (B, G) — the same contract as detection_loss —
    instead of the reference's ragged `gt_groups` lists; padded GT columns
    get a constant huge matching cost, so the optimal assignment of real
    columns is untouched and their contributions are masked out of every
    reduction;
  * cost matrices for all (1 + ndl) supervised layers are built in-graph
    and solved with ONE `jax.pure_callback` into scipy's
    linear_sum_assignment (the assignment is a non-differentiable integer
    program; the reference also hops to CPU for it, ops.py:121-122);
  * the denoising branch needs no matcher at all: with the fixed-shape
    CDN layout (nn/transformer.py get_cdn_group), positive dn query
    `g*G + j` corresponds to GT slot `j` by construction, so the match is
    the identity over tiled targets (reference get_dn_match_indices).

All loss math runs in fp32.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou
from .loss import bce_with_logits

_BIG = 1.0e6


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """Batched rectangular assignment: (N, nq, G) cost -> (N, G) query index
    chosen for each GT column (nq >= G so every column is assigned)."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, np.float64)
    out = np.zeros((cost.shape[0], cost.shape[2]), np.int32)
    for i in range(cost.shape[0]):
        rows, cols = linear_sum_assignment(cost[i])
        out[i, cols] = rows.astype(np.int32)
    return out


def hungarian_assign(pred_bboxes, pred_scores, gt_bboxes, gt_cls, gt_mask):
    """HungarianMatcher (reference ops.py:59-127) over dense padded GT.

    Args:
        pred_bboxes: (..., nq, 4) sigmoid xywh (detached by caller's use).
        pred_scores: (..., nq, nc) logits.
        gt_bboxes: (..., G, 4) normalized xywh.
        gt_cls: (..., G) int.
        gt_mask: (..., G) 0/1 validity.

    Returns: (..., G) int32 — the query index assigned to each GT slot.
    """
    pb = jax.lax.stop_gradient(pred_bboxes.astype(jnp.float32))
    pr = jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores.astype(jnp.float32)))
    # classification cost at each GT's class (focal form, alpha .25 gamma 2)
    sc = jnp.take_along_axis(pr, gt_cls[..., None, :].astype(jnp.int32), axis=-1)  # (..., nq, G)
    pos = 0.25 * ((1.0 - sc) ** 2.0) * (-jnp.log(sc + 1e-8))
    neg = 0.75 * (sc**2.0) * (-jnp.log(1.0 - sc + 1e-8))
    cost_class = pos - neg
    cost_bbox = jnp.abs(pb[..., :, None, :] - gt_bboxes[..., None, :, :]).sum(-1)  # (..., nq, G)
    giou = bbox_iou(pb[..., :, None, :], gt_bboxes[..., None, :, :], xywh=True, GIoU=True)[..., 0]
    cost = 2.0 * cost_class + 5.0 * cost_bbox + 2.0 * (1.0 - giou)
    cost = jnp.where(jnp.isfinite(cost), cost, 0.0)  # reference ops.py:119
    cost = jnp.where(gt_mask[..., None, :] > 0, cost, _BIG)  # padded columns: constant

    shape = cost.shape
    flat = cost.reshape((-1,) + shape[-2:])
    q_idx = jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((flat.shape[0], shape[-1]), jnp.int32),
        flat,
        vmap_method="sequential",
    )
    return q_idx.reshape(shape[:-2] + (shape[-1],))


def _layer_loss(pb, ps, gt_bboxes, gt_cls, gt_mask, q_idx, nc: int, use_vfl: bool):
    """One supervised layer (reference DETRLoss._get_loss): class focal/vfl +
    L1 + GIoU, dense-masked. Shapes: pb (B, nq, 4), ps (B, nq, nc),
    gt_* (B, G, ...), q_idx (B, G). Returns (cls, bbox_l1, giou) scalars
    already multiplied by their loss gains (1 / 5 / 2)."""
    b, nq, _ = ps.shape
    ps = ps.astype(jnp.float32)
    pb = pb.astype(jnp.float32)
    valid = gt_mask > 0
    num_gts = valid.sum().astype(jnp.float32)

    pa = jnp.take_along_axis(pb, q_idx[..., None], axis=1)  # (B, G, 4) matched preds
    bidx = jnp.arange(b)[:, None]

    # class targets: matched rows get the GT class, the rest background nc
    tcls = jnp.where(valid, gt_cls, nc).astype(jnp.int32)
    targets = jnp.full((b, nq), nc, jnp.int32).at[bidx, q_idx].set(tcls)
    one_hot = jax.nn.one_hot(targets, nc + 1, dtype=jnp.float32)[..., :nc]  # (B, nq, nc)

    iou_pairs = bbox_iou(jax.lax.stop_gradient(pa), gt_bboxes, xywh=True)[..., 0]  # (B, G)
    gt_scores = (
        jnp.zeros((b, nq), jnp.float32).at[bidx, q_idx].set(jnp.where(valid, iou_pairs, 0.0))
    )
    gt_sc3 = gt_scores[..., None] * one_hot

    pr = jax.nn.sigmoid(ps)
    # VarifocalLoss (reference utils/loss.py:16-37, alpha .75 gamma 2)
    w_vfl = 0.75 * (pr**2.0) * (1.0 - one_hot) + gt_sc3 * one_hot
    vfl = (bce_with_logits(ps, gt_sc3) * w_vfl).mean(axis=1).sum()
    # FocalLoss (reference utils/loss.py:40-62, gamma 1.5 alpha .25)
    bce = bce_with_logits(ps, one_hot)
    p_t = one_hot * pr + (1.0 - one_hot) * (1.0 - pr)
    fl = (bce * (1.0 - p_t) ** 1.5 * (one_hot * 0.25 + (1.0 - one_hot) * 0.75)).mean(axis=1).sum()
    loss_cls = jnp.where((num_gts > 0) & use_vfl, vfl, fl) * nq / jnp.maximum(num_gts, 1.0)

    l1 = (jnp.abs(pa - gt_bboxes) * valid[..., None]).sum() / jnp.maximum(num_gts, 1.0)
    giou_v = bbox_iou(pa, gt_bboxes, xywh=True, GIoU=True)[..., 0]
    giou = ((1.0 - giou_v) * valid).sum() / jnp.maximum(num_gts, 1.0)
    return loss_cls, 5.0 * l1, 2.0 * giou


def detr_layers_loss(pred_bboxes, pred_scores, gt_cls, gt_xywhn, gt_mask, nc: int, use_vfl: bool = True):
    """Hungarian-matched loss for a stack of L supervised layers
    (reference DETRLoss.forward over main + aux layers). Inputs
    (L, B, nq, 4/nc) and dense GT (B, G, ...). Returns per-layer
    (cls, l1, giou) arrays of shape (L,)."""
    L = pred_bboxes.shape[0]
    rep = lambda t: jnp.broadcast_to(t[None], (L,) + t.shape)
    q_idx = hungarian_assign(pred_bboxes, pred_scores, rep(gt_xywhn), rep(gt_cls), rep(gt_mask))
    return jax.vmap(
        lambda pb, ps, qi: _layer_loss(pb, ps, gt_xywhn, gt_cls, gt_mask, qi, nc, use_vfl)
    )(pred_bboxes, pred_scores, q_idx)


@partial(jax.jit, static_argnames=("nc", "num_dn", "use_vfl"))
def rtdetr_loss(
    preds: dict,
    gt_cls: jnp.ndarray,  # (B, G) int
    gt_xywhn: jnp.ndarray,  # (B, G, 4) normalized xywh
    gt_mask: jnp.ndarray,  # (B, G) 0/1
    nc: int,
    num_dn: int = 0,
    use_vfl: bool = True,
):
    """Total RT-DETR training loss (reference RTDETRDetectionLoss.forward +
    RTDETRDetectionModel.loss, nn/tasks.py:618-663).

    `preds` is the RTDETRDecoder train dict. The first `num_dn` query slots
    of each decoder layer are the CDN group (identity-matched), the rest
    are the nq matched queries (enc outputs prepended as layer 0).

    Returns (total, (giou, cls, l1) of the final matched layer) — the
    reference logs exactly those three (rtdetr/train.py loss_names).
    """
    dec_b, dec_s = preds["dec_bboxes"], preds["dec_scores"]  # (ndl, B, num_dn+nq, .)
    enc_b, enc_s = preds["enc_bboxes"], preds["enc_scores"]  # (B, nq, .)
    gt_cls = gt_cls.astype(jnp.int32)
    gt_xywhn = gt_xywhn.astype(jnp.float32)
    gt_mask = (gt_mask > 0) & (gt_xywhn.sum(-1) > 0)

    main_b = jnp.concatenate([enc_b[None], dec_b[:, :, num_dn:]], axis=0)  # (L, B, nq, 4)
    main_s = jnp.concatenate([enc_s[None], dec_s[:, :, num_dn:]], axis=0)

    cls_l, l1_l, giou_l = detr_layers_loss(main_b, main_s, gt_cls, gt_xywhn, gt_mask, nc, use_vfl)
    total = cls_l.sum() + l1_l.sum() + giou_l.sum()
    items = (giou_l[-1], cls_l[-1], l1_l[-1])

    if num_dn > 0:
        g = gt_cls.shape[1]
        cap = min(g, max(num_dn // 2, 1))
        ng = num_dn // (2 * cap)
        dn_b, dn_s = dec_b[:, :, :num_dn], dec_s[:, :, :num_dn]
        # identity match over ng tiled copies of the (capped) GT slots
        gt_cls_dn = jnp.tile(gt_cls[:, :cap], (1, ng))
        gt_box_dn = jnp.tile(gt_xywhn[:, :cap], (1, ng, 1))
        gt_mask_dn = jnp.tile(gt_mask[:, :cap], (1, ng))
        q_dn = jnp.broadcast_to(jnp.arange(ng * cap, dtype=jnp.int32), gt_cls_dn.shape)
        dn_cls, dn_l1, dn_giou = jax.vmap(
            lambda pb, ps: _layer_loss(pb, ps, gt_box_dn, gt_cls_dn, gt_mask_dn, q_dn, nc, use_vfl)
        )(dn_b, dn_s)
        total = total + dn_cls.sum() + dn_l1.sum() + dn_giou.sum()

    return total, items
