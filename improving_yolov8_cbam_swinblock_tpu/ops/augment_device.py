"""On-device (jitted) train-time augmentation: mosaic + affine + HSV + flip.

The north-star item (BASELINE.json): the data pipeline runs on-device
ahead of the model, host keeps only decode + letterbox-to-fixed-size.
Reference formulas reproduced on the TPU:

  * HSV jitter (reference augment.py:1373-1383): the uint8 LUTs are pure
    per-channel scalings, so the device version converts RGB->HSV in
    cv2's uint8 convention (H in [0,180)), scales H (mod 180) / S / V,
    and converts back — elementwise VPU work that XLA fuses into the
    input normalization.
  * Mosaic (reference augment.py:566-620): the reference's stateful
    image buffer + 2s-canvas paste becomes a batch-level gather: each
    output draws 3 donors from the same batch; the four placements are
    dynamic_slices of 114-padded sources selected by quadrant masks.
  * RandomPerspective's translate/scale (reference augment.py:1026-1130,
    rotation/shear/perspective default to 0) becomes one
    jax.image.scale_and_translate with *traced* scale/translation —
    and because mosaic probability and magnitudes arrive as traced
    scalars, close_mosaic never recompiles the step.
  * RandomFlip lr (reference augment.py:1385-1478): where-select.

Everything is fixed-shape: labels ride as (B, G, 4) normalized xywh with
a validity mask and come out as (B, 4G, 4) after mosaic; degenerate
warped boxes are masked out (box_candidates, reference augment.py:1280)
rather than dropped.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# HSV (cv2 uint8 convention: H in [0, 180), S/V in [0, 255])
# ---------------------------------------------------------------------------


def rgb_to_hsv_u8(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB (..., 3) -> float32 HSV with cv2's uint8 ranges."""
    f = img.astype(jnp.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c > 0, (h * 30.0) % 180.0, 0.0)  # 60 deg sectors / 2
    s = jnp.where(v > 0, 255.0 * c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    """float32 HSV (cv2 uint8 ranges) -> uint8 RGB."""
    h, s, v = hsv[..., 0] / 30.0, hsv[..., 1] / 255.0, hsv[..., 2]  # h in [0, 6)
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.clip(jnp.round(jnp.stack([r, g, b], axis=-1)), 0, 255).astype(jnp.uint8)


def hsv_device(img: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """Apply the reference's LUT HSV jitter with explicit per-image gains.

    img: (..., H, W, 3) uint8 RGB; gains: (..., 3) multipliers (r_h, r_s,
    r_v) — the reference samples them as uniform(-1,1)*[h,s,v]+1."""
    hsv = rgb_to_hsv_u8(img)
    g = gains[..., None, None, :]
    h = (hsv[..., 0] * g[..., 0]) % 180.0
    s = jnp.clip(hsv[..., 1] * g[..., 1], 0, 255)
    v = jnp.clip(hsv[..., 2] * g[..., 2], 0, 255)
    return hsv_to_rgb_u8(jnp.stack([h, s, v], axis=-1))


# ---------------------------------------------------------------------------
# Mosaic as batch gather + affine crop
# ---------------------------------------------------------------------------


class AugBatch(NamedTuple):
    img: jnp.ndarray  # (B, s, s, 3) uint8
    bboxes: jnp.ndarray  # (B, G', 4) normalized xywh
    cls: jnp.ndarray  # (B, G')
    mask: jnp.ndarray  # (B, G')


def _mosaic_one(
    srcs: jnp.ndarray,  # (4, s, s, 3) uint8 — main image + 3 donors
    boxes: jnp.ndarray,  # (4, G, 4) pixel xyxy in each source frame
    cls: jnp.ndarray,  # (4, G)
    mask: jnp.ndarray,  # (4, G)
    center: jnp.ndarray,  # (2,) = (xc, yc) in [s/2, 3s/2]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference mosaic4 placement (augment.py:566-620) with static shapes.
    Returns the 2s canvas + shifted labels (4G rows)."""
    s = srcs.shape[1]
    xc, yc = center[0], center[1]
    # per reference: image q's corner offsets so its inner corner meets (xc, yc)
    offs = jnp.stack(
        [
            jnp.stack([xc - s, yc - s]),  # top-left: bottom-right corner at (xc, yc)
            jnp.stack([xc, yc - s]),  # top-right
            jnp.stack([xc - s, yc]),  # bottom-left
            jnp.stack([xc, yc]),  # bottom-right
        ]
    ).astype(jnp.int32)  # (4, 2) = (off_x, off_y)

    def place(img, off):
        # offsets span [-s/2, 3s/2] across the four quadrants, so the pad
        # must be 3s/2 each side for the 2s slice window to stay in bounds
        pad = (3 * s) // 2
        padded = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), constant_values=114)
        return jax.lax.dynamic_slice(padded, (pad - off[1], pad - off[0], 0), (2 * s, 2 * s, 3))

    shifted = jax.vmap(place)(srcs, offs)  # (4, 2s, 2s, 3)
    yy, xx = jnp.mgrid[0 : 2 * s, 0 : 2 * s]
    top, left = yy < yc, xx < xc
    sel = jnp.stack([top & left, top & ~left, ~top & left, ~top & ~left])  # (4, 2s, 2s)
    canvas = (shifted * sel[..., None].astype(jnp.uint8)).sum(0).astype(jnp.uint8)

    shift = offs[:, None, :].astype(jnp.float32)  # (4, 1, 2)
    b = boxes + jnp.concatenate([shift, shift], axis=-1)  # xyxy + (dx, dy, dx, dy)
    b = jnp.clip(b, 0, 2 * s)
    return canvas, b.reshape(-1, 4), cls.reshape(-1), mask.reshape(-1)


def _affine_crop(
    canvas: jnp.ndarray,  # (2s, 2s, 3) uint8
    boxes: jnp.ndarray,  # (N, 4) pixel xyxy on the canvas
    k: jnp.ndarray,  # () scale
    t: jnp.ndarray,  # (2,) = (tx, ty) output-frame translation of the canvas center
    out_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x_out = k*(x_canvas - s) + t — the reference affine with
    rotation/shear/perspective at their 0 defaults (augment.py:1026-1130).
    Returns (image, warped boxes, candidate mask)."""
    s = canvas.shape[0] // 2
    # jax.image.scale_and_translate samples at half-integer pixel centers
    # (x_in = (x_out + .5 - translation)/scale - .5) while cv2.warpAffine
    # uses integer coords; the 0.5*(1-k) term aligns the two conventions
    translation = jnp.stack([t[1] - k * s, t[0] - k * s]) + 0.5 - 0.5 * k  # (y, x)
    img = jax.image.scale_and_translate(
        canvas.astype(jnp.float32),
        (out_size, out_size, 3),
        (0, 1),
        jnp.stack([k, k]),
        translation,
        method="linear",
        antialias=False,  # cv2.warpAffine point-samples; no minification filter
    )
    # out-of-canvas samples get 0 from the resampler; reference pads 114
    ones = jax.image.scale_and_translate(
        jnp.ones((2 * s, 2 * s, 1), jnp.float32), (out_size, out_size, 1), (0, 1),
        jnp.stack([k, k]), translation, method="linear", antialias=False,
    )
    img = img + (1.0 - ones) * 114.0
    img = jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)

    shift = jnp.stack([t[0] - k * s, t[1] - k * s])
    nb = boxes * k + jnp.concatenate([shift, shift])
    w1 = (boxes[:, 2] - boxes[:, 0]) * k
    h1 = (boxes[:, 3] - boxes[:, 1]) * k
    nb = jnp.clip(nb, 0, out_size)
    w2, h2 = nb[:, 2] - nb[:, 0], nb[:, 3] - nb[:, 1]
    ar = jnp.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    cand = (w2 > 2) & (h2 > 2) & (w2 * h2 / (w1 * h1 + 1e-16) > 0.1) & (ar < 100)
    return img, nb, cand


def mosaic_affine_device(
    imgs: jnp.ndarray,  # (B, s, s, 3) uint8
    bboxes_n: jnp.ndarray,  # (B, G, 4) normalized xywh
    cls: jnp.ndarray,  # (B, G)
    mask: jnp.ndarray,  # (B, G)
    donors: jnp.ndarray,  # (B, 3) int indices into the batch
    centers: jnp.ndarray,  # (B, 2) mosaic centers in [s/2, 3s/2]
    scales: jnp.ndarray,  # (B,) affine scale
    trans: jnp.ndarray,  # (B, 2) affine translation (output px)
    use_mosaic: jnp.ndarray,  # (B,) bool — per-image probability gate
) -> AugBatch:
    """Batched mosaic+affine. Non-mosaic images go through the same affine
    on a centered 2s canvas (identity placement), so both paths share one
    fixed-shape program and the mosaic probability needs no recompile."""
    b, s = imgs.shape[0], imgs.shape[1]
    g = bboxes_n.shape[1]

    # pixel xyxy in the source frame
    xy = bboxes_n * s
    half = xy[..., 2:4] / 2
    px_boxes = jnp.concatenate([xy[..., :2] - half, xy[..., :2] + half], axis=-1)

    idx4 = jnp.concatenate([jnp.arange(b)[:, None], donors], axis=1)  # (B, 4)
    srcs = imgs[idx4]  # (B, 4, s, s, 3)
    sb = px_boxes[idx4]  # (B, 4, G, 4)
    sc = cls[idx4]
    sm = mask[idx4]

    canvas, mboxes, mcls, mmask = jax.vmap(_mosaic_one)(srcs, sb, sc, sm, centers)

    # plain path: source image centered on the 2s canvas (offset s/2)
    pad = jnp.full((b, 2 * s, 2 * s, 3), 114, jnp.uint8)
    plain = jax.lax.dynamic_update_slice(pad, imgs, (0, s // 2, s // 2, 0))
    pboxes = jnp.pad(px_boxes + s // 2, ((0, 0), (0, 3 * g), (0, 0)))
    pcls = jnp.pad(cls, ((0, 0), (0, 3 * g)))
    pmask = jnp.pad(mask, ((0, 0), (0, 3 * g)))

    um = use_mosaic
    canvas = jnp.where(um[:, None, None, None], canvas, plain)
    mboxes = jnp.where(um[:, None, None], mboxes, pboxes)
    mcls = jnp.where(um[:, None], mcls, pcls)
    mmask = jnp.where(um[:, None], mmask, pmask)

    out_img, out_boxes, cand = jax.vmap(lambda c, bb, k, t: _affine_crop(c, bb, k, t, s))(
        canvas, mboxes, scales, trans
    )
    out_mask = mmask * cand.astype(mmask.dtype)

    # back to normalized xywh
    wh = out_boxes[..., 2:4] - out_boxes[..., :2]
    ctr = (out_boxes[..., :2] + out_boxes[..., 2:4]) / 2
    out_n = jnp.concatenate([ctr, wh], axis=-1) / s * out_mask[..., None]
    return AugBatch(out_img, out_n, mcls * out_mask, out_mask)


def flip_lr_device(batch: AugBatch, flip: jnp.ndarray) -> AugBatch:
    """Horizontal flip where flip[b] (reference augment.py RandomFlip)."""
    img = jnp.where(flip[:, None, None, None], batch.img[:, :, ::-1], batch.img)
    bx = batch.bboxes
    fx = jnp.where(flip[:, None], (1.0 - bx[..., 0]) * batch.mask, bx[..., 0])
    boxes = jnp.concatenate([fx[..., None], bx[..., 1:]], axis=-1)
    return AugBatch(img, boxes, batch.cls, batch.mask)


def device_augment(
    key: jax.Array,
    img: jnp.ndarray,  # (B, s, s, 3) uint8 RGB (host letterboxed only)
    bboxes: jnp.ndarray,  # (B, G, 4) normalized xywh
    cls: jnp.ndarray,
    mask: jnp.ndarray,
    hyp: Dict[str, jnp.ndarray],  # traced scalars: mosaic, scale, translate,
    # fliplr, flipud(ignored=0 default), hsv_h, hsv_s, hsv_v
) -> AugBatch:
    """Full on-device train pipeline; all randomness from `key`, all
    hyperparameters traced (close_mosaic is a value change, not a
    recompile)."""
    b, s = img.shape[0], img.shape[1]
    ks = jax.random.split(key, 7)
    donors = jax.random.randint(ks[0], (b, 3), 0, b)
    centers = jax.random.uniform(ks[1], (b, 2), minval=s / 2, maxval=3 * s / 2)
    scales = jax.random.uniform(ks[2], (b,), minval=1.0 - hyp["scale"], maxval=1.0 + hyp["scale"])
    trans = jax.random.uniform(
        ks[3], (b, 2), minval=(0.5 - hyp["translate"]) * s, maxval=(0.5 + hyp["translate"]) * s
    )
    use_mosaic = jax.random.uniform(ks[4], (b,)) < hyp["mosaic"]
    out = mosaic_affine_device(img, bboxes, cls, mask, donors, centers, scales, trans, use_mosaic)

    gains = (
        jax.random.uniform(ks[5], (b, 3), minval=-1.0, maxval=1.0)
        * jnp.stack([hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"]])
        + 1.0
    )
    out = out._replace(img=hsv_device(out.img, gains))
    flip = jax.random.uniform(ks[6], (b,)) < hyp["fliplr"]
    return flip_lr_device(out, flip)
