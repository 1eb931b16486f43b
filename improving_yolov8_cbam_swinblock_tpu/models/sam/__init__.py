"""SAM — Segment Anything, TPU-native.

Re-design of reference models/sam/{model,predict,build,amg}.py around two
jitted programs: `encode` (ViT image embedding, run once per image) and
`decode` (prompt -> masks, run per prompt batch with STATIC prompt slot
counts). The reference's dynamic everything-mode machinery (amg.py crop
loops, ragged filtering) becomes: fixed point-grid batches on device,
filtering + NMS on host.

Supported (reference parity):
  * point / box prompts, multimask output + IoU predictions
    (predict.py Predictor.prompt_inference);
  * everything mode: point grid, predicted-IoU + stability-score
    filtering, box NMS (amg.py + generate);
  * model sizes sam_b / sam_l / sam_h (build.py:23-56).

Also here: the SAM2 facade (`SAM("sam2_t")` or `SAM2(...)`) — Hiera
encoder + memory-bank video propagation, modules in sam2.py.

Deviations (documented):
  * no pretrained weights (zero egress) — the architecture is exact, so a
    weight importer can fill it from SAM .pth checkpoints like
    utils/torch_import.py does for YOLO.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...engine.results import Masks, Results
from .modules import ImageEncoderViT, MaskDecoder, PromptEncoder

_CONFIGS = {
    "sam_b": dict(embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11)),
    "sam_l": dict(embed_dim=1024, depth=24, num_heads=16, global_attn_indexes=(5, 11, 17, 23)),
    "sam_h": dict(embed_dim=1280, depth=32, num_heads=16, global_attn_indexes=(7, 15, 23, 31)),
    # MobileSAM: TinyViT trunk (reference build.py:69-80 build_mobile_sam)
    "mobile_sam": dict(trunk="tiny"),
}
_MEAN = np.array([123.675, 116.28, 103.53], np.float32)  # reference sam.py pixel_mean
_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SAMModel(nn.Module):
    """Encoder + prompt encoder + mask decoder (reference modules/sam.py
    SAMModel)."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: tuple = (2, 5, 8, 11)
    img_size: int = 1024
    trunk: str = "vit"  # "vit" (SAM) or "tiny" (MobileSAM TinyViT)
    dtype: Any = jnp.float32

    def setup(self):
        g = self.img_size // 16
        if self.trunk == "tiny":
            from .tiny_encoder import TinyViT

            self.image_encoder = TinyViT(dtype=self.dtype, name="image_encoder")
        else:
            self.image_encoder = ImageEncoderViT(
                embed_dim=self.embed_dim, depth=self.depth, num_heads=self.num_heads,
                global_attn_indexes=self.global_attn_indexes, img_size=self.img_size,
                dtype=self.dtype, name="image_encoder",
            )
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=(g, g), input_image_size=(self.img_size,) * 2,
            dtype=self.dtype, name="prompt_encoder",
        )
        self.mask_decoder = MaskDecoder(dtype=self.dtype, name="mask_decoder")

    def encode(self, x):  # (B, S, S, 3) normalized
        return self.image_encoder(x)

    def decode(self, embedding, points, labels, multimask: bool = True):
        """embedding (1, g, g, 256); points (N, S, 2) / labels (N, S) — N
        prompts share the image. Returns (N, k, 4g, 4g) logits + (N, k) iou."""
        sparse, dense = self.prompt_encoder(points, labels)
        pe = self.prompt_encoder.image_pe()
        emb = jnp.broadcast_to(embedding, (points.shape[0],) + embedding.shape[1:])
        masks, iou = self.mask_decoder(emb, pe, sparse, dense)
        return (masks[:, 1:], iou[:, 1:]) if multimask else (masks[:, :1], iou[:, :1])

    def __call__(self, x, points, labels):  # init path
        emb = self.encode(x)
        return self.decode(emb, points, labels)


class SAM:
    """SAM facade (reference models/sam/model.py): `SAM("sam_b")`,
    `results = sam(img, points=[[x, y]])` / `bboxes=[[x1,y1,x2,y2]]` /
    no prompts -> everything mode. `SAM("sam2_t")` returns the SAM2
    facade (reference build.py sam_model_map routes sam2_* the same way)."""

    def __new__(cls, model: str = "sam_b", *args, **kwargs):
        if cls is SAM and "sam2" in str(model):
            return super().__new__(SAM2)
        return super().__new__(cls)

    def __init__(self, model: str = "sam_b", img_size: int = 1024, dtype=jnp.float32, points_per_side: int = 16):
        key = str(model).replace(".pt", "").replace(".yaml", "")
        if key not in _CONFIGS:
            raise ValueError(f"unknown SAM variant {model!r}; choose from {sorted(_CONFIGS)}")
        self.cfg_name = key
        self.task = "segment"
        self.img_size = img_size
        self.points_per_side = points_per_side
        self.net = SAMModel(img_size=img_size, dtype=dtype, **_CONFIGS[key])
        self.variables = None
        self._encode = jax.jit(lambda v, x: self.net.apply(v, x, method=SAMModel.encode))
        self._decode = jax.jit(
            lambda v, e, p, l, mm: self.net.apply(v, e, p, l, mm, method=SAMModel.decode),
            static_argnames="mm",
        )
        self._cache = None  # (embedding, scale, (h0, w0))

    # ------------------------------------------------------------------
    def _ensure_variables(self):
        if self.variables is None:
            x = jnp.zeros((1, self.img_size, self.img_size, 3), jnp.float32)
            pts = jnp.zeros((1, 2, 2), jnp.float32)
            lbl = -jnp.ones((1, 2), jnp.int32)
            self.variables = self.net.init(jax.random.PRNGKey(0), x, pts, lbl)

    def param_count(self) -> int:
        self._ensure_variables()
        return sum(int(math.prod(p.shape)) for p in jax.tree.leaves(self.variables["params"]))

    def set_image(self, img: np.ndarray):
        """Resize-longest-side + normalize + pad, then encode (reference
        predict.py set_image/preprocess)."""
        import cv2

        self._ensure_variables()
        h0, w0 = img.shape[:2]
        scale = self.img_size / max(h0, w0)
        nh, nw = round(h0 * scale), round(w0 * scale)
        resized = cv2.resize(img[..., ::-1], (nw, nh), interpolation=cv2.INTER_LINEAR)  # BGR->RGB
        norm = (resized.astype(np.float32) - _MEAN) / _STD
        canvas = np.zeros((self.img_size, self.img_size, 3), np.float32)
        canvas[:nh, :nw] = norm
        emb = self._encode(self.variables, jnp.asarray(canvas[None]))
        self._cache = (emb, scale, (h0, w0), (nh, nw))
        return emb

    def _masks_to_original(self, logits: np.ndarray) -> np.ndarray:
        """(N, 4g, 4g) logits -> (N, h0, w0) bool in the original frame."""
        import cv2

        _, scale, (h0, w0), (nh, nw) = self._cache
        out = []
        for m in logits:
            up = cv2.resize(m, (self.img_size, self.img_size), interpolation=cv2.INTER_LINEAR)
            up = up[:nh, :nw]
            out.append(cv2.resize(up, (w0, h0), interpolation=cv2.INTER_LINEAR) > 0.0)
        return np.stack(out) if out else np.zeros((0, h0, w0), bool)

    def _prompt_masks(self, points=None, labels=None, bboxes=None, multimask_output: bool = False):
        scale = self._cache[1]
        prompts, labs = [], []
        if bboxes is not None:
            for b in np.atleast_2d(np.asarray(bboxes, np.float32)):
                prompts.append([[b[0] * scale, b[1] * scale], [b[2] * scale, b[3] * scale]])
                labs.append([2, 3])
        if points is not None:
            pts = np.atleast_2d(np.asarray(points, np.float32))
            pl = np.ones(len(pts), np.int32) if labels is None else np.asarray(labels, np.int32)
            for p, l in zip(pts, pl):
                prompts.append([[p[0] * scale, p[1] * scale], [0.0, 0.0]])
                labs.append([int(l), -1])
        pts = jnp.asarray(np.asarray(prompts, np.float32))
        lbl = jnp.asarray(np.asarray(labs, np.int32))
        masks, iou = self._decode(self.variables, self._cache[0], pts, lbl, multimask_output)
        masks, iou = np.asarray(masks), np.asarray(iou)
        best = iou.argmax(axis=1) if multimask_output else np.zeros(len(masks), int)
        sel = masks[np.arange(len(masks)), best]
        return self._masks_to_original(sel), iou[np.arange(len(iou)), best]

    def _generate(self, conf: float = 0.5, stability_thresh: float = 0.85, nms_iou: float = 0.7):
        """Everything mode (reference amg.py + predict.py generate):
        point grid -> multimask decode -> IoU + stability filter -> NMS."""
        n = self.points_per_side
        _, scale, (h0, w0), _ = self._cache
        gx = (np.arange(n) + 0.5) / n * w0
        gy = (np.arange(n) + 0.5) / n * h0
        grid = np.stack(np.meshgrid(gx, gy), -1).reshape(-1, 2)
        all_logits, all_iou = [], []
        chunk = 64
        for lo in range(0, len(grid), chunk):
            g = grid[lo : lo + chunk]
            if len(g) < chunk:  # pad to the jitted shape
                g = np.concatenate([g, np.zeros((chunk - len(g), 2), np.float32)])
            pts = jnp.asarray(np.stack([np.stack([p * scale, [0, 0]]) for p in g]), jnp.float32)
            lbl = jnp.asarray(np.tile(np.asarray([1, -1], np.int32), (chunk, 1)))
            m, i = self._decode(self.variables, self._cache[0], pts, lbl, True)
            all_logits.append(np.asarray(m))
            all_iou.append(np.asarray(i))
        logits = np.concatenate(all_logits)[: len(grid)]  # (N, k, S, S)
        ious = np.concatenate(all_iou)[: len(grid)]
        # flatten multimask
        k = logits.shape[1]
        logits = logits.reshape(-1, *logits.shape[2:])
        ious = ious.reshape(-1)
        keep = ious > conf
        # stability score (reference amg.py calculate_stability_score)
        hi = (logits > 1.0).sum((1, 2)).astype(np.float32)
        lo_ = (logits > -1.0).sum((1, 2)).astype(np.float32)
        stability = hi / np.maximum(lo_, 1)
        keep &= stability > stability_thresh
        logits, ious = logits[keep], ious[keep]
        masks = self._masks_to_original(logits)
        # boxes from masks + NMS on host
        boxes = []
        for m in masks:
            ys, xs = np.nonzero(m)
            if len(xs) == 0:
                boxes.append([0, 0, 0, 0])
            else:
                boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
        boxes = np.asarray(boxes, np.float32)
        order = np.argsort(-ious)
        kept = []
        for i in order:
            ok = True
            for j in kept:
                lt = np.maximum(boxes[i, :2], boxes[j, :2])
                rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
                inter = np.prod(np.clip(rb - lt, 0, None))
                ua = np.prod(boxes[i, 2:] - boxes[i, :2]) + np.prod(boxes[j, 2:] - boxes[j, :2]) - inter
                if inter / max(ua, 1e-9) > nms_iou:
                    ok = False
                    break
            if ok:
                kept.append(i)
        return masks[kept], ious[kept], boxes[kept]

    # ------------------------------------------------------------------
    def predict(self, source, points=None, labels=None, bboxes=None,
                multimask_output: bool = False, **kwargs):
        import cv2

        if isinstance(source, str):
            img = cv2.imread(source)
            path = source
        else:
            img = np.asarray(source)
            path = "array"
        self.set_image(img)
        names = {0: "object"}
        if points is None and bboxes is None:
            masks, ious, boxes = self._generate(**{k: v for k, v in kwargs.items()
                                                   if k in ("conf", "stability_thresh", "nms_iou")})
        else:
            masks, ious = self._prompt_masks(points, labels, bboxes, multimask_output)
            boxes = []
            for m in masks:
                ys, xs = np.nonzero(m)
                boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1] if len(xs) else [0, 0, 0, 0])
            boxes = np.asarray(boxes, np.float32)
        det = np.concatenate(
            [boxes.reshape(-1, 4), ious.reshape(-1, 1), np.zeros((len(masks), 1), np.float32)], axis=1
        ) if len(masks) else np.zeros((0, 6), np.float32)
        res = Results(img, path, names, det)
        res.masks = Masks(np.asarray(masks).reshape((-1,) + img.shape[:2]), img.shape[:2])
        return [res]

    __call__ = predict

    def info(self):
        return {"model": self.cfg_name, "img_size": self.img_size, "params": self.param_count()}


# ---------------------------------------------------------------------------
# SAM2 (reference models/sam/build.py:68-118, predict.py SAM2Predictor /
# SAM2VideoPredictor; modules in sam2.py)
# ---------------------------------------------------------------------------

_SAM2_CONFIGS = {
    "sam2_t": dict(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2), global_att_blocks=(5, 7, 9),
                   window_spec=(8, 4, 14, 7), window_pos_embed_bkg_spatial_size=(7, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_s": dict(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2), global_att_blocks=(7, 10, 13),
                   window_spec=(8, 4, 14, 7), window_pos_embed_bkg_spatial_size=(7, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "sam2_b": dict(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3), global_att_blocks=(12, 16, 20),
                   window_spec=(8, 4, 14, 7), window_pos_embed_bkg_spatial_size=(14, 14),
                   backbone_channel_list=(896, 448, 224, 112)),
    "sam2_l": dict(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4), global_att_blocks=(23, 33, 43),
                   window_spec=(8, 4, 16, 8), window_pos_embed_bkg_spatial_size=(7, 7),
                   backbone_channel_list=(1152, 576, 288, 144)),
}


class SAM2(SAM):
    """SAM2 facade: image prompting like SAM (`predict`) plus video object
    tracking with a fixed-slot memory bank (`init_video` / `add_prompt` /
    `track` — reference predict.py SAM2VideoPredictor's
    add_new_prompts + propagate_in_video, re-shaped into per-frame jitted
    steps over static memory slots)."""

    def __init__(self, model: str = "sam2_t", img_size: int = 1024, dtype=jnp.float32,
                 points_per_side: int = 16):
        from .sam2 import SAM2Model

        raw = str(model).replace(".pt", "").replace(".yaml", "")
        v21 = "sam2.1" in raw  # sam2.1_* ckpt names (reference build.py:320-323)
        key = raw.replace("sam2.1", "sam2")
        if key not in _SAM2_CONFIGS:
            raise ValueError(f"unknown SAM2 variant {model!r}; choose from {sorted(_SAM2_CONFIGS)}")
        self.cfg_name = raw
        self.task = "segment"
        self.img_size = img_size
        self.points_per_side = points_per_side
        self.net = SAM2Model(img_size=img_size, dtype=dtype, v21=v21, **_SAM2_CONFIGS[key])
        self.variables = None
        self._video = None

        net = self.net

        def enc(v, x):
            s0, s1, top = net.apply(v, x, method=SAM2Model.encode)
            pix = net.apply(v, top, method=SAM2Model.no_mem_features)
            return s0, s1, pix, top

        def dec(v, emb, p, l, mm):
            s0, s1, pix, _ = emb
            n = p.shape[0]
            bc = lambda t: jnp.broadcast_to(t, (n,) + t.shape[1:])  # noqa: E731
            masks, ious, _, _, _ = net.apply(v, bc(pix), p, l, bc(s0), bc(s1), mm,
                                             method=SAM2Model.sam_heads)
            return masks, ious

        def prompt_step(v, emb, p, l):
            """Conditioning frame: heads + memory encode (sam.py track_step
            on an init frame)."""
            s0, s1, pix, top = emb
            masks, ious, best, obj_ptr, obj_score = net.apply(
                v, pix, p, l, s0, s1, True, method=SAM2Model.sam_heads)
            hi = jax.image.resize(best[:, 0], (1, self.img_size, self.img_size), "bilinear")[..., None]
            mem, mpos = net.apply(v, top, hi, obj_score, method=SAM2Model.encode_memory)
            return best, ious.max(-1), obj_ptr, obj_score, mem, mpos

        def track_step(v, emb, mem_feats, mem_pos, mem_valid, tpos_idx, ptrs, tdiff, pvalid):
            """Non-prompted frame: memory-conditioned heads + memory encode.
            The bank carries a leading per-object batch dim; the shared
            frame embeddings broadcast over it (one image encode per frame
            regardless of object count)."""
            s0, s1, _, top = emb
            nobj = mem_feats.shape[0]
            bc = lambda t: jnp.broadcast_to(t, (nobj,) + t.shape[1:])  # noqa: E731
            pix = net.apply(v, bc(top), mem_feats, mem_pos, mem_valid, tpos_idx,
                            ptrs, tdiff, pvalid, method=SAM2Model.condition_features)
            p = jnp.zeros((nobj, 1, 2), jnp.float32)
            l = -jnp.ones((nobj, 1), jnp.int32)
            masks, ious, best, obj_ptr, obj_score = net.apply(
                v, pix, p, l, bc(s0), bc(s1), True, method=SAM2Model.sam_heads)
            hi = jax.image.resize(best[:, 0], (nobj, self.img_size, self.img_size), "bilinear")[..., None]
            mem, mpos = net.apply(v, bc(top), hi, obj_score, method=SAM2Model.encode_memory)
            return best, ious.max(-1), obj_ptr, obj_score, mem, mpos

        self._encode = jax.jit(enc)
        self._decode = jax.jit(dec, static_argnames="mm")
        self._prompt_step = jax.jit(prompt_step)
        self._track_step = jax.jit(track_step)
        self._cache = None

    def _ensure_variables(self):
        if self.variables is None:
            x = jnp.zeros((1, self.img_size, self.img_size, 3), jnp.float32)
            pts = jnp.zeros((1, 2, 2), jnp.float32)
            lbl = -jnp.ones((1, 2), jnp.int32)
            self.variables = self.net.init(jax.random.PRNGKey(0), x, pts, lbl)

    def _set_image_cached(self, img: np.ndarray):
        """Encode the frame unless it is the one already cached — prompting
        K objects on the same frame must not re-run the Hiera encoder K
        times (the dominant cost of a step)."""
        fp = (img.shape, img.dtype.str, hash(img[:: max(1, img.shape[0] // 8)].tobytes()))
        if getattr(self, "_frame_fp", None) != fp or self._cache is None:
            self.set_image(img)
            self._frame_fp = fp

    # -- video API -------------------------------------------------------
    def init_video(self, non_overlap_masks: bool = False):
        """Reset the tracking state (reference SAM2VideoPredictor
        init_state): per-object cond-frame slot + ring of recent
        memories/pointers. `non_overlap_masks` applies the reference's
        cross-object non-overlapping constraint (sam.py:979-995) to the
        output logits when tracking multiple objects."""
        self._video = {"objs": {}, "frame": 0, "non_overlap": non_overlap_masks}

    def _prep_prompts(self, points, labels, bboxes):
        scale = self._cache[1]
        prompts, labs = [], []
        if bboxes is not None:
            b = np.asarray(bboxes, np.float32).reshape(-1)
            if b.size != 4:
                raise ValueError(
                    "SAM2 video prompting takes ONE box per object (reference "
                    "add_new_points_or_box) — call add_prompt once per obj_id"
                )
            prompts += [[b[0] * scale, b[1] * scale], [b[2] * scale, b[3] * scale]]
            labs += [2, 3]
        if points is not None:
            pts = np.atleast_2d(np.asarray(points, np.float32))
            pl = np.ones(len(pts), np.int32) if labels is None else np.asarray(labels, np.int32).reshape(-1)
            for p, l in zip(pts, pl):
                prompts.append([p[0] * scale, p[1] * scale])
                labs.append(int(l))
        if not prompts:
            prompts, labs = [[0.0, 0.0]], [-1]
        return (jnp.asarray(np.asarray(prompts, np.float32))[None],
                jnp.asarray(np.asarray(labs, np.int32))[None])

    def add_prompt(self, img: np.ndarray, points=None, labels=None, bboxes=None, obj_id=0):
        """Prompt an object on the current frame (reference
        add_new_points_or_box with obj_id) and seed its memory bank.
        Call repeatedly with distinct obj_ids to track multiple objects.
        Returns the object's mask in the original frame."""
        if self._video is None:
            self.init_video()
        st = self._video
        self._set_image_cached(img)
        pts, lbl = self._prep_prompts(points, labels, bboxes)
        best, iou, obj_ptr, obj_score, mem, mpos = self._prompt_step(self.variables, self._cache[0], pts, lbl)
        f = st["frame"]
        st["objs"][obj_id] = {
            "cond": (np.asarray(mem[0]), np.asarray(mpos[0]), np.asarray(obj_ptr[0]), f),
            "ring": {}, "ptrs": {f: np.asarray(obj_ptr[0])},
        }
        return self._masks_to_original(np.asarray(best[:, 0])), float(np.asarray(iou)[0])

    def track(self, img: np.ndarray):
        """Propagate every tracked object to the next frame (reference
        propagate_in_video single step): one shared image encode, one
        batched memory-conditioned step over all objects.

        Returns (masks (n_objs, h0, w0) in obj_id order, ious — scalar
        for a single object, (n_objs,) otherwise)."""
        st = self._video
        assert st and st["objs"], "call add_prompt first"
        self._set_image_cached(img)
        net = self.net
        S, P = net.num_maskmem, net.max_obj_ptrs
        hw = (self.img_size // 16) ** 2
        cur = st["frame"] + 1
        ids = sorted(st["objs"])
        B = len(ids)
        mem_feats = np.zeros((B, S, hw, net.mem_dim), np.float32)
        mem_pos = np.zeros((B, S, hw, net.mem_dim), np.float32)
        valid = np.zeros((B, S), bool)
        tpos = np.zeros((B, S), np.int32)
        ptrs = np.zeros((B, P, net.hidden_dim), np.float32)
        tdiff = np.zeros((B, P), np.float32)
        pvalid = np.zeros((B, P), bool)
        for bi, oid in enumerate(ids):
            ob = st["objs"][oid]
            cm, cp, cptr, cf = ob["cond"]
            mem_feats[bi, 0], mem_pos[bi, 0] = cm, cp
            valid[bi, 0], tpos[bi, 0] = True, S - 1  # cond slot (t_pos=0)
            for t_rel in range(1, S):
                f = cur - t_rel
                if f in ob["ring"]:
                    mem_feats[bi, t_rel], mem_pos[bi, t_rel] = ob["ring"][f]
                    valid[bi, t_rel], tpos[bi, t_rel] = True, t_rel - 1
            ptrs[bi, 0], tdiff[bi, 0], pvalid[bi, 0] = cptr, float(cur - cf), True
            slot = 1
            for t in range(1, P):
                f = cur - t
                if f in ob["ptrs"] and f != cf and slot < P:
                    ptrs[bi, slot], tdiff[bi, slot], pvalid[bi, slot] = ob["ptrs"][f], float(t), True
                    slot += 1
        best, iou, obj_ptr, obj_score, mem, mpos = self._track_step(
            self.variables, self._cache[0],
            jnp.asarray(mem_feats), jnp.asarray(mem_pos), jnp.asarray(valid), jnp.asarray(tpos),
            jnp.asarray(ptrs), jnp.asarray(tdiff), jnp.asarray(pvalid),
        )
        best = np.asarray(best)  # (B, 1, 4g, 4g)
        if B > 1 and st.get("non_overlap"):
            # keep the highest-scoring object per pixel; suppress others to
            # <= -10 (reference _apply_non_overlapping_constraints)
            logits = best[:, 0]
            keep = np.argmax(logits, axis=0)[None] == np.arange(B)[:, None, None]
            best = np.where(keep, logits, np.minimum(logits, -10.0))[:, None]
        for bi, oid in enumerate(ids):
            ob = st["objs"][oid]
            ob["ring"][cur] = (np.asarray(mem[bi]), np.asarray(mpos[bi]))
            ob["ptrs"][cur] = np.asarray(obj_ptr[bi])
            cf = ob["cond"][3]
            for f in [f for f in ob["ring"] if f < cur - (S - 1)]:
                del ob["ring"][f]
            for f in [f for f in ob["ptrs"] if f < cur - (P - 1) and f != cf]:
                del ob["ptrs"][f]
        st["frame"] = cur
        masks = self._masks_to_original(best[:, 0])
        ious = np.asarray(iou)
        return masks, float(ious[0]) if B == 1 else ious
