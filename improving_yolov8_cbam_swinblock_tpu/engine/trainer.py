"""Detection trainer: one jitted donated train step over a device mesh.

Replaces the reference BaseTrainer loop (reference engine/trainer.py:59-849)
with the single-controller JAX pattern (SURVEY.md §2.8 TPU equivalent):

  * no subprocess DDP relaunch — data parallelism is jit + batch sharding
    over a `Mesh`; XLA inserts the gradient all-reduce over ICI;
  * the whole optimizer (SGD nesterov, 3 param groups, per-step lr &
    momentum warmup interpolation, grad clip 10, grad accumulation to
    nbs=64, EMA ramp) lives *inside* the jitted step — the reference's
    per-iteration host-side warmup math (trainer.py:371-380) becomes
    in-graph scalar math, so no recompiles and no host sync per step;
  * AMP GradScaler is gone: bf16 on TPU needs no loss scaling
    (reference check_amp/:274 machinery intentionally absent);
  * EMA follows the reference exactly: decay 0.9999*(1-exp(-t/2000)),
    tracks params AND batch-norm statistics (torch_utils.py:620-685),
    and the EMA weights are what get validated/deployed.

Optimizer parity notes (reference build_optimizer, trainer.py:788-849):
  group g0 = conv/dense kernels -> weight decay (scaled by
  batch*accumulate/nbs); g1 = norm scales -> no decay; g2 = biases ->
  no decay + warmup from warmup_bias_lr. Torch-SGD coupling order kept:
  clip on raw grads, decay added after clip, then nesterov momentum.
"""

from __future__ import annotations

import csv
import math
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from flax import serialization
from jax.sharding import NamedSharding, PartitionSpec as P

from ..cfg import get_cfg
from ..data.dataset import DataLoader, YOLODataset, check_det_dataset
from ..nn.tasks import DetectionModel
from ..parallel.distributed import broadcast_scalar, is_main_process, local_shard_info
from ..parallel.mesh import batch_sharding, make_mesh
from ..utils.loss import detection_loss
from ..utils.callbacks import default_callbacks, run_callbacks


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    mom_buf: Any
    grad_acc: Any
    ema_params: Any
    ema_stats: Any
    ema_updates: jnp.ndarray
    var_buf: Any = None  # 2nd-moment buffers (Adam family / RMSProp only)


def param_group_of(path: tuple) -> str:
    """decay | nodecay | bias (reference build_optimizer grouping)."""
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if leaf == "bias":
        return "bias"
    if leaf == "scale":  # BatchNorm / LayerNorm scales
        return "nodecay"
    return "decay"


# optimizers with an adaptive 2nd moment (need var_buf state)
_ADAM_FAMILY = {"Adam", "Adamax", "AdamW", "NAdam", "RAdam"}
_OPTIMIZERS = _ADAM_FAMILY | {"RMSProp", "SGD"}


def resolve_optimizer(args, nc: int, nb: int):
    """Reference build_optimizer's name/lr/momentum resolution
    (reference engine/trainer.py:788-849): 'auto' picks SGD for long runs
    (>10k iterations) else AdamW with the fitted lr 0.002*5/(4+nc), and
    zeroes warmup_bias_lr for Adam. Mutates args like the reference does.

    Returns (canonical name, lr0, momentum)."""
    name = str(getattr(args, "optimizer", "auto") or "auto")
    lr0, momentum = args.lr0, args.momentum
    if name.lower() == "auto":
        # iterations = ceil(n_images / max(batch, nbs)) * epochs (reference
        # _setup_train); n_images ~ nb * batch
        iterations = math.ceil(nb * args.batch / max(args.batch, args.nbs)) * args.epochs
        lr_fit = round(0.002 * 5 / (4 + nc), 6)
        name, lr0, momentum = ("SGD", 0.01, 0.9) if iterations > 10000 else ("AdamW", lr_fit, 0.9)
        args.warmup_bias_lr = 0.0  # no higher than 0.01 for Adam
    canon = {x.lower(): x for x in _OPTIMIZERS}.get(name.lower())
    if canon is None:
        raise NotImplementedError(f"Optimizer '{name}' not in {sorted(_OPTIMIZERS)}")
    return canon, float(lr0), float(momentum)


def tree_zeros_like(tree):
    return jax.tree.map(jnp.zeros_like, tree)


def optimizer_update(opt_name, grp, p, g, b, v, lr, mom, mom_f, wd, t_opt):
    """One per-leaf optimizer step -> (new_param, new_mom, new_var).

    Each rule matches its torch.optim counterpart exactly (the reference
    build_optimizer dispatches there, engine/trainer.py:826-838);
    trajectory-parity-tested vs torch in tests/test_optimizer.py.
    `grp` is the reference's 3-way param grouping (decay/nodecay/bias);
    `mom` is the live warmup-scheduled momentum (SGD/RMSProp group key),
    `mom_f` the fixed beta1 for the Adam family, `t_opt` the 1-based
    optimizer-step index for bias correction.
    """
    p32 = p.astype(jnp.float32)
    if opt_name == "SGD":
        if grp == "decay":
            g = g + wd * p32
        b = mom * b + g
        gn = g + mom * b  # nesterov
        return (p - lr * gn).astype(p.dtype), b, v
    if opt_name == "RMSProp":
        # torch RMSprop: alpha=0.99, eps=1e-8, momentum warmed like SGD
        if grp == "decay":
            g = g + wd * p32
        v = 0.99 * v + 0.01 * g * g
        b = mom * b + g / (jnp.sqrt(v) + 1e-8)
        return (p - lr * b).astype(p.dtype), b, v
    # Adam family: betas=(momentum, 0.999) per the reference's construction
    b1, b2 = mom_f, 0.999
    if opt_name != "AdamW" and grp == "decay":
        g = g + wd * p32  # coupled decay (torch Adam family)
    b = b1 * b + (1 - b1) * g
    if opt_name == "Adamax":
        # torch adamax: infinity-norm 2nd moment, eps inside the max
        v = jnp.maximum(b2 * v, jnp.abs(g) + 1e-8)
        step_v = (lr / (1 - b1**t_opt)) * b / v
        return (p - step_v).astype(p.dtype), b, v
    v = b2 * v + (1 - b2) * g * g
    if opt_name == "NAdam":
        # torch nadam: Nesterov momentum schedule mu_i = b1*(1-0.5*0.96^(i*psi));
        # the running product is recomputed from t (scalar loop; XLA CSEs it)
        psi = 0.004
        mu_t = b1 * (1 - 0.5 * 0.96 ** (t_opt * psi))
        mu_n = b1 * (1 - 0.5 * 0.96 ** ((t_opt + 1) * psi))
        logprod = jax.lax.fori_loop(
            1,
            t_opt.astype(jnp.int32) + 1,
            lambda i, c: c + jnp.log(b1 * (1 - 0.5 * 0.96 ** (i.astype(jnp.float32) * psi))),
            jnp.float32(0.0),
        )
        mu_prod = jnp.exp(logprod)  # includes mu_t
        denom = jnp.sqrt(v / (1 - b2**t_opt)) + 1e-8
        step_v = lr * ((1 - mu_t) / (1 - mu_prod)) * g / denom + lr * (
            mu_n / (1 - mu_prod * mu_n)
        ) * b / denom
        return (p - step_v).astype(p.dtype), b, v
    mhat = b / (1 - b1**t_opt)
    if opt_name == "RAdam":
        # torch radam: rectified adaptive lr; below the variance-tractability
        # threshold (rho_t <= 5) falls back to bias-corrected momentum SGD
        # expm1 form: fp32 1-b2^t loses ~3 digits to cancellation at small t,
        # which the rho_inf - ... subtraction amplifies
        log_b2 = jnp.log(jnp.float32(b2))
        bc2 = -jnp.expm1(t_opt * log_b2)
        rho_inf = 2.0 / (1 - b2) - 1.0
        rho_t = rho_inf - 2.0 * t_opt * jnp.exp(t_opt * log_b2) / bc2
        safe = jnp.maximum(rho_t, 4.0 + 1e-3)  # keep sqrt finite when unused
        rect = jnp.sqrt(
            ((safe - 4.0) * (safe - 2.0) * rho_inf) / ((rho_inf - 4.0) * (rho_inf - 2.0) * safe)
        )
        adaptive = jnp.sqrt(bc2) / (jnp.sqrt(v) + 1e-8)
        step_v = jnp.where(rho_t > 5.0, lr * rect * mhat * adaptive, lr * mhat)
        return (p - step_v).astype(p.dtype), b, v
    vhat = v / (1 - b2**t_opt)
    step_v = lr * mhat / (jnp.sqrt(vhat) + 1e-8)
    if opt_name == "AdamW" and grp == "decay":
        step_v = step_v + lr * wd * p32  # decoupled decay
    return (p - step_v).astype(p.dtype), b, v


def make_train_state(variables, optimizer: str = "SGD") -> TrainState:
    """Fresh TrainState for a model's init variables; allocates the
    2nd-moment buffers only for adaptive optimizers."""
    params, batch_stats = variables["params"], variables["batch_stats"]
    zeros = lambda: jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)  # noqa: E731
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        mom_buf=zeros(),
        grad_acc=zeros(),
        # explicit copies: astype(fp32) on fp32 is a no-op and would alias
        # the param buffers, breaking donation
        ema_params=jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True), params),
        ema_stats=jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True), batch_stats),
        ema_updates=jnp.zeros((), jnp.int32),
        var_buf=zeros() if optimizer != "SGD" else None,
    )


class DetectionTrainer:
    """Train a DetectionModel on a YOLO dataset."""

    def __init__(self, cfg: Optional[Dict] = None, overrides: Optional[Dict] = None, model: Optional[DetectionModel] = None):
        self.args = get_cfg(cfg, overrides)
        self.callbacks = default_callbacks()
        self.model_cfg = self.args.model or "yolov8n.yaml"
        data_arg = self.args.data
        if data_arg and Path(data_arg).is_dir():
            # classification imagefolder root (train/<class>/*.jpg)
            classes = sorted(d.name for d in (Path(data_arg) / "train").iterdir() if d.is_dir())
            self.data = {"path": str(data_arg), "nc": len(classes), "names": dict(enumerate(classes))}
        else:
            self.data = check_det_dataset(data_arg)
        nc = 1 if self.args.single_cls else int(self.data["nc"])
        self.model = model or DetectionModel(
            self.model_cfg, nc=nc, dtype=jnp.bfloat16 if self.args.amp else jnp.float32,
            remat=bool(getattr(self.args, "remat", False)),
        )
        self.model.names = self.data["names"]
        # round imgsz up to the model's max stride (reference check_imgsz
        # in BaseTrainer._setup_train, trainer.py:234)
        from ..utils.checks import check_imgsz

        self.args.imgsz = check_imgsz(self.args.imgsz, stride=int(max(self.model.strides)))
        if getattr(self.model, "is_world", False) or getattr(self.model, "is_yoloe", False):
            # text features from the dataset class names (reference
            # WorldTrainer / YOLOETrainer encode category prompts,
            # world/train.py, yoloe/train.py)
            self.model.set_classes([str(v) for v in self.data["names"].values()])
        # runs/{task}/train, incrementing to train2… unless exist_ok/resume
        # pins it (reference get_save_dir, cfg/__init__.py:389)
        from ..utils.files import get_save_dir

        # the graph's head decides the task (reference guess_model_task)
        self.args.task = getattr(self.model, "task", None) or getattr(self.args, "task", "detect")
        self.save_dir = get_save_dir(self.args, mode="train")
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.wdir = self.save_dir / "weights"
        self.wdir.mkdir(parents=True, exist_ok=True)
        self.best_fitness = -1.0
        self.metrics_rows = []
        self._epoch = 0

    # ------------------------------------------------------------------
    def _select_devices(self):
        """Honor `device:` like the reference's device list
        (reference engine/trainer.py:176-185 world_size from the device
        arg): None/'' -> all local devices; int or '0,1' -> those device
        indices; anything non-numeric (e.g. 'tpu') -> all devices of
        that platform if present, else all."""
        devs = jax.devices()
        d = getattr(self.args, "device", None)
        if d in (None, "", "null"):
            return devs
        try:
            if isinstance(d, (list, tuple)):
                idx = [int(x) for x in d]
            else:
                idx = [int(x) for x in str(d).split(",") if str(x).strip() != ""]
            return [devs[i] for i in idx]
        except (ValueError, IndexError):
            plat = [x for x in devs if x.platform == str(d).lower()]
            return plat or devs

    def _make_mesh(self):
        """Data-parallel mesh over the selected devices — the product-path
        replacement for reference subprocess-DDP (trainer.py:176-232).
        The data axis is the largest divisor of the global batch that fits
        the device count, so odd batches degrade gracefully instead of
        failing to shard. Single chip = (1, 1) mesh, same code path."""
        devs = self._select_devices()
        bs = int(self.args.batch)
        n_data = max(d for d in range(1, min(len(devs), max(bs, 1)) + 1) if bs % d == 0)
        self.mesh = make_mesh(n_data=n_data, n_model=1, devices=devs[:n_data])
        self.batch_sharding = batch_sharding(self.mesh)
        self.replicated = NamedSharding(self.mesh, P())

    def _put_batch(self, batch):
        """Host batch -> device arrays sharded over the 'data' axis
        (the DistributedSampler + H2D copy analog, reference
        data/build.py:149-181). Per-batch scalars ('aug' hyps) replicate.
        Multi-host: local shards assemble into global arrays."""
        multihost = self._num_shards > 1
        out = {}
        for k, v in batch.items():
            arr = np.asarray(v)
            shd = self.replicated if k == "aug" else self.batch_sharding
            if multihost:
                out[k] = jax.make_array_from_process_local_data(shd, arr)
            else:
                out[k] = jax.device_put(arr, shd)
        return out

    # ------------------------------------------------------------------
    def _build_datasets(self):
        a = self.args
        # per-host loader sharding (the DistributedSampler analog); on a
        # single host this is (0, 1) and the loader sees the global batch
        self._shard_index, self._num_shards = local_shard_info()
        if self._num_shards > 1:
            if int(a.batch) % self._num_shards:
                raise ValueError(f"batch={a.batch} not divisible by {self._num_shards} hosts")
            self._local_batch = int(a.batch) // self._num_shards
        else:
            self._local_batch = int(a.batch)
        if self.model.task == "classify":
            from ..data.classify import ClassificationDataset, ClassificationLoader

            root = Path(self.data.get("path") or self.args.data)
            train_ds = ClassificationDataset(
                root / "train", imgsz=a.imgsz, erasing=float(getattr(a, "erasing", 0.0) or 0.0),
                auto_augment=getattr(a, "auto_augment", None) or None,
            )
            self.train_loader = ClassificationLoader(train_ds, self._local_batch, train=True, seed=a.seed, workers=a.workers)
            self.val_loader = None
            if a.val and (root / "val").exists():
                val_ds = ClassificationDataset(root / "val", imgsz=a.imgsz)
                self.val_loader = ClassificationLoader(val_ds, self._local_batch, train=False, workers=a.workers)
            self.model.names = train_ds.names
            return
        from ..data.build import HYP_KEYS, build_dataloader, build_yolo_dataset

        hyp = {k: getattr(a, k) for k in HYP_KEYS}
        task = self.model.task
        kpt_shape = dict(self.model.specs[-1].kwargs).get("kpt_shape") if task == "pose" else None
        train_ds = build_yolo_dataset(a, self.data["train"], self.data, mode="train", kpt_shape=kpt_shape)
        self.train_loader = build_dataloader(
            train_ds, self._local_batch, train=True, hyp=hyp, seed=a.seed, workers=a.workers, task=task,
            device_augment=bool(getattr(a, "device_augment", False)),
            shard_index=self._shard_index, num_shards=self._num_shards,
        )
        self.val_loader = None
        if a.val and self.data.get("val"):
            val_ds = build_yolo_dataset(a, self.data["val"], self.data, mode="val", kpt_shape=kpt_shape)
            # rect val: one median-aspect letterbox shape for the split
            # (XLA static-shape interpretation of reference rect batching)
            rect_shape = (
                val_ds.rect_shape(stride=int(max(self.model.strides)))
                if getattr(a, "rect", False) and task == "detect"
                else None
            )
            # task-specific val transforms so validators get seg_map / kpts /
            # xywhr targets (reference build_dataset per-task datasets)
            # val stays unsharded: like the reference, validation runs on
            # the main process over the FULL val split (trainer.py:432-446
            # rank-0 gating); other hosts receive fitness via broadcast
            self.val_loader = build_dataloader(
                val_ds, self._local_batch, train=False, seed=a.seed, workers=a.workers, task=task,
                rect_shape=rect_shape,
            )

    # ------------------------------------------------------------------
    def _make_train_step(self, nb: int):
        """Build the jitted train step; all schedule constants are closed
        over as python floats -> traced once."""
        a = self.args
        model = self.model
        epochs = int(a.epochs)
        opt_name, opt_lr0, opt_mom = resolve_optimizer(a, model.nc, nb)
        self.optimizer_name = opt_name
        # reference trainer.py:268: floor of 100 iters, but 0 disables warmup
        nw = max(round(a.warmup_epochs * nb), 100) if a.warmup_epochs > 0 else -1
        accumulate = max(1, round(a.nbs / a.batch))
        wd = a.weight_decay * a.batch * accumulate / a.nbs  # reference :806
        lr0, lrf = opt_lr0, a.lrf
        mom_f, mom_w = opt_mom, a.warmup_momentum
        bias_lr0 = a.warmup_bias_lr
        cos_lr = a.cos_lr
        nc, strides = model.nc, model.strides
        box_g, cls_g, dfl_g = a.box, a.cls, a.dfl

        def lf(epoch_f):
            if cos_lr:
                return ((1 - jnp.cos(epoch_f * math.pi / epochs)) / 2) * (lrf - 1) + 1
            return (1 - epoch_f / epochs) * (1.0 - lrf) + lrf

        def schedules(step):
            ni = step.astype(jnp.float32)
            # clamp: steps beyond the nominal horizon keep the final lr
            # instead of going negative under the linear schedule
            epoch_f = jnp.clip(jnp.floor(ni / nb), 0, epochs - 1)
            base = lr0 * lf(epoch_f)
            if nw <= 0:  # warmup disabled
                return base, base, jnp.float32(mom_f)
            frac = jnp.clip(ni / nw, 0.0, 1.0)
            lr_w = jnp.where(ni <= nw, frac * base, base)
            lr_b = jnp.where(ni <= nw, bias_lr0 + frac * (base - bias_lr0), base)
            mom = jnp.where(ni <= nw, mom_w + frac * (mom_f - mom_w), mom_f)
            return lr_w, lr_b, mom

        task = model.task
        device_aug = task == "detect" and bool(getattr(a, "device_augment", False))
        aug_base_key = jax.random.PRNGKey(int(getattr(a, "seed", 0)))
        multi_scale = bool(getattr(a, "multi_scale", False)) and task == "detect"
        # freeze: int n freezes layers 0..n-1; list freezes those indices
        # (reference trainer.py:243-263 freezes by 'model.{i}.' name prefix).
        # The DFL has no parameters here (functional decode), so the
        # reference's always-frozen .dfl needs no counterpart.
        fz = getattr(a, "freeze", None)
        if fz is None:
            frozen = frozenset()
        elif isinstance(fz, int):
            frozen = frozenset(f"model_{i}" for i in range(fz))
        else:
            frozen = frozenset(f"model_{int(i)}" for i in (fz if isinstance(fz, (list, tuple)) else [fz]))

        def train_step(state: TrainState, batch):
            if device_aug and "aug" in batch:
                from ..ops.augment_device import device_augment

                h = batch["aug"]
                hyp_t = {
                    "mosaic": h[0], "scale": h[1], "translate": h[2], "fliplr": h[3],
                    "hsv_h": h[4], "hsv_s": h[5], "hsv_v": h[6],
                }
                out = device_augment(
                    jax.random.fold_in(aug_base_key, state.step),
                    batch["img"], batch["bboxes"], batch["cls"], batch["mask"], hyp_t,
                )
                batch = dict(batch, img=out.img, bboxes=out.bboxes, cls=out.cls, mask=out.mask)
            x = batch["img"].astype(model.dtype) / 255.0
            if multi_scale:
                # reference multi_scale resizes the batch to a random size
                # (trainer.py preprocess_batch); varying spatial shapes
                # would recompile under jit, so the TPU-native equivalent
                # scales CONTENT within the fixed canvas (same receptive-
                # field variation, one compiled program)
                ms_key = jax.random.fold_in(aug_base_key, state.step + 1_000_003)
                k = jax.random.uniform(ms_key, (), minval=0.5, maxval=1.5)
                s_hw = x.shape[1]
                xs = jax.image.scale_and_translate(
                    x.astype(jnp.float32), x.shape, (1, 2),
                    jnp.stack([k, k]), jnp.full((2,), (1 - k) * s_hw / 2),
                    method="linear", antialias=False,
                ).astype(model.dtype)
                x = jnp.clip(xs, 0.0, 1.0)
                bb = batch["bboxes"]
                ctr = (bb[..., :2] - 0.5) * k + 0.5
                wh = bb[..., 2:4] * k
                lt = jnp.clip(ctr - wh / 2, 0.0, 1.0)
                rb = jnp.clip(ctr + wh / 2, 0.0, 1.0)
                ctr, wh = (lt + rb) / 2, rb - lt
                inside = ((ctr > 0.0) & (ctr < 1.0)).all(-1) & (wh > 1e-3).all(-1)
                new_mask = batch["mask"] * inside.astype(batch["mask"].dtype)
                batch = dict(
                    batch,
                    bboxes=jnp.concatenate([ctr, wh], -1) * new_mask[..., None],
                    mask=new_mask,
                )

            def loss_fn(params):
                if getattr(model, "is_rtdetr", False):
                    # RT-DETR: GT threads into the head for contrastive
                    # denoising; loss = Hungarian-matched DETR loss
                    # (reference RTDETRDetectionModel.loss, nn/tasks.py:618)
                    tgt = {
                        "cls": batch["cls"].astype(jnp.int32),
                        "bboxes": batch["bboxes"].astype(jnp.float32),
                        "mask": batch["mask"].astype(jnp.float32),
                    }
                    preds, mut = model.net.apply(
                        {"params": params, "batch_stats": state.batch_stats}, x, train=True,
                        targets=tgt, rngs={"dn": jax.random.fold_in(aug_base_key, state.step + 7_777_777)},
                        mutable=["batch_stats"],
                    )
                    from ..utils.detr_loss import rtdetr_loss
                    from ..utils.loss import LossMetrics

                    num_dn = preds["dec_bboxes"].shape[2] - preds["enc_bboxes"].shape[1]
                    total, (giou_l, cls_l, l1_l) = rtdetr_loss(
                        preds, batch["cls"], batch["bboxes"], batch["mask"], nc, num_dn=num_dn
                    )
                    # log slots follow the reference's loss_names =
                    # (giou_loss, cls_loss, l1_loss) (rtdetr/train.py:89)
                    return total, (LossMetrics(box=giou_l, cls=cls_l, dfl=l1_l), mut["batch_stats"])
                rng_kw = (
                    {"rngs": {"dropout": jax.random.fold_in(aug_base_key, state.step + 4_242_421)}}
                    if task == "classify" and float(getattr(a, "dropout", 0.0) or 0.0) > 0
                    else {}
                )
                feats, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats}, x, train=True,
                    mutable=["batch_stats"], **rng_kw,
                )
                if task == "classify":
                    logits = feats.astype(jnp.float32)
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    ce = -jnp.take_along_axis(logp, batch["label"][:, None].astype(jnp.int32), axis=-1).mean()
                    from ..utils.loss import LossMetrics

                    return ce, (LossMetrics(box=jnp.zeros(()), cls=ce, dfl=jnp.zeros(())), mut["batch_stats"])
                if task == "segment":
                    from ..utils.seg_loss import segmentation_loss

                    det_feats, mc, proto = feats
                    total, items, _seg = segmentation_loss(
                        det_feats, mc, proto,
                        batch["cls"], batch["bboxes"], batch["mask"], batch["seg_map"],
                        nc=nc, strides=strides, box_gain=box_g, cls_gain=cls_g, dfl_gain=dfl_g,
                    )
                    return total, (items, mut["batch_stats"])
                if task == "pose":
                    from ..utils.pose_loss import pose_loss

                    det_feats, kpt_raw = feats
                    kpt_shape = tuple(dict(model.specs[-1].kwargs).get("kpt_shape", (17, 3)))
                    total, items, _ = pose_loss(
                        det_feats, kpt_raw,
                        batch["cls"], batch["bboxes"], batch["mask"], batch["kpts"],
                        nc=nc, kpt_shape=kpt_shape, strides=strides,
                        box_gain=box_g, cls_gain=cls_g, dfl_gain=dfl_g,
                        pose_gain=float(a.pose), kobj_gain=float(a.kobj),
                    )
                    return total, (items, mut["batch_stats"])
                if task == "obb":
                    from ..utils.obb_loss import obb_loss

                    det_feats, angle = feats
                    total, items = obb_loss(
                        det_feats, angle,
                        batch["cls"], batch["bboxes"], batch["mask"],
                        nc=nc, strides=strides, box_gain=box_g, cls_gain=cls_g, dfl_gain=dfl_g,
                    )
                    return total, (items, mut["batch_stats"])
                if isinstance(feats, dict):  # end2end (v10): one2many + one2one
                    # reference E2EDetectLoss: topk-10 one2many + topk-1 one2one
                    t1, items = detection_loss(
                        feats["one2many"], batch["cls"], batch["bboxes"], batch["mask"], nc=nc,
                        strides=strides, box_gain=box_g, cls_gain=cls_g, dfl_gain=dfl_g, tal_topk=10,
                    )
                    t2, _ = detection_loss(
                        feats["one2one"], batch["cls"], batch["bboxes"], batch["mask"], nc=nc,
                        strides=strides, box_gain=box_g, cls_gain=cls_g, dfl_gain=dfl_g, tal_topk=1,
                    )
                    return t1 + t2, (items, mut["batch_stats"])
                total, items = detection_loss(
                    feats, batch["cls"], batch["bboxes"], batch["mask"], nc=nc, strides=strides,
                    box_gain=box_g, cls_gain=cls_g, dfl_gain=dfl_g,
                )
                return total, (items, mut["batch_stats"])

            (loss, (items, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            grad_acc = jax.tree.map(jnp.add, state.grad_acc, grads)

            def apply_update(operand):
                grad_acc, params, mom_buf, var_buf, ema_params, ema_stats, ema_updates = operand
                # clip accumulated grads by global norm 10 (reference :617)
                gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grad_acc)))
                clip = jnp.minimum(1.0, 10.0 / (gnorm + 1e-12))
                lr_w, lr_b, mom = schedules(state.step)
                # optimizer-update index (for Adam bias correction): fires
                # exactly when (step+1) % accumulate == 0
                t_opt = ((state.step + 1) // accumulate).astype(jnp.float32)

                def upd(path, p, g, b, v):
                    top = path[0].key if hasattr(path[0], "key") else str(path[0])
                    if top in frozen:
                        return p, b, v  # frozen layer: no update
                    grp = param_group_of(path)
                    g = g.astype(jnp.float32) * clip
                    lr = lr_b if grp == "bias" else lr_w
                    return optimizer_update(opt_name, grp, p, g, b, v, lr, mom, mom_f, wd, t_opt)

                vb = var_buf if var_buf is not None else mom_buf  # placeholder tree for SGD
                flat = jax.tree_util.tree_map_with_path(
                    lambda path, p, g, b, v: upd(path, p, g, b, v), params, grad_acc, mom_buf, vb
                )
                new_params = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
                new_mom = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
                new_var = (
                    jax.tree.map(lambda t: t[2], flat, is_leaf=lambda t: isinstance(t, tuple))
                    if var_buf is not None
                    else None
                )

                # EMA (reference torch_utils.py:620-685)
                upd_i = ema_updates + 1
                d = 0.9999 * (1 - jnp.exp(-upd_i.astype(jnp.float32) / 2000.0))
                ema_p = jax.tree.map(lambda e, q: d * e + (1 - d) * q.astype(e.dtype), ema_params, new_params)
                ema_s = jax.tree.map(lambda e, q: d * e + (1 - d) * q.astype(e.dtype), ema_stats, new_bs)
                return new_params, new_mom, new_var, tree_zeros_like(grad_acc), ema_p, ema_s, upd_i

            def no_update(operand):
                grad_acc, params, mom_buf, var_buf, ema_params, ema_stats, ema_updates = operand
                # BN stats still advanced; EMA of stats follows on opt steps only
                return params, mom_buf, var_buf, grad_acc, ema_params, ema_stats, ema_updates

            operand = (
                grad_acc, state.params, state.mom_buf, state.var_buf,
                state.ema_params, state.ema_stats, state.ema_updates,
            )
            if accumulate == 1:
                new_params, new_mom, new_var, new_acc, ema_p, ema_s, ema_u = apply_update(operand)
            else:
                do = (state.step + 1) % accumulate == 0
                new_params, new_mom, new_var, new_acc, ema_p, ema_s, ema_u = jax.lax.cond(
                    do, apply_update, no_update, operand
                )

            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                mom_buf=new_mom,
                var_buf=new_var,
                grad_acc=new_acc,
                ema_params=ema_p,
                ema_stats=ema_s,
                ema_updates=ema_u,
            )
            metrics = jnp.stack([items.box, items.cls, items.dfl])
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,)), accumulate

    # ------------------------------------------------------------------
    def setup(self, rng: Optional[jax.Array] = None):
        run_callbacks(self.callbacks, "on_pretrain_routine_start", self)
        # Multi-host bring-up (reference trainer.py:176-232 + utils/dist.py:
        # 28-98 spawn torch.distributed.run; the TPU pattern is one identical
        # process per host that rendezvouses here). Triggered by the env
        # (COORDINATOR_ADDRESS triple or TPU pod metadata) or an explicit
        # device='pod'; must run before _build_datasets, which shards the
        # loader by (process_index, process_count).
        from ..parallel.distributed import init_distributed, multihost_env_detected

        if str(getattr(self.args, "device", "") or "") == "pod" or multihost_env_detected():
            if init_distributed():
                from ..utils import LOGGER

                LOGGER.info(
                    f"multi-host: process {jax.process_index()}/{jax.process_count()}, "
                    f"{jax.local_device_count()} local / {jax.device_count()} global devices"
                )
        if int(self.args.batch) == -1:  # autobatch (reference utils/autobatch.py)
            from ..utils.model_utils import autobatch

            self.args.batch = autobatch(self.model, imgsz=int(self.args.imgsz))
        self._build_datasets()
        if getattr(self.args, "plots", False) and is_main_process() and hasattr(self.train_loader, "ds"):
            # labels.jpg dataset statistics (reference trainer plot_training_labels
            # -> plotting.py plot_labels)
            try:
                from ..utils.plotting import plot_labels

                labs = self.train_loader.ds.labels
                cls_all = np.concatenate([lab["cls"].reshape(-1) for lab in labs]) if labs else np.zeros(0)
                box_all = (
                    np.concatenate([lab["xywhn"].reshape(-1, 4) for lab in labs])
                    if labs
                    else np.zeros((0, 4))
                )
                plot_labels(cls_all, box_all, names=self.model.names, save_dir=str(self.save_dir))
            except Exception:
                pass
        if self.model.task == "classify" and float(getattr(self.args, "dropout", 0.0) or 0.0) > 0:
            # rebuild the head spec with the train-time dropout rate
            # (reference ClassificationModel dropout arg, classify/train.py)
            import dataclasses

            from ..nn.tasks import GraphNet

            sp = self.model.specs[-1]
            kw = dict(sp.kwargs)
            kw["dropout"] = float(self.args.dropout)
            self.model.specs = tuple(self.model.specs[:-1]) + (
                dataclasses.replace(sp, kwargs=tuple(kw.items())),
            )
            self.model.net = GraphNet(
                specs=self.model.specs, save=self.model.save, dtype=self.model.dtype,
                remat=bool(getattr(self.args, "remat", False)),
            )
        rng = rng if rng is not None else jax.random.PRNGKey(self.args.seed)
        variables = self.model.init(rng, imgsz=self.args.imgsz)
        variables = self._warm_start(variables)
        # _make_train_step resolves the optimizer (auto -> SGD/AdamW), which
        # decides whether the state needs 2nd-moment buffers
        self.train_step, self.accumulate = self._make_train_step(len(self.train_loader))
        self.state = make_train_state(variables, self.optimizer_name)
        # place the TrainState on the mesh: replicated params/opt state, DP
        # batches — jit then compiles the sharded step from the committed
        # input shardings (XLA inserts the ICI gradient all-reduce)
        self._make_mesh()
        self.state = jax.device_put(self.state, self.replicated)
        if getattr(self.args, "profile", False) and is_main_process():
            # profile=True (reference default.yaml:37 profiles ONNX/TRT for
            # the loggers): the on-chip analog is the per-layer latency +
            # GFLOPs table, logged once at setup
            from ..utils.model_utils import profile_layers

            profile_layers(self.model, variables, imgsz=int(self.args.imgsz))
        run_callbacks(self.callbacks, "on_pretrain_routine_end", self)

    def _warm_start(self, variables):
        """Transfer-learning initialization (reference Model._load +
        attempt_load_one_weight, engine/model.py:265, nn/tasks.py:1303):
        overlay checkpoint weights onto the fresh init, keeping the fresh
        init for any leaf whose shape differs (e.g. Detect class convs
        after an nc change — the reference's head-reinit behavior).
        Sources, in priority order: explicit `pretrained=<path>` arg, then
        weights handed over by the YOLO facade (YOLO('best.ckpt').train())."""
        src = None
        pre = getattr(self.args, "pretrained", None)
        if isinstance(pre, str) and pre not in ("true", "false", "True", "False"):
            payload = serialization.msgpack_restore(Path(pre).read_bytes())
            src = {"params": payload["ema_params"], "batch_stats": payload.get("ema_stats") or {}}
        elif getattr(self, "pretrained_variables", None) is not None and pre not in (False, "false", "False"):
            src = self.pretrained_variables
        if src is None:
            return variables
        stats = {"matched": 0, "skipped": 0}

        def overlay(dst_tree, src_tree):
            # walk dst; take src leaf when present and shape-compatible
            if not isinstance(dst_tree, dict):
                return dst_tree
            out = {}
            for k, v in dst_tree.items():
                s = src_tree.get(k) if isinstance(src_tree, dict) else None
                if isinstance(v, dict):
                    out[k] = overlay(v, s if isinstance(s, dict) else {})
                elif s is not None and not isinstance(s, dict) and tuple(np.shape(s)) == tuple(np.shape(v)):
                    out[k] = jnp.asarray(s, dtype=v.dtype)
                    stats["matched"] += 1
                else:
                    out[k] = v
                    stats["skipped"] += 1
            return out

        import flax

        as_dict = lambda t: flax.core.unfreeze(t) if hasattr(t, "unfreeze") else dict(t)  # noqa: E731
        new_vars = {
            "params": overlay(as_dict(variables["params"]), as_dict(src["params"])),
            "batch_stats": overlay(as_dict(variables["batch_stats"]), as_dict(src.get("batch_stats") or {})),
        }
        from ..utils import LOGGER

        LOGGER.info(
            f"Transferred {stats['matched']}/{stats['matched'] + stats['skipped']} weight leaves from pretrained checkpoint"
        )
        self.transfer_stats = dict(stats)
        return new_vars

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, float]:
        if not hasattr(self, "state"):
            self.setup()
        a = self.args
        start_epoch = 0
        if a.resume:
            resume_path = a.resume if isinstance(a.resume, str) else self.wdir / "last.ckpt"
            if not Path(resume_path).exists():
                # resume=True without a run in place: most recent run under
                # the project dir (reference get_latest_run, utils/files.py)
                from ..utils.model_utils import get_latest_run

                resume_path = get_latest_run(str(a.project or "runs")) or resume_path
            if Path(resume_path).exists():
                self.load_checkpoint(Path(resume_path))
                start_epoch = self._epoch + 1
        from ..utils import LOGGER, TQDM, colorstr
        from ..utils.integrations import add_integration_callbacks

        add_integration_callbacks(self)
        run_callbacks(self.callbacks, "on_train_start", self)
        main = is_main_process()
        nb = len(self.train_loader)
        if main:
            LOGGER.info(
                f"{colorstr('bold', self.model_cfg if isinstance(self.model_cfg, str) else 'model')}: "
                f"{self.model.nc} classes, imgsz={a.imgsz}, optimizer={self.optimizer_name}, "
                f"batch={a.batch} over {self.mesh.devices.size} device(s)"
            )
            LOGGER.info(f"Starting training for {int(a.epochs)} epochs...")
        loss_hdr = ("giou_loss", "cls_loss", "l1_loss") if getattr(self.model, "is_rtdetr", False) else ("box_loss", "cls_loss", "dfl_loss")
        final_metrics: Dict[str, float] = {}
        patience_left = a.patience
        mosaic_closed = False
        train_time_start = time.time()
        time_budget_s = float(a.time) * 3600 if getattr(a, "time", None) else None
        for epoch in range(start_epoch, int(a.epochs)):
            self._epoch = epoch
            run_callbacks(self.callbacks, "on_train_epoch_start", self)
            self.train_loader.set_epoch(epoch)
            # >= (not ==) so a resume past the close point still closes
            # mosaic (reference resume_training + _close_dataloader_mosaic)
            if a.close_mosaic and not mosaic_closed and epoch >= int(a.epochs) - a.close_mosaic:
                self.train_loader.close_mosaic()
                if main:
                    LOGGER.info("Closing dataloader mosaic")
                mosaic_closed = True
            t0 = time.time()
            losses = []
            if main:
                # reference per-epoch header (trainer.py progress_string)
                LOGGER.info(
                    ("%11s" * 5) % ("Epoch", loss_hdr[0], loss_hdr[1], loss_hdr[2], "Size")
                )
            pbar = TQDM(total=nb, desc=f"{epoch + 1}/{int(a.epochs)}")
            for bi, batch in enumerate(self.train_loader):
                self.state, m = self.train_step(self.state, self._put_batch(batch))
                losses.append(m)
                if a.plots and epoch == 0 and bi < 3 and main and "bboxes" in batch:
                    self._plot_train_batch(batch, bi)
                pbar.update(1)
                run_callbacks(self.callbacks, "on_train_batch_end", self)
            pbar.close()
            mean_loss = np.mean(np.stack([np.asarray(x) for x in losses]), axis=0)
            dt = time.time() - t0
            if main:
                imgs_s = nb * int(a.batch) / max(dt, 1e-9)
                eta = dt * (int(a.epochs) - epoch - 1)
                LOGGER.info(
                    ("%11s" + "%11.4g" * 3 + "%11s   %.1f img/s, ETA %ds")
                    % (f"{epoch + 1}/{int(a.epochs)}", mean_loss[0], mean_loss[1], mean_loss[2], a.imgsz, imgs_s, eta)
                )
            row = {
                "epoch": epoch,
                "train/box_loss": float(mean_loss[0]),
                "train/cls_loss": float(mean_loss[1]),
                "train/dfl_loss": float(mean_loss[2]),
                "time_s": round(dt, 2),
            }
            if self.val_loader is not None:
                # validation runs on every host (identical result; val data
                # replicated) — cheaper than broadcasting metric dicts, and
                # process-0 alone writes artifacts
                val_metrics = self.validate()
                row.update({f"metrics/{k}": v for k, v in val_metrics.items()})
                fitness = val_metrics.get("fitness", 0.0)
                if main:
                    LOGGER.info("  ".join(f"{k} {v:.4g}" for k, v in val_metrics.items()))
                if fitness > self.best_fitness:
                    self.best_fitness = fitness
                    if main:
                        self.save_checkpoint(self.wdir / "best.ckpt")
                    patience_left = a.patience
                else:
                    patience_left -= 1
                final_metrics = val_metrics
            if main:
                self.save_checkpoint(self.wdir / "last.ckpt")
                if a.save_period and a.save_period > 0 and (epoch + 1) % int(a.save_period) == 0:
                    self.save_checkpoint(self.wdir / f"epoch{epoch}.ckpt")
            run_callbacks(self.callbacks, "on_model_save", self)
            self.metrics_rows.append(row)
            if main:
                self._write_csv()
            run_callbacks(self.callbacks, "on_fit_epoch_end", self)
            stop = patience_left <= 0
            if time_budget_s is not None:
                # time-budgeted training (reference trainer.py args.time):
                # stop once the budget is spent, or when the mean epoch time
                # says the next epoch would overshoot it
                elapsed = time.time() - train_time_start
                mean_epoch = elapsed / (epoch - start_epoch + 1)
                if elapsed + mean_epoch > time_budget_s:
                    if main:
                        LOGGER.info(
                            f"Time budget {a.time}h: stopping after epoch {epoch + 1} "
                            f"({elapsed / 3600:.2f}h elapsed)"
                        )
                    stop = True
            if self._num_shards > 1:
                # all hosts must agree on early stop (reference broadcasts
                # the stop flag, trainer.py:464-467)
                stop = broadcast_scalar(float(stop)) > 0.5
            if stop:
                if main:
                    LOGGER.info(f"EarlyStopping: patience {a.patience} exhausted at epoch {epoch + 1}")
                break
        if a.plots and main:
            try:
                from ..utils.plotting import plot_results

                plot_results(str(self.save_dir / "results.csv"))
            except Exception:
                pass
        run_callbacks(self.callbacks, "on_train_end", self)
        return final_metrics

    def _plot_train_batch(self, batch, bi: int):
        """train_batch{i}.jpg grids (reference trainer.plot_training_samples
        -> plotting.py:638 plot_images)."""
        try:
            from ..utils.plotting import plot_images

            plot_images(
                np.asarray(batch["img"]).astype(np.uint8),
                np.asarray(batch["cls"]),
                np.asarray(batch["bboxes"]),
                np.asarray(batch["mask"]),
                fname=str(self.save_dir / f"train_batch{bi}.jpg"),
                names=self.model.names,
            )
        except Exception:
            pass

    # ------------------------------------------------------------------
    def validate(self) -> Dict[str, float]:
        from .validator import TASK_VALIDATORS, DetectionValidator

        run_callbacks(self.callbacks, "on_val_start", self)
        ema_vars = {"params": self.state.ema_params, "batch_stats": self.state.ema_stats}
        if not hasattr(self, "_validator"):  # cache: keeps the jitted forward across epochs
            cls_v = TASK_VALIDATORS.get(self.model.task, DetectionValidator)
            self._validator = cls_v(self.model, self.val_loader, self.args)
            self._validator.callbacks = self.callbacks  # fire on_val_batch_* on the bus
            self._validator.owner = self
        out = self._validator(ema_vars)
        run_callbacks(self.callbacks, "on_val_end", self)
        return out

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: Path):
        """Serialize the full TrainState (incl. optimizer momentum for
        resume) — the deployed weights ARE the EMA, like the reference
        (trainer.py:531-564; optimizer state kept for resume :753)."""
        payload = {
            "step": np.asarray(self.state.step),
            "params": jax.tree.map(np.asarray, self.state.params),
            "batch_stats": jax.tree.map(np.asarray, self.state.batch_stats),
            "mom_buf": jax.tree.map(np.asarray, self.state.mom_buf),
            "var_buf": jax.tree.map(np.asarray, self.state.var_buf) if self.state.var_buf is not None else {},
            "ema_params": jax.tree.map(np.asarray, self.state.ema_params),
            "ema_stats": jax.tree.map(np.asarray, self.state.ema_stats),
            "ema_updates": np.asarray(self.state.ema_updates),
            "epoch": np.asarray(self._epoch),
            "best_fitness": np.asarray(self.best_fitness),
            "model_yaml": self.model.yaml,
            "nc": self.model.nc,
            "names": {str(k): str(v) for k, v in self.model.names.items()},  # msgpack: str keys
            "args": {k: v for k, v in vars(self.args).items() if isinstance(v, (int, float, str, bool))},
        }
        path.write_bytes(serialization.msgpack_serialize(jax.tree.map(lambda x: x, payload)))

    def load_checkpoint(self, path: Path):
        """Restore TrainState from a checkpoint written by save_checkpoint
        (reference resume_training trainer.py:753-786)."""
        payload = serialization.msgpack_restore(Path(path).read_bytes())
        as_jnp = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
        self.state = self.state.replace(
            step=jnp.asarray(payload["step"]),
            params=as_jnp(payload["params"]),
            batch_stats=as_jnp(payload["batch_stats"]),
            mom_buf=as_jnp(payload.get("mom_buf") or jax.tree.map(lambda p: np.zeros_like(p), payload["params"])),
            var_buf=as_jnp(payload["var_buf"]) if payload.get("var_buf") else self.state.var_buf,
            grad_acc=jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), as_jnp(payload["params"])),
            ema_params=as_jnp(payload["ema_params"]),
            ema_stats=as_jnp(payload["ema_stats"]),
            ema_updates=jnp.asarray(payload["ema_updates"]),
        )
        self._epoch = int(payload.get("epoch", 0))
        self.best_fitness = float(payload.get("best_fitness", -1.0))

    def _write_csv(self):
        if not self.metrics_rows:
            return
        keys = sorted({k for r in self.metrics_rows for k in r})
        with open(self.save_dir / "results.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=keys)
            w.writeheader()
            w.writerows(self.metrics_rows)


# reference entry name (engine/trainer.py:59 BaseTrainer); task dispatch
# happens inside the jitted step rather than via subclasses
BaseTrainer = DetectionTrainer
