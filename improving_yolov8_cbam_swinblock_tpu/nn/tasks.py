"""YAML graph compiler and task models.

Replaces the reference's `parse_model` interpreter + nn.Sequential walk
(/root/reference/ultralytics/nn/tasks.py:1340-1517, :113-179) with a
compile step that emits a single pure flax module. Key departures from
the torch design, all TPU-motivated:

  * channel bookkeeping identical to the reference (width/depth gains,
    make_divisible, pass-through channels for CBAM/SwinBlock via the
    fallback branch, tasks.py:1503), but *strides are derived
    analytically* from the graph instead of the reference's dummy
    256px probe forward (tasks.py:353-363) — construction costs nothing;
  * the whole network is one jittable `apply(variables, x, train)`;
    the savelist routing happens at trace time, so XLA sees a flat
    dataflow graph and fuses across layer boundaries;
  * `scale` resolution (`yolov8s.yaml` -> yolov8.yaml + scale 's')
    mirrors tasks.py:1520-1557.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import linen as nn
from flax.core import FrozenDict

from . import heads as H
from . import modules as M
from . import modules_extra as ME
from . import modules_tv as MT
from . import modules_world as MW
from . import modules_yoloe as MY
from . import transformer as T

CFG_DIR = Path(__file__).resolve().parent.parent / "cfg"

# YAML module name -> flax module class.
MODULE_TABLE: Dict[str, Any] = {
    "Conv": M.Conv,
    "DWConv": M.DWConv,
    "Bottleneck": M.Bottleneck,
    "C2f": M.C2f,
    "C3": M.C3,
    "C3k": M.C3k,
    "C3k2": M.C3k2,
    "SPPF": M.SPPF,
    "SPP": M.SPP,
    "PSA": M.PSA,
    "C2PSA": M.C2PSA,
    "C2fPSA": M.C2fPSA,
    "CBAM": M.CBAM,
    "SwinBlock": M.SwinBlock,
    "Concat": M.Concat,
    "nn.Upsample": M.Upsample,
    "Upsample": M.Upsample,
    "Detect": M.Detect,
    # extended block library (modules_extra)
    "Conv2": ME.Conv2,
    "LightConv": ME.LightConv,
    "ConvTranspose": ME.ConvTranspose,
    "Focus": ME.Focus,
    "GhostConv": ME.GhostConv,
    "GhostBottleneck": ME.GhostBottleneck,
    "RepConv": ME.RepConv,
    "C1": ME.C1,
    "C2": ME.C2,
    "C3x": ME.C3x,
    "C3Ghost": ME.C3Ghost,
    "BottleneckCSP": ME.BottleneckCSP,
    "RepC3": ME.RepC3,
    "ELAN1": ME.ELAN1,
    "RepNCSPELAN4": ME.RepNCSPELAN4,
    "ADown": ME.ADown,
    "AConv": ME.AConv,
    "SPPELAN": ME.SPPELAN,
    "SCDown": ME.SCDown,
    "C2fCIB": ME.C2fCIB,
    "Index": ME.Index,
    "nn.ConvTranspose2d": ME.ConvTranspose,  # plain (no BN/act) variant
    "DWConvTranspose2d": ME.DWConvTranspose2d,
    "AGLU": ME.AGLU,
    "HGStem": ME.HGStem,
    "HGBlock": ME.HGBlock,
    "ResNetLayer": ME.ResNetLayer,
    "CBLinear": ME.CBLinear,
    "CBFuse": ME.CBFuse,
    "TransformerBlock": ME.TransformerBlock,
    "nn.MaxPool2d": ME.MaxPool2d,
    "nn.ZeroPad2d": ME.ZeroPad2d,
    "nn.Identity": ME.Identity,
    "C3TR": ME.C3TR,
    "A2C2f": ME.A2C2f,
    "TorchVision": MT.TorchVision,
    # RT-DETR transformer parts
    "AIFI": T.AIFI,
    "RTDETRDecoder": T.RTDETRDecoder,
    # YOLO-World vision-language parts
    "C2fAttn": MW.C2fAttn,
    "ImagePoolingAttn": MW.ImagePoolingAttn,
    "WorldDetect": MW.WorldDetect,
    # YOLOE prompt-driven heads
    "YOLOEDetect": MY.YOLOEDetect,
    "YOLOESegment": MY.YOLOESegment,
    # heads
    "Classify": H.Classify,
    "Segment": H.Segment,
    "Pose": H.Pose,
    "OBB": H.OBB,
    "v10Detect": H.v10Detect,
}

BASE_MODULES = {
    "Conv", "DWConv", "Bottleneck", "C2f", "C3", "C3k", "C3k2", "SPPF", "SPP",
    "PSA", "C2PSA", "C2fPSA", "Conv2", "LightConv", "ConvTranspose", "Focus", "GhostConv",
    "GhostBottleneck", "RepConv", "C1", "C2", "C3x", "C3Ghost", "BottleneckCSP",
    "RepC3", "ELAN1", "RepNCSPELAN4", "ADown", "AConv", "SPPELAN", "SCDown",
    "C2fCIB", "Classify", "C3TR", "A2C2f",
}
REPEAT_MODULES = {"C2f", "C3", "C3k2", "C2PSA", "C2fPSA", "C1", "C2", "C3x", "C3Ghost", "BottleneckCSP", "RepC3", "C2fCIB", "C3TR", "A2C2f"}
HEAD_MODULES = {"Detect", "Segment", "Pose", "OBB", "v10Detect"}
# heads + trivial glue stay un-rematted (outputs needed / nothing to save)
_NO_REMAT = HEAD_MODULES | {"Classify", "Concat", "Upsample", "Index"}


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round up to nearest multiple (reference utils/checks.py semantics)."""
    return int(math.ceil(x / divisor) * divisor)


@dataclass(frozen=True)
class LayerSpec:
    """One compiled graph row: module class + static kwargs + routing."""

    i: int
    f: Any  # int or tuple of ints
    n: int
    name: str  # module type name
    kwargs: Tuple[Tuple[str, Any], ...]
    c2: int

    def build(self, dtype, rep: Optional[int] = None, remat: bool = False) -> nn.Module:
        cls = MODULE_TABLE[self.name]
        if remat:
            # gradient rematerialization: recompute this layer's activations
            # in the backward pass instead of keeping them in HBM — the TPU
            # equivalent of torch checkpointing, traded to unlock larger
            # train batches (static_argnums=(2,): the `train` flag;
            # 0 is self, 1 is x)
            cls = nn.remat(cls, static_argnums=(2,))
        kw = dict(self.kwargs)
        if "dtype" not in kw:
            kw["dtype"] = dtype
        name = f"model_{self.i}" if rep is None else f"model_{self.i}_{rep}"
        return cls(name=name, **kw)


def yaml_model_load(path) -> dict:
    """Load a model YAML; `yolov8s.yaml` resolves to yolov8.yaml + scale 's'
    (reference tasks.py:1520-1557)."""
    path = Path(path)
    models_root = CFG_DIR / "models"
    search_dirs = [path.parent] + sorted(d for d in models_root.iterdir() if d.is_dir())
    # candidate (filename, scale) pairs: exact name first, then scale-stripped
    names = [(path.name, "")]
    # scale char follows the version digits: yolov8s-cbam-swin -> yolov8-cbam-swin + 's'
    # (reference tasks.py:1536 re.sub(r"(\d+)([nslmx])(.+)?$", ...))
    m = re.search(r"(\d+)([nslmx])", path.stem)
    if m:
        names.append((re.sub(r"(\d+)([nslmx])", r"\1", path.stem, count=1) + ".yaml", m.group(2)))
    # dash-scale stems without version digits (FastSAM-s -> FastSAM + 's')
    m2 = re.search(r"-([nslmx])$", path.stem)
    if m2:
        names.append((path.stem[:-2] + ".yaml", m2.group(1)))
    found, scale = None, ""
    if path.exists():
        found = path
    else:
        for name, sc in names:
            for d in search_dirs:
                if (d / name).exists():
                    found, scale = d / name, sc
                    break
            if found:
                break
    if found is None:
        raise FileNotFoundError(f"model yaml not found: {path}")
    d = yaml.safe_load(found.read_text())
    if scale:
        d["scale"] = scale
    d["yaml_file"] = str(found)
    return d


def parse_model(d: dict, ch: int = 3, verbose: bool = False):
    """Compile a model dict into LayerSpecs + savelist + metadata.

    Channel plumbing matches reference tasks.py:1340-1517 row for row;
    additionally tracks the cumulative spatial downsample factor per
    layer so Detect strides come out analytically.
    """
    nc = d.get("nc", 80)
    scales = d.get("scales")
    # legacy v3/v5-style multipliers (reference tasks.py depth/width keys)
    depth = float(d.get("depth_multiple", 1.0))
    width = float(d.get("width_multiple", 1.0))
    max_channels = float(d.get("max_channels", float("inf")))
    scale = d.get("scale") or ""
    if scales:
        if not scale:
            scale = tuple(scales.keys())[0]
        depth, width, max_channels = scales[scale]

    # optional global activation override (reference tasks.py:1366,
    # e.g. yolov6's `activation: torch.nn.ReLU()`)
    act_override = None
    act_str = str(d.get("activation") or "")
    if "ReLU" in act_str and "SiLU" not in act_str:
        act_override = "relu"

    legacy = True
    chs = [ch]
    factors = [1]  # spatial downsample factor per produced layer output
    specs = []
    save = set()

    rows = list(d["backbone"]) + list(d["head"])
    for i, (f, n, mname, args) in enumerate(rows):
        # resolve string args: 'nc' -> class count, 'None'/'True'... -> literal
        # (reference tasks.py:1437-1440 locals()/literal_eval resolution)
        resolved = []
        for a in args:
            if a == "nc":
                a = nc
            elif isinstance(a, str) and a in d:
                a = d[a]  # e.g. kpt_shape (reference tasks.py:1437 locals())
            elif isinstance(a, str) and a not in ("nearest", "bilinear"):
                try:
                    import ast

                    a = ast.literal_eval(a)
                except (ValueError, SyntaxError):
                    pass
            resolved.append(a)
        args = resolved
        n_orig = n
        n = max(round(n * depth), 1) if n > 1 else n

        # chs[0] is the network input; layer j's output channels live at
        # chs[j + 1]. (The reference instead resets its ch list at i==0;
        # same effect, explicit offset here.)
        def in_ch(idx):
            return chs[idx + 1] if idx != -1 else chs[-1]

        def in_factor(idx):
            return factors[idx + 1] if idx != -1 else factors[-1]

        kwargs: Dict[str, Any] = {}
        fac = in_factor(f if isinstance(f, int) else f[0])

        if mname in BASE_MODULES:
            c1 = in_ch(f)
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            if mname in ("Conv", "DWConv"):
                kwargs = {"c2": c2}
                if len(args) > 1:
                    kwargs["k"] = args[1]
                if len(args) > 2:
                    kwargs["s"] = args[2]
                    fac *= args[2]
                if mname == "Conv":
                    # long-form rows [c2, k, s, p, g, d, act] (rt-detr yamls)
                    if len(args) > 3 and args[3] is not None:
                        kwargs["p"] = args[3]
                    if len(args) > 4:
                        kwargs["g"] = args[4]
                    if len(args) > 5:
                        kwargs["d"] = args[5]
                    if len(args) > 6:
                        kwargs["act"] = args[6]
                else:  # DWConv rows are [c2, k, s, d, act] (reference conv.py:240)
                    if len(args) > 3 and args[3] is not None:
                        kwargs["d"] = args[3]
                    if len(args) > 4:
                        kwargs["act"] = args[4]
                if act_override and "act" not in kwargs:
                    kwargs["act"] = act_override
            elif mname == "C2f":
                kwargs = {"c2": c2, "n": n, "shortcut": args[1] if len(args) > 1 else False}
                n = 1
            elif mname in ("C3",):
                kwargs = {"c2": c2, "n": n, "shortcut": args[1] if len(args) > 1 else True}
                n = 1
            elif mname == "C3k2":
                legacy = False
                c3k = args[1] if len(args) > 1 else False
                e = args[2] if len(args) > 2 else 0.5
                sc = args[3] if len(args) > 3 else True
                if scale in "mlx":
                    c3k = True
                kwargs = {"c2": c2, "n": n, "c3k": c3k, "e": e, "shortcut": sc}
                n = 1
            elif mname == "SPPF":
                kwargs = {"c2": c2, "k": args[1] if len(args) > 1 else 5}
            elif mname == "SPP":
                kwargs = {"c2": c2, "k": tuple(args[1]) if len(args) > 1 else (5, 9, 13)}
            elif mname == "PSA":
                kwargs = {"c2": c2}
            elif mname in ("C2PSA", "C2fPSA"):
                kwargs = {"c2": c2, "n": n}
                n = 1
            elif mname == "Bottleneck":
                kwargs = {"c2": c2, "shortcut": args[1] if len(args) > 1 else True}
            elif mname in ("C1",):
                kwargs = {"c2": c2, "n": n}
                n = 1
            elif mname in ("C2", "C3x", "C3Ghost", "BottleneckCSP"):
                kwargs = {"c2": c2, "n": n}
                if len(args) > 1:
                    kwargs["shortcut"] = args[1]
                n = 1
            elif mname == "RepC3":
                kwargs = {"c2": c2, "n": n}
                n = 1
            elif mname == "C2fCIB":
                kwargs = {"c2": c2, "n": n}
                if len(args) > 1:
                    kwargs["shortcut"] = args[1]
                if len(args) > 2:
                    kwargs["lk"] = args[2]
                n = 1
            elif mname in ("Conv2", "RepConv"):
                kwargs = {"c2": c2}
                if len(args) > 1:
                    kwargs["k"] = args[1]
                if len(args) > 2:
                    kwargs["s"] = args[2]
                    fac *= args[2]
            elif mname == "LightConv":
                kwargs = {"c2": c2, "k": args[1] if len(args) > 1 else 1}
            elif mname == "ConvTranspose":
                kwargs = {"c2": c2}
                if len(args) > 1:
                    kwargs["k"] = args[1]
                if len(args) > 2:
                    kwargs["s"] = args[2]
                    fac //= args[2]
            elif mname == "Focus":
                kwargs = {"c2": c2, "k": args[1] if len(args) > 1 else 1}
                fac *= 2
            elif mname in ("GhostConv",):
                kwargs = {"c2": c2}
                if len(args) > 1:
                    kwargs["k"] = args[1]
                if len(args) > 2:
                    kwargs["s"] = args[2]
                    fac *= args[2]
            elif mname == "GhostBottleneck":
                kwargs = {"c2": c2}
                if len(args) > 1:
                    kwargs["k"] = args[1]
                if len(args) > 2:
                    kwargs["s"] = args[2]
                    fac *= args[2]
            elif mname in ("ADown", "AConv"):
                kwargs = {"c2": c2}
                fac *= 2
            elif mname == "SCDown":
                kwargs = {"c2": c2, "k": args[1] if len(args) > 1 else 3, "s": args[2] if len(args) > 2 else 2}
                fac *= kwargs["s"]
            elif mname == "ELAN1":
                kwargs = {"c2": c2, "c3_": args[1], "c4": args[2]}
            elif mname == "RepNCSPELAN4":
                # n comes from args[3], not the row repeat (reference keeps
                # RepNCSPELAN4 out of repeat_modules)
                kwargs = {"c2": c2, "c3_": args[1], "c4": args[2], "n": args[3] if len(args) > 3 else 1}
            elif mname == "SPPELAN":
                kwargs = {"c2": c2, "c3_": args[1]}
                if len(args) > 2:
                    kwargs["k"] = args[2]
            elif mname == "C3TR":
                kwargs = {"c2": c2, "n": n}
                if len(args) > 1:
                    kwargs["shortcut"] = args[1]
                n = 1
            elif mname == "A2C2f":
                legacy = False
                kwargs = {"c2": c2, "n": n}
                if len(args) > 1:
                    kwargs["a2"] = args[1]
                if len(args) > 2 and args[2] is not None:
                    kwargs["area"] = args[2]
                # reference parse_model: l/x scales get residual + mlp 1.2
                if scale in "lx" and len(args) <= 3:
                    kwargs["residual"], kwargs["mlp_ratio"] = True, 1.2
                if len(args) > 3:
                    kwargs["residual"] = args[3]
                if len(args) > 4:
                    kwargs["mlp_ratio"] = args[4]
                n = 1
            elif mname == "Classify":
                c2 = args[0]  # nc: never width-scaled
                kwargs = {"nc": c2}
        elif mname == "C2fAttn":
            # reference tasks.py:1449-1451: ec and nh get width-scaled
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            ec = make_divisible(min(args[1], max_channels // 2) * width, 8)
            nh_raw = args[2] if len(args) > 2 else 1
            nh = int(max(round(min(nh_raw, max_channels // 2 // 32)) * width, 1)) if nh_raw > 1 else nh_raw
            kwargs = {"c2": c2, "n": n, "ec": ec, "nh": nh}
            if len(args) > 3:
                kwargs["gc"] = args[3]
            n = 1
        elif mname == "ImagePoolingAttn":
            # refines the routed text features; feature channels from `from`
            ch_list = tuple(in_ch(x) for x in f)
            kwargs = {"ec": args[0] if args else 256, "ch": ch_list}
            c2 = ch_list[-1]
            fac = in_factor(f[-1])
        elif mname == "WorldDetect":
            ch_list = tuple(in_ch(x) for x in f)
            strides_w = tuple(in_factor(x) for x in f)
            kwargs = {
                "nc": args[0] if args else nc,
                "embed": args[1] if len(args) > 1 else 512,
                "with_bn": args[2] if len(args) > 2 else False,
                "ch": ch_list,
                "strides": strides_w,
            }
            c2 = 0
        elif mname == "YOLOEDetect":
            ch_list = tuple(in_ch(x) for x in f)
            kwargs = {
                "nc": args[0] if args else nc,
                "embed": args[1] if len(args) > 1 else 512,
                "with_bn": args[2] if len(args) > 2 else True,
                "ch": ch_list,
                "strides": tuple(in_factor(x) for x in f),
                "legacy": legacy,
            }
            c2 = 0
        elif mname == "YOLOESegment":
            # yaml row args: [nc, nm, npr, embed, with_bn]; npr width-scales
            # like Segment (reference tasks.py:1486)
            ch_list = tuple(in_ch(x) for x in f)
            kwargs = {
                "nc": args[0] if args else nc,
                "nm": args[1] if len(args) > 1 else 32,
                "npr": make_divisible(min(args[2] if len(args) > 2 else 256, max_channels) * width, 8),
                "embed": args[3] if len(args) > 3 else 512,
                "with_bn": args[4] if len(args) > 4 else True,
                "ch": ch_list,
                "strides": tuple(in_factor(x) for x in f),
                "legacy": legacy,
            }
            c2 = 0
        elif mname == "TorchVision":
            # named-backbone trunk: output channels fixed by the backbone,
            # never width-scaled (reference tasks.py:1497 TorchVision branch,
            # block.py:1601); stem+4 stages -> /32 feature map
            c2 = args[0]
            kwargs = {"c2": c2}
            if len(args) > 1:
                kwargs["model"] = str(args[1])
            if len(args) > 2:
                kwargs["weights"] = str(args[2])
            if len(args) > 3:
                kwargs["unwrap"] = bool(args[3])
            if len(args) > 4:
                kwargs["truncate"] = int(args[4])
            fac *= 32
        elif mname == "AIFI":
            # pass-through channels (reference tasks.py:1467 args=[ch[f],*args])
            c2 = in_ch(f)
            kwargs = {"cm": args[0] if args else 2048}
            if len(args) > 1:
                kwargs["num_heads"] = args[1]
        elif mname == "RTDETRDecoder":
            # reference tasks.py:1489 inserts the channel list at index 1;
            # optional extra yaml args follow the ctor order (head.py:581)
            ch_list = tuple(in_ch(x) for x in f)
            kwargs = {"nc": args[0] if args else nc, "ch": ch_list}
            for key, val in zip(("hd", "nq", "ndp", "nh", "ndl", "d_ffn"), args[1:]):
                kwargs[key] = val
            c2 = 0
        elif mname == "HGStem":
            # args [cm, c2] (reference parse_model HGStem/HGBlock branch)
            c2 = args[1]
            kwargs = {"cm": args[0], "c2": c2}
            fac *= 4  # two stride-2 convs
        elif mname == "HGBlock":
            c2 = args[1]
            kwargs = {"cm": args[0], "c2": c2, "n": n}
            if len(args) > 2:
                kwargs["k"] = args[2]
            if len(args) > 3:
                kwargs["lightconv"] = args[3]
            if len(args) > 4:
                kwargs["shortcut"] = args[4]
            n = 1
        elif mname == "ResNetLayer":
            # yaml args [c1, c2, s, is_first, n(, e)] (reference
            # tasks.py:1475 c2 = args[1] if args[3] else args[1]*4)
            s_ = args[2] if len(args) > 2 else 1
            is_first = args[3] if len(args) > 3 else False
            n_blocks = args[4] if len(args) > 4 else 1
            e_ = args[5] if len(args) > 5 else 4
            c2 = args[1] if is_first else e_ * args[1]
            kwargs = {"c2": args[1], "s": s_, "is_first": is_first, "n": n_blocks, "e": e_}
            fac *= 4 if is_first else s_
        elif mname == "CBLinear":
            c2 = tuple(args[0])  # tuple of split channel sizes
            kwargs = {"c2s": c2}
            if len(args) > 1:
                kwargs["k"] = args[1]
            if len(args) > 2:
                kwargs["s"] = args[2]
                fac *= args[2]
        elif mname == "CBFuse":
            c2 = in_ch(f[-1])
            kwargs = {"idx": tuple(args[0])}
            fac = in_factor(f[-1])
        elif mname == "Concat":
            c2 = sum(in_ch(x) for x in f)
            kwargs = {}
        elif mname in ("nn.Upsample", "Upsample"):
            c2 = in_ch(f)
            kwargs = {"scale": int(args[1]) if len(args) > 1 else 2}
            fac = fac // kwargs["scale"]
        elif mname == "nn.MaxPool2d":
            c2 = in_ch(f)
            kwargs = {"k": args[0], "s": args[1] if len(args) > 1 else args[0],
                      "p": args[2] if len(args) > 2 else 0}
            fac *= kwargs["s"]
        elif mname == "nn.ZeroPad2d":
            c2 = in_ch(f)
            kwargs = {"padding": tuple(args[0])}
        elif mname in HEAD_MODULES:
            ch_list = tuple(in_ch(x) for x in f)
            strides = tuple(in_factor(x) for x in f)
            kwargs = {"nc": args[0] if args else nc, "ch": ch_list, "strides": strides, "legacy": legacy}
            if mname == "Segment":
                nm = args[1] if len(args) > 1 else 32
                npr = args[2] if len(args) > 2 else 256
                kwargs["nm"] = nm
                kwargs["npr"] = make_divisible(min(npr, max_channels) * width, 8)
            elif mname == "Pose":
                kwargs["kpt_shape"] = tuple(args[1]) if len(args) > 1 else (17, 3)
            elif mname == "OBB":
                kwargs["ne"] = args[1] if len(args) > 1 else 1
            c2 = 0
        elif mname == "nn.ConvTranspose2d":
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            kwargs = {"c2": c2, "bn": False, "act": False}
            if len(args) > 1:
                kwargs["k"] = args[1]
            if len(args) > 2:
                kwargs["s"] = args[2]
                fac //= args[2]
            if len(args) > 3:
                kwargs["p"] = args[3]
        elif mname == "DWConvTranspose2d":
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            kwargs = {"c2": c2}
            for j, key in enumerate(("k", "s", "p1", "p2"), start=1):
                if len(args) > j:
                    kwargs[key] = args[j]
            if kwargs.get("s", 1) > 1:
                fac //= kwargs["s"]
        elif mname == "AGLU":
            c2 = in_ch(f)
            kwargs = {}
        elif mname == "nn.Identity":
            c2 = in_ch(f)
            kwargs = {}
        elif mname == "Index":
            c2 = args[0]
            kwargs = {"c2": c2, "index": args[1] if len(args) > 1 else 0}
        elif mname == "CBAM":
            c2 = in_ch(f)
            kwargs = {"channels": args[0] if args else None}
        elif mname == "SwinBlock":
            c2 = in_ch(f)
            # YAML dim is advisory; runtime channels rule (see modules.SwinBlock)
            kwargs = {"dim": args[0] if args else None}
            if len(args) > 1:
                kwargs["num_heads"] = args[1]
            if len(args) > 2:
                kwargs["window_size"] = args[2]
        else:
            raise KeyError(f"Unknown module in YAML: {mname!r} (row {i})")

        # normalize relative refs other than -1 to absolute indices
        # (v3's `-2` two-back routing; -1 stays "previous output")
        def norm(x):
            return x if x == -1 else x % i

        f_norm = tuple(norm(x) for x in f) if isinstance(f, (list, tuple)) else norm(f)
        specs.append(
            LayerSpec(
                i=i,
                f=f_norm,
                n=n,
                name=mname,
                kwargs=tuple(sorted(kwargs.items())),
                c2=c2,
            )
        )
        save.update(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        chs.append(c2)
        factors.append(fac)
        if verbose:
            print(f"{i:>3}{str(f):>18}{n_orig:>3}  {mname:<18}{str(dict(kwargs)):<40}")

    return tuple(specs), tuple(sorted(save)), {"nc": nc, "scale": scale, "depth": depth, "width": width}


class GraphNet(nn.Module):
    """The compiled network: walks LayerSpecs with savelist routing.

    Equivalent of BaseModel._predict_once (reference tasks.py:152-179) but
    traced once under jit — the routing dict disappears at compile time.
    """

    specs: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize backbone/neck blocks in backward

    @nn.compact
    def __call__(self, x, train: bool = False, targets=None, txt=None, vp=None,
                 embed: Tuple[int, ...] = (), features: Tuple[int, ...] = (),
                 return_vpe: bool = False):
        y: Dict[int, jnp.ndarray] = {}
        out = x
        embeddings = []
        feats = []
        ori_txt = txt  # WorldDetect scores against the ORIGINAL text feats
        for spec in self.specs:
            if spec.f != -1:
                if isinstance(spec.f, int):
                    out = y[spec.f]
                else:
                    out = [out if j == -1 else y[j] for j in spec.f]
            if spec.name == "RTDETRDecoder":
                # GT thread-through for contrastive-denoising training
                # (reference RTDETRDetectionModel.predict passes `batch`
                # to the head, nn/tasks.py:694-696)
                out = spec.build(self.dtype)(out, train=train, targets=targets)
            elif spec.name == "C2fAttn":
                out = spec.build(self.dtype)(out, txt, train=train)
            elif spec.name == "ImagePoolingAttn":
                # refines the text features in place; the image path is
                # untouched (reference WorldModel.predict, tasks.py:771)
                txt = spec.build(self.dtype)(out, txt, train=train)
                out = out[-1] if isinstance(out, list) else out
            elif spec.name == "WorldDetect":
                out = spec.build(self.dtype)(out, ori_txt, train=train)
            elif spec.name in ("YOLOEDetect", "YOLOESegment"):
                # text prompts by default; visual prompt masks (B, Q, Hp3,
                # Wp3) switch the head to SAVPE embeddings (reference
                # YOLOEDetect.get_vpe, head.py:464-470)
                if return_vpe:
                    # SAVPE prompt embeddings only (reference
                    # YOLOEModel.get_visual_pe, nn/tasks.py:801+)
                    return spec.build(self.dtype)(out, ori_txt, train=train, vp=vp, return_vpe=True)
                out = spec.build(self.dtype)(out, ori_txt, train=train, vp=vp)
            elif spec.n > 1:  # sequential repeats of a non-repeat module
                # (reference tasks.py:1505 nn.Sequential wrap, e.g. yolov6)
                rm = self.remat and train
                for j in range(spec.n):
                    out = spec.build(self.dtype, rep=j, remat=rm)(out, train) if rm \
                        else spec.build(self.dtype, rep=j)(out, train=train)
            elif self.remat and train and spec.name not in _NO_REMAT:
                out = spec.build(self.dtype, remat=True)(out, train)
            else:
                out = spec.build(self.dtype)(out, train=train)
            if spec.i in self.save:
                y[spec.i] = out
            if embed and spec.i in embed:
                # global-average-pooled layer embedding (reference
                # _predict_once embed, tasks.py:175-178)
                embeddings.append(out.mean(axis=(1, 2)))
                if spec.i == max(embed):
                    return jnp.concatenate(embeddings, axis=-1)  # (B, sum C)
            if features and spec.i in features and isinstance(out, jnp.ndarray) and out.ndim == 4:
                # raw per-layer activation capture for visualize=True
                # (reference _predict_once -> feature_visualization,
                # tasks.py:168-170, plotting.py:974); spec.i is a static
                # Python int so the pair survives tracing
                feats.append((spec.i, out))
        if features:
            return out, tuple(feats)
        return out


class DetectionModel:
    """YOLO detection model: config + compiled graph + param management.

    Mirrors the role of reference DetectionModel (tasks.py:318-443) minus
    torch statefulness: variables live in an external pytree.
    """

    def __init__(self, cfg="yolov8n.yaml", ch: int = 3, nc: Optional[int] = None, dtype=jnp.float32, verbose=False,
                 remat: bool = False):
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if nc is not None:
            self.yaml["nc"] = nc
        self.specs, self.save, self.meta = parse_model(self.yaml, ch=ch, verbose=verbose)
        det = self.specs[-1]
        dkw = dict(det.kwargs)
        self.head_type = det.name
        self.task = {
            "Detect": "detect", "Segment": "segment", "Pose": "pose", "OBB": "obb", "Classify": "classify",
            "YOLOESegment": "segment",
        }.get(det.name, "detect")
        self.is_rtdetr = det.name == "RTDETRDecoder"
        self.is_world = det.name == "WorldDetect"
        self.is_yoloe = det.name in ("YOLOEDetect", "YOLOESegment")
        self.nc = dkw["nc"]
        if self.is_world or self.is_yoloe:
            # offline text features for the initial class ids (reference
            # WorldModel.__init__ txt_feats placeholder, tasks.py:710);
            # set_classes() replaces them with real encoded prompts
            from ..utils.text_model import encode_texts

            self.txt_feats = encode_texts([str(i) for i in range(self.nc)])[None]  # (1, nc, 512)
        self.end2end = det.name == "v10Detect"  # NMS-free head
        self.strides = dkw.get("strides", (8, 16, 32))
        self.reg_max = 16
        self.dtype = dtype
        self.net = GraphNet(specs=self.specs, save=self.save, dtype=dtype, remat=remat)
        self.names = {i: str(i) for i in range(self.nc)}

    def _txt_kw(self, batch: int, txt=None):
        if not (getattr(self, "is_world", False) or getattr(self, "is_yoloe", False)):
            return {}
        t = jnp.asarray(self.txt_feats if txt is None else txt, jnp.float32)
        if t.ndim == 2:
            t = t[None]
        if t.shape[0] != batch:
            t = jnp.broadcast_to(t, (batch,) + t.shape[1:])
        return {"txt": t}

    def init(self, rng, imgsz: int = 640) -> FrozenDict:
        x = jnp.zeros((1, imgsz, imgsz, 3), self.dtype)
        return self.net.init(rng, x, train=False, **self._txt_kw(1))

    def shape_init(self, imgsz: int = 640):
        """Abstract init: variable shapes without any compute (replaces the
        reference's real dummy-forward construction cost, tasks.py:353)."""
        x = jnp.zeros((1, imgsz, imgsz, 3), self.dtype)
        return jax.eval_shape(lambda: self.net.init(jax.random.PRNGKey(0), x, train=False, **self._txt_kw(1)))

    def set_classes(self, names, embeddings=None):
        """Open-vocabulary class swap (reference WorldModel.set_classes,
        tasks.py:715-740): encode prompts, resize the class axis. With
        `embeddings` (Q, 512) / (1, Q, 512) — e.g. SAVPE visual-prompt
        embeddings — use them directly (reference YOLOEModel.set_classes,
        nn/tasks.py:887)."""
        from ..utils.text_model import encode_texts

        if not (getattr(self, "is_world", False) or getattr(self, "is_yoloe", False)):
            raise ValueError("set_classes requires an open-vocabulary (World/YOLOE) head")
        if embeddings is not None:
            e = np.asarray(embeddings, np.float32)
            if e.ndim == 2:
                e = e[None]
            if e.shape[1] != len(names):
                raise ValueError(f"{e.shape[1]} embeddings for {len(names)} classes")
            self.txt_feats = e
        else:
            self.txt_feats = encode_texts(list(names))[None]
        self.nc = len(names)
        self.names = {i: n for i, n in enumerate(names)}

    def apply(self, variables, x, train: bool = False, mutable=False, targets=None, rngs=None, txt=None,
              vp=None):
        kw = dict(self._txt_kw(x.shape[0], txt))
        if targets is not None:
            kw["targets"] = targets
        if rngs is not None:
            kw["rngs"] = rngs
        if vp is not None:
            kw["vp"] = vp
        return self.net.apply(variables, x, train=train, mutable=mutable, **kw)

    def get_visual_pe(self, variables, x, vp):
        """SAVPE visual-prompt embeddings (reference YOLOEModel.get_visual_pe,
        nn/tasks.py:801): x (B, H, W, 3) normalized image, vp (B, Q, H/8, W/8)
        binary prompt masks -> (B, Q, 512) L2-normalized float32."""
        if not getattr(self, "is_yoloe", False):
            raise ValueError("get_visual_pe requires a YOLOE head")
        return self.net.apply(
            variables, x, train=False, vp=jnp.asarray(vp), return_vpe=True,
            **self._txt_kw(x.shape[0]),
        )

    def embed(self, variables, x, layers=(-1,)):
        """Pooled per-layer embeddings, concatenated over `layers`
        (reference Model.embed -> _predict_once embed): (B, sum C)."""
        layers = tuple(l % len(self.specs) for l in layers)
        return self.net.apply(variables, x, train=False, embed=layers, **self._txt_kw(x.shape[0]))

    def features(self, variables, x, layers=None):
        """Raw per-layer activations for feature visualization (reference
        _predict_once visualize -> feature_visualization, tasks.py:168-170).
        Returns [(layer_idx, module_name, (B,H,W,C) array), ...] for every
        rank-4 single-array layer output in `layers` (default: all)."""
        if layers is None:
            layers = range(len(self.specs))
        layers = tuple(l % len(self.specs) for l in layers)
        _, feats = self.net.apply(variables, x, train=False, features=layers, **self._txt_kw(x.shape[0]))
        names = {s.i: s.name for s in self.specs}
        return [(int(i), names[int(i)], f) for i, f in feats]

    def predict_augment(self, variables, x):
        """3-scale + lr-flip test-time augmentation (reference
        nn/tasks.py:374-439 _predict_augment/_descale_pred/_clip_augmented).

        x: (B, H, W, 3) float in [0,1], NHWC. Returns (B, 4+nc, A') merged
        predictions; all shapes are static so the whole TTA jits."""
        if self.task != "detect":
            pred, _ = self.apply(variables, x, train=False)
            return pred
        h0, w0 = x.shape[1], x.shape[2]
        gs = int(max(self.strides))
        scales = (1.0, 0.83, 0.67)
        flips = (None, "lr", None)
        outs = []
        for si, fi in zip(scales, flips):
            xi = x[:, :, ::-1, :] if fi == "lr" else x
            if si != 1.0:
                nh, nw = int(h0 * si), int(w0 * si)
                xi = jax.image.resize(xi, (xi.shape[0], nh, nw, xi.shape[3]), method="linear")
                ph = math.ceil(h0 * si / gs) * gs - nh
                pw = math.ceil(w0 * si / gs) * gs - nw
                # pad value 0.447 = imagenet mean (reference scale_img)
                xi = jnp.pad(xi, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=0.447)
            yi, _ = self.apply(variables, xi, train=False)  # (B, 4+nc, A)
            yi = yi.astype(jnp.float32)
            box = yi[:, :4] / si
            if fi == "lr":
                box = jnp.concatenate([w0 - box[:, :1], box[:, 1:]], axis=1)
            outs.append(jnp.concatenate([box, yi[:, 4:]], axis=1))
        # clip augmented tails (reference _clip_augmented)
        nl = len(self.strides)
        g = sum(4**k for k in range(nl))
        i0 = (outs[0].shape[-1] // g) * 1
        outs[0] = outs[0][..., :-i0]
        i1 = (outs[-1].shape[-1] // g) * 4 ** (nl - 1)
        outs[-1] = outs[-1][..., i1:]
        return jnp.concatenate(outs, axis=-1)

    def param_count(self, variables) -> int:
        return sum(int(math.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


class EnsembleModel:
    """NMS-ensemble of detection models (reference nn/tasks.py:1058
    Ensemble + attempt_load_weights:1254): every member runs on the same
    input, the per-anchor predictions concatenate along the anchor axis,
    and the shared NMS dedups across members. Inference-only, like the
    reference (training an Ensemble raises there too).

    `variables` for apply() is {"members": (vars_0, vars_1, ...)} so the
    facade's single-variables plumbing (device placement, fuse) keeps
    working on the whole pytree.
    """

    def __init__(self, models):
        if not models:
            raise ValueError("ensemble needs at least one model")
        ncs = {m.nc for m in models}
        if len(ncs) != 1:
            raise ValueError(f"ensemble members disagree on nc: {sorted(ncs)}")
        bad = [m.task for m in models if m.task != "detect" or m.end2end or m.is_rtdetr]
        if bad:
            raise ValueError("only plain detect heads can be NMS-ensembled")
        self.models = list(models)
        m0 = models[0]
        self.nc = m0.nc
        self.names = m0.names
        self.task = "detect"
        # predictor pads inputs to the coarsest member stride
        self.strides = tuple(max(s) for s in zip(*(tuple(m.strides) for m in models)))
        self.dtype = m0.dtype
        self.yaml = m0.yaml
        self.specs = m0.specs
        self.end2end = False
        self.is_rtdetr = False
        self.is_world = False
        self.is_yoloe = False

    def apply(self, variables, x, train=False, **kw):
        if train:
            raise NotImplementedError("Ensemble is not supported for training (reference tasks.py:1303)")
        preds = [
            m.apply(v, x, train=False)[0]
            for m, v in zip(self.models, variables["members"])
        ]
        return jnp.concatenate(preds, axis=-1), None  # (B, 4+nc, sum A)

    def param_count(self, variables) -> int:
        return sum(
            m.param_count(v) for m, v in zip(self.models, variables["members"])
        )
