"""Generate golden fixtures for the mAP protocol (VERDICT r2 missing #5).

Captures the reference's `match_predictions` (engine/validator.py:256-298)
and `ap_per_class` (utils/metrics.py:573-661) outputs on fixed random
inputs — the subtle parts under test: greedy unique matching order, sort
stability, 101-pt interpolation, precision envelope, F1 box-filter
smoothing, and the max-F1 operating point.

Usage: python tools/gen_golden_map.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import ref_stub  # noqa: F401  (torchvision shim)

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)


def gen_match_predictions(rng):
    """Three scenarios incl. the duplicate-candidate case that exercises
    the unique()-by-column then unique()-by-row greedy dedup."""
    from ultralytics.engine.validator import BaseValidator

    v = BaseValidator.__new__(BaseValidator)
    v.iouv = torch.linspace(0.5, 0.95, 10)

    out = {}
    for si, (n_pred, n_gt) in enumerate([(12, 5), (30, 8), (6, 6)]):
        pred_cls = rng.integers(0, 3, n_pred).astype(np.float32)
        true_cls = rng.integers(0, 3, n_gt).astype(np.float32)
        # clustered IoUs so several preds compete for one GT (dedup path)
        iou = rng.uniform(0, 1, (n_gt, n_pred)).astype(np.float32)
        iou[:, : n_gt] = np.clip(iou[:, : n_gt] + np.eye(n_gt, dtype=np.float32) * 0.6, 0, 0.99)
        correct = v.match_predictions(
            torch.tensor(pred_cls), torch.tensor(true_cls), torch.tensor(iou)
        )
        out[f"s{si}_pred_cls"] = pred_cls
        out[f"s{si}_true_cls"] = true_cls
        out[f"s{si}_iou"] = iou
        out[f"s{si}_correct"] = correct.numpy()
    return out


def gen_ap_per_class(rng):
    from ultralytics.utils.metrics import ap_per_class

    n, nc = 200, 4
    tp50 = rng.random(n) < 0.55
    # monotone-decreasing tp probability across thresholds (realistic)
    tp = np.stack([tp50 & (rng.random(n) < (1.0 - 0.08 * j)) for j in range(10)], axis=1)
    conf = rng.uniform(0.05, 0.99, n).astype(np.float32)
    # duplicate confidences to pin sort stability
    conf[10:20] = conf[0]
    pred_cls = rng.integers(0, nc, n).astype(np.float32)
    target_cls = rng.integers(0, nc, 150).astype(np.float32)
    res = ap_per_class(tp, conf, pred_cls, target_cls)
    tp_c, fp_c, p, r, f1, ap, unique_classes, p_curve, r_curve, f1_curve, x, prec_values = res
    return {
        "tp": tp, "conf": conf, "pred_cls": pred_cls, "target_cls": target_cls,
        "out_tp": tp_c, "out_fp": fp_c, "out_p": p, "out_r": r, "out_f1": f1,
        "out_ap": ap, "out_classes": unique_classes,
        "out_p_curve": p_curve, "out_r_curve": r_curve, "out_f1_curve": f1_curve,
        "out_prec_values": prec_values,
    }


if __name__ == "__main__":
    rng = np.random.default_rng(42)
    data = {}
    data.update({f"match_{k}": v for k, v in gen_match_predictions(rng).items()})
    data.update({f"ap_{k}": v for k, v in gen_ap_per_class(rng).items()})
    np.savez(OUT / "map_protocol.npz", **data)
    print(f"wrote {OUT / 'map_protocol.npz'}: {sorted(data)[:6]}... ({len(data)} arrays)")
