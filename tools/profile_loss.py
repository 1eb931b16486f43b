"""Detection-loss / TAL microbench at train shapes (two-point chained).

The loss forward (TAL assignment included) measured ~30 ms of the
239 ms bs128 train step (tools/profile_train.py, r3) — almost all of it
HBM traffic over (B, max_gt, A) tensors. This tool times detection_loss
forward and forward+backward in isolation so assigner optimizations can
be attributed honestly (chained through a carry; fixed dispatch
overhead cancels via the two-point method — see tools/microbench.py).

Usage: python tools/profile_loss.py [batch=N] [gt=G] [fwd|fwdbwd ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tools.microbench import chain_time

BATCH = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("batch=")), 128)
MAX_GT = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("gt=")), 32)
VARIANTS = [a for a in sys.argv[1:] if a in ("fwd", "fwdbwd")] or ["fwd", "fwdbwd"]
IMGSZ = 640
NC = 1


def main():
    from improving_yolov8_cbam_swinblock_tpu.utils.loss import detection_loss

    strides = (8, 16, 32)
    shapes = [(IMGSZ // s, IMGSZ // s) for s in strides]
    no = 64 + NC
    sizes = [h * w * no for h, w in shapes]

    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.normal(0, 1, (BATCH, sum(sizes))).astype(np.float32))
    gcls = jnp.asarray(rng.integers(0, NC, (BATCH, MAX_GT)).astype(np.int32))
    gbox = jnp.asarray(rng.uniform(0.2, 0.7, (BATCH, MAX_GT, 4)).astype(np.float32))
    gmask = jnp.asarray((rng.random((BATCH, MAX_GT)) < 0.7).astype(np.float32))

    def split(x):
        feats, off = [], 0
        for (h, w), n in zip(shapes, sizes):
            feats.append(x[:, off : off + n].reshape(BATCH, h, w, no))
            off += n
        return feats

    def loss_of(x):
        total, _ = detection_loss(split(x), gcls, gbox, gmask, nc=NC, strides=strides)
        return total

    def fwd(x):
        return x * (1.0 + loss_of(x) * 1e-30)

    def fwdbwd(x):
        l, g = jax.value_and_grad(loss_of)(x)
        return x * (1.0 + l * 1e-30) + g * 1e-30

    fns = {"fwd": fwd, "fwdbwd": fwdbwd}
    for v in VARIANTS:
        ms = chain_time(fns[v], flat, n1=5, n2=25)
        print(f"loss {v:>6} (B={BATCH}, G={MAX_GT}): {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
