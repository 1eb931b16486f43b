"""Train-step time attribution on the real chip (yolov8s-cbam-swin, 640px).

Measures, at the bench batch size, the marginal per-step cost of nested
subsets of the train step so differences attribute time to components:

  fwd            model.apply(train=True)                       (fwd only)
  fwd_loss       + detection loss/TAL                          (fwd+loss fwd)
  bwd_dummy      value_and_grad of sum(feats)                  (model fwd+bwd)
  bwd_real       value_and_grad of the real loss               (+loss bwd/TAL)
  full           the production train step (opt update incl.)  (bench number)

Chaining: every variant threads a scalar carry into the image via a
single-element add so XLA cannot hoist the body out of the measurement
loop; dispatches pipeline through the tunnel and one final fetch pays the
~34 ms fixed overhead once (divided by iters).

Usage: python tools/profile_train.py [variant ...] [batch=N]
  variants: fwd fwd_loss bwd_dummy bwd_real full   (default: all, in order)
Run variants one per invocation when cold — a single pathological tunnel
compile then can't strand the others (results append via the jax cache).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

ALL = ("fwd", "fwd_loss", "bwd_dummy", "bwd_real", "full")
VARIANTS = [a for a in sys.argv[1:] if a in ALL] or list(ALL)
BATCH = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("batch=")), 128)
IMGSZ = 640
MAX_GT = 32
ITERS = 10


def timed(label, fn, *args):
    """Python-chained pipelined timing: one final fetch, overhead/ITERS."""
    c = fn(jnp.float32(0.0), *args)
    float(c)  # compile + complete
    c = fn(jnp.float32(0.0), *args)
    float(c)  # warm
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(ITERS):
        c = fn(c * 1e-30, *args)
    float(c)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:>10}: {dt * 1e3:8.1f} ms/step  ({BATCH / dt:7.1f} img/s)", flush=True)
    return dt


def main():
    from improving_yolov8_cbam_swinblock_tpu.cfg import get_cfg
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer, make_train_state
    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel
    from improving_yolov8_cbam_swinblock_tpu.utils.loss import detection_loss

    model = DetectionModel("yolov8s-cbam-swin.yaml", dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), imgsz=IMGSZ)
    params, bstats = variables["params"], variables["batch_stats"]
    nc, strides = model.nc, model.strides

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (BATCH, IMGSZ, IMGSZ, 3), dtype=np.uint8))
    gcls = jnp.asarray(rng.integers(0, 1, (BATCH, MAX_GT)).astype(np.int32))
    gbox = jnp.asarray(rng.uniform(0.3, 0.6, (BATCH, MAX_GT, 4)).astype(np.float32))
    gmask = jnp.asarray((rng.random((BATCH, MAX_GT)) < 0.5).astype(np.float32))

    def prep(c):
        # carry-dependent input: unhoistable, one-element add (cheap)
        return (img.at[0, 0, 0, 0].add((c * 255).astype(img.dtype)).astype(jnp.bfloat16)) / 255.0

    @jax.jit
    def fwd(c):
        feats, _ = model.apply({"params": params, "batch_stats": bstats}, prep(c), train=True, mutable=["batch_stats"])
        return sum(jnp.sum(f.astype(jnp.float32)) for f in jax.tree.leaves(feats)) * 1e-12

    @jax.jit
    def fwd_loss(c):
        feats, _ = model.apply({"params": params, "batch_stats": bstats}, prep(c), train=True, mutable=["batch_stats"])
        total, _ = detection_loss(feats, gcls, gbox, gmask, nc=nc, strides=strides)
        return total * 1e-12

    @jax.jit
    def bwd_dummy(c):
        def lf(p):
            feats, mut = model.apply({"params": p, "batch_stats": bstats}, prep(c), train=True, mutable=["batch_stats"])
            return sum(jnp.sum(f.astype(jnp.float32)) for f in jax.tree.leaves(feats))

        l, g = jax.value_and_grad(lf)(params)
        return (l + sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in jax.tree.leaves(g))) * 1e-12

    @jax.jit
    def bwd_real(c):
        def lf(p):
            feats, mut = model.apply({"params": p, "batch_stats": bstats}, prep(c), train=True, mutable=["batch_stats"])
            total, _ = detection_loss(feats, gcls, gbox, gmask, nc=nc, strides=strides)
            return total

        l, g = jax.value_and_grad(lf)(params)
        return (l + sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in jax.tree.leaves(g))) * 1e-12

    fns = {"fwd": fwd, "fwd_loss": fwd_loss, "bwd_dummy": bwd_dummy, "bwd_real": bwd_real}
    t = {}
    for v in VARIANTS:
        if v == "full":
            # full production step (bench_train construction)
            tr = DetectionTrainer.__new__(DetectionTrainer)
            tr.args = get_cfg(
                overrides={"batch": BATCH, "nbs": BATCH, "epochs": 100, "imgsz": IMGSZ, "optimizer": "SGD"}
            )
            tr.model = model
            step_fn, _ = tr._make_train_step(nb=100)
            # copy: the production step donates state buffers, which would delete
            # the `params` the other variants close over
            state = make_train_state(jax.tree.map(jnp.copy, variables), tr.optimizer_name)
            batch = {"img": img, "cls": gcls, "bboxes": gbox, "mask": gmask}
            state, m = step_fn(state, batch)
            _ = np.asarray(m)
            state, m = step_fn(state, batch)
            _ = np.asarray(m)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                state, m = step_fn(state, batch)
            _ = np.asarray(m)
            t["full"] = (time.perf_counter() - t0) / ITERS
            print(f"{'full':>10}: {t['full'] * 1e3:8.1f} ms/step  ({BATCH / t['full']:7.1f} img/s)", flush=True)
        else:
            t[v] = timed(v, fns[v])

    if set(t) == set(ALL):
        print("\nattribution:")
        print(f"  model fwd            : {t['fwd'] * 1e3:7.1f} ms")
        print(f"  loss fwd (TAL incl.) : {(t['fwd_loss'] - t['fwd']) * 1e3:7.1f} ms")
        print(f"  model bwd            : {(t['bwd_dummy'] - t['fwd']) * 1e3:7.1f} ms")
        print(f"  loss total (f+b)     : {(t['bwd_real'] - t['bwd_dummy']) * 1e3:7.1f} ms")
        print(f"  optimizer + EMA      : {(t['full'] - t['bwd_real']) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
