"""Per-block forward AND backward attribution on the real chip
(VERDICT r4 'Next round' #5: the 131 ms model-bwd slice was unattributed).

Walks the compiled graph layer by layer at the bench shape (bs128, 640px,
bf16), and for every block times, with the two-point chained method from
tools/microbench (fixed ~34 ms tunnel overhead cancelled):

  fwd   block.apply(train=True)
  f+b   value_and_grad of sum(out) wrt (params, x)   — dparams AND dx, the
        real backward work the block contributes inside the model

and reports bwd = (f+b) - fwd plus the bwd/fwd ratio. Blocks whose bwd
exceeds ~2x their fwd are the tuning candidates; sums won't exactly match
the whole-model numbers (XLA fuses across block boundaries) but ratios and
outliers attribute the slice.

Usage: python tools/profile_blocks_bwd.py [batch=N] [model=yaml] [from=i]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def chain_time_dyn(fn, inp, n1: int = 5, n2: int = 25, reps: int = 2) -> float:
    """Two-point chained timing with a DYNAMIC trip count: one compile per
    fn (the tunnel charges 1-6 min per compile, so the static-n runner pair
    in tools/microbench is too expensive for a ~30-block sweep).

    `inp` is passed as a jit ARGUMENT — closing over large arrays bakes
    them into the graph as constants, and the tunnel's remote_compile
    rejects the giant request body (HTTP 413, hit on the 640px blocks)."""
    import time as _t

    @jax.jit
    def run(n, x, inp_arg):
        def body(_, c):
            return fn(c, inp_arg)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x, unroll=False).astype(jnp.float32))

    times = {}
    float(run(2, jnp.float32(0.0), inp))  # compile + warm
    for n in (n1, n2):
        best = float("inf")
        for _ in range(reps):
            t = _t.perf_counter()
            float(run(n, jnp.float32(0.0), inp))
            best = min(best, _t.perf_counter() - t)
        times[n] = best
    return (times[n2] - times[n1]) / (n2 - n1) * 1e3

BATCH = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("batch=")), 128)
MODEL = next((a.split("=")[1] for a in sys.argv[1:] if a.startswith("model=")), "yolov8s-cbam-swin.yaml")
FROM = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("from=")), 0)
IMGSZ = 640
SKIP = {"Concat"}  # pure routing, ~free; everything else is timed


def _perturb(x, c):
    if isinstance(x, (list, tuple)):
        return [_perturb(x[0], c)] + list(x[1:])
    return x.at[(0,) * x.ndim].add(c.astype(x.dtype))


def main():
    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

    model = DetectionModel(MODEL, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, IMGSZ, IMGSZ, 3)).astype(np.float32)).astype(jnp.bfloat16)

    y = {}
    out = x
    key = jax.random.PRNGKey(0)
    rows = []
    t_all0 = time.time()
    for spec in model.specs:
        inp = out
        if spec.f != -1:
            inp = y[spec.f] if isinstance(spec.f, int) else [out if j == -1 else y[j] for j in spec.f]
        block = spec.build(jnp.bfloat16)
        variables = block.init(key, inp, train=True)
        params = variables.get("params", {})
        bstats = variables.get("batch_stats", {})

        def apply_sum(p, xx):
            o = block.apply(
                {"params": p, **({"batch_stats": bstats} if bstats else {})}, xx,
                train=True, mutable=["batch_stats"] if bstats else [],
            )
            o = o[0] if isinstance(o, tuple) else o
            leaves = jax.tree.leaves(o)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        if spec.i >= FROM and spec.name not in SKIP:
            def fwd_fn(c, inp_arg, _p=params, _f=apply_sum):
                return (_f(_p, _perturb(inp_arg, c)) * 1e-12).astype(jnp.float32)

            def bwd_fn(c, inp_arg, _p=params, _f=apply_sum):
                l, (gp, gx) = jax.value_and_grad(_f, argnums=(0, 1))(_p, _perturb(inp_arg, c))
                acc = l + sum(jnp.sum(jnp.abs(g.astype(jnp.float32))) for g in jax.tree.leaves((gp, gx)))
                return (acc * 1e-12).astype(jnp.float32)

            try:
                t_f = chain_time_dyn(fwd_fn, inp)
                t_fb = chain_time_dyn(bwd_fn, inp)
                t_b = t_fb - t_f
                ratio = t_b / max(t_f, 1e-6)
                shape = inp.shape if hasattr(inp, "shape") else [tuple(a.shape) for a in inp]
                rows.append((spec.i, spec.name, t_f, t_b, ratio))
                print(f"{spec.i:3d} {spec.name:>14} in={str(shape):>28}  fwd {t_f:7.2f} ms  bwd {t_b:7.2f} ms  b/f {ratio:5.2f}",
                      flush=True)
            except Exception as e:  # keep walking on a pathological block
                print(f"{spec.i:3d} {spec.name:>14}  ERROR: {str(e)[:120]}", flush=True)

        # advance the walk with real values (train=False avoids stat mutation)
        o = block.apply(variables, inp, train=False)
        out = o[0] if (isinstance(o, tuple) and spec.name not in ("Detect",)) else o
        if spec.name == "Detect":
            break  # head reached; its row already printed
        if spec.i in model.save:
            y[spec.i] = out

    print(f"\ntotal wall {time.time() - t_all0:.0f}s")
    tot_f = sum(r[2] for r in rows)
    tot_b = sum(r[3] for r in rows)
    print(f"sum of blocks: fwd {tot_f:.1f} ms  bwd {tot_b:.1f} ms (fusion makes whole-model lower)")
    worst = sorted(rows, key=lambda r: -r[3])[:5]
    print("top bwd blocks:", ", ".join(f"{i}:{n} {b:.1f}ms (b/f {r:.1f})" for i, n, f, b, r in worst))


if __name__ == "__main__":
    main()
