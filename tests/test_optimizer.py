"""Optimizer parity: 'auto' heuristic, param grouping, AdamW/RMSProp steps
(reference engine/trainer.py:788-849 build_optimizer)."""

import numpy as np
import pytest


def _mini_args(**kw):
    from improving_yolov8_cbam_swinblock_tpu.cfg import get_cfg

    base = {"batch": 16, "nbs": 64, "epochs": 100}
    base.update(kw)
    return get_cfg(overrides=base)


def test_auto_picks_adamw_small_runs():
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import resolve_optimizer

    # coco128-scale: 128 imgs / nbs 64 * 100 epochs = 200 iterations <= 10k
    args = _mini_args()
    name, lr, mom = resolve_optimizer(args, nc=80, nb=8)
    assert name == "AdamW"
    assert lr == pytest.approx(round(0.002 * 5 / 84, 6))  # fitted lr, nc=80
    assert mom == 0.9
    assert args.warmup_bias_lr == 0.0  # zeroed for Adam (reference :816)


def test_auto_picks_sgd_long_runs():
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import resolve_optimizer

    # coco-scale: enough iterations to cross the 10k threshold
    args = _mini_args(epochs=300)
    name, lr, mom = resolve_optimizer(args, nc=80, nb=7300)  # ~117k imgs / bs16
    assert name == "SGD"
    assert (lr, mom) == (0.01, 0.9)


def test_explicit_names_canonicalized():
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import resolve_optimizer

    for raw, want in (("adamw", "AdamW"), ("sgd", "SGD"), ("rmsprop", "RMSProp"), ("Adam", "Adam")):
        args = _mini_args(optimizer=raw, lr0=0.02, momentum=0.9)
        name, lr, mom = resolve_optimizer(args, nc=3, nb=10)
        assert name == want
        assert lr == 0.02  # explicit name keeps user lr
    with pytest.raises(NotImplementedError):
        resolve_optimizer(_mini_args(optimizer="lion"), nc=3, nb=10)


def test_param_groups_partition():
    import jax

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import param_group_of
    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    groups = {"decay": 0, "nodecay": 0, "bias": 0}
    leaves = jax.tree_util.tree_leaves_with_path(v["params"])
    for path, leaf in leaves:
        groups[param_group_of(tuple(p.key for p in path))] += 1
    # every leaf lands in exactly one group; all three are populated
    assert sum(groups.values()) == len(leaves)
    assert all(n > 0 for n in groups.values()), groups
    # BN scales = nodecay, and conv/dense kernels dominate the decay group
    assert groups["decay"] >= groups["nodecay"]


@pytest.mark.parametrize("opt", ["AdamW", "Adam", "RMSProp"])
def test_adaptive_optimizers_learn(opt, tiny_dataset, tmp_path):
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(
        overrides={
            "data": str(tiny_dataset), "model": "yolov8n.yaml", "epochs": 50, "imgsz": 96,
            "batch": 4, "nbs": 4, "workers": 2, "max_gt": 16, "val": False, "amp": False,
            "project": str(tmp_path / "runs"), "warmup_epochs": 0.0, "optimizer": opt,
            "lr0": 0.002, "mosaic": 0.0, "fliplr": 0.0, "scale": 0.0, "translate": 0.0,
            "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
        }
    )
    tr.setup()
    assert tr.optimizer_name == opt
    assert tr.state.var_buf is not None  # 2nd-moment buffers allocated
    batch = next(iter(tr.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s = tr.state
    first = None
    for i in range(40):
        s, m = tr.train_step(s, jb)
        if i == 0:
            first = np.asarray(m)
    last = np.asarray(m)
    assert np.isfinite(last).all()
    assert last.sum() < 0.85 * first.sum(), (opt, first, last)
    # var_buf actually accumulated
    import jax

    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in jax.tree.leaves(s.var_buf))


@pytest.mark.parametrize("opt", ["SGD", "RMSProp", "Adam", "AdamW", "Adamax", "NAdam", "RAdam"])
@pytest.mark.parametrize("grp", ["decay", "bias"])
def test_update_rule_torch_trajectory_parity(opt, grp):
    """Feed the same 25-step synthetic grad sequence to our per-leaf rule
    and the torch.optim counterpart; trajectories must match."""
    import jax.numpy as jnp
    import torch

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import optimizer_update

    lr, mom, wd = 0.01, 0.9, 0.0005
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(6).astype(np.float32)
    grads = rng.standard_normal((25, 6)).astype(np.float32) * 0.5

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    twd = wd if grp == "decay" else 0.0
    topt = {
        "SGD": lambda: torch.optim.SGD([tp], lr=lr, momentum=mom, nesterov=True, weight_decay=twd),
        "RMSProp": lambda: torch.optim.RMSprop([tp], lr=lr, momentum=mom, weight_decay=twd),
        "Adam": lambda: torch.optim.Adam([tp], lr=lr, betas=(mom, 0.999), weight_decay=twd),
        "AdamW": lambda: torch.optim.AdamW([tp], lr=lr, betas=(mom, 0.999), weight_decay=twd),
        "Adamax": lambda: torch.optim.Adamax([tp], lr=lr, betas=(mom, 0.999), weight_decay=twd),
        "NAdam": lambda: torch.optim.NAdam([tp], lr=lr, betas=(mom, 0.999), weight_decay=twd),
        "RAdam": lambda: torch.optim.RAdam([tp], lr=lr, betas=(mom, 0.999), weight_decay=twd),
    }[opt]()

    p = jnp.asarray(p0)
    b = jnp.zeros(6, jnp.float32)
    v = jnp.zeros(6, jnp.float32)
    for t in range(1, 26):
        g = grads[t - 1]
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
        p, b, v = optimizer_update(
            opt, grp, p, jnp.asarray(g), b, v, lr, mom, mom, wd, jnp.float32(t)
        )
        # RAdam's rho_t is a difference of ~2000-scale terms; fp32 spacing
        # there (~1.2e-4) bounds the achievable parity (torch computes the
        # scalar schedule in python float64) — drift is ~1e-6/step
        rtol, atol = (3e-4, 3e-5) if opt == "RAdam" else (2e-5, 2e-6)
        np.testing.assert_allclose(
            np.asarray(p), tp.detach().numpy(), rtol=rtol, atol=atol,
            err_msg=f"{opt}/{grp} diverged at torch step {t}",
        )


def test_sgd_state_has_no_var_buf(tiny_dataset, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(
        overrides={
            "data": str(tiny_dataset), "model": "yolov8n.yaml", "epochs": 2, "imgsz": 96,
            "batch": 4, "nbs": 4, "workers": 2, "val": False, "amp": False,
            "project": str(tmp_path / "runs"), "optimizer": "SGD",
        }
    )
    tr.setup()
    assert tr.optimizer_name == "SGD"
    assert tr.state.var_buf is None
