"""Gradient rematerialization (nn/tasks.py GraphNet.remat): identical
param tree, identical forward, identical gradients — only the backward
memory/recompute tradeoff changes (TPU equivalent of torch activation
checkpointing; no reference counterpart, a TPU-first addition measured
to unlock bs>=128 training at 640px on v5e).
"""

import numpy as np

import jax
import jax.numpy as jnp

from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel


def test_remat_param_and_grad_parity():
    m0 = DetectionModel("yolov8n.yaml")
    m1 = DetectionModel("yolov8n.yaml", remat=True)
    v0 = m0.init(jax.random.PRNGKey(0), imgsz=64)
    v1 = m1.init(jax.random.PRNGKey(0), imgsz=64)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)

    def loss(m, p, bs):
        feats, _ = m.apply({"params": p, "batch_stats": bs}, x, train=True, mutable=["batch_stats"])
        return sum(f.astype(jnp.float32).sum() for f in feats)

    l0 = loss(m0, v0["params"], v0["batch_stats"])
    l1 = loss(m1, v1["params"], v1["batch_stats"])
    assert float(jnp.abs(l0 - l1)) == 0.0

    g0 = jax.grad(lambda p: loss(m0, p, v0["batch_stats"]))(v0["params"])
    g1 = jax.grad(lambda p: loss(m1, p, v1["batch_stats"]))(v1["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_remat_trainer_config_key():
    """remat: true flows from cfg into the model graph."""
    from improving_yolov8_cbam_swinblock_tpu.cfg import get_cfg

    args = get_cfg(overrides={"remat": True})
    assert args.remat is True
