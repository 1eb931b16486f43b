"""Conv+BN folding (utils/fuse.py) — numeric parity + graph proof.

Reference contract: BaseModel.fuse / fuse_conv_and_bn
(reference nn/tasks.py:210-251, utils/torch_utils.py:467-490) must leave
inference outputs unchanged while removing BatchNorm from the graph.
"""

import jax
import jax.numpy as jnp
import numpy as np

from improving_yolov8_cbam_swinblock_tpu.nn.modules import Conv
from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel
from improving_yolov8_cbam_swinblock_tpu.utils.fuse import fuse_variables


def _perturb(v):
    """Non-trivial params + BN stats so folding is exercised for real."""
    return jax.tree.map(lambda p: p + 0.07, v)


def test_fuse_single_conv_parity_and_bn_elision():
    m = Conv(c2=8, k=3)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 4), jnp.float32)
    v = _perturb(m.init(jax.random.PRNGKey(0), x))
    out = m.apply(v, x, train=False)
    vf = fuse_variables(v)
    assert "fused" in vf and "bias" in vf["fused"]
    outf = m.apply(vf, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(outf), atol=1e-4)
    # proof the BN op is dead: poisoning the running stats changes nothing
    poisoned = dict(vf, batch_stats=jax.tree.map(lambda s: s * 0 + 99.0, vf["batch_stats"]))
    outp = m.apply(poisoned, x, train=False)
    assert float(jnp.abs(outf - outp).max()) == 0.0


def test_fuse_whole_model_parity():
    m = DetectionModel("yolov8n.yaml")
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    # populate running stats with real batch statistics so folding is non-trivial
    _, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
    v = dict(v, batch_stats=upd["batch_stats"])
    out = m.apply(v, x, train=False)[0]
    outf = m.apply(fuse_variables(v), x, train=False)[0]
    scale = float(jnp.abs(out).max())
    assert float(jnp.abs(out - outf).max()) < 1e-3 * max(scale, 1.0)


def test_fuse_train_path_unaffected():
    """Folded biases must be ignored when train=True (BN still learns)."""
    m = Conv(c2=4, k=1)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    vf = fuse_variables(v)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    # train=True with the original (unfolded) kernel is the correct branch;
    # the fused tree's rewritten kernel is inference-only by contract.
    outf, _ = m.apply(dict(v, fused=vf["fused"]), x, train=True, mutable=["batch_stats"])
    assert float(jnp.abs(out - outf).max()) == 0.0


def test_facade_fuse_save_load_roundtrip(tmp_path):
    """YOLO.fuse() + save() must carry the fused-bias collection so a
    reloaded checkpoint doesn't re-apply BN on folded kernels."""
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    m._ensure_variables(64)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    _, upd = m.model.apply(m.variables, x, train=True, mutable=["batch_stats"])
    m.variables = dict(m.variables, batch_stats=upd["batch_stats"])
    ref = m.model.apply(m.variables, x, train=False)[0]
    m.fuse()
    assert m.is_fused
    p = str(tmp_path / "m.ckpt")
    m.save(p)
    m2 = YOLO(p)
    assert m2.is_fused
    out = m2.model.apply(m2.variables, x, train=False)[0]
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(ref - out).max()) < 1e-3 * max(scale, 1.0)
