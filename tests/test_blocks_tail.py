"""Registry tail blocks: DWConvTranspose2d (grouped transposed conv via
lhs-dilated conv lowering) and AGLU activation — torch-parity checked
(reference conv.py:212-227, activation.py:8-53)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


@pytest.mark.parametrize("c1,c2,k,s,p1,p2", [(8, 8, 2, 2, 0, 0), (6, 4, 3, 2, 1, 1), (4, 8, 4, 2, 1, 0)])
def test_dwconvtranspose2d_torch_parity(c1, c2, k, s, p1, p2):
    from improving_yolov8_cbam_swinblock_tpu.nn.modules_extra import DWConvTranspose2d

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 7, c1)).astype(np.float32)
    m = DWConvTranspose2d(c2=c2, k=k, s=s, p1=p1, p2=p2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    g = math.gcd(c1, c2)
    tm = torch.nn.ConvTranspose2d(c1, c2, k, s, p1, p2, groups=g)
    w = np.asarray(v["params"]["kernel"])  # flax HWIO (k,k,c1/g,c2)
    wt = w.reshape(k, k, c1 // g, g, c2 // g).transpose(3, 2, 4, 0, 1).reshape(c1, c2 // g, k, k)
    tm.weight.data = torch.from_numpy(wt.copy())
    tm.bias.data = torch.from_numpy(np.asarray(v["params"]["bias"]).copy())
    yt = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    yj = np.asarray(m.apply(v, jnp.asarray(x)))
    # torch output size contract: (in-1)*s - 2*p1 + k + p2
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, atol=2e-6)


def test_aglu_formula():
    from improving_yolov8_cbam_swinblock_tpu.nn.modules_extra import AGLU

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 3)).astype(np.float32)
    a = AGLU()
    v = a.init(jax.random.PRNGKey(1), jnp.asarray(x))
    lam = np.clip(np.asarray(v["params"]["lambd"]), 1e-4, None)
    kap = np.asarray(v["params"]["kappa"])
    act = torch.nn.Softplus(beta=-1.0)
    ref = torch.exp(
        (1 / torch.tensor(lam)) * act(torch.tensor(kap) * torch.from_numpy(x) - torch.log(torch.tensor(lam)))
    ).numpy()
    out = np.asarray(a.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_blocks_in_yaml_graph(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

    yaml_text = """
nc: 2
backbone:
  - [-1, 1, Conv, [16, 3, 2]]
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, AGLU, []]
  - [-1, 1, DWConvTranspose2d, [32, 2, 2]]
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
head:
  - [[4, 5, 6], 1, Detect, [nc]]
"""
    p = tmp_path / "tail.yaml"
    p.write_text(yaml_text)
    m = DetectionModel(str(p))
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    out = m.apply(v, jnp.ones((1, 64, 64, 3)), train=False)[0]
    assert out.shape[1] == 4 + m.nc


def test_c2fpsa_param_parity():
    """C2fPSA matches the reference block exactly in parameter count
    (reference block.py:1510 C2fPSA(c1==c2, n, e=0.5): C2f chunk-2 +
    n PSABlocks, heads = c//64)."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu.nn.modules import C2fPSA

    m = C2fPSA(128, n=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 128)), False)
    n = sum(int(np.prod(q.shape)) for q in jax.tree_util.tree_leaves(v["params"]))
    assert n == 109_952  # torch: sum(p.numel() for p in C2fPSA(128,128,n=2).parameters())
    y = m.apply(v, jnp.zeros((2, 8, 8, 128)), False)
    assert y.shape == (2, 8, 8, 128)
