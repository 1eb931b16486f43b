"""Test config: force an 8-virtual-device CPU mesh before JAX loads.

Mirrors the reference's tiny-e2e philosophy (reference tests/conftest.py)
but adds what it lacks: multi-device coverage without hardware via
xla_force_host_platform_device_count (SURVEY.md §4 implication).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU platform regardless of the
# env var; the config update below is the authoritative override.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _seed():
    np.random.seed(0)


@pytest.fixture(scope="session")
def tiny_dataset(tmp_path_factory):
    """Synthetic YOLO-format detection dataset: colored rectangles on noise.

    Stands in for coco8 (no network egress in this environment); exercises
    the same label format, loader, and augmentation paths.
    """
    from tests.synth_data import make_synth_dataset

    root = tmp_path_factory.mktemp("synthdet")
    return make_synth_dataset(root, n_train=16, n_val=8, imgsz=160, nc=3, seed=0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow_ok: test is expected to take minutes (model family builds)")
