"""Device mesh + sharding rules.

The reference's only parallelism is subprocess-DDP over NCCL
(reference engine/trainer.py:176-232, utils/dist.py). The TPU-native
replacement (SURVEY.md §2.8): one process per host, a `Mesh` over all
devices, and GSPMD shardings on the jitted train step —

  * `data` axis: batch dimension (data parallel; XLA emits the gradient
    all-reduce over ICI automatically from the loss mean);
  * `model` axis: output-channel sharding of large conv kernels +
    matching bias/BN shardings (tensor parallel for the wide P5-stage
    convs; XLA inserts the activation all-gathers).

Single-chip training is the degenerate (1, 1) mesh — same code path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} exceeds {n} devices"
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def param_spec(path: tuple, leaf, min_shard_channels: int = 256) -> P:
    """Tensor-parallel rule: shard wide conv/dense kernels on their output
    channel dim over 'model'; everything else replicated."""
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if name == "kernel" and leaf.ndim >= 2 and leaf.shape[-1] >= min_shard_channels:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = False) -> Any:
    """Place a param pytree: replicated, or TP-sharded when requested."""
    def place(path, leaf):
        spec = param_spec(path, leaf) if tensor_parallel else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = False) -> Any:
    """Sharding pytree (for jit in_shardings) matching shard_params."""
    def spec(path, leaf):
        return NamedSharding(mesh, param_spec(path, leaf) if tensor_parallel else P())

    return jax.tree_util.tree_map_with_path(spec, params)
