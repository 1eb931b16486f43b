"""Multi-host setup helpers.

Replaces the reference's subprocess-DDP machinery (reference
utils/dist.py:28-98, trainer.py:174-232) with the standard TPU pattern:
one identical Python process per host, `jax.distributed.initialize()`
for DCN rendezvous, global Mesh over all devices, per-host input
sharding via the loader's (shard_index, num_shards), and
process-0-only gating for logging/checkpoints (the RANK==0 analog).
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX. No-ops on a single host. On TPU pods
    the arguments auto-detect from the environment."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    try:
        # TPU pod auto-detection (cloud metadata); harmless if single host
        if jax.process_count() > 1:
            return True
    except Exception:
        pass
    return False


def is_main_process() -> bool:
    """RANK-0 analog (reference trainer rank gating :292-302)."""
    return jax.process_index() == 0


def local_shard_info() -> tuple[int, int]:
    """(shard_index, num_shards) for per-host data loading — the
    DistributedSampler replacement (reference data/build.py:149-181)."""
    return jax.process_index(), jax.process_count()


def barrier(name: str = "barrier"):
    """Host barrier (torch_distributed_zero_first analog)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_scalar(value: float, root: int = 0) -> float:
    """Broadcast a host scalar from process 0 (the reference's stop-flag
    broadcast, trainer.py:464-467)."""
    from jax.experimental import multihost_utils

    import numpy as np

    arr = multihost_utils.broadcast_one_to_all(np.asarray(value, np.float32))
    return float(arr)
