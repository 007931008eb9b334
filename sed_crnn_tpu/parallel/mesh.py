"""Device mesh construction and multi-host initialization.

The reference is strictly single-process single-device
(`train_lightning.py:46` devices=1); parallelism here is new capability,
built the TPU way: a 1-D data-parallel `jax.sharding.Mesh` whose gradient
and BatchNorm reductions ride ICI via `psum` (SURVEY §2.3 — DP is the only
parallelism this workload needs; TP/PP/SP/EP noted out of scope there).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host deployment (mesh spans hosts over DCN; intra-slice
    collectives stay on ICI). No-op when already initialized or single-host;
    arguments default to the standard cluster-env autodetection."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def local_batch_slice(global_batch: int, mesh: Mesh, axis_name: str = DATA_AXIS) -> int:
    n = mesh.shape[axis_name]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n
