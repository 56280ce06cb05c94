"""Device mesh construction.

The reference is strictly single-process single-GPU (SURVEY.md §2.3); here
the mesh/runtime layer is first-class: data parallelism ("data") for the
PIE-Bench sweep and CFG/prompt batching, tensor parallelism ("tensor") for
sharding UNet attention/MLP weights when per-chip HBM is tight (SDXL 1024²).
Collectives ride ICI via XLA GSPMD; DCN only ever carries the data axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bootstrap (SURVEY.md §2.3 mesh/runtime row).

    On single-host TPU slices this is a no-op; across hosts it wires
    ``jax.distributed.initialize`` so ``jax.devices()`` spans the slice and
    GSPMD collectives ride ICI. Returns the process index.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def make_mesh(
    data: Optional[int] = None,
    tensor: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over ('data', 'tensor'). Defaults to all devices on data."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devs) // tensor
    assert data * tensor == len(devs), (data, tensor, len(devs))
    arr = np.array(devs).reshape(data, tensor)
    return Mesh(arr, axis_names=("data", "tensor"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
