"""Device mesh construction.

The reference is strictly single-process single-GPU (SURVEY.md §2.3); here
the mesh/runtime layer is first-class: data parallelism ("data") for the
PIE-Bench sweep and CFG/prompt batching, tensor parallelism ("tensor") for
sharding UNet attention/MLP weights when per-chip HBM is tight (SDXL 1024²).
Collectives ride ICI via XLA GSPMD; DCN only ever carries the data axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
