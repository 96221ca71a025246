"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY.md §1: single-GPU,
single-process everywhere); this module is the TPU-native scaling story:
JAX meshes over ICI/DCN with collectives inserted by XLA (SURVEY.md §5.8).

Axes:
  "data"  — cameras (batch) data-parallelism: params replicated, per-device
            camera shards, gradient psum. First-line scaling.
  "tile"  — pixel/tile sharding of a single render: tile grid striped across
            devices, gaussian table replicated/gathered.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int] = None, axis_names=("data",),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(axis_sizes))
    assert n <= len(devices), (axis_sizes, len(devices))
    arr = np.array(devices[:n]).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
