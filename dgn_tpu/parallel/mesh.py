"""Device mesh construction for DP / graph-partitioned training.

The reference is single-process, single-GPU (SURVEY.md §2b: no distributed
code exists).  Scale-out here is JAX-native: a Mesh over the slice's devices;
data parallelism shards the stacked batch axis ('dp'), graph partitioning
shards the edge axis within a batch ('ep', parallel/halo.py).  On multi-host
pods call jax.distributed.initialize() before building the mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
