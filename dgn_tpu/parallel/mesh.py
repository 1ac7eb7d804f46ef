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


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> tuple[int, int]:
    """Join the multi-host JAX runtime (SURVEY.md §2b: the multi-host
    orchestration primitive) — MUST run before any other JAX call so every
    host sees the pod's global device set.

    On TPU pods all three arguments auto-detect from the TPU metadata
    (jax.distributed.initialize() with no args); on other platforms pass the
    coordinator 'host:port', the world size, and this host's rank.  Returns
    (process_index, process_count).  run.py exposes this as --multihost.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


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
