"""Device mesh + sharding helpers.

The workload is a stream of independent frames/windows, so the natural
multi-chip layout is pure batch-dim data parallelism over ICI: parameters
replicated, batches split on axis "data" (SURVEY.md §2.7). The mesh is a
config parameter — the same code runs single-chip, on an 8-chip slice, or on
the CPU test mesh forced via ``xla_force_host_platform_device_count``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_jit(fn, mesh: Mesh, axis: str = "data"):
    """jit ``fn(params, batch)`` with params replicated and batch split on ICI.

    Uses ``shard_map`` rather than sharding annotations: the encoder contains
    a Pallas custom call, which GSPMD cannot auto-partition — with shard_map
    each chip runs the complete program on its batch shard (the correct
    layout for pure data parallelism) and no collectives are needed. Batch
    sizes must divide the mesh size — callers pad.
    """
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
