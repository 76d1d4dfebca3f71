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


def shard_batch_jit_2d(fn, mesh: Mesh, param_specs, data_axis: str = "data",
                       model_axis: str = "model"):
    """jit ``fn(params, batch)`` over a 2-D (data, model) mesh: batch split on
    the data axis, ViT parameters tensor-parallel-sharded per ``param_specs``
    (a PartitionSpec pytree from tp.vit_param_pspecs), out-projection partials
    psum'd inside the forward (models/vit.py tp_psum_axis). shard_map rather
    than GSPMD annotations for the same reason as :func:`shard_batch_jit` —
    the Pallas attention custom call is opaque to the auto-partitioner; here
    each shard simply runs its own heads."""
    from jax.sharding import PartitionSpec

    from cbas_tpu.models.vit import tp_psum_axis

    specs = param_specs

    def body(params, batch):
        with tp_psum_axis(model_axis):
            return fn(params, batch)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, PartitionSpec(data_axis)),
        out_specs=PartitionSpec(data_axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def data_axis_size(mesh: Optional[Mesh]) -> int:
    """Batch-padding granularity: the size of the data axis (the full device
    count on a 1-D mesh)."""
    if mesh is None:
        return 1
    return int(mesh.shape.get("data", mesh.devices.size))


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def runtime_mesh(runtime_config=None) -> Optional[Mesh]:
    """The production mesh, from :class:`core.config.RuntimeConfig`.

    Returns ``None`` (plain single-device jit) when only one device is
    visible and no explicit shape was configured — so single-chip
    deployments never pay sharding overheads, and multi-chip slices get
    batch-dim data parallelism over ICI automatically (SURVEY.md §2.7).
    """
    devices = jax.devices()
    shape = getattr(runtime_config, "mesh_shape", None)
    axis_names = tuple(getattr(runtime_config, "mesh_axis_names", None) or ("data",))
    if shape is None:
        if len(devices) < 2:
            return None
        shape = (len(devices),)
        axis_names = ("data",)
    if len(axis_names) != len(shape):
        # Config gave a shape without (enough) axis names: default them, so
        # `mesh_shape: [4, 2]` alone means DP x TP rather than a Mesh error.
        axis_names = ("data", "model")[: len(shape)] if len(shape) <= 2 else tuple(
            f"axis{i}" for i in range(len(shape))
        )
    n = int(np.prod(shape))
    if n == 1:
        return None
    if n > len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {n} devices, have {len(devices)}"
        )
    return make_mesh(tuple(shape), axis_names, devices[:n])
