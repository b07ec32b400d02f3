"""Device-mesh construction for SPMD scale-out.

The reference is strictly single-process/single-device (SURVEY.md §2.3:
no DDP/torchrun/NCCL anywhere); this layer is greenfield TPU design.
Scaling model: batch ("data" axis) rides data parallelism; the "model" axis
carries tensor parallelism for the ViT's attention/MLP weights. GSPMD inserts
the collectives (grad psum over "data", activation all-reduces over "model")
over ICI automatically from the shardings in parallel/sharding.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the first `n_devices` devices.

    Args:
        n_devices: device count (default: all available).
        model_parallel: size of the tensor-parallel axis; must divide
            n_devices. 1 = pure data parallelism.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available"
        )
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide n_devices={n_devices}"
        )
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names)


def make_hybrid_mesh(
    model_parallel: int = 1,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Multi-slice mesh: data parallelism spans slices over DCN, tensor
    parallelism stays within a slice on ICI.

    Uses mesh_utils.create_hybrid_device_mesh so the "model" axis (which
    carries per-block all-reduces) is mapped to ICI neighbors and only the
    gradient all-reduce crosses DCN — the standard multi-slice layout. Falls
    back to `make_mesh` on a single slice/host.
    """
    import jax.experimental.mesh_utils as mesh_utils

    devices = jax.devices()
    n = len(devices)
    num_slices = max(
        len({getattr(d, "slice_index", 0) for d in devices}), 1
    )
    if num_slices <= 1:
        return make_mesh(n, model_parallel, axis_names)
    per_slice = n // num_slices
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_slice // model_parallel, model_parallel),
        dcn_mesh_shape=(num_slices, 1),
        devices=devices,
    )
    return Mesh(grid, axis_names)
