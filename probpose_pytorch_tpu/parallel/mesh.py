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
