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
    pipeline_parallel: int = 1,
) -> Mesh:
    """Build a (data, model[, pipe]) mesh over the first `n_devices` devices.

    Args:
        n_devices: device count (default: all available).
        model_parallel: size of the tensor-parallel axis; must divide
            n_devices. 1 = pure data parallelism.
        pipeline_parallel: size of the pipeline axis (parallel/pipeline.py);
            when > 1 the mesh gains a trailing "pipe" axis. The pipe axis is
            innermost so neighboring pipeline stages are ICI neighbors (the
            per-tick ppermute rides one hop).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available"
        )
    if n_devices % (model_parallel * pipeline_parallel) != 0:
        raise ValueError(
            f"model_parallel={model_parallel} * pipeline_parallel="
            f"{pipeline_parallel} must divide n_devices={n_devices}"
        )
    if pipeline_parallel > 1:
        axis_names = (*axis_names[:2], "pipe")
        grid = np.asarray(devices[:n_devices]).reshape(
            n_devices // (model_parallel * pipeline_parallel),
            model_parallel,
            pipeline_parallel,
        )
        return Mesh(grid, axis_names)
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
    has_slice_attr = all(
        getattr(d, "slice_index", None) is not None for d in devices
    )
    if has_slice_attr:
        num_granules = len({d.slice_index for d in devices})
        process_is_granule = False
    else:
        # No TPU slice metadata (CPU/GPU-style multi-host cluster): each
        # process is the DCN granule — its devices talk fast locally, and
        # only the data-parallel gradient reduce crosses hosts.
        num_granules = jax.process_count()
        process_is_granule = True
    if num_granules <= 1:
        return make_mesh(n, model_parallel, axis_names)
    per_granule = n // num_granules
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_granule // model_parallel, model_parallel),
        dcn_mesh_shape=(num_granules, 1),
        devices=devices,
        process_is_granule=process_is_granule,
    )
    return Mesh(grid, axis_names)
