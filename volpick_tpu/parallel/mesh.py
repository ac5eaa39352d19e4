"""Device-mesh / sharding helpers (the framework's distributed surface).

The picking models are small (~0.3M params), so the production parallelism is
pure data/window parallel: parameters replicated, the batch (training
samples or classify windows) sharded over all chips, gradients all-reduced
over ICI by XLA (`psum` inserted by jit). These helpers centralize mesh
construction, host-local batch sharding, and multi-host initialization
(jax.distributed over DCN) — the reference's latent DDP/NCCL role
(SURVEY §2.2) realized the JAX way.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host setup (one python process per host, chips over ICI, hosts
    over DCN). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D data mesh by default; pass shape/axis_names for e.g. ('data',
    'model') layouts."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a pytree batch with its leading axis sharded over `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.device_put(batch, sh)
