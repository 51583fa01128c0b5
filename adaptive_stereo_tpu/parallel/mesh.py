"""Device mesh construction and sharding helpers.

One mesh axis ("data") is all this workload needs (SURVEY.md §2 C17-C19):
params are replicated, the stereo stream / replay batches are sharded by
stream, and gradient reduction is a psum over ICI inserted by XLA from the
sharding annotations. Multi-host initialization goes through
jax.distributed.initialize before calling make_mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (call once per host before make_mesh).

    Thin wrapper over jax.distributed.initialize: on TPU pods the arguments
    auto-populate from the environment; on other platforms pass them
    explicitly. After this, jax.devices() spans the whole slice and a 'data'
    mesh stripes streams across every chip of every host (gradient psum rides
    ICI within hosts and DCN across, scheduled by XLA)."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def local_data_slice(global_arrays, mesh: Mesh, axis_name: str = "data"):
    """Host-side data sharding helper: the slice of the leading (stream)
    axis this PROCESS should feed (host-sharded streams: each host loads only
    its own cameras' frames)."""
    import jax

    n = jax.process_count()
    i = jax.process_index()

    def slc(x):
        per = x.shape[0] // n
        return x[i * per:(i + 1) * per]

    return jax.tree.map(slc, global_arrays)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (stream/batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
