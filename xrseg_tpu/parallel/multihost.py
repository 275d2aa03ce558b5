"""Multi-host (DCN) execution: one pipeline over devices spanning hosts.

Single-host serving shards over ICI (parallel/batch.py). For pods/slices
larger than one host, JAX's single-controller-per-process model applies:
every process runs the SAME program over a GLOBAL mesh; each host feeds
its local shard of the global batch, XLA routes collectives over
ICI within a slice and DCN across hosts.

    # on every host (same code, different process_id):
    mh.initialize("host0:1234", num_processes=N, process_id=i)
    mesh = mh.global_mesh()
    fn, params = build_sharded_pipeline(cfg, host_params, mesh,
                                        batch=GLOBAL_B, ...)
    garr = mh.shard_host_batch(local_frames, mesh, global_batch=GLOBAL_B)
    det = fn(params, garr)               # global computation
    slates = mh.gather_to_hosts(det["slate"])   # every host: full result

Verified in-tree with 2 CPU processes x 2 virtual devices each
(tests/test_multihost.py): the 2-host DP slate matches a single-process
reference run. On real hardware the same code spans TPU hosts (JAX
auto-detects coordinator/topology on Cloud TPU; initialize() args are
then optional).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_count: Optional[int] = None) -> None:
    """jax.distributed.initialize with a CPU-testing escape hatch.

    local_device_count forces N virtual CPU devices per process (must be
    called before any jax import touches a backend — same constraint as
    tests/conftest.py). On Cloud TPU all arguments are auto-detected.
    """
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(data: Optional[int] = None, model: int = 1):
    """2D (data, model) mesh over ALL global devices (every host's)."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = len(devs)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} global devices")
    return Mesh(np.asarray(devs).reshape(data, model), ("data", "model"))


def shard_host_batch(local_batch: Any, mesh, *, global_batch: int):
    """Each host contributes its local rows of the global batch: returns
    a global jax.Array sharded P('data') whose addressable shards are
    THIS host's data. local_batch leading dim must equal
    global_batch / num_processes (even split)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sh, x, (global_batch,) + x.shape[1:])

    return jax.tree.map(place, local_batch)


def replicate_params(params: Any, mesh):
    """Every host holds the same host-local params; lift them to a
    GLOBAL fully-replicated placement on the mesh."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return multihost_utils.host_local_array_to_global_array(
        params, mesh, P())


def gather_to_hosts(x) -> np.ndarray:
    """Materialize a (possibly non-addressable) global array on EVERY
    host as numpy (tiled allgather across processes)."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
