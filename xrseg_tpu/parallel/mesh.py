"""Device mesh + sharding utilities (SPMD over ICI).

The reference is single-device (SURVEY.md §2.3); its scale axes are batch and
streams, so the TPU framework shards those over a `jax.sharding.Mesh`:

  data axis  — batch / camera streams (DP): activations sharded on batch
  model axis — channel sharding of the widest stages (TP) for x-scale models

Collectives are never written by hand: `jax.jit` with NamedSharding in/out
specs lets XLA insert all-gathers/reduce-scatters on ICI where the layouts
demand them (the scaling-book recipe: pick mesh -> annotate -> let XLA
insert collectives -> profile).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("data", "model"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a 2D (data, model) mesh over available devices.

    Default: all devices on the data axis, model unsharded — the right
    layout for batch-serving YOLO-sized models (they fit one chip).
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params: Any, mesh: Mesh,
                    tp_min_channels: int = 256) -> Any:
    """Tensor-parallel sharding rules for the param pytree.

    Conv weights [k,k,I,O] with O >= tp_min_channels shard their output
    channels over the model axis; everything else replicates. With a
    (n, 1) mesh this degrades to full replication — same code path for
    single-chip and multi-chip.
    """
    if jax.process_count() > 1:
        # multi-host: params replicate across every host's devices (TP
        # weight slicing across hosts is not supported — each process
        # holds the full host-local copy; see parallel/multihost.py)
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def rule(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 4 and \
                leaf.shape[-1] >= tp_min_channels:
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def fsdp_param_shardings(tree: Any, mesh: Mesh, axis: str = "data",
                         min_size: int = 65536) -> Any:
    """FSDP / ZeRO-3-style sharding rules for a param-shaped pytree.

    Each large leaf shards ONE dimension — the largest one divisible by
    the axis size (preferring the trailing/output-channel dim on ties) —
    over the data axis; small leaves and indivisible shapes replicate.
    Applied to params AND optimizer moments, this spreads the training
    state across the mesh: XLA all-gathers each layer's weights just
    before use and reduce-scatters its gradients, entirely from the
    sharding annotations (the scaling-book FSDP recipe — no hand-written
    collectives, same step function as DP).

    min_size keeps small leaves (biases, BN-folded scales, stems)
    replicated: gathering a tiny tensor costs more in latency than its
    shard saves in HBM.
    """
    n = mesh.shape[axis]

    def rule(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or \
                np.prod(leaf.shape) < min_size or n == 1:
            return NamedSharding(mesh, P())
        # largest dim divisible by n; ties prefer the LAST (output) dim
        dims = sorted(range(leaf.ndim),
                      key=lambda d: (leaf.shape[d], d), reverse=True)
        for d in dims:
            if leaf.shape[d] % n == 0:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_params(params: Any, mesh: Mesh, tp_min_channels: int = 256) -> Any:
    """Place params on the mesh with TP rules applied."""
    if jax.process_count() > 1:
        # lift identical host-local params to a GLOBAL replicated
        # placement (device_put cannot target non-addressable devices)
        from jax.experimental import multihost_utils
        return multihost_utils.host_local_array_to_global_array(
            params, mesh, P())
    shardings = param_shardings(params, mesh, tp_min_channels)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch (leading batch axis) onto the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
