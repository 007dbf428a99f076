"""Device mesh + sharding helpers.

The reference is strictly single-process single-GPU (SURVEY.md §2.3: no
DP/TP/PP/EP, the only transport is host<->device nn.Copy layers). This
module is the from-scratch TPU replacement: a named ``jax.sharding.Mesh``
over the chips, data-parallel batch sharding via ``NamedSharding``, and
replicated parameters — collectives (psum/pmean) are inserted by XLA over
ICI. The mesh defaults to one ``data`` axis but is built n-dimensional so a
``model`` axis can be added later without API changes (SURVEY.md §2.3).

Multi-host: call ``initialize()`` (jax.distributed) before mesh creation;
single-host/single-chip callers can skip it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up for multi-host slices (DCN). No-op-safe for
    single-process runs when no coordinator is given."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: {n_devices} devices requested but only "
                f"{len(devices)} visible ({devices[0].platform}); for a "
                f"CPU-simulated mesh set jax_num_cpu_devices / "
                f"--xla_force_host_platform_device_count before jax init")
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def shard_batch(x, mesh: Mesh, axis: str = DATA_AXIS):
    """Places an array with its leading (batch) dim sharded over ``axis``."""
    spec = P(axis, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicates a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def fold_in_axis_index(rng: jax.Array, axis: str = DATA_AXIS) -> jax.Array:
    """Per-device RNG stream inside shard_map/pmap (SURVEY.md §2.3:
    'per-device RNG via fold_in on axis index')."""
    return jax.random.fold_in(rng, jax.lax.axis_index(axis))
