"""Device mesh construction and canonical shardings.

The reference has no distributed backend at all (single CUDA device,
``models/ELD_model.py:187-190``).  Here parallelism is declarative and on
by default: a ``jax.sharding.Mesh`` with two named axes —

  * ``data``    — batch data-parallelism for training (gradient all-reduce
                  emitted by XLA over ICI from the shardings alone);
  * ``spatial`` — spatial model-parallelism for full-frame eval (H-dim
                  sharding with halo exchange, the TPU analog of the
                  reference's 4-tile ``forward_chop``).

The mesh abstraction deliberately exposes both axes even when sized 1 so
the same jitted programs run from 1 chip to a full slice unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as onp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape; -1 on the data axis means 'all remaining'."""

    data: int = -1
    spatial: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        spatial = max(1, self.spatial)
        data = self.data if self.data > 0 else max(1, n_devices // spatial)
        return MeshSpec(data=data, spatial=spatial)


def make_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = spec.resolve(len(devices))
    n = spec.data * spec.spatial
    if n > len(devices):
        raise ValueError(f"mesh {spec} needs {n} devices, have {len(devices)}")
    grid = onp.array(devices[:n]).reshape(spec.data, spec.spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over `data`; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(N, H, W, C) with batch over `data` and H over `spatial`."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host pytree of (N, ...) arrays with batch sharded on data.

    Single-process: a plain sharded device_put.  Multi-process (TPU pod):
    each process holds only ITS rows of the global batch (the Loader's
    ``shard=(rank, world)`` slicing), so the global array is assembled
    with ``jax.make_array_from_process_local_data``.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, onp.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
