"""Multi-host (multi-process) runtime bootstrap.

The reference is strictly single-process (``models/ELD_model.py:187-190``
places everything on one CUDA device).  On TPU pods, JAX runs one process
per host; the framework's multi-host story is three small pieces:

  * ``initialize_multihost()`` — bring up the JAX distributed runtime
    (coordinator discovery is automatic on Cloud TPU; explicit args are
    accepted for other clusters).  Safe to call when single-process.
  * ``host_shard()`` — the ``(rank, world)`` pair ``data.Loader`` uses so
    each host loads only its rows of every global batch (all hosts share
    the shuffle seed, so the permutations agree).
  * ``parallel.mesh.shard_batch`` — forms GLOBAL sharded arrays from each
    process's local rows via ``jax.make_array_from_process_local_data``
    when more than one process is present.

Training then runs the exact same jitted program as single-host: the
mesh spans all global devices and XLA's collectives ride ICI/DCN.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> tuple:
    """Initialize jax.distributed (idempotent) and return host_shard().

    With no arguments, relies on jax's automatic cluster detection (Cloud
    TPU metadata, SLURM, etc.).  A no-op when the runtime is already
    initialized or when running single-process with no cluster env.
    """
    if jax.process_count() > 1:
        return host_shard()  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or no cluster environment to detect —
        # single-process operation is the correct fallback for both
        pass
    return host_shard()


def host_shard() -> tuple:
    """(rank, world) for ``data.Loader(shard=...)``."""
    return (jax.process_index(), jax.process_count())
