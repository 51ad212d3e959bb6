"""Multi-host (multi-process) runtime bootstrap.

The reference is strictly single-process (``models/ELD_model.py:187-190``
places everything on one CUDA device).  On TPU pods, JAX runs one process
per host; the framework's multi-host story is four small pieces:

  * ``initialize_multihost()`` — bring up the JAX distributed runtime.
    MUST run before any JAX call that initializes the XLA backend
    (device queries, array creation); the CLIs call it right after flag
    parsing.  Coordinator discovery is automatic on Cloud TPU / SLURM;
    explicit args are accepted for other clusters.  With no cluster
    environment it falls back to single-process cleanly.
  * ``host_shard()`` — the ``(rank, world)`` pair ``data.Loader`` uses so
    each host loads only its rows of every global batch (all hosts share
    the shuffle seed, so the permutations agree).
  * ``parallel.mesh.shard_batch`` — forms GLOBAL sharded arrays from each
    process's local rows via ``jax.make_array_from_process_local_data``
    when more than one process is present.
  * ``train.Engine`` — refuses to run on a multi-process runtime unless
    ``cfg.multihost`` is set (silent batch duplication otherwise), and
    gates checkpoint/TensorBoard writes and eval to process 0.

Training then runs the exact same jitted program as single-host: the
mesh spans all global devices and XLA's collectives ride ICI/DCN.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> tuple:
    """Initialize jax.distributed and return host_shard().

    Call this before anything else touches the XLA backend.  Outcomes:
      * cluster found (auto-detected or explicit args) -> initialized;
      * no cluster environment (ValueError from jax) -> clean
        single-process fallback;
      * called too late / twice (RuntimeError from jax) -> LOUD warning,
        because on a real cluster that means hosts would train
        independently on duplicate data.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError:
        # "coordinator_address should be defined": no cluster environment
        # to detect and none given — single-process is the right fallback
        pass
    except RuntimeError as e:
        warnings.warn(
            f"jax.distributed.initialize() failed: {e} — continuing with "
            f"the current topology ({jax.process_count()} process(es)). "
            "On a real cluster this means hosts are NOT coordinated; call "
            "initialize_multihost() before any other JAX API use.")
    return host_shard()


def maybe_initialize_multihost(cfg) -> tuple:
    """CLI bootstrap: initialize when ``cfg.multihost``, then verify the
    process topology is coherent with the flag (Engine re-checks too)."""
    shard = initialize_multihost() if cfg.multihost else (0, 1)
    if jax.process_count() > 1 and not cfg.multihost:
        raise RuntimeError(
            f"{jax.process_count()} JAX processes are present but "
            "--multihost was not given; every host would load duplicate "
            "batches. Re-run with --multihost.")
    return shard


def host_shard() -> tuple:
    """(rank, world) for ``data.Loader(shard=...)``."""
    return (jax.process_index(), jax.process_count())


def is_host0() -> bool:
    return jax.process_index() == 0
