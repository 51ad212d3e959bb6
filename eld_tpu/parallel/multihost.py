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
    ``cfg.multihost`` is set (silent batch duplication otherwise).
    Checkpoint saves are COLLECTIVE (every process must enter save();
    orbax gates the actual write to the primary host — an is_host0()
    gate around save would deadlock the pod), eval stride-shards the
    items across hosts and merges metrics via allgather, and only
    TensorBoard/log writes are host-0-gated.

Training then runs the exact same jitted program as single-host: the
mesh spans all global devices and XLA's collectives ride ICI/DCN.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         strict: bool = False) -> tuple:
    """Initialize jax.distributed and return host_shard().

    Call this before anything else touches the XLA backend.  Outcomes:
      * cluster found (auto-detected or explicit args) -> initialized;
      * no cluster environment (ValueError from jax) AND neither explicit
        args nor ``strict`` -> clean single-process fallback;
      * explicit args or ``strict`` (the user asked for multihost by
        name) but no cluster found -> re-raised: a typo'd coordinator
        address or failed auto-detection must NOT silently degrade into
        N uncoordinated single-process runs training on duplicate data;
      * called too late / twice (RuntimeError from jax): if the runtime
        is ALREADY multi-process the pod is coordinated — fall through
        quietly; otherwise re-raise when ``strict`` or args were
        explicit, LOUD warning when not.
    """
    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError as e:
        # "coordinator_address should be defined": no cluster environment
        # to detect.  Only a clean single-process fallback when multihost
        # wasn't requested by name and no cluster was named; otherwise
        # this is a config/environment error the user must see.
        if explicit:
            raise
        if strict:
            raise ValueError(
                f"multihost was explicitly requested but no cluster "
                f"environment could be detected: {e}. Pass "
                "coordinator_address/num_processes/process_id (or set the "
                "cluster environment) — continuing would train N "
                "uncoordinated copies on duplicate data.") from e
    except RuntimeError as e:
        # typically "initialize() called after backend init" or "already
        # initialized"
        if jax.process_count() > 1:
            # the distributed runtime is already up: the pod IS
            # coordinated; a late duplicate initialize() call is harmless
            pass
        elif strict or explicit:
            raise RuntimeError(
                f"multihost was explicitly requested but "
                f"jax.distributed.initialize() failed: {e}. Call "
                "initialize_multihost() before any other JAX API use "
                "(device queries, array creation) initializes the XLA "
                "backend.") from e
        else:
            warnings.warn(
                f"jax.distributed.initialize() failed: {e} — continuing "
                "single-process. On a real cluster this means hosts are "
                "NOT coordinated; call initialize_multihost() before any "
                "other JAX API use.")
    return host_shard()


def maybe_initialize_multihost(cfg) -> tuple:
    """CLI bootstrap: initialize when ``cfg.multihost``, then verify the
    process topology is coherent with the flag (Engine re-checks too).
    ``strict=True``: the user asked for multihost by name, so a too-late
    initialization is an error, not a warning (an early JAX call added to
    a CLI would otherwise silently un-coordinate a real pod)."""
    shard = initialize_multihost(strict=True) if cfg.multihost else (0, 1)
    if jax.process_count() > 1 and not cfg.multihost:
        raise RuntimeError(
            f"{jax.process_count()} JAX processes are present but "
            "--multihost was not given; every host would load duplicate "
            "batches. Re-run with --multihost.")
    return shard


# Length-prefix sentinel marking an over-long payload.  The owning host
# ENTERS the collective with this marker instead of raising beforehand —
# a host-local raise would leave every other process blocked in the
# collective forever (a config-sized error becoming a whole-pod hang);
# with the marker, every host decodes it and raises the same error.
_OVERSIZE = (1 << 64) - 1


def _encode(obj, max_bytes):
    import json

    import numpy as onp

    buf = onp.zeros(max_bytes, onp.uint8)
    raw = json.dumps(obj).encode()
    n = _OVERSIZE if len(raw) + 8 > max_bytes else len(raw)
    buf[:8] = onp.frombuffer(n.to_bytes(8, "little"), onp.uint8)
    if n != _OVERSIZE:
        buf[8:8 + len(raw)] = onp.frombuffer(raw, onp.uint8)
    return buf


def _decode(out, max_bytes):
    import json

    n = int.from_bytes(out[:8].tobytes(), "little")
    if n == _OVERSIZE:
        raise ValueError(
            f"multihost payload exceeded max_bytes={max_bytes}; raised "
            "collectively on every process")
    return json.loads(out[8:8 + n].tobytes().decode())


def broadcast_from_host0(obj, max_bytes: int = 1 << 16):
    """Broadcast a small JSON-serializable object from process 0 to all
    processes (single-process: identity).  Used to fan out host-0-only
    results so every host returns identical values and agrees on
    collective decisions like the best-checkpoint save.  Oversize
    payloads raise on EVERY process (see _OVERSIZE)."""
    if jax.process_count() == 1:
        return obj
    import numpy as onp
    from jax.experimental import multihost_utils

    buf = (_encode(obj, max_bytes) if jax.process_index() == 0
           else onp.zeros(max_bytes, onp.uint8))
    out = onp.asarray(multihost_utils.broadcast_one_to_all(buf))
    return _decode(out, max_bytes)


def allgather_objects(obj, max_bytes: int = 1 << 16) -> list:
    """All-gather one small JSON-serializable object per process; every
    process returns the same ``[obj_from_p0, obj_from_p1, ...]`` list.
    Powers pod-sharded eval: each host evaluates its stride of the items,
    then merges everyone's metric sums deterministically (same order on
    every host => bitwise-identical means => the collective
    best-checkpoint decision agrees).  Oversize payloads raise on EVERY
    process (see _OVERSIZE)."""
    if jax.process_count() == 1:
        return [obj]
    import numpy as onp
    from jax.experimental import multihost_utils

    out = onp.asarray(multihost_utils.process_allgather(
        _encode(obj, max_bytes)))
    return [_decode(out[p], max_bytes) for p in range(out.shape[0])]


def all_hosts_agree(flag: bool) -> bool:
    """True iff EVERY process passes True (single-process: identity).

    Use for decisions that gate collective code paths — e.g. whether the
    periodic train-time eval runs: if one host's eval data is missing and
    it silently skipped eval while the others entered the merge
    collective, the pod would hang.  Deciding collectively keeps control
    flow identical on every host."""
    return all(bool(f) for f in allgather_objects(bool(flag)))


def host_shard() -> tuple:
    """(rank, world) for ``data.Loader(shard=...)``."""
    return (jax.process_index(), jax.process_count())


def is_host0() -> bool:
    return jax.process_index() == 0
