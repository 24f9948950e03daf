"""Multi-host (multi-process) scan glue over the JAX distributed runtime.

The reference scales out by running more share-nothing daemons against
one scheduler (SURVEY.md §5: job-level parallelism).  The TPU rebuild
additionally scales a SINGLE scan across hosts: every process calls
``initialize()``, the mesh spans all processes' devices (collectives ride
ICI within a slice and DCN across hosts), and profile shards are placed
per process with ``make_global_block``.

Smoke-tested over localhost CPU processes by
``benchmarks/scaling.py --multiprocess N`` (the harness the SURVEY §2c
comm-backend row calls for); on TPU pods the same entry points apply
with the default device set.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with DCP_* env fallbacks.

    Env: DCP_COORDINATOR (host:port), DCP_NUM_PROCS, DCP_PROC_ID.  On
    TPU pods all three may be omitted (the runtime autodetects); on CPU
    or GPU clusters they are required.
    """
    import jax

    coordinator = coordinator or os.environ.get("DCP_COORDINATOR")
    if num_processes is None and os.environ.get("DCP_NUM_PROCS"):
        num_processes = int(os.environ["DCP_NUM_PROCS"])
    if process_id is None and os.environ.get("DCP_PROC_ID"):
        process_id = int(os.environ["DCP_PROC_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_scan_mesh(profile_axis: int | None = None):
    """('seqs' x 'profiles') mesh over ALL processes' devices."""
    from deciphon_tpu.parallel.mesh import make_scan_mesh

    return make_scan_mesh(profile_axis=profile_axis)


def make_global_array(mesh, spec, host_array: np.ndarray):
    """Globally-sharded jax.Array from identical per-process host data.

    Every process passes the same full ``host_array`` (deterministic
    build or broadcast); each contributes only its addressable shards.
    """
    import jax
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        host_array.shape, sh, lambda idx: host_array[idx]
    )


def make_global_block(mesh, block):
    """ProfileBlock sharded over the global 'profiles' axis."""
    from jax.sharding import PartitionSpec as P

    from deciphon_tpu.ops import viterbi_jax as vj

    return vj.ProfileBlock(
        *(make_global_array(mesh, P("profiles"), np.asarray(a))
          for a in block)
    )
