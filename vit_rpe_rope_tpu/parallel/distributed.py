"""Multi-host bootstrap and per-host data staging (SURVEY.md §5.8).

The communication backend is XLA's collectives over ICI/DCN — there is no
hand-written transport. Multi-host runs need exactly two extra pieces:

  1. `initialize()` — jax.distributed.initialize() so all hosts join one
     runtime (coordinator address/process counts from standard env vars or
     arguments). A no-op for single-process runs.
  2. `stage_per_host(...)` — each host holds only ITS shard of the dataset
     and contributes it to a global device array via
     jax.make_array_from_process_local_data; the training step's index
     sharding then keeps every gather host-local.

Single-host behavior is identical to a plain device_put, which is what the
tests verify (real multi-host requires hardware this environment lacks).
"""

from __future__ import annotations

import os

import jax

from vit_rpe_rope_tpu.parallel.mesh import NamedSharding


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join the multi-host JAX runtime. Returns True if a distributed init
    actually happened, False for single-process (the common local case).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or the TPU metadata auto-detection
    built into jax.distributed.initialize.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_n) if env_n else None)
    env_id = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_id) if env_id else None)
    if coordinator_address is None and num_processes in (None, 1):
        return False  # single process: nothing to join
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def stage_per_host(local_data, mesh, spec):
    """Build a global device array from THIS host's shard of the data.

    `local_data` is the slice of the global array this process owns along the
    dimensions named in `spec`; with one process it is simply the whole array
    (and this reduces to device_put).
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_data, sharding)
    return jax.make_array_from_process_local_data(sharding, local_data)
