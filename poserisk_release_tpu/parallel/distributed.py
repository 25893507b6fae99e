"""Multi-host scale-out: jax.distributed over DCN with the same data mesh.

The reference is strictly single-process (SURVEY.md section 5.8). The
TPU-native design keeps ONE abstraction for both scales: a 1-D data mesh
over all global devices. Single host: `make_mesh()` over local chips (ICI).
Multi host: call `initialize_distributed()` first on every process, then the
same `make_mesh()` spans hosts (DCN between them); per-frame work never
crosses chips, so DCN carries only parameter broadcast and psum metric
reductions.

Typical launch (one process per host):

    poserisk-worker-0$ COORD=10.0.0.1:1234 python run.py --num_hosts 4 --host_id 0
    ...
    # in run.py, before any jax op:
    initialize_distributed(coordinator, num_hosts, host_id)
"""

from __future__ import annotations

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialise the JAX distributed runtime (idempotent; no-op when single
    process and no coordinator is given). Returns a topology summary."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_batch_slice(global_batch: int) -> slice:
    """The frame range this process feeds when the frame axis spans hosts:
    contiguous equal shards in process order (pair with
    jax.make_array_from_process_local_data for the sharded array)."""
    per_process = global_batch // jax.process_count()
    start = jax.process_index() * per_process
    return slice(start, start + per_process)
