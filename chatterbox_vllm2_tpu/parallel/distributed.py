"""Multi-host runtime initialization + host-local request routing.

The reference's latent distributed backend is vLLM's NCCL/Ray stack, never
exercised (single GPU throughout, reference `README.md:40`; SURVEY.md §5.8).
The TPU-native story:

  * `initialize()` — `jax.distributed.initialize` on pod slices.  On Cloud
    TPU the coordinator/process-id/process-count are discovered from the TPU
    metadata env, so a bare call suffices; explicit env overrides
    (CHATTERBOX_COORDINATOR, CHATTERBOX_NUM_PROCESSES, CHATTERBOX_PROCESS_ID)
    cover manual launches.  Single-host runs are a no-op.
  * `global_mesh()` — a (data, model) mesh over ALL processes' devices:
    `model` (tensor parallel) is laid out within a host so its collectives
    ride ICI; `data` spans hosts over DCN — request batching crosses hosts,
    gradients/weights never do.
  * `host_batch_slice()` — which CFG-pair slots this host feeds.  The serving
    frontier stays host-local (each host runs its own HTTP server + queue);
    the jitted step is global and GSPMD keeps per-host shards resident.

The scaling harness (`scripts/scaling_harness.py`) drives this layout at
1-chip / 1-host / N-virtual-hosts and reports scaling efficiency
(BASELINE.md: >=80% on a 2-host slice).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig


def initialize() -> bool:
    """Initialize the multi-host runtime if this looks like a multi-process
    launch.  Returns True if `jax.distributed.initialize` was called."""
    coord = os.environ.get("CHATTERBOX_COORDINATOR")
    nproc = os.environ.get("CHATTERBOX_NUM_PROCESSES")
    pid = os.environ.get("CHATTERBOX_PROCESS_ID")
    if coord or nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
        return True
    # Cloud TPU pod slice: worker metadata is in the environment and
    # jax.distributed discovers everything itself.  Only auto-init when the
    # slice actually spans hosts (>1 worker listed).
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len(workers.split(",")) > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
            return True
        except Exception as e:    # single-host despite the env: degrade
            print(f"[WARNING] jax.distributed.initialize failed: {e}")
    return False


def global_mesh(model_parallel: int | None = None) -> Mesh:
    """(data, model) mesh over every device in the job.

    `model` divides the per-host device count so tensor-parallel collectives
    stay on ICI; `data` takes the rest (spanning hosts over DCN)."""
    devices = jax.devices()
    per_host = max(len(jax.local_devices()), 1)
    if model_parallel is None:
        # largest divisor of per_host that also divides the head count (16)
        for m in (8, 4, 2, 1):
            if per_host % m == 0:
                model_parallel = m
                break
    if len(devices) % model_parallel:
        raise ValueError(
            f"{len(devices)} devices not divisible by model={model_parallel}")
    data = len(devices) // model_parallel
    # order devices host-major so each mesh row's model shards are co-located
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(data, model_parallel)
    return Mesh(arr, ("data", "model"))


def host_batch_slice(mesh: Mesh, max_batch_size: int) -> tuple[int, int]:
    """[start, stop) CFG-pair slots this process feeds.

    The `data` axis is host-major, so each host owns a contiguous slot range;
    pairs never straddle hosts (stream rows = 2 * pair slots stay even)."""
    data = mesh.devices.shape[0]
    rows_here = [i for i in range(data)
                 if mesh.devices[i, 0].process_index == jax.process_index()]
    if not rows_here:
        return 0, 0
    per_row = max_batch_size // data
    return rows_here[0] * per_row, (rows_here[-1] + 1) * per_row
