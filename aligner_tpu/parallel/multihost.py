"""Multi-host (pod-slice) runtime.

The reference scales out with Kafka consumers on separate machines
(docker-compose.yml, config/node/*.env); a TPU pod slice instead runs one
JAX process per host, all participating in the same mesh, with ICI
collectives doing the merging and DCN used only for process bootstrap and
host-level work intake (the service queue).

Environment contract (deploy/aligner.env documents all of these):

* ``ALIGNER_COORDINATOR``    — ``host:port`` of process 0
* ``ALIGNER_PROCESS_ID``     — this process's index
* ``ALIGNER_NUM_PROCESSES``  — total process count

On Cloud TPU these are auto-detected by JAX; the env vars are for manual
or non-GCE launches (deploy/launch_pod.sh).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .mesh import make_mesh


# Env markers Cloud TPU sets on pod-slice VMs — their presence means
# jax.distributed.initialize() can auto-detect the whole cluster
_CLOUD_TPU_MARKERS = ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")


def initialize_from_env() -> None:
    """``jax.distributed.initialize`` with the ALIGNER_* env contract.

    Without ALIGNER_NUM_PROCESSES, auto-detection is attempted when the
    environment carries Cloud TPU pod markers — JAX only auto-detects
    if ``initialize()`` is actually CALLED, and skipping it on a pod
    slice would silently give every host a LOCAL mesh (collectives then
    compute per-host statistics instead of global ones).  Plain
    single-host runs (no markers) stay a no-op.
    """
    n = int(os.environ.get("ALIGNER_NUM_PROCESSES", "1"))
    if n <= 1:
        if any(os.environ.get(v) for v in _CLOUD_TPU_MARKERS):
            try:
                jax.distributed.initialize()
            except Exception as e:
                from ..observability import log

                log.warning(
                    "cloud-TPU markers present but distributed "
                    "auto-init failed (%s); continuing single-process",
                    e,
                )
        return
    jax.distributed.initialize(
        coordinator_address=os.environ["ALIGNER_COORDINATOR"],
        num_processes=n,
        process_id=int(os.environ["ALIGNER_PROCESS_ID"]),
    )


def global_mesh(axes: tuple[str, str] = ("data", "matrix")):
    """Mesh over every device of every participating process."""
    return make_mesh(len(jax.devices()), axes)


def shard_local_batch(mesh, axis: str, local_array: np.ndarray,
                      global_rows: int | None = None):
    """Build a global sharded array from per-process local data.

    Each process contributes its own slice of the problem batch (the
    host-level work feed replaces Kafka partitioning); the result is a
    jax.Array sharded over ``axis`` that sharded steps consume directly.

    Pass ``global_rows`` (the TOTAL batch size) whenever per-process
    spans can be uneven — :func:`process_span`'s ceil-div gives the
    tail process fewer (possibly zero) rows, and without the explicit
    global shape every process would infer a different global batch
    from its own local share.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    global_shape = (
        None if global_rows is None
        else (global_rows, *local_array.shape[1:])
    )
    return jax.make_array_from_process_local_data(
        sharding, local_array, global_shape=global_shape
    )


def process_span(total: int) -> tuple[int, int]:
    """This process's contiguous [lo, hi) share of a global batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = -(-total // n)
    return min(i * per, total), min((i + 1) * per, total)
