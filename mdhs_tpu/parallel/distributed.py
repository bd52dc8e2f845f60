"""Multi-host initialization.

TPU-native replacement for the reference's DDP bootstrap
(mibf_net/train_resnet.py:84-88: RANK/WORLD_SIZE env ->
init_process_group("nccl")). On TPU pods, `jax.distributed.initialize`
wires hosts over DCN; every host then sees the global device set and the
same Mesh code paths work unchanged — collectives ride ICI within a slice
and DCN across hosts, all emitted by XLA.

Multi-process data convention (differs from torch DistributedSampler):
every process runs the SAME deterministic input pipeline and materializes
the full global batch on its host; `parallel.mesh.global_put` then
assembles the global jax.Array from each process's addressable slice
(make_array_from_callback), so each host only feeds the shards its own
devices consume. This keeps one SPMD program with no rank-conditional
logic — the TPU-idiomatic shape of DDP. Tested by
tests/test_sharding.py::test_two_process_distributed.
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger(__name__)


def initialize_multihost() -> bool:
    """Initialize jax.distributed from standard env vars if present.

    Recognizes either JAX-style (COORDINATOR_ADDRESS, NUM_PROCESSES,
    PROCESS_ID) or torchrun-style (MASTER_ADDR/MASTER_PORT, WORLD_SIZE,
    RANK) variables, mirroring the reference's env-triggered DDP. Returns
    True if distributed mode was initialized.
    """
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if coord is None and "MASTER_ADDR" in os.environ and "WORLD_SIZE" in os.environ:
        coord = f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '1234')}"
        nproc = os.environ["WORLD_SIZE"]
        pid = os.environ.get("RANK", "0")
    if coord is None or nproc is None:
        return False
    # PROCESS_ID absent -> pass None so jax.distributed.initialize can use
    # its cluster auto-detection; int(pid or 0) would make EVERY host claim
    # process 0 and hang the coordinator barrier.
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=int(pid) if pid is not None else None,
    )
    log.info(
        "jax.distributed initialized: process %s/%s, %d global devices",
        pid, nproc, len(jax.devices()),
    )
    return True
