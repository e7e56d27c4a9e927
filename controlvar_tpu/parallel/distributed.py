"""Multi-host initialization + helpers.

Replaces the reference's process-group plumbing (reference: dist.py:19-49,
mp.spawn + MASTER_ADDR at train_control_var_hpu.py:411-418,692-701). In the
SPMD model there is one process per HOST (not per chip): call
`initialize()` once, build a global mesh over jax.devices(), and shard the
per-host data stream by `process_index()`.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op for single-host runs.

    Arguments default from the standard env vars (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID) or TPU metadata when on Cloud TPU.
    """
    coord = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else (
        int(os.environ["NUM_PROCESSES"]) if "NUM_PROCESSES" in os.environ else None
    )
    # `is not None`, NOT truthiness: process_id=0 (the coordinator itself)
    # is falsy and used to fall through to the env var / None
    pid = process_id if process_id is not None else (
        int(os.environ["PROCESS_ID"]) if "PROCESS_ID" in os.environ else None
    )
    if coord is None and nproc is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )


def form_global_batch(sharding, batch: dict) -> dict:
    """Assemble each host's LOCAL batch rows into one globally-sharded array
    per key. On a pod every process feeds its disjoint loader shard here and
    the result is a global array of shape (per_host_batch * process_count,
    ...) laid out per `sharding`; single-host it degrades to a plain
    device_put. This is the SPMD replacement for the reference's
    DistributedSampler + per-rank DataLoader (reference:
    train_control_var_hpu.py:569-574)."""
    if jax.process_count() == 1:
        # per-leaf sharding tree: batch values may themselves be pytrees
        # (per-scale token-id lists from data/shards.TokenShardLoader)
        return jax.device_put(
            batch, jax.tree_util.tree_map(lambda _: sharding, batch)
        )
    return jax.tree_util.tree_map(
        lambda v: jax.make_array_from_process_local_data(sharding, v), batch
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()
