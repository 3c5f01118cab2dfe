"""Multi-host initialization + cross-host work decomposition.

The reference's only distributed trace is a fully commented-out MPI
master/slave skeleton (source/util/cmpi.h:10-58) that scattered
RenderingParams rows and gathered pixel buffers. The TPU-native shape
(SURVEY.md §2.6): `jax.distributed` to join the hosts, ICI for pixel-tile
sharding WITHIN a slice (parallel/sharding.py), and DCN for seed/frame
batches ACROSS hosts — each host renders its slice-local batch shard and
the only cross-host traffic is the final gather (or none at all when each
host writes its own output files, the common dataset-generation case).

This module is host-count agnostic: on a single process everything is a
no-op passthrough, so the same program runs unchanged from a laptop CPU to
a multi-host pod.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np


@dataclass(frozen=True)
class HostTopology:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> HostTopology:
    """Join (or skip joining) a multi-host JAX job; returns the topology.

    With no arguments and no cluster environment this is a no-op (single
    process). On TPU pods the runtime usually injects the cluster env so
    plain ``init_distributed()`` suffices; explicit args mirror
    ``jax.distributed.initialize`` for manual clusters.
    """
    # Join only on an unambiguous multi-host signal: explicit args or a
    # coordinator address in the environment. (TPU_WORKER_HOSTNAMES alone is
    # NOT one — single-host TPU VMs set it too.) Probing jax.process_count()
    # first would itself initialize the backend, after which joining is
    # impossible, so the decision must not touch jax.
    explicit = coordinator_address is not None
    cluster_env = any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ))
    if explicit or cluster_env:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError:
            # backend already up (e.g. the runtime auto-joined, or a
            # single-process run touched jax first) — use current state
            pass
    return HostTopology(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )


def host_shard(items: Sequence, topo: Optional[HostTopology] = None) -> list:
    """The subsequence of ``items`` this host owns (contiguous blocks, DCN
    batch decomposition for dataset generation / fly-through farms).

    Every host gets ``ceil(n / hosts)`` or one fewer; unlike the
    reference's RasterThread chunking (rasterthread.cpp:11), no trailing
    remainder is ever dropped.
    """
    topo = topo or init_distributed()
    n = len(items)
    k, r = divmod(n, topo.process_count)
    i = topo.process_index
    start = i * k + min(i, r)
    stop = start + k + (1 if i < r else 0)
    return list(items[start:stop])


def global_batch_mesh(topo: Optional[HostTopology] = None):
    """A 1-D mesh over ALL global devices for batch-axis sharding: frames /
    seeds ride DCN across hosts and ICI within a slice. Use with
    engine.batch.render_batch(mesh=...)."""
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    return Mesh(devices, ("batch",))


def pixel_tile_mesh_2d(rows_axis: int = None):
    """A (rows, frame-batch) 2-D mesh: pixel rows over ICI within a slice,
    batch over DCN across slices. rows_axis defaults to the local device
    count so row collectives never cross DCN."""
    from jax.sharding import Mesh

    local = jax.local_device_count()
    rows_axis = rows_axis or local
    devices = np.asarray(jax.devices())
    if devices.size % rows_axis:
        raise ValueError(
            f"{devices.size} devices not divisible by rows axis {rows_axis}")
    grid = devices.reshape(devices.size // rows_axis, rows_axis)
    return Mesh(grid, ("batch", "rows"))
