"""Multi-host runtime plumbing — `jax.distributed` initialization and
global mesh construction (SURVEY.md §5 "Distributed communication backend").

The reference has no multi-host story at all (its only intra-proof
parallelism is winterfell's rayon `concurrent` feature, `Cargo.toml:11`;
its FL "cluster" is threads in one process, `devices/main.py:33-52`).
The TPU-native equivalent for scaling one proof past a host is:

  * `initialize()` — `jax.distributed.initialize` from env/flags, so every
    process sees the global device set (`jax.devices()`), with graceful
    single-process degradation when no coordinator is configured;
  * `global_mesh()` — an (dp, tp) `jax.sharding.Mesh` over ALL processes'
    devices, laid out so the tp (intra-proof, all-to-all-heavy) axis stays
    within a host's ICI domain and dp (independent proofs) crosses hosts
    over DCN — collectives ride the fast fabric, round orchestration rides
    the slow one;
  * `dcn_dntt_plan()` — the documented (not runnable single-host) DCN-axis
    variant of the four-step distributed NTT (`parallel/dntt.py`): the
    all-to-all transpose is the only cross-host collective, so the
    cross-host schedule is one DCN all-to-all between two local ICI
    stages.

Activation: `ZKSTARK_MULTIHOST=1` env or `--multihost` on the CLI.
Coordinator discovery uses the standard JAX env protocol
(`JAX_COORDINATOR_ADDRESS`/`JAX_NUM_PROCESSES`/`JAX_PROCESS_ID`, or the
TPU-pod auto-detection built into `jax.distributed.initialize()` when
called with no arguments).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class MultihostInfo:
    """What `initialize()` decided / discovered."""

    enabled: bool           # distributed service actually initialized
    process_id: int
    num_processes: int
    local_device_count: int
    global_device_count: int


def requested(argv_flag: bool = False) -> bool:
    """Multi-host mode was asked for (flag or env)."""
    return bool(argv_flag) or os.environ.get("ZKSTARK_MULTIHOST") == "1"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> MultihostInfo:
    """Initialize `jax.distributed` if multi-process config is available.

    Resolution order for each parameter: explicit argument ->
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env ->
    auto-detection inside `jax.distributed.initialize()` (TPU pods).

    Single-process degradation: with no coordinator configured and
    num_processes in (None, 1), no service is started and the returned
    info says `enabled=False` with the local device set — every caller
    (mesh construction, CLI) works unchanged.  Re-initialization is a
    no-op (jax raises if the service already runs; we swallow exactly
    that case).
    """
    import jax

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        # single-process path: nothing to start
        devs = jax.devices()
        return MultihostInfo(False, 0, 1, len(jax.local_devices()),
                             len(devs))

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized -> keep going
        if "already" not in str(e).lower():
            raise
    return MultihostInfo(True, jax.process_index(), jax.process_count(),
                         len(jax.local_devices()), len(jax.devices()))


def global_mesh(tp: Optional[int] = None,
                axis_names: Tuple[str, str] = ("dp", "tp")):
    """(dp, tp) mesh over the GLOBAL device set, tp contiguous per host.

    tp defaults to the local (per-process) device count, so the
    all-to-all-heavy tensor-parallel axis never crosses DCN; dp spans
    hosts.  jax device order groups a process's local devices
    contiguously, so reshaping the flat global device list to
    (dp, tp) row-major yields host-aligned tp groups.
    """
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if tp is None:
        tp = max(1, len(jax.local_devices()))
    tp = min(tp, len(devs))
    while len(devs) % tp:
        tp //= 2
    dp = len(devs) // tp
    return Mesh(np.array(devs[:dp * tp]).reshape(dp, tp), axis_names)


def dcn_dntt_plan(log2_n: int, hosts: int, chips_per_host: int) -> dict:
    """Cross-host four-step NTT schedule (documentation/planning object —
    multi-host hardware is not present in this environment, so this
    returns the comm plan rather than executing it).

    Decompose N = N1 * N2 with N1 = hosts * chips_per_host * r.  Stages:

      1. local column NTTs of size N1 within each host (ICI all-to-all
         inside `dntt.dntt` if N1 itself is chip-sharded);
      2. twiddle multiply (elementwise, no comms);
      3. ONE global all-to-all transposing the shard axis — the only
         DCN-crossing collective; payload per host =
         N * 16 bytes / hosts (each host keeps 1/hosts of what it holds);
      4. local row NTTs of size N2 (pure ICI/VPU).

    The returned dict gives per-stage byte volumes so a pod run can be
    capacity-planned before it is attempted.
    """
    n = 1 << log2_n
    d = hosts * chips_per_host
    bytes_total = n * 16                      # f128 = 16 bytes/element
    return {
        "log2_n": log2_n,
        "devices": d,
        "hosts": hosts,
        "stage1": "local column NTTs (ICI only)",
        "stage3_collective": "all-to-all over (ici, dcn) grid",
        "dcn_bytes_per_host": bytes_total * (hosts - 1) // max(hosts, 1) ** 2
        if hosts > 1 else 0,
        "ici_bytes_per_chip": bytes_total * (chips_per_host - 1)
        // max(d, 1) // max(chips_per_host, 1) if chips_per_host > 1 else 0,
        "local_bytes_per_chip": bytes_total // max(d, 1),
    }
