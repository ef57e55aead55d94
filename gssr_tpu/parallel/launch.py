"""Multi-host launch: bring up the JAX distributed runtime.

Parity: the reference's `MachineConfig.dist_url` / `launch()` are dead code —
`train.py:47-80` refuses world_size > 1 ("Not support!"). Here multi-host is
real and has two composable layers (SURVEY §2.3):

  1. **Tile parallelism across hosts** (the VastGaussian axis):
     `train_split.py` stripes tiles over processes. Tiles never communicate,
     so this layer needs no collectives — only a consistent rank/world-size
     assignment, which `maybe_initialize_distributed` derives from the JAX
     distributed runtime when it is up (jax.process_index/count), or from
     `--machine.num-hosts/host-rank` flags / env vars when not.
  2. **Chip parallelism within a host group** (`--machine.parallel dp|band`):
     shard_map over a Mesh. With the distributed runtime initialized,
     `jax.devices()` is the *global* device list, so a dp mesh spanning all
     hosts' chips works unchanged — each process feeds its local cameras and
     the psum rides ICI (one slice) or DCN (across slices).

Environment contract (set by the launcher, e.g. one process per TPU host):
  GSSR_COORDINATOR   address of process 0, "host:port"
  GSSR_NUM_PROCESSES total process count
  GSSR_PROCESS_ID    this process's id (defaults to TPU_WORKER_ID)
These mirror `jax.distributed.initialize`'s arguments; standard TPU pod
env (TPU_WORKER_ID etc.) is auto-detected by JAX when flags are omitted.
"""
from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(machine) -> bool:
    """Initialize `jax.distributed` when a multi-process launch is requested.

    Mutates `machine` in place: after a successful init (or when the runtime
    is already up), `num_hosts`/`host_rank` are overwritten from
    `jax.process_count()/process_index()` so tile striping and log prefixes
    agree with the actual topology. Returns True when the distributed
    runtime is active.
    """
    coord = os.environ.get("GSSR_COORDINATOR")
    nproc_env = os.environ.get("GSSR_NUM_PROCESSES")
    want = (
        coord is not None
        or nproc_env is not None
        or getattr(machine, "dist_init", False)
    )
    if not want:
        return False

    import jax

    if not _runtime_up():
        kwargs = {}
        if coord:
            kwargs["coordinator_address"] = coord
        if nproc_env:
            kwargs["num_processes"] = int(nproc_env)
        pid = os.environ.get("GSSR_PROCESS_ID")
        if pid is not None:
            kwargs["process_id"] = int(pid)
        jax.distributed.initialize(**kwargs)

    machine.num_hosts = jax.process_count()
    machine.host_rank = jax.process_index()
    if machine.host_rank == 0:
        print(f"jax.distributed up: {machine.num_hosts} processes, "
              f"{len(jax.devices())} global devices")
    return True


def _runtime_up() -> bool:
    try:
        from jax._src import distributed as _dist
        return getattr(_dist.global_state, "client", None) is not None
    except Exception:  # pragma: no cover - version drift
        return False


def shutdown_distributed() -> None:
    """Tear down the distributed runtime (idempotent)."""
    import jax

    if _runtime_up():
        jax.distributed.shutdown()
