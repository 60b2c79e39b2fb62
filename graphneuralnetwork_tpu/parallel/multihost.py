"""Multi-host / multi-slice initialisation and mesh construction.

The reference ships dead ``torch.distributed`` helpers — an availability
check and a metric ``all_reduce`` (HAN/train_utils/distributed_utils.py:43-54,
176-181) — but never initialises a process group. The TPU-native replacement
is ``jax.distributed.initialize`` plus a device mesh whose *last* axis walks
devices within a host (ICI) and whose first axis walks hosts (DCN on
multi-slice), so data-parallel collectives ride ICI wherever possible.

On a single process these helpers degrade to the local device list, so the
same training script runs unchanged from one chip to a pod.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialise the multi-host JAX runtime (idempotent, single-host no-op).

    On TPU pods the arguments are auto-detected from the metadata server;
    explicit values support CPU/GPU test rigs. Replaces the reference's
    never-called ``is_dist_avail_and_initialized`` path
    (HAN/train_utils/distributed_utils.py:176-181) with a real one.
    """
    import jax

    # Idempotency: jax 0.9 raises 'distributed.initialize should only be
    # called once.' on double-init — check the client handle instead of
    # string-matching the error.
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return
    except Exception:
        pass

    # COORDINATOR_ADDRESS is not read by JAX itself — pass it explicitly.
    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    explicit = coordinator_address is not None
    # Only coordinator envs JAX actually reads trigger auto-init:
    # TPU_WORKER_HOSTNAMES & co. are set even on single-process dev rigs.
    auto_env = any(k in os.environ for k in (
        "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    if not (explicit or auto_env):
        return  # single-process run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialised (fallback path)
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise


def make_mesh(axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None):
    """Build a Mesh over all addressable-or-global devices.

    1-D default (pure data/edge parallel). For 2-D (e.g. ``("data",
    "model")``), devices are laid out host-major so the trailing axis stays
    within a host's ICI domain.
    """
    import jax
    from jax.sharding import Mesh

    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for >1 mesh axis")
    shape = tuple(shape)
    if len(shape) == 1:
        return Mesh(np.asarray(devs).reshape(shape), tuple(axis_names))
    # Multi-axis: a plain reshape of jax.devices() can straddle hosts on the
    # trailing axis. Use mesh_utils for physically-aware layout; fall back to
    # a validated host-major reshape when the device list is custom.
    if devices is None:
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_device_mesh(shape)
            return Mesh(arr, tuple(axis_names))
        except Exception:
            pass
    if shape[-1] > jax.local_device_count():
        raise ValueError(
            f"trailing mesh axis {shape[-1]} exceeds local_device_count "
            f"{jax.local_device_count()}; it would straddle hosts and break "
            "the ICI-locality contract")
    devs = sorted(devs, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(shape)
    # trailing axis must stay within one host's ICI domain
    procs = np.asarray([d.process_index for d in devs]).reshape(shape)
    if not (procs == procs[..., :1]).all():
        raise ValueError("mesh trailing axis straddles hosts")
    return Mesh(arr, tuple(axis_names))


def process_count() -> int:
    import jax
    return jax.process_count()


def is_primary() -> bool:
    """True on the host that should write checkpoints/logs."""
    import jax
    return jax.process_index() == 0
