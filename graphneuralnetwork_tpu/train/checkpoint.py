"""Checkpoint save/restore (best-val policy + resume).

Replaces the reference's ``torch.save(state_dict)`` on val improvement
(GCN/train_eval.py:53-55) and ``is_current_train`` resume
(GTN/train_utils/train_eval.py:22-25) with a single pytree checkpoint
(params + opt state + step). Two backends:

  * ``msgpack`` (default) — one atomic file; fast for replicated
    single-host state.
  * ``orbax``  — orbax.checkpoint CheckpointManager; sharding-aware, so
    on a pod each host writes only its own shards (the pod-restart story
    of SURVEY.md §5). Restore auto-detects whichever backend wrote last.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


def _path(ckpt_dir: str, name: str = "checkpoint.msgpack") -> str:
    return os.path.join(ckpt_dir, name)


def _orbax_dir(ckpt_dir: str) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), "orbax")


def _orbax_manager(ckpt_dir: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        _orbax_dir(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=1,
                                             create=True))


def save_checkpoint(ckpt_dir: str, state: Any, step: int,
                    backend: str = "msgpack") -> str:
    if backend == "orbax":
        import orbax.checkpoint as ocp

        mgr = _orbax_manager(ckpt_dir)
        payload = {"params": state.params, "opt_state": state.opt_state}
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()
        mgr.close()
        return _orbax_dir(ckpt_dir)
    # msgpack: only the primary process writes (all hosts hold replicated
    # params, so one copy suffices and concurrent writers would race).
    if jax.process_index() != 0:
        return _path(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "step": step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    data = serialization.to_bytes(payload)
    p = _path(ckpt_dir)
    tmp = p + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, p)  # atomic — a crash never leaves a torn checkpoint
    return p


def restore_checkpoint(ckpt_dir: str, state: Any) -> tuple[Any, int]:
    """Restore params/opt_state into ``state``; returns (state, step).
    Auto-detects the backend (orbax dir vs msgpack file). Raises
    FileNotFoundError when absent — mirroring test()'s refusal to run
    without a checkpoint (GCN/train_eval.py:72-75)."""
    if os.path.isdir(_orbax_dir(ckpt_dir)):
        import orbax.checkpoint as ocp

        mgr = _orbax_manager(ckpt_dir)
        step = mgr.latest_step()
        if step is not None:
            template = {"params": state.params,
                        "opt_state": state.opt_state}
            payload = mgr.restore(
                step, args=ocp.args.StandardRestore(template))
            mgr.close()
            return state.replace(params=payload["params"],
                                 opt_state=payload["opt_state"]), int(step)
        mgr.close()
    p = _path(ckpt_dir)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no checkpoint at {p}")
    with open(p, "rb") as f:
        data = f.read()
    template = {"step": 0, "params": state.params,
                "opt_state": state.opt_state}
    payload = serialization.from_bytes(template, data)
    state = state.replace(params=payload["params"],
                          opt_state=payload["opt_state"])
    return state, int(payload["step"])


def latest_step(ckpt_dir: str) -> Optional[int]:
    p = _path(ckpt_dir)
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        data = f.read()
    payload = serialization.msgpack_restore(data)
    return int(payload["step"])
