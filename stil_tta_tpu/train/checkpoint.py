"""Orbax checkpointing of the full algorithm state.

Replaces Lightning's ModelCheckpoint + hparams snapshot
(``trainers/evaluate.py:171-174``, ``STiLModel.py:32``): the checkpoint
holds the *entire* train-state pytree — params, BN stats, EMA teacher,
optimizer moments, prototypes/queues, PRNG key, step — plus the config,
so resume restores training exactly (SURVEY.md §5 'checkpoint/resume').
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    """Singleton async checkpointer (kept alive so in-flight saves can
    finish; the handler thread overlaps serialization/IO with training —
    the orbax analog of throttled saves on slow links)."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(directory: os.PathLike, state: Any,
                    config: Optional[dict] = None,
                    name: str = "best", block: bool = True) -> Path:
    """Save the full state pytree. With ``block=False`` the write happens
    on orbax's background thread (only the device->host fetch blocks);
    call :func:`wait_for_checkpoints` before reading the checkpoint back
    or exiting."""
    d = Path(directory).absolute() / name
    host_state = jax.device_get(state)
    if block:
        ckptr = ocp.StandardCheckpointer()
        if d.exists():
            import shutil
            shutil.rmtree(d)
        ckptr.save(d, host_state)
        ckptr.wait_until_finished()
    else:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # one save in flight at a time
        ckptr.save(d, host_state, force=True)
    if config is not None:
        with open(Path(directory) / f"{name}_config.json", "w") as f:
            json.dump(config, f, indent=2, default=str)
    return d


def restore_checkpoint(directory: os.PathLike, target: Any,
                       name: str = "best") -> Any:
    d = Path(directory).absolute() / name
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(d, target=jax.device_get(target))


def load_checkpoint_config(directory: os.PathLike,
                           name: str = "best") -> dict:
    with open(Path(directory) / f"{name}_config.json") as f:
        return json.load(f)
