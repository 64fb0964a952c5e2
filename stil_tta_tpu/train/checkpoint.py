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


def save_checkpoint(directory: os.PathLike, state: Any,
                    config: Optional[dict] = None,
                    name: str = "best") -> Path:
    d = Path(directory).absolute() / name
    ckptr = ocp.StandardCheckpointer()
    if d.exists():
        import shutil
        shutil.rmtree(d)
    ckptr.save(d, jax.device_get(state))
    ckptr.wait_until_finished()
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
