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


def _is_typed_key(x: Any) -> bool:
    import jax.numpy as jnp
    try:
        return hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                      jax.dtypes.prng_key)
    except TypeError:
        return False


def _keys_to_data(tree: Any) -> Any:
    """Serialize typed PRNG keys as raw uint32 key data so checkpoints
    are PRNG-impl-agnostic (the TPU hot path uses the hardware ``rbg``
    generator — ``jax_setup.training_key`` — while CPU tests default to
    threefry; their key-data shapes differ)."""
    return jax.tree_util.tree_map(
        lambda x: jax.random.key_data(x) if _is_typed_key(x) else x, tree)


def _data_to_keys(restored: Any, target: Any) -> Any:
    """Re-wrap restored key data with each target leaf's impl; on a
    shape mismatch (checkpoint written under a different PRNG impl)
    keep the target's own fresh key — every other leaf restores
    normally, only the random stream restarts."""
    def wrap(r, t):
        if _is_typed_key(t):
            try:
                return jax.random.wrap_key_data(
                    r, impl=jax.random.key_impl(t))
            except Exception:
                return t
        return r
    return jax.tree_util.tree_map(wrap, restored, target)


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
    host_state = jax.device_get(_keys_to_data(state))
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
    target_h = jax.device_get(target)
    data_target = _keys_to_data(target_h)
    try:
        restored = ckptr.restore(d, target=data_target)
    except Exception:
        # Key-data shape mismatch: the checkpoint was written under a
        # different PRNG impl (e.g. TPU rbg -> CPU threefry restore).
        # Adapt the key-data leaves to the SAVED shapes via checkpoint
        # metadata so every other leaf restores; the stream restarts.
        # Any other failure (corrupted checkpoint, I/O error) re-raises
        # the ORIGINAL error: if no typed-key leaf actually differs in
        # shape from the saved metadata, retrying would only mask it.
        meta = ckptr.metadata(d).item_metadata.tree
        import numpy as np
        changed = []

        def _meta_at(path):
            """Index the checkpoint-metadata tree (plain nested dicts)
            by OUR tree path — the target may be a flax dataclass whose
            treedef does not match the metadata's, so a 3-tree tree_map
            would throw (dataclass-vs-dict node mismatch)."""
            node = meta
            for p in path:
                key = getattr(p, "key", None)
                if key is None:
                    key = getattr(p, "name", None)
                if key is None:
                    key = getattr(p, "idx", None)
                node = node[key]
            return node

        def _adapt(path, dt, t):
            if not _is_typed_key(t):
                return dt
            m = _meta_at(path)
            if tuple(m.shape) != tuple(dt.shape):
                changed.append(True)
                return np.zeros(m.shape, dt.dtype)
            return dt

        adapted = jax.tree_util.tree_map_with_path(_adapt, data_target,
                                                   target_h)
        if not changed:
            raise
        restored = ckptr.restore(d, target=adapted)
    return _data_to_keys(restored, target_h)


def load_checkpoint_config(directory: os.PathLike,
                           name: str = "best") -> dict:
    with open(Path(directory) / f"{name}_config.json") as f:
        return json.load(f)
