"""Input pipeline: epoch samplers + device-resident dataset cache.

The reference feeds the GPU from 10 persistent CPU dataloader workers
doing decode + albumentations per sample (``trainers/evaluate.py:86-88``,
``config_dvm_STiL.yaml:31``). A TPU VM host (1 core here) cannot do
that — so the pipeline is inverted:

- :class:`DeviceCache` stages the whole split's raw arrays in HBM once
  (uint8 images are small: 70k DVM images @128^2 ~= 3.4 GB). Batches are
  then pure device-side gathers by index *inside* the jitted train step;
  the host only streams int32 index vectors.
- :class:`EpochSampler` reproduces the loaders' epoch semantics:
  shuffling, drop-last, and the dual labeled/unlabeled stream where the
  labeled loader cycles while the unlabeled loader defines the epoch
  (PL's combined-loader behavior, SURVEY.md §3.1 and
  ``evaluate.py:83-88``: l_batch = batch_size // (1 + unlabelled_ratio)).
- :class:`HostStream` is the fallback for splits too large for HBM:
  batches are sliced from host memmaps and double-buffered onto the
  device with an async background thread.
"""

from __future__ import annotations

import threading
import time
import queue as queue_mod
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.data.source import ArraySource


class EpochSampler:
    """Shuffled epoch index batches (np.int32), padded or dropped."""

    def __init__(self, n: int, batch_size: int, shuffle: bool = True,
                 drop_last: bool = False, seed: int = 0):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)

    def steps_per_epoch(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch(self) -> Iterator[tuple]:
        """Yields (idx (B,), weight (B,)) — weight 0 marks padding."""
        order = (self.rng.permutation(self.n) if self.shuffle
                 else np.arange(self.n))
        bs = self.batch_size
        limit = (self.n // bs) * bs if self.drop_last else self.n
        for start in range(0, limit, bs):
            chunk = order[start:start + bs]
            w = np.ones(len(chunk), np.float32)
            if len(chunk) < bs:  # pad to static shape
                pad = bs - len(chunk)
                chunk = np.concatenate([chunk, chunk[:1].repeat(pad)])
                w = np.concatenate([w, np.zeros(pad, np.float32)])
            yield chunk.astype(np.int32), w


class CyclingSampler:
    """Infinite shuffled stream for the labeled loader, which is much
    shorter than the unlabeled epoch and cycles (SURVEY.md §6 hard part
    'dual-loader cycling')."""

    def __init__(self, n: int, batch_size: int, seed: int = 0):
        self.sampler = EpochSampler(n, batch_size, shuffle=True,
                                    drop_last=False, seed=seed)
        self._it = self.sampler.epoch()

    def next(self) -> tuple:
        try:
            return next(self._it)
        except StopIteration:
            self._it = self.sampler.epoch()
            return next(self._it)


class CyclingEpochView:
    """Adapt a cycling labeled sampler to the ``.epoch()`` protocol with
    a fixed step count (the unlabeled epoch length) — the host-stream
    analog of the driver's dual-loader cycling."""

    def __init__(self, cycling, steps: int):
        self.cycling = cycling
        self.steps = steps

    def epoch(self) -> Iterator[tuple]:
        for _ in range(self.steps):
            yield self.cycling.next()


class WeightedSampler:
    """Class-weighted sampling with replacement — the reference's
    ``WeightedRandomSampler`` path (``trainers/evaluate.py:108-112``:
    per-sample weight = class weight of its label)."""

    def __init__(self, labels: np.ndarray, class_weights, batch_size: int,
                 seed: int = 0):
        w = np.asarray([class_weights[int(l)] for l in labels],
                       np.float64)
        self.p = w / w.sum()
        self.n = len(labels)
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)

    def next(self) -> tuple:
        idx = self.rng.choice(self.n, size=self.batch_size,
                              replace=True, p=self.p)
        return idx.astype(np.int32), np.ones(self.batch_size, np.float32)


class DeviceCache:
    """Split staged in HBM; index-gather happens inside jit."""

    def __init__(self, source: ArraySource, sharding=None):
        put = (lambda x: jax.device_put(x, sharding)) if sharding \
            else jax.device_put
        self.images = put(np.asarray(source.images))
        self.tabular = put(np.asarray(source.tabular, np.float32))
        self.labels = put(np.asarray(source.labels, np.int32))
        self.labelled = put(np.asarray(source.labelled))
        self.missing = put(np.asarray(source.missing)) \
            if source.missing is not None else None
        self.n = len(source)

    def as_dict(self):
        d = {"images": self.images, "tabular": self.tabular,
             "labels": self.labels, "labelled": self.labelled}
        if self.missing is not None:
            d["missing"] = self.missing
        return d


def marginal_table(cache: dict) -> jax.Array:
    """Full-dataset tabular table used as the corruption marginal
    (``TabularDataset.py:63-78`` samples replacement values from the
    whole column). DeviceCache exposes it as ``tabular``; HostStream's
    per-batch virtual caches carry it under ``marginal``."""
    return cache.get("marginal", cache["tabular"])


def gather_batch(cache: dict, idx: jax.Array) -> dict:
    """Device-side batch assembly (call inside jit)."""
    out = {
        "images": jnp.take(cache["images"], idx, axis=0),
        "tabular": jnp.take(cache["tabular"], idx, axis=0),
        "labels": jnp.take(cache["labels"], idx, axis=0),
        "labelled": jnp.take(cache["labelled"], idx, axis=0),
    }
    if "missing" in cache:
        out["missing"] = jnp.take(cache["missing"], idx, axis=0)
    return out


# the train-step virtual-cache schema every host-stream consumer must
# request (evaluate.py / bench.py filter their batches to this set):
# "index" in particular must never be dropped — without it
# dataset_indices() silently falls back to the raw gather index and
# index-addressed state (SimMatch's bank) aliases batch slots again
VIRTUAL_CACHE_KEYS = ("images", "tabular", "labels", "labelled",
                      "missing", "index")


def dataset_indices(cache: dict, idx: jax.Array) -> jax.Array:
    """True dataset indices of the rows ``gather_batch(cache, idx)``
    returns. For a :class:`DeviceCache` the gather index IS the dataset
    index; a :class:`HostStream` virtual cache is already batch-shaped
    (``idx`` is ``arange(B)``) and carries the sampled dataset indices
    under ``"index"``. Algorithms with index-addressed state (SimMatch's
    instance bank, ``simmatch_model.py:140-147``) must use this instead
    of the raw gather index."""
    if "index" in cache:
        return jnp.take(cache["index"], idx, axis=0)
    return idx


class HostStream:
    """Fallback for > HBM datasets: host gathers batch slices from
    memmaps, a worker thread keeps `depth` batches in flight on device."""

    def __init__(self, source: ArraySource, sampler: EpochSampler,
                 depth: int = 2, sharding=None):
        self.source = source
        self.sampler = sampler
        self.depth = depth
        self.sharding = sharding
        # overlap instrumentation (read by bench.py --host_stream):
        # per-item consumer wait on the prefetch queue (ms; ~0 when the
        # assembly+transfer hides under the consumer's dispatch window)
        # and queue occupancy right after each get. Reset per epoch call.
        self.waits_ms: list = []
        self.occupancy: list = []

    def _assemble(self, idx: np.ndarray, w: np.ndarray) -> dict:
        from stil_tta_tpu.data import native_loader
        batch = {
            "images": native_loader.gather_rows(self.source.images, idx),
            "tabular": self.source.tabular[idx],
            "labels": self.source.labels[idx].astype(np.int32),
            "labelled": self.source.labelled[idx],
            "index": np.ascontiguousarray(idx, np.int32),
            "weight": w,
        }
        if self.source.missing is not None:
            batch["missing"] = self.source.missing[idx]
        w = batch.pop("weight")  # padding mask: host-side only, no
        if self.sharding is not None:  # consumer reads it on device
            batch = {k: jax.device_put(v, self.sharding)
                     for k, v in batch.items()}
        else:
            batch = {k: jax.device_put(v) for k, v in batch.items()}
        batch["weight"] = w
        return batch

    def _assemble_block(self, pairs) -> dict:
        """Gather K batches as one (K*B) native gather + device_put,
        reshaped to (K, B, ...) — one transfer and one dispatch per K
        steps (the host-stream analog of ``steps_per_dispatch``)."""
        from stil_tta_tpu.data import native_loader
        idx = np.concatenate([p[0] for p in pairs])
        k, b = len(pairs), len(pairs[0][0])
        resh = lambda a: a.reshape((k, b) + a.shape[1:])
        batch = {
            "images": resh(native_loader.gather_rows(self.source.images,
                                                     idx)),
            "tabular": resh(np.ascontiguousarray(self.source.tabular[idx])),
            "labels": resh(self.source.labels[idx].astype(np.int32)),
            "labelled": resh(np.ascontiguousarray(
                self.source.labelled[idx])),
            "index": resh(np.ascontiguousarray(idx, np.int32)),
        }
        if self.source.missing is not None:
            batch["missing"] = resh(np.ascontiguousarray(
                self.source.missing[idx]))
        put = (lambda v: jax.device_put(v, self.sharding)) \
            if self.sharding is not None else jax.device_put
        batch = {k_: put(v) for k_, v in batch.items()}
        # padding mask, same schema as the single-batch path —
        # host-side numpy (no consumer reads it on device)
        batch["weight"] = np.stack([p[1] for p in pairs])
        return batch

    def _prefetched(self, produce) -> Iterator:
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.depth)
        stop = object()
        self.waits_ms = []
        self.occupancy = []

        def worker():
            for item in produce():
                q.put(item)
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            t0 = time.perf_counter()
            item = q.get()
            self.waits_ms.append((time.perf_counter() - t0) * 1e3)
            self.occupancy.append(q.qsize())
            if item is stop:
                break
            yield item
        t.join()

    def epoch(self) -> Iterator[dict]:
        return self._prefetched(
            lambda: (self._assemble(idx, w)
                     for idx, w in self.sampler.epoch()))

    def epoch_blocks(self, k: int,
                     max_steps: Optional[int] = None) -> Iterator[tuple]:
        """Yield ``("block", stacked (K,B,...) caches)`` for full groups
        of k consecutive batches and ``("single", cache)`` for the epoch
        tail, prefetched like :meth:`epoch`."""

        def produce():
            buf, count = [], 0
            for idx, w in self.sampler.epoch():
                if max_steps is not None and count >= max_steps:
                    break
                buf.append((idx, w))
                count += 1
                if len(buf) == k:
                    yield "block", self._assemble_block(buf)
                    buf = []
            for idx, w in buf:
                yield "single", self._assemble(idx, w)

        return self._prefetched(produce)
