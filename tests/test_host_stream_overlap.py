"""Host-stream overlap is real, not analytic (VERDICT r3 #6).

The round-3 claim — "on a co-located (fast-link) host the (K,B)-block
assembly + transfer hides fully under the dispatch window" — was
analytic. This test measures it on the same code path the trainer and
bench use (``HostStream.epoch_blocks`` → prefetch thread → consumer):

1. consume an epoch with a zero-delay consumer → the per-block queue
   wait IS the serial block cost (the queue starves; this calibrates
   the denominator on this machine),
2. consume an epoch with a consumer that "dispatches" for 1.5x that
   serial cost per block (a stand-in for the device executing K steps)
   → the prefetch thread must hide assembly behind the dispatch window:
   steady-state waits collapse and the queue stays occupied.

On CPU, ``jax.device_put`` is a local copy — the fast-link case. The
tunnel-bound TPU number (docs/BENCHMARKS.md) is the slow-link case; the
bench now emits ``exposed_input_wait_ms_per_block`` +
``prefetch_occupancy_mean`` so both are falsifiable from the JSON.
"""

import time

import numpy as np

from stil_tta_tpu.data.loader import (CyclingEpochView, CyclingSampler,
                                      HostStream)
from stil_tta_tpu.data.source import synthetic_source

K = 4          # steps per dispatch block
N_BLOCKS = 8   # blocks consumed per epoch
BATCH = 32


def _stream(seed):
    src = synthetic_source(256, num_classes=4,
                           field_lengths=[5, 3, 1, 1], image_size=32,
                           labelled_frac=1.0, seed=seed)
    steps = K * N_BLOCKS
    return HostStream(src, CyclingEpochView(
        CyclingSampler(len(src), BATCH, seed=seed), steps)), steps


def _consume(stream, steps, delay_s):
    blocks = 0
    for kind, _block in stream.epoch_blocks(K, steps):
        assert kind == "block"
        blocks += 1
        if delay_s:
            time.sleep(delay_s)
    assert blocks == N_BLOCKS
    # drop the first block: its assembly can't overlap anything
    return np.asarray(stream.waits_ms[1:blocks]), \
        np.asarray(stream.occupancy[1:blocks])


def test_fast_link_transfer_hides_under_dispatch_window():
    # 1) zero-delay consumer: waits == serial block cost
    stream, steps = _stream(0)
    serial_waits, _ = _consume(stream, steps, 0.0)
    serial_ms = float(np.mean(serial_waits))
    assert serial_ms > 0.05, (
        f"serial block cost measured at {serial_ms:.3f} ms — too small "
        f"to resolve overlap; grow the block shape")

    # 2) dispatch window of 1.5x serial cost: prefetch must hide the
    # assembly — steady-state exposed wait well under the serial cost
    stream, steps = _stream(0)
    overlap_waits, occupancy = _consume(stream, steps,
                                        serial_ms * 1.5e-3)
    exposed_ms = float(np.mean(overlap_waits))
    assert exposed_ms < 0.5 * serial_ms, (
        f"exposed wait {exposed_ms:.3f} ms vs serial {serial_ms:.3f} ms "
        f"— the prefetch thread is not overlapping block assembly")
    # the queue (depth 2) stays occupied in steady state
    assert float(np.mean(occupancy)) > 0.5, (
        f"prefetch queue mostly empty: {occupancy}")


def test_instrumentation_reset_per_epoch():
    stream, steps = _stream(1)
    _consume(stream, steps, 0.0)
    first = len(stream.waits_ms)
    assert first >= N_BLOCKS
    _consume(stream, steps, 0.0)
    # second epoch resets rather than appends
    assert len(stream.waits_ms) <= first + 1
