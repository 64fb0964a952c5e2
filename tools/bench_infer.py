#!/usr/bin/env python
"""Serving-throughput benchmark: the deployment forward (SURVEY.md §3.5).

Measures ``stil_tta_tpu.serve.Predictor`` end to end — host->device
transfer, jitted eval-augment + multimodal forward + softmax, and the
device->host fetch of probabilities — at the reference DVM deployment
shape (128x128 images, ResNet-50 + tabular transformer + fusion, 286
classes). The Predictor dispatches every batch asynchronously and
fetches after the loop, so transfer of batch k+1 overlaps compute of
batch k; the host-side ``np.asarray`` fetch of every output is the sync
(all results live — nothing for XLA to DCE).

The reference has no serving path at all (its ``trainers/test.py`` is a
Lightning eval loop); this is the production-deployment counterpart.

Prints one JSON line:
    {"metric": "stil_dvm_infer_samples_per_sec_per_chip", ...}

Env knobs (tiny-shape CPU smoke: tests/test_bench_smoke.py):
    STIL_INFER_BATCH (512)  STIL_INFER_IMG (128)  STIL_INFER_CLASSES (286)
    STIL_INFER_CALLS (8 batches per timed repeat)  STIL_INFER_MODEL
    STIL_INFER_DP=1 -> shard each batch over all local devices
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time


def main():
    import jax

    from stil_tta_tpu.utils import jax_setup
    jax_setup.setup()
    import jax.numpy as jnp
    import numpy as np

    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.config import load_config
    from stil_tta_tpu.data.source import synthetic_source
    from stil_tta_tpu.serve import Predictor

    batch_size = int(os.environ.get("STIL_INFER_BATCH", "512"))
    img_size = int(os.environ.get("STIL_INFER_IMG", "128"))
    num_classes = int(os.environ.get("STIL_INFER_CLASSES", "286"))
    n_calls = int(os.environ.get("STIL_INFER_CALLS", "8"))
    model = os.environ.get("STIL_INFER_MODEL", "resnet50")
    field_lengths = [20, 10, 5, 3] + [1] * 13  # 4 cat + 13 con (DVM)

    cfg = load_config("config_dvm_STiL", overrides=[
        "dataset=synthetic_dvm", f"models={model}",
        f"batch_size={batch_size}", f"num_classes={num_classes}",
        "start_epoch=0", "tta=false",
    ])
    cfg.field_lengths = field_lengths

    src = synthetic_source(batch_size * n_calls, num_classes=num_classes,
                           field_lengths=field_lengths,
                           image_size=img_size, labelled_frac=1.0, seed=0)
    images = np.asarray(src.images)
    tabular = np.asarray(src.tabular, np.float32)

    algo = get_algorithm("STiL")(cfg, field_lengths)
    state = algo.init_state(jax_setup.training_key(0),
                            jnp.zeros((2, img_size, img_size, 3)),
                            jnp.asarray(tabular[:2]))
    mesh = None
    if os.environ.get("STIL_INFER_DP"):
        from stil_tta_tpu.parallel.mesh import create_mesh
        mesh = create_mesh()
    # STIL_INFER_INT8=1: quantized image-tower convs (serve.Predictor)
    int8 = os.environ.get("STIL_INFER_INT8", "0") not in ("", "0")
    predictor = Predictor(algo, state, batch_size=batch_size, mesh=mesh,
                          int8=int8)

    # warmup: compile + first-touch transfers
    warm = predictor(images[:batch_size], tabular[:batch_size])
    assert warm.shape == (batch_size, num_classes)

    # timed: fresh host arrays every repeat (nothing cached on device),
    # best-of to shed one-off host jitter on the tunnel
    n_samples = len(images)
    best = float("inf")
    checksum = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        probs = predictor(images, tabular)
        dt = time.perf_counter() - t0
        checksum += float(probs[-1].sum())  # fetched output stays live
        best = min(best, dt)
    samples_per_sec = n_samples / best

    print(json.dumps({
        "metric": "stil_dvm_infer_samples_per_sec_per_chip"
                  + ("_int8" if int8 else ""),
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec",
        "ms_per_batch": round(best / n_calls * 1e3, 3),
        "batch_size": batch_size,
        "n_devices": 1 if mesh is None else int(mesh.devices.size),
        "checksum": round(checksum, 4),
    }))


if __name__ == "__main__":
    main()
