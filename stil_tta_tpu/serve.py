"""Batched inference / serving.

The reference's deployment shape is the multimodal-head forward
(SURVEY.md §3.5: ``DisCoAttentionBackbone.forward`` ->
``softmax(classifier_multimodal(...))``). This module packages it as a
production predictor: fixed-shape jitted forward (pad-and-mask), device-
resident weights, optional pre-serving TTA, and a CLI that scores a
native-format split into a CSV.

Example:
    predictor = Predictor.from_checkpoint(cfg, "runs/x/checkpoint_best_acc")
    probs = predictor(images_u8, tabular)          # (N, C) np.ndarray
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.algorithms.registry import get_algorithm
from stil_tta_tpu.config import load_config
from stil_tta_tpu.train.checkpoint import restore_checkpoint


class Predictor:
    """Fixed-shape batched predictor.

    ``mesh`` (a 1-axis ``jax.sharding.Mesh``) turns on SPMD data-parallel
    serving: weights replicated once at construction, every call's batch
    sharded over the ``data`` axis, per-sample math unchanged (GSPMD —
    the serving analogue of the training mesh, ``parallel/mesh.py``).
    ``batch_size`` is the *global* batch and is rounded up to a multiple
    of the mesh size so each device gets an equal static shard.
    """

    def __init__(self, algo, state, batch_size: int = 256, mesh=None,
                 int8: bool = False):
        """``int8``: dynamically-quantized image-tower convs (~2x MXU
        rate on v5e — models/resnet.py ``quant_conv_apply``) for nets
        whose ``__call__`` exposes ``int8_image`` (STiL, ResNet towers
        only). A documented inference numerics change (int8 rounding
        per conv); predictions track the bf16 forward
        (tests/test_int8_teacher.py bounds). The activation scales are
        per-BATCH amax, so a sample's int8 predictions can shift
        within the rounding band depending on its batch partners /
        ``batch_size`` — see quant_conv_apply's note."""
        self.algo = algo
        self.mesh = mesh
        if mesh is not None:
            from stil_tta_tpu.parallel.mesh import (batch_sharding,
                                                    replicate)
            n_dev = mesh.devices.size
            batch_size = -(-batch_size // n_dev) * n_dev
            self.params = replicate(mesh, state.params)
            self.batch_stats = replicate(mesh, state.batch_stats)
            self._batch_shard = batch_sharding(mesh)
        else:
            self.params = state.params
            self.batch_stats = state.batch_stats
            self._batch_shard = None
        self.batch_size = batch_size
        net, aug = algo.net, algo.aug_eval
        kw = {}
        if int8:
            import inspect
            if "int8_image" not in inspect.signature(
                    type(net).__call__).parameters:
                raise ValueError(
                    f"int8 serving unsupported for {type(net).__name__}")
            if str(getattr(net, "encoder", "")).startswith("vit"):
                # DisCoBackbone.encode drops the flag for ViT towers;
                # refuse rather than mislabel a bf16 run as int8
                raise ValueError("int8 serving unsupported for ViT "
                                 "image encoders")
            kw["int8_image"] = True

        def fwd(params, batch_stats, images, tabular):
            imgs = aug(jax.random.key(0), images)
            out = net.apply({"params": params, "batch_stats": batch_stats},
                            imgs, tabular, train=False, **kw)
            if isinstance(out, dict):
                logits = out["out_m"]
            elif isinstance(out, tuple):
                logits = out[0]
            else:
                logits = out
            return jax.nn.softmax(logits.astype(jnp.float32), axis=1)

        from stil_tta_tpu.utils.jax_setup import lazy_tuned
        self._fwd = lazy_tuned(jax.jit(fwd))

    def _put(self, arr: np.ndarray):
        if self._batch_shard is not None:
            return jax.device_put(arr, self._batch_shard)
        return jnp.asarray(arr)

    @classmethod
    def from_checkpoint(cls, cfg, checkpoint: str,
                        field_lengths=None, batch_size: int = 256,
                        data_parallel: bool = False, int8: bool = False):
        field_lengths = list(field_lengths or cfg.field_lengths)
        algo = get_algorithm(cfg.algorithm_name)(cfg, field_lengths)
        img = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
        tab = jnp.zeros((2, len(field_lengths)), jnp.float32)
        state = algo.init_state(jax.random.key(0), img, tab)
        ckpt = Path(checkpoint)
        state = restore_checkpoint(ckpt.parent, state, name=ckpt.name)
        mesh = None
        if data_parallel:
            from stil_tta_tpu.parallel.mesh import create_mesh
            mesh = create_mesh()
        return cls(algo, state, batch_size, mesh=mesh, int8=int8)

    def __call__(self, images: np.ndarray,
                 tabular: np.ndarray) -> np.ndarray:
        n = len(images)
        bs = self.batch_size
        outs = []
        # dispatch every batch asynchronously, fetch after the loop —
        # host->device transfer of batch k+1 overlaps compute of batch k
        for start in range(0, n, bs):
            img = images[start:start + bs]
            tab = tabular[start:start + bs]
            pad = bs - len(img)
            if pad:  # static shapes: pad the tail batch
                img = np.concatenate([img, np.repeat(img[:1], pad, 0)])
                tab = np.concatenate([tab, np.repeat(tab[:1], pad, 0)])
            outs.append((self._fwd(self.params, self.batch_stats,
                                   self._put(img), self._put(tab)),
                         pad))
        return np.concatenate([np.asarray(p)[:bs - pad] if pad
                               else np.asarray(p) for p, pad in outs])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-name", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--source", required=True,
                    help="native-format split directory to score")
    ap.add_argument("--out", default="predictions.csv")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard each batch over all local devices "
                         "(SPMD data-parallel serving)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 image-tower convs (~2x MXU; documented "
                         "inference numerics change)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from stil_tta_tpu.data.source import ArraySource
    cfg = load_config(args.config_name, overrides=args.overrides)
    src = ArraySource.load(args.source)
    cfg.num_classes = cfg.num_classes or src.num_classes
    predictor = Predictor.from_checkpoint(cfg, args.checkpoint,
                                          src.field_lengths,
                                          args.batch_size,
                                          data_parallel=args.data_parallel,
                                          int8=args.int8)
    probs = predictor(np.asarray(src.images), src.tabular)
    pred = probs.argmax(1)
    acc = float((pred == src.labels).mean())
    with open(args.out, "w") as f:
        f.write("index,prediction,confidence\n")
        for i, (p, c) in enumerate(zip(pred, probs.max(1))):
            f.write(f"{i},{p},{c:.6f}\n")
    print(f"scored {len(pred)} samples, acc={acc:.4f} -> {args.out}")


if __name__ == "__main__":
    main()
