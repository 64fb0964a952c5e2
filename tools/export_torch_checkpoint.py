#!/usr/bin/env python
"""Export one of this framework's orbax checkpoints as a PyTorch
Lightning-style ``.ckpt`` the reference stack can load — the migration
path OUT of the framework (inverse of tools/convert_torch_checkpoint.py;
mapping proven exact in tests/test_reverse_convert.py).

Layout written (per family, matching the reference's Lightning module
graphs): STiL/CoTraining put the student under ``model.`` (plus
projectors/CLUB heads at the top level) and the EMA teacher under
``ema.``; SimMatch/CoMatch/FreeMatch wrap both inside one submodule
(``model.main.*`` / ``model.ema.*``); MMatch has no EMA. Lightning-
level buffers (prototypes/prototype sums, DA rings, instance banks,
feature queues) are emitted under their registered reference names.
``hyper_parameters`` carries the run config (as the reference's
``save_hyperparameters`` does — ``STiLModel.py:32``). FreeMatch's
time_p/p_model/label_hist are plain tensors in the reference (never
registered), so they are absent from its checkpoints on both sides.

Usage:
  python tools/export_torch_checkpoint.py \
      --config-name config_dvm_STiL --run runs/myrun \
      --out stil_export.ckpt [--name checkpoint_best_acc] [overrides...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _export(variables):
    """export_torch_state_dict routes embedded SAINT encoder subtrees
    to the somepago/saint layout itself."""
    from stil_tta_tpu.train.convert import export_torch_state_dict
    return export_torch_state_dict(variables)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-name", required=True)
    ap.add_argument("--run", required=True, help="run dir with the ckpt")
    ap.add_argument("--name", default="checkpoint_best_acc")
    ap.add_argument("--out", required=True, help="output .ckpt path")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.config import load_config
    from stil_tta_tpu.train.checkpoint import restore_checkpoint

    cfg = load_config(args.config_name, overrides=args.overrides)
    cfg.repeat_ratio = cfg.repeat_ratio or 1
    fl = cfg.field_lengths
    assert fl, "set field_lengths=... via an override"
    algo = get_algorithm(cfg.algorithm_name)(cfg, fl)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    tab = jnp.zeros((2, len(fl)), jnp.float32)
    state = algo.init_state(jax.random.key(0), img, tab)
    state = restore_checkpoint(Path(args.run), state, name=args.name)

    algo_name = cfg.algorithm_name
    # reference Lightning layouts: SimMatch/CoMatch/FreeMatch wrap
    # main+ema inside one module (``self.model.main`` / ``.ema`` —
    # e.g. ``simmatch_model.py:51-57``); STiL/CoTraining keep them as
    # sibling attributes (``model.*`` / ``ema.*``); MMatch has no EMA
    wrapped = algo_name in ("SimMatch", "CoMatch", "FreeMatch")

    sd = _export({"params": state.params,
                  "batch_stats": state.batch_stats})
    if wrapped:
        # multimodal trees already carry the ``model.`` prefix (flax
        # ``backbone`` -> torch ``model``); imaging trees are flat
        # (``backbone./classifier./head.``) and nest verbatim
        sd = {"model.main." + (k[len("model."):]
                               if k.startswith("model.") else k): v
              for k, v in sd.items()}

    has_ema = getattr(state, "ema_params", None) is not None and (
        wrapped or algo_name.startswith("STiL")
        or (algo_name.startswith("CoTrain") and bool(cfg.use_ema)))
    if has_ema:
        ema_tree = state.ema_params
        # STiL keeps the EMA teacher as the backbone subtree only;
        # Match-family EMA mirrors the full net ({'backbone': ...})
        if "backbone" not in ema_tree:
            ema_tree = {"backbone": ema_tree}
            ema_stats = {"backbone": state.ema_batch_stats or {}}
        else:
            ema_stats = state.ema_batch_stats or {}
        ema_sd = _export({"params": ema_tree, "batch_stats": ema_stats})
        pfx = "model.ema." if wrapped else "ema."
        sd.update({pfx + (k[len("model."):] if k.startswith("model.")
                          else k): v for k, v in ema_sd.items()})

    # Lightning-level buffers, under the reference's registered names
    def put(name, arr, dtype=None):
        a = np.asarray(arr)
        sd[name] = a.astype(dtype) if dtype else a

    ptr1 = lambda p: np.asarray([int(p)], np.int64)
    ex = getattr(state, "extra", None) or {}
    da = getattr(state, "da", None)
    if algo_name.startswith("STiL"):
        put("prototypes", state.prototypes)
        put("prototypes_sum", state.prototypes_sum)
        put("prototypes_count_sum", state.prototypes_count)
        if da is not None:
            put("DA_queue", da.queue)
            put("DA_ptr", ptr1(da.ptr))
    elif algo_name == "SimMatch":
        put("model.bank", ex["bank"])
        put("model.labels", ex["bank_labels"], np.int64)
        if da is not None:
            put("model.DA_queue", da.queue)
            put("model.DA_ptr", ptr1(da.ptr))
    elif algo_name == "CoMatch":
        put("model.queue_s", ex["queue_s"])
        put("model.queue_ptr_s", ptr1(ex["ptr_s"]))
        put("model.probs_u", ex["probs_u"])
        put("model.queue_w", ex["queue_w"])
        put("model.queue_ptr_w", ptr1(ex["ptr_w"]))
        put("model.probs_xu", ex["probs_xu"])
    elif algo_name == "MMatch":
        put("embed_queue", ex["embed_queue"])
        put("embed_queue_ptr", ptr1(ex["ptr"]))
        put("probs_queue", ex["probs_queue"])
        if da is not None:
            put("DA_queue", da.queue)
            put("DA_ptr", ptr1(da.ptr))

    # hyper_parameters from the RUN's saved config (the training-time
    # snapshot, incl. runtime-derived keys like dataset_length); the
    # CLI-reconstructed cfg is only the fallback
    import json
    cfg_json = Path(args.run) / (args.name + "_config.json")
    if cfg_json.exists():
        hparams = json.loads(cfg_json.read_text())
    else:
        hparams = cfg.to_dict()
    steps_per_epoch = int(hparams.get("dataset_length") or 0)
    ckpt = {"state_dict": {k: torch.tensor(np.ascontiguousarray(v))
                           for k, v in sd.items()},
            "hyper_parameters": hparams,
            "global_step": int(state.step),
            # unknowable without the run's steps-per-epoch — report 0
            # rather than the misleading step count
            "epoch": (int(state.step) // steps_per_epoch
                      if steps_per_epoch > 0 else 0)}
    torch.save(ckpt, args.out)
    print(f"wrote {args.out}: {len(sd)} tensors "
          f"(step {int(state.step)})")


if __name__ == "__main__":
    main()
