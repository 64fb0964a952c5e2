#!/usr/bin/env python
"""Convert a reference PyTorch Lightning STiL checkpoint into this
framework's orbax state.

Maps the torch ``state_dict`` (student backbone under ``model.``,
projectors, CLUB heads; EMA teacher under ``ema.``; prototype buffers)
onto the flax/orbax train state so eval predictions match the reference
(see tests/test_full_model_parity.py for the proven mapping).

Usage:
  python tools/convert_torch_checkpoint.py \
      --config-name config_dvm_STiL --ckpt checkpoint_best_acc.ckpt \
      --out runs/converted [overrides...]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-name", required=True)
    ap.add_argument("--ckpt", required=True, help="torch .ckpt/.pth path")
    ap.add_argument("--out", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.config import load_config
    from stil_tta_tpu.train.checkpoint import save_checkpoint
    from stil_tta_tpu.train.convert import (convert_torch_state_dict,
                                            load_torch_checkpoint)

    cfg = load_config(args.config_name, overrides=args.overrides)
    cfg.repeat_ratio = cfg.repeat_ratio or 1
    fl = cfg.field_lengths
    assert fl, ("set field_lengths=... (the artifact spec's cardinality "
                "list) via an override")
    algo = get_algorithm(cfg.algorithm_name)(cfg, fl)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    tab = jnp.zeros((2, len(fl)), jnp.float32)
    state = algo.init_state(jax.random.key(0), img, tab)

    sd = load_torch_checkpoint(args.ckpt)
    student = {k: v for k, v in sd.items() if not k.startswith("ema.")}
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    converted, leftovers = convert_torch_state_dict(student, variables,
                                                    strict=False)
    print(f"student: {len(student) - len(leftovers)}/{len(student)} torch "
          f"keys consumed; unmapped e.g. {leftovers[:5]}")
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted.get("batch_stats", state.batch_stats))

    ema = {("model." + k[len("ema."):]): v for k, v in sd.items()
           if k.startswith("ema.")}
    if ema and state.ema_params is not None:
        # STiL stores the EMA teacher as the backbone subtree only;
        # CoTraining-style states mirror the full net ({'backbone':...})
        nested = "backbone" not in state.ema_params
        if nested:
            sub = {"params": {"backbone": state.ema_params}}
            if state.ema_batch_stats is not None:
                sub["batch_stats"] = {"backbone": state.ema_batch_stats}
        else:
            sub = {"params": state.ema_params}
            if state.ema_batch_stats is not None:
                sub["batch_stats"] = state.ema_batch_stats
        conv_e, left_e = convert_torch_state_dict(ema, sub, strict=False)
        if nested:
            new_ema_p = conv_e["params"]["backbone"]
            new_ema_s = conv_e.get("batch_stats", {}).get(
                "backbone", state.ema_batch_stats)
        else:
            new_ema_p = conv_e["params"]
            new_ema_s = conv_e.get("batch_stats", state.ema_batch_stats)
        state = dataclasses.replace(
            state, ema_params=new_ema_p, ema_batch_stats=new_ema_s)
        print(f"ema: {len(ema) - len(left_e)}/{len(ema)} keys consumed")

    if "prototypes" in sd and hasattr(state, "prototypes"):
        state = dataclasses.replace(
            state, prototypes=jnp.asarray(np.asarray(sd["prototypes"]),
                                          jnp.float32))
        print("prototypes restored")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_checkpoint(out, state, cfg.to_dict(), name="checkpoint_converted")
    print(f"wrote {out}/checkpoint_converted")


if __name__ == "__main__":
    main()
