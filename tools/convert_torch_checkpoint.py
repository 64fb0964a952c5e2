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
    # SimMatch/CoMatch/FreeMatch Lightning modules wrap main+ema inside
    # one submodule (``model.main.*`` / ``model.ema.*`` —
    # ``simmatch_model.py:51-57``); normalise to the sibling layout.
    # Multimodal trees keep the ``model.`` prefix (flax ``backbone``);
    # imaging trees are flat (``backbone./classifier./head.``).
    if any(k.startswith("model.main.") for k in sd):
        strip = "model." if "backbone" in state.params else ""
        sd = {(strip + k[len("model.main."):]
               if k.startswith("model.main.") else
               "ema." + k[len("model.ema."):]
               if k.startswith("model.ema.") else k): v
              for k, v in sd.items()}
    buffers = {k: v for k, v in sd.items() if "." not in k
               or k.split(".", 1)[0] == "model" and k.count(".") == 1}
    student = {k: v for k, v in sd.items()
               if not k.startswith("ema.") and k not in buffers}
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

    # Lightning-level buffers (prototypes / DA rings / banks / queues)
    # back into the train state, under the reference's registered names
    def get(*names):
        for n in names:
            if n in buffers:
                return np.asarray(buffers[n])
        return None

    def group(*alts):
        """All-or-nothing buffer group: each element is a tuple of
        accepted names for one tensor. Returns the list of arrays, or
        None (with a warning) if any member is absent."""
        vals = [get(*a) for a in alts]
        if all(v is not None for v in vals):
            return vals
        if any(v is not None for v in vals):
            missing = [a[0] for a, v in zip(alts, vals) if v is None]
            print(f"warning: partial buffer group in checkpoint — "
                  f"missing {missing}; group skipped")
        return None

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    i32s = lambda a: jnp.asarray(int(np.asarray(a).reshape(-1)[0]),
                                 jnp.int32)
    restored = []

    def set_da(queue, ptr):
        from stil_tta_tpu.algorithms.base import DAState
        nonlocal state
        state = dataclasses.replace(
            state, da=DAState(f32(queue), i32s(ptr)))
        restored.append("DA")

    name = cfg.algorithm_name
    if get("prototypes") is not None and hasattr(state, "prototypes"):
        state = dataclasses.replace(
            state, prototypes=f32(get("prototypes")))
        restored.append("prototypes")
        g = group(("prototypes_sum",), ("prototypes_count_sum",))
        if g is not None:
            state = dataclasses.replace(
                state, prototypes_sum=f32(g[0]),
                prototypes_count=f32(g[1]))
            restored.append("prototype sums")
    extra = dict(getattr(state, "extra", None) or {})
    extra_changed = False
    if name == "SimMatch":
        g = group(("model.bank", "bank"), ("model.labels", "labels"))
        if g is not None:
            extra["bank"] = f32(g[0])
            extra["bank_labels"] = jnp.asarray(g[1], jnp.int32)
            extra_changed = True
            restored.append("bank")
    elif name == "CoMatch":
        g = group(("model.queue_s", "queue_s"),
                  ("model.probs_u", "probs_u"),
                  ("model.queue_w", "queue_w"),
                  ("model.probs_xu", "probs_xu"),
                  ("model.queue_ptr_s", "queue_ptr_s"),
                  ("model.queue_ptr_w", "queue_ptr_w"))
        if g is not None:
            for key, v in zip(("queue_s", "probs_u", "queue_w",
                               "probs_xu"), g[:4]):
                extra[key] = f32(v)
            extra["ptr_s"] = i32s(g[4])
            extra["ptr_w"] = i32s(g[5])
            extra_changed = True
            restored.append("queues")
    elif name == "MMatch":
        g = group(("embed_queue",), ("probs_queue",),
                  ("embed_queue_ptr",))
        if g is not None:
            extra["embed_queue"] = f32(g[0])
            extra["probs_queue"] = f32(g[1])
            extra["ptr"] = i32s(g[2])
            extra_changed = True
            restored.append("memory bank")
    if extra_changed:
        state = dataclasses.replace(state, extra=extra)
    if getattr(state, "da", None) is not None:
        g = group(("DA_queue", "model.DA_queue"),
                  ("DA_ptr", "model.DA_ptr"))
        if g is not None:
            set_da(g[0], g[1])
    if restored:
        print(f"buffers restored: {', '.join(restored)}")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_checkpoint(out, state, cfg.to_dict(), name="checkpoint_converted")
    print(f"wrote {out}/checkpoint_converted")


if __name__ == "__main__":
    main()
