"""PyTorch checkpoint -> JAX state conversion.

The reference ships trained Lightning checkpoints (``README.md:65-71``)
and warm-starts from TIP-pretrained encoders by key-prefix filtering
(``STiLModel_backbone.py:69-90, 108-115``). This module maps a torch
``state_dict`` onto our flax variable tree so converted checkpoints
evaluate identically (BASELINE.md parity requirement).

Approach: we traverse *our* flax tree and derive each leaf's torch key
deterministically — so, like the reference's strict ``load_state_dict``,
nothing can be silently missed; unconsumed torch keys are reported.

Value transforms: Conv (O,I,kh,kw)->(kh,kw,I,O); Linear (O,I)->(I,O);
BatchNorm weight->scale + running stats into ``batch_stats``; LayerNorm
weight->scale; embeddings copied as-is.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _resnet_torch_name(parts):
    """Map our flax ResNet module path to the torch module path
    (``layer{s}_{b}`` -> ``layer{s}.{b}``, ``downsample_conv`` ->
    ``downsample.0``)."""
    out = []
    for p in parts:
        m = re.fullmatch(r"layer(\d)_(\d+)", p)
        if m:
            out.append(f"layer{m.group(1)}.{m.group(2)}")
        elif p == "downsample_conv":
            out.append("downsample.0")
        elif p == "downsample_bn":
            out.append("downsample.1")
        else:
            out.append(p)
    return ".".join(out)


# flax module-path fragment -> torch fragment, applied longest-first
_RENAMES = [
    (re.compile(r"^backbone$"), "model"),
    (re.compile(r"^block_(\d+)$"), r"transformer_blocks.\1"),
    (re.compile(r"^fusion_(\d+)$"), r"transformer.\1"),
    (re.compile(r"^club_imaging$"), "CLUB_imaging"),
    (re.compile(r"^club_tabular$"), "CLUB_tabular"),
]

# leaf-level renames inside specific parents
_MLP_HEAD_LEAF = {"fc1": "model.0", "fc2": "model.2"}
_SIMCLR_LEAF = {"fc1": "layers.0", "fc2": "layers.2"}
_CLUB_LEAF = {"fc1": "p_mu.0", "fc2": "p_mu.2"}


def _flax_to_torch_key(path: Tuple[str, ...], leaf: str):
    """Return (torch_key_base, kind). kind in {conv, linear, embed, norm,
    token, bn_scale, bn_stat}."""
    parts = list(path)
    # MLPHead / SimCLR head / CLUB sub-layer renames
    for i, p in enumerate(parts):
        if p.startswith("projection_") and i + 1 < len(parts):
            parts[i + 1] = _MLP_HEAD_LEAF.get(parts[i + 1], parts[i + 1])
        if p == "head" and i + 1 < len(parts):
            parts[i + 1] = _MLP_HEAD_LEAF.get(parts[i + 1], parts[i + 1])
        if p == "projector_multimodal" and i + 1 < len(parts):
            parts[i + 1] = _SIMCLR_LEAF.get(parts[i + 1], parts[i + 1])
        if p in ("projector_imaging", "projector_tabular") \
                and i + 1 < len(parts) and parts[i + 1] in _SIMCLR_LEAF:
            parts[i + 1] = _SIMCLR_LEAF[parts[i + 1]]
        if p in ("club_imaging", "club_tabular") and i + 1 < len(parts):
            parts[i + 1] = _CLUB_LEAF.get(parts[i + 1], parts[i + 1])
    renamed = []
    for p in parts:
        for pat, repl in _RENAMES:
            if pat.fullmatch(p):
                p = pat.sub(repl, p)
                break
        renamed.append(p)
    name = _resnet_torch_name(renamed)
    return name


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray], variables,
                             prefix: str = "",
                             strict: bool = True):
    """Fill our variable tree ({'params', 'batch_stats'}) from a torch
    state_dict. ``prefix`` selects a submodule (e.g. ``'model.'`` to map
    the backbone only, mirroring ``load_weights`` prefix filtering)."""
    sd = {k[len(prefix):]: np.asarray(v)
          for k, v in state_dict.items() if k.startswith(prefix)}
    used = set()

    def fetch(key):
        if key not in sd:
            raise KeyError(f"torch checkpoint missing key: {key}")
        used.add(key)
        return sd[key]

    flat_params = _flatten(variables["params"])
    flat_stats = _flatten(variables.get("batch_stats", {}))

    new_params = {}
    for path, value in flat_params.items():
        *mods, leaf = path
        base = _flax_to_torch_key(tuple(mods), leaf)
        v = None
        if leaf == "kernel":
            tv = fetch(base + ".weight")
            if tv.ndim == 4:       # conv OIHW -> HWIO
                v = tv.transpose(2, 3, 1, 0)
            elif tv.ndim == 2:     # linear (O,I) -> (I,O)
                v = tv.T
            else:
                v = tv
        elif leaf == "bias":
            v = fetch(base + ".bias")
        elif leaf == "scale":      # BN/LN weight
            v = fetch(base + ".weight")
        elif leaf == "embedding":  # nn.Embed
            v = fetch(base + ".weight")
        else:  # tokens and other direct leaves share the torch name
            v = fetch((base + "." if base else "") + leaf)
        expect = np.asarray(value)
        if v.shape != expect.shape:
            raise ValueError(f"shape mismatch at {'.'.join(path)}: "
                             f"torch {v.shape} vs flax {expect.shape}")
        new_params[path] = v.astype(expect.dtype)
    new_stats = {}
    for path, value in flat_stats.items():
        *mods, leaf = path
        base = _flax_to_torch_key(tuple(mods), leaf)
        torch_leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
        v = fetch(base + "." + torch_leaf)
        new_stats[path] = v.astype(np.asarray(value).dtype)

    leftovers = {k for k in sd if k not in used
                 and "num_batches_tracked" not in k}
    if strict and leftovers:
        raise KeyError(
            f"{len(leftovers)} torch keys unconsumed, e.g. "
            f"{sorted(leftovers)[:5]}")
    out = {"params": _unflatten(new_params)}
    if flat_stats:
        out["batch_stats"] = _unflatten(new_stats)
    return out, sorted(leftovers)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    root: dict = {}
    for path, v in flat.items():
        node = root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return root


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a Lightning .ckpt / .pth on CPU torch and return numpy
    arrays (+ hyper_parameters if present)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def load_pretrained_encoders(variables, ckpt_path: str):
    """TIP-pretrained warm start: fill the backbone's image/tabular
    encoder subtrees from a torch checkpoint by key prefix, excluding
    projection-head/prototype keys — the reference's ``load_weights``
    (``STiLModel_backbone.py:69-90, 108-115``). Returns new variables."""
    sd = load_torch_checkpoint(ckpt_path)
    sd = {k: v for k, v in sd.items()
          if "projection_head" not in k and "prototypes" not in k}
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    backbone_p = dict(params["backbone"])
    backbone_s = dict(stats.get("backbone", {}))
    for sub, prefix in (("encoder_imaging", "encoder_imaging."),
                        ("encoder_tabular", "encoder_tabular.")):
        sub_vars = {"params": backbone_p[sub]}
        if sub in backbone_s:
            sub_vars["batch_stats"] = backbone_s[sub]
        converted, leftovers = convert_torch_state_dict(
            sd, sub_vars, prefix=prefix, strict=False)
        backbone_p[sub] = converted["params"]
        if "batch_stats" in converted and sub in backbone_s:
            backbone_s[sub] = converted["batch_stats"]
        n_total = sum(1 for k in sd if k.startswith(prefix))
        print(f"Loaded {n_total - len(leftovers)}/{n_total} torch keys "
              f"for {prefix}")
    params["backbone"] = backbone_p
    out = {"params": params}
    if stats:
        stats["backbone"] = backbone_s
        out["batch_stats"] = stats
    return out


def load_saint_state_dict(variables, state_dict):
    """Map a somepago/saint-style torch ``state_dict`` onto our
    :class:`SAINTEncoder` variables (the reference loads SAINT weights
    from a separate .pth — ``STiLModel_SAINT_backbone.py:144-146``).

    Consumed keys: ``embeds.weight``, ``pos_encodings.weight``, the
    per-continuous ``simple_MLP.{i}.layers.{0,2}.{weight,bias}`` stacks,
    and the RowColTransformer stack
    ``transformer.layers.{d}.{j}`` where j in {0: col-attention,
    1: col-FF, 2: row-attention, 3: row-FF}, each wrapped as
    PreNorm(norm, Residual(fn)) => ``...norm.*`` + ``...fn.fn.*``
    (Attention: to_qkv/to_out; FeedForward: net.0/net.3). All other SAINT
    heads (mlp1/mlp2/mlpfory/pt_mlp*/mask embeds) are ignored, like the
    reference's encoder-only use. Returns (variables, n_consumed).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    flat = _flatten(variables["params"])
    used = [0]

    def get(key):
        used[0] += 1
        return sd[key]

    new = {}
    for path, value in flat.items():
        name = "/".join(path)
        expect = np.asarray(value)
        v = None
        if path[-2:] == ("embeds", "embedding"):
            v = get("embeds.weight")
        elif path[-2:] == ("pos_encodings", "embedding"):
            v = get("pos_encodings.weight")
        elif path[-1].startswith("con_mlp_"):
            ncon = expect.shape[0]
            which = path[-1]
            parts = []
            for i in range(ncon):
                if which == "con_mlp_w1":
                    parts.append(get(f"simple_MLP.{i}.layers.0.weight").T)
                elif which == "con_mlp_b1":
                    parts.append(get(f"simple_MLP.{i}.layers.0.bias"))
                elif which == "con_mlp_w2":
                    parts.append(get(f"simple_MLP.{i}.layers.2.weight").T)
                else:
                    parts.append(get(f"simple_MLP.{i}.layers.2.bias"))
            v = np.stack(parts)
        else:
            # l{d}_{kind}: norm_col/attn_col/ff_col/norm_ff_col + row
            import re as _re
            m = _re.match(r"l(\d+)_(.+)", path[-2] if len(path) >= 2
                          else path[-1])
            m0 = _re.match(r"l(\d+)_(.+)", path[0])
            mm = m0 or m
            if mm is None:
                raise KeyError(f"unmapped SAINT leaf {name}")
            d = int(mm.group(1))
            kind = mm.group(2)
            slot = {"norm_col": 0, "attn_col": 0, "ff_col": 1,
                    "norm_ff_col": 1, "norm_row": 2, "attn_row": 2,
                    "ff_row": 3, "norm_ff_row": 3}[kind]
            base = f"transformer.layers.{d}.{slot}"
            leaf = path[-1]
            if kind.startswith("norm"):
                tk = base + ".norm." + ("weight" if leaf == "scale"
                                        else "bias")
                v = get(tk)
            elif kind.startswith("attn"):
                sub = path[-2]  # to_qkv / to_out
                tk = f"{base}.fn.fn.{sub}." + (
                    "weight" if leaf == "kernel" else "bias")
                v = get(tk)
                if leaf == "kernel":
                    v = v.T
            else:  # ff: fc1 -> net.0, fc2 -> net.3
                sub = {"fc1": "net.0", "fc2": "net.3"}[path[-2]]
                tk = f"{base}.fn.fn.{sub}." + (
                    "weight" if leaf == "kernel" else "bias")
                v = get(tk)
                if leaf == "kernel":
                    v = v.T
        if v.shape != expect.shape:
            raise ValueError(f"SAINT shape mismatch at {name}: torch "
                             f"{v.shape} vs flax {expect.shape}")
        new[path] = v.astype(expect.dtype)
    return {"params": _unflatten(new)}, used[0]
