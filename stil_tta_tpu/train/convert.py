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
    # imaging Match nets wrap the resnet under the ``backbone``
    # attribute (``simmatch_model.py:23``); our ImagingNet auto-names it
    (re.compile(r"^ResNet_0$"), "backbone"),
    (re.compile(r"^block_(\d+)$"), r"transformer_blocks.\1"),
    (re.compile(r"^fusion_(\d+)$"), r"transformer.\1"),
    (re.compile(r"^club_imaging$"), "CLUB_imaging"),
    (re.compile(r"^club_tabular$"), "CLUB_tabular"),
]

# leaf-level renames inside specific parents: the DisCo projections are
# an ``MLP`` class wrapping a Sequential under ``.model``
# (``STiLModel_backbone.py:19-28``); the Match-family ``head`` is a
# plain Sequential (``simmatch_model.py:26-30``,
# ``multimodal_backbone.py:56-60``)
_MLP_HEAD_LEAF = {"fc1": "model.0", "fc2": "model.2"}
_SEQ_HEAD_LEAF = {"fc1": "0", "fc2": "2"}
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
            parts[i + 1] = _SEQ_HEAD_LEAF.get(parts[i + 1], parts[i + 1])
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
        # SAINT encoder embedded in a full-model checkpoint: the torch
        # keys under ``...encoder_tabular.`` use the somepago/saint
        # layout (simple_MLP stacks, PreNorm/Residual wrappers) — route
        # through the SAINT mapping instead of the generic tree walk
        saint_prefix, saint_rel = _saint_subpath(path)
        if saint_prefix is not None:
            expect = np.asarray(value)
            v = _saint_value(saint_rel, expect,
                             lambda k: fetch(saint_prefix + k))
            if v.shape != expect.shape:
                raise ValueError(
                    f"shape mismatch at {'.'.join(path)}: torch "
                    f"{v.shape} vs flax {expect.shape}")
            new_params[path] = v.astype(expect.dtype)
            continue
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
                 and "num_batches_tracked" not in k
                 and not _saint_inert_key(k)}
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


def _saint_torch_key(path):
    """Map a flax SAINTEncoder transformer-stack param path to its
    somepago/saint torch key. Returns (torch_key, needs_transpose).
    Stack layout: ``l{d}_{kind}`` with kind in norm/attn/ff x col/row;
    each PreNorm(norm, Residual(fn)) wraps as ``...norm.*`` +
    ``...fn.fn.*`` (Attention: to_qkv/to_out; GEGLU FF: net.0/net.3)."""
    import re as _re
    m = _re.match(r"l(\d+)_(.+)", path[-2] if len(path) >= 2
                  else path[-1])
    m0 = _re.match(r"l(\d+)_(.+)", path[0])
    mm = m0 or m
    if mm is None:
        raise KeyError(f"unmapped SAINT leaf {'/'.join(path)}")
    d = int(mm.group(1))
    kind = mm.group(2)
    slot = {"norm_col": 0, "attn_col": 0, "ff_col": 1,
            "norm_ff_col": 1, "norm_row": 2, "attn_row": 2,
            "ff_row": 3, "norm_ff_row": 3}[kind]
    base = f"transformer.layers.{d}.{slot}"
    leaf = path[-1]
    if kind.startswith("norm"):
        return (base + ".norm." + ("weight" if leaf == "scale"
                                   else "bias"), False)
    if kind.startswith("attn"):
        sub = path[-2]  # to_qkv / to_out
        return (f"{base}.fn.fn.{sub}." + ("weight" if leaf == "kernel"
                                          else "bias"),
                leaf == "kernel")
    sub = {"fc1": "net.0", "fc2": "net.3"}[path[-2]]
    return (f"{base}.fn.fn.{sub}." + ("weight" if leaf == "kernel"
                                      else "bias"),
            leaf == "kernel")


def _saint_value(path, expect, get):
    """Fetch one flax SAINTEncoder leaf from somepago/saint-layout torch
    keys via ``get`` (con_mlp stacks assemble from per-column keys)."""
    if path[-2:] == ("embeds", "embedding"):
        return get("embeds.weight")
    if path[-2:] == ("pos_encodings", "embedding"):
        return get("pos_encodings.weight")
    if path[-1].startswith("con_mlp_"):
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
        return np.stack(parts)
    tk, transpose = _saint_torch_key(path)
    v = get(tk)
    return v.T if transpose else v


_SAINT_HEADS = ("embeds", "pos_encodings")


# SAINT state entries that never participate in the backbone forward
# (verified against the real reference module,
# ``STiLModel_SAINT_backbone.py:160-184`` / ``SAINT/Tabular_Encoder.py``):
# the SSL-pretraining heads (mlp1/mlp2/mlpfory/pt_mlp/pt_mlp2), the mask
# embeddings (mask_embeds_*/single_mask — used only by SAINT's own
# masked pretraining), the derived offset BUFFERS
# (categories_offset/cat_mask_offset/con_mask_offset — recomputed from
# field lengths), and the wrapper's ``cls_token``: a float parameter
# cast ``.long()`` as a category index (``:162``) — the cast blocks all
# gradients, so it is the constant index 0 in every checkpoint.
_SAINT_INERT = re.compile(
    # the SAINT wrapper's own cls_token (bare, or under the Lightning
    # module's ``model.`` prefix) — NOT TIP's ``...encoder_tabular.
    # cls_token``, which is a live parameter the tree-walk consumes
    r"(^(model\.)?cls_token$"
    r"|(^|\.)encoder_tabular\.(mask_embeds_cat|mask_embeds_cont"
    r"|single_mask|mlp|mlp1|mlp2|mlpfory|pt_mlp|pt_mlp2|norm"
    r"|categories_offset|cat_mask_offset|con_mask_offset"
    # RowColTransformer declares embeds/mask_embed but never uses them
    # in forward (``SAINT/model_util.py:93-95,111-129``)
    r"|transformer\.embeds|transformer\.mask_embed)(\.|$))")


def _saint_inert_key(key: str) -> bool:
    return bool(_SAINT_INERT.search(key))


def _saint_subpath(path):
    """If ``path`` addresses a leaf inside a SAINT encoder embedded in a
    larger tree (``...encoder_tabular.<saint-leaf>``), return
    (torch_prefix, saint_relative_path); else (None, None). SAINT leaf
    names (embeds/pos_encodings/con_mlp_*/l{d}_*) are disjoint from the
    TIP transformer encoder's (cat_embedding/column_embedding/block_N)."""
    try:
        i = list(path).index("encoder_tabular")
    except ValueError:
        return None, None
    rel = tuple(path[i + 1:])
    if not rel:
        return None, None
    head = rel[0]
    if head in _SAINT_HEADS or head.startswith("con_mlp_") \
            or re.match(r"l\d+_", head):
        prefix = _flax_to_torch_key(tuple(path[:i + 1]), "")
        return prefix + ".", rel
    return None, None


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
        expect = np.asarray(value)
        v = _saint_value(path, expect, get)
        if v.shape != expect.shape:
            raise ValueError(f"SAINT shape mismatch at {'/'.join(path)}: "
                             f"torch {v.shape} vs flax {expect.shape}")
        new[path] = v.astype(expect.dtype)
    return {"params": _unflatten(new)}, used[0]


def _saint_export_leaf(path, v):
    """Yield (torch_key, value) pairs for one flax SAINTEncoder leaf in
    somepago/saint layout (inverse of :func:`_saint_value`)."""
    if path[-2:] == ("embeds", "embedding"):
        yield "embeds.weight", v
    elif path[-2:] == ("pos_encodings", "embedding"):
        yield "pos_encodings.weight", v
    elif path[-1].startswith("con_mlp_"):
        which = path[-1]
        for i in range(v.shape[0]):
            if which == "con_mlp_w1":
                yield f"simple_MLP.{i}.layers.0.weight", v[i].T
            elif which == "con_mlp_b1":
                yield f"simple_MLP.{i}.layers.0.bias", v[i]
            elif which == "con_mlp_w2":
                yield f"simple_MLP.{i}.layers.2.weight", v[i].T
            else:
                yield f"simple_MLP.{i}.layers.2.bias", v[i]
    else:
        tk, transpose = _saint_torch_key(path)
        yield tk, (v.T if transpose else v)


def export_torch_state_dict(variables, prefix: str = "",
                            with_bn_counters: bool = True
                            ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict`: walk our flax
    variable tree and emit a reference-layout torch ``state_dict``
    (numpy values), so checkpoints trained in this framework migrate
    BACK to the PyTorch reference (docs/MIGRATION.md).

    Value transforms are the exact inverses: Conv (kh,kw,I,O)->(O,I,kh,kw),
    Linear (I,O)->(O,I), BN/LN scale->weight, ``batch_stats`` ->
    ``running_{mean,var}`` (+ zero ``num_batches_tracked`` per BN so
    torch's strict ``load_state_dict`` succeeds — the counter is not
    recoverable from our state and only feeds torch's un-used
    momentum=None averaging path).
    """
    sd: Dict[str, np.ndarray] = {}
    for path, value in _flatten(variables["params"]).items():
        *mods, leaf = path
        v = np.asarray(value)
        saint_prefix, saint_rel = _saint_subpath(path)
        if saint_prefix is not None:
            for k, sv in _saint_export_leaf(saint_rel, v):
                sd[saint_prefix + k] = sv
            continue
        base = _flax_to_torch_key(tuple(mods), leaf)
        if leaf == "kernel":
            if v.ndim == 4:       # HWIO -> conv OIHW
                sd[base + ".weight"] = v.transpose(3, 2, 0, 1)
            elif v.ndim == 2:     # (I,O) -> linear (O,I)
                sd[base + ".weight"] = v.T
            else:
                sd[base + ".weight"] = v
        elif leaf == "bias":
            sd[base + ".bias"] = v
        elif leaf in ("scale", "embedding"):
            sd[base + ".weight"] = v
        else:  # tokens and other direct leaves share the torch name
            sd[(base + "." if base else "") + leaf] = v
    bn_bases = set()
    for path, value in _flatten(variables.get("batch_stats", {})).items():
        *mods, leaf = path
        base = _flax_to_torch_key(tuple(mods), leaf)
        torch_leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
        sd[base + "." + torch_leaf] = np.asarray(value)
        bn_bases.add(base)
    if with_bn_counters:
        for b in sorted(bn_bases):
            sd[b + ".num_batches_tracked"] = np.asarray(0, np.int64)
    return {prefix + k: v for k, v in sd.items()}


def export_saint_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of :func:`load_saint_state_dict`: emit the
    somepago/saint-layout ``state_dict`` for our :class:`SAINTEncoder`
    params (the vectorised per-continuous MLP stacks split back into
    ``simple_MLP.{i}.layers.{0,2}.*``)."""
    sd: Dict[str, np.ndarray] = {}
    for path, value in _flatten(variables["params"]).items():
        for k, v in _saint_export_leaf(path, np.asarray(value)):
            sd[k] = v
    return sd
