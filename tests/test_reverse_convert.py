"""Reverse conversion (our flax state -> torch state_dict): exact
round-trip through :func:`convert_torch_state_dict` /
:func:`load_saint_state_dict` and back. This is the migration path OUT
of the framework — a checkpoint trained here loads into the PyTorch
reference with ``strict=True`` (docs/MIGRATION.md)."""

import numpy as np
import torch
import torch.nn as nn

from stil_tta_tpu.train.convert import (convert_torch_state_dict,
                                        export_saint_state_dict,
                                        export_torch_state_dict,
                                        load_saint_state_dict)


def test_stil_state_dict_roundtrip():
    """torch sd -> flax tree -> torch sd is exact (incl. conv/linear
    transposes, BN stats, tokens, MLP-head/SimCLR/CLUB leaf renames)."""
    import jax
    import jax.numpy as jnp

    from stil_tta_tpu.algorithms.stil import STiLNet
    from tests.test_full_model_parity import CATS, DIM, NCLS, NCON, \
        PROJ, TSTiL

    torch.manual_seed(0)
    tm = TSTiL().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    sd = {("model." + k[len("backbone."):] if k.startswith("backbone.")
           else k): v for k, v in sd.items()}

    net = STiLNet(encoder="resnet18", field_lengths=CATS + (1,) * NCON,
                  num_classes=NCLS, target="dvm", projection_dim=PROJ,
                  tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
                  tabular_num_layers=1, multimodal_num_layers=1,
                  dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    tab = np.concatenate([
        np.stack([rng.randint(0, c, 2) for c in CATS], 1),
        rng.randn(2, NCON)], 1).astype(np.float32)
    variables = net.init(jax.random.key(0), jnp.asarray(img),
                         jnp.asarray(tab), train=False)
    converted, leftovers = convert_torch_state_dict(sd, variables)
    assert not leftovers

    back = export_torch_state_dict(converted)
    orig = {k: v for k, v in sd.items()
            if "num_batches_tracked" not in k}
    assert set(back) - set(sd) == set(), sorted(set(back) - set(sd))[:5]
    assert set(orig) - set(back) == set(), sorted(set(orig)
                                                  - set(back))[:5]
    for k, v in orig.items():
        np.testing.assert_array_equal(back[k], v, err_msg=k)
    # and the counters torch's strict load needs are present
    n_counters = sum(1 for k in sd if "num_batches_tracked" in k)
    assert sum(1 for k in back
               if "num_batches_tracked" in k) == n_counters


def test_stil_exported_sd_strict_loads_into_torch():
    """The exported dict load_state_dict()s strictly into the twin."""
    import jax
    import jax.numpy as jnp

    from stil_tta_tpu.algorithms.stil import STiLNet
    from tests.test_full_model_parity import CATS, DIM, NCLS, NCON, \
        PROJ, TSTiL

    net = STiLNet(encoder="resnet18", field_lengths=CATS + (1,) * NCON,
                  num_classes=NCLS, target="dvm", projection_dim=PROJ,
                  tabular_embedding_dim=DIM, multimodal_embedding_dim=DIM,
                  tabular_num_layers=1, multimodal_num_layers=1,
                  dtype=jnp.float32)
    rng = np.random.RandomState(7)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    tab = np.concatenate([
        np.stack([rng.randint(0, c, 2) for c in CATS], 1),
        rng.randn(2, NCON)], 1).astype(np.float32)
    variables = net.init(jax.random.key(1), jnp.asarray(img),
                         jnp.asarray(tab), train=False)

    sd = export_torch_state_dict(variables)
    # exported keys use the 'model.' backbone prefix; the twin's module
    # attribute is 'backbone'
    sd = {("backbone." + k[len("model."):] if k.startswith("model.")
           else k): torch.tensor(np.ascontiguousarray(v))
          for k, v in sd.items()}
    tm = TSTiL()
    missing, unexpected = tm.load_state_dict(sd, strict=True), None
    assert not missing.missing_keys and not missing.unexpected_keys


def test_saint_state_dict_roundtrip():
    """somepago/saint sd -> flax SAINTEncoder -> sd is exact, incl. the
    vectorised per-continuous MLP stacks split back per column."""
    import jax
    import jax.numpy as jnp

    from stil_tta_tpu.models.saint import SAINTEncoder
    from tests.test_saint_parity import CATS, DIM, HEADS, NCON, \
        TSaintEncoder

    torch.manual_seed(2)
    tm = TSaintEncoder().eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = SAINTEncoder(cat_lengths=CATS, num_continuous=NCON,
                      token_dim=DIM, depth=1, heads=HEADS,
                      attentiontype="colrow", dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = np.concatenate([
        np.stack([rng.randint(0, c, 4) for c in CATS], 1),
        rng.randn(4, NCON)], 1).astype(np.float32)
    variables = fm.init(jax.random.key(0), x)
    converted, n_used = load_saint_state_dict(
        variables, {k: np.asarray(v) for k, v in sd.items()})
    assert n_used >= 20

    back = export_saint_state_dict(converted)
    assert set(back) == set(sd), (sorted(set(back) ^ set(sd))[:5])
    for k, v in sd.items():
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_embedded_saint_lightning_roundtrip():
    """A SAINT-backbone Lightning state_dict (SAINT keys embedded under
    ``model.encoder_tabular.``, as a real reference CoTrain_SAINT
    checkpoint carries them) converts through plain
    convert_torch_state_dict — no split load_saint_state_dict call —
    and exports back bitwise (the embedded `_saint_subpath` route in
    both directions)."""
    import jax
    import jax.numpy as jnp

    from stil_tta_tpu.algorithms.mmatch import SemiMultimodalNet
    from tests.test_cotrain_saint_step_parity import TSemiSAINTBackbone
    from tests.test_saint_parity import CATS, NCON

    torch.manual_seed(4)
    tm = TSemiSAINTBackbone().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    sd = {"model." + k: v.numpy() for k, v in tm.state_dict().items()}
    assert any("encoder_tabular.simple_MLP" in k for k in sd)

    net = SemiMultimodalNet(
        encoder="resnet18", field_lengths=tuple(CATS) + (1,) * NCON,
        num_classes=4, projection_dim=16, tabular_embedding_dim=32,
        multimodal_embedding_dim=32, tabular_num_layers=1,
        tabular_encoder="saint", saint_ff_dropout=0.0,
        dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = rng.rand(2, 32, 32, 3).astype(np.float32)
    tab = np.concatenate([
        np.stack([rng.randint(0, c, 2) for c in CATS], 1),
        rng.randn(2, NCON)], 1).astype(np.float32)
    variables = net.init(jax.random.key(0), jnp.asarray(img),
                         jnp.asarray(tab), train=False)

    converted, leftovers = convert_torch_state_dict(sd, variables)
    assert not leftovers, leftovers

    # forward parity through the embedded route
    ours = net.apply(converted, jnp.asarray(img), jnp.asarray(tab),
                     train=False)
    with torch.no_grad():
        om, oi, ot, _ = tm(torch.tensor(img.transpose(0, 3, 1, 2)),
                           torch.tensor(tab))
    np.testing.assert_allclose(np.asarray(ours[0]), om.numpy(),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ours[2]), ot.numpy(),
                               rtol=1e-3, atol=5e-4)

    # export back: every original key present and bitwise equal
    back = export_torch_state_dict(converted)
    orig = {k: v for k, v in sd.items()
            if "num_batches_tracked" not in k}
    assert set(orig) <= set(back), sorted(set(orig) - set(back))[:5]
    for k, v in orig.items():
        np.testing.assert_array_equal(back[k], v, err_msg=k)
