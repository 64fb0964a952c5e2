"""Checkpoint round-trip + data-layer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.data.corrupt import corrupt_tabular
from stil_tta_tpu.data.loader import (CyclingSampler, DeviceCache,
                                      EpochSampler, HostStream,
                                      gather_batch)
from stil_tta_tpu.data.source import synthetic_source
from stil_tta_tpu.train.checkpoint import (restore_checkpoint,
                                           save_checkpoint)


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7, jnp.int32),
             "protos": jnp.ones((4, 2))}
    save_checkpoint(tmp_path, state, config={"a": 1}, name="best")
    target = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_checkpoint(tmp_path, target, name="best")
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7


def test_checkpoint_typed_key_roundtrip(tmp_path):
    """Typed PRNG keys serialize as raw key data (impl-agnostic): a
    same-impl restore resumes the exact stream; a cross-impl restore
    (TPU rbg checkpoint -> CPU threefry target) restores every other
    leaf and keeps the target's fresh key instead of failing."""
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "rng": jax.random.key(3, impl="threefry2x32")}
    save_checkpoint(tmp_path, state, name="key")
    target = {"params": {"w": jnp.zeros((2, 3))},
              "rng": jax.random.key(9, impl="threefry2x32")}
    restored = restore_checkpoint(tmp_path, target, name="key")
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored["rng"])),
        np.asarray(jax.random.key_data(state["rng"])))

    # cross-impl: rbg key data has a different shape than threefry's
    state_rbg = {"params": {"w": jnp.full((2, 3), 5.0)},
                 "rng": jax.random.key(3, impl="rbg")}
    save_checkpoint(tmp_path, state_rbg, name="key_rbg")
    restored = restore_checkpoint(tmp_path, target, name="key_rbg")
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.full((2, 3), 5.0))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored["rng"])),
        np.asarray(jax.random.key_data(target["rng"])))


def test_epoch_sampler_padding_and_drop():
    s = EpochSampler(10, 4, shuffle=False, drop_last=False)
    batches = list(s.epoch())
    assert len(batches) == 3
    idx, w = batches[-1]
    assert len(idx) == 4 and w.sum() == 2  # 2 padded
    s2 = EpochSampler(10, 4, shuffle=True, drop_last=True, seed=1)
    assert s2.steps_per_epoch() == 2
    all_idx = np.concatenate([i for i, _ in s2.epoch()])
    assert len(set(all_idx.tolist())) == 8  # no repeats within epoch


def test_cycling_sampler_covers_all():
    s = CyclingSampler(5, 2, seed=0)
    seen = []
    for _ in range(10):
        idx, _ = s.next()
        seen.extend(idx.tolist())
    assert set(seen) == set(range(5))


def test_device_cache_gather():
    src = synthetic_source(12, num_classes=3,
                           field_lengths=[3, 1, 1], image_size=8)
    cache = DeviceCache(src).as_dict()
    batch = jax.jit(gather_batch)(cache, jnp.asarray([0, 5, 11]))
    np.testing.assert_array_equal(np.asarray(batch["labels"]),
                                  src.labels[[0, 5, 11]])
    np.testing.assert_array_equal(np.asarray(batch["images"]),
                                  src.images[[0, 5, 11]])


def test_host_stream_epoch():
    src = synthetic_source(10, num_classes=3, field_lengths=[3, 1, 1],
                           image_size=8)
    stream = HostStream(src, EpochSampler(10, 4, shuffle=False))
    batches = list(stream.epoch())
    assert len(batches) == 3
    assert batches[0]["images"].shape == (4, 8, 8, 3)


def test_corrupt_tabular_statistics():
    rng = jax.random.key(0)
    rows = jnp.zeros((64, 10))
    marginal = jnp.ones((100, 10))
    out = corrupt_tabular(rng, rows, marginal, 0.3)
    # exactly floor(10*0.3)=3 corrupted columns per row, values from the
    # marginal table (all ones)
    per_row = np.asarray((out == 1.0).sum(axis=1))
    assert (per_row == 3).all()


def test_corrupt_tabular_zero_rate():
    rng = jax.random.key(0)
    rows = jnp.arange(20.0).reshape(4, 5)
    out = corrupt_tabular(rng, rows, rows, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(rows))


def test_weighted_sampler_prefers_heavy_class():
    from stil_tta_tpu.data.loader import WeightedSampler
    labels = np.array([0] * 50 + [1] * 50)
    s = WeightedSampler(labels, {0: 1.0, 1: 9.0}, batch_size=200, seed=0)
    idx, w = s.next()
    frac1 = (labels[idx] == 1).mean()
    assert 0.8 < frac1 < 0.98  # ~0.9 expected
    assert w.sum() == 200


def test_async_save_roundtrip(tmp_path):
    """block=False saves commit after wait_for_checkpoints and restore
    identically to sync saves."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stil_tta_tpu.train.checkpoint import (restore_checkpoint,
                                               save_checkpoint,
                                               wait_for_checkpoints)

    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(7)}
    save_checkpoint(tmp_path, state, {"k": 1}, name="async_ck",
                    block=False)
    # overwrite in flight: a second async save must serialize cleanly
    state2 = {"w": state["w"] * 2, "step": jnp.asarray(8)}
    save_checkpoint(tmp_path, state2, {"k": 2}, name="async_ck",
                    block=False)
    wait_for_checkpoints()
    target = {"w": jnp.zeros((2, 3)), "step": jnp.asarray(0)}
    out = restore_checkpoint(tmp_path, target, name="async_ck")
    np.testing.assert_allclose(np.asarray(out["w"]),
                               np.arange(6.0).reshape(2, 3) * 2)
    assert int(out["step"]) == 8


def test_cross_impl_restore_dataclass_target(tmp_path):
    """The key-shape fallback must survive flax-dataclass targets: the
    checkpoint metadata tree is plain nested dicts, so the fallback
    indexes it by path instead of tree_map-ing across mismatched
    treedefs (round-3 regression: STiLState restore after a TPU-rbg
    training run crashed with 'Custom dataclass node type mismatch')."""
    import flax.struct
    import jax
    import jax.numpy as jnp

    @flax.struct.dataclass
    class MiniState:
        params: dict
        rng: jax.Array
        step: jax.Array

    state = MiniState(params={"w": jnp.full((2, 3), 5.0)},
                      rng=jax.random.key(3, impl="rbg"),
                      step=jnp.asarray(11, jnp.int32))
    save_checkpoint(tmp_path, state, name="dc")

    target = MiniState(params={"w": jnp.zeros((2, 3))},
                       rng=jax.random.key(0, impl="threefry2x32"),
                       step=jnp.asarray(0, jnp.int32))
    restored = restore_checkpoint(tmp_path, target, name="dc")
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((2, 3), 5.0))
    assert int(restored.step) == 11
