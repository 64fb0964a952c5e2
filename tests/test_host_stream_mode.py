"""host_stream training mode: host-gathered virtual caches must produce
the same training trajectory as the HBM DeviceCache path (the marginal
corruption table stays the full dataset via ``marginal_table``)."""

import numpy as np

from stil_tta_tpu.train.evaluate import evaluate
from tests.helpers import tiny_cfg


def _run(tmp_path, tag, **over):
    kw = dict(
        synthetic_image_size=40, synthetic_labelled=8,
        synthetic_unlabelled=24, synthetic_val=16, synthetic_test=16,
        max_epochs=1, strict_prototypes="false", test_and_eval="false",
        enable_progress_bar="false", save_checkpoints="true")
    kw.update(over)
    cfg = tiny_cfg(**kw)
    cfg.logdir = str(tmp_path / tag)
    return cfg, evaluate(cfg)


def test_host_stream_matches_device_cache(tmp_path):
    import jax

    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.train.checkpoint import restore_checkpoint
    import jax.numpy as jnp

    cfg_d, res_d = _run(tmp_path, "device", host_stream="false")
    cfg_h, res_h = _run(tmp_path, "host", host_stream="true")
    assert np.isfinite(res_h["best_val"])

    def load(cfg, tag):
        algo = get_algorithm(cfg.algorithm_name)(cfg, cfg.field_lengths)
        img = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
        tab = jnp.zeros((2, len(cfg.field_lengths)), jnp.float32)
        state = algo.init_state(jax.random.key(cfg.seed), img, tab)
        return restore_checkpoint(tmp_path / tag, state,
                                  name="checkpoint_best_acc")

    sd = load(cfg_d, "device")
    sh = load(cfg_h, "host")
    diffs = [float(np.max(np.abs(np.asarray(a, np.float32)
                                 - np.asarray(b, np.float32))))
             for a, b in zip(jax.tree_util.tree_leaves(sd.params),
                             jax.tree_util.tree_leaves(sh.params))]
    assert max(diffs) < 5e-3, max(diffs)
    assert int(sd.step) == int(sh.step)


def _load_ckpt(cfg, tmp_path, tag):
    import jax
    import jax.numpy as jnp

    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.train.checkpoint import restore_checkpoint

    algo = get_algorithm(cfg.algorithm_name)(cfg, cfg.field_lengths)
    img = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    tab = jnp.zeros((2, len(cfg.field_lengths)), jnp.float32)
    state = algo.init_state(jax.random.key(cfg.seed), img, tab)
    return restore_checkpoint(tmp_path / tag, state,
                              name="checkpoint_best_acc")


def _assert_same_params(a, b, tol=5e-3):
    import jax
    diffs = [float(np.max(np.abs(np.asarray(x, np.float32)
                                 - np.asarray(y, np.float32))))
             for x, y in zip(jax.tree_util.tree_leaves(a.params),
                             jax.tree_util.tree_leaves(b.params))]
    assert max(diffs) < tol, max(diffs)
    assert int(a.step) == int(b.step)


def test_host_stream_block_dispatch_matches_single(tmp_path):
    """steps_per_dispatch routes through HostStream as stacked (K, B)
    blocks (VERDICT r2 #5); the trajectory must equal single-step
    dispatch exactly. spd=3 over the 4-step epoch exercises one scanned
    block AND the single-step tail fallback."""
    cfg1, _ = _run(tmp_path, "hs_spd1", host_stream="true",
                   steps_per_dispatch=1, max_epochs=2)
    cfg3, _ = _run(tmp_path, "hs_spd3", host_stream="true",
                   steps_per_dispatch=3, max_epochs=2)
    _assert_same_params(_load_ckpt(cfg1, tmp_path, "hs_spd1"),
                        _load_ckpt(cfg3, tmp_path, "hs_spd3"))


def test_host_stream_simmatch_bank_matches_device_cache(tmp_path):
    """SimMatch's instance bank is DATASET-index addressed
    (``simmatch_model.py:140-147``); host-stream virtual caches must
    thread the sampled indices through (``dataset_indices``) — with the
    raw gather index (arange(B)) only the first l_batch slots would
    ever be written."""
    import jax

    over = dict(name="config_dvm_MultiSimMatch", host_stream="false",
                steps_per_dispatch=1, DA="false")
    cfg_d, _ = _run(tmp_path, "sim_device", **over)
    over["host_stream"] = "true"
    cfg_h, _ = _run(tmp_path, "sim_host", **over)

    sd = _load_ckpt(cfg_d, tmp_path, "sim_device")
    sh = _load_ckpt(cfg_h, tmp_path, "sim_host")
    _assert_same_params(sd, sh)
    # every labeled sample's slot written, identically in both modes
    np.testing.assert_array_equal(np.asarray(sd.extra["bank_labels"]),
                                  np.asarray(sh.extra["bank_labels"]))
    bank_diff = float(np.max(np.abs(
        np.asarray(sd.extra["bank"], np.float32)
        - np.asarray(sh.extra["bank"], np.float32))))
    assert bank_diff < 5e-3, bank_diff
    # the epoch covers all 8 labeled samples -> more than l_batch
    # distinct slots must differ from the (deterministic, key(7)) init
    # bank; the pre-fix host-stream bug wrote only slots 0..l_batch-1
    import jax.numpy as jnp
    init_bank = jax.random.normal(
        jax.random.key(7), (int(cfg_h.projection_dim), int(cfg_h.K)),
        jnp.float32)
    init_bank = init_bank / jnp.linalg.norm(init_bank, axis=0,
                                            keepdims=True)
    touched = np.where(np.any(
        np.abs(np.asarray(sh.extra["bank"]) - np.asarray(init_bank))
        > 1e-6, axis=0))[0]
    l_batch = int(cfg_h.batch_size) // (1 + int(cfg_h.unlabelled_ratio))
    assert len(touched) > l_batch, touched


def test_host_stream_memmap_backed_source(tmp_path):
    """host_stream over genuinely memmap-backed splits (the >HBM
    scenario it exists for): native artifact dirs loaded with
    mmap_mode='r', block dispatch on."""
    from stil_tta_tpu.data.datasets import load_sources
    from stil_tta_tpu.data.source import synthetic_source
    from tests.helpers import FIELD_LENGTHS, NUM_CLASSES, STORED

    root = tmp_path / "native"
    sizes = {"train_labelled": (8, 1.0), "train_unlabelled": (24, 0.0),
             "val": (16, 1.0), "test": (16, 1.0)}
    for i, (split, (n, frac)) in enumerate(sizes.items()):
        synthetic_source(n, num_classes=NUM_CLASSES,
                         field_lengths=FIELD_LENGTHS, image_size=STORED,
                         labelled_frac=frac, seed=i).save(root / split)

    cfg, res = _run(tmp_path, "hs_mmap", host_stream="true",
                    steps_per_dispatch=3, synthetic="false",
                    data_base=str(root))
    assert np.isfinite(res["best_val"])

    # the loaded training splits really are memmaps
    src = load_sources(cfg)["train_unlabelled"]
    assert isinstance(src.images, np.memmap)
