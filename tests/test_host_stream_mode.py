"""host_stream training mode: host-gathered virtual caches must produce
the same training trajectory as the HBM DeviceCache path (the marginal
corruption table stays the full dataset via ``marginal_table``)."""

import numpy as np

from stil_tta_tpu.train.evaluate import evaluate
from tests.helpers import tiny_cfg


def _run(tmp_path, tag, **over):
    cfg = tiny_cfg(
        synthetic_image_size=40, synthetic_labelled=8,
        synthetic_unlabelled=24, synthetic_val=16, synthetic_test=16,
        max_epochs=1, strict_prototypes="false", test_and_eval="false",
        enable_progress_bar="false", save_checkpoints="true", **over)
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
