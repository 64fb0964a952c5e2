"""Exact-resume trajectory: crash after epoch 1 + resume must land on
bit-identical state to the uninterrupted run. This pins (a) the
full-state checkpoint (params/EMA/opt/buffers/PRNG key/step) and (b)
the per-epoch-seeded samplers — with a persistent sampler RandomState a
resumed epoch k would replay epoch 0's permutation and silently diverge
(the reference has the same defect: Lightning restores no sampler
state). Reference resume semantics: ``run.py:48-63``."""

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore")

COMMON = [
    "--config-name", "config_dvm_STiL",
    "dataset=synthetic_dvm", "models=resnet18",
    "batch_size=8", "unlabelled_ratio=3", "img_size=32",
    "synthetic_image_size=40", "synthetic_labelled=16",
    "synthetic_unlabelled=48", "synthetic_val=16", "synthetic_test=16",
    "start_epoch=0", "num_classes=4",
    "tabular_embedding_dim=32", "multimodal_embedding_dim=32",
    "tabular_transformer_num_layers=1", "projection_dim=8",
    "tta=false", "strict_prototypes=false", "test_and_eval=false",
    "enable_progress_bar=false", "checkpoint_every_n_epochs=1",
]


def _restore(logdir):
    import jax
    import jax.numpy as jnp

    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.config import load_config
    from stil_tta_tpu.train.checkpoint import restore_checkpoint
    cfg = load_config("config_dvm_STiL", overrides=COMMON[2:])
    cfg.field_lengths = [5, 4, 2] + [1] * 14
    cfg.repeat_ratio = cfg.repeat_ratio or 1
    algo = get_algorithm("STiL")(cfg, cfg.field_lengths)
    state = algo.init_state(
        jax.random.key(0), jnp.zeros((2, 32, 32, 3), jnp.float32),
        jnp.zeros((2, len(cfg.field_lengths)), jnp.float32))
    return restore_checkpoint(logdir, state, name="checkpoint_last")


@pytest.mark.parametrize("host_stream", ["false", "true"])
def test_resume_matches_uninterrupted(tmp_path, host_stream):
    import run as run_mod

    hs = f"host_stream={host_stream}"
    a = tmp_path / "straight"
    b = tmp_path / "interrupted"

    # A: two epochs uninterrupted
    assert run_mod.main(COMMON + [hs, "max_epochs=2",
                                  f"logdir={a}"]) == 0
    # B: one epoch, then resume from the crash-recovery snapshot
    assert run_mod.main(COMMON + [hs, "max_epochs=1",
                                  f"logdir={b}"]) == 0
    assert run_mod.main(COMMON + [
        hs, "max_epochs=2", "resume_training=true",
        f"checkpoint={b}/checkpoint_last", f"logdir={b}"]) == 0

    sa = _restore(a)
    sb = _restore(b)
    assert int(sa.step) == int(sb.step) > 0
    for name in ("params", "batch_stats", "ema_params",
                 "ema_batch_stats", "opt_state", "prototypes",
                 "prototypes_sum", "prototypes_count"):
        ta, tb = getattr(sa, name), getattr(sb, name)
        import jax
        la = jax.tree_util.tree_leaves(ta)
        lb = jax.tree_util.tree_leaves(tb)
        assert len(la) == len(lb), name
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)
