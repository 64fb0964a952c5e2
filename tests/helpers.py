"""Shared test fixtures: tiny configs/sources for algorithm steps."""

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.config import load_config
from stil_tta_tpu.data.loader import DeviceCache
from stil_tta_tpu.data.source import synthetic_source

FIELD_LENGTHS = [5, 4, 2, 1, 1, 1]
NUM_CLASSES = 4
IMG = 32
STORED = 40


def tiny_cfg(name="config_dvm_STiL", **overrides):
    ov = [
        "dataset=synthetic_dvm", "models=resnet18",
        "batch_size=8", "unlabelled_ratio=3", f"img_size={IMG}",
        f"num_classes={NUM_CLASSES}",
        "tabular_embedding_dim=32", "multimodal_embedding_dim=32",
        "tabular_transformer_num_layers=1", "projection_dim=8",
        "start_epoch=0", "tta=false", "K=16",
    ] + [f"{k}={v}" for k, v in overrides.items()]
    cfg = load_config(name, overrides=ov)
    cfg.field_lengths = FIELD_LENGTHS
    cfg.repeat_ratio = 1
    return cfg


def tiny_data(n_l=16, n_u=24):
    src_l = synthetic_source(n_l, num_classes=NUM_CLASSES,
                             field_lengths=FIELD_LENGTHS, image_size=STORED,
                             labelled_frac=1.0, seed=0)
    src_u = synthetic_source(n_u, num_classes=NUM_CLASSES,
                             field_lengths=FIELD_LENGTHS, image_size=STORED,
                             labelled_frac=0.0, seed=1)
    return src_l, src_u


def run_two_steps(algo, src_l, src_u, l_batch=2, u_batch=6):
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    state = algo.init_state(jax.random.key(0),
                            jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                            jnp.asarray(src_l.tabular[:2]))
    step = algo.make_train_step()
    rs = np.random.RandomState(0)
    for i in range(2):
        idx_l = jnp.asarray(rs.randint(0, len(src_l), l_batch), jnp.int32)
        idx_u = jnp.asarray(rs.randint(0, len(src_u), u_batch), jnp.int32)
        state = step(state, cache_l, cache_u, idx_l, idx_u,
                     jnp.asarray(i + 1, jnp.int32))
    return state
