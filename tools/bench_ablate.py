#!/usr/bin/env python
"""Component-level timing of the STiL train step (analysis tool).

Times, on the real chip at the reference DVM shape: (a) augmentation
only, (b) student fwd, (c) student fwd+bwd+opt, (d) teacher fwd,
(e) the full fused step. Guides kernel-level optimisation.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time


def timeit(fn, *args, n=20):
    """Host-synced timing: block_until_ready can return early on the
    axon tunnel for independent dispatches, so we force a device->host
    read of a scalar derived from the last result (docs/DESIGN.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def probe(r):
        leaves = [t.astype(jnp.float32).sum()
                  for t in jax.tree_util.tree_leaves(r)
                  if hasattr(t, "astype")]
        return sum(leaves[:4]) if leaves else jnp.float32(0)

    r = fn(*args)
    float(probe(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(probe(r))
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stil_tta_tpu.utils import jax_setup
    jax_setup.setup()

    from stil_tta_tpu.algorithms.registry import get_algorithm
    from stil_tta_tpu.config import load_config
    from stil_tta_tpu.data.loader import DeviceCache
    from stil_tta_tpu.data.source import synthetic_source

    B, ur, S, C = 512, 7, 128, 286
    l_b = B // (1 + ur)
    u_b = B - l_b
    fl = [20, 10, 5, 3] + [1] * 13
    cfg = load_config("config_dvm_STiL", overrides=[
        "dataset=synthetic_dvm", "models=resnet50", f"batch_size={B}",
        f"num_classes={C}", "start_epoch=0", "tta=false"])
    cfg.field_lengths = fl
    cfg.repeat_ratio = 1

    src_l = synthetic_source(256, num_classes=C, field_lengths=fl,
                             image_size=S, seed=0)
    src_u = synthetic_source(1792, num_classes=C, field_lengths=fl,
                             image_size=S, labelled_frac=0, seed=1)
    algo = get_algorithm("STiL")(cfg, fl)
    cache_l = DeviceCache(src_l).as_dict()
    cache_u = DeviceCache(src_u).as_dict()
    state = algo.init_state(jax.random.key(0), jnp.zeros((2, S, S, 3)),
                            jnp.asarray(src_l.tabular[:2]))
    rs = np.random.RandomState(0)
    idx_l = jnp.asarray(rs.randint(0, 256, l_b), jnp.int32)
    idx_u = jnp.asarray(rs.randint(0, 1792, u_b), jnp.int32)
    epoch = jnp.asarray(1, jnp.int32)

    # (a) augmentation only
    @jax.jit
    def aug_only(key, cache_l, cache_u, idx_l, idx_u):
        il = jnp.take(cache_l["images"], idx_l, 0)
        iu = jnp.take(cache_u["images"], idx_u, 0)
        tl = jnp.take(cache_l["tabular"], idx_l, 0)
        tu = jnp.take(cache_u["tabular"], idx_u, 0)
        return algo._views(key, il, tl, iu, tu, cache_l["tabular"],
                           cache_u["tabular"])

    t_aug = timeit(aug_only, jax.random.key(0), cache_l, cache_u, idx_l,
                   idx_u)

    imgs = jnp.zeros((B, S, S, 3), jnp.float32)
    tabs = jnp.zeros((B, len(fl)), jnp.float32)

    # (b) student forward
    @jax.jit
    def fwd(params, bs, imgs, tabs):
        return algo.net.apply({"params": params, "batch_stats": bs},
                              imgs, tabs, train=False)["out_m"].sum()

    t_fwd = timeit(fwd, state.params, state.batch_stats, imgs, tabs)

    # (c) student fwd+bwd
    @jax.jit
    def fwdbwd(params, bs, imgs, tabs):
        def loss(p):
            outs, _ = algo.net.apply(
                {"params": p, "batch_stats": bs}, imgs, tabs, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)})
            return outs["out_m"].astype(jnp.float32).sum()
        return jax.grad(loss)(params)

    t_bwd = timeit(fwdbwd, state.params, state.batch_stats, imgs, tabs,
                   n=10)

    # (e) full step
    step = algo.make_train_step()
    def full(state):
        return step(state, cache_l, cache_u, idx_l, idx_u, epoch)
    state = full(state)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(20):
        state = full(state)
    jax.block_until_ready(state.params)
    t_full = (time.perf_counter() - t0) / 20

    print(f"aug_only     : {t_aug*1e3:8.2f} ms")
    print(f"student fwd  : {t_fwd*1e3:8.2f} ms")
    print(f"student f+b  : {t_bwd*1e3:8.2f} ms")
    print(f"full step    : {t_full*1e3:8.2f} ms "
          f"({B/t_full:,.0f} samples/s)")


if __name__ == "__main__":
    main()
