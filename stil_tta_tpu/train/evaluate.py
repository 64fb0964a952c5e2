"""Training driver ("evaluate" in the reference's vocabulary).

Parity target: ``/root/reference/trainers/evaluate.py:93-219`` — build
the labeled/unlabeled/val loaders, instantiate the algorithm, fit with
best-checkpointing + early stopping on ``eval.val.{acc|auc}``, then test
with the best checkpoint and dump CSVs.

TPU-shaped differences:
- the unlabeled stream defines the epoch; the labeled stream cycles
  (PL combined-loader semantics, SURVEY.md §3.1); train batches are
  dropped-last for static shapes;
- both streams live in HBM (:class:`DeviceCache`) and the loop only
  ships int32 index vectors to the device;
- validation/test run a jitted forward and compute exact metrics
  host-side (sklearn AUROC == torchmetrics within fp tolerance).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.algorithms.registry import get_algorithm
from stil_tta_tpu.utils import jax_setup
from stil_tta_tpu.data.datasets import (apply_sweep_truncation,
                                         attach_missing_masks,
                                         load_sources)
from stil_tta_tpu.data.loader import (CyclingSampler, DeviceCache,
                                      EpochSampler)
from stil_tta_tpu.train import optim
from stil_tta_tpu.train.checkpoint import (restore_checkpoint,
                                           save_checkpoint,
                                           wait_for_checkpoints)
from stil_tta_tpu.utils.logging import MetricLogger


def compute_eval_metrics(probs: np.ndarray, labels: np.ndarray,
                         num_classes: int, prefix: str) -> Dict[str, float]:
    """acc + auc, binary tasks scored on class-1 probability
    (``STiLModel.py:461-464``)."""
    from sklearn.metrics import roc_auc_score
    out = {}
    if num_classes == 2:
        p1 = probs[:, 1]
        out[f"{prefix}.acc"] = float(((p1 >= 0.5).astype(int) == labels)
                                     .mean())
        try:
            out[f"{prefix}.auc"] = float(roc_auc_score(labels, p1))
        except ValueError:
            out[f"{prefix}.auc"] = 0.0
    else:
        out[f"{prefix}.acc"] = float((probs.argmax(1) == labels).mean())
        try:
            auc = float(roc_auc_score(
                labels, probs, multi_class="ovr", average="macro",
                labels=np.arange(num_classes)))
            # macro OVR is nan when some classes are absent in the data
            out[f"{prefix}.auc"] = 0.0 if np.isnan(auc) else auc
        except ValueError:
            out[f"{prefix}.auc"] = 0.0
    return out


def apply_batch_limit(n_batches: int, limit) -> int:
    """PyTorch-Lightning ``limit_{train,val,test}_batches`` semantics
    (``trainers/evaluate.py:178``): float in (0, 1] = fraction of the
    epoch, int = absolute batch cap, None/1.0 = everything."""
    if limit is None:
        return n_batches
    lim = float(limit)
    if lim < 0:
        raise ValueError(f"limit_*_batches must be >= 0, got {limit!r}")
    if lim == 0:
        return 0  # PL: 0 disables the loop entirely
    if lim <= 1.0 and not (isinstance(limit, int) and limit == 1):
        return max(int(n_batches * lim), 1)
    return min(n_batches, int(lim))


def run_validation(eval_step, params, batch_stats, cache, batch_size,
                   num_classes, prefix="eval.val",
                   limit_batches=None) -> Dict[str, float]:
    n = int(cache["labels"].shape[0])
    sampler = EpochSampler(n, batch_size, shuffle=False, drop_last=False)
    probs_m, probs_i, probs_t, ys = [], [], [], []
    outs = []
    max_b = apply_batch_limit(sampler.steps_per_epoch(), limit_batches) \
        if hasattr(sampler, "steps_per_epoch") else None
    if max_b == 0:  # loop disabled (limit_*_batches: 0)
        return {}
    for bi, (idx, w) in enumerate(sampler.epoch()):
        if max_b is not None and bi >= max_b:
            break
        # async dispatch; fetch after the loop so device work pipelines
        outs.append((eval_step(params, batch_stats, cache,
                               jnp.asarray(idx), jnp.asarray(w)), w))
    loss_sums: Dict[str, float] = {}
    loss_counts: Dict[str, int] = {}
    for out, w in outs:
        keep = w > 0
        full = bool(keep.all())
        probs_m.append(np.asarray(out["prob_m"])[keep])
        if "prob_i" in out:
            probs_i.append(np.asarray(out["prob_i"])[keep])
            probs_t.append(np.asarray(out["prob_t"])[keep])
        ys.append(np.asarray(out["labels"])[keep])
        for k, v in out.get("losses", {}).items():
            # embedding retrieval accuracy is skipped for non-full
            # batches, as the reference does (``STiLModel.py:437``)
            if k in ("top1", "top5") and not full:
                continue
            loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
            loss_counts[k] = loss_counts.get(k, 0) + 1
    y = np.concatenate(ys)
    metrics = compute_eval_metrics(np.concatenate(probs_m), y, num_classes,
                                   prefix)
    if probs_i:
        metrics.update(compute_eval_metrics(
            np.concatenate(probs_i), y, num_classes, f"{prefix}_imaging"))
        metrics.update(compute_eval_metrics(
            np.concatenate(probs_t), y, num_classes, f"{prefix}_tabular"))
        # rename to the reference's stream names
        metrics[f"{prefix}.acc_imaging"] = metrics.pop(
            f"{prefix}_imaging.acc")
        metrics[f"{prefix}.auc_imaging"] = metrics.pop(
            f"{prefix}_imaging.auc")
        metrics[f"{prefix}.acc_tabular"] = metrics.pop(
            f"{prefix}_tabular.acc")
        metrics[f"{prefix}.auc_tabular"] = metrics.pop(
            f"{prefix}_tabular.auc")
    if prefix == "eval.val":  # reference logs val losses only
        for k, v in loss_sums.items():
            metrics[f"multimodal.val.{k}"] = v / max(loss_counts[k], 1)
    return metrics


def evaluate(cfg, logdir: Optional[Path] = None) -> Dict[str, float]:
    logdir = Path(logdir or cfg.logdir or "runs/eval")
    logdir.mkdir(parents=True, exist_ok=True)
    logger = MetricLogger(logdir, echo=bool(cfg.enable_progress_bar))

    sources = attach_missing_masks(
        apply_sweep_truncation(load_sources(cfg), cfg), cfg)
    src_l, src_u = sources["train_labelled"], sources["train_unlabelled"]
    field_lengths = src_l.field_lengths
    num_classes = int(cfg.num_classes or src_l.num_classes)
    cfg.num_classes = num_classes

    # batch split + repeat_ratio (``trainers/evaluate.py:83-88``)
    batch_size = int(cfg.batch_size)
    ur = int(cfg.unlabelled_ratio or 1)
    l_batch = max(batch_size // (1 + ur), 1)
    u_batch = batch_size - l_batch
    cfg.repeat_ratio = max(len(src_u) // (ur * max(len(src_l), 1)) - 1, 1)
    if cfg.algorithm_name == "SimMatch" and not cfg.K:
        # instance bank holds one embedding per labeled sample
        # (``trainers/evaluate.py:60-61``)
        cfg.K = len(src_l)

    algo = get_algorithm(cfg.algorithm_name)(cfg, field_lengths)
    # host_stream: for datasets larger than HBM, train batches are
    # gathered on the host (native C++ gather + prefetch thread) and the
    # fused step consumes per-batch "virtual caches" via identity
    # gather; the full tabular table still lives on device so the
    # corruption marginals stay exact (``marginal_table``). Val/test
    # stay HBM-cached (eval splits are small).
    use_host_stream = bool(cfg.host_stream)
    if use_host_stream:
        cache_l = cache_u = None
        marg_l = jax.device_put(np.asarray(src_l.tabular, np.float32))
        marg_u = jax.device_put(np.asarray(src_u.tabular, np.float32))
    else:
        cache_l = DeviceCache(src_l).as_dict()
        cache_u = DeviceCache(src_u).as_dict()
    cache_val = DeviceCache(sources["val"]).as_dict()

    # hardware rbg keys on TPU (threefry key-derivation chains cost
    # ~1.2 ms/step in the fused train step; jax_setup.training_key)
    rng = jax_setup.training_key(int(cfg.seed or 0))
    sample_img = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    sample_tab = jnp.asarray(src_l.tabular[:2])
    state = algo.init_state(rng, sample_img, sample_tab)

    if cfg.resume_training and cfg.checkpoint:
        # resume full training state (params/EMA/opt/buffers/step) from
        # the checkpoint — reference ``run.py:48-63`` + Lightning restore
        ckpt = Path(cfg.checkpoint)
        state = restore_checkpoint(ckpt.parent, state, name=ckpt.name)
        print(f"Resumed training state from {ckpt} at step "
              f"{int(state.step)}")
    elif cfg.checkpoint and str(cfg.checkpoint).endswith((".ckpt", ".pth")):
        # TIP-pretrained torch warm start of the encoders
        # (``STiLModel_backbone.py:69-90``)
        import dataclasses as _dc
        from stil_tta_tpu.train.convert import load_pretrained_encoders
        variables = load_pretrained_encoders(
            {"params": state.params, "batch_stats": state.batch_stats},
            str(cfg.checkpoint))
        state = _dc.replace(state, params=variables["params"],
                            batch_stats=variables.get("batch_stats",
                                                      state.batch_stats))
    if cfg.checkpoint_SAINT:
        # SAINT weights from a separate .pth
        # (``STiLModel_SAINT_backbone.py:144-146``)
        import dataclasses as _dc
        from stil_tta_tpu.train.convert import (load_saint_state_dict,
                                                load_torch_checkpoint)
        sd = load_torch_checkpoint(str(cfg.checkpoint_SAINT))
        backbone = dict(state.params["backbone"])
        converted, n_used = load_saint_state_dict(
            {"params": backbone["encoder_tabular"]}, sd)
        backbone["encoder_tabular"] = converted["params"]
        params = dict(state.params)
        params["backbone"] = backbone
        print(f"Loaded SAINT weights ({n_used} tensors) from "
              f"{cfg.checkpoint_SAINT}")
        state = _dc.replace(state, params=params)

    from stil_tta_tpu.utils.jax_setup import lazy_tuned
    train_step = lazy_tuned(algo.make_train_step())
    eval_step = lazy_tuned(algo.make_eval_step())
    spd = int(cfg.steps_per_dispatch or 1)
    scan_step = scan_stream = None
    if spd > 1:
        from stil_tta_tpu.train.multistep import make_scan_train_step
        scan_step = lazy_tuned(make_scan_train_step(
            algo.make_train_step(), spd))

    seed0 = int(cfg.seed or 0)

    def make_samplers(epoch_idx: int):
        """Fresh per-epoch samplers seeded by (run seed, epoch id): the
        data order is a pure function of the epoch, so a resumed run
        replays the uninterrupted trajectory EXACTLY (a persistent
        RandomState would hand a resumed epoch k the permutation epoch
        0 saw). Also matches Lightning's per-epoch behavior — the
        combined loader recreates its iterators (labeled loader
        restarts + reshuffles) every epoch."""
        u = EpochSampler(len(src_u), u_batch, shuffle=True,
                         drop_last=True, seed=seed0 + 100003 * epoch_idx)
        if cfg.weighted_sampler and cfg.weights:
            from stil_tta_tpu.data.loader import WeightedSampler
            l = WeightedSampler(src_l.labels, cfg.weights, l_batch,
                                seed=seed0 + 100003 * epoch_idx + 1)
        else:
            l = CyclingSampler(len(src_l), l_batch,
                               seed=seed0 + 100003 * epoch_idx + 1)
        return l, u

    u_sampler = make_samplers(0)[1]  # shape probe for steps_per_epoch

    eval_metric = cfg.eval_metric or ("acc" if cfg.target == "dvm"
                                      else "auc")
    monitor = f"eval.val.{eval_metric}"
    best = -np.inf
    es_best = -np.inf  # EarlyStopping tracks its own best with min_delta;
    # ModelCheckpoint saves on ANY improvement (Lightning semantics)
    vci = float(cfg.val_check_interval or 1.0)
    if vci < 1.0:
        # every shipped reference config uses 1.0; the key's only other
        # effect there is the EarlyStopping patience scale below
        raise ValueError(
            "val_check_interval < 1.0 (fractional mid-epoch validation) "
            "is not supported; validation runs per epoch "
            "(check_val_every_n_epoch)")
    patience = int((40 if cfg.sweep else 100) * (1.0 / vci))
    bad_epochs = 0
    plateau = optim.PlateauScheduler(
        float(cfg.lr_eval), patience=int(10 / (cfg.check_val_every_n_epoch
                                               or 1)),
        min_lr=float(cfg.lr) * 1e-4, mode="max") \
        if cfg.scheduler == "linear" else None

    max_epochs = int(cfg.max_epochs)
    steps_per_epoch = apply_batch_limit(u_sampler.steps_per_epoch(),
                                        cfg.limit_train_batches)
    cfg.dataset_length = steps_per_epoch
    start_epoch_idx = int(state.step) // max(steps_per_epoch, 1)
    history = []
    val_metric_value = None
    for epoch in range(start_epoch_idx, max_epochs):
        lr = optim.scheduled_lr(cfg, epoch, val_metric_value, plateau)
        optim.set_learning_rate(state.opt_state, lr)
        t0 = time.time()
        epoch_arr = jnp.asarray(epoch, jnp.int32)
        l_sampler, u_sampler = make_samplers(epoch)
        if use_host_stream:
            from stil_tta_tpu.data.loader import (VIRTUAL_CACHE_KEYS,
                                                  CyclingEpochView,
                                                  HostStream)
            keys = VIRTUAL_CACHE_KEYS
            il = jnp.arange(l_batch, dtype=jnp.int32)
            iu = jnp.arange(u_batch, dtype=jnp.int32)
            l_stream = HostStream(
                src_l, CyclingEpochView(l_sampler, steps_per_epoch))
            u_stream = HostStream(src_u, u_sampler)
            if spd > 1:
                # ship (K, B) stacked blocks per dispatch — the
                # host-stream analog of steps_per_dispatch (one
                # transfer + one device call per K steps); tail
                # batches fall back to single steps
                if scan_stream is None:
                    from stil_tta_tpu.train.multistep import \
                        make_scan_stream_step
                    scan_stream = lazy_tuned(make_scan_stream_step(
                        algo.make_train_step(), spd))
                for (kind_l, bl), (kind_u, bu) in zip(
                        l_stream.epoch_blocks(spd, steps_per_epoch),
                        u_stream.epoch_blocks(spd, steps_per_epoch)):
                    assert kind_l == kind_u, (kind_l, kind_u)
                    vl = {k: bl[k] for k in keys if k in bl}
                    vu = {k: bu[k] for k in keys if k in bu}
                    if kind_l == "block":
                        state = scan_stream(state, vl, vu, marg_l,
                                            marg_u, il, iu, epoch_arr)
                    else:
                        vl["marginal"], vu["marginal"] = marg_l, marg_u
                        state = train_step(state, vl, vu, il, iu,
                                           epoch_arr)
            else:
                for bi, (bl, bu) in enumerate(zip(l_stream.epoch(),
                                                  u_stream.epoch())):
                    if bi >= steps_per_epoch:  # limit_train_batches cap
                        break
                    vl = {k: bl[k] for k in keys if k in bl}
                    vu = {k: bu[k] for k in keys if k in bu}
                    vl["marginal"], vu["marginal"] = marg_l, marg_u
                    state = train_step(state, vl, vu, il, iu, epoch_arr)
            pairs = []
        else:
            pairs = [(l_sampler.next()[0], idx_u)
                     for idx_u, _ in u_sampler.epoch()][:steps_per_epoch]
        if not use_host_stream and scan_step is not None:
            from stil_tta_tpu.train.multistep import chunk_indices
            blocks, tail = chunk_indices(pairs, spd)
            for il_k, iu_k in blocks:
                state = scan_step(state, cache_l, cache_u,
                                  jnp.asarray(il_k), jnp.asarray(iu_k),
                                  epoch_arr)
            pairs = tail
        for idx_l, idx_u in pairs:
            state = train_step(state, cache_l, cache_u,
                               jnp.asarray(idx_l), jnp.asarray(idx_u),
                               epoch_arr)
        state, train_logs = algo.epoch_end(state)
        dt = time.time() - t0
        train_logs["lr"] = lr
        train_logs["samples_per_sec"] = (
            steps_per_epoch * batch_size / max(dt, 1e-9))
        logger.log(train_logs, step=epoch, prefix="multimodal.train.")

        if epoch % int(cfg.check_val_every_n_epoch or 1) == 0:
            val_metrics = run_validation(
                eval_step, state.params, state.batch_stats, cache_val,
                batch_size, num_classes,
                limit_batches=cfg.limit_val_batches)
            logger.log(val_metrics, step=epoch)
            val_metric_value = val_metrics.get(monitor)
            history.append(val_metrics)
            if val_metric_value is not None and val_metric_value > best:
                best = val_metric_value
                if cfg.save_checkpoints is None or cfg.save_checkpoints:
                    save_checkpoint(logdir, state, cfg.to_dict(),
                                    name=f"checkpoint_best_{eval_metric}",
                                    block=not cfg.async_checkpoints)
            # the 1e-4 min_delta applies to early stopping only
            # (reference EarlyStopping(min_delta=1e-4); ModelCheckpoint
            # has no delta — ``trainers/evaluate.py:173-174``)
            if val_metric_value is not None and \
                    val_metric_value > es_best + 1e-4:
                es_best = val_metric_value
                bad_epochs = 0
            elif val_metrics:
                # only a validation run that produced metrics counts
                # toward patience; limit_val_batches: 0 disables the
                # loop entirely (PL semantics) and must not trickle
                # into early stopping
                bad_epochs += 1
                if bad_epochs >= patience:
                    print(f"Early stopping at epoch {epoch}")
                    break
        if cfg.checkpoint_every_n_epochs and \
                (epoch + 1) % int(cfg.checkpoint_every_n_epochs) == 0:
            # crash-recovery snapshot (resume with
            # resume_training=True checkpoint=<logdir>/checkpoint_last)
            save_checkpoint(logdir, state, cfg.to_dict(),
                            name="checkpoint_last",
                            block=not cfg.async_checkpoints)

    wait_for_checkpoints()  # flush async saves before reading back
    logger.log({f"best.val.{eval_metric}": best}, step=max_epochs)
    logger.dump_csv("eval_results.csv")

    results = {"best_val": best}
    if cfg.test_and_eval:
        try:
            state = restore_checkpoint(logdir, state,
                                       name=f"checkpoint_best_{eval_metric}")
        except FileNotFoundError:
            pass
        cache_test = DeviceCache(sources["test"]).as_dict()
        test_metrics = run_validation(
            eval_step, state.params, state.batch_stats, cache_test,
            batch_size, num_classes, prefix="test",
            limit_batches=cfg.limit_test_batches)
        logger.log(test_metrics, step=max_epochs)
        logger.dump_csv("test_results.csv", test_metrics)
        results.update(test_metrics)
    return results
