"""CoMatch train-step golden parity vs an independent torch twin
(VERDICT r2 #3: the two ring queues + DA history are the likeliest
silent-divergence buffers; SimMatch's bank twin already exists).

Twin semantics from the reference:
``comatch_model.py:208-323`` (student on cat(x, u_s0); params-only
momentum lerp ``:108-114``; TRAIN-mode momentum encoder on
cat(x, u_w, u_s1) ``:244-253`` — never switched to eval, so it
normalises by current-batch statistics; DA over a 128-deep history of
batch-mean probs ``:270-284``; memory-smoothed refinement after
``start_epoch`` ``:287-293``; pseudo-label graph Q ``:295-306``;
boundary-truncating ring enqueues ``:116-146,314-321``) and
``CoMatch.py:76-117`` (masked soft CE + graph-contrastive loss with
``lam_c = min(epoch+1, lam_c)`` ramp and the ``epoch <= start_epoch``
supervised-only gate).

Both ring pointers are pre-advanced so each enqueue crosses the K
boundary (the truncation path), and the DA history ring starts
part-filled; strong view s1 is a deterministic horizontal flip so the
two queues receive distinct features.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn as nn
import torch.nn.functional as F

from stil_tta_tpu.algorithms.comatch import CoMatch
from stil_tta_tpu.train.convert import convert_torch_state_dict
from tests.test_simmatch_step_parity import TSimMatchNet, _to_sd, _Cfg

B_L, B_U = 4, 12
IMG = 32
NCLS = 4
DIM = 16          # projection dim
K = 16            # queue length (tiny so one batch wraps it)
TEMP = 0.1
ALPHA = 0.9
THR = 0.3
CONTRAST_TH = 0.5
LAM_U, LAM_C_MAX = 1.0, 5.0
MOMENTUM = 0.9
LR = 1.0          # SGD twin: the post-step param delta IS the gradient
EPOCH = 1         # > start_epoch=0: smoothing + full loss + lam_c=2
HIST_FILL = 3     # DA history rows already present


def torch_comatch_step(tm, ema, img_x, img_u, y_l, qs, pu, qw, pxu,
                       ptr_s, ptr_w, hist, lr=LR):
    """One reference CoMatch training step + SGD(lr) update. Returns
    (logs, queues..., hist); mutates tm/ema in place."""
    tm.train()
    ema.train()  # the reference never switches the momentum encoder
    opt = torch.optim.SGD(tm.parameters(), lr=lr)

    img_u_w, img_u_s0 = img_u, img_u
    img_u_s1 = torch.flip(img_u, dims=[3])

    # student on cat(x, u_s0) (comatch_model.py:234-242)
    logits, feats = tm(torch.cat([img_x, img_u_s0]))
    outputs_x, outputs_us0 = logits[:B_L], logits[B_L:]
    features_us0 = feats[B_L:]

    with torch.no_grad():
        # params-only momentum lerp (:108-114)
        for p, pm in zip(tm.parameters(), ema.parameters()):
            pm.data.mul_(MOMENTUM).add_((1 - MOMENTUM) * p.data)
        # train-mode momentum forward on cat(x, u_w, u_s1) (:244-253)
        outputs_m, features_m = ema(
            torch.cat([img_x, img_u_w, img_u_s1]))
        outputs_uw = outputs_m[B_L:B_L + B_U]
        feature_uw = features_m[B_L:B_L + B_U]
        feature_xuw = features_m[:B_L + B_U]
        features_us1 = features_m[B_L + B_U:]

        probs = torch.softmax(outputs_uw, dim=1)
        hist = hist + [probs.mean(0)]           # (:270-284)
        if len(hist) > 128:
            hist.pop(0)
        probs_avg = torch.stack(hist, dim=0).mean(0)
        probs = probs / probs_avg
        probs = probs / probs.sum(dim=1, keepdim=True)
        probs_orig = probs.clone()

        # memory smoothing after start_epoch (:287-293)
        a = torch.exp(feature_uw @ qw / TEMP)
        a = a / a.sum(1, keepdim=True)
        probs = ALPHA * probs + (1 - ALPHA) * (a @ pxu.t())

        # pseudo-label graph (:295-306)
        q_self = probs @ probs.t()
        q_self.fill_diagonal_(1)
        q = torch.cat([q_self, probs @ pu], dim=1)
        mask = probs.max(1).values.ge(THR).float()

    # embedding graph + losses (CoMatch.py:88-117)
    loss_x = F.cross_entropy(outputs_x, y_l)
    loss_u = (torch.sum(-F.log_softmax(outputs_us0, dim=1)
                        * probs, dim=1) * mask).mean()
    sim_self = torch.exp(features_us0 @ features_us1.t() / TEMP)
    sim_past = torch.exp(features_us0 @ qs / TEMP)
    sim = torch.cat([sim_self, sim_past], dim=1)
    pos_mask = (q >= CONTRAST_TH).float()
    q_mask = q * pos_mask
    q_mask = q_mask / q_mask.sum(1, keepdim=True)
    pos_probs = sim * pos_mask / sim.sum(1, keepdim=True)
    log_probs = torch.log(pos_probs + 1e-7) * pos_mask
    loss_contrast = (-(log_probs * q_mask).sum(1)).mean()
    lam_c = min(EPOCH + 1, LAM_C_MAX)
    loss = loss_x + LAM_U * loss_u + lam_c * loss_contrast

    opt.zero_grad()
    loss.backward()
    opt.step()

    # boundary-truncating ring enqueues (:116-146, 314-321)
    def enqueue(queue, probs_q, ptr, z, t):
        bs = z.shape[0]
        if ptr + bs > K:
            bs = K - ptr
            z, t = z[:bs], t[:bs]
        queue[:, ptr:ptr + bs] = z.t()
        probs_q[:, ptr:ptr + bs] = t.t()
        return (ptr + bs) % K

    with torch.no_grad():
        qs, pu, qw, pxu = (x.clone() for x in (qs, pu, qw, pxu))
        ptr_s = enqueue(qs, pu, ptr_s, features_us1, probs)
        onehot = torch.zeros(B_L, NCLS).scatter(1, y_l.view(-1, 1), 1)
        ptr_w = enqueue(qw, pxu, ptr_w,
                        feature_xuw, torch.cat([onehot, probs_orig]))

    f = lambda t: float(t.detach())
    return ({"loss": f(loss), "loss_x": f(loss_x), "loss_u": f(loss_u),
             "loss_contrast": f(loss_contrast),
             "threshold1_ratio": float(mask.mean())},
            qs, pu, qw, pxu, ptr_s, ptr_w, hist)


def test_comatch_train_step_golden_vs_torch():
    torch.manual_seed(3)
    tm = TSimMatchNet()
    torch.manual_seed(7)
    ema = TSimMatchNet()
    with torch.no_grad():
        for net in (tm, ema):
            for mod in net.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(1)
    img_x = rng.rand(B_L, IMG, IMG, 3).astype(np.float32)
    y_l = rng.randint(0, NCLS, B_L).astype(np.int64)
    img_u = rng.rand(B_U, IMG, IMG, 3).astype(np.float32)
    norm_cols = lambda m: m / np.linalg.norm(m, axis=0, keepdims=True)
    qs0 = norm_cols(rng.randn(DIM, K)).astype(np.float32)
    qw0 = rng.randn(DIM, K).astype(np.float32)
    pu0 = rng.rand(NCLS, K).astype(np.float32)
    pu0 /= pu0.sum(0, keepdims=True)
    pxu0 = rng.rand(NCLS, K).astype(np.float32)
    pxu0 /= pxu0.sum(0, keepdims=True)
    hist0 = [rng.rand(NCLS).astype(np.float32) for _ in range(HIST_FILL)]
    hist0 = [h / h.sum() for h in hist0]
    PTR_S, PTR_W = 8, 6  # 8+12>K and 6+16>K: both enqueues truncate

    # ---- our side -----------------------------------------------------
    cfg = _Cfg(
        algorithm_name="CoMatch", eval_datatype="imaging",
        model="resnet18", num_classes=NCLS, projection_dim=DIM, K=K,
        co_threshold=THR, contrast_th=CONTRAST_TH, lam_u=LAM_U,
        lam_c=LAM_C_MAX, alpha=ALPHA, co_temperature=TEMP,
        start_epoch=0, ema_momentum=MOMENTUM, use_ema=True,
        lr_eval=LR, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = CoMatch(cfg, [1], dtype=jnp.float32)
    ident = lambda k, im, apply_rate=1.0: im.astype(jnp.float32)
    algo.aug_labeled = ident
    algo.aug_weak = ident
    # two_strong traces aug_strong twice, in source order (s0 then s1):
    # s0 = identity, s1 = deterministic horizontal flip
    calls = []
    def strong(k, im):
        first = not calls
        calls.append(1)
        return (im if first else jnp.flip(im, axis=2)).astype(jnp.float32)
    algo.aug_strong = strong
    algo.tx = optax.sgd(LR)

    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(img_x[:2]),
                            jnp.zeros((2, 1), jnp.float32))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    converted, leftovers = convert_torch_state_dict(_to_sd(tm), variables)
    assert not leftovers, leftovers
    conv_ema, _ = convert_torch_state_dict(_to_sd(ema), variables)
    hist_prob0 = np.zeros((128, NCLS), np.float32)
    hist_prob0[:HIST_FILL] = np.stack(hist0)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_ema["params"],
        ema_batch_stats=conv_ema["batch_stats"],
        extra={"queue_s": jnp.asarray(qs0), "probs_u": jnp.asarray(pu0),
               "queue_w": jnp.asarray(qw0), "probs_xu": jnp.asarray(pxu0),
               "ptr_s": jnp.asarray(PTR_S, jnp.int32),
               "ptr_w": jnp.asarray(PTR_W, jnp.int32),
               "hist_prob": jnp.asarray(hist_prob0),
               "hist_len": jnp.asarray(HIST_FILL, jnp.int32),
               "hist_ptr": jnp.asarray(HIST_FILL, jnp.int32)})

    cache_l = {"images": jnp.asarray(img_x),
               "tabular": jnp.zeros((B_L, 1), jnp.float32),
               "labels": jnp.asarray(y_l),
               "labelled": jnp.ones((B_L,), bool)}
    cache_u = {"images": jnp.asarray(img_u),
               "tabular": jnp.zeros((B_U, 1), jnp.float32),
               "labels": jnp.zeros((B_U,), jnp.int32),
               "labelled": jnp.zeros((B_U,), bool)}
    step = algo.make_train_step()
    new_state = step(state, cache_l, cache_u,
                     jnp.arange(B_L, dtype=jnp.int32),
                     jnp.arange(B_U, dtype=jnp.int32),
                     jnp.asarray(EPOCH, jnp.int32))

    # ---- torch twin ---------------------------------------------------
    t = lambda a: torch.tensor(np.asarray(a))
    logs, qs_t, pu_t, qw_t, pxu_t, ptr_s_t, ptr_w_t, hist_t = \
        torch_comatch_step(
            tm, ema, t(img_x.transpose(0, 3, 1, 2)),
            t(img_u.transpose(0, 3, 1, 2)), t(y_l),
            t(qs0), t(pu0), t(qw0), t(pxu0), PTR_S, PTR_W,
            [t(h) for h in hist0])
    da_row = hist_t[-1]

    # losses / mask ratio
    ours = {k: float(v) for k, v in new_state.log_sums.items()}
    for k, v in logs.items():
        np.testing.assert_allclose(ours[k], v, rtol=2e-3, atol=2e-4,
                                   err_msg=f"log {k}")

    # ring queues: contents, pointers (both crossed the K boundary)
    ex = new_state.extra
    assert int(ex["ptr_s"]) == ptr_s_t == 0
    assert int(ex["ptr_w"]) == ptr_w_t == 0
    for ours_q, ref_q, name in (
            (ex["queue_s"], qs_t, "queue_s"), (ex["probs_u"], pu_t,
                                               "probs_u"),
            (ex["queue_w"], qw_t, "queue_w"), (ex["probs_xu"], pxu_t,
                                               "probs_xu")):
        np.testing.assert_allclose(np.asarray(ours_q), ref_q.numpy(),
                                   rtol=2e-3, atol=2e-4, err_msg=name)

    # DA history ring: new row written at the fill pointer
    np.testing.assert_allclose(
        np.asarray(ex["hist_prob"][HIST_FILL]), da_row.numpy(),
        rtol=1e-3, atol=1e-5)
    assert int(ex["hist_len"]) == HIST_FILL + 1
    assert int(ex["hist_ptr"]) == HIST_FILL + 1

    # momentum encoder: params-only lerp; its BN stats stay frozen at
    # the init copy on our side (the reference mutates them during the
    # train-mode forward but never reads them — comatch.py NOTE)
    conv_post, _ = convert_torch_state_dict(_to_sd(ema), variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        new_state.ema_params, conv_post["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b)),
        new_state.ema_batch_stats, conv_ema["batch_stats"])

    # student BN running stats after the cat(x, u_s0) train forward
    conv_student, _ = convert_torch_state_dict(_to_sd(tm), variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        new_state.batch_stats, conv_student["batch_stats"])

    # gradients via the SGD delta — whole-model relative L2
    ga = np.concatenate([
        np.asarray(n - o, np.float64).ravel() for n, o in zip(
            jax.tree_util.tree_leaves(new_state.params),
            jax.tree_util.tree_leaves(converted["params"]))])
    gb = np.concatenate([
        np.asarray(n - o, np.float64).ravel() for n, o in zip(
            jax.tree_util.tree_leaves(conv_student["params"]),
            jax.tree_util.tree_leaves(converted["params"]))])
    rel = np.linalg.norm(ga - gb) / max(np.linalg.norm(gb), 1e-8)
    assert np.linalg.norm(gb) > 1e-3
    assert rel < 0.02, rel


def test_comatch_three_step_state_trajectory_vs_torch():
    """3-step state-machine trajectory vs the torch twin at lr=0: with
    params frozen, every source of cross-impl float drift except the
    buffer dynamics vanishes, isolating exactly the state the reference
    threads across steps — both ring queues (each pointer wraps the K
    boundary twice), the DA history growth, the momentum-encoder lerp
    compounding, and the student's BN running-stat accumulation. The
    1-step test above covers losses/gradients; this one proves the
    step-to-step threading doesn't silently diverge."""
    steps = 3
    torch.manual_seed(3)
    tm = TSimMatchNet()
    torch.manual_seed(7)
    ema = TSimMatchNet()
    with torch.no_grad():
        for net in (tm, ema):
            for mod in net.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.05)
                    mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(21)
    img_x = rng.rand(steps * B_L, IMG, IMG, 3).astype(np.float32)
    y_l = rng.randint(0, NCLS, steps * B_L).astype(np.int64)
    img_u = rng.rand(steps * B_U, IMG, IMG, 3).astype(np.float32)
    norm_cols = lambda m: m / np.linalg.norm(m, axis=0, keepdims=True)
    qs0 = norm_cols(rng.randn(DIM, K)).astype(np.float32)
    qw0 = rng.randn(DIM, K).astype(np.float32)
    pu0 = rng.rand(NCLS, K).astype(np.float32)
    pu0 /= pu0.sum(0, keepdims=True)
    pxu0 = rng.rand(NCLS, K).astype(np.float32)
    pxu0 /= pxu0.sum(0, keepdims=True)
    hist0 = [rng.rand(NCLS).astype(np.float32) for _ in range(HIST_FILL)]
    hist0 = [h / h.sum() for h in hist0]
    PTR_S, PTR_W = 8, 6

    # ---- our side -----------------------------------------------------
    cfg = _Cfg(
        algorithm_name="CoMatch", eval_datatype="imaging",
        model="resnet18", num_classes=NCLS, projection_dim=DIM, K=K,
        co_threshold=THR, contrast_th=CONTRAST_TH, lam_u=LAM_U,
        lam_c=LAM_C_MAX, alpha=ALPHA, co_temperature=TEMP,
        start_epoch=0, ema_momentum=MOMENTUM, use_ema=True,
        lr_eval=0.0, weight_decay_eval=0.0, img_size=IMG,
        eval_train_augment_rate=0.0, augmentation_rate=0.0,
        corruption_rate=0.0, target="dvm", embedding_dropout=0.0,
        drop_rate=0.0)
    algo = CoMatch(cfg, [1], dtype=jnp.float32)
    ident = lambda k, im, apply_rate=1.0: im.astype(jnp.float32)
    algo.aug_labeled = ident
    algo.aug_weak = ident
    calls = []
    def strong(k, im):
        first = not calls
        calls.append(1)
        return (im if first else jnp.flip(im, axis=2)).astype(jnp.float32)
    algo.aug_strong = strong
    algo.tx = optax.sgd(0.0)

    state = algo.init_state(jax.random.key(0),
                            jnp.asarray(img_x[:2]),
                            jnp.zeros((2, 1), jnp.float32))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    converted, leftovers = convert_torch_state_dict(_to_sd(tm), variables)
    assert not leftovers, leftovers
    conv_ema, _ = convert_torch_state_dict(_to_sd(ema), variables)
    hist_prob0 = np.zeros((128, NCLS), np.float32)
    hist_prob0[:HIST_FILL] = np.stack(hist0)
    state = dataclasses.replace(
        state, params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=algo.tx.init(converted["params"]),
        ema_params=conv_ema["params"],
        ema_batch_stats=conv_ema["batch_stats"],
        extra={"queue_s": jnp.asarray(qs0), "probs_u": jnp.asarray(pu0),
               "queue_w": jnp.asarray(qw0), "probs_xu": jnp.asarray(pxu0),
               "ptr_s": jnp.asarray(PTR_S, jnp.int32),
               "ptr_w": jnp.asarray(PTR_W, jnp.int32),
               "hist_prob": jnp.asarray(hist_prob0),
               "hist_len": jnp.asarray(HIST_FILL, jnp.int32),
               "hist_ptr": jnp.asarray(HIST_FILL, jnp.int32)})

    cache_l = {"images": jnp.asarray(img_x),
               "tabular": jnp.zeros((steps * B_L, 1), jnp.float32),
               "labels": jnp.asarray(y_l),
               "labelled": jnp.ones((steps * B_L,), bool)}
    cache_u = {"images": jnp.asarray(img_u),
               "tabular": jnp.zeros((steps * B_U, 1), jnp.float32),
               "labels": jnp.zeros((steps * B_U,), jnp.int32),
               "labelled": jnp.zeros((steps * B_U,), bool)}
    step = algo.make_train_step()
    our_step_logs = []
    prev = {k: 0.0 for k in algo.LOG_KEYS}
    for s in range(steps):
        state = step(state, cache_l, cache_u,
                     jnp.arange(s * B_L, (s + 1) * B_L, dtype=jnp.int32),
                     jnp.arange(s * B_U, (s + 1) * B_U, dtype=jnp.int32),
                     jnp.asarray(EPOCH, jnp.int32))
        sums = {k: float(v) for k, v in state.log_sums.items()}
        our_step_logs.append({k: sums[k] - prev[k] for k in sums})
        prev = sums

    # ---- torch twin ---------------------------------------------------
    t = lambda a: torch.tensor(np.asarray(a))
    qs_t, pu_t, qw_t, pxu_t = t(qs0), t(pu0), t(qw0), t(pxu0)
    ptr_s_t, ptr_w_t = PTR_S, PTR_W
    hist_t = [t(h) for h in hist0]
    for s in range(steps):
        logs, qs_t, pu_t, qw_t, pxu_t, ptr_s_t, ptr_w_t, hist_t = \
            torch_comatch_step(
                tm, ema,
                t(img_x[s * B_L:(s + 1) * B_L].transpose(0, 3, 1, 2)),
                t(img_u[s * B_U:(s + 1) * B_U].transpose(0, 3, 1, 2)),
                t(y_l[s * B_L:(s + 1) * B_L]),
                qs_t, pu_t, qw_t, pxu_t, ptr_s_t, ptr_w_t, hist_t,
                lr=0.0)
        for k, v in logs.items():
            np.testing.assert_allclose(
                our_step_logs[s][k], v, rtol=2e-3, atol=2e-4,
                err_msg=f"step {s} log {k}")

    # ring queues after 3 steps: contents + pointers (each pointer
    # crossed the K boundary twice along the way)
    ex = state.extra
    assert int(ex["ptr_s"]) == ptr_s_t
    assert int(ex["ptr_w"]) == ptr_w_t
    for ours_q, ref_q, name in (
            (ex["queue_s"], qs_t, "queue_s"),
            (ex["probs_u"], pu_t, "probs_u"),
            (ex["queue_w"], qw_t, "queue_w"),
            (ex["probs_xu"], pxu_t, "probs_xu")):
        np.testing.assert_allclose(np.asarray(ours_q), ref_q.numpy(),
                                   rtol=2e-3, atol=2e-4, err_msg=name)

    # DA history: the three new rows, length, and fill pointer
    np.testing.assert_allclose(
        np.asarray(ex["hist_prob"][HIST_FILL:HIST_FILL + steps]),
        torch.stack(hist_t[-steps:]).numpy(), rtol=1e-3, atol=1e-5)
    assert int(ex["hist_len"]) == HIST_FILL + steps
    assert int(ex["hist_ptr"]) == HIST_FILL + steps

    # momentum encoder after 3 compounding lerps toward the (frozen)
    # student; BN stats stay at the init copy on our side
    conv_post, _ = convert_torch_state_dict(_to_sd(ema), variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        state.ema_params, conv_post["params"])

    # student BN running stats after 3 train-mode forwards
    conv_student, _ = convert_torch_state_dict(_to_sd(tm), variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        state.batch_stats, conv_student["batch_stats"])
