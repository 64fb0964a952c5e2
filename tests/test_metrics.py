import jax.numpy as jnp
import numpy as np

from stil_tta_tpu.ops import (accuracy_compute, accuracy_init,
                              accuracy_update, auroc_compute, auroc_init,
                              auroc_update)


def naive_auc(scores, labels):
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        return 0.0
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    return (gt + 0.5 * eq) / (len(pos) * len(neg))


def test_accuracy_multiclass_streaming():
    st = accuracy_init()
    rng = np.random.RandomState(0)
    all_preds, all_labels = [], []
    for _ in range(3):
        p = rng.rand(16, 5).astype(np.float32)
        y = rng.randint(0, 5, 16)
        st = accuracy_update(st, jnp.asarray(p), jnp.asarray(y))
        all_preds.append(p)
        all_labels.append(y)
    p = np.concatenate(all_preds)
    y = np.concatenate(all_labels)
    expected = (p.argmax(1) == y).mean()
    np.testing.assert_allclose(float(accuracy_compute(st)), expected,
                               rtol=1e-6)


def test_accuracy_binary_threshold():
    st = accuracy_init()
    p = np.array([0.1, 0.6, 0.5, 0.4], np.float32)
    y = np.array([0, 1, 1, 1])
    st = accuracy_update(st, jnp.asarray(p), jnp.asarray(y))
    # torchmetrics: prob >= 0.5 -> class 1
    np.testing.assert_allclose(float(accuracy_compute(st)), 3 / 4)


def test_accuracy_weighted_padding():
    st = accuracy_init()
    p = np.array([[0.9, 0.1], [0.9, 0.1]], np.float32)
    y = np.array([0, 1])
    w = np.array([1.0, 0.0])  # second sample is padding
    st = accuracy_update(st, jnp.asarray(p), jnp.asarray(y), jnp.asarray(w))
    np.testing.assert_allclose(float(accuracy_compute(st)), 1.0)


def test_auroc_binary_matches_naive():
    rng = np.random.RandomState(1)
    scores = rng.rand(500).astype(np.float32)
    labels = rng.randint(0, 2, 500)
    st = auroc_init(num_classes=2)
    for i in range(0, 500, 100):
        st = auroc_update(st, jnp.asarray(scores[i:i + 100]),
                          jnp.asarray(labels[i:i + 100]))
    expected = naive_auc(scores, labels)
    np.testing.assert_allclose(float(auroc_compute(st)), expected, atol=2e-3)


def test_auroc_perfect_classifier():
    scores = np.array([0.9, 0.8, 0.2, 0.1], np.float32)
    labels = np.array([1, 1, 0, 0])
    st = auroc_init(num_classes=2)
    st = auroc_update(st, jnp.asarray(scores), jnp.asarray(labels))
    np.testing.assert_allclose(float(auroc_compute(st)), 1.0)


def test_auroc_multiclass_macro():
    rng = np.random.RandomState(2)
    probs = rng.rand(400, 3).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    labels = rng.randint(0, 3, 400)
    st = auroc_init(num_classes=3)
    st = auroc_update(st, jnp.asarray(probs), jnp.asarray(labels))
    per_class = [naive_auc(probs[:, c], (labels == c).astype(int))
                 for c in range(3)]
    np.testing.assert_allclose(float(auroc_compute(st)),
                               np.mean(per_class), atol=2e-3)
