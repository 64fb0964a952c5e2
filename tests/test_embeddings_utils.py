"""Golden tests for utils/embeddings.py vs torch reference semantics
(``utils/utils.py:343-373``)."""

import numpy as np
import torch

from stil_tta_tpu.utils.embeddings import (calc_logits_labels,
                                           cos_sim_collate,
                                           cosine_similarity_matrix)


def _torch_cos_sim(embeddings, threshold):
    cos = torch.nn.CosineSimilarity(dim=0)
    n = len(embeddings)
    m = torch.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            v = cos(embeddings[i], embeddings[j]).item()
            m[i, j] = v
            m[j, i] = v
    if threshold:
        m = torch.threshold(m, threshold, 0)
    return m


def test_cosine_similarity_matrix_matches_torch():
    rng = np.random.RandomState(0)
    emb = rng.randn(7, 12).astype(np.float32)
    for thr in (None, 0.2):
        ours = np.asarray(cosine_similarity_matrix(emb, thr))
        ref = _torch_cos_sim([torch.tensor(e) for e in emb],
                             thr).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_cos_sim_collate_shapes_and_matrix():
    rng = np.random.RandomState(1)
    n = 5
    v1 = [rng.randn(3, 4, 4).astype(np.float32) for _ in range(n)]
    v2 = [rng.randn(3, 4, 4).astype(np.float32) for _ in range(n)]
    y = list(rng.randint(0, 3, n))
    emb = [rng.randn(6).astype(np.float32) for _ in range(n)]
    sv1, sv2, sy, sim = cos_sim_collate(v1, v2, y, emb, threshold=0.1)
    assert sv1.shape == (n, 3, 4, 4) and sv2.shape == (n, 3, 4, 4)
    assert sy.shape == (n,)
    ref = _torch_cos_sim([torch.tensor(e) for e in emb], 0.1).numpy()
    np.testing.assert_allclose(np.asarray(sim), ref, atol=1e-5)


def test_calc_logits_labels_matches_torch():
    rng = np.random.RandomState(2)
    a = rng.randn(6, 8).astype(np.float32)
    b = rng.randn(6, 8).astype(np.float32)
    logits, labels = calc_logits_labels(a, b, temperature=0.07)
    t0 = torch.nn.functional.normalize(torch.tensor(a), dim=1)
    t1 = torch.nn.functional.normalize(torch.tensor(b), dim=1)
    ref = (t0 @ t1.T / 0.07).numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(labels), np.arange(6))
