"""Evaluation-harness tests with analytically known answers."""

import numpy as np
import pytest

from videoprism_tpu import evaluation


def _orthonormal(n, d, seed=0):
  rng = np.random.default_rng(seed)
  q, _ = np.linalg.qr(rng.standard_normal((d, n)))
  return q.T[:n]


class TestRetrievalMetrics:

  def test_perfect_alignment(self):
    emb = _orthonormal(8, 16)
    m = evaluation.retrieval_metrics(emb, emb)
    assert m['v2t_recall@1'] == 1.0
    assert m['t2v_recall@1'] == 1.0
    assert m['v2t_median_rank'] == 1.0

  def test_known_confusion(self):
    # Video 0's nearest text is text 1 -> rank 1 for query 0.
    v = _orthonormal(4, 8, seed=1)
    t = v.copy()
    t[[0, 1]] = t[[1, 0]]  # swap texts 0 and 1
    m = evaluation.retrieval_metrics(v, t)
    assert m['v2t_recall@1'] == 0.5   # queries 2, 3 still perfect
    assert m['v2t_recall@5'] == 1.0

  def test_symmetry(self):
    rng = np.random.default_rng(2)
    v = rng.standard_normal((6, 8)).astype(np.float32)
    t = rng.standard_normal((6, 8)).astype(np.float32)
    m = evaluation.retrieval_metrics(v, t)
    m_swapped = evaluation.retrieval_metrics(t, v)
    assert m['v2t_recall@1'] == m_swapped['t2v_recall@1']

  def test_chunked_matches_unchunked(self):
    rng = np.random.default_rng(3)
    v = rng.standard_normal((37, 8)).astype(np.float32)
    t = rng.standard_normal((37, 8)).astype(np.float32)
    m_small = evaluation.retrieval_metrics(v, t, chunk_size=5)
    m_big = evaluation.retrieval_metrics(v, t, chunk_size=4096)
    assert m_small == m_big

  def test_ranks_matrix_helper(self):
    sim = np.array([[0.9, 0.1, 0.5],
                    [0.8, 0.2, 0.3],   # true score 0.2 beaten by 0.8, 0.3
                    [0.1, 0.2, 0.7]])
    np.testing.assert_array_equal(
        evaluation._ranks(sim), [0, 2, 0])
    np.testing.assert_array_equal(
        evaluation._ranks(sim, chunk_size=1), [0, 2, 0])

  @pytest.mark.slow
  def test_large_corpus_smoke(self):
    """100k-corpus sweep: chunked path stays O(chunk*N) memory and finishes
    fast; matched pairs with identical embeddings give perfect recall."""
    n, d = 100_000, 8
    rng = np.random.default_rng(4)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    m = evaluation.retrieval_metrics(v, v, ks=(1,), chunk_size=8192)
    assert m['v2t_recall@1'] == 1.0
    assert m['t2v_median_rank'] == 1.0


class TestZeroShotClassifier:

  def test_prompt_ensembling_and_normalization(self):
    d = 8
    calls = []

    def encode(texts):
      calls.append(list(texts))
      # Deterministic per-text embedding: hash -> basis vector mix.
      out = np.zeros((len(texts), d), np.float32)
      for i, t in enumerate(texts):
        out[i, hash(t) % d] = 1.0
        out[i, (hash(t) // 7) % d] += 0.5
      return out

    classes = ['running', 'swimming', 'drumming']
    weights = evaluation.zero_shot_classifier(encode, classes,
                                              batch_size=5)
    assert weights.shape == (3, d)
    np.testing.assert_allclose(
        np.linalg.norm(weights, axis=-1), 1.0, atol=1e-6)
    # All class x template prompts were encoded (batched).
    total = sum(len(c) for c in calls)
    assert total == 3 * len(evaluation.DEFAULT_PROMPT_TEMPLATES)

  def test_classification_accuracy(self):
    scores = np.array([
        [0.9, 0.1, 0.0],   # correct (label 0)
        [0.2, 0.5, 0.3],   # correct (label 1)
        [0.6, 0.3, 0.1],   # wrong (label 2 ranked last)
    ])
    labels = np.array([0, 1, 2])
    m = evaluation.classification_accuracy(scores, labels, ks=(1, 2, 3))
    assert m['top1_accuracy'] == 2 / 3
    assert m['top3_accuracy'] == 1.0


class TestBootstrapCI:
  """Percentile-bootstrap confidence intervals on retrieval /
  classification metrics (resampled over queries, ranks computed once)."""

  @staticmethod
  def _paired(n=64, d=16, noise=1.5, seed=0):
    # noise=1.5 puts recall@1 mid-range (~0.5) so intervals have width.
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    t = v + noise * rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    return v, t

  def test_interval_brackets_point_estimate(self):
    v, t = self._paired()
    m = evaluation.retrieval_metrics(v, t, ks=(1, 5), bootstrap=200)
    for key in ('t2v_recall@1', 'v2t_recall@5', 't2v_median_rank'):
      lo, hi = m[f'{key}_ci_low'], m[f'{key}_ci_high']
      assert lo <= m[key] <= hi, (key, lo, m[key], hi)
      assert hi - lo > 0 or m[key] in (0.0, 1.0)

  def test_deterministic_under_seed(self):
    v, t = self._paired()
    a = evaluation.retrieval_metrics(v, t, ks=(1,), bootstrap=50, seed=3)
    b = evaluation.retrieval_metrics(v, t, ks=(1,), bootstrap=50, seed=3)
    assert a == b
    c = evaluation.retrieval_metrics(v, t, ks=(1,), bootstrap=50, seed=4)
    assert a != c

  def test_more_data_narrows_interval(self):
    widths = []
    for n in (32, 512):
      v, t = self._paired(n=n, seed=1)
      m = evaluation.retrieval_metrics(v, t, ks=(1,), bootstrap=200)
      widths.append(m['t2v_recall@1_ci_high'] - m['t2v_recall@1_ci_low'])
    assert widths[1] < widths[0]

  def test_perfect_retrieval_collapses_at_one(self):
    v, _ = self._paired(noise=0.0)
    m = evaluation.retrieval_metrics(v, v, ks=(1,), bootstrap=50)
    assert m['t2v_recall@1_ci_low'] == m['t2v_recall@1_ci_high'] == 1.0

  def test_classification_ci(self):
    rng = np.random.default_rng(2)
    labels = rng.integers(0, 5, 128)
    scores = rng.standard_normal((128, 5)).astype(np.float32)
    scores[np.arange(96), labels[:96]] += 2.0  # 75%-ish top-1
    m = evaluation.classification_accuracy(scores, labels, ks=(1,),
                                           bootstrap=200)
    lo, hi = m['top1_accuracy_ci_low'], m['top1_accuracy_ci_high']
    assert lo <= m['top1_accuracy'] <= hi
    assert 0.0 < lo < hi < 1.0

  def test_off_by_default(self):
    v, t = self._paired(n=16)
    m = evaluation.retrieval_metrics(v, t, ks=(1,))
    assert not any(k.endswith('_ci_low') for k in m)
