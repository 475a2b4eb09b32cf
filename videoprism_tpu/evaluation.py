"""Evaluation harnesses: retrieval recall@K and zero-shot classification.

The reference publishes MSRVTT/VATEX/ActivityNet retrieval R@1 and K400
zero-shot classification numbers (reference README.md:199-214) but ships no
evaluation code.  This module provides the standard protocols those numbers
use, so checkpoint-parity claims ("LvT retrieval R@1 parity", BASELINE.md)
are directly checkable:

  * :func:`retrieval_metrics` — symmetric t2v/v2t R@1/5/10 + median rank
    from embedding matrices;
  * :func:`zero_shot_classifier` — builds class text embeddings from
    prompt templates (averaged over templates, l2-renormalized, the CLIP
    protocol);
  * :func:`classification_accuracy` — top-1/top-5 from logits or
    similarities.

All functions are pure numpy/jax-free of model internals: feed them
embeddings from any tower.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np

DEFAULT_PROMPT_TEMPLATES = (
    'a video of {}.',
    'a video of a person {}.',
    'an example of {}.',
    '{}.',
)


def _ranks(similarity: np.ndarray, *, chunk_size: int = 8192) -> np.ndarray:
  """similarity[i, j]: query i vs candidate j; truth on the diagonal.

  Returns the 0-based rank of the true candidate per query: the number of
  candidates scoring strictly higher than the true one (ties resolve in the
  query's favor; with float embeddings exact ties are measure-zero).
  Vectorized and processed in row chunks so memory stays O(chunk * N).
  """
  sim = np.asarray(similarity)
  n = sim.shape[0]
  ranks = np.empty(n, np.int64)
  for s in range(0, n, chunk_size):
    block = sim[s:s + chunk_size]
    rows = block.shape[0]
    true_scores = block[np.arange(rows), np.arange(s, s + rows)]
    ranks[s:s + rows] = np.sum(block > true_scores[:, None], axis=1)
  return ranks


def _paired_ranks(queries: np.ndarray, candidates: np.ndarray,
                  chunk_size: int = 2048) -> np.ndarray:
  """Rank of candidate i for query i without materializing the full [N, N]
  similarity matrix (peak memory O(chunk * N) — a 100k corpus stays well
  under a GB instead of needing a 40 GB matrix)."""
  n = queries.shape[0]
  ranks = np.empty(n, np.int64)
  for s in range(0, n, chunk_size):
    sim = queries[s:s + chunk_size] @ candidates.T
    rows = sim.shape[0]
    true_scores = sim[np.arange(rows), np.arange(s, s + rows)]
    ranks[s:s + rows] = np.sum(sim > true_scores[:, None], axis=1)
  return ranks


def _bootstrap_ci(values: np.ndarray, stat, n_bootstrap: int,
                  confidence: float, rng) -> tuple[float, float]:
  """Percentile-bootstrap CI for ``stat`` over resampled ``values``."""
  n = len(values)
  draws = np.empty(n_bootstrap, np.float64)
  for i in range(n_bootstrap):
    draws[i] = stat(values[rng.integers(0, n, n)])
  alpha = (1.0 - confidence) / 2.0
  return (float(np.quantile(draws, alpha)),
          float(np.quantile(draws, 1.0 - alpha)))


def retrieval_metrics(
    video_embeddings: np.ndarray,   # [N, D], l2-normalized
    text_embeddings: np.ndarray,    # [N, D], aligned pairs
    ks: Sequence[int] = (1, 5, 10),
    chunk_size: int = 2048,
    bootstrap: int = 0,
    confidence: float = 0.95,
    seed: int = 0,
) -> dict[str, float]:
  """Paired text<->video retrieval metrics (the MSRVTT-1K protocol).

  Scales to large corpora: similarities are computed in query chunks, so a
  100k-clip sweep never builds the full N x N matrix.

  ``bootstrap=N`` adds percentile-bootstrap confidence intervals
  (``<metric>_ci_low`` / ``_ci_high`` at ``confidence``) by resampling
  QUERIES over the fixed candidate pool — each metric is a statistic of
  the per-query rank vector, so the ranks compute once and the N
  resamples are O(N·queries) numpy, not N retrieval sweeps.  At the
  1k-query MSRVTT scale R@1 moves ±2-3 points between seeds; report the
  interval, not just the point, when comparing models.
  """
  v = np.ascontiguousarray(video_embeddings, np.float32)
  t = np.ascontiguousarray(text_embeddings, np.float32)
  rng = np.random.default_rng(seed)

  out: dict[str, float] = {}
  for name, q, c in (('v2t', v, t), ('t2v', t, v)):
    ranks = _paired_ranks(q, c, chunk_size=chunk_size)
    for k in ks:
      out[f'{name}_recall@{k}'] = float(np.mean(ranks < k))
    out[f'{name}_median_rank'] = float(np.median(ranks) + 1)
    if bootstrap > 0:
      stats = {f'{name}_recall@{k}':
               (lambda r, kk=k: float(np.mean(r < kk))) for k in ks}
      stats[f'{name}_median_rank'] = lambda r: float(np.median(r) + 1)
      for key, stat in stats.items():
        lo, hi = _bootstrap_ci(ranks, stat, bootstrap, confidence, rng)
        out[f'{key}_ci_low'] = lo
        out[f'{key}_ci_high'] = hi
  return out


def zero_shot_classifier(
    encode_texts: Callable[[Sequence[str]], np.ndarray],
    class_names: Sequence[str],
    templates: Sequence[str] = DEFAULT_PROMPT_TEMPLATES,
    batch_size: int = 256,
) -> np.ndarray:
  """[num_classes, D] l2-normalized class embeddings via prompt ensembling.

  ``encode_texts`` maps a list of strings to [N, D] (normalized) text
  embeddings — e.g. ``lambda s: model.apply(state, None, *tokenize(s))[1]``.
  """
  prompts = [t.format(name) for name in class_names for t in templates]
  chunks = [
      np.asarray(encode_texts(prompts[i:i + batch_size]), np.float32)
      for i in range(0, len(prompts), batch_size)
  ]
  emb = np.concatenate(chunks, axis=0)
  emb = emb.reshape(len(class_names), len(templates), -1).mean(axis=1)
  norm = np.linalg.norm(emb, axis=-1, keepdims=True)
  return emb / np.maximum(norm, 1e-12)


def classification_accuracy(
    scores: np.ndarray,   # [N, num_classes] logits or similarities
    labels: np.ndarray,   # [N] int
    ks: Sequence[int] = (1, 5),
    bootstrap: int = 0,
    confidence: float = 0.95,
    seed: int = 0,
) -> dict[str, float]:
  """Top-k accuracy; ``bootstrap=N`` adds percentile-bootstrap CIs
  (``_ci_low``/``_ci_high``) by resampling examples — accuracy is a mean
  of per-example indicators, so the hit vector computes once."""
  scores = np.asarray(scores)
  labels = np.asarray(labels)
  order = np.argsort(-scores, axis=1)
  rng = np.random.default_rng(seed)
  out = {}
  for k in ks:
    hits = (order[:, :k] == labels[:, None]).any(axis=1)
    out[f'top{k}_accuracy'] = float(np.mean(hits))
    if bootstrap > 0:
      lo, hi = _bootstrap_ci(hits.astype(np.float64),
                             lambda h: float(np.mean(h)),
                             bootstrap, confidence, rng)
      out[f'top{k}_accuracy_ci_low'] = lo
      out[f'top{k}_accuracy_ci_high'] = hi
  return out
