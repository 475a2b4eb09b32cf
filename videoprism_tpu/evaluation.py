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
    'a example of {}.',
    '{}.',
)


def _ranks(similarity: np.ndarray) -> np.ndarray:
  """similarity[i, j]: query i vs candidate j; truth on the diagonal.

  Returns the 0-based rank of the true candidate per query.
  """
  order = np.argsort(-similarity, axis=1)
  n = similarity.shape[0]
  ranks = np.empty(n, np.int64)
  for i in range(n):
    ranks[i] = int(np.where(order[i] == i)[0][0])
  return ranks


def retrieval_metrics(
    video_embeddings: np.ndarray,   # [N, D], l2-normalized
    text_embeddings: np.ndarray,    # [N, D], aligned pairs
    ks: Sequence[int] = (1, 5, 10),
) -> dict[str, float]:
  """Paired text<->video retrieval metrics (the MSRVTT-1K protocol)."""
  v = np.asarray(video_embeddings, np.float32)
  t = np.asarray(text_embeddings, np.float32)
  sim = v @ t.T

  out: dict[str, float] = {}
  for name, s in (('v2t', sim), ('t2v', sim.T)):
    ranks = _ranks(s)
    for k in ks:
      out[f'{name}_recall@{k}'] = float(np.mean(ranks < k))
    out[f'{name}_median_rank'] = float(np.median(ranks) + 1)
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
) -> dict[str, float]:
  scores = np.asarray(scores)
  labels = np.asarray(labels)
  order = np.argsort(-scores, axis=1)
  out = {}
  for k in ks:
    out[f'top{k}_accuracy'] = float(
        np.mean((order[:, :k] == labels[:, None]).any(axis=1)))
  return out
