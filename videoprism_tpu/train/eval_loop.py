"""Classifier evaluation loop: manifest -> top-1/top-5 accuracy + loss.

The reference publishes VideoGLUE frozen-backbone accuracies (reference
README.md:188-195) but ships no evaluation code; this pairs with
``train/classifier_train_step.py`` to close the fine-tune -> evaluate loop.

TPU shape discipline: every forward runs at one fixed ``[batch_size, ...]``
geometry — the tail batch is zero-padded and masked on the host — so the
whole sweep costs exactly one compile.  Decode parallelism and the
device-feed pattern mirror ``train/data.py``.
"""

from __future__ import annotations

import concurrent.futures
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from videoprism_tpu import evaluation
from videoprism_tpu.models import classifier as vc

Params = Any


def make_classifier_eval_step(cfg: vc.VideoClassifierConfig):
  """Returns jitted ``(params, video) -> logits`` in eval mode."""

  def step(params: Params, video: jax.Array) -> jax.Array:
    logits, _ = vc.apply(params, video, cfg, train=False)
    return logits.astype(jnp.float32)

  return jax.jit(step)


def evaluate_classifier(
    params: Params,
    cfg: vc.VideoClassifierConfig,
    source,
    *,
    batch_size: int = 8,
    num_workers: int = 4,
    sharding=None,
    eval_step=None,
    ks=(1, 5),
) -> dict[str, float]:
  """Sweep a ``(clip, label)`` source (``VideoLabelSource`` /
  ``SyntheticLabeledSource``) and return
  ``{'top1_accuracy', 'top5_accuracy', 'loss', 'num_examples'}``.

  ``sharding`` (optional ``NamedSharding``) spreads each batch
  data-parallel; ``eval_step`` lets callers reuse an already-jitted step
  (e.g. the train CLI evaluating every N steps without recompiling).
  """
  n = len(source)
  if n == 0:
    raise ValueError('evaluate_classifier: empty source')
  step = eval_step if eval_step is not None else make_classifier_eval_step(cfg)

  all_logits: list[np.ndarray] = []
  all_labels: list[np.ndarray] = []
  total_nll = 0.0
  with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
    for s in range(0, n, batch_size):
      idx = list(range(s, min(s + batch_size, n)))
      examples = list(pool.map(source.get, idx))
      video = np.stack([clip for clip, _ in examples], axis=0)
      labels = np.asarray([label for _, label in examples], np.int64)
      valid = len(idx)
      if valid < batch_size:  # pad the tail to the compiled geometry
        pad = batch_size - valid
        video = np.concatenate(
            [video, np.zeros((pad, *video.shape[1:]), video.dtype)], axis=0)
      if sharding is not None:
        video = jax.device_put(video, sharding)
      logits = np.asarray(jax.device_get(step(params, video)))[:valid]
      log_probs = logits - _logsumexp(logits)
      total_nll -= float(log_probs[np.arange(valid), labels].sum())
      all_logits.append(logits)
      all_labels.append(labels)

  logits = np.concatenate(all_logits, axis=0)
  labels = np.concatenate(all_labels, axis=0)
  metrics = evaluation.classification_accuracy(logits, labels, ks=ks)
  metrics['loss'] = total_nll / n
  metrics['num_examples'] = float(n)
  return metrics


def _logsumexp(logits: np.ndarray) -> np.ndarray:
  m = logits.max(axis=-1, keepdims=True)
  return m + np.log(np.exp(logits - m).sum(axis=-1, keepdims=True))
