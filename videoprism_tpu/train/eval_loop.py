"""Evaluation loops: labeled/captioned sources -> published-table metrics.

The reference publishes VideoGLUE frozen-backbone accuracies, zero-shot
classification, and MSRVTT/VATEX retrieval tables (reference
README.md:188-214) but ships no evaluation code; this pairs with the
train steps and :mod:`videoprism_tpu.evaluation` (the numpy metric
protocols) to close the loop:

* :func:`evaluate_classifier` — supervised top-1/top-5 + NLL.
* :func:`evaluate_retrieval`  — paired text<->video R@k / median rank
  (the MSRVTT-1K protocol) from a ``(clip, caption)`` source.
* :func:`evaluate_zero_shot`  — prompt-ensembled zero-shot classification
  (the K400 zero-shot protocol) from a ``(clip, int label)`` source.

TPU shape discipline: every forward runs at one fixed ``[batch_size, ...]``
geometry — the tail batch is zero-padded and masked on the host — so each
sweep costs exactly one compile per tower.  Decode parallelism and the
device-feed pattern mirror ``train/data.py``.
"""

from __future__ import annotations

import concurrent.futures
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from videoprism_tpu import evaluation
from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import registry

Params = Any


def make_classifier_eval_step(cfg: vc.VideoClassifierConfig):
  """Returns jitted ``(params, video) -> logits`` in eval mode."""

  def step(params: Params, video: jax.Array) -> jax.Array:
    logits, _ = vc.apply(params, video, cfg, train=False)
    return logits.astype(jnp.float32)

  return jax.jit(step)


def _num_views(source) -> int:
  """Views per example: a source yielding [V, T, H, W, 3] clips (e.g.
  ``train.data.MultiViewSource``) is multi-view; [T, H, W, 3] is one.

  Sources that know their view count expose ``num_views`` (cheap);
  otherwise example 0 is decoded once to probe the clip rank."""
  declared = getattr(source, 'num_views', None)
  if declared is not None:
    return int(declared)
  clip = np.asarray(source.get(0)[0])
  if clip.ndim == 5:
    return clip.shape[0]
  if clip.ndim == 4:
    return 1
  raise ValueError(
      f'source clips must be [T, H, W, 3] or [V, T, H, W, 3], '
      f'got shape {clip.shape}')


def _as_view_rows(clip: np.ndarray, views: int) -> np.ndarray:
  """[T, H, W, 3] or [V, T, H, W, 3] -> [V, T, H, W, 3] rows."""
  clip = np.asarray(clip)
  rows = clip[None] if clip.ndim == 4 else clip
  if rows.shape[0] != views:
    raise ValueError(
        f'inconsistent view count: expected {views}, got {rows.shape[0]}')
  return rows


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
    view_aggregate: str = 'logits',
    bootstrap: int = 0,
) -> dict[str, float]:
  """Sweep a ``(clip, label)`` source (``VideoLabelSource`` /
  ``SyntheticLabeledSource``) and return
  ``{'top1_accuracy', 'top5_accuracy', 'loss', 'num_examples'}``.

  ``sharding`` (optional ``NamedSharding``) spreads each batch
  data-parallel; ``eval_step`` lets callers reuse an already-jitted step
  (e.g. the train CLI evaluating every N steps without recompiling).

  **Multi-view protocol**: a source yielding ``[V, T, H, W, 3]`` clips
  (``train.data.MultiViewSource`` — the NxM temporal x spatial views of
  ViViT-style evaluation) is aggregated per example over views before
  scoring: ``view_aggregate='logits'`` averages per-view logits (the
  ViViT protocol), ``'probs'`` averages per-view softmax probabilities.
  All V views of an example ride in one device batch (geometry stays
  fixed at ``max(batch_size, V)`` rows — one compile per sweep).
  """
  n = len(source)
  if n == 0:
    raise ValueError('evaluate_classifier: empty source')
  if view_aggregate not in ('logits', 'probs'):
    raise ValueError(f'view_aggregate must be "logits" or "probs", '
                     f'got {view_aggregate!r}')
  sharding = _rank_sharding(sharding, 5)
  views = _num_views(source)
  per_batch = max(1, batch_size // views)
  device_rows = max(batch_size, views)
  step = eval_step if eval_step is not None else make_classifier_eval_step(cfg)

  all_scores: list[np.ndarray] = []
  all_labels: list[np.ndarray] = []
  total_nll = 0.0
  with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
    for s in range(0, n, per_batch):
      idx = list(range(s, min(s + per_batch, n)))
      examples = list(pool.map(source.get, idx))
      video = np.concatenate(
          [_as_view_rows(clip, views) for clip, _ in examples], axis=0)
      labels = np.asarray([label for _, label in examples], np.int64)
      valid_rows = len(idx) * views
      if valid_rows < device_rows:  # pad the tail to the compiled geometry
        pad = device_rows - valid_rows
        video = np.concatenate(
            [video, np.zeros((pad, *video.shape[1:]), video.dtype)], axis=0)
      if sharding is not None:
        video = jax.device_put(video, sharding)
      logits = np.asarray(jax.device_get(step(params, video)))[:valid_rows]
      logits = logits.reshape(len(idx), views, -1)
      if view_aggregate == 'logits':
        scores = logits.mean(axis=1)
        log_probs = scores - _logsumexp(scores)
      else:  # log of the view-averaged softmax distribution
        per_view = logits - _logsumexp(logits)   # [E, V, C] log-probs
        m = per_view.max(axis=1)
        log_probs = m + np.log(np.exp(per_view - m[:, None]).mean(axis=1))
        scores = log_probs
      total_nll -= float(log_probs[np.arange(len(idx)), labels].sum())
      all_scores.append(scores)
      all_labels.append(labels)

  scores = np.concatenate(all_scores, axis=0)
  labels = np.concatenate(all_labels, axis=0)
  metrics = evaluation.classification_accuracy(scores, labels, ks=ks,
                                               bootstrap=bootstrap)
  metrics['loss'] = total_nll / n
  metrics['num_examples'] = float(n)
  metrics['num_views'] = float(views)
  return metrics


def _logsumexp(logits: np.ndarray) -> np.ndarray:
  m = logits.max(axis=-1, keepdims=True)
  return m + np.log(np.exp(logits - m).sum(axis=-1, keepdims=True))


# --------------------------------------------------------------------------
# CLIP tower sweeps (retrieval + zero-shot protocols)
# --------------------------------------------------------------------------


def make_clip_video_eval_step(cfg: vclip.VideoCLIPConfig):
  """Returns jitted ``(params, video) -> l2-normalized [B, D] fp32``."""

  def step(params: Params, video: jax.Array) -> jax.Array:
    emb, _ = vclip.encode_vision(params, video, cfg, train=False)
    return emb.astype(jnp.float32)

  return jax.jit(step)


def make_clip_text_eval_step(cfg: vclip.VideoCLIPConfig):
  """Returns jitted ``(params, ids, paddings) -> l2-normalized [B, D]``."""

  def step(params: Params, ids: jax.Array, paddings: jax.Array) -> jax.Array:
    return vclip.encode_text(params, ids, paddings, cfg,
                             train=False).astype(jnp.float32)

  return jax.jit(step)


def _sweep_videos(step, params, source, indices, *, batch_size, num_workers,
                  sharding) -> np.ndarray:
  """Fixed-geometry padded sweep: embeds ``source.get(i)[0]`` for each index
  (one compile total).

  Multi-view sources ([V, T, H, W, 3] clips) get per-example **embedding
  averaging**: all V views run in the same device batch, their l2-normalized
  embeddings are averaged and re-normalized (the standard multi-view
  retrieval protocol).
  """
  sharding = _rank_sharding(sharding, 5)
  views = _num_views(source)
  per_batch = max(1, batch_size // views)
  device_rows = max(batch_size, views)
  out: list[np.ndarray] = []
  with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
    for s in range(0, len(indices), per_batch):
      chunk = indices[s:s + per_batch]
      clips = list(pool.map(lambda i: source.get(i)[0], chunk))
      video = np.concatenate(
          [_as_view_rows(clip, views) for clip in clips], axis=0)
      valid_rows = len(chunk) * views
      if valid_rows < device_rows:
        pad = device_rows - valid_rows
        video = np.concatenate(
            [video, np.zeros((pad, *video.shape[1:]), video.dtype)], axis=0)
      if sharding is not None:
        video = jax.device_put(video, sharding)
      emb = np.asarray(jax.device_get(step(params, video)))[:valid_rows]
      if views > 1:
        emb = emb.reshape(len(chunk), views, -1).mean(axis=1)
        emb /= np.maximum(
            np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
      out.append(emb)
  return np.concatenate(out, axis=0)


def _rank_sharding(sharding, ndim: int):
  """Adapts a batch-leading NamedSharding to an array rank.

  The eval entry points take ONE ``sharding`` but place both rank-5
  videos and rank-2 token batches — a caller's
  ``data_sharding(mesh, 5)`` must not crash the text sweep (device_put
  rejects rank/spec mismatches).  Only the batch axis is ever sharded
  here, so rebuild the spec at the needed rank."""
  if sharding is None:
    return None
  from jax.sharding import NamedSharding, PartitionSpec

  if isinstance(sharding, NamedSharding):
    batch = sharding.spec[0] if len(sharding.spec) else None
    return NamedSharding(sharding.mesh,
                         PartitionSpec(batch, *([None] * (ndim - 1))))
  return sharding  # unknown sharding type: trust the caller


def _sweep_texts(step, params, texts, tokenizer, *, batch_size, max_text_len,
                 sharding) -> np.ndarray:
  """Fixed-geometry padded text sweep (pad rows are all-padding)."""
  sharding = _rank_sharding(sharding, 2)
  out: list[np.ndarray] = []
  for s in range(0, len(texts), batch_size):
    chunk = list(texts[s:s + batch_size])
    valid = len(chunk)
    if valid < batch_size:
      chunk += [''] * (batch_size - valid)
    ids, paddings = registry.tokenize_texts(tokenizer, chunk,
                                            max_length=max_text_len)
    if sharding is not None:
      ids, paddings = (jax.device_put(x, sharding) for x in (ids, paddings))
    out.append(
        np.asarray(jax.device_get(step(params, ids, paddings)))[:valid])
  return np.concatenate(out, axis=0)


def evaluate_retrieval(
    params: Params,
    cfg: vclip.VideoCLIPConfig,
    source,
    tokenizer,
    *,
    batch_size: int = 8,
    text_batch_size: int = 0,
    max_text_len: int = registry.TEXT_MAX_LEN,
    num_workers: int = 4,
    sharding=None,
    ks: Sequence[int] = (1, 5, 10),
    bootstrap: int = 0,
) -> dict[str, float]:
  """Paired text<->video retrieval over a ``(clip, caption)`` source
  (``VideoTextSource`` / ``SyntheticSource``) — the MSRVTT-1K protocol
  (reference README.md:199-206 publishes these tables with no runner).

  Returns ``evaluation.retrieval_metrics`` keys (``v2t_recall@k``,
  ``t2v_recall@k``, median ranks) plus ``num_pairs``.
  """
  n = len(source)
  if n == 0:
    raise ValueError('evaluate_retrieval: empty source')
  video_emb = _sweep_videos(
      make_clip_video_eval_step(cfg), params, source, range(n),
      batch_size=batch_size, num_workers=num_workers, sharding=sharding)
  # Path-backed sources expose captions directly; fall back to get() (which
  # re-decodes the clip) only for sources without the attribute.
  captions = getattr(source, 'captions', None)
  if captions is None:
    captions = [source.get(i)[1] for i in range(n)]
  captions = list(captions)
  text_emb = _sweep_texts(
      make_clip_text_eval_step(cfg), params, captions, tokenizer,
      batch_size=text_batch_size or batch_size, max_text_len=max_text_len,
      sharding=sharding)
  metrics = evaluation.retrieval_metrics(video_emb, text_emb, ks=ks,
                                         bootstrap=bootstrap)
  metrics['num_pairs'] = float(n)
  return metrics


def evaluate_zero_shot(
    params: Params,
    cfg: vclip.VideoCLIPConfig,
    source,
    tokenizer,
    class_names: Sequence[str],
    *,
    templates: Sequence[str] = evaluation.DEFAULT_PROMPT_TEMPLATES,
    batch_size: int = 8,
    text_batch_size: int = 0,
    max_text_len: int = registry.TEXT_MAX_LEN,
    num_workers: int = 4,
    sharding=None,
    ks: Sequence[int] = (1, 5),
    bootstrap: int = 0,
) -> dict[str, float]:
  """Zero-shot classification over a ``(clip, int label)`` source via
  prompt-ensembled class text embeddings (the K400 zero-shot protocol,
  reference README.md:210-214).

  Labels index ``class_names``.  Returns ``top{k}_accuracy`` keys plus
  ``num_examples`` and ``num_classes``.
  """
  n = len(source)
  if n == 0:
    raise ValueError('evaluate_zero_shot: empty source')
  text_step = make_clip_text_eval_step(cfg)
  class_weights = evaluation.zero_shot_classifier(
      lambda texts: _sweep_texts(
          text_step, params, texts, tokenizer,
          batch_size=text_batch_size or max(batch_size, 32),
          max_text_len=max_text_len, sharding=sharding),
      class_names, templates=templates,
      batch_size=max(text_batch_size or 256, 1))
  video_emb = _sweep_videos(
      make_clip_video_eval_step(cfg), params, source, range(n),
      batch_size=batch_size, num_workers=num_workers, sharding=sharding)
  labels = getattr(source, 'labels', None)
  if labels is None:
    labels = [source.get(i)[1] for i in range(n)]
  labels = np.asarray(list(labels), np.int64)
  scores = video_emb @ class_weights.T
  metrics = evaluation.classification_accuracy(scores, labels, ks=ks,
                                               bootstrap=bootstrap)
  metrics['num_examples'] = float(n)
  metrics['num_classes'] = float(len(class_names))
  return metrics


class EarlyStopper:
  """Stop training when an eval metric plateaus.

  ``mode`` defaults by metric name: names containing ``loss``, ``nll``,
  or ``rank`` minimize; everything else (accuracies, recalls) maximizes.
  ``update(metrics)`` returns True when ``patience`` consecutive evals
  have failed to improve on the best seen (by at least ``min_delta``).
  """

  def __init__(self, metric: str, patience: int, *, mode: str | None = None,
               min_delta: float = 0.0):
    if patience <= 0:
      raise ValueError(f'patience must be positive, got {patience}')
    if mode is None:
      lowered = metric.lower()
      mode = ('min' if any(s in lowered for s in ('loss', 'nll', 'rank'))
              else 'max')
    if mode not in ('min', 'max'):
      raise ValueError(f"mode must be 'min' or 'max', got {mode!r}")
    self.metric = metric
    self.patience = patience
    self.mode = mode
    self.min_delta = min_delta
    self.best: float | None = None
    self.stale = 0

  def update(self, metrics: dict) -> bool:
    if self.metric not in metrics:
      raise KeyError(
          f'early-stop metric {self.metric!r} not in eval metrics '
          f'{sorted(metrics)}')
    value = float(metrics[self.metric])
    improved = (
        self.best is None
        or (self.mode == 'max' and value > self.best + self.min_delta)
        or (self.mode == 'min' and value < self.best - self.min_delta))
    if improved:
      self.best = value
      self.stale = 0
      return False
    self.stale += 1
    return self.stale >= self.patience


class BestTracker:
  """Tracks whether an eval metric just improved on its best-so-far —
  the ``--keep-best`` checkpoint signal (same name-based min/max
  inference as :class:`EarlyStopper`).  ``update(metrics)`` returns
  True exactly when this eval set a new best."""

  def __init__(self, metric: str, *, mode: str | None = None,
               min_delta: float = 0.0):
    self._s = EarlyStopper(metric, patience=1, mode=mode,
                           min_delta=min_delta)

  @property
  def metric(self) -> str:
    return self._s.metric

  @property
  def best(self) -> 'float | None':
    return self._s.best

  def update(self, metrics: dict) -> bool:
    before = self._s.best
    self._s.update(metrics)
    return self._s.best != before
