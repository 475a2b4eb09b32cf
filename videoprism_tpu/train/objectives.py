"""Training objectives: symmetric contrastive (CLIP/CoCa-style) and softmax
classification.

The reference repo is inference-only (SURVEY.md §2.7); these objectives make
the TPU stack trainable end-to-end (contrastive video-text pretraining of
``FactorizedVideoCLIP`` and classifier fine-tuning of
``FactorizedVideoClassifier``).  Under a ``(data, model)`` mesh the batched
similarity matmul contracts over data-parallel-sharded embeddings, and XLA
inserts the cross-device all-gather automatically — global-batch negatives
with no hand-written collective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def clip_contrastive_loss(
    video_embeddings: Array,
    text_embeddings: Array,
    log_temperature: Array,
    *,
    max_temperature_scale: float = 100.0,
) -> tuple[Array, dict[str, Array]]:
  """Symmetric InfoNCE over l2-normalized embeddings.

  ``logit_scale = min(exp(log_temperature), max)`` follows CLIP; the matched
  pairs are the diagonal.  Returns (scalar loss, metrics).
  """
  b = video_embeddings.shape[0]
  logit_scale = jnp.minimum(
      jnp.exp(log_temperature), max_temperature_scale)
  logits = (
      video_embeddings.astype(jnp.float32)
      @ text_embeddings.astype(jnp.float32).T
  ) * logit_scale
  labels = jnp.arange(b)

  log_probs_v2t = jax.nn.log_softmax(logits, axis=-1)
  log_probs_t2v = jax.nn.log_softmax(logits, axis=0)
  nll_v2t = -jnp.mean(jnp.take_along_axis(
      log_probs_v2t, labels[:, None], axis=-1))
  nll_t2v = -jnp.mean(jnp.take_along_axis(
      log_probs_t2v, labels[None, :], axis=0))
  loss = 0.5 * (nll_v2t + nll_t2v)

  acc_v2t = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
  acc_t2v = jnp.mean(jnp.argmax(logits, axis=0) == labels)
  return loss, {
      'loss': loss,
      'nll_v2t': nll_v2t,
      'nll_t2v': nll_t2v,
      'accuracy_v2t': acc_v2t,
      'accuracy_t2v': acc_t2v,
      'logit_scale': logit_scale,
  }


def softmax_cross_entropy_loss(
    logits: Array, labels: Array
) -> tuple[Array, dict[str, Array]]:
  """Mean softmax cross-entropy for integer labels [B]."""
  log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
  nll = -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=-1))
  acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
  return nll, {'loss': nll, 'accuracy': acc}
