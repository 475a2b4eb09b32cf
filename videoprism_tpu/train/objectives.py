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


def siglip_loss(
    video_embeddings: Array,
    text_embeddings: Array,
    temperature_state: Array,
) -> tuple[Array, dict[str, Array]]:
  """Pairwise sigmoid contrastive loss (SigLIP, Zhai et al. 2023).

  Every (video, text) pair is an independent binary classification —
  matched pairs (the diagonal) positive, all others negative:

    L = -(1/B) * sum_ij log_sigmoid(z_ij * (t * v_i.x_j + b)),
    z_ij = +1 if i == j else -1,  t = exp(log_temperature).

  Unlike InfoNCE there is no softmax over the batch, so the loss
  decomposes per logit: microbatch gradient accumulation loses nothing
  (InfoNCE under accumulation restricts negatives to the microbatch),
  and under a data-parallel mesh the only cross-device term is the
  embedding all-gather both objectives already share.  The learnable
  bias ``b`` keeps early training stable despite the B-1 : 1 negative
  imbalance (paper inits: t' = log 10, b = -10 — the first-step loss
  then starts near the balanced point instead of being dominated by
  negatives).

  ``temperature_state`` is a shape-``[2]`` array ``[log_temperature,
  bias]`` — it rides the ``TrainState.log_temperature`` slot so every
  downstream system (optimizer masks, FSDP/TP shardings, EMA, orbax
  checkpoints) composes with no schema change.
  """
  if temperature_state.shape != (2,):
    raise ValueError(
        'siglip_loss wants temperature_state=[log_temperature, bias] '
        f'(shape [2]), got shape {temperature_state.shape}')
  b = video_embeddings.shape[0]
  logit_scale = jnp.exp(temperature_state[0])
  logit_bias = temperature_state[1]
  logits = (
      video_embeddings.astype(jnp.float32)
      @ text_embeddings.astype(jnp.float32).T
  ) * logit_scale + logit_bias
  signs = 2.0 * jnp.eye(b, dtype=jnp.float32) - 1.0
  loss = -jnp.sum(jax.nn.log_sigmoid(signs * logits)) / b

  labels = jnp.arange(b)
  acc_v2t = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
  acc_t2v = jnp.mean(jnp.argmax(logits, axis=0) == labels)
  return loss, {
      'loss': loss,
      'accuracy_v2t': acc_v2t,
      'accuracy_t2v': acc_t2v,
      'logit_scale': logit_scale,
      'logit_bias': logit_bias,
  }


# Contrastive objective registry: name -> (loss fn, init leaf for the
# TrainState.log_temperature slot).  InfoNCE keeps the CLIP scalar
# log(1/0.07); SigLIP packs its two learnables into one [2] leaf.
CONTRASTIVE_OBJECTIVES = {
    'infonce': clip_contrastive_loss,
    'siglip': siglip_loss,
}


def contrastive_loss(objective: str, video_embeddings: Array,
                     text_embeddings: Array,
                     temperature_state: Array) -> tuple[Array, dict]:
  """Dispatch by objective name ('infonce' | 'siglip')."""
  try:
    fn = CONTRASTIVE_OBJECTIVES[objective]
  except KeyError:
    raise ValueError(
        f'unknown contrastive objective {objective!r} (expected one of '
        f'{sorted(CONTRASTIVE_OBJECTIVES)})') from None
  return fn(video_embeddings, text_embeddings, temperature_state)


def init_temperature_state(objective: str,
                           init_log_temperature: float | None = None,
                           init_bias: float = -10.0) -> jnp.ndarray:
  """The init value for the ``TrainState.log_temperature`` slot.

  Defaults follow the respective papers: CLIP's 1/0.07 temperature for
  InfoNCE; t'=log 10, b=-10 for SigLIP.
  """
  import numpy as np
  if objective == 'infonce':
    t = (float(np.log(1 / 0.07)) if init_log_temperature is None
         else init_log_temperature)
    return jnp.asarray(t, jnp.float32)
  if objective == 'siglip':
    t = (float(np.log(10.0)) if init_log_temperature is None
         else init_log_temperature)
    return jnp.asarray([t, init_bias], jnp.float32)
  raise ValueError(
      f'unknown contrastive objective {objective!r} (expected one of '
      f'{sorted(CONTRASTIVE_OBJECTIVES)})')


def softmax_cross_entropy_loss(
    logits: Array, labels: Array, label_smoothing: float = 0.0
) -> tuple[Array, dict[str, Array]]:
  """Mean softmax cross-entropy for integer labels [B].

  ``label_smoothing`` ε spreads ε of the target mass uniformly over the
  classes (target = (1-ε)·onehot + ε/C) — the standard fine-tuning
  regularizer against over-confident heads.  Accuracy always scores
  against the hard label.
  """
  log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
  nll = -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=-1))
  if label_smoothing:
    uniform_nll = -jnp.mean(log_probs)  # mean over batch AND classes
    nll = (1.0 - label_smoothing) * nll + label_smoothing * uniform_nll
  acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
  return nll, {'loss': nll, 'accuracy': acc}


def soft_cross_entropy_loss(
    logits: Array, label_probs: Array
) -> tuple[Array, dict[str, Array]]:
  """Mean cross-entropy against a target DISTRIBUTION [B, C] (rows sum
  to 1) — what MixUp-style label mixing produces.  Accuracy scores the
  prediction against the distribution's argmax (the dominant label)."""
  log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
  nll = -jnp.mean(jnp.sum(label_probs.astype(jnp.float32) * log_probs,
                          axis=-1))
  acc = jnp.mean(
      jnp.argmax(logits, axis=-1) == jnp.argmax(label_probs, axis=-1))
  return nll, {'loss': nll, 'accuracy': acc}
