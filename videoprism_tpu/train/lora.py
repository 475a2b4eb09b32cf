"""LoRA fine-tuning: low-rank adapters as a functional param-delta tier.

The reference is inference-only; its fine-tuning story (VideoGLUE-style
adaptation, reference README.md:188-195) assumes full or frozen-backbone
training.  LoRA is the production middle ground — adapt the 114M-580M
towers with <1% trainable params — and the functional design here fits
the TPU stack exactly:

* Adapters are a SEPARATE pytree (``{'path/to/leaf': {'a', 'b'}}``) over
  the frozen checkpoint; the model code is untouched.  The train step
  computes ``W_eff = W + (alpha/rank) * (a^T b)`` per adapted leaf and
  runs the standard forward, so every existing ``apply`` (and every
  Pallas kernel under it) works unmodified.
* The merge is a rank-r outer product per layer — O(r * D^2) FLOPs,
  noise next to one forward — and XLA fuses it with the weight load.
  Scan-stacked layouts (leading layer axis, the checkpoint schema) are
  handled natively: adapters carry the same leading axis.
* Optimizer state exists only for the adapters: AdamW memory drops from
  2x the backbone to megabytes, the practical win for fine-tuning the
  giant towers on small slices.
* :func:`merge_lora` doubles as the export path: bake adapters into a
  checkpoint-schema tree and serve it through every existing path
  (int8 quantization, TP serving, AOT export) with zero cost.

Adapted leaves (the transformer matmuls; names are the checkpoint schema):

* ``self_attention/{query,key,value}/w``  [L?, D, N, H] — in D, out (N, H)
* ``self_attention/post/w``               [L?, D, N, H] — in (N, H), out D
* ``ff_layer/ffn_layer{1,2}/linear/kernel`` [L?, I, O]  — in I, out O
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.train import objectives
from videoprism_tpu.train.classifier_train_step import (
    HEAD_KEYS,
    ClassifierTrainState,
)
from videoprism_tpu.train.train_step import TrainState, accumulate_gradients

Params = Any

_ATTN_PROJS = ('query', 'key', 'value', 'post')
_VALID_TARGETS = frozenset(_ATTN_PROJS) | {'ffn'}


@dataclasses.dataclass(frozen=True)
class LoraConfig:
  """``targets`` selects which matmuls get adapters: any of
  ``query/key/value/post`` (attention projections) and ``ffn`` (both FFN
  kernels).  ``('query', 'value')`` is the classic LoRA recipe.

  ``alpha`` sets the merge scale ``alpha / rank`` (default: ``rank``, i.e.
  scale 1.0 — rank changes then don't rescale tuned learning rates).
  ``include_pooler`` extends attention targets to the attention-pooling
  layers (``pooling_attention``)."""

  rank: int = 8
  alpha: float | None = None
  targets: tuple[str, ...] = ('query', 'value')
  include_pooler: bool = False

  def __post_init__(self):
    if self.rank <= 0:
      raise ValueError(f'LoRA rank must be positive, got {self.rank}')
    bad = set(self.targets) - _VALID_TARGETS
    if bad:
      raise ValueError(f'unknown LoRA targets {sorted(bad)}; valid: '
                       f'{sorted(_VALID_TARGETS)}')

  @property
  def scale(self) -> float:
    return (self.alpha if self.alpha is not None else self.rank) / self.rank


def _iter_adapted(params: Params, cfg: LoraConfig, path=()):
  """Yields ``(path_tuple, leaf)`` for every adapted weight leaf."""
  if not isinstance(params, dict):
    return
  for key, value in sorted(params.items()):
    p = path + (key,)
    if key == 'self_attention' or (
        cfg.include_pooler and key == 'pooling_attention'):
      for proj in _ATTN_PROJS:
        if proj in cfg.targets and proj in value:
          yield p + (proj, 'w'), value[proj]['w']
    elif key == 'ff_layer' and 'ffn' in cfg.targets:
      for layer in ('ffn_layer1', 'ffn_layer2'):
        if layer in value:
          yield p + (layer, 'linear', 'kernel'), value[layer]['linear'][
              'kernel']
    elif isinstance(value, dict):
      yield from _iter_adapted(value, cfg, p)


def _axes(path: tuple[str, ...], ndim: int):
  """(in_axes, out_axes) of the leaf's matmul, in leaf coordinates."""
  if path[-1] == 'w':  # attention projection
    if path[-2] == 'post':  # ...NH,DNH->...D (reference layers.py:433-499)
      return (ndim - 2, ndim - 1), (ndim - 3,)
    return (ndim - 3,), (ndim - 2, ndim - 1)  # ...D,DNH->...NH
  return (ndim - 2,), (ndim - 1,)  # dense kernel [*, in, out]


def _delta(a: jax.Array, b: jax.Array, path: tuple[str, ...],
           leaf: jax.Array) -> jax.Array:
  """Low-rank update ``a^T b`` laid out exactly like ``leaf``."""
  in_ax, out_ax = _axes(path, leaf.ndim)
  lead = leaf.ndim - len(in_ax) - len(out_ax)
  li = 'u' * lead
  ii = 'ij'[:len(in_ax)]
  oi = 'mn'[:len(out_ax)]
  d = jnp.einsum(f'{li}r{ii},{li}r{oi}->{li}{ii}{oi}', a, b)
  perm = [0] * leaf.ndim
  for t in range(lead):
    perm[t] = t
  for i, ax in enumerate(in_ax):
    perm[ax] = lead + i
  for j, ax in enumerate(out_ax):
    perm[ax] = lead + len(in_ax) + j
  return jnp.transpose(d, perm)


def init_lora(rng: jax.Array, params: Params, cfg: LoraConfig) -> Params:
  """Adapter tree over ``params``: ``{'a/b/c/w': {'a': [..., r, *in],
  'b': [..., r, *out]}}`` (flat slash-joined keys — optimizer-friendly and
  trivially checkpointable).  ``a`` is scaled-normal, ``b`` zeros, so the
  merged model equals the frozen model at step 0.
  """
  entries = list(_iter_adapted(params, cfg))
  if not entries:
    raise ValueError(
        f'LoRA found no adaptable leaves for targets {cfg.targets}')
  lora: dict[str, dict[str, jax.Array]] = {}
  keys = jax.random.split(rng, len(entries))
  for key_rng, (path, leaf) in zip(keys, entries):
    in_ax, out_ax = _axes(path, leaf.ndim)
    lead = leaf.shape[:leaf.ndim - len(in_ax) - len(out_ax)]
    in_shape = tuple(leaf.shape[ax] for ax in in_ax)
    out_shape = tuple(leaf.shape[ax] for ax in out_ax)
    stddev = 1.0 / math.sqrt(float(np.prod(in_shape)))
    lora['/'.join(path)] = {
        'a': stddev * jax.random.normal(
            key_rng, lead + (cfg.rank,) + in_shape, jnp.float32),
        'b': jnp.zeros(lead + (cfg.rank,) + out_shape, jnp.float32),
    }
  return lora


def _get(tree: Params, path: tuple[str, ...]):
  for key in path:
    tree = tree[key]
  return tree


def _set(tree: Params, path: tuple[str, ...], value) -> Params:
  new = dict(tree)
  if len(path) == 1:
    new[path[0]] = value
  else:
    new[path[0]] = _set(tree[path[0]], path[1:], value)
  return new


def merge_lora(params: Params, lora: Params, cfg: LoraConfig) -> Params:
  """``W + scale * a^T b`` for every adapted leaf; the rest of the tree is
  shared by reference.  Output keeps the checkpoint schema, so it serves
  through every existing path (also the adapter export / bake-in)."""
  merged = params
  for key, ab in lora.items():
    path = tuple(key.split('/'))
    leaf = _get(params, path)
    delta = cfg.scale * _delta(ab['a'], ab['b'], path, leaf)
    merged = _set(merged, path, (leaf + delta.astype(leaf.dtype)))
  return merged


def lora_num_params(lora: Params) -> int:
  return sum(int(np.prod(leaf.shape)) for leaf in jax.tree.leaves(lora))


# --------------------------------------------------------------------------
# Train steps (CLIP + classifier).  The frozen tree is an explicit step
# argument — not a closure constant — so it can be donated/sharded and the
# compiled step reused across base checkpoints.
# --------------------------------------------------------------------------


def create_lora_train_state(
    rng: jax.Array,
    optimizer: optax.GradientTransformation,
    frozen_params: Params,
    lora_cfg: LoraConfig,
    *,
    init_log_temperature: float | None = None,
    objective: str = 'infonce',
) -> TrainState:
  """CLIP LoRA state: ``params`` holds ONLY the adapter tree (the frozen
  tree stays outside and is passed to each step call).  ``objective``
  shapes the temperature leaf like :func:`create_train_state` does."""
  lora = init_lora(rng, frozen_params, lora_cfg)
  log_temperature = objectives.init_temperature_state(
      objective, init_log_temperature)
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=lora,
      log_temperature=log_temperature,
      opt_state=optimizer.init((lora, log_temperature)),
  )


def make_lora_train_step(
    cfg: vclip.VideoCLIPConfig,
    optimizer: optax.GradientTransformation,
    lora_cfg: LoraConfig,
    *,
    accum_steps: int = 1,
    objective: str = 'infonce',
):
  """Returns ``step(state, frozen_params, batch, rng) -> (state, metrics)``
  — the contrastive CLIP objective with gradients through the adapters
  only.  ``state.params`` is the adapter tree."""

  def loss_fn(trainable, frozen_and_batch, rng):
    lora, log_temperature = trainable
    frozen, batch = frozen_and_batch
    merged = merge_lora(frozen, lora, lora_cfg)
    video_emb, text_emb, _ = vclip.apply(
        merged, batch['video'], batch['text_token_ids'],
        batch['text_paddings'], cfg, train=True, rng=rng)
    return objectives.contrastive_loss(
        objective, video_emb, text_emb, log_temperature)

  def step(state: TrainState, frozen_params: Params, batch, rng):
    trainable = (state.params, state.log_temperature)
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    if accum_steps > 1:
      grads, metrics = accumulate_gradients(
          lambda tr, mb, r: vg(tr, (frozen_params, mb), r), trainable,
          batch, jax.random.split(rng, accum_steps))
    else:
      (_, metrics), grads = vg(trainable, (frozen_params, batch), rng)
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, trainable)
    new_lora, new_log_temp = optax.apply_updates(trainable, updates)
    metrics['grad_norm'] = optax.global_norm(grads)
    return TrainState(state.step + 1, new_lora, new_log_temp,
                      new_opt_state), metrics

  return step


def create_lora_classifier_train_state(
    rng: jax.Array,
    optimizer: optax.GradientTransformation,
    pretrained_params: Params,
    lora_cfg: LoraConfig,
) -> ClassifierTrainState:
  """Classifier LoRA state: trainable = encoder adapters + the pooler/head
  (the head starts random and must train — reference models_mlx.py:213-294).
  ``params = {'lora': ..., 'head': {...}}``; the full pretrained tree stays
  outside."""
  lora = init_lora(rng, pretrained_params['encoder'], lora_cfg)
  head = {k: pretrained_params[k] for k in HEAD_KEYS}
  trainable = {'lora': lora, 'head': head}
  return ClassifierTrainState(
      step=jnp.zeros((), jnp.int32),
      params=trainable,
      opt_state=optimizer.init(trainable),
  )


def make_lora_classifier_train_step(
    cfg: vc.VideoClassifierConfig,
    optimizer: optax.GradientTransformation,
    lora_cfg: LoraConfig,
    *,
    accum_steps: int = 1,
):
  """Returns ``step(state, frozen_encoder, batch, rng) -> (state, metrics)``
  — cross-entropy with gradients through the adapters + head.
  ``frozen_encoder`` is the pretrained ``params['encoder']`` subtree."""

  def loss_fn(trainable, frozen_and_batch, rng):
    frozen_encoder, batch = frozen_and_batch
    full = dict(trainable['head'],
                encoder=merge_lora(frozen_encoder, trainable['lora'],
                                   lora_cfg))
    logits, _ = vc.apply(full, batch['video'], cfg, train=True, rng=rng)
    return objectives.softmax_cross_entropy_loss(logits, batch['label'])

  def step(state: ClassifierTrainState, frozen_encoder: Params, batch, rng):
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    if accum_steps > 1:
      grads, metrics = accumulate_gradients(
          lambda tr, mb, r: vg(tr, (frozen_encoder, mb), r), state.params,
          batch, jax.random.split(rng, accum_steps))
    else:
      (_, metrics), grads = vg(state.params, (frozen_encoder, batch), rng)
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, state.params)
    new_trainable = optax.apply_updates(state.params, updates)
    metrics['grad_norm'] = optax.global_norm(grads)
    return ClassifierTrainState(state.step + 1, new_trainable,
                                new_opt_state), metrics

  return step


def export_lora_classifier(frozen_params: Params,
                           state: ClassifierTrainState,
                           lora_cfg: LoraConfig) -> Params:
  """Bake a trained classifier-LoRA state into a full serving tree
  (checkpoint schema: ``encoder`` + ``atten_pooler`` + ``projection``)."""
  return dict(state.params['head'],
              encoder=merge_lora(frozen_params['encoder'],
                                 state.params['lora'], lora_cfg))
