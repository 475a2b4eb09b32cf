"""Classifier fine-tuning: full or frozen-backbone (the VideoGLUE protocol).

The reference publishes its classification numbers under the
**frozen-backbone** protocol (reference README.md:188-195: VideoGLUE K400
82.9 base / 85.0 large with the VideoPrism encoder frozen) and
``load_classifier`` ships a randomly initialized pooler + head that "must
be trained" (reference videoprism/models_mlx.py:213-294) — but the
reference itself has no training code.  This module supplies both modes:

* ``freeze_backbone=True`` — the TPU-efficient shape of the protocol: the
  encoder forward runs OUTSIDE ``value_and_grad`` in eval mode (no dropout,
  no remat, no backward graph through the 16-28 layer stack), and only the
  attention pooler + projection head differentiate.  Optimizer state exists
  only for the trainable subtree, so AdamW memory is a few MB instead of
  2× the backbone.
* ``freeze_backbone=False`` — full fine-tune; grads flow through the
  encoder (compose with ``cfg.encoder.remat`` at large scale).

State layout mirrors :class:`videoprism_tpu.train.TrainState` minus the
contrastive temperature; batches are ``{'video', 'label'}``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.ops import basic
from videoprism_tpu.ops.transformer import atten_token_pooling
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import sharding as shard_lib
from videoprism_tpu.train import objectives
from videoprism_tpu.train.train_step import (
    _opt_state_shardings,
    accumulate_gradients,
)

Params = Any

HEAD_KEYS = ('atten_pooler', 'projection')


@dataclasses.dataclass
class ClassifierTrainState:
  """Pytree: step count + full param tree + optimizer state.

  ``opt_state`` covers the full tree (full fine-tune) or only the
  ``atten_pooler``/``projection`` subtree (frozen backbone).
  """

  step: jax.Array
  params: Params
  opt_state: Any

  def tree_flatten(self):
    return ((self.step, self.params, self.opt_state), None)

  @classmethod
  def tree_unflatten(cls, aux, children):
    del aux
    return cls(*children)


jax.tree_util.register_pytree_node(
    ClassifierTrainState, ClassifierTrainState.tree_flatten,
    ClassifierTrainState.tree_unflatten)


def _split_head(params: Params) -> tuple[Params, Params]:
  """(trainable head subtree, frozen encoder subtree)."""
  head = {k: params[k] for k in HEAD_KEYS}
  return head, params['encoder']


def create_classifier_train_state(
    rng: jax.Array,
    cfg: vc.VideoClassifierConfig,
    optimizer: optax.GradientTransformation,
    *,
    pretrained_params: Params | None = None,
    freeze_backbone: bool = False,
) -> ClassifierTrainState:
  params = (
      pretrained_params if pretrained_params is not None
      else init_lib.init_video_classifier(rng, cfg))
  trainable = _split_head(params)[0] if freeze_backbone else params
  return ClassifierTrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=optimizer.init(trainable),
  )


def _head_forward(head: Params, features, cfg: vc.VideoClassifierConfig,
                  *, train: bool, rng):
  """Pooler + projection over precomputed encoder features (the trainable
  half of the frozen-backbone split; mirrors classifier.apply:64-79)."""
  del rng  # the pooler has no dropout in this configuration
  embeddings = atten_token_pooling(
      head['atten_pooler'], features, None,
      num_heads=cfg.encoder.num_heads,
      hidden_dim=cfg.encoder.model_dim,
      num_queries=1, train=train, dtype=cfg.dtype,
      tp_axis=cfg.encoder.tp_axis,
      interpret=cfg.encoder.kernel_interpret)
  embeddings = jnp.squeeze(embeddings, axis=-2)
  return basic.feed_forward(
      head['projection'], embeddings, activation='identity', dtype=cfg.dtype)


def classifier_loss_fn(params: Params, batch, cfg: vc.VideoClassifierConfig,
                       rng: jax.Array, mixup_alpha: float = 0.0,
                       label_smoothing: float = 0.0):
  video, label = batch['video'], batch['label']
  if mixup_alpha > 0.0:
    from videoprism_tpu.train import augment as augment_lib

    rng, mix_rng = jax.random.split(rng)
    video, label_probs = augment_lib.mixup(
        mix_rng, video, label, cfg.num_classes, mixup_alpha,
        label_smoothing)
    logits, _ = vc.apply(params, video, cfg, train=True, rng=rng)
    return objectives.soft_cross_entropy_loss(logits, label_probs)
  logits, _ = vc.apply(params, video, cfg, train=True, rng=rng)
  return objectives.softmax_cross_entropy_loss(
      logits, label, label_smoothing=label_smoothing)


def make_classifier_train_step(
    cfg: vc.VideoClassifierConfig,
    optimizer: optax.GradientTransformation,
    *,
    freeze_backbone: bool = False,
    accum_steps: int = 1,
    mixup_alpha: float = 0.0,
    label_smoothing: float = 0.0,
):
  """Returns ``step(state, batch, rng) -> (state, metrics)`` (pure,
  jittable).  Batch: ``{'video': [B,T,H,W,3], 'label': int32 [B]}``
  (``[accum_steps, B, ...]`` when accumulating).

  ``mixup_alpha > 0`` blends clips AND targets inside the step
  (:func:`videoprism_tpu.train.augment.mixup`, Beta(alpha, alpha) per
  example); ``label_smoothing`` spreads target mass over classes.  Both
  compose (smoothing applies to the one-hots before mixing) and both
  affect training only — eval always scores hard labels.
  """

  def full_loss(params, batch, rng):
    return classifier_loss_fn(params, batch, cfg, rng,
                              mixup_alpha=mixup_alpha,
                              label_smoothing=label_smoothing)

  def full_step(state: ClassifierTrainState, batch, rng):
    if accum_steps > 1:
      vg = jax.value_and_grad(full_loss, has_aux=True)
      grads, metrics = accumulate_gradients(
          vg, state.params, batch, jax.random.split(rng, accum_steps))
    else:
      (_, metrics), grads = jax.value_and_grad(
          full_loss, has_aux=True)(state.params, batch, rng)
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics['grad_norm'] = optax.global_norm(grads)
    return ClassifierTrainState(state.step + 1, new_params,
                                new_opt_state), metrics

  def frozen_loss(head, features, labels, rng):
    logits = _head_forward(head, features, cfg, train=True, rng=rng)
    if mixup_alpha > 0.0:  # labels arrive pre-mixed as [B, C] probs
      return objectives.soft_cross_entropy_loss(logits, labels)
    return objectives.softmax_cross_entropy_loss(
        logits, labels, label_smoothing=label_smoothing)

  def frozen_step(state: ClassifierTrainState, batch, rng):
    head, encoder = _split_head(state.params)

    def encode(video):
      # Eval mode: the frozen backbone is a fixed feature extractor (no
      # dropout), exactly the VideoGLUE frozen-feature setting.
      features, _ = fe.apply(encoder, video, cfg.encoder, train=False)
      return features

    def prepare(mb, r):
      # Mixing happens in PIXEL space before the frozen encoder (mixing
      # features instead would change the protocol), then the targets
      # ride as [B, C] probabilities.
      if mixup_alpha > 0.0:
        from videoprism_tpu.train import augment as augment_lib

        video, probs = augment_lib.mixup(
            r, mb['video'], mb['label'], cfg.num_classes, mixup_alpha,
            label_smoothing)
        return video, probs
      return mb['video'], mb['label']

    if accum_steps > 1:
      vg = jax.value_and_grad(frozen_loss, has_aux=True)

      def micro(tr, mb, r):
        r_mix, r_loss = jax.random.split(r)
        video, labels = prepare(mb, r_mix)
        return vg(tr, encode(video), labels, r_loss)

      # encode() runs inside the accumulation scan, one microbatch's
      # features live at a time (it closes over the frozen encoder, so no
      # gradient flows through it).
      grads, metrics = accumulate_gradients(
          micro, head, batch, jax.random.split(rng, accum_steps))
    else:
      rng_mix, rng_loss = jax.random.split(rng)
      video, labels = prepare(batch, rng_mix)
      features = encode(video)
      (_, metrics), grads = jax.value_and_grad(frozen_loss, has_aux=True)(
          head, features, labels, rng_loss)
    updates, new_opt_state = optimizer.update(grads, state.opt_state, head)
    new_head = optax.apply_updates(head, updates)
    new_params = dict(state.params, **new_head)
    metrics['grad_norm'] = optax.global_norm(grads)
    return ClassifierTrainState(state.step + 1, new_params,
                                new_opt_state), metrics

  return frozen_step if freeze_backbone else full_step


def make_sharded_classifier_train_step(
    cfg: vc.VideoClassifierConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    state: ClassifierTrainState,
    *,
    freeze_backbone: bool = False,
    accum_steps: int = 1,
    mixup_alpha: float = 0.0,
    label_smoothing: float = 0.0,
):
  """jits the classifier step with explicit shardings over ``mesh``:
  params tensor-parallel per the GSPMD name rules (head subtree
  replicates), batch data-parallel, donated state.  Returns
  (jitted_step, sharded_state)."""
  param_sh = shard_lib.param_shardings(state.params, mesh)
  repl = mesh_lib.replicated(mesh)
  trainable_sh = (
      {k: param_sh[k] for k in HEAD_KEYS} if freeze_backbone else param_sh)
  opt_sh = _opt_state_shardings(state.opt_state, param_sh, repl,
                                trainable_sh=trainable_sh)
  state_sh = ClassifierTrainState(step=repl, params=param_sh,
                                  opt_state=opt_sh)
  batch_axis = 1 if accum_steps > 1 else 0
  extra = accum_steps > 1
  batch_sh = {
      'video': mesh_lib.data_sharding(mesh, 5 + extra, batch_axis=batch_axis),
      'label': mesh_lib.data_sharding(mesh, 1 + extra, batch_axis=batch_axis),
  }
  sharded_state = jax.device_put(state, state_sh)
  step = jax.jit(
      make_classifier_train_step(cfg, optimizer,
                                 freeze_backbone=freeze_backbone,
                                 accum_steps=accum_steps,
                                 mixup_alpha=mixup_alpha,
                                 label_smoothing=label_smoothing),
      in_shardings=(state_sh, batch_sh, repl),
      out_shardings=(state_sh, repl),
      donate_argnums=(0,),
  )
  return step, sharded_state
