"""Knowledge distillation: big teacher → small student.

The serving economics on TPU motivate this tier: giant runs at ~36
clips/s/chip where base runs at ~163 (bench.py, CLAUDE.md) — a student
matching the teacher's embedding space serves 4.5× the traffic per chip.
The reference repo has no training code at all (SURVEY.md §5); this
module completes the training tier's third objective next to contrastive
CLIP and classifier fine-tuning.

Three step builders, one shape:

* :func:`make_encoder_distill_step` — **token-level** feature matching
  through a factorized video encoder: per-token cosine distance between
  the student's ``[B, S, D_s]`` features (linearly projected to the
  teacher's width) and the teacher's ``[B, S, D_t]``.  Same patch size
  ⇒ same token grid, so the match is position-exact.
* :func:`make_clip_vision_distill_step` — **embedding-level** matching
  of the lvt vision tower's pooled l2-normalized ``[B, D]`` retrieval
  embedding (the representation serving actually ships).
* :func:`make_classifier_distill_step` — classic logit distillation:
  ``τ²·KL(teacher_τ ‖ student_τ)`` blended with label cross-entropy by
  ``alpha`` (Hinton et al.; public recipe).

Teacher params are a **step argument**, not state: they are frozen
(``stop_gradient`` + eval mode), can be sharded/placed independently,
and never enter the optimizer.  The student projection head (when
widths differ) trains alongside the student and is dropped at export —
the student itself is checkpoint-schema-pure, so every serving path
(int8, TP, AOT export) applies unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import sharding as shard_lib
from videoprism_tpu.train.train_step import (
    _opt_state_shardings,
    accumulate_gradients,
)

Params = Any


@dataclasses.dataclass
class DistillTrainState:
  """Pytree: step + trainable tree + optimizer state.

  ``trainable`` is ``{'student': <student params>}`` plus, for feature
  distillation across widths, ``{'proj': {'w', 'b'}}``.  The teacher is
  intentionally NOT here — see module docstring.
  """

  step: jax.Array
  trainable: Params
  opt_state: Any

  def tree_flatten(self):
    return ((self.step, self.trainable, self.opt_state), None)

  @classmethod
  def tree_unflatten(cls, aux, children):
    del aux
    return cls(*children)

  @property
  def student_params(self) -> Params:
    return self.trainable['student']


jax.tree_util.register_pytree_node(
    DistillTrainState, DistillTrainState.tree_flatten,
    DistillTrainState.tree_unflatten)


def init_projection(rng: jax.Array, d_student: int, d_teacher: int) -> Params:
  """Student→teacher width adapter (dropped at export)."""
  scale = d_student ** -0.5
  return {
      'w': scale * jax.random.normal(rng, (d_student, d_teacher),
                                     jnp.float32),
      'b': jnp.zeros((d_teacher,), jnp.float32),
  }


def cosine_distill_loss(student, teacher):
  """Mean ``1 - cos`` over all leading axes; fp32 reductions."""
  s = student.astype(jnp.float32)
  t = teacher.astype(jnp.float32)
  s = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-6)
  t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-6)
  cos = jnp.sum(s * t, axis=-1)
  return jnp.mean(1.0 - cos), {'cosine': jnp.mean(cos)}


def kd_kl_loss(student_logits, teacher_logits, temperature: float):
  """``τ² · KL(softmax(t/τ) ‖ softmax(s/τ))`` (the τ² keeps gradient
  magnitude comparable to CE as τ grows), fp32."""
  s = student_logits.astype(jnp.float32) / temperature
  t = teacher_logits.astype(jnp.float32) / temperature
  t_log_probs = jax.nn.log_softmax(t, axis=-1)
  s_log_probs = jax.nn.log_softmax(s, axis=-1)
  kl = jnp.sum(jnp.exp(t_log_probs) * (t_log_probs - s_log_probs), axis=-1)
  return (temperature ** 2) * jnp.mean(kl)


def _check_token_alignment(teacher_cfg, student_cfg) -> None:
  if teacher_cfg.patch_size != student_cfg.patch_size:
    raise ValueError(
        f'token-level distillation needs matching patch grids: teacher '
        f'patch_size={teacher_cfg.patch_size} vs student '
        f'{student_cfg.patch_size} (use clip-vision distillation for '
        f'mismatched geometries)')


def create_distill_train_state(
    rng: jax.Array,
    student_cfg,
    optimizer: optax.GradientTransformation,
    *,
    teacher_dim: int | None = None,
    student_params: Params | None = None,
    kind: str = 'encoder',
) -> DistillTrainState:
  """``kind``: 'encoder' | 'clip_vision' | 'classifier'.  A projection
  head is added iff the widths differ (``teacher_dim`` vs the student's
  ``model_dim``); classifier distillation matches logits, never needs
  one."""
  init_rng, proj_rng = jax.random.split(rng)
  if student_params is None:
    init_fn = {
        'encoder': init_lib.init_factorized_encoder,
        'clip_vision': init_lib.init_video_clip,
        'classifier': init_lib.init_video_classifier,
    }[kind]
    student_params = init_fn(init_rng, student_cfg)
  trainable = {'student': student_params}
  d_student = getattr(student_cfg, 'model_dim', None)
  if kind == 'encoder' and teacher_dim is not None and teacher_dim != d_student:
    trainable['proj'] = init_projection(proj_rng, d_student, teacher_dim)
  return DistillTrainState(
      step=jnp.zeros((), jnp.int32),
      trainable=trainable,
      opt_state=optimizer.init(trainable),
  )


def _apply_proj(trainable: Params, features):
  if 'proj' not in trainable:
    return features
  p = trainable['proj']
  return features.astype(jnp.float32) @ p['w'] + p['b']


def make_encoder_distill_step(
    teacher_cfg: fe.FactorizedEncoderConfig,
    student_cfg: fe.FactorizedEncoderConfig,
    optimizer: optax.GradientTransformation,
    *,
    accum_steps: int = 1,
):
  """Token-level feature distillation through factorized encoders.

  Returns ``step(state, teacher_params, batch, rng) -> (state, metrics)``
  (pure, jittable); batch ``{'video': [B, T, H, W, 3]}`` (leading
  ``[accum_steps, ...]`` when accumulating).  The teacher forward runs
  in eval mode inside the step (per microbatch under accumulation, so
  one microbatch of teacher features is live at a time).
  """
  _check_token_alignment(teacher_cfg, student_cfg)

  def loss_fn(trainable, teacher_params, video, rng):
    teacher_feat, _ = fe.apply(teacher_params, video, teacher_cfg,
                               train=False)
    teacher_feat = jax.lax.stop_gradient(teacher_feat)
    student_feat, _ = fe.apply(trainable['student'], video, student_cfg,
                               train=True, rng=rng)
    loss, metrics = cosine_distill_loss(
        _apply_proj(trainable, student_feat), teacher_feat)
    metrics['loss'] = loss
    return loss, metrics

  return _make_step(loss_fn, optimizer, accum_steps=accum_steps)


def make_clip_vision_distill_step(
    teacher_cfg: vclip.VideoCLIPConfig,
    student_cfg: vclip.VideoCLIPConfig,
    optimizer: optax.GradientTransformation,
    *,
    accum_steps: int = 1,
):
  """Pooled-embedding distillation of the lvt vision tower (the
  retrieval representation).  Same signature as
  :func:`make_encoder_distill_step`.  Both embeddings are l2-normalized
  by ``encode_vision``; widths must match (the pooled space IS the
  product surface — project-and-serve would change the student's
  serving output)."""
  if teacher_cfg.model_dim != student_cfg.model_dim:
    raise ValueError(
        f'clip-vision distillation matches the served embedding space: '
        f'teacher model_dim={teacher_cfg.model_dim} != student '
        f'{student_cfg.model_dim}')

  def loss_fn(trainable, teacher_params, video, rng):
    teacher_emb, _ = vclip.encode_vision(teacher_params, video, teacher_cfg,
                                         train=False)
    teacher_emb = jax.lax.stop_gradient(teacher_emb)
    student_emb, _ = vclip.encode_vision(trainable['student'], video,
                                         student_cfg, train=True, rng=rng)
    loss, metrics = cosine_distill_loss(student_emb, teacher_emb)
    metrics['loss'] = loss
    return loss, metrics

  return _make_step(loss_fn, optimizer, accum_steps=accum_steps)


def make_classifier_distill_step(
    teacher_cfg: vc.VideoClassifierConfig,
    student_cfg: vc.VideoClassifierConfig,
    optimizer: optax.GradientTransformation,
    *,
    temperature: float = 2.0,
    alpha: float = 0.5,
    accum_steps: int = 1,
):
  """Logit distillation: ``alpha·τ²KL + (1-alpha)·CE``.  Batch needs
  ``{'video', 'label'}`` (``alpha=1.0`` ignores labels — pass zeros)."""
  if teacher_cfg.num_classes != student_cfg.num_classes:
    raise ValueError(
        f'logit distillation needs matching class counts: '
        f'{teacher_cfg.num_classes} vs {student_cfg.num_classes}')
  if not 0.0 <= alpha <= 1.0:
    raise ValueError(f'alpha must be in [0, 1], got {alpha}')

  from videoprism_tpu.train import objectives

  def loss_fn(trainable, teacher_params, batch, rng):
    teacher_logits, _ = vc.apply(teacher_params, batch['video'], teacher_cfg,
                                 train=False)
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    student_logits, _ = vc.apply(trainable['student'], batch['video'],
                                 student_cfg, train=True, rng=rng)
    kd = kd_kl_loss(student_logits, teacher_logits, temperature)
    metrics = {'kd_loss': kd}
    loss = alpha * kd
    if alpha < 1.0:
      ce, ce_metrics = objectives.softmax_cross_entropy_loss(
          student_logits, batch['label'])
      loss = loss + (1.0 - alpha) * ce
      metrics.update(ce_metrics)
    metrics['loss'] = loss
    return loss, metrics

  return _make_step(loss_fn, optimizer, accum_steps=accum_steps,
                    batch_is_dict=True)


def _make_step(loss_fn, optimizer, *, accum_steps: int,
               batch_is_dict: bool = False):
  """Shared optimizer plumbing.  ``loss_fn(trainable, teacher_params,
  video_or_batch, rng) -> (loss, metrics)``."""

  def pick(batch):
    return batch if batch_is_dict else batch['video']

  def step(state: DistillTrainState, teacher_params, batch, rng):
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    if accum_steps > 1:
      grads, metrics = accumulate_gradients(
          lambda tr, mb, r: vg(tr, teacher_params, pick(mb), r),
          state.trainable, batch, jax.random.split(rng, accum_steps))
    else:
      (_, metrics), grads = vg(state.trainable, teacher_params, pick(batch),
                               rng)
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, state.trainable)
    new_trainable = optax.apply_updates(state.trainable, updates)
    metrics['grad_norm'] = optax.global_norm(grads)
    return DistillTrainState(state.step + 1, new_trainable,
                             new_opt_state), metrics

  return step


def make_distill_eval_step(
    teacher_cfg,
    student_cfg,
    kind: str = 'encoder',
):
  """Held-out distillation quality: jitted ``(trainable, teacher_params,
  video) -> metrics`` with the student in EVAL mode (no dropout) — the
  metric the training loop's in-batch ``cosine`` only approximates.

  Metrics: ``eval_cosine`` (encoder / clip_vision: mean cosine to the
  teacher, the quantity distillation maximizes) or ``eval_agreement`` +
  ``eval_kl`` (classifier: teacher-student top-1 agreement and KL).
  """
  if kind == 'encoder':
    _check_token_alignment(teacher_cfg, student_cfg)

    def eval_step(trainable, teacher_params, video):
      t, _ = fe.apply(teacher_params, video, teacher_cfg, train=False)
      s, _ = fe.apply(trainable['student'], video, student_cfg,
                      train=False)
      _, metrics = cosine_distill_loss(_apply_proj(trainable, s), t)
      return {'eval_cosine': metrics['cosine']}
  elif kind == 'clip_vision':
    def eval_step(trainable, teacher_params, video):
      t, _ = vclip.encode_vision(teacher_params, video, teacher_cfg,
                                 train=False)
      s, _ = vclip.encode_vision(trainable['student'], video, student_cfg,
                                 train=False)
      _, metrics = cosine_distill_loss(s, t)
      return {'eval_cosine': metrics['cosine']}
  elif kind == 'classifier':
    def eval_step(trainable, teacher_params, video):
      t, _ = vc.apply(teacher_params, video, teacher_cfg, train=False)
      s, _ = vc.apply(trainable['student'], video, student_cfg,
                      train=False)
      agree = jnp.mean(
          (jnp.argmax(t, axis=-1) == jnp.argmax(s, axis=-1)).astype(
              jnp.float32))
      return {'eval_agreement': agree, 'eval_kl': kd_kl_loss(s, t, 1.0)}
  else:
    raise ValueError(f'unknown kind {kind!r}')

  return jax.jit(eval_step)


def evaluate_distill(
    eval_step,
    trainable: Params,
    teacher_params: Params,
    source,
    *,
    batch_size: int = 8,
    max_batches: int | None = None,
) -> dict[str, float]:
  """Sweeps a ``(clip, *)`` source through ``eval_step`` and returns
  example-weighted mean metrics (``num_examples`` records the population).

  The tail batch runs at its natural (smaller) size — one extra compile,
  but every example counts; silently dropping ``n % batch_size``
  examples would report metrics over a different population than the
  caller believes."""
  import numpy as np

  totals: dict[str, float] = {}
  weight = 0
  n = len(source)
  batches = list(range(0, n, batch_size))
  if max_batches is not None:
    batches = batches[:max_batches]
  for start in batches:
    stop = min(start + batch_size, n)
    video = np.stack([source.get(i)[0] for i in range(start, stop)])
    metrics = eval_step(trainable, teacher_params, video)
    for key, value in metrics.items():
      totals[key] = totals.get(key, 0.0) + float(value) * (stop - start)
    weight += stop - start
  if not weight:
    raise ValueError(f'evaluate_distill: empty source of {n} examples')
  out = {k: v / weight for k, v in totals.items()}
  out['num_examples'] = float(weight)
  return out


def make_sharded_distill_step(
    step,
    mesh,
    state: DistillTrainState,
    teacher_params: Params,
    *,
    accum_steps: int = 1,
    with_labels: bool = False,
):
  """jits a distill step over ``mesh``: student + teacher params sharded
  by the GSPMD name rules (the teacher is usually the tree worth
  sharding), projection replicated, batch data-parallel, state donated.
  Returns ``(jitted_step, sharded_state, sharded_teacher)``."""
  student_sh = shard_lib.param_shardings(state.trainable['student'], mesh)
  repl = mesh_lib.replicated(mesh)
  trainable_sh = {'student': student_sh}
  if 'proj' in state.trainable:
    trainable_sh['proj'] = jax.tree.map(lambda _: repl,
                                        state.trainable['proj'])
  opt_sh = _opt_state_shardings(state.opt_state, trainable_sh, repl,
                                trainable_sh=trainable_sh)
  state_sh = DistillTrainState(step=repl, trainable=trainable_sh,
                               opt_state=opt_sh)
  teacher_sh = shard_lib.param_shardings(teacher_params, mesh)
  extra = accum_steps > 1
  batch_axis = 1 if extra else 0
  batch_sh = {'video': mesh_lib.data_sharding(mesh, 5 + extra,
                                              batch_axis=batch_axis)}
  if with_labels:
    batch_sh['label'] = mesh_lib.data_sharding(mesh, 1 + extra,
                                               batch_axis=batch_axis)
  sharded_state = jax.device_put(state, state_sh)
  sharded_teacher = jax.device_put(teacher_params, teacher_sh)
  jitted = jax.jit(
      step,
      in_shardings=(state_sh, teacher_sh, batch_sh, repl),
      out_shardings=(state_sh, repl),
      donate_argnums=(0,),
  )
  return jitted, sharded_state, sharded_teacher
