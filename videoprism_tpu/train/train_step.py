"""Sharded CLIP training step: pjit over a (data, model) mesh.

Layout (see :mod:`videoprism_tpu.parallel.sharding`): params tensor-parallel
over ``model`` (heads / MLP hidden / vocab), batch data-parallel over
``data``; gradients inherit the param layout so the optimizer update is fully
sharded too.  Rematerialization comes from the scan stack's ``remat`` flag
(``jax.checkpoint`` with ``nothing_saveable`` — the reference's Repeat layer
policy, videoprism/layers.py:925-929).

The reference has no training code at all; this module is the TPU-native
extension that makes the stack production-trainable.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import sharding as shard_lib
from videoprism_tpu.train import objectives

Params = Any


@dataclasses.dataclass
class TrainState:
  """Minimal functional train state (a pytree)."""

  step: jax.Array
  params: Params
  log_temperature: jax.Array
  opt_state: Any

  def tree_flatten(self):
    return ((self.step, self.params, self.log_temperature, self.opt_state),
            None)

  @classmethod
  def tree_unflatten(cls, aux, children):
    del aux
    return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def _weight_decay_mask(params) -> Any:
  """True (decay) only for matmul/embedding weight leaves.

  Standard AdamW practice — and what every reference CLIP/ViT recipe
  does — is to exclude biases, LayerNorm scales, and the contrastive
  ``log_temperature`` from decay: decaying the logit scale fights the
  learned temperature, and decaying norm parameters is a silent
  quality regression.  Keyed by leaf NAME, not rank, because scanned
  stacks give biases a second (layer) axis: the checkpoint schema names
  matmul kernels ``w`` (attention, ``[L?, D, N, H]``), ``kernel``
  (dense), and ``emb_var`` (embedding/pos-emb tables).  Everything else
  — ``b``/``bias``, ``scale``, ``per_dim_scale``, ``log_temperature``,
  LoRA a/b adapters at their default-on scale — is excluded.
  """
  decay_names = ('w', 'kernel', 'emb_var')

  def leaf_mask(path, _):
    for entry in reversed(path):
      key = getattr(entry, 'key', getattr(entry, 'name', None))
      if key is not None:
        return str(key) in decay_names
    return False  # bare leaf (e.g. log_temperature in the trainable tuple)

  return jax.tree_util.tree_map_with_path(leaf_mask, params)


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    warmup_steps: int = 1000,
    total_steps: int = 100_000,
    b1: float = 0.9,
    b2: float = 0.95,
    clip_norm: float = 1.0,
    mu_dtype=None,
    skip_nonfinite: int | None = None,
    schedule: str = 'cosine',
    optimizer: str = 'adamw',
) -> optax.GradientTransformation:
  """Optimizer + warmup schedule + global-norm clipping.

  ``optimizer`` picks the update rule:

  * ``'adamw'`` (default) — the recipe every other knob below documents.
  * ``'adafactor'`` — factored second moments: O(rows+cols) state per
    matrix instead of O(rows·cols), the classic TPU choice when the
    optimizer state dominates HBM (giant towers, no FSDP).  Runs with
    momentum off (the memory-saving configuration); ``b2`` is the decay
    exponent's base rate and ``weight_decay`` applies decoupled, masked
    like AdamW.  ``mu_dtype`` is ignored (there is no mu).
  * ``'lion'`` — sign-momentum: one bf16-safe moment (a third of AdamW
    state), typically wants ~3-10× smaller ``learning_rate`` and ~3-10×
    larger ``weight_decay`` than AdamW.  ``b1``/``b2`` map to Lion's
    interpolation/decay pair (0.9/0.99 defaults apply if left at the
    AdamW defaults).
  * ``'sgd'`` — Nesterov momentum (``b1``), no adaptive state at all;
    ``weight_decay`` applies decoupled (masked).

  ``schedule`` picks the post-warmup decay: ``'cosine'`` (to 0 at
  ``total_steps``), ``'linear'`` (to 0), or ``'constant'`` (hold the
  peak — the right choice when ``total_steps`` is open-ended, e.g.
  elastic runs resumed indefinitely).

  ``warmup_steps`` is honored as given unless it would make the cosine
  decay span non-positive (warmup >= total), in which case it is clamped
  to total_steps - 1 so short smoke runs still construct.

  ``mu_dtype`` (e.g. ``jnp.bfloat16``) stores the first moment in reduced
  precision — a third off AdamW state memory (``nu`` must stay fp32: it
  accumulates squares whose dynamic range bf16 cannot hold).  Composes
  with the FSDP sharding (moments inherit the param layout either way).

  ``skip_nonfinite`` arms bf16-overflow protection: a step whose gradients
  contain NaN/inf applies a zero update and leaves the optimizer moments
  untouched (params stay at the last good values), tolerating up to that
  many *consecutive* bad steps before the guard stands aside and lets the
  divergence surface (``optax.apply_if_finite`` semantics).  The trainer
  loop spots skipped steps host-side via the ``grad_norm`` metric (NaN/inf
  there is exactly the skip condition).
  """
  if warmup_steps >= total_steps:
    warmup_steps = max(total_steps - 1, 0)
  if schedule == 'cosine':
    lr = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate,
        warmup_steps=warmup_steps, decay_steps=total_steps)
  elif schedule == 'linear':
    lr = optax.join_schedules([
        optax.linear_schedule(0.0, learning_rate, warmup_steps),
        optax.linear_schedule(learning_rate, 0.0,
                              total_steps - warmup_steps),
    ], [warmup_steps])
  elif schedule == 'constant':
    lr = optax.join_schedules([
        optax.linear_schedule(0.0, learning_rate, warmup_steps),
        optax.constant_schedule(learning_rate),
    ], [warmup_steps])
  else:
    raise ValueError(f"unknown schedule {schedule!r} "
                     "(expected 'cosine', 'linear', or 'constant')")
  if optimizer == 'adamw':
    rule = optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay,
                       mu_dtype=mu_dtype, mask=_weight_decay_mask)
  elif optimizer == 'adafactor':
    # factored=True + momentum=None is the memory configuration; decay
    # uses adafactor's own multiplicative rule, masked like AdamW's.
    rule = optax.adafactor(
        lr, decay_rate=b2, momentum=None, factored=True,
        weight_decay_rate=weight_decay or None,
        weight_decay_mask=_weight_decay_mask if weight_decay else None)
  elif optimizer == 'lion':
    # b1=0.9 is both optimizers' default; an untouched AdamW b2 (0.95)
    # becomes Lion's 0.99.
    rule = optax.lion(lr, b1=b1, b2=0.99 if b2 == 0.95 else b2,
                      weight_decay=weight_decay, mu_dtype=mu_dtype,
                      mask=_weight_decay_mask)
  elif optimizer == 'sgd':
    rule = optax.chain(
        optax.add_decayed_weights(weight_decay, _weight_decay_mask),
        optax.sgd(lr, momentum=b1, nesterov=True),
    )
  else:
    raise ValueError(f"unknown optimizer {optimizer!r} (expected 'adamw', "
                     "'adafactor', 'lion', or 'sgd')")
  opt = optax.chain(
      optax.clip_by_global_norm(clip_norm),
      rule,
  )
  if skip_nonfinite is not None:
    if skip_nonfinite <= 0:
      raise ValueError(f'skip_nonfinite must be positive, got '
                       f'{skip_nonfinite}')
    # ApplyIfFiniteState is a namedtuple (scalar counters + inner_state),
    # which _opt_state_shardings recurses structurally — the sharded train
    # steps and orbax checkpointing both compose unchanged.
    opt = optax.apply_if_finite(opt, max_consecutive_errors=skip_nonfinite)
  return opt


def create_train_state(
    rng: jax.Array,
    cfg: vclip.VideoCLIPConfig,
    optimizer: optax.GradientTransformation,
    *,
    init_log_temperature: float | None = None,
    init_bias: float = -10.0,
    objective: str = 'infonce',
    pretrained_params: Params | None = None,
) -> TrainState:
  """``objective`` picks the contrastive loss family and with it the
  shape of the ``log_temperature`` leaf: a scalar (InfoNCE, init CLIP's
  log(1/0.07)) or ``[log_temperature, bias]`` (SigLIP, init log(10) and
  -10 per the paper).  ``init_log_temperature=None`` means the
  objective's default; ``init_bias`` applies to SigLIP only."""
  params = (
      pretrained_params if pretrained_params is not None
      else init_lib.init_video_clip(rng, cfg))
  log_temperature = objectives.init_temperature_state(
      objective, init_log_temperature, init_bias)
  trainable = (params, log_temperature)
  opt_state = optimizer.init(trainable)
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      log_temperature=log_temperature,
      opt_state=opt_state,
  )


def clip_loss_fn(
    trainable: tuple[Params, jax.Array],
    batch: dict[str, jax.Array],
    cfg: vclip.VideoCLIPConfig,
    rng: jax.Array,
    objective: str = 'infonce',
) -> tuple[jax.Array, dict[str, jax.Array]]:
  params, log_temperature = trainable
  video_emb, text_emb, _ = vclip.apply(
      params,
      batch['video'],
      batch['text_token_ids'],
      batch['text_paddings'],
      cfg,
      train=True,
      rng=rng,
  )
  return objectives.contrastive_loss(
      objective, video_emb, text_emb, log_temperature)


def accumulate_gradients(value_and_grad_fn, trainable, batch, rngs):
  """Gradient accumulation: ``lax.scan`` over a leading microbatch axis.

  ``batch`` leaves are shaped ``[accum_steps, micro_batch, ...]``; ``rngs``
  is ``[accum_steps, 2]``.  One backward pass is live at a time (the scan
  carry is just the gradient sum — same footprint as the params), so the
  effective batch scales without scaling activation memory.  Returns
  (mean grads, mean metrics).

  Note the contrastive objective's negatives are *per microbatch* under
  accumulation (each microbatch's loss sees only its own pairs); this is
  the standard trade — global negatives across microbatches would require
  keeping every microbatch's embeddings live, defeating the memory win.
  """
  accum_steps = rngs.shape[0]

  def micro(grad_sum, inp):
    microbatch, rng = inp
    (_, metrics), grads = value_and_grad_fn(trainable, microbatch, rng)
    return jax.tree.map(jnp.add, grad_sum, grads), metrics

  zeros = jax.tree.map(jnp.zeros_like, trainable)
  grad_sum, metrics_stack = jax.lax.scan(micro, zeros, (batch, rngs))
  grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)
  metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics_stack)
  return grads, metrics


def make_train_step(cfg: vclip.VideoCLIPConfig,
                    optimizer: optax.GradientTransformation,
                    *, accum_steps: int = 1, objective: str = 'infonce'):
  """Returns ``step(state, batch, rng) -> (state, metrics)`` (pure, jittable).

  With ``accum_steps > 1`` the batch leaves must carry a leading
  ``[accum_steps, ...]`` microbatch axis (``data.batched_loader(...,
  accum_steps=N)`` emits this layout) and the step averages gradients over
  the microbatches before the single optimizer update.  ``objective``
  ('infonce' | 'siglip') must match the ``log_temperature`` leaf the state
  was created with (``create_train_state(objective=...)``).  Under
  accumulation both objectives scope negatives to the microbatch (see
  :func:`accumulate_gradients`).
  """
  if objective not in objectives.CONTRASTIVE_OBJECTIVES:
    raise ValueError(
        f'unknown contrastive objective {objective!r} (expected one of '
        f'{sorted(objectives.CONTRASTIVE_OBJECTIVES)})')

  def train_step(state: TrainState, batch, rng):
    trainable = (state.params, state.log_temperature)
    if accum_steps > 1:
      vg = jax.value_and_grad(clip_loss_fn, has_aux=True)
      grads, metrics = accumulate_gradients(
          lambda tr, mb, r: vg(tr, mb, cfg, r, objective), trainable, batch,
          jax.random.split(rng, accum_steps))
    else:
      (_, metrics), grads = jax.value_and_grad(
          clip_loss_fn, has_aux=True)(trainable, batch, cfg, rng, objective)
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, trainable)
    new_params, new_log_temp = optax.apply_updates(trainable, updates)
    new_state = TrainState(
        step=state.step + 1,
        params=new_params,
        log_temperature=new_log_temp,
        opt_state=new_opt_state,
    )
    metrics['grad_norm'] = optax.global_norm(grads)
    return new_state, metrics

  return train_step


def make_sharded_train_step(
    cfg: vclip.VideoCLIPConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    state: TrainState,
    *,
    accum_steps: int = 1,
    fsdp: bool = False,
    fsdp_min_size: int | None = None,
    objective: str = 'infonce',
):
  """jits the train step with explicit in/out shardings over ``mesh``.

  Returns (jitted_step, sharded_state): params/opt-state laid out per the
  tensor-parallel rules, batch sharded over the data axis, metrics
  replicated.  Donates the input state so optimizer updates are in-place in
  HBM.  With ``accum_steps > 1`` the batch carries a leading (unsharded)
  microbatch axis and the per-microbatch batch axis shards over ``data``.

  ``fsdp=True`` additionally shards params + optimizer moments over the
  ``data`` axis (ZeRO-3 via GSPMD — see :mod:`videoprism_tpu.parallel.fsdp`):
  per-chip state memory drops by the data-axis size, paid for with a
  per-layer weight all-gather in forward/backward and a reduce-scatter of
  the gradients.
  """
  if fsdp:
    from videoprism_tpu.parallel import fsdp as fsdp_lib

    kw = {} if fsdp_min_size is None else {'min_size': fsdp_min_size}
    param_sh = fsdp_lib.fsdp_param_shardings(state.params, mesh, **kw)
  else:
    param_sh = shard_lib.param_shardings(state.params, mesh)
  repl = mesh_lib.replicated(mesh)
  opt_sh = _opt_state_shardings(state.opt_state, param_sh, repl)
  state_sh = TrainState(
      step=repl, params=param_sh, log_temperature=repl, opt_state=opt_sh)
  batch_axis = 1 if accum_steps > 1 else 0
  extra = accum_steps > 1
  batch_sh = {
      'video': mesh_lib.data_sharding(mesh, 5 + extra, batch_axis=batch_axis),
      'text_token_ids': mesh_lib.data_sharding(
          mesh, 2 + extra, batch_axis=batch_axis),
      'text_paddings': mesh_lib.data_sharding(
          mesh, 2 + extra, batch_axis=batch_axis),
  }

  sharded_state = jax.device_put(state, state_sh)
  step = jax.jit(
      make_train_step(cfg, optimizer, accum_steps=accum_steps,
                      objective=objective),
      in_shardings=(state_sh, batch_sh, repl),
      out_shardings=(state_sh, repl),
      donate_argnums=(0,),
  )
  return step, sharded_state


def _opt_state_shardings(opt_state, param_sh, repl, trainable_sh=None):
  """Optimizer state mirrors the trainable tree's sharding where shapes
  align (adam moments), else replicates (scalars, counts).

  ``trainable_sh`` overrides the trainable tree's sharding pytree; the
  default is the CLIP trainable ``(params, log_temperature)``.
  """
  if trainable_sh is None:
    trainable_sh = (param_sh, repl)

  def assign(leaf):
    return repl

  def compatible(leaf, sh):
    """Keep the param sharding only where the state leaf can actually
    wear it.  Adam moments mirror param shapes exactly; adafactor's
    factored vectors (``v_row``/``v_col``/placeholder ``v``) share the
    params' *structure* but not their shapes — those replicate (they
    are O(rows+cols), replication is free)."""
    shape = getattr(leaf, 'shape', None)
    spec = getattr(sh, 'spec', None)
    if shape is None or spec is None:
      return sh
    if len(spec) > len(shape):
      return repl
    axis_sizes = dict(sh.mesh.shape)
    for dim, axes in zip(shape, spec):
      if axes is None:
        continue
      axes = axes if isinstance(axes, tuple) else (axes,)
      size = 1
      for a in axes:
        size *= axis_sizes[a]
      if dim % size:
        return repl
    return sh

  # optax states are pytrees whose array leaves either mirror the params
  # (moments) or are scalars.  Match by structure: where a subtree's
  # structure equals the trainable structure, reuse the param shardings
  # leaf-wise (shape-checked).
  target_structure = jax.tree.structure(trainable_sh)

  def recurse(node):
    try:
      if jax.tree.structure(node) == target_structure:
        return jax.tree.map(compatible, node, trainable_sh)
    except Exception:
      pass
    if hasattr(node, '_fields'):  # namedtuple (check before tuple!)
      return type(node)(*(recurse(getattr(node, f)) for f in node._fields))
    if isinstance(node, (list, tuple)):
      return type(node)(recurse(x) for x in node)
    if isinstance(node, dict):
      return {k: recurse(v) for k, v in node.items()}
    return assign(node)

  return recurse(opt_state)
