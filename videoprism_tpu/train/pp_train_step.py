"""Pipeline-parallel CLIP training: the spatial stack's layers sharded
across stages.

Tensor parallelism splits every layer's *width*; this step instead splits
the vision tower's *depth* (the spatial stack — 40 of giant's 44 layers)
over the ``model`` mesh axis with the GPipe schedule from
:mod:`videoprism_tpu.parallel.pp`.  Each stage holds ``L/S`` layers of
stacked weights (and, because AdamW moments mirror the param layout, ``1/S``
of the optimizer state for the stack); microbatches of frame rows flow
stage-to-stage through ``ppermute``.  The tick loop is a ``lax.scan``, so
``jax.value_and_grad`` differentiates straight through the schedule — the
transposed ``ppermute``s ARE the backward pipeline.

Everything outside the spatial stack (patch/pos embeddings, temporal stack,
aux tower, pooler, text tower) is replicated over ``model`` and computed
redundantly per stage — at giant scale that is <10% of FLOPs, and it keeps
the numerics identical to the single-device step (validated in
tests/test_parallel.py).

The reference has no training code and no way to split layers across
devices at all (SURVEY.md §2.7); this is a north-star TPU-native addition.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from videoprism_tpu.models import clip as vclip
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import pp as pp_lib
from videoprism_tpu.train import objectives
from videoprism_tpu.train.train_step import (
    TrainState,
    _opt_state_shardings,
    accumulate_gradients,
)

Params = Any


def _pp_param_specs(params: Params) -> Params:
  """Spatial-stack ``x_layers`` leaves stage-sharded on the leading layer
  axis; everything else replicated."""

  def spec(path, _):
    names = [getattr(p, 'key', getattr(p, 'name', None)) for p in path]
    if 'spatial_encoder' in names and 'x_layers' in names:
      return PartitionSpec(mesh_lib.MODEL_AXIS)
    return PartitionSpec()

  return jax.tree_util.tree_map_with_path(spec, params)


def make_pp_train_step(
    cfg: vclip.VideoCLIPConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    state: TrainState,
    *,
    n_microbatches: int,
    kernel_interpret: bool = False,
    accum_steps: int = 1,
    objective: str = 'infonce',
):
  """Returns ``(jitted_step, sharded_state)`` for pipeline-parallel CLIP
  training over ``mesh``'s ``model`` axis (stages) x ``data`` axis (DP).

  ``n_microbatches`` splits each data shard's ``B_local * T`` spatial frame
  rows through the pipeline (must divide them); more microbatches shrink
  the GPipe bubble ``(S-1)/(M+S-1)``.  With ``accum_steps > 1`` the batch
  carries a leading (unsharded) microbatch axis exactly as in the other
  train steps.
  """
  n_stages = mesh.shape[mesh_lib.MODEL_AXIS]
  pp_cfg = dataclasses.replace(
      cfg, tp_axis=None, kernel_interpret=kernel_interpret)
  vis_cfg = pp_cfg.vision_config()
  stack_cfg = vis_cfg.vit_layer_config(vis_cfg.num_spatial_layers)
  pp_lib._validate_pp_cfg(stack_cfg, n_stages)
  if (stack_cfg.atten_dropout or stack_cfg.residual_dropout
      or stack_cfg.relu_dropout):
    raise NotImplementedError(
        'the pipelined spatial stack runs dropout-free; train with the '
        'default zero dropout rates or use another train step')

  param_specs = _pp_param_specs(state.params)
  repl = PartitionSpec()
  data = mesh_lib.DATA_AXIS

  def override(name, stack_params, x, s_cfg, paddings):
    if name != 'spatial_encoder':
      return None
    s_cfg = dataclasses.replace(s_cfg, pack_small_sequences=False)
    m = n_microbatches
    bl = x.shape[0]
    if bl % m:
      raise ValueError(
          f'per-shard spatial batch {bl} (frame rows) not divisible by '
          f'{m} microbatches')
    pad = (jnp.zeros(x.shape[:-1], x.dtype) if paddings is None
           else paddings)
    xm = x.reshape(m, bl // m, *x.shape[1:])
    pm = pad.reshape(m, bl // m, *pad.shape[1:])
    out = pp_lib.pp_stacked_transformer(
        stack_params['transformers_stack']['x_layers'], xm, pm, s_cfg,
        axis=mesh_lib.MODEL_AXIS, n_stages=n_stages)
    return out.reshape(bl, *out.shape[2:])

  def global_loss(params, log_temperature, video, ids, pads, rng):
    v_emb, t_emb, _ = vclip.apply(
        params, video, ids, pads, pp_cfg, train=True, rng=rng,
        stack_override=override)
    # Global-batch negatives: gather every data shard's embeddings.
    v_emb = jax.lax.all_gather(v_emb, data, axis=0, tiled=True)
    t_emb = jax.lax.all_gather(t_emb, data, axis=0, tiled=True)
    return objectives.contrastive_loss(
        objective, v_emb, t_emb, log_temperature)

  sharded_loss = mesh_lib.shard_map_compat(
      global_loss, mesh,
      in_specs=(
          param_specs, repl,
          PartitionSpec(data, None, None, None, None),
          PartitionSpec(data, None), PartitionSpec(data, None), repl),
      out_specs=repl)

  def train_step(state: TrainState, batch, rng):
    trainable = (state.params, state.log_temperature)

    def loss_on(trainable, microbatch, mb_rng):
      params, log_t = trainable
      return sharded_loss(params, log_t, microbatch['video'],
                          microbatch['text_token_ids'],
                          microbatch['text_paddings'], mb_rng)

    vg = jax.value_and_grad(loss_on, has_aux=True)
    if accum_steps > 1:
      grads, metrics = accumulate_gradients(
          vg, trainable, batch, jax.random.split(rng, accum_steps))
    else:
      (_, metrics), grads = vg(trainable, batch, rng)
    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, trainable)
    new_params, new_log_temp = optax.apply_updates(trainable, updates)
    metrics['grad_norm'] = optax.global_norm(grads)
    return TrainState(
        step=state.step + 1, params=new_params,
        log_temperature=new_log_temp, opt_state=new_opt_state), metrics

  param_sh = jax.tree.map(
      lambda spec: NamedSharding(mesh, spec), param_specs,
      is_leaf=lambda x: isinstance(x, PartitionSpec))
  repl_sh = mesh_lib.replicated(mesh)
  opt_sh = _opt_state_shardings(state.opt_state, param_sh, repl_sh)
  state_sh = TrainState(step=repl_sh, params=param_sh,
                        log_temperature=repl_sh, opt_state=opt_sh)
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
      train_step,
      in_shardings=(state_sh, batch_sh, repl_sh),
      out_shardings=(state_sh, repl_sh),
      donate_argnums=(0,),
  )
  return step, sharded_state
