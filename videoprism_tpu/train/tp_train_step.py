"""Tensor-parallel CLIP training that keeps the fused kernels.

The GSPMD train step (:mod:`videoprism_tpu.train.train_step`) requires
``attention_impl='xla'`` under tensor parallelism because GSPMD cannot
partition ``pallas_call``.  This module builds the shard_map alternative:

  * params are laid out per the Megatron rules (heads/MLP hidden over the
    ``model`` axis) — except the text vocabulary embedding, which stays
    replicated (32k x D is small, and a plain replicated lookup beats a
    masked-lookup+psum under manual TP);
  * the loss function runs INSIDE shard_map: towers on the local batch
    shard with per-shard fused kernels and explicit per-layer psums
    (``TransformerLayerConfig.tp_axis``), then an all_gather over the
    ``data`` axis gives every shard the global batch of embeddings for
    the contrastive loss with global negatives;
  * ``jax.value_and_grad`` differentiates *through* the shard_map — its
    AD inserts the transposed collectives, so gradients come out already
    reduced and in the parameter layout (validated against the
    single-device step in tests/test_parallel.py).
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
from videoprism_tpu.parallel import sharding as shard_lib
from videoprism_tpu.train import objectives
from videoprism_tpu.train.train_step import (
    TrainState,
    _opt_state_shardings,
    accumulate_gradients,
)

Params = Any


def _tp_param_specs(params: Params) -> Params:
  """Megatron layout, with the vocabulary embedding kept replicated."""
  specs = shard_lib.param_partition_specs(params)
  if 'text_encoder' in specs and 'token_emb' in specs['text_encoder']:
    specs['text_encoder']['token_emb'] = jax.tree.map(
        lambda _: PartitionSpec(),
        specs['text_encoder']['token_emb'],
        is_leaf=lambda x: isinstance(x, PartitionSpec))
  return specs


def make_tp_train_step(
    cfg: vclip.VideoCLIPConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    state: TrainState,
    *,
    kernel_interpret: bool = False,
    accum_steps: int = 1,
    objective: str = 'infonce',
):
  """Returns ``(jitted_step, sharded_state)`` for manual-TP CLIP training.

  The per-layer math matches the GSPMD step; the difference is that the
  fused Pallas block kernels stay active per shard.  ``kernel_interpret``
  runs the kernels in interpret mode (virtual CPU mesh tests/dryrun).
  With ``accum_steps > 1`` the batch carries a leading (unsharded)
  microbatch axis; gradients average over the microbatches before the
  single optimizer update.
  """
  tp = mesh.shape[mesh_lib.MODEL_AXIS]
  if cfg.num_heads % tp or cfg.mlp_dim % tp or (cfg.model_dim * 4) % tp:
    raise ValueError(
        f'heads={cfg.num_heads}/mlp={cfg.mlp_dim} not divisible by '
        f'model axis size {tp}')
  tp_cfg = dataclasses.replace(
      cfg, tp_axis=mesh_lib.MODEL_AXIS if tp > 1 else None,
      kernel_interpret=kernel_interpret)

  param_specs = _tp_param_specs(state.params)
  repl = PartitionSpec()
  data = mesh_lib.DATA_AXIS

  def global_loss(params, log_temperature, video, ids, pads, rng):
    v_emb, t_emb, _ = vclip.apply(
        params, video, ids, pads, tp_cfg, train=True, rng=rng)
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
