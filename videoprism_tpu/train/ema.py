"""Exponential moving average of parameters for evaluation/serving.

Contrastive video-text models are customarily evaluated (and shipped) with
an EMA of the training weights; the reference repo is inference-only so
this is a TPU-native training extension.  The EMA tree mirrors the param
tree — including its sharding (``jax.jit`` with donated carry keeps each
leaf in its existing layout, so EMA composes with the GSPMD/FSDP/TP train
steps without extra placement work).

The update keeps the raw biased accumulator and a step count; ``params``
applies the standard Adam-style bias correction ``1 - decay**t`` so early
snapshots are usable.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Params = Any


@dataclasses.dataclass
class EmaState:
  """Pytree: biased EMA accumulator + update count."""

  count: jax.Array
  ema: Params

  def tree_flatten(self):
    return ((self.count, self.ema), None)

  @classmethod
  def tree_unflatten(cls, aux, children):
    del aux
    return cls(*children)


jax.tree_util.register_pytree_node(
    EmaState, EmaState.tree_flatten, EmaState.tree_unflatten)


def init_ema(params: Params) -> EmaState:
  """Zero-initialized accumulator in the params' dtypes and shardings."""
  return EmaState(
      count=jnp.zeros((), jnp.int32),
      ema=jax.tree.map(jnp.zeros_like, params))


def make_ema_update(decay: float):
  """Returns jitted ``update(ema_state, params) -> ema_state``.

  Donates the incoming state so the accumulator updates in place in HBM.
  """
  if not 0.0 < decay < 1.0:
    raise ValueError(f'decay must be in (0, 1), got {decay}')

  def update(state: EmaState, params: Params) -> EmaState:
    ema = jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype),
        state.ema, params)
    return EmaState(count=state.count + 1, ema=ema)

  return jax.jit(update, donate_argnums=(0,))


def ema_params(state: EmaState, decay: float) -> Params:
  """Bias-corrected EMA parameters (the tree to evaluate/serve)."""
  correction = 1.0 - decay ** state.count.astype(jnp.float32)
  correction = jnp.maximum(correction, jnp.finfo(jnp.float32).tiny)
  return jax.tree.map(
      lambda e: (e / correction.astype(e.dtype)), state.ema)
