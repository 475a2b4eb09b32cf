"""Layer-wise learning-rate decay (LLRD) for classifier fine-tuning.

The standard ViT/BEiT fine-tuning recipe: the head trains at the peak
learning rate and each transformer layer below it at ``decay`` times the
layer above — lower layers hold their pretrained features while the head
and upper layers adapt.  ``lr(layer at depth d from the top) = lr *
decay**d``.

The TPU twist: this stack stores every layer of a transformer as ONE
scan-stacked leaf with a leading layer axis (``x_layers/...: [L, ...]``,
the reference's ``Repeat`` checkpoint layout).  Per-layer learning rates
therefore cannot be expressed as optax ``multi_transform`` label trees —
instead the factor for a stacked leaf is a ``[L, 1, ...]`` COLUMN of
per-layer multipliers that broadcasts along the layer axis: one
elementwise multiply scales all L layers' updates at their own rates,
with no unstacking and no per-layer optimizer states.

Depth map for ``FactorizedVideoClassifier`` (D = spatial + temporal
layers, bottom of the network = largest depth):

  head (atten_pooler / projection), temporal_ln    -> decay**0 = 1.0
  temporal layer i (0-based, top layer last)       -> decay**(n_tmp - i)
  spatial_ln, temporal_pos_emb                     -> decay**n_tmp
  spatial layer j                                  -> decay**(n_tmp + n_sp - j)
  patch_projection, spatial_pos_emb (the "embedding" tier)
                                                   -> decay**(D + 1)

Applied as the LAST transform in the optax chain, the factor scales the
whole AdamW update (gradient step AND decoupled weight decay) — exactly
the semantics of a per-layer learning rate.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
import optax

from videoprism_tpu.models import classifier as vc

Params = Any


def _stack_column(factors: np.ndarray, leaf) -> jax.Array:
  """[L] per-layer factors shaped [L, 1, ...] to broadcast over a
  scan-stacked leaf."""
  shape = (len(factors),) + (1,) * (leaf.ndim - 1)
  return np.asarray(factors, np.float32).reshape(shape)


def layer_decay_factors(params: Params, cfg: vc.VideoClassifierConfig,
                        decay: float) -> Params:
  """The per-leaf multiplier tree for :func:`scale_by_layer_decay`.

  Scalars everywhere except the scan-stacked ``x_layers`` leaves, which
  get broadcastable per-layer columns.  Structure matches ``params``.
  """
  if not 0.0 < decay <= 1.0:
    raise ValueError(f'layer decay must be in (0, 1], got {decay}')
  n_sp = cfg.encoder.num_spatial_layers
  n_tmp = cfg.encoder.num_temporal_layers
  # Per-layer factors, layer 0 = bottom of each stack.
  tmp_col = decay ** (n_tmp - np.arange(n_tmp))
  sp_col = decay ** (n_tmp + n_sp - np.arange(n_sp))
  embedding_tier = float(decay ** (n_sp + n_tmp + 1))

  def assign(path, leaf):
    keys = [str(getattr(e, 'key', getattr(e, 'name', ''))) for e in path]
    if keys[0] in ('atten_pooler', 'projection'):
      return 1.0
    if 'temporal_ln' in keys:
      return 1.0
    if 'x_layers' in keys:
      col = tmp_col if 'temporal_encoder' in keys else sp_col
      return _stack_column(col, leaf)
    # scan=False trees name layers x_layers_<i>.
    for key in keys:
      if key.startswith('x_layers_'):
        i = int(key.rsplit('_', 1)[1])
        if 'temporal_encoder' in keys:
          return float(decay ** (n_tmp - i))
        return float(decay ** (n_tmp + n_sp - i))
    if 'spatial_ln' in keys or 'temporal_pos_emb' in keys:
      return float(decay ** n_tmp)
    return embedding_tier  # patch_projection, spatial_pos_emb, rest

  return jax.tree_util.tree_map_with_path(assign, params)


def scale_by_layer_decay(params: Params, cfg: vc.VideoClassifierConfig,
                         decay: float) -> optax.GradientTransformation:
  """Stateless optax transform multiplying updates by the depth factors.

  Compose as the LAST link: ``optax.chain(make_optimizer(...),
  scale_by_layer_decay(params, cfg, decay))`` — then the effective
  learning rate of a layer at depth d is ``lr * decay**d``.
  """
  factors = layer_decay_factors(params, cfg, decay)

  def init_fn(params):
    del params
    return optax.EmptyState()

  def update_fn(updates, state, params=None):
    del params
    return jax.tree.map(lambda u, f: u * f, updates, factors), state

  return optax.GradientTransformation(init_fn, update_fn)
