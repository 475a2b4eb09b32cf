"""GSPMD parameter-sharding rules for VideoPrism param trees.

Tensor-parallel layout (the Megatron split, expressed as PartitionSpecs and
left to XLA's SPMD partitioner to lower into ICI collectives):

  * q/k/v projection ``w`` [.., D, N, H]      -> heads N over ``model``
  * output projection ``post/w`` [.., D, N, H] -> heads N over ``model``
    (contraction over N,H => XLA inserts a reduce-scatter/all-reduce)
  * MLP ``ffn_layer1`` kernel [.., D, F]       -> hidden F over ``model``
  * MLP ``ffn_layer2`` kernel [.., F, D]       -> hidden F over ``model``
  * token embedding [V, D]                     -> vocab V over ``model``
  * everything else (LN, biases of post, pos-embs, poolers) replicated

Scan-stacked layers have a leading layer axis; rules are rank-agnostic and
right-align their specs, so the same rule covers stacked and unstacked trees.
Each checkpoint shard is ``device_put`` directly into its target layout —
weights stream HBM-resident and sharded, never materializing a full replica
per chip.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from videoprism_tpu.parallel.mesh import MODEL_AXIS

Params = Any


def _spec(rank: int, *trailing) -> PartitionSpec:
  """Right-aligns ``trailing`` into a rank-sized PartitionSpec."""
  lead = rank - len(trailing)
  if lead < 0:  # tensor smaller than the rule's footprint: replicate
    return PartitionSpec()
  return PartitionSpec(*([None] * lead), *trailing)


def partition_spec_for(path: tuple[str, ...], rank: int) -> PartitionSpec:
  """Returns the PartitionSpec for a param identified by its key path."""
  keys = path

  def tail(*names) -> bool:
    return keys[-len(names):] == names

  # Attention projections, self-attention and poolers alike: (.., D, N, H).
  # Int8 trees carry per-output-channel `w_scale` ([.., N, H] for q/k/v —
  # follows the head split; [.., D] for post — replicated by default).
  for proj in ('query', 'key', 'value'):
    if tail(proj, 'w'):
      return _spec(rank, None, MODEL_AXIS, None)
    if tail(proj, 'b') or tail(proj, 'w_scale'):
      return _spec(rank, MODEL_AXIS, None)
  if tail('post', 'w'):
    return _spec(rank, None, MODEL_AXIS, None)
  # post/b and post/w_scale are [D]: replicated (output of the
  # head-contraction all-reduce).

  # Transformer MLP: split the hidden axis (kernel_scale [.., F] follows;
  # ffn_layer2's kernel_scale [.., D] is replicated by default).
  if tail('ffn_layer1', 'linear', 'kernel'):
    return _spec(rank, None, MODEL_AXIS)
  if tail('ffn_layer1', 'linear', 'bias') or tail(
      'ffn_layer1', 'linear', 'kernel_scale'):
    return _spec(rank, MODEL_AXIS)
  if tail('ffn_layer2', 'linear', 'kernel'):
    return _spec(rank, MODEL_AXIS, None)

  # Token embedding: shard the vocabulary.
  if tail('token_emb', 'emb_var'):
    return _spec(rank, MODEL_AXIS, None)

  return PartitionSpec()


def _key_path(path) -> tuple[str, ...]:
  out = []
  for entry in path:
    if isinstance(entry, jax.tree_util.DictKey):
      out.append(str(entry.key))
    elif isinstance(entry, jax.tree_util.GetAttrKey):
      out.append(str(entry.name))
    else:
      out.append(str(entry))
  return tuple(out)


def param_partition_specs(params: Params) -> Params:
  """PartitionSpec pytree matching ``params``."""
  return jax.tree_util.tree_map_with_path(
      lambda path, leaf: partition_spec_for(_key_path(path), leaf.ndim),
      params)


def param_shardings(params: Params, mesh: Mesh) -> Params:
  """NamedSharding pytree matching ``params``."""
  return jax.tree.map(
      lambda spec: NamedSharding(mesh, spec),
      param_partition_specs(params),
      is_leaf=lambda x: isinstance(x, PartitionSpec))


def shard_params(params: Params, mesh: Mesh, specs: Params | None = None
                 ) -> Params:
  """Places a (host or device) param tree into its sharded layout.

  ``specs``: optional PartitionSpec tree overriding the Megatron rules —
  for callers (TP CLIP/classifier, PP) that already computed custom
  specs; passing it also avoids recomputing the rule tree."""
  if specs is None:
    shardings = param_shardings(params, mesh)
  else:
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PartitionSpec))
  return jax.device_put(params, shardings)
