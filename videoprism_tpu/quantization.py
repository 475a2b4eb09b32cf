"""Weight quantization for int8 serving.

``quantize_for_serving`` walks a parameter tree and converts every
transformer matmul weight (q/k/v/post projections and the two FFN
kernels) to symmetric per-output-channel int8, storing the scale under a
sibling ``<name>_scale`` key.  Everything else (LayerNorms, biases,
embeddings, poolers, patch projection) stays in floating point — those
are bandwidth-trivial and numerics-critical.

The quantized tree is a derived serving artifact: the checkpoint-schema
tree (CLAUDE.md invariant) is never mutated; keys keep their names and
the int8 dtype itself marks a leaf as quantized.  ``dequantize`` inverts
the transform (to the given dtype) for composed fallback paths.

Why int8 at all on this chip: the MXU runs int8 at the same rate as bf16
(measured), so this is a weight-streaming optimization — it halves
per-layer weight HBM traffic and weight VMEM, which dominates
small-batch serving latency for the large/giant towers (measured -36%
per FFN layer-half at giant batch-1; see ops/pallas/int8_blocks.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

# Weight-leaf name -> contraction axes (reduced over in the matmul); the
# scale lives on the remaining (output) axes.  Shapes per the checkpoint
# schema (reference videoprism/layers.py:685-746, 360-420):
#   query/key/value w: [D, N, H]  (contract D)   -> scale [N, H]
#   post           w: [D, N, H]  (contract N,H) -> scale [D]
#   ffn kernel      : [In, Out]   (contract In)  -> scale [Out]
_QKV = ('query', 'key', 'value')


def _quantize_leaf(w: jax.Array, contract_axes: tuple[int, ...]):
  wf = w.astype(jnp.float32)
  s = jnp.max(jnp.abs(wf), axis=contract_axes, keepdims=True) / 127.0
  s = jnp.maximum(s, 1e-12)
  q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
  return q, jnp.squeeze(s, axis=contract_axes)


def _quantize_leaf_host(w, contract_axes: tuple[int, ...]):
  """Numpy twin of :func:`_quantize_leaf` — never touches a device.

  Used when the tree must stay on host (tensor-parallel serving shards
  each leaf straight into its TP layout later; committing the full tree
  to one chip first would defeat TP for over-replica-sized towers).
  np.round matches jnp.round (both round-half-to-even)."""
  wf = np.asarray(w, dtype=np.float32)
  s = np.abs(wf).max(axis=contract_axes, keepdims=True) / 127.0
  s = np.maximum(s, 1e-12)
  q = np.clip(np.round(wf / s), -127, 127).astype(np.int8)
  return q, np.squeeze(s, axis=contract_axes)


def _dequantize_leaf(q: jax.Array, scale: jax.Array,
                     contract_axes: tuple[int, ...], dtype):
  s = jnp.expand_dims(scale, contract_axes)
  return (q.astype(jnp.float32) * s).astype(dtype)


def _axes(ndim: int, stacked: bool, kind: str) -> tuple[int, ...]:
  # Leaves under a scanned stack carry a leading [L] layer axis.
  base = 1 if stacked else 0
  if kind == 'qkv':
    return (base,)                      # contract D of [.., D, N, H]
  if kind == 'post':
    return (base + 1, base + 2)         # contract N, H of [.., D, N, H]
  return (base,)                        # ffn kernel [.., In, Out]


def _is_stacked(w: jax.Array, kind: str) -> bool:
  return w.ndim == (4 if kind in ('qkv', 'post') else 3)


def _walk(tree: Params, fn) -> Params:
  """fn(parent_key, key, subtree) -> replacement or None (recurse)."""
  out = {}
  for k, v in tree.items():
    if isinstance(v, dict):
      replaced = fn(k, v)
      out[k] = replaced if replaced is not None else _walk(v, fn)
    else:
      out[k] = v
  return out


def quantize_for_serving(params: Params, *, on_host: bool = False) -> Params:
  """Returns a new tree with transformer matmul weights in int8.

  ``on_host=True`` runs the quantization math leaf-wise in numpy so no
  device ever holds the full tree (required by tensor-parallel serving,
  which shards each leaf into its TP layout afterwards).
  """
  leaf = _quantize_leaf_host if on_host else _quantize_leaf

  def visit(key, sub):
    if key == 'self_attention' and all(
        k in sub for k in (*_QKV, 'post')):
      new = dict(sub)
      for name in (*_QKV, 'post'):
        kind = 'qkv' if name in _QKV else 'post'
        w = sub[name]['w']
        if w.dtype == jnp.int8:
          continue
        q, s = leaf(w, _axes(w.ndim, _is_stacked(w, kind), kind))
        new[name] = dict(sub[name], w=q, w_scale=s)
      return new
    if key in ('ffn_layer1', 'ffn_layer2') and 'linear' in sub:
      w = sub['linear']['kernel']
      if w.dtype == jnp.int8:
        return dict(sub)
      q, s = leaf(w, _axes(w.ndim, w.ndim == 3, 'ffn'))
      return dict(sub, linear=dict(sub['linear'], kernel=q,
                                   kernel_scale=s))
    return None

  return _walk(params, visit)


def dequantize(params: Params, dtype=jnp.bfloat16) -> Params:
  """Inverts :func:`quantize_for_serving` (composed-path fallback)."""

  def visit(key, sub):
    if key == 'self_attention' and all(
        k in sub for k in (*_QKV, 'post')):
      new = dict(sub)
      for name in (*_QKV, 'post'):
        w = sub[name]['w']
        if w.dtype != jnp.int8:
          continue
        kind = 'qkv' if name in _QKV else 'post'
        deq = _dequantize_leaf(
            w, sub[name]['w_scale'],
            _axes(w.ndim, _is_stacked(w, kind), kind), dtype)
        new[name] = {k: v for k, v in sub[name].items() if k != 'w_scale'}
        new[name]['w'] = deq
      return new
    if key in ('ffn_layer1', 'ffn_layer2') and 'linear' in sub:
      w = sub['linear']['kernel']
      if w.dtype != jnp.int8:
        return None
      deq = _dequantize_leaf(
          w, sub['linear']['kernel_scale'],
          _axes(w.ndim, w.ndim == 3, 'ffn'), dtype)
      linear = {k: v for k, v in sub['linear'].items()
                if k != 'kernel_scale'}
      linear['kernel'] = deq
      return dict(sub, linear=linear)
    return None

  return _walk(params, visit)


def is_quantized(layer_params: Params) -> bool:
  """True if a transformer-layer subtree carries int8 weights."""
  try:
    return layer_params['self_attention']['query']['w'].dtype == jnp.int8
  except (KeyError, TypeError, AttributeError):
    return False
