"""Interop with the reference's MLX weight-file format.

The reference ships an offline Flax→MLX converter
(reference convert_weights.py) producing ``weights/{name}_mlx.npz`` /
``.safetensors`` files with:

  * scan-stacked ``x_layers`` parameters unstacked to
    ``{prefix}/layers/{i}/...`` (convert_weights.py:165-202);
  * ``kernel`` / ``scale`` / ``emb_var`` leaves renamed to ``weight``
    (convert_weights.py:88-104);
  * everything else (attention ``w``/``b``, layouts, LN values) unchanged —
    the runtime transposes live in the MLX loader, not the file.

This module provides both directions **without any MLX dependency** (the
files are plain npz/safetensors):

  * :func:`export_mlx_weights` — write our param tree in the reference's
    MLX file format, so reference users can consume TPU-trained weights;
  * :func:`import_mlx_weights` — load an existing MLX weight file back
    into our (stacked, checkpoint-schema) tree, so reference users can
    bring the weights they already have.
"""

from __future__ import annotations

import json
import re
from typing import Any

import numpy as np

from videoprism_tpu.io import checkpoints as ckpt_lib

# Leaf renames applied by the reference converter (convert_weights.py:88-104).
_TO_WEIGHT = ('kernel', 'scale', 'emb_var')

# Parent-directory context that disambiguates ``weight`` on the way back.
_LN_PARENTS = re.compile(
    r'(^|/)('
    r'layer_norm|pre_layer_norm|post_layer_norm|'
    r'spatial_ln|temporal_ln|unimodal_ln|pooling_attention_layer_norm'
    r')$')
_EMB_PARENTS = re.compile(r'(^|/)(\w*pos_emb|token_emb)$')

_LAYERS_RE = re.compile(r'^(.*)/layers/(\d+)/(.*)$')


def _rename_to_mlx(key: str) -> str:
  for leaf in _TO_WEIGHT:
    if key.endswith('/' + leaf):
      return key[: -len(leaf)] + 'weight'
  return key


def _rename_from_mlx(key: str) -> str:
  if not key.endswith('/weight'):
    return key
  parent = key[: -len('/weight')]
  if _LN_PARENTS.search(parent):
    return parent + '/scale'
  if _EMB_PARENTS.search(parent):
    return parent + '/emb_var'
  return parent + '/kernel'  # dense layers: .../linear/weight


def export_mlx_weights(params: Any) -> dict[str, np.ndarray]:
  """Our (possibly scan-stacked) param tree -> flat MLX-format dict.

  Matches the output of the reference's ``convert_flax_to_mlx``
  (convert_weights.py:107-226): every array under an ``x_layers`` node is
  unstacked along its leading (layer) axis into ``.../layers/{i}/...``.
  """
  flat = dict(ckpt_lib.tree_flatten_with_names(params))
  out: dict[str, np.ndarray] = {}
  for key, value in flat.items():
    value = np.asarray(value)
    if '/x_layers/' in key:
      prefix, rest = key.split('/x_layers/', 1)
      for i in range(value.shape[0]):
        out[_rename_to_mlx(f'{prefix}/layers/{i}/{rest}')] = value[i]
    else:
      out[_rename_to_mlx(key)] = value
  return out


def import_mlx_weights(flat: dict[str, np.ndarray]) -> dict:
  """Flat MLX-format dict -> our nested, scan-stacked param tree.

  Inverse of :func:`export_mlx_weights`: ``.../layers/{i}/...`` groups are
  re-stacked into ``x_layers`` arrays with a leading layer axis (the layout
  of both the public "repeated" checkpoints and our scanned stacks), and
  ``weight`` leaves are renamed back by parent context.
  """
  stacked_groups: dict[tuple[str, str], dict[int, np.ndarray]] = {}
  plain: dict[str, np.ndarray] = {}

  for key, value in flat.items():
    m = _LAYERS_RE.match(key)
    if m:
      prefix, idx, rest = m.group(1), int(m.group(2)), m.group(3)
      stacked_groups.setdefault((prefix, rest), {})[idx] = np.asarray(value)
    else:
      plain[_rename_from_mlx(key)] = np.asarray(value)

  for (prefix, rest), by_idx in stacked_groups.items():
    n = max(by_idx) + 1
    missing = [i for i in range(n) if i not in by_idx]
    if missing:
      raise ValueError(
          f'MLX weights missing layers {missing} for {prefix}/.../{rest}')
    stacked = np.stack([by_idx[i] for i in range(n)], axis=0)
    plain[_rename_from_mlx(f'{prefix}/x_layers/{rest}')] = stacked

  keys, values = zip(*plain.items())
  return ckpt_lib.recover_tree(list(keys), list(values))


def save_mlx_weights(path: str, params: Any, model_name: str = '',
                     metadata_path: str | None = None) -> None:
  """Writes MLX-format weights (+ optional metadata JSON, as the reference
  converter does at convert_weights.py:292-338, 408-421)."""
  flat = export_mlx_weights(params)
  if path.endswith('.safetensors'):
    from safetensors import numpy as st_numpy

    st_numpy.save_file(
        {k: np.ascontiguousarray(v) for k, v in flat.items()}, path)
  else:
    np.savez(path, **flat)
  if metadata_path:
    meta = {
        'model_name': model_name,
        'num_parameters': int(sum(v.size for v in flat.values())),
        'num_tensors': len(flat),
        'format': 'mlx',
    }
    with open(metadata_path, 'w') as f:
      json.dump(meta, f, indent=2)


def load_mlx_weights(path: str) -> dict:
  """Reads an MLX-format weights file into our nested stacked tree."""
  if path.endswith('.safetensors'):
    from safetensors import numpy as st_numpy

    flat = dict(st_numpy.load_file(path))
  else:
    flat = dict(np.load(path))
  return import_mlx_weights(flat)
