"""Checkpoint tree I/O: flat npz / safetensors <-> nested param pytrees.

The public VideoPrism checkpoints are npz files with flat ``a/b/c``-style keys
and scan-stacked (leading layer axis) transformer weights.  Because this
framework's param trees use the same names and the same stacked layout, a
checkpoint loads by key-split alone — no renaming, transposing, or unstacking
(unlike the reference's MLX converter, videoprism/convert_weights.py).

Functional parity targets: ``traverse_with_names`` / ``tree_flatten_with_names``
/ ``recover_tree`` / ``npload`` / ``load_checkpoint`` (reference
videoprism/utils.py:30-169).
"""

from __future__ import annotations

import collections
import hashlib
import os
import tempfile
from collections.abc import Mapping, Sequence
from urllib import parse as urlparse

import jax
import numpy as np


def traverse_with_names(tree, with_inner_nodes: bool = False):
  """Yields ``(flat/name, leaf)`` pairs in sorted-key order.

  Reference: videoprism/utils.py:30-59.
  """
  if tree is None:
    return
  elif isinstance(tree, Mapping):
    keys = sorted(tree.keys())
    for key in keys:
      for path, v in traverse_with_names(tree[key], with_inner_nodes):
        yield (key + '/' + path).rstrip('/'), v
    if with_inner_nodes:
      yield '', tree
  elif isinstance(tree, Sequence):
    for idx in range(len(tree)):
      for path, v in traverse_with_names(tree[idx], with_inner_nodes):
        yield (str(idx) + '/' + path).rstrip('/'), v
    if with_inner_nodes:
      yield '', tree
  else:
    yield '', tree


def tree_flatten_with_names(tree):
  """Flattens a pytree into ``[(name, value), ...]`` in jax leaf order.

  Reference: videoprism/utils.py:62-81.
  """
  vals, tree_def = jax.tree.flatten(tree)
  tokens = range(len(vals))
  token_tree = tree_def.unflatten(tokens)
  val_names, perm = zip(*traverse_with_names(token_tree))
  inv_perm = np.argsort(perm)
  assert len(val_names) == len(vals)
  return [(val_names[i], v) for i, v in zip(inv_perm, vals)]


def recover_tree(keys, values):
  """Rebuilds a nested dict from ``a/b/c`` flat keys.

  Reference: videoprism/utils.py:84-105.
  """
  tree = {}
  sub_trees = collections.defaultdict(list)
  for k, v in zip(keys, values):
    if '/' not in k:
      tree[k] = v
    else:
      k_left, k_right = k.split('/', 1)
      sub_trees[k_left].append((k_right, v))
  for k, kv_pairs in sub_trees.items():
    k_subtree, v_subtree = zip(*kv_pairs)
    tree[k] = recover_tree(k_subtree, v_subtree)
  return tree


def _get_cache_dir() -> str:
  env_dir = os.environ.get('VIDEOPRISM_CACHE_DIR')
  if env_dir:
    return env_dir
  home_dir = os.path.expanduser('~')
  if home_dir and home_dir != '~' and os.path.isdir(home_dir):
    return os.path.join(home_dir, '.cache', 'videoprism_tpu')
  return os.path.join(tempfile.gettempdir(), 'videoprism_tpu_cache')


def _cache_remote_file(path: str) -> str:
  """Downloads a gs:// / http(s):// / s3:// file into the local cache.

  Requires ``fsspec`` (the reference used it without importing it — a
  documented bug at videoprism/utils.py:135 that we fix by importing lazily
  and erroring loudly when absent).
  """
  if not path.startswith(('gs://', 'http://', 'https://', 's3://')):
    return path

  cache_dir = _get_cache_dir()
  os.makedirs(cache_dir, exist_ok=True)
  parsed = urlparse.urlparse(path)
  ext = os.path.splitext(parsed.path)[1] or '.cache'
  digest = hashlib.sha256(path.encode('utf-8')).hexdigest()
  local_path = os.path.join(cache_dir, f'{digest}{ext}')
  if os.path.exists(local_path):
    return local_path

  try:
    import fsspec  # pytype: disable=import-error
  except ImportError as e:
    raise ImportError(
        f'fsspec is required to fetch remote checkpoint {path!r}; install it '
        'or download the file manually and pass a local path.'
    ) from e

  storage_options = {'token': 'anon'} if path.startswith('gs://') else {}
  with fsspec.open(path, 'rb', **storage_options) as src, \
      tempfile.NamedTemporaryFile(
          dir=cache_dir, suffix=ext, delete=False) as dst:
    dst.write(src.read())
    temp_path = dst.name
  os.replace(temp_path, local_path)
  return local_path


def npload(fname):
  """Loads an .npz/.npy file as an ndarray or dict of ndarrays.

  Reference: videoprism/utils.py:145-154.
  """
  full_path = _cache_remote_file(fname)
  loaded = np.load(full_path, allow_pickle=False)
  if isinstance(loaded, np.ndarray):
    return loaded
  return dict(loaded)


def _load_safetensors(path: str) -> dict[str, np.ndarray]:
  from safetensors import numpy as st_numpy  # lazy; optional dependency

  return dict(st_numpy.load_file(path))


def load_checkpoint(source) -> dict:
  """Loads a flat-key checkpoint (npz / safetensors / dict) as a nested tree.

  Reference: videoprism/utils.py:157-169, extended with safetensors support
  (the reference's MLX tier stores safetensors too,
  videoprism/convert_weights.py:292-338).
  """
  if isinstance(source, str):
    local = _cache_remote_file(source)
    if local.endswith('.safetensors'):
      source = _load_safetensors(local)
    else:
      source = npload(local)
  keys, values = zip(*list(source.items()))
  return recover_tree(keys, values)


def save_checkpoint(path: str, tree) -> None:
  """Saves a nested tree as a flat-key npz or safetensors file."""
  # ascontiguousarray is load-bearing: safetensors serializes raw bytes
  # assuming C order and silently corrupts F-contiguous views (which
  # np.asarray on jax arrays can produce).
  flat = dict(
      tree_flatten_with_names(
          jax.tree.map(lambda x: np.ascontiguousarray(np.asarray(x)), tree)))
  if path.endswith('.safetensors'):
    from safetensors import numpy as st_numpy

    st_numpy.save_file(flat, path)
  else:
    np.savez(path, **flat)


def count_params(tree) -> int:
  return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
