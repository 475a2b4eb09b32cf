#!/usr/bin/env python
"""Checkpoint averaging ("model soup" / Polyak ensemble into one tree).

Averaging the weights of several fine-tuned checkpoints — different runs,
hyperparameters, or late-training snapshots — often beats every
individual member at zero serving cost (one forward pass, one tree).
This tool averages flat-key serving checkpoints (npz / safetensors, the
zero-rename HF schema) leaf-wise:

    python scripts/average_checkpoints.py a.npz b.npz c.npz -o soup.npz
    python scripts/average_checkpoints.py a.npz b.npz --weights 0.7,0.3 \
        -o soup.safetensors

Float leaves accumulate in float64 and cast back to the first
checkpoint's dtype; integer/bool leaves (ids, counters) must be
identical across members and pass through. Trees must agree exactly on
keys and shapes — a mismatch is an error, not a silent skip.

The EMA tier (`--ema-decay`, train/ema.py) covers the within-run
averaging case; this covers the across-run case.  Works on anything
`save_checkpoint` wrote, including `scripts/quantize_checkpoint.py`
inputs (average BEFORE quantizing: int8 codes don't average).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from videoprism_tpu.io import checkpoints as ckpt_lib  # noqa: E402


def _is_float_dtype(dtype) -> bool:
  """np.issubdtype misses the ml_dtypes extension floats (bfloat16 — the
  common serving dtype — reports kind 'V'), which would shunt bf16
  checkpoints into the must-be-bit-identical branch."""
  if np.issubdtype(dtype, np.floating):
    return True
  try:
    import ml_dtypes

    ml_dtypes.finfo(dtype)  # raises for non-float extension dtypes
    return True
  except (ImportError, ValueError):
    return False


def average_trees(trees, weights=None):
  """Leaf-wise weighted average of nested dict trees (host-side numpy)."""
  if not trees:
    raise ValueError('no checkpoints given')
  if weights is None:
    weights = [1.0 / len(trees)] * len(trees)
  if len(weights) != len(trees):
    raise ValueError(f'{len(weights)} weights for {len(trees)} checkpoints')
  total = float(sum(weights))
  if not total > 0:
    raise ValueError(f'weights must sum to a positive value, got {total}')
  weights = [w / total for w in weights]

  flats = []
  for i, t in enumerate(trees):
    flat = dict(ckpt_lib.tree_flatten_with_names(t))
    flats.append(flat)
    if flat.keys() != flats[0].keys():
      missing = set(flats[0]) ^ set(flat)
      raise ValueError(
          f'checkpoint {i} key set differs from checkpoint 0 '
          f'(symmetric difference: {sorted(missing)[:5]}...)')

  out = {}
  for key, first in flats[0].items():
    leaves = [np.asarray(f[key]) for f in flats]
    for i, leaf in enumerate(leaves):
      if leaf.shape != first.shape:
        raise ValueError(f'{key}: shape {leaf.shape} in checkpoint {i} '
                         f'!= {first.shape} in checkpoint 0')
    if _is_float_dtype(first.dtype):
      acc = sum(w * l.astype(np.float64) for w, l in zip(weights, leaves))
      out[key] = acc.astype(first.dtype)
    else:
      for i, leaf in enumerate(leaves):
        if not np.array_equal(leaf, first):
          raise ValueError(
              f'{key}: non-float leaf differs between checkpoints 0 and '
              f'{i} — these checkpoints are not soup-compatible')
      out[key] = first
  return ckpt_lib.recover_tree(list(out.keys()), list(out.values()))


def main(argv=None) -> int:
  parser = argparse.ArgumentParser(
      description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
  parser.add_argument('checkpoints', nargs='+',
                      help='two or more npz/safetensors checkpoints')
  parser.add_argument('-o', '--output', required=True,
                      help='output path (.npz or .safetensors)')
  parser.add_argument('--weights', default=None,
                      help='comma-separated member weights (default uniform);'
                           ' normalized to sum to 1')
  args = parser.parse_args(argv)
  if len(args.checkpoints) < 2:
    parser.error('need at least two checkpoints to average')
  weights = ([float(w) for w in args.weights.split(',')]
             if args.weights else None)
  trees = [ckpt_lib.load_checkpoint(p) for p in args.checkpoints]
  soup = average_trees(trees, weights)
  ckpt_lib.save_checkpoint(args.output, soup)
  n = ckpt_lib.count_params(soup)
  print(f'averaged {len(trees)} checkpoints ({n:,} params) -> {args.output}')
  return 0


if __name__ == '__main__':
  sys.exit(main())
