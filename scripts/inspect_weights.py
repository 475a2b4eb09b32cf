#!/usr/bin/env python
"""Dump a checkpoint's parameter tree (text + JSON) for mapping work.

TPU-stack equivalent of reference scripts/inspect_weights.py: prints every
flat key with shape/dtype/param-count, writes an optional JSON summary.

Usage:
  python scripts/inspect_weights.py CKPT.npz [--json OUT.json] [--filter text_encoder]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np

from videoprism_tpu.io import checkpoints as ckpt_lib


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('checkpoint', help='.npz or .safetensors checkpoint')
  parser.add_argument('--json', help='write JSON summary here')
  parser.add_argument('--filter', default='',
                      help='only show keys containing this substring')
  args = parser.parse_args()

  tree = ckpt_lib.load_checkpoint(args.checkpoint)
  flat = ckpt_lib.tree_flatten_with_names(tree)

  total = 0
  rows = []
  for key, value in flat:
    if args.filter and args.filter not in key:
      continue
    value = np.asarray(value)
    count = int(np.prod(value.shape))
    total += count
    rows.append({'key': key, 'shape': list(value.shape),
                 'dtype': str(value.dtype), 'params': count})
    print(f'{key:100s} {str(value.shape):24s} {value.dtype} '
          f'{count:>12,d}')

  print(f'\n{len(rows)} tensors, {total:,d} parameters '
        f'({total * 4 / 2**20:.1f} MB fp32)')

  if args.json:
    with open(args.json, 'w') as f:
      json.dump({'tensors': rows, 'total_params': total}, f, indent=2)
    print(f'JSON summary written to {args.json}')


if __name__ == '__main__':
  main()
