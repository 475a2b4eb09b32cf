#!/usr/bin/env python
"""Slice the text tower out of an lvt checkpoint into a smaller file.

TPU-stack equivalent of reference scripts/extract_text_encoder_weights.py:
useful for text-only retrieval services that don't want to ship the vision
tower.

Usage:
  python scripts/extract_text_encoder.py LVT_CKPT.npz OUT.npz
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from videoprism_tpu.io import checkpoints as ckpt_lib


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('checkpoint')
  parser.add_argument('output')
  parser.add_argument('--subtree', default='text_encoder',
                      help='top-level subtree to extract')
  args = parser.parse_args()

  tree = ckpt_lib.load_checkpoint(args.checkpoint)
  if 'params' in tree and args.subtree not in tree:
    tree = tree['params']
  if args.subtree not in tree:
    raise KeyError(
        f'`{args.subtree}` not in checkpoint; top-level keys: '
        f'{sorted(tree.keys())}')

  subtree = {args.subtree: tree[args.subtree]}
  ckpt_lib.save_checkpoint(args.output, subtree)
  n = ckpt_lib.count_params(subtree)
  print(f'Wrote {args.output}: {n:,d} params '
        f'({n * 4 / 2**20:.1f} MB fp32)')


if __name__ == '__main__':
  main()
