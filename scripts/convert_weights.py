#!/usr/bin/env python
"""Bidirectional weight converter: our/HF "repeated" format <-> MLX format.

TPU-stack equivalent of reference convert_weights.py, in both directions and
with no MLX dependency (the MLX files are plain npz/safetensors):

  export: scan-stacked checkpoint -> weights/{name}_mlx.{npz,safetensors}
          (+ metadata JSON), consumable by the reference's MLX loader;
  import: an existing MLX-format weights file -> stacked checkpoint that
          loads directly into this framework.

Usage:
  python scripts/convert_weights.py export CKPT.npz --name videoprism_lvt_public_v1_base
  python scripts/convert_weights.py import weights/videoprism_lvt_public_v1_base_mlx.safetensors OUT.npz
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

from videoprism_tpu.io import checkpoints as ckpt_lib
from videoprism_tpu.io import mlx_compat


def main():
  parser = argparse.ArgumentParser()
  sub = parser.add_subparsers(dest='cmd', required=True)

  exp = sub.add_parser('export', help='stacked checkpoint -> MLX format')
  exp.add_argument('checkpoint')
  exp.add_argument('--name', default='model')
  exp.add_argument('--outdir', default='weights')
  exp.add_argument('--format', default='both',
                   choices=['npz', 'safetensors', 'both'])

  imp = sub.add_parser('import', help='MLX format -> stacked checkpoint')
  imp.add_argument('mlx_weights')
  imp.add_argument('output')

  args = parser.parse_args()

  if args.cmd == 'export':
    tree = ckpt_lib.load_checkpoint(args.checkpoint)
    os.makedirs(args.outdir, exist_ok=True)
    formats = (['npz', 'safetensors'] if args.format == 'both'
               else [args.format])
    for fmt in formats:
      path = os.path.join(args.outdir, f'{args.name}_mlx.{fmt}')
      meta = os.path.join(args.outdir, f'{args.name}_mlx_metadata.json')
      mlx_compat.save_mlx_weights(
          path, tree, model_name=args.name, metadata_path=meta)
      print(f'Wrote {path}')
  else:
    tree = mlx_compat.load_mlx_weights(args.mlx_weights)
    ckpt_lib.save_checkpoint(args.output, tree)
    print(f'Wrote {args.output}: {ckpt_lib.count_params(tree):,d} params')


if __name__ == '__main__':
  main()
