#!/usr/bin/env python
"""Export servable weights (npz/safetensors) from an orbax training run.

Training checkpoints hold the full train state (step, params, optimizer
moments; EMA accumulator under ``<dir>/ema``) in orbax's directory
format; the serving/release tooling (``serve_embeddings --checkpoint``,
``quantize_checkpoint.py``, ``average_checkpoints.py``,
``export_model.py``) consumes flat-key npz/safetensors param trees in
the checkpoint schema.  This bridges them post-hoc, without re-running
the trainer:

  python scripts/export_params.py --checkpoint-dir runs/ckpts -o model.npz
  python scripts/export_params.py --checkpoint-dir runs/ckpts --ema \
      -o model_ema.safetensors

Restore is template-free: the raw orbax tree is the state's flattened
children (``[step, params, ...]`` for the train states, ``[count, ema]``
for the EMA checkpoints), and the params tree is its first dict child —
which holds for every state this repo writes.  ``--ema`` applies the
bias correction ``ema / (1 - decay**count)`` (decay from ``--ema-decay``
or the run's ``resolved_config.json``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def _raw_restore(directory: str, step: int | None):
  """Template-free, DEVICE-FREE restore: leaves come back as numpy.

  The manager-level restore would re-place every leaf on the device it
  was saved from (a CPU-trained checkpoint then fails to export on a
  TPU host and vice versa); the PyTree handler with
  ``restore_type=np.ndarray`` reads straight to host memory, which is
  all an npz export needs."""
  import jax
  import orbax.checkpoint as ocp
  from etils import epath

  directory = os.path.abspath(directory)
  if not os.path.isdir(directory):
    raise SystemExit(f'no such checkpoint directory: {directory}')
  if step is None:
    steps = [int(p) for p in os.listdir(directory) if p.isdigit()]
    if not steps:
      raise SystemExit(f'no checkpoint steps found under {directory}')
    step = max(steps)
  item = epath.Path(directory) / str(step) / 'default'
  if not item.exists():
    raise SystemExit(f'no checkpoint at step {step} under {directory}')
  handler = ocp.PyTreeCheckpointHandler()
  meta = handler.metadata(item)
  restore_args = jax.tree.map(
      lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
  return step, handler.restore(
      item, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def _first_dict(tree):
  """The params tree: the state's first dict child (see module doc)."""
  if isinstance(tree, dict):
    return tree
  if isinstance(tree, (list, tuple)):
    for item in tree:
      if isinstance(item, dict):
        return item
  raise SystemExit(
      f'could not locate a params dict in the restored state '
      f'(top-level structure: {type(tree).__name__})')


def _scalar_children(tree):
  if isinstance(tree, (list, tuple)):
    return [x for x in tree if not isinstance(x, (dict, list, tuple))]
  return []


def main():
  parser = argparse.ArgumentParser(
      description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
  parser.add_argument('--checkpoint-dir', required=True,
                      help="a trainer's --checkpoint-dir (orbax)")
  parser.add_argument('--step', type=int, default=None,
                      help='checkpoint step (default: latest)')
  parser.add_argument('--ema', action='store_true',
                      help='export the bias-corrected EMA weights from '
                           '<checkpoint-dir>/ema (the serving-grade tree '
                           'when --ema-decay was used in training)')
  parser.add_argument('--ema-decay', type=float, default=0.0,
                      help='decay used in training; default: read '
                           "the run's resolved_config.json")
  parser.add_argument('-o', '--output', required=True,
                      help='output path (.npz or .safetensors)')
  args = parser.parse_args()

  import jax

  from videoprism_tpu.io.checkpoints import save_checkpoint

  if args.ema:
    ema_dir = os.path.join(args.checkpoint_dir, 'ema')
    decay = args.ema_decay
    if not decay:
      cfg_path = os.path.join(args.checkpoint_dir, 'resolved_config.json')
      if os.path.exists(cfg_path):
        decay = float(json.load(open(cfg_path)).get('ema_decay', 0.0))
      if not decay:
        raise SystemExit('--ema needs --ema-decay (no resolved_config.json '
                         'with a nonzero ema_decay found)')
    step, raw = _raw_restore(ema_dir, args.step)
    params = _first_dict(raw)
    scalars = _scalar_children(raw)
    if not scalars:
      raise SystemExit('EMA state has no update count; is this an EMA '
                       'checkpoint directory?')
    count = float(np.asarray(scalars[0]))
    correction = max(1.0 - decay ** count, np.finfo(np.float32).tiny)
    params = jax.tree.map(
        lambda e: (np.asarray(e, np.float64) / correction).astype(
            np.asarray(e).dtype), params)
    print(f'EMA step {step}: {count:.0f} updates, decay {decay}, '
          f'bias correction 1/{correction:.6f}')
  else:
    step, raw = _raw_restore(args.checkpoint_dir, args.step)
    params = _first_dict(raw)
    print(f'restored step {step}')

  leaves = jax.tree.leaves(params)
  total = sum(int(np.prod(np.asarray(x).shape)) for x in leaves)
  save_checkpoint(args.output, params)
  print(f'wrote {args.output}: {len(leaves)} arrays, '
        f'{total / 1e6:.2f}M parameters')


if __name__ == '__main__':
  main()
