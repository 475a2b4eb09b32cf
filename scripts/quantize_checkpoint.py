"""Offline int8 quantization of a checkpoint into a serving artifact.

Usage::

    python scripts/quantize_checkpoint.py in.npz out.npz
    python scripts/quantize_checkpoint.py in.safetensors out.npz

Converts every transformer matmul weight to symmetric per-output-channel
int8 (``videoprism_tpu.quantization.quantize_for_serving``); the result
loads through the normal ``load_pretrained_weights(checkpoint_path=...)``
path and the int8 dtype routes it onto the W8A8 serving kernels
automatically (ops/pallas/int8_blocks.py).  Roughly halves the artifact
(the big leaves go 2-4 bytes -> 1 byte + a scale vector).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('input', help='source checkpoint (.npz/.safetensors)')
  parser.add_argument('output', help='destination .npz')
  args = parser.parse_args()

  import jax

  # Offline artifact conversion is pure host work: force CPU before any
  # device query so the script never claims (or blocks on) an
  # accelerator.  On the axon tunnel a TPU claim can block indefinitely
  # when the chip is held elsewhere — and quantizing on TPU would buy
  # nothing here anyway.
  jax.config.update('jax_platforms', 'cpu')
  from videoprism_tpu.utils.compilation_cache import cache_dir

  jax.config.update('jax_compilation_cache_dir', cache_dir(cpu=True))

  import jax.numpy as jnp

  from videoprism_tpu import quantization
  from videoprism_tpu.io import checkpoints

  tree = checkpoints.load_checkpoint(args.input)
  before = sum(np.asarray(v).nbytes
               for _, v in checkpoints.tree_flatten_with_names(tree))
  qtree = quantization.quantize_for_serving(
      jax.tree_util.tree_map(jnp.asarray, tree))
  after = sum(np.asarray(v).nbytes
              for _, v in checkpoints.tree_flatten_with_names(qtree))
  checkpoints.save_checkpoint(args.output, qtree)
  print(f'{args.input} ({before / 2**20:.1f} MB) -> '
        f'{args.output} ({after / 2**20:.1f} MB, '
        f'{100.0 * after / before:.0f}%)')
  return 0


if __name__ == '__main__':
  sys.exit(main())
