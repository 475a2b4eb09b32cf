#!/usr/bin/env python
"""Capture and summarize a device trace of the encoder forward.

Writes a TensorBoard/Perfetto-compatible xplane trace and prints the
per-op time breakdown (the workflow that found the LayerNorm and
residual-add bottlenecks documented in docs/DESIGN.md §3).

  python scripts/profile_forward.py [--model base|large] [--batch 8]
  # then: tensorboard --logdir /tmp/videoprism_tpu_trace
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import glob
import gzip
import json

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--model', default='base', choices=['base', 'large'])
  parser.add_argument('--batch', type=int, default=8)
  parser.add_argument('--iters', type=int, default=3)
  parser.add_argument('--attention', default='flash',
                      choices=['flash', 'xla'])
  parser.add_argument('--dtype', default='bfloat16',
                      choices=['bfloat16', 'float32'])
  parser.add_argument('--trace-dir', default='/tmp/videoprism_tpu_trace')
  parser.add_argument('--top', type=int, default=20)
  args = parser.parse_args()

  from videoprism_tpu.models import factorized_encoder as fe
  from videoprism_tpu.models import init as init_lib
  from videoprism_tpu.models import registry

  config_name = f'videoprism_v1_{args.model}'
  frames = 8 if args.model == 'large' else 16
  dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
  cfg = fe.FactorizedEncoderConfig(
      **registry.CONFIGS[config_name], dtype=dtype,
      attention_impl=args.attention)
  params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
  video = jax.random.uniform(
      jax.random.PRNGKey(1), (args.batch, frames, 288, 288, 3))

  forward = jax.jit(lambda p, v: fe.apply(p, v, cfg, train=False)[0])
  np.asarray(jnp.sum(forward(params, video)))  # compile + warm

  jax.profiler.start_trace(args.trace_dir)
  for _ in range(args.iters):
    np.asarray(jnp.sum(forward(params, video)))
  jax.profiler.stop_trace()

  traces = sorted(glob.glob(
      os.path.join(args.trace_dir, '**/*.trace.json.gz'), recursive=True))
  if not traces:
    print(f'trace written to {args.trace_dir} (no .trace.json.gz found '
          'for the inline summary — open in TensorBoard)')
    return
  with gzip.open(traces[-1]) as f:
    data = json.load(f)

  total = collections.Counter()
  count = collections.Counter()
  for e in data.get('traceEvents', []):
    name = e.get('name', '')
    if (e.get('ph') == 'X' and 'dur' in e and not name.startswith('$')
        and 'asarray' not in name):
      total[name[:56]] += e['dur']
      count[name[:56]] += 1

  print(f'\nPer-op totals over {args.iters} iterations '
        f'({args.model}, b{args.batch}, {args.dtype}, {args.attention}):')
  for name, dur in total.most_common(args.top):
    print(f'{dur / args.iters / 1e3:9.2f} ms/iter  '
          f'x{count[name] // args.iters:<4d} {name}')
  print(f'\nfull trace: {args.trace_dir}')


if __name__ == '__main__':
  main()
