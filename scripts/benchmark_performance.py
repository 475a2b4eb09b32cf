#!/usr/bin/env python
"""Side-by-side performance benchmark: videoprism_tpu vs the Flax reference.

TPU-stack equivalent of reference scripts/benchmark_performance.py (same
workload: 1 clip x T frames x 288^2 + N texts; same statistics: mean/std/
min/max over timed runs after warmup; same peak-RSS report), with
``--framework tpu`` replacing ``mlx``.  The "flax" side imports the
reference repo (CPU oracle) when available.

  python scripts/benchmark_performance.py --framework tpu
  python scripts/benchmark_performance.py --framework both --runs 5
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import resource
import statistics
import sys
import time

import numpy as np


def _peak_rss_gb() -> float:
  return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def _report(name: str, times: list[float]):
  mean = statistics.mean(times)
  std = statistics.stdev(times) if len(times) > 1 else 0.0
  print(f'{name}: {mean:.3f}s ± {std:.3f}s '
        f'(min {min(times):.3f}s, max {max(times):.3f}s, n={len(times)}); '
        f'peak RSS {_peak_rss_gb():.2f} GB')


def bench_tpu(args, clip, text_ids, text_paddings) -> None:
  import jax
  import jax.numpy as jnp

  import videoprism_tpu as vp
  from videoprism_tpu.utils import profiling

  dtype = jnp.bfloat16 if args.bf16 else None
  model = vp.get_model(args.model, fprop_dtype=dtype)
  if args.checkpoint:
    state = vp.load_pretrained_weights(None, checkpoint_path=args.checkpoint)
  else:
    print('(random init: no checkpoint given)')
    state = model.init(jax.random.PRNGKey(0))

  fwd = jax.jit(
      lambda s, v, t, p: model.apply(s, v, t, p, train=False)[:2])
  run = lambda: profiling.sync(
      fwd(state, jnp.asarray(clip), jnp.asarray(text_ids),
          jnp.asarray(text_paddings)))

  for _ in range(args.warmup):
    run()
  times = []
  for _ in range(args.runs):
    t0 = time.perf_counter()
    run()
    times.append(time.perf_counter() - t0)
  _report(f'videoprism_tpu ({jax.devices()[0].platform})', times)


def bench_flax(args, clip, text_ids, text_paddings) -> None:
  ref = os.environ.get('VIDEOPRISM_REFERENCE', '/root/reference')
  if os.path.isdir(ref) and ref not in sys.path:
    sys.path.insert(0, ref)
  try:
    from videoprism import encoders as ref_encoders
  except ImportError as e:
    print(f'flax reference unavailable: {e}')
    return

  import jax

  # The reference side is the CPU oracle.  This must take effect before
  # any backend initialization — which is why --framework both dispatches
  # the flax side to a subprocess (see main()).  config.update does not
  # raise post-init, so verify the backend outcome and refuse to mislabel
  # a TPU measurement as the CPU baseline.
  jax.config.update('jax_platforms', 'cpu')
  if jax.default_backend() != 'cpu':
    raise RuntimeError(
        'flax oracle must run on CPU but the backend is '
        f'{jax.default_backend()!r} (already initialized?); run with '
        '--framework flax in a fresh process')

  import videoprism_tpu as vp

  config = vp.get_model_config(args.model)
  model = ref_encoders.FactorizedVideoCLIP(**config)
  if args.checkpoint:
    state = vp.load_pretrained_weights(None, checkpoint_path=args.checkpoint)
    params = state.get('params', state)
  else:
    params = model.init(
        jax.random.PRNGKey(0), clip[:, :1], text_ids, text_paddings
    )['params']

  fwd = jax.jit(lambda v, t, p: model.apply(
      {'params': params}, v, t, p, train=False)[:2])
  run = lambda: np.asarray(fwd(clip, text_ids, text_paddings)[0]).sum()

  for _ in range(args.warmup):
    run()
  times = []
  for _ in range(args.runs):
    t0 = time.perf_counter()
    run()
    times.append(time.perf_counter() - t0)
  _report('flax reference (cpu)', times)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--framework', default='tpu',
                      choices=['tpu', 'flax', 'both'])
  parser.add_argument('--model', default='videoprism_lvt_public_v1_base')
  parser.add_argument('--frames', type=int, default=16)
  parser.add_argument('--num-texts', type=int, default=3)
  parser.add_argument('--runs', type=int, default=10)
  parser.add_argument('--warmup', type=int, default=2)
  parser.add_argument('--bf16', action='store_true')
  parser.add_argument('--checkpoint', default=None)
  args = parser.parse_args()

  rng = np.random.default_rng(0)
  clip = rng.random((1, args.frames, 288, 288, 3), np.float32)
  text_ids = rng.integers(
      0, 32000, (args.num_texts, 64)).astype(np.int32)
  text_paddings = np.zeros((args.num_texts, 64), np.float32)

  print(f'workload: 1x{args.frames}x288x288 video + {args.num_texts} texts '
        f'({args.model})')
  if args.framework in ('tpu', 'both'):
    bench_tpu(args, clip, text_ids, text_paddings)
  if args.framework == 'flax':
    bench_flax(args, clip, text_ids, text_paddings)
  elif args.framework == 'both':
    # The flax oracle must run on CPU, but this process's backend is
    # already the TPU after bench_tpu — rerun ourselves for the flax side,
    # forwarding the original argv so both sides see identical flags.
    import subprocess

    fwd_args = []
    skip_next = False
    for a in sys.argv[1:]:
      if skip_next:
        skip_next = False
        continue
      if a == '--framework':
        skip_next = True
        continue
      if a.startswith('--framework='):
        continue
      fwd_args.append(a)
    cmd = [sys.executable, os.path.abspath(__file__),
           '--framework', 'flax'] + fwd_args
    result = subprocess.run(cmd, check=False)
    if result.returncode:
      raise SystemExit(result.returncode)


if __name__ == '__main__':
  main()
