"""Training-step benchmark: full grad + AdamW update on the video encoder.

Measures the end-to-end training step (forward + backward + optimizer) for
the FactorizedEncoder at a given batch size, comparing attention_impl
'flash' (fused kernels + hand-written backward) vs 'xla' (composed).

Methodology mirrors bench.py: K steps chained inside one jitted fori_loop
carrying (params, opt_state, video) — real data dependences, so nothing
hoists — and a single scalar device_get forces execution (tunnel-safe).

Usage:
    python scripts/bench_train_step.py --model base --batch 2 --remat
    python scripts/bench_train_step.py --attention xla   # composed baseline
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402


def make_step_chain(cfg, optimizer):
  from videoprism_tpu.models import factorized_encoder as fe

  def loss_fn(params, video):
    emb, _ = fe.apply(params, video, cfg, train=True)
    return jnp.mean(jnp.square(emb.astype(jnp.float32)))

  @functools.partial(jax.jit, static_argnames=('iters',), donate_argnums=(0, 1))
  def steps_n(params, opt_state, video, iters: int):
    def body(i, carry):
      params, opt_state, video, acc = carry
      loss, grads = jax.value_and_grad(loss_fn)(params, video)
      updates, opt_state = optimizer.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)
      # Chain iterations through the input too (vanishing perturbation).
      video = video.at[0, 0, 0, 0, 0].add(loss * 1e-30)
      return params, opt_state, video, acc + loss

    params, opt_state, _, acc = jax.lax.fori_loop(
        0, iters, body, (params, opt_state, video,
                         jnp.zeros((), jnp.float32)))
    return params, opt_state, acc

  return steps_n


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--model', default='base', choices=['base', 'large'])
  parser.add_argument('--batch', type=int, default=2)
  parser.add_argument('--dtype', default='bfloat16',
                      choices=['bfloat16', 'float32'])
  parser.add_argument('--attention', default='flash',
                      choices=['flash', 'xla'])
  parser.add_argument('--remat', action='store_true', default=True)
  parser.add_argument('--no-remat', dest='remat', action='store_false')
  parser.add_argument('--iters', type=int, default=8)
  parser.add_argument('--runs', type=int, default=5)
  parser.add_argument('--warmup', type=int, default=2)
  args = parser.parse_args()

  from videoprism_tpu.models import factorized_encoder as fe
  from videoprism_tpu.models import init as init_lib
  from videoprism_tpu.models import registry

  dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
  config_name = ('videoprism_v1_large' if args.model == 'large'
                 else 'videoprism_v1_base')
  num_frames = 8 if args.model == 'large' else 16
  cfg = fe.FactorizedEncoderConfig(
      **registry.CONFIGS[config_name], dtype=dtype, remat=args.remat,
      attention_impl=args.attention)

  optimizer = optax.adamw(1e-4)
  params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
  opt_state = optimizer.init(params)
  video = jax.device_put(jax.random.uniform(
      jax.random.PRNGKey(1),
      (args.batch, num_frames, 288, 288, 3), jnp.float32))
  steps_n = make_step_chain(cfg, optimizer)

  times = []
  p, o = jax.device_put(params), jax.device_put(opt_state)
  for r in range(args.warmup + args.runs):
    t0 = time.perf_counter()
    p, o, acc = steps_n(p, o, video, args.iters)
    acc = float(np.asarray(acc))  # forces execution through the tunnel
    dt = (time.perf_counter() - t0) / args.iters
    if r >= args.warmup:
      times.append(dt)
  assert np.isfinite(acc), acc

  print(json.dumps({
      'metric': 'train_step_ms',
      'value': round(1000 * statistics.median(times), 2),
      'unit': 'ms/step',
      'model': config_name,
      'batch': args.batch,
      'dtype': args.dtype,
      'attention': args.attention,
      'remat': args.remat,
      'platform': jax.devices()[0].platform,
      'final_loss': acc,
  }))


if __name__ == '__main__':
  main()
