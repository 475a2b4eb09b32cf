#!/usr/bin/env python
"""Pod-ready multi-chip benchmark: DP scaling efficiency + TP latency.

Prints ONE JSON line, always, under bench.py's artifact contract (a
real tiny-execution probe gates startup, a ``--budget-s`` watchdog
thread emits partials and exits 0 on overrun, SIGTERM/SIGALRM emit
what completed, legs run headline-first):

  {"metric": "dp_scaling_efficiency", "value": E, "unit": "fraction",
   "dp": {...}, "tp": {...}, ...}

Legs (``--legs dp,tp``):

* ``dp`` — replicated-params data-parallel forward at a FIXED per-chip
  batch: clips/s on 1 device vs all N (batch scales with N).  The
  value is thr_N / (N * thr_1) — 1.0 means the batch axis scales
  perfectly over ICI; the collectives here are none (inference is
  embarrassingly parallel), so this leg measures runtime/dispatch
  overheads.
* ``tp`` — tensor-parallel (GSPMD param sharding over the model axis)
  single-clip latency on N devices vs 1: the latency lever for towers
  too large (or too slow) per chip.  Speedup < 1 on CPU is expected —
  virtual devices share cores; the leg exists to validate the program
  and give pods a turnkey number.

On a real pod slice this script runs as-is (axes ride ICI; the mesh
comes from ``jax.devices()``).  This environment has ONE tunneled chip,
so multi-device numbers here come from ``--cpu-devices 8`` — harness
validation, not performance truth.  The schema test runs exactly that.

Timing mirrors bench.py: K forwards chained in one jitted fori_loop
with a data dependence, one scalar fetch (tunnel-safe).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = time.monotonic()


def main():
  parser = argparse.ArgumentParser(
      description=__doc__.split('\n')[0],
      formatter_class=argparse.RawDescriptionHelpFormatter)
  parser.add_argument('--model', default='tiny',
                      choices=('tiny', 'base', 'large', 'giant'))
  parser.add_argument('--legs', default='dp,tp')
  parser.add_argument('--per-chip-batch', type=int, default=0,
                      help='DP leg batch per device (0: model default)')
  parser.add_argument('--frames', type=int, default=0)
  parser.add_argument('--size', type=int, default=0)
  parser.add_argument('--dtype', default='bfloat16',
                      choices=('bfloat16', 'float32'))
  parser.add_argument('--runs', type=int, default=3)
  parser.add_argument('--warmup', type=int, default=1)
  parser.add_argument('--iters', type=int, default=4)
  parser.add_argument('--budget-s', type=float,
                      default=float(os.environ.get('BENCH_BUDGET_S', 0))
                      or None)
  parser.add_argument('--cpu-devices', type=int, default=0,
                      help='force a virtual CPU mesh of this size '
                           '(harness/schema validation offline)')
  args = parser.parse_args()

  if args.cpu_devices:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    force_cpu(args.cpu_devices)

  # bench.py carries the artifact-contract machinery (emitter, watchdog,
  # signal emitters, device probe); reuse it rather than fork it.
  import bench as bench_lib

  emitter = bench_lib._Emitter()
  emitter.payload = {
      'metric': 'dp_scaling_efficiency',
      'value': None,
      'unit': 'fraction',
      'model': args.model,
      'dtype': args.dtype,
  }
  bench_lib._install_signal_emitters(emitter)
  if args.budget_s:
    bench_lib._start_watchdog(emitter, args.budget_s)

  if not args.cpu_devices and not bench_lib._wait_for_devices(600):
    emitter.emit(error='no device executed the probe within 600s')
    return

  import jax
  import jax.numpy as jnp
  import numpy as np

  from videoprism_tpu.models import factorized_encoder as fe
  from videoprism_tpu.models import init as init_lib
  from videoprism_tpu.models import registry
  from videoprism_tpu.parallel import mesh as mesh_lib
  from videoprism_tpu.parallel import sharding as shard_lib

  devices = jax.devices()
  n = len(devices)
  emitter.payload['devices'] = n
  dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32

  if args.model == 'tiny':
    cfg_kw = dict(patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=32,
                  num_spatial_layers=2, num_temporal_layers=1,
                  num_heads=4, mlp_dim=96, atten_logit_cap=50.0,
                  scan=True)
    frames, size, pcb = 2, 12, 2
  else:
    cfg_kw = dict(registry.CONFIGS[f'videoprism_v1_{args.model}'])
    frames, size, pcb = (16, 288, 8) if args.model == 'base' else (8, 288, 4)
  frames = args.frames or frames
  size = args.size or size
  pcb = args.per_chip_batch or pcb
  cfg = fe.FactorizedEncoderConfig(
      **cfg_kw, dtype=dtype,
      attention_impl='flash' if not args.cpu_devices else 'xla')
  params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)

  def chained(pshard, dshard):
    @functools.partial(jax.jit, static_argnames=('iters',),
                       in_shardings=(pshard, dshard))
    def forward_n(p, video, iters: int):
      def body(i, carry):
        acc, vid = carry
        emb, _ = fe.apply(p, vid, cfg, train=False)
        s = jnp.sum(emb[0, 0]).astype(jnp.float32)
        vid = vid.at[0, 0, 0, 0, 0].add(s * 1e-30)
        return acc + s, vid

      acc, _ = jax.lax.fori_loop(
          0, iters, body, (jnp.zeros((), jnp.float32), video))
      return acc

    return forward_n

  def timed(forward_n, p, video):
    for _ in range(max(1, args.warmup)):
      np.asarray(forward_n(p, video, args.iters))
    times = []
    for _ in range(args.runs):
      t0 = time.perf_counter()
      np.asarray(forward_n(p, video, args.iters))
      times.append((time.perf_counter() - t0) / args.iters)
    return float(np.median(times))

  legs = [x for x in args.legs.split(',') if x]

  if 'dp' in legs:
    # Single device first (the baseline), then the full data axis.
    detail = {}
    for ndev in (1, n):
      mesh = mesh_lib.make_mesh(model_parallelism=1,
                                devices=devices[:ndev])
      pshard = jax.tree.map(lambda _: mesh_lib.replicated(mesh), params)
      dshard = mesh_lib.data_sharding(mesh, ndim=5)
      b = pcb * ndev
      video = jax.device_put(
          jnp.zeros((b, frames, size, size, 3), jnp.float32), dshard)
      p = jax.device_put(params, pshard)
      sec = timed(chained(pshard, dshard), p, video)
      detail[f'n{ndev}_clips_per_s'] = round(b / sec, 2)
      emitter.payload['dp'] = detail
    thr1 = detail['n1_clips_per_s']
    thrn = detail[f'n{n}_clips_per_s']
    eff = thrn / (n * thr1) if thr1 else 0.0
    detail['efficiency'] = round(eff, 4)
    emitter.payload['value'] = round(eff, 4)

  if 'tp' in legs and n >= 2:
    tp_n = n if cfg.num_heads % n == 0 and cfg.mlp_dim % n == 0 else 2
    detail = {}
    for mp in (1, tp_n):
      mesh = mesh_lib.make_mesh(model_parallelism=mp,
                                devices=devices[:mp])
      pshard = shard_lib.param_shardings(params, mesh)
      dshard = mesh_lib.data_sharding(mesh, ndim=5)
      video = jax.device_put(
          jnp.zeros((1, frames, size, size, 3), jnp.float32), dshard)
      p = jax.device_put(params, pshard)
      sec = timed(chained(pshard, dshard), p, video)
      detail[f'mp{mp}_ms'] = round(sec * 1e3, 3)
      emitter.payload['tp'] = detail
    detail['speedup'] = round(detail['mp1_ms'] / detail[f'mp{tp_n}_ms'], 3)
    if emitter.payload['value'] is None:  # tp-only run: tp is the headline
      emitter.payload['metric'] = 'tp_latency_speedup'
      emitter.payload['unit'] = 'x'
      emitter.payload['value'] = detail['speedup']

  emitter.payload['elapsed_s'] = round(time.monotonic() - _T0, 1)
  emitter.emit()


if __name__ == '__main__':
  main()
