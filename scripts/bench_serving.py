"""End-to-end serving benchmark: closed-loop clients through the
micro-batching :class:`~videoprism_tpu.serving.EmbeddingService`.

Measures the PRODUCTION path — request queue, bucketed cross-request
batching, uint8 ingestion, optional int8 kernels — not the raw forward
(bench.py measures that).  N client threads each loop
``service.embed(clip)`` for ``--duration`` seconds; the report is one
JSON line: sustained clips/s, client-observed latency percentiles, and
the achieved average batch size (requests/batches — how well the
micro-batcher coalesced the concurrency).

Examples::

    python scripts/bench_serving.py --concurrency 8            # real TPU
    python scripts/bench_serving.py --tiny --cpu-devices 1 \\
        --duration 2 --concurrency 4                           # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))

import numpy as np  # noqa: E402


def main() -> int:
  parser = argparse.ArgumentParser(
      description=__doc__.split('\n')[0],
      formatter_class=argparse.RawDescriptionHelpFormatter)
  parser.add_argument('--model', default='videoprism_public_v1_base')
  parser.add_argument('--tiny', action='store_true',
                      help='tiny encoder (smoke tests)')
  parser.add_argument('--quantize', default=None, choices=[None, 'int8'])
  parser.add_argument('--buckets', default='1,4,8,16')
  parser.add_argument('--max-wait-ms', type=float, default=5.0)
  parser.add_argument('--adaptive-wait', default='on', choices=['on', 'off'],
                      help='A/B the adaptive coalescing timer '
                           '(serving._CoalesceGovernor); off = always '
                           'wait the full --max-wait-ms')
  parser.add_argument('--concurrency', type=int, default=8,
                      help='closed-loop client threads')
  parser.add_argument('--duration', type=float, default=20.0,
                      help='measured seconds (after warmup)')
  parser.add_argument('--frames', type=int, default=16)
  parser.add_argument('--input', default='uint8',
                      choices=['uint8', 'float32'],
                      help='client payload dtype (uint8 is the cheap '
                           'production ingestion path)')
  parser.add_argument('--cpu-devices', type=int, default=0)
  args = parser.parse_args()

  if args.cpu_devices:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    # CPU platform + host-feature-scoped compile cache (a foreign
    # host's XLA:CPU AOT entries can SIGILL/segfault on load).
    force_cpu(args.cpu_devices)

  import jax.numpy as jnp  # noqa: F401  (device selection must precede)

  import videoprism_tpu as vp
  from videoprism_tpu.serving import EmbeddingService

  if args.tiny:
    from smoke_configs import TINY_CLIP_SHAPE, TINY_ENC
    from videoprism_tpu.models import factorized_encoder as fe
    from videoprism_tpu.models import init as init_lib

    cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    state = model.init(jax.random.PRNGKey(0))
    clip_shape = TINY_CLIP_SHAPE
  else:
    from videoprism_tpu.models import init as init_lib
    from videoprism_tpu.models import registry

    model = vp.get_model(args.model, fprop_dtype=jnp.bfloat16,
                         attention_impl='flash')
    # Bench on random init: serving perf is weight-value independent.
    state = model.init(jax.random.PRNGKey(0))
    clip_shape = (args.frames, 288, 288, 3)

  service = EmbeddingService(
      model, state,
      batch_buckets=tuple(int(b) for b in args.buckets.split(',')),
      max_wait_ms=args.max_wait_ms, quantize=args.quantize,
      adaptive_wait=args.adaptive_wait == 'on')
  service.start()
  dtype = np.uint8 if args.input == 'uint8' else np.float32
  service.warmup(clip_shape, dtype)

  rng = np.random.default_rng(0)
  if dtype is np.uint8:
    clip = rng.integers(0, 256, clip_shape, np.uint8)
  else:
    clip = rng.random(clip_shape, np.float32)

  stop = threading.Event()
  latencies_by_client = [[] for _ in range(args.concurrency)]
  errors = [0] * args.concurrency

  def client(idx: int) -> None:
    lat = latencies_by_client[idx]
    while not stop.is_set():
      t0 = time.perf_counter()
      try:
        service.embed(clip)
      except Exception:
        errors[idx] += 1
        continue
      lat.append(time.perf_counter() - t0)

  threads = [threading.Thread(target=client, args=(i,), daemon=True)
             for i in range(args.concurrency)]
  # Warmup phase: let the loop reach steady state before measuring.
  for t in threads:
    t.start()
  time.sleep(min(3.0, args.duration))
  for lat in latencies_by_client:
    lat.clear()
  stats0 = service.stats()
  t_start = time.perf_counter()
  time.sleep(args.duration)
  stop.set()
  elapsed = time.perf_counter() - t_start
  stats1 = service.stats()
  for t in threads:
    t.join(timeout=60)
  service.stop()

  lat = sorted(x for client_lat in latencies_by_client for x in client_lat)
  pct = lambda p: round(1e3 * lat[min(int(p * len(lat)), len(lat) - 1)], 2) \
      if lat else None
  requests = stats1['requests_served'] - stats0['requests_served']
  batches = stats1['batches_run'] - stats0['batches_run']
  print(json.dumps({
      'metric': 'serving_clips_per_sec',
      'value': round(len(lat) / elapsed, 3),
      'unit': 'clips/s',
      'model': 'tiny' if args.tiny else args.model,
      'platform': jax.devices()[0].platform,
      'quantize': args.quantize,
      'input': args.input,
      'concurrency': args.concurrency,
      'duration_s': round(elapsed, 2),
      'latency_p50_ms': pct(0.50),
      'latency_p99_ms': pct(0.99),
      'avg_batch_size': round(requests / batches, 2) if batches else None,
      'errors': sum(errors),
  }))
  return 0


if __name__ == '__main__':
  sys.exit(main())
