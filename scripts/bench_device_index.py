"""Benchmark the HBM-resident DeviceVideoIndex search on real hardware.

Measures exact top-k search over a synthetic corpus held in HBM
(bf16-sharded) against the host numpy sweep on the same corpus:

  python scripts/bench_device_index.py --n 1000000 --d 768

Prints one JSON line per (backend, Q) combination plus a summary.

Methodology mirrors bench.py: the device-side number is reported two
ways — ``strict_ms`` (one search call end-to-end, includes the ~28 ms
tunnel dispatch RTT on axon) and ``chained_ms`` (K searches chained in
one jitted ``fori_loop`` with a data dependence, amortizing the RTT —
the on-chip cost).  The host baseline is the numpy chunked sweep of
``retrieval.VideoIndex`` (fp32).
"""

from __future__ import annotations

import argparse
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


def _corpus(n: int, d: int, seed: int = 0) -> np.ndarray:
  # Block-wise so the host never holds a second full-size temp.
  rng = np.random.default_rng(seed)
  out = np.empty((n, d), np.float32)
  for start in range(0, n, 1 << 16):
    stop = min(start + (1 << 16), n)
    out[start:stop] = rng.normal(size=(stop - start, d))
  return out


def _chained_program(dev, q_pad: int, k: int, iters: int):
  """K searches in one jit: each iteration's query depends on the
  previous scores, so the loop cannot be collapsed or overlapped."""
  program = dev._build(q_pad, k)

  def chained(q, values, scales):
    def body(_, carry):
      q = carry
      s, _ = program(q, values, scales)
      return q + 0.0 * s[0, 0]

    q = jax.lax.fori_loop(0, iters, body, q)
    s, i = program(q, values, scales)
    return jnp.sum(s), i

  return jax.jit(chained)


def main() -> None:
  p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
  p.add_argument('--n', type=int, default=1_000_000)
  p.add_argument('--d', type=int, default=768)
  p.add_argument('--k', type=int, default=10)
  p.add_argument('--q', default='1,64', help='query batch sizes')
  p.add_argument('--runs', type=int, default=15)
  p.add_argument('--iters', type=int, default=16,
                 help='chained searches per dispatch')
  p.add_argument('--host-runs', type=int, default=3)
  p.add_argument('--storage', choices=('bf16', 'fp32', 'int8'),
                 default='bf16', help='HBM corpus dtype (int8 halves '
                 'the sweep bytes vs bf16)')
  p.add_argument('--cpu-devices', type=int, default=0,
                 help='debug: run on N virtual CPU devices instead of TPU')
  args = p.parse_args()

  if args.cpu_devices:
    from videoprism_tpu.utils.compilation_cache import force_cpu
    force_cpu(args.cpu_devices)

  from videoprism_tpu import retrieval
  from videoprism_tpu.device_index import DeviceVideoIndex

  emb = _corpus(args.n, args.d)
  ids = [str(i) for i in range(args.n)]
  host = retrieval.VideoIndex(emb, ids)
  storage = {'bf16': jnp.bfloat16, 'fp32': jnp.float32,
             'int8': jnp.int8}[args.storage]
  dev = DeviceVideoIndex(emb, ids, storage_dtype=storage)
  rng = np.random.default_rng(1)
  results = []

  for q_n in [int(x) for x in args.q.split(',')]:
    q = rng.normal(size=(q_n, args.d)).astype(np.float32)

    # Host numpy sweep (fp32 exact).
    host_times = []
    for _ in range(args.host_runs):
      t0 = time.perf_counter()
      host.search(q, k=args.k)
      host_times.append((time.perf_counter() - t0) * 1e3)
    host_ms = statistics.median(host_times)

    # Device, strict per-call (includes dispatch RTT).
    dev.search_arrays(q, k=args.k)  # warm the program
    strict = []
    for _ in range(args.runs):
      t0 = time.perf_counter()
      dev.search_arrays(q, k=args.k)
      strict.append((time.perf_counter() - t0) * 1e3)
    strict_ms = statistics.median(strict)

    # Device, RTT-amortized: iters searches chained in one dispatch.
    from videoprism_tpu.device_index import _next_bucket
    q_pad = _next_bucket(q_n, DeviceVideoIndex.QUERY_BUCKETS)
    qj = jnp.asarray(np.pad(q, ((0, q_pad - q_n), (0, 0))))
    chained = _chained_program(dev, q_pad, args.k, args.iters)
    np.asarray(chained(qj, *dev._corpus)[0])  # compile + warm
    per_call = []
    for _ in range(args.runs):
      t0 = time.perf_counter()
      np.asarray(chained(qj, *dev._corpus)[0])  # 4-byte fetch forces it
      per_call.append((time.perf_counter() - t0) * 1e3 / (args.iters + 1))
    chained_ms = statistics.median(per_call)

    row = {
        'metric': 'index_search_ms', 'q': q_n, 'k': args.k,
        'n': args.n, 'd': args.d, 'storage': args.storage,
        'device_strict_ms': round(strict_ms, 3),
        'device_chained_ms': round(chained_ms, 3),
        'host_ms': round(host_ms, 3),
        'speedup_vs_host': round(host_ms / chained_ms, 2),
        'qps_chained': round(q_n / (chained_ms / 1e3), 1),
    }
    results.append(row)
    print(json.dumps(row))

  bytes_per_sweep = args.n * args.d * {
      'bf16': 2, 'fp32': 4, 'int8': 1}[args.storage]
  best = min(results, key=lambda r: r['device_chained_ms'])
  print(json.dumps({
      'metric': 'index_sweep_gbps',
      'value': round(bytes_per_sweep / (best['device_chained_ms'] / 1e3)
                     / 1e9, 1),
      'unit': 'GB/s effective corpus bandwidth',
      'note': 'exact search is HBM-bandwidth-bound; compare to the '
              'chip\'s ~100-150 GB/s effective elementwise rate',
  }))


if __name__ == '__main__':
  main()
