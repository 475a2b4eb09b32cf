#!/usr/bin/env python
"""Host-side retrieval micro-benchmark: exact sweep vs native HNSW.

Synthetic clustered corpus (the realistic case for embedding retrieval);
reports build time, per-query latency for both paths, and recall@k of
the ANN path against the exact oracle:

  python scripts/bench_ann.py --n 100000 --dim 768 --k 10

Prints one JSON line.  CPU-only (the index is a host-side runtime
component — no TPU involved).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

from videoprism_tpu import retrieval


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--n', type=int, default=100_000)
  parser.add_argument('--dim', type=int, default=768)
  parser.add_argument('--queries', type=int, default=200)
  parser.add_argument('--k', type=int, default=10)
  parser.add_argument('--m', type=int, default=16)
  parser.add_argument('--ef-construction', type=int, default=200)
  parser.add_argument('--ef-search', type=int, default=64)
  parser.add_argument('--clusters', type=int, default=1000)
  args = parser.parse_args()

  rng = np.random.default_rng(0)
  centers = rng.standard_normal((args.clusters, args.dim), dtype=np.float32)
  emb = (centers[rng.integers(0, args.clusters, args.n)]
         + 0.3 * rng.standard_normal((args.n, args.dim), dtype=np.float32))
  q = (centers[rng.integers(0, args.clusters, args.queries)]
       + 0.3 * rng.standard_normal((args.queries, args.dim),
                                   dtype=np.float32))
  ids = [str(i) for i in range(args.n)]
  # ~1% selective ('cat') and ~50% broad ('parity') filter columns.
  meta = [{'cat': f'c{i % 100}', 'parity': i % 2} for i in range(args.n)]

  exact = retrieval.VideoIndex(emb, ids, metadata=meta)
  t0 = time.perf_counter()
  ann = retrieval.ANNVideoIndex(
      emb, ids, m=args.m, ef_construction=args.ef_construction,
      ef_search=args.ef_search, metadata=meta)
  build_s = time.perf_counter() - t0
  if not ann.native:
    raise SystemExit('native ANN library unavailable: cannot benchmark')

  def time_queries(index, **kw):
    lat = []
    results = []
    for i in range(args.queries):
      t0 = time.perf_counter()
      results.append(index.search(q[i], k=args.k, **kw)[0])
      lat.append(time.perf_counter() - t0)
    return results, float(np.median(lat))

  exact_res, exact_p50 = time_queries(exact)
  ann_res, ann_p50 = time_queries(ann)
  recall = float(np.mean([
      len({i for i, _ in a} & {i for i, _ in e}) / args.k
      for a, e in zip(ann_res, exact_res)]))

  # Filtered legs (VERDICT r4 #3): metadata filters must not collapse to
  # the O(N) host sweep.  Selective (~1% of rows) exercises the exact-
  # over-matches switch; broad (~50%) the masked HNSW walk.  The host
  # baseline is the exact index's own filtered sweep.
  def filtered_leg(where, label):
    e_res, e_p50 = time_queries(exact, where=where)
    a_res, a_p50 = time_queries(ann, where=where)
    rec = float(np.mean([
        (len({i for i, _ in a} & {i for i, _ in e}) / len(e)) if e else 1.0
        for a, e in zip(a_res, e_res)]))
    return {
        f'{label}_exact_p50_ms': round(e_p50 * 1e3, 3),
        f'{label}_ann_p50_ms': round(a_p50 * 1e3, 3),
        f'{label}_speedup': round(e_p50 / a_p50, 1),
        f'{label}_recall': round(rec, 4),
    }

  # warm the columnar filter cache out-of-band (one-time O(N) build).
  ann.search(q[0], k=1, where={'cat': 'c0'})
  ann.search(q[0], k=1, where={'parity': 1})
  filtered = filtered_leg({'cat': 'c1'}, 'filt1pct')
  filtered.update(filtered_leg({'parity': 1}, 'filt50pct'))

  print(json.dumps({
      'n': args.n, 'dim': args.dim, 'k': args.k, 'm': args.m,
      'ef_search': args.ef_search,
      'build_s': round(build_s, 2),
      'exact_p50_ms': round(exact_p50 * 1e3, 3),
      'ann_p50_ms': round(ann_p50 * 1e3, 3),
      'speedup': round(exact_p50 / ann_p50, 1),
      'recall': round(recall, 4),
      **filtered,
  }))


if __name__ == '__main__':
  main()
