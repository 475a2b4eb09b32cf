#!/usr/bin/env python
"""Text-to-video search against a saved index (one JSON line per query).

  python scripts/search_videos.py --model videoprism_lvt_public_v1_base \
      --index corpus_index.npz --tokenizer-model c4_en.model \
      --k 5 "a person playing drums" "a dog running"

Smoke (random tiny model + synthetic index, CPU):
  python scripts/build_video_index.py --tiny --synthetic \
      --output /tmp/idx.npz --cpu-devices 2
  python scripts/search_videos.py --tiny --index /tmp/idx.npz \
      --cpu-devices 2 "drums"
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

from evaluate_retrieval import (  # noqa: E402
    add_clip_eval_args,
    maybe_multiview,
    resolve_clip,
)
from videoprism_tpu import retrieval  # noqa: E402


def main():
  parser = argparse.ArgumentParser()
  add_clip_eval_args(parser)
  parser.add_argument('--index', required=True, help='index npz path')
  parser.add_argument('--k', type=int, default=5)
  parser.add_argument('--ef-search', type=int, default=None,
                      help='HNSW search width for ANN indexes (>= k; '
                           'higher = better recall, slower); ignored for '
                           'exact indexes')
  parser.add_argument('--query-videos', action='store_true',
                      help='queries are video FILE PATHS (video-to-video '
                           'similarity) instead of texts')
  parser.add_argument('queries', nargs='+',
                      help='query texts (or video paths with '
                           '--query-videos)')
  args = parser.parse_args()

  cfg, params, tokenizer, frames, size = resolve_clip(
      args, need_tokenizer=not args.query_videos)
  index = retrieval.load_index(args.index)
  if args.ef_search is not None and isinstance(
      index, retrieval.ANNVideoIndex):
    index.ef_search = args.ef_search
  if args.query_videos:
    from videoprism_tpu.train import data as data_lib

    source = data_lib.VideoTextSource(
        list(args.queries), [''] * len(args.queries), num_frames=frames,
        target_size=size)
    # --temporal-views/--spatial-views: protocol-aggregated query
    # embeddings (otherwise the shared flags would be silently ignored).
    source = maybe_multiview(source, args)
    emb = retrieval.build_video_index(
        params, cfg, source, batch_size=args.batch_size)._emb
  else:
    encode = retrieval.make_text_query_encoder(
        params, cfg, tokenizer,
        batch_size=args.text_batch_size or max(args.batch_size, 8))
    emb = encode(args.queries)

  results = index.search(emb, k=args.k)
  for query, row in zip(args.queries, results):
    print(json.dumps({
        'query': query,
        'results': [{'id': i, 'score': round(s, 6)} for i, s in row],
    }))


if __name__ == '__main__':
  main()
