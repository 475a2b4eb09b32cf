#!/usr/bin/env python
"""Build a text-searchable video-embedding index (one npz).

Sweeps videos through the lvt vision tower at one compiled geometry and
writes a ``retrieval.VideoIndex`` keyed by video path:

  python scripts/build_video_index.py --model videoprism_lvt_public_v1_base \
      --videos-glob 'corpus/*.mp4' --output corpus_index.npz

Query it offline with scripts/search_videos.py or serve it with
scripts/serve_embeddings.py --index.

Smoke (synthetic, CPU):
  python scripts/build_video_index.py --tiny --synthetic \
      --output /tmp/idx.npz --cpu-devices 2
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json

import numpy as np  # noqa: E402

from evaluate_retrieval import (  # noqa: E402
    add_clip_eval_args,
    maybe_multiview,
    resolve_clip,
)
from videoprism_tpu import retrieval  # noqa: E402
from videoprism_tpu.train import data as data_lib  # noqa: E402
from videoprism_tpu.train import preemption  # noqa: E402


class _Subset:
  """View of a source restricted to the given positions (append mode:
  embed only the not-yet-indexed examples, any source type)."""

  def __init__(self, source, positions):
    self._source = source
    self._positions = list(positions)

  def __len__(self):
    return len(self._positions)

  def get(self, index):
    return self._source.get(self._positions[index])

  @property
  def num_views(self):
    # Forward the multi-view count so the embedding sweep aggregates
    # (eval_loop._num_views reads it).
    return getattr(self._source, 'num_views', 1)


def main():
  parser = argparse.ArgumentParser()
  add_clip_eval_args(parser)
  parser.add_argument('--videos-glob', default=None)
  parser.add_argument('--manifest', default=None,
                      help='one video path per line (a trailing '
                           '<TAB>caption / ,caption column is ignored)')
  parser.add_argument('--tar-shards', default=None,
                      help='glob of uncompressed .tar shards '
                           '(<key>.mp4 + <key>.txt pairs; ids become '
                           '<shard>/<key>)')
  parser.add_argument('--fp16', action='store_true',
                      help='store embeddings as float16 (half the index '
                           'size; scoring stays fp32, ranking unchanged; '
                           'with --append the existing index dtype wins)')
  parser.add_argument('--output', required=True, help='index npz path')
  parser.add_argument('--ann', action='store_true',
                      help='write an ANNVideoIndex (native HNSW graph): '
                           'sub-ms approximate search on very large '
                           'corpora; with --append the existing index '
                           'kind wins')
  parser.add_argument('--ann-m', type=int, default=16,
                      help='HNSW links per node (graph density)')
  parser.add_argument('--ann-ef-construction', type=int, default=200,
                      help='HNSW build-time search width')
  parser.add_argument('--ann-ef-search', type=int, default=64,
                      help='default query-time search width saved with '
                           'the index')
  parser.add_argument('--checkpoint-every', type=int, default=0,
                      help='save partial embeddings every N batches to '
                           '<output>.partial.npz; reruns resume from it '
                           'and SIGTERM exits 75 after saving (compose '
                           'with scripts/run_elastic.py)')
  parser.add_argument('--resume', action='store_true',
                      help='no-op (resume is automatic from the partial '
                           'file); accepted so run_elastic.py can append '
                           'it')
  parser.add_argument('--append', action='store_true',
                      help='incremental rebuild: keep the existing index '
                           'at --output and embed only videos whose path '
                           'is not already indexed (growing-corpus mode)')
  args = parser.parse_args()

  cfg, params, _, frames, size = resolve_clip(args, need_tokenizer=False)

  if args.synthetic:
    source = data_lib.SyntheticSource(
        num_examples=max(16, args.batch_size * 2), num_frames=frames,
        size=size)
    ids = None
  else:
    if args.tar_shards:
      source = data_lib.TarShardSource.from_glob(
          args.tar_shards, num_frames=frames, target_size=size)
      paths = source.example_keys
    elif args.videos_glob:
      paths = sorted(glob.glob(args.videos_glob))
      source = data_lib.VideoTextSource(
          paths, [''] * len(paths), num_frames=frames, target_size=size)
    elif args.manifest:
      # Same parser as the eval CLIs (one source of truth for manifest
      # semantics); caption columns are parsed but unused here.
      source = data_lib.VideoTextSource.from_manifest(
          args.manifest, allow_missing_captions=True, num_frames=frames,
          target_size=size)
      paths = list(source.video_paths)
    else:
      raise SystemExit('need --videos-glob, --manifest, or --synthetic')
    if not paths:
      raise SystemExit('no videos matched')
    ids = paths
  # NxM multi-view indexing (--temporal-views/--spatial-views): the
  # index stores the protocol-aggregated embedding per video.  Without
  # this wrap the shared flags would be silently ignored here.
  source = maybe_multiview(source, args)

  existing = None
  if args.append and os.path.exists(args.output):
    if ids is None:
      raise SystemExit('--append needs stable ids (--videos-glob/'
                       '--manifest/--tar-shards)')
    existing = retrieval.load_index(args.output)
    done = set(existing.ids)
    fresh_pos = [i for i, p in enumerate(ids) if p not in done]
    print(f'append: {len(existing)} already indexed, '
          f'{len(fresh_pos)} new videos')
    if not fresh_pos:
      print(json.dumps({'num_videos': len(existing), 'dim': existing.dim,
                        'output': args.output, 'appended': 0}))
      return
    source = _Subset(source, fresh_pos)
    ids = [ids[i] for i in fresh_pos]

  partial = args.output + '.partial.npz' if args.checkpoint_every else None
  # Only trap SIGTERM when the build can actually act on it: without
  # --checkpoint-every there are no chunk boundaries to poll, and a
  # trapped-but-never-read flag would make the process unkillable short
  # of SIGKILL. Default SIGTERM (die immediately) is correct there.
  guard = (preemption.PreemptionGuard().install()
           if args.checkpoint_every else None)
  try:
    index = retrieval.build_video_index(
        params, cfg, source, ids=ids, batch_size=args.batch_size,
        checkpoint_path=partial, checkpoint_every=args.checkpoint_every,
        should_stop=(lambda: guard.triggered) if guard else None,
        storage_dtype=np.float16 if args.fp16 else np.float32)
  except retrieval.IndexBuildInterrupted as e:
    print(f'preempted: {e}', flush=True)
    raise SystemExit(preemption.EXIT_PREEMPTED) from None
  appended = None
  if existing is not None:
    appended = len(index)
    existing.add(index._emb, index.ids)
    index = existing
  elif args.ann:
    # The embedding sweep builds the exact index; graph construction is
    # a pure post-pass over its rows (storage dtype preserved).
    index = retrieval.ANNVideoIndex(
        index._emb, index.ids,
        storage_dtype=np.float16 if args.fp16 else np.float32,
        m=args.ann_m, ef_construction=args.ann_ef_construction,
        ef_search=args.ann_ef_search)
  index.save(args.output)
  if partial and os.path.exists(partial):
    os.remove(partial)
  out = {'num_videos': len(index), 'dim': index.dim,
         'output': args.output,
         'kind': ('hnsw' if getattr(index, 'native', False) else 'exact')}
  if appended is not None:
    out['appended'] = appended
  print(json.dumps(out))


if __name__ == '__main__':
  main()
