#!/usr/bin/env python
"""Text-to-time moment localization: WHEN does a query happen in a video.

Per-frame pooled CLIP embeddings (the lvt ``frame_embeddings``
intermediate) are swept by sliding windows against each text query
(retrieval.localize_moments); the top non-overlapping segments come
back as frame ranges plus position fractions of the source duration
(multiply by the video length for seconds).

  python scripts/localize_moments.py --video clip.mp4 \
      --queries "a person starts drumming" "the crowd cheers" \
      --model videoprism_lvt_public_v1_base --tokenizer-model c4_en.model \
      --frames 64 --window-sizes 4,8,16 --k 3

``--frames`` sets the temporal resolution: the clip is decoded at N
uniformly sampled frames (positional-embedding interpolation covers any
N), so localization granularity is duration/N.

Smoke (tiny random model, synthetic video, CPU):
  python scripts/localize_moments.py --tiny --synthetic --cpu-devices 2
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np

from evaluate_retrieval import (  # noqa: E402
    add_clip_eval_args,
    resolve_clip,
)
from videoprism_tpu import retrieval  # noqa: E402


def main():
  parser = argparse.ArgumentParser()
  add_clip_eval_args(parser)
  parser.add_argument('--video', default=None, help='video file to search')
  parser.add_argument('--queries', nargs='+', default=None,
                      help='text queries to localize')
  parser.add_argument('--frames', type=int, default=0,
                      help='temporal resolution: frames to decode '
                           '(default: the model-native count)')
  parser.add_argument('--window-sizes', default='1,2,4,8',
                      help='sliding window lengths in frames')
  parser.add_argument('--k', type=int, default=3,
                      help='segments per query after temporal NMS')
  parser.add_argument('--iou-threshold', type=float, default=0.5)
  args = parser.parse_args()

  cfg, params, tokenizer, native_frames, size = resolve_clip(args)
  frames = args.frames or native_frames
  queries = args.queries or (
      ['a person drumming', 'the ocean'] if args.synthetic else None)
  if not queries:
    raise SystemExit('need --queries (or --synthetic)')
  windows = tuple(int(w) for w in args.window_sizes.split(','))

  if args.synthetic:
    video = np.random.RandomState(args.seed).rand(
        frames, size, size, 3).astype(np.float32)
  elif args.video:
    from videoprism_tpu.io import video as video_io

    video = video_io.load_video(args.video, num_frames=frames,
                                target_size=size)
  else:
    raise SystemExit('need --video (or --synthetic)')

  frame_fn = retrieval.make_frame_embeddings_fn(params, cfg)
  encode = retrieval.make_text_query_encoder(params, cfg, tokenizer)
  frame_emb = frame_fn(video)               # [T, D]
  text_emb = encode(list(queries))          # [Q, D]
  moments = retrieval.localize_moments(
      frame_emb, text_emb, window_sizes=windows, top_k=args.k,
      iou_threshold=args.iou_threshold)

  for query, segments in zip(queries, moments):
    # start/end are decoded-frame units; the frames were sampled
    # uniformly over the file, so position fractions map linearly onto
    # the source duration (x duration = seconds).
    for seg in segments:
      seg['position'] = [round(seg['start'] / frames, 4),
                         round(seg['end'] / frames, 4)]
    print(json.dumps({'query': query, 'frames': frames,
                      'segments': segments}))


if __name__ == '__main__':
  main()
