#!/usr/bin/env python
"""Zero-shot video classification: labeled manifest + class names -> accuracy.

The runner for the reference's published zero-shot K400 table (reference
README.md:210-214): class-name prompts are ensembled through the lvt text
tower and videos scored by cosine similarity.

  python scripts/zero_shot_classify.py --model videoprism_lvt_public_v1_base \
      --manifest k400_val.csv --class-names k400_classes.txt \
      --tokenizer-model c4_en.model

Smoke (synthetic, CPU):
  python scripts/zero_shot_classify.py --tiny --synthetic --cpu-devices 8
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
from videoprism_tpu.train import (  # noqa: E402
    data as data_lib,
    evaluate_zero_shot,
)

_SYNTHETIC_CLASSES = ('running', 'swimming', 'playing drums', 'cooking',
                      'dancing', 'climbing', 'reading', 'singing',
                      'driving', 'juggling')


def main():
  parser = argparse.ArgumentParser()
  add_clip_eval_args(parser)
  parser.add_argument('--manifest', default=None,
                      help='CSV manifest: video_path,int_label per line '
                           '(labels index --class-names)')
  parser.add_argument('--class-names', default=None,
                      help='text file, one class name per line')
  parser.add_argument('--tar-shards', default=None,
                      help='glob of uncompressed .tar shards '
                           '(<key>.mp4 + <key>.cls pairs)')
  args = parser.parse_args()

  cfg, params, tokenizer, frames, size = resolve_clip(args)

  if args.class_names:
    names = [line.strip() for line in open(args.class_names)
             if line.strip()]
  elif args.synthetic:
    names = list(_SYNTHETIC_CLASSES)
  else:
    raise SystemExit('need --class-names (or --synthetic)')

  if args.synthetic:
    source = data_lib.SyntheticLabeledSource(
        num_examples=max(16, args.batch_size * 2), num_frames=frames,
        size=size, num_classes=len(names), seed=1)
  elif args.tar_shards:
    source = data_lib.TarShardSource.from_glob(
        args.tar_shards, labeled=True, num_frames=frames, target_size=size)
  elif args.manifest:
    source = data_lib.VideoLabelSource.from_manifest(
        args.manifest, num_frames=frames, target_size=size)
  else:
    raise SystemExit('need --manifest, --tar-shards, or --synthetic')
  source = maybe_multiview(source, args)

  metrics = evaluate_zero_shot(
      params, cfg, source, tokenizer, names, batch_size=args.batch_size,
      text_batch_size=args.text_batch_size, bootstrap=args.bootstrap)
  print(json.dumps({k: round(v, 6) for k, v in metrics.items()}))


if __name__ == '__main__':
  main()
