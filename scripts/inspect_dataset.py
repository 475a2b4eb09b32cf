#!/usr/bin/env python
"""Dataset health sweep: decode every example and report what's broken.

Production training jobs die hours in on one corrupt video; this sweeps
the corpus up front (threaded decode, same sources the trainers use) and
reports:

* decode failures, with the path/key and the exception;
* clip geometry + pixel-range sanity (all-black / constant clips are
  usually decode bugs, [0,255] floats are usually a normalization bug);
* label histogram (labeled sources) or caption length stats (text
  sources) — an unbalanced or empty class is a data bug, not a model bug.

  python scripts/inspect_dataset.py --manifest train.csv --labeled
  python scripts/inspect_dataset.py --tar-shards 'shards/*.tar'
  python scripts/inspect_dataset.py --videos-glob 'clips/*.mp4' --sample 500

Exit code 1 when any example fails to decode (CI-gateable).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import concurrent.futures
import json
import time

import numpy as np


def build_source(args):
  from videoprism_tpu.train import data as data_lib

  kwargs = dict(num_frames=args.num_frames, target_size=args.frame_size)
  if args.tar_shards:
    return data_lib.TarShardSource.from_glob(
        args.tar_shards, labeled=args.labeled, **kwargs)
  if args.manifest:
    if args.labeled:
      return data_lib.VideoLabelSource.from_manifest(args.manifest, **kwargs)
    return data_lib.VideoTextSource.from_manifest(
        args.manifest, allow_missing_captions=True, **kwargs)
  if args.videos_glob:
    import glob as glob_lib

    paths = sorted(glob_lib.glob(args.videos_glob))
    if not paths:
      raise SystemExit(f'no videos match {args.videos_glob!r}')
    return data_lib.VideoTextSource(paths, [''] * len(paths), **kwargs)
  raise SystemExit('need one of --manifest / --tar-shards / --videos-glob')


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--manifest', default=None)
  parser.add_argument('--tar-shards', default=None)
  parser.add_argument('--videos-glob', default=None)
  parser.add_argument('--labeled', action='store_true',
                      help='treat the second field as an int label')
  parser.add_argument('--num-frames', type=int, default=16)
  parser.add_argument('--frame-size', type=int, default=288)
  parser.add_argument('--sample', type=int, default=0,
                      help='inspect an evenly-spaced sample of N examples '
                           '(0: the whole corpus)')
  parser.add_argument('--num-workers', type=int, default=8)
  parser.add_argument('--json-out', default=None,
                      help='also write the full report as JSON')
  parser.add_argument('--max-failures-shown', type=int, default=20)
  args = parser.parse_args()

  source = build_source(args)
  n = len(source)
  indices = list(range(n))
  if args.sample and args.sample < n:
    indices = list(np.linspace(0, n - 1, args.sample, dtype=int))
  ids = (getattr(source, 'video_paths', None)
         or getattr(source, 'example_keys', None)
         or [str(i) for i in range(n)])

  failures = []
  shapes = collections.Counter()
  dtypes = collections.Counter()
  label_hist = collections.Counter()
  caption_lengths = []
  pixel_min, pixel_max = float('inf'), float('-inf')
  suspicious_constant = []

  def probe(i):
    example = source.get(i)
    return i, np.asarray(example[0]), example[1]

  t0 = time.perf_counter()
  done = 0
  with concurrent.futures.ThreadPoolExecutor(args.num_workers) as pool:
    futures = {pool.submit(probe, i): i for i in indices}
    for fut in concurrent.futures.as_completed(futures):
      i = futures[fut]
      done += 1
      try:
        _, clip, extra = fut.result()
      except Exception as e:  # noqa: BLE001 — the whole point is the report
        failures.append({'index': i, 'id': str(ids[i]),
                         'error': f'{type(e).__name__}: {e}'})
        continue
      shapes[clip.shape] += 1
      dtypes[str(clip.dtype)] += 1
      lo, hi = float(clip.min()), float(clip.max())
      pixel_min, pixel_max = min(pixel_min, lo), max(pixel_max, hi)
      if lo == hi:
        suspicious_constant.append(str(ids[i]))
      if args.labeled:
        label_hist[int(extra)] += 1
      elif isinstance(extra, str) and extra:
        caption_lengths.append(len(extra.split()))
      if done % 200 == 0:
        rate = done / (time.perf_counter() - t0)
        print(f'... {done}/{len(indices)} ({rate:.1f} clips/s)', flush=True)

  elapsed = time.perf_counter() - t0
  report = {
      'examples_total': n,
      'examples_inspected': len(indices),
      'decode_failures': len(failures),
      'failures': failures,
      'shapes': {str(k): v for k, v in shapes.most_common()},
      'dtypes': dict(dtypes),
      'pixel_range': (None if pixel_min == float('inf')
                      else [pixel_min, pixel_max]),
      'constant_clips': suspicious_constant,
      'decode_clips_per_sec': round(len(indices) / elapsed, 2),
  }
  if args.labeled:
    report['label_histogram'] = {
        str(k): v for k, v in sorted(label_hist.items())}
    report['num_classes_seen'] = len(label_hist)
  elif caption_lengths:
    report['caption_words'] = {
        'min': int(np.min(caption_lengths)),
        'mean': round(float(np.mean(caption_lengths)), 1),
        'max': int(np.max(caption_lengths)),
        'empty': len(indices) - len(failures) - len(caption_lengths),
    }

  print(f'\n{len(indices)} examples inspected in {elapsed:.1f}s '
        f'({report["decode_clips_per_sec"]} clips/s, '
        f'{args.num_workers} workers)')
  print(f'shapes: {report["shapes"]}  dtypes: {report["dtypes"]}')
  if report['pixel_range']:
    lo, hi = report['pixel_range']
    print(f'pixel range: [{lo:.4g}, {hi:.4g}]'
          + ('  <-- looks like unnormalized [0,255] floats'
             if hi > 2.0 and 'float' in next(iter(dtypes), '') else ''))
  if suspicious_constant:
    print(f'CONSTANT clips (likely decode bugs): '
          f'{suspicious_constant[:args.max_failures_shown]}')
  if args.labeled:
    print(f'labels: {report["num_classes_seen"]} classes, '
          f'histogram {report["label_histogram"]}')
  elif caption_lengths:
    print(f'captions: {report["caption_words"]}')
  if failures:
    print(f'\n{len(failures)} DECODE FAILURES:')
    for f in failures[:args.max_failures_shown]:
      print(f'  {f["id"]}: {f["error"]}')
    if len(failures) > args.max_failures_shown:
      print(f'  ... and {len(failures) - args.max_failures_shown} more')
  else:
    print('no decode failures')
  if args.json_out:
    with open(args.json_out, 'w') as f:
      json.dump(report, f, indent=2)
    print(f'report -> {args.json_out}')
  raise SystemExit(1 if failures else 0)


if __name__ == '__main__':
  main()
