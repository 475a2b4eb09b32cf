#!/usr/bin/env python
"""Pack videos (+ captions/labels) into WebDataset-style tar shards.

The write-side counterpart of ``data.TarShardSource``: takes a manifest
(or a bare glob) and emits uncompressed ``.tar`` shards of
``<key>.<ext>`` + ``<key>.txt`` (caption) / ``<key>.cls`` (label) pairs
that the trainers, eval CLIs, and loaders consume via ``--tar-shards``.

    # caption pairs (CLIP training):
    python scripts/make_tar_shards.py --manifest pairs.tsv \
        --out shards/train --shard-size 512

    # labeled (classifier):
    python scripts/make_tar_shards.py --manifest labels.csv --labeled \
        --out shards/k400

    # videos only (indexing corpora):
    python scripts/make_tar_shards.py --videos-glob 'corpus/*.mp4' \
        --out shards/corpus

Keys are zero-padded positions within the shard (WebDataset convention —
per-shard numbering is fine: the reader pairs within a shard). Shards are
written via a temp name and renamed on completion, so a killed run never
leaves a truncated shard that looks whole.
"""

from __future__ import annotations

import argparse
import glob as glob_lib
import json
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from videoprism_tpu.train import data as data_lib  # noqa: E402


def _read_manifest(path: str, labeled: bool):
  """Reuses the training-side manifest semantics (one source of truth)."""
  if labeled:
    src = data_lib.VideoLabelSource.from_manifest(path)
    return list(src.video_paths), [str(l) for l in src.labels], '.cls'
  src = data_lib.VideoTextSource.from_manifest(path)
  return list(src.video_paths), list(src.captions), '.txt'


def write_shards(examples, out_prefix: str, shard_size: int,
                 target_ext: str | None) -> list[str]:
  """``examples`` is ``[(video_path, target_or_None), ...]``; returns the
  shard paths written."""
  os.makedirs(os.path.dirname(out_prefix) or '.', exist_ok=True)
  shards = []
  for si in range(0, len(examples), shard_size):
    chunk = examples[si:si + shard_size]
    shard_path = f'{out_prefix}-{si // shard_size:05d}.tar'
    tmp = shard_path + '.tmp'
    with tarfile.open(tmp, 'w') as tf:
      for i, (video, target) in enumerate(chunk):
        key = f'{i:06d}'
        ext = os.path.splitext(video)[1].lower() or '.mp4'
        tf.add(video, arcname=key + ext)
        if target is not None:
          payload = target.encode('utf-8')
          info = tarfile.TarInfo(key + target_ext)
          info.size = len(payload)
          import io

          tf.addfile(info, io.BytesIO(payload))
    os.replace(tmp, shard_path)
    shards.append(shard_path)
  return shards


def main(argv=None) -> int:
  parser = argparse.ArgumentParser(
      description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
  parser.add_argument('--manifest', default=None,
                      help='video<TAB>caption (or video,label with '
                           '--labeled) per line')
  parser.add_argument('--videos-glob', default=None,
                      help='videos only, no targets (indexing corpora)')
  parser.add_argument('--labeled', action='store_true',
                      help='manifest carries integer labels -> .cls members')
  parser.add_argument('--out', required=True,
                      help='shard path prefix (writes <out>-00000.tar ...)')
  parser.add_argument('--shard-size', type=int, default=512,
                      help='examples per shard')
  args = parser.parse_args(argv)
  if args.shard_size <= 0:
    parser.error('--shard-size must be positive')

  if args.manifest:
    paths, targets, target_ext = _read_manifest(args.manifest, args.labeled)
    examples = list(zip(paths, targets))
  elif args.videos_glob:
    if args.labeled:
      parser.error('--labeled needs --manifest (labels come from it)')
    paths = sorted(glob_lib.glob(args.videos_glob))
    # Empty captions keep the reader's pairing contract (TarShardSource
    # treats a video without its target member as an error, by design).
    examples, target_ext = [(p, '') for p in paths], '.txt'
  else:
    parser.error('need --manifest or --videos-glob')
  if not examples:
    raise SystemExit('no videos matched')
  missing = [p for p, _ in examples if not os.path.exists(p)]
  if missing:
    raise SystemExit(f'{len(missing)} videos missing, first: {missing[0]}')
  # The reader (TarShardSource) pairs only these extensions — packing
  # anything else would silently vanish on read.
  bad_ext = [p for p, _ in examples
             if (os.path.splitext(p)[1].lower() or '.mp4')
             not in data_lib._TAR_VIDEO_EXTS]
  if bad_ext:
    raise SystemExit(
        f'{len(bad_ext)} videos have extensions TarShardSource does not '
        f'read ({data_lib._TAR_VIDEO_EXTS}); first: {bad_ext[0]}')

  shards = write_shards(examples, args.out, args.shard_size, target_ext)
  print(json.dumps({'num_examples': len(examples),
                    'num_shards': len(shards), 'shards': shards}))
  return 0


if __name__ == '__main__':
  sys.exit(main())
