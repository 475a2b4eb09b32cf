#!/usr/bin/env python
"""Corpus-scale video embedding: prefetched decode + (multi-chip) batched
forward, writing embeddings to an .npz index.

Ties the serving tier together: `VideoPrefetcher` overlaps OpenCV decode
with device compute; with more than one chip the forward runs data-parallel
via `shard_map` (Pallas kernels intact per shard).

  python examples/embed_video_corpus.py 'videos/*.mp4' index.npz \
      [--model videoprism_public_v1_base] [--batch-size 8] [--bf16]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import videoprism_tpu as vp
from videoprism_tpu import serving
from videoprism_tpu.io import video as video_lib
from videoprism_tpu.parallel import data_sharding, make_mesh
from videoprism_tpu.utils import profiling


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('videos_glob')
  parser.add_argument('output')
  parser.add_argument('--model', default='videoprism_public_v1_base')
  parser.add_argument('--batch-size', type=int, default=8)
  parser.add_argument('--frames', type=int, default=16)
  parser.add_argument('--bf16', action='store_true')
  parser.add_argument('--checkpoint', default=None)
  parser.add_argument('--pool', default='mean', choices=['mean', 'none'],
                      help='mean: one [D] vector per clip; none: full grid')
  args = parser.parse_args()

  paths = sorted(glob.glob(args.videos_glob))
  if not paths:
    raise SystemExit(f'no videos match {args.videos_glob!r}')
  print(f'{len(paths)} videos; {jax.device_count()} device(s)')

  model = vp.get_model(
      args.model,
      fprop_dtype=jnp.bfloat16 if args.bf16 else None,
      attention_impl='flash' if jax.devices()[0].platform == 'tpu' else None)
  state = vp.load_pretrained_weights(args.model, checkpoint_path=args.checkpoint)

  def forward(params, videos):
    emb, _ = model.apply(params, videos, train=False)
    if args.pool == 'mean':
      emb = emb.mean(axis=1)
    return emb.astype(jnp.float32)

  mesh = None
  sharding = None
  if jax.device_count() > 1:
    mesh = make_mesh()
    fwd = serving.data_parallel_forward(forward, mesh)
    sharding = lambda ndim: data_sharding(mesh, ndim)
  else:
    fwd = jax.jit(forward)

  prefetcher = video_lib.VideoPrefetcher(
      paths, args.batch_size, num_frames=args.frames,
      sharding=sharding(5) if sharding else None)

  all_embeddings = []
  t0 = time.time()
  done = 0
  for batch in prefetcher:
    if batch.shape[0] < args.batch_size and mesh is not None:
      # Last partial batch: pad to keep the dp split even.
      pad = args.batch_size - batch.shape[0]
      batch = jnp.concatenate(
          [batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)])
      emb = np.asarray(fwd(state, batch))[:-pad]
    else:
      emb = np.asarray(fwd(state, batch))
    all_embeddings.append(emb)
    done += emb.shape[0]
    print(f'{done}/{len(paths)}  ({done / (time.time() - t0):.2f} clips/s)')

  embeddings = np.concatenate(all_embeddings, axis=0)
  np.savez(args.output, embeddings=embeddings, paths=np.asarray(paths))
  print(f'wrote {args.output}: {embeddings.shape}')
  print(profiling.memory_stats())


if __name__ == '__main__':
  main()
