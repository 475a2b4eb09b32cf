#!/usr/bin/env python
"""Extract video embeddings with a VideoPrism backbone (TPU).

TPU-stack equivalent of reference test_video_encoder.py: load a video,
embed it, print feature statistics.

  python examples/video_embeddings.py VIDEO.mp4 \
      [--model videoprism_public_v1_base] [--bf16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import videoprism_tpu as vp
from videoprism_tpu import assets
from videoprism_tpu.io import video as video_lib
from videoprism_tpu.utils import profiling


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument(
      'video', nargs='?', default=assets.demo_video_path(),
      help='path to an mp4 (default: the bundled demo clip)')
  parser.add_argument('--model', default='videoprism_public_v1_base')
  parser.add_argument('--frames', type=int, default=16)
  parser.add_argument('--bf16', action='store_true')
  parser.add_argument('--checkpoint', default=None,
                      help='local checkpoint path (default: HF download)')
  args = parser.parse_args()

  model = vp.get_model(
      args.model, fprop_dtype=jnp.bfloat16 if args.bf16 else None)
  state = vp.load_pretrained_weights(args.model, checkpoint_path=args.checkpoint)

  print(f'Loading {args.video} ({args.frames} frames @ 288x288)...')
  clip = video_lib.load_video(args.video, num_frames=args.frames)[None]

  forward = jax.jit(lambda s, v: model.apply(s, v, train=False)[0])
  t0 = time.time()
  embeddings = forward(state, jnp.asarray(clip))
  profiling.sync(embeddings)
  print(f'forward (incl. compile): {time.time() - t0:.2f}s')

  emb = np.asarray(embeddings[0], np.float32)
  t, n = args.frames, emb.shape[0] // args.frames
  print(f'embeddings: {embeddings.shape}  '
        f'(= [{t} frames x {n} patch tokens, {emb.shape[-1]} dims])')
  print(f'mean {emb.mean():+.4f}  std {emb.std():.4f}  '
        f'min {emb.min():+.4f}  max {emb.max():+.4f}')
  global_emb = emb.mean(axis=0)
  print(f'mean-pooled global embedding norm: '
        f'{np.linalg.norm(global_emb):.4f}')


if __name__ == '__main__':
  main()
