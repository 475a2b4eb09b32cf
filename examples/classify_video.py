#!/usr/bin/env python
"""Video classification with a VideoPrism backbone + attention-pooled head.

TPU-stack equivalent of the reference's classifier flow
(models_mlx.load_classifier): backbone from a pretrained checkpoint, head
randomly initialized (train it before trusting the labels!).

  python examples/classify_video.py VIDEO.mp4 --num-classes 400
"""

from __future__ import annotations

import argparse

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
  parser.add_argument('--num-classes', type=int, default=vp.K400_NUM_CLASSES)
  parser.add_argument('--frames', type=int, default=16)
  parser.add_argument('--checkpoint', default=None)
  parser.add_argument(
      '--long', action='store_true',
      help='stream the WHOLE video through windowed forwards with exact '
           'online-softmax pooling (constant memory, any length) instead '
           'of sampling --frames frames')
  args = parser.parse_args()

  bound = vp.load_classifier(
      args.model, args.num_classes, weights_path=args.checkpoint)

  if args.long:
    from videoprism_tpu import streaming

    logits = jnp.asarray(streaming.classify_long_video(
        bound.params, bound.config, args.video,
        window=args.frames))[None]
  else:
    clip = video_lib.load_video(args.video, num_frames=args.frames)[None]
    forward = jax.jit(lambda v: bound(v, train=False)[0])
    logits = forward(jnp.asarray(clip))
  profiling.sync(logits)

  probs = np.asarray(jax.nn.softmax(logits, axis=-1)[0], np.float32)
  top5 = np.argsort(-probs)[:5]
  print('top-5 class indices (untrained head => uniform-ish):')
  for idx in top5:
    print(f'  class {idx:4d}: p={probs[idx]:.4f}')


if __name__ == '__main__':
  main()
