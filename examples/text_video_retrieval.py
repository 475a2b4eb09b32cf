#!/usr/bin/env python
"""Zero-shot text-video retrieval with VideoPrism LvT (TPU).

TPU-stack equivalent of reference test_flax.py / test_mlx.py: embed a video
and a set of captions, print the cosine-similarity ranking.

  python examples/text_video_retrieval.py VIDEO.mp4 \
      "a person playing drums" "a cat sleeping" "a car race"
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import videoprism_tpu as vp
from videoprism_tpu.io import video as video_lib
from videoprism_tpu.utils import profiling


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('video')
  parser.add_argument('texts', nargs='+')
  parser.add_argument('--model', default='videoprism_lvt_public_v1_base')
  parser.add_argument('--frames', type=int, default=16)
  parser.add_argument('--bf16', action='store_true')
  parser.add_argument('--checkpoint', default=None)
  parser.add_argument('--tokenizer', default='c4_en')
  args = parser.parse_args()

  model = vp.get_model(
      args.model, fprop_dtype=jnp.bfloat16 if args.bf16 else None)
  state = vp.load_pretrained_weights(args.model, checkpoint_path=args.checkpoint)
  tokenizer = vp.load_text_tokenizer(args.tokenizer)

  clip = video_lib.load_video(args.video, num_frames=args.frames)[None]
  text_ids, text_paddings = vp.tokenize_texts(tokenizer, args.texts)

  forward = jax.jit(
      lambda s, v, t, p: model.apply(s, v, t, p, train=False)[:2])
  t0 = time.time()
  video_emb, text_emb = forward(
      state, jnp.asarray(clip), jnp.asarray(text_ids),
      jnp.asarray(text_paddings))
  profiling.sync(video_emb)
  print(f'forward (incl. compile): {time.time() - t0:.2f}s\n')

  sims = np.asarray(video_emb, np.float32) @ np.asarray(
      text_emb, np.float32).T
  order = np.argsort(-sims[0])
  print('similarity ranking:')
  for rank, idx in enumerate(order, 1):
    print(f'  {rank}. {sims[0, idx]:+.4f}  {args.texts[idx]!r}')


if __name__ == '__main__':
  main()
