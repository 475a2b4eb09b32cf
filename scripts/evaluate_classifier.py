#!/usr/bin/env python
"""Evaluate a video classifier: manifest -> top-1/top-5 accuracy (one JSON line).

Closes the VideoGLUE loop around ``scripts/train_classifier.py``: point it
at a fine-tuned checkpoint dir (orbax, written by the trainer) or plain
weights (``load_classifier`` resolution), plus a held-out manifest.

  python scripts/evaluate_classifier.py --model videoprism_public_v1_base \
      --num-classes 400 --checkpoint-dir /ckpts/k400 --manifest val.csv

Smoke (synthetic, CPU):
  python scripts/evaluate_classifier.py --tiny --synthetic --cpu-devices 8
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))

import videoprism_tpu as vp  # noqa: E402
from videoprism_tpu.models import classifier as vc  # noqa: E402
from videoprism_tpu.models import factorized_encoder as fe  # noqa: E402
from videoprism_tpu.models import init as init_lib  # noqa: E402
from videoprism_tpu.train import (  # noqa: E402
    create_classifier_train_state,
    data as data_lib,
    evaluate_classifier,
    make_optimizer,
)
from videoprism_tpu.train.checkpointing import TrainCheckpointer  # noqa: E402

from smoke_configs import TINY_ENC  # noqa: E402


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--model', default='videoprism_public_v1_base')
  parser.add_argument('--num-classes', type=int, default=vp.K400_NUM_CLASSES)
  parser.add_argument('--tiny', action='store_true')
  parser.add_argument('--synthetic', action='store_true',
                      help='evaluate on the synthetic held-out set')
  parser.add_argument('--manifest', default=None,
                      help='CSV manifest: video_path,int_label per line')
  parser.add_argument('--tar-shards', default=None,
                      help='glob of uncompressed .tar shards '
                           '(<key>.mp4 + <key>.cls pairs)')
  parser.add_argument('--checkpoint-dir', default=None,
                      help='orbax dir written by train_classifier.py '
                           '(restores the latest step)')
  parser.add_argument('--weights', default=None,
                      help='classifier weights file (load_classifier path); '
                           'ignored when --checkpoint-dir is set')
  parser.add_argument('--batch-size', type=int, default=8)
  parser.add_argument('--bootstrap', type=int, default=0,
                      help='percentile-bootstrap CIs over queries: N resamples -> <metric>_ci_low/_ci_high keys (0 = off)')
  parser.add_argument('--num-frames', type=int, default=0,
                      help='default: 16 for base, 8 otherwise')
  parser.add_argument('--temporal-views', type=int, default=1,
                      help='multi-view eval: N temporal clips per video')
  parser.add_argument('--spatial-views', type=int, default=1,
                      help='multi-view eval: M spatial crops per clip '
                           '(3 = left/center/right)')
  parser.add_argument('--view-aggregate', default='logits',
                      choices=['logits', 'probs'],
                      help='average per-view logits (ViViT) or softmax '
                           'probabilities')
  parser.add_argument('--cpu-devices', type=int, default=0)
  parser.add_argument('--seed', type=int, default=0)
  args = parser.parse_args()

  if args.cpu_devices:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    # CPU platform + host-feature-scoped compile cache (a foreign
    # host's XLA:CPU AOT entries can SIGILL/segfault on load).
    force_cpu(args.cpu_devices)

  if args.tiny:
    enc_cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
    frames, size = 2, 12
  else:
    base = vp.CONFIGS[
        'videoprism_v1_large' if 'large' in args.model else
        'videoprism_v1_giant' if 'giant' in args.model else
        'videoprism_v1_base']
    enc_cfg = fe.FactorizedEncoderConfig(**base)
    frames = args.num_frames or (16 if 'base' in args.model else 8)
    size = 288
  cfg = vc.VideoClassifierConfig(encoder=enc_cfg,
                                 num_classes=args.num_classes)

  # --- params: checkpoint dir > weights file > pretrained > random ---
  if args.checkpoint_dir:
    # Template must match the trainer's saved pytree; the optimizer
    # hyperparameters don't affect restored values.
    template = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg,
        make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=2))
    state = TrainCheckpointer(args.checkpoint_dir).restore_latest(template)
    if state is None:
      raise SystemExit(f'no checkpoint found in {args.checkpoint_dir}')
    params = state.params
    print(f'restored step {int(jax.device_get(state.step))} '
          f'from {args.checkpoint_dir}')
  elif args.tiny:
    params = init_lib.init_video_classifier(jax.random.PRNGKey(args.seed),
                                            cfg)
  else:
    params = vp.load_classifier(args.model, args.num_classes,
                                weights_path=args.weights).params

  # --- data ---
  if args.synthetic:
    source = data_lib.SyntheticLabeledSource(
        num_examples=max(16, args.batch_size * 2), num_frames=frames,
        size=size, num_classes=args.num_classes, seed=1)
  elif args.tar_shards:
    source = data_lib.TarShardSource.from_glob(
        args.tar_shards, labeled=True, num_frames=frames, target_size=size)
  elif args.manifest:
    source = data_lib.VideoLabelSource.from_manifest(
        args.manifest, num_frames=frames, target_size=size)
  else:
    raise SystemExit('need --manifest, --tar-shards, or --synthetic')

  if args.temporal_views > 1 or args.spatial_views > 1:
    if args.synthetic or args.tar_shards:
      raise SystemExit('multi-view eval needs --manifest (path-backed '
                       'videos: views re-decode at native resolution)')
    source = data_lib.MultiViewSource(
        source, temporal_views=args.temporal_views,
        spatial_views=args.spatial_views)

  metrics = evaluate_classifier(params, cfg, source,
                                batch_size=args.batch_size,
                                view_aggregate=args.view_aggregate,
                                bootstrap=args.bootstrap)
  print(json.dumps({k: round(v, 6) for k, v in metrics.items()}))


if __name__ == '__main__':
  main()
