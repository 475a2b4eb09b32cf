#!/usr/bin/env python
"""Text<->video retrieval evaluation: pairs manifest -> R@k (one JSON line).

The runner for the reference's published MSRVTT/VATEX/ActivityNet tables
(reference README.md:199-206, which ships numbers but no evaluation code):
point it at an lvt model + a manifest of ``video<TAB>caption`` pairs.

  python scripts/evaluate_retrieval.py --model videoprism_lvt_public_v1_base \
      --manifest msrvtt_1k.tsv --tokenizer-model c4_en.model

Smoke (synthetic, CPU):
  python scripts/evaluate_retrieval.py --tiny --synthetic --cpu-devices 8
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
from videoprism_tpu import assets  # noqa: E402
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer  # noqa: E402
from videoprism_tpu.models import clip as vclip  # noqa: E402
from videoprism_tpu.models import init as init_lib  # noqa: E402
from videoprism_tpu.train import (  # noqa: E402
    data as data_lib,
    evaluate_retrieval,
)

from smoke_configs import TINY_CLIP as TINY_CFG  # noqa: E402


def add_clip_eval_args(parser):
  """Shared flags for the lvt evaluation CLIs."""
  parser.add_argument('--model', default='videoprism_lvt_public_v1_base')
  parser.add_argument('--tiny', action='store_true')
  parser.add_argument('--synthetic', action='store_true')
  parser.add_argument('--init-checkpoint', default=None,
                      help='local npz/safetensors CLIP weights '
                           '(default: the usual pretrained resolution; '
                           'random init with --tiny)')
  parser.add_argument('--tokenizer-model', default=None)
  parser.add_argument('--batch-size', type=int, default=8)
  parser.add_argument('--bootstrap', type=int, default=0,
                      help='percentile-bootstrap CIs over queries: N resamples -> <metric>_ci_low/_ci_high keys (0 = off)')
  parser.add_argument('--text-batch-size', type=int, default=0,
                      help='default: max(--batch-size, 32)')
  parser.add_argument('--num-frames', type=int, default=0,
                      help='default: 16 for base, 8 otherwise')
  parser.add_argument('--temporal-views', type=int, default=1,
                      help='multi-view eval: N temporal clips per video '
                           '(embeddings averaged + renormalized)')
  parser.add_argument('--spatial-views', type=int, default=1,
                      help='multi-view eval: M spatial crops per clip')
  parser.add_argument('--cpu-devices', type=int, default=0)
  parser.add_argument('--seed', type=int, default=0)


def resolve_clip(args, need_tokenizer: bool = True):
  """(cfg, params, tokenizer, frames, size) from the shared flags.

  ``need_tokenizer=False`` (e.g. build_video_index, which never touches
  text) returns ``tokenizer=None`` instead of requiring one."""
  if args.cpu_devices:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    # CPU platform + host-feature-scoped compile cache (a foreign
    # host's XLA:CPU AOT entries can SIGILL/segfault on load).
    force_cpu(args.cpu_devices)

  if args.tiny:
    cfg = vclip.VideoCLIPConfig(**TINY_CFG)
    frames, size = 2, 12
  else:
    cfg = vclip.VideoCLIPConfig(**vp.get_model_config(args.model))
    frames = args.num_frames or (16 if 'base' in args.model else 8)
    size = 288

  # Resolve the tokenizer BEFORE touching weights: missing tokenizer
  # configuration should fail in milliseconds, not after a checkpoint
  # download.
  tok_path = None
  if need_tokenizer:
    try:
      tok_path = assets.resolve_tokenizer_path(
          args.tokenizer_model,
          allow_fixture=args.tiny or getattr(args, 'synthetic', False))
    except ValueError as e:
      raise SystemExit(str(e)) from None

  if args.init_checkpoint:
    state = vp.load_pretrained_weights(
        None, checkpoint_path=args.init_checkpoint)
    params = state.get('params', state)
  elif args.tiny:
    params = init_lib.init_video_clip(jax.random.PRNGKey(args.seed), cfg)
  else:
    state = vp.load_pretrained_weights(args.model)
    params = state.get('params', state)

  if tok_path is None:
    return cfg, params, None, frames, size
  return cfg, params, SentencePieceTokenizer(tok_path), frames, size


def maybe_multiview(source, args):
  """Wraps a path-backed source for NxM multi-view eval when requested."""
  tv = getattr(args, 'temporal_views', 1)
  sv = getattr(args, 'spatial_views', 1)
  if tv <= 1 and sv <= 1:
    return source
  if args.synthetic or getattr(args, 'tar_shards', None):
    raise SystemExit('multi-view eval needs --manifest (path-backed '
                     'videos: views re-decode at native resolution)')
  return data_lib.MultiViewSource(source, temporal_views=tv,
                                  spatial_views=sv)


def main():
  parser = argparse.ArgumentParser()
  add_clip_eval_args(parser)
  parser.add_argument('--manifest', default=None,
                      help='one video_path<TAB>caption per line (lines '
                           'without a tab split at the first comma)')
  parser.add_argument('--tar-shards', default=None,
                      help='glob of uncompressed .tar shards '
                           '(<key>.mp4 + <key>.txt caption pairs)')
  args = parser.parse_args()

  cfg, params, tokenizer, frames, size = resolve_clip(args)

  if args.synthetic:
    source = data_lib.SyntheticSource(
        num_examples=max(16, args.batch_size * 2), num_frames=frames,
        size=size)
  elif args.tar_shards:
    source = data_lib.TarShardSource.from_glob(
        args.tar_shards, num_frames=frames, target_size=size)
  elif args.manifest:
    source = data_lib.VideoTextSource.from_manifest(
        args.manifest, num_frames=frames, target_size=size)
  else:
    raise SystemExit('need --manifest, --tar-shards, or --synthetic')
  source = maybe_multiview(source, args)

  metrics = evaluate_retrieval(
      params, cfg, source, tokenizer, batch_size=args.batch_size,
      text_batch_size=args.text_batch_size, bootstrap=args.bootstrap)
  print(json.dumps({k: round(v, 6) for k, v in metrics.items()}))


if __name__ == '__main__':
  main()
