#!/usr/bin/env python
"""Export a compiled model forward as a portable StableHLO artifact.

One artifact (~tens of KB, weights NOT baked in) serves any process that
has jax installed — no model-building Python needed.  Pair it with the
checkpoint file; the artifact takes the param pytree as its first input.

Examples:
  # Video-encoder artifact, symbolic batch, current backend:
  python scripts/export_model.py --model videoprism_public_v1_base \
      --output base.jaxexport --random-init

  # CLIP towers for a retrieval fleet (weights from the usual resolution
  # chain: weights/ dir, then HF):
  python scripts/export_model.py --model videoprism_lvt_public_v1_base \
      --tower video --output lvt_video.jaxexport
  python scripts/export_model.py --model videoprism_lvt_public_v1_base \
      --tower text --output lvt_text.jaxexport

  # Multi-platform artifact (requires the XLA attention path):
  python scripts/export_model.py --model videoprism_public_v1_base \
      --platforms tpu,cpu --attention-impl xla --output base_multi.jaxexport
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import argparse

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))


def main():
  parser = argparse.ArgumentParser(
      description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
  parser.add_argument('--model', default=None,
                      help='registry name or HF id (see vp.MODELS); '
                           'not needed with --tiny')
  parser.add_argument('--output', required=True, help='artifact path')
  parser.add_argument('--tower', default='video', choices=('video', 'text'),
                      help='which CLIP tower to export (lvt models only)')
  parser.add_argument('--batch', default='b',
                      help="concrete int, or a dim name for symbolic batch "
                           "(default 'b': one artifact, any batch size)")
  parser.add_argument('--frames', type=int, default=None,
                      help='clip frames (default: config-native)')
  parser.add_argument('--size', type=int, default=None,
                      help='frame size (default: config-native)')
  parser.add_argument('--text-len', type=int, default=64)
  parser.add_argument('--platforms', default=None,
                      help="comma-separated, e.g. 'tpu' or 'tpu,cpu' "
                           '(default: current backend)')
  parser.add_argument('--attention-impl', default=None,
                      choices=('xla', 'flash'),
                      help="'xla' required for multi-platform artifacts")
  parser.add_argument('--fprop-dtype', default=None,
                      choices=('float32', 'bfloat16'))
  parser.add_argument('--weights-path', default=None)
  parser.add_argument('--random-init', action='store_true',
                      help='skip weight loading; artifact signature only '
                           'depends on shapes, so this exports the identical '
                           'program without a checkpoint on disk')
  parser.add_argument('--tiny', action='store_true',
                      help='export the tiny random smoke encoder (the same '
                           'geometry serve_embeddings.py --tiny serves) — '
                           'for wire-format/CLI smokes, implies random init')
  parser.add_argument('--cpu-devices', type=int, default=0)
  args = parser.parse_args()

  if args.cpu_devices:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    # CPU platform + host-feature-scoped compile cache (a foreign
    # host's XLA:CPU AOT entries can SIGILL/segfault on load).
    force_cpu(args.cpu_devices)

  import jax.numpy as jnp

  import videoprism_tpu as vp
  from videoprism_tpu import export as export_lib

  fprop = jnp.bfloat16 if args.fprop_dtype == 'bfloat16' else None
  if args.tiny:
    from smoke_configs import TINY_ENC
    from videoprism_tpu.models import factorized_encoder as fe
    from videoprism_tpu.models import init as init_lib

    cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    params = model.init(jax.random.PRNGKey(0))
  else:
    if not args.model:
      parser.error('--model is required (or pass --tiny)')
    model = vp.get_model(args.model, fprop_dtype=fprop,
                         attention_impl=args.attention_impl)
    if args.random_init:
      params = model.init(jax.random.PRNGKey(0))
    else:
      params = vp.load_pretrained_weights(
          args.model, checkpoint_path=args.weights_path)
  if fprop is not None:
    params = jax.tree.map(lambda x: jnp.asarray(x, fprop), params)

  try:
    batch = int(args.batch)
  except ValueError:
    batch = args.batch
  platforms = args.platforms.split(',') if args.platforms else None

  exported = export_lib.export_forward(
      model, params, batch=batch, num_frames=args.frames,
      frame_size=args.size, text_len=args.text_len, tower=args.tower,
      platforms=platforms)
  exported.save(args.output)
  nbytes = os.path.getsize(args.output)
  specs = ', '.join(str(a) for a in exported.in_avals[-2:])
  name = args.model or 'tiny'
  entry = args.tower if args.model and 'lvt' in args.model else 'forward'
  print(f'exported {name} [{entry}] '
        f'-> {args.output} ({nbytes / 1024:.1f} KB, '
        f'platforms={list(exported.platforms)}, inputs ...{specs})')


if __name__ == '__main__':
  main()
