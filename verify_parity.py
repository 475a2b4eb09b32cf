#!/usr/bin/env python
"""Numerical parity harness: this framework vs the reference Flax oracle.

TPU-stack port of reference verify_clip_models.py — same methodology (same
video + texts through both stacks, max/mean abs diff on embeddings and on
the similarity matrix, pass gate), but with the *Flax reference itself* as
the oracle instead of MLX, and workable without network access: when no
checkpoint is given, the reference model's own random init is fed to both
stacks, which exercises every layer at full depth.

Usage:
  python verify_parity.py                           # lvt-base arch, random init
  python verify_parity.py --model videoprism_lvt_public_v1_large \
      --checkpoint path/to/ckpt.npz --video path/to/clip.mp4
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# The oracle runs on CPU; compare like-for-like (see tests/conftest.py for
# why config.update is required rather than env vars).
import jax

jax.config.update('jax_platforms', 'cpu')
from videoprism_tpu.utils.compilation_cache import cache_dir  # noqa: E402

jax.config.update('jax_compilation_cache_dir', cache_dir(cpu=True))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PASS_GATE = 1e-4  # our gate; reference used 1e-3 (verify_clip_models.py:92)


def _load_reference():
  ref_path = os.environ.get('VIDEOPRISM_REFERENCE', '/root/reference')
  if os.path.isdir(ref_path) and ref_path not in sys.path:
    sys.path.insert(0, ref_path)
  # Note: only `encoders` — `videoprism.models` pulls in sentencepiece,
  # which this environment doesn't have (and we don't need the oracle's
  # registry, just its modules).
  from videoprism import encoders as ref_encoders

  return ref_encoders


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--model', default='videoprism_lvt_public_v1_base')
  parser.add_argument('--checkpoint', default=None)
  parser.add_argument('--video', default=None)
  parser.add_argument('--frames', type=int, default=4,
                      help='frames for the synthetic clip (random-init mode)')
  parser.add_argument('--gate', type=float, default=PASS_GATE)
  parser.add_argument('--json', action='store_true',
                      help='emit a final machine-readable JSON line '
                           '(consumed by scripts/validate_release.py)')
  args = parser.parse_args()

  try:
    ref_encoders = _load_reference()
  except ImportError as e:
    print(f'SKIP: reference oracle not importable ({e})')
    if args.json:
      import json

      print(json.dumps({
          'harness': 'verify_parity', 'model': args.model,
          'pass': None, 'skip': f'oracle not importable: {e}'}))
    return 0

  import videoprism_tpu as vp
  from videoprism_tpu.models import clip as vclip
  from videoprism_tpu.models import registry

  if args.model in registry.MODEL_CONFIGS:
    config = vp.get_model_config(args.model)
    model = vp.get_model(args.model)
  elif args.model in registry.CONFIGS:
    # Internal config names (notably videoprism_lvt_v1_giant, which has
    # no public checkpoint and hence no MODEL_CONFIGS entry): build from
    # the CONFIGS table so the giant width — primer_hybrid norm policy,
    # D=1408 — is whole-architecture oracle-tested, not just unit-tested.
    config = dict(registry.CONFIGS[args.model])
    vocab = registry.TEXT_TOKENIZERS['c4_en']['vocab_size']
    config.setdefault('vocabulary_size', vocab)
    model = getattr(registry, args.model)()
  else:
    raise SystemExit(
        f'unknown model {args.model!r}; choose from '
        f'{sorted(set(registry.MODEL_CONFIGS) | set(registry.CONFIGS))}')
  assert isinstance(model.config, vclip.VideoCLIPConfig), (
      'parity harness currently compares the CLIP towers; use tests/ for '
      'the encoder/classifier families')

  ref_model = ref_encoders.FactorizedVideoCLIP(**config)

  # Inputs.
  if args.video:
    from videoprism_tpu.io import video as video_lib

    clip = video_lib.load_video(args.video, num_frames=16)[None]
  else:
    clip = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1), (1, args.frames, 288, 288, 3)))
  text_ids = np.array([[5, 9, 2, 0], [7, 1, 4, 8], [3, 3, 3, 0]], np.int32)
  text_paddings = np.array(
      [[0, 0, 1, 1], [0, 0, 0, 0], [0, 0, 0, 1]], np.float32)

  # Weights: checkpoint if given, else the reference module's random init.
  if args.checkpoint:
    import os

    if os.path.exists(args.checkpoint):
      state = vp.load_pretrained_weights(
          None, checkpoint_path=args.checkpoint)
    else:
      # Registry model name -> HuggingFace download (the
      # WEIGHTS-VALIDATION.md first-network-session recipe).
      state = vp.load_pretrained_weights(args.checkpoint)
    params = state['params'] if 'params' in state else state
  else:
    print('No checkpoint given: using reference random init '
          f'({args.frames}-frame synthetic clip).')
    variables = ref_model.init(
        jax.random.PRNGKey(0), clip[:, :1], text_ids, text_paddings)
    params = variables['params']

  t0 = time.time()
  ref_v, ref_t, _ = ref_model.apply(
      {'params': params}, clip, text_ids, text_paddings, train=False)
  print(f'reference forward: {time.time() - t0:.1f}s')

  t0 = time.time()
  got_v, got_t, _ = model.apply(params, clip, text_ids, text_paddings,
                                train=False)
  print(f'videoprism_tpu forward: {time.time() - t0:.1f}s')

  def report(name, a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    max_diff = np.abs(a - b).max()
    mean_diff = np.abs(a - b).mean()
    print(f'{name:22s} max|Δ| {max_diff:.3e}   mean|Δ| {mean_diff:.3e}')
    return max_diff

  diffs = [
      report('video embeddings', got_v, ref_v),
      report('text embeddings', got_t, ref_t),
      report('similarity matrix',
             np.asarray(got_v) @ np.asarray(got_t).T,
             np.asarray(ref_v) @ np.asarray(ref_t).T),
  ]
  worst = max(diffs)
  ok = worst < args.gate
  print(f'\n{"PASS" if ok else "FAIL"}: worst diff {worst:.3e} '
        f'(gate {args.gate:g}; reference repo used 1e-3)')
  if args.json:
    import json

    print(json.dumps({
        'harness': 'verify_parity', 'model': args.model,
        'checkpoint': args.checkpoint, 'worst_abs_diff': float(worst),
        'gate': args.gate, 'pass': bool(ok)}))
  return 0 if ok else 1


if __name__ == '__main__':
  sys.exit(main())
