#!/usr/bin/env python
"""Environment diagnostic: one command that says why it isn't working.

Runs every load-bearing dependency of this stack through a quick probe
and prints PASS/WARN/FAIL per check:

  * device inventory AND a real tiny execution under a deadline — the
    axon/TPU claim can be held elsewhere, and `jax.devices()` may LIST
    the chip while execution hangs in the claim-retry loop; only an
    executed op proves the chip (the failure mode behind
    smoke_configs.ensure_tpu_executes)
  * compilation cache configuration (cold compiles are minutes without)
  * the native tier: C++ tokenizer + FFmpeg video decoder build/load
  * bundled assets: demo mp4 decodes, SPM fixture produces golden ids
  * tokenizer configuration for real lvt models ($VIDEOPRISM_SPM_PATH)
  * registry + a tiny end-to-end forward on the active backend

Exit codes: 0 all pass (warnings allowed), 75 the TPU claim is
unavailable (retry later — the preemption convention), 1 hard failure.

  python scripts/doctor.py            # probe the default (TPU) backend
  python scripts/doctor.py --cpu      # probe the CPU path only
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import threading
import time

CLAIM_UNAVAILABLE = object()


def check_versions():
  import jax
  import numpy as np

  parts = [f'python {sys.version.split()[0]}', f'jax {jax.__version__}',
           f'numpy {np.__version__}']
  for mod in ('optax', 'orbax.checkpoint', 'ml_dtypes'):
    try:
      m = __import__(mod, fromlist=['__version__'])
      parts.append(f"{mod.split('.')[0]} {getattr(m, '__version__', '?')}")
    except ImportError:
      parts.append(f'{mod} MISSING')
  return 'PASS', ', '.join(parts)


def check_devices(timeout_s: float):
  """Device list AND a real execution — listing alone proves nothing."""
  result: dict = {}
  done = threading.Event()

  def probe():
    import jax
    import jax.numpy as jnp
    import numpy as np

    devs = jax.devices()
    result['devices'] = f'{len(devs)}x {devs[0].platform}'
    t0 = time.monotonic()
    np.asarray(jnp.sum(jnp.ones((8, 8), jnp.float32)))
    result['exec_ms'] = (time.monotonic() - t0) * 1e3
    done.set()

  t = threading.Thread(target=probe, daemon=True)
  t.start()
  if not done.wait(timeout_s):
    listed = result.get('devices', 'nothing listed yet')
    return CLAIM_UNAVAILABLE, (
        f'no execution within {timeout_s:.0f}s ({listed}) — the TPU '
        'claim is likely held by another process; retry later (a '
        'listed device does NOT mean an available one)')
  return 'PASS', (f"{result['devices']}, tiny op executed in "
                  f"{result['exec_ms']:.0f} ms")


def check_compile_cache():
  import jax

  configured = jax.config.jax_compilation_cache_dir
  env = os.environ.get('JAX_COMPILATION_CACHE_DIR')
  path = configured or env
  if not path:
    return 'WARN', ('no compilation cache configured — every process '
                    'pays cold compiles (minutes over the tunnel); '
                    "set jax_compilation_cache_dir (bench/serve CLIs "
                    'do this themselves)')
  try:
    os.makedirs(path, exist_ok=True)
    probe = os.path.join(path, '.doctor_probe')
    open(probe, 'w').close()
    os.unlink(probe)
  except OSError as e:
    return 'FAIL', f'cache dir {path} not writable: {e}'
  return 'PASS', path


def check_native_tokenizer():
  from videoprism_tpu import native

  lib = native.load_tokenizer_lib()
  if lib is None:
    return 'WARN', (f'C++ tokenizer core unavailable '
                    f'({native._lib_error}); the pure-Python runtime '
                    'serves instead (slower, same outputs)')
  return 'PASS', 'built + loaded'


def check_native_decoder():
  from videoprism_tpu import native

  lib = native.load_video_lib()
  if lib is None:
    return 'WARN', (f'native FFmpeg decoder unavailable '
                    f'({native.video_lib_error()}); cv2 fallback '
                    'serves (7.5x slower decode)')
  return 'PASS', 'built + loaded'


def check_assets():
  import numpy as np

  from videoprism_tpu import assets
  from videoprism_tpu.io import video as video_io
  from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

  clip = video_io.load_video(assets.demo_video_path(), num_frames=2,
                             target_size=64)
  if clip.shape != (2, 64, 64, 3) or not np.isfinite(clip).all():
    return 'FAIL', f'demo video decoded to {clip.shape}'
  tok = SentencePieceTokenizer(assets.test_spm_path())
  # Golden from tests/test_bundled_assets.py (our own fixture, not the
  # reference's — different vocab, different ids).
  ids = tok.to_int('hello world.')
  if ids != [277, 645, 710, 425, 752]:
    return 'FAIL', f'SPM fixture golden ids mismatch: {ids}'
  return 'PASS', 'demo mp4 decodes, SPM fixture goldens match'


def check_tokenizer_config():
  from videoprism_tpu import assets

  try:
    path = assets.resolve_tokenizer_path(None)
  except ValueError:
    return 'WARN', ('$VIDEOPRISM_SPM_PATH unset — real lvt models need '
                    'the 32k c4_en.model (smoke modes use the bundled '
                    'fixture automatically)')
  if not os.path.exists(path):
    return 'FAIL', f'$VIDEOPRISM_SPM_PATH={path} does not exist'
  return 'PASS', path


def check_weights():
  import videoprism_tpu as vp

  hits = []
  for name in vp.CHECKPOINTS:
    for suffix in ('.safetensors', '.npz', '_mlx.safetensors', '_mlx.npz'):
      if os.path.exists(os.path.join('weights', name + suffix)):
        hits.append(name)
        break
  if not hits:
    return 'WARN', ('no local weight files (weights/<model>.npz) — '
                    'forwards use random init or explicit --checkpoint '
                    'paths; see WEIGHTS-VALIDATION.md for the download '
                    'recipe')
  return 'PASS', f'{len(hits)} checkpoint(s) in weights/: {hits}'


def check_tiny_forward(timeout_s: float):
  done = threading.Event()
  result = {}

  def probe():
    import jax
    import numpy as np

    import videoprism_tpu as vp
    from videoprism_tpu.models import factorized_encoder as fe
    from videoprism_tpu.models import init as init_lib

    cfg = fe.FactorizedEncoderConfig(
        patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
        num_spatial_layers=2, num_temporal_layers=1, num_heads=2,
        mlp_dim=32, atten_logit_cap=50.0, scan=True)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    state = model.init(jax.random.PRNGKey(0))
    t0 = time.monotonic()
    emb, _ = model.apply(state, np.zeros((1, 2, 12, 12, 3), np.float32),
                         train=False)
    result['finite'] = bool(np.isfinite(np.asarray(emb)).all())
    result['ms'] = (time.monotonic() - t0) * 1e3
    done.set()

  t = threading.Thread(target=probe, daemon=True)
  t.start()
  if not done.wait(timeout_s):
    return 'FAIL', f'tiny encoder forward did not finish in {timeout_s:.0f}s'
  if not result['finite']:
    return 'FAIL', 'non-finite output'
  return 'PASS', (f"tiny encoder forward OK "
                  f"({result['ms']:.0f} ms incl. compile)")


def main() -> int:
  parser = argparse.ArgumentParser()
  parser.add_argument('--cpu', action='store_true',
                      help='probe the CPU backend instead of the TPU')
  parser.add_argument('--timeout', type=float, default=180.0,
                      help='deadline for the device-execution probe '
                           '(claim acquisition alone can take ~50s '
                           'under contention)')
  args = parser.parse_args()

  if args.cpu:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    force_cpu(1)

  checks = [
      ('versions', check_versions),
      ('devices + execution', lambda: check_devices(args.timeout)),
      ('compilation cache', check_compile_cache),
      ('native tokenizer', check_native_tokenizer),
      ('native video decoder', check_native_decoder),
      ('bundled assets', check_assets),
      ('tokenizer config', check_tokenizer_config),
      ('local weights', check_weights),
      ('tiny forward', lambda: check_tiny_forward(max(args.timeout, 300))),
  ]
  claim_unavailable = False
  failed = False
  for name, fn in checks:
    try:
      status, detail = fn()
    except Exception as e:  # a probe crashing IS the diagnostic
      status, detail = 'FAIL', f'{type(e).__name__}: {e}'
    if status is CLAIM_UNAVAILABLE:
      claim_unavailable = True
      status = 'WARN'
    failed |= status == 'FAIL'
    print(f'[{status:4s}] {name}: {detail}', flush=True)
    if claim_unavailable and name == 'devices + execution':
      print('[skip] remaining device-dependent checks (no executable '
            'device)', flush=True)
      break
  if claim_unavailable:
    print('verdict: TPU claim unavailable — retry later (exit 75)')
    return 75
  if failed:
    print('verdict: FAIL')
    return 1
  print('verdict: ok')
  return 0


if __name__ == '__main__':
  sys.exit(main())
