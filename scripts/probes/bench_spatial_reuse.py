"""Hardware A/B: per-frame spatial reuse for overlapping long-video windows.

Times ``classify_long_video`` (base classifier geometry, bf16+flash) over a
synthetic long video at ``stride = window/2``, cached
(``reuse_spatial=True``: one spatial encode per frame +
temporal-stack-per-window) vs naive (full encoder per window).  Pairs are
interleaved A/B/A/B with per-pair deltas — this chip drifts ~10%
process-to-process, so never compare two separate loops
(scripts/probes/bench_seqgroup_ab.py is the template).

Run on the real TPU: ``python scripts/probes/bench_spatial_reuse.py``.
"""

import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')


def main():
  ap = argparse.ArgumentParser(description=__doc__)
  ap.add_argument('--frames', type=int, default=128)
  ap.add_argument('--window', type=int, default=16)
  ap.add_argument('--stride', type=int, default=8)
  ap.add_argument('--pairs', type=int, default=3)
  ap.add_argument('--size', type=int, default=288)
  args = ap.parse_args()

  from scripts.smoke_configs import ensure_tpu_executes
  ensure_tpu_executes()

  import jax.numpy as jnp
  from videoprism_tpu import streaming
  from videoprism_tpu.models import classifier as vc
  from videoprism_tpu.models import factorized_encoder as fe
  from videoprism_tpu.models import init as init_lib
  from videoprism_tpu.models import registry

  base = registry.MODEL_CONFIGS['videoprism_public_v1_base']
  enc_cfg = fe.FactorizedEncoderConfig(
      patch_size=base['patch_size'],
      pos_emb_shape=tuple(base['pos_emb_shape']),
      model_dim=base['model_dim'],
      num_spatial_layers=base['num_spatial_layers'],
      num_temporal_layers=base['num_temporal_layers'],
      num_heads=base['num_heads'],
      mlp_dim=base['mlp_dim'],
      atten_logit_cap=base['atten_logit_cap'],
      scan=True, attention_impl='flash', dtype=jnp.bfloat16)
  cfg = vc.VideoClassifierConfig(encoder=enc_cfg, num_classes=400)
  params = jax.device_put(
      init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16))
  frames = np.random.default_rng(0).integers(
      0, 256, (args.frames, args.size, args.size, 3)).astype(np.uint8)
  kw = dict(window=args.window, stride=args.stride, batch_windows=8)

  def run(reuse):
    t0 = time.perf_counter()
    logits = streaming.classify_long_video(
        params, cfg, frames, reuse_spatial=reuse, **kw)
    np.asarray(logits)  # host fetch = the only reliable sync on the tunnel
    return time.perf_counter() - t0, logits

  # Warmup both variants (compiles).
  _, la = run(True)
  _, lb = run(False)
  top_match = int(np.argmax(la)) == int(np.argmax(lb))
  cos = float(np.dot(la, lb) / (np.linalg.norm(la) * np.linalg.norm(lb)))

  deltas, times_a, times_b = [], [], []
  for _ in range(args.pairs):
    ta, _ = run(True)
    tb, _ = run(False)
    times_a.append(ta)
    times_b.append(tb)
    deltas.append(tb / ta)
  print(f'cached  (reuse_spatial=True):  {sorted(times_a)} s')
  print(f'naive   (reuse_spatial=False): {sorted(times_b)} s')
  print(f'paired speedups naive/cached: {[round(d, 3) for d in deltas]} '
        f'(median {np.median(deltas):.3f}x)')
  print(f'logits agree: top1_match={top_match} cos={cos:.6f}')


if __name__ == '__main__':
  main()
