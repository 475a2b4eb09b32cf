"""lvt CLIP / classifier throughput benchmark (real TPU).

Same methodology as bench.py (K forwards chained in one jitted fori_loop
with a data dependence into the input(s), scalar fetch to force
execution): reports clips/s and per-pass latency for bf16 and the int8
serving path.  ``--model classifier_{base,large,giant}`` benches the
video classifier (encoder + pooler + head) instead of an lvt dual tower.

  python scripts/bench_clip.py [--model videoprism_lvt_public_v1_base]
      [--clips 4] [--frames 16] [--texts 4] [--quantize int8]
  python scripts/bench_clip.py --model classifier_base --num-classes 10
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--model', default='videoprism_lvt_public_v1_base')
  parser.add_argument('--clips', type=int, default=4)
  parser.add_argument('--frames', type=int, default=16)
  parser.add_argument('--texts', type=int, default=4)
  parser.add_argument('--text-len', type=int, default=64)
  parser.add_argument('--dtype', default='bfloat16',
                      choices=['bfloat16', 'float32'])
  parser.add_argument('--attention', default='auto',
                      choices=['auto', 'xla', 'flash'])
  parser.add_argument('--quantize', default='none', choices=['none', 'int8'])
  parser.add_argument('--num-classes', type=int, default=10,
                      help='classifier head width (classifier_* models)')
  parser.add_argument('--runs', type=int, default=3)
  parser.add_argument('--warmup', type=int, default=2)
  parser.add_argument('--iters', type=int, default=0,
                      help='forwards chained per timed run; 0 = auto, '
                           'max(8, 256 // clips) — same RTT-amortization '
                           'rule as bench.py so small workloads do not '
                           'under-read by the ~25 ms tunnel dispatch RTT')
  args = parser.parse_args()
  if not args.iters:
    args.iters = max(8, 256 // max(1, args.clips))

  import videoprism_tpu as vp
  from videoprism_tpu.models import clip as vclip
  from videoprism_tpu.models import init as init_lib

  platform = jax.devices()[0].platform
  attention = args.attention
  if attention == 'auto':
    attention = 'flash' if platform == 'tpu' else 'xla'
  dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32

  is_classifier = args.model.startswith('classifier_')
  if is_classifier:
    from videoprism_tpu.models import registry

    size = args.model.removeprefix('classifier_')
    builder = {'base': registry.videoprism_vc_v1_base,
               'large': registry.videoprism_vc_v1_large,
               'giant': registry.videoprism_vc_v1_giant}[size]
    model = vp.get_model(None, model_fn=lambda: builder(args.num_classes),
                         fprop_dtype=dtype, attention_impl=attention)
    cfg = model.config
    params = model._unwrap(model.init(jax.random.PRNGKey(0)))
  else:
    model = vp.get_model(args.model, fprop_dtype=dtype,
                         attention_impl=attention)
    cfg = model.config
    assert isinstance(cfg, vclip.VideoCLIPConfig), args.model
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
  if args.quantize == 'int8':
    from videoprism_tpu import quantization

    params = quantization.quantize_for_serving(params)
  params = jax.device_put(params)

  video = jax.device_put(jax.random.uniform(
      jax.random.PRNGKey(1),
      (args.clips, args.frames, 288, 288, 3), jnp.float32))
  vocab = getattr(cfg, 'vocabulary_size', 4)  # classifier: unused dummy
  ids = jax.device_put(jax.random.randint(
      jax.random.PRNGKey(2), (args.texts, args.text_len),
      3, vocab, jnp.int32))
  pads = jax.device_put(jnp.zeros((args.texts, args.text_len), jnp.float32))

  @functools.partial(jax.jit, static_argnames=('iters',))
  def forward_n(params, video, ids, pads, iters: int):
    def body(i, carry):
      acc, vid, tids = carry
      if is_classifier:
        from videoprism_tpu.models import classifier as vc_mod

        logits, _ = vc_mod.apply(params, vid, cfg, train=False)
        s = jnp.sum(logits[0]).astype(jnp.float32)
      else:
        v_emb, t_emb, _ = vclip.apply(params, vid, tids, pads, cfg,
                                      train=False)
        s = (jnp.sum(v_emb[0]) + jnp.sum(t_emb[0])).astype(jnp.float32)
        # Data dependence into BOTH towers so neither is hoisted out of
        # the loop (s*0.0 cannot be constant-folded: 0*NaN != 0).
        tids = tids.at[0, 0].add((s * 0.0).astype(jnp.int32))
      vid = vid.at[0, 0, 0, 0, 0].add(s * 1e-30)
      return acc + s, vid, tids

    acc, _, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((), jnp.float32), video, ids))
    return acc

  for _ in range(max(1, args.warmup)):
    np.asarray(forward_n(params, video, ids, pads, args.iters))
  times = []
  for _ in range(args.runs):
    t0 = time.perf_counter()
    np.asarray(forward_n(params, video, ids, pads, args.iters))
    times.append((time.perf_counter() - t0) / args.iters)
  per_pass = statistics.median(times)
  workload = f'{args.clips}x{args.frames}x288x288'
  if is_classifier:
    workload += f' -> {args.num_classes} classes'
  else:
    workload += f' + {args.texts} texts'
  print(json.dumps({
      'metric': 'clips_per_sec' if is_classifier else 'clip_pairs_per_sec',
      'model': args.model,
      'workload': workload,
      'clips_per_sec': round(args.clips / per_pass, 3),
      'per_pass_ms': round(1000 * per_pass, 2),
      'platform': platform, 'dtype': args.dtype,
      'attention': attention, 'quantize': args.quantize,
  }))


if __name__ == '__main__':
  main()
