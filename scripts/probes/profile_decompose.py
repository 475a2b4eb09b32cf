"""Decompose the forward pass into measured components (VERDICT r3 #7).

Where do the milliseconds go?  bench.py gives one e2e number and an MFU
(~0.74 at base); this probe attributes it: patch embed, spatial stack,
boundary kernels, temporal stack — then, inside one layer, the fused
attention block vs the FFN kernel vs a pure-matmul "MXU floor" built
from the exact same GEMM shapes.  The difference between a component sum
and the e2e time is inter-component dispatch/fusion seams; the
difference between a layer kernel and its matmul floor is VPU work
(LN/softmax/quantize) + layout overhead.  Output: one JSON with every
number, written to --out (commit as PROFILE_r{N}.json).

Methodology is bench.py's: every timed region chains ``iters`` passes
inside one jitted ``fori_loop`` with a vanishing data dependence (so XLA
cannot hoist), and a 4-byte scalar fetch forces execution — over the
axon tunnel ``block_until_ready`` does not block and per-dispatch RTT is
~25 ms.  Params are passed as jit ARGUMENTS (never closed over: baked
trees 413 the remote-compile endpoint at base scale).

Run on real TPU:  python scripts/probes/profile_decompose.py
CPU harness check (tiny geometry — interpret-mode Pallas at base scale
would take hours):  python scripts/probes/profile_decompose.py \
    --cpu-smoke --models tiny --batches 2
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, 'scripts'))

import jax  # noqa: E402


def _timed(fn, params, xs, iters: int, warmup: int = 2, runs: int = 3):
  """Median per-pass seconds for ``fn(params, *xs)`` chained on-device.

  The chain carries ``xs[0]`` and folds a vanishing function of each
  pass's output into one element of it — a real data dependence, so the
  ``iters`` passes serialize and cannot be hoisted, at ~zero added cost.
  """
  import jax.numpy as jnp
  import numpy as np

  @functools.partial(jax.jit, static_argnames=('n',))
  def chained(params, xs, n):
    def body(i, carry):
      acc, xs = carry
      out = fn(params, *xs)
      leaf = jax.tree_util.tree_leaves(out)[0]
      s = jnp.sum(leaf).astype(jnp.float32)
      x0 = xs[0]
      x0 = x0.at[(0,) * x0.ndim].add((s * 1e-30).astype(x0.dtype))
      return acc + s, (x0,) + tuple(xs[1:])

    acc, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros((), jnp.float32), tuple(xs)))
    return acc

  for _ in range(warmup):
    np.asarray(chained(params, xs, iters))
  times = []
  for _ in range(runs):
    t0 = time.perf_counter()
    np.asarray(chained(params, xs, iters))
    times.append((time.perf_counter() - t0) / iters)
  return statistics.median(times)


def _decompose(config_name: str, batch: int, num_frames: int,
               iters: int, interpret: bool, image_size: int = 288) -> dict:
  import jax.numpy as jnp
  import numpy as np

  from videoprism_tpu.models import factorized_encoder as fe
  from videoprism_tpu.models import init as init_lib
  from videoprism_tpu.models import registry
  from videoprism_tpu.ops import basic
  from videoprism_tpu.ops import embeddings as emb_lib
  from videoprism_tpu.ops import transformer as tf_lib

  if config_name == 'tiny':
    # Harness-check geometry (--cpu-smoke): real code paths, seconds of
    # wall clock.  Interpret-mode Pallas at base scale would take hours.
    from smoke_configs import TINY_ENC

    kwargs = dict(TINY_ENC)
  else:
    kwargs = dict(registry.CONFIGS[config_name])
  cfg = fe.FactorizedEncoderConfig(
      **kwargs, dtype=jnp.bfloat16,
      attention_impl='flash', kernel_interpret=interpret)
  params = jax.device_put(
      init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg))
  video = jax.device_put(jax.random.uniform(
      jax.random.PRNGKey(1),
      (batch, num_frames, image_size, image_size, 3), jnp.float32))
  b, t = batch, num_frames
  d = cfg.model_dim
  n = (image_size // cfg.patch_size) ** 2
  # RTT-fair chaining, same rule as bench.py: the ~25-37 ms tunnel
  # dispatch RTT divides by the chain length, so small batches chain
  # more passes.  At 16 fixed iters a b1 component reads +2.3 ms EACH —
  # five stage measurements then fabricate ~9 ms of negative "seam".
  iters = max(iters, 256 // max(1, batch))
  ms = lambda s: round(1000.0 * s, 3)
  rec: dict = {'config': config_name, 'batch': batch, 'frames': t,
               'tokens_per_frame': n, 'model_dim': d, 'iters': iters}

  # --- end to end ---------------------------------------------------
  full = lambda p, v: fe.apply(p, v, cfg, train=False)[0]
  rec['e2e_ms'] = ms(_timed(full, params, (video,), iters))

  # --- stage decomposition ------------------------------------------
  embed = lambda p, v: fe._embed_patches(p, v, cfg)[0]
  rec['patch_embed_ms'] = ms(_timed(embed, params, (video,), iters))

  patches = fe._embed_patches(params, video, cfg)[0]
  pos = emb_lib.trainable_positional_embedding(
      params['spatial_pos_emb'], n, dtype=cfg.dtype)
  patches = jax.device_put(np.asarray(patches + pos))

  spatial_cfg = cfg.vit_layer_config(cfg.num_spatial_layers)
  spatial = lambda p, x: fe.vision_transformer(
      p['spatial_encoder'], x, spatial_cfg, train=False)
  rec['spatial_stack_ms'] = ms(_timed(spatial, params, (patches,), iters))

  spatial_out = fe.vision_transformer(
      params['spatial_encoder'], patches, spatial_cfg, train=False)
  spatial_out = jax.device_put(np.asarray(spatial_out))

  from videoprism_tpu.ops.pallas import boundary as boundary_lib

  tpos = emb_lib.trainable_positional_embedding(
      params['temporal_pos_emb'], cfg.pos_emb_shape[0], dtype=cfg.dtype)
  if cfg.pos_emb_shape[0] != t:
    tpos = emb_lib.interpolate_emb_1d(tpos, t)
  tpos = jax.device_put(np.asarray(tpos))
  if boundary_lib.boundary_supported(n, t, d, 2):
    st = boundary_lib.spatial_to_temporal_vjp(b, t, interpret=interpret)
    b1 = lambda p, x, tp: st(
        x, basic.cast_floating(p['spatial_ln']['scale'], cfg.dtype),
        basic.cast_floating(p['spatial_ln']['bias'], cfg.dtype), tp)
    rec['boundary1_ms'] = ms(_timed(b1, params, (spatial_out, tpos), iters))
    temporal_in = st(
        spatial_out,
        basic.cast_floating(params['spatial_ln']['scale'], cfg.dtype),
        basic.cast_floating(params['spatial_ln']['bias'], cfg.dtype), tpos)
  else:
    rec['boundary1_ms'] = None
    x = basic.layer_norm(params['spatial_ln'], spatial_out, dtype=cfg.dtype)
    temporal_in = (x.reshape(b, t, n, d).transpose(0, 2, 1, 3)
                   .reshape(b * n, t, d) + tpos)
  temporal_in = jax.device_put(np.asarray(temporal_in))

  temporal_cfg = cfg.vit_layer_config(cfg.num_temporal_layers)
  temporal = lambda p, x: fe.vision_transformer(
      p['temporal_encoder'], x, temporal_cfg, train=False)
  rec['temporal_stack_ms'] = ms(
      _timed(temporal, params, (temporal_in,), iters))

  temporal_out = fe.vision_transformer(
      params['temporal_encoder'], temporal_in, temporal_cfg, train=False)
  temporal_out = jax.device_put(np.asarray(temporal_out))
  if boundary_lib.boundary_supported(n, t, d, 2):
    ts = boundary_lib.temporal_to_output_vjp(b, n, interpret=interpret)
    b2 = lambda p, x: ts(
        x, basic.cast_floating(p['temporal_ln']['scale'], cfg.dtype),
        basic.cast_floating(p['temporal_ln']['bias'], cfg.dtype))
    rec['boundary2_ms'] = ms(_timed(b2, params, (temporal_out,), iters))
  else:
    rec['boundary2_ms'] = None

  stages = [rec[k] for k in ('patch_embed_ms', 'spatial_stack_ms',
                             'boundary1_ms', 'temporal_stack_ms',
                             'boundary2_ms') if rec[k] is not None]
  rec['stage_sum_ms'] = round(sum(stages), 3)
  rec['seam_ms'] = round(rec['e2e_ms'] - rec['stage_sum_ms'], 3)

  # --- one spatial layer vs its MXU floor ---------------------------
  from videoprism_tpu.ops import masks as mask_lib

  layer_cfg = spatial_cfg
  # Scan-stacked weights carry a leading layer axis; slice layer 0.
  layer_params = jax.tree_util.tree_map(
      lambda x: x[0],
      params['spatial_encoder']['transformers_stack']['x_layers'])
  pads = jnp.zeros(patches.shape[:-1], patches.dtype)
  amask = mask_lib.attention_mask_for_fprop(patches, pads)
  one_layer = lambda p, x, pd, am: tf_lib.transformer_layer(
      p, x, pd, am, layer_cfg, train=False)
  rec['spatial_layer_ms'] = ms(
      _timed(one_layer, layer_params, (patches, pads, amask), iters))
  rec['spatial_layer_stack_share_ms'] = round(
      rec['spatial_stack_ms'] / cfg.num_spatial_layers, 3)

  # MXU floor: the exact GEMM shapes of one layer (qkv, out, ffn1, ffn2)
  # as bare dots — no LN, no softmax, no residuals, no kernel plumbing.
  f = cfg.mlp_dim
  k = jax.random.PRNGKey(2)
  w_qkv = jax.device_put(jax.random.normal(k, (d, 3 * d), jnp.bfloat16))
  w_out = jax.device_put(jax.random.normal(k, (d, d), jnp.bfloat16))
  w_up = jax.device_put(jax.random.normal(k, (d, f), jnp.bfloat16))
  w_dn = jax.device_put(jax.random.normal(k, (f, d), jnp.bfloat16))

  def mxu_floor(ws, x):
    qkv = x @ ws['qkv']
    o = qkv[..., :d] @ ws['out']
    h = o @ ws['up']
    y = h @ ws['dn']
    return y + x

  ws = {'qkv': w_qkv, 'out': w_out, 'up': w_up, 'dn': w_dn}
  rec['mxu_floor_layer_ms'] = ms(_timed(mxu_floor, ws, (patches,), iters))
  if rec['mxu_floor_layer_ms']:
    rec['layer_vpu_overhead_ratio'] = round(
        rec['spatial_layer_ms'] / rec['mxu_floor_layer_ms'], 3)

  # Attention-score matmuls (logits+context) excluded from the floor
  # above run at seq=n per frame; add them separately for the record.
  q4 = jax.device_put(jax.random.normal(
      k, (patches.shape[0], cfg.num_heads, n, d // cfg.num_heads),
      jnp.bfloat16))

  def attn_scores(q, kk):
    s = jnp.einsum('bhqd,bhkd->bhqk', q, kk)
    return jnp.einsum('bhqk,bhkd->bhqd', s, kk)

  rec['attn_scores_ms'] = ms(_timed(attn_scores, q4, (q4,), iters))
  return rec


def main() -> int:
  parser = argparse.ArgumentParser()
  parser.add_argument('--models', default='base,giant')
  parser.add_argument('--batches', default='1,32')
  parser.add_argument('--iters', type=int, default=16)
  parser.add_argument('--out', default=None,
                      help='JSON path (default PROFILE.json at repo root)')
  parser.add_argument('--cpu-smoke', action='store_true',
                      help='harness check on CPU: tiny iters, no claim '
                           'probe, interpret-mode kernels')
  args = parser.parse_args()

  if args.cpu_smoke:
    jax.config.update('jax_platforms', 'cpu')
    from videoprism_tpu.utils.compilation_cache import force_cpu

    force_cpu(1)
    args.iters = 2
  else:
    jax.config.update(
        'jax_compilation_cache_dir',
        os.environ.get('JAX_COMPILATION_CACHE_DIR',
                       os.path.expanduser('~/.cache/jax_comp_cache')))
    from smoke_configs import ensure_tpu_executes

    ensure_tpu_executes()

  out_path = args.out or os.path.join(_ROOT, 'PROFILE.json')
  payload = {'harness': 'profile_decompose', 'iters': args.iters,
             'platform': jax.devices()[0].platform, 'records': []}
  for model in args.models.split(','):
    if model == 'tiny':
      name, frames, size = 'tiny', 2, 12
    else:
      name = f'videoprism_v1_{model}'
      frames, size = (16, 288) if model == 'base' else (8, 288)
    for batch in [int(x) for x in args.batches.split(',')]:
      print(f'=== {model} b{batch}', flush=True)
      rec = _decompose(name, batch, frames, args.iters,
                       interpret=args.cpu_smoke, image_size=size)
      payload['records'].append(rec)
      print(json.dumps(rec), flush=True)
      with open(out_path, 'w') as f:
        json.dump(payload, f, indent=1)
        f.write('\n')
  print(json.dumps({'harness': 'profile_decompose', 'out': out_path,
                    'records': len(payload['records'])}))
  return 0


if __name__ == '__main__':
  sys.exit(main())
