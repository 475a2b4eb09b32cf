"""Micro-benchmark: fused-block vjp backward variants at spatial shapes.

Times the attention-block and FFN-block custom_vjp grad at the base
spatial-stack geometry ([B*T, 256, 768] sequences), comparing:
  * kernel-core backward (flash fwd+bwd kernels inside the twin)
  * composed-XLA backward (round-1 behavior)
plus forward-only for reference.  Run on the real TPU.
"""

from __future__ import annotations

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


def time_fn(fn, *args, iters=20, runs=5):
  @functools.partial(jax.jit, static_argnames=('n',))
  def chain(x, rest, n):
    def body(i, carry):
      acc, x = carry
      out = fn(x, *rest)
      s = jnp.sum(out[0] if isinstance(out, tuple) else out).astype(
          jnp.float32)
      x = x.at[(0,) * x.ndim].add(s * 1e-30)
      return acc + s, x

    acc, _ = jax.lax.fori_loop(0, n, body, (jnp.zeros((), jnp.float32), x))
    return acc

  x, rest = args[0], args[1:]
  for _ in range(2):
    np.asarray(chain(x, rest, iters))
  times = []
  for _ in range(runs):
    t0 = time.perf_counter()
    np.asarray(chain(x, rest, iters))
    times.append((time.perf_counter() - t0) / iters)
  return 1000 * statistics.median(times)


def main():
  import argparse

  parser = argparse.ArgumentParser(description=__doc__)
  parser.parse_args()  # no flags; --help documents the workload

  from videoprism_tpu.models import init as init_lib
  from videoprism_tpu.ops import masks as mask_lib
  from videoprism_tpu.ops import transformer as tfm
  from videoprism_tpu.ops.pallas import flash_attention as flash
  from videoprism_tpu.ops.pallas import transformer_block as tb

  dtype = jnp.bfloat16
  B, T, D, N, H, F = 32, 256, 768, 12, 64, 3072  # base spatial, b2x16f
  cfg = tfm.TransformerLayerConfig(
      num_layers=1, hidden_dim=F, num_heads=N, norm_policy='pre',
      activation='gelu', enable_per_dim_scale=False, logit_cap=50.0,
      dtype=dtype)
  params = init_lib._transformer_layer(jax.random.PRNGKey(0), D, cfg)
  params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)

  x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), dtype)
  mask = jnp.zeros((1, 1, T), jnp.float32)
  attnp = params['self_attention']
  flat_in = lambda p: (p['w'].reshape(D, N * H), p['b'].reshape(N * H))
  wq, bq = flat_in(attnp['query'])
  wk, bk = flat_in(attnp['key'])
  wv, bv = flat_in(attnp['value'])
  wo = jnp.transpose(attnp['post']['w'], (1, 2, 0)).reshape(N * H, D)
  args = (x, mask, params['layer_norm']['scale'],
          params['layer_norm']['bias'],
          wq, bq, wk, bk, wv, bv, wo, attnp['post']['b'])
  static = dict(num_heads=N, dim_per_head=H, logit_cap=50.0, epsilon=1e-6,
                query_scale=H ** -0.5)

  results = {}
  f = tb.attention_block_vjp(**static)
  results['attn_fwd'] = time_fn(f, *args)

  def grad_of(fn):
    return jax.grad(lambda x, *rest: jnp.sum(
        fn(x, *rest).astype(jnp.float32) ** 2))

  results['attn_vjp_kernel'] = time_fn(grad_of(f), *args)

  composed_twin = functools.partial(
      tb._composed_attention_block, **static, core='xla')
  results['attn_vjp_composed'] = time_fn(grad_of(composed_twin), *args)

  semi = functools.partial(
      tb._composed_attention_block, **static, core='kernel')
  results['attn_vjp_semifused_direct'] = time_fn(grad_of(semi), *args)

  # FFN block.
  ff = params['ff_layer']
  xr = x.reshape(B * T, D)
  pads = jnp.zeros((B * T, 1), dtype)
  fargs = (xr, pads, ff['layer_norm']['scale'], ff['layer_norm']['bias'],
           ff['ffn_layer1']['linear']['kernel'],
           ff['ffn_layer1']['linear']['bias'],
           ff['ffn_layer2']['linear']['kernel'],
           ff['ffn_layer2']['linear']['bias'])
  fk = tb.ffn_block_vjp('gelu', 1e-6, None)
  results['ffn_fwd'] = time_fn(fk, *fargs)
  results['ffn_vjp_kernel'] = time_fn(grad_of(fk), *fargs)
  composed_ffn = functools.partial(
      tb._composed_ffn_block, activation='gelu', epsilon=1e-6)
  results['ffn_vjp_composed'] = time_fn(grad_of(composed_ffn), *fargs)

  # Raw attention bwd kernel vs composed attention core vjp.
  q = jax.random.normal(jax.random.PRNGKey(2), (B, N, T, H), dtype)
  k = jax.random.normal(jax.random.PRNGKey(3), (B, N, T, H), dtype)
  v = jax.random.normal(jax.random.PRNGKey(4), (B, N, T, H), dtype)

  def core_bwd(q):
    dq, dk, dv = flash.fused_attention_bwd(
        q, k, v, mask, q, logit_cap=50.0)
    return dq + dk + dv

  results['attn_core_bwd_kernel'] = time_fn(core_bwd, q)

  def core_fwd(q):
    return flash.fused_attention(q, k, v, mask, logit_cap=50.0)

  results['attn_core_fwd_kernel'] = time_fn(core_fwd, q)

  print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == '__main__':
  main()
