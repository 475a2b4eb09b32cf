"""Microbench: the shipped W8A8 int8 FFN block vs the bf16 chunked FFN.

Calls the production kernels (ops/pallas/int8_blocks.py,
ops/pallas/transformer_block.py) and the production quantizer
(quantization.py) — no local kernel copies, so it always measures what
serves.  Historical note (docs/DESIGN.md): int8 pays in the
weight-streaming-bound regime — giant batch-1 measured -36%/layer-half,
batch-8 neutral at this geometry.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')

from videoprism_tpu import quantization
from videoprism_tpu.ops.pallas import int8_blocks as i8
from videoprism_tpu.ops.pallas import transformer_block as tb


def time_fn(f, *args, iters=20):
  # Python-loop dispatches carry ~1 ms/call of tunnel overhead (see
  # CLAUDE.md); ABSOLUTE numbers here are inflated by that constant —
  # deltas between variants remain valid.  Whole-model truth comes from
  # bench.py's lax.fori_loop chaining.
  np.asarray(jnp.sum(f(*args).astype(jnp.float32)))
  t = time.perf_counter()
  for _ in range(iters):
    out = f(*args)
  np.asarray(jnp.sum(out.astype(jnp.float32)))
  return (time.perf_counter() - t) / iters


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--rows', type=int, default=2048)   # b8 x 256 (giant)
  p.add_argument('--d', type=int, default=1408)
  p.add_argument('--f', type=int, default=6144)
  args = p.parse_args()
  rows, d, f = args.rows, args.d, args.f

  ks = jax.random.split(jax.random.PRNGKey(0), 5)
  x = (jax.random.normal(ks[0], (rows, d)) * 0.5).astype(jnp.bfloat16)
  pads = jnp.zeros((rows, 1), jnp.bfloat16)
  ln_s = jax.random.normal(ks[1], (d,)).astype(jnp.bfloat16) * 0.1
  ln_b = jax.random.normal(ks[2], (d,)).astype(jnp.bfloat16) * 0.1
  ff = {'layer_norm': {'scale': ln_s, 'bias': ln_b},
        'ffn_layer1': {'linear': {
            'kernel': (jax.random.normal(ks[3], (d, f)) * d ** -0.5
                       ).astype(jnp.bfloat16),
            'bias': jnp.zeros((f,), jnp.bfloat16)}},
        'ffn_layer2': {'linear': {
            'kernel': (jax.random.normal(ks[4], (f, d)) * f ** -0.5
                       ).astype(jnp.bfloat16),
            'bias': jnp.zeros((d,), jnp.bfloat16)}}}

  # Mirror the production dispatch: monolithic kernel when the weights
  # fit, F-chunked otherwise (ops/transformer.py _try_fused_layer).
  if tb.ffn_block_supported(rows, d, f, 2):
    bf16_chunks = 1
    bf16_fn = jax.jit(lambda x: tb.fused_ffn_block(
        x, pads, ln_s, ln_b,
        ff['ffn_layer1']['linear']['kernel'],
        ff['ffn_layer1']['linear']['bias'],
        ff['ffn_layer2']['linear']['kernel'],
        ff['ffn_layer2']['linear']['bias'],
        activation='gelu'))
  else:
    bf16_chunks = tb.ffn_chunks_for(rows, d, f, 2)
    assert bf16_chunks is not None, (rows, d, f)
    bf16_fn = jax.jit(lambda x: tb.fused_ffn_block_chunked(
        x, pads, ln_s, ln_b,
        ff['ffn_layer1']['linear']['kernel'],
        ff['ffn_layer1']['linear']['bias'],
        ff['ffn_layer2']['linear']['kernel'],
        ff['ffn_layer2']['linear']['bias'],
        chunks=bf16_chunks, activation='gelu'))
  t_bf16 = time_fn(bf16_fn, x)

  qff = quantization.quantize_for_serving({'ff_layer': ff})['ff_layer']
  int8_chunks = i8.ffn_int8_chunks_for(rows, d, f, 2)
  assert int8_chunks is not None, (rows, d, f)
  int8_fn = jax.jit(lambda x: i8.int8_ffn_block_chunked(
      x, pads, ln_s, ln_b,
      qff['ffn_layer1']['linear']['kernel'],
      qff['ffn_layer1']['linear']['kernel_scale'].astype(jnp.float32),
      qff['ffn_layer1']['linear']['bias'],
      qff['ffn_layer2']['linear']['kernel'],
      qff['ffn_layer2']['linear']['kernel_scale'].astype(jnp.float32),
      qff['ffn_layer2']['linear']['bias'],
      chunks=int8_chunks, activation='gelu'))
  t_int8 = time_fn(int8_fn, x)

  rf = np.asarray(bf16_fn(x), np.float32).ravel()
  gf = np.asarray(int8_fn(x), np.float32).ravel()
  cos = float(np.dot(rf, gf) / (np.linalg.norm(rf) * np.linalg.norm(gf)))

  print(f'bf16 chunked ({bf16_chunks}): {t_bf16*1e3:.3f} ms')
  print(f'int8 chunked ({int8_chunks}): {t_int8*1e3:.3f} ms '
        f'({t_bf16/t_int8:.2f}x)')
  print(f'cosine(int8, bf16) = {cos:.6f}')


if __name__ == '__main__':
  main()
