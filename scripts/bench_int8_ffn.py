"""Prototype: W8A8 int8 FFN block kernel vs the bf16 chunked FFN.

Measures whether int8 (same MXU rate on this chip, measured — the win is
purely halved weight streaming + halved weight VMEM enabling fewer
chunks) pays at the giant geometry where weights dominate HBM traffic.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videoprism_tpu.ops.pallas import transformer_block as tb


def _ln(x, scale, bias, eps=1e-6):
  xf = x.astype(jnp.float32)
  mean = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
  return ((xf - mean) * jax.lax.rsqrt(var + eps)
          * (scale.astype(jnp.float32) + 1.0) + bias.astype(jnp.float32))


def _quant_rows(h):
  s = jnp.max(jnp.abs(h), axis=-1, keepdims=True) * (1.0 / 127.0)
  s = jnp.maximum(s, 1e-12)
  q = jnp.clip(jnp.round(h / s), -127.0, 127.0).astype(jnp.int8)
  return q, s


def _ffn_int8_chunk_kernel(
    x_ref, resid_ref, ln_s_ref, ln_b_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, o_ref, *,
    add_bias2: bool):
  x = x_ref[:]
  h = _ln(x, ln_s_ref[:], ln_b_ref[:])
  h8, hs = _quant_rows(h)
  acc = jax.lax.dot_general(
      h8, w1_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.int32)
  a = acc.astype(jnp.float32) * hs * s1_ref[:].astype(jnp.float32)
  a = a + b1_ref[:].astype(jnp.float32)
  a = tb._apply_activation(a, 'gelu', out_dtype=x.dtype)
  a8, as_ = _quant_rows(a)
  acc2 = jax.lax.dot_general(
      a8, w2_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.int32)
  out = acc2.astype(jnp.float32) * as_ * s2_ref[:].astype(jnp.float32)
  if add_bias2:
    out = out + b2_ref[:].astype(jnp.float32)
  out = out + resid_ref[:].astype(jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype)


def quantize_cols(w):
  """Per-output-channel symmetric int8: returns (w8, scale[out])."""
  s = np.max(np.abs(np.asarray(w, np.float32)), axis=0) / 127.0
  s = np.maximum(s, 1e-12)
  w8 = np.clip(np.round(np.asarray(w, np.float32) / s), -127, 127)
  return jnp.asarray(w8, jnp.int8), jnp.asarray(s, jnp.float32)


def int8_ffn_chunked(x, ln_s, ln_b, w1_8, s1, b1, w2_8, s2, b2, *, chunks):
  rows, d = x.shape
  f = w1_8.shape[1]
  fc = f // chunks
  block = 256
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  rowspec = pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
  out = x
  for c in range(chunks):
    w1c = jax.lax.slice_in_dim(w1_8, c * fc, (c + 1) * fc, axis=1)
    s1c = jax.lax.slice_in_dim(s1, c * fc, (c + 1) * fc, axis=0)
    b1c = jax.lax.slice_in_dim(b1, c * fc, (c + 1) * fc, axis=0)
    w2c = jax.lax.slice_in_dim(w2_8, c * fc, (c + 1) * fc, axis=0)
    out = pl.pallas_call(
        functools.partial(_ffn_int8_chunk_kernel, add_bias2=(c == 0)),
        grid=(rows // block,),
        in_specs=[rowspec, rowspec, vec(ln_s), vec(ln_b),
                  mat(w1c), vec(s1c), vec(b1c),
                  mat(w2c), vec(s2), vec(b2)],
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
    )(x, out, ln_s, ln_b, w1c, s1c, b1c, w2c, s2, b2)
  return out


def time_fn(f, *args, iters=20):
  out = f(*args)
  np.asarray(jnp.sum(out.astype(jnp.float32)))
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
  p.add_argument('--int8-chunks', type=int, default=2)
  args = p.parse_args()
  rows, d, f = args.rows, args.d, args.f

  key = jax.random.PRNGKey(0)
  ks = jax.random.split(key, 8)
  x = (jax.random.normal(ks[0], (rows, d)) * 0.5).astype(jnp.bfloat16)
  pads = jnp.zeros((rows, 1), jnp.bfloat16)
  ln_s = jax.random.normal(ks[1], (d,)).astype(jnp.bfloat16) * 0.1
  ln_b = jax.random.normal(ks[2], (d,)).astype(jnp.bfloat16) * 0.1
  w1 = (jax.random.normal(ks[3], (d, f)) * (d ** -0.5)).astype(jnp.bfloat16)
  b1 = jnp.zeros((f,), jnp.bfloat16)
  w2 = (jax.random.normal(ks[4], (f, d)) * (f ** -0.5)).astype(jnp.bfloat16)
  b2 = jnp.zeros((d,), jnp.bfloat16)

  bf16_chunks = tb.ffn_chunks_for(rows, d, f, 2)
  print(f'bf16 chunks: {bf16_chunks}')
  bf16_fn = jax.jit(lambda *a: tb.fused_ffn_block_chunked(
      *a, chunks=bf16_chunks, activation='gelu'))
  t_bf16 = time_fn(bf16_fn, x, pads, ln_s, ln_b, w1, b1, w2, b2)

  w1_8, s1 = quantize_cols(w1)
  w2_8, s2 = quantize_cols(w2)
  int8_fn = jax.jit(functools.partial(int8_ffn_chunked,
                                      chunks=args.int8_chunks))
  t_int8 = time_fn(int8_fn, x, ln_s, ln_b, w1_8, s1,
                   b1.astype(jnp.float32), w2_8, s2,
                   b2.astype(jnp.float32))

  ref = bf16_fn(x, pads, ln_s, ln_b, w1, b1, w2, b2)
  got = int8_fn(x, ln_s, ln_b, w1_8, s1, b1.astype(jnp.float32),
                w2_8, s2, b2.astype(jnp.float32))
  rf = np.asarray(ref, np.float32).ravel()
  gf = np.asarray(got, np.float32).ravel()
  cos = float(np.dot(rf, gf) / (np.linalg.norm(rf) * np.linalg.norm(gf)))

  print(f'bf16 chunked ({bf16_chunks}): {t_bf16*1e3:.3f} ms')
  print(f'int8 chunked ({args.int8_chunks}): {t_int8*1e3:.3f} ms '
        f'({t_bf16/t_int8:.2f}x)')
  print(f'cosine(int8, bf16) = {cos:.6f}')


if __name__ == '__main__':
  main()
