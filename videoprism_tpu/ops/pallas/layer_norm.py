"""Pallas TPU fused LayerNorm.

Why: profiling the base encoder shows XLA's layernorm lowering (bf16 ->
convert -> f32 row reduction -> rsqrt -> scale/bias, emitted as
``convert_reduce_fusion`` kLoop fusions) costs ~2.7 ms per call at
[32768, 768] — over half the transformer-layer budget, ~100x off the VPU
roofline.  This kernel does the whole op in one VMEM pass: load a row block,
f32 mean/variance, normalize, apply the reference's (scale + 1.0) convention
(reference videoprism/layers.py:246-259) and bias, write back.

Numerics: reductions are f32 regardless of input dtype (slightly more
accurate than the XLA bf16 path, identical for f32 inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *,
               epsilon: float, direct_scale: bool):
  x = x_ref[:].astype(jnp.float32)  # [rows_blk, D]
  mean = jnp.mean(x, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
  normed = (x - mean) * jax.lax.rsqrt(var + epsilon)
  scale = scale_ref[:].astype(jnp.float32)
  if not direct_scale:
    scale = scale + 1.0
  out = normed * scale + bias_ref[:].astype(jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype)


def supports(rows: int, d: int) -> bool:
  return d % 128 == 0 and rows % 8 == 0


@functools.partial(
    jax.jit, static_argnames=('epsilon', 'direct_scale', 'interpret'))
def fused_layer_norm_2d(
    x: Array,      # [rows, D]
    scale: Array,  # [D]
    bias: Array,   # [D]
    *,
    epsilon: float = 1e-6,
    direct_scale: bool = False,
    interpret: bool = False,
) -> Array:
  rows, d = x.shape
  # Largest row block that divides rows and keeps the f32 working set
  # comfortably in VMEM.
  block = 8
  for candidate in (1024, 512, 256, 128, 64, 32, 16, 8):
    if rows % candidate == 0 and candidate * d * 4 <= 4 * 2**20:
      block = candidate
      break

  return pl.pallas_call(
      functools.partial(
          _ln_kernel, epsilon=epsilon, direct_scale=direct_scale),
      grid=(rows // block,),
      in_specs=[
          pl.BlockSpec((block, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((block, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel',)),
      interpret=interpret,
  )(x, scale, bias)


def _composed_layer_norm_2d(x, scale, bias, *, epsilon, direct_scale):
  """jnp twin of the kernel (for the custom_vjp backward)."""
  xf = x.astype(jnp.float32)
  mean = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
  normed = (xf - mean) * jax.lax.rsqrt(var + epsilon)
  s = scale.astype(jnp.float32)
  if not direct_scale:
    s = s + 1.0
  return (normed * s + bias.astype(jnp.float32)).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _ln_vjp(epsilon: float, direct_scale: bool, interpret: bool):
  def kernel_fwd(x, scale, bias):
    return fused_layer_norm_2d(
        x, scale, bias, epsilon=epsilon, direct_scale=direct_scale,
        interpret=interpret)

  f = jax.custom_vjp(kernel_fwd)
  f.defvjp(
      lambda x, s, b: (kernel_fwd(x, s, b), (x, s, b)),
      lambda res, g: jax.vjp(
          functools.partial(_composed_layer_norm_2d, epsilon=epsilon,
                            direct_scale=direct_scale), *res)[1](g),
  )
  return f


def fused_layer_norm(
    x: Array,      # [..., D]
    scale: Array,  # [D]
    bias: Array,   # [D]
    *,
    epsilon: float = 1e-6,
    direct_scale: bool = False,
    interpret: bool = False,
) -> Array:
  """Rank-agnostic wrapper: flattens leading dims into rows.  Trainable
  (custom_vjp with a composed backward)."""
  d = x.shape[-1]
  lead = x.shape[:-1]
  rows = 1
  for s in lead:
    rows *= s
  f = _ln_vjp(epsilon, direct_scale, interpret)
  return f(x.reshape(rows, d), scale, bias).reshape(*lead, d)
