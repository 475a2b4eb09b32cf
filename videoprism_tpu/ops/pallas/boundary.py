"""Fused inter-stack boundary kernels for the factorized encoder.

Between the spatial and temporal stacks the encoder does
``spatial_ln -> regroup (b t) n d -> (b n) t d -> + temporal pos-emb``,
and after the temporal stack ``temporal_ln -> regroup (b n) t d ->
b (t n) d`` (reference videoprism/encoders.py:458-580).  Composed, each
boundary costs ~3 full HBM round trips of the activation (the Pallas LN
kernel is opaque to XLA, so the regroup transpose cannot fuse into it).
These kernels do LN + axis swap (+ optional positional-embedding add) in
ONE pass: one activation read, one write.

Layout: the grid walks (batch, N-blocks); each program holds the FULL
frame axis T for a block of N tokens (Mosaic requires the last two block
dims 8/128-aligned or full, so T rides inside the block) and the T<->N
swap is a statically unrolled loop of [nb, D] slice copies — no
in-register shuffles, T is <= 16 at every production shape.

Numerics match ``ops.basic.layer_norm`` exactly: fp32 statistics,
(scale+1) semantics, eps 1e-6 (reference videoprism/layers.py:214-260).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Same fp32/(scale+1) LN as the block kernels; works on refs and arrays
# alike (``a[:]`` is a full slice for both).
from videoprism_tpu.ops.pallas.transformer_block import _ln_f32 as _ln_rows

Array = jax.Array


def _st_kernel(x_ref, s_ref, b_ref, pos_ref, o_ref, *, epsilon: float):
  """x [1, T, nb, D] -> o [1, nb, T, D]: LN + pos-emb add + T<->N swap.

  One whole-block LN (Mosaic's stack allocator does not reuse
  per-iteration temporaries across an unrolled loop, so per-frame LNs
  blow scoped VMEM), then T statically unrolled strided slice stores."""
  _, t, nb, d = x_ref.shape
  y = _ln_rows(x_ref[0].reshape(t * nb, d), s_ref, b_ref, epsilon)
  y = y.reshape(t, nb, d)
  for j in range(t):  # static unroll; T <= 16 at every production shape
    o_ref[0, :, j, :] = (
        y[j] + pos_ref[j].astype(jnp.float32)).astype(o_ref.dtype)


def _ts_kernel(x_ref, s_ref, b_ref, o_ref, *, epsilon: float):
  """x [1, nb, T, D] -> o [1, T, nb, D]: LN + T<->N swap."""
  _, nb, t, d = x_ref.shape
  y = _ln_rows(x_ref[0].reshape(nb * t, d), s_ref, b_ref, epsilon)
  y = y.astype(o_ref.dtype).reshape(nb, t, d)
  for j in range(t):
    o_ref[0, j] = y[:, j, :]


def _n_block(n: int, t: int, d: int, itemsize: int) -> int | None:
  # Per-element kernel-stack bytes: three fp32 LN temporaries (x, normed,
  # scaled result) plus the cast value and the unrolled slice copies at
  # the activation itemsize (scoped-VMEM limited, ~16 MB).
  per_elem = 12 + 2 * itemsize
  for block in (256, 128, 64, 32, 16, 8):
    if n % block:
      continue
    if block * t * d * per_elem <= 8 * 2**20:
      return block
  return None


def boundary_supported(n: int, t: int, d: int, itemsize: int) -> bool:
  return (d % 128 == 0 and t <= 64
          and _n_block(n, t, d, itemsize) is not None)


@functools.partial(jax.jit, static_argnames=('b', 't', 'epsilon',
                                             'interpret'))
def spatial_to_temporal(
    features: Array,   # [B*T, N, D] spatial-stack output
    ln_scale: Array, ln_bias: Array,   # [D] spatial_ln
    pos_emb: Array,    # [T, D] (or [1, T, D]) temporal positional embedding
    *,
    b: int, t: int,
    epsilon: float = 1e-6,
    interpret: bool = False,
) -> Array:
  """LN + regroup ``(b t) n d -> (b n) t d`` + pos-emb add, one pass."""
  bt, n, d = features.shape
  assert bt == b * t
  pos_emb = pos_emb.reshape(-1, pos_emb.shape[-1])
  assert pos_emb.shape == (t, d), pos_emb.shape
  blk = _n_block(n, t, d, features.dtype.itemsize)
  x = features.reshape(b, t, n, d)
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i, j: (0,),
                               memory_space=pltpu.VMEM)
  out = pl.pallas_call(
      functools.partial(_st_kernel, epsilon=epsilon),
      grid=(b, n // blk),
      in_specs=[
          pl.BlockSpec((1, t, blk, d), lambda i, j: (i, 0, j, 0),
                       memory_space=pltpu.VMEM),
          vec(ln_scale), vec(ln_bias),
          pl.BlockSpec((t, d), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, blk, t, d), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, n, t, d), features.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary', 'arbitrary')),
      interpret=interpret,
  )(x, ln_scale, ln_bias, pos_emb)
  return out.reshape(b * n, t, d)


@functools.partial(jax.jit, static_argnames=('b', 'n', 'epsilon',
                                             'interpret'))
def temporal_to_output(
    features: Array,   # [B*N, T, D] temporal-stack output
    ln_scale: Array, ln_bias: Array,   # [D] temporal_ln
    *,
    b: int, n: int,
    epsilon: float = 1e-6,
    interpret: bool = False,
) -> Array:
  """LN + regroup ``(b n) t d -> b (t n) d``, one pass."""
  bn, t, d = features.shape
  assert bn == b * n
  blk = _n_block(n, t, d, features.dtype.itemsize)
  x = features.reshape(b, n, t, d)
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i, j: (0,),
                               memory_space=pltpu.VMEM)
  out = pl.pallas_call(
      functools.partial(_ts_kernel, epsilon=epsilon),
      grid=(b, n // blk),
      in_specs=[
          pl.BlockSpec((1, blk, t, d), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM),
          vec(ln_scale), vec(ln_bias),
      ],
      out_specs=pl.BlockSpec((1, t, blk, d), lambda i, j: (i, 0, j, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, t, n, d), features.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary', 'arbitrary')),
      interpret=interpret,
  )(x, ln_scale, ln_bias)
  return out.reshape(b, t * n, d)


# --- Trainability: composed twins + custom_vjp (the kernels have no
# transpose rules; the twins are exactly the composed encoder glue).


def _composed_st(features, ln_scale, ln_bias, pos_emb, *, b, t, epsilon):
  bt, n, d = features.shape
  pos_emb = pos_emb.reshape(-1, pos_emb.shape[-1])
  out = _ln_rows(features, ln_scale, ln_bias, epsilon).astype(
      features.dtype)
  out = out.reshape(b, t, n, d).transpose(0, 2, 1, 3).reshape(b * n, t, d)
  return (out.astype(jnp.float32)
          + pos_emb.astype(jnp.float32)).astype(features.dtype)


def _composed_ts(features, ln_scale, ln_bias, *, b, n, epsilon):
  bn, t, d = features.shape
  out = _ln_rows(features, ln_scale, ln_bias, epsilon).astype(
      features.dtype)
  return out.reshape(b, n, t, d).transpose(0, 2, 1, 3).reshape(b, t * n, d)


@functools.lru_cache(maxsize=None)
def spatial_to_temporal_vjp(b: int, t: int, epsilon: float = 1e-6,
                            interpret: bool = False):
  static = dict(b=b, t=t, epsilon=epsilon)

  def fwd(*args):
    return spatial_to_temporal(*args, **static, interpret=interpret)

  f = jax.custom_vjp(fwd)
  f.defvjp(
      lambda *args: (fwd(*args), args),
      lambda res, g: jax.vjp(
          functools.partial(_composed_st, **static), *res)[1](g))
  return f


@functools.lru_cache(maxsize=None)
def temporal_to_output_vjp(b: int, n: int, epsilon: float = 1e-6,
                           interpret: bool = False):
  static = dict(b=b, n=n, epsilon=epsilon)

  def fwd(*args):
    return temporal_to_output(*args, **static, interpret=interpret)

  f = jax.custom_vjp(fwd)
  f.defvjp(
      lambda *args: (fwd(*args), args),
      lambda res, g: jax.vjp(
          functools.partial(_composed_ts, **static), *res)[1](g))
  return f
