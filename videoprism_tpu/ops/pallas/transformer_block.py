"""Fused pre-norm transformer block kernels (attention block + FFN block).

Motivation: this chip is activation-bandwidth-bound (~150 GB/s effective; a
single [32768, 768] bf16 residual add costs 1.4 ms).  The XLA lowering
streams activations to HBM between LN, projections, attention, and residual
adds — ~1 GB of traffic per transformer layer.  These kernels keep a
sequence (or row block) resident in VMEM through an entire half-layer:

  * attention block: x -> LN1 -> QKV -> soft-capped attention -> output
    projection -> + x, one HBM read + one write of x;
  * FFN block: x -> LN2 -> W1 -> activation -> W2 -> + x, likewise.

Weights live fully in VMEM per program (base: 4.7 MB attn / 9.4 MB FFN in
bf16) and are revisited across the grid, so they stream from HBM once per
scan layer.  Falls back to the composed path when shapes/policies don't fit
(norm policies other than 'pre', very large widths, dropout in training).

Numerics: LN statistics and softmax in fp32; matmuls accumulate fp32 on the
MXU; tanh soft-cap applied to fp32 logits before masking (reference
videoprism/layers.py:586-654 order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
_VMEM_BUDGET = 13 * 2**20


def _erf(x):
  """fp32 erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7).

  Mosaic has no erf/erfc lowering; 1.5e-7 is four orders of magnitude
  below bf16 output rounding, so the erf-exact GELU semantics of the
  reference (videoprism/layers.py:31) are preserved to working precision.
  """
  sign = jnp.sign(x)
  x = jnp.abs(x)
  t = 1.0 / (1.0 + 0.3275911 * x)
  poly = t * (0.254829592 + t * (-0.284496736 + t * (
      1.421413741 + t * (-1.453152027 + t * 1.061405429))))
  return sign * (1.0 - poly * jnp.exp(-x * x))


def _ln_f32(x, scale_ref, bias_ref, epsilon):
  """(scale+1) layernorm in fp32; returns same dtype as x's compute use."""
  xf = x.astype(jnp.float32)
  mean = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
  normed = (xf - mean) * jax.lax.rsqrt(var + epsilon)
  scale = scale_ref[:].astype(jnp.float32) + 1.0
  return normed * scale + bias_ref[:].astype(jnp.float32)


def _attn_block_kernel(
    x_ref, mask_ref, ln_s_ref, ln_b_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    o_ref, *,
    num_heads: int, dim_per_head: int, logit_cap: float, epsilon: float,
    query_scale: float,
):
  x = x_ref[0]  # [T, D]
  t = x.shape[0]
  h = _ln_f32(x, ln_s_ref, ln_b_ref, epsilon).astype(x.dtype)  # [T, D]

  def proj(w_ref, b_ref):
    out = jax.lax.dot_general(
        h, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out + b_ref[:].astype(jnp.float32)

  q = (proj(wq_ref, bq_ref) * query_scale).astype(x.dtype)  # [T, N*H]
  k = proj(wk_ref, bk_ref).astype(x.dtype)
  v = proj(wv_ref, bv_ref).astype(x.dtype)

  mask = mask_ref[0]  # [T|1, T]
  nh = dim_per_head

  # Per-head attention, fully in VMEM; statically unrolled over heads
  # (num_heads is a trace-time constant; Mosaic has no dynamic_slice).
  ctx_parts = []
  for n in range(num_heads):
    qn = q[:, n * nh:(n + 1) * nh]  # [T, H]
    kn = k[:, n * nh:(n + 1) * nh]
    vn = v[:, n * nh:(n + 1) * nh]
    logits = jax.lax.dot_general(
        qn, kn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [T, T]
    ok = mask >= _NEG_INF * 0.5
    if logit_cap > 0.0:
      # ±cap-bounded logits: exp cannot overflow fp32, so skip the
      # row-max pass and zero masked entries directly.  Fully-masked rows
      # become uniform 1/S, matching the reference softmax semantics.
      logits = logit_cap * jnp.tanh(logits * (1.0 / logit_cap))
      unnorm = jnp.where(ok, jnp.exp(logits), 0.0)
      denom = jnp.sum(unnorm, axis=-1, keepdims=True)
      unnorm = jnp.where(denom == 0.0, 1.0, unnorm)
      denom = jnp.where(denom == 0.0, float(unnorm.shape[-1]), denom)
    else:
      logits = jnp.where(ok, logits, _NEG_INF)
      row_max = jnp.max(logits, axis=-1, keepdims=True)
      unnorm = jnp.exp(logits - row_max)
      denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = (unnorm / denom).astype(x.dtype)
    ctx_parts.append(jax.lax.dot_general(
        probs, vn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype))
  ctx = jnp.concatenate(ctx_parts, axis=1)  # [T, N*H]

  out = jax.lax.dot_general(
      ctx, wo_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  out = out + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
  o_ref[0] = out.astype(o_ref.dtype)


def attention_block_supported(t: int, d: int, nh_total: int,
                              itemsize: int) -> bool:
  # Weights are single-buffered (constant index map); only the x/out
  # sequence blocks double-buffer; the rest are in-kernel temporaries.
  weights = 4 * d * nh_total * itemsize
  io = 2 * (2 * t * d * itemsize)
  temps = (t * d + 4 * t * nh_total) * itemsize + t * t * 4 + t * d * 4
  return (
      t % 8 == 0 and t <= 1024 and d % 128 == 0 and nh_total % 128 == 0
      and weights + io + temps < 14 * 2**20)


@functools.partial(jax.jit, static_argnames=(
    'num_heads', 'dim_per_head', 'logit_cap', 'epsilon', 'query_scale',
    'interpret'))
def fused_attention_block(
    x: Array,          # [B, T, D]
    mask: Array,       # [B|1, T|1, T] additive fp32
    ln_scale: Array, ln_bias: Array,   # [D]
    wq: Array, bq: Array,              # [D, N*H], [N*H]
    wk: Array, bk: Array,
    wv: Array, bv: Array,
    wo: Array, bo: Array,              # [N*H, D], [D]
    *,
    num_heads: int,
    dim_per_head: int,
    logit_cap: float = 0.0,
    epsilon: float = 1e-6,
    query_scale: float = 1.0,
    interpret: bool = False,
) -> Array:
  b, t, d = x.shape
  bm, tm, _ = mask.shape
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  return pl.pallas_call(
      functools.partial(
          _attn_block_kernel, num_heads=num_heads,
          dim_per_head=dim_per_head, logit_cap=float(logit_cap),
          epsilon=epsilon, query_scale=float(query_scale)),
      grid=(b,),
      in_specs=[
          pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(
              (1, tm, t), lambda i: (i if bm > 1 else 0, 0, 0),
              memory_space=pltpu.VMEM),
          vec(ln_scale), vec(ln_bias),
          mat(wq), vec(bq), mat(wk), vec(bk), mat(wv), vec(bv),
          mat(wo), vec(bo),
      ],
      out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )(x, mask, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)


def _apply_activation(a, activation: str):
  if activation == 'gelu':
    return 0.5 * a * (1.0 + _erf(a * 0.7071067811865476))
  if activation == 'relu':
    return jnp.maximum(a, 0.0)
  return a


def _ffn_chunk_kernel(
    x_ref, resid_ref, pad_ref, ln_s_ref, ln_b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
    activation: str, epsilon: float, add_bias2: bool,
):
  """One F-chunk of the FFN with an explicit residual operand.

  ``out = resid (+ b2·keep) + keep * act(keep * (LN(x) @ w1 + b1)) @ w2``
  — chaining calls with ``resid = previous out`` accumulates the chunks of
  a hidden dim too wide for a single VMEM-resident weight pair (the
  large/giant towers).
  """
  x = x_ref[:]
  keep = 1.0 - pad_ref[:].astype(jnp.float32)
  h = _ln_f32(x, ln_s_ref, ln_b_ref, epsilon).astype(x.dtype)
  a = jax.lax.dot_general(
      h, w1_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  a = _apply_activation(a + b1_ref[:].astype(jnp.float32), activation)
  a = (a * keep).astype(x.dtype)
  out = jax.lax.dot_general(
      a, w2_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  if add_bias2:
    out = out + b2_ref[:].astype(jnp.float32)
  out = out * keep + resid_ref[:].astype(jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype)


def _ffn_chunk_row_block(rows: int, d: int, f_chunk: int,
                         itemsize: int) -> int | None:
  weights = 2 * d * f_chunk * itemsize
  for block in (512, 256, 128, 64, 32, 16, 8):
    if rows % block:
      continue
    io = 2 * (3 * block * d * itemsize)  # x + resid + out, double-buffered
    scratch = block * f_chunk * (4 + itemsize) + 2 * block * d * 4
    if weights + io + scratch <= _FFN_BUDGET:
      return block
  return None


def ffn_chunks_for(rows: int, d: int, f: int, itemsize: int) -> int | None:
  """Smallest power-of-two chunk count whose weights fit VMEM (None when
  no chunking makes the workload fit, e.g. rows not blockable)."""
  for chunks in (2, 4, 8):
    if f % chunks:
      continue
    if _ffn_chunk_row_block(rows, d, f // chunks, itemsize) is not None:
      return chunks
  return None


def fused_ffn_block_chunked(
    x: Array, paddings: Array,
    ln_scale: Array, ln_bias: Array,
    w1: Array, b1: Array, w2: Array, b2: Array,
    *,
    chunks: int,
    activation: str = 'gelu',
    epsilon: float = 1e-6,
    interpret: bool = False,
) -> Array:
  """FFN via ``chunks`` sequential F-slices (for hidden dims whose weights
  exceed VMEM).  LN is recomputed per chunk (VPU-cheap) instead of a
  hidden-activation HBM round trip."""
  rows, d = x.shape
  f = w1.shape[1]
  fc = f // chunks
  block_rows = _ffn_chunk_row_block(rows, d, fc, x.dtype.itemsize)
  assert block_rows is not None, (rows, d, fc)

  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  rowspec = pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
  padspec = pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

  out = x
  for c in range(chunks):
    w1c = jax.lax.slice_in_dim(w1, c * fc, (c + 1) * fc, axis=1)
    b1c = jax.lax.slice_in_dim(b1, c * fc, (c + 1) * fc, axis=0)
    w2c = jax.lax.slice_in_dim(w2, c * fc, (c + 1) * fc, axis=0)
    out = pl.pallas_call(
        functools.partial(
            _ffn_chunk_kernel, activation=activation, epsilon=epsilon,
            add_bias2=(c == 0)),
        grid=(rows // block_rows,),
        in_specs=[rowspec, rowspec, padspec,
                  vec(ln_scale), vec(ln_bias),
                  mat(w1c), vec(b1c), mat(w2c), vec(b2)],
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(x, out, paddings, ln_scale, ln_bias, w1c, b1c, w2c, b2)
  return out


# ---------------------------------------------------------------------------
# Trainability: custom_vjp wrappers pairing the fused-kernel forward with a
# composed-XLA backward (the kernels have no transpose rules).  The composed
# twins replicate the kernel math with plain jnp ops; under rematerialized
# training the backward replays them anyway, so this is the natural split.
# ---------------------------------------------------------------------------


def _composed_attention_block(
    x, mask, ln_s, ln_b, wq, bq, wk, bk, wv, bv, wo, bo,
    *, num_heads, dim_per_head, logit_cap, epsilon, query_scale):
  """jnp twin of ``_attn_block_kernel`` (same math, differentiable)."""
  xf = x.astype(jnp.float32)
  mean = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
  h = ((xf - mean) * jax.lax.rsqrt(var + epsilon)
       * (ln_s.astype(jnp.float32) + 1.0)
       + ln_b.astype(jnp.float32)).astype(x.dtype)

  b, t, d = x.shape
  n, hd = num_heads, dim_per_head

  def proj(w, bias):
    out = jnp.einsum('btd,de->bte', h, w) + bias
    return out.reshape(b, t, n, hd).transpose(0, 2, 1, 3)  # [B,N,T,H]

  q = proj(wq, bq) * query_scale
  k = proj(wk, bk)
  v = proj(wv, bv)
  logits = jnp.einsum(
      'BNTH,BNSH->BNTS', q, k,
      preferred_element_type=jnp.float32)
  ok = mask[:, None] >= _NEG_INF * 0.5  # [B|1,1,T|1,S]
  if logit_cap > 0.0:
    # Mirror the kernel branch exactly (incl. uniform fully-masked rows).
    logits = logit_cap * jnp.tanh(logits * (1.0 / logit_cap))
    unnorm = jnp.where(ok, jnp.exp(logits), 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    unnorm = jnp.where(denom == 0.0, 1.0, unnorm)
    denom = jnp.where(denom == 0.0, float(unnorm.shape[-1]), denom)
  else:
    # Uncapped logits are unbounded: row-max subtraction is required (the
    # kernel does the same) or exp overflows in the backward replay.
    logits = jnp.where(ok, logits, _NEG_INF)
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - row_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
  probs = (unnorm / denom).astype(x.dtype)
  ctx = jnp.einsum('BNTS,BNSH->BNTH', probs, v)
  ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, n * hd)
  out = jnp.einsum('bte,ed->btd', ctx, wo) + bo
  return (out + x.astype(jnp.float32)).astype(x.dtype)


def _composed_ffn_block(x, pads, ln_s, ln_b, w1, b1, w2, b2,
                        *, activation, epsilon):
  """jnp twin of ``_ffn_chunk_kernel``/``_ffn_block_kernel``."""
  keep = 1.0 - pads.astype(jnp.float32)
  xf = x.astype(jnp.float32)
  mean = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
  h = ((xf - mean) * jax.lax.rsqrt(var + epsilon)
       * (ln_s.astype(jnp.float32) + 1.0)
       + ln_b.astype(jnp.float32)).astype(x.dtype)
  a = jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1
  a = _apply_activation(a, activation)
  a = (a * keep).astype(x.dtype)
  out = jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2
  return (out * keep + xf).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def attention_block_vjp(num_heads: int, dim_per_head: int,
                        logit_cap: float, epsilon: float,
                        query_scale: float, interpret: bool = False):
  static = dict(num_heads=num_heads, dim_per_head=dim_per_head,
                logit_cap=logit_cap, epsilon=epsilon,
                query_scale=query_scale)

  def kernel_fwd(*args):
    return fused_attention_block(*args, **static, interpret=interpret)

  f = jax.custom_vjp(kernel_fwd)
  f.defvjp(
      lambda *args: (kernel_fwd(*args), args),
      lambda res, g: jax.vjp(
          functools.partial(_composed_attention_block, **static), *res
      )[1](g),
  )
  return f


@functools.lru_cache(maxsize=None)
def ffn_block_vjp(activation: str, epsilon: float, chunks: int | None,
                  interpret: bool = False):
  def kernel_fwd(*args):
    if chunks:
      return fused_ffn_block_chunked(
          *args, chunks=chunks, activation=activation, epsilon=epsilon,
          interpret=interpret)
    return fused_ffn_block(
        *args, activation=activation, epsilon=epsilon, interpret=interpret)

  f = jax.custom_vjp(kernel_fwd)
  f.defvjp(
      lambda *args: (kernel_fwd(*args), args),
      lambda res, g: jax.vjp(
          functools.partial(_composed_ffn_block, activation=activation,
                            epsilon=epsilon), *res
      )[1](g),
  )
  return f


def _ffn_block_kernel(
    x_ref, pad_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref, *,
    activation: str, epsilon: float,
):
  x = x_ref[:]  # [R, D]
  keep = 1.0 - pad_ref[:].astype(jnp.float32)  # [R, 1]
  h = _ln_f32(x, ln_s_ref, ln_b_ref, epsilon).astype(x.dtype)
  a = jax.lax.dot_general(
      h, w1_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  a = a + b1_ref[:].astype(jnp.float32)
  if activation == 'gelu':
    a = 0.5 * a * (1.0 + _erf(a * 0.7071067811865476))
  elif activation == 'relu':
    a = jnp.maximum(a, 0.0)
  # Padding zeroing between the FFN matmuls and before the residual add
  # (reference videoprism/layers.py:397-411).
  a = (a * keep).astype(x.dtype)
  out = jax.lax.dot_general(
      a, w2_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  out = (out + b2_ref[:].astype(jnp.float32)) * keep \
      + x.astype(jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype)


_FFN_BUDGET = 15 * 2**20


def _ffn_row_block(rows: int, d: int, f: int, itemsize: int) -> int | None:
  """Largest row block whose working set fits VMEM (weights are
  single-buffered — constant index map — activations double-buffered)."""
  weights = 2 * d * f * itemsize
  for block in (512, 256, 128, 64, 32, 16, 8):
    if rows % block:
      continue
    io = 2 * (2 * block * d * itemsize)          # x + out, double-buffered
    scratch = block * f * (4 + itemsize) + 2 * block * d * 4
    if weights + io + scratch <= _FFN_BUDGET:
      return block
  return None


def ffn_block_supported(rows: int, d: int, f: int, itemsize: int) -> bool:
  return (
      d % 128 == 0 and f % 128 == 0
      and _ffn_row_block(rows, d, f, itemsize) is not None)


@functools.partial(jax.jit, static_argnames=(
    'activation', 'epsilon', 'interpret'))
def fused_ffn_block(
    x: Array,                        # [rows, D]
    paddings: Array,                 # [rows, 1] (1.0 = padded row)
    ln_scale: Array, ln_bias: Array,  # [D]
    w1: Array, b1: Array,             # [D, F], [F]
    w2: Array, b2: Array,             # [F, D], [D]
    *,
    activation: str = 'gelu',
    epsilon: float = 1e-6,
    interpret: bool = False,
) -> Array:
  rows, d = x.shape
  f = w1.shape[1]
  block_rows = _ffn_row_block(rows, d, f, x.dtype.itemsize)
  assert block_rows is not None, (rows, d, f)
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  return pl.pallas_call(
      functools.partial(
          _ffn_block_kernel, activation=activation, epsilon=epsilon),
      grid=(rows // block_rows,),
      in_specs=[
          pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          vec(ln_scale), vec(ln_bias),
          mat(w1), vec(b1), mat(w2), vec(b2),
      ],
      out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )(x, paddings, ln_scale, ln_bias, w1, b1, w2, b2)
