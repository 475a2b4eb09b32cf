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


# Odd minimax-style polynomial erf for the bf16 path: erf(x) ~ x * P(x^2)
# (Chebyshev fit on [0, 2.9], clamped to +-1 outside).  No division and no
# exp — pure FMA chain on the VPU.  Max abs error 3.3e-5 (gelu: 6.7e-5),
# ~2 decades below bf16 output rounding, measured fp32-Horner.
_ERF_POLY = (
    1.1283789365e+00, -3.7611922301e-01, 1.1280096911e-01,
    -2.6791361005e-02, 5.1454068308e-03, -8.0580644574e-04,
    1.0091356207e-04, -9.6206842908e-06, 6.4458276001e-07,
    -2.6608924047e-08, 5.0322833933e-10)


def _erf_fast(x):
  """Division/exp-free erf (bf16-accuracy); see _ERF_POLY note."""
  u = x * x
  acc = jnp.float32(_ERF_POLY[-1])
  for c in _ERF_POLY[-2::-1]:
    acc = acc * u + jnp.float32(c)
  return jnp.clip(x * acc, -1.0, 1.0)


def _ln_f32(x, scale_ref, bias_ref, epsilon):
  """(scale+1) layernorm in fp32; returns same dtype as x's compute use."""
  xf = x.astype(jnp.float32)
  mean = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
  normed = (xf - mean) * jax.lax.rsqrt(var + epsilon)
  scale = scale_ref[:].astype(jnp.float32) + 1.0
  return normed * scale + bias_ref[:].astype(jnp.float32)


def _heads_attention(q, k, v, mask, num_heads, dim_per_head, logit_cap,
                     out_dtype):
  """Per-head soft-capped softmax attention, fully in VMEM.

  q is pre-scaled.  Heads are statically unrolled (num_heads is a
  trace-time constant; Mosaic has no dynamic_slice).  Returns [T, N*H].
  """
  nh = dim_per_head
  ok = mask >= _NEG_INF * 0.5
  ctx_parts = []
  for n in range(num_heads):
    qn = q[:, n * nh:(n + 1) * nh]  # [T, H]
    kn = k[:, n * nh:(n + 1) * nh]
    vn = v[:, n * nh:(n + 1) * nh]
    logits = jax.lax.dot_general(
        qn, kn, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [T, T]
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
    probs = (unnorm / denom).astype(out_dtype)
    ctx_parts.append(jax.lax.dot_general(
        probs, vn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype))
  return jnp.concatenate(ctx_parts, axis=1)  # [T, N*H]


def _attn_block_kernel(
    x_ref, mask_ref, ln_s_ref, ln_b_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    o_ref, *,
    num_heads: int, dim_per_head: int, logit_cap: float, epsilon: float,
    query_scale: float, partial_out: bool = False, seq_group: int = 1,
    mask_per_seq: bool = True,
):
  """``seq_group`` (G) sequences per grid step: LN and the four
  projections run at M = G*T rows (the MXU's per-row efficiency at
  M=256 model widths is the measured forward plateau — see
  docs/DESIGN.md §3/§6), while the attention core loops the G sequences
  so no block-diagonal logit waste is introduced.  Row-independent ops
  only, so outputs are identical to G=1."""
  g, t = seq_group, x_ref.shape[1]
  x = x_ref[:].reshape(g * t, x_ref.shape[2])  # [G*T, D]
  h = _ln_f32(x, ln_s_ref, ln_b_ref, epsilon).astype(x.dtype)

  def proj(w_ref, b_ref):
    out = jax.lax.dot_general(
        h, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out + b_ref[:].astype(jnp.float32)

  q = (proj(wq_ref, bq_ref) * query_scale).astype(x.dtype)  # [G*T, N*H]
  k = proj(wk_ref, bk_ref).astype(x.dtype)
  v = proj(wv_ref, bv_ref).astype(x.dtype)

  if g == 1:
    ctx = _heads_attention(q, k, v, mask_ref[0], num_heads, dim_per_head,
                           logit_cap, x.dtype)
  else:
    ctx = jnp.concatenate([
        _heads_attention(
            q[s * t:(s + 1) * t], k[s * t:(s + 1) * t],
            v[s * t:(s + 1) * t], mask_ref[s if mask_per_seq else 0],
            num_heads, dim_per_head, logit_cap, x.dtype)
        for s in range(g)
    ], axis=0)  # [G*T, N*H]

  out = jax.lax.dot_general(
      ctx, wo_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  if not partial_out:
    # partial_out: the tensor-parallel caller psums the per-shard output
    # projections first, then adds bias and residual exactly once.
    out = out + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype).reshape(o_ref.shape)


def attention_block_supported(t: int, d: int, nh_total: int,
                              itemsize: int) -> bool:
  # Weights (single-buffered, constant index map) + in-kernel temporaries
  # against the ~16 MB scoped-VMEM stack; the x/out pipeline buffers are
  # allocated separately and don't count (same budget model as
  # _attn_chunk_fits, measured on hardware).
  weights = 4 * d * nh_total * itemsize
  temps = (t * d + 4 * t * nh_total) * itemsize + t * t * 4 + t * d * 4
  return (
      t % 8 == 0 and t <= 1024 and d % 128 == 0 and nh_total % 128 == 0
      and weights + temps < 14 * 2**20)


# Route production dispatch through sequence-group coarsening
# (ops/transformer._try_fused_layer).  CLOSED session 7 — stays False:
# the hardware A/B (scripts/probes/bench_seqgroup_ab.py, interleaved
# paired timing to cancel the chip's ~10% run-to-run drift) measures
# g=2/4 at +0.3%..+1.9% median across the b1/throughput spatial and
# packed temporal grids — inside the paired spread.  The attention block
# is VPU/core-bound (LN + [T,T] softmax), not projection-bound, so the
# MXU M-coarsening the probe predicted never materializes e2e.  The
# kernels keep the seq_group parameter (tested in interpret mode) for
# future hardware where the balance differs.
SEQ_GROUP_DISPATCH = False


def attention_seq_group_for(b: int, t: int, d: int, nh_total: int,
                            itemsize: int) -> int:
  """Largest sequences-per-grid-step G (4/2/1) that keeps the monolithic
  attention block VMEM-resident.

  Projections then run at M = G*T rows.  All temporaries scale linearly
  with G (the attention core loops sequences, so logits stay [T, T] —
  counted G-live because Mosaic does not reuse unrolled per-iteration
  buffers, the ops/pallas/boundary.py lesson).  Same 14 MB scoped-stack
  budget as :func:`attention_block_supported`; pipeline x/out buffers
  (which also scale with G) stay excluded, as measured there.
  """
  weights = 4 * d * nh_total * itemsize
  for g in (4, 2):
    if b % g:
      continue
    temps = g * ((t * d + 4 * t * nh_total) * itemsize
                 + t * t * 4 + t * d * 4)
    if weights + temps < 14 * 2**20:
      return g
  return 1


@functools.partial(jax.jit, static_argnames=(
    'num_heads', 'dim_per_head', 'logit_cap', 'epsilon', 'query_scale',
    'partial_out', 'seq_group', 'interpret'))
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
    partial_out: bool = False,
    seq_group: int = 1,
    interpret: bool = False,
) -> Array:
  b, t, d = x.shape
  bm, tm, _ = mask.shape
  g = seq_group
  assert b % g == 0 and (bm == 1 or bm == b), (b, g, bm)
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  return pl.pallas_call(
      functools.partial(
          _attn_block_kernel, num_heads=num_heads,
          dim_per_head=dim_per_head, logit_cap=float(logit_cap),
          epsilon=epsilon, query_scale=float(query_scale),
          partial_out=partial_out, seq_group=g, mask_per_seq=bm > 1),
      grid=(b // g,),
      in_specs=[
          pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(
              ((g if bm > 1 else 1), tm, t),
              lambda i: (i if bm > 1 else 0, 0, 0),
              memory_space=pltpu.VMEM),
          vec(ln_scale), vec(ln_bias),
          mat(wq), vec(bq), mat(wk), vec(bk), mat(wv), vec(bv),
          mat(wo), vec(bo),
      ],
      out_specs=pl.BlockSpec((g, t, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )(x, mask, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)


def _attn_chunk_kernel(
    x_ref, *rest,
    num_heads: int, dim_per_head: int, logit_cap: float, epsilon: float,
    query_scale: float, first: bool, partial_out: bool,
):
  """One head-group chunk of the attention block with an explicit residual.

  ``out = resid + ctx_chunk @ wo_chunk`` — chaining calls with
  ``resid = previous out`` accumulates head groups whose combined
  projection weights are too wide for a single VMEM-resident kernel (the
  giant tower: 15.9 MB bf16 at D=1408).  The first chunk seeds the chain
  with ``x + bo`` (or zero under ``partial_out``, where the TP caller
  psums shards then applies bias/residual once).  LN is recomputed per
  chunk (VPU-cheap) instead of a normed-activation HBM round trip.
  """
  if first:
    (mask_ref, ln_s_ref, ln_b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
     wv_ref, bv_ref, wo_ref, bo_ref, o_ref) = rest
    resid_ref = None
  else:
    (resid_ref, mask_ref, ln_s_ref, ln_b_ref, wq_ref, bq_ref, wk_ref,
     bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, o_ref) = rest

  x = x_ref[0]  # [T, D]
  h = _ln_f32(x, ln_s_ref, ln_b_ref, epsilon).astype(x.dtype)

  def proj(w_ref, b_ref):
    out = jax.lax.dot_general(
        h, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out + b_ref[:].astype(jnp.float32)

  q = (proj(wq_ref, bq_ref) * query_scale).astype(x.dtype)  # [T, G*H]
  k = proj(wk_ref, bk_ref).astype(x.dtype)
  v = proj(wv_ref, bv_ref).astype(x.dtype)

  ctx = _heads_attention(q, k, v, mask_ref[0], num_heads, dim_per_head,
                         logit_cap, x.dtype)

  out = jax.lax.dot_general(
      ctx, wo_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  if first:
    if not partial_out:
      out = out + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
  else:
    out = out + resid_ref[0].astype(jnp.float32)
  o_ref[0] = out.astype(o_ref.dtype)


def _attn_chunk_fits(t: int, d: int, gh: int, itemsize: int) -> bool:
  # Weight slices + in-kernel temporaries against the ~16 MB scoped-VMEM
  # stack; the x/resid/out pipeline buffers are allocated separately and
  # must NOT be counted here (measured: giant gh=704 bf16 = 13.95 MB by
  # this formula compiles and runs 32% faster than the 4-chunk split the
  # old io-inclusive estimate forced).
  weights = 4 * d * gh * itemsize            # single-buffered slices
  temps = (t * d * itemsize                  # h
           + 3 * t * gh * (4 + itemsize)     # q/k/v fp32 + low-prec casts
           + t * t * 4                       # per-head logits/probs (fp32)
           + t * gh * itemsize               # ctx
           + t * d * 4)                      # fp32 output accumulator
  return weights + temps < 14 * 2**20


def attention_chunks_for(t: int, d: int, num_heads: int, dim_per_head: int,
                         itemsize: int) -> int | None:
  """Smallest head-group chunk count making the attention block
  VMEM-resident (None when the monolithic kernel fits — it is strictly
  better — or when no chunking fits).  Capped at 4 chunks: each chunk
  streams x/resid/out once, so beyond 4 the extra activation traffic
  exceeds what the composed path's LN/q/k/v/ctx round trips cost."""
  nh_total = num_heads * dim_per_head
  if not (t % 8 == 0 and t <= 1024 and d % 128 == 0):
    return None
  if attention_block_supported(t, d, nh_total, itemsize):
    return None
  for chunks in (2, 4):
    if num_heads % chunks:
      continue
    if _attn_chunk_fits(t, d, (num_heads // chunks) * dim_per_head,
                        itemsize):
      return chunks
  return None


@functools.partial(jax.jit, static_argnames=(
    'num_heads', 'dim_per_head', 'chunks', 'logit_cap', 'epsilon',
    'query_scale', 'partial_out', 'interpret'))
def fused_attention_block_chunked(
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
    chunks: int,
    logit_cap: float = 0.0,
    epsilon: float = 1e-6,
    query_scale: float = 1.0,
    partial_out: bool = False,
    interpret: bool = False,
) -> Array:
  """Attention block via ``chunks`` sequential head-group slices (for
  projection weights that exceed VMEM; see :func:`attention_chunks_for`).

  Head-major weight layout makes head groups contiguous column (wq/wk/wv)
  / row (wo) slices, so each chunk is an independent exact sub-attention
  whose output projections sum to the full block output.
  """
  b, t, d = x.shape
  bm, tm, _ = mask.shape
  g = num_heads // chunks
  gh = g * dim_per_head
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  xspec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  mspec = pl.BlockSpec((1, tm, t), lambda i: (i if bm > 1 else 0, 0, 0),
                       memory_space=pltpu.VMEM)

  out = None
  for c in range(chunks):
    sl_col = lambda a: jax.lax.slice_in_dim(a, c * gh, (c + 1) * gh, axis=1)
    sl_vec = lambda a: jax.lax.slice_in_dim(a, c * gh, (c + 1) * gh, axis=0)
    wqc, bqc = sl_col(wq), sl_vec(bq)
    wkc, bkc = sl_col(wk), sl_vec(bk)
    wvc, bvc = sl_col(wv), sl_vec(bv)
    woc = jax.lax.slice_in_dim(wo, c * gh, (c + 1) * gh, axis=0)
    first = c == 0
    operands = ([x] + ([] if first else [out])
                + [mask, ln_scale, ln_bias,
                   wqc, bqc, wkc, bkc, wvc, bvc, woc, bo])
    in_specs = ([xspec] + ([] if first else [xspec])
                + [mspec, vec(ln_scale), vec(ln_bias),
                   mat(wqc), vec(bqc), mat(wkc), vec(bkc),
                   mat(wvc), vec(bvc), mat(woc), vec(bo)])
    out = pl.pallas_call(
        functools.partial(
            _attn_chunk_kernel, num_heads=g, dim_per_head=dim_per_head,
            logit_cap=float(logit_cap), epsilon=epsilon,
            query_scale=float(query_scale), first=first,
            partial_out=partial_out),
        grid=(b,),
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(*operands)
  return out


def _apply_activation(a, activation: str, out_dtype=jnp.float32):
  if activation == 'gelu':
    # bf16 outputs can't see the fast-poly's 7e-5 error; fp32 keeps the
    # reference-exact A&S erf.
    erf = _erf_fast if out_dtype == jnp.bfloat16 else _erf
    return 0.5 * a * (1.0 + erf(a * 0.7071067811865476))
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
  a = _apply_activation(a + b1_ref[:].astype(jnp.float32), activation,
                        out_dtype=x.dtype)
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
    partial_out: bool = False,
    interpret: bool = False,
) -> Array:
  """FFN via ``chunks`` sequential F-slices (for hidden dims whose weights
  exceed VMEM).  LN is recomputed per chunk (VPU-cheap) instead of a
  hidden-activation HBM round trip.

  ``partial_out``: chain from a zero residual and never add bias2 — the
  result is this shard's raw FFN contribution for a tensor-parallel psum.
  """
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

  out = jnp.zeros_like(x) if partial_out else x
  for c in range(chunks):
    w1c = jax.lax.slice_in_dim(w1, c * fc, (c + 1) * fc, axis=1)
    b1c = jax.lax.slice_in_dim(b1, c * fc, (c + 1) * fc, axis=0)
    w2c = jax.lax.slice_in_dim(w2, c * fc, (c + 1) * fc, axis=0)
    out = pl.pallas_call(
        functools.partial(
            _ffn_chunk_kernel, activation=activation, epsilon=epsilon,
            add_bias2=(c == 0 and not partial_out)),
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
    *, num_heads, dim_per_head, logit_cap, epsilon, query_scale,
    core: str = 'xla', partial_out: bool = False, interpret: bool = False):
  """jnp twin of ``_attn_block_kernel`` (same math, differentiable).

  ``core='kernel'`` swaps the inner softmax-attention for the flash
  fwd+bwd kernel pair: differentiating this twin then yields a backward
  whose probs never touch HBM (XLA handles the projection/LN algebra,
  which is plain matmul transposes).  This is what the block-level
  custom_vjp uses on TPU.
  """
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
  if core == 'kernel':
    from videoprism_tpu.ops.pallas import flash_attention as flash

    encoded = flash.flash_attention_head_major(
        q.astype(x.dtype), k.astype(x.dtype), v.astype(x.dtype),
        mask[:, None], logit_cap=logit_cap, dtype=x.dtype,
        interpret=interpret)  # [B, N, T, H]
    ctx = encoded.transpose(0, 2, 1, 3).reshape(b, t, n * hd)
  else:
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
  if partial_out:
    return jnp.einsum('bte,ed->btd', ctx, wo).astype(x.dtype)
  out = jnp.einsum('bte,ed->btd', ctx, wo) + bo
  return (out + x.astype(jnp.float32)).astype(x.dtype)


def _composed_ffn_block(x, pads, ln_s, ln_b, w1, b1, w2, b2,
                        *, activation, epsilon, partial_out: bool = False):
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
  if partial_out:
    return jnp.dot(a, w2, preferred_element_type=jnp.float32
                   ).astype(x.dtype)
  out = jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2
  return (out * keep + xf).astype(x.dtype)


def _attention_block_bwd(
    res, g, *, num_heads, dim_per_head, logit_cap, epsilon, query_scale,
    partial_out, interpret):
  """Hand-written attention-block backward around the fused bwd kernel.

  One kernel pass recomputes probs AND the context (so the forward kernel
  is never replayed — a single tanh/exp sweep per layer) and emits
  dq/dk/dv; the surrounding LN/projection algebra is explicit XLA matmuls.
  Gradient semantics match ``jax.vjp`` of ``_composed_attention_block``.
  """
  from videoprism_tpu.ops.pallas import flash_attention as flash

  x, mask, ln_s, ln_b, wq, bq, wk, bk, wv, bv, wo, bo = res
  b, t, d = x.shape
  n, hd = num_heads, dim_per_head

  # --- Recompute LN + projections (cheap; the heavyweight probs stay in
  # the kernel).
  xf = x.astype(jnp.float32)
  mean = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
  inv_sigma = jax.lax.rsqrt(var + epsilon)
  normed = (xf - mean) * inv_sigma
  s1 = ln_s.astype(jnp.float32) + 1.0
  h = (normed * s1 + ln_b.astype(jnp.float32)).astype(x.dtype)

  def proj(w, bias):
    out = jnp.einsum('btd,de->bte', h, w) + bias
    return out.reshape(b, t, n, hd).transpose(0, 2, 1, 3)  # [B,N,T,H]

  q = (proj(wq, bq) * query_scale).astype(x.dtype)
  k = proj(wk, bk).astype(x.dtype)
  v = proj(wv, bv).astype(x.dtype)

  # --- Output-projection backward (and residual/bias cotangents).
  gf = g.astype(jnp.float32)
  dctx = jnp.einsum('btd,ed->bte', g, wo)  # [B, T, N*H]
  dctx_hm = dctx.reshape(b, t, n, hd).transpose(0, 2, 1, 3).astype(x.dtype)

  ctx, dq, dk, dv = flash.fused_attention_bwd(
      q, k, v, mask.astype(jnp.float32), dctx_hm,
      logit_cap=logit_cap, with_ctx=True, interpret=interpret)

  ctx_flat = ctx.transpose(0, 2, 1, 3).reshape(b, t, n * hd)
  dwo = jnp.einsum('bte,btd->ed', ctx_flat, gf.astype(ctx_flat.dtype))
  # partial_out forwards omit bias and residual (the TP caller adds them
  # once after the psum), so neither receives a cotangent here.
  dbo = (jnp.zeros(bo.shape, jnp.float32) if partial_out
         else jnp.sum(gf, axis=(0, 1)))

  # --- q/k/v projection backward.  q was scaled AFTER bias, so the
  # pre-scale cotangent is dq * query_scale.
  def unproj(dp):  # [B,N,T,H] -> [B,T,N*H]
    return dp.transpose(0, 2, 1, 3).reshape(b, t, n * hd)

  dq_p = unproj(dq) * query_scale
  dk_p = unproj(dk)
  dv_p = unproj(dv)
  dwq = jnp.einsum('btd,bte->de', h, dq_p)
  dwk = jnp.einsum('btd,bte->de', h, dk_p)
  dwv = jnp.einsum('btd,bte->de', h, dv_p)
  dbq = jnp.sum(dq_p, axis=(0, 1))
  dbk = jnp.sum(dk_p, axis=(0, 1))
  dbv = jnp.sum(dv_p, axis=(0, 1))
  dh = (jnp.einsum('bte,de->btd', dq_p, wq)
        + jnp.einsum('bte,de->btd', dk_p, wk)
        + jnp.einsum('bte,de->btd', dv_p, wv)).astype(jnp.float32)

  # --- LayerNorm backward (h = normed * (scale+1) + bias, fp32 stats).
  dln_s = jnp.sum(dh * normed, axis=(0, 1))
  dln_b = jnp.sum(dh, axis=(0, 1))
  dnormed = dh * s1
  dxf = inv_sigma * (
      dnormed
      - jnp.mean(dnormed, axis=-1, keepdims=True)
      - normed * jnp.mean(dnormed * normed, axis=-1, keepdims=True))
  if not partial_out:
    dxf = dxf + gf  # residual path
  dx = dxf.astype(x.dtype)

  cast = lambda val, ref: val.astype(ref.dtype)
  return (dx, jnp.zeros_like(mask), cast(dln_s, ln_s), cast(dln_b, ln_b),
          cast(dwq, wq), cast(dbq, bq), cast(dwk, wk), cast(dbk, bk),
          cast(dwv, wv), cast(dbv, bv), cast(dwo, wo), cast(dbo, bo))


@functools.lru_cache(maxsize=None)
def attention_block_vjp(num_heads: int, dim_per_head: int,
                        logit_cap: float, epsilon: float,
                        query_scale: float, interpret: bool = False,
                        partial_out: bool = False,
                        chunks: int | None = None,
                        seq_group: int = 1):
  static = dict(num_heads=num_heads, dim_per_head=dim_per_head,
                logit_cap=logit_cap, epsilon=epsilon,
                query_scale=query_scale, partial_out=partial_out)

  def kernel_fwd(*args):
    if chunks:
      return fused_attention_block_chunked(
          *args, **static, chunks=chunks, interpret=interpret)
    return fused_attention_block(*args, **static, seq_group=seq_group,
                                 interpret=interpret)

  def bwd(res, g):
    from videoprism_tpu.ops.pallas import flash_attention as flash

    x = res[0]
    t = x.shape[1]
    on_tpu = interpret or jax.default_backend() == 'tpu'
    if on_tpu and flash.bwd_supported(t, t, dim_per_head, num_heads,
                                      x.dtype.itemsize):
      # Hand-written backward: one combined fwd+bwd kernel pass (probs in
      # VMEM, single transcendental sweep) + explicit XLA matmul algebra.
      return _attention_block_bwd(res, g, **static, interpret=interpret)
    # Fallbacks: semi-fused twin (kernel attention core) when the forward
    # kernel fits but the backward doesn't; fully composed twin otherwise.
    core = 'kernel' if on_tpu and flash.supports(t, t) else 'xla'
    return jax.vjp(
        functools.partial(_composed_attention_block, **static, core=core,
                          interpret=interpret), *res
    )[1](g)

  f = jax.custom_vjp(kernel_fwd)
  f.defvjp(lambda *args: (kernel_fwd(*args), args), bwd)
  return f


@functools.lru_cache(maxsize=None)
def ffn_block_vjp(activation: str, epsilon: float, chunks: int | None,
                  interpret: bool = False, partial_out: bool = False):
  def kernel_fwd(*args):
    if chunks:
      return fused_ffn_block_chunked(
          *args, chunks=chunks, activation=activation, epsilon=epsilon,
          partial_out=partial_out, interpret=interpret)
    return fused_ffn_block(
        *args, activation=activation, epsilon=epsilon,
        partial_out=partial_out, interpret=interpret)

  f = jax.custom_vjp(kernel_fwd)
  f.defvjp(
      lambda *args: (kernel_fwd(*args), args),
      lambda res, g: jax.vjp(
          functools.partial(_composed_ffn_block, activation=activation,
                            epsilon=epsilon, partial_out=partial_out), *res
      )[1](g),
  )
  return f


def _ffn_block_kernel(
    x_ref, pad_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref, *,
    activation: str, epsilon: float, partial_out: bool = False,
):
  x = x_ref[:]  # [R, D]
  keep = 1.0 - pad_ref[:].astype(jnp.float32)  # [R, 1]
  h = _ln_f32(x, ln_s_ref, ln_b_ref, epsilon).astype(x.dtype)
  a = jax.lax.dot_general(
      h, w1_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  a = _apply_activation(a + b1_ref[:].astype(jnp.float32), activation,
                        out_dtype=x.dtype)
  # Padding zeroing between the FFN matmuls and before the residual add
  # (reference videoprism/layers.py:397-411).
  a = (a * keep).astype(x.dtype)
  out = jax.lax.dot_general(
      a, w2_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  if partial_out:
    # Tensor-parallel per-shard contribution: the caller psums shards,
    # then applies bias2/keep/residual once.  (a is keep-masked already,
    # so padded rows are exact zeros here.)
    o_ref[:] = out.astype(o_ref.dtype)
    return
  out = (out + b2_ref[:].astype(jnp.float32)) * keep \
      + x.astype(jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype)


_FFN_BUDGET = 15 * 2**20


def _ffn_row_block(rows: int, d: int, f: int, itemsize: int) -> int | None:
  """Largest row block whose working set fits VMEM (weights are
  single-buffered — constant index map — activations double-buffered).

  Unlike the attention fits-estimates, this keeps the pipeline-buffer
  term: it only sizes the row BLOCK (never gates the kernel path), and
  block 128 vs 256 measured identical at base geometry (3.21 vs 3.24 ms,
  rows=32768) — the conservative budget costs nothing."""
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
    'activation', 'epsilon', 'partial_out', 'interpret'))
def fused_ffn_block(
    x: Array,                        # [rows, D]
    paddings: Array,                 # [rows, 1] (1.0 = padded row)
    ln_scale: Array, ln_bias: Array,  # [D]
    w1: Array, b1: Array,             # [D, F], [F]
    w2: Array, b2: Array,             # [F, D], [D]
    *,
    activation: str = 'gelu',
    epsilon: float = 1e-6,
    partial_out: bool = False,
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
          _ffn_block_kernel, activation=activation, epsilon=epsilon,
          partial_out=partial_out),
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
