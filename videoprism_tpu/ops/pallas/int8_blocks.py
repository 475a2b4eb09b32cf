"""Int8 (W8A8) fused transformer-block kernels for serving.

Weight-streaming-bound regime only: this chip's MXU runs int8 at the SAME
rate as bf16 (measured — no 2x int8 mode through this lowering), so int8
buys nothing at throughput batches where activations dominate.  What it
halves is weight HBM traffic and weight VMEM, which dominates small-batch
latency serving of the large/giant towers: measured at giant FFN geometry
(D=1408, F=6144), batch-1 is 2.75 -> 1.75 ms/layer-half (-36%) while
batch-8 is neutral (2.14 -> 2.08 ms).  Quality: per-output-channel weight
scales + dynamic per-row activation scales hold cosine > 0.9998 per block.

Scheme:
  * weights: symmetric int8, per output channel (``quantization.py``);
  * activations: symmetric int8 per row, scales computed in-kernel from
    the row max (one VPU pass; exact zero rows quantize to zero);
  * matmuls: int8 x int8 -> int32 on the MXU, rescaled fp32 in epilogue;
  * LN, softmax, gelu, residuals: fp32/bf16 exactly as the bf16 kernels.

Inference-only (no custom_vjp): the training path keeps bf16 weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videoprism_tpu.ops.pallas.transformer_block import (
    _apply_activation,
    _heads_attention,
    _ln_f32,
)

Array = jax.Array


def quant_rows(h):
  """Symmetric per-row int8 quantization of fp32 rows.

  Returns (q int8, scale fp32 [rows, 1]).  All-zero rows get a clamped
  scale and quantize to exact zeros.
  """
  s = jnp.max(jnp.abs(h), axis=-1, keepdims=True) * (1.0 / 127.0)
  s = jnp.maximum(s, 1e-12)
  q = jnp.clip(jnp.round(h * (1.0 / s)), -127.0, 127.0).astype(jnp.int8)
  return q, s


# ---------------------------------------------------------------------------
# FFN block (chunked over F like the bf16 fused_ffn_block_chunked).
# ---------------------------------------------------------------------------


def _ffn_int8_chunk_kernel(
    x_ref, resid_ref, pad_ref, ln_s_ref, ln_b_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, o_ref, *,
    activation: str, epsilon: float, add_bias2: bool,
):
  """One F-chunk: ``out = resid (+ b2*keep) + keep * deq(q(act(deq(
  q(LN(x)) @ w1) + b1)) @ w2)`` — same chaining contract as the bf16
  ``_ffn_chunk_kernel`` (ops/pallas/transformer_block.py).  The
  tensor-parallel partial mode is expressed by the caller chaining from a
  zero residual with ``add_bias2=False`` (the TP epilogue psums shards,
  then applies bias/keep/residual once)."""
  x = x_ref[:]
  keep = 1.0 - pad_ref[:].astype(jnp.float32)
  h = _ln_f32(x, ln_s_ref, ln_b_ref, epsilon)
  h8, hs = quant_rows(h)
  acc = jax.lax.dot_general(
      h8, w1_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.int32)
  a = acc.astype(jnp.float32) * hs * s1_ref[:].astype(jnp.float32)
  a = _apply_activation(a + b1_ref[:].astype(jnp.float32), activation,
                        out_dtype=x.dtype)
  a = a * keep
  a8, as_ = quant_rows(a)
  acc2 = jax.lax.dot_general(
      a8, w2_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.int32)
  out = acc2.astype(jnp.float32) * as_ * s2_ref[:].astype(jnp.float32)
  if add_bias2:
    out = out + b2_ref[:].astype(jnp.float32)
  out = out * keep + resid_ref[:].astype(jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype)


_INT8_BUDGET = 14 * 2**20


def _ffn_int8_row_block(rows: int, d: int, f_chunk: int,
                        act_itemsize: int) -> int | None:
  weights = 2 * d * f_chunk  # int8, single-buffered
  for block in (512, 256, 128, 64, 32, 16, 8):
    if rows % block:
      continue
    io = 2 * (3 * block * d * act_itemsize)
    # fp32 h + int8 h8 + fp32/int8 hidden + fp32 out accumulator
    scratch = (block * d * 5 + block * f_chunk * 9 + block * d * 4)
    if weights + io + scratch <= _INT8_BUDGET:
      return block
  return None


def ffn_int8_chunks_for(rows: int, d: int, f: int,
                        act_itemsize: int) -> int | None:
  for chunks in (1, 2, 4, 8):
    if f % chunks:
      continue
    if _ffn_int8_row_block(rows, d, f // chunks, act_itemsize) is not None:
      return chunks
  return None


@functools.partial(jax.jit, static_argnames=(
    'chunks', 'activation', 'epsilon', 'partial_out', 'interpret'))
def int8_ffn_block_chunked(
    x: Array, paddings: Array,           # [rows, D], [rows, 1]
    ln_scale: Array, ln_bias: Array,     # [D]
    w1: Array, s1: Array, b1: Array,     # int8 [D, F], fp32 [F], [F]
    w2: Array, s2: Array, b2: Array,     # int8 [F, D], fp32 [D], [D]
    *,
    chunks: int,
    activation: str = 'gelu',
    epsilon: float = 1e-6,
    partial_out: bool = False,
    interpret: bool = False,
) -> Array:
  """``partial_out``: chain from a zero residual and never add bias2 —
  this shard's raw FFN contribution for a tensor-parallel psum."""
  rows, d = x.shape
  f = w1.shape[1]
  fc = f // chunks
  block_rows = _ffn_int8_row_block(rows, d, fc, x.dtype.itemsize)
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
    s1c = jax.lax.slice_in_dim(s1, c * fc, (c + 1) * fc, axis=0)
    b1c = jax.lax.slice_in_dim(b1, c * fc, (c + 1) * fc, axis=0)
    w2c = jax.lax.slice_in_dim(w2, c * fc, (c + 1) * fc, axis=0)
    out = pl.pallas_call(
        functools.partial(
            _ffn_int8_chunk_kernel, activation=activation,
            epsilon=epsilon, add_bias2=(c == 0 and not partial_out)),
        grid=(rows // block_rows,),
        in_specs=[rowspec, rowspec, padspec,
                  vec(ln_scale), vec(ln_bias),
                  mat(w1c), vec(s1c), vec(b1c),
                  mat(w2c), vec(s2), vec(b2)],
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(x, out, paddings, ln_scale, ln_bias, w1c, s1c, b1c, w2c, s2, b2)
  return out


# ---------------------------------------------------------------------------
# Attention block (chunked over head groups like
# fused_attention_block_chunked; chunks=1 covers the monolithic case).
# ---------------------------------------------------------------------------


def _attn_int8_chunk_kernel(
    x_ref, *rest,
    num_heads: int, dim_per_head: int, logit_cap: float, epsilon: float,
    query_scale: float, first: bool, partial_out: bool = False,
    seq_group: int = 1, mask_per_seq: bool = True,
):
  if first:
    (mask_ref, ln_s_ref, ln_b_ref,
     wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
     wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref, o_ref) = rest
    resid_ref = None
  else:
    (resid_ref, mask_ref, ln_s_ref, ln_b_ref,
     wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
     wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref, o_ref) = rest

  g, t = seq_group, x_ref.shape[1]
  x = x_ref[:].reshape(g * t, x_ref.shape[2])  # [G*T, D]
  h = _ln_f32(x, ln_s_ref, ln_b_ref, epsilon)
  h8, hs = quant_rows(h)

  def proj(w_ref, s_ref, b_ref):
    acc = jax.lax.dot_general(
        h8, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * hs * s_ref[:].astype(jnp.float32)
            + b_ref[:].astype(jnp.float32))

  q = (proj(wq_ref, sq_ref, bq_ref) * query_scale).astype(x.dtype)
  k = proj(wk_ref, sk_ref, bk_ref).astype(x.dtype)
  v = proj(wv_ref, sv_ref, bv_ref).astype(x.dtype)

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

  c8, cs = quant_rows(ctx.astype(jnp.float32))
  acc = jax.lax.dot_general(
      c8, wo_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.int32)
  out = acc.astype(jnp.float32) * cs * so_ref[:].astype(jnp.float32)
  if first:
    # partial_out: the tensor-parallel caller psums per-shard projections
    # first, then adds bias and residual exactly once.
    if not partial_out:
      out = out + bo_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
  else:
    out = out + resid_ref[:].reshape(g * t, -1).astype(jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype).reshape(o_ref.shape)


def _attn_int8_chunk_fits(t: int, d: int, gh: int,
                          act_itemsize: int) -> bool:
  # Weights + in-kernel temporaries vs the scoped-VMEM stack; pipeline
  # buffers are separate (see transformer_block._attn_chunk_fits) —
  # giant rides 2 chunks instead of 4 (-31% per attention layer).
  weights = 4 * d * gh  # int8, single-buffered
  temps = (t * d * 5                       # fp32 h + int8 h8
           + 3 * t * gh * (4 + act_itemsize + 1)  # q/k/v fp32+cast+int8
           + t * t * 4                     # logits/probs
           + t * gh * (act_itemsize + 1)   # ctx + ctx int8
           + t * d * 4)                    # fp32 out accumulator
  return weights + temps < _INT8_BUDGET


def attention_int8_chunks_for(t: int, d: int, num_heads: int,
                              dim_per_head: int,
                              act_itemsize: int) -> int | None:
  if not (t % 8 == 0 and t <= 1024 and d % 128 == 0):
    return None
  for chunks in (1, 2, 4):
    if num_heads % chunks:
      continue
    if _attn_int8_chunk_fits(t, d, (num_heads // chunks) * dim_per_head,
                             act_itemsize):
      return chunks
  return None


def attention_int8_seq_group_for(b: int, t: int, d: int, gh: int,
                                 act_itemsize: int) -> int:
  """Largest sequences-per-grid-step G (4/2/1) for the int8 attention
  block at head-group width ``gh`` — the int8 twin of
  ``transformer_block.attention_seq_group_for`` (same linear-in-G
  temporaries model, int8 budget)."""
  weights = 4 * d * gh
  for g in (4, 2):
    if b % g:
      continue
    temps = g * (t * d * 5
                 + 3 * t * gh * (4 + act_itemsize + 1)
                 + t * t * 4
                 + t * gh * (act_itemsize + 1)
                 + t * d * 4)
    if weights + temps < _INT8_BUDGET:
      return g
  return 1


@functools.partial(jax.jit, static_argnames=(
    'num_heads', 'dim_per_head', 'chunks', 'logit_cap', 'epsilon',
    'query_scale', 'partial_out', 'seq_group', 'interpret'))
def int8_attention_block_chunked(
    x: Array,          # [B, T, D]
    mask: Array,       # [B|1, T|1, T] additive fp32
    ln_scale: Array, ln_bias: Array,
    wq: Array, sq: Array, bq: Array,   # int8 [D, N*H], fp32 [N*H], [N*H]
    wk: Array, sk: Array, bk: Array,
    wv: Array, sv: Array, bv: Array,
    wo: Array, so: Array, bo: Array,   # int8 [N*H, D], fp32 [D], [D]
    *,
    num_heads: int,
    dim_per_head: int,
    chunks: int,
    logit_cap: float = 0.0,
    epsilon: float = 1e-6,
    query_scale: float = 1.0,
    partial_out: bool = False,
    seq_group: int = 1,
    interpret: bool = False,
) -> Array:
  b, t, d = x.shape
  bm, tm, _ = mask.shape
  sg = seq_group
  assert b % sg == 0 and (bm == 1 or bm == b), (b, sg, bm)
  g = num_heads // chunks
  gh = g * dim_per_head
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  xspec = pl.BlockSpec((sg, t, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  mspec = pl.BlockSpec(((sg if bm > 1 else 1), tm, t),
                       lambda i: (i if bm > 1 else 0, 0, 0),
                       memory_space=pltpu.VMEM)

  out = None
  for c in range(chunks):
    sl_col = lambda a: jax.lax.slice_in_dim(a, c * gh, (c + 1) * gh, axis=1)
    sl_vec = lambda a: jax.lax.slice_in_dim(a, c * gh, (c + 1) * gh, axis=0)
    wqc, sqc, bqc = sl_col(wq), sl_vec(sq), sl_vec(bq)
    wkc, skc, bkc = sl_col(wk), sl_vec(sk), sl_vec(bk)
    wvc, svc, bvc = sl_col(wv), sl_vec(sv), sl_vec(bv)
    woc = jax.lax.slice_in_dim(wo, c * gh, (c + 1) * gh, axis=0)
    first = c == 0
    operands = ([x] + ([] if first else [out])
                + [mask, ln_scale, ln_bias,
                   wqc, sqc, bqc, wkc, skc, bkc, wvc, svc, bvc,
                   woc, so, bo])
    in_specs = ([xspec] + ([] if first else [xspec])
                + [mspec, vec(ln_scale), vec(ln_bias),
                   mat(wqc), vec(sqc), vec(bqc),
                   mat(wkc), vec(skc), vec(bkc),
                   mat(wvc), vec(svc), vec(bvc),
                   mat(woc), vec(so), vec(bo)])
    out = pl.pallas_call(
        functools.partial(
            _attn_int8_chunk_kernel, num_heads=g,
            dim_per_head=dim_per_head, logit_cap=float(logit_cap),
            epsilon=epsilon, query_scale=float(query_scale), first=first,
            partial_out=partial_out, seq_group=sg, mask_per_seq=bm > 1),
        grid=(b // sg,),
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(*operands)
  return out


# ---------------------------------------------------------------------------
# Whole-layer kernel: attention + FFN in ONE pallas_call.  int8 weights
# halve the resident footprint (base layer: 7.1 MB vs 14.2 bf16 — the
# reason the bf16 mono-layer was measured infeasible, docs/DESIGN.md),
# so the full layer's weights + one sequence of activations fit VMEM.
# This removes the attention->FFN x round trip entirely: per layer, x
# streams HBM->VMEM once and the layer output streams back once.  Head
# groups and F chunks are looped INSIDE the kernel (static unroll), so
# chunking costs VMEM pressure only, never extra HBM traffic.
# ---------------------------------------------------------------------------


def _layer_int8_kernel(
    x_ref, mask_ref, pad_ref,
    ln1_s_ref, ln1_b_ref,
    wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
    wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref,
    ln2_s_ref, ln2_b_ref,
    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref, *,
    num_heads: int, dim_per_head: int, logit_cap: float, epsilon: float,
    query_scale: float, activation: str, head_chunks: int, ffn_chunks: int,
):
  """One sequence through a full pre-norm layer, W8A8 end to end.

  Matches the chained two-kernel semantics exactly: attention half =
  ``_attn_int8_chunk_kernel`` math (bf16 round of the half-layer output
  included, so the FFN half sees the same dtype boundary), FFN half =
  ``_ffn_int8_chunk_kernel`` math with the same per-chunk activation
  quantization.
  """
  x = x_ref[0]  # [T, D]
  t, d = x.shape
  nh = num_heads * dim_per_head
  gh = nh // head_chunks
  g = num_heads // head_chunks

  # ---- attention half ----
  h = _ln_f32(x, ln1_s_ref, ln1_b_ref, epsilon)
  h8, hs = quant_rows(h)
  attn_acc = None
  for c in range(head_chunks):
    lo, hi = c * gh, (c + 1) * gh

    def proj(w_ref, s_ref, b_ref):
      acc = jax.lax.dot_general(
          h8, w_ref[:, lo:hi], (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.int32)
      return (acc.astype(jnp.float32) * hs
              * s_ref[lo:hi].astype(jnp.float32)
              + b_ref[lo:hi].astype(jnp.float32))

    q = (proj(wq_ref, sq_ref, bq_ref) * query_scale).astype(x.dtype)
    k = proj(wk_ref, sk_ref, bk_ref).astype(x.dtype)
    v = proj(wv_ref, sv_ref, bv_ref).astype(x.dtype)
    ctx = _heads_attention(q, k, v, mask_ref[0], g, dim_per_head,
                           logit_cap, x.dtype)
    c8, cs = quant_rows(ctx.astype(jnp.float32))
    part = jax.lax.dot_general(
        c8, wo_ref[lo:hi, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * cs * so_ref[:].astype(jnp.float32)
    attn_acc = part if attn_acc is None else attn_acc + part
  x1 = (attn_acc + bo_ref[:].astype(jnp.float32)
        + x.astype(jnp.float32)).astype(x.dtype)

  # ---- FFN half ----
  keep = 1.0 - pad_ref[0].astype(jnp.float32)  # [T, 1]
  h2 = _ln_f32(x1, ln2_s_ref, ln2_b_ref, epsilon)
  h2_8, h2s = quant_rows(h2)
  f = w1_ref.shape[1]
  fc = f // ffn_chunks
  ffn_acc = None
  for c in range(ffn_chunks):
    lo, hi = c * fc, (c + 1) * fc
    a = jax.lax.dot_general(
        h2_8, w1_ref[:, lo:hi], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * h2s * s1_ref[lo:hi].astype(jnp.float32)
    a = _apply_activation(a + b1_ref[lo:hi].astype(jnp.float32),
                          activation, out_dtype=x.dtype)
    a = a * keep
    a8, as_ = quant_rows(a)
    part = jax.lax.dot_general(
        a8, w2_ref[lo:hi, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * as_ * s2_ref[:].astype(jnp.float32)
    ffn_acc = part if ffn_acc is None else ffn_acc + part
  out = ((ffn_acc + b2_ref[:].astype(jnp.float32)) * keep
         + x1.astype(jnp.float32))
  o_ref[0] = out.astype(o_ref.dtype)


# Hardware-calibrated (one tunneled v5e-class chip, base geometry;
# re-run scripts/smoke_vmem.py after changing either constant):
#   * _LAYER_BUDGET: total peak the formula may reach and still compile
#     — (hc=2, fc=1) at t=256/d=768/f=3072 lands at 16.8 MB by this
#     model and runs; Mosaic's liveness reuse between the attention and
#     FFN halves is what makes the mono kernel viable at all.
#   * _LAYER_ATTN_GROUP_CAP: per-head-group transient ceiling.  Fitting
#     is not the whole story — t=256 with hc=1 (4.4 MB group) compiles
#     but runs 9% SLOWER than hc=2 (2.3 MB): past ~2.5 MB the group's
#     q/k/v temporaries crowd the double-buffered pipeline.  Measured
#     per-layer (b64/b1/temporal): chain 2.82/2.61/3.26 ms vs mono
#     2.50/1.75/2.53 ms.
_LAYER_BUDGET = 17 * 2**20
_LAYER_ATTN_GROUP_CAP = int(2.5 * 2**20)


def _layer_int8_cfg(t: int, d: int, nh_total: int, f: int,
                    num_heads: int, act_itemsize: int
                    ) -> tuple[int, int] | None:
  """(head_chunks, ffn_chunks) for the mono-layer kernel, or None.

  Peak model: resident int8 weights + persistent activations (x/out
  pipeline buffers, mask, h8, the bf16 half-layer output) + the larger
  of the attention-group / FFN-chunk transient sets (Mosaic's VMEM
  allocator reuses dead buffers between the two halves).  Head chunks
  are chosen by the measured group cap, FFN chunks as few as fit.
  """
  if not (t % 8 == 0 and t <= 1024 and d % 128 == 0
          and nh_total % 128 == 0 and f % 128 == 0):
    return None
  weights = 4 * d * nh_total + 2 * d * f  # int8, single-buffered
  persistent = (
      2 * 2 * t * d * act_itemsize   # x + out, double-buffered pipeline
      + 2 * t * t * 4                # mask (double-buffered)
      + t * d * 5                    # h fp32 + h8 int8 (live through attn)
      + t * d * act_itemsize         # x1 (bf16 half-layer output)
      + t * d * 4)                   # running fp32 accumulator

  def attn_peak(gh):
    return (3 * t * gh * (4 + act_itemsize)  # q/k/v fp32 + casts
            + t * t * 4                      # logits/probs
            + t * gh * (act_itemsize + 1))   # ctx + ctx int8

  head_chunks = None
  for hc in (1, 2, 4):
    if num_heads % hc or (nh_total // hc) % 128:
      continue
    if attn_peak(nh_total // hc) <= _LAYER_ATTN_GROUP_CAP:
      head_chunks = hc
      break
  if head_chunks is None:
    return None
  for fcks in (1, 2, 4, 8):
    if f % fcks or (f // fcks) % 128:
      continue
    ffn_peak = t * (f // fcks) * (4 + act_itemsize + 1)
    if (weights + persistent
        + max(attn_peak(nh_total // head_chunks), ffn_peak)
        <= _LAYER_BUDGET):
      return head_chunks, fcks
  return None


def int8_layer_supported(t: int, d: int, nh_total: int, f: int,
                         num_heads: int, act_itemsize: int) -> bool:
  return _layer_int8_cfg(t, d, nh_total, f, num_heads,
                         act_itemsize) is not None


@functools.partial(jax.jit, static_argnames=(
    'num_heads', 'dim_per_head', 'logit_cap', 'epsilon', 'query_scale',
    'activation', 'head_chunks', 'ffn_chunks', 'interpret'))
def int8_layer_block(
    x: Array,          # [B, T, D]
    mask: Array,       # [B|1, T|1, T] additive fp32
    paddings: Array,   # [B, T, 1]
    ln1_scale: Array, ln1_bias: Array,
    wq: Array, sq: Array, bq: Array,   # int8 [D, N*H], fp32 [N*H], [N*H]
    wk: Array, sk: Array, bk: Array,
    wv: Array, sv: Array, bv: Array,
    wo: Array, so: Array, bo: Array,   # int8 [N*H, D], fp32 [D], [D]
    ln2_scale: Array, ln2_bias: Array,
    w1: Array, s1: Array, b1: Array,   # int8 [D, F], fp32 [F], [F]
    w2: Array, s2: Array, b2: Array,   # int8 [F, D], fp32 [D], [D]
    *,
    num_heads: int,
    dim_per_head: int,
    logit_cap: float = 0.0,
    epsilon: float = 1e-6,
    query_scale: float = 1.0,
    activation: str = 'gelu',
    head_chunks: int | None = None,
    ffn_chunks: int | None = None,
    interpret: bool = False,
) -> Array:
  """Full pre-norm transformer layer in one kernel; see module comment."""
  b, t, d = x.shape
  bm, tm, _ = mask.shape
  nh = wq.shape[1]
  f = w1.shape[1]
  if head_chunks is None or ffn_chunks is None:
    cfg = _layer_int8_cfg(t, d, nh, f, num_heads, x.dtype.itemsize)
    assert cfg is not None, (t, d, nh, f)
    head_chunks, ffn_chunks = cfg

  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  xspec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  mspec = pl.BlockSpec((1, tm, t), lambda i: (i if bm > 1 else 0, 0, 0),
                       memory_space=pltpu.VMEM)
  pspec = pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  return pl.pallas_call(
      functools.partial(
          _layer_int8_kernel, num_heads=num_heads,
          dim_per_head=dim_per_head, logit_cap=float(logit_cap),
          epsilon=epsilon, query_scale=float(query_scale),
          activation=activation, head_chunks=head_chunks,
          ffn_chunks=ffn_chunks),
      grid=(b,),
      in_specs=[xspec, mspec, pspec,
                vec(ln1_scale), vec(ln1_bias),
                mat(wq), vec(sq), vec(bq),
                mat(wk), vec(sk), vec(bk),
                mat(wv), vec(sv), vec(bv),
                mat(wo), vec(so), vec(bo),
                vec(ln2_scale), vec(ln2_bias),
                mat(w1), vec(s1), vec(b1),
                mat(w2), vec(s2), vec(b2)],
      out_specs=xspec,
      out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )(x, mask, paddings, ln1_scale, ln1_bias,
    wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo,
    ln2_scale, ln2_bias, w1, s1, b1, w2, s2, b2)


# ---------------------------------------------------------------------------
# Long-sequence attention (e.g. the 4096-token CLIP auxiliary encoder,
# reference videoprism/encoders.py:846-857): the whole-sequence block
# kernel above caps T at 1024, so long geometries quantize only the
# PROJECTIONS (row-blocked over T like the FFN kernels — any T) and run
# the attention core through the bf16 flash kernel, which already streams
# T=4096.  Weights stay int8 end-to-end; nothing dequantizes in the
# per-step graph (the round-2 fallback re-dequantized every forward).
# ---------------------------------------------------------------------------


def _qkv_int8_kernel(
    x_ref, ln_s_ref, ln_b_ref,
    wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
    wv_ref, sv_ref, bv_ref, q_ref, k_ref, v_ref, *,
    epsilon: float, query_scale: float,
):
  x = x_ref[:]
  h = _ln_f32(x, ln_s_ref, ln_b_ref, epsilon)
  h8, hs = quant_rows(h)

  def proj(w_ref, s_ref, b_ref):
    acc = jax.lax.dot_general(
        h8, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * hs * s_ref[:].astype(jnp.float32)
            + b_ref[:].astype(jnp.float32))

  q_ref[:] = (proj(wq_ref, sq_ref, bq_ref) * query_scale).astype(q_ref.dtype)
  k_ref[:] = proj(wk_ref, sk_ref, bk_ref).astype(k_ref.dtype)
  v_ref[:] = proj(wv_ref, sv_ref, bv_ref).astype(v_ref.dtype)


def _out_int8_kernel(
    ctx_ref, resid_ref, wo_ref, so_ref, bo_ref, o_ref, *,
    partial_out: bool,
):
  c8, cs = quant_rows(ctx_ref[:].astype(jnp.float32))
  acc = jax.lax.dot_general(
      c8, wo_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.int32)
  out = acc.astype(jnp.float32) * cs * so_ref[:].astype(jnp.float32)
  if not partial_out:
    # partial_out: the tensor-parallel caller psums per-shard projections
    # first, then adds bias and residual exactly once.
    out = out + bo_ref[:].astype(jnp.float32) + resid_ref[:].astype(
        jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype)


def _qkv_int8_row_block(rows: int, d: int, nh: int,
                        act_itemsize: int) -> int | None:
  weights = 3 * d * nh  # int8, single-buffered
  for block in (512, 256, 128, 64, 32, 16, 8):
    if rows % block:
      continue
    io = 2 * (block * d + 3 * block * nh) * act_itemsize
    # fp32 h + int8 h8 + 3x fp32 projection accumulators
    temps = block * d * 5 + 3 * block * nh * 4
    if weights + io + temps <= _INT8_BUDGET:
      return block
  return None


def _out_int8_row_block(rows: int, nh: int, d: int,
                        act_itemsize: int) -> int | None:
  weights = nh * d
  for block in (512, 256, 128, 64, 32, 16, 8):
    if rows % block:
      continue
    io = 2 * (block * nh + 2 * block * d) * act_itemsize
    temps = block * nh * 5 + block * d * 4
    if weights + io + temps <= _INT8_BUDGET:
      return block
  return None


def attn_int8_projection_supported(rows: int, d: int, nh: int,
                                   act_itemsize: int) -> bool:
  return (
      d % 128 == 0 and nh % 128 == 0
      and _qkv_int8_row_block(rows, d, nh, act_itemsize) is not None
      and _out_int8_row_block(rows, nh, d, act_itemsize) is not None)


@functools.partial(jax.jit, static_argnames=(
    'epsilon', 'query_scale', 'interpret'))
def int8_qkv_projection(
    x: Array,                          # [rows, D]
    ln_scale: Array, ln_bias: Array,   # [D]
    wq: Array, sq: Array, bq: Array,   # int8 [D, N*H], fp32 [N*H], [N*H]
    wk: Array, sk: Array, bk: Array,
    wv: Array, sv: Array, bv: Array,
    *,
    epsilon: float = 1e-6,
    query_scale: float = 1.0,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
  """Fused LN + W8A8 q/k/v projections, row-blocked (any sequence length).

  One LN + one activation quantization feeds all three matmuls; the
  query scale is folded into q (so the attention core takes q as-is)."""
  rows, d = x.shape
  nh = wq.shape[1]
  block = _qkv_int8_row_block(rows, d, nh, x.dtype.itemsize)
  assert block is not None, (rows, d, nh)
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  rowspec_d = pl.BlockSpec((block, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
  rowspec_nh = pl.BlockSpec((block, nh), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
  out = jax.ShapeDtypeStruct((rows, nh), x.dtype)
  return pl.pallas_call(
      functools.partial(_qkv_int8_kernel, epsilon=epsilon,
                        query_scale=float(query_scale)),
      grid=(rows // block,),
      in_specs=[rowspec_d, vec(ln_scale), vec(ln_bias),
                mat(wq), vec(sq), vec(bq),
                mat(wk), vec(sk), vec(bk),
                mat(wv), vec(sv), vec(bv)],
      out_specs=(rowspec_nh, rowspec_nh, rowspec_nh),
      out_shape=(out, out, out),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )(x, ln_scale, ln_bias, wq, sq, bq, wk, sk, bk, wv, sv, bv)


@functools.partial(jax.jit, static_argnames=('partial_out', 'interpret'))
def int8_out_projection(
    ctx: Array,                        # [rows, N*H]
    resid: Array,                      # [rows, D] (pre-attention input)
    wo: Array, so: Array, bo: Array,   # int8 [N*H, D], fp32 [D], [D]
    *,
    partial_out: bool = False,
    interpret: bool = False,
) -> Array:
  """W8A8 attention output projection (+ bias + residual), row-blocked."""
  rows, nh = ctx.shape
  d = wo.shape[1]
  block = _out_int8_row_block(rows, nh, d, resid.dtype.itemsize)
  assert block is not None, (rows, nh, d)
  vec = lambda a: pl.BlockSpec((a.shape[-1],), lambda i: (0,),
                               memory_space=pltpu.VMEM)
  mat = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  # partial_out kernels never read resid: keep its pipeline block at one
  # row (constant index map) so no [rows, D] stream is wasted on it.
  resid_spec = (
      pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
      if partial_out else
      pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM))
  return pl.pallas_call(
      functools.partial(_out_int8_kernel, partial_out=partial_out),
      grid=(rows // block,),
      in_specs=[pl.BlockSpec((block, nh), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                resid_spec,
                mat(wo), vec(so), vec(bo)],
      out_specs=pl.BlockSpec((block, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((rows, d), resid.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary',)),
      interpret=interpret,
  )(ctx, resid, wo, so, bo)


def int8_projected_flash_attention(
    x: Array,            # [B, T, D]
    atten_mask: Array,   # [B|1, 1, T|1, T] additive fp32
    ln_scale: Array, ln_bias: Array,
    wq: Array, sq: Array, bq: Array,   # int8 [D, N*H] + fp32 scales/biases
    wk: Array, sk: Array, bk: Array,
    wv: Array, sv: Array, bv: Array,
    wo: Array, so: Array, bo: Array,   # int8 [N*H, D]
    *,
    num_heads: int,
    dim_per_head: int,
    logit_cap: float = 0.0,
    epsilon: float = 1e-6,
    query_scale: float = 1.0,
    partial_out: bool = False,
    interpret: bool = False,
) -> Array:
  """Full attention half for sequences beyond the block kernel's T cap:
  int8 LN+QKV projection -> bf16 flash core -> int8 output projection.

  Returns ``x + attn(x)`` (or the raw per-shard projection when
  ``partial_out`` — the TP caller psums, then adds bias + residual)."""
  from videoprism_tpu.ops.pallas import flash_attention as flash

  b, t, d = x.shape
  n, h = num_heads, dim_per_head
  rows = b * t
  x2d = x.reshape(rows, d)
  q, k, v = int8_qkv_projection(
      x2d, ln_scale, ln_bias, wq, sq, bq, wk, sk, bk, wv, sv, bv,
      epsilon=epsilon, query_scale=query_scale, interpret=interpret)
  to_heads = lambda a: a.reshape(b, t, n, h).transpose(0, 2, 1, 3)
  encoded = flash.flash_attention_head_major(
      to_heads(q), to_heads(k), to_heads(v), atten_mask,
      logit_cap=logit_cap, dtype=x.dtype, interpret=interpret)
  ctx = encoded.transpose(0, 2, 1, 3).reshape(rows, n * h)
  out = int8_out_projection(
      ctx, x2d, wo, so, bo, partial_out=partial_out, interpret=interpret)
  return out.reshape(b, t, d)
