"""Pallas TPU fused attention with tanh logit soft-cap.

Why a custom kernel: stock flash attention cannot express VideoPrism's
attention — the ``cap * tanh(logits / cap)`` soft-cap must hit the logits
*before* masking and the fp32 softmax (reference videoprism/layers.py:586-654)
— and the XLA fallback materializes the [B, N, T, S] fp32 logits/probs
tensors in HBM (≈50 MB per spatial layer for one 16-frame clip), making the
hot spatial stack bandwidth-bound.

Kernel shape: grid ``(B, N, T/blk)``; each program holds one query block and
the FULL key/value sequence in VMEM (every VideoPrism attention has S ≤ 4096,
so K/V fit comfortably in the 16 MB VMEM), computes fp32 logits on the MXU,
applies cap → select-mask → exact fp32 softmax on the VPU, and writes only
the [T, H] output — probs never leave VMEM.  K/V blocks are revisited across
the T-block grid dimension, so Pallas's pipeliner keeps them resident.

Numerics match the XLA path bit-for-bit in fp32 (same op order); in bf16 the
kernel is slightly *more* accurate (logits stay fp32 instead of rounding to
bf16 between the matmul and the cap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def supports(t: int, s: int, block_t: int = 128) -> bool:
  """Whether the kernel handles this (T, S) without padding logic.

  Small sequences (temporal T=16, text L=65, 1-query poolers) stay on the
  XLA path where they are already fast and VPU-lane-efficient.
  """
  return t % block_t == 0 and s % 128 == 0 and s >= 128


def _attention_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *, logit_cap: float
):
  q = q_ref[0]  # [n_blk, blk_t, H]
  k = k_ref[0]  # [n_blk, S, H]
  v = v_ref[0]  # [n_blk, S, H]

  # Batched-over-heads Q K^T on the MXU, fp32 accumulation.
  logits = jax.lax.dot_general(
      q, k, (((2,), (2,)), ((0,), (0,))),
      preferred_element_type=jnp.float32,
  )  # [n_blk, blk_t, S]

  # Soft cap BEFORE masking (reference videoprism/layers.py:592 note).
  if logit_cap > 0.0:
    logits = logit_cap * jnp.tanh(logits * (1.0 / logit_cap))

  # Select-mask: shared across heads; rows broadcast if size-1.
  mask = mask_ref[0]  # [blk_t | 1, S]
  ok = mask[None] >= _NEG_INF * 0.5

  # Exact fp32 softmax (S is fully resident — no online rescaling needed).
  if logit_cap > 0.0:
    # Capped logits are bounded by ±cap, so exp cannot overflow fp32:
    # skip the row-max pass and zero masked entries directly.  Fully-masked
    # (padded) rows must match the reference's softmax-of-all-(-0.7max)
    # behavior — uniform 1/S — not 0/0 NaN or zeros.
    unnorm = jnp.where(ok, jnp.exp(logits), 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    s = unnorm.shape[-1]
    unnorm = jnp.where(denom == 0.0, 1.0, unnorm)
    denom = jnp.where(denom == 0.0, float(s), denom)
  else:
    logits = jnp.where(ok, logits, _NEG_INF)
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - row_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
  probs = (unnorm / denom).astype(v.dtype)

  out = jax.lax.dot_general(
      probs, v, (((2,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32,
  )  # [n_blk, blk_t, H]
  o_ref[0] = out.astype(o_ref.dtype)


def _pick_head_block(n: int, s: int, h: int, block_t: int,
                     itemsize: int, budget_bytes: int = 6 * 2**20) -> int:
  """Largest divisor of N whose working set fits the VMEM budget.

  Per-program bytes ≈ 2·(q + k + v) [double-buffered] + fp32 logits.
  """
  for n_blk in range(n, 0, -1):
    if n % n_blk:
      continue
    qkv = (n_blk * block_t * h + 2 * n_blk * s * h) * itemsize * 2
    logits = n_blk * block_t * s * 4
    if qkv + logits <= budget_bytes:
      return n_blk
  return 1


@functools.partial(
    jax.jit, static_argnames=('logit_cap', 'block_t', 'interpret'))
def fused_attention(
    q: Array,       # [B, N, T, H]
    k: Array,       # [B, N, S, H]
    v: Array,       # [B, N, S, H]
    mask: Array,    # [B|1, T|1, S] additive (-0.7*max = masked)
    *,
    logit_cap: float = 0.0,
    block_t: int = 128,
    interpret: bool = False,
) -> Array:
  """Head-major fused attention; returns [B, N, T, H] in q.dtype."""
  b, n, t, h = q.shape
  s = k.shape[2]
  assert t % block_t == 0 and s % 128 == 0, (t, s)
  bm, tm, _ = mask.shape

  n_blk = _pick_head_block(n, s, h, block_t, q.dtype.itemsize)
  grid = (b, n // n_blk, t // block_t)

  q_spec = pl.BlockSpec(
      (1, n_blk, block_t, h), lambda bi, ni, ti: (bi, ni, ti, 0),
      memory_space=pltpu.VMEM)
  kv_spec = pl.BlockSpec(
      (1, n_blk, s, h), lambda bi, ni, ti: (bi, ni, 0, 0),
      memory_space=pltpu.VMEM)
  mask_spec = pl.BlockSpec(
      (1, block_t if tm > 1 else 1, s),
      lambda bi, ni, ti: (bi if bm > 1 else 0, ti if tm > 1 else 0, 0),
      memory_space=pltpu.VMEM)
  o_spec = pl.BlockSpec(
      (1, n_blk, block_t, h), lambda bi, ni, ti: (bi, ni, ti, 0),
      memory_space=pltpu.VMEM)

  flops = 2 * b * n * t * s * h * 2  # qk^T + probs@v
  bytes_accessed = (
      q.size * q.dtype.itemsize + 2 * k.size * k.dtype.itemsize
      + mask.size * 4 + q.size * q.dtype.itemsize)

  return pl.pallas_call(
      functools.partial(_attention_kernel, logit_cap=float(logit_cap)),
      grid=grid,
      in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
      out_specs=o_spec,
      out_shape=jax.ShapeDtypeStruct((b, n, t, h), q.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel', 'arbitrary', 'arbitrary'),
      ),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=bytes_accessed,
          transcendentals=b * n * t * s * (2 if logit_cap > 0 else 1)),
      interpret=interpret,
  )(q, k, v, mask)


def _packed_small_seq_attention(
    query: Array, key: Array, value: Array, atten_mask: Array,
    *, logit_cap: float, dtype, interpret: bool,
) -> Array | None:
  """Packs G = 128/T short self-attention sequences per 128-row MXU block.

  VideoPrism's temporal attention is thousands of independent 16-token
  sequences: as individual batched matmuls they run ~300x below MXU peak
  (16 of 128 systolic rows live).  Packing G sequences into one block with
  a block-diagonal mask trades 8x redundant (cross-sequence, masked-out)
  FLOPs for full-width matmuls — a large net win since these FLOPs are
  trivial.  Returns None when the geometry doesn't pack cleanly.
  """
  b, n, t, h = query.shape
  s = key.shape[2]
  if t != s or t < 8 or t >= 128 or 128 % t or b % (128 // t):
    return None
  g = 128 // t
  bg = b // g

  # [B|1, 1, T|1, S] -> dense [B, T, S] -> per-group block-diagonal
  # [B/G, G*T, G*S] (off-diagonal blocks = large-negative = masked).
  m = jnp.broadcast_to(
      jnp.squeeze(atten_mask, axis=1).astype(jnp.float32), (b, t, s))
  m = m.reshape(bg, g, t, s)
  same_group = jnp.eye(g, dtype=bool)[None, :, None, :, None]
  packed_mask = jnp.where(same_group, m[:, :, :, None, :], _NEG_INF)
  packed_mask = packed_mask.reshape(bg, g * t, g * s)

  def pack(x):
    return (x.reshape(bg, g, n, t, h)
            .transpose(0, 2, 1, 3, 4)
            .reshape(bg, n, g * t, h))

  out = fused_attention(
      pack(query), pack(key), pack(value), packed_mask,
      logit_cap=logit_cap, block_t=128, interpret=interpret)
  out = (out.reshape(bg, n, g, t, h)
         .transpose(0, 2, 1, 3, 4)
         .reshape(b, n, t, h))
  return out.astype(dtype)


@functools.lru_cache(maxsize=None)
def _attention_vjp(logit_cap: float, dtype_name: str, block_t: int,
                   interpret: bool, packed: bool):
  """custom_vjp wrapper: fused-kernel forward, composed-XLA backward.

  The kernel has no transpose rules; differentiating through the composed
  twin (same math) makes the fused path trainable — the backward replays
  the composed ops, which is exactly what rematerialized training does
  anyway.
  """
  import numpy as np

  dtype = jnp.dtype(dtype_name)

  def kernel_fwd(q, k, v, mask):
    if packed:
      return _packed_small_seq_attention(
          q, k, v, mask, logit_cap=logit_cap, dtype=dtype,
          interpret=interpret)
    m = jnp.squeeze(mask, axis=1).astype(jnp.float32)
    return fused_attention(
        q, k, v, m, logit_cap=logit_cap, block_t=block_t,
        interpret=interpret).astype(dtype)

  def composed(q, k, v, mask):
    from videoprism_tpu.ops import attention as attention_lib

    return attention_lib._dot_atten_head_major(
        q, k, v, mask, logit_cap=logit_cap, dtype=dtype)

  f = jax.custom_vjp(kernel_fwd)

  def fwd(q, k, v, mask):
    return kernel_fwd(q, k, v, mask), (q, k, v, mask)

  def bwd(residuals, g):
    q, k, v, mask = residuals
    _, vjp_fn = jax.vjp(composed, q, k, v, mask)
    return vjp_fn(g)

  f.defvjp(fwd, bwd)
  return f


def flash_attention_head_major(
    query: Array,       # [B, N, T, H] (post per-dim/rsqrt query scaling)
    key: Array,         # [B, N, S, H]
    value: Array,       # [B, N, S, H]
    atten_mask: Array,  # [B|1, 1, T|1, S] additive mask
    *,
    logit_cap: float = 0.0,
    dtype=jnp.float32,
    block_t: int = 128,
    interpret: bool = False,
) -> Array:
  """Head-major fused attention with XLA fallback for unsupported shapes.

  This is the zero-transpose path used by
  :func:`videoprism_tpu.ops.attention.multi_head_attention`.  Trainable:
  forward runs the kernel, backward differentiates the composed twin.
  """
  b, n, t, h = query.shape
  s = key.shape[2]
  use_packed = False
  if not supports(t, s, block_t):
    use_packed = (
        t == s and 8 <= t < 128 and 128 % t == 0 and b % (128 // t) == 0)
    if not use_packed:
      from videoprism_tpu.ops import attention as attention_lib

      return attention_lib._dot_atten_head_major(
          query, key, value, atten_mask, logit_cap=logit_cap, dtype=dtype)

  f = _attention_vjp(float(logit_cap), jnp.dtype(dtype).name, block_t,
                     interpret, use_packed)
  return f(query, key, value, atten_mask)


def flash_attention(
    query: Array,       # [B, T, N, H] (post per-dim/rsqrt query scaling)
    key: Array,         # [B, S, N, H]
    value: Array,       # [B, S, N, H]
    atten_mask: Array,  # [B|1, 1, T|1, S] additive mask
    *,
    logit_cap: float = 0.0,
    dtype=jnp.float32,
    block_t: int = 128,
    interpret: bool = False,
) -> Array:
  """BTNH-layout convenience wrapper around the head-major kernel
  (drop-in for :func:`videoprism_tpu.ops.attention.dot_atten`'s encoded
  output)."""
  out = flash_attention_head_major(
      jnp.transpose(query, (0, 2, 1, 3)),
      jnp.transpose(key, (0, 2, 1, 3)),
      jnp.transpose(value, (0, 2, 1, 3)),
      atten_mask, logit_cap=logit_cap, dtype=dtype, block_t=block_t,
      interpret=interpret)
  return jnp.transpose(out, (0, 2, 1, 3))
