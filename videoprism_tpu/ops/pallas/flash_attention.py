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


# ---------------------------------------------------------------------------
# Backward kernel: flash-style attention dgrad.
#
# The composed backward materializes four [B, N, T, S] fp32 tensors in HBM
# (probs in the replayed forward, then dprobs/dlogits chains) — ~400 MB per
# spatial layer for one 2-clip step on an activation-bandwidth-bound chip.
# This kernel recomputes probs per (head-group, T-block) entirely in VMEM,
# emits dq per block, and accumulates dk/dv in fp32 scratch across T-blocks
# (flushed once per (batch, head-group)).  Softmax statistics are recomputed
# rather than saved: S is fully resident (every VideoPrism attention has
# S <= 4096), so no online-softmax bookkeeping is needed.
# ---------------------------------------------------------------------------


def _attention_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, mask_ref,
    *refs,
    logit_cap: float, t_steps: int, with_ctx: bool,
):
  if with_ctx:
    ctx_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
  else:
    dq_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
  ti = pl.program_id(2)

  @pl.when(ti == 0)
  def _init():
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

  q = q_ref[0]    # [n_blk, t_blk, H]
  k = k_ref[0]    # [n_blk, S, H]
  v = v_ref[0]
  do = do_ref[0]  # [n_blk, t_blk, H]
  mask = mask_ref[0]                      # [t_blk | 1, S] fp32 additive
  ok = (mask >= _NEG_INF * 0.5)[None]     # broadcasts over the head dim

  # Recompute probs exactly as the forward kernel does (same op order, so
  # the recomputed values match the primal bit-for-bit in fp32).
  logits = jax.lax.dot_general(
      q, k, (((2,), (2,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [n_blk, t_blk, S]
  if logit_cap > 0.0:
    tanh_t = jnp.tanh(logits * (1.0 / logit_cap))
    unnorm = jnp.where(ok, jnp.exp(logit_cap * tanh_t), 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    s_count = float(unnorm.shape[-1])
    unnorm = jnp.where(denom == 0.0, 1.0, unnorm)
    denom = jnp.where(denom == 0.0, s_count, denom)
  else:
    lm = jnp.where(ok, logits, _NEG_INF)
    row_max = jnp.max(lm, axis=-1, keepdims=True)
    unnorm = jnp.exp(lm - row_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
  probs = unnorm / denom                  # fp32 [n_blk, t_blk, S]

  # dv = probs^T @ do  (probs cast to the compute dtype first, mirroring
  # the forward's probs.astype before the PV matmul).
  probs_c = probs.astype(v.dtype)
  if with_ctx:
    # Recompute the forward's context here too: the block-level backward
    # needs ctx for the output-projection weight grad, and emitting it from
    # this kernel saves an entire forward-kernel replay (in particular its
    # second tanh+exp pass — the dominant VPU cost at these shapes).
    ctx_ref[0] = jax.lax.dot_general(
        probs_c, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(ctx_ref.dtype)
  dv_acc[...] += jax.lax.dot_general(
      probs_c, do, (((1,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [n_blk, S, H]

  # dprobs = do @ v^T; softmax vjp; entries that were masked (or whole
  # fully-masked padded rows, which the forward renders as uniform 1/S)
  # receive zero gradient — matching jax.vjp through the where-selects.
  dp = jax.lax.dot_general(
      do, v, (((2,), (2,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [n_blk, t_blk, S]
  row_dot = jnp.sum(dp * probs, axis=-1, keepdims=True)
  dl = probs * (dp - row_dot)
  dl = jnp.where(ok, dl, 0.0)
  if logit_cap > 0.0:
    # d/dl [cap * tanh(l / cap)] = 1 - tanh^2(l / cap).
    dl = dl * (1.0 - tanh_t * tanh_t)
  dl_c = dl.astype(q.dtype)

  dq_ref[0] = jax.lax.dot_general(
      dl_c, k, (((2,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32).astype(dq_ref.dtype)
  dk_acc[...] += jax.lax.dot_general(
      dl_c, q, (((1,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)  # [n_blk, S, H]

  @pl.when(ti == t_steps - 1)
  def _flush():
    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


_BWD_BUDGET = 12 * 2**20


def _bwd_blocks(t: int, s: int, h: int, n: int,
                itemsize: int) -> tuple[int, int] | None:
  """(n_blk, t_blk) whose backward working set fits VMEM, or None."""
  for t_blk in (512, 256, 128):
    if t % t_blk:
      continue
    for n_blk in range(n, 0, -1):
      if n % n_blk:
        continue
      kv = 2 * 2 * n_blk * s * h * itemsize          # k, v (double-buffered)
      acc = 2 * n_blk * s * h * 4                    # dk/dv fp32 scratch
      blocks = 3 * 2 * n_blk * t_blk * h * itemsize  # q, do, dq
      temps = 3 * n_blk * t_blk * s * 4              # probs/dp/dl fp32
      if kv + acc + blocks + temps <= _BWD_BUDGET:
        return n_blk, t_blk
  return None


def bwd_supported(t: int, s: int, h: int, n: int, itemsize: int) -> bool:
  """Whether the backward kernel handles this geometry (same alignment
  rules as the forward, plus the VMEM fit of the dk/dv accumulators)."""
  return (t % 128 == 0 and s % 128 == 0 and s >= 128
          and _bwd_blocks(t, s, h, n, itemsize) is not None)


@functools.partial(jax.jit, static_argnames=(
    'logit_cap', 'with_ctx', 'interpret'))
def fused_attention_bwd(
    q: Array,       # [B, N, T, H] (as given to the forward kernel)
    k: Array,       # [B, N, S, H]
    v: Array,       # [B, N, S, H]
    mask: Array,    # [B|1, T|1, S] additive fp32
    do: Array,      # [B, N, T, H] output cotangent
    *,
    logit_cap: float = 0.0,
    with_ctx: bool = False,
    interpret: bool = False,
):
  """dq/dk/dv for :func:`fused_attention` without HBM probs traffic.

  ``with_ctx=True`` additionally emits the forward's context (probs @ v)
  from the same pass — (ctx, dq, dk, dv) — so a hand-written block
  backward never replays the forward kernel (one transcendental pass
  total instead of two).
  """
  b, n, t, h = q.shape
  s = k.shape[2]
  bm, tm, _ = mask.shape
  blocks = _bwd_blocks(t, s, h, n, q.dtype.itemsize)
  assert blocks is not None, (t, s, h, n)
  n_blk, t_blk = blocks
  t_steps = t // t_blk
  grid = (b, n // n_blk, t_steps)

  tq_spec = pl.BlockSpec(
      (1, n_blk, t_blk, h), lambda bi, ni, ti: (bi, ni, ti, 0),
      memory_space=pltpu.VMEM)
  kv_spec = pl.BlockSpec(
      (1, n_blk, s, h), lambda bi, ni, ti: (bi, ni, 0, 0),
      memory_space=pltpu.VMEM)
  mask_spec = pl.BlockSpec(
      (1, t_blk if tm > 1 else 1, s),
      lambda bi, ni, ti: (bi if bm > 1 else 0, ti if tm > 1 else 0, 0),
      memory_space=pltpu.VMEM)

  flops = (5 + with_ctx) * 2 * b * n * t * s * h
  bytes_accessed = (3 * q.size + 4 * k.size) * q.dtype.itemsize

  out_specs = [tq_spec, kv_spec, kv_spec]
  out_shape = [
      jax.ShapeDtypeStruct((b, n, t, h), q.dtype),
      jax.ShapeDtypeStruct((b, n, s, h), k.dtype),
      jax.ShapeDtypeStruct((b, n, s, h), v.dtype),
  ]
  if with_ctx:
    out_specs = [tq_spec] + out_specs
    out_shape = [jax.ShapeDtypeStruct((b, n, t, h), q.dtype)] + out_shape

  return pl.pallas_call(
      functools.partial(
          _attention_bwd_kernel, logit_cap=float(logit_cap),
          t_steps=t_steps, with_ctx=with_ctx),
      grid=grid,
      in_specs=[tq_spec, kv_spec, kv_spec, tq_spec, mask_spec],
      out_specs=out_specs,
      out_shape=out_shape,
      scratch_shapes=[
          pltpu.VMEM((n_blk, s, h), jnp.float32),
          pltpu.VMEM((n_blk, s, h), jnp.float32),
      ],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel', 'arbitrary', 'arbitrary')),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=bytes_accessed,
          transcendentals=b * n * t * s * (2 if logit_cap > 0 else 1)),
      interpret=interpret,
  )(q, k, v, do, mask)


def _pack_heads(x: Array, g: int) -> Array:
  """[B, N, T, H] -> [B/G, N, G*T, H] (G short sequences per MXU block)."""
  b, n, t, h = x.shape
  return (x.reshape(b // g, g, n, t, h)
          .transpose(0, 2, 1, 3, 4)
          .reshape(b // g, n, g * t, h))


def _unpack_heads(x: Array, g: int, b: int) -> Array:
  bg, n, gt, h = x.shape
  t = gt // g
  return (x.reshape(bg, n, g, t, h)
          .transpose(0, 2, 1, 3, 4)
          .reshape(b, n, t, h))


def _pack_mask(atten_mask: Array, b: int, t: int, s: int, g: int) -> Array:
  """[B|1, 1, T|1, S] -> block-diagonal [B/G, G*T, G*S] (fp32)."""
  m = jnp.broadcast_to(
      jnp.squeeze(atten_mask, axis=1).astype(jnp.float32), (b, t, s))
  m = m.reshape(b // g, g, t, s)
  same_group = jnp.eye(g, dtype=bool)[None, :, None, :, None]
  packed = jnp.where(same_group, m[:, :, :, None, :], _NEG_INF)
  return packed.reshape(b // g, g * t, g * s)


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

  packed_mask = _pack_mask(atten_mask, b, t, s, g)
  out = fused_attention(
      _pack_heads(query, g), _pack_heads(key, g), _pack_heads(value, g),
      packed_mask, logit_cap=logit_cap, block_t=128, interpret=interpret)
  return _unpack_heads(out, g, b).astype(dtype)


@functools.lru_cache(maxsize=None)
def _attention_vjp(logit_cap: float, dtype_name: str, block_t: int,
                   interpret: bool, packed: bool):
  """custom_vjp wrapper: fused-kernel forward, fused-kernel backward.

  The backward runs :func:`fused_attention_bwd` (probs recomputed in VMEM,
  never streamed through HBM) whenever the geometry supports it, falling
  back to differentiating the composed twin otherwise.  The mask cotangent
  is zero on the kernel path — masks derive from paddings, which are never
  trained.
  """
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
    b, n, t, h = q.shape
    s = k.shape[2]
    itemsize = q.dtype.itemsize
    if packed:
      gsz = 128 // t
      if bwd_supported(gsz * t, gsz * s, h, n, itemsize):
        dq, dk, dv = fused_attention_bwd(
            _pack_heads(q, gsz), _pack_heads(k, gsz), _pack_heads(v, gsz),
            _pack_mask(mask, b, t, s, gsz), _pack_heads(g.astype(q.dtype),
                                                        gsz),
            logit_cap=logit_cap, interpret=interpret)
        return (_unpack_heads(dq, gsz, b), _unpack_heads(dk, gsz, b),
                _unpack_heads(dv, gsz, b), jnp.zeros_like(mask))
    elif bwd_supported(t, s, h, n, itemsize):
      m = jnp.squeeze(mask, axis=1).astype(jnp.float32)
      dq, dk, dv = fused_attention_bwd(
          q, k, v, m, g.astype(q.dtype),
          logit_cap=logit_cap, interpret=interpret)
      return dq, dk, dv, jnp.zeros_like(mask)
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
  if not interpret and jax.default_backend() != 'tpu':
    # Off-TPU (and not interpreting): impl='flash' degrades gracefully to
    # the composed math instead of failing to lower the kernel.
    from videoprism_tpu.ops import attention as attention_lib

    return attention_lib._dot_atten_head_major(
        query, key, value, atten_mask, logit_cap=logit_cap, dtype=dtype)
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
