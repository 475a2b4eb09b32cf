"""Transformer block and weight-stacked layer stack.

Functional re-implementation of the reference's ``TransformerFeedForward``,
``Transformer``, ``Repeat`` and ``StackedTransformer``
(videoprism/layers.py:316-430, 749-872, 875-937, 940-1041).

TPU-first design choice: layer stacking is a ``jax.lax.scan`` over parameters
with a **leading layer axis** — the exact layout of the public "repeated"
checkpoints — optionally wrapped in ``jax.checkpoint`` (nothing_saveable) for
rematerialized memory-light training.  Unlike the reference's MLX port, no
per-layer unstacking is ever needed: the checkpoint maps 1:1 onto the scanned
pytree and XLA compiles the stack to a single rolled loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from videoprism_tpu.ops import attention as attention_lib
from videoprism_tpu.ops import basic
from videoprism_tpu.ops import masks as mask_lib

Array = jax.Array
Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TransformerLayerConfig:
  """Static configuration for one transformer layer / a homogeneous stack.

  Field semantics follow reference videoprism/layers.py:749-784 and
  940-986.
  """

  num_layers: int = 0
  hidden_dim: int = 0           # FFN hidden dim.
  num_heads: int = 0
  dim_per_head: int | None = None
  norm_policy: str = 'pre'      # pre | primer_hybrid | post | post_skip
  use_bias: bool = True
  activation: str = 'relu'
  enable_per_dim_scale: bool = True
  logit_cap: float = 0.0
  enable_causal_atten: bool = False
  residual_weight: float = 1.0
  atten_dropout: float = 0.0
  residual_dropout: float = 0.0
  relu_dropout: float = 0.0
  scan: bool = True             # lax.scan over stacked weights vs python loop
  remat: bool = False           # jax.checkpoint around each scanned layer
  attention_impl: str = 'xla'   # 'xla' | 'flash'
  pack_small_sequences: bool = True  # pack G=128/T short seqs per MXU block
  dtype: Any = jnp.float32      # fprop dtype
  # Manual tensor parallelism: set to the mesh axis name when this layer
  # runs inside a shard_map whose params are head-/hidden-sharded over that
  # axis.  The layer then psums the attention output projection and the
  # second FFN matmul — the only two cross-shard contractions — so the
  # fused Pallas kernels (opaque to GSPMD) stay on the per-shard fast path.
  tp_axis: str | None = None
  # Run Pallas kernels in interpret mode off-TPU (multi-device CPU tests).
  kernel_interpret: bool = False


def transformer_ffn(
    params: Params,
    inputs: Array,
    paddings: Array | None,
    cfg: TransformerLayerConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
) -> Array:
  """FFN with residual, norm policy, and padding zeroing.

  Param tree (checkpoint schema)::

      {'layer_norm': {...} | 'pre_layer_norm'/'post_layer_norm': {...},
       'ffn_layer1': {'linear': {'kernel': [D, F], 'bias': [F]}},
       'ffn_layer2': {'linear': {'kernel': [F, D], 'bias': [D]}}}

  Reference: ``TransformerFeedForward`` videoprism/layers.py:370-430.
  """
  dtype = cfg.dtype
  residual = inputs
  if paddings is not None:
    # Match the activation dtype: fp32 paddings would silently promote
    # bf16 activations (and break the scan carry's dtype invariance).
    paddings = jnp.expand_dims(paddings, axis=-1).astype(inputs.dtype)

  ln = lambda name, x: basic.layer_norm(
      params[name], x, use_bias=cfg.use_bias, dtype=dtype)

  if cfg.norm_policy == 'primer_hybrid':
    inputs = ln('pre_layer_norm', inputs)
  elif cfg.norm_policy == 'pre':
    inputs = ln('layer_norm', inputs)

  activations = basic.feed_forward(
      params['ffn_layer1'], inputs,
      activation=cfg.activation, has_bias=cfg.use_bias, dtype=dtype)
  if paddings is not None:
    activations = activations * (1.0 - paddings)

  if train and cfg.relu_dropout > 0.0:
    rng, sub = jax.random.split(rng)
    activations = basic.dropout(
        sub, activations, cfg.relu_dropout, deterministic=False)

  if cfg.tp_axis is not None:
    # Hidden axis sharded: this shard's ffn_layer2 contraction is partial.
    # psum across the model axis, then apply the (replicated) bias once.
    outputs = basic.feed_forward(
        params['ffn_layer2'], activations,
        activation='identity', has_bias=False, dtype=dtype)
    outputs = jax.lax.psum(outputs, cfg.tp_axis)
    if cfg.use_bias:
      outputs = outputs + basic.cast_floating(
          params['ffn_layer2']['linear']['bias'], dtype)
  else:
    outputs = basic.feed_forward(
        params['ffn_layer2'], activations,
        activation='identity', has_bias=cfg.use_bias, dtype=dtype)
  if paddings is not None:
    outputs = outputs * (1.0 - paddings)

  if cfg.norm_policy == 'primer_hybrid':
    outputs = ln('post_layer_norm', outputs)
  elif cfg.norm_policy == 'post':
    outputs = ln('layer_norm', outputs)

  if train and cfg.residual_dropout > 0.0:
    rng, sub = jax.random.split(rng)
    outputs = basic.dropout(
        sub, outputs, cfg.residual_dropout, deterministic=False)

  outputs = residual + outputs * cfg.residual_weight

  if cfg.norm_policy == 'post_skip':
    outputs = ln('layer_norm', outputs)
  return outputs


def _try_fused_layer(
    params: Params,
    inputs: Array,
    paddings: Array | None,
    atten_mask: Array,
    cfg: TransformerLayerConfig,
    train: bool,
) -> Array | None:
  """Routes a pre-norm layer through the fused Pallas block kernels.

  Returns None when unsupported (non-'pre' policies, dropout in training,
  per-dim scale, shapes that don't fit VMEM) — the caller then runs the
  composed path.  See ops/pallas/transformer_block.py for why this matters:
  the composed path streams ~1 GB of activations per layer through HBM.
  """
  # primer_hybrid (the lvt-giant policy) rides the same kernels in
  # partial-output mode: the kernel stops before bias/residual and an XLA
  # epilogue applies bias -> post-LN -> residual (one fused elementwise
  # pass).  'post'/'post_skip' normalize the residual stream itself and
  # stay composed.
  if (cfg.norm_policy not in ('pre', 'primer_hybrid')
      or cfg.attention_impl != 'flash'
      or cfg.enable_per_dim_scale or cfg.activation not in ('gelu', 'relu')
      or cfg.residual_weight != 1.0 or not cfg.use_bias):
    return None
  if train and (cfg.atten_dropout or cfg.residual_dropout
                or cfg.relu_dropout):
    # The kernels are trainable (custom_vjp, composed backward) but have
    # no dropout path.
    return None
  interpret = cfg.kernel_interpret
  if jax.default_backend() != 'tpu' and not interpret:
    return None

  from videoprism_tpu.ops.pallas import transformer_block as tb

  tp = cfg.tp_axis
  b, t, d = inputs.shape
  attn = params['self_attention']
  dd, n, h = attn['query']['w'].shape  # n is per-shard under tp
  nh_total = n * h
  f = params['ff_layer']['ffn_layer1']['linear']['kernel'].shape[-1]
  itemsize = inputs.dtype.itemsize
  mask_ok = atten_mask.shape[-1] == t
  attn_ok = tb.attention_block_supported(t, d, nh_total, itemsize) and mask_ok
  attn_chunks = (
      tb.attention_chunks_for(t, d, n, h, itemsize)
      if mask_ok and not attn_ok else None)
  ffn_ok = tb.ffn_block_supported(b * t, d, f, itemsize)
  ffn_chunks = (
      None if ffn_ok else tb.ffn_chunks_for(b * t, d, f, itemsize))
  if not (attn_ok or attn_chunks or ffn_ok or ffn_chunks):
    return None

  dtype = cfg.dtype
  cast = basic.cast_floating
  primer = cfg.norm_policy == 'primer_hybrid'
  pre_ln = 'pre_layer_norm' if primer else 'layer_norm'
  partial = primer or tp is not None

  if attn_ok or attn_chunks:
    flat_in = lambda p: (cast(p['w'], dtype).reshape(d, nh_total),
                         cast(p['b'], dtype).reshape(nh_total))
    wq, bq = flat_in(attn['query'])
    wk, bk = flat_in(attn['key'])
    wv, bv = flat_in(attn['value'])
    wo = jnp.transpose(cast(attn['post']['w'], dtype), (1, 2, 0)
                       ).reshape(nh_total, d)
    bo = cast(attn['post']['b'], dtype)
    attn_fn = tb.attention_block_vjp(
        num_heads=n, dim_per_head=h, logit_cap=float(cfg.logit_cap),
        epsilon=1e-6, query_scale=h ** -0.5, interpret=interpret,
        partial_out=partial, chunks=attn_chunks,
        seq_group=(tb.attention_seq_group_for(b, t, d, nh_total, itemsize)
                   if attn_ok and tb.SEQ_GROUP_DISPATCH else 1))
    x = attn_fn(
        inputs, jnp.squeeze(atten_mask, axis=1).astype(jnp.float32),
        cast(params[pre_ln]['scale'], dtype),
        cast(params[pre_ln]['bias'], dtype),
        wq, bq, wk, bk, wv, bv, wo, bo)
    if partial:
      # Epilogue (one fused XLA elementwise pass): psum the per-shard
      # projections, then bias -> optional primer post-LN -> residual,
      # each applied exactly once.
      if tp is not None:
        x = jax.lax.psum(x, tp)
      x = x + bo
      if primer:
        x = basic.layer_norm(
            params['post_layer_norm'], x, use_bias=cfg.use_bias,
            dtype=dtype)
      x = inputs + x
  else:
    # Composed pre-norm attention half (same math as transformer_layer).
    normed = basic.layer_norm(
        params[pre_ln], inputs, use_bias=cfg.use_bias, dtype=dtype)
    x = attention_lib.multi_head_attention(
        attn, normed, normed, normed, atten_mask,
        hidden_dim=d, num_heads=cfg.num_heads,
        dim_per_head=cfg.dim_per_head, logit_cap=cfg.logit_cap,
        enable_per_dim_scale=cfg.enable_per_dim_scale,
        use_bias=cfg.use_bias, dtype=dtype, impl=cfg.attention_impl,
        tp_axis=tp, interpret=interpret)
    if primer:
      x = basic.layer_norm(
          params['post_layer_norm'], x, use_bias=cfg.use_bias, dtype=dtype)
    x = inputs + x

  if ffn_ok or ffn_chunks:
    ff = params['ff_layer']
    pad_rows = (
        paddings.reshape(b * t, 1).astype(dtype)
        if paddings is not None else jnp.zeros((b * t, 1), dtype))
    b2 = cast(ff['ffn_layer2']['linear']['bias'], dtype)
    ffn_args = (
        x.reshape(b * t, d), pad_rows,
        cast(ff[pre_ln]['scale'], dtype),
        cast(ff[pre_ln]['bias'], dtype),
        cast(ff['ffn_layer1']['linear']['kernel'], dtype),
        cast(ff['ffn_layer1']['linear']['bias'], dtype),
        cast(ff['ffn_layer2']['linear']['kernel'], dtype),
        b2,
    )
    ffn_fn = tb.ffn_block_vjp(
        activation=cfg.activation, epsilon=1e-6,
        chunks=None if ffn_ok else ffn_chunks, interpret=interpret,
        partial_out=partial)
    out = ffn_fn(*ffn_args)
    if partial:
      if tp is not None:
        out = jax.lax.psum(out, tp)
      keep = (1.0 - pad_rows).astype(dtype)
      out = (out + b2) * keep
      if primer:
        out = basic.layer_norm(
            ff['post_layer_norm'], out, use_bias=cfg.use_bias, dtype=dtype)
      out = out + x.reshape(b * t, d)
    return out.reshape(b, t, d)
  return transformer_ffn(params['ff_layer'], x, paddings, cfg, train=train)


def _try_fused_int8_layer(
    params: Params,
    inputs: Array,
    paddings: Array | None,
    atten_mask: Array,
    cfg: TransformerLayerConfig,
    train: bool,
) -> Array | None:
  """Routes an int8-quantized pre-norm layer through the W8A8 kernels.

  Inference-only and 'pre'-policy-only; anything else returns None and
  the caller dequantizes for the composed/bf16-fused paths.  See
  ops/pallas/int8_blocks.py for when int8 pays on this chip.
  """
  if (train or cfg.norm_policy != 'pre' or cfg.attention_impl != 'flash'
      or cfg.enable_per_dim_scale or cfg.activation not in ('gelu', 'relu')
      or cfg.residual_weight != 1.0 or not cfg.use_bias):
    return None
  interpret = cfg.kernel_interpret
  if jax.default_backend() != 'tpu' and not interpret:
    return None

  from videoprism_tpu.ops.pallas import int8_blocks as i8

  from videoprism_tpu import quantization

  tp = cfg.tp_axis
  partial = tp is not None
  b, t, d = inputs.shape
  attn = params['self_attention']
  dd, n, h = attn['query']['w'].shape
  nh_total = n * h
  f = params['ff_layer']['ffn_layer1']['linear']['kernel'].shape[-1]
  itemsize = inputs.dtype.itemsize
  mask_ok = atten_mask.shape[-1] == t
  attn_chunks = (
      i8.attention_int8_chunks_for(t, d, n, h, itemsize) if mask_ok
      else None)
  attn_proj_ok = (
      attn_chunks is None and mask_ok
      and i8.attn_int8_projection_supported(b * t, d, nh_total, itemsize))
  ffn_chunks = i8.ffn_int8_chunks_for(b * t, d, f, itemsize)
  if attn_chunks is None and not attn_proj_ok and ffn_chunks is None:
    return None

  dtype = cfg.dtype
  cast = basic.cast_floating

  # Whole-layer kernel (attention + FFN in one pallas_call): int8 weights
  # halve the resident footprint, so base-scale layers fit entirely in
  # VMEM and x round-trips HBM once per LAYER instead of once per half.
  # Small-grid (latency) regime only — measured per-layer with chained
  # fori_loop timing: -6%/-5% at 64/16-sequence grids, but +2% at 256
  # (large grids pipeline the two-kernel chain better than per-sequence
  # mono programs); b*t<=16384 is the measured crossover.  Replicated
  # serving only (TP partial outputs need the psum between the halves,
  # so TP keeps the two-kernel path).
  if (not partial and mask_ok and b * t <= 16384
      and i8.int8_layer_supported(t, d, nh_total, f, n, itemsize)):
    flat_in = lambda p: (
        p['w'].reshape(d, nh_total),
        p['w_scale'].reshape(nh_total).astype(jnp.float32),
        cast(p['b'], dtype).reshape(nh_total))
    wq, sq, bq = flat_in(attn['query'])
    wk, sk, bk = flat_in(attn['key'])
    wv, sv, bv = flat_in(attn['value'])
    wo = jnp.transpose(attn['post']['w'], (1, 2, 0)).reshape(nh_total, d)
    so = attn['post']['w_scale'].astype(jnp.float32)
    bo = cast(attn['post']['b'], dtype)
    ff = params['ff_layer']
    pads = (paddings.reshape(b, t, 1).astype(dtype)
            if paddings is not None else jnp.zeros((b, t, 1), dtype))
    out = i8.int8_layer_block(
        inputs, jnp.squeeze(atten_mask, axis=1).astype(jnp.float32), pads,
        cast(params['layer_norm']['scale'], dtype),
        cast(params['layer_norm']['bias'], dtype),
        wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo,
        cast(ff['layer_norm']['scale'], dtype),
        cast(ff['layer_norm']['bias'], dtype),
        ff['ffn_layer1']['linear']['kernel'],
        ff['ffn_layer1']['linear']['kernel_scale'].astype(jnp.float32),
        cast(ff['ffn_layer1']['linear']['bias'], dtype),
        ff['ffn_layer2']['linear']['kernel'],
        ff['ffn_layer2']['linear']['kernel_scale'].astype(jnp.float32),
        cast(ff['ffn_layer2']['linear']['bias'], dtype),
        num_heads=n, dim_per_head=h, logit_cap=float(cfg.logit_cap),
        epsilon=1e-6, query_scale=h ** -0.5, activation=cfg.activation,
        interpret=interpret)
    return out

  if attn_chunks is not None or attn_proj_ok:
    flat_in = lambda p: (
        p['w'].reshape(d, nh_total),
        p['w_scale'].reshape(nh_total).astype(jnp.float32),
        cast(p['b'], dtype).reshape(nh_total))
    wq, sq, bq = flat_in(attn['query'])
    wk, sk, bk = flat_in(attn['key'])
    wv, sv, bv = flat_in(attn['value'])
    wo = jnp.transpose(attn['post']['w'], (1, 2, 0)).reshape(nh_total, d)
    so = attn['post']['w_scale'].astype(jnp.float32)
    bo = cast(attn['post']['b'], dtype)
    ln_s = cast(params['layer_norm']['scale'], dtype)
    ln_b = cast(params['layer_norm']['bias'], dtype)
    if attn_chunks is not None:
      x = i8.int8_attention_block_chunked(
          inputs, jnp.squeeze(atten_mask, axis=1).astype(jnp.float32),
          ln_s, ln_b,
          wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo,
          num_heads=n, dim_per_head=h, chunks=attn_chunks,
          logit_cap=float(cfg.logit_cap), epsilon=1e-6,
          query_scale=h ** -0.5, partial_out=partial, interpret=interpret)
    else:
      # Sequences beyond the block kernel's T cap (the 4096-token CLIP
      # auxiliary encoder): int8 projections (row-blocked, any T) around
      # the bf16 flash attention core — weights stay int8 end-to-end.
      x = i8.int8_projected_flash_attention(
          inputs, atten_mask.astype(jnp.float32), ln_s, ln_b,
          wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo,
          num_heads=n, dim_per_head=h, logit_cap=float(cfg.logit_cap),
          epsilon=1e-6, query_scale=h ** -0.5, partial_out=partial,
          interpret=interpret)
    if partial:
      # Per-shard heads contribute partial output projections: psum over
      # the model axis, then bias (replicated) + residual exactly once.
      x = jax.lax.psum(x, tp)
      x = inputs + (x + bo)
  else:
    # Geometry neither int8 attention path can take (e.g. a mask shorter
    # than the sequence): dequantize the attention half and run the
    # normal composed/flash path; the FFN half below stays int8.
    attn_deq = quantization.dequantize(
        {'self_attention': attn}, dtype)['self_attention']
    normed = basic.layer_norm(
        params['layer_norm'], inputs, use_bias=cfg.use_bias, dtype=dtype)
    x = attention_lib.multi_head_attention(
        attn_deq, normed, normed, normed, atten_mask,
        hidden_dim=d, num_heads=cfg.num_heads,
        dim_per_head=cfg.dim_per_head, logit_cap=cfg.logit_cap,
        enable_per_dim_scale=cfg.enable_per_dim_scale,
        use_bias=cfg.use_bias, dtype=dtype, impl=cfg.attention_impl,
        tp_axis=tp, interpret=interpret)
    x = inputs + x

  ff = params['ff_layer']
  if ffn_chunks is None:
    ff_deq = quantization.dequantize({'ff_layer': ff}, dtype)['ff_layer']
    return transformer_ffn(ff_deq, x, paddings, cfg, train=train)

  pad_rows = (
      paddings.reshape(b * t, 1).astype(dtype)
      if paddings is not None else jnp.zeros((b * t, 1), dtype))
  b2 = cast(ff['ffn_layer2']['linear']['bias'], dtype)
  out = i8.int8_ffn_block_chunked(
      x.reshape(b * t, d), pad_rows,
      cast(ff['layer_norm']['scale'], dtype),
      cast(ff['layer_norm']['bias'], dtype),
      ff['ffn_layer1']['linear']['kernel'],
      ff['ffn_layer1']['linear']['kernel_scale'].astype(jnp.float32),
      cast(ff['ffn_layer1']['linear']['bias'], dtype),
      ff['ffn_layer2']['linear']['kernel'],
      ff['ffn_layer2']['linear']['kernel_scale'].astype(jnp.float32),
      b2,
      chunks=ffn_chunks, activation=cfg.activation, epsilon=1e-6,
      partial_out=partial, interpret=interpret)
  if partial:
    # Per-shard hidden slices: psum, then bias/keep/residual once.
    out = jax.lax.psum(out, tp)
    keep = (1.0 - pad_rows).astype(dtype)
    out = (out + b2) * keep + x.reshape(b * t, d)
  return out.reshape(b, t, d)


def transformer_layer(
    params: Params,
    inputs: Array,
    paddings: Array | None,
    atten_mask: Array,
    cfg: TransformerLayerConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
) -> Array:
  """One pre/post-norm self-attention + FFN block.

  Param tree (checkpoint schema)::

      {'layer_norm': {...},            # policy-dependent names
       'self_attention': {...},        # see attention.multi_head_attention
       'ff_layer': {...}}              # see transformer_ffn

  Reference: ``Transformer`` videoprism/layers.py:796-872.
  """
  from videoprism_tpu import quantization

  if quantization.is_quantized(params):
    fused = _try_fused_int8_layer(
        params, inputs, paddings, atten_mask, cfg, train)
    if fused is not None:
      return fused
    # Unsupported geometry/policy: dequantize and take the normal paths.
    params = quantization.dequantize(params, cfg.dtype)

  fused = _try_fused_layer(params, inputs, paddings, atten_mask, cfg, train)
  if fused is not None:
    return fused

  dtype = cfg.dtype
  ln = lambda name, x: basic.layer_norm(
      params[name], x, use_bias=cfg.use_bias, dtype=dtype)

  if cfg.norm_policy == 'primer_hybrid':
    inputs_normalized = ln('pre_layer_norm', inputs)
  elif cfg.norm_policy == 'pre':
    inputs_normalized = ln('layer_norm', inputs)
  else:
    inputs_normalized = inputs

  atten_rng = ffn_rng = None
  if rng is not None:
    rng, atten_rng, res_rng, ffn_rng = jax.random.split(rng, 4)
  else:
    res_rng = None

  atten_outputs = attention_lib.multi_head_attention(
      params['self_attention'],
      inputs_normalized, inputs_normalized, inputs_normalized,
      atten_mask,
      hidden_dim=inputs_normalized.shape[-1],
      num_heads=cfg.num_heads,
      dim_per_head=cfg.dim_per_head,
      logit_cap=cfg.logit_cap,
      enable_per_dim_scale=cfg.enable_per_dim_scale,
      use_bias=cfg.use_bias,
      dropout_rate=cfg.atten_dropout,
      dropout_rng=atten_rng,
      train=train,
      dtype=dtype,
      impl=cfg.attention_impl,
      tp_axis=cfg.tp_axis,
      interpret=cfg.kernel_interpret,
  )

  if cfg.norm_policy == 'primer_hybrid':
    atten_outputs = ln('post_layer_norm', atten_outputs)
  elif cfg.norm_policy == 'post':
    atten_outputs = ln('layer_norm', atten_outputs)

  if train and cfg.residual_dropout > 0.0:
    atten_outputs = basic.dropout(
        res_rng, atten_outputs, cfg.residual_dropout, deterministic=False)
  atten_outputs = atten_outputs + inputs

  if cfg.norm_policy == 'post_skip':
    atten_outputs = ln('layer_norm', atten_outputs)

  return transformer_ffn(
      params['ff_layer'], atten_outputs, paddings, cfg,
      train=train, rng=ffn_rng)


def stacked_transformer(
    params: Params,
    inputs: Array,
    paddings: Array,
    cfg: TransformerLayerConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
) -> Array:
  """N transformer layers; scan-over-stacked-weights or python loop.

  With ``cfg.scan`` the params live under ``x_layers`` with a leading layer
  axis (the "repeated" checkpoint layout); otherwise under ``x_layers_{i}``.
  Reference: ``StackedTransformer`` videoprism/layers.py:988-1041 and
  ``Repeat`` videoprism/layers.py:875-937.

  TPU optimization (``cfg.pack_small_sequences``): stacks over many short
  sequences (VideoPrism's temporal encoder: thousands of independent
  16-token sequences) are repacked as [B/G, G*T, D] with a block-diagonal
  attention mask, so every matmul in every layer runs at full 128-row MXU
  width.  All per-token math (projections, FFN, LN) is invariant under the
  reshape, and masked logits exp to exactly 0.0 in the fp32 softmax, so
  outputs are bit-identical to the unpacked layout.
  """
  b, t = inputs.shape[0], inputs.shape[1]
  t_orig = t

  # Sublane padding: awkward lengths (e.g. the text tower's 64+1 cls = 65
  # tokens) disqualify every fused kernel (sublane multiples of 8 needed).
  # Pad with fully-masked tokens — excluded as keys by the mask and zeroed
  # in the FFN, so real-token outputs are unchanged — and slice back after
  # the stack.
  pad_t = (-t) % 8 if cfg.attention_impl == 'flash' else 0
  if pad_t:
    inputs = jnp.pad(inputs, ((0, 0), (0, pad_t), (0, 0)))
    paddings = jnp.pad(paddings, ((0, 0), (0, pad_t)), constant_values=1.0)
    t = t + pad_t

  group = 128 // t if t < 128 and 128 % t == 0 else 1
  packed = (
      cfg.pack_small_sequences
      and not cfg.enable_causal_atten
      and group > 1
      and b % group == 0
  )
  if packed:
    d = inputs.shape[-1]
    # Block-diagonal mask over groups: per-sequence key mask on the
    # diagonal blocks, large-negative everywhere else.
    key_mask = mask_lib.paddings_to_mask(paddings, inputs.dtype)  # [B,1,1,T]
    m = jnp.broadcast_to(jnp.squeeze(key_mask, axis=(1, 2)), (b, t))
    m = m.reshape(b // group, group, t)
    neg = mask_lib.get_large_negative_number(inputs.dtype)
    same_group = jnp.eye(group, dtype=bool)[None, :, None, :, None]
    # [bg, g_q, t_q, g_k, t_k] = key mask if g_q == g_k else masked.
    atten_mask = jnp.where(
        same_group,
        jnp.broadcast_to(m[:, None, None, :, :],
                         (b // group, group, t, group, t)),
        neg,
    ).reshape(b // group, 1, group * t, group * t)
    inputs = inputs.reshape(b // group, group * t, d)
    paddings = paddings.reshape(b // group, group * t)
  else:
    atten_mask = mask_lib.attention_mask_for_fprop(
        inputs, paddings, causal_attention=cfg.enable_causal_atten)

  if cfg.scan:
    layer_rngs = (
        jax.random.split(rng, cfg.num_layers) if rng is not None else None
    )

    def body(carry, scanned):
      layer_params, layer_rng = scanned
      out = transformer_layer(
          layer_params, carry, paddings, atten_mask, cfg,
          train=train, rng=layer_rng)
      return out, None

    if cfg.remat:
      body = jax.checkpoint(
          body, policy=jax.checkpoint_policies.nothing_saveable,
          prevent_cse=False)

    outputs, _ = jax.lax.scan(
        body, inputs, (params['x_layers'], layer_rngs))
  else:
    outputs = inputs
    for i in range(cfg.num_layers):
      layer_rng = None
      if rng is not None:
        rng, layer_rng = jax.random.split(rng)
      outputs = transformer_layer(
          params[f'x_layers_{i}'], outputs, paddings, atten_mask, cfg,
          train=train, rng=layer_rng)

  if packed:
    outputs = outputs.reshape(b, t, outputs.shape[-1])
  if pad_t:
    outputs = outputs[:, :t_orig]
  return outputs


def atten_token_pooling(
    params: Params,
    tokens: Array,
    paddings: Array | None,
    *,
    num_heads: int,
    hidden_dim: int = 0,
    num_queries: int = 1,
    add_layer_norm: bool = True,
    enable_per_dim_scale: bool = True,
    use_qk_norm: bool = False,
    use_bias: bool = True,
    dropout: float = 0.0,
    train: bool = False,
    rng: jax.Array | None = None,
    dtype=jnp.float32,
    tp_axis: str | None = None,
    interpret: bool = False,
) -> Array:
  """Attentional token pooling with learned query vectors.

  Param tree (checkpoint schema)::

      {'pooling_attention_query': [num_queries, D],
       'pooling_attention': {...},                   # MHA params
       'pooling_attention_layer_norm': {...}}        # if add_layer_norm

  Reference: ``AttenTokenPoolingLayer`` videoprism/layers.py:1044-1136.
  """
  input_dim = tokens.shape[-1]
  hidden_dim = hidden_dim if hidden_dim > 0 else 4 * input_dim
  batch_size, seq_length = tokens.shape[0], tokens.shape[-2]

  query = basic.cast_floating(params['pooling_attention_query'], dtype)
  query = jnp.tile(query[jnp.newaxis, :, :], [batch_size, 1, 1])

  if paddings is None:
    paddings = jnp.zeros([batch_size, seq_length], dtype=tokens.dtype)

  atten_mask = mask_lib.paddings_to_mask(paddings, paddings.dtype)
  outputs = attention_lib.multi_head_attention(
      params['pooling_attention'],
      query, tokens, tokens, atten_mask,
      hidden_dim=hidden_dim,
      num_heads=num_heads,
      enable_per_dim_scale=enable_per_dim_scale,
      use_qk_norm=use_qk_norm,
      use_bias=use_bias,
      train=train,
      dtype=dtype,
      tp_axis=tp_axis,
      interpret=interpret,
  )

  if add_layer_norm:
    outputs = basic.layer_norm(
        params['pooling_attention_layer_norm'], outputs, dtype=dtype)

  if train and dropout > 0.0:
    outputs = basic.dropout(rng, outputs, dropout, deterministic=False)
  return outputs
