"""Basic functional NN ops: activations, casting, layer norm, dense layers.

These are pure functions over explicit parameter dicts.  Parameter-dict keys
match the HuggingFace "repeated" checkpoint schema exactly (e.g. a dense layer
is ``{'linear': {'kernel': [in, out], 'bias': [out]}}``), so checkpoints load
into this framework with no renaming.

Numerical conventions replicated from the reference (videoprism/layers.py):
  * exact (erf-based) GELU           — reference videoprism/layers.py:31
  * LayerNorm with (scale + 1.0)     — reference videoprism/layers.py:208-270
  * per-dim query scale via softplus — reference videoprism/layers.py:502-527
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = dict[str, Any]

# Exact GELU: 0.5 * x * (1 + erf(x / sqrt(2))).  The reference pins
# approximate=False (videoprism/layers.py:31); the tanh approximation diverges
# by ~1e-3 which is far above the 1e-4 parity budget.
gelu = functools.partial(jax.nn.gelu, approximate=False)
relu = jax.nn.relu


def identity(x: Array) -> Array:
  return x


ACTIVATIONS = {
    'gelu': gelu,
    'relu': relu,
    'identity': identity,
}


def cast_floating(x: Array, dtype) -> Array:
  """Casts floating-point arrays to ``dtype``; leaves others untouched.

  Mirrors the fprop-dtype cast in reference videoprism/layers.py:193-205.
  """
  if x is None:
    return None
  if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != dtype:
    return x.astype(dtype)
  return x


def cast_floating_tree(tree, dtype):
  return jax.tree_util.tree_map(lambda x: cast_floating(x, dtype), tree)


def layer_norm(
    params: Params,
    inputs: Array,
    *,
    epsilon: float = 1e-6,
    direct_scale: bool = False,
    use_scale: bool = True,
    use_bias: bool = True,
    reductions_in_fp32: bool = False,
    dtype=jnp.float32,
    impl: str = 'auto',
) -> Array:
  """Layer normalization with the reference's (scale + 1.0) convention.

  The checkpoint stores ``scale`` initialized around 0.0 and the effective
  multiplier is ``scale + 1.0`` unless ``direct_scale`` (reference
  videoprism/layers.py:246-259).

  ``impl='auto'`` routes supported shapes through the fused Pallas kernel
  on TPU (XLA's layernorm lowering is badly VPU-bound there — see
  ``ops/pallas/layer_norm.py``); ``'xla'`` forces the plain-jnp path.

  Args:
    params: ``{'scale': [D], 'bias': [D]}`` (either optional per flags).
    inputs: [..., D] activations.
  """
  if impl in ('auto', 'pallas') and use_scale and use_bias and (
      not reductions_in_fp32):
    from videoprism_tpu.ops.pallas import layer_norm as pallas_ln

    rows = 1
    for s in inputs.shape[:-1]:
      rows *= s
    on_tpu = jax.default_backend() == 'tpu'
    if (impl == 'pallas' or on_tpu) and pallas_ln.supports(
        rows, inputs.shape[-1]):
      return pallas_ln.fused_layer_norm(
          inputs,
          cast_floating(params['scale'], dtype),
          cast_floating(params['bias'], dtype),
          epsilon=epsilon,
          direct_scale=direct_scale,
          interpret=not on_tpu,
      )

  inputs_dtype = inputs.dtype
  if reductions_in_fp32:
    inputs = inputs.astype(jnp.float32)
  mean = jnp.mean(inputs, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(inputs - mean), axis=-1, keepdims=True)
  normed = (inputs - mean) * jax.lax.rsqrt(var + epsilon)
  if reductions_in_fp32:
    normed = normed.astype(inputs_dtype)

  if use_scale:
    scale = cast_floating(params['scale'], dtype)
    if not direct_scale:
      scale = scale + 1.0
    normed = normed * scale
  if use_bias:
    normed = normed + cast_floating(params['bias'], dtype)
  return normed


def dense(
    params: Params,
    inputs: Array,
    *,
    has_bias: bool = True,
    dtype=jnp.float32,
) -> Array:
  """Dense layer over the trailing dim: ``x @ kernel (+ bias)``.

  Params: ``{'kernel': [in, out], 'bias': [out]}`` — the flax ``nn.Dense``
  layout used by the checkpoints (reference videoprism/layers.py:304-312).
  """
  kernel = cast_floating(params['kernel'], dtype)
  out = inputs @ kernel
  if has_bias:
    out = out + cast_floating(params['bias'], dtype)
  return out


def feed_forward(
    params: Params,
    inputs: Array,
    *,
    activation: str = 'relu',
    has_bias: bool = True,
    dtype=jnp.float32,
) -> Array:
  """Dense + activation, stored under the ``linear`` sub-key.

  Reference: ``FeedForward`` (videoprism/layers.py:273-313); the nested
  ``linear`` name is part of the checkpoint schema.
  """
  out = dense(params['linear'], inputs, has_bias=has_bias, dtype=dtype)
  return ACTIVATIONS[activation](out)


def per_dim_scale(params: Params, inputs: Array, *, dtype=jnp.float32) -> Array:
  """Per-dimension query scaling: ``x * 1.442695041/sqrt(D) * softplus(w)``.

  The constant ``1.442695041 == 1/softplus(0.0)`` is hard-coded to keep XLA
  from fusing a gratuitous transcendental (reference
  videoprism/layers.py:502-527).

  Params: ``{'per_dim_scale': [D]}`` (zero-initialized in checkpoints).
  """
  dim = inputs.shape[-1]
  w = cast_floating(params['per_dim_scale'], dtype)
  r_softplus_0 = 1.442695041
  scale = jnp.array(r_softplus_0 / np.sqrt(dim), dtype=dtype)
  scale = scale * jax.nn.softplus(w)
  return inputs * scale


def l2_normalize(x: Array, axis=-1, epsilon: float = 1e-12) -> Array:
  """L2-normalizes in float32 with eps inside the sqrt.

  Reference: videoprism/encoders.py:50-67 (always computes in fp32, then
  casts back).
  """
  x_dtype = x.dtype
  x = x.astype(jnp.float32)
  norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + epsilon)
  return (x / norm).astype(x_dtype)


def dropout(
    rng: jax.Array | None,
    x: Array,
    rate: float,
    *,
    deterministic: bool,
) -> Array:
  """Inverted dropout, matching ``flax.linen.Dropout`` semantics."""
  if deterministic or rate == 0.0:
    return x
  if rng is None:
    raise ValueError('dropout requires an rng when rate > 0 in train mode.')
  keep = 1.0 - rate
  mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
  return jnp.where(mask, x / keep, jnp.zeros_like(x))
