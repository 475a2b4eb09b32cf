"""Layer-level numerical parity vs the reference Flax oracle.

Each test initializes the reference flax module, then runs this framework's
functional op with the SAME parameter tree and asserts near-bitwise equality.
This goes beyond the reference's own test suite, which checks only shapes and
param counts (reference videoprism/layers_test.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from videoprism_tpu.ops import attention as attention_lib
from videoprism_tpu.ops import basic
from videoprism_tpu.ops import masks as mask_lib
from videoprism_tpu.ops import transformer as tfm_lib

TOL = 1e-6


def _unwrap(variables):
  params = variables['params']
  return jax.tree.map(jnp.asarray, params)


@requires_reference
class TestLayerParity:

  def test_layer_norm(self):
    from videoprism import layers as ref_layers

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    mod = ref_layers.LayerNorm()
    variables = mod.init(jax.random.PRNGKey(2), x)
    # Perturb scale/bias away from init so the (scale+1) convention is
    # actually exercised.
    params = {
        'scale': jnp.linspace(-0.5, 0.5, 16),
        'bias': jnp.linspace(0.1, -0.1, 16),
    }
    ref = mod.apply({'params': params}, x)
    got = basic.layer_norm(params, x)
    np.testing.assert_allclose(got, ref, atol=TOL)

  def test_layer_norm_direct_scale(self):
    from videoprism import layers as ref_layers

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    mod = ref_layers.LayerNorm(direct_scale=True)
    params = {'scale': jnp.linspace(0.5, 1.5, 16),
              'bias': jnp.linspace(0.1, -0.1, 16)}
    ref = mod.apply({'params': params}, x)
    got = basic.layer_norm(params, x, direct_scale=True)
    np.testing.assert_allclose(got, ref, atol=TOL)

  def test_gelu_exact(self):
    from videoprism import layers as ref_layers

    x = jnp.linspace(-4.0, 4.0, 101)
    np.testing.assert_allclose(basic.gelu(x), ref_layers.gelu(x), atol=1e-7)

  def test_per_dim_scale(self):
    from videoprism import layers as ref_layers

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 8))
    params = {'per_dim_scale': jnp.linspace(-1.0, 1.0, 8)}
    ref = ref_layers.PerDimScale().apply({'params': params}, x)
    got = basic.per_dim_scale(params, x)
    np.testing.assert_allclose(got, ref, atol=TOL)

  def test_masks(self):
    from videoprism import layers as ref_layers

    paddings = jnp.array([[0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 1.0]])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    for causal in (False, True):
      ref = ref_layers.compute_attention_masks_for_fprop(
          x, paddings, causal_attention=causal)
      got = mask_lib.attention_mask_for_fprop(
          x, paddings, causal_attention=causal)
      np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

  @pytest.mark.parametrize('per_dim_scale', [True, False])
  @pytest.mark.parametrize('logit_cap', [0.0, 50.0])
  def test_attention(self, per_dim_scale, logit_cap):
    from videoprism import layers as ref_layers

    b, t, d, n = 2, 6, 24, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = jnp.zeros((b, t)).at[:, -2:].set(1.0)
    mask = mask_lib.attention_mask_for_fprop(x, paddings)

    mod = ref_layers.DotProductAttention(
        hidden_dim=d, num_heads=n,
        internal_enable_per_dim_scale=per_dim_scale,
        atten_logit_cap=logit_cap)
    variables = mod.init(
        jax.random.PRNGKey(2), x, x, x, atten_mask=mask, train=False)
    params = _unwrap(variables)
    # Nudge the learned per-dim scale off its zero init.
    if per_dim_scale:
      params['per_dim_scale']['per_dim_scale'] = np.linspace(
          -0.3, 0.3, d // n).astype(np.float32)

    ref, _ = mod.apply(
        {'params': params}, x, x, x, atten_mask=mask, train=False)
    got = attention_lib.multi_head_attention(
        params, x, x, x, mask,
        hidden_dim=d, num_heads=n,
        logit_cap=logit_cap,
        enable_per_dim_scale=per_dim_scale)
    np.testing.assert_allclose(got, ref, atol=TOL)

  def test_attention_qk_norm(self):
    """qk-norm branch (reference videoprism/layers.py:724-726): LN over the
    per-head dim H on both q and k, applied before query scaling, with the
    (scale+1) convention exercised via off-zero LN params."""
    from videoprism import layers as ref_layers

    b, t, d, n = 2, 6, 24, 4
    h = d // n
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = jnp.zeros((b, t)).at[:, -2:].set(1.0)
    mask = mask_lib.attention_mask_for_fprop(x, paddings)

    mod = ref_layers.DotProductAttention(
        hidden_dim=d, num_heads=n, use_qk_norm=True,
        internal_enable_per_dim_scale=False, atten_logit_cap=50.0)
    variables = mod.init(
        jax.random.PRNGKey(2), x, x, x, atten_mask=mask, train=False)
    params = _unwrap(variables)
    assert 'layer_norm_q' in params and 'layer_norm_k' in params
    # Perturb the qk LN params off their zero init so the (scale+1)
    # convention and the bias path are actually load-bearing.
    params['layer_norm_q']['scale'] = jnp.linspace(-0.4, 0.4, h)
    params['layer_norm_q']['bias'] = jnp.linspace(0.2, -0.2, h)
    params['layer_norm_k']['scale'] = jnp.linspace(0.3, -0.3, h)
    params['layer_norm_k']['bias'] = jnp.linspace(-0.1, 0.1, h)

    ref, _ = mod.apply(
        {'params': params}, x, x, x, atten_mask=mask, train=False)
    got = attention_lib.multi_head_attention(
        params, x, x, x, mask,
        hidden_dim=d, num_heads=n, logit_cap=50.0,
        enable_per_dim_scale=False, use_qk_norm=True)
    np.testing.assert_allclose(got, ref, atol=TOL)

  @pytest.mark.parametrize('norm_policy',
                           ['pre', 'post', 'post_skip', 'primer_hybrid'])
  def test_transformer_layer(self, norm_policy):
    from videoprism import layers as ref_layers

    b, t, d, n, hid = 2, 5, 16, 2, 32
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = jnp.zeros((b, t)).at[0, -1:].set(1.0)
    mask = mask_lib.attention_mask_for_fprop(x, paddings)

    mod = ref_layers.Transformer(
        hidden_dim=hid, num_heads=n, norm_policy=norm_policy,
        activation_fn=ref_layers.gelu,
        internal_enable_per_dim_scale=False, atten_logit_cap=50.0)
    variables = mod.init(jax.random.PRNGKey(2), x, paddings, mask, train=False)
    params = _unwrap(variables)

    ref = mod.apply({'params': params}, x, paddings, mask, train=False)
    cfg = tfm_lib.TransformerLayerConfig(
        num_layers=1, hidden_dim=hid, num_heads=n, norm_policy=norm_policy,
        activation='gelu', enable_per_dim_scale=False, logit_cap=50.0)
    got = tfm_lib.transformer_layer(params, x, paddings, mask, cfg)
    np.testing.assert_allclose(got, ref, atol=TOL)

  @pytest.mark.parametrize('scan', [True, False])
  @pytest.mark.parametrize('causal', [True, False])
  def test_stacked_transformer(self, scan, causal):
    from videoprism import layers as ref_layers

    b, t, d, n, hid, layers = 2, 5, 16, 2, 32, 3
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = jnp.zeros((b, t)).at[0, -1:].set(1.0)

    mod = ref_layers.StackedTransformer(
        num_layers=layers, hidden_dim=hid, num_heads=n,
        activation_fn=ref_layers.gelu,
        internal_enable_per_dim_scale=False, atten_logit_cap=50.0,
        enable_causal_atten=causal, scan=scan)
    variables = mod.init(jax.random.PRNGKey(2), x, paddings, train=False)
    params = _unwrap(variables)

    ref = mod.apply({'params': params}, x, paddings, train=False)
    cfg = tfm_lib.TransformerLayerConfig(
        num_layers=layers, hidden_dim=hid, num_heads=n,
        activation='gelu', enable_per_dim_scale=False, logit_cap=50.0,
        enable_causal_atten=causal, scan=scan)
    got = tfm_lib.stacked_transformer(params, x, paddings, cfg)
    np.testing.assert_allclose(got, ref, atol=TOL)

  @pytest.mark.parametrize('num_queries', [1, 3])
  @pytest.mark.parametrize('use_paddings', [True, False])
  def test_atten_token_pooling(self, num_queries, use_paddings):
    from videoprism import layers as ref_layers

    b, t, d, n = 2, 7, 16, 2
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = (
        jnp.zeros((b, t)).at[:, -2:].set(1.0) if use_paddings else None)

    mod = ref_layers.AttenTokenPoolingLayer(
        num_heads=n, num_queries=num_queries, hidden_dim=4 * d)
    variables = mod.init(jax.random.PRNGKey(2), x, paddings, train=False)
    params = _unwrap(variables)
    params['pooling_attention']['per_dim_scale']['per_dim_scale'] = (
        np.linspace(-0.2, 0.2, 4 * d // n).astype(np.float32))

    ref = mod.apply({'params': params}, x, paddings, train=False)
    got = tfm_lib.atten_token_pooling(
        params, x, paddings, num_heads=n, num_queries=num_queries,
        hidden_dim=4 * d)
    assert got.shape == (b, num_queries, d)
    np.testing.assert_allclose(got, ref, atol=TOL)


@requires_reference
class TestSequencePackingParity:
  """The small-sequence packing rewrite (ops/transformer.py) must be
  numerically invisible: compare against the reference on a geometry that
  actually triggers it (T=16, B divisible by 128/T=8)."""

  @pytest.mark.parametrize('use_paddings', [False, True])
  @pytest.mark.slow
  def test_packed_stack_matches_reference(self, use_paddings):
    from videoprism import layers as ref_layers
    from videoprism_tpu.ops import transformer as tfm_lib2

    b, t, d, n, hid, layers = 16, 16, 16, 2, 32, 2
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = jnp.zeros((b, t))
    if use_paddings:
      paddings = paddings.at[:4, -5:].set(1.0)

    mod = ref_layers.StackedTransformer(
        num_layers=layers, hidden_dim=hid, num_heads=n,
        activation_fn=ref_layers.gelu,
        internal_enable_per_dim_scale=False, atten_logit_cap=50.0,
        scan=True)
    variables = mod.init(jax.random.PRNGKey(2), x, paddings, train=False)
    params = jax.tree.map(jnp.asarray, variables['params'])
    ref = mod.apply({'params': params}, x, paddings, train=False)

    cfg = tfm_lib2.TransformerLayerConfig(
        num_layers=layers, hidden_dim=hid, num_heads=n,
        activation='gelu', enable_per_dim_scale=False, logit_cap=50.0,
        scan=True)
    assert cfg.pack_small_sequences  # the default; this test relies on it
    got = tfm_lib2.stacked_transformer(params, x, paddings, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # And packing off gives the same numbers too.
    import dataclasses
    cfg_off = dataclasses.replace(cfg, pack_small_sequences=False)
    got_off = tfm_lib2.stacked_transformer(params, x, paddings, cfg_off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(got_off),
                               atol=1e-6)
