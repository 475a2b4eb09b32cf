"""Trainability of the fused kernels: custom_vjp fwd/bwd correctness
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import init as init_lib
from videoprism_tpu.ops import masks as mask_lib
from videoprism_tpu.ops import transformer as tfm
from videoprism_tpu.ops.pallas import transformer_block as tb

D, N, H, F, T, B = 128, 2, 64, 256, 16, 2


@pytest.fixture(scope='module')
def layer_params():
  cfg = tfm.TransformerLayerConfig(
      num_layers=1, hidden_dim=F, num_heads=N, norm_policy='pre',
      activation='gelu', enable_per_dim_scale=False, logit_cap=50.0)
  return init_lib._transformer_layer(jax.random.PRNGKey(0), D, cfg), cfg


def _attn_args(params):
  x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
  paddings = jnp.zeros((B, T))
  mask = jnp.squeeze(
      mask_lib.attention_mask_for_fprop(x, paddings), 1
  ).astype(jnp.float32)
  attnp = params['self_attention']
  flat_in = lambda p: (p['w'].reshape(D, N * H), p['b'].reshape(N * H))
  wq, bq = flat_in(attnp['query'])
  wk, bk = flat_in(attnp['key'])
  wv, bv = flat_in(attnp['value'])
  wo = jnp.transpose(attnp['post']['w'], (1, 2, 0)).reshape(N * H, D)
  ln = params['layer_norm']
  return (x, mask, ln['scale'], ln['bias'],
          wq, bq, wk, bk, wv, bv, wo, attnp['post']['b'])


class TestKernelVjp:

  def test_attention_block_forward_and_grad(self, layer_params):
    params, _ = layer_params
    args = _attn_args(params)
    f = tb.attention_block_vjp(
        num_heads=N, dim_per_head=H, logit_cap=50.0, epsilon=1e-6,
        query_scale=H ** -0.5, interpret=True)
    composed = lambda *a: tb._composed_attention_block(
        *a, num_heads=N, dim_per_head=H, logit_cap=50.0, epsilon=1e-6,
        query_scale=H ** -0.5)

    np.testing.assert_allclose(
        np.asarray(f(*args)), np.asarray(composed(*args)), atol=2e-5)

    loss_k = lambda x: jnp.sum(jnp.square(f(x, *args[1:])))
    loss_c = lambda x: jnp.sum(jnp.square(composed(x, *args[1:])))
    gk = jax.grad(loss_k)(args[0])
    gc = jax.grad(loss_c)(args[0])
    assert np.isfinite(np.asarray(gk)).all()
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gc), atol=2e-4)

  def test_ffn_block_forward_and_grad(self, layer_params):
    params, _ = layer_params
    ff = params['ff_layer']
    x = jax.random.normal(jax.random.PRNGKey(2), (B * T, D))
    pads = jnp.zeros((B * T, 1)).at[3:7].set(1.0)
    args = (x, pads, ff['layer_norm']['scale'], ff['layer_norm']['bias'],
            ff['ffn_layer1']['linear']['kernel'],
            ff['ffn_layer1']['linear']['bias'],
            ff['ffn_layer2']['linear']['kernel'],
            ff['ffn_layer2']['linear']['bias'])
    for chunks in (None, 2):
      f = tb.ffn_block_vjp('gelu', 1e-6, chunks, interpret=True)
      composed = lambda *a: tb._composed_ffn_block(
          *a, activation='gelu', epsilon=1e-6)
      np.testing.assert_allclose(
          np.asarray(f(*args)), np.asarray(composed(*args)), atol=2e-5)

      # Gradients wrt activations AND weights flow and match the twin.
      loss_k = lambda x, w1: jnp.sum(
          f(x, *args[1:4], w1, *args[5:]))
      loss_c = lambda x, w1: jnp.sum(
          composed(x, *args[1:4], w1, *args[5:]))
      gk = jax.grad(loss_k, argnums=(0, 1))(args[0], args[4])
      gc = jax.grad(loss_c, argnums=(0, 1))(args[0], args[4])
      for a, b in zip(gk, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)

  def test_flash_attention_grad(self):
    from videoprism_tpu.ops import attention as al
    from videoprism_tpu.ops.pallas import flash_attention as flash

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 128, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 128, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 128, 64))
    mask = jnp.zeros((1, 1, 1, 128))

    fk = flash._attention_vjp(50.0, 'float32', 128, True, False)
    loss_k = lambda q: jnp.sum(jnp.square(fk(q, k, v, mask)))
    loss_c = lambda q: jnp.sum(jnp.square(
        al._dot_atten_head_major(q, k, v, mask, logit_cap=50.0)))
    gk = jax.grad(loss_k)(q)
    gc = jax.grad(loss_c)(q)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gc), atol=2e-4)
