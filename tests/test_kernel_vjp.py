"""Trainability of the fused kernels: custom_vjp fwd/bwd correctness
(interpret mode on CPU)."""

import functools

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

  @pytest.mark.slow
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


class TestAttentionBwdKernel:
  """The hand-written flash backward kernel vs jax.vjp of the composed
  math (interpret mode): dq/dk/dv, both cap branches, masked rows
  (including fully-masked padded queries), multi-T-block accumulation."""

  def _qkv(self, t, s=None, b=2, n=2, h=64):
    s = t if s is None else s
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(keys[0], (b, n, t, h))
    k = jax.random.normal(keys[1], (b, n, s, h))
    v = jax.random.normal(keys[2], (b, n, s, h))
    g = jax.random.normal(keys[3], (b, n, t, h))
    return q, k, v, g

  @pytest.mark.parametrize('logit_cap', [0.0, 50.0])
  def test_matches_composed_vjp(self, logit_cap):
    from videoprism_tpu.ops import attention as al
    from videoprism_tpu.ops.pallas import flash_attention as flash

    t = 384  # 3 T-blocks of 128 -> exercises the dk/dv scratch accumulation
    q, k, v, g = self._qkv(t)
    # Last 100 keys padded for batch row 0; row 1 unpadded.
    mask4 = jnp.zeros((2, 1, 1, t)).at[0, :, :, -100:].set(-0.7 * 3e38)

    assert flash.bwd_supported(t, t, 64, 2, 4)
    dq, dk, dv = flash.fused_attention_bwd(
        q, k, v, jnp.squeeze(mask4, 1), g, logit_cap=logit_cap,
        interpret=True)

    composed = lambda q, k, v: al._dot_atten_head_major(
        q, k, v, mask4, logit_cap=logit_cap)
    _, vjp_fn = jax.vjp(composed, q, k, v)
    cq, ck, cv = vjp_fn(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(cq), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(ck), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(cv), atol=3e-4)

  def test_fully_masked_query_rows(self):
    """Padded query rows (forward renders them uniform 1/S) must get the
    same gradients as the composed twin's where-select chain."""
    from videoprism_tpu.ops.pallas import flash_attention as flash
    from videoprism_tpu.ops.pallas import transformer_block as tb

    t = 128
    q, k, v, g = self._qkv(t)
    neg = -0.7 * float(jnp.finfo(jnp.float32).max)
    # Batch row 0: query rows beyond 40 are fully masked.
    mask = jnp.zeros((2, t, t)).at[0, 40:, :].set(neg)

    dq, dk, dv = flash.fused_attention_bwd(
        q, k, v, mask, g, logit_cap=50.0, interpret=True)

    def composed(q, k, v):
      logits = jnp.einsum('BNTH,BNSH->BNTS', q, k,
                          preferred_element_type=jnp.float32)
      ok = mask[:, None] >= neg * 0.5
      logits = 50.0 * jnp.tanh(logits / 50.0)
      unnorm = jnp.where(ok, jnp.exp(logits), 0.0)
      denom = jnp.sum(unnorm, axis=-1, keepdims=True)
      unnorm = jnp.where(denom == 0.0, 1.0, unnorm)
      denom = jnp.where(denom == 0.0, float(t), denom)
      probs = (unnorm / denom).astype(q.dtype)
      return jnp.einsum('BNTS,BNSH->BNTH', probs, v)

    _, vjp_fn = jax.vjp(composed, q, k, v)
    cq, ck, cv = vjp_fn(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(cq), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(ck), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(cv), atol=3e-4)
    assert np.isfinite(np.asarray(dq)).all()

  def test_packed_small_seq_bwd(self):
    """The packed (G sequences per 128-row block) path must route its
    backward through the kernel and match composed gradients."""
    from videoprism_tpu.ops import attention as al
    from videoprism_tpu.ops.pallas import flash_attention as flash

    b, n, t, h = 16, 2, 16, 64
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(keys[0], (b, n, t, h))
    k = jax.random.normal(keys[1], (b, n, t, h))
    v = jax.random.normal(keys[2], (b, n, t, h))
    mask = jnp.zeros((b, 1, 1, t)).at[:3, :, :, -5:].set(-0.7 * 3e38)

    fk = flash._attention_vjp(50.0, 'float32', 128, True, True)
    loss_k = lambda q, k, v: jnp.sum(jnp.square(fk(q, k, v, mask)))
    loss_c = lambda q, k, v: jnp.sum(jnp.square(
        al._dot_atten_head_major(q, k, v, mask, logit_cap=50.0)))
    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gc = jax.grad(loss_c, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gc):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                 rtol=2e-4, atol=3e-4)

  def test_block_vjp_kernel_core(self, layer_params):
    """Block-level custom_vjp with a flash-supported T uses the kernel-core
    backward; gradients must match the fully composed twin."""
    params, _ = layer_params
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 128, D))
    paddings = jnp.zeros((2, 128)).at[0, -17:].set(1.0)
    mask = jnp.squeeze(
        mask_lib.attention_mask_for_fprop(x, paddings), 1
    ).astype(jnp.float32)
    attnp = params['self_attention']
    flat_in = lambda p: (p['w'].reshape(D, N * H), p['b'].reshape(N * H))
    wq, bq = flat_in(attnp['query'])
    wk, bk = flat_in(attnp['key'])
    wv, bv = flat_in(attnp['value'])
    wo = jnp.transpose(attnp['post']['w'], (1, 2, 0)).reshape(N * H, D)
    args = (x, mask, params['layer_norm']['scale'],
            params['layer_norm']['bias'],
            wq, bq, wk, bk, wv, bv, wo, attnp['post']['b'])

    static = dict(num_heads=N, dim_per_head=H, logit_cap=50.0,
                  epsilon=1e-6, query_scale=H ** -0.5)
    f = tb.attention_block_vjp(**static, interpret=True)
    composed = functools.partial(tb._composed_attention_block, **static)

    # Gradients through x AND weights.
    loss_k = lambda x, wq, wo: jnp.sum(jnp.square(
        f(x, *args[1:4], wq, *args[5:10], wo, args[11])))
    loss_c = lambda x, wq, wo: jnp.sum(jnp.square(
        composed(x, *args[1:4], wq, *args[5:10], wo, args[11])))
    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, wq, wo)
    gc = jax.grad(loss_c, argnums=(0, 1, 2))(x, wq, wo)
    for a, b_ in zip(gk, gc):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)
