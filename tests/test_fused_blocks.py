"""Fused transformer block kernels vs the composed oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import init as init_lib
from videoprism_tpu.ops import masks as mask_lib
from videoprism_tpu.ops import transformer as tfm
from videoprism_tpu.ops.pallas import transformer_block as tb

D, N, H, F, T, B = 128, 2, 64, 256, 16, 4


@pytest.fixture(scope='module')
def layer_params():
  cfg = tfm.TransformerLayerConfig(
      num_layers=1, hidden_dim=F, num_heads=N, norm_policy='pre',
      activation='gelu', enable_per_dim_scale=False, logit_cap=50.0)
  return tfm.__dict__, init_lib._transformer_layer(
      jax.random.PRNGKey(0), D, cfg), cfg


class TestFusedBlocks:

  def test_attention_block_matches_composed(self, layer_params):
    _, params, cfg = layer_params
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    paddings = jnp.zeros((B, T)).at[:, -3:].set(1.0)
    mask = mask_lib.attention_mask_for_fprop(x, paddings)

    # Composed: LN1 -> MHA -> +x  (first half of transformer_layer).
    from videoprism_tpu.ops import attention as al
    from videoprism_tpu.ops import basic

    h = basic.layer_norm(params['layer_norm'], x, impl='xla')
    attn = al.multi_head_attention(
        params['self_attention'], h, h, h, mask,
        hidden_dim=D, num_heads=N, logit_cap=50.0,
        enable_per_dim_scale=False)
    ref = attn + x

    attnp = params['self_attention']
    flat_in = lambda p: (p['w'].reshape(D, N * H), p['b'].reshape(N * H))
    wq, bq = flat_in(attnp['query'])
    wk, bk = flat_in(attnp['key'])
    wv, bv = flat_in(attnp['value'])
    wo = jnp.transpose(attnp['post']['w'], (1, 2, 0)).reshape(N * H, D)
    got = tb.fused_attention_block(
        x, jnp.squeeze(mask, 1).astype(jnp.float32),
        params['layer_norm']['scale'], params['layer_norm']['bias'],
        wq, bq, wk, bk, wv, bv, wo, attnp['post']['b'],
        num_heads=N, dim_per_head=H, logit_cap=50.0,
        query_scale=H ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

  def test_ffn_block_matches_composed(self, layer_params):
    _, params, cfg = layer_params
    x = jax.random.normal(jax.random.PRNGKey(2), (B * T, D))
    paddings = jnp.zeros((B * T, 1)).at[5:9].set(1.0)

    ref = tfm.transformer_ffn(
        params['ff_layer'], x[None], paddings.reshape(1, B * T), cfg)[0]

    ff = params['ff_layer']
    got = tb.fused_ffn_block(
        x, paddings,
        ff['layer_norm']['scale'], ff['layer_norm']['bias'],
        ff['ffn_layer1']['linear']['kernel'],
        ff['ffn_layer1']['linear']['bias'],
        ff['ffn_layer2']['linear']['kernel'],
        ff['ffn_layer2']['linear']['bias'],
        activation='gelu', interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

  def test_chunked_ffn_matches_single(self, layer_params):
    _, params, cfg = layer_params
    x = jax.random.normal(jax.random.PRNGKey(3), (B * T, D))
    paddings = jnp.zeros((B * T, 1)).at[3:6].set(1.0)
    ff = params['ff_layer']
    args = (x, paddings,
            ff['layer_norm']['scale'], ff['layer_norm']['bias'],
            ff['ffn_layer1']['linear']['kernel'],
            ff['ffn_layer1']['linear']['bias'],
            ff['ffn_layer2']['linear']['kernel'],
            ff['ffn_layer2']['linear']['bias'])
    ref = tb.fused_ffn_block(*args, activation='gelu', interpret=True)
    for chunks in (2, 4):
      got = tb.fused_ffn_block_chunked(
          *args, chunks=chunks, activation='gelu', interpret=True)
      np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                 atol=2e-6)

  def test_chunked_attention_matches_single(self, layer_params):
    """Head-group-chunked attention block == monolithic kernel (which is
    itself oracle-tested above), incl. the partial-output TP mode."""
    _, params, cfg = layer_params
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, D))
    paddings = jnp.zeros((B, T)).at[:, -3:].set(1.0)
    mask = mask_lib.attention_mask_for_fprop(x, paddings)
    mask2 = jnp.squeeze(mask, 1).astype(jnp.float32)

    attnp = params['self_attention']
    flat_in = lambda p: (p['w'].reshape(D, N * H), p['b'].reshape(N * H))
    wq, bq = flat_in(attnp['query'])
    wk, bk = flat_in(attnp['key'])
    wv, bv = flat_in(attnp['value'])
    wo = jnp.transpose(attnp['post']['w'], (1, 2, 0)).reshape(N * H, D)
    args = (x, mask2, params['layer_norm']['scale'],
            params['layer_norm']['bias'],
            wq, bq, wk, bk, wv, bv, wo, attnp['post']['b'])
    for partial_out in (False, True):
      ref = tb.fused_attention_block(
          *args, num_heads=N, dim_per_head=H, logit_cap=50.0,
          query_scale=H ** -0.5, partial_out=partial_out, interpret=True)
      got = tb.fused_attention_block_chunked(
          *args, num_heads=N, dim_per_head=H, chunks=2, logit_cap=50.0,
          query_scale=H ** -0.5, partial_out=partial_out, interpret=True)
      np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                 atol=2e-6)

  def test_seq_group_attention_matches_single(self, layer_params):
    """G sequences per grid step == G=1 (row-independent math), incl.
    per-sequence and broadcast masks and the partial-output TP mode."""
    _, params, cfg = layer_params
    x = jax.random.normal(jax.random.PRNGKey(11), (B, T, D))
    paddings = jnp.zeros((B, T)).at[1, -3:].set(1.0)
    mask_per_seq = jnp.squeeze(
        mask_lib.attention_mask_for_fprop(x, paddings), 1
    ).astype(jnp.float32)                       # [B, 1, T]
    mask_shared = jnp.zeros((1, 1, T), jnp.float32)

    attnp = params['self_attention']
    flat_in = lambda p: (p['w'].reshape(D, N * H), p['b'].reshape(N * H))
    wq, bq = flat_in(attnp['query'])
    wk, bk = flat_in(attnp['key'])
    wv, bv = flat_in(attnp['value'])
    wo = jnp.transpose(attnp['post']['w'], (1, 2, 0)).reshape(N * H, D)
    rest = (params['layer_norm']['scale'], params['layer_norm']['bias'],
            wq, bq, wk, bk, wv, bv, wo, attnp['post']['b'])
    for mask in (mask_per_seq, mask_shared):
      for partial_out in (False, True):
        ref = tb.fused_attention_block(
            x, mask, *rest, num_heads=N, dim_per_head=H, logit_cap=50.0,
            query_scale=H ** -0.5, partial_out=partial_out, interpret=True)
        for g in (2, 4):
          got = tb.fused_attention_block(
              x, mask, *rest, num_heads=N, dim_per_head=H, logit_cap=50.0,
              query_scale=H ** -0.5, partial_out=partial_out,
              seq_group=g, interpret=True)
          np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                     atol=2e-6)

  def test_seq_group_selection(self):
    # base spatial (t=256, d=768): G=2 fits, G=4 does not.
    assert tb.attention_seq_group_for(1024, 256, 768, 768, 2) == 2
    # base temporal after 128-token packing: G=4 fits.
    assert tb.attention_seq_group_for(128, 128, 768, 768, 2) == 4
    # b not divisible: falls through to what divides.
    assert tb.attention_seq_group_for(6, 256, 768, 768, 2) == 2
    assert tb.attention_seq_group_for(3, 256, 768, 768, 2) == 1
    # large (d=1024): projections' temporaries push G=2 past the budget.
    assert tb.attention_seq_group_for(512, 256, 1024, 1024, 2) == 1

  def test_chunked_attention_gradients(self, layer_params):
    _, params, cfg = layer_params
    x = jax.random.normal(jax.random.PRNGKey(7), (2, T, D))
    mask = jnp.zeros((2, 1, T), jnp.float32)
    attnp = params['self_attention']
    flat_in = lambda p: (p['w'].reshape(D, N * H), p['b'].reshape(N * H))
    wq, bq = flat_in(attnp['query'])
    wk, bk = flat_in(attnp['key'])
    wv, bv = flat_in(attnp['value'])
    wo = jnp.transpose(attnp['post']['w'], (1, 2, 0)).reshape(N * H, D)
    args = (x, mask, params['layer_norm']['scale'],
            params['layer_norm']['bias'],
            wq, bq, wk, bk, wv, bv, wo, attnp['post']['b'])

    fn = tb.attention_block_vjp(
        num_heads=N, dim_per_head=H, logit_cap=50.0, epsilon=1e-6,
        query_scale=H ** -0.5, interpret=True, chunks=2)
    ref_fn = lambda *a: tb._composed_attention_block(
        *a, num_heads=N, dim_per_head=H, logit_cap=50.0, epsilon=1e-6,
        query_scale=H ** -0.5)
    g_kernel = jax.grad(lambda a: jnp.sum(jnp.square(fn(*a))))(args)
    g_ref = jax.grad(lambda a: jnp.sum(jnp.square(ref_fn(*a))))(args)
    for gk, gr in zip(g_kernel, g_ref):
      np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-4)

  def test_attention_chunk_selection(self):
    # giant (D=1408, 16 heads x 88): monolithic weights are 15.9 MB bf16
    # -> 2 head groups of 8 fit (weights+temps vs the scoped stack;
    # pipeline buffers don't count — measured on hardware).
    assert tb.attention_chunks_for(256, 1408, 16, 88, 2) == 2
    # base/large fit the monolithic kernel -> no chunking.
    assert tb.attention_chunks_for(256, 768, 12, 64, 2) is None
    assert tb.attention_chunks_for(256, 1024, 16, 64, 2) is None
    # text lengths (65) stay composed either way.
    assert tb.attention_chunks_for(65, 1408, 16, 88, 2) is None

  @pytest.mark.slow
  def test_giant_width_layer_routes_chunked(self):
    """A giant-width layer engages the fused path end-to-end (chunked
    attention + chunked FFN) and matches the composed layer."""
    import dataclasses

    d, n, h, f = 1408, 16, 88, 512
    cfg = tfm.TransformerLayerConfig(
        num_layers=1, hidden_dim=f, num_heads=n, dim_per_head=h,
        norm_policy='pre', activation='gelu',
        enable_per_dim_scale=False, logit_cap=50.0)
    params = init_lib._transformer_layer(jax.random.PRNGKey(8), d, cfg)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, d)) * 0.1
    paddings = jnp.zeros((2, 8))
    mask = mask_lib.attention_mask_for_fprop(x, paddings)

    assert tb.attention_chunks_for(8, d, n, h, x.dtype.itemsize) is not None
    ref = tfm.transformer_layer(
        params, x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='xla'))
    got = tfm._try_fused_layer(
        params, x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='flash',
                            kernel_interpret=True), train=False)
    assert got is not None, 'fused path must engage at giant widths'
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

  def test_chunk_selection(self):
    assert tb.ffn_chunks_for(32768, 1024, 4096, 2) == 2   # large bf16
    assert tb.ffn_chunks_for(32768, 1408, 6144, 2) == 4   # giant bf16
    # Unblockable row counts (e.g. tiny text towers) -> no chunking.
    assert tb.ffn_chunks_for(10, 1024, 4096, 2) is None

  @pytest.mark.parametrize('use_paddings', [False, True])
  def test_primer_hybrid_layer_fused_matches_composed(self, use_paddings):
    """primer_hybrid (the lvt-giant norm policy) rides the fused kernels
    in partial-output mode with a bias->post-LN->residual epilogue; the
    full layer must match the composed path (itself oracle-tested)."""
    import dataclasses

    cfg = tfm.TransformerLayerConfig(
        num_layers=1, hidden_dim=F, num_heads=N,
        norm_policy='primer_hybrid', activation='gelu',
        enable_per_dim_scale=False, logit_cap=50.0)
    params = init_lib._transformer_layer(jax.random.PRNGKey(4), D, cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 16, D))
    paddings = jnp.zeros((8, 16))
    if use_paddings:
      paddings = paddings.at[:2, -5:].set(1.0)
    mask = mask_lib.attention_mask_for_fprop(x, paddings)

    ref = tfm.transformer_layer(
        params, x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='xla'))
    fused_cfg = dataclasses.replace(
        cfg, attention_impl='flash', kernel_interpret=True)
    got = tfm._try_fused_layer(params, x, paddings, mask, fused_cfg,
                               train=False)
    assert got is not None, 'fused path must engage for primer_hybrid'
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)

    # Gradients through the partial-mode vjp epilogue agree too.
    loss_f = lambda x: jnp.sum(jnp.square(tfm._try_fused_layer(
        params, x, paddings, mask, fused_cfg, train=False)))
    loss_c = lambda x: jnp.sum(jnp.square(tfm.transformer_layer(
        params, x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='xla'))))
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_f)(x)), np.asarray(jax.grad(loss_c)(x)),
        atol=5e-4)

  def test_erf_approximation_accuracy(self):
    import scipy.special as sp

    x = np.linspace(-5, 5, 2001, dtype=np.float32)
    approx = np.asarray(tb._erf(jnp.asarray(x)))
    # A&S 7.1.26 bound is 1.5e-7 in real arithmetic; fp32 rounding adds a
    # little.  Still ~4 orders below bf16 output rounding.
    assert np.abs(approx - sp.erf(x)).max() < 5e-7

  def test_support_predicates(self):
    assert tb.attention_block_supported(256, 768, 768, 2)
    assert not tb.attention_block_supported(65, 768, 768, 2)  # text len
    assert tb.ffn_block_supported(32768, 768, 3072, 2)
    # Large/giant FFN weights exceed VMEM (16.8/34 MB bf16): those widths
    # fall back to the composed path until F-chunking lands.
    assert not tb.ffn_block_supported(32768, 1024, 4096, 2)
    assert not tb.ffn_block_supported(32768, 1408, 6144, 4)
    # But the large attention block fits.
    assert tb.attention_block_supported(256, 1024, 1024, 2)
