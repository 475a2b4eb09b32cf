"""Int8 (W8A8) serving path: quantization round-trip, kernel parity vs
the dequantized composed oracle, and full-model quality."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu import quantization as q
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.ops import masks as mask_lib
from videoprism_tpu.ops import transformer as tfm
from videoprism_tpu.ops.pallas import int8_blocks as i8

D, N, H, F, T, B = 128, 2, 64, 256, 16, 4


def _cos(a, b):
  a = np.asarray(a, np.float32).ravel()
  b = np.asarray(b, np.float32).ravel()
  return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.fixture(scope='module')
def layer():
  cfg = tfm.TransformerLayerConfig(
      num_layers=1, hidden_dim=F, num_heads=N, norm_policy='pre',
      activation='gelu', enable_per_dim_scale=False, logit_cap=50.0)
  params = init_lib._transformer_layer(jax.random.PRNGKey(0), D, cfg)
  return params, cfg


class TestQuantization:

  def test_round_trip_close(self, layer):
    params, _ = layer
    qp = q.quantize_for_serving({'x': params})['x']
    assert qp['self_attention']['query']['w'].dtype == jnp.int8
    assert qp['self_attention']['query']['w_scale'].shape == (N, H)
    assert qp['self_attention']['post']['w_scale'].shape == (D,)
    assert qp['ff_layer']['ffn_layer1']['linear']['kernel_scale'].shape \
        == (F,)
    assert q.is_quantized(qp)
    deq = q.dequantize({'x': qp}, jnp.float32)['x']
    w0 = np.asarray(params['self_attention']['query']['w'])
    w1 = np.asarray(deq['self_attention']['query']['w'])
    # per-channel symmetric int8: error bounded by scale/2 per element
    bound = np.abs(w0).max(axis=0, keepdims=True) / 127.0
    assert (np.abs(w0 - w1) <= bound * 0.51 + 1e-8).all()
    assert 'w_scale' not in deq['self_attention']['query']

  def test_stacked_leaves_get_per_layer_scales(self):
    cfg = tfm.TransformerLayerConfig(
        num_layers=3, hidden_dim=F, num_heads=N, norm_policy='pre',
        activation='gelu', enable_per_dim_scale=False, scan=True)
    params = init_lib._stacked_transformer(
        jax.random.PRNGKey(1), D, cfg)
    qp = q.quantize_for_serving(params)
    wq = qp['x_layers']['self_attention']['query']
    assert wq['w'].dtype == jnp.int8 and wq['w'].shape == (3, D, N, H)
    assert wq['w_scale'].shape == (3, N, H)
    post = qp['x_layers']['self_attention']['post']
    assert post['w_scale'].shape == (3, D)

  def test_non_matmul_leaves_untouched(self, layer):
    params, _ = layer
    qp = q.quantize_for_serving(params)
    assert qp['layer_norm']['scale'].dtype != jnp.int8
    assert qp['self_attention']['query']['b'].dtype != jnp.int8

  def test_on_host_matches_device_bitwise(self, layer):
    """The numpy (host) path must produce the identical int8 tree so TP
    serving can quantize without committing the tree to one chip."""
    params, _ = layer
    host_in = jax.tree.map(np.asarray, params)
    qp_dev = q.quantize_for_serving(params)
    qp_host = q.quantize_for_serving(host_in, on_host=True)
    dev_leaves, dev_def = jax.tree.flatten(qp_dev)
    host_leaves, host_def = jax.tree.flatten(qp_host)
    assert dev_def == host_def
    for d, h in zip(dev_leaves, host_leaves):
      assert isinstance(h, np.ndarray)  # never committed to a device
      assert np.asarray(d).dtype == h.dtype
      np.testing.assert_array_equal(np.asarray(d), h)


class TestInt8Kernels:

  def test_ffn_matches_dequantized_composed(self, layer):
    params, cfg = layer
    x = jax.random.normal(jax.random.PRNGKey(2), (B * T, D))
    pads = jnp.zeros((B * T, 1)).at[5:9].set(1.0)
    qp = q.quantize_for_serving(params)
    deq = q.dequantize(qp, jnp.float32)

    ref = tfm.transformer_ffn(
        deq['ff_layer'], x[None], pads.reshape(1, B * T), cfg)[0]

    ff = qp['ff_layer']
    for chunks in (1, 2):
      got = i8.int8_ffn_block_chunked(
          x, pads,
          ff['layer_norm']['scale'], ff['layer_norm']['bias'],
          ff['ffn_layer1']['linear']['kernel'],
          ff['ffn_layer1']['linear']['kernel_scale'],
          ff['ffn_layer1']['linear']['bias'],
          ff['ffn_layer2']['linear']['kernel'],
          ff['ffn_layer2']['linear']['kernel_scale'],
          ff['ffn_layer2']['linear']['bias'],
          chunks=chunks, activation='gelu', interpret=True)
      assert _cos(got, ref) > 0.9995

  def test_attention_matches_dequantized_composed(self, layer):
    params, cfg = layer
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, D))
    paddings = jnp.zeros((B, T)).at[:, -3:].set(1.0)
    mask = mask_lib.attention_mask_for_fprop(x, paddings)
    qp = q.quantize_for_serving(params)
    deq = q.dequantize(qp, jnp.float32)

    from videoprism_tpu.ops.pallas import transformer_block as tb

    attnp = deq['self_attention']
    flat = lambda p: (p['w'].reshape(D, N * H), p['b'].reshape(N * H))
    wq, bq = flat(attnp['query'])
    wk, bk = flat(attnp['key'])
    wv, bv = flat(attnp['value'])
    wo = jnp.transpose(attnp['post']['w'], (1, 2, 0)).reshape(N * H, D)
    ref = tb._composed_attention_block(
        x, jnp.squeeze(mask, 1).astype(jnp.float32),
        deq['layer_norm']['scale'], deq['layer_norm']['bias'],
        wq, bq, wk, bk, wv, bv, wo, attnp['post']['b'],
        num_heads=N, dim_per_head=H, logit_cap=50.0, epsilon=1e-6,
        query_scale=H ** -0.5)

    qa = qp['self_attention']
    flat8 = lambda p: (p['w'].reshape(D, N * H),
                       p['w_scale'].reshape(N * H).astype(jnp.float32),
                       p['b'].reshape(N * H))
    wq8, sq, bq = flat8(qa['query'])
    wk8, sk, bk = flat8(qa['key'])
    wv8, sv, bv = flat8(qa['value'])
    wo8 = jnp.transpose(qa['post']['w'], (1, 2, 0)).reshape(N * H, D)
    so = qa['post']['w_scale'].astype(jnp.float32)
    for chunks in (1, 2):
      got = i8.int8_attention_block_chunked(
          x, jnp.squeeze(mask, 1).astype(jnp.float32),
          qp['layer_norm']['scale'], qp['layer_norm']['bias'],
          wq8, sq, bq, wk8, sk, bk, wv8, sv, bv, wo8, so,
          qa['post']['b'],
          num_heads=N, dim_per_head=H, chunks=chunks, logit_cap=50.0,
          query_scale=H ** -0.5, interpret=True)
      assert _cos(got, ref) > 0.9995

  def test_attention_seq_group_matches_single(self, layer):
    """G sequences per grid step == G=1 for the int8 attention block
    (row-independent math), incl. per-seq masks and chained chunks."""
    params, cfg = layer
    x = jax.random.normal(jax.random.PRNGKey(9), (B, T, D))
    paddings = jnp.zeros((B, T)).at[2, -3:].set(1.0)
    mask = jnp.squeeze(
        mask_lib.attention_mask_for_fprop(x, paddings), 1
    ).astype(jnp.float32)
    qp = q.quantize_for_serving(params)
    qa = qp['self_attention']
    flat8 = lambda p: (p['w'].reshape(D, N * H),
                       p['w_scale'].reshape(N * H).astype(jnp.float32),
                       p['b'].reshape(N * H))
    wq8, sq, bq = flat8(qa['query'])
    wk8, sk, bk = flat8(qa['key'])
    wv8, sv, bv = flat8(qa['value'])
    wo8 = jnp.transpose(qa['post']['w'], (1, 2, 0)).reshape(N * H, D)
    so = qa['post']['w_scale'].astype(jnp.float32)
    args = (x, mask, qp['layer_norm']['scale'], qp['layer_norm']['bias'],
            wq8, sq, bq, wk8, sk, bk, wv8, sv, bv, wo8, so,
            qa['post']['b'])
    kw = dict(num_heads=N, dim_per_head=H, logit_cap=50.0,
              query_scale=H ** -0.5, interpret=True)
    for chunks in (1, 2):
      ref = i8.int8_attention_block_chunked(*args, chunks=chunks, **kw)
      for g in (2, 4):
        got = i8.int8_attention_block_chunked(
            *args, chunks=chunks, seq_group=g, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6)

  def test_int8_seq_group_selection(self):
    # Full base width: the int8 kernel's temporaries (fp32 h + int8 h8 +
    # per-proj scales) are ~2.5x the bf16 kernel's, so G=2 does not fit
    # the conservative budget.  At half head-width (the chunks=2 slice)
    # it does.
    assert i8.attention_int8_seq_group_for(1024, 256, 768, 768, 2) == 1
    assert i8.attention_int8_seq_group_for(1024, 256, 768, 384, 2) == 2
    assert i8.attention_int8_seq_group_for(3, 256, 768, 384, 2) == 1

  def test_layer_dispatch_engages_int8(self, layer):
    params, cfg = layer
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, D)) * 0.3
    paddings = jnp.zeros((B, T))
    mask = mask_lib.attention_mask_for_fprop(x, paddings)
    qp = q.quantize_for_serving(params)
    fused_cfg = dataclasses.replace(
        cfg, attention_impl='flash', kernel_interpret=True)

    got = tfm._try_fused_int8_layer(qp, x, paddings, mask, fused_cfg,
                                    train=False)
    assert got is not None, 'int8 path must engage'
    ref = tfm.transformer_layer(
        q.dequantize(qp, jnp.float32), x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='xla'))
    assert _cos(got, ref) > 0.999

    # Quantized params through the public layer entry (any policy/path).
    via_layer = tfm.transformer_layer(qp, x, paddings, mask, fused_cfg)
    np.testing.assert_allclose(
        np.asarray(via_layer), np.asarray(got), atol=1e-6)

  def test_mixed_dispatch_ffn_only(self, layer):
    """Attention geometry the int8 BLOCK kernel can't take (t % 8 != 0)
    still serves int8: the attention half routes through the row-blocked
    projection kernels + flash core, the FFN half through the W8A8 FFN
    kernel.  (Before round 3 the attention half dequantized here.)"""
    params, cfg = layer
    t = 20  # t % 8 != 0 -> attention_int8_chunks_for returns None
    from videoprism_tpu.ops.pallas import int8_blocks as i8
    assert i8.attention_int8_chunks_for(t, D, N, H, 4) is None
    assert i8.ffn_int8_chunks_for(4 * t, D, F, 4) is not None

    x = jax.random.normal(jax.random.PRNGKey(6), (4, t, D)) * 0.3
    paddings = jnp.zeros((4, t))
    mask = mask_lib.attention_mask_for_fprop(x, paddings)
    qp = q.quantize_for_serving(params)
    fused_cfg = dataclasses.replace(
        cfg, attention_impl='flash', kernel_interpret=True)
    got = tfm._try_fused_int8_layer(qp, x, paddings, mask, fused_cfg,
                                    train=False)
    assert got is not None, 'mixed int8 path must engage'
    ref = tfm.transformer_layer(
        q.dequantize(qp, jnp.float32), x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='xla'))
    assert _cos(got, ref) > 0.999

  def test_mono_layer_matches_two_kernel_chain(self, layer):
    """The whole-layer kernel (one pallas_call per layer) matches the
    chained attention+FFN kernels and the dequantized composed oracle,
    including padding handling and in-kernel head/FFN chunking."""
    params, cfg = layer
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, D)) * 0.3
    paddings = jnp.zeros((B, T)).at[:, -2:].set(1.0)
    mask = mask_lib.attention_mask_for_fprop(x, paddings)
    mask2d = jnp.squeeze(mask, 1).astype(jnp.float32)
    qp = q.quantize_for_serving(params)

    qa = qp['self_attention']
    flat8 = lambda p: (p['w'].reshape(D, N * H),
                       p['w_scale'].reshape(N * H).astype(jnp.float32),
                       p['b'].reshape(N * H))
    wq8, sq, bq = flat8(qa['query'])
    wk8, sk, bk = flat8(qa['key'])
    wv8, sv, bv = flat8(qa['value'])
    wo8 = jnp.transpose(qa['post']['w'], (1, 2, 0)).reshape(N * H, D)
    so = qa['post']['w_scale'].astype(jnp.float32)
    ff = qp['ff_layer']
    args = (
        x, mask2d, paddings[..., None].astype(x.dtype),
        qp['layer_norm']['scale'], qp['layer_norm']['bias'],
        wq8, sq, bq, wk8, sk, bk, wv8, sv, bv, wo8, so, qa['post']['b'],
        ff['layer_norm']['scale'], ff['layer_norm']['bias'],
        ff['ffn_layer1']['linear']['kernel'],
        ff['ffn_layer1']['linear']['kernel_scale'].astype(jnp.float32),
        ff['ffn_layer1']['linear']['bias'],
        ff['ffn_layer2']['linear']['kernel'],
        ff['ffn_layer2']['linear']['kernel_scale'].astype(jnp.float32),
        ff['ffn_layer2']['linear']['bias'])
    kw = dict(num_heads=N, dim_per_head=H, logit_cap=50.0, epsilon=1e-6,
              query_scale=H ** -0.5, activation='gelu', interpret=True)

    # Two-kernel chain (the pre-existing int8 path).
    chained = i8.int8_attention_block_chunked(
        x, mask2d, qp['layer_norm']['scale'], qp['layer_norm']['bias'],
        wq8, sq, bq, wk8, sk, bk, wv8, sv, bv, wo8, so, qa['post']['b'],
        num_heads=N, dim_per_head=H, chunks=1, logit_cap=50.0,
        query_scale=H ** -0.5, interpret=True)
    chained = i8.int8_ffn_block_chunked(
        chained.reshape(B * T, D),
        paddings.reshape(B * T, 1).astype(x.dtype),
        ff['layer_norm']['scale'], ff['layer_norm']['bias'],
        ff['ffn_layer1']['linear']['kernel'],
        ff['ffn_layer1']['linear']['kernel_scale'].astype(jnp.float32),
        ff['ffn_layer1']['linear']['bias'],
        ff['ffn_layer2']['linear']['kernel'],
        ff['ffn_layer2']['linear']['kernel_scale'].astype(jnp.float32),
        ff['ffn_layer2']['linear']['bias'],
        chunks=1, activation='gelu', interpret=True).reshape(B, T, D)

    ref = tfm.transformer_layer(
        q.dequantize(qp, jnp.float32), x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='xla'))

    for hc, fc in ((1, 1), (2, 2), (1, 2)):
      got = i8.int8_layer_block(*args, head_chunks=hc, ffn_chunks=fc, **kw)
      assert _cos(got, ref) > 0.999, (hc, fc)
    # Unchunked, the mono kernel IS the chain's math: bit-identical.
    # (Chunked variants quantize ctx/hidden per group — finer scales, a
    # deliberate scheme difference bounded by one quant step.)
    got11 = i8.int8_layer_block(*args, head_chunks=1, ffn_chunks=1, **kw)
    np.testing.assert_array_equal(np.asarray(got11), np.asarray(chained))

  def test_quantized_composed_fallback(self, layer):
    """Unsupported config (xla impl) falls back to dequantize+composed."""
    params, cfg = layer
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, D)) * 0.3
    paddings = jnp.zeros((B, T))
    mask = mask_lib.attention_mask_for_fprop(x, paddings)
    qp = q.quantize_for_serving(params)
    got = tfm.transformer_layer(
        qp, x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='xla'))
    ref = tfm.transformer_layer(
        q.dequantize(qp, jnp.float32), x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='xla'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestInt8LongSeqAttention:
  """Sequences beyond the block kernel's T cap (the 4096-token CLIP aux
  encoder): int8 projections around the bf16 flash core, no per-step
  dequantization."""

  def _flat_weights(self, params):
    attn = params['self_attention']
    nh = N * H
    flat = lambda p: (p['w'].reshape(D, nh),
                      p['w_scale'].reshape(nh).astype(jnp.float32),
                      p['b'].reshape(nh).astype(jnp.float32))
    wq, sq, bq = flat(attn['query'])
    wk, sk, bk = flat(attn['key'])
    wv, sv, bv = flat(attn['value'])
    wo = jnp.transpose(attn['post']['w'], (1, 2, 0)).reshape(nh, D)
    so = attn['post']['w_scale'].astype(jnp.float32)
    bo = attn['post']['b'].astype(jnp.float32)
    return (wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo)

  def test_projected_flash_matches_dequantized_composed(self, layer):
    from videoprism_tpu.ops.pallas import transformer_block as tb

    params, _ = layer
    qp = q.quantize_for_serving(params)
    w = self._flat_weights(qp)
    x = (jax.random.normal(jax.random.PRNGKey(7), (2, 256, D)) * 0.3
         ).astype(jnp.float32)
    mask = jnp.zeros((1, 1, 1, 256), jnp.float32)
    ln_s = params['layer_norm']['scale'].astype(jnp.float32)
    ln_b = params['layer_norm']['bias'].astype(jnp.float32)
    got = i8.int8_projected_flash_attention(
        x, mask, ln_s, ln_b, *w, num_heads=N, dim_per_head=H,
        logit_cap=50.0, query_scale=H ** -0.5, interpret=True)
    deq = q.dequantize(qp, jnp.float32)
    attn_d = deq['self_attention']
    nh = N * H
    ref = tb._composed_attention_block(
        x, mask[:, 0], ln_s, ln_b,
        attn_d['query']['w'].reshape(D, nh),
        attn_d['query']['b'].reshape(nh),
        attn_d['key']['w'].reshape(D, nh),
        attn_d['key']['b'].reshape(nh),
        attn_d['value']['w'].reshape(D, nh),
        attn_d['value']['b'].reshape(nh),
        jnp.transpose(attn_d['post']['w'], (1, 2, 0)).reshape(nh, D),
        attn_d['post']['b'],
        num_heads=N, dim_per_head=H, logit_cap=50.0, epsilon=1e-6,
        query_scale=H ** -0.5)
    assert _cos(got, ref) > 0.999
    assert np.isfinite(np.asarray(got, np.float32)).all()

  def test_partial_out_psum_contract(self, layer):
    """partial_out returns the raw projection: adding bias + residual
    outside must equal the non-partial output."""
    params, _ = layer
    qp = q.quantize_for_serving(params)
    w = self._flat_weights(qp)
    bo = w[-1]
    x = (jax.random.normal(jax.random.PRNGKey(8), (1, 64, D)) * 0.3
         ).astype(jnp.float32)
    mask = jnp.zeros((1, 1, 1, 64), jnp.float32)
    ln_s = params['layer_norm']['scale'].astype(jnp.float32)
    ln_b = params['layer_norm']['bias'].astype(jnp.float32)
    kw = dict(num_heads=N, dim_per_head=H, logit_cap=50.0,
              query_scale=H ** -0.5, interpret=True)
    full = i8.int8_projected_flash_attention(
        x, mask, ln_s, ln_b, *w, **kw)
    part = i8.int8_projected_flash_attention(
        x, mask, ln_s, ln_b, *w, partial_out=True, **kw)
    np.testing.assert_allclose(
        np.asarray(x + (part + bo)), np.asarray(full), atol=1e-4)

  def test_dispatch_engages_beyond_t_cap_without_dequant(self, layer,
                                                         monkeypatch):
    """t=1280 exceeds the block kernel's 1024 cap: the dispatch must take
    the projected-flash path and never call dequantize in the forward."""
    params, cfg = layer
    t = 1280
    assert i8.attention_int8_chunks_for(t, D, N, H, 4) is None
    assert i8.attn_int8_projection_supported(2 * t, D, N * H, 4)

    def boom(*a, **k):
      raise AssertionError('dequantize called inside the int8 forward')

    qp = q.quantize_for_serving(params)
    x = (jax.random.normal(jax.random.PRNGKey(9), (2, t, D)) * 0.3
         ).astype(jnp.float32)
    paddings = jnp.zeros((2, t))
    mask = mask_lib.attention_mask_for_fprop(x, paddings)
    fused_cfg = dataclasses.replace(
        cfg, attention_impl='flash', kernel_interpret=True)
    ref = tfm.transformer_layer(
        q.dequantize(qp, jnp.float32), x, paddings, mask,
        dataclasses.replace(cfg, attention_impl='xla'))
    monkeypatch.setattr(q, 'dequantize', boom)
    got = tfm._try_fused_int8_layer(qp, x, paddings, mask, fused_cfg,
                                    train=False)
    assert got is not None, 'projected int8 path must engage'
    assert _cos(got, ref) > 0.999


class TestQuantizedCheckpoint:

  @pytest.mark.slow
  def test_quantize_save_load_roundtrip(self, tmp_path):
    """Offline-quantized checkpoints reload and serve (the int8 dtype is
    the routing marker, so the artifact is self-describing)."""
    import subprocess
    import sys

    from videoprism_tpu.io import checkpoints
    from videoprism_tpu.models import factorized_encoder as fe

    cfg = fe.FactorizedEncoderConfig(
        patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=D,
        num_spatial_layers=1, num_temporal_layers=1, num_heads=N,
        mlp_dim=F, atten_logit_cap=50.0)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(8), cfg)
    src = str(tmp_path / 'ckpt.npz')
    dst = str(tmp_path / 'ckpt_int8.npz')
    checkpoints.save_checkpoint(src, params)

    import pathlib
    script = str(pathlib.Path(__file__).resolve().parent.parent
                 / 'scripts' / 'quantize_checkpoint.py')
    # timeout: a regression that re-introduces a device dependency would
    # otherwise hang the suite for as long as the axon chip claim does.
    res = subprocess.run([sys.executable, script, src, dst],
                         capture_output=True, text=True, timeout=240)
    assert res.returncode == 0, res.stderr

    loaded = checkpoints.load_checkpoint(dst)
    assert q.is_quantized(
        jax.tree_util.tree_map(
            jnp.asarray,
            loaded['spatial_encoder']['transformers_stack']['x_layers']))
    video = jax.random.normal(jax.random.PRNGKey(9), (1, 2, 12, 12, 3))
    ref, _ = fe.apply(params, video, cfg)
    got, _ = fe.apply(
        jax.tree_util.tree_map(jnp.asarray, loaded), video, cfg)
    assert _cos(got, ref) > 0.995


class TestInt8Model:

  def test_encoder_quality(self):
    """Quantized factorized encoder holds cosine > 0.995 vs fp32."""
    from videoprism_tpu.models import factorized_encoder as fe

    cfg = fe.FactorizedEncoderConfig(
        patch_size=18, pos_emb_shape=(4, 4, 4), model_dim=D,
        num_spatial_layers=2, num_temporal_layers=1, num_heads=N,
        mlp_dim=F, atten_logit_cap=50.0)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(6), cfg)
    video = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 72, 72, 3))

    ref, _ = fe.apply(params, video, cfg)
    qp = q.quantize_for_serving(params)
    fused_cfg = dataclasses.replace(
        cfg, attention_impl='flash', kernel_interpret=True)
    got, _ = fe.apply(qp, video, fused_cfg)
    assert _cos(got, ref) > 0.995
