"""Sequence-parallel aux-ViT + pooler tests on the 8-device CPU mesh.

The aux ViT and the contrastive pooler are the architecture's only
full-sequence attentions (SURVEY.md par. 2; reference
videoprism/encoders.py:846-867) — `parallel/sp.py` shards their token
dimension over the `model` mesh axis.  These tests pin the sequence-parallel
path to the single-device math: forward parity, gradient parity (collective
transposes), padding-mask parity, and the flash kernel on the rectangular
per-shard geometry.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.ops import basic
from videoprism_tpu.ops.transformer import atten_token_pooling
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import sp as sp_lib

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
    num_temporal_layers=1, mlp_dim=32, num_auxiliary_layers=2,
    vocabulary_size=64, enable_causal_atten=True, num_unimodal_layers=2,
    norm_policy='pre', model_dim=16, num_heads=2, atten_logit_cap=50.0,
    scan=True)


def _cfg(**overrides):
  return vclip.VideoCLIPConfig(**{**TINY_CLIP, **overrides})


def _reference_tail(params, tokens, cfg, paddings=None):
  """Single-device aux + pooler + l2-norm (the encode_vision tail)."""
  aux_cfg = cfg.vision_config().vit_layer_config(cfg.num_auxiliary_layers)
  if cfg.num_auxiliary_layers > 0:
    tokens = fe.vision_transformer(
        params['auxiliary_encoder'], tokens, aux_cfg, paddings=paddings)
  emb = atten_token_pooling(
      params['contrastive_vision_pooler'], tokens, paddings,
      num_heads=cfg.num_heads, hidden_dim=cfg.model_dim * 4,
      num_queries=1, dtype=cfg.dtype)
  return basic.l2_normalize(jnp.squeeze(emb, axis=-2), axis=-1)


class TestSPAuxPooler:

  def test_forward_matches_single_device(self):
    cfg = _cfg()
    mesh = mesh_lib.make_mesh(model_parallelism=4)  # (2, 4)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 16))

    fwd = sp_lib.make_sp_aux_pooler_forward(params, cfg, mesh)
    got = fwd(params, tokens)
    want = _reference_tail(params, tokens, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

  def test_no_aux_layers_pooler_only(self):
    cfg = _cfg(num_auxiliary_layers=0)
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 16))

    fwd = sp_lib.make_sp_aux_pooler_forward(params, cfg, mesh)
    got = fwd(params, tokens)
    want = _reference_tail(params, tokens, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

  def test_gradients_match_single_device(self):
    """Collective transposes: d/dtokens and d/dparams through
    all_gather + pmax + psum equal the single-device gradients."""
    cfg = _cfg(num_auxiliary_layers=1)
    mesh = mesh_lib.make_mesh(model_parallelism=4)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16))
    probe = jax.random.normal(jax.random.PRNGKey(2), (2, 16))

    fwd = sp_lib.make_sp_aux_pooler_forward(params, cfg, mesh)

    def sp_loss(p, t):
      return jnp.sum(fwd(p, t) * probe)

    def ref_loss(p, t):
      return jnp.sum(_reference_tail(p, t, cfg) * probe)

    g_sp = jax.grad(sp_loss, argnums=(0, 1))(params, tokens)
    g_ref = jax.grad(ref_loss, argnums=(0, 1))(params, tokens)
    # Token gradients.
    np.testing.assert_allclose(np.asarray(g_sp[1]), np.asarray(g_ref[1]),
                               atol=1e-5, rtol=1e-4)
    # Param gradients (aux + pooler leaves only; the rest are zero).
    flat_sp = jax.tree.leaves(g_sp[0]['auxiliary_encoder']) + jax.tree.leaves(
        g_sp[0]['contrastive_vision_pooler'])
    flat_ref = jax.tree.leaves(g_ref[0]['auxiliary_encoder']) + (
        jax.tree.leaves(g_ref[0]['contrastive_vision_pooler']))
    for a, b in zip(flat_sp, flat_ref):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 atol=1e-5, rtol=1e-4)

  def test_flash_kernel_rectangular_shard(self):
    """Per-shard flash geometry [T/sp, T]: interpret-mode kernel vs xla."""
    cfg = _cfg(attention_impl='flash', num_auxiliary_layers=1)
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # local T = 128
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (4, 256, 16))

    fwd = sp_lib.make_sp_aux_pooler_forward(
        params, cfg, mesh, kernel_interpret=True)
    got = fwd(params, tokens)
    want = _reference_tail(
        params, tokens, dataclasses.replace(cfg, attention_impl='xla'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

  def test_guards(self):
    from videoprism_tpu.ops.transformer import TransformerLayerConfig

    tokens = jnp.zeros((1, 8, 16))
    base = dict(num_layers=1, hidden_dim=32, num_heads=2)
    with pytest.raises(NotImplementedError):
      sp_lib.sp_stacked_transformer(
          {}, tokens, None,
          TransformerLayerConfig(**base, norm_policy='post'), axis='model')
    with pytest.raises(NotImplementedError):
      sp_lib.sp_stacked_transformer(
          {}, tokens, None,
          TransformerLayerConfig(**base, enable_causal_atten=True),
          axis='model')
    # tp_axis reuses the same mesh axis: must be rejected.
    with pytest.raises(ValueError):
      sp_lib.sp_stacked_transformer(
          {}, tokens, None,
          TransformerLayerConfig(**base, tp_axis='model'), axis='model')


class TestSPFullVisionForward:

  def test_video_to_embedding_matches(self):
    cfg = _cfg()
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    video = jax.random.uniform(jax.random.PRNGKey(1), (8, 2, 12, 12, 3))

    fwd = sp_lib.make_sp_clip_vision_forward(params, cfg, mesh)
    got = fwd(params, video)
    want, _, _ = vclip.apply(params, video, None, None, cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

  def test_mp4_mesh(self):
    cfg = _cfg(num_auxiliary_layers=1)
    mesh = mesh_lib.make_mesh(model_parallelism=4)  # (2, 4)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    video = jax.random.uniform(jax.random.PRNGKey(1), (8, 2, 12, 12, 3))

    fwd = sp_lib.make_sp_clip_vision_forward(params, cfg, mesh)
    got = fwd(params, video)
    want, _, _ = vclip.apply(params, video, None, None, cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


class TestSPPaddings:

  def test_padded_tokens_match_reference(self):
    """Key-mask gathering: padded tokens excluded on every device."""
    cfg = _cfg(num_auxiliary_layers=1)
    mesh = mesh_lib.make_mesh(model_parallelism=4)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    b, s, d = 2, 16, 16
    tokens = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    paddings = (jax.random.uniform(jax.random.PRNGKey(2), (b, s))
                > 0.7).astype(jnp.float32)

    aux_cfg = cfg.vision_config().vit_layer_config(cfg.num_auxiliary_layers)
    P = jax.sharding.PartitionSpec

    def local(p, t, pad):
      x = sp_lib.sp_stacked_transformer(
          p['auxiliary_encoder']['transformers_stack'], t, pad, aux_cfg,
          axis=mesh_lib.MODEL_AXIS)
      emb = sp_lib.sp_atten_token_pooling(
          p['contrastive_vision_pooler'], x, pad,
          num_heads=cfg.num_heads, hidden_dim=cfg.model_dim * 4,
          axis=mesh_lib.MODEL_AXIS, dtype=cfg.dtype)
      return basic.l2_normalize(jnp.squeeze(emb, axis=-2), axis=-1)

    fwd = jax.jit(mesh_lib.shard_map_compat(
        local, mesh,
        in_specs=(P(), P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS, None),
                  P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS)),
        out_specs=P(mesh_lib.DATA_AXIS, None)))
    got = fwd(params, tokens, paddings)
    want = _reference_tail(params, tokens, cfg, paddings=paddings)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


class TestSPQuantGuard:

  def test_int8_tree_rejected(self):
    """SP bypasses transformer_layer's int8 dispatch — quantized trees
    must fail loudly, not silently skip the scales."""
    from videoprism_tpu import quantization

    cfg = _cfg(num_auxiliary_layers=1)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    params = quantization.quantize_for_serving(
        init_lib.init_video_clip(jax.random.PRNGKey(0), cfg))
    tokens = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 16))
    fwd = sp_lib.make_sp_aux_pooler_forward(params, cfg, mesh)
    with pytest.raises(NotImplementedError):
      fwd(params, tokens)
