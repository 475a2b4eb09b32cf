"""load_classifier: lvt checkpoint -> classifier backbone remap
(BASELINE.json workload: 'load_classifier head on lvt_base').

Mirrors the reference's vision_encoder->encoder remap
(videoprism/models_mlx.py:279-288) but with loud failure instead of the
reference's silent random-weight fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu.io import checkpoints as ckpt_lib
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.models import registry

TINY_ENC = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)
TINY_LVT = dict(
    **{k: v for k, v in TINY_ENC.items()},
    num_auxiliary_layers=1, vocabulary_size=64, enable_causal_atten=True,
    num_unimodal_layers=1, norm_policy='pre')


@pytest.fixture()
def tiny_registry(monkeypatch):
  monkeypatch.setitem(registry.CONFIGS, 'videoprism_v1_base', TINY_ENC)
  return registry


class TestLoadClassifier:

  @pytest.mark.slow
  def test_from_lvt_checkpoint(self, tiny_registry, tmp_path):
    clip_cfg = vclip.VideoCLIPConfig(**TINY_LVT)
    clip_params = init_lib.init_video_clip(jax.random.PRNGKey(0), clip_cfg)
    path = str(tmp_path / 'lvt.npz')
    ckpt_lib.save_checkpoint(path, clip_params)

    bound = vp.load_classifier(
        'videoprism_lvt_public_v1_base', num_classes=10, weights_path=path)
    assert bound.config.num_classes == 10

    # Backbone weights came from the checkpoint's vision_encoder subtree.
    got = bound.params['encoder']['spatial_ln']['scale']
    want = clip_params['vision_encoder']['spatial_ln']['scale']
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    logits, _ = bound(jnp.zeros((2, 2, 12, 12, 3)), train=False)
    assert logits.shape == (2, 10)

  def test_from_encoder_checkpoint(self, tiny_registry, tmp_path):
    from videoprism_tpu.models import factorized_encoder as fe

    enc_cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
    enc_params = init_lib.init_factorized_encoder(
        jax.random.PRNGKey(0), enc_cfg)
    path = str(tmp_path / 'enc.npz')
    ckpt_lib.save_checkpoint(path, enc_params)

    bound = vp.load_classifier(
        'videoprism_public_v1_base', num_classes=5, weights_path=path)
    logits, _ = bound(jnp.zeros((1, 2, 12, 12, 3)), train=False)
    assert logits.shape == (1, 5)

  def test_serving_knobs(self, tiny_registry, tmp_path):
    """fprop_dtype/attention_impl reach the encoder config (the serving
    configuration without hand-editing dataclasses)."""
    from videoprism_tpu.models import factorized_encoder as fe

    enc_cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
    enc_params = init_lib.init_factorized_encoder(
        jax.random.PRNGKey(0), enc_cfg)
    path = str(tmp_path / 'enc.npz')
    ckpt_lib.save_checkpoint(path, enc_params)

    bound = vp.load_classifier(
        'videoprism_public_v1_base', num_classes=5, weights_path=path,
        fprop_dtype=jnp.bfloat16, attention_impl='flash')
    assert bound.config.encoder.dtype == jnp.bfloat16
    assert bound.config.encoder.attention_impl == 'flash'

  def test_wrong_checkpoint_fails_loudly(self, tiny_registry, tmp_path):
    path = str(tmp_path / 'bogus.npz')
    ckpt_lib.save_checkpoint(path, {'not_a_backbone': np.zeros(3)})
    with pytest.raises((KeyError, ValueError)):
      vp.load_classifier(
          'videoprism_lvt_public_v1_base', num_classes=10,
          weights_path=path)
