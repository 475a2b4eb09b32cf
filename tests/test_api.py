"""Registry / loader-API tests (mirrors reference videoprism/models_test.py
and utils_test.py: registry lookup, forward shapes, checkpoint round-trip,
text canonicalization goldens)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu.io import checkpoints as ckpt_lib
from videoprism_tpu.io import text as text_lib
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib


class TestRegistry:

  def test_has_model(self):
    assert vp.has_model('videoprism_public_v1_base')
    assert vp.has_model('videoprism_lvt_public_v1_large')
    assert vp.has_model('google/videoprism-base-f16r288')
    assert not vp.has_model('videoprism_public_v0_small')
    assert not vp.has_model('google/unknown-model')

  def test_get_model(self):
    model = vp.get_model('videoprism_public_v1_base')
    assert model.config.model_dim == 768
    assert model.config.num_spatial_layers == 12

    model = vp.get_model('google/videoprism-lvt-large-f8r288')
    assert model.config.model_dim == 1024
    assert model.config.num_unimodal_layers == 12

    with pytest.raises(ValueError):
      vp.get_model('nonexistent_model')

  def test_get_model_fprop_dtype(self):
    model = vp.get_model('videoprism_public_v1_base',
                         fprop_dtype=jnp.bfloat16)
    assert model.config.dtype == jnp.bfloat16

  def test_get_model_config(self):
    cfg = vp.get_model_config('videoprism_lvt_public_v1_base')
    assert cfg['vocabulary_size'] == 32_000
    cfg['model_dim'] = 1  # copies are independent
    assert vp.MODEL_CONFIGS['videoprism_lvt_public_v1_base']['model_dim'] == 768
    with pytest.raises(ValueError):
      vp.get_model_config('bogus')

  def test_configs_match_reference_values(self):
    # Spot-check the registry against SURVEY.md §2.3 facts.
    assert set(vp.CHECKPOINTS) == {
        'videoprism_public_v1_base', 'videoprism_public_v1_large',
        'videoprism_lvt_public_v1_base', 'videoprism_lvt_public_v1_large'}
    for name, cfg in vp.CONFIGS.items():
      assert cfg['atten_logit_cap'] == 50.0
      assert cfg['patch_size'] == 18
      assert cfg['scan'] is True
    assert vp.CONFIGS['videoprism_lvt_v1_giant']['norm_policy'] == (
        'primer_hybrid')
    assert vp.TEXT_MAX_LEN == 64
    assert vp.K400_NUM_CLASSES == 400
    assert vp.SSV2_NUM_CLASSES == 174


TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)


class TestModelHandle:

  def test_init_apply_shapes(self):
    cfg = fe.FactorizedEncoderConfig(**TINY)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    variables = model.init(jax.random.PRNGKey(0))
    video = jnp.zeros((1, 2, 12, 12, 3))
    emb, _ = model.apply(variables, video, train=False)
    assert emb.shape == (1, 2 * 4, 16)
    # Bare tree (no {'params': ...} wrapper) also accepted.
    emb2, _ = model.apply(variables['params'], video, train=False)
    np.testing.assert_array_equal(emb, emb2)

  def test_param_counts_match_published_sizes(self):
    """Published param counts: B 114M, L 354M, LvT-B 248M, LvT-L 580M
    (reference README.md:157-162)."""
    expected = {
        'videoprism_public_v1_base': 114e6,
        'videoprism_public_v1_large': 354e6,
        'videoprism_lvt_public_v1_base': 248e6,
        'videoprism_lvt_public_v1_large': 580e6,
    }
    for name, approx in expected.items():
      model = vp.get_model(name)
      shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
      total = sum(
          int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
      assert abs(total - approx) / approx < 0.01, (name, total)


class TestCheckpointIO:

  def test_roundtrip(self):
    cfg = fe.FactorizedEncoderConfig(**TINY)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
    with tempfile.TemporaryDirectory() as tmp:
      for fname in ('ckpt.npz', 'ckpt.safetensors'):
        path = os.path.join(tmp, fname)
        ckpt_lib.save_checkpoint(path, {'params': params})
        restored = vp.load_pretrained_weights(None, checkpoint_path=path)
        assert jax.tree.structure({'params': params}) == (
            jax.tree.structure(restored))
        for a, b in zip(jax.tree.leaves(params),
                        jax.tree.leaves(restored['params'])):
          np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_recover_tree(self):
    tree = ckpt_lib.recover_tree(
        ['a/b/c', 'a/b/d', 'a/e', 'f'], [1, 2, 3, 4])
    assert tree == {'a': {'b': {'c': 1, 'd': 2}, 'e': 3}, 'f': 4}

  def test_bound_model_from_local_weights(self):
    cfg = fe.FactorizedEncoderConfig(**TINY)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
    with tempfile.TemporaryDirectory() as tmp:
      path = os.path.join(tmp, 'w.npz')
      ckpt_lib.save_checkpoint(path, {'params': params})
      model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
      state = vp.load_pretrained_weights(None, checkpoint_path=path)
      bound = vp.BoundModel(model, state)
      emb, _ = bound(jnp.zeros((1, 2, 12, 12, 3)), train=False)
      assert emb.shape == (1, 8, 16)


class TestTextCanonicalization:

  def test_goldens(self):
    # Goldens from the reference docstring (videoprism/utils.py:180-187).
    assert text_lib.canonicalize_text('Hello, World!') == 'hello world.'
    assert text_lib.canonicalize_text('Hello,World..') == 'hello world.'
    assert text_lib.canonicalize_text('  Hello   WORLD') == 'hello world.'
    assert text_lib.canonicalize_text('') == '.'


class TestGiantConfigs:
  """Giant architectures have no public checkpoints but must construct
  (reference videoprism/models.py:105-160)."""

  def test_giant_shapes_via_eval_shape(self):
    import videoprism_tpu.models.registry as registry

    for builder in (registry.videoprism_v1_giant,
                    registry.videoprism_lvt_v1_giant):
      model = builder()
      shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
      total = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
      assert total > 0.9e9, (builder.__name__, total)  # ~1B params

  def test_classifier_builders(self):
    import videoprism_tpu.models.registry as registry

    model = registry.videoprism_vc_v1_base(num_classes=vp.K400_NUM_CLASSES)
    assert model.config.num_classes == 400
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    assert len(jax.tree.leaves(shapes)) > 0


class TestRuntimeKnobs:

  def test_attention_impl_override(self):
    model = vp.get_model('videoprism_public_v1_base',
                         attention_impl='flash')
    assert model.config.attention_impl == 'flash'
    clf = vp.get_model(
        None,
        model_fn=lambda: __import__(
            'videoprism_tpu.models.registry', fromlist=['x']
        ).videoprism_vc_v1_base(10),
        attention_impl='flash')
    assert clf.config.encoder.attention_impl == 'flash'
