"""AOT export tests (videoprism_tpu/export.py): serialize a jitted
forward via jax.export, reload WITHOUT the builder objects, and match the
direct apply to float noise (1e-6) on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu import export as export_lib
from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.models.registry import BoundModel, Model

TINY_ENC = dict(model_dim=16, num_heads=2, mlp_dim=32, num_spatial_layers=2,
                num_temporal_layers=1, patch_size=6, pos_emb_shape=(2, 2, 2),
                atten_logit_cap=50.0, scan=True)
TINY_CLIP = dict(patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
                 num_temporal_layers=1, mlp_dim=32, num_auxiliary_layers=1,
                 vocabulary_size=1000, enable_causal_atten=True,
                 num_unimodal_layers=2, norm_policy='pre', model_dim=16,
                 num_heads=2, atten_logit_cap=50.0, scan=True)


def _encoder_model():
  cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
  return Model(cfg, fe.apply, init_lib.init_factorized_encoder)


def _clip_model():
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  return Model(cfg, vclip.apply, init_lib.init_video_clip)


def _classifier_model():
  enc = fe.FactorizedEncoderConfig(**TINY_ENC)
  cfg = vc.VideoClassifierConfig(encoder=enc, num_classes=5)
  return Model(cfg, vc.apply, init_lib.init_video_classifier)


def _video(b, t=2, s=12, seed=0):
  return np.random.RandomState(seed).rand(b, t, s, s, 3).astype('float32')


class TestExportEncoder:

  def test_symbolic_batch_roundtrip(self):
    """One artifact, several batch sizes, bitwise-equal to direct apply."""
    model = _encoder_model()
    params = model.init(jax.random.PRNGKey(0))
    ex = export_lib.export_forward(model, params)
    blob = ex.serialize()
    assert isinstance(blob, bytes) and len(blob) < 1 << 20  # weight-free
    back = export_lib.ExportedForward.deserialize(blob)
    for b in (1, 3):
      v = _video(b, seed=b)
      got = np.asarray(back(params, v))
      ref, _ = model.apply(params, v, train=False)
      np.testing.assert_allclose(got, np.asarray(ref), atol=1e-6)

  def test_fixed_batch_rejects_other_sizes(self):
    model = _encoder_model()
    params = model.init(jax.random.PRNGKey(0))
    ex = export_lib.export_forward(model, params, batch=2)
    out = ex(params, _video(2))
    assert out.shape[0] == 2
    with pytest.raises(Exception):
      ex(params, _video(3))

  def test_file_roundtrip(self, tmp_path):
    model = _encoder_model()
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'enc.jaxexport')
    export_lib.export_forward(model, params, batch=1).save(path)
    back = export_lib.ExportedForward.load(path)
    v = _video(1)
    ref, _ = model.apply(params, v, train=False)
    np.testing.assert_allclose(np.asarray(back(params, v)),
                               np.asarray(ref), atol=1e-6)

  def test_geometry_override(self):
    """num_frames/frame_size override the config-native geometry."""
    model = _encoder_model()
    params = model.init(jax.random.PRNGKey(0))
    ex = export_lib.export_forward(model, params, batch=1, num_frames=4,
                                   frame_size=18)
    v = np.random.RandomState(0).rand(1, 4, 18, 18, 3).astype('float32')
    ref, _ = model.apply(params, v, train=False)
    np.testing.assert_allclose(np.asarray(ex(params, v)), np.asarray(ref),
                               atol=1e-6)


class TestExportClip:

  def test_video_tower(self):
    model = _clip_model()
    params = model.init(jax.random.PRNGKey(0))
    ex = export_lib.export_forward(model, params, tower='video')
    v = _video(2)
    ref_v, _, _ = model.apply(params, v, None, None, train=False)
    np.testing.assert_allclose(np.asarray(ex(params, v)),
                               np.asarray(ref_v), atol=1e-6)

  def test_text_tower(self):
    model = _clip_model()
    params = model.init(jax.random.PRNGKey(0))
    ex = export_lib.export_forward(model, params, tower='text', text_len=8)
    ids = np.array([[5, 7, 9, 2, 0, 0, 0, 0],
                    [3, 4, 0, 0, 0, 0, 0, 0]], np.int32)
    pads = (ids == 0).astype(np.float32)
    _, ref_t, _ = model.apply(params, None, ids, pads, train=False)
    np.testing.assert_allclose(np.asarray(ex(params, ids, pads)),
                               np.asarray(ref_t), atol=1e-6)

  def test_bad_tower(self):
    model = _clip_model()
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match='tower'):
      export_lib.export_forward(model, params, tower='audio')

  def test_bound_model_and_checkpoint_wrapper(self):
    """BoundModel input and {'params': ...} wrapper both accepted."""
    model = _clip_model()
    variables = model.init(jax.random.PRNGKey(0))  # {'params': tree}
    bound = BoundModel(model, variables)
    ex = export_lib.export_forward(bound, tower='video')
    v = _video(1)
    ref_v, _, _ = model.apply(variables, v, None, None, train=False)
    got = ex(export_lib.Model._unwrap(variables), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_v), atol=1e-6)


class TestExportClassifier:

  def test_logits_roundtrip(self):
    model = _classifier_model()
    params = model.init(jax.random.PRNGKey(0))
    ex = export_lib.export_forward(model, params)
    blob = ex.serialize()
    back = export_lib.ExportedForward.deserialize(blob)
    v = _video(2)
    ref, _ = model.apply(params, v, train=False)
    got = np.asarray(back(params, v))
    assert got.shape == (2, 5)
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-6)


class TestExportErrors:

  def test_params_required(self):
    with pytest.raises(ValueError, match='params required'):
      export_lib.export_forward(_encoder_model())

  def test_multiplatform_needs_xla_attention(self):
    import dataclasses

    model = _encoder_model()
    model = dataclasses.replace(
        model, config=dataclasses.replace(model.config,
                                          attention_impl='flash'))
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match='multi-platform'):
      export_lib.export_forward(model, params, platforms=('tpu', 'cpu'))

  def test_bad_batch(self):
    model = _encoder_model()
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match='batch'):
      export_lib.export_forward(model, params, batch=0)
