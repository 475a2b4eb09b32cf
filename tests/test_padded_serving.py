"""Variable-length clip serving (`EmbeddingService(pad_frames_to=T)`):
shorter clips pad + mask (frame_paddings) into ONE compiled geometry,
with exact parity against the model's own frame_paddings semantics."""

import io
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import serving, serving_http
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib

TINY_ENC = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)
TINY_CLIP = dict(
    **TINY_ENC, num_auxiliary_layers=1, enable_causal_atten=True,
    num_unimodal_layers=2, norm_policy='pre', vocabulary_size=1000)
HW = 12
T = 2


def _pad_clip(clip, t_to):
  pad = np.zeros((t_to - clip.shape[0],) + clip.shape[1:], clip.dtype)
  padded = np.concatenate([clip, pad], axis=0)
  paddings = np.zeros((1, t_to), np.float32)
  paddings[0, clip.shape[0]:] = 1.0
  return padded, paddings


@pytest.fixture(scope='module')
def lvt():
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
  state = model.init(jax.random.PRNGKey(0))
  return cfg, model, state


@pytest.fixture(scope='module')
def enc():
  cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
  model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
  state = model.init(jax.random.PRNGKey(0))
  return cfg, model, state


class TestPaddedEmbedParity:

  def test_lvt_short_clip_matches_masked_apply(self, lvt):
    cfg, model, state = lvt
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0, pad_frames_to=T)
    service.start()
    try:
      clip = np.random.default_rng(0).random((1, HW, HW, 3), np.float32)
      got = service.embed(clip)
      padded, paddings = _pad_clip(clip, T)
      ref, _, _ = vclip.apply(
          model._unwrap(state), jnp.asarray(padded[None]), None, None,
          cfg, train=False, frame_paddings=jnp.asarray(paddings))
      np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-6)
      # Masked semantics differ from treating the pad as black frames.
      black, _, _ = vclip.apply(
          model._unwrap(state), jnp.asarray(padded[None]), None, None,
          cfg, train=False)
      assert np.abs(got - np.asarray(black)[0]).max() > 1e-4
    finally:
      service.stop()

  def test_encoder_short_clip_matches_masked_apply(self, enc):
    cfg, model, state = enc
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0, pad_frames_to=T)
    service.start()
    try:
      clip = np.random.default_rng(1).random((1, HW, HW, 3), np.float32)
      got = service.embed(clip)
      padded, paddings = _pad_clip(clip, T)
      ref, _ = fe.apply(model._unwrap(state), jnp.asarray(padded[None]),
                        cfg, train=False,
                        frame_paddings=jnp.asarray(paddings))
      np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-6)
    finally:
      service.stop()

  def test_full_length_clip_unchanged(self, lvt):
    """A full-length clip on a pad service == the plain service (zero
    paddings are a no-op mask)."""
    cfg, model, state = lvt
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0, pad_frames_to=T)
    service.start()
    try:
      clip = np.random.default_rng(2).random((T, HW, HW, 3), np.float32)
      got = service.embed(clip)
      ref, _, _ = vclip.apply(model._unwrap(state),
                              jnp.asarray(clip[None]), None, None, cfg,
                              train=False)
      np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-6)
    finally:
      service.stop()

  def test_mixed_lengths_coalesce_into_one_batch(self, lvt):
    cfg, model, state = lvt
    service = serving.EmbeddingService(model, state, batch_buckets=(1, 4),
                                       max_wait_ms=50.0, pad_frames_to=T)
    service.warmup((T, HW, HW, 3))
    service.start()
    try:
      rng = np.random.default_rng(3)
      clips = [rng.random((1, HW, HW, 3), np.float32),
               rng.random((T, HW, HW, 3), np.float32),
               rng.random((1, HW, HW, 3), np.float32)]
      results = [None] * 3

      def worker(i):
        results[i] = service.embed(clips[i])

      threads = [threading.Thread(target=worker, args=(i,))
                 for i in range(3)]
      for t in threads:
        t.start()
      for t in threads:
        t.join(timeout=120)
      params = model._unwrap(state)
      for clip, got in zip(clips, results):
        assert got is not None
        padded, paddings = _pad_clip(clip, T)
        ref, _, _ = vclip.apply(
            params, jnp.asarray(padded[None]), None, None, cfg,
            train=False, frame_paddings=jnp.asarray(paddings))
        np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-5)
    finally:
      service.stop()

  def test_uint8_short_clip(self, lvt):
    cfg, model, state = lvt
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0, pad_frames_to=T)
    service.start()
    try:
      clip = (np.random.default_rng(4).random((1, HW, HW, 3)) * 255
              ).astype(np.uint8)
      got = service.embed(clip)
      padded, paddings = _pad_clip(clip.astype(np.float32) / 255.0, T)
      ref, _, _ = vclip.apply(
          model._unwrap(state), jnp.asarray(padded[None]), None, None,
          cfg, train=False, frame_paddings=jnp.asarray(paddings))
      np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-5)
    finally:
      service.stop()


class TestPaddedComposition:

  def test_int8_composes_with_pad_frames(self, lvt):
    """quantize='int8' + pad_frames_to: the quantized forward threads the
    same frame_paddings mask (quality contract vs the fp32 masked
    apply)."""
    cfg, model, state = lvt
    service = serving.EmbeddingService(
        model, state, batch_buckets=(1,), max_wait_ms=1.0,
        pad_frames_to=T, quantize='int8')
    service.start()
    try:
      clip = np.random.default_rng(7).random((1, HW, HW, 3), np.float32)
      got = np.asarray(service.embed(clip), np.float32).ravel()
      padded, paddings = _pad_clip(clip, T)
      ref, _, _ = vclip.apply(
          model._unwrap(state), jnp.asarray(padded[None]), None, None,
          cfg, train=False, frame_paddings=jnp.asarray(paddings))
      ref = np.asarray(ref, np.float32).ravel()
      cos = float(np.dot(got, ref)
                  / (np.linalg.norm(got) * np.linalg.norm(ref)))
      assert cos > 0.995, cos
      # And the mask genuinely engages on the int8 path too.
      black, _, _ = vclip.apply(
          model._unwrap(state), jnp.asarray(padded[None]), None, None,
          cfg, train=False)
      assert np.abs(got - np.asarray(black).ravel()).max() > 1e-3
    finally:
      service.stop()


class TestPaddedValidation:

  def test_too_long_clip_rejected(self, lvt):
    _, model, state = lvt
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       pad_frames_to=T)
    service.start()
    try:
      with pytest.raises(ValueError, match='pads to'):
        service.embed(np.zeros((T + 1, HW, HW, 3), np.float32))
    finally:
      service.stop()

  def test_embed_batch_paddings_need_pad_service(self, lvt):
    _, model, state = lvt
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    with pytest.raises(ValueError, match='pad_frames_to'):
      service.embed_batch(np.zeros((1, T, HW, HW, 3), np.float32),
                          frame_paddings=np.zeros((1, T), np.float32))

  def test_incompatible_modes_rejected(self, lvt):
    _, model, state = lvt
    from videoprism_tpu.parallel import mesh as mesh_lib

    with pytest.raises(ValueError, match='pad_frames_to'):
      serving.EmbeddingService(model, state, pad_frames_to=0)
    with pytest.raises(ValueError, match='single-program'):
      serving.EmbeddingService(model, state, pad_frames_to=T,
                               mesh=mesh_lib.make_mesh())

  def test_embed_batch_explicit_paddings_match(self, lvt):
    cfg, model, state = lvt
    service = serving.EmbeddingService(model, state, batch_buckets=(2,),
                                       pad_frames_to=T)
    rng = np.random.default_rng(5)
    videos = rng.random((2, T, HW, HW, 3), np.float32)
    videos[1, 1:] = 0.0
    paddings = np.asarray([[0.0, 0.0], [0.0, 1.0]], np.float32)
    got = service.embed_batch(videos, frame_paddings=paddings)
    ref, _, _ = vclip.apply(model._unwrap(state), jnp.asarray(videos),
                            None, None, cfg, train=False,
                            frame_paddings=jnp.asarray(paddings))
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-6)


class TestPaddedHTTP:

  def test_short_clip_over_http(self, lvt):
    cfg, model, state = lvt
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0, pad_frames_to=T)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      clip = np.random.default_rng(6).random((1, HW, HW, 3), np.float32)
      buf = io.BytesIO()
      np.save(buf, clip)
      req = urllib.request.Request(
          f'http://127.0.0.1:{httpd.port}/v1/embed', buf.getvalue(),
          {'Content-Type': 'application/x-npy'})
      with urllib.request.urlopen(req, timeout=120) as resp:
        emb = np.load(io.BytesIO(resp.read()))
      padded, paddings = _pad_clip(clip, T)
      ref, _, _ = vclip.apply(
          model._unwrap(state), jnp.asarray(padded[None]), None, None,
          cfg, train=False, frame_paddings=jnp.asarray(paddings))
      np.testing.assert_allclose(emb, np.asarray(ref)[0], atol=1e-6)
    finally:
      httpd.stop()
      service.stop()
