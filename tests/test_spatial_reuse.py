"""Spatial-feature reuse for overlapping long-video windows.

The factorized encoder's spatial half is per-frame independent, so
overlapping windows (stride < window) can encode each frame's spatial
tokens once (models.factorized_encoder.encode_spatial) and re-run only
the temporal stack per window (streaming.stream_window_token_batches).
These tests pin (a) the split-stage API against the monolithic forward,
(b) the cached window streamer against the naive per-window forward for
every window-emission edge case, and (c) the classify/embed long-video
entry points end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu import streaming
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib

TINY = dict(
    patch_size=6, pos_emb_shape=(4, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
    num_temporal_layers=1, mlp_dim=16, num_auxiliary_layers=1,
    vocabulary_size=1024, enable_causal_atten=True, num_unimodal_layers=1,
    norm_policy='pre', model_dim=8, num_heads=2, atten_logit_cap=50.0,
    scan=True)


def _encoder():
  cfg = fe.FactorizedEncoderConfig(**TINY)
  params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
  return params, cfg


def _frames(t, rng=0, size=12):
  return np.random.default_rng(rng).random((t, size, size, 3)).astype(
      np.float32)


class TestSplitStageParity:
  """encode_temporal(encode_spatial(x)) == apply(x), bit-exact on xla."""

  @pytest.mark.parametrize('t', [4, 6])  # == pos-emb T, and 1-D interp
  def test_matches_apply(self, t):
    params, cfg = _encoder()
    x = jnp.asarray(_frames(2 * t).reshape(2, t, 12, 12, 3))
    want, _ = fe.apply(params, x, cfg)
    feats = fe.encode_spatial(params, x, cfg)
    assert feats.shape == (2, t, 4, cfg.model_dim)
    got = fe.encode_temporal(params, feats, cfg)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

  def test_matches_apply_with_frame_paddings(self):
    params, cfg = _encoder()
    x = jnp.asarray(_frames(8).reshape(2, 4, 12, 12, 3))
    fp = jnp.zeros((2, 4)).at[:, -1].set(1.0)
    want, _ = fe.apply(params, x, cfg, frame_paddings=fp)
    got = fe.encode_temporal(
        params, fe.encode_spatial(params, x, cfg, frame_paddings=fp),
        cfg, frame_paddings=fp)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def _naive_windows(params, cfg, frames, window, stride, batch_windows=8):
  """Oracle: the existing pixel-level window path, one forward each."""
  out = []
  for batch, n in streaming._iter_window_batches(
      frames, window=window, stride=stride, batch_windows=batch_windows):
    toks = fe.apply(params, jnp.asarray(batch), cfg)[0]
    out.extend(np.asarray(toks[:n]))
  return np.stack(out) if out else np.zeros((0,))


class TestCachedWindowStream:

  # (total_frames, window, stride, batch_windows) covering: aligned end,
  # repeat-padded tail window, sub-window video, stride-1 dense overlap,
  # multi-chunk, stride that doesn't divide (T - window).
  CASES = [
      (16, 4, 2, 2),    # tail-free: last full window ends exactly at T
      (18, 4, 2, 2),    # tail-free with leftover overlap frames
      (10, 4, 3, 2),    # stride does not divide T - window
      (3, 4, 2, 2),     # sub-window video: one repeat-padded window
      (9, 4, 1, 3),     # dense overlap, f_s clamp (bw >= window/stride)
      (40, 6, 3, 4),    # multi-chunk + repeat-padded tail at frame 36
      (12, 4, 2, 8),    # batch_windows larger than the whole video
  ]

  @pytest.mark.parametrize('t,window,stride,bw', CASES)
  def test_matches_naive_window_tokens(self, t, window, stride, bw):
    params, cfg = _encoder()
    frames = _frames(t)
    want = _naive_windows(params, cfg, frames, window, stride, bw)
    got = [np.asarray(tok) for tok in streaming.stream_window_tokens_cached(
        params, cfg, frames, window=window, stride=stride,
        batch_windows=bw)]
    assert len(got) == want.shape[0]
    np.testing.assert_allclose(np.stack(got), want, atol=1e-5, rtol=1e-5)

  def test_chunked_iterator_matches_one_shot(self):
    """A live feed arriving in ragged chunks emits identical windows."""
    params, cfg = _encoder()
    frames = _frames(23)
    one_shot = [np.asarray(t) for t in streaming.stream_window_tokens_cached(
        params, cfg, frames, window=4, stride=2, batch_windows=2)]
    chunks = iter([frames[:5], frames[5:6], frames[6:17], frames[17:]])
    streamed = [np.asarray(t) for t in streaming.stream_window_tokens_cached(
        params, cfg, chunks, window=4, stride=2, batch_windows=2)]
    np.testing.assert_allclose(
        np.stack(streamed), np.stack(one_shot), atol=1e-6, rtol=1e-6)

  def test_spatial_runs_once_per_frame(self, monkeypatch):
    """The point of the cache: frames hit the spatial stack ~once, not
    once per overlapping window."""
    params, cfg = _encoder()
    frames = _frames(32)
    window, stride = 4, 1  # naive path spatially encodes ~4x per frame
    spatial_frames = 0
    real = streaming._encode_spatial_chunk

    def counting(enc_params, chunk, enc_cfg):
      nonlocal spatial_frames
      spatial_frames += chunk.shape[0]
      return real(enc_params, chunk, enc_cfg)

    monkeypatch.setattr(streaming, '_encode_spatial_chunk', counting)
    n = sum(1 for _ in streaming.stream_window_tokens_cached(
        params, cfg, frames, window=window, stride=stride,
        batch_windows=4))
    naive_frames = n * window
    assert spatial_frames < naive_frames / 2
    assert spatial_frames <= 32 + 2 * stride * 4  # total + chunk padding

  def test_non_overlapping_stride_raises(self):
    params, cfg = _encoder()
    with pytest.raises(ValueError, match='overlap'):
      list(streaming.stream_window_tokens_cached(
          params, cfg, _frames(8), window=4, stride=4))

  def test_empty_stream_yields_nothing(self):
    params, cfg = _encoder()
    got = list(streaming.stream_window_token_batches(
        params, cfg, np.zeros((0, 12, 12, 3), np.float32),
        window=4, stride=2))
    assert got == []


class TestClassifyLongReuse:

  def _setup(self):
    from videoprism_tpu.models import classifier as vc

    enc_cfg = fe.FactorizedEncoderConfig(**TINY)
    cfg = vc.VideoClassifierConfig(encoder=enc_cfg, num_classes=5)
    params = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
    return params, cfg

  def test_reuse_matches_naive(self):
    params, cfg = self._setup()
    frames = _frames(18)
    want = streaming.classify_long_video(
        params, cfg, frames, window=4, stride=2, batch_windows=2,
        reuse_spatial=False)
    got = streaming.classify_long_video(
        params, cfg, frames, window=4, stride=2, batch_windows=2,
        reuse_spatial=True)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

  def test_auto_engages_only_on_overlap(self, monkeypatch):
    params, cfg = self._setup()
    calls = []
    real = streaming.stream_window_token_batches

    def spy(*a, **k):
      calls.append(1)
      return real(*a, **k)

    monkeypatch.setattr(streaming, 'stream_window_token_batches', spy)
    streaming.classify_long_video(params, cfg, _frames(12), window=4)
    assert not calls  # stride=None: non-overlapping, naive path
    streaming.classify_long_video(
        params, cfg, _frames(12), window=4, stride=2)
    assert calls  # overlap: cached path

  def test_explicit_reuse_without_overlap_raises(self):
    params, cfg = self._setup()
    with pytest.raises(ValueError, match='overlap'):
      streaming.classify_long_video(
          params, cfg, _frames(12), window=4, reuse_spatial=True)

  @pytest.mark.parametrize('reuse', [False, True])
  def test_uint8_frames_normalize_like_serving(self, reuse):
    """frame_reader yields uint8; both window paths must normalize it to
    [0, 1] on device like the one-shot serving path (regression: the
    naive file path used to feed raw 0..255 floats to the encoder)."""
    params, cfg = self._setup()
    u8 = np.random.default_rng(0).integers(
        0, 256, (12, 12, 12, 3)).astype(np.uint8)
    kw = dict(window=4, stride=2, batch_windows=2, reuse_spatial=reuse)
    got = streaming.classify_long_video(params, cfg, u8, **kw)
    want = streaming.classify_long_video(
        params, cfg, u8.astype(np.float32) / 255.0, **kw)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


class TestEmbedLongCached:

  def _setup(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    return params, cfg

  def test_pool_vision_tokens_matches_encode_vision(self):
    params, cfg = self._setup()
    x = jnp.asarray(_frames(4).reshape(2, 2, 12, 12, 3))
    want, _ = vclip.encode_vision(params, x, cfg)
    tokens = fe.apply(params['vision_encoder'], x, cfg.vision_config())[0]
    got = vclip.pool_vision_tokens(params, tokens, cfg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)

  def test_matches_naive_long_embedding(self):
    params, cfg = self._setup()
    frames = _frames(10)

    def embed_fn(batch):  # the pixel-level oracle embed_long uses today
      return np.asarray(vclip.encode_vision(
          params, jnp.asarray(batch), cfg)[0])

    want_pooled, want_windows = streaming.embed_long_video(
        embed_fn, frames, window=4, stride=2, batch_windows=2)
    got_pooled, got_windows = streaming.embed_long_video_cached(
        params, cfg, frames, window=4, stride=2, batch_windows=2)
    np.testing.assert_allclose(
        got_windows, want_windows, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got_pooled, want_pooled, atol=1e-5, rtol=1e-5)

  def test_empty_raises(self):
    params, cfg = self._setup()
    with pytest.raises(ValueError, match='no frames'):
      streaming.embed_long_video_cached(
          params, cfg, np.zeros((0, 12, 12, 3), np.float32),
          window=4, stride=2)


class TestFrameEmbeddingsLong:
  """Windowed per-frame embeddings for long-video moment localization."""

  def _setup(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(2), cfg)
    return params, cfg

  def test_single_window_matches_one_shot(self):
    from videoprism_tpu import retrieval

    params, cfg = self._setup()
    frames = _frames(4)
    got = streaming.frame_embeddings_long(
        params, cfg, frames, window=4, batch_windows=2)
    want = np.asarray(retrieval.make_frame_embeddings_fn(params, cfg)(
        frames))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

  def test_tail_overlap_averages(self):
    """T=6, window=4: windows [0:4] and the tail [4:6]+pad — frames 4,5
    take the tail window's rows; every row stays unit-norm."""
    from videoprism_tpu import retrieval

    params, cfg = self._setup()
    frames = _frames(6)
    got = streaming.frame_embeddings_long(
        params, cfg, frames, window=4, batch_windows=2)
    assert got.shape[0] == 6
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                               atol=1e-5)
    one_shot = retrieval.make_frame_embeddings_fn(params, cfg)
    np.testing.assert_allclose(got[:4], np.asarray(one_shot(frames[:4])),
                               atol=1e-5, rtol=1e-5)

  def test_overlap_reuse_matches_naive(self):
    params, cfg = self._setup()
    frames = _frames(12)
    kw = dict(window=4, stride=2, batch_windows=2)
    got = streaming.frame_embeddings_long(
        params, cfg, frames, reuse_spatial=True, **kw)
    want = streaming.frame_embeddings_long(
        params, cfg, frames, reuse_spatial=False, **kw)
    assert got.shape == want.shape == (12, cfg.model_dim)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

  def test_uint8_normalizes(self):
    params, cfg = self._setup()
    u8 = np.random.default_rng(3).integers(
        0, 256, (8, 12, 12, 3)).astype(np.uint8)
    got = streaming.frame_embeddings_long(
        params, cfg, u8, window=4, stride=2, batch_windows=2)
    want = streaming.frame_embeddings_long(
        params, cfg, u8.astype(np.float32) / 255.0, window=4, stride=2,
        batch_windows=2)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

  def test_gap_stride_raises(self):
    params, cfg = self._setup()
    with pytest.raises(ValueError, match='uncovered'):
      streaming.frame_embeddings_long(
          params, cfg, _frames(12), window=4, stride=5)
