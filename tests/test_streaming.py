"""Long-video streaming inference: windowing, incremental yield, pooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import streaming
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=1, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)


class TestWindowing:

  def test_exact_windows(self):
    frames = np.arange(32, dtype=np.float32).reshape(32, 1, 1, 1)
    w = streaming.window_frames(frames, window=16)
    assert w.shape == (2, 16, 1, 1, 1)
    assert w[0, 0, 0, 0, 0] == 0 and w[1, 0, 0, 0, 0] == 16

  def test_tail_right_aligned(self):
    frames = np.arange(40, dtype=np.float32).reshape(40, 1, 1, 1)
    w = streaming.window_frames(frames, window=16)
    assert w.shape == (3, 16, 1, 1, 1)
    assert w[2, 0, 0, 0, 0] == 24  # right-aligned tail window

  def test_overlapping_stride(self):
    frames = np.arange(32, dtype=np.float32).reshape(32, 1, 1, 1)
    w = streaming.window_frames(frames, window=16, stride=8)
    assert w.shape == (3, 16, 1, 1, 1)
    assert [w[i, 0, 0, 0, 0] for i in range(3)] == [0, 8, 16]

  def test_short_video_repeat_pad(self):
    frames = np.arange(10, dtype=np.float32).reshape(10, 1, 1, 1)
    w = streaming.window_frames(frames, window=16)
    assert w.shape == (1, 16, 1, 1, 1)
    assert (w[0, 10:, 0, 0, 0] == 9).all()  # last frame repeated

  def test_drop_final(self):
    frames = np.arange(40, dtype=np.float32).reshape(40, 1, 1, 1)
    w = streaming.window_frames(frames, window=16, pad_final=False)
    assert w.shape == (2, 16, 1, 1, 1)

  def test_drop_final_short_video_is_empty(self):
    """pad_final=False must actually drop a sub-window video, not pad it."""
    frames = np.arange(10, dtype=np.float32).reshape(10, 1, 1, 1)
    w = streaming.window_frames(frames, window=16, pad_final=False)
    assert w.shape == (0, 16, 1, 1, 1)


class TestNumWindows:

  @pytest.mark.parametrize('window,stride', [(16, None), (16, 8), (4, 3),
                                             (16, 16), (5, 5)])
  @pytest.mark.parametrize('t', [0, 1, 5, 15, 16, 17, 31, 32, 33, 100])
  def test_matches_iter_window_batches(self, t, window, stride):
    """num_windows (the job tier's windows_total) must equal the actual
    emission count of _iter_window_batches for every geometry."""
    frames = np.arange(t, dtype=np.float32).reshape(t, 1, 1, 1)
    emitted = sum(n for _, n in streaming._iter_window_batches(
        frames, window=window, stride=stride, batch_windows=3))
    assert streaming.num_windows(t, window, stride) == emitted

  def test_probe_frame_count_on_demo_video(self):
    from videoprism_tpu import assets
    from videoprism_tpu.io import video as video_io

    path = assets.demo_video_path()
    n = video_io.probe_frame_count(path)
    if n is None:
      pytest.skip('no decoder metadata available in this environment')
    # The probe must agree with what frame_reader actually yields.
    yielded = sum(c.shape[0] for c in video_io.frame_reader(
        path, target_size=12, chunk_frames=64))
    assert n == yielded
    n2 = video_io.probe_frame_count(path, frame_stride=2)
    assert n2 == len(range(0, yielded, 2))

  def test_sweep_control_checkpoints_and_aborts(self):
    """The control hook fires (0, total) then monotone (done, total) per
    window batch, and an exception it raises aborts the sweep."""
    frames = np.arange(20, dtype=np.float32).reshape(20, 1, 1, 1)
    calls = []

    class Ctrl:
      def checkpoint(self, done, total):
        calls.append((done, total))

    embed = lambda b: np.asarray(b).reshape(b.shape[0], -1)[:, :2]
    rows = list(streaming.stream_embeddings(
        embed, frames, window=4, stride=4, batch_windows=2,
        control=Ctrl(), total_windows=5))
    assert len(rows) == 5
    assert calls[0] == (0, 5) and calls[-1] == (5, 5)
    assert [d for d, _ in calls] == sorted(d for d, _ in calls)

    class Abort:
      def checkpoint(self, done, total):
        if done >= 2:
          raise KeyboardInterrupt('stop')

    with pytest.raises(KeyboardInterrupt):
      list(streaming.stream_embeddings(
          embed, frames, window=4, stride=4, batch_windows=2,
          control=Abort()))


class TestStreaming:

  @pytest.fixture(scope='class')
  def embed_fn(self):
    cfg = fe.FactorizedEncoderConfig(**TINY)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(lambda v: jnp.mean(
        fe.apply(params, v, cfg, train=False)[0], axis=1))
    return lambda v: fwd(jnp.asarray(v, jnp.float32))

  def test_stream_matches_batch(self, embed_fn):
    """Incremental streaming over chunked input == one-shot windowing."""
    rng = np.random.default_rng(0)
    frames = rng.random((8, 12, 12, 3), np.float32)  # 4 windows of 2
    windows = streaming.window_frames(frames, window=2)
    ref = np.asarray(embed_fn(windows))

    # Feed as uneven live chunks; batch 3 windows per forward.
    chunks = [frames[:3], frames[3:4], frames[4:]]
    got = list(streaming.stream_embeddings(
        embed_fn, iter(chunks), window=2, batch_windows=3))
    np.testing.assert_allclose(np.stack(got), ref, atol=1e-5)

  def test_embed_long_video(self, embed_fn):
    rng = np.random.default_rng(1)
    frames = rng.random((10, 12, 12, 3), np.float32)  # 5 windows of 2
    video_emb, per_window = streaming.embed_long_video(
        embed_fn, frames, window=2, batch_windows=2)
    assert per_window.shape == (5, 16)
    assert video_emb.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(video_emb), 1.0, atol=1e-5)

  def test_embed_video_file_matches_in_memory(self, embed_fn, tmp_path):
    """File-level streaming (chunked decode, constant host memory) ==
    decode-everything + embed_long_video, for both decode backends."""
    cv2 = pytest.importorskip('cv2')

    path = str(tmp_path / 'long.mp4')
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*'mp4v'), 12, (16, 12))
    rng = np.random.default_rng(3)
    for _ in range(50):
      writer.write(rng.integers(0, 255, (12, 16, 3), dtype=np.uint8))
    writer.release()

    from videoprism_tpu.io import video as video_lib

    for backend in ('opencv', 'ffmpeg'):
      try:
        chunks = list(video_lib.frame_reader(
            path, target_size=12, frame_stride=2, chunk_frames=7,
            backend=backend))
      except RuntimeError as e:
        assert backend == 'ffmpeg'
        pytest.skip(f'native decoder unavailable: {e}')
      frames = np.concatenate(chunks, axis=0)
      assert frames.shape == (25, 12, 12, 3) and frames.dtype == np.uint8

      ref_emb, ref_windows = streaming.embed_long_video(
          embed_fn, frames, window=4, batch_windows=2)
      got_emb, got_windows = streaming.embed_video_file(
          embed_fn, path, window=4, frame_stride=2, batch_windows=2,
          target_size=12, backend=backend)
      np.testing.assert_allclose(got_windows, ref_windows, atol=1e-5)
      np.testing.assert_allclose(got_emb, ref_emb, atol=1e-5)

  def test_frame_reader_backends_agree(self, tmp_path):
    cv2 = pytest.importorskip('cv2')

    from videoprism_tpu import native
    from videoprism_tpu.io import video as video_lib

    if native.load_video_lib() is None:
      pytest.skip('native decoder unavailable')
    path = str(tmp_path / 'seq.mp4')
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*'mp4v'), 12, (16, 12))
    for i in range(40):
      writer.write(np.full((12, 16, 3), (i * 6) % 251, np.uint8))
    writer.release()

    ff = np.concatenate(list(video_lib.frame_reader(
        path, target_size=12, frame_stride=3, chunk_frames=5,
        backend='ffmpeg')), axis=0)
    cv = np.concatenate(list(video_lib.frame_reader(
        path, target_size=12, frame_stride=3, chunk_frames=5,
        backend='opencv')), axis=0)
    assert ff.shape == cv.shape == (14, 12, 12, 3)
    assert np.abs(ff.astype(int) - cv.astype(int)).max() <= 3

  def test_overlap_stride_no_spurious_tail(self, embed_fn):
    """Regression: with stride < window the buffer retains covered overlap
    frames; they must not be re-emitted as an extra padded tail window."""
    rng = np.random.default_rng(2)
    frames = rng.random((4, 12, 12, 3), np.float32)
    # window=4, stride=2, T=4: exactly one window covers everything.
    got = list(streaming.stream_embeddings(
        embed_fn, frames, window=4, stride=2, batch_windows=2))
    assert len(got) == 1
    ref = streaming.window_frames(frames, window=4, stride=2)
    assert ref.shape[0] == 1

  def test_aggregate_is_normalized_mean(self):
    emb = np.array([[3.0, 0.0], [0.0, 4.0]], np.float32)
    pooled = streaming.aggregate(emb)
    expected = np.array([0.5, 0.5]) / np.linalg.norm([0.5, 0.5])
    np.testing.assert_allclose(pooled, expected, atol=1e-6)


class TestStreamingPooler:
  """Exact online-softmax pooling == one-shot atten_token_pooling."""

  def _pooler_params(self, d=16, num_heads=2, hidden=64, seed=0):
    return init_lib._atten_pooling(
        jax.random.PRNGKey(seed), d, hidden, num_heads)

  def test_chunked_equals_one_shot(self):
    from videoprism_tpu.ops.transformer import atten_token_pooling

    d, heads, hidden = 16, 2, 64
    params = self._pooler_params(d, heads, hidden)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (3, 40, d))

    want = atten_token_pooling(
        params, tokens, None, num_heads=heads, hidden_dim=hidden)

    pooler = streaming.StreamingPooler(
        params, num_heads=heads, hidden_dim=hidden)
    for start in (0, 16, 32):  # ragged chunks: 16 + 16 + 8
      pooler.update(tokens[:, start:start + 16])
    got = pooler.finalize()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

  def test_paddings_and_masked_prefix(self):
    """A fully masked first chunk must be wiped by later real tokens,
    matching the one-shot softmax over the concatenated paddings."""
    from videoprism_tpu.ops.transformer import atten_token_pooling

    d, heads, hidden = 16, 2, 64
    params = self._pooler_params(d, heads, hidden)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 24, d))
    paddings = np.zeros((2, 24), np.float32)
    paddings[:, :8] = 1.0          # fully masked first chunk
    paddings[0, 20:] = 1.0         # ragged tail on one sequence
    paddings = jnp.asarray(paddings)

    want = atten_token_pooling(
        params, tokens, paddings, num_heads=heads, hidden_dim=hidden)

    pooler = streaming.StreamingPooler(
        params, num_heads=heads, hidden_dim=hidden)
    for start in (0, 8, 16):
      pooler.update(tokens[:, start:start + 8], paddings[:, start:start + 8])
    got = pooler.finalize()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

  def test_functional_api_and_errors(self):
    d, heads, hidden = 16, 2, 64
    params = self._pooler_params(d, heads, hidden)
    state = streaming.pooler_init(2, num_heads=heads, hidden_dim=hidden)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 8, d))
    state = streaming.pooler_update(
        params, state, tokens, num_heads=heads, hidden_dim=hidden)
    out = streaming.pooler_finalize(params, state)
    assert out.shape == (2, 1, d)
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError):
      streaming.StreamingPooler(
          params, num_heads=heads, hidden_dim=hidden).finalize()


class TestClassifyLongVideo:

  def _setup(self):
    from videoprism_tpu.models import classifier as vc

    enc_cfg = fe.FactorizedEncoderConfig(
        patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
        num_spatial_layers=1, num_temporal_layers=1, num_heads=2,
        mlp_dim=32, atten_logit_cap=50.0, scan=True)
    cfg = vc.VideoClassifierConfig(encoder=enc_cfg, num_classes=5)
    params = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
    return params, cfg

  def test_exact_pooling_over_windows(self):
    """Logits == classifying the concatenated window tokens one-shot."""
    from videoprism_tpu.ops import basic
    from videoprism_tpu.ops.transformer import atten_token_pooling

    params, cfg = self._setup()
    frames = np.random.default_rng(0).random((10, 12, 12, 3)).astype(
        np.float32)  # windows [0:4], [4:8], tail [6:10]

    got = streaming.classify_long_video(
        params, cfg, frames, window=4, batch_windows=2)

    # The stream repeat-pads the tail window (live-feed semantics) rather
    # than right-aligning like window_frames: compare against the stream's
    # own windows (window extraction itself is pinned by TestWindowFrames).
    wins = np.concatenate(
        [b[:n] for b, n in streaming._iter_window_batches(
            frames, window=4, stride=None, batch_windows=2)], axis=0)
    tokens = jnp.concatenate([
        fe.apply(params['encoder'], wins[i:i + 1], cfg.encoder,
                 train=False)[0]
        for i in range(wins.shape[0])], axis=1)
    emb = jnp.squeeze(atten_token_pooling(
        params['atten_pooler'], tokens, None,
        num_heads=cfg.encoder.num_heads,
        hidden_dim=cfg.encoder.model_dim), axis=-2)
    want = basic.feed_forward(
        params['projection'], emb, activation='identity')[0]
    assert got.shape == (5,)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)

  def test_empty_raises(self):
    params, cfg = self._setup()
    with pytest.raises(ValueError):
      streaming.classify_long_video(
          params, cfg, np.zeros((0, 12, 12, 3), np.float32), window=4)


def _classifier_cfg():
  from videoprism_tpu.models import classifier as vc

  enc_cfg = fe.FactorizedEncoderConfig(
      patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
      num_spatial_layers=1, num_temporal_layers=1, num_heads=2,
      mlp_dim=32, atten_logit_cap=50.0, scan=True)
  return vc.VideoClassifierConfig(encoder=enc_cfg, num_classes=5)


class TestWeightsAreArgumentsNotConstants:
  """Regression for a hardware-smoke failure: jits that CLOSE OVER the
  weight tree bake it into the serialized HLO as constants — the axon
  tunnel's remote-compile endpoint rejects the upload at base scale
  (HTTP 413) and every call retraces.  Weights must be jit ARGUMENTS."""

  def test_encode_windows_takes_params_as_arguments(self):
    cfg = _classifier_cfg()
    params = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
    videos = jnp.zeros((1, 2, 12, 12, 3), jnp.float32)
    lowered = streaming._encode_windows.lower(
        params['encoder'], videos, cfg.encoder)
    n_leaves = len(jax.tree.leaves(params['encoder']))
    arg_leaves = len(jax.tree.leaves(lowered.args_info))
    assert arg_leaves == n_leaves + 1, (arg_leaves, n_leaves)
    # And no weight-sized constants in the program text.
    text = lowered.as_text()
    weight_floats = sum(x.size for x in jax.tree.leaves(params['encoder']))
    assert len(text) < 40 * weight_floats  # baked fp32 literals would blow this

  def test_pooler_update_takes_params_as_arguments(self):
    cfg = _classifier_cfg()
    params = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
    pooler = streaming.StreamingPooler(
        params['atten_pooler'], num_heads=cfg.encoder.num_heads,
        hidden_dim=cfg.encoder.model_dim)
    tokens = jnp.zeros((1, 8, cfg.encoder.model_dim), jnp.float32)
    pooler.update(tokens)
    state = pooler._state
    # The MODULE-LEVEL jit (shared across pooler instances, so repeat
    # serving requests never recompile) takes the tree as arguments.
    lowered = streaming._pooler_update_jit.lower(
        params['atten_pooler'], state, tokens, None, **pooler._kw)
    n_pool = len(jax.tree.leaves(params['atten_pooler']))
    n_state = len(jax.tree.leaves(state))
    assert len(jax.tree.leaves(lowered.args_info)) == n_pool + n_state + 1

  def test_pooler_instances_share_one_compiled_program(self):
    cfg = _classifier_cfg()
    params = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
    kw = dict(num_heads=cfg.encoder.num_heads,
              hidden_dim=cfg.encoder.model_dim)
    tokens = jnp.zeros((1, 8, cfg.encoder.model_dim), jnp.float32)
    before = streaming._pooler_update_jit._cache_size()
    for _ in range(3):  # three "requests", three pooler instances
      p = streaming.StreamingPooler(params['atten_pooler'], **kw)
      p.update(tokens)
      p.finalize()
    grown = streaming._pooler_update_jit._cache_size() - before
    assert grown <= 1, grown  # one shared entry, not one per instance
