"""Text-to-time moment localization (retrieval.localize_moments +
make_frame_embeddings_fn): sliding-window scoring over per-frame CLIP
embeddings, temporal NMS, and the frame-embedding extraction path."""

import jax
import numpy as np
import pytest

from videoprism_tpu import retrieval
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import init as init_lib

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True, num_auxiliary_layers=1,
    enable_causal_atten=True, num_unimodal_layers=2, norm_policy='pre',
    vocabulary_size=1000)


def _planted_frames(t=16, d=8, lo=5, hi=9, seed=0):
  """Background noise frames with the query direction planted in
  frames [lo, hi)."""
  rng = np.random.default_rng(seed)
  frames = rng.standard_normal((t, d)).astype(np.float32) * 0.1
  query = np.zeros(d, np.float32)
  query[0] = 1.0
  frames[lo:hi] += query
  frames /= np.linalg.norm(frames, axis=-1, keepdims=True)
  return frames, query


class TestLocalizeMoments:

  def test_finds_the_planted_segment(self):
    frames, query = _planted_frames(lo=5, hi=9)
    (segments,) = retrieval.localize_moments(
        frames, query, window_sizes=(1, 2, 4, 8), top_k=3)
    best = segments[0]
    # The best window covers (a large part of) the planted [5, 9).
    inter = max(0, min(best['end'], 9) - max(best['start'], 5))
    assert inter / (best['end'] - best['start']) > 0.75
    assert best['score'] > 0.8
    # Score-descending, NMS keeps overlaps bounded.
    scores = [s['score'] for s in segments]
    assert scores == sorted(scores, reverse=True)

  def test_matches_bruteforce_oracle(self):
    """The prefix-sum sweep + greedy NMS must equal a naive
    re-implementation (per-window mean, renormalized, scored, NMS'd) on
    random embeddings — the O(T)-per-size optimization is not allowed to
    change a single segment or score."""
    rng = np.random.default_rng(7)
    t, d, nq = 23, 8, 3
    frames = rng.standard_normal((t, d)).astype(np.float32)
    queries = rng.standard_normal((nq, d)).astype(np.float32)
    sizes, top_k, iou_thr = (1, 3, 5), 4, 0.4
    got = retrieval.localize_moments(
        frames, queries, window_sizes=sizes, top_k=top_k,
        iou_threshold=iou_thr)

    fn = frames / np.linalg.norm(frames, axis=-1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    cands = []
    for w in sizes:
      for s in range(t - w + 1):
        m = fn[s:s + w].mean(axis=0)
        m = m / max(float(np.linalg.norm(m)), 1e-12)
        cands.append((s, s + w, qn @ m))

    def iou(a, b):
      inter = max(0, min(a[1], b[1]) - max(a[0], b[0]))
      union = (a[1] - a[0]) + (b[1] - b[0]) - inter
      return inter / union if union else 0.0

    for q in range(nq):
      ranked = sorted(cands, key=lambda c: -float(c[2][q]))
      kept = []
      for s, e, sc in ranked:
        if len(kept) >= top_k:
          break
        if any(iou((s, e), (k[0], k[1])) > iou_thr for k in kept):
          continue
        kept.append((s, e, float(sc[q])))
      assert [(seg['start'], seg['end']) for seg in got[q]] == [
          (s, e) for s, e, _ in kept]
      np.testing.assert_allclose(
          [seg['score'] for seg in got[q]], [sc for _, _, sc in kept],
          atol=1e-5)

  def test_nms_suppresses_overlapping_windows(self):
    frames, query = _planted_frames(lo=4, hi=8)
    (segments,) = retrieval.localize_moments(
        frames, query, window_sizes=(4,), top_k=5, iou_threshold=0.2)

    def iou(a, b):
      inter = max(0, min(a['end'], b['end']) - max(a['start'], b['start']))
      union = ((a['end'] - a['start']) + (b['end'] - b['start']) - inter)
      return inter / union

    for i, a in enumerate(segments):
      for b in segments[i + 1:]:
        assert iou(a, b) <= 0.2

  def test_multiple_queries_independent(self):
    rng = np.random.default_rng(1)
    d = 8
    frames = rng.standard_normal((12, d)).astype(np.float32) * 0.1
    q0 = np.eye(d, dtype=np.float32)[0]
    q1 = np.eye(d, dtype=np.float32)[1]
    frames[2:4] += q0
    frames[8:11] += q1
    results = retrieval.localize_moments(
        frames, np.stack([q0, q1]), window_sizes=(2, 3), top_k=1)
    assert 1 <= results[0][0]['start'] <= 3 and results[0][0]['end'] <= 5
    assert 7 <= results[1][0]['start'] <= 9 and results[1][0]['end'] <= 11

  def test_window_larger_than_clip_is_dropped(self):
    frames, query = _planted_frames(t=4)
    (segments,) = retrieval.localize_moments(
        frames, query, window_sizes=(2, 64), top_k=10)
    assert all(s['end'] - s['start'] == 2 for s in segments)

  @pytest.mark.parametrize('kwargs, needle', [
      (dict(window_sizes=(0,)), 'window'),
      (dict(window_sizes=(99,)), 'window'),
      (dict(top_k=0), 'top_k'),
      (dict(iou_threshold=1.5), 'iou'),
  ])
  def test_bad_args(self, kwargs, needle):
    frames, query = _planted_frames(t=8)
    with pytest.raises(ValueError, match=needle):
      retrieval.localize_moments(frames, query, **kwargs)

  def test_dim_mismatch(self):
    frames, _ = _planted_frames()
    with pytest.raises(ValueError, match='dim'):
      retrieval.localize_moments(frames, np.zeros(3, np.float32))


class TestFrameEmbeddingsFn:

  @pytest.fixture(scope='class')
  def model(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    return cfg, params

  def test_matches_apply_intermediate(self, model):
    cfg, params = model
    video = np.random.default_rng(0).random((3, 2, 12, 12, 3), np.float32)
    fn = retrieval.make_frame_embeddings_fn(params, cfg)
    got = fn(video)
    _, _, out = vclip.apply(params, video, None, None, cfg, train=False,
                            return_intermediate={'frame_embeddings'})
    np.testing.assert_allclose(got, np.asarray(out['frame_embeddings']),
                               atol=1e-5)
    assert got.shape == (3, 2, cfg.model_dim)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                               atol=1e-4)

  def test_single_clip_and_uint8(self, model):
    cfg, params = model
    fn = retrieval.make_frame_embeddings_fn(params, cfg)
    clip8 = (np.random.default_rng(1).random((2, 12, 12, 3)) * 255
             ).astype(np.uint8)
    one = fn(clip8)
    assert one.shape == (2, cfg.model_dim)
    batched = fn(clip8[None].astype(np.float32) / 255.0)
    np.testing.assert_allclose(one, batched[0], atol=1e-5)

  def test_end_to_end_with_text_queries(self, model):
    """Frame embeddings + the real (fixture-tokenizer) text tower feed
    localize_moments without shape/space mismatches."""
    from videoprism_tpu import assets
    from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

    cfg, params = model
    tok = SentencePieceTokenizer(assets.test_spm_path())
    encode = retrieval.make_text_query_encoder(params, cfg, tok)
    frame_fn = retrieval.make_frame_embeddings_fn(params, cfg)
    video = np.random.default_rng(2).random((4, 12, 12, 3), np.float32)
    moments = retrieval.localize_moments(
        frame_fn(video), encode(['a thing happening', 'another thing']),
        window_sizes=(1, 2), top_k=2)
    assert len(moments) == 2
    assert all(len(m) == 2 for m in moments)
    assert all(0 <= s['start'] < s['end'] <= 4
               for m in moments for s in m)

  def test_bad_rank(self, model):
    cfg, params = model
    fn = retrieval.make_frame_embeddings_fn(params, cfg)
    with pytest.raises(ValueError, match='expected'):
      fn(np.zeros((12, 12, 3), np.float32))
