"""Multi-view evaluation: NxM view loading (io/video.py, native decoder)
and per-example view aggregation in the eval loops.

The protocol (ViViT-style): N temporal clips from equal windows x M
spatial crops along the longer side; logits (classifier) or l2-normalized
embeddings (CLIP) averaged per example.  1x1 views must reproduce the
single-view path bit-for-bit end to end.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu import assets, evaluation
from videoprism_tpu.io import video as video_lib
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.train import (
    data as data_lib,
    evaluate_classifier,
    evaluate_retrieval,
)

cv2 = pytest.importorskip('cv2')


# ---------------------------------------------------------------------------
# View geometry helpers
# ---------------------------------------------------------------------------


class TestViewIndices:

  def test_single_view_matches_load_video_linspace(self):
    got = video_lib.multi_view_indices(30, 8, 1)
    expect = np.linspace(0, 29, 8, dtype=int)
    np.testing.assert_array_equal(got, expect[None])

  def test_windows_partition_and_stay_in_bounds(self):
    views = video_lib.multi_view_indices(100, 16, 4)
    assert views.shape == (4, 16)
    for v in range(4):
      lo, hi = v * 25, (v + 1) * 25 - 1
      assert views[v].min() >= lo and views[v].max() <= hi
      assert (np.diff(views[v]) >= 0).all()

  def test_invalid_args_raise(self):
    with pytest.raises(ValueError, match='must be >= 1'):
      video_lib.multi_view_indices(30, 8, 0)

  def test_crop_fracs(self):
    np.testing.assert_array_equal(video_lib.spatial_crop_fracs(1), [0.5])
    np.testing.assert_allclose(video_lib.spatial_crop_fracs(3),
                               [0.0, 0.5, 1.0])
    with pytest.raises(ValueError, match='>= 1'):
      video_lib.spatial_crop_fracs(0)


# ---------------------------------------------------------------------------
# load_video_views
# ---------------------------------------------------------------------------


@pytest.fixture(scope='module')
def synthetic_video(tmp_path_factory):
  """30 frames, 64x96 landscape: intensity = 8*idx plus a horizontal
  gradient so spatial crops are distinguishable."""
  path = str(tmp_path_factory.mktemp('mvvid') / 'clip.mp4')
  writer = cv2.VideoWriter(
      path, cv2.VideoWriter_fourcc(*'mp4v'), 12, (96, 64))
  ramp = np.broadcast_to(
      np.linspace(0, 64, 96, dtype=np.uint8)[None, :, None], (64, 96, 3))
  for i in range(30):
    writer.write(np.minimum(ramp.astype(np.int32) + i * 4, 255)
                 .astype(np.uint8))
  writer.release()
  return path


class TestLoadVideoViews:

  def test_1x1_equals_load_video(self, synthetic_video):
    for backend in ('opencv', 'auto'):
      single = video_lib.load_video(
          synthetic_video, num_frames=6, target_size=32, backend=backend)
      views = video_lib.load_video_views(
          synthetic_video, num_frames=6, target_size=32, backend=backend)
      assert views.shape == (1, 6, 32, 32, 3)
      np.testing.assert_array_equal(views[0], single)

  def test_shape_order_and_dtype(self, synthetic_video):
    views = video_lib.load_video_views(
        synthetic_video, num_frames=4, target_size=32, temporal_views=2,
        spatial_views=3, backend='opencv', as_uint8=True)
    assert views.shape == (6, 4, 32, 32, 3) and views.dtype == np.uint8
    # Temporal-major order: views 0-2 share temporal window 0 (same frame
    # intensities), views 3-5 window 1 (strictly later -> brighter).
    assert views[3:].mean() > views[:3].mean()
    # The landscape gradient makes left/center/right crops ordered.
    assert views[0].mean() < views[1].mean() < views[2].mean()

  def test_center_crop_view_equals_single_view(self, synthetic_video):
    """Of the 3 spatial crops, the middle one IS the center crop."""
    views = video_lib.load_video_views(
        synthetic_video, num_frames=4, target_size=32, spatial_views=3,
        backend='opencv')
    single = video_lib.load_video(
        synthetic_video, num_frames=4, target_size=32, backend='opencv')
    np.testing.assert_array_equal(views[1], single)

  def test_crops_slice_the_resized_frame(self, synthetic_video):
    """Left/right crops equal manual slices of the shortest-side-resized
    frame at truncated fractional offsets."""
    views = video_lib.load_video_views(
        synthetic_video, num_frames=2, target_size=32, spatial_views=3,
        backend='opencv', as_uint8=True)
    cap = cv2.VideoCapture(synthetic_video)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    idx = int(np.linspace(0, total - 1, 2, dtype=int)[0])
    cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
    _, frame = cap.read()
    cap.release()
    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    h, w = frame.shape[:2]  # 64x96 -> resized 32x48
    resized = cv2.resize(frame, (int(w * 32 / h), 32))
    np.testing.assert_array_equal(views[0][0], resized[:, :32])
    np.testing.assert_array_equal(views[2][0], resized[:, -32:])

  def test_too_few_frames_raises(self, synthetic_video):
    with pytest.raises(ValueError, match='only 30 frames'):
      video_lib.load_video_views(
          synthetic_video, num_frames=64, target_size=32,
          backend='opencv')


class TestNativeMultiCrop:

  @pytest.fixture(autouse=True)
  def _need_native(self):
    from videoprism_tpu import native

    if native.load_video_lib() is None:
      pytest.skip(f'native decoder unavailable: {native.video_lib_error()}')

  def test_sample_crops_center_equals_sample(self, synthetic_video):
    from videoprism_tpu import native

    with native.NativeVideoDecoder(synthetic_video) as dec:
      idx = np.array([0, 7, 29], np.int64)
      ref = dec.sample(idx, 32)
    with native.NativeVideoDecoder(synthetic_video) as dec:
      got = dec.sample_crops(idx, 32, [0.5])
    assert got.shape == (3, 1, 32, 32, 3)
    np.testing.assert_array_equal(got[:, 0], ref)

  def test_native_views_match_opencv_views(self, synthetic_video):
    """Same geometry; near-identical pixels (codec + resize-filter slack,
    same tolerance as the single-view native/opencv parity test)."""
    kwargs = dict(num_frames=4, target_size=32, temporal_views=2,
                  spatial_views=3, as_uint8=True)
    ref = video_lib.load_video_views(synthetic_video, backend='opencv',
                                     **kwargs)
    got = video_lib.load_video_views(synthetic_video, backend='ffmpeg',
                                     **kwargs)
    assert got.shape == ref.shape
    assert np.abs(got.astype(int) - ref.astype(int)).mean() <= 3

  def test_bad_fracs_raise(self, synthetic_video):
    from videoprism_tpu import native

    with native.NativeVideoDecoder(synthetic_video) as dec:
      with pytest.raises(ValueError, match=r'\[0, 1\]'):
        dec.sample_crops(np.array([0], np.int64), 32, [1.5])
      with pytest.raises(ValueError, match='non-empty'):
        dec.sample_crops(np.array([0], np.int64), 32, [])


# ---------------------------------------------------------------------------
# Eval-loop aggregation
# ---------------------------------------------------------------------------

NUM_CLASSES = 6
TINY_ENC = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
    num_temporal_layers=1, mlp_dim=16, model_dim=8, num_heads=2,
    atten_logit_cap=50.0, scan=True)
TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
    num_temporal_layers=1, mlp_dim=16, num_auxiliary_layers=0,
    vocabulary_size=1024, enable_causal_atten=True, num_unimodal_layers=1,
    norm_policy='pre', model_dim=8, num_heads=2, atten_logit_cap=50.0,
    scan=True)


@dataclasses.dataclass
class TiledViews:
  """Wraps a synthetic source so get() returns V identical views — the
  aggregated metrics must equal the single-view sweep exactly."""

  base: object
  views: int

  def __len__(self):
    return len(self.base)

  def get(self, i):
    clip, target = self.base.get(i)
    return np.repeat(clip[None], self.views, axis=0), target


class TestMultiViewClassifierEval:

  def _setup(self):
    cfg = vc.VideoClassifierConfig(
        encoder=fe.FactorizedEncoderConfig(**TINY_ENC),
        num_classes=NUM_CLASSES)
    params = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
    source = data_lib.SyntheticLabeledSource(
        num_examples=7, num_frames=2, size=12, num_classes=NUM_CLASSES)
    return cfg, params, source

  @pytest.mark.parametrize('aggregate', ['logits', 'probs'])
  def test_identical_views_equal_single_view(self, aggregate):
    cfg, params, source = self._setup()
    single = evaluate_classifier(params, cfg, source, batch_size=4)
    multi = evaluate_classifier(
        params, cfg, TiledViews(source, 3), batch_size=4,
        view_aggregate=aggregate)
    assert multi['num_views'] == 3.0
    assert multi['top1_accuracy'] == single['top1_accuracy']
    assert multi['top5_accuracy'] == single['top5_accuracy']
    np.testing.assert_allclose(multi['loss'], single['loss'], rtol=1e-5)

  def test_views_exceeding_batch_size(self):
    """V > batch_size: geometry grows to V rows, metrics still match."""
    cfg, params, source = self._setup()
    single = evaluate_classifier(params, cfg, source, batch_size=2)
    multi = evaluate_classifier(params, cfg, TiledViews(source, 5),
                                batch_size=2)
    assert multi['top1_accuracy'] == single['top1_accuracy']

  def test_probs_vs_logits_aggregation_differ_on_mixed_views(self):
    """Genuinely different views: the two aggregation rules must both run
    (and generally disagree on loss)."""
    cfg, params, source = self._setup()

    @dataclasses.dataclass
    class Jittered:
      base: object

      def __len__(self):
        return len(self.base)

      def get(self, i):
        clip, label = self.base.get(i)
        views = np.stack([clip, np.clip(clip * 0.5, 0, 1)], axis=0)
        return views, label

    a = evaluate_classifier(params, cfg, Jittered(source), batch_size=4,
                            view_aggregate='logits')
    b = evaluate_classifier(params, cfg, Jittered(source), batch_size=4,
                            view_aggregate='probs')
    assert a['num_views'] == b['num_views'] == 2.0
    assert np.isfinite(a['loss']) and np.isfinite(b['loss'])

  def test_bad_aggregate_raises(self):
    cfg, params, source = self._setup()
    with pytest.raises(ValueError, match='view_aggregate'):
      evaluate_classifier(params, cfg, source, view_aggregate='median')

  def test_bad_clip_rank_raises(self):
    cfg, params, source = self._setup()

    @dataclasses.dataclass
    class Bad:
      def __len__(self):
        return 1

      def get(self, i):
        return np.zeros((2, 12, 12), np.float32), 0

    with pytest.raises(ValueError, match='clips must be'):
      evaluate_classifier(params, cfg, Bad())


class TestMultiViewRetrieval:

  def test_identical_views_equal_single_view(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    tok = SentencePieceTokenizer(assets.test_spm_path())
    source = data_lib.SyntheticSource(num_examples=5, num_frames=2, size=12)
    single = evaluate_retrieval(params, cfg, source, tok, batch_size=4,
                                max_text_len=12)
    multi = evaluate_retrieval(params, cfg, TiledViews(source, 3), tok,
                               batch_size=4, max_text_len=12)
    for k, val in single.items():
      np.testing.assert_allclose(multi[k], val, atol=1e-6, err_msg=k)


class TestMultiViewSource:

  def test_wraps_label_source(self, synthetic_video):
    base = data_lib.VideoLabelSource(
        [synthetic_video, synthetic_video], [3, 1], num_frames=4,
        target_size=32)
    src = data_lib.MultiViewSource(base, temporal_views=2, spatial_views=3,
                                   backend='opencv')
    assert len(src) == 2
    assert list(src.labels) == [3, 1]
    views, label = src.get(1)
    assert views.shape == (6, 4, 32, 32, 3) and label == 1

  def test_wraps_text_source(self, synthetic_video):
    base = data_lib.VideoTextSource(
        [synthetic_video], ['a ramp'], num_frames=4, target_size=32)
    src = data_lib.MultiViewSource(base, temporal_views=2, spatial_views=1,
                                   backend='opencv')
    views, caption = src.get(0)
    assert views.shape == (2, 4, 32, 32, 3) and caption == 'a ramp'
    assert list(src.captions) == ['a ramp']

  def test_rejects_pathless_source(self):
    with pytest.raises(ValueError, match='path-backed'):
      data_lib.MultiViewSource(data_lib.SyntheticLabeledSource())

  def test_evaluates_end_to_end(self, synthetic_video):
    """Manifest -> MultiViewSource -> evaluate_classifier, real decode."""
    cfg = vc.VideoClassifierConfig(
        encoder=fe.FactorizedEncoderConfig(**{**TINY_ENC,
                                              'pos_emb_shape': (2, 3, 3)}),
        num_classes=NUM_CLASSES)
    params = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
    base = data_lib.VideoLabelSource(
        [synthetic_video] * 3, [0, 1, 2], num_frames=2, target_size=36)
    src = data_lib.MultiViewSource(base, temporal_views=2, spatial_views=3,
                                   backend='opencv')
    metrics = evaluate_classifier(params, cfg, src, batch_size=6)
    assert metrics['num_examples'] == 3.0 and metrics['num_views'] == 6.0
    assert np.isfinite(metrics['loss'])


class TestReviewFixes:

  def test_too_many_temporal_views_raises(self):
    with pytest.raises(ValueError, match='too few'):
      video_lib.multi_view_indices(2, 2, 4)

  def test_load_views_rejects_narrow_windows(self, synthetic_video):
    with pytest.raises(ValueError, match='too few'):
      video_lib.load_video_views(
          synthetic_video, num_frames=1, target_size=32,
          temporal_views=64, backend='opencv')

  def test_multiview_source_declares_views(self, synthetic_video):
    base = data_lib.VideoLabelSource([synthetic_video], [0], num_frames=2,
                                     target_size=32)
    src = data_lib.MultiViewSource(base, temporal_views=4, spatial_views=3)
    assert src.num_views == 12


class TestManifestParsing:

  def test_missing_caption_errors_with_line_number(self, tmp_path):
    p = tmp_path / 'bad.tsv'
    p.write_text('a.mp4\tok caption\njust_a_path.mp4\n')
    with pytest.raises(ValueError, match=r'bad\.tsv:2.*no caption'):
      data_lib.VideoTextSource.from_manifest(str(p), num_frames=2)

  def test_allow_missing_captions(self, tmp_path):
    p = tmp_path / 'paths.txt'
    p.write_text('a.mp4\nb.mp4\tcap\nc.mp4,another\n')
    src = data_lib.VideoTextSource.from_manifest(
        str(p), allow_missing_captions=True, num_frames=2)
    assert src.video_paths == ['a.mp4', 'b.mp4', 'c.mp4']
    assert src.captions == ['', 'cap', 'another']


class TestTokenizerResolution:

  def test_explicit_and_env_win(self, monkeypatch):
    assert assets.resolve_tokenizer_path('/x/y.model') == '/x/y.model'
    monkeypatch.setenv('VIDEOPRISM_SPM_PATH', '/env/z.model')
    assert assets.resolve_tokenizer_path(None) == '/env/z.model'

  def test_fixture_only_when_allowed(self, monkeypatch):
    monkeypatch.delenv('VIDEOPRISM_SPM_PATH', raising=False)
    assert assets.resolve_tokenizer_path(
        None, allow_fixture=True) == assets.test_spm_path()
    with pytest.raises(ValueError, match='c4_en.model'):
      assets.resolve_tokenizer_path(None)
