"""Native (FFmpeg C++) video decoder vs the OpenCV reference path."""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from videoprism_tpu import native  # noqa: E402
from videoprism_tpu.io import video as video_lib  # noqa: E402

if native.load_video_lib() is None:
  pytest.skip(f'native video decoder unavailable: '
              f'{native.video_lib_error()}', allow_module_level=True)


@pytest.fixture(scope='module')
def synthetic_video(tmp_path_factory):
  """30 frames, 64x96: solid gray, intensity = 8*idx (codec-robust)."""
  path = str(tmp_path_factory.mktemp('nvid') / 'clip.mp4')
  writer = cv2.VideoWriter(
      path, cv2.VideoWriter_fourcc(*'mp4v'), 12, (96, 64))
  for i in range(30):
    writer.write(np.full((64, 96, 3), i * 8, np.uint8))
  writer.release()
  return path


class TestNativeDecoder:

  def test_info(self, synthetic_video):
    with native.NativeVideoDecoder(synthetic_video) as dec:
      assert dec.num_frames == 30
      assert (dec.width, dec.height) == (96, 64)
      assert dec.fps == pytest.approx(12, abs=0.5)

  def test_matches_opencv_loader(self, synthetic_video):
    """Same sampling, same crop geometry, near-identical pixels (solid
    frames are invariant to the resize filter; the codec is lossy so a
    couple of gray levels of slack)."""
    for mode in ('center_crop', 'resize'):
      ref = video_lib.load_video(
          synthetic_video, num_frames=8, target_size=32,
          resize_mode=mode, as_uint8=True, backend='opencv')
      got = video_lib.load_video(
          synthetic_video, num_frames=8, target_size=32,
          resize_mode=mode, as_uint8=True, backend='ffmpeg')
      assert got.shape == ref.shape == (8, 32, 32, 3)
      assert np.abs(got.astype(int) - ref.astype(int)).max() <= 3

  def test_frame_sampling_is_exact(self, synthetic_video):
    """Per-frame intensity encodes the frame index: the sampled frames
    must be exactly the linspace indices (no keyframe snapping)."""
    clip = video_lib.load_video(
        synthetic_video, num_frames=6, target_size=32, as_uint8=True,
        backend='ffmpeg')
    means = clip.reshape(6, -1).mean(axis=1)
    expect = np.linspace(0, 29, 6, dtype=np.int64) * 8
    assert np.abs(means - expect).max() <= 3, (means, expect)

  def test_float_contract(self, synthetic_video):
    clip = video_lib.load_video(
        synthetic_video, num_frames=4, target_size=32, backend='ffmpeg')
    assert clip.dtype == np.float32
    assert 0.0 <= clip.min() and clip.max() <= 1.0

  def test_too_many_frames_raises(self, synthetic_video):
    with pytest.raises(ValueError, match='only 30 frames'):
      video_lib.load_video(synthetic_video, num_frames=31,
                           target_size=32, backend='ffmpeg')

  def test_bad_file_raises(self, tmp_path):
    p = tmp_path / 'not_a_video.mp4'
    p.write_bytes(b'garbage')
    with pytest.raises(native.NativeDecodeError):
      native.NativeVideoDecoder(str(p))
    # Explicit ffmpeg backend surfaces the failure; 'auto' falls back to
    # OpenCV (which then raises its own error for this file).
    with pytest.raises(native.NativeDecodeError):
      video_lib.load_video(str(p), num_frames=2, target_size=32,
                           backend='ffmpeg')
    with pytest.raises(ValueError):
      video_lib.load_video(str(p), num_frames=2, target_size=32,
                           backend='auto')

  def test_long_gop_seek_terminates(self, tmp_path_factory):
    """Sparse sampling from a long clip must terminate and pick exact
    frames even when seeks land well before the target (regression for
    the re-seek-in-place hang)."""
    path = str(tmp_path_factory.mktemp('lvid') / 'long.mp4')
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*'mp4v'), 30, (64, 48))
    for i in range(300):
      writer.write(np.full((48, 64, 3), (i * 7) % 251, np.uint8))
    writer.release()
    clip = video_lib.load_video(path, num_frames=8, target_size=32,
                                as_uint8=True, backend='ffmpeg')
    means = clip.reshape(8, -1).mean(axis=1)
    expect = (np.linspace(0, 299, 8, dtype=np.int64) * 7) % 251
    assert np.abs(means - expect).max() <= 4, (means, expect)

  def test_gradient_crop_geometry(self, tmp_path_factory):
    """A horizontal-gradient frame checks that the shortest-side resize +
    center crop picks the same spatial window as the cv2 path."""
    path = str(tmp_path_factory.mktemp('gvid') / 'grad.mp4')
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*'mp4v'), 12, (128, 64))
    frame = np.broadcast_to(
        np.linspace(0, 255, 128, dtype=np.uint8)[None, :, None],
        (64, 128, 3)).copy()
    for _ in range(6):
      writer.write(frame)
    writer.release()

    ref = video_lib.load_video(path, num_frames=2, target_size=32,
                               as_uint8=True, backend='opencv')
    got = video_lib.load_video(path, num_frames=2, target_size=32,
                               as_uint8=True, backend='ffmpeg')
    # Different bilinear implementations: allow small per-pixel slack but
    # require the same window (a crop offset error of one 4-px bin would
    # shift values by ~8 gray levels).
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 6
