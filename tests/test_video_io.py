"""Video loading/preprocessing tests with a synthetic mp4 fixture.

Mirrors the reference's video path semantics (videoprism/video_utils.py):
uniform linspace frame sampling, BGR->RGB, shortest-side resize + center
crop, [0,1] float32 — plus our device-side preprocessing pipeline.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from videoprism_tpu.io import video as video_lib  # noqa: E402


@pytest.fixture(scope='module')
def synthetic_video(tmp_path_factory):
  """24 frames, 64x96, each frame solid gray with intensity = frame idx."""
  path = str(tmp_path_factory.mktemp('vid') / 'clip.mp4')
  writer = cv2.VideoWriter(
      path, cv2.VideoWriter_fourcc(*'mp4v'), 12, (96, 64))
  for i in range(24):
    frame = np.full((64, 96, 3), i * 10, np.uint8)
    writer.write(frame)
  writer.release()
  return path


class TestLoadVideo:

  def test_shapes_and_range(self, synthetic_video):
    clip = video_lib.load_video(synthetic_video, num_frames=8,
                                target_size=32)
    assert clip.shape == (8, 32, 32, 3)
    assert clip.dtype == np.float32
    assert 0.0 <= clip.min() and clip.max() <= 1.0

  def test_uniform_sampling_monotonic(self, synthetic_video):
    """Frame intensities encode frame indices: sampled means must be
    non-decreasing (uniform linspace order)."""
    clip = video_lib.load_video(synthetic_video, num_frames=6,
                                target_size=32)
    means = clip.mean(axis=(1, 2, 3))
    assert np.all(np.diff(means) >= -1e-3), means

  def test_resize_modes(self, synthetic_video):
    for mode in ('center_crop', 'resize'):
      clip = video_lib.load_video(synthetic_video, num_frames=2,
                                  target_size=48, resize_mode=mode)
      assert clip.shape == (2, 48, 48, 3)
    with pytest.raises(ValueError):
      video_lib.load_video(synthetic_video, num_frames=2,
                           resize_mode='stretch')

  def test_too_many_frames_raises(self, synthetic_video):
    with pytest.raises(ValueError, match='only'):
      video_lib.load_video(synthetic_video, num_frames=100)

  def test_batch_and_workers(self, synthetic_video):
    batch = video_lib.load_video_batch(
        [synthetic_video] * 3, num_frames=4, target_size=32, num_workers=2)
    assert batch.shape == (3, 4, 32, 32, 3)
    np.testing.assert_array_equal(batch[0], batch[1])


class TestDevicePreprocess:

  def test_uint8_to_float(self):
    import jax.numpy as jnp

    frames = (np.arange(2 * 32 * 32 * 3) % 256).astype(np.uint8).reshape(
        2, 32, 32, 3)
    out = video_lib.preprocess_frames(jnp.asarray(frames), target_size=32)
    np.testing.assert_allclose(
        np.asarray(out), frames.astype(np.float32) / 255.0)

  def test_center_crop_resize_shape(self):
    import jax.numpy as jnp

    frames = jnp.zeros((2, 4, 60, 90, 3), jnp.float32)
    out = video_lib.preprocess_frames(frames, target_size=48)
    assert out.shape == (2, 4, 48, 48, 3)
    out = video_lib.preprocess_frames(frames, target_size=48,
                                      resize_mode='resize')
    assert out.shape == (2, 4, 48, 48, 3)

  def test_prefetcher(self, synthetic_video=None):
    pass  # exercised indirectly; prefetcher needs real paths


class TestPrefetcher:

  def test_iterates_all_batches(self, synthetic_video):
    pf = video_lib.VideoPrefetcher(
        [synthetic_video] * 5, batch_size=2, num_frames=2, target_size=32,
        num_workers=2)
    batches = list(pf)
    assert [b.shape[0] for b in batches] == [2, 2, 1]
    assert batches[0].shape[1:] == (2, 32, 32, 3)
