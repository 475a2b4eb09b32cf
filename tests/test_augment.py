"""Device-side augmentation (train/augment.py): geometric correctness of
the continuous random-resized-crop, flip/jitter semantics, determinism,
and composition with shard-able batch layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.train import augment

B, T, H, W = 3, 2, 16, 16


def _clips(seed=0, shape=(B, T, H, W, 3)):
  return jnp.asarray(
      np.random.default_rng(seed).random(shape, np.float32))


class TestIdentityAndDeterminism:

  def test_neutral_config_is_identity(self):
    cfg = augment.AugmentConfig(crop=False, flip=False, brightness=0.0,
                                contrast=0.0, saturation=0.0)
    assert cfg.is_identity()
    assert augment.make_augment_fn(cfg) is None
    assert augment.make_augment_fn(None) is None
    v = _clips()
    np.testing.assert_array_equal(augment.augment_clips(
        jax.random.PRNGKey(0), v, cfg), v)

  def test_same_key_same_output_different_key_differs(self):
    fn = augment.make_augment_fn(augment.AugmentConfig())
    v = _clips()
    a = fn(jax.random.PRNGKey(7), v)
    b = fn(jax.random.PRNGKey(7), v)
    c = fn(jax.random.PRNGKey(8), v)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)

  def test_output_shape_dtype_and_range(self):
    fn = augment.make_augment_fn(augment.AugmentConfig())
    v = _clips().astype(jnp.bfloat16)
    out = fn(jax.random.PRNGKey(0), v)
    assert out.shape == v.shape and out.dtype == v.dtype
    out32 = np.asarray(out, np.float32)
    assert out32.min() >= 0.0 and out32.max() <= 1.0 + 1e-2


class TestCropGeometry:

  def test_full_box_crop_is_identity(self):
    """crop_scale=(1,1), ratio=(1,1): the sampled box is the whole image
    and the resample is scale=1/translate=0 — exact passthrough."""
    cfg = augment.AugmentConfig(
        crop=True, crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0),
        flip=False, brightness=0.0, contrast=0.0, saturation=0.0)
    v = _clips()
    out = augment.augment_clips(jax.random.PRNGKey(0), v, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-5)

  def test_crop_reproduces_linear_ramp_coordinates(self):
    """Sampling a linear ramp through any affine box must return the
    ramp evaluated at the box's coordinates: out[y] = top + (y + 0.5) *
    crop_h / H - 0.5 (half-pixel centers).  Verifies the
    scale/translation convention in _crop_one exactly."""
    ramp = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.float32)[None, :, None, None],
        (T, H, W, 3))
    top, crop_h = jnp.float32(3.25), jnp.float32(8.5)
    out = augment._crop_one(ramp, top, jnp.float32(0.0), crop_h,
                            jnp.float32(W))
    y = np.arange(H)
    expected = float(top) + (y + 0.5) * float(crop_h) / H - 0.5
    got = np.asarray(out)[0, :, W // 2, 0]
    np.testing.assert_allclose(got[2:-2], expected[2:-2], atol=1e-4)

  def test_boxes_always_inside_image(self):
    cfg = augment.AugmentConfig()
    for seed in range(5):
      top, left, ch, cw = augment._sample_boxes(
          jax.random.PRNGKey(seed), 64, H, W, cfg)
      top, left, ch, cw = (np.asarray(x) for x in (top, left, ch, cw))
      assert (top >= 0).all() and (left >= 0).all()
      assert (top + ch <= H + 1e-4).all()
      assert (left + cw <= W + 1e-4).all()
      assert (ch >= 1).all() and (cw >= 1).all()

  def test_temporal_consistency(self):
    """Identical frames stay identical: one box/flip/jitter per clip."""
    frame = np.random.default_rng(1).random((1, 1, H, W, 3), np.float32)
    v = jnp.asarray(np.broadcast_to(frame, (2, 4, H, W, 3)).copy())
    out = np.asarray(augment.augment_clips(
        jax.random.PRNGKey(3), v, augment.AugmentConfig()))
    for b in range(2):
      for t in range(1, 4):
        np.testing.assert_array_equal(out[b, t], out[b, 0])

  def test_clips_get_independent_draws(self):
    v = jnp.asarray(np.broadcast_to(
        np.random.default_rng(2).random((1, T, H, W, 3), np.float32),
        (4, T, H, W, 3)).copy())
    out = np.asarray(augment.augment_clips(
        jax.random.PRNGKey(0), v, augment.AugmentConfig()))
    diffs = [np.abs(out[i] - out[0]).max() for i in range(1, 4)]
    assert max(diffs) > 1e-3


class TestFlipAndJitter:

  def test_flip_only_is_exact_mirror_or_identity(self):
    cfg = augment.AugmentConfig(crop=False, flip=True, brightness=0.0,
                                contrast=0.0, saturation=0.0)
    v = _clips()
    out = np.asarray(augment.augment_clips(jax.random.PRNGKey(11), v, cfg))
    vn = np.asarray(v)
    for b in range(B):
      ok_id = np.array_equal(out[b], vn[b])
      ok_flip = np.array_equal(out[b], vn[b][:, :, ::-1, :])
      assert ok_id or ok_flip
    # across a few keys both branches must occur
    outs = [np.asarray(augment.augment_clips(jax.random.PRNGKey(k), v, cfg))
            for k in range(6)]
    flips = [np.array_equal(o[b], vn[b][:, :, ::-1, :])
             for o in outs for b in range(B)]
    assert any(flips) and not all(flips)

  def test_brightness_is_multiplicative(self):
    cfg = augment.AugmentConfig(crop=False, flip=False, brightness=0.5,
                                contrast=0.0, saturation=0.0)
    v = _clips() * 0.4  # headroom so the [0,1] clip never bites
    out = np.asarray(augment.augment_clips(jax.random.PRNGKey(5), v, cfg))
    vn = np.asarray(v)
    for b in range(B):
      factors = out[b][vn[b] > 0.01] / vn[b][vn[b] > 0.01]
      assert factors.std() < 1e-5
      assert 0.5 - 1e-5 <= factors.mean() <= 1.5 + 1e-5

  def test_saturation_preserves_gray_pixels(self):
    cfg = augment.AugmentConfig(crop=False, flip=False, brightness=0.0,
                                contrast=0.0, saturation=0.8)
    gray = jnp.broadcast_to(
        jnp.asarray(np.random.default_rng(3).random(
            (B, T, H, W, 1), np.float32)), (B, T, H, W, 3)).astype(
                jnp.float32)
    out = augment.augment_clips(jax.random.PRNGKey(0), gray, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gray), atol=1e-6)


class TestBatchLayouts:

  def test_accum_axis_folds_and_restores(self):
    fn = augment.make_augment_fn(augment.AugmentConfig())
    v = _clips(shape=(2, 3, T, H, W, 3))  # [accum, micro, ...]
    out = fn(jax.random.PRNGKey(0), v)
    assert out.shape == v.shape
    flat = fn(jax.random.PRNGKey(0), v.reshape(6, T, H, W, 3))
    np.testing.assert_array_equal(np.asarray(out).reshape(6, T, H, W, 3),
                                  np.asarray(flat))

  def test_sharded_batch_runs_under_mesh(self):
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = jax.devices()[:4]
    mesh = jax.sharding.Mesh(np.array(devices).reshape(4, 1),
                             ('data', 'model'))
    fn = augment.make_augment_fn(augment.AugmentConfig())
    v = _clips(shape=(8, T, H, W, 3))
    sharded = jax.device_put(v, NamedSharding(mesh, P('data')))
    out = fn(jax.random.PRNGKey(0), sharded)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(fn(jax.random.PRNGKey(0), v)),
                               atol=1e-6)

  def test_flags_adapter(self):
    assert augment.augment_config_from_flags(False) is None
    cfg = augment.augment_config_from_flags(True, crop_scale_min=0.5,
                                            strength=0.1)
    assert cfg.crop_scale == (0.5, 1.0) and cfg.brightness == 0.1
