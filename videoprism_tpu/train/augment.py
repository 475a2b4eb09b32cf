"""Device-side video augmentation for fine-tuning.

The reference framework is inference-only; this completes the training
tier with the standard contrastive/classification recipe (random resized
crop, horizontal flip, color jitter) as ONE jitted, vmapped transform
over the batched clip tensor:

* runs on device — the host loader stays decode-only, and under a mesh
  the transform is elementwise/vmapped so GSPMD partitions it along the
  batch axis with the step's data sharding (no resharding);
* static shapes — the random crop is expressed as a continuous
  ``jax.image.scale_and_translate`` (output geometry fixed; the sampled
  box only changes ``scale``/``translation`` operands), so one compile
  covers every draw: the TPU-idiomatic form of torchvision's
  ``RandomResizedCrop``;
* temporally consistent — one box / one flip / one jitter per clip,
  applied to all frames.

Composability: augmentation is deliberately NOT threaded through the
train steps.  ``make_augment_fn`` returns a pure ``(key, video) ->
video`` the training loop applies to the batch first, so it composes
unchanged with every step variant (GSPMD / manual-TP / pipeline / FSDP /
LoRA / gradient accumulation — extra leading microbatch axes are folded
in and restored).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
  """Defaults follow the standard video-contrastive recipe.

  Set a knob to its neutral value (``crop=False``, ``flip=False``,
  ``0.0`` strengths) to disable that stage; ``AugmentConfig(crop=False,
  flip=False)`` with zero strengths is the identity.
  """

  crop: bool = True
  crop_scale: tuple[float, float] = (0.3, 1.0)   # area fraction range
  crop_ratio: tuple[float, float] = (3 / 4, 4 / 3)  # aspect (w/h) range
  flip: bool = True                               # horizontal, p=0.5
  brightness: float = 0.2     # factor ~ U[1-b, 1+b]
  contrast: float = 0.2       # factor ~ U[1-c, 1+c] around the clip mean
  saturation: float = 0.2     # factor ~ U[1-s, 1+s] toward per-pixel gray

  def is_identity(self) -> bool:
    return not (self.crop or self.flip or self.brightness
                or self.contrast or self.saturation)


def _sample_boxes(key: Array, batch: int, height: int, width: int,
                  cfg: AugmentConfig) -> tuple[Array, Array, Array, Array]:
  """Samples per-clip crop boxes ``(top, left, crop_h, crop_w)`` (fp32,
  continuous pixel units, always inside the image).

  Aspect is drawn log-uniform like torchvision; instead of its
  rejection-sampling loop (data-dependent control flow), the box is
  clamped to the image — the distribution tails differ slightly at
  extreme aspects but every draw is valid in one pass.
  """
  k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
  area = jax.random.uniform(
      k_area, (batch,), minval=cfg.crop_scale[0], maxval=cfg.crop_scale[1])
  log_r = jax.random.uniform(
      k_ratio, (batch,), minval=jnp.log(cfg.crop_ratio[0]),
      maxval=jnp.log(cfg.crop_ratio[1]))
  ratio = jnp.exp(log_r)
  crop_w = jnp.sqrt(area * height * width * ratio)
  crop_h = jnp.sqrt(area * height * width / ratio)
  crop_w = jnp.clip(crop_w, 1.0, width)
  crop_h = jnp.clip(crop_h, 1.0, height)
  top = jax.random.uniform(k_top, (batch,)) * (height - crop_h)
  left = jax.random.uniform(k_left, (batch,)) * (width - crop_w)
  return top, left, crop_h, crop_w


def _crop_one(video: Array, top: Array, left: Array, crop_h: Array,
              crop_w: Array) -> Array:
  """Resamples one clip ``[T, H, W, C]`` so the (continuous) box fills
  the frame.  ``scale_and_translate`` maps input coordinate ``i`` to
  output ``i * scale + translation``; the box's top-left must land on
  output 0, so ``translation = -top * scale``."""
  t, h, w, c = video.shape
  scale = jnp.stack([h / crop_h, w / crop_w])
  translation = -jnp.stack([top, left]) * scale
  return jax.image.scale_and_translate(
      video, (t, h, w, c), spatial_dims=(1, 2), scale=scale,
      translation=translation, method='linear', antialias=True)


def _color_jitter(key: Array, video: Array, cfg: AugmentConfig) -> Array:
  """Per-clip brightness/contrast/saturation factors, fixed stage order
  (brightness -> contrast -> saturation), output clipped to [0, 1]."""
  b = video.shape[0]
  k_b, k_c, k_s = jax.random.split(key, 3)
  expand = lambda f: f.reshape(b, 1, 1, 1, 1)
  if cfg.brightness:
    f = jax.random.uniform(k_b, (b,), minval=1.0 - cfg.brightness,
                           maxval=1.0 + cfg.brightness)
    video = video * expand(f)
  if cfg.contrast:
    f = jax.random.uniform(k_c, (b,), minval=1.0 - cfg.contrast,
                           maxval=1.0 + cfg.contrast)
    mean = jnp.mean(video, axis=(1, 2, 3, 4), keepdims=True)
    video = (video - mean) * expand(f) + mean
  if cfg.saturation:
    f = jax.random.uniform(k_s, (b,), minval=1.0 - cfg.saturation,
                           maxval=1.0 + cfg.saturation)
    gray = jnp.mean(video, axis=-1, keepdims=True)
    video = (video - gray) * expand(f) + gray
  return jnp.clip(video, 0.0, 1.0)


def augment_clips(key: Array, video: Array, cfg: AugmentConfig) -> Array:
  """Augments ``[B, T, H, W, C]`` float clips in [0, 1]; same shape out."""
  if cfg.is_identity():
    return video
  b, _, h, w, _ = video.shape
  k_box, k_flip, k_color = jax.random.split(key, 3)
  dtype = video.dtype
  video = video.astype(jnp.float32)
  if cfg.crop:
    boxes = _sample_boxes(k_box, b, h, w, cfg)
    video = jax.vmap(_crop_one)(video, *boxes)
  if cfg.flip:
    do = jax.random.bernoulli(k_flip, 0.5, (b,))
    video = jnp.where(do[:, None, None, None, None],
                      video[:, :, :, ::-1, :], video)
  if cfg.brightness or cfg.contrast or cfg.saturation:
    video = _color_jitter(k_color, video, cfg)
  else:
    video = jnp.clip(video, 0.0, 1.0)
  return video.astype(dtype)


def make_augment_fn(cfg: AugmentConfig | None):
  """Returns jitted ``(key, video) -> video`` (or ``None`` for no-op).

  Accepts ``[B, T, H, W, C]`` or, under gradient accumulation,
  ``[accum, B, T, H, W, C]`` — extra leading axes are folded into the
  batch so every microbatch clip draws independent parameters.
  """
  if cfg is None or cfg.is_identity():
    return None

  @jax.jit
  def augment(key: Array, video: Array) -> Array:
    lead = video.shape[:-4]
    flat = video.reshape((-1,) + video.shape[-4:])
    out = augment_clips(key, flat, cfg)
    return out.reshape(lead + video.shape[-4:])

  return augment


def augment_config_from_flags(augment: bool, *, crop_scale_min: float = 0.3,
                              strength: float = 0.2) -> AugmentConfig | None:
  """CLI adapter: ``--augment [--augment-min-scale --augment-strength]``."""
  if not augment:
    return None
  return AugmentConfig(
      crop_scale=(crop_scale_min, 1.0), brightness=strength,
      contrast=strength, saturation=strength)


def mixup(key: Array, videos: Array, labels: Array, num_classes: int,
          alpha: float = 0.2,
          label_smoothing: float = 0.0) -> tuple[Array, Array]:
  """MixUp (Zhang et al. 2018) on a clip batch, device-side.

  Each example blends with a random OTHER example of the same batch:
  ``mix = lam * x_i + (1 - lam) * x_perm[i]`` with per-example
  ``lam ~ Beta(alpha, alpha)``, and the (optionally smoothed) one-hot
  targets blend with the same weights — so the head learns calibrated
  probabilities between classes instead of over-confident spikes.  Runs
  inside the jitted train step (static shapes; one fused elementwise
  pass over the batch).

  Returns ``(mixed_videos, label_probs [B, C])`` — feed the targets to
  :func:`objectives.soft_cross_entropy_loss`.
  """
  if videos.shape[0] != labels.shape[0]:
    raise ValueError(f'{videos.shape[0]} videos vs {labels.shape[0]} labels')
  b = videos.shape[0]
  k_lam, k_perm = jax.random.split(key)
  lam = jax.random.beta(k_lam, alpha, alpha, (b,)).astype(jnp.float32)
  perm = jax.random.permutation(k_perm, b)
  lam_v = lam.reshape((b,) + (1,) * (videos.ndim - 1))
  videos = videos.astype(jnp.float32)
  mixed = lam_v * videos + (1.0 - lam_v) * jnp.take(videos, perm, axis=0)
  onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
  if label_smoothing:
    onehot = ((1.0 - label_smoothing) * onehot
              + label_smoothing / num_classes)
  probs = (lam[:, None] * onehot
           + (1.0 - lam[:, None]) * jnp.take(onehot, perm, axis=0))
  return mixed, probs
