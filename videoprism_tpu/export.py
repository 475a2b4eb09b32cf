"""Ahead-of-time model export via ``jax.export`` (StableHLO artifacts).

The reference repo serves models by importing the Python model code and
re-tracing on every process start (videoprism/models.py:268-303 +
``jax.jit`` at call sites).  On TPU the idiomatic production path is to
compile ONCE and ship the lowered program: ``jax.export`` serializes a
jitted forward to a versioned StableHLO artifact that any process can load
and run **without the model-building Python** — only the checkpoint (plain
npz/safetensors) and ~40 KB of artifact travel to the serving fleet.

Design choices (TPU-first):

* **Weights stay out of the artifact.**  The exported function takes the
  param pytree as an argument, so one artifact serves every fine-tune /
  quantization of the same architecture, and the artifact is tiny.
* **Symbolic batch dimension** (``jax.export.symbolic_shape``): one
  artifact covers every batch size; XLA specializes per concrete shape at
  call time exactly as a jit re-trace would, but from the serialized
  StableHLO, with no Python tracing in the serving process.
* **Per-tower entry points for CLIP**: retrieval fleets scale the video
  and text towers independently, so ``tower='video'`` / ``'text'`` export
  each as its own artifact (mirroring the reference's None-modality calls,
  videoprism/encoders.py:783-910).

Multi-platform notes: ``platforms=('tpu', 'cpu')`` produces one artifact
loadable on both, but the Pallas kernels are TPU-only Mosaic custom calls —
multi-platform exports must be built from a model with
``attention_impl='xla'`` (the bit-parity path).  Single-platform TPU
exports may keep the fused kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models.registry import (
    BoundModel,
    Model,
    native_clip_geometry,
)

TOWERS = ('video', 'text')


@dataclasses.dataclass
class ExportedForward:
  """A serialized-or-serializable compiled forward.

  Callable with ``(params, *inputs)`` where inputs match the exported
  entry point: ``(video,)`` for encoder/classifier/CLIP-video,
  ``(text_ids, text_paddings)`` for CLIP-text.
  """

  exported: jax_export.Exported

  def __call__(self, params: Any, *inputs):
    return self.exported.call(Model._unwrap(params), *inputs)

  @property
  def platforms(self) -> tuple[str, ...]:
    return tuple(self.exported.platforms)

  @property
  def in_avals(self):
    return self.exported.in_avals

  def serialize(self) -> bytes:
    return bytes(self.exported.serialize())

  def save(self, path: str) -> None:
    with open(path, 'wb') as f:
      f.write(self.serialize())

  @classmethod
  def deserialize(cls, blob: bytes) -> 'ExportedForward':
    return cls(jax_export.deserialize(bytearray(blob)))

  @classmethod
  def load(cls, path: str) -> 'ExportedForward':
    with open(path, 'rb') as f:
      return cls.deserialize(f.read())


def _param_specs(params: Any):
  return jax.tree.map(
      lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), params)


def _batch_dim(batch: int | str | None):
  """Concrete int, or a fresh symbolic dimension for str/None."""
  if isinstance(batch, int):
    if batch < 1:
      raise ValueError(f'batch must be >= 1, got {batch}')
    return batch
  (b,) = jax_export.symbolic_shape(batch or 'b')
  return b


def _forward_and_specs(
    model: Model,
    *,
    batch,
    num_frames: int | None,
    frame_size: int | None,
    text_len: int,
    tower: str,
    input_dtype,
):
  """Builds (pure_fn, input_specs) for the model family / tower."""
  cfg = model.config
  b = _batch_dim(batch)

  def video_spec(enc_cfg):
    nt, ns = native_clip_geometry(enc_cfg)
    t = num_frames if num_frames is not None else nt
    s = frame_size if frame_size is not None else ns
    return jax.ShapeDtypeStruct((b, t, s, s, 3), input_dtype)

  if isinstance(cfg, fe.FactorizedEncoderConfig):
    def fn(params, video):
      emb, _ = fe.apply(params, video, cfg, train=False)
      return emb
    return fn, (video_spec(cfg),)

  if isinstance(cfg, vc.VideoClassifierConfig):
    def fn(params, video):
      logits, _ = vc.apply(params, video, cfg, train=False)
      return logits
    return fn, (video_spec(cfg.encoder),)

  if isinstance(cfg, vclip.VideoCLIPConfig):
    if tower == 'video':
      def fn(params, video):
        video_emb, _, _ = vclip.apply(params, video, None, None, cfg,
                                      train=False)
        return video_emb
      return fn, (video_spec(cfg.vision_config()),)
    if tower == 'text':
      def fn(params, ids, paddings):
        _, text_emb, _ = vclip.apply(params, None, ids, paddings, cfg,
                                     train=False)
        return text_emb
      return fn, (jax.ShapeDtypeStruct((b, text_len), jnp.int32),
                  jax.ShapeDtypeStruct((b, text_len), jnp.float32))
    raise ValueError(f'tower must be one of {TOWERS} for CLIP models, '
                     f'got {tower!r}')

  raise TypeError(f'unsupported model config type: {type(cfg).__name__}')


def export_forward(
    model: Model | BoundModel,
    params: Any | None = None,
    *,
    batch: int | str | None = None,
    num_frames: int | None = None,
    frame_size: int | None = None,
    text_len: int = 64,
    tower: str = 'video',
    input_dtype=jnp.float32,
    platforms: Sequence[str] | None = None,
) -> ExportedForward:
  """Exports a compiled inference forward as a portable artifact.

  Args:
    model: a registry :class:`Model`, or a :class:`BoundModel` (in which
      case ``params`` is taken from it).
    params: param pytree (or ``{'params': ...}`` checkpoint wrapper) used
      only for its shapes/dtypes — the weights are NOT baked in.
    batch: concrete int for a fixed-batch artifact, or a dim name
      (default ``'b'``) for a symbolic batch that serves any size.
    num_frames / frame_size: clip geometry; default to the config's native
      ``pos_emb_shape`` geometry.
    text_len: token length for the CLIP text tower (reference
      TEXT_MAX_LEN=64, videoprism/models.py:51).
    tower: ``'video'`` or ``'text'`` — which CLIP tower to export
      (ignored for encoder/classifier models).
    input_dtype: video input dtype (``float32``; ``uint8`` ingestion
      normalizes host-side in serving, not here).
    platforms: lowering platforms, e.g. ``('tpu',)`` (default: current
      backend) or ``('tpu', 'cpu')`` for a multi-platform artifact —
      requires the XLA attention path, see module docstring.

  Returns:
    :class:`ExportedForward`; call ``.serialize()`` / ``.save(path)``.
  """
  if isinstance(model, BoundModel):
    params = model.params if params is None else params
    model = model.model
  if params is None:
    raise ValueError('params required (shapes/dtypes define the artifact '
                     'signature); pass a checkpoint tree or a BoundModel')
  params = Model._unwrap(params)

  if (platforms is not None and len(set(platforms)) > 1
      and getattr(model.config, 'attention_impl', 'xla') not in (None, 'xla')):
    raise ValueError(
        'multi-platform export requires the XLA attention path; rebuild '
        "the model with attention_impl='xla' (Pallas kernels are TPU-only "
        'Mosaic custom calls)')

  fn, input_specs = _forward_and_specs(
      model, batch=batch, num_frames=num_frames, frame_size=frame_size,
      text_len=text_len, tower=tower, input_dtype=input_dtype)
  exported = jax_export.export(
      jax.jit(fn), platforms=tuple(platforms) if platforms else None)(
          _param_specs(params), *input_specs)
  return ExportedForward(exported)
