"""Long-video streaming inference: windowed embedding of arbitrary-length
videos with one fixed compiled shape.

The reference handles "arbitrary num_frames" only architecturally (temporal
pos-emb interpolation, reference README.md:168-171): the whole clip still
runs as ONE forward, so a 10-minute video means a giant activation
footprint and a fresh XLA compilation per frame count.  This module adds
the production pattern the reference lacks:

  * the video is cut into fixed-size frame windows (optionally
    overlapping), so every forward reuses one compiled executable and
    bounded HBM;
  * each window yields one clip embedding (CLIP towers) or token features
    (encoder); window embeddings stream out incrementally for early
    results on live feeds;
  * :func:`aggregate` pools window embeddings into a single video-level
    vector (mean of l2-normalized windows, re-normalized — the standard
    long-video retrieval protocol).

Windows batch together (several windows per forward), so long videos also
fill the chip instead of running frame-starved forwards.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def window_frames(
    frames: np.ndarray,          # [T, H, W, 3] (uint8 or float)
    window: int = 16,
    stride: int | None = None,
    pad_final: bool = True,
) -> np.ndarray:
  """[T, H, W, 3] -> [num_windows, window, H, W, 3].

  ``stride`` defaults to ``window`` (non-overlapping); a smaller stride
  gives overlapping windows (temporal smoothing).  The final partial
  window is padded by repeating its last frame (``pad_final=True``) so
  every window has the same compiled shape; with ``pad_final=False``
  trailing frames that don't fill a window are dropped.
  """
  t = frames.shape[0]
  stride = window if stride is None else stride
  if stride <= 0 or window <= 0:
    raise ValueError(f'window={window} and stride={stride} must be > 0')
  starts = list(range(0, t - window + 1, stride))  # full windows only
  if pad_final and (not starts or starts[-1] + window < t):
    starts.append(max(t - window, 0))  # tail window, right-aligned
  if not starts:  # pad_final=False and t < window: nothing to emit
    return np.zeros((0, window) + frames.shape[1:], frames.dtype)

  windows = []
  for s in starts:
    chunk = frames[s:s + window]
    if chunk.shape[0] < window:  # shorter than one window: repeat last
      reps = np.repeat(chunk[-1:], window - chunk.shape[0], axis=0)
      chunk = np.concatenate([chunk, reps], axis=0)
    windows.append(chunk)
  return np.stack(windows, axis=0)


def stream_embeddings(
    embed_fn,                    # [B, window, H, W, 3] -> [B, D]
    frames_iter: Iterator[np.ndarray] | np.ndarray,
    *,
    window: int = 16,
    stride: int | None = None,
    batch_windows: int = 8,
) -> Iterator[np.ndarray]:
  """Yields per-window embeddings [D] as soon as they're computed.

  ``frames_iter`` is either a full [T, H, W, 3] array or an iterator of
  frame chunks (a live feed / sequential decoder); chunks are buffered
  until a window fills.  ``batch_windows`` windows run per forward —
  the last batch is padded to the compiled batch shape and trimmed.
  """
  stride = window if stride is None else stride
  if isinstance(frames_iter, np.ndarray):
    frames_iter = iter([frames_iter])

  buffer: np.ndarray | None = None
  pending: list[np.ndarray] = []
  total = 0      # frames seen so far
  covered = 0    # absolute end index of the last emitted window

  def flush(force: bool = False):
    nonlocal pending
    while len(pending) >= batch_windows or (force and pending):
      batch = pending[:batch_windows]
      pending = pending[batch_windows:]
      n = len(batch)
      if n < batch_windows:  # pad to the compiled shape, trim after
        batch = batch + [batch[-1]] * (batch_windows - n)
      out = np.asarray(embed_fn(np.stack(batch, axis=0)))
      for row in out[:n]:
        yield row

  for chunk in frames_iter:
    chunk = np.asarray(chunk)
    total += chunk.shape[0]
    buffer = chunk if buffer is None else np.concatenate(
        [buffer, chunk], axis=0)
    while buffer.shape[0] >= window:
      pending.append(buffer[:window])
      covered = total - buffer.shape[0] + window
      buffer = buffer[stride:]
    yield from flush()

  # With stride < window the buffer retains already-covered overlap
  # frames; only emit a padded tail window when frames beyond the last
  # window's end actually exist.
  if buffer is not None and buffer.shape[0] > 0 and total > covered:
    reps = np.repeat(buffer[-1:], max(window - buffer.shape[0], 0), axis=0)
    pending.append(np.concatenate([buffer, reps], axis=0)[:window])
  yield from flush(force=True)


def aggregate(window_embeddings: Sequence[np.ndarray] | np.ndarray,
              normalize: bool = True) -> np.ndarray:
  """Mean-pools (l2-normalized) window embeddings into one video vector."""
  emb = np.asarray(window_embeddings, np.float32)
  if normalize:
    emb = emb / np.maximum(
        np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
  pooled = emb.mean(axis=0)
  if normalize:
    pooled = pooled / max(float(np.linalg.norm(pooled)), 1e-12)
  return pooled


def embed_long_video(
    embed_fn,                    # [B, window, H, W, 3] -> [B, D]
    frames: np.ndarray,          # [T, H, W, 3], any T
    *,
    window: int = 16,
    stride: int | None = None,
    batch_windows: int = 8,
    normalize: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
  """Whole-video convenience: returns (video_embedding [D],
  window_embeddings [N, D])."""
  per_window = list(stream_embeddings(
      embed_fn, frames, window=window, stride=stride,
      batch_windows=batch_windows))
  stacked = np.stack(per_window, axis=0)
  return aggregate(stacked, normalize=normalize), stacked


def embed_video_file(
    embed_fn,                    # [B, window, H, W, 3] -> [B, D]
    video_path: str,
    *,
    window: int = 16,
    stride: int | None = None,
    frame_stride: int = 1,
    batch_windows: int = 8,
    target_size: int = 288,
    resize_mode: str = 'center_crop',
    normalize: bool = True,
    backend: str = 'auto',
) -> tuple[np.ndarray, np.ndarray]:
  """File-to-embedding for arbitrarily long videos, constant host memory.

  Frames decode incrementally (:func:`videoprism_tpu.io.video.frame_reader`
  — the native FFmpeg decoder when available) and stream straight into
  windowed forwards; the full video is never materialized on the host.
  ``frame_stride`` subsamples the clip temporally (e.g. 30 fps source,
  ``frame_stride=15`` -> 2 fps windows).  Returns (video_embedding [D],
  window_embeddings [N, D]).
  """
  from videoprism_tpu.io import video as video_io

  reader = video_io.frame_reader(
      video_path, target_size=target_size, resize_mode=resize_mode,
      frame_stride=frame_stride, chunk_frames=window * batch_windows,
      backend=backend)
  per_window = list(stream_embeddings(
      embed_fn, reader, window=window, stride=stride,
      batch_windows=batch_windows))
  if not per_window:
    raise ValueError(f'{video_path}: no frames decoded')
  stacked = np.stack(per_window, axis=0)
  return aggregate(stacked, normalize=normalize), stacked
