"""Video loading and preprocessing.

Host side: OpenCV decode + uniform frame sampling with the exact semantics of
the reference loader (reference videoprism/video_utils.py:20-152) — BGR→RGB,
shortest-side resize + center crop (or plain resize), [0, 1] float32.

Device side: :func:`preprocess_frames` is a jit-able JAX pipeline
(resize/crop/normalize on-device) so production serving can ship compact
uint8 frames over PCIe and do the float math on the TPU, where it fuses into
the patch projection.  :class:`VideoPrefetcher` double-buffers host decode
against device compute with async ``device_put``.
"""

from __future__ import annotations

import collections
import concurrent.futures
from collections.abc import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def load_video(
    video_path: str,
    num_frames: int = 16,
    target_size: int = 288,
    resize_mode: str = 'center_crop',
    as_uint8: bool = False,
    backend: str = 'auto',
) -> np.ndarray:
  """Loads [num_frames, S, S, 3] RGB from a video file.

  Returns float32 in [0, 1] by default (the reference contract); with
  ``as_uint8`` the raw bytes are returned instead — 4x less host->device
  traffic, with the /255 normalization done on-device
  (:func:`preprocess_frames`, or automatically by ``EmbeddingService``).

  Frame indices are sampled uniformly with ``np.linspace`` over the full
  clip, matching reference videoprism/video_utils.py:20-94.

  ``backend``: 'ffmpeg' uses the native C++ decoder (single sequential
  decode pass, no per-frame container seeks — see
  native/video_decoder.cc); 'opencv' the reference-mirroring cv2 loop;
  'auto' prefers ffmpeg and falls back.
  """
  if backend not in ('auto', 'ffmpeg', 'opencv'):
    raise ValueError(f'unknown backend {backend!r}')
  if backend in ('auto', 'ffmpeg'):
    try:
      return _load_video_native(video_path, num_frames, target_size,
                                resize_mode, as_uint8)
    except RuntimeError:
      # Library unavailable (no toolchain / FFmpeg dev libs) or a
      # NativeDecodeError (this FFmpeg build can't open/fully decode the
      # stream): fall back to OpenCV, which may have other codec plugins.
      # Semantic errors (too-few-frames ValueError) propagate.
      if backend == 'ffmpeg':
        raise
  try:
    import cv2  # pytype: disable=import-error
  except ImportError as e:
    raise ImportError(
        'OpenCV is required for video loading. '
        'Install it with: pip install opencv-python') from e

  cap = cv2.VideoCapture(video_path)
  if not cap.isOpened():
    raise ValueError(f'Could not open video file: {video_path}')

  total_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
  if total_frames < num_frames:
    cap.release()
    raise ValueError(
        f'Video has only {total_frames} frames, but {num_frames} requested')

  frame_indices = np.linspace(0, total_frames - 1, num_frames, dtype=int)

  frames = []
  for frame_idx in frame_indices:
    cap.set(cv2.CAP_PROP_POS_FRAMES, frame_idx)
    ret, frame = cap.read()
    if not ret:
      cap.release()
      raise ValueError(f'Could not read frame {frame_idx} from {video_path}')
    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    if resize_mode == 'center_crop':
      frame = _center_crop_resize(frame, target_size)
    elif resize_mode == 'resize':
      frame = cv2.resize(frame, (target_size, target_size))
    else:
      raise ValueError(f'Unknown resize_mode: {resize_mode}')
    frames.append(frame)

  cap.release()
  stacked = np.stack(frames, axis=0)
  if as_uint8:
    return stacked.astype(np.uint8)
  return stacked.astype(np.float32) / 255.0


def _load_video_native(
    video_path: str,
    num_frames: int,
    target_size: int,
    resize_mode: str,
    as_uint8: bool,
) -> np.ndarray:
  """FFmpeg path: one sequential decode pass, convert-on-keep."""
  from videoprism_tpu import native

  if resize_mode not in ('center_crop', 'resize'):
    raise ValueError(f'Unknown resize_mode: {resize_mode}')
  with native.NativeVideoDecoder(video_path) as dec:
    total_frames = dec.num_frames
    if total_frames < num_frames:
      raise ValueError(
          f'Video has only {total_frames} frames, but {num_frames} '
          f'requested')
    indices = np.linspace(0, total_frames - 1, num_frames, dtype=np.int64)
    frames = dec.sample(indices, target_size, resize_mode)
  if as_uint8:
    return frames
  return frames.astype(np.float32) / 255.0


def multi_view_indices(total_frames: int, num_frames: int,
                       temporal_views: int) -> np.ndarray:
  """[V, T] frame indices for multi-clip evaluation.

  View ``v`` samples ``num_frames`` uniformly (``np.linspace``) within its
  ``1/V`` window of the clip; with ``temporal_views=1`` this reduces
  exactly to the single-view :func:`load_video` sampling.
  """
  if temporal_views < 1 or num_frames < 1:
    raise ValueError(f'temporal_views={temporal_views} and '
                     f'num_frames={num_frames} must be >= 1')
  if total_frames < temporal_views:
    # A window narrower than one frame would make np.linspace run
    # BACKWARDS (hi < lo) and sample outside the window.
    raise ValueError(
        f'video has {total_frames} frames — too few for '
        f'{temporal_views} temporal views (need >= 1 frame per window)')
  views = np.empty((temporal_views, num_frames), np.int64)
  for v in range(temporal_views):
    lo = v * total_frames / temporal_views
    hi = (v + 1) * total_frames / temporal_views - 1
    views[v] = np.linspace(lo, hi, num_frames).astype(np.int64)
  return views


def spatial_crop_fracs(spatial_views: int) -> np.ndarray:
  """Fractional crop offsets along the longer side: 1 view == the center
  crop; M views span [left/top, ..., right/bottom] uniformly (M=3 is the
  standard 3-crop protocol)."""
  if spatial_views < 1:
    raise ValueError(f'spatial_views must be >= 1, got {spatial_views}')
  if spatial_views == 1:
    return np.array([0.5], np.float64)
  return np.linspace(0.0, 1.0, spatial_views)


def load_video_views(
    video_path: str,
    num_frames: int = 16,
    target_size: int = 288,
    *,
    temporal_views: int = 1,
    spatial_views: int = 1,
    as_uint8: bool = False,
    backend: str = 'auto',
) -> np.ndarray:
  """Loads ``[temporal_views * spatial_views, num_frames, S, S, 3]`` views.

  The standard multi-view evaluation protocol (ViViT-style NxM views):
  N temporal clips sampled from equal windows of the video x M spatial
  crops along the longer side of the shortest-side-resized frame; the
  caller averages per-view logits/embeddings.  With ``1, 1`` this equals
  ``load_video(...)[None]`` exactly.

  Views are ordered temporal-major: ``view[t * M + s]`` is temporal
  window ``t`` with spatial crop ``s``.  Frames shared between temporal
  views are decoded and resized once; each spatial crop is a copy of the
  same resized frame (one ``sws_scale``/``cv2.resize`` per distinct
  frame regardless of M).
  """
  if backend not in ('auto', 'ffmpeg', 'opencv'):
    raise ValueError(f'unknown backend {backend!r}')
  fracs = spatial_crop_fracs(spatial_views)
  if backend in ('auto', 'ffmpeg'):
    try:
      return _load_video_views_native(
          video_path, num_frames, target_size, temporal_views, fracs,
          as_uint8)
    except RuntimeError:
      if backend == 'ffmpeg':
        raise
  import cv2  # pytype: disable=import-error

  cap = cv2.VideoCapture(video_path)
  if not cap.isOpened():
    raise ValueError(f'Could not open video file: {video_path}')
  try:
    total_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total_frames < num_frames:
      raise ValueError(
          f'Video has only {total_frames} frames, but {num_frames} '
          f'requested')
    views_idx = multi_view_indices(total_frames, num_frames, temporal_views)
    uniq = np.unique(views_idx)
    decoded = []
    for frame_idx in uniq:
      cap.set(cv2.CAP_PROP_POS_FRAMES, int(frame_idx))
      ret, frame = cap.read()
      if not ret:
        raise ValueError(
            f'Could not read frame {frame_idx} from {video_path}')
      frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
      resized = _shortest_side_resize(frame, target_size)
      decoded.append(_fractional_crops(resized, target_size, fracs))
  finally:
    cap.release()
  return _gather_views(np.stack(decoded, axis=0), uniq, views_idx, as_uint8)


def _load_video_views_native(
    video_path: str,
    num_frames: int,
    target_size: int,
    temporal_views: int,
    fracs: np.ndarray,
    as_uint8: bool,
) -> np.ndarray:
  from videoprism_tpu import native

  with native.NativeVideoDecoder(video_path) as dec:
    total_frames = dec.num_frames
    if total_frames < num_frames:
      raise ValueError(
          f'Video has only {total_frames} frames, but {num_frames} '
          f'requested')
    views_idx = multi_view_indices(total_frames, num_frames, temporal_views)
    uniq = np.unique(views_idx)
    decoded = dec.sample_crops(uniq, target_size, fracs)  # [U, M, S, S, 3]
  return _gather_views(decoded, uniq, views_idx, as_uint8)


def _gather_views(decoded: np.ndarray, uniq: np.ndarray,
                  views_idx: np.ndarray, as_uint8: bool) -> np.ndarray:
  """[U, M, S, S, 3] distinct frames -> [V*M, T, S, S, 3] ordered views."""
  pos = np.searchsorted(uniq, views_idx)          # [V, T]
  out = decoded[pos]                              # [V, T, M, S, S, 3]
  out = np.moveaxis(out, 2, 1)                    # [V, M, T, S, S, 3]
  v, m, t = out.shape[:3]
  out = np.ascontiguousarray(out.reshape(v * m, t, *out.shape[3:]))
  if as_uint8:
    return out
  return out.astype(np.float32) / 255.0


def _shortest_side_resize(frame: np.ndarray, target_size: int) -> np.ndarray:
  import cv2  # pytype: disable=import-error

  h, w = frame.shape[:2]
  if h < w:
    new_h, new_w = target_size, int(w * (target_size / h))
  else:
    new_w, new_h = target_size, int(h * (target_size / w))
  return cv2.resize(frame, (new_w, new_h))


def _fractional_crops(frame: np.ndarray, target_size: int,
                      fracs: np.ndarray) -> np.ndarray:
  """[M, S, S, 3] crops of a resized frame at fractional offsets along the
  longer side (truncating arithmetic — 0.5 == the center crop exactly)."""
  h, w = frame.shape[:2]
  outs = []
  for f in fracs:
    y = int((h - target_size) * f)
    x = int((w - target_size) * f)
    outs.append(frame[y:y + target_size, x:x + target_size])
  return np.stack(outs, axis=0)


def frame_reader(
    video_path: str,
    *,
    target_size: int = 288,
    resize_mode: str = 'center_crop',
    frame_stride: int = 1,
    chunk_frames: int = 128,
    backend: str = 'auto',
) -> Iterator[np.ndarray]:
  """Yields uint8 RGB [<=chunk_frames, S, S, 3] chunks sequentially.

  Reads every ``frame_stride``-th frame of the whole clip without ever
  materializing the full video — the long-video input path for
  :func:`videoprism_tpu.streaming.embed_video_file` (a 10-minute 30 fps
  clip at 288^2 is ~4.5 GB decoded; chunks stay ~30 MB).  Prefers the
  native FFmpeg decoder (sequential decode, PTS-indexed) and falls back
  to an OpenCV read loop.
  """
  # Validate eagerly (this is a plain function returning a generator, so
  # bad arguments raise at the call site, not at the first next()).
  if frame_stride <= 0 or chunk_frames <= 0:
    raise ValueError(f'frame_stride={frame_stride} and '
                     f'chunk_frames={chunk_frames} must be > 0')
  if backend not in ('auto', 'ffmpeg', 'opencv'):
    raise ValueError(f'unknown backend {backend!r}')
  if resize_mode not in ('center_crop', 'resize'):
    raise ValueError(f'Unknown resize_mode: {resize_mode}')
  return _frame_reader_gen(video_path, target_size, resize_mode,
                           frame_stride, chunk_frames, backend)


def probe_frame_count(video_path: str, *, frame_stride: int = 1,
                      backend: str = 'auto') -> int | None:
  """Frames :func:`frame_reader` will yield for this file, from container
  metadata only (no decode) — or ``None`` when the container carries no
  usable count (the long-video sweeps then report progress without a
  total).  Counts AFTER ``frame_stride`` subsampling, matching the
  reader's emission."""
  if frame_stride <= 0:
    raise ValueError(f'frame_stride={frame_stride} must be > 0')
  total = None
  if backend in ('auto', 'ffmpeg'):
    try:
      from videoprism_tpu import native

      dec = native.NativeVideoDecoder(video_path)
      try:
        if dec.num_frames > 0 and dec.fps > 0:
          total = int(dec.num_frames)
      finally:
        dec.close()
    except RuntimeError:
      if backend == 'ffmpeg':
        return None
  if total is None and backend in ('auto', 'opencv'):
    try:
      import cv2  # pytype: disable=import-error

      cap = cv2.VideoCapture(video_path)
      try:
        if cap.isOpened():
          n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
          if n > 0:
            total = n
      finally:
        cap.release()
    except ImportError:
      pass
  if total is None:
    return None
  return len(range(0, total, frame_stride))


def _frame_reader_gen(video_path, target_size, resize_mode, frame_stride,
                      chunk_frames, backend) -> Iterator[np.ndarray]:
  if backend in ('auto', 'ffmpeg'):
    # Fall back to OpenCV only on OPEN/metadata failures; once native
    # decoding has started (frames yielded), errors propagate — silently
    # restarting with cv2 would duplicate already-yielded frames.
    dec = None
    try:
      from videoprism_tpu import native

      dec = native.NativeVideoDecoder(video_path)
      # Repeated sample() calls rely on PTS-derived frame indexing; a
      # stream without a usable rate can't support it.
      if dec.num_frames <= 0 or dec.fps <= 0:
        dec.close()
        dec = None
        if backend == 'ffmpeg':
          raise RuntimeError(
              f'{video_path}: no frame count/fps metadata; sequential '
              f'chunked reads need PTS indexing')
    except RuntimeError:
      if backend == 'ffmpeg':
        raise
      dec = None
    if dec is not None:
      try:
        indices = np.arange(0, dec.num_frames, frame_stride,
                            dtype=np.int64)
        for start in range(0, len(indices), chunk_frames):
          yield dec.sample(indices[start:start + chunk_frames],
                           target_size, resize_mode)
        return
      finally:
        dec.close()

  import cv2  # pytype: disable=import-error

  cap = cv2.VideoCapture(video_path)
  if not cap.isOpened():
    raise ValueError(f'Could not open video file: {video_path}')
  try:
    chunk: list[np.ndarray] = []
    idx = 0
    while True:
      ret, frame = cap.read()
      if not ret:
        break
      if idx % frame_stride == 0:
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if resize_mode == 'center_crop':
          frame = _center_crop_resize(frame, target_size)
        elif resize_mode == 'resize':
          frame = cv2.resize(frame, (target_size, target_size))
        else:
          raise ValueError(f'Unknown resize_mode: {resize_mode}')
        chunk.append(frame.astype(np.uint8))
        if len(chunk) == chunk_frames:
          yield np.stack(chunk, axis=0)
          chunk = []
      idx += 1
    if chunk:
      yield np.stack(chunk, axis=0)
  finally:
    cap.release()


def _center_crop_resize(frame: np.ndarray, target_size: int) -> np.ndarray:
  """Shortest side -> target_size, then center crop (reference
  videoprism/video_utils.py:97-127)."""
  resized = _shortest_side_resize(frame, target_size)
  return _fractional_crops(resized, target_size,
                           np.array([0.5], np.float64))[0]


def load_video_batch(
    video_paths: list[str],
    num_frames: int = 16,
    target_size: int = 288,
    resize_mode: str = 'center_crop',
    num_workers: int = 0,
    backend: str = 'auto',
) -> np.ndarray:
  """Loads [B, T, S, S, 3] from multiple files, optionally decoding in a
  thread pool (both the native decoder and OpenCV release the GIL).

  Reference: videoprism/video_utils.py:130-152 (sequential only there).
  """
  load = lambda p: load_video(p, num_frames, target_size, resize_mode,
                              backend=backend)
  if num_workers and len(video_paths) > 1:
    with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
      videos = list(pool.map(load, video_paths))
  else:
    videos = [load(p) for p in video_paths]
  return np.stack(videos, axis=0)


def preprocess_frames(
    frames: jax.Array,
    target_size: int = 288,
    resize_mode: str = 'center_crop',
    dtype=jnp.float32,
) -> jax.Array:
  """Device-side preprocessing: uint8/float [..., H, W, 3] -> [0,1] frames.

  jit-able; fuses into the model when composed under one ``jax.jit``.  The
  resize matches the reference host path semantically (shortest-side resize
  + center crop) but uses ``jax.image.resize`` bilinear filtering on-device.
  """
  if frames.dtype == jnp.uint8:
    frames = frames.astype(dtype) / 255.0
  else:
    frames = frames.astype(dtype)

  h, w = frames.shape[-3], frames.shape[-2]
  if (h, w) == (target_size, target_size):
    return frames

  batch_shape = frames.shape[:-3]
  if resize_mode == 'center_crop':
    if h < w:
      new_h, new_w = target_size, int(w * (target_size / h))
    else:
      new_h, new_w = int(h * (target_size / w)), target_size
  elif resize_mode == 'resize':
    new_h = new_w = target_size
  else:
    raise ValueError(f'Unknown resize_mode: {resize_mode}')

  frames = jax.image.resize(
      frames, batch_shape + (new_h, new_w, 3), method='bilinear')
  start_y = (new_h - target_size) // 2
  start_x = (new_w - target_size) // 2
  return jax.lax.slice_in_dim(
      jax.lax.slice_in_dim(frames, start_y, start_y + target_size, axis=-3),
      start_x, start_x + target_size, axis=-2)


class VideoPrefetcher:
  """Overlaps host video decode with device compute.

  Decodes clips in a background thread pool and eagerly ``device_put``s the
  next batches (optionally with a sharding) so the accelerator never waits
  on the host.  The reference has no equivalent — its demos block on OpenCV
  between forwards.
  """

  def __init__(
      self,
      video_paths: Sequence[str],
      batch_size: int,
      num_frames: int = 16,
      target_size: int = 288,
      resize_mode: str = 'center_crop',
      prefetch_depth: int = 2,
      num_workers: int = 4,
      sharding=None,
  ):
    self._paths = list(video_paths)
    self._batch_size = batch_size
    self._load = lambda batch: load_video_batch(
        batch, num_frames, target_size, resize_mode, num_workers=num_workers)
    self._prefetch_depth = prefetch_depth
    self._sharding = sharding

  def _batches(self) -> Iterator[list[str]]:
    for i in range(0, len(self._paths), self._batch_size):
      yield self._paths[i:i + self._batch_size]

  def __iter__(self) -> Iterator[jax.Array]:
    queue = collections.deque()
    batches = self._batches()
    # Per-iteration pool (not __init__): each pass owns and releases its
    # decode thread, and the prefetcher stays re-iterable.
    pool = concurrent.futures.ThreadPoolExecutor(1)

    def submit(paths):
      queue.append(pool.submit(self._load, paths))

    # try/finally: release the decode thread when the iterator is
    # dropped or exhausted (repeatedly iterating prefetchers would
    # otherwise accumulate idle pools).
    try:
      for _ in range(self._prefetch_depth):
        paths = next(batches, None)
        if paths is None:
          break
        submit(paths)

      while queue:
        host_batch = queue.popleft().result()
        paths = next(batches, None)
        if paths is not None:
          submit(paths)
        if self._sharding is not None:
          yield jax.device_put(host_batch, self._sharding)
        else:
          yield jax.device_put(host_batch)
    finally:
      pool.shutdown(wait=False, cancel_futures=True)
