"""Native (C++) runtime tier: ctypes bindings with build-on-demand.

The compute path is JAX/XLA/Pallas; this tier covers the host-side hot
loops the reference delegated to C++ wheels (SentencePiece).  The shared
library is compiled on first use with the system ``g++`` and cached next to
the sources; every native component has a pure-Python fallback, so the
framework works (slower) on machines with no toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, 'libvp_tokenizer.so')
_SRC_PATH = os.path.join(_HERE, 'unigram_tokenizer.cc')
_BUILD_LOCK = threading.Lock()
_lib = None
_lib_error: str | None = None


def _build() -> None:
  cmd = ['g++', '-O3', '-fPIC', '-shared', '-std=c++17',
         '-o', _LIB_PATH, _SRC_PATH]
  subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_tokenizer_lib() -> ctypes.CDLL | None:
  """Returns the tokenizer CDLL, building it if needed; None on failure."""
  global _lib, _lib_error
  if _lib is not None or _lib_error is not None:
    return _lib
  with _BUILD_LOCK:
    if _lib is not None or _lib_error is not None:
      return _lib
    try:
      if (not os.path.exists(_LIB_PATH)
          or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)):
        _build()
      lib = ctypes.CDLL(_LIB_PATH)
      lib.vp_tokenizer_create.restype = ctypes.c_void_p
      lib.vp_tokenizer_create.argtypes = [
          ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
          ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
          ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
      ]
      lib.vp_tokenizer_destroy.restype = None
      lib.vp_tokenizer_destroy.argtypes = [ctypes.c_void_p]
      lib.vp_tokenizer_encode.restype = ctypes.c_int32
      lib.vp_tokenizer_encode.argtypes = [
          ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
          ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
      ]
      _lib = lib
    except (subprocess.CalledProcessError, OSError) as e:
      _lib_error = str(e)
  return _lib


_VIDEO_LIB_PATH = os.path.join(_HERE, 'libvp_video.so')
_VIDEO_SRC_PATH = os.path.join(_HERE, 'video_decoder.cc')
_video_lib = None
_video_lib_error: str | None = None


def _build_video() -> None:
  cmd = ['g++', '-O3', '-fPIC', '-shared', '-std=c++17',
         '-o', _VIDEO_LIB_PATH, _VIDEO_SRC_PATH,
         '-lavformat', '-lavcodec', '-lavutil', '-lswscale']
  subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_video_lib() -> ctypes.CDLL | None:
  """Returns the FFmpeg decoder CDLL, building on first use; None when the
  toolchain or the FFmpeg dev libraries are absent (callers fall back to
  the OpenCV path in io/video.py)."""
  global _video_lib, _video_lib_error
  if _video_lib is not None or _video_lib_error is not None:
    return _video_lib
  with _BUILD_LOCK:
    if _video_lib is not None or _video_lib_error is not None:
      return _video_lib
    try:
      if (not os.path.exists(_VIDEO_LIB_PATH)
          or os.path.getmtime(_VIDEO_LIB_PATH)
          < os.path.getmtime(_VIDEO_SRC_PATH)):
        _build_video()
      lib = ctypes.CDLL(_VIDEO_LIB_PATH)
      lib.vp_decoder_open.restype = ctypes.c_void_p
      lib.vp_decoder_open.argtypes = [
          ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
      lib.vp_decoder_info.restype = ctypes.c_int
      lib.vp_decoder_info.argtypes = [
          ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
          ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
          ctypes.POINTER(ctypes.c_double)]
      lib.vp_decoder_sample.restype = ctypes.c_int
      lib.vp_decoder_sample.argtypes = [
          ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
          ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
      lib.vp_decoder_sample_crops.restype = ctypes.c_int
      lib.vp_decoder_sample_crops.argtypes = [
          ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
          ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
          ctypes.POINTER(ctypes.c_double), ctypes.c_int]
      lib.vp_decoder_close.restype = None
      lib.vp_decoder_close.argtypes = [ctypes.c_void_p]
      _video_lib = lib
    except (subprocess.CalledProcessError, OSError) as e:
      _video_lib_error = getattr(e, 'stderr', None) or str(e)
  return _video_lib


def video_lib_error() -> str | None:
  return _video_lib_error


_ANN_LIB_PATH = os.path.join(_HERE, 'libvp_ann.so')
_ANN_SRC_PATH = os.path.join(_HERE, 'ann_index.cc')
_ann_lib = None
_ann_lib_error: str | None = None


def _build_ann() -> None:
  # -ffast-math: the only float math here is inner products; reassociation
  # lets the hot dot product vectorize (measured 3x on graph build).
  cmd = ['g++', '-O3', '-ffast-math', '-fPIC', '-shared', '-std=c++17',
         '-o', _ANN_LIB_PATH, _ANN_SRC_PATH]
  subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_ann_lib() -> ctypes.CDLL | None:
  """Returns the HNSW index CDLL, building on first use; None when the
  toolchain is absent (retrieval.ANNVideoIndex falls back to the exact
  brute-force sweep)."""
  global _ann_lib, _ann_lib_error
  if _ann_lib is not None or _ann_lib_error is not None:
    return _ann_lib
  with _BUILD_LOCK:
    if _ann_lib is not None or _ann_lib_error is not None:
      return _ann_lib
    try:
      if (not os.path.exists(_ANN_LIB_PATH)
          or os.path.getmtime(_ANN_LIB_PATH)
          < os.path.getmtime(_ANN_SRC_PATH)):
        _build_ann()
      lib = ctypes.CDLL(_ANN_LIB_PATH)
      lib.vp_ann_create.restype = ctypes.c_void_p
      lib.vp_ann_create.argtypes = [
          ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
      lib.vp_ann_destroy.restype = None
      lib.vp_ann_destroy.argtypes = [ctypes.c_void_p]
      lib.vp_ann_size.restype = ctypes.c_int64
      lib.vp_ann_size.argtypes = [ctypes.c_void_p]
      lib.vp_ann_dim.restype = ctypes.c_int
      lib.vp_ann_dim.argtypes = [ctypes.c_void_p]
      lib.vp_ann_add.restype = ctypes.c_int
      lib.vp_ann_add.argtypes = [
          ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
      lib.vp_ann_search.restype = ctypes.c_int
      lib.vp_ann_search.argtypes = [
          ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
          ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
          ctypes.POINTER(ctypes.c_float)]
      lib.vp_ann_search_filtered.restype = ctypes.c_int
      lib.vp_ann_search_filtered.argtypes = [
          ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
          ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
          ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
          ctypes.POINTER(ctypes.c_float)]
      lib.vp_ann_save.restype = ctypes.c_int
      lib.vp_ann_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
      lib.vp_ann_load.restype = ctypes.c_void_p
      lib.vp_ann_load.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
      _ann_lib = lib
    except (subprocess.CalledProcessError, OSError) as e:
      _ann_lib_error = getattr(e, 'stderr', None) or str(e)
  return _ann_lib


def ann_lib_error() -> str | None:
  return _ann_lib_error


class NativeDecodeError(RuntimeError):
  """The native decoder could not open or fully decode this stream.

  Subclasses RuntimeError (not ValueError) so ``backend='auto'`` callers
  can fall back to another backend on decoder limitations while
  backend-independent semantic errors (e.g. too-few-frames ValueError)
  still propagate.
  """


class NativeVideoDecoder:
  """Sequential-decode FFmpeg reader (see video_decoder.cc).

  Raises ``RuntimeError`` at construction when the native library is
  unavailable — ``io/video.py`` keeps the OpenCV path as fallback.
  """

  def __init__(self, path: str):
    import numpy as np

    lib = load_video_lib()
    if lib is None:
      raise RuntimeError(f'native video decoder unavailable: '
                         f'{_video_lib_error}')
    self._lib = lib
    self._np = np
    err = ctypes.create_string_buffer(256)
    self._handle = lib.vp_decoder_open(path.encode(), err, 256)
    if not self._handle:
      raise NativeDecodeError(err.value.decode() or
                              f'could not open {path}')
    nf = ctypes.c_int64()
    w = ctypes.c_int()
    h = ctypes.c_int()
    fps = ctypes.c_double()
    lib.vp_decoder_info(self._handle, ctypes.byref(nf), ctypes.byref(w),
                        ctypes.byref(h), ctypes.byref(fps))
    self.num_frames = nf.value
    self.width = w.value
    self.height = h.value
    self.fps = fps.value

  def sample(self, indices, target_size: int,
             resize_mode: str = 'center_crop'):
    """Decodes the (sorted) frame indices -> uint8 [n, S, S, 3] RGB."""
    np = self._np
    if resize_mode not in ('center_crop', 'resize'):
      raise ValueError(f'Unknown resize_mode: {resize_mode}')
    idx = np.asarray(indices, np.int64)
    # Not an assert: under `python -O` unsorted indices would silently
    # skip frames and surface as a misleading 'stream ended early' error.
    if not (np.diff(idx) >= 0).all():
      raise ValueError('indices must be sorted (non-decreasing)')
    n = len(idx)
    out = np.empty((n, target_size, target_size, 3), np.uint8)
    mode = {'center_crop': 0, 'resize': 1}[resize_mode]
    written = self._lib.vp_decoder_sample(
        self._handle,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        target_size, mode)
    if written != n:
      raise NativeDecodeError(
          f'decoded only {written}/{n} requested frames (stream ended '
          f'early; container frame count was {self.num_frames})')
    return out

  def sample_crops(self, indices, target_size: int, crop_fracs):
    """Multi-crop sampling for multi-view evaluation: decodes the (sorted)
    frame indices once and emits ``len(crop_fracs)`` crops per frame along
    the longer side of the shortest-side-resized frame, at fractional
    offsets in [0, 1] (0.5 == center) -> uint8 [n, C, S, S, 3] RGB."""
    np = self._np
    idx = np.asarray(indices, np.int64)
    if not (np.diff(idx) >= 0).all():
      raise ValueError('indices must be sorted (non-decreasing)')
    fracs = np.asarray(crop_fracs, np.float64)
    if fracs.ndim != 1 or len(fracs) == 0:
      raise ValueError(f'crop_fracs must be a non-empty 1-d sequence, '
                       f'got {crop_fracs!r}')
    if (fracs < 0).any() or (fracs > 1).any():
      raise ValueError(f'crop_fracs must lie in [0, 1], got {crop_fracs!r}')
    n, c = len(idx), len(fracs)
    out = np.empty((n, c, target_size, target_size, 3), np.uint8)
    written = self._lib.vp_decoder_sample_crops(
        self._handle,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        target_size,
        fracs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), c)
    if written != n:
      raise NativeDecodeError(
          f'decoded only {written}/{n} requested frames (stream ended '
          f'early; container frame count was {self.num_frames})')
    return out

  def close(self):
    handle = getattr(self, '_handle', None)
    if handle:
      self._lib.vp_decoder_close(handle)
      self._handle = None

  def __del__(self):
    self.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()


class NativeUnigramEncoder:
  """C++ Viterbi segmenter over a SentencePiece vocabulary.

  Same lattice semantics as the Python encoder in
  ``videoprism_tpu.io.tokenizers`` (validated against it in tests).
  Raises ``RuntimeError`` at construction when the native library is
  unavailable — callers keep the Python path as fallback.
  """

  def __init__(self, pieces: list[str], scores: list[float],
               matchable: list[bool], unk_id: int, unk_score: float):
    lib = load_tokenizer_lib()
    if lib is None:
      raise RuntimeError(f'native tokenizer unavailable: {_lib_error}')
    self._lib = lib

    blob = b''
    offsets = [0]
    for p in pieces:
      blob += p.encode('utf-8')
      offsets.append(len(blob))
    n = len(pieces)
    offsets_arr = (ctypes.c_int64 * (n + 1))(*offsets)
    scores_arr = (ctypes.c_float * n)(*scores)
    match_arr = (ctypes.c_uint8 * n)(*[1 if m else 0 for m in matchable])
    self._handle = lib.vp_tokenizer_create(
        blob, offsets_arr, scores_arr, match_arr, n, unk_id,
        ctypes.c_float(unk_score))
    if not self._handle:
      raise RuntimeError('vp_tokenizer_create failed')
    self._buf_size = 4096
    self._buf = (ctypes.c_int32 * self._buf_size)()

  def encode(self, normalized_text: str) -> list[int]:
    data = normalized_text.encode('utf-8')
    while True:
      count = self._lib.vp_tokenizer_encode(
          self._handle, data, len(data), self._buf, self._buf_size)
      if count >= 0:
        return list(self._buf[:count])
      self._buf_size *= 2
      self._buf = (ctypes.c_int32 * self._buf_size)()

  def __del__(self):
    handle = getattr(self, '_handle', None)
    if handle:
      self._lib.vp_tokenizer_destroy(handle)
      self._handle = None
