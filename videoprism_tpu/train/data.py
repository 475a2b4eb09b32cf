"""Training input pipeline: batched (video, text) examples with host
prefetch and device sharding.

The reference has no data pipeline (inference-only, SURVEY.md §2.7).  This
module provides the training-side counterpart to
:class:`videoprism_tpu.io.video.VideoPrefetcher`:

  * :class:`VideoTextSource` — (video file, caption) pairs decoded in a
    thread pool with the reference's frame-sampling semantics;
  * :class:`SyntheticSource` — deterministic random clips/captions for
    smoke tests and benchmarks;
  * :func:`batched_loader` — shuffling, epoch iteration, tokenization via
    the public ``tokenize_texts``, and async ``device_put`` with optional
    mesh sharding so step N+1's batch is on-device before step N finishes.
"""

from __future__ import annotations

import collections
import concurrent.futures
import dataclasses
import os
from collections.abc import Iterator, Sequence
from typing import Any, Protocol

import jax
import numpy as np

from videoprism_tpu.models import registry


class ExampleSource(Protocol):

  def __len__(self) -> int:
    ...

  def get(self, index: int) -> tuple[np.ndarray, str]:
    """Returns ([T, H, W, 3] float32 clip, caption)."""


@dataclasses.dataclass
class VideoTextSource:
  """(video path, caption) pairs decoded with the reference loader."""

  # Single-view clips [T, H, W, 3]: declared so the eval sweeps never
  # decode an example just to probe the clip rank (MultiViewSource
  # overrides with its real count).
  num_views = 1

  video_paths: Sequence[str]
  captions: Sequence[str]
  num_frames: int = 16
  target_size: int = 288
  resize_mode: str = 'center_crop'

  def __post_init__(self):
    assert len(self.video_paths) == len(self.captions)

  @classmethod
  def from_manifest(cls, path: str, *, allow_missing_captions: bool = False,
                    **kwargs) -> 'VideoTextSource':
    """Manifest with one ``video_path<TAB>caption`` per line; lines
    without a tab split at the FIRST comma (captions keep their commas).

    ``allow_missing_captions=True`` accepts path-only lines (caption '')
    — the build_video_index case, where captions are never used.
    """
    paths, captions = [], []
    for lineno, line in enumerate(open(path).read().splitlines(), 1):
      if not line.strip():
        continue
      if '\t' in line:
        p, cap = line.split('\t', 1)
      elif ',' in line:
        p, cap = line.split(',', 1)
      elif allow_missing_captions:
        p, cap = line, ''
      else:
        raise ValueError(
            f'{path}:{lineno}: no caption (expected '
            f'"video_path<TAB>caption" or "video_path,caption"): {line!r}')
      paths.append(p.strip())
      captions.append(cap.strip())
    return cls(paths, captions, **kwargs)

  def __len__(self) -> int:
    return len(self.video_paths)

  def get(self, index: int) -> tuple[np.ndarray, str]:
    from videoprism_tpu.io import video as video_lib

    clip = video_lib.load_video(
        self.video_paths[index], self.num_frames, self.target_size,
        self.resize_mode)
    return clip, self.captions[index]


@dataclasses.dataclass
class SyntheticSource:
  """Deterministic random data; useful for tests and step benchmarks.

  ``seed`` partitions the example space (cf. SyntheticLabeledSource):
  sources with different seeds are disjoint held-out sets; seed 0 keeps
  the historical examples.
  """

  # Single-view clips [T, H, W, 3]: declared so the eval sweeps never
  # decode an example just to probe the clip rank (MultiViewSource
  # overrides with its real count).
  num_views = 1

  num_examples: int = 64
  num_frames: int = 4
  size: int = 36
  vocab_words: Sequence[str] = (
      'person', 'dog', 'running', 'playing', 'water', 'drums', 'city')
  seed: int = 0

  def __len__(self) -> int:
    return self.num_examples

  def get(self, index: int) -> tuple[np.ndarray, str]:
    rng = np.random.default_rng((self.seed << 24) + index)
    clip = rng.random(
        (self.num_frames, self.size, self.size, 3), np.float32)
    words = rng.choice(self.vocab_words, size=3)
    return clip, ' '.join(words)


@dataclasses.dataclass
class VideoLabelSource:
  """(video path, integer label) pairs for classifier fine-tuning."""

  # Single-view clips [T, H, W, 3]: declared so the eval sweeps never
  # decode an example just to probe the clip rank (MultiViewSource
  # overrides with its real count).
  num_views = 1

  video_paths: Sequence[str]
  labels: Sequence[int]
  num_frames: int = 16
  target_size: int = 288
  resize_mode: str = 'center_crop'

  def __post_init__(self):
    assert len(self.video_paths) == len(self.labels)

  @classmethod
  def from_manifest(cls, path: str, **kwargs) -> 'VideoLabelSource':
    """CSV manifest, one ``video_path,int_label`` per line (paths may
    contain commas — the label is the last field)."""
    rows = [line.rsplit(',', 1)
            for line in open(path).read().splitlines() if line.strip()]
    return cls([p for p, _ in rows], [int(l) for _, l in rows], **kwargs)

  def __len__(self) -> int:
    return len(self.video_paths)

  def get(self, index: int) -> tuple[np.ndarray, int]:
    from videoprism_tpu.io import video as video_lib

    clip = video_lib.load_video(
        self.video_paths[index], self.num_frames, self.target_size,
        self.resize_mode)
    return clip, int(self.labels[index])


_TAR_VIDEO_EXTS = ('.mp4', '.avi', '.mov', '.mkv', '.webm')


class TarShardSource:
  """WebDataset-style sharded-tar ingestion with random access.

  Production video datasets ship as uncompressed ``.tar`` shards whose
  members pair by basename *within their shard*: ``<key>.mp4`` (or .avi/
  .mov/.mkv/.webm) with ``<key>.txt`` (caption) or ``<key>.cls``
  (integer label) — the same key in two different shards is two
  different examples, per the WebDataset convention.  On construction
  this source makes one header-only pass per shard to build a global
  ``(shard, data offset, size)`` index — captions/labels (small) are read
  during that same pass — after which :meth:`get` is a single
  ``seek + read`` of the video bytes.  Random access over the flat index
  keeps every existing loader feature working unchanged: deterministic
  global shuffling, multi-host row slicing (identical sorted index on
  every process), accumulation layout, and resume fast-forward.

  Compressed shards (``.tar.gz``) are rejected: gzip has no random
  access, which would turn every ``get`` into a full-shard scan.

  ``labeled=True`` expects ``.cls`` members and yields ``(clip, int)``
  for :func:`labeled_loader`; the default expects ``.txt`` captions and
  yields ``(clip, str)`` for :func:`batched_loader`.
  """

  # Single-view clips [T, H, W, 3]: declared so the eval sweeps never
  # decode an example just to probe the clip rank (MultiViewSource
  # overrides with its real count).
  num_views = 1

  def __init__(self, shards: Sequence[str], *, labeled: bool = False,
               num_frames: int = 16, target_size: int = 288,
               resize_mode: str = 'center_crop'):
    import tarfile

    if not shards:
      raise ValueError('no tar shards given')
    self.num_frames = num_frames
    self.target_size = target_size
    self.resize_mode = resize_mode
    self.labeled = labeled
    self._shards = [str(s) for s in shards]
    want_target = '.cls' if labeled else '.txt'
    # (shard_idx, key) -> [shard_idx, offset, size, ext, target]:
    # pairing is scoped per shard — WebDataset shards commonly restart
    # their numbering (each shard has its own 000000.mp4), and a global
    # key dict would silently overwrite earlier shards' examples or pair
    # one shard's video with another's caption. Insertion order is the
    # deterministic global example order (shards in caller order,
    # members in archive order).
    entries: dict[tuple[int, str], list] = {}
    for si, shard in enumerate(self._shards):
      if shard.endswith(('.gz', '.tgz', '.bz2', '.xz', '.zst')):
        raise ValueError(
            f'{shard}: compressed shards have no random access; '
            'store training shards as plain uncompressed .tar')
      with tarfile.open(shard, 'r:') as tf:
        for m in tf:
          if not m.isfile():
            continue
          key, ext = _split_tar_key(m.name)
          ext = ext.lower()
          e = entries.setdefault((si, key),
                                 [None, None, None, None, None])
          if ext in _TAR_VIDEO_EXTS:
            e[:4] = [si, m.offset_data, m.size, ext]
          elif ext == want_target:
            raw = tf.extractfile(m).read().decode('utf-8').strip()
            e[4] = int(raw) if labeled else raw
    self._index = []
    self._keys = []
    # Key shards by their path relative to the common shard directory —
    # basenames alone collide for per-subdir shard sets like
    # data/*/shard-00000.tar (colliding ids would make --append silently
    # skip the later shard's examples).
    common = os.path.commonpath(
        [os.path.dirname(os.path.abspath(s)) for s in self._shards])
    rel = [os.path.relpath(os.path.abspath(s), common)
           for s in self._shards]
    for (shard_i, key), (si, off, size, ext, target) in entries.items():
      if si is None:
        continue  # stray caption without a video — ignore
      if target is None:
        raise ValueError(
            f'{self._shards[shard_i]}: member {key}{ext} has no paired '
            f'{key}{want_target}')
      self._index.append((si, off, size, ext, target))
      self._keys.append(f'{rel[si]}/{key}')
    if not self._index:
      raise ValueError(f'no {_TAR_VIDEO_EXTS} members found in {shards}')

  @property
  def example_keys(self) -> list[str]:
    """Stable per-example ids, ``<shard path relative to the common
    shard dir>/<key>`` — the tar analogue of ``video_paths`` (index
    ids, strong resume checks)."""
    return list(self._keys)

  @classmethod
  def from_glob(cls, pattern: str, **kwargs) -> 'TarShardSource':
    """Builds from a shard glob (sorted, so the global example order —
    and therefore shuffling/resume — is identical on every host)."""
    import glob as glob_lib

    return cls(sorted(glob_lib.glob(pattern)), **kwargs)

  def __len__(self) -> int:
    return len(self._index)

  # Mode-aware target views (parity with VideoLabelSource.labels /
  # VideoTextSource.captions).  Wrong-mode access raises TypeError, NOT
  # AttributeError: ``getattr(source, 'labels', None)`` (the eval loops'
  # probe) swallows AttributeError raised inside a property and returns
  # the default — the mode mismatch would then silently take the
  # decode-everything fallback and die on an unrelated cast error hours
  # later.  TypeError propagates through getattr, failing loudly here.
  @property
  def labels(self) -> list:
    if not self.labeled:
      raise TypeError('caption-mode TarShardSource has no labels '
                      '(build with labeled=True)')
    return [t for *_, t in self._index]

  @property
  def captions(self) -> list:
    if self.labeled:
      raise TypeError('labeled TarShardSource has no captions')
    return [t for *_, t in self._index]

  def get(self, index: int):
    import tempfile

    from videoprism_tpu.io import video as video_lib

    si, off, size, ext, target = self._index[index]
    with open(self._shards[si], 'rb') as fh:
      fh.seek(off)
      data = fh.read(size)
    if len(data) != size:
      raise IOError(f'{self._shards[si]}: truncated member at {off} '
                    f'(wanted {size} bytes, got {len(data)})')
    # The decoders (FFmpeg/cv2) want a path; hand them the bytes as an
    # unlinked temp file. suffix matters: it selects the demuxer.
    with tempfile.NamedTemporaryFile(suffix=ext) as tmp:
      tmp.write(data)
      tmp.flush()
      clip = video_lib.load_video(
          tmp.name, self.num_frames, self.target_size, self.resize_mode)
    return clip, target


def _split_tar_key(name: str) -> tuple[str, str]:
  """WebDataset pairing key: path up to the last extension."""
  import os as os_lib

  return os_lib.path.splitext(name)


@dataclasses.dataclass
class MultiViewSource:
  """Multi-view evaluation wrapper over a path-backed source.

  Wraps a :class:`VideoLabelSource` / :class:`VideoTextSource` so ``get``
  returns ``([V, T, S, S, 3] views, target)`` with
  ``V = temporal_views * spatial_views`` (the ViViT-style NxM protocol;
  see :func:`videoprism_tpu.io.video.load_video_views`).  The eval loops
  (:mod:`videoprism_tpu.train.eval_loop`) detect the 5-d clips and
  aggregate per-example over views.
  """

  base: Any
  temporal_views: int = 4
  spatial_views: int = 3
  backend: str = 'auto'

  def __post_init__(self):
    if not hasattr(self.base, 'video_paths'):
      raise ValueError(
          'MultiViewSource needs a path-backed source (VideoLabelSource / '
          f'VideoTextSource), got {type(self.base).__name__}')

  def __len__(self) -> int:
    return len(self.base)

  @property
  def num_views(self) -> int:
    """Declared view count — lets the eval loops size their batches
    without decoding a probe example."""
    return self.temporal_views * self.spatial_views

  @property
  def labels(self):
    return getattr(self.base, 'labels', None)

  @property
  def captions(self):
    return getattr(self.base, 'captions', None)

  def get(self, index: int) -> tuple[np.ndarray, Any]:
    from videoprism_tpu.io import video as video_lib

    views = video_lib.load_video_views(
        self.base.video_paths[index], self.base.num_frames,
        self.base.target_size, temporal_views=self.temporal_views,
        spatial_views=self.spatial_views, backend=self.backend)
    if self.labels is not None:
      return views, int(self.base.labels[index])
    return views, self.base.captions[index]


@dataclasses.dataclass
class MixtureSource:
  """Weighted mixture of example sources — multi-dataset training.

  Production corpora are mixtures (a curated high-quality set
  oversampled against a large scraped one, several domains balanced by
  hand-tuned weights).  This composes N sources behind the standard
  ``ExampleSource`` protocol so EVERY existing loader feature — shuffle,
  multi-host splits, accumulation batches, crash-exact ``skip_batches``
  resume — works unchanged over the mixture.

  Semantics: one virtual epoch has ``virtual_size`` examples
  apportioned to sources by ``weights`` (default: proportional to
  source sizes = plain concatenation) via largest-remainder rounding,
  interleaved deterministically with smooth weighted round-robin (so
  even UNSHUFFLED iteration mixes).  A source oversampled beyond its
  size repeats (occurrence mod len — the standard oversampling
  semantics).

  **Coverage**: the virtual→concrete map is static (that is what keeps
  multi-host splits and crash-exact resume reproducible), so a source
  whose slot count falls below its size would expose only a fixed
  subset FOREVER — not a different subset per epoch.  The default
  ``virtual_size`` therefore guarantees full coverage: it is the
  smallest epoch in which EVERY source gets at least ``len(source)``
  slots at its weight (``max_i ceil(len_i / w_i)``).  An explicit
  smaller ``virtual_size`` is allowed for truncated runs but warns and
  uses an evenly-spread subset (stride map), never a silent prefix.

  All sources must yield the same example structure (all text-paired or
  all labeled) and share ``num_views``.
  """

  sources: Sequence[Any]
  weights: Sequence[float] | None = None
  virtual_size: int | None = None

  def __post_init__(self):
    if not self.sources:
      raise ValueError('MixtureSource needs at least one source')
    n = len(self.sources)
    w = np.asarray(
        [float(x) for x in self.weights] if self.weights is not None
        else [len(s) for s in self.sources], np.float64)
    if w.shape != (n,):
      raise ValueError(f'{n} sources but {w.shape[0]} weights')
    if (w <= 0).any() or not np.isfinite(w).all():
      raise ValueError(f'weights must be positive finite, got {w}')
    w = w / w.sum()
    if self.virtual_size is not None:
      total = int(self.virtual_size)
    else:
      # Full-coverage default: every source gets >= len(source) slots.
      total = max(int(np.ceil(len(s) / wi))
                  for s, wi in zip(self.sources, w))
    if total < n:
      raise ValueError(f'virtual_size {total} < {n} sources')
    # Largest-remainder apportionment: counts sum EXACTLY to total and
    # every source keeps at least one slot (weights are positive).
    counts = np.maximum(1, np.floor(w * total).astype(np.int64))
    lens = np.asarray([len(s) for s in self.sources], np.int64)
    if self.virtual_size is None:
      # Full-coverage mode: the guarantee is exact, not float-trusting —
      # w*total can round to len-1ulp and floor below len(source).
      counts = np.maximum(counts, lens)
    # The max(1)/coverage floors can overshoot ``total``.  Shave only
    # sources with slack above their own floor (1 slot, or len(source)
    # in coverage mode), most over-apportioned first — never below the
    # coverage guarantee.  If no source has slack, grow the epoch
    # instead: the guarantee wins over the requested size.
    floors = lens if self.virtual_size is None else np.ones_like(lens)
    while counts.sum() > total:
      over = counts.astype(np.float64) - w * total
      over[counts <= floors] = -np.inf
      if not np.isfinite(over).any():
        total = int(counts.sum())
        break
      counts[int(np.argmax(over))] -= 1
    frac = w * total - counts
    for i in np.argsort(-frac)[: int(total - counts.sum())]:
      counts[i] += 1
    # Undersampled sources (an explicit small virtual_size) expose a
    # STATIC subset — warn, and spread it evenly instead of a prefix.
    short = [i for i, (s, c) in enumerate(zip(self.sources, counts))
             if c < len(s)]
    if short:
      import warnings

      warnings.warn(
          f'MixtureSource: virtual_size={total} gives sources {short} '
          f'fewer slots than examples — only an evenly-spread subset '
          f'of each trains (static across epochs).  Drop virtual_size '
          f'for the full-coverage default.')
    self._short = set(short)
    # Smooth weighted round-robin: source i's k-th occurrence lands at
    # virtual position key (k+0.5)/counts_i — sorting the keys yields
    # the maximally even interleave (the classic WRR schedule).
    keys = np.concatenate([
        (np.arange(c, dtype=np.float64) + 0.5) / c + i * 1e-12
        for i, c in enumerate(counts)])
    owner = np.concatenate([
        np.full(c, i, np.int32) for i, c in enumerate(counts)])
    order = np.argsort(keys, kind='stable')
    self._owner = owner[order]
    self._occ = np.empty(total, np.int64)
    for i in range(n):
      idx = np.nonzero(self._owner == i)[0]
      self._occ[idx] = np.arange(len(idx))
    self._counts = counts
    views = {getattr(s, 'num_views', 1) for s in self.sources}
    if len(views) > 1:
      raise ValueError(
          f'mixture sources must share num_views, got {sorted(views)}')
    self.num_views = views.pop()

  @property
  def shares(self) -> list[float]:
    """Realized per-source fraction of the virtual epoch (for logs)."""
    return [round(float(c) / len(self._owner), 6) for c in self._counts]

  def __len__(self) -> int:
    return len(self._owner)

  def get(self, index: int):
    s = int(self._owner[index])
    src = self.sources[s]
    k = int(self._occ[index])
    if s in self._short:
      # counts < len: spread the k-th of counts slots across the whole
      # source (floor(k*len/counts) is strictly increasing here), so a
      # truncated epoch samples evenly rather than a fixed prefix.
      return src.get(k * len(src) // int(self._counts[s]))
    return src.get(k % len(src))


@dataclasses.dataclass
class SyntheticLabeledSource:
  """Deterministic random labeled clips for classifier smoke tests.

  ``seed`` partitions the example space: sources with different seeds are
  disjoint held-out sets (seed 0 keeps the historical examples).
  """

  # Single-view clips [T, H, W, 3]: declared so the eval sweeps never
  # decode an example just to probe the clip rank (MultiViewSource
  # overrides with its real count).
  num_views = 1

  num_examples: int = 64
  num_frames: int = 4
  size: int = 36
  num_classes: int = 10
  seed: int = 0

  def __len__(self) -> int:
    return self.num_examples

  def get(self, index: int) -> tuple[np.ndarray, int]:
    rng = np.random.default_rng((self.seed << 24) + index)
    clip = rng.random(
        (self.num_frames, self.size, self.size, 3), np.float32)
    return clip, int(rng.integers(self.num_classes))


def _local_rows(indices: np.ndarray, accum_steps: int, batch_size: int,
                pidx: int, pcount: int) -> np.ndarray:
  """This process's slice of one global step's example indices.

  ``indices`` is the flat ``[accum_steps * batch_size]`` global draw; each
  microbatch row block is split contiguously across processes (matching
  the contiguous per-process device order of
  ``jax.make_array_from_process_local_data`` — see tests/_mh_worker.py).
  """
  if pcount == 1:
    return indices
  lb = batch_size // pcount
  grid = indices.reshape(accum_steps, batch_size)
  return grid[:, pidx * lb:(pidx + 1) * lb].reshape(-1)


def batched_loader(
    source: ExampleSource,
    tokenizer,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: int | None = None,
    max_text_len: int = registry.TEXT_MAX_LEN,
    num_workers: int = 4,
    prefetch_depth: int = 2,
    sharding=None,
    drop_remainder: bool = True,
    accum_steps: int = 1,
    process_index: int | None = None,
    process_count: int | None = None,
    skip_batches: int = 0,
) -> Iterator[dict[str, Any]]:
  """Yields device-resident batches
  ``{'video', 'text_token_ids', 'text_paddings'}``.

  Decode happens in a thread pool; the next ``prefetch_depth`` batches are
  eagerly assembled and ``device_put``, overlapping host work with device
  compute.  ``sharding`` is a callable ``ndim -> Sharding`` (e.g.
  ``lambda ndim: data_sharding(mesh, ndim)``) applied per batch field.

  ``accum_steps > 1`` emits gradient-accumulation batches: each yielded
  leaf is ``[accum_steps, batch_size, ...]`` (``accum_steps * batch_size``
  examples consumed per step); pass a ``batch_axis=1`` sharding (e.g.
  ``lambda ndim: data_sharding(mesh, ndim, batch_axis=1)``) so the
  microbatch axis stays unsharded for the accumulation scan.

  **Multi-host**: when ``jax.process_count() > 1`` (or
  ``process_count``/``process_index`` are passed explicitly), ``batch_size``
  is the GLOBAL batch and each process decodes only its
  ``batch_size / process_count`` contiguous rows of it; the yielded leaves
  are global :class:`jax.Array`\\s assembled with
  ``jax.make_array_from_process_local_data`` (requires ``sharding``).  All
  hosts must use the same ``seed`` so they agree on the epoch permutation —
  only decode/tokenize work is divided.
  """
  def assemble(examples):
    videos = np.stack([clip for clip, _ in examples], axis=0)
    ids, paddings = registry.tokenize_texts(
        tokenizer, [cap for _, cap in examples], max_length=max_text_len)
    return {
        'video': videos,
        'text_token_ids': ids,
        'text_paddings': paddings,
    }

  return _loader_engine(
      source, batch_size, assemble, shuffle=shuffle, seed=seed,
      num_epochs=num_epochs, num_workers=num_workers,
      prefetch_depth=prefetch_depth, sharding=sharding,
      drop_remainder=drop_remainder, accum_steps=accum_steps,
      process_index=process_index, process_count=process_count,
      skip_batches=skip_batches)


def unlabeled_loader(
    source,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: int | None = None,
    num_workers: int = 4,
    prefetch_depth: int = 2,
    sharding=None,
    drop_remainder: bool = True,
    accum_steps: int = 1,
    process_index: int | None = None,
    process_count: int | None = None,
    skip_batches: int = 0,
) -> Iterator[dict[str, Any]]:
  """Yields ``{'video'}`` batches from any ``(clip, *)`` source — the
  caption/label element is ignored.  The distillation input pipeline
  (feature matching needs only video); same engine and multi-host/
  accumulation semantics as :func:`batched_loader`."""

  def assemble(examples):
    return {'video': np.stack([ex[0] for ex in examples], axis=0)}

  return _loader_engine(
      source, batch_size, assemble, shuffle=shuffle, seed=seed,
      num_epochs=num_epochs, num_workers=num_workers,
      prefetch_depth=prefetch_depth, sharding=sharding,
      drop_remainder=drop_remainder, accum_steps=accum_steps,
      process_index=process_index, process_count=process_count,
      skip_batches=skip_batches)


def labeled_loader(
    source,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: int | None = None,
    num_workers: int = 4,
    prefetch_depth: int = 2,
    sharding=None,
    drop_remainder: bool = True,
    accum_steps: int = 1,
    process_index: int | None = None,
    process_count: int | None = None,
    skip_batches: int = 0,
) -> Iterator[dict[str, Any]]:
  """Yields ``{'video', 'label'}`` batches from a ``(clip, int)`` source
  (:class:`VideoLabelSource` / :class:`SyntheticLabeledSource`) for
  classifier fine-tuning.  Same prefetch / sharding / accumulation /
  multi-host semantics as :func:`batched_loader`."""

  def assemble(examples):
    videos = np.stack([clip for clip, _ in examples], axis=0)
    labels = np.asarray([label for _, label in examples], np.int32)
    return {'video': videos, 'label': labels}

  return _loader_engine(
      source, batch_size, assemble, shuffle=shuffle, seed=seed,
      num_epochs=num_epochs, num_workers=num_workers,
      prefetch_depth=prefetch_depth, sharding=sharding,
      drop_remainder=drop_remainder, accum_steps=accum_steps,
      process_index=process_index, process_count=process_count,
      skip_batches=skip_batches)


def _loader_engine(
    source,
    batch_size: int,
    assemble,
    *,
    shuffle: bool,
    seed: int,
    num_epochs: int | None,
    num_workers: int,
    prefetch_depth: int,
    sharding,
    drop_remainder: bool,
    accum_steps: int,
    process_index: int | None,
    process_count: int | None,
    skip_batches: int = 0,
) -> Iterator[dict[str, Any]]:
  """Shared loader machinery: epoch shuffling, thread-pool decode,
  ``assemble(examples) -> field dict``, accumulation reshape, multi-host
  global-batch assembly, and depth-``prefetch_depth`` async device_put."""
  pool = concurrent.futures.ThreadPoolExecutor(num_workers)
  pcount = jax.process_count() if process_count is None else process_count
  pidx = jax.process_index() if process_index is None else process_index
  if pcount > 1:
    if sharding is None:
      raise ValueError('multi-host loading (process_count '
                       f'{pcount}) requires a mesh sharding so the global '
                       'batch can be assembled from process-local data')
    if batch_size % pcount:
      raise ValueError(f'global batch_size {batch_size} is not divisible '
                       f'by process_count {pcount}')
    if not 0 <= pidx < pcount:
      raise ValueError(f'process_index {pidx} out of range [0, {pcount})')
  step_size = batch_size * accum_steps
  if accum_steps > 1 and not drop_remainder:
    raise ValueError('accum_steps > 1 requires drop_remainder=True '
                     '(a partial final batch cannot reshape to '
                     '[accum_steps, batch_size, ...])')
  if pcount > 1 and not drop_remainder:
    raise ValueError(
        'multi-host loading requires drop_remainder=True: a partial '
        'final batch cannot split into equal per-process rows, and the '
        'global batch shape must stay fixed for '
        'make_array_from_process_local_data')
  if drop_remainder and len(source) < step_size:
    raise ValueError(
        f'source has {len(source)} examples but one step consumes '
        f'{step_size} (batch_size={batch_size} x accum_steps='
        f'{accum_steps}) — the loader would yield nothing')

  def epoch_indices(epoch: int) -> np.ndarray:
    idx = np.arange(len(source))
    if shuffle:
      rng_e = np.random.default_rng(seed + epoch)
      rng_e.shuffle(idx)
    return idx

  local_batch = batch_size // pcount

  def make_batch(indices: np.ndarray) -> dict[str, Any]:
    local = _local_rows(indices, accum_steps, batch_size, pidx, pcount)
    examples = list(pool.map(source.get, local))
    batch = assemble(examples)
    if accum_steps > 1:
      batch = {
          k: v.reshape(accum_steps, local_batch, *v.shape[1:])
          for k, v in batch.items()
      }
    if pcount > 1:
      batch_dim = 1 if accum_steps > 1 else 0
      return {
          k: jax.make_array_from_process_local_data(
              sharding(v.ndim), v,
              v.shape[:batch_dim] + (batch_size,)
              + v.shape[batch_dim + 1:])
          for k, v in batch.items()
      }
    if sharding is not None:
      return {k: jax.device_put(v, sharding(v.ndim))
              for k, v in batch.items()}
    return {k: jax.device_put(v) for k, v in batch.items()}

  def batch_index_stream():
    epoch = 0
    while num_epochs is None or epoch < num_epochs:
      idx = epoch_indices(epoch)
      limit = (len(idx) // step_size) * step_size if drop_remainder \
          else len(idx)
      for start in range(0, limit, step_size):
        yield idx[start:start + step_size]
      epoch += 1

  streams = batch_index_stream()
  # Resume fast-forward: advance the (deterministic) index stream without
  # decoding — the resumed run then sees exactly the batches an
  # uninterrupted run would have seen from this step on.
  for _ in range(skip_batches):
    if next(streams, None) is None:
      break
  pending = collections.deque()
  submit_pool = concurrent.futures.ThreadPoolExecutor(1)

  # try/finally so an abandoned iterator (GeneratorExit) or exhaustion
  # releases the worker threads — a trainer that builds loaders
  # repeatedly would otherwise accumulate idle thread pools.
  try:
    for _ in range(prefetch_depth):
      indices = next(streams, None)
      if indices is None:
        break
      pending.append(submit_pool.submit(make_batch, indices))

    while pending:
      batch = pending.popleft().result()
      indices = next(streams, None)
      if indices is not None:
        pending.append(submit_pool.submit(make_batch, indices))
      yield batch
  finally:
    submit_pool.shutdown(wait=False, cancel_futures=True)
    pool.shutdown(wait=False, cancel_futures=True)
