"""Serving tier: compiled forward handles, multi-chip data parallelism, and
a micro-batching embedding service.

Two multi-chip strategies, chosen by what fits on a chip:

  * ``data_parallel_forward`` — ``shard_map`` over the ``data`` axis with
    replicated params.  Each chip runs the full single-chip program
    (including the fused Pallas kernels, which GSPMD cannot partition as
    opaque custom calls) on its batch shard.  This is the production path
    for all public checkpoints (the largest, LvT-L, is 2.3 GB fp32 — small
    next to TPU HBM).
  * tensor parallelism via GSPMD sharding rules
    (:mod:`videoprism_tpu.parallel.sharding`) with ``attention_impl='xla'``
    — for giant-scale towers that genuinely exceed one chip.

:class:`EmbeddingService` adds host-side micro-batching: requests queue up,
get padded to the nearest compiled batch bucket, and run through a cached
jit executable per bucket — bounded p50 latency without a recompile per
request shape.
"""

from __future__ import annotations

import bisect
import collections
import dataclasses
import hashlib
import itertools
import queue
import time
import threading
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec

from videoprism_tpu.parallel import mesh as mesh_lib


def data_parallel_forward(
    forward_fn: Callable[..., Any],
    mesh,
    *,
    axis: str = mesh_lib.DATA_AXIS,
):
  """Wraps ``forward_fn(params, batch)`` to run batch-sharded over ``mesh``.

  Params are replicated; the batch's leading axis is split across ``axis``.
  Inside ``shard_map`` each device traces the single-device program, so
  Pallas kernels run unmodified per shard.
  """
  def sharded(params, batch):
    return forward_fn(params, batch)

  return jax.jit(mesh_lib.shard_map_compat(
      sharded, mesh,
      in_specs=(PartitionSpec(), PartitionSpec(axis)),
      out_specs=PartitionSpec(axis)))


class ServiceOverloaded(RuntimeError):
  """Raised by :meth:`EmbeddingService.embed` when the pending-request
  queue is at ``max_pending`` — the backpressure signal (HTTP 503 at the
  serving_http layer).  Clients should retry with backoff."""


class DeadlineExceeded(TimeoutError):
  """Raised by :meth:`EmbeddingService.embed` when a request's deadline
  passed while it was still queued (HTTP 504 at the serving_http layer).
  The chip never spent time on it — under overload, expiring stale work
  is what keeps the queue from serving only requests nobody is still
  waiting for."""


@dataclasses.dataclass
class _Request:
  video: np.ndarray            # [T, H, W, 3]
  event: threading.Event
  result: np.ndarray | None = None
  error: Exception | None = None
  deadline: float | None = None  # absolute time.monotonic()
  # pad_frames_to services: how many leading frames are real (the rest
  # were zero-padded on and are masked via frame_paddings).
  valid_frames: int | None = None
  priority: str = 'interactive'  # 'interactive' | 'batch'
  # Set by a waiter whose embed() timeout expired while still queued: the
  # worker drops it at dequeue time instead of spending a batch slot on a
  # request nobody is waiting for (same treatment as an expired deadline).
  abandoned: bool = False


# Traffic classes for the priority queue.  Dequeue order is by VIRTUAL
# arrival time: interactive requests use their real arrival, batch-class
# ones their arrival + ``batch_age_s`` — so interactive preempts batch
# while both are fresh (soak-idle-capacity semantics), but a batch
# request that has waited ``batch_age_s`` ranks ahead of any newer
# interactive arrival.  Starvation is bounded by construction with one
# static key per request (no re-queueing); FIFO within a class falls out
# of monotone arrival times + the seq tiebreak.
_PRIORITY_RANK = {'interactive': 0, 'batch': 1}


@dataclasses.dataclass
class _TextRequest:
  texts: list
  event: threading.Event
  result: np.ndarray | None = None
  error: Exception | None = None
  deadline: float | None = None


class _LatencyHistogram:
  """Fixed-bucket request-latency histogram (seconds).

  Per-request end-to-end latency (queue wait + batch execution — what a
  client actually experiences) on log-spaced buckets: O(1) to record
  under the stats lock, bounded memory regardless of traffic, and the
  exact shape Prometheus's native histogram type wants (``/metrics``
  renders ``_bucket``/``_sum``/``_count``; quantiles come from the
  scrape side via ``histogram_quantile``).  The existing batch-latency
  percentiles track chip time per DISPATCH; this tracks what the caller
  waited, including coalescing and queueing under load.
  """

  # 2 ms .. 10 s, roughly x2.5 per step; +Inf is implicit.
  BOUNDS = (0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.2, 0.5,
            1.0, 2.0, 5.0, 10.0)

  def __init__(self):
    self.counts = [0] * (len(self.BOUNDS) + 1)
    self.sum = 0.0
    self.count = 0

  def observe(self, seconds: float) -> None:
    self.sum += seconds
    self.count += 1
    self.counts[bisect.bisect_left(self.BOUNDS, seconds)] += 1

  def quantile(self, q: float) -> float | None:
    """Bucket-resolution estimate (upper bound of the target bucket) —
    a convenience for ``/stats`` readers; dashboards should compute
    quantiles from the exported buckets instead."""
    if not self.count:
      return None
    rank = q * self.count
    seen = 0
    for i, c in enumerate(self.counts):
      seen += c
      if seen >= rank:
        return self.BOUNDS[i] if i < len(self.BOUNDS) else float('inf')
    return float('inf')

  def snapshot(self) -> dict[str, Any]:
    return {
        'bounds_s': list(self.BOUNDS),
        'counts': list(self.counts),
        'sum_s': round(self.sum, 6),
        'count': self.count,
    }


class _CoalesceGovernor:
  """Adaptive micro-batch wait: pay the coalescing timer only while the
  dispatch history shows concurrency.

  The fixed ``max_wait`` timer buys throughput when concurrent requests
  land within the window — but a lone low-QPS client pays the FULL
  window as pure added latency on every request (5 ms default against a
  6.7 ms base forward: +75% p50 for nothing).  Policy: an EWMA over
  dispatches of "did this dispatch coalesce" (more than one request in
  the batch, or more work already queued at dispatch).  While the EWMA
  is above threshold the full wait applies; a run of ~30 singleton
  dispatches decays it to zero — requests then dispatch immediately,
  though anything ALREADY queued still drains into the batch, so
  arrivals during the previous batch's execution keep coalescing
  (self-clocking batching).  One coalesced dispatch restores the timer.
  Starts at 1.0: cold starts and synchronized warm-up bursts get the
  conservative full-wait behavior."""

  DECAY = 0.9
  THRESHOLD = 0.05

  def __init__(self, max_wait_s: float, adaptive: bool):
    self._max_wait = max_wait_s
    self._adaptive = adaptive
    self.rate = 1.0

  def wait_s(self) -> float:
    if not self._adaptive or self.rate > self.THRESHOLD:
      return self._max_wait
    return 0.0

  def observe(self, coalesced: bool) -> None:
    if self._adaptive:
      self.rate = (self.DECAY * self.rate
                   + (1.0 - self.DECAY) * float(coalesced))


class _EmbeddingCache:
  """Content-addressed LRU for serving results.

  Retried uploads, load-test loops, and popular clips re-enter a serving
  pod verbatim; re-running the tower on identical bytes buys nothing.
  Entries are keyed by a digest of the exact input (plus shape/dtype —
  content that decodes equal but arrives different stays distinct) and
  bounded two ways: ``max_entries`` and ``max_bytes`` (token-level
  encoder outputs are ~12.6 MB/clip fp32, so an entry cap alone could
  still pin GBs).  Eviction is LRU on read and write.  A hot weight
  reload :meth:`clear`\\ s it — embeddings from the old tree are wrong
  answers under the new one.
  """

  def __init__(self, max_entries: int, max_bytes: int = 1 << 30):
    if max_entries <= 0:
      raise ValueError(f'max_entries must be positive, got {max_entries}')
    self._max_entries = max_entries
    self._max_bytes = max_bytes
    self._entries: collections.OrderedDict[bytes, np.ndarray] = (
        collections.OrderedDict())
    self._bytes = 0
    self._lock = threading.Lock()
    self.hits = 0
    self.misses = 0

  @staticmethod
  def digest(payload: bytes | memoryview, *context) -> bytes:
    """blake2b over the raw payload plus any context (shape, dtype,
    valid-frame count, ...) that changes the answer for equal bytes."""
    h = hashlib.blake2b(digest_size=16)
    h.update(payload)
    for c in context:
      h.update(repr(c).encode())
      h.update(b'\x00')
    return h.digest()

  def get(self, key: bytes) -> np.ndarray | None:
    with self._lock:
      value = self._entries.get(key)
      if value is None:
        self.misses += 1
        return None
      self._entries.move_to_end(key)
      self.hits += 1
      return value

  def put(self, key: bytes, value: np.ndarray) -> None:
    value = np.asarray(value)
    if value.nbytes > self._max_bytes:
      return
    with self._lock:
      old = self._entries.pop(key, None)
      if old is not None:
        self._bytes -= old.nbytes
      self._entries[key] = value
      self._bytes += value.nbytes
      while (len(self._entries) > self._max_entries
             or self._bytes > self._max_bytes):
        _, evicted = self._entries.popitem(last=False)
        self._bytes -= evicted.nbytes

  def clear(self) -> None:
    with self._lock:
      self._entries.clear()
      self._bytes = 0

  def stats(self) -> dict[str, Any]:
    with self._lock:
      return {
          'cache_hits': self.hits,
          'cache_misses': self.misses,
          'cache_entries': len(self._entries),
          'cache_bytes': self._bytes,
      }


class TextEncodeService:
  """Cross-request micro-batching for the text tower.

  :func:`videoprism_tpu.retrieval.make_text_query_encoder` batches the
  texts *within* one call, but each concurrent ``/v1/embed_text`` //
  ``/v1/search`` request still paid its own dispatch. This wrapper gives
  text queries the same treatment the video path gets from
  :class:`EmbeddingService`: concurrent callers' text lists coalesce
  into one underlying ``encode_fn`` call and the result rows fan back
  out — the padded fixed-geometry batch fills up instead of running
  nearly empty once per request.

  ``encode(texts)`` is a drop-in for the bare encoder function, so the
  HTTP layer doesn't change. :meth:`reload` hot-swaps the underlying
  encoder (paired with :meth:`EmbeddingService.reload_state`).
  """

  def __init__(self, encode_fn, *, max_wait_ms: float = 5.0,
               max_texts: int = 64, max_pending: int | None = None,
               adaptive_wait: bool = True, cache_entries: int = 0,
               cache_bytes: int = 1 << 28):
    """``cache_entries=N`` (default 0 = off) memoizes per-STRING: a
    request whose texts were all seen before returns without queueing,
    and a partial hit only sends the misses to the chip.  Text
    embeddings are a few KB each, so the default byte budget is ample.
    :meth:`reload` clears it (new weights, new embedding space)."""
    if max_texts <= 0:
      raise ValueError(f'max_texts must be positive, got {max_texts}')
    if max_pending is not None and max_pending <= 0:
      raise ValueError(f'max_pending must be positive, got {max_pending}')
    self._encode_fn = encode_fn
    self._max_wait = max_wait_ms / 1000.0
    # adaptive_wait=True drops the coalescing timer to zero after a run
    # of singleton dispatches (see _CoalesceGovernor); False always
    # waits the full max_wait_ms.
    self._governor = _CoalesceGovernor(self._max_wait, adaptive_wait)
    self._max_texts = max_texts
    self._queue: queue.Queue[_TextRequest] = queue.Queue(
        maxsize=max_pending or 0)
    self._thread: threading.Thread | None = None
    self._running = False
    self._stopped = False
    self._stats_lock = threading.Lock()
    self._requests_served = 0
    self._batches_run = 0
    self._errors = 0
    self._generation = 0
    self._latency = _LatencyHistogram()
    self._cache = (_EmbeddingCache(cache_entries, cache_bytes)
                   if cache_entries else None)

  def start(self) -> None:
    self._running = True
    self._stopped = False
    self._thread = threading.Thread(target=self._loop, daemon=True)
    self._thread.start()

  def stop(self) -> None:
    self._running = False
    self._stopped = True
    if self._thread is not None:
      self._thread.join(timeout=30)
      self._thread = None
    while True:
      try:
        req = self._queue.get_nowait()
      except queue.Empty:
        break
      req.error = RuntimeError('TextEncodeService stopped')
      req.event.set()

  def reload(self, encode_fn) -> None:
    """Swaps the underlying encoder between batches (hot reload)."""
    self._encode_fn = encode_fn
    if self._cache is not None:
      self._cache.clear()
    self._generation += 1

  @property
  def generation(self) -> int:
    """Bumps on every :meth:`reload` — anything caching DERIVED text
    embeddings (e.g. zero-shot class prototypes) keys on this so a
    weight swap invalidates the cache instead of serving a stale
    embedding space."""
    return self._generation

  def stats(self) -> dict[str, Any]:
    with self._stats_lock:
      return {
          'text_requests_served': self._requests_served,
          'text_batches_run': self._batches_run,
          'text_errors': self._errors,
          'text_queue_depth': self._queue.qsize(),
          'text_coalesce_rate': round(self._governor.rate, 4),
          'text_request_latency': self._latency.snapshot(),
          **({f'text_{k}': v for k, v in self._cache.stats().items()}
             if self._cache is not None else {}),
      }

  def encode(self, texts, timeout: float = 300.0,
             deadline_ms: float | None = None) -> np.ndarray:
    """Blocking ``list[str] -> [N, D]``; coalesces with concurrent
    callers. Same overload/deadline semantics as
    :meth:`EmbeddingService.embed`."""
    t_start = time.monotonic()
    texts = list(texts)
    if not texts:
      raise ValueError('encode: empty text list')
    if self._stopped:
      raise RuntimeError('TextEncodeService was stopped')
    if deadline_ms is not None and not deadline_ms > 0:
      raise ValueError(f'deadline_ms must be positive, got {deadline_ms}')
    cached_rows: dict[int, np.ndarray] = {}
    keys = None
    if self._cache is not None:
      keys = [_EmbeddingCache.digest(str(t).encode('utf-8'))
              for t in texts]
      for i, key in enumerate(keys):
        row = self._cache.get(key)
        if row is not None:
          cached_rows[i] = row
      if len(cached_rows) == len(texts):
        with self._stats_lock:
          self._latency.observe(time.monotonic() - t_start)
        return np.stack([cached_rows[i] for i in range(len(texts))])
      # Only the misses ride the chip; hits splice back in below.
      texts = [t for i, t in enumerate(texts) if i not in cached_rows]
    req = _TextRequest(
        texts=texts, event=threading.Event(),
        deadline=(time.monotonic() + deadline_ms / 1e3
                  if deadline_ms is not None else None))
    try:
      self._queue.put_nowait(req)
    except queue.Full:
      raise ServiceOverloaded(
          f'{self._queue.maxsize} text requests already pending; retry '
          'with backoff') from None
    # Close the check-then-enqueue race with stop(): a request that
    # landed after the drain has no worker — fail it now rather than
    # letting the caller block until its timeout.
    if self._stopped and not req.event.is_set():
      req.error = RuntimeError('TextEncodeService stopped')
      req.event.set()
    if not req.event.wait(timeout):
      raise TimeoutError('text encode request timed out')
    if req.error is not None:
      raise req.error
    with self._stats_lock:
      self._latency.observe(time.monotonic() - t_start)
    if keys is None:
      return req.result
    total = len(keys)
    fresh = iter(np.asarray(req.result))
    rows = []
    for i in range(total):
      row = cached_rows.get(i)
      if row is None:
        row = np.array(next(fresh))  # copy: don't pin the batch array
        self._cache.put(keys[i], row)
      rows.append(row)
    return np.stack(rows)

  def _loop(self) -> None:
    while self._running:
      try:
        first = self._queue.get(timeout=0.1)
      except queue.Empty:
        continue
      batch = [first]
      count = len(first.texts)
      deadline = time.monotonic() + self._governor.wait_s()
      while count < self._max_texts:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
          # Timer over (or adaptively zero): still drain anything
          # ALREADY queued — arrivals during the previous dispatch's
          # execution coalesce without paying the timer.
          try:
            nxt = self._queue.get_nowait()
          except queue.Empty:
            break
        else:
          try:
            nxt = self._queue.get(timeout=remaining)
          except queue.Empty:
            break
        batch.append(nxt)
        count += len(nxt.texts)
      self._governor.observe(len(batch) > 1 or not self._queue.empty())

      now = time.monotonic()
      live = []
      for r in batch:
        if r.deadline is not None and now > r.deadline:
          r.error = DeadlineExceeded(
              'deadline passed before the request reached the chip')
          r.event.set()
        else:
          live.append(r)
      if not live:
        continue
      merged = [t for r in live for t in r.texts]
      try:
        emb = np.asarray(self._encode_fn(merged))
        off = 0
        for r in live:
          r.result = emb[off:off + len(r.texts)]
          off += len(r.texts)
        with self._stats_lock:
          self._requests_served += len(live)
          self._batches_run += 1
      except Exception as e:  # surface to all waiters, keep serving
        for r in live:
          r.error = e
        with self._stats_lock:
          self._errors += len(live)
      finally:
        for r in live:
          r.event.set()


class EmbeddingService:
  """Micro-batching video-embedding server.

  Example::

      service = EmbeddingService(model, state, batch_buckets=(1, 4, 8))
      service.start()
      emb = service.embed(clip)          # thread-safe, blocking
      service.stop()
  """

  def __init__(
      self,
      model,
      state,
      batch_buckets: tuple[int, ...] = (1, 4, 8),
      max_wait_ms: float = 5.0,
      mesh=None,
      tensor_parallel: bool = False,
      quantize: str | None = None,
      max_pending: int | None = None,
      exported=None,
      unhealthy_after_errors: int = 16,
      adaptive_wait: bool = True,
      pad_frames_to: int | None = None,
      cache_entries: int = 0,
      cache_bytes: int = 1 << 30,
      batch_age_s: float = 5.0,
  ):
    """``tensor_parallel=True`` (requires ``mesh``) serves a video encoder
    with the shard_map TP path (:mod:`videoprism_tpu.parallel.tp`): params
    head/hidden-sharded over the model axis, batch over the data axis, and
    the fused Pallas kernels kept per-shard — for towers too large to
    replicate per chip.  Default (False) is replicated-params data
    parallelism.

    ``quantize='int8'`` converts the transformer matmul weights to W8A8
    serving kernels (halved weight streaming/VMEM; wins at small batch on
    the large/giant towers — see ops/pallas/int8_blocks.py).  Composes
    with ``tensor_parallel``: scales shard alongside their weights and
    the int8 kernels run per-shard in partial-output mode.

    ``max_pending`` bounds the request queue: when that many requests are
    already waiting, :meth:`embed` raises :class:`ServiceOverloaded`
    immediately instead of growing an unbounded backlog (load shedding —
    a saturated service should fail fast, not accumulate latency).
    ``None`` (default) keeps the queue unbounded.

    ``unhealthy_after_errors``: after this many CONSECUTIVE failed
    batches (any success resets the streak), :meth:`healthy` flips
    False and ``/healthz`` starts returning 503 — a pod whose chip is
    gone (device claim revoked, runtime wedged) then drops out of the
    load balancer instead of serving errors forever.  Transient
    failures never trip it: one good batch restores health.

    ``exported`` (an :class:`~videoprism_tpu.export.ExportedForward` or a
    path to one saved by ``scripts/export_model.py``) replaces the jitted
    ``model.apply`` forward with the AOT StableHLO artifact: a fresh
    serving process (empty compilation cache) skips Python tracing
    entirely and starts serving after XLA's per-bucket specialization
    only.  The artifact's param signature must match ``state`` — export
    from the same checkpoint (and, if ``quantize='int8'`` here, from a
    model loaded with ``quantize='int8'``).  Export a symbolic batch
    (the default) so one artifact covers every bucket.  Incompatible
    with ``mesh``/``tensor_parallel``, whose forwards are built from
    model code.

    ``pad_frames_to=T`` accepts clips SHORTER than T frames: they pad to
    T and a ``frame_paddings`` mask rides the forward, so every length
    shares ONE compiled executable (without it, each distinct T compiles
    its own — minutes apiece over a tunneled chip) and the padded frames
    are masked out of attention/pooling exactly like the reference's
    ``frame_paddings`` semantics (not attended as if they were black
    frames).  Short clips then coalesce into the same micro-batches as
    full-length ones.  Single-program path only (no mesh/TP/exported).

    ``cache_entries=N`` (default 0 = off) memoizes :meth:`embed` results
    in a content-addressed LRU: a clip whose exact bytes were embedded
    before returns without touching the queue or the chip.  Retried
    uploads and popular content hit for free; ``cache_bytes`` bounds the
    resident size (token-level encoder outputs are large).  A
    :meth:`reload_state` clears it.  Digesting costs ~1 ms/MB host-side
    — a clear win for uint8 and file ingestion, measurable but small
    next to the fp32 wire cost it sits behind."""
    if quantize not in (None, 'int8'):
      raise ValueError(f'unknown quantize mode {quantize!r}')
    if exported is not None and (tensor_parallel or mesh is not None):
      raise ValueError(
          'exported artifacts serve the replicated single-program path; '
          'mesh/tensor_parallel forwards are built from model code')
    if pad_frames_to is not None:
      if pad_frames_to <= 0:
        raise ValueError(f'pad_frames_to must be positive, '
                         f'got {pad_frames_to}')
      if exported is not None or tensor_parallel or mesh is not None:
        raise ValueError(
            'pad_frames_to rides frame_paddings through model.apply — '
            'the single-program jit path only (no mesh/tensor_parallel/'
            'exported)')
    if quantize == 'int8':
      from videoprism_tpu import quantization

      # Under TP the tree must stay on host (see the device_put note
      # below) — quantize leaf-wise in numpy so no chip ever holds it.
      state = quantization.quantize_for_serving(
          state, on_host=tensor_parallel)
    self._model = model
    self._quantize = quantize
    self._tensor_parallel = tensor_parallel
    # True when the batch path serves a jax.export artifact (set below).
    # Long-video endpoints consult this: rerouting them onto fresh
    # model-code jits would silently defeat the cold-start artifact.
    self._exported = exported is not None
    self._pad_frames_to = pad_frames_to
    # tensor_parallel: keep the tree on host — make_tp_encoder_forward
    # device_puts each leaf straight into its sharded layout below;
    # an eager device_put here would materialize a full replica on one
    # chip, defeating TP's reason to exist for over-sized towers.
    self._state = state if tensor_parallel else jax.device_put(state)
    self._buckets = tuple(sorted(batch_buckets))
    if not self._buckets or any(b <= 0 for b in self._buckets):
      raise ValueError(f'batch_buckets must be positive ints, '
                       f'got {batch_buckets}')
    if mesh is not None:
      # Each bucket's batch is split over the data axis inside shard_map;
      # an indivisible bucket would fail at dispatch time deep inside jit.
      dp = mesh.shape[mesh_lib.DATA_AXIS]
      bad = [b for b in self._buckets if b % dp]
      if bad:
        raise ValueError(
            f'batch_buckets {bad} are not divisible by the mesh data axis '
            f'(size {dp}); every bucket must be a multiple of it')
    self._max_wait = max_wait_ms / 1000.0
    # adaptive_wait=True (default) drops the coalescing timer to zero
    # after a run of singleton dispatches — a lone low-QPS client stops
    # paying max_wait_ms of pure latency per request — and restores it
    # as soon as dispatches coalesce again (see _CoalesceGovernor).
    self._governor = _CoalesceGovernor(self._max_wait, adaptive_wait)
    self._mesh = mesh
    if max_pending is not None and max_pending <= 0:
      raise ValueError(f'max_pending must be positive, got {max_pending}')
    # Priority queue of (virtual_arrival, seq, request): interactive
    # requests rank at their real arrival time, batch-class ones at
    # arrival + batch_age_s — interactive preempts fresh batch traffic,
    # but a batch request that has aged past batch_age_s outranks newer
    # interactive arrivals, so starvation under sustained interactive
    # load is bounded by construction (one static key, no re-queueing).
    # Under load the batch tier absorbs the first batch_age_s of queue
    # wait; shedding (max_pending) stays a shared bound.
    self._queue: queue.PriorityQueue = queue.PriorityQueue(
        maxsize=max_pending or 0)
    self._seq = itertools.count()
    if batch_age_s < 0:
      raise ValueError(f'batch_age_s must be >= 0, got {batch_age_s}')
    self._batch_age_s = batch_age_s
    self._compiled: dict[int, Any] = {}
    self._thread: threading.Thread | None = None
    self._running = False
    self._stopped = False   # set by stop(); embed() then fails fast
    self._stats_lock = threading.Lock()
    self._requests_shed = 0
    self._requests_expired = 0
    self._requests_served = 0
    self._batch_priority_served = 0  # subset of served with 'batch' class
    self._batches_run = 0
    self._errors = 0
    self._reloads = 0
    if unhealthy_after_errors <= 0:
      raise ValueError(f'unhealthy_after_errors must be positive, '
                       f'got {unhealthy_after_errors}')
    self._unhealthy_after = unhealthy_after_errors
    self._consecutive_batch_errors = 0
    self._cache = (_EmbeddingCache(cache_entries, cache_bytes)
                   if cache_entries else None)
    self._batch_latencies = collections.deque(maxlen=1024)  # seconds
    self._latency = _LatencyHistogram()  # per-request, queue + batch

    def normalize(videos):
      if videos.dtype == jnp.uint8:
        # uint8 ingestion: clients ship raw bytes (4x less host->HBM
        # traffic than fp32); the [0,1] normalization runs on-device and
        # fuses into the model's input cast.
        model_dtype = getattr(getattr(self._model, 'config', None),
                              'dtype', jnp.float32)
        videos = videos.astype(model_dtype) / 255.0
      return videos

    def forward(params, videos):
      out = self._model.apply(params, normalize(videos), train=False)
      emb = out[0] if isinstance(out, tuple) else out
      return emb

    def forward_padded(params, videos, frame_paddings):
      out = self._model.apply(params, normalize(videos), train=False,
                              frame_paddings=frame_paddings)
      emb = out[0] if isinstance(out, tuple) else out
      return emb

    if tensor_parallel:
      if mesh is None:
        raise ValueError('tensor_parallel=True requires a mesh')
      from videoprism_tpu.models import classifier as vc_mod
      from videoprism_tpu.models import clip as vclip_mod
      from videoprism_tpu.parallel import tp as tp_lib

      cfg = getattr(model, 'config', None)
      raw = model._unwrap(self._state)
      if isinstance(cfg, vclip_mod.VideoCLIPConfig):
        # lvt towers: serve the vision side (encoder+aux+pooler+l2).
        tp_fwd, self._state = tp_lib.make_tp_clip_vision_forward(
            raw, cfg, mesh)
      elif isinstance(cfg, vc_mod.VideoClassifierConfig):
        tp_fwd, self._state = tp_lib.make_tp_classifier_forward(
            raw, cfg, mesh)
      elif hasattr(cfg, 'num_spatial_layers'):
        tp_fwd, self._state = tp_lib.make_tp_encoder_forward(
            raw, cfg, mesh)
      else:
        raise ValueError(
            f'tensor_parallel serving: unsupported config '
            f'{type(cfg).__name__}')
      self._forward = lambda params, videos: tp_fwd(
          params, normalize(videos))
    elif exported is not None:
      from videoprism_tpu import export as export_lib

      if isinstance(exported, (str, bytes)) or hasattr(exported,
                                                       '__fspath__'):
        import os

        exported = export_lib.ExportedForward.load(os.fspath(exported))
      # Flat in_avals are (param leaves..., video): the last aval is the
      # video spec the artifact was exported with.
      n_leaves = len(jax.tree_util.tree_leaves(
          self._model._unwrap(self._state)))
      n_artifact = len(exported.in_avals) - 1
      if n_leaves != n_artifact:
        raise ValueError(
            f'exported artifact takes {n_artifact} param leaves but the '
            f'served state has {n_leaves} — export from the same '
            f'checkpoint and the same quantize= setting you serve '
            f"(int8 states need an artifact exported from a "
            f"quantize='int8' model)")
      in_dtype = exported.in_avals[-1].dtype
      prep = jax.jit(lambda v: v.astype(in_dtype) / 255.0)

      def exported_forward(params, videos):
        if videos.dtype == jnp.uint8:
          videos = prep(videos)     # uint8 ingestion, normalized on-device
        elif videos.dtype != in_dtype:
          videos = videos.astype(in_dtype)
        return exported(params, videos)

      self._forward = exported_forward
    elif mesh is not None:
      self._forward = data_parallel_forward(forward, mesh)
    elif pad_frames_to is not None:
      # One executable for every clip length: the mask, not the shape,
      # carries the length.  Full-length clips ride zero paddings.
      self._forward_padded = jax.jit(forward_padded)
      self._forward = lambda params, videos: self._forward_padded(
          params, videos, jnp.zeros(videos.shape[:2], jnp.float32))
    else:
      self._forward = jax.jit(forward)

  # ------------------------------ lifecycle ------------------------------

  def start(self) -> None:
    self._running = True
    self._stopped = False
    self._thread = threading.Thread(target=self._loop, daemon=True)
    self._thread.start()

  def stop(self) -> None:
    """Stops the worker and fails any still-queued requests immediately
    (their callers would otherwise block until their own timeout)."""
    self._running = False
    self._stopped = True
    if self._thread is not None:
      self._thread.join(timeout=30)
      self._thread = None
    while True:
      try:
        req = self._queue.get_nowait()[2]
      except queue.Empty:
        break
      req.error = RuntimeError('service stopped before the request ran')
      req.event.set()

  def stats(self) -> dict[str, Any]:
    """Service-side counters: requests/batches/errors and batch-latency
    percentiles (seconds, last 1024 batches) — the observability hook a
    production deployment scrapes."""
    with self._stats_lock:
      lat = sorted(self._batch_latencies)
      pct = (lambda p: lat[min(int(p * len(lat)), len(lat) - 1)]
             if lat else None)
      return {
          'requests_served': self._requests_served,
          'batch_priority_served': self._batch_priority_served,
          'batches_run': self._batches_run,
          'errors': self._errors,
          'requests_shed': self._requests_shed,
          'requests_expired': self._requests_expired,
          'reloads': self._reloads,
          'queue_depth': self._queue.qsize(),
          'consecutive_batch_errors': self._consecutive_batch_errors,
          'batch_latency_p50_s': pct(0.50),
          'batch_latency_p99_s': pct(0.99),
          # Adaptive-wait governor state: ~0 means singleton dispatches
          # are skipping the coalescing timer (low load).
          'coalesce_rate': round(self._governor.rate, 4),
          # Per-REQUEST end-to-end latency (queue + batch), histogram
          # form — /metrics exports it as a Prometheus histogram.
          'request_latency': self._latency.snapshot(),
          **(self._cache.stats() if self._cache is not None else {}),
      }

  def healthy(self) -> bool:
    """False once ``unhealthy_after_errors`` consecutive batches failed
    (or the service was stopped) — the ``/healthz`` signal that pulls a
    chip-less pod out of rotation.  Any successful batch resets it."""
    if self._stopped:
      return False
    with self._stats_lock:
      return self._consecutive_batch_errors < self._unhealthy_after

  def model_code_params(self):
    """The plain (unsharded, replicated) param tree for direct model-code
    forwards, or ``None`` when the service cannot provide one.

    Long-video endpoints (classify_long / embed_long spatial reuse /
    localize_long) run jitted model code OUTSIDE the batch path.  That is
    only sound on the single-program path: under ``tensor_parallel`` the
    served state is the model-axis-sharded tree from ``parallel/tp.py``
    (feeding it to a plain jit fails), and on AOT-exported servers a
    fresh model-code jit would silently defeat the cold-start artifact.
    Callers fall back to the batch path — or reject — on ``None``."""
    if self._tensor_parallel or self._exported:
      return None
    if self._model is None or not hasattr(self._model, '_unwrap'):
      return None
    return self._model._unwrap(self._state)

  def warmup(self, clip_shape: tuple[int, int, int, int],
             dtype=np.float32) -> None:
    """Pre-compiles every bucket for the given [T, H, W, 3] clip shape
    (pass ``np.uint8`` when clients will ship raw bytes).  On a
    ``pad_frames_to`` service the frame axis warms at the pad length —
    the one executable every request length shares."""
    if self._pad_frames_to is not None:
      clip_shape = (self._pad_frames_to,) + tuple(clip_shape[1:])
    for b in self._buckets:
      video = np.zeros((b,) + clip_shape, dtype)
      np.asarray(jnp.sum(self._forward(self._state, jnp.asarray(video))))

  def reload_state(self, state) -> None:
    """Hot-swaps the served weights with zero downtime.

    The new tree goes through the same preparation as ``__init__``
    (int8 quantization if configured; device/sharded placement) and must
    match the current tree leaf-for-leaf in structure, shape, and dtype —
    so the cached per-bucket executables stay valid and no recompile
    happens.  The swap itself is one attribute assignment: an in-flight
    batch finishes on the old tree, the next batch reads the new one.
    """
    if self._quantize == 'int8':
      from videoprism_tpu import quantization

      state = quantization.quantize_for_serving(
          state, on_host=self._tensor_parallel)
    if self._tensor_parallel:
      # Place each new leaf exactly where its predecessor lives (the
      # shardings were computed once by the tp builder at __init__).
      raw = self._model._unwrap(state)
      state = jax.tree.map(
          lambda new, old: jax.device_put(new, old.sharding),
          raw, self._state)
    else:
      state = jax.device_put(state)

    old_flat, old_def = jax.tree_util.tree_flatten(self._state)
    new_flat, new_def = jax.tree_util.tree_flatten(state)
    if old_def != new_def:
      raise ValueError('reload_state: param tree structure differs from '
                       'the served model (same architecture required)')
    for o, n in zip(old_flat, new_flat):
      if o.shape != n.shape or o.dtype != n.dtype:
        raise ValueError(
            f'reload_state: leaf mismatch {n.shape}/{n.dtype} vs served '
            f'{o.shape}/{o.dtype} (same architecture required)')
    self._state = state
    if self._cache is not None:
      # Old-tree embeddings are wrong answers under the new weights.
      self._cache.clear()
    with self._stats_lock:
      self._reloads += 1

  # ------------------------------- client --------------------------------

  def embed(self, video: np.ndarray, timeout: float = 300.0,
            deadline_ms: float | None = None,
            priority: str = 'interactive') -> np.ndarray:
    """Blocking single-clip embed; batches with concurrent callers.

    ``deadline_ms`` bounds total queueing delay: if the request is still
    waiting when the deadline passes, the worker drops it without
    touching the chip and this call raises :class:`DeadlineExceeded`.
    (A request already stacked into a running batch completes normally.)

    ``priority``: ``'interactive'`` (default) or ``'batch'`` — two
    traffic classes sharing one service: interactive requests dequeue
    first while both are fresh, so offline/backfill traffic
    (``'batch'``) soaks up idle capacity without adding queue wait to
    live traffic.  A batch request that has waited ``batch_age_s``
    (service constructor, default 5 s) ages into the interactive rank —
    sustained interactive load delays batch work by at most that bound
    instead of starving it.  Within a class, FIFO.  Note the interplay
    with ``deadline_ms``: a batch request under saturating interactive
    load spends up to ``batch_age_s`` queued, so give batch traffic
    deadlines comfortably above it (or none).
    """
    t_start = time.monotonic()
    if priority not in _PRIORITY_RANK:
      raise ValueError(
          f'unknown priority {priority!r}; choose from '
          f'{sorted(_PRIORITY_RANK)}')
    video = np.asarray(video)
    if video.ndim != 4:
      raise ValueError(
          f'embed expects a single clip [T, H, W, C], got shape '
          f'{video.shape}; use embed_batch for batched input')
    if self._stopped:
      raise RuntimeError(
          'EmbeddingService was stopped; embed() would block until its '
          'timeout with no worker to serve it')
    if deadline_ms is not None and not deadline_ms > 0:
      # `not >` (rather than `<=`) also catches NaN, whose comparisons
      # are all False and would silently disable expiry.
      raise ValueError(f'deadline_ms must be positive, got {deadline_ms}')
    cache_key = None
    if self._cache is not None:
      video = np.ascontiguousarray(video)
      # Digest BEFORE any frame padding: the pad length is configuration,
      # the clip bytes are the content.
      cache_key = _EmbeddingCache.digest(
          video.data, video.shape, video.dtype.str)
      cached = self._cache.get(cache_key)
      if cached is not None:
        with self._stats_lock:
          self._latency.observe(time.monotonic() - t_start)
        return cached
    valid_frames = None
    if self._pad_frames_to is not None:
      t = video.shape[0]
      if t == 0:
        raise ValueError('clip has no frames')
      if t > self._pad_frames_to:
        raise ValueError(
            f'clip has {t} frames but the service pads to '
            f'{self._pad_frames_to}; resample longer clips client-side')
      if t < self._pad_frames_to:
        valid_frames = t
        video = np.concatenate(
            [video, np.zeros((self._pad_frames_to - t,) + video.shape[1:],
                             video.dtype)], axis=0)
    req = _Request(
        video=video, event=threading.Event(),
        deadline=(time.monotonic() + deadline_ms / 1e3
                  if deadline_ms is not None else None),
        valid_frames=valid_frames, priority=priority)
    try:
      self._queue.put_nowait(
          (t_start + (self._batch_age_s if priority == 'batch' else 0.0),
           next(self._seq), req))
    except queue.Full:
      with self._stats_lock:
        self._requests_shed += 1
      raise ServiceOverloaded(
          f'{self._queue.maxsize} requests already pending; retry with '
          'backoff') from None
    # Close the check-then-enqueue race with stop(): a request that
    # landed after the drain has no worker — fail it now rather than
    # letting the caller block until its timeout.
    if self._stopped and not req.event.is_set():
      req.error = RuntimeError(
          'EmbeddingService was stopped while the request was queued')
      req.event.set()
    if not req.event.wait(timeout):
      # Nobody is waiting anymore: flag the request so the worker drops
      # it at dequeue time instead of spending a batch slot on it (an
      # aged batch-class request could otherwise outlive this wait and
      # still consume chip time with no consumer).  Best-effort — a
      # request already stacked into a running batch completes unseen.
      req.abandoned = True
      raise TimeoutError('embedding request timed out')
    if req.error is not None:
      raise req.error
    with self._stats_lock:
      self._latency.observe(time.monotonic() - t_start)
    if cache_key is not None:
      # Copy: the result row is a view into the whole batch's output —
      # caching the view would pin the full batch array in memory.
      self._cache.put(cache_key, np.array(req.result))
    return req.result

  def embed_batch(self, videos: np.ndarray,
                  frame_paddings: np.ndarray | None = None) -> np.ndarray:
    """Direct batched path (no queueing); splits batches larger than the
    largest bucket into bucket-sized chunks.

    Chunks are pipelined two-deep: JAX dispatch is asynchronous, so chunk
    i+1's host->device transfer and compute launch overlap chunk i's
    compute and device->host fetch (the fetch is the only blocking call).
    Depth 2 bounds device memory to two in-flight input/output pairs —
    classic double buffering.

    ``frame_paddings`` ([B, T], 1.0 = padded frame) requires a
    ``pad_frames_to`` service; rows for batch-padding fill are zeros
    (their outputs are sliced off anyway).
    """
    if frame_paddings is not None and self._pad_frames_to is None:
      raise ValueError('frame_paddings needs an EmbeddingService built '
                       'with pad_frames_to=')
    max_bucket = self._buckets[-1]
    outs = []
    inflight: collections.deque = collections.deque()
    # Snapshot once: a hot reload_state landing between chunks must not
    # mix weight versions within one response.
    state = self._state

    def drain():
      out, n = inflight.popleft()
      outs.append(np.asarray(out)[:n])

    for start in range(0, videos.shape[0], max_bucket):
      chunk = videos[start:start + max_bucket]
      bucket = self._bucket_for(chunk.shape[0])
      padded = self._pad(chunk, bucket)
      if frame_paddings is not None:
        pads = self._pad(
            np.asarray(frame_paddings[start:start + max_bucket],
                       np.float32), bucket)
        out = self._forward_padded(state, jnp.asarray(padded),
                                   jnp.asarray(pads))
      else:
        out = self._forward(state, jnp.asarray(padded))
      inflight.append((out, chunk.shape[0]))
      if len(inflight) >= 2:
        drain()
    while inflight:
      drain()
    return np.concatenate(outs, axis=0)

  # ------------------------------- worker --------------------------------

  def _bucket_for(self, n: int) -> int:
    for b in self._buckets:
      if b >= n:
        return b
    return self._buckets[-1]

  @staticmethod
  def _pad(videos: np.ndarray, bucket: int) -> np.ndarray:
    if videos.shape[0] == bucket:
      return videos
    pad = bucket - videos.shape[0]
    return np.concatenate(
        [videos, np.zeros((pad,) + videos.shape[1:], videos.dtype)], axis=0)

  def _loop(self) -> None:
    while self._running:
      try:
        first = self._queue.get(timeout=0.1)[2]
      except queue.Empty:
        continue
      batch = [first]
      max_bucket = self._buckets[-1]
      # Absolute deadline: total queueing delay is bounded by max_wait,
      # not max_wait per straggler.  The governor zeroes the wait after
      # a run of singleton dispatches (low load) — but anything ALREADY
      # queued still drains below, so arrivals during the previous
      # batch's execution coalesce timer-free (self-clocking batching).
      deadline = time.monotonic() + self._governor.wait_s()
      while len(batch) < max_bucket:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
          try:
            batch.append(self._queue.get_nowait()[2])
            continue
          except queue.Empty:
            break
        try:
          batch.append(self._queue.get(timeout=remaining)[2])
        except queue.Empty:
          break
      self._governor.observe(len(batch) > 1 or not self._queue.empty())

      # Expire requests whose deadline passed while queued: the client
      # stopped waiting, so running them only delays live requests.
      now = time.monotonic()
      live = []
      for r in batch:
        if r.abandoned:
          # The waiter's embed() timeout already fired — no consumer.
          r.event.set()
          with self._stats_lock:
            self._requests_expired += 1
        elif r.deadline is not None and now > r.deadline:
          r.error = DeadlineExceeded(
              'deadline passed before the request reached the chip')
          r.event.set()
          with self._stats_lock:
            self._requests_expired += 1
        else:
          live.append(r)
      batch = live
      # Requests with different clip shapes (variable T/H/W is supported —
      # pos-emb interpolation) or dtypes (uint8 vs float) can't share one
      # stacked batch — np.stack would silently promote uint8 to float
      # WITHOUT the /255 normalization.  Group by (shape, dtype) and run
      # each group, so one odd clip never fails or corrupts the batch.
      groups: dict[tuple, list[_Request]] = {}
      for r in batch:
        groups.setdefault((r.video.shape, r.video.dtype.str), []).append(r)
      for group in groups.values():
        videos = np.stack([r.video for r in group], axis=0)
        pads = None
        if self._pad_frames_to is not None and any(
            r.valid_frames is not None for r in group):
          pads = np.zeros(videos.shape[:2], np.float32)
          for i, r in enumerate(group):
            if r.valid_frames is not None:
              pads[i, r.valid_frames:] = 1.0
        t0 = time.monotonic()
        try:
          results = self.embed_batch(videos, frame_paddings=pads)
          for r, emb in zip(group, results):
            r.result = emb
          with self._stats_lock:
            self._requests_served += len(group)
            self._batch_priority_served += sum(
                1 for r in group if r.priority == 'batch')
            self._batches_run += 1
            self._batch_latencies.append(time.monotonic() - t0)
            self._consecutive_batch_errors = 0
        except Exception as e:  # surface errors to all waiters, keep serving
          for r in group:
            r.error = e
          with self._stats_lock:
            self._errors += len(group)
            self._consecutive_batch_errors += 1
        finally:
          for r in group:
            r.event.set()
