"""HTTP front-end for :class:`videoprism_tpu.serving.EmbeddingService`.

Stdlib-only (``http.server``) so a production deployment needs nothing
beyond this repo: the threaded server turns concurrent HTTP requests into
concurrent ``service.embed`` calls, which the service's micro-batcher
coalesces into one TPU dispatch — cross-request batching falls out of the
existing queue, no extra scheduler.

Wire format (both directions):

* ``application/x-npy`` — a ``.npy`` blob (``np.save`` bytes).  The
  natural client is two lines of numpy; uint8 arrays ride the service's
  4x-cheaper raw-bytes ingestion path.
* ``application/json`` — ``{"shape": [...], "dtype": "uint8",
  "data_b64": "..."}`` with base64 raw bytes (C order).

Request bodies may additionally be gzipped (``Content-Encoding: gzip``)
— real video bytes compress ~1.5-3x, and for network-attached clients
the wire, not the chip, is the serving bottleneck (measured: the
tunneled-chip serving path saturates the host->device link at ~15 MB/s
while the chip itself embeds 50x faster).  The inflated size is capped
like the wire size, so gzip bombs are rejected with 400.

Endpoints:

* ``POST /v1/embed[?dtype=float16]`` — one clip ``[T, H, W, 3]``
  (micro-batched across concurrent callers) or a batch
  ``[B, T, H, W, 3]`` (direct pipelined path).  Response carries the
  embeddings in the request's format; ``?dtype=float16`` halves the
  response bytes (token-level encoder outputs are megabytes per clip —
  on wire-bound links the egress, not the chip, is the ceiling).
* ``POST /v1/embed_text`` — JSON ``{"texts": [...]}`` through the lvt
  text tower (requires ``text_encode_fn``, see
  :func:`videoprism_tpu.retrieval.make_text_query_encoder`).  Response:
  ``{"embeddings": [[...], ...]}``.
* ``POST /v1/search`` — JSON ``{"texts": [...], "k": 5}`` text-to-video
  retrieval against the attached :class:`videoprism_tpu.retrieval.VideoIndex`.
  Response: ``{"results": [[{"id", "score"}, ...], ...]}``.
* ``POST /v1/search_video[?k=N]`` — video-to-video similarity: the body
  is one clip (same wire formats as ``/v1/embed``); it embeds through
  the micro-batcher and queries the index.  Response as ``/v1/search``.
* ``POST /v1/embed_file[?frames=N&size=S]`` — the body is a VIDEO FILE
  (mp4/webm/...; any container FFmpeg or OpenCV can open).  The server
  decodes it (native FFmpeg decoder, `native/video_decoder.cc`),
  uniformly samples ``frames`` frames at ``size``² center-crop (defaults:
  the model's native geometry) and embeds through the micro-batcher.
  THE cheap wire path: a compressed container is 10-50x smaller than the
  raw frame array `/v1/embed` takes, and the wire — not the chip — is
  the bottleneck for network-attached clients.  Response: npy ``[D]``.
  ``?temporal_views=N&spatial_views=M`` runs the ViViT NxM multi-view
  protocol server-side (one decode, all views in one batch, eval-loop
  aggregation) for higher-fidelity embeddings/predictions.
  ``?dtype=float16`` halves the response like on ``/v1/embed``.
* ``POST /v1/zero_shot/classes`` + ``POST /v1/zero_shot?set=<id>`` —
  zero-shot classification on lvt servers: register a label set once
  (the class-name prompts run through the text tower and the ensembled
  prototypes cache server-side under a content-hash id, LRU-bounded,
  invalidated by hot weight reloads), then classify clips against it in
  one round trip with zero text-tower work per clip.  Bodies as
  ``/v1/embed`` or ``video/*`` (server-side decode, multi-view capable).
* ``POST /v1/localize`` — text-to-time moment localization on lvt
  servers started with a frames service: the body is JSON
  ``{"video": {shape,dtype,data_b64}, "queries": [...]}`` or a
  ``video/*`` container with ``?q=<query>`` (repeatable); per-frame
  pooled CLIP embeddings are swept by sliding windows against each
  query (``retrieval.localize_moments``) and the top temporal segments
  come back per query.
* ``POST /v1/index/add[?id=<id>]`` + ``/v1/index/remove`` +
  ``/v1/index/save`` — online index mutation: the body (clip array or
  ``video/*`` container) embeds through the same tower the search index
  rides and is appended under ``id`` (default: the body's content
  hash); ``remove`` deletes by id (HNSW indexes tombstone + compact on
  save) — concurrent searches keep running;
  ``save`` persists atomically to the server's configured path.
  With ``--index new[-ann]`` the server starts an empty mutable corpus:
  a self-contained vector database over the wire.
* ``POST /v1/classify[?k=N]`` — classifier servers: one clip in, softmax
  top-k ``{"class", "prob"[, "label"]}`` out (label map optional).
* ``POST /v1/embed_long[?window=&stride=&frame_stride=&per_window=1]``
  — embedding servers: a container of ANY length embeds at constant
  memory (incremental decode → windowed forwards on the service's batch
  path → l2-normalized mean of window embeddings; ``per_window=1``
  returns the raw ``[N, D]`` window embeddings).
* ``POST /v1/classify_long[?k=&window=&stride=&frame_stride=]`` —
  classifier servers: a video container of ANY length; incremental
  server-side decode + the EXACT streaming pooler
  (``streaming.classify_long_video``) at constant memory — the logits
  equal one-shot pooling of the whole token stream.
  ``/v1/classify`` and ``/v1/search_video`` also accept a ``video/*``
  body — the uploaded container decodes server-side exactly like
  ``/v1/embed_file`` (same ``?frames=&size=`` overrides).
* Traffic classes: any clip endpoint takes ``X-Priority:
  interactive|batch`` (default interactive) — batch-class requests
  dequeue after fresh interactive ones, so offline backfill shares a
  pod with live traffic without adding queue wait to it
  (``batch_priority_served`` in ``/stats``).  A batch request that has
  waited ``batch_age_s`` ages into the interactive rank, so sustained
  interactive load delays backfill by at most that bound.
* ``POST /v1/jobs?kind=classify_long|embed_long|localize_long&...`` —
  the ASYNC form of the long-video sweeps: same params/body as the sync
  endpoint, immediate ``{"job": id}`` reply, the sweep runs on the
  server's single job worker (``max_queued`` admission → 503 +
  Retry-After).  ``GET /v1/jobs/<id>`` (status + live window progress,
  bearer-gated), ``GET /v1/jobs/<id>/result`` (the sync endpoint's
  exact bytes), ``POST /v1/jobs/<id>/cancel`` (queued: immediate;
  running: cooperative interrupt at the next window boundary).
* ``POST /debug/trace?ms=N`` — capture a jax.profiler trace of the live
  process for N ms (default 500) and return the trace directory; the
  production "why is latency up" tool.  Auth-gated like all POSTs.
* ``GET /healthz`` — liveness: 200 while serving, 503 once
  ``unhealthy_after_errors`` consecutive batches failed (a pod whose
  chip is gone must drop out of the load balancer, not keep answering
  200 while every request 500s; one good batch restores it).
* ``GET /stats`` — the service's counters + latency percentiles (JSON).
* ``GET /metrics`` — the same numbers in the Prometheus text exposition
  format for scrape-based monitoring.

**Multi-model serving** — one process (one chip claim, one port) can
host several models: :meth:`EmbeddingHTTPServer.add_model` registers
additional services, each addressable at
``/v1/models/<name>/<endpoint>`` (e.g. ``/v1/models/large/embed``,
``/v1/models/k400/classify``); the bare ``/v1/...`` paths keep routing
to the default model, so single-model deployments are unchanged.  The
canonical use is a base tier for bulk + a large tier for quality, or an
embedding model + a classifier head, sharing the chip.  ``GET
/v1/models`` lists what is served; ``/stats`` nests per-model counters
and ``/metrics`` grows a ``{model="..."}`` label once more than one
model is registered; ``/healthz`` goes 503 if ANY model's service is
unhealthy (a pod serving errors on one tier must leave the LB).

The reference has no serving tier at all (SURVEY.md §5: its deployment
story stops at a Python function call); this module is part of the
north-star serving subsystem.
"""

from __future__ import annotations

import base64
import dataclasses
import inspect
import io
import json
import re
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from videoprism_tpu.serving import (
    DeadlineExceeded,
    EmbeddingService,
    ServiceOverloaded,
)

_MAX_BODY_BYTES = 1 << 30

# Model names appear in URL path segments and as Prometheus label values;
# this alphabet needs no escaping in either.
_MODEL_NAME_RE = re.compile(r'[A-Za-z0-9._-]+')


class _ZeroShotSets:
  """Per-model store of zero-shot class-prototype sets (``POST
  /v1/zero_shot/classes``): a bounded LRU keyed by the content hash of
  (classes, templates), so registering the same class list twice is
  free and distinct label sets coexist.  Entries remember the text
  tower's generation — a hot weight reload recomputes prototypes on
  next use instead of scoring clips in a stale embedding space."""

  def __init__(self, max_sets: int = 16):
    import collections

    self._lock = threading.Lock()
    self._sets = collections.OrderedDict()
    self._max = max_sets

  @staticmethod
  def set_id(classes, templates) -> str:
    import hashlib

    blob = json.dumps([list(classes), list(templates)],
                      ensure_ascii=False).encode()
    return hashlib.sha256(blob).hexdigest()[:16]

  def put(self, set_id: str, entry: dict) -> None:
    with self._lock:
      self._sets[set_id] = entry
      self._sets.move_to_end(set_id)
      while len(self._sets) > self._max:
        self._sets.popitem(last=False)

  def get(self, set_id: str) -> 'dict | None':
    with self._lock:
      entry = self._sets.get(set_id)
      if entry is not None:
        self._sets.move_to_end(set_id)
      return entry


@dataclasses.dataclass(frozen=True)
class _ModelBinding:
  """Everything the handler needs to serve one model: the micro-batched
  service plus its optional surfaces (text tower, search index,
  classifier labels) and the /v1/embed_file geometry defaults."""

  service: EmbeddingService
  text_encode_fn: 'object | None' = None   # list[str] -> [N, D]
  text_service: 'object | None' = None     # stats merge into /stats
  index: 'object | None' = None            # retrieval.VideoIndex
  index_save_path: 'str | None' = None     # enables POST /v1/index/save
  classify_enabled: bool = False
  labels: 'list | None' = None
  clip_geometry: tuple = (16, 288)
  # A frame-level EmbeddingService (retrieval.make_frame_embeddings_model)
  # enabling /v1/localize on lvt servers.
  frames_service: 'EmbeddingService | None' = None
  # Registered zero-shot class sets (lvt servers; /v1/zero_shot).
  zero_shot_sets: _ZeroShotSets = dataclasses.field(
      default_factory=_ZeroShotSets)


def _make_binding(service: EmbeddingService, *, text_encode_fn=None,
                  index=None, labels=None, text_service=None,
                  frames_service=None,
                  index_save_path=None) -> _ModelBinding:
  """Derives the per-model serving surfaces from the service's config:
  classifier models enable ``/v1/classify``; the encoder's
  ``pos_emb_shape`` sets the ``/v1/embed_file`` decode geometry."""
  from videoprism_tpu.models.classifier import VideoClassifierConfig
  from videoprism_tpu.models.registry import (
      encoder_config_of,
      native_clip_geometry,
  )

  cfg = getattr(getattr(service, '_model', None), 'config', None)
  classify_enabled = isinstance(cfg, VideoClassifierConfig)
  # /v1/embed_file geometry defaults (native frames / crop size) —
  # shared with export.py's artifact defaults via native_clip_geometry.
  if cfg is not None and hasattr(encoder_config_of(cfg), 'pos_emb_shape'):
    clip_geometry = native_clip_geometry(cfg)
  else:  # e.g. an AOT-exported service with no config attached
    clip_geometry = (16, 288)
  if labels is not None:
    if not classify_enabled:
      raise ValueError('labels= needs a classifier-model service')
    labels = list(labels)
    if len(labels) != cfg.num_classes:
      raise ValueError(f'{len(labels)} labels for a '
                       f'{cfg.num_classes}-class model')
  if frames_service is not None and text_encode_fn is None:
    raise ValueError('frames_service (localization) needs text_encode_fn '
                     '(an lvt text tower) on the same model')
  if index_save_path is not None and index is None:
    raise ValueError('index_save_path= needs an index on the same model')
  return _ModelBinding(service=service, text_encode_fn=text_encode_fn,
                       text_service=text_service, index=index,
                       index_save_path=index_save_path,
                       classify_enabled=classify_enabled, labels=labels,
                       clip_geometry=clip_geometry,
                       frames_service=frames_service)


def _array_from_json_spec(spec: dict) -> np.ndarray:
  data = base64.b64decode(spec['data_b64'])
  return np.frombuffer(data, np.dtype(spec['dtype'])).reshape(
      spec['shape'])


def _decode_body(content_type: str, body: bytes) -> np.ndarray:
  if content_type.startswith('application/json'):
    return _array_from_json_spec(json.loads(body))
  # npy is the default: np.save bytes round-trip, no pickle accepted.
  return np.load(io.BytesIO(body), allow_pickle=False)


def _response_dtype(q: dict) -> 'np.dtype | None':
  """Parses ``?dtype=`` on array-returning endpoints.  ``float16``
  halves response bytes (embeddings keep cosine to ~1e-3 — far below
  retrieval score gaps), which matters because the wire, not the chip,
  bounds network-attached serving.  Unknown values raise (→ 400)."""
  if 'dtype' not in q:
    return None
  value = q['dtype'][0]
  if value not in ('float16', 'float32'):
    raise ValueError(
        f"?dtype= must be 'float16' or 'float32', got {value!r}")
  return np.dtype(value)


def _encode_body(content_type: str, array: np.ndarray,
                 response_dtype: 'np.dtype | None' = None
                 ) -> tuple[str, bytes]:
  # bf16-serving models produce ml_dtypes.bfloat16 embeddings, which
  # numpy serializes as opaque void16 — a plain-numpy client cannot read
  # them back.  Ship anything outside the interchange dtypes as float32.
  if array.dtype.kind not in 'fiub':
    array = array.astype(np.float32)
  if response_dtype is not None and array.dtype.kind == 'f':
    array = array.astype(response_dtype)
  if content_type.startswith('application/json'):
    payload = {
        'shape': list(array.shape),
        'dtype': str(array.dtype),
        'data_b64': base64.b64encode(
            np.ascontiguousarray(array).tobytes()).decode('ascii'),
    }
    return 'application/json', json.dumps(payload).encode()
  buf = io.BytesIO()
  np.save(buf, array)
  return 'application/x-npy', buf.getvalue()


_METRIC_FAMILIES = (
    ('videoprism_requests_served_total', 'requests_served', 'counter'),
    ('videoprism_batches_run_total', 'batches_run', 'counter'),
    ('videoprism_errors_total', 'errors', 'counter'),
    ('videoprism_requests_shed_total', 'requests_shed', 'counter'),
    ('videoprism_requests_expired_total', 'requests_expired', 'counter'),
    ('videoprism_queue_depth', 'queue_depth', 'gauge'),
    ('videoprism_index_size', 'index_size', 'gauge'),
    ('videoprism_text_requests_served_total', 'text_requests_served',
     'counter'),
    ('videoprism_text_batches_run_total', 'text_batches_run', 'counter'),
    ('videoprism_text_errors_total', 'text_errors', 'counter'),
    ('videoprism_text_queue_depth', 'text_queue_depth', 'gauge'),
    ('videoprism_cache_hits_total', 'cache_hits', 'counter'),
    ('videoprism_cache_misses_total', 'cache_misses', 'counter'),
    ('videoprism_cache_entries', 'cache_entries', 'gauge'),
    ('videoprism_cache_bytes', 'cache_bytes', 'gauge'),
    ('videoprism_text_cache_hits_total', 'text_cache_hits', 'counter'),
    ('videoprism_text_cache_misses_total', 'text_cache_misses', 'counter'),
    ('videoprism_text_cache_entries', 'text_cache_entries', 'gauge'),
)


def _prometheus_metrics(per_model: 'dict[str, dict]') -> str:
  """Service stats in the Prometheus text exposition format (0.0.4) —
  ``GET /metrics`` for scrape-based monitoring; ``/stats`` keeps the
  same numbers as JSON.  With one model the output is unlabeled (so
  single-model dashboards never change); additional models add a
  ``{model="..."}`` label per time series, one ``# TYPE`` line per
  family either way (duplicates are invalid in the exposition format
  and strict scrapers reject the whole page)."""
  multi = len(per_model) > 1
  lines = []

  def labels(model: str, extra: str = '') -> str:
    parts = [f'model="{model}"'] if multi else []
    if extra:
      parts.append(extra)
    return '{' + ','.join(parts) + '}' if parts else ''

  for metric, key, kind in _METRIC_FAMILIES:
    rows = [(name, stats.get(key)) for name, stats in sorted(
        per_model.items()) if stats.get(key) is not None]
    if not rows:
      continue
    lines.append(f'# TYPE {metric} {kind}')
    for name, value in rows:
      lines.append(f'{metric}{labels(name)} {value}')
  summary_rows = []
  for name, stats in sorted(per_model.items()):
    for q, key in (('0.5', 'batch_latency_p50_s'),
                   ('0.99', 'batch_latency_p99_s')):
      if stats.get(key) is not None:
        summary_rows.append((name, q, stats[key]))
  if summary_rows:
    lines.append('# TYPE videoprism_batch_latency_seconds summary')
    for name, q, value in summary_rows:
      quantile = 'quantile="%s"' % q
      lines.append(
          f'videoprism_batch_latency_seconds{labels(name, quantile)} {value}')
  # Per-request end-to-end latency as native Prometheus histograms
  # (cumulative _bucket series + _sum/_count; quantiles via
  # histogram_quantile() on the scrape side).
  for metric, key in (
      ('videoprism_request_latency_seconds', 'request_latency'),
      ('videoprism_text_request_latency_seconds', 'text_request_latency')):
    rows = [(name, stats[key]) for name, stats in sorted(per_model.items())
            if isinstance(stats.get(key), dict)]
    if not rows:
      continue
    lines.append(f'# TYPE {metric} histogram')
    for name, hist in rows:
      cumulative = 0
      for bound, count in zip(hist['bounds_s'], hist['counts']):
        cumulative += count
        le = f'le="{bound}"'
        lines.append(f'{metric}_bucket{labels(name, le)} {cumulative}')
      cumulative += hist['counts'][-1]
      inf_label = labels(name, 'le="+Inf"')
      lines.append(f'{metric}_bucket{inf_label} {cumulative}')
      lines.append(f'{metric}_sum{labels(name)} {hist["sum_s"]}')
      lines.append(f'{metric}_count{labels(name)} {hist["count"]}')
  return '\n'.join(lines) + '\n'


def _prometheus_jobs_metrics(jobs_stats: dict) -> str:
  """Async-job counters/gauges (server-global — no model label)."""
  lines = [
      '# TYPE videoprism_jobs_run_total counter',
      f'videoprism_jobs_run_total {jobs_stats.get("jobs_run", 0)}',
      '# TYPE videoprism_jobs_failed_total counter',
      f'videoprism_jobs_failed_total {jobs_stats.get("jobs_failed", 0)}',
      '# TYPE videoprism_jobs_cancelled_total counter',
      f'videoprism_jobs_cancelled_total '
      f'{jobs_stats.get("jobs_cancelled", 0)}',
      '# TYPE videoprism_jobs_state gauge',
  ]
  states = jobs_stats.get('jobs', {})
  for state in ('queued', 'running', 'done', 'error', 'cancelled'):
    lines.append(
        f'videoprism_jobs_state{{state="{state}"}} '
        f'{states.get(state, 0)}')
  return '\n'.join(lines) + '\n'


class _Handler(BaseHTTPRequestHandler):
  # Set by EmbeddingHTTPServer: every model this server hosts, and which
  # one the bare /v1/... paths route to.
  models: 'dict[str, _ModelBinding]' = {}
  default_model: str = 'default'
  auth_token: str | None = None   # Bearer token gating the POST API
  quiet: bool = True
  trace_root: str = '/tmp/videoprism_tpu_trace'
  # Per-REQUEST model surfaces, rebound by _bind_model at the top of
  # every inference request (instance attributes shadow these class
  # defaults; one keep-alive connection may interleave models).
  service: EmbeddingService = None
  text_encode_fn = None   # list[str] -> [N, D] np.ndarray
  text_service = None     # TextEncodeService (its stats merge into /stats)
  index = None            # retrieval.VideoIndex
  index_save_path = None  # persistence target for POST /v1/index/save
  classify_enabled: bool = False  # service wraps a classifier model
  labels: list | None = None      # class-index -> name (optional)
  # (frames, size) defaults for /v1/embed_file, from the model config.
  clip_geometry: tuple | None = None
  frames_service = None           # frame-level service (/v1/localize)
  zero_shot_sets: _ZeroShotSets | None = None
  jobs = None                     # serving_jobs.JobManager (/v1/jobs)
  # jax.profiler is process-global: one capture at a time, even with
  # several servers in one process — hence a _Handler-level lock.
  _trace_lock = threading.Lock()

  protocol_version = 'HTTP/1.1'
  # Socket timeout for reading a request (headers + body).  Without it a
  # client that connects and trickles bytes (slowloris) pins a handler
  # thread forever; with it the read raises and the thread is reclaimed.
  # Generous because legitimate bodies can be hundreds of MB on slow
  # links.
  timeout = 300

  def log_message(self, fmt, *args):  # noqa: N802 (stdlib name)
    if not self.quiet:
      super().log_message(fmt, *args)

  def _read_body(self) -> bytes:
    """Reads the request body, transparently inflating ``Content-Encoding:
    gzip`` (raw video bytes compress ~1.5-3x and the wire is the serving
    bottleneck for network-attached clients — measured: the tunneled-chip
    serving path saturates the link, not the chip).  The size cap applies
    to BOTH the wire bytes and the inflated bytes, so a kilobyte-sized
    gzip bomb cannot allocate gigabytes server-side.  Raises ValueError
    on any malformed body — callers map that to HTTP 400."""
    length = int(self.headers.get('Content-Length', 0))
    if not 0 < length <= _MAX_BODY_BYTES:
      raise ValueError(f'bad Content-Length {length}')
    body = self.rfile.read(length)
    encoding = self.headers.get('Content-Encoding', 'identity').lower()
    if encoding in ('', 'identity'):
      return body
    if encoding != 'gzip':
      raise ValueError(f'unsupported Content-Encoding {encoding!r} '
                       "(only 'gzip')")
    try:
      inflater = zlib.decompressobj(wbits=31)  # gzip container
      out = inflater.decompress(body, _MAX_BODY_BYTES + 1)
    except zlib.error as e:
      raise ValueError(f'bad gzip body: {e}') from None
    if len(out) > _MAX_BODY_BYTES:
      raise ValueError('gzip body inflates past the '
                       f'{_MAX_BODY_BYTES}-byte limit')
    if not inflater.eof:
      raise ValueError('truncated gzip body')
    if inflater.unused_data:
      # A second gzip member (cat a.gz b.gz / bgzip) would otherwise be
      # silently dropped and a truncated payload decoded as if complete.
      raise ValueError('trailing data after the gzip stream '
                       '(multi-member bodies are not supported)')
    return out

  def _reply(self, status: int, content_type: str, body: bytes) -> None:
    self.send_response(status)
    self.send_header('Content-Type', content_type)
    self.send_header('Content-Length', str(len(body)))
    self.end_headers()
    self.wfile.write(body)

  def _reply_json(self, status: int, obj) -> None:
    self._reply(status, 'application/json', json.dumps(obj).encode())

  def _reject_json(self, status: int, obj) -> None:
    """Error reply for requests whose body may not have been (fully)
    read.  HTTP/1.1 keep-alive would otherwise parse the unread body
    bytes as the next request line and desync the connection, so it is
    closed after the reply."""
    self.close_connection = True
    self._reply_json(status, obj)

  def _reply_overloaded(self, e: Exception, retry_after: str = '1') -> None:
    """503 + Retry-After: the client should back off, not treat the
    shed as a server error (one implementation for every endpoint)."""
    self.send_response(503)
    body = json.dumps({'error': str(e)}).encode()
    self.send_header('Content-Type', 'application/json')
    self.send_header('Content-Length', str(len(body)))
    self.send_header('Retry-After', retry_after)
    self.end_headers()
    self.wfile.write(body)

  def _admit_long_sweep(self) -> bool:
    """Admission check for the long-video sweeps (``/v1/classify_long``,
    ``/v1/embed_long``'s spatial-reuse path, ``/v1/localize_long``).

    These run jitted model code synchronously in the request thread,
    OUTSIDE the service's batch queue — so ``max_pending`` shedding and
    ``X-Deadline-Ms`` budgets do NOT apply to them (a deliberate,
    documented bypass: a minutes-long sweep is not a micro-batchable
    clip).  What must still hold is the health contract: once the
    service has tripped unhealthy (consecutive batch failures — a
    chip-less pod), starting a long sweep would hang for minutes before
    failing.  Replies 503 + Retry-After and returns False in that case;
    the connection closes because the body was not read."""
    if self.service.healthy():
      return True
    # Body not read yet: close the connection (keep-alive would desync),
    # then the shared shed reply with a longer back-off.
    self.close_connection = True
    self._reply_overloaded(
        RuntimeError('service unhealthy: refusing to start a '
                     'long-video sweep'), retry_after='5')
    return False

  def _bind_model(self) -> bool:
    """Resolves which model this request addresses and binds its
    surfaces onto the handler instance.  ``/v1/models/<name>/<rest>``
    routes to the named model (the path is rewritten to ``/v1/<rest>``
    so every endpoint handler stays model-agnostic); any other path goes
    to the default model.  Replies 404 and returns False for an unknown
    name — before the body is read, so the connection is closed."""
    name = self.default_model
    if self.path.startswith('/v1/models/'):
      rest = self.path[len('/v1/models/'):]
      name, sep, tail = rest.partition('/')
      if not sep or not tail:
        self._reject_json(404, {
            'error': f'expected /v1/models/<name>/<endpoint>, '
                     f'got {self.path}'})
        return False
      self.path = '/v1/' + tail
    binding = self.models.get(name)
    if binding is None:
      self._reject_json(404, {'error': f'unknown model {name!r}',
                              'models': sorted(self.models)})
      return False
    self.model_name = name
    self.service = binding.service
    self.text_encode_fn = binding.text_encode_fn
    self.text_service = binding.text_service
    self.index = binding.index
    self.index_save_path = binding.index_save_path
    self.classify_enabled = binding.classify_enabled
    self.labels = binding.labels
    self.clip_geometry = binding.clip_geometry
    self.frames_service = binding.frames_service
    self.zero_shot_sets = binding.zero_shot_sets
    return True

  @staticmethod
  def _stats_of(binding: _ModelBinding) -> dict:
    stats = binding.service.stats()
    if binding.text_service is not None:
      stats.update(binding.text_service.stats())
    if binding.frames_service is not None:
      # /v1/localize rides its own EmbeddingService; surface its load
      # under a prefix so localization traffic is not invisible.
      stats.update({f'frames_{k}': v for k, v in
                    binding.frames_service.stats().items()})
    if binding.index is not None:
      stats['index_size'] = len(binding.index)
    return stats

  def _per_model_stats(self) -> 'dict[str, dict]':
    return {name: self._stats_of(b) for name, b in self.models.items()}

  def do_GET(self):  # noqa: N802
    from urllib.parse import urlparse as _urlparse

    # Dispatch on the PATH component: a query string must not defeat
    # route matching, and model-scoped forms
    # (``/v1/models/<name>/jobs...``) route through the same prefix
    # strip as POST (_bind_model rewrites self.path; the job store is
    # server-global, but the model segment must resolve).
    path_only = _urlparse(self.path).path
    if path_only.startswith('/v1/models/') and '/jobs' in path_only:
      if not self._bind_model():  # replies 404 on unknown model
        return
      path_only = _urlparse(self.path).path
    if path_only.rstrip('/') == '/v1/jobs' or path_only.startswith(
        '/v1/jobs/'):
      # Job status/results carry inference data — bearer-gated like the
      # POST surface (unlike /healthz//stats, which stay open for
      # probes and scrapers).
      if not self._authorized():
        return
      self._get_job()
      return
    if self.path in ('/', '/index.html'):
      # Built-in demo console: a static page driving the public API via
      # fetch (videoprism_tpu/serving_console.py).  Read-only text; the
      # POSTs it issues are auth-gated like any client's.
      from videoprism_tpu.serving_console import CONSOLE_HTML

      self._reply(200, 'text/html; charset=utf-8', CONSOLE_HTML.encode())
      return
    if self.path == '/openapi.json':
      from videoprism_tpu.serving_openapi import openapi_spec

      self._reply_json(200, openapi_spec())
      return
    if self.path == '/healthz':
      # Liveness tracks each service's consecutive-batch-error streak: a
      # pod whose chip is gone (claim revoked, runtime wedged) serves
      # only errors and must drop out of the load balancer, not keep
      # answering 200.  One successful batch restores health.  With
      # several models, ANY unhealthy one trips the pod.
      health = {name: getattr(b.service, 'healthy', lambda: True)()
                for name, b in self.models.items()}
      if all(health.values()):
        self._reply_json(200, {'status': 'ok'})
      elif len(self.models) == 1:
        (binding,) = self.models.values()
        self._reply_json(503, {
            'status': 'unhealthy',
            'consecutive_batch_errors':
                binding.service.stats().get('consecutive_batch_errors')})
      else:
        self._reply_json(503, {
            'status': 'unhealthy',
            'models': {name: ('ok' if ok else 'unhealthy')
                       for name, ok in sorted(health.items())}})
    elif self.path == '/stats':
      # Single model keeps the historical flat payload; more models nest
      # per-model so the counters stay attributable.
      if len(self.models) == 1:
        (binding,) = self.models.values()
        payload = self._stats_of(binding)
      else:
        payload = {'models': self._per_model_stats()}
      if self.jobs is not None:
        payload['async_jobs'] = self.jobs.stats()
      self._reply_json(200, payload)
    elif self.path == '/metrics':
      body = _prometheus_metrics(self._per_model_stats())
      if self.jobs is not None:
        body += _prometheus_jobs_metrics(self.jobs.stats())
      self._reply(200, 'text/plain; version=0.0.4', body.encode())
    elif self.path == '/v1/models':
      listing = []
      for name, b in sorted(self.models.items()):
        frames, size = b.clip_geometry
        listing.append({
            'name': name,
            'default': name == self.default_model,
            'kind': 'classifier' if b.classify_enabled else 'embedding',
            'text': b.text_encode_fn is not None,
            'search': b.index is not None,
            'localize': b.frames_service is not None,
            'clip_geometry': {'frames': frames, 'size': size},
        })
      self._reply_json(200, {'models': listing})
    else:
      self._reply_json(404, {'error': f'unknown path {self.path}'})

  def _authorized(self) -> bool:
    """Constant-time Bearer check on the POST (inference) surface.
    /healthz + /stats + /metrics stay open: liveness probes and metric
    scrapers conventionally run without credentials."""
    if self.auth_token is None:
      return True
    import hmac

    # Compare as bytes: str compare_digest raises TypeError on any
    # non-ASCII header, which would 500 instead of 401.  Headers arrive
    # latin-1-decoded from http.server, so latin-1 round-trips exactly.
    got = self.headers.get('Authorization', '').encode('latin-1', 'replace')
    want = f'Bearer {self.auth_token}'.encode('utf-8')
    if hmac.compare_digest(got, want):
      return True
    self.send_response(401)
    body = json.dumps({'error': 'missing or invalid bearer token'}).encode()
    self.send_header('Content-Type', 'application/json')
    self.send_header('Content-Length', str(len(body)))
    self.send_header('WWW-Authenticate', 'Bearer')
    self.close_connection = True  # body unread — keep-alive would desync
    self.end_headers()
    self.wfile.write(body)
    return False

  def do_POST(self):  # noqa: N802
    if not self._authorized():
      return
    if self.path.startswith('/debug/trace'):
      self._post_trace()  # process-global (jax.profiler), not per-model
      return
    if not self._bind_model():
      return
    if self.path in ('/v1/embed_text', '/v1/search'):
      self._post_text()
      return
    if self.path == '/v1/zero_shot/classes':
      self._post_zero_shot_classes()
      return
    if self.path.startswith('/v1/zero_shot'):
      self._post_zero_shot()
      return
    if self.path.startswith('/v1/jobs'):
      self._post_jobs()
      return
    if self.path.startswith('/v1/localize_long'):
      self._post_localize_long()
      return
    if self.path.startswith('/v1/localize'):
      self._post_localize()
      return
    if self.path.startswith('/v1/search_video'):
      self._post_search_video()
      return
    if self.path.startswith('/v1/index/'):
      self._post_index()
      return
    if self.path.startswith('/v1/embed_long'):
      self._post_embed_long()
      return
    if self.path.startswith('/v1/embed_file'):
      self._post_embed_file()
      return
    if self.path.startswith('/v1/classify_long'):
      self._post_classify_long()
      return
    if self.path.startswith('/v1/classify'):
      self._post_classify()
      return
    from urllib.parse import parse_qs, urlparse

    if urlparse(self.path).path != '/v1/embed':
      self._reject_json(404, {'error': f'unknown path {self.path}'})
      return
    try:
      response_dtype = _response_dtype(parse_qs(urlparse(self.path).query))
      content_type = self.headers.get('Content-Type', 'application/x-npy')
      video = _decode_body(content_type, self._read_body())
      if video.ndim not in (4, 5):
        raise ValueError(
            f'expected [T,H,W,3] or [B,T,H,W,3], got shape {video.shape}')
      # Optional queueing deadline (ms). Applies to the micro-batched
      # single-clip path; the direct batch path never queues.
      deadline_ms = self.headers.get('X-Deadline-Ms')
      if deadline_ms is not None:
        deadline_ms = float(deadline_ms)
        # NaN comparisons are all False — it would silently disable the
        # deadline; nonpositive would 500 out of service.embed. Both are
        # the client's mistake: reject here as 400.
        if not deadline_ms > 0:
          raise ValueError(
              f'X-Deadline-Ms must be a positive number, got {deadline_ms}')
      priority = self._priority()
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    try:
      if video.ndim == 4:
        emb = self.service.embed(video, deadline_ms=deadline_ms,
                                 priority=priority)
      else:
        emb = self.service.embed_batch(video)
    except DeadlineExceeded as e:  # stale request dropped unserved
      self._reply_json(504, {'error': str(e)})
      return
    except ServiceOverloaded as e:  # load shed — tell clients to back off
      self._reply_overloaded(e)
      return
    except Exception as e:  # service-side failure
      self._reply_json(500, {'error': str(e)})
      return
    ctype, body = _encode_body(content_type, np.asarray(emb),
                               response_dtype)
    self._reply(200, ctype, body)

  class _ClientFileError(ValueError):
    """Undecodable uploaded video — maps to 400, after the body is read."""

  def _file_geometry(self, q) -> tuple[int, int]:
    """(frames, size) for a file upload: model-native unless overridden
    by ``?frames=&size=``.  Raises ValueError on bad params (→ 400).

    The decoded-clip size is capped like the body size: without this, a
    small upload with ``?frames=200000&size=4096`` would make the
    server allocate the decoded array (petabyte-scale) — the same hole
    the gzip-bomb cap closes for compressed bodies."""
    frames, size = self.clip_geometry
    if 'frames' in q:
      frames = int(q['frames'][0])
    if 'size' in q:
      size = int(q['size'][0])
    tviews = int(q['temporal_views'][0]) if 'temporal_views' in q else 1
    sviews = int(q['spatial_views'][0]) if 'spatial_views' in q else 1
    if frames <= 0 or size <= 0 or tviews <= 0 or sviews <= 0:
      raise ValueError(f'frames/size/views must be positive, got '
                       f'{frames}/{size}/{tviews}x{sviews}')
    decoded = frames * size * size * 3 * tviews * sviews
    if decoded > _MAX_BODY_BYTES:
      raise ValueError(
          f'decoded views [{tviews * sviews}, {frames}, {size}, {size}, '
          f'3] would be {decoded} bytes (limit {_MAX_BODY_BYTES}); lower '
          f'?frames=/?size=/?*_views=')
    return frames, size, tviews, sviews

  def _decode_file_or_reply(self, body: bytes,
                            geom: tuple) -> 'np.ndarray | None':
    """Decodes a ``video/*`` body, or replies (400 for an undecodable
    upload, 500 for a missing decoder) and returns None.  One error
    mapping for all three file-accepting endpoints."""
    try:
      return self._decode_video_file(body, *geom)
    except self._ClientFileError as e:
      self._reply_json(400, {'error': str(e)})
    except Exception as e:  # no decoder available — server's problem
      self._reply_json(500, {'error': str(e)})
    return None

  def _decode_video_file(self, body: bytes, frames: int, size: int,
                         tviews: int = 1, sviews: int = 1) -> np.ndarray:
    """Decodes an uploaded container to a uint8 ``[frames, size, size,
    3]`` clip — or, with views requested, the ViViT NxM protocol's
    ``[tviews * sviews, frames, size, size, 3]`` view stack
    (``io.video``: native FFmpeg first, cv2 fallback).  Undecodable
    bytes raise :class:`_ClientFileError`; a missing decoder
    (ImportError) propagates — that is the server's problem, not the
    client's."""
    import os as os_mod
    import tempfile

    from videoprism_tpu.io import video as video_io

    # The decoders want a path (FFmpeg demuxers probe by content, so the
    # suffix is cosmetic).
    fd, path = tempfile.mkstemp(suffix='.mp4', prefix='videoprism_upload_')
    try:
      with os_mod.fdopen(fd, 'wb') as f:
        f.write(body)
      try:
        if tviews == 1 and sviews == 1:
          return video_io.load_video(path, num_frames=frames,
                                     target_size=size, as_uint8=True)
        return video_io.load_video_views(
            path, num_frames=frames, target_size=size,
            temporal_views=tviews, spatial_views=sviews, as_uint8=True)
      except ImportError:
        raise
      except Exception as e:
        raise self._ClientFileError(f'could not decode video: {e}') from e
    finally:
      os_mod.unlink(path)

  def _run_clip_or_views(self, video: np.ndarray,
                         deadline_ms: 'float | None' = None,
                         priority: str = 'interactive') -> np.ndarray:
    """One clip ``[T,H,W,3]`` → per-clip output via the micro-batcher;
    a view stack ``[V,T,H,W,3]`` → per-view outputs through the direct
    batch path, aggregated by the multi-view eval protocol: vector
    outputs (pooled embeddings / logits) average over views, and
    near-unit-norm rows (the l2-normalized CLIP towers) re-normalize
    after the mean (train/eval_loop._sweep_videos).  Token-level
    outputs cannot aggregate across crops — 400 via ValueError."""
    if video.ndim == 4:
      return np.asarray(self.service.embed(
          video, deadline_ms=deadline_ms, priority=priority))
    per_view = np.asarray(self.service.embed_batch(video), np.float32)
    if per_view.ndim != 2:
      raise ValueError(
          'multi-view aggregation needs a model with one output vector '
          'per clip (pooled CLIP-vision embedding or classifier logits); '
          f'this server returns shape {per_view.shape[1:]} per view')
    agg = per_view.mean(axis=0)
    norms = np.linalg.norm(per_view, axis=-1)
    if np.all(np.abs(norms - 1.0) < 1e-2):  # l2-normalized embeddings
      agg /= max(float(np.linalg.norm(agg)), 1e-12)
    return agg

  def _deadline_ms(self) -> 'float | None':
    """Parses ``X-Deadline-Ms``; raises ValueError on bad values (→
    400).  NaN comparisons are all False — NaN would silently disable
    the deadline; nonpositive would 500 out of ``service.embed``."""
    deadline_ms = self.headers.get('X-Deadline-Ms')
    if deadline_ms is None:
      return None
    deadline_ms = float(deadline_ms)
    if not deadline_ms > 0:
      raise ValueError(
          f'X-Deadline-Ms must be a positive number, got {deadline_ms}')
    return deadline_ms

  def _priority(self) -> str:
    """Parses ``X-Priority`` (``interactive`` default | ``batch``);
    raises ValueError on unknown values (→ 400).  Batch-class requests
    dequeue after every interactive one — offline/backfill traffic
    soaks idle capacity without adding queue wait to live traffic."""
    priority = self.headers.get('X-Priority', 'interactive').lower()
    if priority not in ('interactive', 'batch'):
      raise ValueError(
          f'X-Priority must be "interactive" or "batch", got {priority!r}')
    return priority

  def _post_embed_file(self) -> None:
    """``POST /v1/embed_file[?frames=N&size=S&temporal_views=N&
    spatial_views=M]`` — body is a compressed video container; decode +
    uniform frame sampling + center crop run server-side
    (``io.video.load_video``, native FFmpeg first), then the clip embeds
    through the micro-batcher exactly like ``/v1/embed``.  With views
    requested, the ViViT NxM protocol runs: all views embed in one
    batch and aggregate (mean, re-normalized for unit-norm embedding
    spaces) — the eval loops' multi-view protocol at serving time.
    Geometry defaults to the model's native ``pos_emb_shape``; decode
    failures are the client's file — 400, not 500."""
    from urllib.parse import parse_qs, urlparse

    try:
      q = parse_qs(urlparse(self.path).query)
      geom = self._file_geometry(q)
      response_dtype = _response_dtype(q)
      deadline_ms = self._deadline_ms()
      priority = self._priority()
      body = self._read_body()
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    clip = self._decode_file_or_reply(body, geom)
    if clip is None:
      return
    try:
      emb = self._run_clip_or_views(clip, deadline_ms, priority)
    except DeadlineExceeded as e:
      self._reply_json(504, {'error': str(e)})
      return
    except ServiceOverloaded as e:
      self._reply_overloaded(e)
      return
    except ValueError as e:  # view aggregation unsupported for model
      self._reply_json(400, {'error': str(e)})
      return
    except Exception as e:
      self._reply_json(500, {'error': str(e)})
      return
    ctype, out = _encode_body('application/x-npy', np.asarray(emb),
                              response_dtype)
    self._reply(200, ctype, out)

  def _window_geometry(self, q, batch_windows: int) -> tuple:
    """(window, stride, frame_stride, size) for the long-video
    endpoints, validated like :meth:`_file_geometry`: the resident
    decode buffer (``window * batch_windows`` frames at ``size``²) is
    capped against the body limit, closing the same
    allocate-petabytes-from-query-params hole."""
    frames, size = self.clip_geometry
    window = int(q['window'][0]) if 'window' in q else frames
    stride = int(q['stride'][0]) if 'stride' in q else None
    frame_stride = int(q['frame_stride'][0]) if 'frame_stride' in q else 1
    if 'size' in q:
      size = int(q['size'][0])
    if (window <= 0 or frame_stride <= 0 or size <= 0
        or (stride is not None and not 0 < stride <= window)):
      raise ValueError(
          f'bad parameters: window={window} stride={stride} '
          f'frame_stride={frame_stride} size={size}')
    resident = window * batch_windows * size * size * 3
    if resident > _MAX_BODY_BYTES:
      raise ValueError(
          f'decode buffer [{window * batch_windows}, {size}, {size}, 3] '
          f'would be {resident} bytes (limit {_MAX_BODY_BYTES}); lower '
          f'?window=/?size=')
    return window, stride, frame_stride, size

  def _with_upload(self, body: bytes, fn):
    """Writes the uploaded container to a temp file, runs ``fn(path)``,
    and maps failures (400 for the client's undecodable upload /
    ValueError, 500 otherwise).  Returns ``fn``'s result or None after
    replying."""
    import os as os_mod
    import tempfile

    fd, path = tempfile.mkstemp(suffix='.mp4', prefix='videoprism_long_')
    try:
      with os_mod.fdopen(fd, 'wb') as f:
        f.write(body)
      return fn(path)
    except ValueError as e:  # undecodable/empty upload, bad model shape
      self._reply_json(400, {'error': str(e)})
    except Exception as e:
      msg = str(e)
      self._reply_json(400 if 'decod' in msg.lower() else 500,
                       {'error': msg})
    finally:
      os_mod.unlink(path)
    return None

  def _post_embed_long(self) -> None:
    """``POST /v1/embed_long[?window=&stride=&frame_stride=&size=&
    per_window=1&dtype=float16]`` — embedding servers: a video container
    of ANY length embeds at constant memory.  Frames decode
    incrementally server-side and stream through windowed forwards on
    THIS service's batch path (so int8/bf16/bucketing apply), then the
    l2-normalized mean of the per-window embeddings comes back as npy
    ``[D]`` (``?per_window=1``: the raw ``[N, D]`` window embeddings
    instead).  Needs a model with one embedding vector per clip (the
    lvt vision tower); classifier servers use ``/v1/classify_long``.
    Runs synchronously in the request thread — budget client timeouts
    for the sweep.  NOTE: the spatial-reuse path bypasses the batch
    queue, so ``max_pending`` shedding and ``X-Deadline-Ms`` do not
    bound it (see :meth:`_admit_long_sweep`); the windowed fallback
    rides the batch path and keeps both."""
    if self.classify_enabled:
      self._reject_json(404, {'error': 'classifier servers classify '
                                       'long videos at /v1/classify_long'})
      return
    if not self._admit_long_sweep():
      return
    try:
      from urllib.parse import parse_qs, urlparse

      q = parse_qs(urlparse(self.path).query)
      content_type = self.headers.get('Content-Type', '')
      if not content_type.startswith('video/'):
        raise ValueError('/v1/embed_long takes a video/* container body '
                         '(arbitrary length, decoded server-side)')
      # ONE sweep implementation for the sync endpoint and the async
      # job tier (kind=embed_long): the job builder owns the
      # spatial-reuse-vs-batch-path decision, geometry validation, and
      # result encoding — the /v1/jobs result is the SAME bytes by
      # construction, not by parallel maintenance.
      run = self._build_embed_long_job(q)
      if run is None:
        return  # builder replied (capability 404)
      body = self._read_body()
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    result = self._with_upload(body, run)
    if result is None:
      return
    ctype, payload = result
    self._reply(200, ctype, payload)

  def _post_classify(self) -> None:
    """``POST /v1/classify[?k=N]`` — one clip through the classifier
    service: softmax top-k ``{"class", "prob"}`` (+ ``"label"`` when the
    server carries a label map).  404 on non-classifier servers."""
    if not self.classify_enabled:
      self._reject_json(404, {'error': '/v1/classify needs a classifier '
                                       'model (this server embeds)'})
      return
    try:
      from urllib.parse import parse_qs, urlparse

      q = parse_qs(urlparse(self.path).query)
      k = int(q['k'][0]) if 'k' in q else 5
      if k <= 0:
        raise ValueError(f'"k" must be positive, got {k}')
      deadline_ms = self._deadline_ms()
      priority = self._priority()
      content_type = self.headers.get('Content-Type', 'application/x-npy')
      body = self._read_body()
      if content_type.startswith('video/'):
        video, file_geom = None, self._file_geometry(q)
      else:
        video = _decode_body(content_type, body)
        if video.ndim != 4:
          raise ValueError(
              f'expected one clip [T,H,W,3], got shape {video.shape}')
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    if video is None:  # video/* body: decode the container server-side
      video = self._decode_file_or_reply(body, file_geom)
      if video is None:
        return
    try:
      # Multi-view: mean of per-view logits (the eval loops'
      # view_aggregate='logits' protocol) before the softmax.
      logits = self._run_clip_or_views(video, deadline_ms, priority)
      preds = self._topk_predictions(logits, k, self.labels)
      self._reply_json(200, {'predictions': preds})
    except DeadlineExceeded as e:
      self._reply_json(504, {'error': str(e)})
    except ServiceOverloaded as e:
      self._reply_overloaded(e)
    except Exception as e:  # service-side failure
      self._reply_json(500, {'error': str(e)})

  def _post_classify_long(self) -> None:
    """``POST /v1/classify_long[?k=&window=&stride=&frame_stride=&
    size=]`` — classifier servers: the body is a video container of ANY
    length.  The server decodes it incrementally (constant host memory)
    and classifies with the EXACT streaming pooler
    (:func:`videoprism_tpu.streaming.classify_long_video`): the encoder
    runs window-by-window at ONE compiled shape and the online-softmax
    pooler folds every window's tokens, so the logits equal one-shot
    pooling of the whole token stream — not a mean of window votes.
    Runs synchronously in the request thread (a minutes-long sweep is
    not a micro-batchable clip); budget client timeouts accordingly.
    NOTE: bypasses the batch queue — ``max_pending`` shedding and
    ``X-Deadline-Ms`` do not bound it (see :meth:`_admit_long_sweep`)."""
    if not self.classify_enabled:
      self._reject_json(404, {'error': '/v1/classify_long needs a '
                                       'classifier model'})
      return
    if not self._admit_long_sweep():
      return
    cfg = getattr(getattr(self.service, '_model', None), 'config', None)
    if cfg is None:
      self._reject_json(404, {'error': '/v1/classify_long needs model '
                                       'code (not an AOT-only service)'})
      return
    try:
      from urllib.parse import parse_qs, urlparse

      q = parse_qs(urlparse(self.path).query)
      k = int(q['k'][0]) if 'k' in q else 5
      if k <= 0:
        raise ValueError(f'"k" must be positive, got {k}')
      window, stride, frame_stride, size = self._window_geometry(
          q, batch_windows=8)  # classify_long_video's default
      content_type = self.headers.get('Content-Type', '')
      if not content_type.startswith('video/'):
        raise ValueError('/v1/classify_long takes a video/* container '
                         'body (arbitrary length, decoded server-side)')
      body = self._read_body()
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    from videoprism_tpu import streaming

    # Snapshot once: a hot reload mid-sweep must not mix weights.
    # (model_code_params: single-program servers only — TP state is
    # sharded, AOT servers must not grow fresh model-code jits.)
    params = self.service.model_code_params()
    if params is None:
      self._reject_json(404, {
          'error': '/v1/classify_long runs model code outside the batch '
                   'path and needs a single-program server (not '
                   'tensor-parallel or AOT-exported)'})
      return
    logits = self._with_upload(
        body, lambda path: streaming.classify_long_video(
            params, cfg, path, window=window, stride=stride,
            frame_stride=frame_stride, target_size=size))
    if logits is None:
      return
    preds = self._topk_predictions(logits, k, self.labels)
    self._reply_json(200, {'predictions': preds})

  @staticmethod
  def _topk_predictions(logits, k: int, labels=None) -> list:
    """Softmax top-k ``{'class', 'prob'[, 'label']}`` rows, best first."""
    logits = np.asarray(logits, np.float64)
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    k = min(k, len(probs))
    top = np.argsort(-probs)[:k]
    preds = []
    for i in top:
      entry = {'class': int(i), 'prob': round(float(probs[i]), 6)}
      if labels is not None:
        entry['label'] = str(labels[int(i)])
      preds.append(entry)
    return preds

  def _text_generation(self) -> int:
    return getattr(self.text_service, 'generation', 0)

  def _compute_zero_shot_entry(self, classes: list, templates: list) -> dict:
    """Prompt-ensembled class prototypes through the (micro-batched)
    text tower, stamped with the tower's generation."""
    from videoprism_tpu import evaluation

    generation = self._text_generation()
    prototypes = evaluation.zero_shot_classifier(
        self.text_encode_fn, classes, templates=templates)
    return {'classes': classes, 'templates': templates,
            'prototypes': prototypes, 'generation': generation}

  def _post_zero_shot_classes(self) -> None:
    """``POST /v1/zero_shot/classes`` (lvt servers) — register a label
    set for zero-shot classification: JSON ``{"classes": [...],
    "templates": [...]?}`` → the class-name prompts run through the
    text tower ONCE and the ensembled prototypes are cached server-side
    under a content-hash id.  Returns ``{"set": id, "num_classes": N}``;
    idempotent (same classes+templates → same id).  Clips then classify
    against the set via ``/v1/zero_shot?set=<id>`` without re-encoding
    the prompts — for a 400-class set the per-call saving is hundreds of
    text-tower dispatches."""
    if self.text_encode_fn is None:
      self._reject_json(404, {'error': '/v1/zero_shot needs a text '
                                       'encoder (serve an lvt model)'})
      return
    try:
      spec = json.loads(self._read_body())
      classes = spec.get('classes')
      if (not isinstance(classes, list) or not classes
          or not all(isinstance(c, str) and c for c in classes)):
        raise ValueError('"classes" must be a non-empty list of '
                         'non-empty strings')
      if len(classes) > 10000:
        raise ValueError(f'{len(classes)} classes (limit 10000)')
      templates = spec.get('templates')
      if templates is not None:
        if (not isinstance(templates, list) or not templates
            or not all(isinstance(t, str) for t in templates)):
          raise ValueError('"templates" must be a non-empty list of '
                           'strings')
        bad = [t for t in templates if '{' not in t]
        if bad:
          raise ValueError(
              f'templates need a {{}} placeholder for the class name; '
              f'bad: {bad[:3]}')
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    from videoprism_tpu import evaluation

    templates = templates or list(evaluation.DEFAULT_PROMPT_TEMPLATES)
    set_id = _ZeroShotSets.set_id(classes, templates)
    try:
      if self.zero_shot_sets.get(set_id) is None:
        self.zero_shot_sets.put(
            set_id, self._compute_zero_shot_entry(classes, templates))
    except ServiceOverloaded as e:
      self._reply_overloaded(e)
      return
    except Exception as e:  # service-side failure
      self._reply_json(500, {'error': str(e)})
      return
    self._reply_json(200, {'set': set_id, 'num_classes': len(classes)})

  def _post_zero_shot(self) -> None:
    """``POST /v1/zero_shot?set=<id>[&k=N&temperature=T]`` — zero-shot
    classification of one clip against a registered class set: the body
    is a clip (``/v1/embed`` wire formats) or a ``video/*`` container
    (decoded server-side, ``?frames=&size=&*_views=`` as in
    ``/v1/embed_file``); the pooled lvt vision embedding scores against
    the cached prototypes (cosine / temperature, softmax top-k).  One
    round trip and zero text-tower work per clip — the CLIP zero-shot
    protocol (reference colab's use case) as a serving endpoint."""
    if self.text_encode_fn is None:
      self._reject_json(404, {'error': '/v1/zero_shot needs a text '
                                       'encoder (serve an lvt model)'})
      return
    try:
      from urllib.parse import parse_qs, urlparse

      q = parse_qs(urlparse(self.path).query)
      if 'set' not in q:
        raise ValueError('missing ?set= (register the class list via '
                         'POST /v1/zero_shot/classes first)')
      set_id = q['set'][0]
      k = int(q['k'][0]) if 'k' in q else 5
      if k <= 0:
        raise ValueError(f'"k" must be positive, got {k}')
      temperature = (float(q['temperature'][0])
                     if 'temperature' in q else 0.01)
      if not temperature > 0:
        raise ValueError(f'"temperature" must be positive, '
                         f'got {temperature}')
      deadline_ms = self._deadline_ms()
      priority = self._priority()
      content_type = self.headers.get('Content-Type', 'application/x-npy')
      body = self._read_body()
      if content_type.startswith('video/'):
        video, file_geom = None, self._file_geometry(q)
      else:
        video = _decode_body(content_type, body)
        if video.ndim != 4:
          raise ValueError(
              f'expected one clip [T,H,W,3], got shape {video.shape}')
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    entry = self.zero_shot_sets.get(set_id)
    if entry is None:
      self._reply_json(404, {
          'error': f'unknown class set {set_id!r} (it may have been '
                   'evicted — re-register via /v1/zero_shot/classes)'})
      return
    if video is None:  # video/* body: decode the container server-side
      video = self._decode_file_or_reply(body, file_geom)
      if video is None:
        return
    try:
      if entry['generation'] != self._text_generation():
        # The text tower was hot-reloaded since registration: recompute
        # the prototypes in the NEW embedding space rather than scoring
        # across mismatched spaces (or failing the request).
        entry = self._compute_zero_shot_entry(
            entry['classes'], entry['templates'])
        self.zero_shot_sets.put(set_id, entry)
      emb = np.asarray(self._run_clip_or_views(video, deadline_ms, priority),
                       np.float32)
      if emb.ndim != 1:
        raise ValueError(
            'zero_shot needs a pooled-embedding (lvt) server; this '
            f'model returns shape {emb.shape} per clip')
      emb = emb / max(float(np.linalg.norm(emb)), 1e-12)
      sims = entry['prototypes'] @ emb
      preds = self._topk_predictions(sims / temperature, k,
                                     entry['classes'])
      self._reply_json(200, {'predictions': preds, 'set': set_id})
    except DeadlineExceeded as e:
      self._reply_json(504, {'error': str(e)})
    except ServiceOverloaded as e:
      self._reply_overloaded(e)
    except ValueError as e:  # view aggregation / shape — client-visible
      self._reply_json(400, {'error': str(e)})
    except Exception as e:  # service-side failure
      self._reply_json(500, {'error': str(e)})

  def _post_trace(self) -> None:
    """``POST /debug/trace?ms=N`` — capture a jax.profiler (xplane)
    trace of the live serving process for N ms (default 500) while
    traffic keeps flowing, and return the trace directory (open it in
    TensorBoard/Perfetto).  The debugging move when production latency
    regresses and you need to see what the chip is actually doing.
    Gated by the bearer token like every POST endpoint."""
    import os as os_mod
    import time as time_mod
    from urllib.parse import parse_qs, urlparse

    try:
      q = parse_qs(urlparse(self.path).query)
      ms = float(q['ms'][0]) if 'ms' in q else 500.0
      if not 0 < ms <= 30000:
        raise ValueError(f'ms must be in (0, 30000], got {ms}')
      length = int(self.headers.get('Content-Length', 0) or 0)
      if length:  # body unused; drain it to keep keep-alive in sync
        self.rfile.read(length)
    except Exception as e:
      self._reject_json(400, {'error': str(e)})
      return
    if not _Handler._trace_lock.acquire(blocking=False):
      self._reply_json(409, {'error': 'a trace capture is already running '
                                      '(jax.profiler is process-global)'})
      return
    try:
      import jax

      trace_dir = os_mod.path.join(
          self.trace_root, time_mod.strftime('%Y%m%d-%H%M%S'))
      jax.profiler.start_trace(trace_dir)
      try:
        time_mod.sleep(ms / 1000.0)
      finally:
        jax.profiler.stop_trace()
    except Exception as e:
      self._reply_json(500, {'error': str(e)})
      return
    finally:
      _Handler._trace_lock.release()
    self._reply_json(200, {'trace_dir': trace_dir, 'duration_ms': ms})

  def _post_localize(self) -> None:
    """``POST /v1/localize[?k=N&window_sizes=1,2,4&iou_threshold=T]`` —
    text-to-time moment localization (lvt servers with a frames
    service): the clip's per-frame pooled CLIP embeddings sweep against
    each query via :func:`videoprism_tpu.retrieval.localize_moments`.
    Body forms: JSON ``{"video": {shape, dtype, data_b64}, "queries":
    [...]}`` (k/window_sizes/iou_threshold may ride in the JSON too) or
    a ``video/*`` container with ``?q=<query>`` repeated (server-side
    decode; ``?frames=&size=`` as in ``/v1/embed_file`` — more frames =
    finer temporal resolution).  Response: ``{"frames": T, "results":
    [{"query", "segments": [{"start", "end", "score"}, ...]}, ...]}``
    with frame-unit segments, best first."""
    if self.frames_service is None or self.text_encode_fn is None:
      self._reject_json(404, {
          'error': '/v1/localize needs an lvt server with a frames '
                   'service (serve_embeddings --enable-localize)'})
      return
    try:
      from urllib.parse import parse_qs, urlparse

      q = parse_qs(urlparse(self.path).query)
      k = int(q['k'][0]) if 'k' in q else 3
      if k <= 0:
        raise ValueError(f'"k" must be positive, got {k}')
      iou = (float(q['iou_threshold'][0])
             if 'iou_threshold' in q else 0.5)
      windows = (tuple(int(w) for w in q['window_sizes'][0].split(','))
                 if 'window_sizes' in q else None)
      deadline_ms = self._deadline_ms()
      priority = self._priority()
      content_type = self.headers.get('Content-Type', 'application/json')
      body = self._read_body()
      if content_type.startswith('video/'):
        queries = q.get('q')
        if not queries:
          raise ValueError('video/* localize needs at least one '
                           '?q=<query> parameter')
        video, file_geom = None, self._file_geometry(q)
        if file_geom[2] != 1 or file_geom[3] != 1:
          raise ValueError('localize is temporal — multi-view '
                           'aggregation would destroy the time axis')
      elif content_type.startswith('application/json'):
        spec = json.loads(body)
        queries = spec.get('queries')
        video = _array_from_json_spec(spec['video'])
        k = int(spec.get('k', k))
        if k <= 0:
          raise ValueError(f'"k" must be positive, got {k}')
        iou = float(spec.get('iou_threshold', iou))
        if 'window_sizes' in spec:
          windows = tuple(int(w) for w in spec['window_sizes'])
      else:
        raise ValueError('localize takes application/json (clip + '
                         'queries) or video/* (+ ?q= params), '
                         f'not {content_type!r}')
      if (not isinstance(queries, list) or not queries
          or not all(isinstance(t, str) and t for t in queries)):
        raise ValueError('"queries" must be a non-empty list of '
                         'non-empty strings')
      if video is not None and video.ndim != 4:
        raise ValueError(
            f'expected one clip [T,H,W,3], got shape {video.shape}')
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    if video is None:  # video/* body: decode the container server-side
      video = self._decode_file_or_reply(body, file_geom)
      if video is None:
        return
    try:
      from videoprism_tpu import retrieval

      frame_emb = np.asarray(
          self.frames_service.embed(video, deadline_ms=deadline_ms,
                                    priority=priority),
          np.float32)
      text_emb = np.asarray(self.text_encode_fn(list(queries)))
      t = len(frame_emb)
      if windows is None:
        windows = tuple(w for w in (1, 2, 4, 8) if w <= t) or (t,)
      moments = retrieval.localize_moments(
          frame_emb, text_emb, window_sizes=windows, top_k=k,
          iou_threshold=iou)
      self._reply_json(200, {
          'frames': t,
          'results': [{'query': query, 'segments': segments}
                      for query, segments in zip(queries, moments)]})
    except DeadlineExceeded as e:
      self._reply_json(504, {'error': str(e)})
    except ServiceOverloaded as e:
      self._reply_overloaded(e)
    except ValueError as e:  # bad window sizes etc. — client-visible
      self._reply_json(400, {'error': str(e)})
    except Exception as e:  # service-side failure
      self._reply_json(500, {'error': str(e)})

  def _post_localize_long(self) -> None:
    """``POST /v1/localize_long?q=<query>[&q=...][&k=&window_sizes=&
    iou_threshold=&window=&stride=&frame_stride=&size=]`` — text-to-time
    localization over a video container of ANY length: frames decode
    incrementally and stream through fixed-shape windowed forwards into
    per-frame CLIP embeddings
    (:func:`videoprism_tpu.streaming.frame_embeddings_long`; frames in
    several windows average their embeddings — ``stride < window``
    smooths and engages per-frame spatial reuse), then each query sweeps
    them via :func:`videoprism_tpu.retrieval.localize_moments`.  Segment
    units are SAMPLED frame indices — multiply by ``frame_stride`` for
    source-frame positions.  Needs an lvt server with model code and a
    text tower; runs synchronously in the request thread.  NOTE:
    bypasses the batch queue — ``max_pending`` shedding and
    ``X-Deadline-Ms`` do not bound it (see :meth:`_admit_long_sweep`)."""
    cfg = getattr(getattr(self.service, '_model', None), 'config', None)
    from videoprism_tpu.models.clip import VideoCLIPConfig

    if (not isinstance(cfg, VideoCLIPConfig)
        or self.text_encode_fn is None):
      self._reject_json(404, {
          'error': '/v1/localize_long needs an lvt server with model '
                   'code and a text tower'})
      return
    if not self._admit_long_sweep():
      return
    try:
      from urllib.parse import parse_qs, urlparse

      q = parse_qs(urlparse(self.path).query)
      queries = q.get('q')
      if (not queries
          or not all(isinstance(t, str) and t for t in queries)):
        raise ValueError('localize_long needs at least one non-empty '
                         '?q=<query> parameter')
      k = int(q['k'][0]) if 'k' in q else 3
      if k <= 0:
        raise ValueError(f'"k" must be positive, got {k}')
      iou = (float(q['iou_threshold'][0])
             if 'iou_threshold' in q else 0.5)
      moment_windows = (
          tuple(int(w) for w in q['window_sizes'][0].split(','))
          if 'window_sizes' in q else None)
      window, stride, frame_stride, size = self._window_geometry(
          q, batch_windows=8)
      content_type = self.headers.get('Content-Type', '')
      if not content_type.startswith('video/'):
        raise ValueError('/v1/localize_long takes a video/* container '
                         'body (arbitrary length, decoded server-side)')
      body = self._read_body()
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    from videoprism_tpu import retrieval, streaming

    # Snapshot once: a hot reload mid-sweep must not mix weights.
    # (model_code_params: single-program servers only — TP state is
    # sharded, AOT servers must not grow fresh model-code jits.)
    params = self.service.model_code_params()
    if params is None:
      self._reject_json(404, {
          'error': '/v1/localize_long runs model code outside the batch '
                   'path and needs a single-program server (not '
                   'tensor-parallel or AOT-exported)'})
      return
    frame_emb = self._with_upload(
        body, lambda path: streaming.frame_embeddings_long(
            params, cfg, path, window=window, stride=stride,
            frame_stride=frame_stride, target_size=size))
    if frame_emb is None:
      return
    try:
      text_emb = np.asarray(self.text_encode_fn(list(queries)))
      t = len(frame_emb)
      if moment_windows is None:
        moment_windows = tuple(w for w in (1, 2, 4, 8) if w <= t) or (t,)
      moments = retrieval.localize_moments(
          frame_emb, text_emb, window_sizes=moment_windows, top_k=k,
          iou_threshold=iou)
      self._reply_json(200, {
          'frames': t,
          'results': [{'query': query, 'segments': segments}
                      for query, segments in zip(queries, moments)]})
    except ServiceOverloaded as e:
      self._reply_overloaded(e)
    except ValueError as e:  # bad window sizes etc. — client-visible
      self._reply_json(400, {'error': str(e)})
    except Exception as e:  # service-side failure
      self._reply_json(500, {'error': str(e)})

  # ------------------------------ async jobs ------------------------------

  def _post_jobs(self) -> None:
    """``POST /v1/jobs?kind=classify_long|embed_long|localize_long&...``
    — the async form of the long-video sweeps: same query params and
    ``video/*`` body as the sync endpoint, but the reply is an
    immediate ``{"job": id}`` and the sweep runs on the server's job
    worker (one at a time — the chip is serial).  Poll ``GET
    /v1/jobs/<id>`` (live window progress), fetch ``GET
    /v1/jobs/<id>/result`` (the exact bytes the sync endpoint would
    have sent), cancel with ``POST /v1/jobs/<id>/cancel`` (queued:
    immediate; running: cooperative interrupt at the next window
    boundary).  Admission: ``max_queued`` pending
    jobs, then 503 + Retry-After.  Decode errors surface as the job's
    ``error`` state, not a submit-time 400 (the container is only
    opened by the worker)."""
    from urllib.parse import parse_qs, urlparse

    if self.jobs is None:
      self._reject_json(404, {'error': 'job API disabled on this server'})
      return
    parsed = urlparse(self.path)
    parts = parsed.path.strip('/').split('/')
    if len(parts) == 4 and parts[3] == 'cancel':
      try:
        if int(self.headers.get('Content-Length', 0) or 0) > 0:
          self._read_body()  # drain for keep-alive
      except Exception as e:  # bad Content-Length / oversized body
        self._reject_json(400, {'error': str(e)})
        return
      state = self.jobs.cancel(parts[2])
      if state is None:
        self._reply_json(404, {'error': f'unknown job {parts[2]!r}'})
      elif state in ('cancelled', 'cancelling'):
        # queued → cancelled immediately; running → cancelling (the
        # sweep unwinds at its next window-boundary checkpoint — poll
        # the status route for the terminal 'cancelled').
        self._reply_json(200, {'job': parts[2], 'state': state})
      else:
        self._reply_json(409, {'error': f'job already finished ({state}); '
                                        'nothing to cancel',
                               'state': state})
      return
    if parts != ['v1', 'jobs']:
      self._reject_json(404, {'error': f'unknown path {parsed.path}; '
                                       'POST /v1/jobs or '
                                       '/v1/jobs/<id>/cancel'})
      return
    if not self._admit_long_sweep():
      return
    q = parse_qs(parsed.query)
    kind = q.get('kind', [''])[0]
    builders = {'classify_long': self._build_classify_long_job,
                'embed_long': self._build_embed_long_job,
                'localize_long': self._build_localize_long_job}
    if kind not in builders:
      self._reject_json(400, {'error': f'unknown kind {kind!r}; choose '
                                       f'from {sorted(builders)}'})
      return
    try:
      content_type = self.headers.get('Content-Type', '')
      if not content_type.startswith('video/'):
        raise ValueError('/v1/jobs takes a video/* container body '
                         '(decoded by the job worker)')
      run = builders[kind](q)   # may reply (404/400) and return None
      if run is None:
        return
      body = self._read_body()
    except ValueError as e:
      self._reject_json(400, {'error': str(e)})
      return
    import os as os_mod
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix='.video')
    with os_mod.fdopen(fd, 'wb') as f:
      f.write(body)
    del body
    from videoprism_tpu import serving_jobs

    try:
      job_id = self.jobs.submit(kind, lambda ctrl: run(tmp, ctrl),
                                cleanup=lambda: os_mod.unlink(tmp))
    except serving_jobs.JobQueueFull as e:
      os_mod.unlink(tmp)
      self._reply_overloaded(e, retry_after='5')
      return
    self._reply_json(200, {'job': job_id, 'kind': kind, 'state': 'queued'})

  def _build_classify_long_job(self, q):
    """Submit-time validation + a path->(content_type, bytes) closure
    capturing ONLY plain values (the handler instance dies with the
    request; the closure runs on the job worker thread)."""
    if not self.classify_enabled:
      self._reject_json(404, {'error': 'kind=classify_long needs a '
                                       'classifier model'})
      return None
    params = self.service.model_code_params()
    if params is None:
      self._reject_json(404, {
          'error': 'long-video jobs run model code outside the batch '
                   'path and need a single-program server (not '
                   'tensor-parallel or AOT-exported)'})
      return None
    k = int(q['k'][0]) if 'k' in q else 5
    if k <= 0:
      raise ValueError(f'"k" must be positive, got {k}')
    window, stride, frame_stride, size = self._window_geometry(
        q, batch_windows=8)
    cfg = self.service._model.config
    labels, topk = self.labels, self._topk_predictions

    def run(path, ctrl=None):
      from videoprism_tpu import streaming

      logits = streaming.classify_long_video(
          params, cfg, path, window=window, stride=stride,
          frame_stride=frame_stride, target_size=size, control=ctrl)
      return ('application/json',
              json.dumps({'predictions': topk(logits, k, labels)}).encode())

    return run

  def _build_embed_long_job(self, q):
    if self.classify_enabled:
      self._reject_json(404, {'error': 'classifier servers use '
                                       'kind=classify_long'})
      return None
    response_dtype = _response_dtype(q)
    batch_windows = self.service._buckets[-1]
    window, stride, frame_stride, size = self._window_geometry(
        q, batch_windows)
    per_window = q.get('per_window', ['0'])[0] not in ('0', 'false', '')
    cfg = getattr(getattr(self.service, '_model', None), 'config', None)
    params = None
    if cfg is not None and stride is not None and 0 < stride < window:
      from videoprism_tpu.models.clip import VideoCLIPConfig

      if isinstance(cfg, VideoCLIPConfig):
        params = self.service.model_code_params()  # None on TP/AOT
    service = self.service

    def run(path, ctrl=None):
      from videoprism_tpu import streaming

      if params is not None:  # overlapping windows: spatial reuse
        result = streaming.embed_long_video_cached(
            params, cfg, path, window=window, stride=stride,
            frame_stride=frame_stride, batch_windows=batch_windows,
            target_size=size, control=ctrl)
      else:
        def embed_fn(batch):
          out = np.asarray(service.embed_batch(batch))
          if out.ndim != 2:
            raise ValueError(
                'long-video embedding needs a model with one embedding '
                f'vector per clip; this server returns {out.shape[1:]} '
                'per clip')
          return out

        result = streaming.embed_video_file(
            embed_fn, path, window=window, stride=stride,
            frame_stride=frame_stride, batch_windows=batch_windows,
            target_size=size, control=ctrl)
      pooled, windows = result
      out = windows if per_window else pooled
      return _encode_body('application/x-npy', np.asarray(out),
                          response_dtype)

    return run

  def _build_localize_long_job(self, q):
    from videoprism_tpu.models.clip import VideoCLIPConfig

    cfg = getattr(getattr(self.service, '_model', None), 'config', None)
    if (not isinstance(cfg, VideoCLIPConfig)
        or self.text_encode_fn is None):
      self._reject_json(404, {
          'error': 'kind=localize_long needs an lvt server with model '
                   'code and a text tower'})
      return None
    params = self.service.model_code_params()
    if params is None:
      self._reject_json(404, {
          'error': 'long-video jobs run model code outside the batch '
                   'path and need a single-program server (not '
                   'tensor-parallel or AOT-exported)'})
      return None
    queries = q.get('q')
    if not queries or not all(isinstance(t, str) and t for t in queries):
      raise ValueError('localize_long needs at least one non-empty '
                       '?q=<query> parameter')
    k = int(q['k'][0]) if 'k' in q else 3
    if k <= 0:
      raise ValueError(f'"k" must be positive, got {k}')
    iou = float(q['iou_threshold'][0]) if 'iou_threshold' in q else 0.5
    moment_windows = (
        tuple(int(w) for w in q['window_sizes'][0].split(','))
        if 'window_sizes' in q else None)
    window, stride, frame_stride, size = self._window_geometry(
        q, batch_windows=8)
    text_fn = self.text_encode_fn

    def run(path, ctrl=None):
      from videoprism_tpu import retrieval, streaming

      frame_emb = streaming.frame_embeddings_long(
          params, cfg, path, window=window, stride=stride,
          frame_stride=frame_stride, target_size=size, control=ctrl)
      text_emb = np.asarray(text_fn(list(queries)))
      t = len(frame_emb)
      windows = moment_windows or (
          tuple(w for w in (1, 2, 4, 8) if w <= t) or (t,))
      moments = retrieval.localize_moments(
          frame_emb, text_emb, window_sizes=windows, top_k=k,
          iou_threshold=iou)
      return ('application/json', json.dumps({
          'frames': t,
          'results': [{'query': query, 'segments': segments}
                      for query, segments in zip(queries, moments)],
      }).encode())

    return run

  def _get_job(self) -> None:
    """``GET /v1/jobs`` (listing) / ``GET /v1/jobs/<id>`` (status) /
    ``GET /v1/jobs/<id>/result`` (the sweep's bytes; 409 until done,
    410 for error/cancelled)."""
    if self.jobs is None:
      self._reply_json(404, {'error': 'job API disabled on this server'})
      return
    from urllib.parse import urlparse

    parts = urlparse(self.path).path.strip('/').split('/')
    if parts == ['v1', 'jobs']:
      stats = self.jobs.stats()
      self._reply_json(200, {'jobs': self.jobs.list(),
                             'states': stats['jobs'],
                             'jobs_run': stats['jobs_run'],
                             'jobs_failed': stats['jobs_failed']})
      return
    want_result = len(parts) == 4 and parts[3] == 'result'
    if not (len(parts) == 3 or want_result):
      self._reply_json(404, {'error': 'GET /v1/jobs[/<id>[/result]]'})
      return
    if not want_result:
      # snapshot() builds the status dict under the manager lock — a
      # worker finishing concurrently can't tear it (state/timing/
      # progress are mutually consistent).
      snap = self.jobs.snapshot(parts[2])
      if snap is None:
        self._reply_json(404, {'error': f'unknown job {parts[2]!r} '
                                        '(expired or never existed)'})
        return
      self._reply_json(200, snap)
      return
    res = self.jobs.result(parts[2])
    if res is None:
      self._reply_json(404, {'error': f'unknown job {parts[2]!r} '
                                      '(expired or never existed)'})
      return
    state, content_type, payload, error = res
    if state == 'done':
      self._reply(200, content_type, payload)
    elif state in ('queued', 'running', 'cancelling'):
      self._reply_json(409, {'error': f'job is {state}; poll '
                                      f'/v1/jobs/{parts[2]} until done',
                             'state': state})
    else:  # error / cancelled
      self._reply_json(410, {'error': error or f'job {state}',
                             'state': state})

  def _post_index(self) -> None:
    """Online index mutation — the served corpus is a living collection,
    not a build-time artifact:

    * ``POST /v1/index/add[?id=<id>]`` — body is one clip (the
      ``/v1/embed`` wire formats) or a ``video/*`` container
      (server-side decode, ``?frames=&size=&*_views=`` as on
      ``/v1/embed_file``); it embeds through the SAME tower the index
      was built with and is appended under ``id`` (default: the
      content hash of the body).  Searches run concurrently — adds
      serialize behind the index's own locks.
    * ``POST /v1/index/save`` — persists the index atomically to the
      server's configured ``index_save_path`` (404 when the server was
      started without one); a crash mid-save never tears the file.
    """
    from urllib.parse import parse_qs, urlparse

    if self.index is None:
      self._reject_json(404, {'error': '/v1/index needs a video index '
                                       '(serve with --index)'})
      return
    path = urlparse(self.path).path
    if path == '/v1/index/save':
      # Drain any body so keep-alive stays usable (empty is the norm —
      # _read_body rejects Content-Length 0 by design for data routes).
      if int(self.headers.get('Content-Length', 0) or 0) > 0:
        self._read_body()
      if self.index_save_path is None:
        self._reply_json(404, {
            'error': 'index persistence is not configured '
                     '(serve with --index-save-path)'})
        return
      try:
        from videoprism_tpu.retrieval import save_index_atomic

        save_index_atomic(self.index, self.index_save_path)
      except Exception as e:
        self._reply_json(500, {'error': str(e)})
        return
      self._reply_json(200, {'path': self.index_save_path,
                             'size': len(self.index)})
      return
    if path == '/v1/index/remove':
      try:
        spec = json.loads(self._read_body())
        ids = spec['ids']
        if (not isinstance(ids, list) or not ids
            or not all(isinstance(i, str) for i in ids)):
          raise ValueError('"ids" must be a non-empty list of strings')
      except Exception as e:
        self._reject_json(400, {'error': str(e)})
        return
      try:
        removed = self.index.remove(ids)
      except Exception as e:
        self._reply_json(500, {'error': str(e)})
        return
      self._reply_json(200, {'removed': removed, 'size': len(self.index)})
      return
    if path != '/v1/index/add':
      self._reject_json(404, {'error': f'unknown path {path}'})
      return
    try:
      q = parse_qs(urlparse(self.path).query)
      video_id = q['id'][0] if 'id' in q else None
      if video_id is not None and not 0 < len(video_id) <= 512:
        raise ValueError('?id= must be 1-512 characters')
      metadata = None
      if 'meta' in q:
        # URL-encoded JSON object of scalars (e.g. meta={"camera":"c1"})
        # — attached to the row for filtered /v1/search.  Scalar values
        # enforced at WRITE time: a nested value could never match any
        # wire-form filter, so accepting it would only produce
        # confusingly unfilterable rows.
        metadata = json.loads(q['meta'][0])
        if (not isinstance(metadata, dict) or len(q['meta'][0]) > 4096
            or not all(isinstance(v, (str, int, float, bool))
                       for v in metadata.values())):
          raise ValueError('?meta= must be a JSON object of scalar '
                           'values (<= 4 KB)')
      deadline_ms = self._deadline_ms()
      priority = self._priority()
      content_type = self.headers.get('Content-Type', 'application/x-npy')
      body = self._read_body()
      if content_type.startswith('video/'):
        video, file_geom = None, self._file_geometry(q)
      else:
        video = _decode_body(content_type, body)
        if video.ndim != 4:
          raise ValueError(
              f'expected one clip [T,H,W,3], got shape {video.shape}')
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    if video_id is None:
      import hashlib

      video_id = hashlib.sha256(body).hexdigest()[:16]
    if video is None:  # video/* body: decode the container server-side
      video = self._decode_file_or_reply(body, file_geom)
      if video is None:
        return
    try:
      emb = self._run_clip_or_views(video, deadline_ms, priority)
      if np.asarray(emb).ndim != 1:
        raise ValueError(
            'indexing needs a model with one embedding vector per clip '
            '(the lvt vision tower); this server returns shape '
            f'{np.asarray(emb).shape} per clip')
      # Upsert: re-adding an id (e.g. a client retry of the same file,
      # whose content-hash default id repeats) replaces the row instead
      # of accumulating duplicates that crowd top-k results.
      replaced = self.index.remove([video_id]) > 0
      self.index.add(np.asarray(emb)[None], [video_id],
                     metadata=[metadata] if metadata else None)
    except DeadlineExceeded as e:
      self._reply_json(504, {'error': str(e)})
      return
    except ServiceOverloaded as e:
      self._reply_overloaded(e)
      return
    except ValueError as e:  # non-vector model / dim mismatch
      self._reply_json(400, {'error': str(e)})
      return
    except Exception as e:  # service-side failure
      self._reply_json(500, {'error': str(e)})
      return
    self._reply_json(200, {'id': video_id, 'size': len(self.index),
                           'replaced': replaced})

  def _post_search_video(self) -> None:
    """/v1/search_video[?k=N]: video-to-video similarity — body is one
    clip in the /v1/embed wire formats; the clip embeds through the
    micro-batched service (same tower the index was built with) and
    queries the index. Response matches /v1/search."""
    if self.index is None:
      self._reject_json(404, {'error': '/v1/search_video needs a video '
                                       'index (serve with --index)'})
      return
    try:
      from urllib.parse import parse_qs, urlparse

      q = parse_qs(urlparse(self.path).query)
      k = int(q['k'][0]) if 'k' in q else 5
      if k <= 0:
        raise ValueError(f'"k" must be positive, got {k}')
      where = None
      if 'filter' in q:
        # URL-encoded JSON (the body carries the clip, not JSON) —
        # same scalar-object semantics as /v1/search's "filter".
        where = json.loads(q['filter'][0])
        if not (isinstance(where, dict)
                and all(isinstance(v, (str, int, float, bool))
                        for v in where.values())):
          raise ValueError('?filter= must be a JSON object of scalar '
                           'key/value requirements')
        if 'where' not in inspect.signature(
            self.index.search).parameters:
          # Checked BEFORE any chip work: the request deterministically
          # fails whatever the clip contains.
          raise ValueError(
              'this index backend does not support "filter" '
              '(host VideoIndex/ANNVideoIndex corpora do)')
      deadline_ms = self._deadline_ms()
      priority = self._priority()
      content_type = self.headers.get('Content-Type', 'application/x-npy')
      body = self._read_body()
      if content_type.startswith('video/'):
        video, file_geom = None, self._file_geometry(q)
      else:
        video = _decode_body(content_type, body)
        if video.ndim != 4:
          raise ValueError(
              f'expected one clip [T,H,W,3], got shape {video.shape}')
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    if video is None:  # video/* body: decode the container server-side
      video = self._decode_file_or_reply(body, file_geom)
      if video is None:
        return
    try:
      emb = self._run_clip_or_views(video, deadline_ms, priority)
      kw = {} if where is None else {'where': where}
      # An empty mutable corpus (--index new before any /v1/index/add)
      # has no matches, not a client error.
      results = ([[]] if not len(self.index)
                 else self.index.search(np.asarray(emb), k=k, **kw))
      self._reply_json(200, {'results': [
          [{'id': i, 'score': round(s, 6)} for i, s in row]
          for row in results]})
    except DeadlineExceeded as e:
      self._reply_json(504, {'error': str(e)})
    except ServiceOverloaded as e:
      self._reply_overloaded(e)
    except ValueError as e:  # view aggregation unsupported for model
      self._reply_json(400, {'error': str(e)})
    except Exception as e:  # service-side failure
      self._reply_json(500, {'error': str(e)})

  def _post_text(self) -> None:
    """/v1/embed_text and /v1/search (both JSON-only)."""
    if self.text_encode_fn is None:
      self._reject_json(
          404, {'error': f'{self.path} needs a text encoder (serve an '
                         'lvt model with text_encode_fn)'})
      return
    if self.path == '/v1/search' and self.index is None:
      self._reject_json(404, {'error': '/v1/search needs a video index'})
      return
    try:
      spec = json.loads(self._read_body())
      texts = spec['texts'] if 'texts' in spec else [spec['text']]
      if (not isinstance(texts, list) or not texts
          or not all(isinstance(t, str) for t in texts)):
        raise ValueError('"texts" must be a non-empty list of strings')
      k = int(spec.get('k', 5))
      if self.path == '/v1/search' and k <= 0:
        raise ValueError(f'"k" must be positive, got {k}')
      where = spec.get('filter')
      if where is not None and not (
          isinstance(where, dict)
          and all(isinstance(v, (str, int, float, bool))
                  for v in where.values())):
        raise ValueError('"filter" must be a JSON object of scalar '
                         'key/value requirements')
    except Exception as e:  # malformed request — client's fault
      self._reject_json(400, {'error': str(e)})
      return
    try:
      emb = np.asarray(self.text_encode_fn(texts))
      if self.path == '/v1/embed_text':
        self._reply_json(200, {'embeddings': emb.tolist()})
        return
      # An empty mutable corpus has no matches, not a server error.
      # `where` only reaches backends that support it: the device-HBM
      # tiers keep their plain signature — a filter there is a clear
      # 400, not a TypeError-turned-500.
      if where is not None and 'where' not in inspect.signature(
          self.index.search).parameters:
        self._reject_json(400, {
            'error': 'this index backend does not support "filter" '
                     '(host VideoIndex/ANNVideoIndex corpora do)'})
        return
      kw = {} if where is None else {'where': where}
      results = ([[] for _ in texts] if not len(self.index)
                 else self.index.search(emb, k=k, **kw))
      self._reply_json(200, {'results': [
          [{'id': i, 'score': round(s, 6)} for i, s in row]
          for row in results]})
    except ServiceOverloaded as e:  # text micro-batcher sheds load too
      self._reply_overloaded(e)
    except Exception as e:  # service-side failure
      self._reply_json(500, {'error': str(e)})


class EmbeddingHTTPServer:
  """Owns a ThreadingHTTPServer bound to (host, port) and the serving
  thread.  ``port=0`` picks a free port (exposed as ``.port``)."""

  def __init__(self, service: EmbeddingService, host: str = '0.0.0.0',
               port: int = 8000, quiet: bool = True,
               text_encode_fn=None, index=None,
               auth_token: str | None = None, text_service=None,
               labels=None, model_name: str = 'default',
               frames_service=None, index_save_path=None,
               job_max_queued: int = 8, job_ttl_s: float = 3600.0):
    """``text_encode_fn`` (see ``retrieval.make_text_query_encoder``)
    enables ``/v1/embed_text``; adding ``index`` (a
    ``retrieval.VideoIndex``) enables ``/v1/search`` plus online
    ``/v1/index/add``; ``index_save_path`` enables ``POST
    /v1/index/save`` persistence to that path; ``auth_token``
    requires ``Authorization: Bearer <token>`` on the POST endpoints.

    When ``service`` wraps a classifier model, ``/v1/classify`` is
    enabled automatically; ``labels`` (class-index → name) attaches
    human-readable names to its predictions and must match the model's
    class count.

    ``service`` becomes the DEFAULT model: the bare ``/v1/...`` paths
    route to it (and to it alone until :meth:`add_model` registers
    more).  ``model_name`` is how it appears under ``/v1/models/...``
    and in per-model stats/metrics."""
    self._check_model_name(model_name)
    self._bindings: dict[str, _ModelBinding] = {
        model_name: _make_binding(service, text_encode_fn=text_encode_fn,
                                  index=index, labels=labels,
                                  text_service=text_service,
                                  frames_service=frames_service,
                                  index_save_path=index_save_path)}
    # Async long-video jobs (/v1/jobs): one worker serializing sweeps,
    # bounded admission, TTL'd results.  Server-global (job ids are
    # unique across models; the submit binds whichever model the path
    # targeted).
    from videoprism_tpu import serving_jobs

    self._jobs = serving_jobs.JobManager(max_queued=job_max_queued,
                                         ttl_s=job_ttl_s)
    # The handler class shares this dict OBJECT, so add_model's inserts
    # are visible to in-flight handlers (dict assignment is atomic).
    handler = type('BoundHandler', (_Handler,),
                   {'models': self._bindings, 'default_model': model_name,
                    'quiet': quiet, 'auth_token': auth_token,
                    'jobs': self._jobs})
    self._httpd = ThreadingHTTPServer((host, port), handler)
    self._httpd.daemon_threads = True
    self.host = host
    self.port = self._httpd.server_address[1]
    self._thread: threading.Thread | None = None

  @staticmethod
  def _check_model_name(name: str) -> None:
    if not _MODEL_NAME_RE.fullmatch(name or ''):
      raise ValueError(
          f'bad model name {name!r}: must match {_MODEL_NAME_RE.pattern} '
          '(it becomes a URL path segment and a Prometheus label value)')

  def add_model(self, name: str, service: EmbeddingService, *,
                text_encode_fn=None, index=None, labels=None,
                text_service=None, frames_service=None,
                index_save_path=None) -> None:
    """Registers another model on this server, reachable at
    ``/v1/models/<name>/<endpoint>`` — one process, one chip claim, one
    port hosting several models (a base tier for bulk + a large tier
    for quality, or an embedding model + a classifier head).  The same
    optional surfaces as ``__init__`` apply per model.  The service
    must already be ``start()``-ed (same contract as the constructor);
    models cannot be removed or replaced while serving."""
    self._check_model_name(name)
    if name in self._bindings:
      raise ValueError(f'model {name!r} is already served')
    self._bindings[name] = _make_binding(
        service, text_encode_fn=text_encode_fn, index=index, labels=labels,
        text_service=text_service, frames_service=frames_service,
        index_save_path=index_save_path)

  def start(self) -> None:
    self._thread = threading.Thread(
        target=self._httpd.serve_forever, daemon=True)
    self._thread.start()

  def serve_forever(self) -> None:
    self._httpd.serve_forever()

  def stop(self) -> None:
    self._httpd.shutdown()
    self._httpd.server_close()
    self._jobs.stop()
    if self._thread is not None:
      self._thread.join(timeout=10)
      self._thread = None
