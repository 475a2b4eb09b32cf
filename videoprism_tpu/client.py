"""Python client for the videoprism_tpu HTTP embedding service.

Stdlib-only (http.client) counterpart to :mod:`videoprism_tpu.serving_http`:
the server's load-shedding / deadline / auth contract is easy to get
wrong in a hand-rolled two-line client, so this one implements it once:

* **503 + Retry-After** (load shed) → exponential backoff capped at
  ``max_retries``, honoring the server's ``Retry-After`` hint.
* **Connection errors** retry the same way — hot weight reload and
  elastic restarts (scripts/run_elastic.py) look like brief refusals.
* **504** (queueing deadline lapsed server-side) → raises
  :class:`DeadlineExceeded`; retrying a stale request is the caller's
  decision, not the transport's.
* **401** → :class:`AuthFailed` immediately (retrying cannot help).

Wire format is ``application/x-npy`` both ways (``np.save`` bytes);
uint8 clips ride the service's 4x-cheaper raw-bytes ingestion path
unchanged, and ``compress=True`` additionally gzips clip payloads
(``Content-Encoding: gzip``) for wire-bound links.

**Persistent connections**: the server speaks HTTP/1.1 keep-alive, and
this client holds one connection per thread (``threading.local``) —
urllib would open a fresh TCP connection per request, paying a full
round-trip of setup each time (measured ~26 ms on a tunneled link,
several times the chip's own p50).  A connection gone stale between
requests (server restart, idle timeout, ``Connection: close``) is
re-dialed once, transparently.  Thread-safe: each thread owns its
connection; configuration is immutable.
"""

from __future__ import annotations

import base64
import gzip
import http.client
import io
import json
import threading
import time
import urllib.parse
from typing import Any, Sequence

import numpy as np


def _retry_after_delay(value: 'str | None') -> float:
  """Seconds to wait per a ``Retry-After`` header — both RFC 9110 forms:
  delta-seconds (``"2"``) and HTTP-date (``"Wed, 21 Oct 2026 07:28:00
  GMT"``).  Unparseable or past values yield 0.0 (the caller's own
  exponential backoff then sets the floor)."""
  if not value:
    return 0.0
  try:
    return max(0.0, float(value))
  except ValueError:
    pass
  try:
    from email.utils import parsedate_to_datetime

    import datetime as _dt

    when = parsedate_to_datetime(value)
    if when.tzinfo is None:  # RFC 9110 dates are GMT
      when = when.replace(tzinfo=_dt.timezone.utc)
    return max(0.0, (when - _dt.datetime.now(_dt.timezone.utc))
               .total_seconds())
  except Exception:
    return 0.0


class RequestError(RuntimeError):
  """HTTP-level failure; ``status`` is the code (None for transport)."""

  def __init__(self, message: str, status: int | None = None):
    super().__init__(message)
    self.status = status


class Overloaded(RequestError):
  """503 after exhausting retries — the service kept shedding load."""


class DeadlineExceeded(RequestError):
  """504 — the request's queueing deadline lapsed before it ran."""


class AuthFailed(RequestError):
  """401 — missing or wrong bearer token."""


def _npy_bytes(array: np.ndarray) -> bytes:
  buf = io.BytesIO()
  np.save(buf, np.ascontiguousarray(array))
  return buf.getvalue()


class VideoPrismClient:
  """Client for a ``scripts/serve_embeddings.py`` endpoint.

  Example::

      client = VideoPrismClient('http://host:8000', auth_token=token)
      emb = client.embed(clip_uint8)                 # [D]
      texts = client.embed_text(['a dog swimming'])  # [1, D]
      hits = client.search(['drumming'], k=5)        # [[(id, score), ...]]
  """

  def __init__(self, base_url: str, *, auth_token: str | None = None,
               timeout_s: float = 300.0, max_retries: int = 4,
               backoff_s: float = 0.25, max_backoff_s: float = 30.0,
               compress: bool = False, model: str | None = None,
               response_dtype: str | None = None,
               priority: str = 'interactive'):
    """``compress=True`` gzips clip payloads (``Content-Encoding: gzip``,
    level 1 — fast, and real video bytes still shrink ~1.5-3x).  Worth it
    when the network link to the server is the bottleneck; pure CPU
    overhead on a fast local link, and useless on incompressible
    (e.g. random/synthetic) pixels.

    ``response_dtype='float16'`` asks the server to ship embeddings at
    half width (``?dtype=`` on the embed endpoints) — the egress-side
    twin of ``compress``: token-level encoder outputs are megabytes per
    clip, and cosine moves only ~1e-3.  Embeddings come back as the
    numpy dtype the server sent (upcast with ``.astype`` if needed).

    ``model`` addresses one model on a multi-model server (the
    ``/v1/models/<name>/...`` routes); None uses the server's default
    model.  :meth:`models` lists what a server hosts.

    ``priority='batch'`` marks every request from this client as
    batch-class (``X-Priority`` header): it dequeues after all
    interactive traffic — the right setting for offline backfill /
    indexing sweeps sharing a pod with live requests."""
    if priority not in ('interactive', 'batch'):
      raise ValueError("priority must be 'interactive' or 'batch', "
                       f'got {priority!r}')
    if response_dtype not in (None, 'float16', 'float32'):
      raise ValueError("response_dtype must be None, 'float16' or "
                       f"'float32', got {response_dtype!r}")
    if max_retries < 0:
      raise ValueError(f'max_retries must be >= 0, got {max_retries}')
    self._base = base_url.rstrip('/')
    split = urllib.parse.urlsplit(self._base)
    if split.scheme not in ('http', 'https'):
      raise ValueError(f'base_url must be http(s)://, got {base_url!r}')
    self._scheme = split.scheme
    self._netloc = split.netloc
    self._base_path = split.path.rstrip('/')
    self._auth = auth_token
    self._timeout = timeout_s
    self._max_retries = max_retries
    self._backoff = backoff_s
    self._max_backoff = max_backoff_s
    self._compress = compress
    self._response_dtype = response_dtype
    self._model = model
    self._priority = priority
    self._local = threading.local()
    self._class_sets: dict[Any, str] = {}  # registered zero-shot sets

  def _api(self, suffix: str) -> str:
    """Endpoint path: at the server's default model, or — when the
    client is pinned with ``model=`` — at ``/v1/models/<name>/...``."""
    if self._model is None:
      return '/v1/' + suffix
    return f'/v1/models/{self._model}/{suffix}'

  # ----------------------------- transport ------------------------------

  def _connection(self) -> http.client.HTTPConnection:
    conn = getattr(self._local, 'conn', None)
    if conn is None:
      cls = (http.client.HTTPSConnection if self._scheme == 'https'
             else http.client.HTTPConnection)
      conn = cls(self._netloc, timeout=self._timeout)
      self._local.conn = conn
    return conn

  def _drop_connection(self) -> None:
    conn = getattr(self._local, 'conn', None)
    if conn is not None:
      try:
        conn.close()
      except Exception:
        pass
      self._local.conn = None

  def _roundtrip(self, method: str, path: str, body: bytes | None,
                 headers: dict[str, str], timeout_s: float | None = None,
                 resend_stale: bool = True):
    """One HTTP exchange over this thread's persistent connection.

    Returns ``(status, response, body_bytes)``.  A connection that went
    stale between requests (server restart, keep-alive timeout,
    half-closed socket) fails on the FIRST byte — re-dial once and
    resend; a failure on a fresh connection propagates to the caller's
    retry budget.  ``timeout_s`` overrides the client timeout for THIS
    exchange only (long-video sweeps outlive the default).
    ``resend_stale=False`` (non-idempotent requests): any transport
    failure raises instead of transparently re-sending."""
    for fresh in (False, True):
      conn = self._connection()
      if timeout_s is not None:
        conn.timeout = timeout_s
        if conn.sock is not None:
          conn.sock.settimeout(timeout_s)
      try:
        conn.request(method, self._base_path + path, body=body,
                     headers=headers)
        resp = conn.getresponse()
        data = resp.read()
      except TimeoutError:
        # A genuine request timeout must surface, not silently re-send
        # (doubling the wait and the server-side work).
        self._drop_connection()
        raise
      except (http.client.HTTPException, OSError) as e:
        # Any transport failure on a CACHED connection means it went
        # stale (server restart, keep-alive reap, half-close) — the
        # conn was known-good when cached, so re-dial once.  The same
        # failure on a fresh dial is a real error.
        self._drop_connection()
        if fresh or not resend_stale:
          raise ConnectionError(f'{type(e).__name__}: {e}') from e
        continue
      except Exception:
        self._drop_connection()  # unknown state: never reuse
        raise
      finally:
        # A one-off long timeout must not linger on the cached conn.
        if timeout_s is not None:
          conn.timeout = self._timeout
          if conn.sock is not None:
            conn.sock.settimeout(self._timeout)
      if resp.will_close:
        self._drop_connection()  # server asked to close (e.g. error reply)
      return resp.status, resp, data
    raise AssertionError('unreachable')

  def _request(self, method: str, path: str, body: bytes | None = None,
               headers: dict[str, str] | None = None,
               timeout_s: float | None = None,
               retry_network_errors: bool = True) -> bytes:
    """``retry_network_errors=False`` for NON-IDEMPOTENT requests
    (job submits): a connection that dies after delivery would re-run
    the action on retry.  503s still retry — a shed reply means the
    server did NOT accept the request."""
    hdrs = dict(headers or {})
    if self._auth:
      hdrs['Authorization'] = f'Bearer {self._auth}'
    if self._priority != 'interactive':
      hdrs['X-Priority'] = self._priority
    last_error: Exception | None = None
    if not retry_network_errors:
      # At-most-once: start from a FRESH connection (a cached keep-alive
      # conn could be stale, and stale-resend is disabled below).
      self._drop_connection()
    for attempt in range(self._max_retries + 1):
      try:
        status, resp, data = self._roundtrip(
            method, path, body, hdrs, timeout_s,
            resend_stale=retry_network_errors)
        if status < 400:
          return data
        detail = self._error_detail(status, data)
        if status == 401:
          raise AuthFailed(detail, status=401) from None
        if status == 504:
          raise DeadlineExceeded(detail, status=504) from None
        if status != 503:  # 4xx/5xx that retrying cannot fix
          raise RequestError(detail, status=status) from None
        last_error = Overloaded(detail, status=503)
        delay = _retry_after_delay(resp.getheader('Retry-After'))
      except (OSError, http.client.HTTPException) as e:
        # Includes refused connections during hot reload / elastic
        # restart; bounded by the same retry budget.
        last_error = RequestError(f'{method} {path}: {e}')
        if not retry_network_errors:
          raise last_error from None
        delay = 0.0
      if attempt == self._max_retries:
        break
      time.sleep(min(self._max_backoff,
                     max(delay, self._backoff * (2 ** attempt))))
    raise last_error  # type: ignore[misc]

  @staticmethod
  def _error_detail(status: int, body: bytes) -> str:
    try:
      payload = json.loads(body.decode('utf-8', 'replace'))
      return f'HTTP {status}: {payload.get("error", payload)}'
    except Exception:
      return f'HTTP {status}'

  def _npy_payload(self, array: np.ndarray,
                   headers: dict[str, str]) -> bytes:
    """npy-encodes a clip payload, gzipping it when ``compress=True``."""
    body = _npy_bytes(array)
    if self._compress:
      body = gzip.compress(body, compresslevel=1)
      headers['Content-Encoding'] = 'gzip'
    return body

  def _post_json(self, path: str, spec: dict[str, Any]) -> dict[str, Any]:
    body = json.dumps(spec).encode('utf-8')
    out = self._request('POST', path, body,
                        {'Content-Type': 'application/json'})
    return json.loads(out.decode('utf-8'))

  # ----------------------------- endpoints ------------------------------

  def embed(self, clip: np.ndarray,
            deadline_ms: float | None = None) -> np.ndarray:
    """One clip ``[T, H, W, 3]`` → embedding ``[D]`` (micro-batched with
    concurrent callers server-side).  ``deadline_ms`` bounds queueing
    delay; a lapse raises :class:`DeadlineExceeded`."""
    clip = np.asarray(clip)
    if clip.ndim != 4:
      raise ValueError(f'embed expects [T, H, W, 3], got {clip.shape}; '
                       'use embed_batch for batches')
    headers = {'Content-Type': 'application/x-npy'}
    if deadline_ms is not None:
      headers['X-Deadline-Ms'] = str(deadline_ms)
    body = self._npy_payload(clip, headers)
    out = self._request('POST', self._api('embed') + self._dtype_query(),
                        body, headers)
    return np.load(io.BytesIO(out), allow_pickle=False)

  def embed_batch(self, videos: np.ndarray) -> np.ndarray:
    """A batch ``[B, T, H, W, 3]`` → ``[B, D]`` via the server's direct
    pipelined path (no micro-batch queueing)."""
    videos = np.asarray(videos)
    if videos.ndim != 5:
      raise ValueError(f'embed_batch expects [B, T, H, W, 3], '
                       f'got {videos.shape}')
    headers = {'Content-Type': 'application/x-npy'}
    body = self._npy_payload(videos, headers)
    out = self._request('POST', self._api('embed') + self._dtype_query(),
                        body, headers)
    return np.load(io.BytesIO(out), allow_pickle=False)

  def embed_file(self, video: 'str | bytes',
                 frames: int | None = None,
                 size: int | None = None,
                 deadline_ms: float | None = None,
                 temporal_views: int | None = None,
                 spatial_views: int | None = None) -> np.ndarray:
    """A video FILE (path or raw container bytes) → embedding ``[D]``.

    The server decodes, samples and crops (``/v1/embed_file``) — the
    compressed container is 10-50x smaller on the wire than the raw
    frame array :meth:`embed` ships, which is the difference that
    matters when the network link, not the chip, is the bottleneck.
    ``frames``/``size`` override the server model's native geometry.
    """
    path = self._api('embed_file') + self._file_query(
        frames, size, temporal_views, spatial_views)
    path += self._dtype_query(joiner='&' if '?' in path else '?')
    headers = {'Content-Type': 'video/mp4'}
    if deadline_ms is not None:
      headers['X-Deadline-Ms'] = str(deadline_ms)
    out = self._request('POST', path, self._file_bytes(video), headers)
    return np.load(io.BytesIO(out), allow_pickle=False)

  def classify_file(self, video: 'str | bytes', k: int = 5,
                    frames: int | None = None,
                    size: int | None = None,
                    temporal_views: int | None = None,
                    spatial_views: int | None = None
                    ) -> list[dict[str, Any]]:
    """Classifier servers: a video FILE (path or container bytes) →
    softmax top-k predictions; decode runs server-side as in
    :meth:`embed_file`."""
    path = self._api(f'classify?k={k}') + self._file_query(
        frames, size, temporal_views, spatial_views, joiner='&')
    out = self._request('POST', path, self._file_bytes(video),
                        {'Content-Type': 'video/mp4'})
    return json.loads(out.decode('utf-8'))['predictions']

  def embed_long_file(self, video: 'str | bytes',
                      window: int | None = None,
                      stride: int | None = None,
                      frame_stride: int | None = None,
                      size: int | None = None,
                      per_window: bool = False,
                      timeout_s: float | None = None) -> np.ndarray:
    """Embedding servers: a video FILE of ANY length → one ``[D]``
    embedding (l2-normalized mean of windowed embeddings, constant
    server memory; ``per_window=True`` returns the ``[N, D]`` window
    embeddings instead).  Pass ``timeout_s`` for very long sweeps."""
    query = []
    for key, value in (('window', window), ('stride', stride),
                       ('frame_stride', frame_stride), ('size', size)):
      if value is not None:
        query.append(f'{key}={value}')
    if per_window:
      query.append('per_window=1')
    path = self._api('embed_long') + ('?' + '&'.join(query) if query
                                      else '')
    path += self._dtype_query(joiner='&' if '?' in path else '?')
    out = self._request('POST', path, self._file_bytes(video),
                        {'Content-Type': 'video/mp4'},
                        timeout_s=timeout_s)
    return np.load(io.BytesIO(out), allow_pickle=False)

  def classify_long_file(self, video: 'str | bytes', k: int = 5,
                         window: int | None = None,
                         stride: int | None = None,
                         frame_stride: int | None = None,
                         size: int | None = None,
                         timeout_s: float | None = None
                         ) -> list[dict[str, Any]]:
    """Classifier servers: a video FILE of ANY length → softmax top-k
    via the server's exact streaming pooler (``/v1/classify_long``) —
    windowed encoding at constant memory, pooling equal to the one-shot
    result.  A long video is a long request: pass ``timeout_s`` to
    extend this call beyond the client default."""
    query = [f'k={k}']
    for key, value in (('window', window), ('stride', stride),
                       ('frame_stride', frame_stride), ('size', size)):
      if value is not None:
        query.append(f'{key}={value}')
    out = self._request('POST', self._api('classify_long?' +
                                          '&'.join(query)),
                        self._file_bytes(video),
                        {'Content-Type': 'video/mp4'},
                        timeout_s=timeout_s)
    return json.loads(out.decode('utf-8'))['predictions']

  def localize_long_file(self, video: 'str | bytes',
                         queries: Sequence[str], k: int = 3,
                         window_sizes: Sequence[int] | None = None,
                         iou_threshold: float | None = None,
                         window: int | None = None,
                         stride: int | None = None,
                         frame_stride: int | None = None,
                         size: int | None = None,
                         timeout_s: float | None = None) -> dict[str, Any]:
    """Moment localization over a video FILE of ANY length
    (``/v1/localize_long``, lvt servers with model code): per-frame
    embeddings stream through fixed windows at constant memory —
    ``stride < window`` overlap-averages them (and engages the server's
    per-frame spatial reuse).  Segment units are SAMPLED frame indices;
    multiply by ``frame_stride`` for source frames.  Same response shape
    as :meth:`localize`.  A long video is a long request: pass
    ``timeout_s``."""
    params = [f'k={k}']
    if iou_threshold is not None:
      params.append(f'iou_threshold={iou_threshold}')
    if window_sizes is not None:
      params.append('window_sizes=' + ','.join(str(w) for w in window_sizes))
    for key, value in (('window', window), ('stride', stride),
                       ('frame_stride', frame_stride), ('size', size)):
      if value is not None:
        params.append(f'{key}={value}')
    params += ['q=' + urllib.parse.quote(t) for t in queries]
    out = self._request('POST',
                        self._api('localize_long?' + '&'.join(params)),
                        self._file_bytes(video),
                        {'Content-Type': 'video/mp4'},
                        timeout_s=timeout_s)
    return json.loads(out.decode('utf-8'))

  # ---------------------------- async jobs -----------------------------

  def submit_job(self, kind: str, video: 'str | bytes',
                 queries: Sequence[str] = (), **params) -> str:
    """Submit an async long-video sweep (``POST /v1/jobs``): same
    parameters as the synchronous ``*_long`` call of that ``kind``
    (``classify_long`` / ``embed_long`` / ``localize_long``), but the
    server replies immediately with a job id — no connection held open
    for a minutes-long sweep.  ``params`` pass through as query params
    (``window``, ``stride``, ``k``, ``per_window``...); ``queries``
    are the ``localize_long`` text queries.  Returns the job id."""
    q = [f'kind={urllib.parse.quote(kind)}']
    for key, value in sorted(params.items()):
      if value is None:
        continue
      if isinstance(value, bool):
        value = int(value)
      elif isinstance(value, (list, tuple)):
        value = ','.join(str(v) for v in value)
      q.append(f'{key}={urllib.parse.quote(str(value))}')
    q += ['q=' + urllib.parse.quote(t) for t in queries]
    # No network-error retries: a submit whose reply was lost may
    # already be enqueued — retrying would run the minutes-long sweep
    # twice.  (503 sheds still retry: a shed was never accepted.)
    out = self._request('POST', self._api('jobs?' + '&'.join(q)),
                        self._file_bytes(video),
                        {'Content-Type': 'video/mp4'},
                        retry_network_errors=False)
    return json.loads(out.decode('utf-8'))['job']

  def job_status(self, job_id: str) -> dict[str, Any]:
    """``GET /v1/jobs/<id>`` — state machine + timing."""
    out = self._request('GET', f'/v1/jobs/{job_id}', None, {})
    return json.loads(out.decode('utf-8'))

  def list_jobs(self) -> dict[str, Any]:
    """``GET /v1/jobs`` — retained jobs (newest first) + counters."""
    out = self._request('GET', '/v1/jobs', None, {})
    return json.loads(out.decode('utf-8'))

  def job_result(self, job_id: str) -> bytes:
    """``GET /v1/jobs/<id>/result`` — the finished sweep's raw bytes
    (exactly the sync endpoint's reply: npy for ``embed_long``, JSON
    otherwise).  Raises RequestError with status 409 while the job is
    still queued/running and 410 for error/cancelled jobs."""
    return self._request('GET', f'/v1/jobs/{job_id}/result', None, {})

  def cancel_job(self, job_id: str) -> dict[str, Any]:
    """``POST /v1/jobs/<id>/cancel`` — a queued job cancels
    immediately (``state: cancelled``); a RUNNING sweep is interrupted
    cooperatively at its next window boundary (``state: cancelling`` —
    poll :meth:`job_status` for the terminal ``cancelled``).  409 only
    for already-finished jobs."""
    out = self._request('POST', f'/v1/jobs/{job_id}/cancel', None, {})
    return json.loads(out.decode('utf-8'))

  def wait_job(self, job_id: str, poll_s: float = 2.0,
               timeout_s: float = 3600.0,
               on_progress=None) -> bytes:
    """Polls until the job finishes and returns its result bytes.
    Raises RequestError on job error/cancellation (with the server's
    error message) or TimeoutError after ``timeout_s``.

    ``on_progress`` (optional ``callable(done, total_or_None)``) fires
    on every poll that carries a ``progress`` field — live sweep
    progress without a second request."""
    deadline = time.monotonic() + timeout_s
    while True:
      status = self.job_status(job_id)
      if on_progress is not None and 'progress' in status:
        on_progress(status['progress']['done'],
                    status['progress'].get('total'))
      if status['state'] == 'done':
        return self.job_result(job_id)
      if status['state'] in ('error', 'cancelled'):
        raise RequestError(
            f'job {job_id} {status["state"]}: '
            f'{status.get("error", "(no detail)")}', status=410)
      if time.monotonic() >= deadline:
        raise TimeoutError(
            f'job {job_id} still {status["state"]} after {timeout_s:g}s')
      time.sleep(min(poll_s, max(0.0, deadline - time.monotonic())))

  def search_video_file(self, video: 'str | bytes', k: int = 5,
                        frames: int | None = None,
                        size: int | None = None,
                        temporal_views: int | None = None,
                        spatial_views: int | None = None
                        ) -> list[tuple[str, float]]:
    """Video-to-video similarity from a video FILE: top-k neighbors of
    the uploaded container (server-side decode as in
    :meth:`embed_file`)."""
    path = self._api(f'search_video?k={k}') + self._file_query(
        frames, size, temporal_views, spatial_views, joiner='&')
    out = self._request('POST', path, self._file_bytes(video),
                        {'Content-Type': 'video/mp4'})
    results = json.loads(out.decode('utf-8'))['results']
    return [(hit['id'], hit['score']) for hit in results[0]]

  def index_add(self, clip: np.ndarray, id: str | None = None,
                metadata: 'dict | None' = None) -> str:
    """Adds one clip ``[T, H, W, 3]`` to the server's search corpus:
    it embeds server-side (same tower the index rides) and becomes
    findable by :meth:`search` / :meth:`search_video` immediately.
    Returns the id it was stored under (default: content hash).
    ``metadata``: a JSON-scalar dict attached to the row for filtered
    search (``search(..., filter={...})``)."""
    clip = np.asarray(clip)
    if clip.ndim != 4:
      raise ValueError(f'index_add expects [T, H, W, 3], got {clip.shape}')
    headers = {'Content-Type': 'application/x-npy'}
    body = self._npy_payload(clip, headers)
    path = self._api('index/add') + self._id_query(id)
    path += self._meta_query(metadata, joiner='&' if '?' in path else '?')
    out = self._request('POST', path, body, headers)
    return json.loads(out.decode('utf-8'))['id']

  def index_add_file(self, video: 'str | bytes', id: str | None = None,
                     frames: int | None = None,
                     size: int | None = None,
                     metadata: 'dict | None' = None) -> str:
    """Adds a video FILE (path or container bytes) to the server's
    corpus — server-side decode as in :meth:`embed_file`."""
    path = self._api('index/add') + self._file_query(frames, size)
    path += self._id_query(id, joiner='&' if '?' in path else '?')
    path += self._meta_query(metadata, joiner='&' if '?' in path else '?')
    out = self._request('POST', path, self._file_bytes(video),
                        {'Content-Type': 'video/mp4'})
    return json.loads(out.decode('utf-8'))['id']

  def index_remove(self, ids: Sequence[str]) -> int:
    """Removes clips from the server's search corpus by id; returns how
    many rows were deleted (HNSW corpora tombstone and compact on
    save)."""
    out = self._request('POST', self._api('index/remove'),
                        json.dumps({'ids': list(ids)}).encode(),
                        {'Content-Type': 'application/json'})
    return json.loads(out.decode('utf-8'))['removed']

  def index_save(self) -> dict[str, Any]:
    """Persists the server's (mutated) index to its configured save
    path (``serve_embeddings --index-save-path``); returns
    ``{'path', 'size'}``."""
    out = self._request('POST', self._api('index/save'), b'',
                        {'Content-Type': 'application/json'})
    return json.loads(out.decode('utf-8'))

  @staticmethod
  def _id_query(id: 'str | None', joiner: str = '?') -> str:
    if id is None:
      return ''
    return joiner + 'id=' + urllib.parse.quote(id, safe='')

  @staticmethod
  def _meta_query(metadata: 'dict | None', joiner: str = '?') -> str:
    if metadata is None:
      return ''
    return joiner + 'meta=' + urllib.parse.quote(
        json.dumps(metadata, sort_keys=True), safe='')

  @staticmethod
  def _filter_query(filter: 'dict | None', joiner: str = '?') -> str:
    if filter is None:
      return ''
    return joiner + 'filter=' + urllib.parse.quote(
        json.dumps(filter, sort_keys=True), safe='')

  def _dtype_query(self, joiner: str = '?') -> str:
    if self._response_dtype is None:
      return ''
    return f'{joiner}dtype={self._response_dtype}'

  @staticmethod
  def _file_bytes(video: 'str | bytes') -> bytes:
    if isinstance(video, str):
      with open(video, 'rb') as f:
        return f.read()
    if not isinstance(video, (bytes, bytearray)):
      raise ValueError('expected a path or raw video bytes, '
                       f'got {type(video).__name__}')
    return bytes(video)

  @staticmethod
  def _file_query(frames: int | None, size: int | None,
                  temporal_views: int | None = None,
                  spatial_views: int | None = None,
                  joiner: str = '?') -> str:
    query = []
    if frames is not None:
      query.append(f'frames={frames}')
    if size is not None:
      query.append(f'size={size}')
    if temporal_views is not None:
      query.append(f'temporal_views={temporal_views}')
    if spatial_views is not None:
      query.append(f'spatial_views={spatial_views}')
    return joiner + '&'.join(query) if query else ''

  def embed_text(self, texts: Sequence[str]) -> np.ndarray:
    """``[N]`` strings → l2-normalized ``[N, D]`` (lvt servers only)."""
    out = self._post_json(self._api('embed_text'), {'texts': list(texts)})
    return np.asarray(out['embeddings'], np.float32)

  def search(self, texts: Sequence[str], k: int = 5,
             filter: 'dict | None' = None
             ) -> list[list[tuple[str, float]]]:
    """Text-to-video retrieval against the server's index: per query, a
    ``[(video_id, cosine_score), ...]`` list, best first.

    ``filter``: restrict to clips whose index metadata contains every
    given key/value (attached at ``index_add(..., metadata=...)``);
    non-matching corpora return empty lists."""
    spec: dict[str, Any] = {'texts': list(texts), 'k': k}
    if filter is not None:
      spec['filter'] = dict(filter)
    out = self._post_json(self._api('search'), spec)
    return [[(hit['id'], hit['score']) for hit in row]
            for row in out['results']]

  def classify(self, clip: np.ndarray,
               k: int = 5) -> list[dict[str, Any]]:
    """Classifier servers: one clip → softmax top-k predictions
    (``{'class', 'prob'[, 'label']}``, best first)."""
    clip = np.asarray(clip)
    if clip.ndim != 4:
      raise ValueError(f'classify expects [T, H, W, 3], got {clip.shape}')
    headers = {'Content-Type': 'application/x-npy'}
    body = self._npy_payload(clip, headers)
    out = self._request('POST', self._api(f'classify?k={k}'), body, headers)
    return json.loads(out.decode('utf-8'))['predictions']

  def search_video(self, clip: np.ndarray, k: int = 5,
                   filter: 'dict | None' = None
                   ) -> list[tuple[str, float]]:
    """Video-to-video similarity: one clip in, top-k neighbors out.
    ``filter``: restrict to rows whose index metadata matches (as in
    :meth:`search`)."""
    clip = np.asarray(clip)
    if clip.ndim != 4:
      raise ValueError(f'search_video expects [T, H, W, 3], '
                       f'got {clip.shape}')
    headers = {'Content-Type': 'application/x-npy'}
    body = self._npy_payload(clip, headers)
    path = self._api(f'search_video?k={k}') + self._filter_query(
        filter, joiner='&')
    out = self._request('POST', path, body, headers)
    results = json.loads(out.decode('utf-8'))['results']
    return [(hit['id'], hit['score']) for hit in results[0]]

  def register_classes(self, class_names: Sequence[str],
                       templates: Sequence[str] | None = None) -> str:
    """Registers a zero-shot label set server-side (lvt servers): the
    class-name prompts run through the text tower ONCE and the
    ensembled prototypes cache under the returned set id — clips then
    classify against it via ``zero_shot(..., remote=True)`` in one
    round trip with no per-call text work.  Idempotent and memoized
    client-side (re-registering the same set is a dict lookup)."""
    key = (tuple(class_names),
           tuple(templates) if templates is not None else None)
    cached = self._class_sets.get(key)
    if cached is not None:
      return cached
    spec: dict[str, Any] = {'classes': list(class_names)}
    if templates is not None:
      spec['templates'] = list(templates)
    out = self._post_json(self._api('zero_shot/classes'), spec)
    self._class_sets[key] = out['set']
    return out['set']

  def _zero_shot_remote(self, video, class_names, templates, k,
                        temperature, file_kwargs) -> list[dict[str, Any]]:
    if isinstance(video, np.ndarray):
      video = np.asarray(video)
      if video.ndim != 4:
        raise ValueError(f'zero_shot expects [T, H, W, 3], '
                         f'got {video.shape}')
      headers = {'Content-Type': 'application/x-npy'}
      body = self._npy_payload(video, headers)
      extra = ''
    else:
      headers = {'Content-Type': 'video/mp4'}
      body = self._file_bytes(video)
      extra = self._file_query(
          file_kwargs.get('frames'), file_kwargs.get('size'),
          file_kwargs.get('temporal_views'),
          file_kwargs.get('spatial_views'), joiner='&')

    def path(set_id: str) -> str:
      return self._api(f'zero_shot?set={set_id}&k={k}'
                       f'&temperature={temperature}') + extra

    set_id = self.register_classes(class_names, templates)
    try:
      out = self._request('POST', path(set_id), body, headers)
    except RequestError as e:
      if e.status != 404 or 'class set' not in str(e):
        raise
      # The set was evicted server-side (LRU) or the server restarted:
      # drop the memo, re-register, retry once.
      self._class_sets.pop(
          (tuple(class_names),
           tuple(templates) if templates is not None else None), None)
      out = self._request(
          'POST', path(self.register_classes(class_names, templates)),
          body, headers)
    return json.loads(out.decode('utf-8'))['predictions']

  def zero_shot(self, video: 'np.ndarray | str | bytes',
                class_names: Sequence[str], k: int = 5,
                temperature: float = 0.01,
                templates: Sequence[str] | None = None,
                remote: bool = False,
                **file_kwargs) -> list[dict[str, Any]]:
    """Zero-shot classification against an lvt server: one clip (array
    ``[T, H, W, 3]``, or a video file path / container bytes — decoded
    server-side as in :meth:`embed_file`) scored against ``class_names``
    via the CLIP protocol: prompt-ensembled class text embeddings
    (:data:`videoprism_tpu.evaluation.DEFAULT_PROMPT_TEMPLATES`),
    cosine similarities, softmax at ``temperature``.  Returns top-k
    ``{'class', 'label', 'prob'}``, best first.

    ``remote=False`` runs the protocol client-side (video + texts: two
    requests, prompts re-encoded per call).  ``remote=True`` registers
    the class set server-side once (:meth:`register_classes`) and then
    classifies in ONE round trip per clip with zero text-tower work —
    the right mode when many clips score against one label set."""
    if remote:
      return self._zero_shot_remote(video, class_names, templates, k,
                                    temperature, file_kwargs)
    from videoprism_tpu import evaluation

    video = np.asarray(video) if isinstance(video, np.ndarray) else video
    if isinstance(video, np.ndarray):
      emb = self.embed(video)
    else:
      emb = self.embed_file(video, **file_kwargs)
    emb = np.asarray(emb, np.float32).reshape(-1)
    emb /= max(float(np.linalg.norm(emb)), 1e-12)
    class_emb = evaluation.zero_shot_classifier(
        self.embed_text, class_names,
        templates=templates or evaluation.DEFAULT_PROMPT_TEMPLATES)
    sims = class_emb @ emb
    logits = sims / max(temperature, 1e-8)
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    top = np.argsort(-probs)[:min(k, len(probs))]
    return [{'class': int(i), 'label': str(class_names[i]),
             'prob': round(float(probs[i]), 6)} for i in top]

  def localize(self, video: 'np.ndarray | str | bytes',
               queries: Sequence[str], k: int = 3,
               window_sizes: Sequence[int] | None = None,
               iou_threshold: float | None = None,
               frames: int | None = None,
               size: int | None = None) -> dict[str, Any]:
    """Text-to-time moment localization (lvt servers started with
    ``--enable-localize``): WHEN does each query happen in the video.

    ``video`` is a clip array ``[T, H, W, 3]`` (sent as JSON) or a
    video file path / container bytes (decoded server-side;
    ``frames=`` sets the temporal resolution — more frames, finer
    localization).  Returns ``{'frames': T, 'results': [{'query',
    'segments': [{'start', 'end', 'score'}, ...]}, ...]}`` with
    frame-unit segments, best first; divide by ``frames`` for position
    fractions of the source duration."""
    params = [f'k={k}']
    if iou_threshold is not None:
      params.append(f'iou_threshold={iou_threshold}')
    if window_sizes is not None:
      params.append('window_sizes=' + ','.join(str(w) for w in window_sizes))
    if isinstance(video, np.ndarray):
      video = np.ascontiguousarray(video)
      if video.ndim != 4:
        raise ValueError(f'localize expects [T, H, W, 3], '
                         f'got {video.shape}')
      spec = {'video': {'shape': list(video.shape),
                        'dtype': str(video.dtype),
                        'data_b64': base64.b64encode(
                            video.tobytes()).decode('ascii')},
              'queries': list(queries)}
      out = self._request(
          'POST', self._api('localize?' + '&'.join(params)),
          json.dumps(spec).encode(), {'Content-Type': 'application/json'})
    else:
      params += ['q=' + urllib.parse.quote(t) for t in queries]
      path = (self._api('localize?' + '&'.join(params))
              + self._file_query(frames, size, joiner='&'))
      out = self._request('POST', path, self._file_bytes(video),
                          {'Content-Type': 'video/mp4'})
    return json.loads(out.decode('utf-8'))

  def healthy(self) -> bool:
    """Liveness probe; False instead of raising (monitoring loops).

    One-shot — no retry/backoff: an unhealthy server answers 503 (the
    service's consecutive-batch-error trip) and a monitoring loop wants
    that verdict immediately, not after the 503-retry budget."""
    try:
      status, _, _ = self._roundtrip('GET', '/healthz', None, {})
      return status == 200
    except Exception:
      return False

  def stats(self) -> dict[str, Any]:
    """The server's counters + latency percentiles (GET /stats)."""
    return json.loads(self._request('GET', '/stats').decode('utf-8'))

  def models(self) -> list[dict[str, Any]]:
    """What the server hosts (GET /v1/models): per model its name,
    kind (embedding/classifier), whether text/search are enabled, the
    native clip geometry, and which one is the default.  Pass a name as
    ``VideoPrismClient(..., model=name)`` to address it."""
    out = json.loads(self._request('GET', '/v1/models').decode('utf-8'))
    return out['models']
