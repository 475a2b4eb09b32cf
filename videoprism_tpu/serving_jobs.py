"""Async jobs for long-video sweeps: submit → poll → fetch result.

The synchronous long-video endpoints (``/v1/classify_long``,
``/v1/embed_long``, ``/v1/localize_long``) run a minutes-long sweep in
the HTTP request thread — a deliberate, documented bypass of the batch
queue, but one that forces clients to hold a connection open for the
whole sweep and gives the server no backpressure story beyond the
health trip.  The job tier is the production answer:

* ``POST /v1/jobs?kind=<kind>&...``  — same query params and ``video/*``
  body as the sync endpoint; returns ``{"job": id}`` immediately.
* ``GET  /v1/jobs/<id>``             — state machine
  (queued → running → done | error | cancelled) + timing + live
  ``progress`` (``{"done": w, "total": W}``; ``total`` null until the
  sweep can count its windows).
* ``GET  /v1/jobs/<id>/result``      — the EXACT bytes the sync endpoint
  would have replied (npy for embed_long, JSON otherwise), 409 until
  done.
* ``POST /v1/jobs/<id>/cancel``      — cancels a queued job immediately;
  a RUNNING sweep is interrupted cooperatively at its next window
  boundary (state ``cancelling`` until the worker observes the flag,
  then ``cancelled``; the partial result is discarded).

One worker thread serializes sweeps (the chip is serial anyway);
``max_queued`` bounds admission (429-free: the shed is a 503 +
Retry-After like every other overload); finished jobs persist
``ttl_s`` seconds and are then evicted — BY THE WORKER's idle timer,
not only on API traffic, so a quiet pod's finished payloads
(size-bounded by ``max_result_bytes`` per job) really are released
within ``ttl_s`` + one eviction interval.

Cooperative cancellation + progress ride one object: the worker passes
a :class:`JobControl` to sweeps that accept an argument
(``run(ctrl)``), and the sweep calls ``ctrl.checkpoint(done, total)``
at each window-batch boundary — which records progress and raises
:class:`JobCancelled` once a cancel was requested.  Zero-arg ``run``
closures stay supported (no progress, cancel applies only while
queued).

This module is HTTP-agnostic: the handler packages a ``run`` closure
returning ``(content_type, payload_bytes)``; everything here is plain
threads + locks, testable without sockets.

Weights snapshot semantics: the handler's job closures capture the
served param tree at SUBMIT time — a hot reload (``reload_state`` /
SIGHUP) while jobs are queued does not retroactively retarget them; each
job runs against the weights that were live when it was accepted (the
same snapshot rule the sync sweeps follow).
"""

from __future__ import annotations

import dataclasses
import inspect
import queue
import threading
import time
import uuid
from typing import Any, Callable


class JobQueueFull(Exception):
  """Admission bound hit — shed with Retry-After, like the batch path."""


class JobCancelled(Exception):
  """Raised inside a sweep by :meth:`JobControl.checkpoint` once a
  cancel was requested — unwinds the sweep at a window boundary; the
  worker maps it to the ``cancelled`` terminal state (never ``error``)."""


class JobControl:
  """Per-job cooperative cancel + progress handle.

  The sweep calls :meth:`checkpoint` at each window-batch boundary
  (seconds apart — one window batch is the natural interruption
  granularity); anything finer buys nothing because the chip dispatch
  is already in flight.  ``total`` may be ``None`` while unknown (a
  live stream has no frame count); report it as soon as it is.
  """

  def __init__(self, on_progress: Callable[[int, int | None], None],
               cancel_event: threading.Event):
    self._on_progress = on_progress
    self._cancel = cancel_event

  def should_stop(self) -> bool:
    return self._cancel.is_set()

  def checkpoint(self, done: int, total: int | None = None) -> None:
    """Records progress, then raises :class:`JobCancelled` if a cancel
    was requested.  Progress is recorded FIRST so the terminal status
    still shows how far the sweep got."""
    self._on_progress(done, total)
    if self._cancel.is_set():
      raise JobCancelled('cancel requested')


@dataclasses.dataclass
class Job:
  id: str
  kind: str
  state: str = 'queued'      # queued | running | done | error | cancelled
  created_s: float = 0.0
  started_s: float | None = None
  finished_s: float | None = None
  error: str | None = None
  content_type: str | None = None
  payload: bytes | None = None
  progress_done: int | None = None
  progress_total: int | None = None
  cancel_requested: bool = False
  # The deferred sweep; cleared once run (or cancelled) so captured
  # upload buffers free promptly.
  run: Callable[..., tuple[str, bytes]] | None = None
  cleanup: Callable[[], None] | None = None
  cancel_event: threading.Event = dataclasses.field(
      default_factory=threading.Event)

  def public(self) -> dict[str, Any]:
    """Wire-facing snapshot.  Callers MUST hold the manager lock (use
    :meth:`JobManager.snapshot`) — the worker mutates these fields
    concurrently and a lock-free read can tear (e.g. ``finished_s``
    present while ``state`` still reads ``running``)."""
    state = self.state
    if state == 'running' and self.cancel_requested:
      state = 'cancelling'
    out = {'job': self.id, 'kind': self.kind, 'state': state,
           'created_s': round(self.created_s, 3)}
    if self.started_s is not None:
      out['started_s'] = round(self.started_s, 3)
    if self.finished_s is not None:
      out['finished_s'] = round(self.finished_s, 3)
      out['runtime_s'] = round(
          self.finished_s - (self.started_s or self.finished_s), 3)
    if self.progress_done is not None:
      out['progress'] = {'done': self.progress_done,
                         'total': self.progress_total}
    if self.error is not None:
      out['error'] = self.error
    if self.state == 'done':
      out['result_bytes'] = len(self.payload or b'')
    return out


class JobManager:
  """Thread-safe job store + one worker draining a bounded queue."""

  def __init__(self, *, max_queued: int = 8, ttl_s: float = 3600.0,
               max_result_bytes: int = 256 * 1024 * 1024,
               evict_interval_s: float | None = None):
    if max_queued <= 0:
      raise ValueError(f'max_queued must be positive, got {max_queued}')
    if ttl_s <= 0:
      raise ValueError(f'ttl_s must be positive, got {ttl_s}')
    self._jobs: dict[str, Job] = {}
    self._lock = threading.Lock()
    self._queue: queue.Queue[str | None] = queue.Queue()
    self._max_queued = max_queued
    self._ttl_s = ttl_s
    self._max_result_bytes = max_result_bytes
    # The worker's idle-wait doubles as the eviction timer: a finished
    # payload is released within ttl_s + evict_interval_s with ZERO API
    # traffic (a quiet pod must not retain results past their TTL).
    self._evict_interval_s = (
        min(ttl_s, 60.0) if evict_interval_s is None
        else max(0.01, float(evict_interval_s)))
    self._running = True
    self._jobs_run = 0
    self._jobs_failed = 0
    self._jobs_cancelled = 0
    self._worker = threading.Thread(target=self._loop, daemon=True)
    self._worker.start()

  # ------------------------------ public API ------------------------------

  def submit(self, kind: str, run: Callable[..., tuple[str, bytes]],
             cleanup: Callable[[], None] | None = None) -> str:
    """Enqueues a sweep; returns the job id.  Raises JobQueueFull once
    ``max_queued`` jobs are already waiting (running jobs don't count —
    the queue bound is about wait time, not store size).

    ``run`` either takes no arguments (legacy: no progress, cancel only
    while queued) or one argument — a :class:`JobControl` it should
    ``checkpoint(done, total)`` at each window boundary for live
    progress + cooperative cancel."""
    with self._lock:
      self._evict_expired_locked()
      if not self._running:
        raise RuntimeError('job manager is stopped')
      depth = sum(1 for j in self._jobs.values() if j.state == 'queued')
      if depth >= self._max_queued:
        raise JobQueueFull(
            f'{depth} jobs already queued (max_queued={self._max_queued})')
      job = Job(id=uuid.uuid4().hex[:16], kind=kind,
                created_s=time.time(), run=run, cleanup=cleanup)
      self._jobs[job.id] = job
    self._queue.put(job.id)
    return job.id

  def get(self, job_id: str) -> Job | None:
    with self._lock:
      self._evict_expired_locked()
      return self._jobs.get(job_id)

  def snapshot(self, job_id: str) -> dict[str, Any] | None:
    """Internally-consistent public status dict (None: unknown id).
    Taken under the manager lock, so a worker finishing concurrently
    can never tear it."""
    with self._lock:
      self._evict_expired_locked()
      job = self._jobs.get(job_id)
      return None if job is None else job.public()

  def result(self, job_id: str) -> tuple[str, str | None, bytes | None,
                                         str | None] | None:
    """Atomic ``(state, content_type, payload, error)`` for the result
    route (None: unknown id).  ``state`` folds in ``cancelling``."""
    with self._lock:
      self._evict_expired_locked()
      job = self._jobs.get(job_id)
      if job is None:
        return None
      state = job.state
      if state == 'running' and job.cancel_requested:
        state = 'cancelling'
      return state, job.content_type, job.payload, job.error

  def list(self) -> list[dict[str, Any]]:
    """Public snapshots of every retained job, newest first."""
    with self._lock:
      self._evict_expired_locked()
      jobs = sorted(self._jobs.values(), key=lambda j: -j.created_s)
      return [j.public() for j in jobs]

  def cancel(self, job_id: str) -> str | None:
    """queued → ``cancelled`` (immediate); running → ``cancelling``
    (the sweep unwinds at its next window-boundary checkpoint; zero-arg
    legacy sweeps finish, their result is then discarded).  Returns the
    resulting state (None: unknown id); finished jobs are left alone —
    the caller can tell from the returned state."""
    with self._lock:
      job = self._jobs.get(job_id)
      if job is None:
        return None
      if job.state == 'queued':
        job.state = 'cancelled'
        job.finished_s = time.time()
        self._jobs_cancelled += 1
        cleanup, job.run, job.cleanup = job.cleanup, None, None
      elif job.state == 'running':
        job.cancel_requested = True
        job.cancel_event.set()
        cleanup = None
      else:
        cleanup = None
      state = job.state
      if state == 'running':
        state = 'cancelling'
    if cleanup is not None:
      try:
        cleanup()
      except OSError:
        pass
    return state

  def stats(self) -> dict[str, Any]:
    with self._lock:
      states: dict[str, int] = {}
      for j in self._jobs.values():
        states[j.state] = states.get(j.state, 0) + 1
      return {'jobs': dict(sorted(states.items())),
              'jobs_run': self._jobs_run,
              'jobs_failed': self._jobs_failed,
              'jobs_cancelled': self._jobs_cancelled}

  def stop(self) -> None:
    """Stops the worker; queued jobs are cancelled (and their cleanup
    callbacks run — each holds a temp upload file).  A running sweep
    gets a cancel request and the join waits for it to reach its next
    checkpoint."""
    cleanups = []
    with self._lock:
      self._running = False
      for j in self._jobs.values():
        if j.state == 'queued':
          j.state = 'cancelled'
          j.finished_s = time.time()
          j.run = None
          if j.cleanup is not None:
            cleanups.append(j.cleanup)
            j.cleanup = None
        elif j.state == 'running':
          j.cancel_requested = True
          j.cancel_event.set()
    for cleanup in cleanups:
      try:
        cleanup()
      except OSError:
        pass
    self._queue.put(None)
    self._worker.join(timeout=10)

  # ------------------------------ worker ------------------------------

  def _loop(self) -> None:
    while True:
      try:
        job_id = self._queue.get(timeout=self._evict_interval_s)
      except queue.Empty:
        # Idle tick: run TTL eviction so finished payloads are released
        # on a quiet pod, not only when someone polls the API.
        with self._lock:
          self._evict_expired_locked()
        continue
      if job_id is None:
        return
      with self._lock:
        job = self._jobs.get(job_id)
        if job is None or job.state != 'queued':
          continue  # cancelled or evicted while waiting
        job.state = 'running'
        job.started_s = time.time()
        run, job.run = job.run, None
        cleanup, job.cleanup = job.cleanup, None

      def on_progress(done: int, total: int | None,
                      _job: Job = job) -> None:
        with self._lock:
          # Monotonic: a late/duplicate report can't move the bar back.
          if _job.progress_done is None or done >= _job.progress_done:
            _job.progress_done = done
            if total is not None:
              _job.progress_total = total

      ctrl = JobControl(on_progress, job.cancel_event)
      try:
        payload_tuple = (run(ctrl) if _accepts_control(run) else run())
        content_type, payload = payload_tuple
        if job.cancel_event.is_set():
          # Cancel requested but the sweep finished anyway (legacy
          # zero-arg closure, or the request landed after the last
          # checkpoint): honor the cancel — discard the result.
          raise JobCancelled('cancel requested')
        if len(payload) > self._max_result_bytes:
          raise ValueError(
              f'result too large to retain: {len(payload)} bytes '
              f'(max_result_bytes={self._max_result_bytes}); use the '
              'synchronous endpoint for streams this size')
        with self._lock:
          job.content_type = content_type
          job.payload = payload
          job.finished_s = time.time()
          job.state = 'done'
          self._jobs_run += 1
      except JobCancelled:
        with self._lock:
          job.finished_s = time.time()
          job.state = 'cancelled'
          self._jobs_cancelled += 1
      except Exception as e:  # the sweep failed — report, keep serving
        with self._lock:
          job.error = f'{type(e).__name__}: {e}'
          job.finished_s = time.time()
          job.state = 'error'
          self._jobs_failed += 1
      finally:
        if cleanup is not None:
          try:
            cleanup()
          except OSError:
            pass

  def _evict_expired_locked(self) -> None:
    now = time.time()
    dead = [jid for jid, j in self._jobs.items()
            if j.finished_s is not None and now - j.finished_s > self._ttl_s]
    for jid in dead:
      del self._jobs[jid]


def _accepts_control(run: Callable[..., Any]) -> bool:
  """True when ``run`` takes at least one positional argument (the
  :class:`JobControl`).  Falls back to zero-arg on introspection
  failure (builtins/partials without signatures)."""
  try:
    sig = inspect.signature(run)
  except (TypeError, ValueError):
    return False
  for p in sig.parameters.values():
    if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD,
                  p.VAR_POSITIONAL):
      return True
  return False
