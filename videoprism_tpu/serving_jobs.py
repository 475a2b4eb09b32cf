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
  (queued → running → done | error | cancelled) + timing.
* ``GET  /v1/jobs/<id>/result``      — the EXACT bytes the sync endpoint
  would have replied (npy for embed_long, JSON otherwise), 409 until
  done.
* ``POST /v1/jobs/<id>/cancel``      — cancels a QUEUED job; a running
  sweep finishes (the streaming loops are not interruptible
  mid-window by design — one window is seconds, not minutes).

One worker thread serializes sweeps (the chip is serial anyway);
``max_queued`` bounds admission (429-free: the shed is a 503 +
Retry-After like every other overload); finished jobs persist
``ttl_s`` seconds and are then evicted.  Results live in memory —
size-bounded by ``max_result_bytes`` per job.

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
import queue
import threading
import time
import uuid
from typing import Any, Callable


class JobQueueFull(Exception):
  """Admission bound hit — shed with Retry-After, like the batch path."""


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
  # The deferred sweep; cleared once run (or cancelled) so captured
  # upload buffers free promptly.
  run: Callable[[], tuple[str, bytes]] | None = None
  cleanup: Callable[[], None] | None = None

  def public(self) -> dict[str, Any]:
    out = {'job': self.id, 'kind': self.kind, 'state': self.state,
           'created_s': round(self.created_s, 3)}
    if self.started_s is not None:
      out['started_s'] = round(self.started_s, 3)
    if self.finished_s is not None:
      out['finished_s'] = round(self.finished_s, 3)
      out['runtime_s'] = round(
          self.finished_s - (self.started_s or self.finished_s), 3)
    if self.error is not None:
      out['error'] = self.error
    if self.state == 'done':
      out['result_bytes'] = len(self.payload or b'')
    return out


class JobManager:
  """Thread-safe job store + one worker draining a bounded queue."""

  def __init__(self, *, max_queued: int = 8, ttl_s: float = 3600.0,
               max_result_bytes: int = 256 * 1024 * 1024):
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
    self._running = True
    self._jobs_run = 0
    self._jobs_failed = 0
    self._worker = threading.Thread(target=self._loop, daemon=True)
    self._worker.start()

  # ------------------------------ public API ------------------------------

  def submit(self, kind: str, run: Callable[[], tuple[str, bytes]],
             cleanup: Callable[[], None] | None = None) -> str:
    """Enqueues a sweep; returns the job id.  Raises JobQueueFull once
    ``max_queued`` jobs are already waiting (running jobs don't count —
    the queue bound is about wait time, not store size)."""
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

  def list(self) -> list[dict[str, Any]]:
    """Public snapshots of every retained job, newest first."""
    with self._lock:
      self._evict_expired_locked()
      jobs = sorted(self._jobs.values(), key=lambda j: -j.created_s)
      return [j.public() for j in jobs]

  def cancel(self, job_id: str) -> str | None:
    """queued → cancelled.  Returns the resulting state (None: unknown
    id).  Running/finished jobs are left alone — the caller can tell
    from the returned state."""
    with self._lock:
      job = self._jobs.get(job_id)
      if job is None:
        return None
      if job.state == 'queued':
        job.state = 'cancelled'
        job.finished_s = time.time()
        cleanup, job.run, job.cleanup = job.cleanup, None, None
      else:
        cleanup = None
      state = job.state
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
              'jobs_failed': self._jobs_failed}

  def stop(self) -> None:
    """Stops the worker; queued jobs are cancelled (and their cleanup
    callbacks run — each holds a temp upload file)."""
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
      job_id = self._queue.get()
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
      try:
        content_type, payload = run()
        if len(payload) > self._max_result_bytes:
          raise ValueError(
              f'result too large to retain: {len(payload)} bytes '
              f'(max_result_bytes={self._max_result_bytes}); use the '
              'synchronous endpoint for streams this size')
        with self._lock:
          # Payload before state: readers (the HTTP result path) check
          # `state == 'done'` WITHOUT taking this lock, so the terminal
          # state must be the last field to become visible.
          job.content_type = content_type
          job.payload = payload
          job.finished_s = time.time()
          job.state = 'done'
          self._jobs_run += 1
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
