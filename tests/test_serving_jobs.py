"""Async long-video jobs (/v1/jobs): the JobManager state machine and
the HTTP submit/poll/result/cancel surface — results must equal the
synchronous endpoints byte-for-byte."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import assets, serving, serving_http, serving_jobs
from videoprism_tpu.client import RequestError, VideoPrismClient
from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)
TINY_CLIP = dict(
    **TINY, num_auxiliary_layers=1, enable_causal_atten=True,
    num_unimodal_layers=2, norm_policy='pre', vocabulary_size=1000)


def _url(httpd, path):
  return f'http://127.0.0.1:{httpd.port}{path}'


class TestJobManager:

  def test_submit_run_result(self):
    mgr = serving_jobs.JobManager(max_queued=2, ttl_s=60)
    try:
      jid = mgr.submit('k', lambda: ('text/plain', b'payload'))
      deadline = time.time() + 30
      while mgr.get(jid).state != 'done' and time.time() < deadline:
        time.sleep(0.01)
      job = mgr.get(jid)
      assert job.state == 'done'
      assert (job.content_type, job.payload) == ('text/plain', b'payload')
      pub = job.public()
      assert pub['result_bytes'] == 7 and pub['runtime_s'] >= 0
      assert mgr.stats()['jobs_run'] == 1
    finally:
      mgr.stop()

  def test_error_and_cleanup(self):
    mgr = serving_jobs.JobManager()
    cleaned = []
    try:
      jid = mgr.submit('k', lambda: 1 / 0, cleanup=lambda: cleaned.append(1))
      deadline = time.time() + 30
      while mgr.get(jid).state != 'error' and time.time() < deadline:
        time.sleep(0.01)
      job = mgr.get(jid)
      assert 'ZeroDivisionError' in job.error
      assert cleaned == [1]
      assert mgr.stats()['jobs_failed'] == 1
    finally:
      mgr.stop()

  def test_queue_full_and_cancel(self):
    gate = threading.Event()
    mgr = serving_jobs.JobManager(max_queued=1)
    try:
      blocker = mgr.submit('k', lambda: (gate.wait(30), ('t', b''))[1])
      time.sleep(0.05)  # let the worker pick it up (running != queued)
      queued = mgr.submit('k', lambda: ('t', b''))
      with pytest.raises(serving_jobs.JobQueueFull):
        mgr.submit('k', lambda: ('t', b''))
      # Cancel the queued one immediately; the running one transitions
      # to 'cancelling' (cooperative — it unwinds at its next
      # checkpoint, or on completion for zero-arg legacy closures).
      assert mgr.cancel(queued) == 'cancelled'
      assert mgr.cancel(blocker) == 'cancelling'
      assert mgr.snapshot(blocker)['state'] == 'cancelling'
      assert mgr.cancel('nope') is None
      gate.set()
      deadline = time.time() + 30
      while mgr.get(blocker).state == 'running' and time.time() < deadline:
        time.sleep(0.01)
      # The legacy closure completed, but the cancel is honored: the
      # result is discarded and the job lands 'cancelled', not 'done'.
      assert mgr.get(blocker).state == 'cancelled'
      assert mgr.get(queued).state == 'cancelled'  # never ran
      assert mgr.stats()['jobs_cancelled'] == 2
    finally:
      gate.set()
      mgr.stop()

  def test_ttl_eviction(self):
    mgr = serving_jobs.JobManager(ttl_s=0.05)
    try:
      jid = mgr.submit('k', lambda: ('t', b'x'))
      deadline = time.time() + 30
      while (j := mgr.get(jid)) is not None and j.state != 'done' \
            and time.time() < deadline:
        time.sleep(0.01)
      time.sleep(0.1)
      assert mgr.get(jid) is None
    finally:
      mgr.stop()

  def test_stop_runs_queued_jobs_cleanup(self):
    """Review fix: stop() cancels queued jobs AND runs their cleanups
    (each holds a temp upload file — leaking them on shutdown)."""
    gate = threading.Event()
    mgr = serving_jobs.JobManager(max_queued=4)
    cleaned = []
    try:
      mgr.submit('k', lambda: (gate.wait(30), ('t', b''))[1])
      time.sleep(0.05)  # worker picks it up
      jid = mgr.submit('k', lambda: ('t', b''),
                       cleanup=lambda: cleaned.append('q'))
      mgr.stop()
      assert cleaned == ['q']
      assert mgr.get(jid).state == 'cancelled'
    finally:
      gate.set()

  def test_cancel_mid_sweep_at_checkpoint(self):
    """A running control-aware sweep unwinds at its next window-boundary
    checkpoint: state 'cancelled', partial result discarded, progress
    preserved up to the interruption point."""
    started = threading.Event()
    release = threading.Event()
    mgr = serving_jobs.JobManager()

    def sweep(ctrl):
      ctrl.checkpoint(0, 10)
      for i in range(10):
        started.set()
        if not release.wait(30):
          raise RuntimeError('test deadlock')
        release.clear()
        ctrl.checkpoint(i + 1, 10)   # raises JobCancelled once requested
      return ('t', b'full result')

    try:
      jid = mgr.submit('k', sweep)
      assert started.wait(30)
      release.set()                  # window 1 completes
      deadline = time.time() + 30
      while ((mgr.snapshot(jid).get('progress') or {}).get('done', 0) < 1
             and time.time() < deadline):
        time.sleep(0.01)
      assert mgr.cancel(jid) == 'cancelling'
      release.set()                  # window 2 completes -> checkpoint raises
      deadline = time.time() + 30
      while mgr.get(jid).state != 'cancelled' and time.time() < deadline:
        release.set()
        time.sleep(0.01)
      snap = mgr.snapshot(jid)
      assert snap['state'] == 'cancelled'
      assert snap['progress']['done'] >= 1     # got partway
      assert snap['progress']['total'] == 10
      assert 'result_bytes' not in snap        # partial discarded
      assert mgr.get(jid).payload is None
      assert mgr.stats()['jobs_cancelled'] == 1
    finally:
      release.set()
      mgr.stop()

  def test_progress_is_monotonic_and_published(self):
    """Progress reports surface in snapshots; a stale/duplicate report
    can never move the bar backwards."""
    mgr = serving_jobs.JobManager()
    seen = []

    def sweep(ctrl):
      ctrl.checkpoint(0, 4)
      ctrl.checkpoint(2, 4)
      ctrl.checkpoint(1, 4)   # regression report: must not go backwards
      ctrl.checkpoint(4, 4)
      return ('t', b'ok')

    try:
      jid = mgr.submit('k', sweep)
      deadline = time.time() + 30
      while mgr.get(jid).state != 'done' and time.time() < deadline:
        snap = mgr.snapshot(jid)
        if snap.get('progress'):
          seen.append(snap['progress']['done'])
        time.sleep(0.001)
      snap = mgr.snapshot(jid)
      assert snap['state'] == 'done'
      assert snap['progress'] == {'done': 4, 'total': 4}
      assert seen == sorted(seen)   # monotone despite the stale report
    finally:
      mgr.stop()

  def test_ttl_eviction_without_api_traffic(self):
    """VERDICT r4 #4: a finished payload is released by the WORKER's
    idle timer within ttl_s + evict_interval — zero get()/list() calls
    (a quiet pod must not retain results past their TTL)."""
    mgr = serving_jobs.JobManager(ttl_s=0.1, evict_interval_s=0.05)
    try:
      jid = mgr.submit('k', lambda: ('t', b'x' * 1024))
      deadline = time.time() + 30
      # One allowed poll to confirm completion; then hands off the bus.
      while (j := mgr._jobs.get(jid)) is not None \
            and j.state != 'done' and time.time() < deadline:
        time.sleep(0.01)
      assert jid in mgr._jobs
      deadline = time.time() + 30
      while jid in mgr._jobs and time.time() < deadline:
        time.sleep(0.02)           # NO API calls — only the worker ticks
      assert jid not in mgr._jobs
    finally:
      mgr.stop()

  def test_oversized_result_is_an_error(self):
    mgr = serving_jobs.JobManager(max_result_bytes=4)
    try:
      jid = mgr.submit('k', lambda: ('t', b'12345'))
      deadline = time.time() + 30
      while mgr.get(jid).state in ('queued', 'running') \
            and time.time() < deadline:
        time.sleep(0.01)
      job = mgr.get(jid)
      assert job.state == 'error' and 'too large' in job.error
    finally:
      mgr.stop()


class TestJobsHTTP:

  @pytest.fixture(scope='class')
  def clf_server(self):
    enc = fe.FactorizedEncoderConfig(**TINY)
    cfg = vc.VideoClassifierConfig(encoder=enc, num_classes=4)
    model = vp.Model(cfg, vc.apply, init_lib.init_video_classifier)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    yield httpd
    httpd.stop()
    service.stop()

  @pytest.fixture(scope='class')
  def lvt_server(self):
    from videoprism_tpu import retrieval
    from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1, 2))
    service.start()
    tok = SentencePieceTokenizer(assets.test_spm_path())
    encode = retrieval.make_text_query_encoder(model._unwrap(state), cfg,
                                               tok)
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0, text_encode_fn=encode)
    httpd.start()
    yield httpd
    httpd.stop()
    service.stop()

  def test_classify_long_job_equals_sync(self, clf_server):
    c = VideoPrismClient(f'http://127.0.0.1:{clf_server.port}')
    path = assets.demo_video_path()
    sync = c.classify_long_file(path, k=4, window=2, size=12,
                                timeout_s=600)
    jid = c.submit_job('classify_long', path, k=4, window=2, size=12)
    out = json.loads(c.wait_job(jid, poll_s=0.2, timeout_s=600))
    assert out['predictions'] == sync
    status = c.job_status(jid)
    assert status['state'] == 'done' and status['kind'] == 'classify_long'

  def test_embed_long_job_equals_sync(self, lvt_server):
    c = VideoPrismClient(f'http://127.0.0.1:{lvt_server.port}')
    path = assets.demo_video_path()
    sync = c.embed_long_file(path, window=2, stride=1, size=12,
                             per_window=True, timeout_s=600)
    jid = c.submit_job('embed_long', path, window=2, stride=1, size=12,
                       per_window=True)
    got = np.load(io.BytesIO(c.wait_job(jid, poll_s=0.2, timeout_s=600)),
                  allow_pickle=False)
    np.testing.assert_allclose(got, sync, atol=1e-5)

  def test_localize_long_job_equals_sync(self, lvt_server):
    c = VideoPrismClient(f'http://127.0.0.1:{lvt_server.port}')
    path = assets.demo_video_path()
    sync = c.localize_long_file(path, ['a person drumming'], k=2,
                                window=2, size=12, timeout_s=600)
    jid = c.submit_job('localize_long', path,
                       queries=['a person drumming'], k=2, window=2,
                       size=12)
    out = json.loads(c.wait_job(jid, poll_s=0.2, timeout_s=600))
    assert out == sync

  def test_submit_validation(self, clf_server):
    c = VideoPrismClient(f'http://127.0.0.1:{clf_server.port}')
    path = assets.demo_video_path()
    with pytest.raises(RequestError, match='unknown kind'):
      c.submit_job('nope', path)
    with pytest.raises(RequestError, match='positive'):
      c.submit_job('classify_long', path, k=0, window=2, size=12)
    # embed_long on a classifier server -> 404.
    with pytest.raises(RequestError, match='classify_long'):
      c.submit_job('embed_long', path, window=2, size=12)
    # Non-video body -> 400.
    req = urllib.request.Request(
        _url(clf_server, '/v1/jobs?kind=classify_long'), b'{}',
        {'Content-Type': 'application/json'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400

  def test_unknown_job_and_result_states(self, clf_server):
    c = VideoPrismClient(f'http://127.0.0.1:{clf_server.port}')
    with pytest.raises(RequestError, match='unknown job'):
      c.job_status('deadbeef')
    # A decode failure surfaces as the job's error state and /result 410.
    jid = c.submit_job('classify_long', b'not a video container',
                       window=2, size=12)
    with pytest.raises(RequestError) as ei:
      c.wait_job(jid, poll_s=0.1, timeout_s=120)
    assert ei.value.status == 410
    with pytest.raises(RequestError) as ei:
      c.job_result(jid)
    assert ei.value.status == 410

  def test_jobs_in_stats(self, clf_server):
    c = VideoPrismClient(f'http://127.0.0.1:{clf_server.port}')
    stats = c.stats()
    assert 'async_jobs' in stats
    assert 'jobs_run' in stats['async_jobs']

  def test_list_jobs(self, clf_server):
    c = VideoPrismClient(f'http://127.0.0.1:{clf_server.port}')
    jid = c.submit_job('classify_long', assets.demo_video_path(),
                       window=2, size=12)
    c.wait_job(jid, poll_s=0.2, timeout_s=600)
    listing = c.list_jobs()
    assert any(j['job'] == jid and j['state'] == 'done'
               for j in listing['jobs'])
    assert listing['jobs_run'] >= 1

  def test_prometheus_jobs_metrics(self, clf_server):
    with urllib.request.urlopen(_url(clf_server, '/metrics'),
                                timeout=30) as r:
      body = r.read().decode()
    assert '# TYPE videoprism_jobs_run_total counter' in body
    assert 'videoprism_jobs_state{state="queued"}' in body
    # One TYPE line per family (strict exposition).
    assert body.count('# TYPE videoprism_jobs_state') == 1

  def test_job_endpoints_are_auth_gated(self):
    enc = fe.FactorizedEncoderConfig(**TINY)
    cfg = vc.VideoClassifierConfig(encoder=enc, num_classes=4)
    model = vp.Model(cfg, vc.apply, init_lib.init_video_classifier)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0, auth_token='sesame')
    httpd.start()
    try:
      with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(_url(httpd, '/v1/jobs/x'), timeout=30)
      assert ei.value.code == 401
      # /healthz stays open.
      with urllib.request.urlopen(_url(httpd, '/healthz'), timeout=30) as r:
        assert r.status == 200
      # With the token, the same GET resolves (404: unknown id).
      c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}',
                           auth_token='sesame')
      with pytest.raises(RequestError, match='unknown job'):
        c.job_status('x')
    finally:
      httpd.stop()
      service.stop()

  def test_tp_server_rejects_long_jobs(self):
    from videoprism_tpu.parallel import mesh as mesh_lib

    enc = fe.FactorizedEncoderConfig(**TINY)
    cfg = vc.VideoClassifierConfig(encoder=enc, num_classes=4)
    model = vp.Model(cfg, vc.apply, init_lib.init_video_classifier)
    state = model.init(jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    service = serving.EmbeddingService(
        model, state, batch_buckets=(4,), mesh=mesh, tensor_parallel=True)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
      with pytest.raises(RequestError, match='single-program'):
        c.submit_job('classify_long', assets.demo_video_path(),
                     window=2, size=12)
    finally:
      httpd.stop()
      service.stop()

  def test_multi_model_submit_binds_the_addressed_model(self):
    """/v1/models/<name>/jobs submits against that model; the job store
    itself is server-global (ids resolve unscoped)."""
    enc = fe.FactorizedEncoderConfig(**TINY)
    emb_model = vp.Model(enc, fe.apply, init_lib.init_factorized_encoder)
    emb_state = emb_model.init(jax.random.PRNGKey(0))
    emb_svc = serving.EmbeddingService(emb_model, emb_state,
                                       batch_buckets=(1,))
    emb_svc.start()
    cfg = vc.VideoClassifierConfig(encoder=enc, num_classes=4)
    clf_model = vp.Model(cfg, vc.apply, init_lib.init_video_classifier)
    clf_state = clf_model.init(jax.random.PRNGKey(0))
    clf_svc = serving.EmbeddingService(clf_model, clf_state,
                                       batch_buckets=(1,))
    clf_svc.start()
    httpd = serving_http.EmbeddingHTTPServer(emb_svc, host='127.0.0.1',
                                             port=0)
    httpd.add_model('clf', clf_svc)
    httpd.start()
    try:
      # classify_long at the default (embedding) model -> 404...
      c_default = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
      with pytest.raises(RequestError, match='classifier'):
        c_default.submit_job('classify_long', assets.demo_video_path(),
                             window=2, size=12)
      # ...and succeeds at the pinned classifier model.
      c_clf = VideoPrismClient(f'http://127.0.0.1:{httpd.port}',
                               model='clf')
      jid = c_clf.submit_job('classify_long', assets.demo_video_path(),
                             window=2, size=12)
      out = json.loads(c_clf.wait_job(jid, poll_s=0.2, timeout_s=600))
      assert out['predictions']
    finally:
      httpd.stop()
      emb_svc.stop()
      clf_svc.stop()

  def test_queue_full_sheds_503(self, clf_server, monkeypatch):
    """max_queued submits shed with 503 + Retry-After (the jobs tier has
    the backpressure the sync sweeps lack)."""
    jobs = clf_server._jobs
    gate = threading.Event()
    blocker = jobs.submit('x', lambda: (gate.wait(30), ('t', b''))[1])
    time.sleep(0.05)
    queued = [jobs.submit('x', lambda: ('t', b''))
              for _ in range(jobs._max_queued)]
    try:
      body = open(assets.demo_video_path(), 'rb').read()
      req = urllib.request.Request(
          _url(clf_server, '/v1/jobs?kind=classify_long&window=2&size=12'),
          body, {'Content-Type': 'video/mp4'})
      with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
      assert ei.value.code == 503
      assert ei.value.headers['Retry-After'] is not None
    finally:
      for jid in queued:
        jobs.cancel(jid)
      gate.set()

  def test_cancel_bad_content_length_is_400(self, clf_server):
    """Review fix: a malformed Content-Length on cancel is a JSON 400,
    not an uncaught traceback + dropped connection."""
    import http.client

    conn = http.client.HTTPConnection('127.0.0.1', clf_server.port,
                                      timeout=30)
    try:
      conn.putrequest('POST', '/v1/jobs/x/cancel')
      conn.putheader('Content-Length', 'abc')
      conn.endheaders()
      resp = conn.getresponse()
      assert resp.status == 400
      assert b'error' in resp.read()
    finally:
      conn.close()

  def test_submit_job_does_not_retry_network_errors(self, clf_server,
                                                    monkeypatch):
    """Review fix: submit is at-most-once — a transport failure raises
    immediately (a lost reply may mean the sweep is already enqueued;
    retrying would run it twice).  Idempotent calls keep retrying."""
    from videoprism_tpu.client import VideoPrismClient

    c = VideoPrismClient(f'http://127.0.0.1:{clf_server.port}',
                         max_retries=3, backoff_s=0.01)
    calls = []

    def dying_roundtrip(method, path, body, headers, timeout_s=None,
                        resend_stale=True):
      calls.append(resend_stale)
      raise OSError('wire cut')

    monkeypatch.setattr(c, '_roundtrip', dying_roundtrip)
    with pytest.raises(RequestError, match='wire cut'):
      c.submit_job('classify_long', b'x', window=2, size=12)
    assert calls == [False]  # one attempt, stale-resend disabled
    calls.clear()
    with pytest.raises(RequestError, match='wire cut'):
      c.job_status('x')  # idempotent GET: full retry budget applies
    assert calls == [True] * 4

  def test_cancel_queued_job(self, clf_server):
    jobs = clf_server._jobs
    gate = threading.Event()
    blocker = jobs.submit('x', lambda: (gate.wait(30), ('t', b''))[1])
    time.sleep(0.05)
    try:
      c = VideoPrismClient(f'http://127.0.0.1:{clf_server.port}')
      jid = c.submit_job('classify_long', assets.demo_video_path(),
                         window=2, size=12)
      out = c.cancel_job(jid)
      assert out['state'] == 'cancelled'
      # Cancel is idempotent on cancelled jobs...
      assert c.cancel_job(jid)['state'] == 'cancelled'
      # ...a RUNNING job acknowledges with 'cancelling' (cooperative —
      # the sweep unwinds at its next window-boundary checkpoint)...
      assert c.cancel_job(blocker)['state'] == 'cancelling'
      assert c.job_status(blocker)['state'] == 'cancelling'
      gate.set()
      deadline = time.time() + 30
      while c.job_status(blocker)['state'] == 'cancelling' \
            and time.time() < deadline:
        time.sleep(0.05)
      assert c.job_status(blocker)['state'] == 'cancelled'
      # ...and a FINISHED job refuses with 409 (nothing to cancel).
      done = c.submit_job('classify_long', assets.demo_video_path(),
                          window=2, size=12)
      c.wait_job(done, poll_s=0.2, timeout_s=600)
      with pytest.raises(RequestError) as ei:
        c.cancel_job(done)
      assert ei.value.status == 409
    finally:
      gate.set()

  def test_job_progress_over_the_wire(self, clf_server):
    """A finished long-video job's status carries its final progress
    (done == total when the container advertises a frame count), and
    wait_job's on_progress callback observes it."""
    c = VideoPrismClient(f'http://127.0.0.1:{clf_server.port}')
    jid = c.submit_job('classify_long', assets.demo_video_path(),
                       window=2, size=12)
    reports = []
    c.wait_job(jid, poll_s=0.1, timeout_s=600,
               on_progress=lambda d, t: reports.append((d, t)))
    status = c.job_status(jid)
    assert status['state'] == 'done'
    prog = status.get('progress')
    assert prog is not None and prog['done'] >= 1
    if prog.get('total') is not None:     # container carried a count
      assert prog['done'] == prog['total']
    dones = [d for d, _ in reports]
    assert dones == sorted(dones)

  def test_jobs_routes_with_query_and_model_scope(self, clf_server):
    """ADVICE r4: GET /v1/jobs survives a query string, and the
    model-scoped form /v1/models/<name>/jobs[...] routes like POST."""
    c = VideoPrismClient(f'http://127.0.0.1:{clf_server.port}')
    jid = c.submit_job('classify_long', assets.demo_video_path(),
                       window=2, size=12)
    c.wait_job(jid, poll_s=0.2, timeout_s=600)
    with urllib.request.urlopen(
        _url(clf_server, '/v1/jobs?limit=5'), timeout=30) as r:
      assert r.status == 200
      assert any(j['job'] == jid for j in json.loads(r.read())['jobs'])
    with urllib.request.urlopen(
        _url(clf_server, f'/v1/models/default/jobs/{jid}'),
        timeout=30) as r:
      assert json.loads(r.read())['state'] == 'done'
    # Unknown model still 404s.
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(
          _url(clf_server, '/v1/models/nope/jobs'), timeout=30)
    assert ei.value.code == 404
