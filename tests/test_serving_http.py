"""HTTP serving front-end tests (serving_http.py): wire formats, batching
through real sockets, error paths."""

import io
import json
import os
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import serving, serving_http
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)
CLIP_SHAPE = (2, 12, 12, 3)


@pytest.fixture(scope='module')
def server():
  cfg = fe.FactorizedEncoderConfig(**TINY)
  model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
  state = model.init(jax.random.PRNGKey(0))
  service = serving.EmbeddingService(model, state, batch_buckets=(1, 2, 4),
                                     max_wait_ms=20.0)
  service.start()
  httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1', port=0)
  httpd.start()
  yield httpd, model, state
  httpd.stop()
  service.stop()


def _url(httpd, path):
  return f'http://127.0.0.1:{httpd.port}{path}'


def _post_npy(httpd, array, timeout=120):
  buf = io.BytesIO()
  np.save(buf, array)
  req = urllib.request.Request(
      _url(httpd, '/v1/embed'), buf.getvalue(),
      {'Content-Type': 'application/x-npy'})
  with urllib.request.urlopen(req, timeout=timeout) as resp:
    assert resp.headers['Content-Type'] == 'application/x-npy'
    return np.load(io.BytesIO(resp.read()))


class TestEndpoints:

  def test_console_page(self, server):
    """GET / serves the built-in demo console (static HTML driving the
    public API via fetch)."""
    httpd, _, _ = server
    with urllib.request.urlopen(_url(httpd, '/'), timeout=30) as r:
      assert r.headers['Content-Type'].startswith('text/html')
      body = r.read().decode()
    assert 'VideoPrism TPU' in body and '/v1/embed_file' in body
    # The console must drive the full long-video surface (VERDICT r3 #5).
    for ep in ('embed_long', 'classify_long', 'localize_long'):
      assert f'/v1/{ep}' in body, ep
    # Same page at /index.html; other GETs still 404.
    with urllib.request.urlopen(_url(httpd, '/index.html'),
                                timeout=30) as r:
      assert r.status == 200
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(_url(httpd, '/console'), timeout=30)
    assert ei.value.code == 404

  def test_healthz_and_stats(self, server):
    httpd, _, _ = server
    with urllib.request.urlopen(_url(httpd, '/healthz'), timeout=30) as r:
      assert json.loads(r.read()) == {'status': 'ok'}
    with urllib.request.urlopen(_url(httpd, '/stats'), timeout=30) as r:
      stats = json.loads(r.read())
    assert {'requests_served', 'batches_run', 'errors', 'requests_shed',
            'queue_depth'} <= stats.keys()

  def test_prometheus_metrics(self, server):
    httpd, _, _ = server
    with urllib.request.urlopen(_url(httpd, '/metrics'), timeout=30) as r:
      assert r.headers['Content-Type'].startswith('text/plain')
      body = r.read().decode()
    assert '# TYPE videoprism_requests_served_total counter' in body
    assert 'videoprism_queue_depth' in body
    assert 'videoprism_requests_shed_total 0' in body

  def test_prometheus_summary_has_one_type_line(self):
    """Both latency quantiles share ONE metric family: duplicate # TYPE
    lines are invalid exposition format and strict scrapers reject the
    whole page."""
    body = serving_http._prometheus_metrics(
        {'default': {'batch_latency_p50_s': 0.01,
                     'batch_latency_p99_s': 0.05}})
    assert body.count('# TYPE videoprism_batch_latency_seconds') == 1
    assert 'quantile="0.5"' in body and 'quantile="0.99"' in body

  def test_prometheus_request_latency_histogram(self):
    """Native histogram exposition: cumulative le buckets, an explicit
    +Inf bucket equal to _count, and _sum/_count series."""
    hist = {'bounds_s': [0.01, 0.1, 1.0], 'counts': [2, 1, 0, 1],
            'sum_s': 5.25, 'count': 4}
    body = serving_http._prometheus_metrics(
        {'default': {'request_latency': hist}})
    m = 'videoprism_request_latency_seconds'
    assert body.count(f'# TYPE {m} histogram') == 1
    assert f'{m}_bucket{{le="0.01"}} 2' in body
    assert f'{m}_bucket{{le="0.1"}} 3' in body
    assert f'{m}_bucket{{le="1.0"}} 3' in body
    assert f'{m}_bucket{{le="+Inf"}} 4' in body
    assert f'{m}_sum 5.25' in body
    assert f'{m}_count 4' in body

  def test_prometheus_histogram_labels_multi_model(self):
    """With several models the histogram series carry the model label
    alongside le, and text-service histograms get their own family."""
    hist = {'bounds_s': [0.01], 'counts': [1, 0], 'sum_s': 0.005,
            'count': 1}
    body = serving_http._prometheus_metrics({
        'a': {'request_latency': hist},
        'b': {'request_latency': hist, 'text_request_latency': hist},
    })
    assert ('videoprism_request_latency_seconds_bucket'
            '{model="a",le="0.01"} 1') in body
    assert ('videoprism_request_latency_seconds_bucket'
            '{model="b",le="+Inf"} 1') in body
    assert ('videoprism_text_request_latency_seconds_count'
            '{model="b"} 1') in body

  def test_metrics_endpoint_exports_request_latency(self, server):
    """After at least one real request the /metrics page carries the
    end-to-end request-latency histogram."""
    httpd, _, _ = server
    clip = np.random.default_rng(7).random(CLIP_SHAPE, np.float32)
    _post_npy(httpd, clip)
    with urllib.request.urlopen(_url(httpd, '/metrics'), timeout=30) as r:
      body = r.read().decode()
    assert '# TYPE videoprism_request_latency_seconds histogram' in body
    assert 'videoprism_request_latency_seconds_bucket{le="+Inf"}' in body

  def test_npy_single_clip_matches_direct(self, server):
    httpd, model, state = server
    clip = np.random.default_rng(0).random(CLIP_SHAPE, np.float32)
    emb = _post_npy(httpd, clip)
    ref, _ = model.apply(state, clip[None], train=False)
    np.testing.assert_allclose(emb, np.asarray(ref)[0], atol=1e-6)

  def test_response_dtype_float16(self, server):
    """?dtype=float16 halves the response: same embedding at half
    width (the egress knob for wire-bound links)."""
    httpd, model, state = server
    clip = np.random.default_rng(5).random(CLIP_SHAPE, np.float32)
    buf = io.BytesIO()
    np.save(buf, clip)
    req = urllib.request.Request(
        _url(httpd, '/v1/embed?dtype=float16'), buf.getvalue(),
        {'Content-Type': 'application/x-npy'})
    with urllib.request.urlopen(req, timeout=120) as resp:
      emb16 = np.load(io.BytesIO(resp.read()))
    assert emb16.dtype == np.float16
    ref, _ = model.apply(state, clip[None], train=False)
    np.testing.assert_allclose(emb16.astype(np.float32),
                               np.asarray(ref)[0], atol=2e-3)

  def test_response_dtype_json_wire(self, server):
    """?dtype= composes with the JSON wire format."""
    httpd, _, _ = server
    clip = np.random.default_rng(6).random(CLIP_SHAPE, np.float32)
    payload = json.dumps({
        'shape': list(clip.shape), 'dtype': 'float32',
        'data_b64': __import__('base64').b64encode(
            clip.tobytes()).decode(),
    }).encode()
    req = urllib.request.Request(
        _url(httpd, '/v1/embed?dtype=float16'), payload,
        {'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=120) as resp:
      out = json.loads(resp.read())
    assert out['dtype'] == 'float16'

  def test_response_dtype_rejects_unknown(self, server):
    httpd, _, _ = server
    clip = np.random.default_rng(7).random(CLIP_SHAPE, np.float32)
    buf = io.BytesIO()
    np.save(buf, clip)
    req = urllib.request.Request(
        _url(httpd, '/v1/embed?dtype=int8'), buf.getvalue(),
        {'Content-Type': 'application/x-npy'})
    with pytest.raises(urllib.error.HTTPError) as exc_info:
      urllib.request.urlopen(req, timeout=30)
    assert exc_info.value.code == 400

  def test_json_roundtrip(self, server):
    httpd, model, state = server
    clip = np.random.default_rng(1).random(CLIP_SHAPE, np.float32)
    payload = json.dumps({
        'shape': list(clip.shape),
        'dtype': 'float32',
        'data_b64': __import__('base64').b64encode(
            clip.tobytes()).decode(),
    }).encode()
    req = urllib.request.Request(
        _url(httpd, '/v1/embed'), payload,
        {'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=120) as resp:
      out = json.loads(resp.read())
    emb = np.frombuffer(
        __import__('base64').b64decode(out['data_b64']),
        np.dtype(out['dtype'])).reshape(out['shape'])
    ref, _ = model.apply(state, clip[None], train=False)
    np.testing.assert_allclose(emb, np.asarray(ref)[0], atol=1e-6)

  def test_batched_post(self, server):
    httpd, model, state = server
    videos = np.random.default_rng(2).random((3,) + CLIP_SHAPE, np.float32)
    emb = _post_npy(httpd, videos)
    ref, _ = model.apply(state, videos, train=False)
    np.testing.assert_allclose(emb, np.asarray(ref), atol=1e-6)

  def test_uint8_ingestion(self, server):
    httpd, model, state = server
    clip = np.random.default_rng(3).integers(
        0, 256, CLIP_SHAPE, np.uint8)
    emb = _post_npy(httpd, clip)
    ref, _ = model.apply(state, clip[None].astype(np.float32) / 255.0,
                         train=False)
    np.testing.assert_allclose(emb, np.asarray(ref)[0], atol=1e-5)

  def test_concurrent_requests_share_batches(self, server):
    httpd, model, state = server
    clips = np.random.default_rng(4).random((4,) + CLIP_SHAPE, np.float32)
    results = [None] * 4

    def worker(i):
      results[i] = _post_npy(httpd, clips[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
      t.start()
    for t in threads:
      t.join(timeout=120)
    ref, _ = model.apply(state, clips, train=False)
    for i in range(4):
      np.testing.assert_allclose(results[i], np.asarray(ref)[i], atol=1e-6)


class TestErrors:

  def _expect_status(self, httpd, path, body, headers, status):
    req = urllib.request.Request(_url(httpd, path), body, headers)
    with pytest.raises(urllib.error.HTTPError) as exc_info:
      urllib.request.urlopen(req, timeout=30)
    assert exc_info.value.code == status
    return json.loads(exc_info.value.read())

  def test_bf16_model_ships_float32_on_the_wire(self):
    """A bf16-serving model (fprop_dtype=bfloat16) produces
    ml_dtypes.bfloat16 embeddings; shipped raw those npy-serialize as
    opaque void16 that a plain-numpy client cannot use.  The wire
    must upcast to float32.  (Caught on hardware: every CPU test
    fixture was fp32, so this path first failed on the real TPU
    serving config.)"""
    import jax.numpy as jnp

    cfg = fe.FactorizedEncoderConfig(**TINY, dtype=jnp.bfloat16)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      clip = np.random.default_rng(5).random(CLIP_SHAPE, np.float32)
      emb = _post_npy(httpd, clip)
      assert emb.dtype == np.float32
      ref, _ = model.apply(state, clip[None], train=False)
      np.testing.assert_allclose(emb, np.asarray(ref)[0].astype(np.float32),
                                 atol=1e-6)
    finally:
      httpd.stop()
      service.stop()

  def test_embed_file_matches_decoded_clip(self, server):
    """POST /v1/embed_file: the server decodes the container exactly as
    io.video.load_video would, then embeds — so the embedding equals
    embedding the locally decoded clip."""
    from videoprism_tpu import assets
    from videoprism_tpu.io import video as video_io

    httpd, model, state = server
    with open(assets.demo_video_path(), 'rb') as f:
      blob = f.read()
    # Default geometry comes from the tiny config (2 frames, 12px).
    req = urllib.request.Request(
        _url(httpd, '/v1/embed_file'), blob,
        {'Content-Type': 'video/mp4'})
    with urllib.request.urlopen(req, timeout=120) as resp:
      emb = np.load(io.BytesIO(resp.read()))
    clip = video_io.load_video(assets.demo_video_path(), num_frames=2,
                               target_size=12, as_uint8=True)
    ref, _ = model.apply(state, clip[None].astype(np.float32) / 255.0,
                         train=False)
    np.testing.assert_allclose(emb, np.asarray(ref)[0], atol=1e-5)

  def test_embed_file_geometry_override(self, server):
    """?frames=&size= override the model's native defaults (the tiny
    model still accepts any spatial grid; frame count must match its
    compiled geometry here, so override size only)."""
    from videoprism_tpu import assets

    httpd, model, state = server
    with open(assets.demo_video_path(), 'rb') as f:
      blob = f.read()
    req = urllib.request.Request(
        _url(httpd, '/v1/embed_file?frames=2&size=18'), blob,
        {'Content-Type': 'video/mp4'})
    with urllib.request.urlopen(req, timeout=120) as resp:
      emb = np.load(io.BytesIO(resp.read()))
    assert emb.ndim == 2  # [tokens, D] for the tiny encoder head

  def test_embed_file_garbage_is_400(self, server):
    httpd, _, _ = server
    req = urllib.request.Request(
        _url(httpd, '/v1/embed_file'), b'not a video container',
        {'Content-Type': 'video/mp4'})
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    assert 'could not decode' in json.loads(e.value.read())['error']

  @pytest.mark.parametrize('query,needle', [
      ('?frames=0', 'positive'),
      # a small upload must not force a giant decoded allocation
      ('?frames=200000&size=4096', 'decoded views'),
      ('?temporal_views=100000&spatial_views=100', 'decoded views'),
  ])
  def test_embed_file_bad_params_are_400(self, server, query, needle):
    from videoprism_tpu import assets

    httpd, _, _ = server
    with open(assets.demo_video_path(), 'rb') as f:
      blob = f.read()
    req = urllib.request.Request(
        _url(httpd, f'/v1/embed_file{query}'), blob,
        {'Content-Type': 'video/mp4'})
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert needle in json.loads(e.value.read())['error']

  def test_embed_file_views_rejected_for_token_output(self, server):
    """Multi-view aggregation needs one vector per clip; the plain
    encoder returns [tokens, D] per view -> 400 with a clear reason."""
    from videoprism_tpu import assets

    httpd, _, _ = server
    with open(assets.demo_video_path(), 'rb') as f:
      blob = f.read()
    req = urllib.request.Request(
        _url(httpd, '/v1/embed_file?temporal_views=2'), blob,
        {'Content-Type': 'video/mp4'})
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(req, timeout=120)
    assert e.value.code == 400
    assert 'multi-view aggregation' in json.loads(e.value.read())['error']

  def test_gzip_body_matches_identity(self, server):
    """Content-Encoding: gzip inflates transparently on every
    body-reading endpoint (wire-bound network clients compress)."""
    import gzip

    httpd, model, state = server
    clip = np.random.default_rng(7).random(CLIP_SHAPE, np.float32)
    buf = io.BytesIO()
    np.save(buf, clip)
    req = urllib.request.Request(
        _url(httpd, '/v1/embed'), gzip.compress(buf.getvalue()),
        {'Content-Type': 'application/x-npy',
         'Content-Encoding': 'gzip'})
    with urllib.request.urlopen(req, timeout=120) as resp:
      emb = np.load(io.BytesIO(resp.read()))
    ref, _ = model.apply(state, clip[None], train=False)
    np.testing.assert_allclose(emb, np.asarray(ref)[0], atol=1e-6)

  @pytest.mark.parametrize('body,encoding', [
      (b'\x1f\x8b\x08\x00not really gzip', 'gzip'),     # corrupt stream
      (b'plain bytes', 'gzip'),                         # not gzip at all
      (b'anything', 'zstd'),                            # unsupported coding
  ])
  def test_bad_encoding_is_400(self, server, body, encoding):
    httpd, _, _ = server
    req = urllib.request.Request(
        _url(httpd, '/v1/embed'), body,
        {'Content-Type': 'application/x-npy', 'Content-Encoding': encoding})
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400

  def test_truncated_gzip_is_400(self, server):
    import gzip

    httpd, _, _ = server
    whole = gzip.compress(b'x' * 4096)
    req = urllib.request.Request(
        _url(httpd, '/v1/embed'), whole[:-8],  # drop the gzip trailer
        {'Content-Type': 'application/x-npy', 'Content-Encoding': 'gzip'})
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert 'truncated' in json.loads(e.value.read())['error']

  def test_multi_member_gzip_is_400(self, server):
    """cat a.gz b.gz would otherwise silently decode only the first
    member — a truncated payload treated as complete."""
    import gzip

    httpd, _, _ = server
    body = gzip.compress(b'first member') + gzip.compress(b'second')
    req = urllib.request.Request(
        _url(httpd, '/v1/embed'), body,
        {'Content-Type': 'application/x-npy', 'Content-Encoding': 'gzip'})
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert 'multi-member' in json.loads(e.value.read())['error']

  def test_gzip_bomb_is_400(self, server, monkeypatch):
    """A small gzip body inflating past the size cap must be rejected
    without the server allocating the inflated size (cap monkeypatched
    down so the test itself stays small)."""
    import gzip

    httpd, _, _ = server
    monkeypatch.setattr(serving_http, '_MAX_BODY_BYTES', 1 << 20)
    bomb = gzip.compress(b'\0' * (3 << 20))  # ~3 KB wire, 3 MB inflated
    req = urllib.request.Request(
        _url(httpd, '/v1/embed'), bomb,
        {'Content-Type': 'application/x-npy', 'Content-Encoding': 'gzip'})
    with pytest.raises(urllib.error.HTTPError) as e:
      urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert 'inflates past' in json.loads(e.value.read())['error']

  def test_bad_payload_is_400(self, server):
    httpd, _, _ = server
    out = self._expect_status(
        httpd, '/v1/embed', b'not an npy blob',
        {'Content-Type': 'application/x-npy'}, 400)
    assert 'error' in out

  def test_wrong_rank_is_400(self, server):
    httpd, _, _ = server
    buf = io.BytesIO()
    np.save(buf, np.zeros((12, 12, 3), np.float32))
    out = self._expect_status(
        httpd, '/v1/embed', buf.getvalue(),
        {'Content-Type': 'application/x-npy'}, 400)
    assert 'shape' in out['error']

  def test_unknown_path_is_404(self, server):
    httpd, _, _ = server
    self._expect_status(httpd, '/v1/nope', b'x',
                        {'Content-Type': 'application/x-npy'}, 404)

  def test_pickle_payload_rejected(self, server):
    """Object arrays need pickle; allow_pickle=False must refuse them."""
    httpd, _, _ = server
    buf = io.BytesIO()
    np.save(buf, np.array([{'a': 1}], dtype=object), allow_pickle=True)
    self._expect_status(httpd, '/v1/embed', buf.getvalue(),
                        {'Content-Type': 'application/x-npy'}, 400)

  def test_overloaded_is_503_with_retry_after(self):
    """max_pending full -> load shed as HTTP 503 + Retry-After header.
    Own (unstarted) service so the queue never drains."""
    cfg = fe.FactorizedEncoderConfig(**TINY)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(
        model, state, batch_buckets=(1,), max_pending=1)
    service._queue.put_nowait((0, 0, serving._Request(
        video=np.zeros(CLIP_SHAPE, np.float32), event=threading.Event())))
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      buf = io.BytesIO()
      np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
      req = urllib.request.Request(
          _url(httpd, '/v1/embed'), buf.getvalue(),
          {'Content-Type': 'application/x-npy'})
      with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
      assert ei.value.code == 503
      assert ei.value.headers['Retry-After'] == '1'
      assert 'pending' in json.loads(ei.value.read())['error']
    finally:
      httpd.stop()


class TestKeepAliveDesync:

  def test_error_with_unread_body_closes_connection(self, server):
    """HTTP/1.1 keep-alive: an error reply sent before the request body
    was read must close the connection — otherwise the unread body bytes
    would be parsed as the next request line."""
    import socket

    httpd, _, _ = server
    body = b'x' * 4096
    req = (f'POST /nope HTTP/1.1\r\nHost: h\r\n'
           f'Content-Length: {len(body)}\r\n'
           f'Content-Type: application/octet-stream\r\n\r\n'
           ).encode() + body
    with socket.create_connection(('127.0.0.1', httpd.port),
                                  timeout=10) as s:
      s.sendall(req)
      s.settimeout(10)
      data = b''
      while b'}' not in data:  # first (and only) reply, JSON-terminated
        chunk = s.recv(65536)
        if not chunk:
          break
        data += chunk
      assert b'404' in data.split(b'\r\n', 1)[0]
      # The server must now close rather than reinterpret the body.
      tail = s.recv(65536)
      assert tail == b''

  def test_keep_alive_survives_two_good_requests(self, server):
    """Sanity: successful requests keep the connection open (the fix only
    closes on pre-body-read errors)."""
    import http.client

    httpd, _, _ = server
    conn = http.client.HTTPConnection('127.0.0.1', httpd.port, timeout=60)
    buf = io.BytesIO()
    np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
    for _ in range(2):
      conn.request('POST', '/v1/embed', buf.getvalue(),
                   {'Content-Type': 'application/x-npy'})
      resp = conn.getresponse()
      assert resp.status == 200
      resp.read()
    conn.close()


@pytest.mark.slow
def test_cli_sigterm_drains_and_exits_cleanly(tmp_path):
  """SIGTERM to the serving CLI takes the same graceful path as ctrl-C:
  stop accepting, drain, exit 0 (eviction must not drop in-flight work)."""
  import pathlib
  import signal as signal_mod
  import subprocess
  import sys
  import time
  import urllib.request

  root = pathlib.Path(__file__).resolve().parent.parent
  env = dict(os.environ)
  env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
  proc = subprocess.Popen(
      [sys.executable, '-u', str(root / 'scripts' / 'serve_embeddings.py'),
       '--tiny', '--cpu-devices', '1', '--port', '0', '--buckets', '1'],
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
  port = None
  deadline = time.time() + 300
  while time.time() < deadline:
    line = proc.stdout.readline()
    if not line:
      break
    if line.startswith('serving on http://'):
      port = int(line.split(':')[2].split(' ')[0].split('(')[0].strip('/ '))
      break
  assert port, 'server never announced its port'
  # The announce happens before server.start(); wait until it answers.
  for _ in range(100):
    try:
      urllib.request.urlopen(f'http://127.0.0.1:{port}/healthz', timeout=5)
      break
    except Exception:
      time.sleep(0.1)
  proc.send_signal(signal_mod.SIGTERM)
  assert proc.wait(timeout=60) == 0


class TestDeadlineHTTP:

  def test_expired_deadline_is_504(self):
    """X-Deadline-Ms elapses while the request is queued (worker not yet
    started) -> HTTP 504, and the expiry shows up in /metrics."""
    cfg = fe.FactorizedEncoderConfig(**TINY)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      buf = io.BytesIO()
      np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
      req = urllib.request.Request(
          _url(httpd, '/v1/embed'), buf.getvalue(),
          {'Content-Type': 'application/x-npy', 'X-Deadline-Ms': '50'})
      errs = []

      def call():
        try:
          urllib.request.urlopen(req, timeout=60)
        except urllib.error.HTTPError as e:
          errs.append(e)

      t = threading.Thread(target=call, daemon=True)
      t.start()
      # Let the deadline lapse with the request queued, then serve.
      while service._queue.empty() and t.is_alive():
        threading.Event().wait(0.01)
      threading.Event().wait(0.2)
      service.start()
      t.join(timeout=30)
      assert errs and errs[0].code == 504
      metrics = urllib.request.urlopen(
          _url(httpd, '/metrics'), timeout=30).read().decode()
      assert 'videoprism_requests_expired_total 1' in metrics
    finally:
      httpd.stop()
      service.stop()

  @pytest.mark.parametrize('bad', ['soon', '-5', '0', 'nan'])
  def test_bad_deadline_header_is_400(self, server, bad):
    """Unparseable, nonpositive, AND NaN deadlines are the client's
    mistake (NaN comparisons are all False — it would silently disable
    expiry; nonpositive would surface as a 500 from the service)."""
    httpd, _, _ = server
    buf = io.BytesIO()
    np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
    req = urllib.request.Request(
        _url(httpd, '/v1/embed'), buf.getvalue(),
        {'Content-Type': 'application/x-npy', 'X-Deadline-Ms': bad})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


class TestBearerAuth:

  @pytest.fixture(scope='class')
  def auth_server(self):
    cfg = fe.FactorizedEncoderConfig(**TINY)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0, auth_token='sesame')
    httpd.start()
    yield httpd
    httpd.stop()
    service.stop()

  def _npy_body(self):
    buf = io.BytesIO()
    np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
    return buf.getvalue()

  def test_missing_token_is_401(self, auth_server):
    req = urllib.request.Request(
        _url(auth_server, '/v1/embed'), self._npy_body(),
        {'Content-Type': 'application/x-npy'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 401
    assert ei.value.headers['WWW-Authenticate'] == 'Bearer'

  def test_wrong_token_is_401(self, auth_server):
    req = urllib.request.Request(
        _url(auth_server, '/v1/embed'), self._npy_body(),
        {'Content-Type': 'application/x-npy',
         'Authorization': 'Bearer wrong'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 401

  def test_non_ascii_token_is_401_not_500(self, auth_server):
    """str hmac.compare_digest raises TypeError on non-ASCII input — the
    comparison must run on bytes so a garbage header gets a clean 401
    instead of a dropped connection."""
    req = urllib.request.Request(
        _url(auth_server, '/v1/embed'), self._npy_body(),
        {'Content-Type': 'application/x-npy',
         'Authorization': 'Bearer s\xe9same\xff'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 401

  def test_valid_token_serves(self, auth_server):
    req = urllib.request.Request(
        _url(auth_server, '/v1/embed'), self._npy_body(),
        {'Content-Type': 'application/x-npy',
         'Authorization': 'Bearer sesame'})
    out = urllib.request.urlopen(req, timeout=60).read()
    emb = np.load(io.BytesIO(out))
    assert emb.shape == (8, 16)

  def test_health_and_metrics_stay_open(self, auth_server):
    assert json.loads(urllib.request.urlopen(
        _url(auth_server, '/healthz'), timeout=30).read())['status'] == 'ok'
    assert b'videoprism_' in urllib.request.urlopen(
        _url(auth_server, '/metrics'), timeout=30).read()


def test_text_service_stats_merge_into_endpoints():
  """When the text tower is served through TextEncodeService, its
  counters ride /stats and /metrics alongside the video service's."""
  cfg = fe.FactorizedEncoderConfig(**TINY)
  model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
  state = model.init(jax.random.PRNGKey(0))
  service = serving.EmbeddingService(model, state, batch_buckets=(1,))
  service.start()
  text_service = serving.TextEncodeService(
      lambda texts: np.zeros((len(texts), 8), np.float32))
  text_service.start()
  httpd = serving_http.EmbeddingHTTPServer(
      service, host='127.0.0.1', port=0,
      text_encode_fn=text_service.encode, text_service=text_service)
  httpd.start()
  try:
    req = urllib.request.Request(
        _url(httpd, '/v1/embed_text'),
        json.dumps({'texts': ['hello']}).encode(),
        {'Content-Type': 'application/json'})
    out = json.loads(urllib.request.urlopen(req, timeout=30).read())
    assert len(out['embeddings'][0]) == 8
    stats = json.loads(urllib.request.urlopen(
        _url(httpd, '/stats'), timeout=30).read())
    assert stats['text_requests_served'] == 1
    assert stats['text_batches_run'] == 1
    metrics = urllib.request.urlopen(
        _url(httpd, '/metrics'), timeout=30).read().decode()
    assert 'videoprism_text_requests_served_total 1' in metrics
  finally:
    httpd.stop()
    text_service.stop()
    service.stop()


@pytest.mark.slow
def test_cli_lvt_from_export_text_starts(tmp_path):
  """Regression: a misplaced --index-save-path validation detached the
  lvt elif chain, making --from-export-text exit at startup on the very
  servers it exists for."""
  import pathlib
  import subprocess
  import sys

  root = pathlib.Path(__file__).resolve().parent.parent
  sys.path.insert(0, str(root / 'scripts'))
  from smoke_configs import TINY_CLIP as SMOKE_TINY_CLIP

  from videoprism_tpu import export as export_lib
  from videoprism_tpu.models import clip as vclip_mod

  cfg = vclip_mod.VideoCLIPConfig(**SMOKE_TINY_CLIP)
  model = vp.Model(cfg, vclip_mod.apply, init_lib.init_video_clip)
  params = model.init(jax.random.PRNGKey(0))
  artifact = str(tmp_path / 'tiny_text.jaxexport')
  export_lib.export_forward(model, params, tower='text',
                            text_len=12).save(artifact)

  env = dict(os.environ)
  env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
  r = subprocess.run(
      [sys.executable, str(root / 'scripts' / 'serve_embeddings.py'),
       '--tiny-clip', '--cpu-devices', '1', '--port', '0',
       '--from-export-text', artifact, '--smoke'],
      capture_output=True, text=True, env=env, timeout=600)
  assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
  assert 'smoke embed_text' in r.stdout


@pytest.mark.slow
def test_cli_serves_from_export_artifact(tmp_path):
  """End-to-end CLI path: export_model.py --tiny writes an AOT artifact,
  serve_embeddings.py --from-export serves from it (no re-trace), and the
  --smoke self-request round-trips an embedding."""
  import pathlib
  import subprocess
  import sys

  root = pathlib.Path(__file__).resolve().parent.parent
  env = dict(os.environ)
  env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
  artifact = str(tmp_path / 'tiny_enc.jaxexport')
  r = subprocess.run(
      [sys.executable, str(root / 'scripts' / 'export_model.py'),
       '--tiny', '--cpu-devices', '1', '--output', artifact],
      capture_output=True, text=True, env=env, timeout=300)
  assert r.returncode == 0, r.stdout + r.stderr
  assert os.path.getsize(artifact) > 0
  r = subprocess.run(
      [sys.executable, str(root / 'scripts' / 'serve_embeddings.py'),
       '--tiny', '--cpu-devices', '1', '--port', '0', '--buckets', '1',
       '--from-export', artifact, '--smoke'],
      capture_output=True, text=True, env=env, timeout=300)
  assert r.returncode == 0, r.stdout + r.stderr
  assert 'AOT artifact' in r.stdout


class TestDebugTrace:

  def test_capture_returns_trace_dir(self, server, tmp_path):
    import glob
    import urllib.request

    httpd, _, _ = server
    req = urllib.request.Request(_url(httpd, '/debug/trace?ms=50'),
                                 b'', method='POST')
    with urllib.request.urlopen(req, timeout=120) as resp:
      out = json.loads(resp.read())
    assert out['duration_ms'] == 50
    assert os.path.isdir(out['trace_dir'])
    # jax writes plugins/profile/<run>/*.xplane.pb under the trace dir.
    assert glob.glob(os.path.join(out['trace_dir'], '**', '*.xplane.pb'),
                     recursive=True)

  def test_bad_ms_rejected(self, server):
    import urllib.request

    httpd, _, _ = server
    req = urllib.request.Request(_url(httpd, '/debug/trace?ms=0'),
                                 b'', method='POST')
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400

  def test_concurrent_capture_conflicts(self, server):
    import urllib.request

    from videoprism_tpu.serving_http import _Handler

    httpd, _, _ = server
    assert _Handler._trace_lock.acquire(blocking=False)
    try:
      req = urllib.request.Request(_url(httpd, '/debug/trace?ms=50'),
                                   b'', method='POST')
      with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
      assert ei.value.code == 409
    finally:
      _Handler._trace_lock.release()


class TestClassifyEndpoint:

  @pytest.fixture(scope='class')
  def clf_server(self):
    from videoprism_tpu.models import classifier as vc

    enc = fe.FactorizedEncoderConfig(**TINY)
    cfg = vc.VideoClassifierConfig(encoder=enc, num_classes=4)
    model = vp.Model(cfg, vc.apply, init_lib.init_video_classifier)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0,
        labels=['cat', 'dog', 'drum', 'sea'])
    httpd.start()
    yield httpd, model, state
    httpd.stop()
    service.stop()

  def test_topk_matches_direct_softmax(self, clf_server):
    from videoprism_tpu.client import VideoPrismClient

    httpd, model, state = clf_server
    clip = np.random.RandomState(0).rand(*CLIP_SHAPE).astype(np.float32)
    preds = VideoPrismClient(
        f'http://127.0.0.1:{httpd.port}').classify(clip, k=3)
    assert len(preds) == 3
    probs = [p['prob'] for p in preds]
    assert probs == sorted(probs, reverse=True)
    logits, _ = model.apply(state, clip[None], train=False)
    want = int(np.argmax(np.asarray(logits)[0]))
    assert preds[0]['class'] == want
    assert preds[0]['label'] == ['cat', 'dog', 'drum', 'sea'][want]
    assert abs(sum(p['prob'] for p in preds)) <= 1.0 + 1e-6

  def test_k_clamped_and_bad_k_rejected(self, clf_server):
    httpd, _, _ = clf_server
    buf = io.BytesIO()
    np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
    req = urllib.request.Request(
        _url(httpd, '/v1/classify?k=99'), buf.getvalue(),
        {'Content-Type': 'application/x-npy'})
    out = json.loads(urllib.request.urlopen(req, timeout=60).read())
    assert len(out['predictions']) == 4  # clamped to num_classes
    req = urllib.request.Request(
        _url(httpd, '/v1/classify?k=0'), buf.getvalue(),
        {'Content-Type': 'application/x-npy'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400

  def test_classify_video_file_body(self, clf_server):
    """A video/* body decodes server-side and classifies like the
    locally decoded clip (client: classify_file)."""
    from videoprism_tpu import assets
    from videoprism_tpu.client import VideoPrismClient
    from videoprism_tpu.io import video as video_io

    httpd, model, state = clf_server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    preds = c.classify_file(assets.demo_video_path(), k=2)
    assert len(preds) == 2
    clip = video_io.load_video(assets.demo_video_path(), num_frames=2,
                               target_size=12, as_uint8=True)
    logits, _ = model.apply(state, clip[None].astype(np.float32) / 255.0,
                            train=False)
    assert preds[0]['class'] == int(np.argmax(np.asarray(logits)[0]))

  def test_classify_file_multi_view_averages_logits(self, clf_server):
    """?temporal_views=2 runs the ViViT protocol server-side: the
    response softmax must equal softmax(mean of per-view logits) from a
    local decode of the same views."""
    from videoprism_tpu import assets
    from videoprism_tpu.client import VideoPrismClient
    from videoprism_tpu.io import video as video_io

    httpd, model, state = clf_server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    preds = c.classify_file(assets.demo_video_path(), k=4,
                            temporal_views=2)
    views = video_io.load_video_views(
        assets.demo_video_path(), num_frames=2, target_size=12,
        temporal_views=2, as_uint8=True)
    logits, _ = model.apply(state, views.astype(np.float32) / 255.0,
                            train=False)
    mean_logits = np.asarray(logits, np.float64).mean(axis=0)
    want = np.exp(mean_logits - mean_logits.max())
    want /= want.sum()
    got = sorted(preds, key=lambda p: p['class'])
    np.testing.assert_allclose([p['prob'] for p in got], want, atol=1e-5)

  def test_classify_long_matches_library(self, clf_server):
    """/v1/classify_long == streaming.classify_long_video on the same
    container (exact streaming-pooler logits, served)."""
    from videoprism_tpu import assets, streaming
    from videoprism_tpu.client import VideoPrismClient

    httpd, model, state = clf_server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    path = assets.demo_video_path()
    preds = c.classify_long_file(path, k=4, window=2, size=12,
                                 timeout_s=600)
    assert len(preds) == 4
    assert abs(sum(p['prob'] for p in preds) - 1.0) < 1e-5
    logits = streaming.classify_long_video(
        model._unwrap(state), model.config, path, window=2,
        target_size=12)
    want = np.argsort(-np.asarray(logits))
    assert [p['class'] for p in preds] == [int(i) for i in want]
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    np.testing.assert_allclose(
        [p['prob'] for p in preds], probs[want], atol=1e-4)

  def test_classify_long_overlapping_windows(self, clf_server):
    from videoprism_tpu import assets
    from videoprism_tpu.client import VideoPrismClient

    httpd, _, _ = clf_server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    preds = c.classify_long_file(assets.demo_video_path(), k=1, window=2,
                                 stride=1, size=12, timeout_s=600)
    assert preds and 0.0 < preds[0]['prob'] <= 1.0

  def test_classify_long_validation(self, clf_server, server):
    httpd, _, _ = clf_server
    # Non-video body -> 400.
    req = urllib.request.Request(
        _url(httpd, '/v1/classify_long'), b'{}',
        {'Content-Type': 'application/json'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
    # stride > window -> 400.
    req = urllib.request.Request(
        _url(httpd, '/v1/classify_long?window=2&stride=3'), b'x',
        {'Content-Type': 'video/mp4'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
    # Embedding server -> 404.
    emb_httpd, _, _ = server
    req = urllib.request.Request(
        _url(emb_httpd, '/v1/classify_long'), b'x',
        {'Content-Type': 'video/mp4'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 404

  def test_classify_garbage_file_is_400(self, clf_server):
    httpd, _, _ = clf_server
    req = urllib.request.Request(
        _url(httpd, '/v1/classify'), b'not a container',
        {'Content-Type': 'video/mp4'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400

  def test_embedding_server_404s(self, server):
    httpd, _, _ = server
    buf = io.BytesIO()
    np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
    req = urllib.request.Request(
        _url(httpd, '/v1/classify'), buf.getvalue(),
        {'Content-Type': 'application/x-npy'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 404

  def test_label_count_mismatch_rejected(self):
    from videoprism_tpu.models import classifier as vc

    enc = fe.FactorizedEncoderConfig(**TINY)
    cfg = vc.VideoClassifierConfig(encoder=enc, num_classes=4)
    model = vp.Model(cfg, vc.apply, init_lib.init_video_classifier)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    try:
      with pytest.raises(ValueError, match='labels'):
        serving_http.EmbeddingHTTPServer(service, port=0, labels=['a'])
    finally:
      service.stop()


class TestEmbedLong:
  """POST /v1/embed_long: arbitrary-length containers through windowed
  forwards on the service's batch path."""

  @pytest.fixture(scope='class')
  def lvt_server(self):
    from videoprism_tpu.models import clip as vclip

    cfg = vclip.VideoCLIPConfig(
        **TINY, num_auxiliary_layers=1, enable_causal_atten=True,
        num_unimodal_layers=2, norm_policy='pre', vocabulary_size=1000)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1, 2))
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    yield httpd, model, state
    httpd.stop()
    service.stop()

  def test_matches_library_embed_video_file(self, lvt_server):
    from videoprism_tpu import assets, streaming
    from videoprism_tpu.client import VideoPrismClient

    httpd, model, state = lvt_server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    path = assets.demo_video_path()
    pooled = c.embed_long_file(path, window=2, size=12, timeout_s=600)
    windows = c.embed_long_file(path, window=2, size=12, per_window=True,
                                timeout_s=600)
    assert pooled.ndim == 1 and windows.ndim == 2
    assert abs(np.linalg.norm(pooled) - 1.0) < 1e-3

    def embed_fn(batch):
      out, _, _ = model.apply(state, batch.astype(np.float32) / 255.0,
                              None, None, train=False)
      return np.asarray(out)

    want_pooled, want_windows = streaming.embed_video_file(
        embed_fn, path, window=2, target_size=12, batch_windows=2)
    np.testing.assert_allclose(pooled, want_pooled, atol=1e-4)
    np.testing.assert_allclose(windows, want_windows, atol=1e-4)

  def test_overlap_and_dtype(self, lvt_server):
    from videoprism_tpu import assets
    from videoprism_tpu.client import VideoPrismClient

    httpd, _, _ = lvt_server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}',
                         response_dtype='float16')
    emb = c.embed_long_file(assets.demo_video_path(), window=2, stride=1,
                            size=12, timeout_s=600)
    assert emb.dtype == np.float16 and np.isfinite(
        emb.astype(np.float32)).all()

  def test_overlap_takes_spatial_reuse_path(self, lvt_server):
    """stride < window routes through embed_long_video_cached (per-frame
    spatial reuse) — same windows/values as the naive batch path."""
    from videoprism_tpu import assets, streaming
    from videoprism_tpu.client import VideoPrismClient

    httpd, model, state = lvt_server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    path = assets.demo_video_path()
    windows = c.embed_long_file(path, window=2, stride=1, size=12,
                                per_window=True, timeout_s=600)

    def embed_fn(batch):  # the pre-reuse service path, as the oracle
      out, _, _ = model.apply(state, batch.astype(np.float32) / 255.0,
                              None, None, train=False)
      return np.asarray(out)

    _, want = streaming.embed_video_file(
        embed_fn, path, window=2, stride=1, target_size=12,
        batch_windows=2)
    assert windows.shape == want.shape
    np.testing.assert_allclose(windows, want, atol=1e-4)

  def test_int8_overlap_uses_quantized_tree(self):
    """The spatial-reuse path unwraps the service state — on an int8
    service that IS the quantized tree, so cached == the int8 batch
    path, not a silent fp fallback."""
    from videoprism_tpu import assets, streaming
    from videoprism_tpu.client import VideoPrismClient
    from videoprism_tpu.models import clip as vclip

    cfg = vclip.VideoCLIPConfig(
        **TINY, num_auxiliary_layers=1, enable_causal_atten=True,
        num_unimodal_layers=2, norm_policy='pre', vocabulary_size=1000)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(model, state, batch_buckets=(1, 2),
                                       quantize='int8')
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
      path = assets.demo_video_path()
      windows = c.embed_long_file(path, window=2, stride=1, size=12,
                                  per_window=True, timeout_s=600)

      def embed_fn(batch):  # the int8 batch path, as the oracle
        return np.asarray(service.embed_batch(batch))

      _, want = streaming.embed_video_file(
          embed_fn, path, window=2, stride=1, target_size=12,
          batch_windows=2)
      assert windows.shape == want.shape
      np.testing.assert_allclose(windows, want, atol=1e-3)
    finally:
      httpd.stop()
      service.stop()

  def test_token_level_model_is_400(self, server):
    httpd, _, _ = server
    from videoprism_tpu import assets

    body = open(assets.demo_video_path(), 'rb').read()
    req = urllib.request.Request(
        _url(httpd, '/v1/embed_long?window=2&size=12'), body,
        {'Content-Type': 'video/mp4'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=120)
    assert ei.value.code == 400
    assert b'one embedding vector' in ei.value.read()

  def test_non_video_body_is_400(self, lvt_server):
    httpd, _, _ = lvt_server
    req = urllib.request.Request(
        _url(httpd, '/v1/embed_long'), b'{}',
        {'Content-Type': 'application/json'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400

  def test_absurd_window_is_400_not_oom(self, lvt_server):
    """The decode-buffer cap (the same hole _file_geometry closes):
    query params must not be able to command terabyte allocations."""
    httpd, _, _ = lvt_server
    for path in ('/v1/embed_long?window=100000000&size=4096',
                 '/v1/embed_long?window=2&size=10000000'):
      req = urllib.request.Request(
          _url(httpd, path), b'x', {'Content-Type': 'video/mp4'})
      with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
      assert ei.value.code == 400
      assert b'decode buffer' in ei.value.read()


class TestLongSweepGating:
  """The long-video sweeps run model code outside the batch path — they
  must fall back (embed_long) or reject (classify_long/localize_long) on
  tensor-parallel servers, whose state is model-axis-sharded, and shed
  when the service has tripped unhealthy."""

  @pytest.fixture(scope='class')
  def tp_lvt_server(self):
    from videoprism_tpu import assets, retrieval
    from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
    from videoprism_tpu.models import clip as vclip
    from videoprism_tpu.parallel import mesh as mesh_lib

    cfg = vclip.VideoCLIPConfig(
        **TINY, num_auxiliary_layers=1, enable_causal_atten=True,
        num_unimodal_layers=2, norm_policy='pre', vocabulary_size=1000)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    service = serving.EmbeddingService(
        model, state, batch_buckets=(4,), mesh=mesh, tensor_parallel=True)
    service.start()
    # A text tower (plain params — the text side is tiny) so
    # /v1/localize_long reaches the model_code_params gate, not the
    # earlier no-text-tower 404.
    tok = SentencePieceTokenizer(assets.test_spm_path())
    encode = retrieval.make_text_query_encoder(
        model._unwrap(state), cfg, tok)
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0, text_encode_fn=encode)
    httpd.start()
    yield httpd, model, state, service
    httpd.stop()
    service.stop()

  def test_tp_embed_long_overlap_uses_batch_fallback(self, tp_lvt_server):
    """stride < window on a TP lvt server must NOT take the spatial-reuse
    path (plain jit over a sharded tree) — it rides the TP batch path and
    still answers correctly."""
    from videoprism_tpu import assets, streaming
    from videoprism_tpu.client import VideoPrismClient

    httpd, model, state, service = tp_lvt_server
    assert service.model_code_params() is None
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    path = assets.demo_video_path()
    windows = c.embed_long_file(path, window=2, stride=1, size=12,
                                per_window=True, timeout_s=600)

    def embed_fn(batch):  # the TP batch path, as the oracle
      return np.asarray(service.embed_batch(batch))

    _, want = streaming.embed_video_file(
        embed_fn, path, window=2, stride=1, target_size=12,
        batch_windows=4)
    assert windows.shape == want.shape
    np.testing.assert_allclose(windows, want, atol=1e-4)

  def test_tp_localize_long_is_404(self, tp_lvt_server):
    httpd, _, _, _ = tp_lvt_server
    req = urllib.request.Request(
        _url(httpd, '/v1/localize_long?q=drum&window=2&size=12'), b'x',
        {'Content-Type': 'video/mp4'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 404
    assert b'single-program' in ei.value.read()

  def test_tp_classify_long_is_404(self):
    from videoprism_tpu.models import classifier as vc
    from videoprism_tpu.parallel import mesh as mesh_lib

    enc = fe.FactorizedEncoderConfig(**TINY)
    cfg = vc.VideoClassifierConfig(encoder=enc, num_classes=4)
    model = vp.Model(cfg, vc.apply, init_lib.init_video_classifier)
    state = model.init(jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    service = serving.EmbeddingService(
        model, state, batch_buckets=(4,), mesh=mesh, tensor_parallel=True)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0,
        labels=['cat', 'dog', 'drum', 'sea'])
    httpd.start()
    try:
      req = urllib.request.Request(
          _url(httpd, '/v1/classify_long?window=2&size=12'), b'x',
          {'Content-Type': 'video/mp4'})
      with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
      assert ei.value.code == 404
      assert b'single-program' in ei.value.read()
    finally:
      httpd.stop()
      service.stop()

  def test_unhealthy_service_sheds_long_sweeps(self):
    """A tripped service (chip gone) answers the long endpoints with
    503 + Retry-After instead of starting a minutes-long sweep."""
    from videoprism_tpu.models import clip as vclip

    cfg = vclip.VideoCLIPConfig(
        **TINY, num_auxiliary_layers=1, enable_causal_atten=True,
        num_unimodal_layers=2, norm_policy='pre', vocabulary_size=1000)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(
        model, state, batch_buckets=(1,), unhealthy_after_errors=1)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      with service._stats_lock:
        service._consecutive_batch_errors = 1  # trip the threshold
      req = urllib.request.Request(
          _url(httpd, '/v1/embed_long?window=2&stride=1&size=12'), b'x',
          {'Content-Type': 'video/mp4'})
      with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
      assert ei.value.code == 503
      assert ei.value.headers['Retry-After'] is not None
      assert b'long-video sweep' in ei.value.read()
    finally:
      httpd.stop()
      service.stop()


class TestPriorityHeader:

  def test_batch_priority_accepted_and_counted(self, server):
    httpd, model, state = server
    clip = np.random.RandomState(3).rand(*CLIP_SHAPE).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, clip)
    req = urllib.request.Request(
        _url(httpd, '/v1/embed'), buf.getvalue(),
        {'Content-Type': 'application/x-npy', 'X-Priority': 'batch'})
    with urllib.request.urlopen(req, timeout=120) as resp:
      got = np.load(io.BytesIO(resp.read()))
    ref, _ = model.apply(state, clip[None], train=False)
    np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-5)
    with urllib.request.urlopen(_url(httpd, '/stats'), timeout=30) as r:
      stats = json.loads(r.read())
    assert stats['batch_priority_served'] >= 1

  def test_unknown_priority_is_400(self, server):
    httpd, _, _ = server
    buf = io.BytesIO()
    np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
    req = urllib.request.Request(
        _url(httpd, '/v1/embed'), buf.getvalue(),
        {'Content-Type': 'application/x-npy', 'X-Priority': 'urgent'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    assert b'X-Priority' in ei.value.read()

  def test_client_priority_header(self, server):
    from videoprism_tpu.client import VideoPrismClient

    httpd, _, _ = server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}',
                         priority='batch')
    emb = c.embed(np.zeros(CLIP_SHAPE, np.float32))
    assert emb.shape == (8, 16)
    with pytest.raises(ValueError, match='priority'):
      VideoPrismClient(f'http://127.0.0.1:{httpd.port}', priority='x')


class TestMalformedRequests:
  """Fuzz-ish robustness: arbitrary garbage on every endpoint must come
  back as a clean JSON 4xx and never wedge the server."""

  CASES = [
      ('/v1/embed', b'', 'application/x-npy'),                # empty body
      ('/v1/embed', b'not-an-npy-blob', 'application/x-npy'),
      ('/v1/embed', b'\x93NUMPY\x01\x00garbage', 'application/x-npy'),
      ('/v1/embed', b'{"shape": "nope"}', 'application/json'),
      ('/v1/embed', b'\xff\xfe\x00', 'application/json'),     # not utf-8
      ('/v1/embed_text', b'{"texts": []}', 'application/json'),
      ('/v1/embed_text', b'{"texts": [1, 2]}', 'application/json'),
      ('/v1/embed_text', b'{', 'application/json'),
      ('/v1/search', b'{"k": -3, "texts": ["x"]}', 'application/json'),
      ('/v1/search_video', b'junk', 'application/x-npy'),
      ('/v1/classify', b'junk', 'application/x-npy'),
      ('/debug/trace?ms=banana', b'', 'application/x-npy'),
      ('/v1/embed?dtype=complex64', b'junk', 'application/x-npy'),
      ('/v1/index/add', b'junk', 'application/x-npy'),   # 404: no index
      ('/v1/index/save', b'', 'application/json'),       # 404: no index
      ('/v1/index/add?id=', b'junk', 'application/x-npy'),
  ]

  def test_garbage_yields_json_4xx_and_server_survives(self, server):
    httpd, _, _ = server
    for path, body, ctype in self.CASES:
      req = urllib.request.Request(
          _url(httpd, path), body, {'Content-Type': ctype},
          method='POST')
      with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
      assert 400 <= ei.value.code < 500, (path, ei.value.code)
      payload = json.loads(ei.value.read())
      assert 'error' in payload, path
    # The server is still alive and serving after the barrage.
    with urllib.request.urlopen(_url(httpd, '/healthz'),
                                timeout=30) as resp:
      assert resp.status == 200

  def test_oversized_content_length_rejected(self, server):
    import http.client

    httpd, _, _ = server
    conn = http.client.HTTPConnection('127.0.0.1', httpd.port, timeout=30)
    # Claim 2 GB without sending it: must be rejected on the header.
    conn.putrequest('POST', '/v1/embed')
    conn.putheader('Content-Type', 'application/x-npy')
    conn.putheader('Content-Length', str(2 << 30))
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


class TestHealthTripsOnErrorStreak:
  """A pod whose chip is gone serves only errors — /healthz must flip to
  503 (drop out of the load balancer) and recover on the next success."""

  def test_healthz_trips_and_recovers(self):
    from videoprism_tpu.client import VideoPrismClient

    cfg = fe.FactorizedEncoderConfig(**TINY)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    state = model.init(jax.random.PRNGKey(0))
    service = serving.EmbeddingService(
        model, state, batch_buckets=(1,), max_wait_ms=1.0,
        unhealthy_after_errors=2)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}', max_retries=0,
                         timeout_s=60)
    clip = np.zeros(CLIP_SHAPE, np.float32)
    try:
      assert c.healthy()
      good_forward = service._forward
      service._forward = lambda *a: (_ for _ in ()).throw(
          RuntimeError('chip gone'))
      for _ in range(2):  # trip the 2-error threshold
        with pytest.raises(Exception):
          c.embed(clip)
      assert not service.healthy()
      assert not c.healthy()
      with urllib.request.urlopen(
          _url(httpd, '/healthz'), timeout=30) as r:  # noqa: F841
        raise AssertionError('expected 503')
    except urllib.error.HTTPError as e:
      assert e.code == 503
      assert json.loads(e.read())['status'] == 'unhealthy'
    finally:
      service._forward = good_forward
    # One successful batch restores health.
    emb = c.embed(clip)
    assert emb.shape == (8, 16)
    assert service.healthy() and c.healthy()
    assert service.stats()['consecutive_batch_errors'] == 0
    httpd.stop()
    service.stop()
    assert not service.healthy()  # stopped services report unhealthy
