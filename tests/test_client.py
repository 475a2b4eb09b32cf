"""Client SDK tests (videoprism_tpu/client.py): round-trips against a
real server, and the retry/auth/deadline contract against a scripted
handler."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import client as client_lib
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
  service = serving.EmbeddingService(model, state, batch_buckets=(1, 2),
                                     max_wait_ms=5.0)
  service.start()
  httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1', port=0)
  httpd.start()
  yield httpd, model, state
  httpd.stop()
  service.stop()


class TestRoundTrips:

  def test_embed_matches_direct_apply(self, server):
    httpd, model, state = server
    c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    clip = np.random.RandomState(0).rand(*CLIP_SHAPE).astype(np.float32)
    emb = c.embed(clip)
    ref, _ = model.apply(state, clip[None], train=False)
    np.testing.assert_allclose(emb, np.asarray(ref)[0], atol=1e-5)

  def test_embed_batch_and_uint8(self, server):
    httpd, model, state = server
    c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    batch = (np.random.RandomState(1).rand(3, *CLIP_SHAPE)
             * 255).astype(np.uint8)
    emb = c.embed_batch(batch)
    ref, _ = model.apply(state, batch.astype(np.float32) / 255.0,
                         train=False)
    np.testing.assert_allclose(emb, np.asarray(ref), atol=1e-4)

  def test_compressed_client_matches_identity(self, server):
    """compress=True gzips the clip payload; the server inflates it and
    the embedding is identical to the uncompressed wire."""
    httpd, model, state = server
    c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.port}',
                                    compress=True)
    clip = (np.random.RandomState(3).rand(*CLIP_SHAPE)
            * 255).astype(np.uint8)
    emb = c.embed(clip)
    ref, _ = model.apply(state, clip[None].astype(np.float32) / 255.0,
                         train=False)
    np.testing.assert_allclose(emb, np.asarray(ref)[0], atol=1e-4)

  def test_response_dtype_client(self, server):
    """response_dtype='float16' asks the server for half-width
    embeddings (the egress twin of compress=True)."""
    httpd, model, state = server
    c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.port}',
                                    response_dtype='float16')
    clip = np.random.RandomState(4).rand(*CLIP_SHAPE).astype(np.float32)
    emb = c.embed(clip)
    assert emb.dtype == np.float16
    ref, _ = model.apply(state, clip[None], train=False)
    np.testing.assert_allclose(emb.astype(np.float32),
                               np.asarray(ref)[0], atol=2e-3)
    batch = c.embed_batch(clip[None])
    assert batch.dtype == np.float16
    with pytest.raises(ValueError, match='response_dtype'):
      client_lib.VideoPrismClient('http://x', response_dtype='int8')

  def test_embed_file_matches_local_decode(self, server):
    from videoprism_tpu import assets
    from videoprism_tpu.io import video as video_io

    httpd, model, state = server
    c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    emb = c.embed_file(assets.demo_video_path())
    clip = video_io.load_video(assets.demo_video_path(), num_frames=2,
                               target_size=12, as_uint8=True)
    ref, _ = model.apply(state, clip[None].astype(np.float32) / 255.0,
                         train=False)
    np.testing.assert_allclose(emb, np.asarray(ref)[0], atol=1e-5)
    with pytest.raises(ValueError, match='path or raw video bytes'):
      c.embed_file(12345)

  def test_shape_validation_is_client_side(self, server):
    httpd, _, _ = server
    c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    with pytest.raises(ValueError, match='embed expects'):
      c.embed(np.zeros((3, *CLIP_SHAPE), np.float32))
    with pytest.raises(ValueError, match='embed_batch expects'):
      c.embed_batch(np.zeros(CLIP_SHAPE, np.float32))

  def test_health_and_stats(self, server):
    httpd, _, _ = server
    c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    assert c.healthy()
    assert 'requests_served' in c.stats()
    dead = client_lib.VideoPrismClient('http://127.0.0.1:1',
                                       max_retries=0, timeout_s=2)
    assert not dead.healthy()

  def test_server_400_raises_request_error(self, server):
    httpd, _, _ = server
    c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    with pytest.raises(client_lib.RequestError, match='404') as ei:
      c._request('POST', '/nope', b'x',
                 {'Content-Type': 'application/octet-stream'})
    assert ei.value.status == 404


def _scripted_server(script):
  """An HTTP server that answers each request with the next (status,
  headers, body) from `script`, recording request paths/headers."""
  seen = []

  class Handler(BaseHTTPRequestHandler):

    def _serve(self):
      length = int(self.headers.get('Content-Length', 0))
      self.rfile.read(length)
      seen.append((self.path, dict(self.headers)))
      status, headers, body = (script.pop(0) if script
                               else (200, {}, b'{}'))
      self.send_response(status)
      for k, v in headers.items():
        self.send_header(k, v)
      self.send_header('Content-Length', str(len(body)))
      self.end_headers()
      self.wfile.write(body)

    do_GET = do_POST = _serve

    def log_message(self, *a):
      pass

  httpd = ThreadingHTTPServer(('127.0.0.1', 0), Handler)
  threading.Thread(target=httpd.serve_forever, daemon=True).start()
  return httpd, seen


def _npy(array):
  import io
  buf = io.BytesIO()
  np.save(buf, array)
  return buf.getvalue()


class TestRetryContract:

  def test_retries_503_until_success(self):
    emb = np.arange(4, dtype=np.float32)
    httpd, seen = _scripted_server([
        (503, {'Retry-After': '0'}, b'{"error": "shed"}'),
        (503, {'Retry-After': '0'}, b'{"error": "shed"}'),
        (200, {'Content-Type': 'application/x-npy'}, _npy(emb)),
    ])
    try:
      c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.server_port}',
                                      backoff_s=0.01)
      got = c.embed(np.zeros(CLIP_SHAPE, np.float32))
      np.testing.assert_array_equal(got, emb)
      assert len(seen) == 3
    finally:
      httpd.shutdown()

  def test_503_exhausts_into_overloaded(self):
    httpd, seen = _scripted_server(
        [(503, {'Retry-After': '0'}, b'{"error": "shed"}')] * 3)
    try:
      c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.server_port}',
                                      max_retries=2, backoff_s=0.01)
      with pytest.raises(client_lib.Overloaded):
        c.embed(np.zeros(CLIP_SHAPE, np.float32))
      assert len(seen) == 3  # initial + 2 retries, no more
    finally:
      httpd.shutdown()

  def test_504_no_retry(self):
    httpd, seen = _scripted_server(
        [(504, {}, b'{"error": "deadline"}')] * 2)
    try:
      c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.server_port}',
                                      backoff_s=0.01)
      with pytest.raises(client_lib.DeadlineExceeded):
        c.embed(np.zeros(CLIP_SHAPE, np.float32), deadline_ms=5)
      assert len(seen) == 1  # stale work must not be retried
      assert seen[0][1].get('X-Deadline-Ms') == '5'
    finally:
      httpd.shutdown()

  def test_401_no_retry_and_bearer_header(self):
    httpd, seen = _scripted_server([(401, {}, b'{"error": "auth"}')] * 2)
    try:
      c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.server_port}',
                                      auth_token='sesame', backoff_s=0.01)
      with pytest.raises(client_lib.AuthFailed):
        c.embed(np.zeros(CLIP_SHAPE, np.float32))
      assert len(seen) == 1
      assert seen[0][1].get('Authorization') == 'Bearer sesame'
    finally:
      httpd.shutdown()

  def test_connection_refused_retries_then_raises(self):
    c = client_lib.VideoPrismClient('http://127.0.0.1:1', max_retries=1,
                                    backoff_s=0.01, timeout_s=2)
    with pytest.raises(client_lib.RequestError):
      c.embed(np.zeros(CLIP_SHAPE, np.float32))


class TestKeepAlive:

  @staticmethod
  def _counting_server(script):
    """HTTP/1.1 scripted server that counts distinct TCP connections."""
    seen_conns = []

    class Handler(BaseHTTPRequestHandler):
      protocol_version = 'HTTP/1.1'

      def setup(self):
        super().setup()
        seen_conns.append(id(self.connection))

      def _serve(self):
        length = int(self.headers.get('Content-Length', 0))
        self.rfile.read(length)
        status, headers, body = (script.pop(0) if script
                                 else (200, {}, b'{}'))
        self.send_response(status)
        for k, v in headers.items():
          self.send_header(k, v)
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

      do_GET = do_POST = _serve

      def log_message(self, *a):
        pass

    httpd = ThreadingHTTPServer(('127.0.0.1', 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, seen_conns

  def test_sequential_requests_reuse_one_connection(self):
    emb = np.arange(4, dtype=np.float32)
    script = [(200, {'Content-Type': 'application/x-npy'}, _npy(emb))] * 5
    httpd, conns = self._counting_server(script)
    try:
      c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.server_port}')
      for _ in range(5):
        np.testing.assert_array_equal(
            c.embed(np.zeros(CLIP_SHAPE, np.float32)), emb)
      # one accepted connection == one Handler.setup call
      assert len(conns) == 1, f'{len(conns)} connections for 5 requests'
    finally:
      httpd.shutdown()

  def test_one_client_many_threads(self, server):
    """One client instance shared by concurrent threads: each thread
    owns its connection (threading.local), results stay correct."""
    httpd, model, state = server
    c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    clips = np.random.RandomState(7).rand(4, *CLIP_SHAPE).astype(np.float32)
    results = [None] * 8
    errors = []

    def worker(i):
      try:
        results[i] = c.embed(clips[i % 4])
      except Exception as e:  # pragma: no cover - failure detail
        errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
      t.start()
    for t in threads:
      t.join(timeout=120)
    assert not errors, errors
    ref, _ = model.apply(state, clips, train=False)
    for i in range(8):
      np.testing.assert_allclose(results[i], np.asarray(ref)[i % 4],
                                 atol=1e-5)

  def test_stale_connection_redials_transparently(self):
    """A cached keep-alive socket killed between requests (server
    restart, idle timeout) must be re-dialed transparently —
    max_retries=0, so any visible error would fail this test."""
    emb = np.arange(4, dtype=np.float32)
    body = _npy(emb)
    httpd, conns = self._counting_server(
        [(200, {'Content-Type': 'application/x-npy'}, body)] * 2)
    try:
      c = client_lib.VideoPrismClient(
          f'http://127.0.0.1:{httpd.server_port}', max_retries=0)
      np.testing.assert_array_equal(
          c.embed(np.zeros(CLIP_SHAPE, np.float32)), emb)
      # Kill the cached socket out from under the client (what a server
      # restart / LB idle reap does to a keep-alive connection).
      c._local.conn.sock.close()
      np.testing.assert_array_equal(
          c.embed(np.zeros(CLIP_SHAPE, np.float32)), emb)
      assert len(conns) == 2  # first conn + the transparent re-dial
    finally:
      httpd.shutdown()


class TestZeroShot:

  def test_zero_shot_protocol(self):
    """zero_shot = embed + prompt-ensembled embed_text + softmax(sims/T):
    the class whose (template-averaged) text embedding aligns with the
    video embedding wins."""
    d = 4
    video_emb = np.eye(d, dtype=np.float32)[0]          # e-0
    # 2 classes x 4 templates: class 0's templates average toward e0,
    # class 1's toward e1.
    t0 = np.tile(np.eye(d, dtype=np.float32)[0], (4, 1))
    t1 = np.tile(np.eye(d, dtype=np.float32)[1], (4, 1))
    texts = np.concatenate([t0, t1], axis=0)
    httpd, seen = _scripted_server([
        (200, {'Content-Type': 'application/x-npy'}, _npy(video_emb)),
        (200, {'Content-Type': 'application/json'},
         json.dumps({'embeddings': texts.tolist()}).encode()),
    ])
    try:
      c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.server_port}')
      preds = c.zero_shot(np.zeros(CLIP_SHAPE, np.float32),
                          ['drumming', 'swimming'], k=2)
      assert preds[0]['label'] == 'drumming' and preds[0]['class'] == 0
      assert preds[0]['prob'] > 0.99 > preds[1]['prob']
      assert seen[0][0] == '/v1/embed'
      assert seen[1][0] == '/v1/embed_text'
      # 2 classes x 4 default templates rode one embed_text call.
      assert len(seen) == 2
    finally:
      httpd.shutdown()


class TestRetryAfterParsing:

  def test_delta_seconds(self):
    assert client_lib._retry_after_delay('2') == 2.0
    assert client_lib._retry_after_delay('0') == 0.0
    assert client_lib._retry_after_delay('-3') == 0.0  # clamped

  def test_http_date_future_and_past(self):
    from email.utils import format_datetime
    import datetime as dt

    now = dt.datetime.now(dt.timezone.utc)
    future = format_datetime(now + dt.timedelta(seconds=30), usegmt=True)
    past = format_datetime(now - dt.timedelta(seconds=30), usegmt=True)
    delay = client_lib._retry_after_delay(future)
    assert 25.0 < delay <= 30.0
    assert client_lib._retry_after_delay(past) == 0.0

  def test_garbage_and_missing(self):
    assert client_lib._retry_after_delay('soon') == 0.0
    assert client_lib._retry_after_delay(None) == 0.0
    assert client_lib._retry_after_delay('') == 0.0

  def test_http_date_retry_after_end_to_end(self):
    """A 503 whose Retry-After is an HTTP date (in the past, so no real
    sleep) still retries into the eventual success."""
    from email.utils import format_datetime
    import datetime as dt

    past = format_datetime(
        dt.datetime.now(dt.timezone.utc) - dt.timedelta(seconds=5),
        usegmt=True)
    emb = np.arange(4, dtype=np.float32)
    httpd, seen = _scripted_server([
        (503, {'Retry-After': past}, b'{"error": "shed"}'),
        (200, {'Content-Type': 'application/x-npy'}, _npy(emb)),
    ])
    try:
      c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.server_port}',
                                      backoff_s=0.01)
      got = c.embed(np.zeros(CLIP_SHAPE, np.float32))
      np.testing.assert_array_equal(got, emb)
      assert len(seen) == 2
    finally:
      httpd.shutdown()


class TestTextAndSearch:

  def test_embed_text_and_search_wire(self):
    httpd, seen = _scripted_server([
        (200, {'Content-Type': 'application/json'},
         json.dumps({'embeddings': [[0.0, 1.0]]}).encode()),
        (200, {'Content-Type': 'application/json'},
         json.dumps({'results': [[{'id': 'v1', 'score': 0.9}]]}).encode()),
        (200, {'Content-Type': 'application/json'},
         json.dumps({'results': [[{'id': 'v2', 'score': 0.8}]]}).encode()),
    ])
    try:
      c = client_lib.VideoPrismClient(f'http://127.0.0.1:{httpd.server_port}')
      emb = c.embed_text(['a dog'])
      np.testing.assert_array_equal(emb, [[0.0, 1.0]])
      assert c.search(['drums'], k=3) == [[('v1', 0.9)]]
      assert c.search_video(np.zeros(CLIP_SHAPE, np.float32),
                            k=2) == [('v2', 0.8)]
      assert seen[0][0] == '/v1/embed_text'
      assert seen[1][0] == '/v1/search'
      assert seen[2][0] == '/v1/search_video?k=2'
    finally:
      httpd.shutdown()
