"""Multi-model HTTP serving: several models in one process/port
(`EmbeddingHTTPServer.add_model`), routed at /v1/models/<name>/...

One chip claim hosting a bulk tier + a quality tier (or an embedding
model + a classifier head) is the production shape this covers; the
reference has no serving tier at all (SURVEY.md §5).
"""

import io
import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import serving, serving_http
from videoprism_tpu.client import VideoPrismClient
from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.retrieval import VideoIndex

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)
CLIP_SHAPE = (2, 12, 12, 3)
NUM_CLASSES = 7
LABELS = [f'class_{i}' for i in range(NUM_CLASSES)]


def _fake_text_encode(texts):
  """Deterministic stand-in for an lvt text tower (routing under test
  here, not CLIP numerics)."""
  out = np.stack([np.full((4,), float(len(t)), np.float32) for t in texts])
  return out / np.linalg.norm(out, axis=-1, keepdims=True)


@pytest.fixture(scope='module')
def server():
  enc_cfg = fe.FactorizedEncoderConfig(**TINY)
  enc_model = vp.Model(enc_cfg, fe.apply, init_lib.init_factorized_encoder)
  enc_state = enc_model.init(jax.random.PRNGKey(0))
  enc_service = serving.EmbeddingService(
      enc_model, enc_state, batch_buckets=(1, 2), max_wait_ms=5.0)
  enc_service.start()

  cls_cfg = vc.VideoClassifierConfig(encoder=enc_cfg,
                                     num_classes=NUM_CLASSES)
  cls_model = vp.Model(cls_cfg, vc.apply, init_lib.init_video_classifier)
  cls_state = cls_model.init(jax.random.PRNGKey(1))
  cls_service = serving.EmbeddingService(
      cls_model, cls_state, batch_buckets=(1, 2), max_wait_ms=5.0)
  cls_service.start()

  index = VideoIndex(np.eye(4, dtype=np.float32),
                     ids=[f'vid{i}' for i in range(4)])

  httpd = serving_http.EmbeddingHTTPServer(
      enc_service, host='127.0.0.1', port=0, model_name='enc')
  # A second model family on the same port...
  httpd.add_model('cls', cls_service, labels=LABELS)
  # ...and a third name with text/search surfaces attached (it shares
  # the encoder service: bindings are per NAME, so the text tower and
  # index exist only on this route).
  httpd.add_model('lvt', enc_service, text_encode_fn=_fake_text_encode,
                  index=index)
  httpd.start()
  yield httpd
  httpd.stop()
  cls_service.stop()
  enc_service.stop()


def _url(httpd, path):
  return f'http://127.0.0.1:{httpd.port}{path}'


def _post_npy(httpd, path, array, timeout=120):
  buf = io.BytesIO()
  np.save(buf, array)
  req = urllib.request.Request(_url(httpd, path), buf.getvalue(),
                               {'Content-Type': 'application/x-npy'})
  with urllib.request.urlopen(req, timeout=timeout) as resp:
    return np.load(io.BytesIO(resp.read()))


def _get_json(httpd, path):
  with urllib.request.urlopen(_url(httpd, path), timeout=60) as resp:
    return resp.status, json.loads(resp.read())


class TestRouting:

  def test_default_path_routes_to_default_model(self, server):
    clip = np.random.default_rng(0).random(CLIP_SHAPE, np.float32)
    via_default = _post_npy(server, '/v1/embed', clip)
    via_name = _post_npy(server, '/v1/models/enc/embed', clip)
    np.testing.assert_array_equal(via_default, via_name)

  def test_second_model_serves_at_its_route(self, server):
    clip = np.random.default_rng(1).random(CLIP_SHAPE, np.float32)
    logits = _post_npy(server, '/v1/models/cls/embed', clip)
    assert logits.shape == (NUM_CLASSES,)
    # The default model is an encoder: token-level output, not logits.
    tokens = _post_npy(server, '/v1/embed', clip)
    assert tokens.ndim == 2 and tokens.shape[0] != NUM_CLASSES

  def test_classify_routes_per_model(self, server):
    clip = np.random.default_rng(2).random(CLIP_SHAPE, np.float32)
    buf = io.BytesIO()
    np.save(buf, clip)
    req = urllib.request.Request(
        _url(server, '/v1/models/cls/classify?k=3'), buf.getvalue(),
        {'Content-Type': 'application/x-npy'})
    with urllib.request.urlopen(req, timeout=120) as resp:
      preds = json.loads(resp.read())['predictions']
    assert len(preds) == 3
    assert preds[0]['label'] in LABELS
    # The default (encoder) model has no classifier head -> 404.
    with pytest.raises(urllib.error.HTTPError) as exc:
      urllib.request.urlopen(urllib.request.Request(
          _url(server, '/v1/classify'), buf.getvalue(),
          {'Content-Type': 'application/x-npy'}), timeout=60)
    assert exc.value.code == 404

  def test_text_surfaces_are_per_model(self, server):
    body = json.dumps({'texts': ['hello']}).encode()
    req = urllib.request.Request(
        _url(server, '/v1/models/lvt/embed_text'), body,
        {'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=60) as resp:
      emb = json.loads(resp.read())['embeddings']
    np.testing.assert_allclose(emb, _fake_text_encode(['hello']), rtol=1e-6)
    # The same endpoint on the default model (no text tower) is 404.
    with pytest.raises(urllib.error.HTTPError) as exc:
      urllib.request.urlopen(urllib.request.Request(
          _url(server, '/v1/embed_text'), body,
          {'Content-Type': 'application/json'}), timeout=60)
    assert exc.value.code == 404

  def test_search_on_named_model(self, server):
    body = json.dumps({'texts': ['abcd'], 'k': 2}).encode()
    req = urllib.request.Request(
        _url(server, '/v1/models/lvt/search'), body,
        {'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=60) as resp:
      results = json.loads(resp.read())['results']
    assert len(results[0]) == 2
    assert results[0][0]['id'].startswith('vid')

  def test_unknown_model_is_404_with_listing(self, server):
    buf = io.BytesIO()
    np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
    with pytest.raises(urllib.error.HTTPError) as exc:
      urllib.request.urlopen(urllib.request.Request(
          _url(server, '/v1/models/nope/embed'), buf.getvalue(),
          {'Content-Type': 'application/x-npy'}), timeout=60)
    assert exc.value.code == 404
    detail = json.loads(exc.value.read())
    assert detail['models'] == ['cls', 'enc', 'lvt']

  def test_model_route_without_endpoint_is_404(self, server):
    with pytest.raises(urllib.error.HTTPError) as exc:
      urllib.request.urlopen(urllib.request.Request(
          _url(server, '/v1/models/cls'), b'x',
          {'Content-Type': 'application/x-npy'}), timeout=60)
    assert exc.value.code == 404

  def test_keep_alive_connection_interleaves_models(self, server):
    """One persistent connection can hit different models request to
    request — per-request binding must not leak across keep-alive."""
    import http.client

    clip = np.random.default_rng(3).random(CLIP_SHAPE, np.float32)
    buf = io.BytesIO()
    np.save(buf, clip)
    body = buf.getvalue()
    conn = http.client.HTTPConnection('127.0.0.1', server.port, timeout=120)
    try:
      shapes = []
      for path in ('/v1/embed', '/v1/models/cls/embed', '/v1/embed'):
        conn.request('POST', path, body,
                     {'Content-Type': 'application/x-npy'})
        resp = conn.getresponse()
        assert resp.status == 200
        shapes.append(np.load(io.BytesIO(resp.read())).shape)
      assert shapes[0] == shapes[2]
      assert shapes[1] == (NUM_CLASSES,)
      assert shapes[0] != shapes[1]
    finally:
      conn.close()


class TestIntrospection:

  def test_models_listing(self, server):
    status, out = _get_json(server, '/v1/models')
    assert status == 200
    by_name = {m['name']: m for m in out['models']}
    assert set(by_name) == {'enc', 'cls', 'lvt'}
    assert by_name['enc']['default'] and not by_name['cls']['default']
    assert by_name['cls']['kind'] == 'classifier'
    assert by_name['enc']['kind'] == 'embedding'
    assert by_name['lvt']['text'] and by_name['lvt']['search']
    assert not by_name['enc']['text']
    assert by_name['enc']['clip_geometry'] == {'frames': 2, 'size': 12}

  def test_stats_nest_per_model(self, server):
    status, out = _get_json(server, '/stats')
    assert status == 200
    assert set(out['models']) == {'enc', 'cls', 'lvt'}
    assert 'requests_served' in out['models']['enc']

  def test_metrics_carry_model_labels_one_type_per_family(self, server):
    with urllib.request.urlopen(_url(server, '/metrics'),
                                timeout=60) as resp:
      text = resp.read().decode()
    type_lines = [ln for ln in text.splitlines() if ln.startswith('# TYPE')]
    assert len(type_lines) == len(set(type_lines))  # no duplicate families
    assert 'videoprism_requests_served_total{model="enc"}' in text
    assert 'videoprism_requests_served_total{model="cls"}' in text
    # The summary merges the model label with the quantile label.
    assert ('model="enc",quantile="0.5"' in text
            or 'batch_latency' not in text)

  def test_single_model_stats_stay_flat(self):
    """A one-model server keeps the historical flat /stats payload and
    unlabeled /metrics (existing dashboards must not break)."""
    cfg = fe.FactorizedEncoderConfig(**TINY)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    service = serving.EmbeddingService(model, model.init(
        jax.random.PRNGKey(0)), batch_buckets=(1,), max_wait_ms=5.0)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      _, stats = _get_json(httpd, '/stats')
      assert 'requests_served' in stats  # flat, not nested
      with urllib.request.urlopen(_url(httpd, '/metrics'),
                                  timeout=60) as resp:
        text = resp.read().decode()
      assert 'model=' not in text
      assert 'videoprism_requests_served_total 0' in text
    finally:
      httpd.stop()
      service.stop()


class _StubService:
  """healthy()/stats() double for aggregation tests (no model runs)."""

  def __init__(self, healthy: bool):
    self._healthy = healthy

  def healthy(self):
    return self._healthy

  def stats(self):
    return {'requests_served': 0,
            'consecutive_batch_errors': 0 if self._healthy else 5}


class TestHealthAggregation:

  def _server(self, healthy_a, healthy_b):
    httpd = serving_http.EmbeddingHTTPServer(
        _StubService(healthy_a), host='127.0.0.1', port=0, model_name='a')
    httpd.add_model('b', _StubService(healthy_b))
    httpd.start()
    return httpd

  def test_any_unhealthy_model_trips_the_pod(self):
    httpd = self._server(True, False)
    try:
      with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(_url(httpd, '/healthz'), timeout=60)
      assert exc.value.code == 503
      detail = json.loads(exc.value.read())
      assert detail['models'] == {'a': 'ok', 'b': 'unhealthy'}
    finally:
      httpd.stop()

  def test_all_healthy_is_200(self):
    httpd = self._server(True, True)
    try:
      status, out = _get_json(httpd, '/healthz')
      assert status == 200 and out == {'status': 'ok'}
    finally:
      httpd.stop()


class TestRegistration:

  def test_duplicate_name_rejected(self, server):
    with pytest.raises(ValueError, match='already served'):
      server.add_model('cls', _StubService(True))

  @pytest.mark.parametrize('bad', ['', 'a/b', 'a b', 'a"b', 'ünïcode'])
  def test_bad_names_rejected(self, server, bad):
    with pytest.raises(ValueError, match='bad model name'):
      server.add_model(bad, _StubService(True))


class TestClientSDK:

  def test_client_pins_a_model(self, server):
    base = f'http://127.0.0.1:{server.port}'
    clip = np.random.default_rng(4).random(CLIP_SHAPE, np.float32)
    default = VideoPrismClient(base).embed(clip)
    named = VideoPrismClient(base, model='enc').embed(clip)
    np.testing.assert_array_equal(default, named)
    preds = VideoPrismClient(base, model='cls').classify(clip, k=2)
    assert len(preds) == 2 and preds[0]['label'] in LABELS
    text = VideoPrismClient(base, model='lvt').embed_text(['hi'])
    assert text.shape == (1, 4)

  def test_client_lists_models(self, server):
    listing = VideoPrismClient(f'http://127.0.0.1:{server.port}').models()
    assert {m['name'] for m in listing} == {'enc', 'cls', 'lvt'}

  def test_client_unknown_model_raises_request_error(self, server):
    from videoprism_tpu.client import RequestError

    client = VideoPrismClient(f'http://127.0.0.1:{server.port}',
                              model='nope', max_retries=0)
    with pytest.raises(RequestError) as exc:
      client.embed(np.zeros(CLIP_SHAPE, np.float32))
    assert exc.value.status == 404


@pytest.mark.slow
def test_sighup_reloads_every_model():
  """One SIGHUP fans the hot reload out to the default model AND every
  --extra-model (the CLI used to reload the default only)."""
  import os
  import pathlib
  import signal
  import subprocess
  import sys
  import time

  root = pathlib.Path(__file__).resolve().parent.parent
  env = dict(os.environ)
  env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
  proc = subprocess.Popen(
      [sys.executable, '-u', str(root / 'scripts' / 'serve_embeddings.py'),
       '--tiny', '--cpu-devices', '1', '--port', '0',
       '--extra-model', 'second=tiny_clip'],
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
  try:
    seen = []
    deadline = time.time() + 300
    while time.time() < deadline:
      line = proc.stdout.readline()
      if not line:
        break
      seen.append(line)
      if line.startswith('serving on http://'):
        break
    assert any(l.startswith('serving on') for l in seen), ''.join(seen)
    proc.send_signal(signal.SIGHUP)
    got_default = got_extra = False
    deadline = time.time() + 120
    while time.time() < deadline and not (got_default and got_extra):
      line = proc.stdout.readline()
      if not line:
        break
      seen.append(line)
      if line.startswith('reload: --tiny serves random init'):
        got_default = True
      if line.startswith('reload[second]: tiny fixture'):
        got_extra = True
    assert got_default and got_extra, ''.join(seen[-20:])
  finally:
    proc.terminate()
    proc.wait(timeout=60)
