"""Server-side zero-shot classification (/v1/zero_shot): registered
class-prototype sets, one round trip per clip, hot-reload invalidation.

The CLIP zero-shot protocol is the reference's headline lvt use case
(reference README.md:210-214 publishes K400 zero-shot accuracies); this
makes it a serving endpoint with the text work cached server-side.
"""

import io
import json
import urllib.error
import urllib.request
import zlib

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import serving, serving_http
from videoprism_tpu.client import VideoPrismClient
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import init as init_lib

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True, num_auxiliary_layers=1,
    enable_causal_atten=True, num_unimodal_layers=2, norm_policy='pre',
    vocabulary_size=1000)
CLIP_SHAPE = (2, 12, 12, 3)
DIM = 16


class _CountingTextEncoder:
  """Deterministic fake text tower: each string maps to a fixed unit
  vector (crc32-seeded, stable across processes); counts calls so tests
  can assert the caching behavior."""

  def __init__(self, salt: int = 0):
    self.calls = 0
    self._salt = salt

  def _vec(self, text: str) -> np.ndarray:
    seed = (zlib.crc32(text.encode()) + self._salt) % (2 ** 32)
    v = np.random.default_rng(seed).standard_normal(DIM)
    return v / np.linalg.norm(v)

  def __call__(self, texts):
    self.calls += 1
    return np.stack([self._vec(t) for t in texts]).astype(np.float32)


@pytest.fixture(scope='module')
def server():
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
  state = model.init(jax.random.PRNGKey(0))
  service = serving.EmbeddingService(model, state, batch_buckets=(1, 2),
                                     max_wait_ms=5.0)
  service.start()
  encoder = _CountingTextEncoder()
  text_service = serving.TextEncodeService(encoder, max_wait_ms=5.0)
  text_service.start()
  httpd = serving_http.EmbeddingHTTPServer(
      service, host='127.0.0.1', port=0,
      text_encode_fn=text_service.encode, text_service=text_service)
  httpd.start()
  yield httpd, encoder, text_service
  httpd.stop()
  text_service.stop()
  service.stop()


def _url(httpd, path):
  return f'http://127.0.0.1:{httpd.port}{path}'


def _register(httpd, classes, templates=None, expect=200):
  spec = {'classes': classes}
  if templates is not None:
    spec['templates'] = templates
  req = urllib.request.Request(
      _url(httpd, '/v1/zero_shot/classes'), json.dumps(spec).encode(),
      {'Content-Type': 'application/json'})
  try:
    with urllib.request.urlopen(req, timeout=60) as resp:
      assert resp.status == expect
      return json.loads(resp.read())
  except urllib.error.HTTPError as e:
    assert e.code == expect, (e.code, e.read())
    return json.loads(e.read())


def _classify(httpd, clip, set_id, k=5, temperature=0.01, expect=200):
  buf = io.BytesIO()
  np.save(buf, clip)
  req = urllib.request.Request(
      _url(httpd, f'/v1/zero_shot?set={set_id}&k={k}'
                  f'&temperature={temperature}'),
      buf.getvalue(), {'Content-Type': 'application/x-npy'})
  try:
    with urllib.request.urlopen(req, timeout=120) as resp:
      assert resp.status == expect
      return json.loads(resp.read())
  except urllib.error.HTTPError as e:
    assert e.code == expect, (e.code, e.read())
    return json.loads(e.read())


def _embed(httpd, clip):
  buf = io.BytesIO()
  np.save(buf, clip)
  req = urllib.request.Request(
      _url(httpd, '/v1/embed'), buf.getvalue(),
      {'Content-Type': 'application/x-npy'})
  with urllib.request.urlopen(req, timeout=120) as resp:
    return np.load(io.BytesIO(resp.read()))


CLASSES = ['drumming', 'swimming', 'cooking']


class TestProtocol:

  def test_register_then_classify_matches_manual_protocol(self, server):
    httpd, encoder, _ = server
    out = _register(httpd, CLASSES)
    assert out['num_classes'] == 3
    set_id = out['set']

    clip = np.random.default_rng(0).random(CLIP_SHAPE, np.float32)
    result = _classify(httpd, clip, set_id, k=3, temperature=0.05)
    assert result['set'] == set_id
    preds = result['predictions']
    assert len(preds) == 3
    assert {p['label'] for p in preds} == set(CLASSES)

    # Manual protocol: prototypes from the same fake encoder, cosine
    # sims against the served (pooled, normalized) video embedding.
    from videoprism_tpu import evaluation

    protos = evaluation.zero_shot_classifier(encoder, CLASSES)
    emb = np.asarray(_embed(httpd, clip), np.float32)
    emb /= np.linalg.norm(emb)
    logits = (protos @ emb) / 0.05
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    order = np.argsort(-probs)
    assert [p['class'] for p in preds] == [int(i) for i in order]
    np.testing.assert_allclose(
        [p['prob'] for p in preds], probs[order], atol=1e-4)

  def test_registration_is_idempotent_and_cached(self, server):
    httpd, encoder, _ = server
    first = _register(httpd, ['a thing', 'another thing'])
    calls_after_first = encoder.calls
    second = _register(httpd, ['a thing', 'another thing'])
    assert first['set'] == second['set']
    assert encoder.calls == calls_after_first  # cache hit: no text work

  def test_classify_does_no_text_work(self, server):
    httpd, encoder, _ = server
    set_id = _register(httpd, CLASSES)['set']
    calls = encoder.calls
    clip = np.random.default_rng(1).random(CLIP_SHAPE, np.float32)
    _classify(httpd, clip, set_id)
    assert encoder.calls == calls  # prototypes came from the cache

  def test_distinct_templates_get_distinct_sets(self, server):
    httpd, _, _ = server
    a = _register(httpd, CLASSES)['set']
    b = _register(httpd, CLASSES, templates=['a photo of {}.'])['set']
    assert a != b

  def test_hot_reload_recomputes_prototypes(self, server):
    """A text-tower weight swap (TextEncodeService.reload) must not
    leave clips scoring against prototypes from the OLD embedding
    space — the entry recomputes transparently on next use."""
    httpd, encoder, text_service = server
    set_id = _register(httpd, ['first', 'second'])['set']
    clip = np.random.default_rng(2).random(CLIP_SHAPE, np.float32)
    # temperature=1.0: the default 0.01 saturates the 2-class softmax to
    # [1, 0] in BOTH embedding spaces, hiding the recompute.
    before = _classify(httpd, clip, set_id,
                       temperature=1.0)['predictions']

    new_encoder = _CountingTextEncoder(salt=12345)
    text_service.reload(new_encoder)
    try:
      after = _classify(httpd, clip, set_id,
                        temperature=1.0)['predictions']
      assert new_encoder.calls > 0  # prototypes recomputed on new tower
      # Different embedding space -> different probabilities.
      assert ([p['prob'] for p in before] != [p['prob'] for p in after])
    finally:
      text_service.reload(encoder)


class TestValidation:

  def test_missing_set_param_is_400(self, server):
    httpd, _, _ = server
    buf = io.BytesIO()
    np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
    with pytest.raises(urllib.error.HTTPError) as exc:
      urllib.request.urlopen(urllib.request.Request(
          _url(httpd, '/v1/zero_shot'), buf.getvalue(),
          {'Content-Type': 'application/x-npy'}), timeout=60)
    assert exc.value.code == 400
    assert 'set=' in json.loads(exc.value.read())['error']

  def test_unknown_set_is_404(self, server):
    httpd, _, _ = server
    out = _classify(httpd, np.zeros(CLIP_SHAPE, np.float32),
                    'deadbeef00000000', expect=404)
    assert 'class set' in out['error']

  @pytest.mark.parametrize('spec, needle', [
      ({'classes': []}, 'classes'),
      ({'classes': ['ok', '']}, 'classes'),
      ({'classes': 'not-a-list'}, 'classes'),
      ({}, 'classes'),
      ({'classes': ['a'], 'templates': []}, 'templates'),
      ({'classes': ['a'], 'templates': ['no placeholder']}, 'placeholder'),
  ])
  def test_bad_registration_is_400(self, server, spec, needle):
    httpd, _, _ = server
    req = urllib.request.Request(
        _url(httpd, '/v1/zero_shot/classes'), json.dumps(spec).encode(),
        {'Content-Type': 'application/json'})
    with pytest.raises(urllib.error.HTTPError) as exc:
      urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400
    assert needle in json.loads(exc.value.read())['error']

  @pytest.mark.parametrize('query', ['k=0', 'temperature=0',
                                     'temperature=nope'])
  def test_bad_params_are_400(self, server, query):
    httpd, _, _ = server
    set_id = _register(httpd, CLASSES)['set']
    buf = io.BytesIO()
    np.save(buf, np.zeros(CLIP_SHAPE, np.float32))
    with pytest.raises(urllib.error.HTTPError) as exc:
      urllib.request.urlopen(urllib.request.Request(
          _url(httpd, f'/v1/zero_shot?set={set_id}&{query}'),
          buf.getvalue(), {'Content-Type': 'application/x-npy'}),
          timeout=60)
    assert exc.value.code == 400

  def test_non_lvt_server_is_404(self):
    from videoprism_tpu.models import factorized_encoder as fe

    cfg = fe.FactorizedEncoderConfig(**{
        k: v for k, v in TINY_CLIP.items()
        if k not in ('num_auxiliary_layers', 'enable_causal_atten',
                     'num_unimodal_layers', 'norm_policy',
                     'vocabulary_size')})
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    service = serving.EmbeddingService(model, model.init(
        jax.random.PRNGKey(0)), batch_buckets=(1,), max_wait_ms=5.0)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      req = urllib.request.Request(
          _url(httpd, '/v1/zero_shot/classes'),
          json.dumps({'classes': ['a']}).encode(),
          {'Content-Type': 'application/json'})
      with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
      assert exc.value.code == 404
    finally:
      httpd.stop()
      service.stop()

  def test_lru_eviction(self, server):
    httpd, _, _ = server
    victim = _register(httpd, ['victim class'])['set']
    for i in range(20):  # store max is 16: push the victim out
      _register(httpd, [f'filler class {i}'])
    out = _classify(httpd, np.zeros(CLIP_SHAPE, np.float32), victim,
                    expect=404)
    assert 'evicted' in out['error'] or 'class set' in out['error']


class TestClientSDK:

  def test_remote_matches_client_side(self, server):
    httpd, _, _ = server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    clip = np.random.default_rng(3).random(CLIP_SHAPE, np.float32)
    local = c.zero_shot(clip, CLASSES, k=3, temperature=0.05)
    remote = c.zero_shot(clip, CLASSES, k=3, temperature=0.05,
                         remote=True)
    assert [p['label'] for p in local] == [p['label'] for p in remote]
    np.testing.assert_allclose([p['prob'] for p in local],
                               [p['prob'] for p in remote], atol=1e-4)

  def test_register_is_memoized_client_side(self, server):
    httpd, encoder, _ = server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    a = c.register_classes(['memo one', 'memo two'])
    calls = encoder.calls
    b = c.register_classes(['memo one', 'memo two'])
    assert a == b and encoder.calls == calls

  def test_eviction_triggers_transparent_reregistration(self, server):
    httpd, _, _ = server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    classes = ['evictable alpha', 'evictable beta']
    clip = np.random.default_rng(4).random(CLIP_SHAPE, np.float32)
    first = c.zero_shot(clip, classes, remote=True)
    for i in range(20):  # evict the set server-side
      _register(httpd, [f'churn class {i}'])
    again = c.zero_shot(clip, classes, remote=True)  # re-registers
    assert [p['label'] for p in first] == [p['label'] for p in again]
