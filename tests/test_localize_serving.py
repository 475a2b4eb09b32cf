"""HTTP /v1/localize: text-to-time moment localization as a serving
endpoint (frames service + text tower), and the client SDK form."""

import base64
import io
import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import assets, retrieval, serving, serving_http
from videoprism_tpu.client import VideoPrismClient
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import init as init_lib

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True, num_auxiliary_layers=1,
    enable_causal_atten=True, num_unimodal_layers=2, norm_policy='pre',
    vocabulary_size=1000)
CLIP_SHAPE = (4, 12, 12, 3)
QUERIES = ['a person drumming', 'the ocean at night']


@pytest.fixture(scope='module')
def stack():
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
  model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)

  service = serving.EmbeddingService(model, params, batch_buckets=(1, 2),
                                     max_wait_ms=5.0)
  service.start()
  frames_service = serving.EmbeddingService(
      retrieval.make_frame_embeddings_model(cfg), params,
      batch_buckets=(1, 2), max_wait_ms=5.0)
  frames_service.start()
  tok = SentencePieceTokenizer(assets.test_spm_path())
  encode = retrieval.make_text_query_encoder(params, cfg, tok)
  httpd = serving_http.EmbeddingHTTPServer(
      service, host='127.0.0.1', port=0, text_encode_fn=encode,
      frames_service=frames_service)
  httpd.start()
  yield httpd, cfg, params, encode
  httpd.stop()
  frames_service.stop()
  service.stop()


def _url(httpd, path):
  return f'http://127.0.0.1:{httpd.port}{path}'


def _post_json_localize(httpd, video, queries, query='', **spec_extra):
  spec = {'video': {'shape': list(video.shape),
                    'dtype': str(video.dtype),
                    'data_b64': base64.b64encode(
                        np.ascontiguousarray(video).tobytes()).decode()},
          'queries': queries, **spec_extra}
  req = urllib.request.Request(
      _url(httpd, '/v1/localize' + query), json.dumps(spec).encode(),
      {'Content-Type': 'application/json'})
  with urllib.request.urlopen(req, timeout=120) as resp:
    return json.loads(resp.read())


class TestLocalizeEndpoint:

  def test_json_form_matches_library(self, stack):
    httpd, cfg, params, encode = stack
    video = np.random.default_rng(0).random(CLIP_SHAPE, np.float32)
    out = _post_json_localize(httpd, video, QUERIES, k=2,
                              window_sizes=[1, 2])
    assert out['frames'] == 4
    assert [r['query'] for r in out['results']] == QUERIES

    frame_fn = retrieval.make_frame_embeddings_fn(params, cfg)
    expected = retrieval.localize_moments(
        frame_fn(video), encode(QUERIES), window_sizes=(1, 2), top_k=2)
    for got_row, want_row in zip(out['results'], expected):
      assert [ (s['start'], s['end']) for s in got_row['segments'] ] == \
          [(s['start'], s['end']) for s in want_row]
      np.testing.assert_allclose(
          [s['score'] for s in got_row['segments']],
          [s['score'] for s in want_row], atol=1e-4)

  def test_frames_service_stats_surface(self, stack):
    """Localization traffic (the frames service's own queue) shows up in
    /stats under frames_* keys — it must not be invisible load."""
    httpd, _, _, _ = stack
    video = np.random.default_rng(3).random(CLIP_SHAPE, np.float32)
    _post_json_localize(httpd, video, QUERIES[:1], k=1, window_sizes=[1])
    with urllib.request.urlopen(_url(httpd, '/stats'), timeout=30) as r:
      stats = json.loads(r.read())
    assert stats['frames_requests_served'] >= 1
    assert 'frames_batches_run' in stats

  def test_file_form_with_q_params(self, stack):
    httpd, _, _, _ = stack
    body = open(assets.demo_video_path(), 'rb').read()
    req = urllib.request.Request(
        _url(httpd, '/v1/localize?q=drumming&q=ocean&frames=4&size=12'
                    '&k=1&window_sizes=2'),
        body, {'Content-Type': 'video/mp4'})
    with urllib.request.urlopen(req, timeout=120) as resp:
      out = json.loads(resp.read())
    assert out['frames'] == 4
    assert len(out['results']) == 2
    seg = out['results'][0]['segments'][0]
    assert seg['end'] - seg['start'] == 2

  @pytest.mark.parametrize('path, body, ctype, needle', [
      ('/v1/localize', b'{}', 'application/json', 'video'),
      ('/v1/localize?q=x', b'garbage', 'text/plain', 'localize takes'),
      ('/v1/localize?frames=4&size=12', b'x', 'video/mp4', 'q='),
      ('/v1/localize?q=x&temporal_views=2&frames=4&size=12', b'x',
       'video/mp4', 'temporal'),
  ])
  def test_bad_requests_are_400(self, stack, path, body, ctype, needle):
    httpd, _, _, _ = stack
    with pytest.raises(urllib.error.HTTPError) as exc:
      urllib.request.urlopen(urllib.request.Request(
          _url(httpd, path), body, {'Content-Type': ctype}), timeout=60)
    assert exc.value.code == 400
    assert needle in json.loads(exc.value.read())['error']

  def test_empty_queries_is_400(self, stack):
    httpd, _, _, _ = stack
    video = np.zeros(CLIP_SHAPE, np.float32)
    with pytest.raises(urllib.error.HTTPError) as exc:
      _post_json_localize(httpd, video, [])
    assert exc.value.code == 400

  def test_models_listing_shows_localize(self, stack):
    httpd, _, _, _ = stack
    with urllib.request.urlopen(_url(httpd, '/v1/models'),
                                timeout=60) as resp:
      (entry,) = json.loads(resp.read())['models']
    assert entry['localize'] and entry['text']

  def test_server_without_frames_service_is_404(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(1), cfg)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    service = serving.EmbeddingService(model, params, batch_buckets=(1,),
                                       max_wait_ms=5.0)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0,
        text_encode_fn=lambda texts: np.zeros((len(texts), 16),
                                              np.float32))
    httpd.start()
    try:
      with pytest.raises(urllib.error.HTTPError) as exc:
        _post_json_localize(httpd, np.zeros(CLIP_SHAPE, np.float32),
                            ['x'])
      assert exc.value.code == 404
    finally:
      httpd.stop()
      service.stop()

  def test_frames_service_requires_text(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(1), cfg)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    service = serving.EmbeddingService(model, params, batch_buckets=(1,),
                                       max_wait_ms=5.0)
    with pytest.raises(ValueError, match='text_encode_fn'):
      serving_http.EmbeddingHTTPServer(
          service, host='127.0.0.1', port=0, frames_service=service)


class TestClientLocalize:

  def test_array_and_file_forms(self, stack):
    httpd, _, _, _ = stack
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    video = np.random.default_rng(2).random(CLIP_SHAPE, np.float32)
    out = c.localize(video, QUERIES, k=2, window_sizes=(1, 2))
    assert out['frames'] == 4
    assert len(out['results'][0]['segments']) == 2

    out_f = c.localize(assets.demo_video_path(), ['drumming'], k=1,
                       frames=4, size=12)
    assert out_f['frames'] == 4
    assert out_f['results'][0]['query'] == 'drumming'

  def test_bad_rank_raises_client_side(self, stack):
    httpd, _, _, _ = stack
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    with pytest.raises(ValueError, match='localize expects'):
      c.localize(np.zeros((12, 12, 3), np.float32), ['x'])


class TestLocalizeLong:
  """POST /v1/localize_long: moment localization over containers of any
  length via windowed per-frame embeddings (constant memory)."""

  def test_matches_library_sweep(self, stack):
    from videoprism_tpu import streaming

    httpd, cfg, params, encode = stack
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    out = c.localize_long_file(
        assets.demo_video_path(), ['drumming'], k=2, window=2, size=12,
        timeout_s=600)
    assert out['frames'] > 2  # whole container, not one clip's worth
    assert out['results'][0]['query'] == 'drumming'
    segments = out['results'][0]['segments']
    assert segments and all(
        0 <= s['start'] < s['end'] <= out['frames'] for s in segments)

    frame_emb = streaming.frame_embeddings_long(
        params, cfg, assets.demo_video_path(), window=2, target_size=12)
    want = retrieval.localize_moments(
        frame_emb, np.asarray(encode(['drumming'])),
        window_sizes=tuple(w for w in (1, 2, 4, 8) if w <= len(frame_emb)),
        top_k=2)
    assert out['frames'] == len(frame_emb)
    got = [(s['start'], s['end']) for s in segments]
    assert got == [(s['start'], s['end']) for s in want[0]]

  def test_overlap_engages_spatial_reuse(self, stack, monkeypatch):
    from videoprism_tpu import streaming

    httpd, _, _, _ = stack
    calls = []
    real = streaming.stream_window_token_batches

    def spy(*a, **k):
      calls.append(1)
      return real(*a, **k)

    monkeypatch.setattr(streaming, 'stream_window_token_batches', spy)
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    out = c.localize_long_file(assets.demo_video_path(), ['drumming'],
                               window=2, stride=1, size=12, timeout_s=600)
    assert calls and out['results']

  def test_needs_queries_400(self, stack):
    httpd, _, _, _ = stack
    req = urllib.request.Request(
        _url(httpd, '/v1/localize_long?window=2&size=12'),
        open(assets.demo_video_path(), 'rb').read(),
        {'Content-Type': 'video/mp4'})
    with pytest.raises(urllib.error.HTTPError) as exc:
      urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400
    assert b'q=' in exc.value.read()

  def test_nonpositive_k_400(self, stack):
    """?k=0 must 400 at parse time (mirrors /v1/classify_long), not leak
    into localize_moments as a 500/empty result."""
    httpd, _, _, _ = stack
    for k in ('0', '-2'):
      req = urllib.request.Request(
          _url(httpd, f'/v1/localize_long?q=x&k={k}&window=2&size=12'),
          b'x', {'Content-Type': 'video/mp4'})
      with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
      assert exc.value.code == 400
      assert b'positive' in exc.value.read()
    # The short-clip sibling /v1/localize validates both query and JSON
    # forms of k the same way.
    video = np.zeros(CLIP_SHAPE, np.float32)
    with pytest.raises(urllib.error.HTTPError) as exc:
      _post_json_localize(httpd, video, QUERIES, k=0)
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
      _post_json_localize(httpd, video, QUERIES, query='?k=-1')
    assert exc.value.code == 400

  def test_needs_text_tower_404(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(1), cfg)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    service = serving.EmbeddingService(model, params, batch_buckets=(1,),
                                       max_wait_ms=5.0)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      req = urllib.request.Request(
          _url(httpd, '/v1/localize_long?q=x&window=2&size=12'), b'x',
          {'Content-Type': 'video/mp4'})
      with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
      assert exc.value.code == 404
    finally:
      httpd.stop()
      service.stop()
