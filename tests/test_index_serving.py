"""Online index mutation over HTTP (/v1/index/add, /v1/index/save): the
served corpus as a living collection — a self-contained vector database
over the wire.

NOTE: tests in this module run in file order against one module-scoped
server whose index starts EMPTY (empty-search semantics are asserted
first, adds afterwards).
"""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import retrieval, serving, serving_http
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


@pytest.fixture(scope='module', params=['host', 'device'])
def server(request, tmp_path_factory):
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
  state = model.init(jax.random.PRNGKey(0))
  service = serving.EmbeddingService(model, state, batch_buckets=(1, 2),
                                     max_wait_ms=5.0)
  service.start()
  save_path = str(tmp_path_factory.mktemp('index') / 'corpus.npz')
  index = retrieval.VideoIndex()  # empty mutable corpus
  if request.param == 'device':
    # The whole ordered CRUD story must also hold when searches ride the
    # HBM-sharded snapshot (serve_embeddings --index-backend device).
    from videoprism_tpu.device_index import DeviceAcceleratedIndex
    index = DeviceAcceleratedIndex(index)
  httpd = serving_http.EmbeddingHTTPServer(
      service, host='127.0.0.1', port=0, index=index,
      index_save_path=save_path)
  httpd.start()
  yield httpd, service, index, save_path
  httpd.stop()
  service.stop()


def _url(httpd, path):
  return f'http://127.0.0.1:{httpd.port}{path}'


def _clip(seed):
  return np.random.default_rng(seed).random(CLIP_SHAPE, np.float32)


def _post_npy(httpd, path, array, expect=200):
  buf = io.BytesIO()
  np.save(buf, array)
  req = urllib.request.Request(_url(httpd, path), buf.getvalue(),
                               {'Content-Type': 'application/x-npy'})
  try:
    with urllib.request.urlopen(req, timeout=120) as resp:
      assert expect == 200
      return json.loads(resp.read())
  except urllib.error.HTTPError as e:
    detail = e.read()
    assert e.code == expect, (e.code, detail)
    return json.loads(detail or b'{}')


class TestIndexServing:

  def test_0_search_video_on_empty_corpus_is_empty(self, server):
    httpd, _, _, _ = server
    out = _post_npy(httpd, '/v1/search_video?k=3', _clip(0))
    assert out == {'results': [[]]}

  def test_1_add_then_search_finds_it(self, server):
    httpd, _, index, _ = server
    out = _post_npy(httpd, '/v1/index/add?id=first', _clip(1))
    assert out == {'id': 'first', 'size': 1, 'replaced': False}
    assert len(index) == 1
    hits = _post_npy(httpd, '/v1/search_video?k=3', _clip(1))['results'][0]
    assert hits[0]['id'] == 'first'
    assert hits[0]['score'] > 0.999  # same clip, same tower

  def test_2_client_sdk_add_default_id_upserts(self, server):
    httpd, _, index, _ = server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    clip = _clip(2)
    vid = c.index_add(clip)
    assert len(vid) == 16 and len(index) == 2
    # Same bytes -> same default id -> UPSERT (a retry of the same
    # upload must not accumulate duplicate rows).
    assert c.index_add(clip) == vid
    assert len(index) == 2

  def test_3_add_file_via_client(self, server):
    from videoprism_tpu import assets

    httpd, _, index, _ = server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    vid = c.index_add_file(assets.demo_video_path(), id='demo video',
                           frames=2, size=12)
    assert vid == 'demo video'
    hits = c.search_video_file(assets.demo_video_path(), k=1,
                               frames=2, size=12)
    assert hits[0][0] == 'demo video'

  def test_4_stats_carry_index_size(self, server):
    httpd, _, index, _ = server
    with urllib.request.urlopen(_url(httpd, '/stats'), timeout=30) as r:
      stats = json.loads(r.read())
    assert stats['index_size'] == len(index)
    with urllib.request.urlopen(_url(httpd, '/metrics'), timeout=30) as r:
      body = r.read().decode()
    assert f'videoprism_index_size {len(index)}' in body

  def test_5_save_persists_and_reloads(self, server):
    httpd, _, index, save_path = server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    out = c.index_save()
    assert out == {'path': save_path, 'size': len(index)}
    reloaded = retrieval.load_index(save_path)
    assert len(reloaded) == len(index)
    assert set(reloaded.ids) == set(index.ids)

  def test_6_remove_deletes_and_search_forgets(self, server):
    httpd, _, index, _ = server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    clip = _clip(11)
    c.index_add(clip, id='to-delete')
    hits = _post_npy(httpd, '/v1/search_video?k=1', clip)['results'][0]
    assert hits[0]['id'] == 'to-delete'
    before = len(index)
    assert c.index_remove(['to-delete', 'never-existed']) == 1
    assert len(index) == before - 1
    hits = _post_npy(httpd, '/v1/search_video?k=5', clip)['results'][0]
    assert 'to-delete' not in {h['id'] for h in hits}

  def test_7_remove_validation(self, server):
    httpd, _, _, _ = server
    req = urllib.request.Request(
        _url(httpd, '/v1/index/remove'),
        json.dumps({'ids': []}).encode(),
        {'Content-Type': 'application/json'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400

  def test_bad_id_rejected(self, server):
    httpd, _, _, _ = server
    _post_npy(httpd, '/v1/index/add?id=' + 'x' * 513, _clip(9), expect=400)

  def test_unknown_index_path_404(self, server):
    httpd, _, _, _ = server
    _post_npy(httpd, '/v1/index/drop', _clip(9), expect=404)

  def test_no_index_server_404(self, server):
    httpd, service, _, _ = server
    bare = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                            port=0)
    bare.start()
    try:
      _post_npy(bare, '/v1/index/add', _clip(9), expect=404)
      _post_npy(bare, '/v1/index/save', _clip(9), expect=404)
    finally:
      bare.stop()

  def test_save_without_path_404(self, server):
    httpd, service, index, _ = server
    nosave = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                              port=0, index=index)
    nosave.start()
    try:
      _post_npy(nosave, '/v1/index/save', _clip(9), expect=404)
    finally:
      nosave.stop()

  def test_save_path_requires_index(self, server):
    _, service, _, _ = server
    with pytest.raises(ValueError, match='index_save_path'):
      serving_http.EmbeddingHTTPServer(service, host='127.0.0.1', port=0,
                                       index_save_path='/tmp/x.npz')


@pytest.mark.slow
@pytest.mark.parametrize('backend', ['host', 'device'])
def test_metadata_filtered_search_over_the_wire(backend):
  """index_add(metadata=) + search(filter=) end-to-end: the filter
  restricts text search to matching rows on both index backends (the
  device tier delegates filtered sweeps to its host index)."""
  from videoprism_tpu import assets
  from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
  state = model.init(jax.random.PRNGKey(0))
  service = serving.EmbeddingService(model, state, batch_buckets=(1, 2))
  service.start()
  tok = SentencePieceTokenizer(assets.test_spm_path())
  encode = retrieval.make_text_query_encoder(model._unwrap(state), cfg,
                                             tok)
  index = retrieval.VideoIndex()
  if backend == 'device':
    from videoprism_tpu.device_index import DeviceAcceleratedIndex

    index = DeviceAcceleratedIndex(index)
  httpd = serving_http.EmbeddingHTTPServer(
      service, host='127.0.0.1', port=0, text_encode_fn=encode,
      index=index)
  httpd.start()
  try:
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    for i in range(4):
      c.index_add(_clip(i), id=f'v{i}',
                  metadata={'camera': f'c{i % 2}', 'rank': i})
    c.index_add(_clip(9), id='nometa')
    # Unfiltered: whole corpus reachable.
    (all_hits,) = c.search(['a drum'], k=10)
    assert len(all_hits) == 5
    # Filtered: only the matching rows, scores agreeing with the
    # unfiltered entries for those rows.  Cross-tier tolerance: the
    # filtered sweep runs on the host index in fp32, while the device
    # tier's unfiltered sweep scores against bf16-stored embeddings —
    # its documented precision is ~1e-3, so the comparison can differ
    # by that much on the device backend (ADVICE r4: 1e-5 here failed
    # deterministically at delta 2.9e-4).
    (hits,) = c.search(['a drum'], k=10, filter={'camera': 'c1'})
    assert {i for i, _ in hits} == {'v1', 'v3'}
    ref = dict(all_hits)
    tol = 1e-5 if backend == 'host' else 1e-2
    for i, s in hits:
      assert abs(s - ref[i]) < tol
    # No match -> empty, not an error.
    assert c.search(['a drum'], k=5, filter={'camera': 'zzz'}) == [[]]
    # Video-to-video with the same filter semantics (?filter= URL form).
    vhits = c.search_video(_clip(1), k=10, filter={'camera': 'c1'})
    assert {i for i, _ in vhits} == {'v1', 'v3'}
    assert vhits[0][0] == 'v1'  # the query clip itself ranks first
    assert c.search_video(_clip(1), k=5, filter={'camera': 'zzz'}) == []
    # Malformed filter -> 400.
    import urllib.request as _rq

    req = _rq.Request(
        f'http://127.0.0.1:{httpd.port}/v1/search',
        json.dumps({'texts': ['x'], 'filter': {'a': [1, 2]}}).encode(),
        {'Content-Type': 'application/json'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      _rq.urlopen(req, timeout=60)
    assert ei.value.code == 400
  finally:
    httpd.stop()
    service.stop()


def test_cli_autosaves_index_on_sigterm(tmp_path):
  """A drained pod must not lose in-memory index mutations: SIGTERM
  autosaves the corpus to --index-save-path."""
  import io as io_mod
  import os
  import pathlib
  import signal
  import subprocess
  import sys
  import time

  root = pathlib.Path(__file__).resolve().parent.parent
  env = dict(os.environ)
  env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
  save = str(tmp_path / 'corpus.npz')
  proc = subprocess.Popen(
      [sys.executable, '-u', str(root / 'scripts' / 'serve_embeddings.py'),
       '--tiny-clip', '--cpu-devices', '1', '--port', '0',
       '--index', 'new', '--index-save-path', save],
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
  try:
    port = None
    deadline = time.time() + 300
    while time.time() < deadline:
      line = proc.stdout.readline()
      if not line:
        break
      if line.startswith('serving on'):
        port = int(line.split(':')[2].split(' ')[0].split('(')[0]
                   .strip('/ '))
        break
    assert port
    buf = io_mod.BytesIO()
    np.save(buf, _clip(42))
    req = urllib.request.Request(
        f'http://127.0.0.1:{port}/v1/index/add?id=precious',
        buf.getvalue(), {'Content-Type': 'application/x-npy'})
    urllib.request.urlopen(req, timeout=120).read()
    proc.send_signal(signal.SIGTERM)
    assert proc.wait(timeout=120) == 0
    assert retrieval.load_index(save).ids == ['precious']
  finally:
    if proc.poll() is None:
      proc.terminate()
      proc.wait(timeout=60)


@pytest.mark.slow
def test_cli_vector_database_smoke(tmp_path):
  """serve_embeddings --index new --index-save-path: the CLI starts an
  empty mutable corpus, the --smoke self-requests add/search/save, and
  the persisted file reloads as a real index."""
  import os
  import pathlib
  import subprocess
  import sys

  root = pathlib.Path(__file__).resolve().parent.parent
  env = dict(os.environ)
  env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
  save = str(tmp_path / 'corpus.npz')
  r = subprocess.run(
      [sys.executable, str(root / 'scripts' / 'serve_embeddings.py'),
       '--tiny-clip', '--cpu-devices', '1', '--port', '0',
       '--index', 'new', '--index-save-path', save, '--smoke'],
      capture_output=True, text=True, env=env, timeout=600)
  assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
  assert ("smoke index add -> {'id': 'smoke', 'size': 1, "
          "'replaced': False}" in r.stdout)
  assert "'id': 'smoke'" in r.stdout.split('smoke search_video')[1]
  reloaded = retrieval.load_index(save)
  assert len(reloaded) == 1 and reloaded.ids == ['smoke']


class TestConcurrentMutation:
  """The library-level contract the HTTP surface leans on: adds
  serialize, searches and saves stay consistent under concurrent
  mutation."""

  def test_concurrent_adds_lose_nothing(self):
    index = retrieval.VideoIndex()
    rng = np.random.default_rng(0)
    rows = rng.standard_normal((64, 8)).astype(np.float32)

    def add(i):
      index.add(rows[i:i + 1], [f'id{i}'])

    threads = [threading.Thread(target=add, args=(i,)) for i in range(64)]
    for t in threads:
      t.start()
    for t in threads:
      t.join(timeout=60)
    assert len(index) == 64
    assert set(index.ids) == {f'id{i}' for i in range(64)}
    # Every row findable with its own embedding.
    hits = index.search(rows, k=1)
    assert all(h[0][0] == f'id{i}' for i, h in enumerate(hits))

  def test_search_during_adds_never_misaligns(self):
    index = retrieval.VideoIndex()
    rng = np.random.default_rng(1)
    rows = rng.standard_normal((128, 8)).astype(np.float32)
    index.add(rows[:8], [f'id{i}' for i in range(8)])
    stop = threading.Event()
    errors = []

    def searcher():
      while not stop.is_set():
        try:
          for row, got in zip(rows[:8], index.search(rows[:8], k=1)):
            assert got[0][1] > 0.999
        except Exception as e:  # pragma: no cover
          errors.append(e)
          return

    threads = [threading.Thread(target=searcher) for _ in range(2)]
    for t in threads:
      t.start()
    for i in range(8, 128):
      index.add(rows[i:i + 1], [f'id{i}'])
    stop.set()
    for t in threads:
      t.join(timeout=60)
    assert not errors, errors
    assert len(index) == 128

  def test_save_under_concurrent_add_never_tears(self, tmp_path):
    index = retrieval.VideoIndex()
    rng = np.random.default_rng(2)
    rows = rng.standard_normal((64, 8)).astype(np.float32)
    index.add(rows[:1], ['id0'])
    done = threading.Event()

    def adder():
      for i in range(1, 64):
        index.add(rows[i:i + 1], [f'id{i}'])
      done.set()

    t = threading.Thread(target=adder)
    t.start()
    n = 0
    while not done.is_set():
      path = tmp_path / f's{n}.npz'
      index.save(str(path))
      loaded = retrieval.VideoIndex.load(str(path))  # raises if torn
      assert len(loaded) >= 1
      n += 1
    t.join(timeout=60)
    assert len(index) == 64
