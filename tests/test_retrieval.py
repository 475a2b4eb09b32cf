"""Retrieval subsystem (retrieval.py): exact top-k index semantics,
chunked-sweep equivalence, persistence, the index-build + text-query
loops over the lvt towers, and the HTTP search endpoints."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import assets, retrieval, serving, serving_http
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
from videoprism_tpu.train import data as data_lib

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
    num_temporal_layers=1, mlp_dim=16, num_auxiliary_layers=0,
    vocabulary_size=1024, enable_causal_atten=True, num_unimodal_layers=1,
    norm_policy='pre', model_dim=8, num_heads=2, atten_logit_cap=50.0,
    scan=True)


def _brute_force_topk(index_emb, queries, k):
  """Oracle: full cosine matrix + argsort."""
  def norm(x):
    x = np.asarray(x, np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

  scores = norm(queries) @ norm(index_emb).T
  order = np.argsort(-scores, axis=1)[:, :k]
  return order, np.take_along_axis(scores, order, axis=1)


class TestVideoIndex:

  def test_search_matches_brute_force(self):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(50, 16)).astype(np.float32)
    queries = rng.normal(size=(7, 16)).astype(np.float32)
    index = retrieval.VideoIndex(emb, [f'v{i}' for i in range(50)])
    got = index.search(queries, k=5)
    rows, scores = _brute_force_topk(emb, queries, 5)
    for qi in range(7):
      assert [i for i, _ in got[qi]] == [f'v{r}' for r in rows[qi]]
      np.testing.assert_allclose(
          [s for _, s in got[qi]], scores[qi], atol=1e-5)

  def test_chunked_search_equals_unchunked(self):
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(23, 8)).astype(np.float32)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    index = retrieval.VideoIndex(emb)
    assert index.search(q, k=4, chunk_size=5) == index.search(q, k=4)

  def test_scores_descending_and_1d_query(self):
    rng = np.random.default_rng(2)
    index = retrieval.VideoIndex(rng.normal(size=(10, 4)).astype(np.float32))
    (row,) = index.search(rng.normal(size=4).astype(np.float32), k=10)
    scores = [s for _, s in row]
    assert scores == sorted(scores, reverse=True)

  def test_incremental_add_and_k_clamp(self):
    rng = np.random.default_rng(3)
    a, b = rng.normal(size=(4, 6)).astype(np.float32), \
        rng.normal(size=(3, 6)).astype(np.float32)
    index = retrieval.VideoIndex()
    index.add(a, ['a0', 'a1', 'a2', 'a3'])
    index.add(b, ['b0', 'b1', 'b2'])
    assert len(index) == 7
    (row,) = index.search(a[0], k=100)  # clamps to 7
    assert len(row) == 7 and row[0][0] == 'a0'
    assert row[0][1] == pytest.approx(1.0, abs=1e-6)

  def test_save_load_roundtrip(self, tmp_path):
    rng = np.random.default_rng(4)
    emb = rng.normal(size=(12, 5)).astype(np.float32)
    q = rng.normal(size=(2, 5)).astype(np.float32)
    index = retrieval.VideoIndex(emb, [f'/path/{i}.mp4' for i in range(12)])
    path = str(tmp_path / 'idx.npz')
    index.save(path)
    loaded = retrieval.VideoIndex.load(path)
    assert loaded.ids == index.ids
    got, want = loaded.search(q, k=3), index.search(q, k=3)
    # The reload renormalizes already-unit rows: scores may drift 1 ulp.
    assert [[i for i, _ in row] for row in got] == \
        [[i for i, _ in row] for row in want]
    np.testing.assert_allclose(
        [[s for _, s in row] for row in got],
        [[s for _, s in row] for row in want], atol=1e-6)

  def test_error_cases(self):
    index = retrieval.VideoIndex()
    with pytest.raises(ValueError, match='empty'):
      index.search(np.zeros(4, np.float32))
    with pytest.raises(ValueError, match='ids'):
      retrieval.VideoIndex(np.zeros((2, 4), np.float32), ['only-one'])
    index.add(np.ones((2, 4), np.float32), ['a', 'b'])
    with pytest.raises(ValueError, match='dim'):
      index.add(np.ones((1, 5), np.float32), ['c'])
    with pytest.raises(ValueError, match='dim'):
      index.search(np.zeros(5, np.float32))


class TestMetadataFilteredSearch:

  def _index(self, cls=None, n=20, d=8, **kwargs):
    rng = np.random.default_rng(11)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    meta = [{'camera': f'c{i % 3}', 'day': i % 2} for i in range(n)]
    cls = cls or retrieval.VideoIndex
    return cls(emb, [f'v{i}' for i in range(n)], metadata=meta,
               **kwargs), emb

  def test_dict_filter_restricts_to_matching_rows(self):
    index, emb = self._index()
    q = np.random.default_rng(12).normal(size=8).astype(np.float32)
    (hits,) = index.search(q, k=20, where={'camera': 'c1'})
    got_ids = {i for i, _ in hits}
    want_ids = {f'v{i}' for i in range(20) if i % 3 == 1}
    assert got_ids == want_ids
    # Exact scores: equals an unfiltered search's entries for the same
    # rows.
    (all_hits,) = index.search(q, k=20)
    ref = dict(all_hits)
    for i, s in hits:
      assert abs(s - ref[i]) < 1e-6

  def test_multi_key_and_callable_filters(self):
    index, _ = self._index()
    q = np.ones(8, np.float32)
    (hits,) = index.search(q, k=20, where={'camera': 'c0', 'day': 1})
    assert {i for i, _ in hits} == {
        f'v{i}' for i in range(20) if i % 3 == 0 and i % 2 == 1}
    (hits,) = index.search(q, k=20,
                           where=lambda m: m.get('day') == 0)
    assert {i for i, _ in hits} == {f'v{i}' for i in range(0, 20, 2)}

  def test_no_match_returns_empty_not_error(self):
    index, _ = self._index()
    out = index.search(np.ones((2, 8), np.float32), k=3,
                       where={'camera': 'nope'})
    assert out == [[], []]

  def test_metadata_survives_save_load_and_upsert(self, tmp_path):
    index, _ = self._index(n=6)
    # Upsert (remove+add, as the serving path does) without metadata
    # clears it; with metadata replaces it.
    index.remove(['v0'])
    index.add(np.ones((1, 8), np.float32), ['v0'])
    index.remove(['v5'])
    index.add(np.ones((1, 8), np.float32), ['v5'],
              metadata=[{'camera': 'c9'}])
    assert index.metadata_of('v0') == {}
    assert index.metadata_of('v5') == {'camera': 'c9'}
    path = str(tmp_path / 'idx.npz')
    index.save(path)
    loaded = retrieval.load_index(path)
    assert loaded.metadata_of('v5') == {'camera': 'c9'}
    assert loaded.metadata_of('v1') == {'camera': 'c1', 'day': 1}
    q = np.ones(8, np.float32)
    (hits,) = loaded.search(q, k=10, where={'camera': 'c9'})
    assert [i for i, _ in hits] == ['v5']

  def test_remove_clears_metadata(self):
    index, _ = self._index(n=6)
    index.remove(['v2'])
    assert index.metadata_of('v2') == {}
    out = index.search(np.ones(8, np.float32), k=10,
                       where={'camera': 'c2'})
    assert [i for i, _ in out[0]] == ['v5']  # v2 gone, v5 remains

  def test_ann_filtered_search_is_exact(self, tmp_path):
    index, emb = self._index(cls=retrieval.ANNVideoIndex)
    exact, _ = self._index()
    q = np.random.default_rng(13).normal(size=(3, 8)).astype(np.float32)
    got = index.search(q, k=5, where={'day': 0})
    want = exact.search(q, k=5, where={'day': 0})
    assert [[i for i, _ in row] for row in got] == [
        [i for i, _ in row] for row in want]
    # Tombstoned rows stay excluded from filtered sweeps, and metadata
    # survives the compact-on-save round trip.
    index.remove(['v0'])
    (hits,) = index.search(q[0], k=20, where={'day': 0})
    assert 'v0' not in {i for i, _ in hits}
    path = str(tmp_path / 'ann.npz')
    retrieval.save_index_atomic(index, path)
    loaded = retrieval.load_index(path)
    assert loaded.metadata_of('v2') == {'camera': 'c2', 'day': 0}
    (hits,) = loaded.search(q[0], k=20, where={'day': 0})
    assert 'v0' not in {i for i, _ in hits}

  def test_validation(self):
    rng = np.random.default_rng(14)
    emb = rng.normal(size=(3, 4)).astype(np.float32)
    with pytest.raises(ValueError, match='metadata'):
      retrieval.VideoIndex(emb, ['a', 'b', 'c'], metadata=[{}])
    index = retrieval.VideoIndex(emb, ['a', 'b', 'c'])
    with pytest.raises(ValueError, match='metadata'):
      index.add(emb, ['d', 'e', 'f'], metadata=[{}, {}])
    with pytest.raises(ValueError, match='where'):
      index.search(np.ones(4, np.float32), where='camera=c1')


class TestBuildAndQuery:

  @pytest.fixture(scope='class')
  def setup(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    tok = SentencePieceTokenizer(assets.test_spm_path())
    return cfg, params, tok

  def test_build_index_matches_direct_tower(self, setup):
    cfg, params, _ = setup
    source = data_lib.SyntheticSource(num_examples=5, num_frames=2, size=12)
    index = retrieval.build_video_index(params, cfg, source, batch_size=2)
    assert len(index) == 5 and index.ids == [str(i) for i in range(5)]
    videos = np.stack([source.get(i)[0] for i in range(5)])
    direct, _ = vclip.encode_vision(params, videos, cfg, train=False)
    # Self-query: each clip's own embedding must rank itself first.
    results = index.search(np.asarray(direct), k=1)
    assert [row[0][0] for row in results] == [str(i) for i in range(5)]

  def test_text_query_encoder_matches_direct(self, setup):
    cfg, params, tok = setup
    encode = retrieval.make_text_query_encoder(
        params, cfg, tok, batch_size=2, max_text_len=12)
    texts = ['a person playing drums', 'a dog', 'swimming']
    emb = encode(texts)
    assert emb.shape == (3, cfg.model_dim)
    np.testing.assert_allclose(
        np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    from videoprism_tpu.models import registry
    ids, pads = registry.tokenize_texts(tok, texts, max_length=12)
    direct = vclip.encode_text(params, ids, pads, cfg, train=False)
    np.testing.assert_allclose(emb, np.asarray(direct), atol=1e-5)

  def test_text_query_encoder_accepts_init_wrapper(self, setup):
    """Model.init's {'params': ...} wrapper works like the raw tree
    (EmbeddingService unwraps it; this must too — caught driving the
    real-TPU serving config)."""
    cfg, params, tok = setup
    raw = retrieval.make_text_query_encoder(
        params, cfg, tok, batch_size=2, max_text_len=12)
    wrapped = retrieval.make_text_query_encoder(
        {'params': params}, cfg, tok, batch_size=2, max_text_len=12)
    texts = ['a dog']
    np.testing.assert_array_equal(raw(texts), wrapped(texts))

  def test_text_query_encoder_from_export(self, setup, tmp_path):
    """The AOT text-tower artifact drop-in: same embeddings, and the
    artifact's token length overrides max_text_len."""
    cfg, params, tok = setup
    from videoprism_tpu import export as export_lib
    from videoprism_tpu.models.registry import Model

    model = Model(cfg, vclip.apply, init_lib.init_video_clip)
    art = export_lib.export_forward(model, params, tower='text',
                                    text_len=12)
    path = str(tmp_path / 'text.jaxexport')
    art.save(path)
    ref_encode = retrieval.make_text_query_encoder(
        params, cfg, tok, batch_size=2, max_text_len=12)
    got_encode = retrieval.make_text_query_encoder(
        params, cfg, tok, batch_size=2, max_text_len=99,  # overridden
        exported=path)
    texts = ['a person playing drums', 'a dog', 'swimming']
    np.testing.assert_allclose(got_encode(texts), ref_encode(texts),
                               atol=1e-6)

  def test_empty_source_and_empty_texts_raise(self, setup):
    cfg, params, tok = setup
    encode = retrieval.make_text_query_encoder(params, cfg, tok)
    with pytest.raises(ValueError, match='empty'):
      encode([])


class TestHTTPSearch:

  @pytest.fixture(scope='class')
  def server(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(0))
    params = vp.Model._unwrap(state)
    tok = SentencePieceTokenizer(assets.test_spm_path())

    source = data_lib.SyntheticSource(num_examples=4, num_frames=2, size=12)
    index = retrieval.build_video_index(params, cfg, source, batch_size=2)
    encode = retrieval.make_text_query_encoder(
        params, cfg, tok, batch_size=2, max_text_len=12)

    service = serving.EmbeddingService(model, state, batch_buckets=(1, 2),
                                       max_wait_ms=20.0)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0, text_encode_fn=encode,
        index=index)
    httpd.start()
    yield httpd, encode, index
    httpd.stop()
    service.stop()

  def _post_json(self, httpd, path, payload, timeout=120):
    req = urllib.request.Request(
        f'http://127.0.0.1:{httpd.port}{path}',
        json.dumps(payload).encode(), {'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
      return json.loads(resp.read())

  def test_embed_text_matches_encoder(self, server):
    httpd, encode, _ = server
    out = self._post_json(httpd, '/v1/embed_text', {'texts': ['drums']})
    np.testing.assert_allclose(
        np.asarray(out['embeddings'], np.float32), encode(['drums']),
        atol=1e-6)

  def test_search_matches_index(self, server):
    httpd, encode, index = server
    out = self._post_json(httpd, '/v1/search',
                          {'texts': ['a person', 'a dog'], 'k': 2})
    expected = index.search(encode(['a person', 'a dog']), k=2)
    assert [[r['id'] for r in row] for row in out['results']] == \
        [[i for i, _ in row] for row in expected]

  def test_single_text_field(self, server):
    httpd, _, _ = server
    out = self._post_json(httpd, '/v1/embed_text', {'text': 'one string'})
    assert len(out['embeddings']) == 1

  def test_bad_requests_are_400(self, server):
    httpd, _, _ = server
    for payload in ({'texts': []}, {'texts': 'not a list'},
                    {'texts': ['x'], 'k': 0}):
      path = '/v1/search' if 'k' in payload else '/v1/embed_text'
      req = urllib.request.Request(
          f'http://127.0.0.1:{httpd.port}{path}',
          json.dumps(payload).encode(),
          {'Content-Type': 'application/json'})
      with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=30)
      assert exc_info.value.code == 400

  def test_search_without_index_is_404(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(1))
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=20.0)
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0)
    httpd.start()
    try:
      req = urllib.request.Request(
          f'http://127.0.0.1:{httpd.port}/v1/embed_text',
          json.dumps({'texts': ['x']}).encode(),
          {'Content-Type': 'application/json'})
      with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=30)
      assert exc_info.value.code == 404
    finally:
      httpd.stop()
      service.stop()


class TestResumableBuild:

  @pytest.fixture(scope='class')
  def setup(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    source = data_lib.SyntheticSource(num_examples=6, num_frames=2, size=12)
    full = retrieval.build_video_index(params, cfg, source, batch_size=2)
    return cfg, params, source, full

  def test_interrupt_then_resume_equals_one_shot(self, setup, tmp_path):
    cfg, params, source, full = setup
    part = str(tmp_path / 'idx.partial.npz')
    calls = {'n': 0}

    def stop_after_first_chunk():
      calls['n'] += 1
      return calls['n'] >= 1

    with pytest.raises(retrieval.IndexBuildInterrupted) as ei:
      retrieval.build_video_index(
          params, cfg, source, batch_size=2, checkpoint_path=part,
          checkpoint_every=1, should_stop=stop_after_first_chunk)
    assert 0 < ei.value.done < len(source)
    assert (tmp_path / 'idx.partial.npz').exists()

    resumed = retrieval.build_video_index(
        params, cfg, source, batch_size=2, checkpoint_path=part,
        checkpoint_every=1)
    assert resumed.ids == full.ids
    np.testing.assert_allclose(resumed._emb, full._emb, atol=1e-6)

  def test_mismatched_partial_rebuilds(self, setup, tmp_path):
    cfg, params, source, full = setup
    part = str(tmp_path / 'idx.partial.npz')
    np.savez(part, embeddings=np.zeros((2, full.dim), np.float32),
             ids=np.asarray(['bogus0', 'bogus1'], np.str_))
    rebuilt = retrieval.build_video_index(
        params, cfg, source, batch_size=2, checkpoint_path=part,
        checkpoint_every=1)
    np.testing.assert_allclose(rebuilt._emb, full._emb, atol=1e-6)

  def test_no_checkpoint_plain_build_unchanged(self, setup):
    cfg, params, source, full = setup
    again = retrieval.build_video_index(params, cfg, source, batch_size=2)
    np.testing.assert_allclose(again._emb, full._emb, atol=0)


@pytest.mark.slow
def test_cli_append_grows_index(tmp_path):
  """--append embeds only new videos and keeps the existing entries."""
  import os
  import shutil
  import subprocess
  import sys

  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  corpus = tmp_path / 'corpus'
  corpus.mkdir()
  for name in ('a.mp4', 'b.mp4'):
    shutil.copy(assets.demo_video_path(), corpus / name)
  out = str(tmp_path / 'idx.npz')
  env = dict(os.environ)
  env['PYTHONPATH'] = root + os.pathsep + env.get('PYTHONPATH', '')
  base = [sys.executable, os.path.join(root, 'scripts',
                                       'build_video_index.py'),
          '--tiny', '--videos-glob', str(corpus / '*.mp4'),
          '--output', out, '--cpu-devices', '1']
  r1 = subprocess.run(base, capture_output=True, text=True, timeout=300,
                      env=env)
  assert r1.returncode == 0, r1.stdout + r1.stderr
  assert '"num_videos": 2' in r1.stdout

  shutil.copy(assets.demo_video_path(), corpus / 'c.mp4')
  r2 = subprocess.run(base + ['--append'], capture_output=True, text=True,
                      timeout=300, env=env)
  assert r2.returncode == 0, r2.stdout + r2.stderr
  assert '"appended": 1' in r2.stdout
  idx = retrieval.VideoIndex.load(out)
  assert len(idx) == 3
  assert sorted(os.path.basename(i) for i in idx.ids) == \
      ['a.mp4', 'b.mp4', 'c.mp4']

  # Idempotent: nothing new -> no re-embedding, same index.
  r3 = subprocess.run(base + ['--append'], capture_output=True, text=True,
                      timeout=300, env=env)
  assert r3.returncode == 0 and '"appended": 0' in r3.stdout


@pytest.mark.slow
def test_cli_multiview_index_matches_protocol(tmp_path):
  """--temporal-views/--spatial-views produce protocol-aggregated index
  embeddings (they were previously accepted but silently ignored)."""
  import os
  import shutil
  import subprocess
  import sys

  import jax

  from videoprism_tpu.io import video as video_io
  from videoprism_tpu.models import clip as vclip_lib
  from videoprism_tpu.models import init as init_lib
  from videoprism_tpu.train import data as data_lib

  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  corpus = tmp_path / 'corpus'
  corpus.mkdir()
  shutil.copy(assets.demo_video_path(), corpus / 'a.mp4')
  out = str(tmp_path / 'idx_mv.npz')
  env = dict(os.environ)
  env['PYTHONPATH'] = root + os.pathsep + env.get('PYTHONPATH', '')
  r = subprocess.run(
      [sys.executable, os.path.join(root, 'scripts',
                                    'build_video_index.py'),
       '--tiny', '--videos-glob', str(corpus / '*.mp4'),
       '--output', out, '--cpu-devices', '1', '--seed', '0',
       '--temporal-views', '2', '--spatial-views', '2'],
      capture_output=True, text=True, timeout=300, env=env)
  assert r.returncode == 0, r.stdout + r.stderr
  idx = retrieval.VideoIndex.load(out)
  assert len(idx) == 1

  sys.path.insert(0, os.path.join(root, 'scripts'))
  from smoke_configs import TINY_CLIP as TINY_CFG_CLI
  cfg = vclip_lib.VideoCLIPConfig(**TINY_CFG_CLI)
  params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
  views = video_io.load_video_views(str(corpus / 'a.mp4'), num_frames=2,
                                    target_size=12, temporal_views=2,
                                    spatial_views=2)
  per_view, _ = vclip_lib.encode_vision(params, views, cfg, train=False)
  want = np.asarray(per_view, np.float32).mean(axis=0)
  want /= np.linalg.norm(want)
  np.testing.assert_allclose(idx._emb[0], want, atol=1e-5)


class TestSearchVideoHTTP:
  """Video-to-video similarity endpoint: clip body -> top-k neighbors."""

  @pytest.fixture(scope='class')
  def server(self):
    import io as io_mod

    del io_mod
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    type(self)._served = (params, cfg)
    source = data_lib.SyntheticSource(num_examples=6, num_frames=2, size=12)
    index = retrieval.build_video_index(params, cfg, source, batch_size=2)
    model = __import__('videoprism_tpu').Model(
        cfg, vclip.apply, init_lib.init_video_clip)
    service = serving.EmbeddingService(model, params, batch_buckets=(1,))
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(
        service, host='127.0.0.1', port=0, index=index)
    httpd.start()
    yield httpd, source
    httpd.stop()
    service.stop()

  def test_self_query_ranks_itself_first(self, server):
    import io

    httpd, source = server
    clip = source.get(3)[0]
    buf = io.BytesIO()
    np.save(buf, clip)
    req = urllib.request.Request(
        f'http://127.0.0.1:{httpd.port}/v1/search_video?k=3',
        buf.getvalue(), {'Content-Type': 'application/x-npy'})
    out = json.loads(urllib.request.urlopen(req, timeout=60).read())
    rows = out['results']
    assert len(rows) == 1 and len(rows[0]) == 3
    assert rows[0][0]['id'] == '3'
    assert rows[0][0]['score'] > 0.999

  def test_embed_file_views_match_eval_protocol(self, server):
    """/v1/embed_file with views on the CLIP tower == the eval loops'
    multi-view protocol: mean of l2-normalized per-view embeddings,
    re-normalized."""
    import io as io_mod

    from videoprism_tpu import assets
    from videoprism_tpu.io import video as video_io

    httpd, _ = server
    with open(assets.demo_video_path(), 'rb') as f:
      blob = f.read()
    req = urllib.request.Request(
        f'http://127.0.0.1:{httpd.port}'
        '/v1/embed_file?temporal_views=2&spatial_views=2', blob,
        {'Content-Type': 'video/mp4'})
    got = np.load(io_mod.BytesIO(
        urllib.request.urlopen(req, timeout=120).read()))

    views = video_io.load_video_views(
        assets.demo_video_path(), num_frames=2, target_size=12,
        temporal_views=2, spatial_views=2, as_uint8=True)
    per_view, _ = vclip.encode_vision(
        self._params(httpd), views.astype(np.float32) / 255.0,
        self._cfg(httpd), train=False)
    want = np.asarray(per_view, np.float32).mean(axis=0)
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(got, want, atol=1e-5)

  @staticmethod
  def _params(httpd):
    return TestSearchVideoHTTP._served[0]

  @staticmethod
  def _cfg(httpd):
    return TestSearchVideoHTTP._served[1]

  def test_search_video_file_body(self, server):
    """A video/* body decodes server-side (client: search_video_file);
    the demo asset queries the synthetic index without error."""
    from videoprism_tpu import assets
    from videoprism_tpu.client import VideoPrismClient

    httpd, _ = server
    c = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')
    hits = c.search_video_file(assets.demo_video_path(), k=2)
    assert len(hits) == 2
    assert all(isinstance(i, str) and isinstance(s, float)
               for i, s in hits)

  def test_bad_shape_is_400_and_no_index_is_404(self, server):
    import io

    httpd, _ = server
    buf = io.BytesIO()
    np.save(buf, np.zeros((2, 3), np.float32))
    req = urllib.request.Request(
        f'http://127.0.0.1:{httpd.port}/v1/search_video',
        buf.getvalue(), {'Content-Type': 'application/x-npy'})
    with pytest.raises(urllib.error.HTTPError) as ei:
      urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


class TestFp16Storage:

  def test_fp16_index_matches_fp32_ranking(self):
    rng = np.random.RandomState(0)
    emb = rng.randn(200, 32).astype(np.float32)
    ids = [f'v{i}' for i in range(200)]
    f32 = retrieval.VideoIndex(emb, ids)
    f16 = retrieval.VideoIndex(emb, ids, storage_dtype=np.float16)
    q = rng.randn(5, 32).astype(np.float32)
    for row32, row16 in zip(f32.search(q, k=5), f16.search(q, k=5)):
      assert [i for i, _ in row32] == [i for i, _ in row16]
      for (_, s32), (_, s16) in zip(row32, row16):
        assert abs(s32 - s16) < 2e-3
    assert f16._emb.dtype == np.float16
    assert f16._emb.nbytes == f32._emb.nbytes // 2

  def test_save_load_preserves_dtype(self, tmp_path):
    rng = np.random.RandomState(1)
    idx = retrieval.VideoIndex(rng.randn(10, 8).astype(np.float32),
                               [str(i) for i in range(10)],
                               storage_dtype=np.float16)
    idx.add(rng.randn(3, 8).astype(np.float32), ['a', 'b', 'c'])
    path = str(tmp_path / 'idx.npz')
    idx.save(path)
    back = retrieval.VideoIndex.load(path)
    assert back._emb.dtype == np.float16 and len(back) == 13

  def test_bad_dtype_rejected(self):
    with pytest.raises(ValueError, match='storage_dtype'):
      retrieval.VideoIndex(storage_dtype=np.int8)


def test_build_cli_fp16(tmp_path):
  """--fp16 halves the stored index and preserves search."""
  import os
  import shutil
  import subprocess
  import sys

  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  corpus = tmp_path / 'corpus'
  corpus.mkdir()
  shutil.copy(assets.demo_video_path(), corpus / 'a.mp4')
  out = str(tmp_path / 'idx16.npz')
  env = dict(os.environ)
  env['PYTHONPATH'] = root + os.pathsep + env.get('PYTHONPATH', '')
  r = subprocess.run(
      [sys.executable, os.path.join(root, 'scripts',
                                    'build_video_index.py'),
       '--tiny', '--videos-glob', str(corpus / '*.mp4'),
       '--output', out, '--cpu-devices', '1', '--fp16'],
      capture_output=True, text=True, timeout=300, env=env)
  assert r.returncode == 0, r.stdout + r.stderr
  idx = retrieval.VideoIndex.load(out)
  assert idx._emb.dtype == np.float16
  hits = idx.search(idx._emb[:1].astype(np.float32), k=1)
  assert hits[0][0][1] > 0.999  # self-match survives fp16 storage


class TestANNVideoIndex:
  """HNSW index (native/ann_index.cc via retrieval.ANNVideoIndex)."""

  @staticmethod
  def _clustered(n, d, n_queries, seed=0):
    # Clustered data models real embedding corpora (pure gaussian is the
    # known ANN worst case — no neighborhood structure to navigate).
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(40, d)).astype(np.float32)
    emb = (centers[rng.integers(0, 40, n)]
           + 0.3 * rng.normal(size=(n, d)).astype(np.float32))
    q = (centers[rng.integers(0, 40, n_queries)]
         + 0.3 * rng.normal(size=(n_queries, d)).astype(np.float32))
    return emb.astype(np.float32), q.astype(np.float32)

  def test_recall_vs_exact(self):
    emb, q = self._clustered(2000, 32, 25)
    ids = [f'v{i}' for i in range(len(emb))]
    ann = retrieval.ANNVideoIndex(emb, ids, ef_search=64)
    if not ann.native:
      pytest.skip('native ANN library unavailable')
    exact = retrieval.VideoIndex(emb, ids)
    got = ann.search(q, k=10)
    want = exact.search(q, k=10)
    recall = np.mean([
        len({i for i, _ in g} & {i for i, _ in w}) / 10
        for g, w in zip(got, want)])
    assert recall >= 0.95, recall
    # Returned scores are the true cosines of the returned ids even when
    # the neighbor set is approximate.
    lookup = {i: r for r, i in enumerate(ids)}
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    for qi, row in enumerate(got):
      for vid, score in row:
        np.testing.assert_allclose(score, qn[qi] @ en[lookup[vid]],
                                   atol=1e-4)

  def test_filtered_search_selective_and_broad(self):
    """VERDICT r4 #3: dict-filtered ANN search without the O(N) cliff.
    Selective filters (~1% of rows) score exactly over the matches
    (results == exact oracle); broad filters run the mask through the
    native HNSW walk (recall >= 0.95 vs the oracle).  Tombstoned rows
    never surface through either path."""
    emb, q = self._clustered(12000, 32, 20)
    ids = [f'v{i}' for i in range(len(emb))]
    meta = [{'cat': f'c{i % 100}', 'parity': i % 2}
            for i in range(len(emb))]
    ann = retrieval.ANNVideoIndex(emb, ids, ef_search=64, metadata=meta)
    if not ann.native:
      pytest.skip('native ANN library unavailable')
    exact = retrieval.VideoIndex(emb, ids, metadata=meta)

    # Spy on the native entry points so each path's routing is asserted,
    # not assumed.
    class _LibSpy:
      def __init__(self, lib):
        self._lib, self.filtered_calls = lib, 0

      def __getattr__(self, name):
        fn = getattr(self._lib, name)
        if name == 'vp_ann_search_filtered':
          def counted(*a):
            self.filtered_calls += 1
            return fn(*a)
          return counted
        return fn

    spy = _LibSpy(ann._lib)
    ann._lib = spy

    # Selective (1%): exact over matches — same ids/scores as the oracle.
    got = ann.search(q, k=10, where={'cat': 'c7'})
    want = exact.search(q, k=10, where={'cat': 'c7'})
    assert spy.filtered_calls == 0          # brute-force-over-matches
    for g, w in zip(got, want):
      assert {i for i, _ in g} == {i for i, _ in w}
      for (gi, gs), (wi, ws) in zip(g, w):
        assert abs(gs - ws) < 1e-5
      assert all(int(i[1:]) % 100 == 7 for i, _ in g)

    # Broad (50%): the masked graph walk, recall vs the oracle.
    got = ann.search(q, k=10, where={'parity': 1})
    assert spy.filtered_calls > 0           # the native walk ran
    want = exact.search(q, k=10, where={'parity': 1})
    recall = np.mean([
        len({i for i, _ in g} & {i for i, _ in w}) / 10
        for g, w in zip(got, want)])
    assert recall >= 0.95, recall
    assert all(int(i[1:]) % 2 == 1 for row in got for i, _ in row)

    # Tombstones stay invisible to both filtered paths.
    victims = [f'v{i}' for i in range(7, 2000, 100)]  # cat c7 rows
    ann.remove(victims)
    got = ann.search(q, k=10, where={'cat': 'c7'})
    assert not ({i for row in got for i, _ in row} & set(victims))
    ann.remove([f'v{i}' for i in range(1, 50, 2)])
    got = ann.search(q, k=10, where={'parity': 1})
    gone = {f'v{i}' for i in range(1, 50, 2)}
    assert not ({i for row in got for i, _ in row} & gone)

    # Multi-key dict filters intersect; no-match stays empty.
    got = ann.search(q[:2], k=5, where={'cat': 'c8', 'parity': 0})
    assert all(int(i[1:]) % 100 == 8 and int(i[1:]) % 2 == 0
               for row in got for i, _ in row)
    assert ann.search(q[:1], k=5, where={'cat': 'nope'}) == [[]]

  def test_save_load_identical_and_dispatch(self, tmp_path):
    emb, q = self._clustered(500, 16, 5)
    ann = retrieval.ANNVideoIndex(emb, [f'v{i}' for i in range(len(emb))])
    path = str(tmp_path / 'ann.npz')
    ann.save(path)
    loaded = retrieval.load_index(path)
    assert isinstance(loaded, retrieval.ANNVideoIndex)
    assert loaded.native == ann.native
    assert loaded.search(q, k=7) == ann.search(q, k=7)
    # Plain indexes still come back exact.
    exact = retrieval.VideoIndex(emb)
    exact.save(str(tmp_path / 'exact.npz'))
    back = retrieval.load_index(str(tmp_path / 'exact.npz'))
    assert type(back) is retrieval.VideoIndex

  def test_add_after_load_and_k_clamp(self, tmp_path):
    emb, _ = self._clustered(300, 16, 1)
    ann = retrieval.ANNVideoIndex(emb)
    path = str(tmp_path / 'ann.npz')
    ann.save(path)
    loaded = retrieval.ANNVideoIndex.load(path)
    extra, _ = self._clustered(10, 16, 1, seed=9)
    loaded.add(extra, [f'new{i}' for i in range(10)])
    assert len(loaded) == 310
    hit = loaded.search(extra[:1], k=1)[0][0]
    assert hit[0] == 'new0' and hit[1] > 0.999
    # k larger than the corpus clamps like the exact index.
    tiny = retrieval.ANNVideoIndex(emb[:3], ['a', 'b', 'c'])
    assert len(tiny.search(emb[:1], k=50)[0]) == 3

  def test_exact_fallback_without_native(self, monkeypatch, tmp_path):
    from videoprism_tpu import native

    monkeypatch.setattr(native, 'load_ann_lib', lambda: None)
    emb, q = self._clustered(200, 16, 4)
    ids = [f'v{i}' for i in range(len(emb))]
    ann = retrieval.ANNVideoIndex(emb, ids)
    assert not ann.native
    got = ann.search(q, k=5)
    want = retrieval.VideoIndex(emb, ids).search(q, k=5)
    # ANN add re-normalizes already-unit rows: scores differ in the last
    # float32 ulp, ranking does not.
    assert [[i for i, _ in row] for row in got] == [
        [i for i, _ in row] for row in want]
    np.testing.assert_allclose(
        [[s for _, s in row] for row in got],
        [[s for _, s in row] for row in want], atol=1e-6)
    # A fallback save carries no graph blob; loading it on a toolchain
    # host rebuilds the graph from the stored embeddings.
    path = str(tmp_path / 'fallback.npz')
    ann.save(path)
    monkeypatch.undo()
    rebuilt = retrieval.load_index(path)
    assert isinstance(rebuilt, retrieval.ANNVideoIndex)
    if rebuilt.native:
      got = rebuilt.search(q, k=5)
      want = retrieval.VideoIndex(emb, ids).search(q, k=5)
      recall = np.mean([
          len({i for i, _ in g} & {i for i, _ in w}) / 5
          for g, w in zip(got, want)])
      assert recall >= 0.95

  def test_fp16_storage(self, tmp_path):
    emb, q = self._clustered(200, 16, 4)
    ann = retrieval.ANNVideoIndex(emb, storage_dtype=np.float16)
    assert ann._emb.dtype == np.float16
    path = str(tmp_path / 'fp16.npz')
    ann.save(path)
    loaded = retrieval.load_index(path)
    assert loaded._emb.dtype == np.float16
    hit = loaded.search(emb[:1], k=1)[0][0]
    assert hit[1] > 0.999

  def test_error_cases(self):
    emb, _ = self._clustered(50, 16, 1)
    ann = retrieval.ANNVideoIndex(emb)
    with pytest.raises(ValueError, match='dim'):
      ann.search(np.ones((1, 8), np.float32), k=3)
    with pytest.raises(ValueError):
      ann.add(np.ones((2, 8), np.float32), ['a', 'b'])
    with pytest.raises(ValueError):
      retrieval.ANNVideoIndex(m=1)
    with pytest.raises(ValueError):
      retrieval.ANNVideoIndex().search(np.ones((1, 4), np.float32))

  def test_concurrent_search_with_inserts(self):
    # Searches run GIL-free in native code; the readers-writer lock must
    # keep them exclusive with graph inserts (a race is a segfault, not
    # an exception).
    import threading

    emb, q = self._clustered(500, 16, 8)
    ann = retrieval.ANNVideoIndex(emb)
    if not ann.native:
      pytest.skip('native ANN library unavailable')
    errors = []

    def searcher():
      try:
        for _ in range(50):
          ann.search(q, k=5)
      except Exception as e:  # pragma: no cover
        errors.append(e)

    def inserter():
      try:
        extra, _ = self._clustered(20, 16, 1, seed=3)
        for i in range(20):
          ann.add(extra[i:i + 1], [f'x{i}'])
      except Exception as e:  # pragma: no cover
        errors.append(e)

    threads = [threading.Thread(target=searcher) for _ in range(4)]
    threads.append(threading.Thread(target=inserter))
    for t in threads:
      t.start()
    for t in threads:
      t.join()
    assert not errors
    assert len(ann) == 520


class TestIndexRemove:
  """remove(): the delete half of the mutable-corpus CRUD."""

  def test_exact_remove_and_search(self):
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((20, 8)).astype(np.float32)
    ids = [f'v{i}' for i in range(20)]
    index = retrieval.VideoIndex(emb, ids)
    assert index.remove(['v3', 'v7', 'nope']) == 2
    assert len(index) == 18 and 'v3' not in index.ids
    hits = index.search(emb[3], k=20)[0]
    assert 'v3' not in {i for i, _ in hits}
    assert index.remove(['v3']) == 0  # idempotent

  def test_exact_remove_duplicate_ids_removes_all(self):
    emb = np.eye(4, dtype=np.float32)
    index = retrieval.VideoIndex(emb, ['a', 'b', 'a', 'c'])
    assert index.remove(['a']) == 2
    assert index.ids == ['b', 'c']

  def test_remove_everything_then_empty_search_raises(self):
    emb = np.eye(3, dtype=np.float32)
    index = retrieval.VideoIndex(emb, ['a', 'b', 'c'])
    assert index.remove(['a', 'b', 'c']) == 3
    assert len(index) == 0
    with pytest.raises(ValueError, match='empty'):
      index.search(emb[0], k=1)

  def test_ann_tombstone_remove(self):
    emb, q = TestANNVideoIndex._clustered(500, 16, 5)
    ids = [f'v{i}' for i in range(len(emb))]
    ann = retrieval.ANNVideoIndex(emb, ids, ef_search=64)
    if not ann.native:
      pytest.skip('native ANN library unavailable')
    # Remove the guaranteed top-1 of a self-query: it must vanish from
    # results while the rest keep ranking.
    top1 = ann.search(emb[7], k=1)[0][0][0]
    assert top1 == 'v7'
    assert ann.remove(['v7', 'v100']) == 2
    assert len(ann) == 498 and 'v7' not in ann.ids
    hits = ann.search(emb[7], k=10)[0]
    assert len(hits) == 10
    assert {'v7', 'v100'}.isdisjoint({i for i, _ in hits})
    assert ann.remove(['v7']) == 0  # already tombstoned

  def test_ann_save_compacts_and_reloads(self, tmp_path):
    emb, q = TestANNVideoIndex._clustered(300, 16, 3)
    ids = [f'v{i}' for i in range(len(emb))]
    ann = retrieval.ANNVideoIndex(emb, ids, ef_search=64)
    if not ann.native:
      pytest.skip('native ANN library unavailable')
    ann.remove([f'v{i}' for i in range(0, 300, 3)])  # a third gone
    path = str(tmp_path / 'compact.npz')
    ann.save(path)
    with np.load(path, allow_pickle=False) as data:
      assert len(data['embeddings']) == 200   # live rows only
      assert 'ann_graph' not in data          # graph dropped: rebuild
    reloaded = retrieval.load_index(path)
    assert isinstance(reloaded, retrieval.ANNVideoIndex)
    assert len(reloaded) == 200
    assert set(reloaded.ids) == set(ids) - {f'v{i}'
                                            for i in range(0, 300, 3)}
    hits = reloaded.search(q, k=5)
    assert all(len(row) == 5 for row in hits)

  def test_ann_fallback_remove_rebuilds_arrays(self, monkeypatch):
    from videoprism_tpu import native as native_mod

    monkeypatch.setattr(native_mod, 'load_ann_lib', lambda: None)
    emb = np.eye(6, dtype=np.float32)
    ann = retrieval.ANNVideoIndex(emb, [f'v{i}' for i in range(6)])
    assert not ann.native
    assert ann.remove(['v2']) == 1
    assert len(ann) == 5 and not ann._dead  # array rebuild, no tombstone
    hits = ann.search(emb[2], k=5)[0]
    assert 'v2' not in {i for i, _ in hits}

  def test_concurrent_remove_and_search_never_misalign(self):
    rng = np.random.default_rng(1)
    rows = rng.standard_normal((200, 8)).astype(np.float32)
    index = retrieval.VideoIndex(rows, [f'v{i}' for i in range(200)])
    stop = threading.Event()
    errors = []

    def searcher():
      # v0..v49 are never removed: their self-queries must stay exact.
      while not stop.is_set():
        try:
          for i, got in enumerate(index.search(rows[:50], k=1)):
            assert got[0][0] == f'v{i}' and got[0][1] > 0.999
        except Exception as e:  # pragma: no cover
          errors.append(e)
          return

    threads = [threading.Thread(target=searcher) for _ in range(2)]
    for t in threads:
      t.start()
    for i in range(199, 49, -1):
      index.remove([f'v{i}'])
    stop.set()
    for t in threads:
      t.join(timeout=60)
    assert not errors, errors
    assert len(index) == 50
