"""Content-addressed serving caches: the LRU itself, the video service's
embed memoization, and the text service's per-string splice path."""

import numpy as np
import pytest

import jax
import videoprism_tpu as vp
from videoprism_tpu import serving
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.serving import _EmbeddingCache

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)


@pytest.fixture(scope='module')
def model_and_state():
  cfg = fe.FactorizedEncoderConfig(**TINY)
  model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
  state = model.init(jax.random.PRNGKey(0))
  return model, state


class TestEmbeddingCacheUnit:

  def test_put_get_roundtrip_and_counters(self):
    c = _EmbeddingCache(4)
    k = _EmbeddingCache.digest(b'abc', (2, 3), 'f4')
    assert c.get(k) is None
    c.put(k, np.arange(3.0))
    np.testing.assert_array_equal(c.get(k), np.arange(3.0))
    s = c.stats()
    assert s['cache_hits'] == 1 and s['cache_misses'] == 1
    assert s['cache_entries'] == 1 and s['cache_bytes'] == 24

  def test_digest_context_separates_equal_bytes(self):
    raw = np.zeros(12, np.float32)
    a = _EmbeddingCache.digest(raw.data, (12,), 'f4')
    b = _EmbeddingCache.digest(raw.data, (3, 4), 'f4')
    c = _EmbeddingCache.digest(raw.data, (12,), 'u1')
    assert len({a, b, c}) == 3

  def test_lru_eviction_by_entries(self):
    c = _EmbeddingCache(2)
    keys = [_EmbeddingCache.digest(bytes([i])) for i in range(3)]
    c.put(keys[0], np.zeros(1))
    c.put(keys[1], np.zeros(1))
    assert c.get(keys[0]) is not None     # refresh 0 -> 1 becomes LRU
    c.put(keys[2], np.zeros(1))
    assert c.get(keys[1]) is None
    assert c.get(keys[0]) is not None
    assert c.get(keys[2]) is not None

  def test_eviction_by_bytes_and_oversize_skip(self):
    c = _EmbeddingCache(100, max_bytes=100)
    big = np.zeros(200, np.uint8)
    c.put(_EmbeddingCache.digest(b'big'), big)      # > budget: not stored
    assert c.stats()['cache_entries'] == 0
    for i in range(4):
      c.put(_EmbeddingCache.digest(bytes([i])), np.zeros(40, np.uint8))
    s = c.stats()
    assert s['cache_bytes'] <= 100 and s['cache_entries'] == 2

  def test_replacing_a_key_adjusts_bytes(self):
    c = _EmbeddingCache(4, max_bytes=1000)
    k = _EmbeddingCache.digest(b'k')
    c.put(k, np.zeros(100, np.uint8))
    c.put(k, np.zeros(10, np.uint8))
    s = c.stats()
    assert s['cache_entries'] == 1 and s['cache_bytes'] == 10

  def test_clear(self):
    c = _EmbeddingCache(4)
    c.put(_EmbeddingCache.digest(b'x'), np.zeros(5))
    c.clear()
    assert c.stats()['cache_entries'] == 0
    assert c.get(_EmbeddingCache.digest(b'x')) is None

  def test_rejects_nonpositive_entries(self):
    with pytest.raises(ValueError, match='max_entries'):
      _EmbeddingCache(0)


class TestVideoServiceCache:

  def _service(self, model_and_state, **kw):
    model, state = model_and_state
    service = serving.EmbeddingService(
        model, state, batch_buckets=(1, 2), max_wait_ms=1.0,
        cache_entries=8, **kw)
    service.start()
    return service

  def test_repeat_embed_skips_the_chip(self, model_and_state):
    service = self._service(model_and_state)
    try:
      clip = np.random.default_rng(0).random((2, 12, 12, 3), np.float32)
      first = service.embed(clip)
      batches = service.stats()['batches_run']
      again = service.embed(clip)
      np.testing.assert_array_equal(first, again)
      s = service.stats()
      assert s['batches_run'] == batches       # no new dispatch
      assert s['cache_hits'] == 1 and s['cache_entries'] == 1
      # A different clip misses and dispatches.
      other = clip + 1e-3
      service.embed(other)
      s = service.stats()
      assert s['cache_hits'] == 1 and s['batches_run'] == batches + 1
    finally:
      service.stop()

  def test_dtype_distinguishes_content(self, model_and_state):
    service = self._service(model_and_state)
    try:
      u8 = np.zeros((2, 12, 12, 3), np.uint8)
      f32 = np.zeros((2, 12, 12, 3), np.float32)
      service.embed(u8)
      service.embed(f32)
      assert service.stats()['cache_hits'] == 0
      assert service.stats()['cache_entries'] == 2
    finally:
      service.stop()

  def test_reload_clears_the_cache(self, model_and_state):
    model, state = model_and_state
    service = self._service(model_and_state)
    try:
      clip = np.random.default_rng(1).random((2, 12, 12, 3), np.float32)
      service.embed(clip)
      service.embed(clip)
      assert service.stats()['cache_hits'] == 1
      service.reload_state(state)
      assert service.stats()['cache_entries'] == 0
      service.embed(clip)   # recomputes under the (same-valued) new tree
      assert service.stats()['cache_hits'] == 1  # unchanged
    finally:
      service.stop()

  def test_pad_frames_cache_keys_on_true_length(self, model_and_state):
    service = self._service(model_and_state, pad_frames_to=2)
    try:
      short = np.random.default_rng(2).random((1, 12, 12, 3), np.float32)
      first = service.embed(short)
      again = service.embed(short)
      np.testing.assert_array_equal(first, again)
      assert service.stats()['cache_hits'] == 1
      # The short clip's zero-padded twin is DIFFERENT content (masked
      # vs attended) and must not collide with the 1-frame entry.
      padded = np.concatenate([short, np.zeros_like(short)], axis=0)
      full = service.embed(padded)
      assert service.stats()['cache_hits'] == 1
      assert not np.allclose(full, first)
    finally:
      service.stop()

  def test_cache_off_by_default(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    assert 'cache_hits' not in service.stats()


class TestTextServiceCache:

  def _make(self, calls, dim=4):
    def encode_fn(texts):
      calls.append(list(texts))
      return np.stack([np.full(dim, float(len(t))) for t in texts])

    service = serving.TextEncodeService(
        encode_fn, max_wait_ms=1.0, cache_entries=16)
    service.start()
    return service

  def test_full_hit_skips_the_queue(self):
    calls = []
    service = self._make(calls)
    try:
      out1 = service.encode(['aa', 'bbb'])
      out2 = service.encode(['aa', 'bbb'])
      np.testing.assert_array_equal(out1, out2)
      assert len(calls) == 1
      assert service.stats()['text_cache_hits'] == 2
    finally:
      service.stop()

  def test_partial_hit_encodes_only_misses_in_order(self):
    calls = []
    service = self._make(calls)
    try:
      service.encode(['aa', 'bbb'])
      out = service.encode(['cccc', 'aa', 'ddddd'])
      assert calls[-1] == ['cccc', 'ddddd']   # hits never re-encode
      np.testing.assert_array_equal(out[:, 0], [4.0, 2.0, 5.0])
    finally:
      service.stop()

  def test_reload_invalidates(self):
    calls = []
    service = self._make(calls)
    try:
      service.encode(['aa'])
      service.reload(lambda texts: np.zeros((len(texts), 4)))
      out = service.encode(['aa'])
      np.testing.assert_array_equal(out, np.zeros((1, 4)))
      assert len(calls) == 1                  # old fn not re-called
    finally:
      service.stop()

  def test_duplicate_strings_one_request(self):
    calls = []
    service = self._make(calls)
    try:
      out = service.encode(['aa', 'aa'])
      np.testing.assert_array_equal(out[0], out[1])
      # Both rows were misses (one request): both went to the chip.
      assert calls[-1] == ['aa', 'aa']
      out2 = service.encode(['aa'])
      np.testing.assert_array_equal(out2[0], out[0])
      assert len(calls) == 1
    finally:
      service.stop()
