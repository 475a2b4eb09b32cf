"""DeviceVideoIndex: HBM-sharded exact search vs the host index.

Runs on the 8-virtual-CPU-device mesh (conftest); parity oracle is
``retrieval.VideoIndex``'s numpy brute-force search.
"""

import numpy as np
import pytest

from videoprism_tpu import retrieval
from videoprism_tpu.device_index import DeviceVideoIndex


def _corpus(n, d, seed=0):
  rng = np.random.default_rng(seed)
  emb = rng.normal(size=(n, d)).astype(np.float32)
  ids = [f'clip{i:05d}' for i in range(n)]
  return emb, ids


def test_fp32_parity_with_host_index():
  emb, ids = _corpus(501, 64)  # not divisible by 8: exercises padding
  host = retrieval.VideoIndex(emb, ids)
  dev = DeviceVideoIndex(emb, ids, storage_dtype=np.float32)
  q = np.random.default_rng(1).normal(size=(5, 64)).astype(np.float32)
  got = dev.search(q, k=7)
  want = host.search(q, k=7)
  for g, w in zip(got, want):
    assert [i for i, _ in g] == [i for i, _ in w]
    np.testing.assert_allclose([s for _, s in g], [s for _, s in w],
                               atol=1e-5)


def test_bf16_storage_planted_matches():
  # Queries are corpus rows + small noise: top-1 must be the planted row
  # even under bf16 score rounding, and scores stay within ~1e-2.
  emb, ids = _corpus(256, 128, seed=2)
  host = retrieval.VideoIndex(emb, ids)
  dev = DeviceVideoIndex(emb, ids)  # bf16 default
  rows = [3, 77, 200]
  q = emb[rows] + 0.01 * np.random.default_rng(3).normal(
      size=(len(rows), 128)).astype(np.float32)
  got = dev.search(q, k=3)
  want = host.search(q, k=3)
  for r, g, w in zip(rows, got, want):
    assert g[0][0] == f'clip{r:05d}'
    np.testing.assert_allclose([s for _, s in g], [s for _, s in w],
                               atol=2e-2)


def test_int8_storage_ranking():
  # int8 rows carry per-row absmax scales: scores land within ~1e-2 of
  # exact and planted top-1 matches survive the quantization.
  emb, ids = _corpus(300, 256, seed=20)
  host = retrieval.VideoIndex(emb, ids)
  dev = DeviceVideoIndex(emb, ids, storage_dtype=np.int8)
  rows = [0, 123, 299]
  q = emb[rows] + 0.01 * np.random.default_rng(21).normal(
      size=(len(rows), 256)).astype(np.float32)
  got = dev.search(q, k=4)
  want = host.search(q, k=4)
  for r, g, w in zip(rows, got, want):
    assert g[0][0] == f'clip{r:05d}'
    np.testing.assert_allclose([s for _, s in g], [s for _, s in w],
                               atol=2e-2)


def test_int8_recall_at_10():
  # Ranking-tier contract on random unit vectors: recall@10 vs exact.
  emb, ids = _corpus(2000, 128, seed=22)
  host = retrieval.VideoIndex(emb, ids)
  dev = DeviceVideoIndex(emb, ids, storage_dtype=np.int8, chunk_size=512)
  q = np.random.default_rng(23).normal(size=(16, 128)).astype(np.float32)
  got = dev.search(q, k=10)
  want = host.search(q, k=10)
  hits = sum(len({i for i, _ in g} & {i for i, _ in w})
             for g, w in zip(got, want))
  assert hits / (16 * 10) > 0.9


def test_chunked_scan_parity():
  # chunk_size smaller than the shard forces a multi-step scan with
  # running top-k merge; results must not change.
  emb, ids = _corpus(400, 32, seed=4)
  q = np.random.default_rng(5).normal(size=(2, 32)).astype(np.float32)
  one = DeviceVideoIndex(emb, ids, storage_dtype=np.float32)
  many = DeviceVideoIndex(emb, ids, storage_dtype=np.float32,
                          chunk_size=16)
  assert many._per_shard // many._chunk > 1
  a, b = one.search(q, k=9), many.search(q, k=9)
  for g, w in zip(a, b):
    assert [i for i, _ in g] == [i for i, _ in w]


def test_tiny_corpus_and_k_clamp():
  # Fewer rows than devices: every shard is mostly padding; k clamps to N.
  emb, ids = _corpus(3, 16, seed=6)
  dev = DeviceVideoIndex(emb, ids, storage_dtype=np.float32)
  host = retrieval.VideoIndex(emb, ids)
  q = emb[1:2]
  got, want = dev.search(q, k=10), host.search(q, k=10)
  assert [i for i, _ in got[0]] == [i for i, _ in want[0]]
  assert len(got[0]) == 3
  assert got[0][0][0] == 'clip00001'


def test_query_buckets_share_programs():
  emb, ids = _corpus(64, 16, seed=7)
  dev = DeviceVideoIndex(emb, ids, storage_dtype=np.float32)
  host = retrieval.VideoIndex(emb, ids)
  rng = np.random.default_rng(8)
  for nq in (1, 2, 8, 9):
    q = rng.normal(size=(nq, 16)).astype(np.float32)
    got, want = dev.search(q, k=4), host.search(q, k=4)
    assert len(got) == nq
    for g, w in zip(got, want):
      assert [i for i, _ in g] == [i for i, _ in w]
  # 1, 2 share the Q=1/Q=8 buckets; 9 compiles the next one.
  assert {key[0] for key in dev._programs} == {1, 8, 64}


def test_refresh_reuses_programs_on_same_geometry():
  emb, ids = _corpus(128, 16, seed=9)
  dev = DeviceVideoIndex(emb, ids, storage_dtype=np.float32)
  q = emb[:1]
  dev.search(q, k=2)
  progs = dict(dev._programs)
  emb2 = np.roll(emb, 1, axis=0)
  dev.refresh(emb2, ids)
  assert dev._programs == progs  # same padded geometry: cache kept
  got = dev.search(emb2[5:6], k=1)
  assert got[0][0][0] == 'clip00005'
  # Changing N invalidates (the valid-row mask is baked into the jit).
  dev.refresh(emb[:100], ids[:100])
  assert len(dev) == 100
  got = dev.search(emb[7:8], k=1)
  assert got[0][0][0] == 'clip00007'


class TestDeviceAcceleratedIndex:

  def test_crud_flows_to_host_search_on_device(self):
    from videoprism_tpu.device_index import DeviceAcceleratedIndex
    emb, ids = _corpus(40, 16, seed=11)
    host = retrieval.VideoIndex(emb, ids)
    acc = DeviceAcceleratedIndex(host, storage_dtype=np.float32)
    got = acc.search(emb[4:5], k=1)
    assert got[0][0][0] == 'clip00004'
    snap = acc._snapshot
    # Mutation through the wrapper: next search refreshes the snapshot.
    acc.add(emb[:1] * -1.0, ['negated'])
    assert len(acc) == 41 and len(host) == 41
    got = acc.search(-emb[0:1], k=1)
    assert got[0][0][0] == 'negated'
    assert acc._snapshot is snap  # same object, refreshed in place
    # Mutating the HOST directly is also seen (staleness is the tuple
    # identity, not wrapper bookkeeping).
    host.remove(['negated'])
    got = acc.search(-emb[0:1], k=1)
    assert got[0][0][0] != 'negated'
    assert acc.ids == host.ids and acc.dim == 16

  def test_empty_and_save(self, tmp_path):
    from videoprism_tpu.device_index import DeviceAcceleratedIndex
    acc = DeviceAcceleratedIndex(retrieval.VideoIndex())
    assert len(acc) == 0
    with pytest.raises(ValueError):
      acc.search(np.ones((1, 8), np.float32), k=1)
    emb, ids = _corpus(8, 8, seed=12)
    acc.add(emb, ids)
    path = str(tmp_path / 'corpus.npz')
    retrieval.save_index_atomic(acc, path)
    reloaded = retrieval.load_index(path)
    assert reloaded.ids == ids


def test_from_index_and_errors():
  emb, ids = _corpus(32, 16, seed=10)
  host = retrieval.VideoIndex(emb, ids)
  dev = DeviceVideoIndex.from_index(host, storage_dtype=np.float32)
  assert len(dev) == 32 and dev.dim == 16
  with pytest.raises(ValueError):
    DeviceVideoIndex(np.zeros((0, 4), np.float32), [])
  with pytest.raises(ValueError):
    dev.search(np.zeros((1, 8), np.float32), k=2)  # dim mismatch
  with pytest.raises(ValueError):
    DeviceVideoIndex(emb, ids[:-1])
