"""TarShardSource: WebDataset-style sharded-tar ingestion.

Shards are built on the fly from the bundled demo video, so the tests are
self-contained. Covers pairing, ordering, captions vs labels, random
access through the loader (shuffle/multi-host/accum all ride the flat
index), and the compressed-shard rejection.
"""

import os
import pathlib
import tarfile

import numpy as np
import pytest

from videoprism_tpu import assets
from videoprism_tpu.train import data as data_lib


def _make_shard(path, keys, *, labeled=False, captions=None):
  video_bytes = open(assets.demo_video_path(), 'rb').read()
  with tarfile.open(path, 'w') as tf:
    for i, key in enumerate(keys):
      import io

      vi = tarfile.TarInfo(f'{key}.mp4')
      vi.size = len(video_bytes)
      tf.addfile(vi, io.BytesIO(video_bytes))
      if labeled:
        payload = str(i % 3).encode()
        ti = tarfile.TarInfo(f'{key}.cls')
      else:
        payload = (captions[i] if captions else f'caption {key}').encode()
        ti = tarfile.TarInfo(f'{key}.txt')
      ti.size = len(payload)
      tf.addfile(ti, io.BytesIO(payload))
  return str(path)


class TestTarShardSource:

  def test_caption_pairing_and_decode(self, tmp_path):
    shard = _make_shard(tmp_path / 's0.tar', ['a', 'b'])
    src = data_lib.TarShardSource([shard], num_frames=4, target_size=36)
    assert len(src) == 2
    clip, cap = src.get(0)
    assert clip.shape == (4, 36, 36, 3)
    assert clip.dtype == np.float32
    assert cap == 'caption a'
    assert src.get(1)[1] == 'caption b'

  def test_multi_shard_global_order(self, tmp_path):
    s0 = _make_shard(tmp_path / 's0.tar', ['a'], captions=['zero'])
    s1 = _make_shard(tmp_path / 's1.tar', ['b'], captions=['one'])
    src = data_lib.TarShardSource([s0, s1], num_frames=2, target_size=36)
    assert [src.get(i)[1] for i in range(2)] == ['zero', 'one']
    # from_glob sorts, so every host builds the identical index.
    src_g = data_lib.TarShardSource.from_glob(
        str(tmp_path / 's*.tar'), num_frames=2, target_size=36)
    assert [src_g.get(i)[1] for i in range(2)] == ['zero', 'one']

  def test_labeled_shard(self, tmp_path):
    shard = _make_shard(tmp_path / 'l0.tar', ['x', 'y', 'z'], labeled=True)
    src = data_lib.TarShardSource([shard], labeled=True, num_frames=2,
                                  target_size=36)
    assert src.labels == [0, 1, 2]
    clip, label = src.get(2)
    assert label == 2 and clip.shape == (2, 36, 36, 3)

  def test_missing_caption_raises(self, tmp_path):
    import io

    video_bytes = open(assets.demo_video_path(), 'rb').read()
    with tarfile.open(tmp_path / 'bad.tar', 'w') as tf:
      vi = tarfile.TarInfo('orphan.mp4')
      vi.size = len(video_bytes)
      tf.addfile(vi, io.BytesIO(video_bytes))
    with pytest.raises(ValueError, match='no paired'):
      data_lib.TarShardSource([str(tmp_path / 'bad.tar')])

  def test_compressed_shard_rejected(self, tmp_path):
    (tmp_path / 'x.tar.gz').write_bytes(b'')
    with pytest.raises(ValueError, match='random access'):
      data_lib.TarShardSource([str(tmp_path / 'x.tar.gz')])

  def test_empty_and_no_members(self, tmp_path):
    with pytest.raises(ValueError, match='no tar shards'):
      data_lib.TarShardSource([])
    with tarfile.open(tmp_path / 'e.tar', 'w'):
      pass
    with pytest.raises(ValueError, match='members found'):
      data_lib.TarShardSource([str(tmp_path / 'e.tar')])

  def test_through_batched_loader(self, tmp_path, tokenizer=None):
    from videoprism_tpu.io import spm
    from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

    pieces = [spm.Piece('<unk>', 0.0, spm.UNKNOWN),
              spm.Piece('<s>', 0.0, spm.CONTROL),
              spm.Piece('</s>', 0.0, spm.CONTROL),
              spm.Piece('▁caption', -1.0), spm.Piece('▁a', -1.0),
              spm.Piece('▁b', -1.0), spm.Piece('▁', -4.0)]
    model = spm.SpmModel(pieces=pieces, unk_id=0, bos_id=1, eos_id=2)
    spm_path = tmp_path / 't.model'
    spm.save_model(str(spm_path), model)
    tok = SentencePieceTokenizer(str(spm_path), use_native=False)

    shard = _make_shard(tmp_path / 's.tar', ['a', 'b'])
    src = data_lib.TarShardSource([shard], num_frames=2, target_size=36)
    batches = list(data_lib.batched_loader(
        src, tok, batch_size=2, num_epochs=1, max_text_len=6,
        num_workers=2, shuffle=False))
    assert len(batches) == 1
    assert batches[0]['video'].shape == (2, 2, 36, 36, 3)
    assert batches[0]['text_token_ids'].shape == (2, 6)


def test_mode_aware_target_views(tmp_path):
  """Wrong-mode labels/captions raise TypeError — NOT AttributeError,
  which ``getattr(source, ..., None)`` (the eval loops' probe) would
  swallow, silently sending a mode-mismatched source down the
  decode-everything fallback to die on an unrelated cast error later."""
  cap = _make_shard(tmp_path / 'c.tar', ['a'])
  lab = _make_shard(tmp_path / 'l.tar', ['a'], labeled=True)
  cap_src = data_lib.TarShardSource([cap], num_frames=2, target_size=36)
  lab_src = data_lib.TarShardSource([lab], labeled=True, num_frames=2,
                                    target_size=36)
  assert cap_src.captions == ['caption a']
  assert lab_src.labels == [0]
  with pytest.raises(TypeError, match='has no labels'):
    getattr(cap_src, 'labels', None)
  with pytest.raises(TypeError, match='has no captions'):
    getattr(lab_src, 'captions', None)


def test_same_key_in_two_shards_is_two_examples(tmp_path):
  """WebDataset shards restart numbering per shard: pairing must be
  shard-scoped, never a global dict that overwrites or cross-pairs."""
  s0 = _make_shard(tmp_path / 's0.tar', ['000000'], captions=['from s0'])
  s1 = _make_shard(tmp_path / 's1.tar', ['000000'], captions=['from s1'])
  src = data_lib.TarShardSource([s0, s1], num_frames=2, target_size=36)
  assert len(src) == 2
  assert [src.get(i)[1] for i in range(2)] == ['from s0', 'from s1']


class TestMakeTarShards:
  """Write-side round trip: make_tar_shards output reads back through
  TarShardSource with targets and order intact."""

  def _write(self, tmp_path, n, argv_extra, manifest_line):
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    vids = tmp_path / 'vids'
    vids.mkdir(exist_ok=True)
    manifest = tmp_path / 'manifest.txt'
    with open(manifest, 'w') as fh:
      for i in range(n):
        p = vids / f'v{i}.mp4'
        if not p.exists():
          import shutil
          shutil.copy(assets.demo_video_path(), p)
        fh.write(manifest_line(p, i) + '\n')
    env = dict(os.environ)
    env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
    res = subprocess.run(
        [sys.executable, str(root / 'scripts' / 'make_tar_shards.py'),
         '--manifest', str(manifest), '--out', str(tmp_path / 'sh'),
         '--shard-size', '2'] + argv_extra,
        capture_output=True, text=True, timeout=300, env=env)
    assert res.returncode == 0, res.stdout + res.stderr
    import json
    return json.loads(res.stdout.strip().splitlines()[-1])

  def test_caption_round_trip_with_shard_split(self, tmp_path):
    out = self._write(tmp_path, 5, [],
                      lambda p, i: f'{p}\tcaption number {i}')
    assert out['num_examples'] == 5 and out['num_shards'] == 3
    src = data_lib.TarShardSource(out['shards'], num_frames=2,
                                  target_size=36)
    assert len(src) == 5
    assert src.captions == [f'caption number {i}' for i in range(5)]
    clip, cap = src.get(4)
    assert clip.shape == (2, 36, 36, 3) and cap == 'caption number 4'

  def test_labeled_round_trip(self, tmp_path):
    out = self._write(tmp_path, 3, ['--labeled'],
                      lambda p, i: f'{p},{i % 2}')
    src = data_lib.TarShardSource(out['shards'], labeled=True,
                                  num_frames=2, target_size=36)
    assert src.labels == [0, 1, 0]


def test_train_cli_tar_mixture(tmp_path):
  """Repeated --tar-shards + --mixture-weights trains over a weighted
  MixtureSource end-to-end (tiny model, 2 steps, CPU)."""
  import subprocess
  import sys

  root = pathlib.Path(__file__).resolve().parent.parent
  s0 = _make_shard(tmp_path / 'big0.tar', ['a', 'b', 'c', 'd'])
  s1 = _make_shard(tmp_path / 'small0.tar', ['e', 'f'],
                   captions=['rare one', 'rare two'])
  env = dict(os.environ)
  env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(root / 'scripts' / 'train_clip.py'),
       '--tiny', '--steps', '2', '--batch-size', '2', '--cpu-devices',
       '1', '--tar-shards', str(tmp_path / 'big*.tar'),
       '--tar-shards', str(tmp_path / 'small*.tar'),
       '--mixture-weights', '1,1'],
      capture_output=True, text=True, timeout=600, env=env)
  assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
  assert 'mixture shares' in res.stdout
  # Equal weights over a 4+2 corpus: both sources get half the epoch.
  assert "0.5" in res.stdout


def test_example_keys_are_stable_ids(tmp_path):
  s0 = _make_shard(tmp_path / 's0.tar', ['a', 'b'])
  s1 = _make_shard(tmp_path / 's1.tar', ['a'])
  src = data_lib.TarShardSource([s0, s1], num_frames=2, target_size=36)
  assert src.example_keys == ['s0.tar/a', 's0.tar/b', 's1.tar/a']


def test_example_keys_disambiguate_same_basename_subdirs(tmp_path):
  """Per-subdir shard sets (data/*/shard-00000.tar) must not collide."""
  (tmp_path / 'd1').mkdir()
  (tmp_path / 'd2').mkdir()
  s1 = _make_shard(tmp_path / 'd1' / 'shard-00000.tar', ['000000'])
  s2 = _make_shard(tmp_path / 'd2' / 'shard-00000.tar', ['000000'])
  src = data_lib.TarShardSource([s1, s2], num_frames=2, target_size=36)
  keys = src.example_keys
  assert len(set(keys)) == 2
  assert keys == [f'd1{os.sep}shard-00000.tar/000000',
                  f'd2{os.sep}shard-00000.tar/000000']
