"""Checkpoint averaging (model soup): math, validation, CLI round trip."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT / 'scripts'))

import average_checkpoints  # noqa: E402

from videoprism_tpu.io import checkpoints as ckpt_lib  # noqa: E402


def _tree(scale, dtype=np.float32):
  return {
      'encoder': {'w': np.full((3, 4), scale, dtype),
                  'b': np.full((4,), 2 * scale, dtype)},
      'ids': np.arange(5, dtype=np.int32),
  }


class TestAverageTrees:

  def test_uniform_average(self):
    out = average_checkpoints.average_trees([_tree(1.0), _tree(3.0)])
    np.testing.assert_allclose(out['encoder']['w'], 2.0)
    np.testing.assert_allclose(out['encoder']['b'], 4.0)
    np.testing.assert_array_equal(out['ids'], np.arange(5))

  def test_weighted_average_normalizes(self):
    out = average_checkpoints.average_trees(
        [_tree(0.0), _tree(1.0)], weights=[1.0, 3.0])
    np.testing.assert_allclose(out['encoder']['w'], 0.75)

  def test_dtype_preserved_with_f64_accumulation(self):
    a, b = _tree(1.0, np.float16), _tree(2.0, np.float16)
    out = average_checkpoints.average_trees([a, b])
    assert out['encoder']['w'].dtype == np.float16
    np.testing.assert_allclose(out['encoder']['w'], 1.5)

  def test_key_mismatch_raises(self):
    b = _tree(1.0)
    b['extra'] = np.zeros(2, np.float32)
    with pytest.raises(ValueError, match='key set differs'):
      average_checkpoints.average_trees([_tree(1.0), b])

  def test_shape_mismatch_raises(self):
    b = _tree(1.0)
    b['encoder']['w'] = np.zeros((3, 5), np.float32)
    with pytest.raises(ValueError, match='shape'):
      average_checkpoints.average_trees([_tree(1.0), b])

  def test_nonfloat_divergence_raises(self):
    b = _tree(1.0)
    b['ids'] = np.arange(5, dtype=np.int32)[::-1].copy()
    with pytest.raises(ValueError, match='not soup-compatible'):
      average_checkpoints.average_trees([_tree(1.0), b])

  def test_bad_weights(self):
    with pytest.raises(ValueError, match='weights'):
      average_checkpoints.average_trees([_tree(1.0), _tree(2.0)],
                                        weights=[1.0])
    with pytest.raises(ValueError, match='positive'):
      average_checkpoints.average_trees([_tree(1.0), _tree(2.0)],
                                        weights=[0.0, 0.0])


def test_cli_round_trip(tmp_path):
  for i, s in enumerate((1.0, 3.0)):
    ckpt_lib.save_checkpoint(str(tmp_path / f'c{i}.npz'), _tree(s))
  out = tmp_path / 'soup.npz'
  code = average_checkpoints.main(
      [str(tmp_path / 'c0.npz'), str(tmp_path / 'c1.npz'),
       '-o', str(out)])
  assert code == 0
  soup = ckpt_lib.load_checkpoint(str(out))
  np.testing.assert_allclose(soup['encoder']['w'], 2.0)


def test_cli_subprocess_help():
  res = subprocess.run(
      [sys.executable, str(_ROOT / 'scripts' / 'average_checkpoints.py'),
       '--help'], capture_output=True, text=True, timeout=120)
  assert res.returncode == 0
  assert 'soup' in res.stdout


def test_bfloat16_checkpoints_average():
  """bf16 is the common serving dtype; ml_dtypes floats must take the
  averaging branch, not the must-be-identical non-float branch."""
  import ml_dtypes

  a, b = _tree(1.0, ml_dtypes.bfloat16), _tree(2.0, ml_dtypes.bfloat16)
  out = average_checkpoints.average_trees([a, b])
  assert out['encoder']['w'].dtype == ml_dtypes.bfloat16
  np.testing.assert_allclose(out['encoder']['w'].astype(np.float32), 1.5)
