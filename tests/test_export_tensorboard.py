"""metrics.jsonl -> TensorBoard exporter: scalars, eval split, events."""

import json
import pathlib
import sys

import pytest

pytest.importorskip('torch.utils.tensorboard')

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT / 'scripts'))

import export_tensorboard  # noqa: E402


def _write_run(tmp_path, name):
  d = tmp_path / name
  d.mkdir()
  records = [
      {'step': 0, 'time': 1000.0, 'loss': 2.0, 'grad_norm': 1.5,
       'note': 'non-numeric ignored'},
      {'step': 10, 'time': 1010.0, 'loss': 1.0, 'grad_norm': 0.5},
      {'event': 'eval', 'step': 10, 'time': 1011.0, 'top1_accuracy': 0.8},
      {'event': 'checkpoint_saved', 'step': 10, 'time': 1012.0},
  ]
  with open(d / 'metrics.jsonl', 'w') as fh:
    for r in records:
      fh.write(json.dumps(r) + '\n')
  return d


def _load_scalars(tb_run_dir):
  from tensorboard.backend.event_processing import event_accumulator

  acc = event_accumulator.EventAccumulator(str(tb_run_dir))
  acc.Reload()
  return acc


def test_export_round_trip(tmp_path):
  run = _write_run(tmp_path, 'runA')
  out = tmp_path / 'tb'
  code = export_tensorboard.main([str(run), '--out', str(out)])
  assert code == 0
  acc = _load_scalars(out / 'runA')
  tags = acc.Tags()['scalars']
  assert 'train/loss' in tags and 'train/grad_norm' in tags
  assert 'eval/top1_accuracy' in tags
  loss = acc.Scalars('train/loss')
  assert [(e.step, e.value) for e in loss] == [(0, 2.0), (10, 1.0)]
  assert loss[0].wall_time == 1000.0
  ev = acc.Scalars('eval/top1_accuracy')
  assert [(ev[0].step, round(ev[0].value, 4))] == [(10, 0.8)]


def test_multiple_runs_and_direct_jsonl(tmp_path):
  a = _write_run(tmp_path, 'a')
  b = _write_run(tmp_path, 'b')
  out = tmp_path / 'tb'
  code = export_tensorboard.main(
      [str(a), str(b / 'metrics.jsonl'), '--out', str(out)])
  assert code == 0
  assert (out / 'a').exists() and (out / 'b').exists()


def test_missing_input_fails_loudly(tmp_path):
  with pytest.raises(SystemExit, match='not found'):
    export_tensorboard.main([str(tmp_path / 'nope'), '--out',
                             str(tmp_path / 'tb')])
