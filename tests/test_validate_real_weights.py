"""validate_real_weights.py contract: exit 75 offline, strict grading
online (proxy-pass = failure — VERDICT r3 item #6)."""

import importlib.util
import json
import pathlib
import sys

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_SCRIPT = _ROOT / 'scripts' / 'validate_real_weights.py'


def _load():
  spec = importlib.util.spec_from_file_location('vrw', _SCRIPT)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


def test_offline_is_exit_75(monkeypatch, capsys):
  mod = _load()
  monkeypatch.setattr(mod, 'have_egress', lambda **kw: False)
  monkeypatch.setattr(sys, 'argv', ['validate_real_weights.py'])
  assert mod.main() == 75
  assert 'exit 75' in capsys.readouterr().out.lower()


def _run_with_fake_report(mod, monkeypatch, tmp_path, stages, rc=0):
  """Fake child WRITES the report when it runs (like the real one) —
  main() deletes any pre-existing report up front, so a fake that only
  pre-writes would test nothing."""
  report = tmp_path / 'report.json'

  class FakeProc:
    returncode = rc

  def fake_run(*a, **kw):
    report.write_text(json.dumps(
        {'stages': {k: {'status': s} for k, s in stages.items()}}))
    return FakeProc()

  monkeypatch.setattr(mod, 'have_egress', lambda **kw: True)
  monkeypatch.setattr(mod.subprocess, 'run', fake_run)
  monkeypatch.setattr(sys, 'argv', [
      'validate_real_weights.py', '--report', str(report)])
  return mod.main()


def test_proxy_pass_is_failure_in_strict_mode(monkeypatch, tmp_path,
                                              capsys):
  mod = _load()
  rc = _run_with_fake_report(
      mod, monkeypatch, tmp_path,
      {'checkpoints': 'pass', 'parity': 'proxy-pass'})
  assert rc == 1
  out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert out['overall'] == 'fail'
  assert out['degraded'] == ['parity']


def test_all_real_passes_is_zero(monkeypatch, tmp_path, capsys):
  mod = _load()
  rc = _run_with_fake_report(
      mod, monkeypatch, tmp_path,
      {'checkpoints': 'pass', 'parity': 'pass', 'tokenizer': 'pass'})
  assert rc == 0
  out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert out['overall'] == 'pass' and out['degraded'] == []


def test_stale_report_cannot_be_graded(monkeypatch, tmp_path, capsys):
  """A crashed child that writes NO report must fail even when a
  previous all-pass report sits at the target path (review finding:
  the strict validator graded stale artifacts)."""
  mod = _load()
  report = tmp_path / 'report.json'
  report.write_text(json.dumps({'stages': {'parity': {'status': 'pass'}}}))

  class FakeProc:
    returncode = 1

  monkeypatch.setattr(mod, 'have_egress', lambda **kw: True)
  monkeypatch.setattr(mod.subprocess, 'run',
                      lambda *a, **kw: FakeProc())  # writes nothing
  monkeypatch.setattr(sys, 'argv', [
      'validate_real_weights.py', '--report', str(report)])
  assert mod.main() == 1
  out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert out['overall'] == 'fail' and 'no report' in out['detail']
  assert not report.exists()


def test_nonzero_child_rc_fails_despite_passing_report(monkeypatch,
                                                       tmp_path, capsys):
  mod = _load()
  rc = _run_with_fake_report(
      mod, monkeypatch, tmp_path, {'parity': 'pass'}, rc=3)
  assert rc == 1
  out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert out['overall'] == 'fail' and 'exited 3' in out['detail']
