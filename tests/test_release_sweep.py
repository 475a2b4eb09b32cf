"""Contract tests for scripts/release_sweep.py (the per-round all-family
results artifact, VERDICT r3 item #2): the output file must be a valid,
incrementally-updated JSON artifact even when legs fail or the sweep is
killed."""

import importlib.util
import json
import os
import pathlib
import subprocess
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_SCRIPT = _ROOT / 'scripts' / 'release_sweep.py'


def _load_module():
  spec = importlib.util.spec_from_file_location('release_sweep', _SCRIPT)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


def test_list_names_all_documented_legs():
  res = subprocess.run(
      [sys.executable, str(_SCRIPT), '--list'], capture_output=True,
      text=True, timeout=120, cwd=str(_ROOT))
  assert res.returncode == 0, res.stderr
  names = res.stdout.split()
  # The CLAUDE.md perf table's families must all be present.
  for want in ('base_bf16', 'base_int8', 'large_bf16', 'giant_int8',
               'lvt_base_bf16', 'lvt_large_int8', 'classifier_base',
               'train_base_b2'):
    assert want in names, (want, names)


def test_unknown_leg_rejected():
  res = subprocess.run(
      [sys.executable, str(_SCRIPT), '--legs', 'nope', '--skip-probe'],
      capture_output=True, text=True, timeout=120, cwd=str(_ROOT))
  assert res.returncode != 0
  assert 'unknown legs' in res.stderr


def test_last_json_line_parsing():
  mod = _load_module()
  text = 'WARNING: platform blah\n{"bad": \n{"value": 3.5}\ntrailing'
  assert mod._last_json_line(text) == {'value': 3.5}
  assert mod._last_json_line('no json here') is None


def test_failed_leg_still_yields_artifact(tmp_path, monkeypatch):
  """A leg whose subprocess dies must be recorded (rc, stderr tail) and
  the artifact stays valid JSON — the sweep never loses the file."""
  mod = _load_module()
  out = tmp_path / 'RESULTS_test.json'
  # One fabricated leg that prints a JSON line, one that crashes.
  legs = {
      'ok_leg': ['-c', 'print(\'{"value": 7.0}\')'],
      'bad_leg': ['-c', 'import sys; sys.exit(3)'],
  }
  monkeypatch.setattr(mod, '_legs', lambda budget: legs)
  monkeypatch.setattr(sys, 'argv', [
      'release_sweep.py', '--skip-probe', '--out', str(out)])
  rc = mod.main()
  assert rc == 1  # one leg failed
  payload = json.loads(out.read_text())
  assert payload['legs']['ok_leg']['rc'] == 0
  assert payload['legs']['ok_leg']['parsed'] == {'value': 7.0}
  assert payload['legs']['bad_leg']['rc'] == 3
  assert payload['legs']['bad_leg']['parsed'] is None
  assert 'summary' in payload and '1/2' in payload['summary']


def test_all_stub_legs_ok_exit_zero(tmp_path, monkeypatch):
  mod = _load_module()
  out = tmp_path / 'RESULTS_test.json'
  monkeypatch.setattr(
      mod, '_legs',
      lambda budget: {'a': ['-c', 'print(\'{"value": 1}\')']})
  monkeypatch.setattr(sys, 'argv', [
      'release_sweep.py', '--skip-probe', '--out', str(out)])
  assert mod.main() == 0
  payload = json.loads(out.read_text())
  assert payload['summary'] == '1/1 legs parsed ok'
