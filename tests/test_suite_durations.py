"""Suite-time governance (VERDICT r4 #8): the per-module duration
artifact + the regression checker that keeps release-gate cost a
reviewed decision."""

import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, 'scripts'))

from check_suite_durations import check_durations, merge_runs  # noqa: E402


class TestCheckDurations:

  def test_clean_run_no_findings(self):
    run = {'total_s': 900.0, 'modules': {'tests/a.py': 500.0,
                                         'tests/b.py': 400.0}}
    base = {'total_s': 880.0, 'modules': {'tests/a.py': 490.0,
                                          'tests/b.py': 390.0}}
    assert check_durations(run, base) == []

  def test_module_regression_flagged(self):
    run = {'total_s': 100.0, 'modules': {'tests/a.py': 90.0}}
    base = {'total_s': 60.0, 'modules': {'tests/a.py': 50.0}}
    findings = check_durations(run, base)
    assert len(findings) == 1 and 'tests/a.py' in findings[0]

  def test_small_jitter_not_flagged(self):
    # +100% but only +3 s absolute: below the floor, not actionable.
    run = {'total_s': 10.0, 'modules': {'tests/tiny.py': 6.0}}
    base = {'total_s': 7.0, 'modules': {'tests/tiny.py': 3.0}}
    assert check_durations(run, base) == []

  def test_budget_and_new_heavy_module(self):
    run = {'total_s': 40 * 60.0,
           'modules': {'tests/new_monster.py': 120.0}}
    base = {'total_s': 900.0, 'modules': {}}
    findings = check_durations(run, base)
    assert any('budget' in f for f in findings)
    assert any('new_monster' in f for f in findings)
    # A light new module is fine.
    run2 = {'total_s': 900.0, 'modules': {'tests/new_small.py': 20.0}}
    assert check_durations(run2, base) == []

  def test_no_baseline_checks_budget_only(self):
    run = {'total_s': 31 * 60.0, 'modules': {'tests/a.py': 1860.0}}
    assert len(check_durations(run, None)) == 1

  def test_merge_chunked_runs(self):
    """The chunked release gate (3 sequential pytest runs) merges into
    one governance artifact: totals add, module maps concatenate."""
    a = {'total_s': 100.0, 'modules': {'tests/a.py': 60.0,
                                       'tests/b.py': 40.0}}
    b = {'total_s': 50.0, 'modules': {'tests/c.py': 50.0}}
    merged = merge_runs([a, b])
    assert merged['total_s'] == 150.0
    assert merged['modules'] == {'tests/a.py': 60.0, 'tests/b.py': 40.0,
                                 'tests/c.py': 50.0}
    # Largest-first ordering for readability.
    assert list(merged['modules']) == ['tests/a.py', 'tests/c.py',
                                       'tests/b.py']


@pytest.mark.slow
def test_conftest_emits_durations_artifact(tmp_path):
  """A pytest run with VIDEOPRISM_DURATIONS_OUT writes per-module wall
  time summing to the session total."""
  out = tmp_path / 'durations.json'
  env = dict(os.environ, VIDEOPRISM_DURATIONS_OUT=str(out))
  r = subprocess.run(
      [sys.executable, '-m', 'pytest',
       'tests/test_suite_durations.py::TestCheckDurations', '-q',
       '-p', 'no:cacheprovider'],
      cwd=_ROOT, env=env, capture_output=True, text=True, timeout=300)
  assert r.returncode == 0, r.stdout[-2000:]
  payload = json.loads(out.read_text())
  assert 'tests/test_suite_durations.py' in payload['modules']
  assert payload['total_s'] >= 0
  assert abs(sum(payload['modules'].values())
             - payload['total_s']) < 1.0
