"""scripts/bench_multichip.py artifact contract + schema (VERDICT r4
next-round #6: the pod-ready multichip perf harness, validated offline
on the virtual CPU mesh)."""

import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_ROOT, 'scripts', 'bench_multichip.py')


def _run(*extra, timeout=600):
  out = subprocess.run(
      [sys.executable, _SCRIPT, '--cpu-devices', '8', '--model', 'tiny',
       '--runs', '2', '--iters', '2', *extra],
      capture_output=True, text=True, timeout=timeout)
  return out


def _json_line(stdout: str) -> dict:
  lines = [ln for ln in stdout.splitlines() if ln.startswith('{')]
  assert len(lines) == 1, f'expected exactly one JSON line, got: {stdout!r}'
  return json.loads(lines[0])


@pytest.mark.slow
class TestBenchMultichip:

  def test_schema_and_both_legs(self):
    out = _run()
    assert out.returncode == 0, out.stderr[-2000:]
    payload = _json_line(out.stdout)
    # bench.py's driver-facing keys.
    assert payload['metric'] == 'dp_scaling_efficiency'
    assert payload['unit'] == 'fraction'
    assert isinstance(payload['value'], (int, float))
    assert payload['devices'] == 8
    # DP leg: per-device throughputs + derived efficiency.
    dp = payload['dp']
    assert dp['n1_clips_per_s'] > 0 and dp['n8_clips_per_s'] > 0
    assert payload['value'] == dp['efficiency']
    # TP leg: both latencies + speedup.
    tp = payload['tp']
    assert tp['mp1_ms'] > 0 and tp['speedup'] > 0

  def test_budget_watchdog_emits_partial(self):
    """An exhausted budget still yields ONE parsed JSON line, rc=0 —
    the artifact survives exactly like bench.py's."""
    out = _run('--budget-s', '0.5', '--runs', '50', '--iters', '50')
    assert out.returncode == 0, out.stderr[-2000:]
    payload = _json_line(out.stdout)
    assert payload['metric'] == 'dp_scaling_efficiency'
    # Either the watchdog fired (budget_exhausted) or the tiny sweep
    # beat the 1s-minimum timer — both are valid single-line outcomes.
    assert payload.get('budget_exhausted') or 'value' in payload

  def test_single_leg_selection(self):
    out = _run('--legs', 'tp')
    assert out.returncode == 0, out.stderr[-2000:]
    payload = _json_line(out.stdout)
    assert 'tp' in payload and 'dp' not in payload
    # tp-only runs promote the tp speedup to the headline value so the
    # driver-facing (metric, value) pair is never null.
    assert payload['metric'] == 'tp_latency_speedup'
    assert payload['value'] == payload['tp']['speedup']
