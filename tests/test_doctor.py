"""scripts/doctor.py: the environment diagnostic must itself stay
healthy — a broken doctor is worse than none."""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_doctor_cpu_path_is_ok():
  proc = subprocess.run(
      [sys.executable, 'scripts/doctor.py', '--cpu', '--timeout', '120'],
      cwd=_ROOT, capture_output=True, text=True, timeout=600)
  assert proc.returncode == 0, (proc.stdout, proc.stderr)
  out = proc.stdout
  assert 'verdict: ok' in out
  # Every probe ran (no device-unavailable short-circuit on CPU).
  for check in ('versions', 'devices + execution', 'native tokenizer',
                'native video decoder', 'bundled assets', 'tiny forward'):
    assert f'] {check}:' in out, out
  assert '[FAIL' not in out, out
