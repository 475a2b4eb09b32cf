"""Elastic supervisor: exit-75 restart loop, failure passthrough, signal
forwarding.  Uses tiny stub children (no JAX) so the loop semantics are
tested in milliseconds; the real trainer integration is covered by
tests/test_preemption.py."""

import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT / 'scripts'))

import run_elastic  # noqa: E402


def _stub(tmp_path, body: str) -> list[str]:
  """A child script whose launch count persists in count.txt."""
  script = tmp_path / 'child.py'
  script.write_text(
      'import pathlib, sys\n'
      f'p = pathlib.Path({str(tmp_path)!r}) / "count.txt"\n'
      'n = int(p.read_text()) + 1 if p.exists() else 1\n'
      'p.write_text(str(n))\n'
      + body)
  return [sys.executable, str(script)]


def _count(tmp_path) -> int:
  return int((tmp_path / 'count.txt').read_text())


def test_build_command_appends_resume_once():
  assert run_elastic.build_command(['t.py', '--steps', '5'], True) == \
      ['t.py', '--steps', '5', '--resume']
  assert run_elastic.build_command(['t.py', '--resume'], True) == \
      ['t.py', '--resume']
  assert run_elastic.build_command(['t.py'], False) == ['t.py']


def test_preemption_restarts_until_success(tmp_path):
  cmd = _stub(tmp_path, 'sys.exit(75 if n < 3 else 0)\n')
  code = run_elastic.supervise(cmd, max_restarts=10, backoff=0,
                               restart_on_failure=False)
  assert code == 0
  assert _count(tmp_path) == 3


def test_resume_flag_reaches_child(tmp_path):
  cmd = _stub(tmp_path, 'sys.exit(0 if "--resume" in sys.argv else 9)\n')
  assert run_elastic.supervise(cmd, max_restarts=0, backoff=0,
                               restart_on_failure=False) == 0


def test_real_failure_not_restarted(tmp_path):
  cmd = _stub(tmp_path, 'sys.exit(3)\n')
  code = run_elastic.supervise(cmd, max_restarts=10, backoff=0,
                               restart_on_failure=False)
  assert code == 3
  assert _count(tmp_path) == 1


def test_restart_on_failure_retries_crashes(tmp_path):
  cmd = _stub(tmp_path, 'sys.exit(1 if n < 3 else 0)\n')
  code = run_elastic.supervise(cmd, max_restarts=10, backoff=0,
                               restart_on_failure=True)
  assert code == 0
  assert _count(tmp_path) == 3


def test_restart_budget_exhausted(tmp_path):
  cmd = _stub(tmp_path, 'sys.exit(75)\n')
  code = run_elastic.supervise(cmd, max_restarts=2, backoff=0,
                               restart_on_failure=False)
  assert code == 75
  assert _count(tmp_path) == 3  # initial launch + 2 restarts


def test_cli_parses_command_after_dashes(tmp_path):
  marker = tmp_path / 'ran.txt'
  code = run_elastic.main(
      ['--max-restarts', '0', '--backoff', '0', '--no-append-resume', '--',
       sys.executable, '-c',
       f'import pathlib; pathlib.Path({str(marker)!r}).write_text("y")'])
  assert code == 0
  assert marker.read_text() == 'y'


def test_sigterm_forwarded_child_checkpoints(tmp_path):
  """Supervisor SIGTERM -> child gets it, 'checkpoints' (exits 75), and
  the supervisor re-exits 75 WITHOUT restarting (stop was ours)."""
  child = tmp_path / 'child.py'
  child.write_text(
      'import pathlib, signal, sys, time\n'
      f'ready = pathlib.Path({str(tmp_path)!r}) / "ready.txt"\n'
      'signal.signal(signal.SIGTERM, lambda *a: sys.exit(75))\n'
      'ready.write_text("up")\n'
      'time.sleep(120)\n')
  proc = subprocess.Popen(
      [sys.executable, str(_ROOT / 'scripts' / 'run_elastic.py'),
       '--backoff', '0', '--no-append-resume', '--',
       sys.executable, str(child)])
  deadline = time.time() + 30
  while not (tmp_path / 'ready.txt').exists():
    assert time.time() < deadline, 'child never came up'
    assert proc.poll() is None, f'supervisor died early: {proc.returncode}'
    time.sleep(0.05)
  proc.send_signal(signal.SIGTERM)
  assert proc.wait(timeout=30) == 75


def test_signal_during_backoff_stops_instead_of_relaunching(tmp_path):
  """A stop signal that lands between child exits (during the backoff
  sleep, no live child to forward to) must end the loop — relaunching
  would strand a trainer past the scheduler's grace period."""
  cmd = _stub(tmp_path, 'sys.exit(75)\n')
  real_sleep = run_elastic.time.sleep

  def sleep_with_signal(seconds):
    os.kill(os.getpid(), signal.SIGTERM)
    real_sleep(0)

  orig = run_elastic.time.sleep
  run_elastic.time.sleep = sleep_with_signal
  try:
    code = run_elastic.supervise(cmd, max_restarts=10, backoff=1,
                                 restart_on_failure=False)
  finally:
    run_elastic.time.sleep = orig
  assert code == 75
  assert _count(tmp_path) == 1  # never relaunched
