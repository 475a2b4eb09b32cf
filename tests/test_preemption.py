"""Preemption-safe training: SIGTERM -> checkpoint -> exit 75 -> --resume.

The reference has no elastic-recovery story (SURVEY.md §5); on TPU
fleets preemption is routine, so the trainers must turn the eviction
SIGTERM into an exact resume point.  Library-level tests cover the
guard's signal/flag semantics; the slow test preempts a real trainer
subprocess mid-run and resumes it to completion.
"""

import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest

from videoprism_tpu.train import preemption

_ROOT = pathlib.Path(__file__).resolve().parent.parent


class TestPreemptionGuard:

  def test_sigterm_sets_flag_only(self):
    with preemption.PreemptionGuard() as guard:
      assert not guard.triggered
      os.kill(os.getpid(), signal.SIGTERM)
      # The handler must not raise/exit — execution continues here.
      assert guard.triggered
      assert guard.signum == signal.SIGTERM
      assert guard.should_stop(step=1)

  def test_handlers_restored_on_exit(self):
    before = signal.getsignal(signal.SIGTERM)
    with preemption.PreemptionGuard():
      assert signal.getsignal(signal.SIGTERM) != before
    assert signal.getsignal(signal.SIGTERM) == before

  def test_not_triggered_means_keep_going(self):
    with preemption.PreemptionGuard() as guard:
      assert not guard.should_stop(step=16)

  def test_custom_signal(self):
    with preemption.PreemptionGuard(signals=(signal.SIGUSR1,)) as guard:
      os.kill(os.getpid(), signal.SIGUSR1)
      assert guard.triggered and guard.signum == signal.SIGUSR1

  def test_sync_every_validated(self):
    with pytest.raises(ValueError):
      preemption.PreemptionGuard(sync_every=0)

  def test_exit_preempted_without_checkpointer(self, capsys):
    class _State:
      step = 7

    with pytest.raises(SystemExit) as exc:
      preemption.exit_preempted(_State(), None, None)
    assert exc.value.code == preemption.EXIT_PREEMPTED
    assert 'preempted at step 7' in capsys.readouterr().out


@pytest.mark.slow
@pytest.mark.parametrize('script', ['train_clip.py', 'train_classifier.py'])
def test_trainer_preempt_then_resume(tmp_path, script):
  """SIGTERM mid-run: the trainer checkpoints the post-step state, exits
  75, and a --resume run continues from exactly that step. Both trainer
  loops carry the guard wiring independently, so both are exercised."""
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  base = [sys.executable, '-u', str(_ROOT / 'scripts' / script),
          '--synthetic', '--tiny', '--batch-size', '4', '--cpu-devices', '1',
          '--checkpoint-dir', str(tmp_path / 'ck'), '--log-every', '1',
          # Periodic saves off (huge interval): the only checkpoint that
          # can exist is the preemption save.
          '--checkpoint-every', '100000']
  proc = subprocess.Popen(base + ['--steps', '100000'],
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True, env=env)
  # Wait for evidence of completed steps, then deliver the eviction signal.
  deadline = time.time() + 420
  lines = []
  stepped = 0
  while time.time() < deadline:
    line = proc.stdout.readline()
    if not line:
      break
    lines.append(line)
    if '"step"' in line or 'step=' in line or line.startswith('step'):
      stepped += 1
      if stepped >= 2:
        break
  assert stepped >= 2, 'trainer produced no step logs:\n' + ''.join(lines)
  proc.send_signal(signal.SIGTERM)
  out_rest, _ = proc.communicate(timeout=300)
  out = ''.join(lines) + out_rest
  assert proc.returncode == preemption.EXIT_PREEMPTED, out[-3000:]
  assert 'preempted at step' in out, out[-3000:]

  saved_step = int(out.split('preempted at step')[1].split(':')[0])
  assert saved_step >= 1

  # Resume: restores the preemption checkpoint and finishes the run.
  res = subprocess.run(
      base + ['--steps', str(saved_step + 2), '--resume'],
      capture_output=True, text=True, timeout=420, env=env)
  assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
  assert f'--resume: restored step {saved_step}' in res.stdout, \
      res.stdout[-3000:]
  assert f'done: {saved_step + 2} steps' in res.stdout, res.stdout[-3000:]
