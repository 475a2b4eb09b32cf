"""Real multi-process (multi-host-shaped) integration test.

Spawns two OS processes, each owning two virtual CPU devices, wires them
with ``parallel.distributed.initialize`` (our jax.distributed wrapper),
and runs a TP+DP GSPMD-sharded encoder forward over the 4-device global
mesh — actual cross-process collectives, not a mock.  This is the
single-machine stand-in for a 2-host TPU pod slice.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), '_mh_worker.py')
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
  with socket.socket() as s:
    s.bind(('127.0.0.1', 0))
    return s.getsockname()[1]


_LOADER_WORKER = os.path.join(os.path.dirname(__file__),
                              '_mh_loader_worker.py')


def _run_two_process(worker: str, ok_marker: str, timeout: int = 240):
  port = _free_port()
  env = dict(os.environ)
  env['PYTHONPATH'] = _REPO + os.pathsep + env.get('PYTHONPATH', '')
  procs = [
      subprocess.Popen(
          [sys.executable, worker, str(i), '2', str(port)],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
          env=env)
      for i in range(2)
  ]
  outputs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=timeout)
      outputs.append(out)
  finally:
    for p in procs:
      if p.poll() is None:
        p.kill()
  for i, (p, out) in enumerate(zip(procs, outputs)):
    assert p.returncode == 0, f'proc {i} failed:\n{out[-3000:]}'
    assert f'{ok_marker} proc={i}' in out, out[-3000:]


def test_two_process_sharded_forward():
  _run_two_process(_WORKER, 'MULTIHOST-OK')


def test_two_process_data_loader():
  """Each host decodes only its half; global batch == full-batch reference."""
  _run_two_process(_LOADER_WORKER, 'MULTIHOST-LOADER-OK')


_TRAIN_WORKER = os.path.join(os.path.dirname(__file__),
                             '_mh_train_worker.py')


@pytest.mark.slow
def test_two_process_fsdp_training():
  """Two steps of the FSDP CLIP train step over a cross-process mesh, fed
  by the multi-host loader, matching the single-process step's loss."""
  _run_two_process(_TRAIN_WORKER, 'MULTIHOST-TRAIN-OK', timeout=480)


_PREEMPT_WORKER = os.path.join(os.path.dirname(__file__),
                               '_mh_preempt_worker.py')


def test_two_process_preemption_agreement():
  """Only process 0 gets SIGTERM; both processes must agree to stop at
  the same sync step (flag allgather) — the invariant that keeps the
  sharded preemption checkpoint from deadlocking."""
  _run_two_process(_PREEMPT_WORKER, 'PREEMPT-AGREE-OK')
