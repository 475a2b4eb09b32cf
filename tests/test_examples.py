"""Bitrot guard: every example script imports and parses its CLI.

Examples are user-facing documentation; a rename in the library that
breaks one should fail the suite, not a user.  ``--help`` exercises the
full import chain + argparse without running a model.
"""

import os
import pathlib
import subprocess
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_EXAMPLES = sorted((_ROOT / 'examples').glob('*.py'))
_SCRIPTS = sorted((_ROOT / 'scripts').glob('*.py'))
# Repo-root CLIs (the driver runs bench.py with real args; --help once
# crashed on a bare '%' in a help string that only argparse's help
# formatter expands — scripts/probes/ are deliberately excluded since
# they have no argparse and would execute real hardware work).
_ROOT_CLIS = [_ROOT / 'bench.py', _ROOT / 'verify_parity.py']


@pytest.mark.parametrize(
    'script', _EXAMPLES + _SCRIPTS + _ROOT_CLIS,
    ids=lambda p: f'{p.parent.name}/{p.name}')
def test_script_help_runs(script):
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(script), '--help'],
      capture_output=True, text=True, timeout=120, env=env)
  assert res.returncode == 0, f'{script.name} --help failed:\n{res.stderr}'


@pytest.mark.slow
def test_train_cli_manual_tp_smoke():
  """The fastest measured training config (manual TP + fused kernels,
  train/tp_train_step.py) is reachable from the CLI: --tp-impl manual on
  a virtual 8-device CPU mesh runs real steps."""
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(_ROOT / 'scripts' / 'train_clip.py'),
       '--synthetic', '--tiny', '--steps', '2', '--tp-impl', 'manual',
       '--model-parallelism', '2', '--cpu-devices', '8',
       '--batch-size', '8'],
      capture_output=True, text=True, timeout=500, env=env)
  assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
  assert 'done: 2 steps' in res.stdout


@pytest.mark.slow
def test_train_cli_siglip_smoke():
  """--objective siglip trains with the sigmoid loss end-to-end (the
  [log_temperature, bias] leaf flows through the loop, checkpoints, and
  metric logging)."""
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(_ROOT / 'scripts' / 'train_clip.py'),
       '--synthetic', '--tiny', '--batch-size', '4', '--cpu-devices', '1',
       '--steps', '2', '--objective', 'siglip'],
      capture_output=True, text=True, timeout=500, env=env)
  assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
  assert 'done: 2 steps' in res.stdout


@pytest.mark.slow
def test_train_cli_resume_smoke(tmp_path):
  """--resume restores the latest checkpoint and continues: run 2 steps
  with checkpointing, then resume to 4 (exact-equality semantics are
  tested at the library level in test_train_data.py)."""
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  base = [sys.executable, str(_ROOT / 'scripts' / 'train_clip.py'),
          '--synthetic', '--tiny', '--batch-size', '4',
          '--cpu-devices', '1',
          '--checkpoint-dir', str(tmp_path / 'ck'),
          '--checkpoint-every', '2']
  res = subprocess.run(base + ['--steps', '2'], capture_output=True,
                       text=True, timeout=500, env=env)
  assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
  res = subprocess.run(base + ['--steps', '4', '--resume'],
                       capture_output=True, text=True, timeout=500, env=env)
  assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
  assert '--resume: restored step 2' in res.stdout
  assert 'done: 4 steps' in res.stdout


@pytest.mark.slow
def test_train_cli_eval_every_smoke():
  """--eval-every runs the paired-retrieval protocol mid-training on a
  held-out synthetic source and reports R@k."""
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(_ROOT / 'scripts' / 'train_clip.py'),
       '--synthetic', '--tiny', '--batch-size', '4', '--cpu-devices', '1',
       '--steps', '2', '--eval-every', '2'],
      capture_output=True, text=True, timeout=500, env=env)
  assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
  assert 'eval @ step 2' in res.stdout
  assert 't2v_recall@1' in res.stdout


@pytest.mark.slow
def test_bench_serving_smoke():
  """The end-to-end serving benchmark drives the production queue path:
  closed-loop clients, bucketed micro-batching, one JSON report line."""
  import json
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(_ROOT / 'scripts' / 'bench_serving.py'),
       '--tiny', '--cpu-devices', '1', '--duration', '2',
       '--concurrency', '4'],
      capture_output=True, text=True, timeout=500, env=env)
  assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
  report = json.loads(res.stdout.strip().splitlines()[-1])
  assert report['metric'] == 'serving_clips_per_sec'
  assert report['value'] > 0
  assert report['errors'] == 0
  assert report['avg_batch_size'] >= 1.0


def test_ensure_tpu_executes_both_paths():
  """The hardware smokes' claim probe: completes on a live backend,
  exits 75 (EX_TEMPFAIL) when the probe cannot execute in time."""
  env = dict(os.environ)
  env['PYTHONPATH'] = (str(_ROOT) + os.pathsep + str(_ROOT / 'scripts')
                       + os.pathsep + env.get('PYTHONPATH', ''))
  happy = (
      "import jax;"
      "jax.config.update('jax_platforms', 'cpu');"
      "from smoke_configs import ensure_tpu_executes;"
      "ensure_tpu_executes(timeout_s=60); print('probe ok')")
  res = subprocess.run([sys.executable, '-c', happy],
                       capture_output=True, text=True, timeout=120, env=env)
  assert res.returncode == 0 and 'probe ok' in res.stdout, (
      res.stdout + res.stderr)

  # timeout_s=0 forces the deadline branch regardless of backend.
  blocked = (
      "import jax;"
      "jax.config.update('jax_platforms', 'cpu');"
      "from smoke_configs import ensure_tpu_executes;"
      "ensure_tpu_executes(timeout_s=0)")
  res = subprocess.run([sys.executable, '-c', blocked],
                       capture_output=True, text=True, timeout=120, env=env)
  assert res.returncode == 75, (res.returncode, res.stdout, res.stderr)
  assert 'TPU claim unavailable' in res.stdout
