"""Bitrot guard for the turnkey release-validation script.

Runs the sub-second offline stages end-to-end (checkpoints loader proxy +
tokenizer diffs) and checks the JSON report contract.  The slow stages
(parity at full widths, retrieval/int8 model smokes) are covered by the
script's own --offline run in the release process, not per-CI.
"""

import json
import os
import pathlib
import subprocess
import sys

_ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_offline_quick_stages(tmp_path):
  report_path = tmp_path / 'report.json'
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(_ROOT / 'scripts' / 'validate_release.py'),
       '--offline', '--stages', 'checkpoints,tokenizer',
       '--report', str(report_path)],
      capture_output=True, text=True, timeout=300, env=env,
      cwd=str(tmp_path))
  assert res.returncode == 0, res.stdout + res.stderr
  report = json.loads(report_path.read_text())
  assert report['overall'] == 'proxy-pass'
  assert report['stages']['checkpoints']['status'] == 'proxy-pass'
  tok = report['stages']['tokenizer']
  assert tok['status'] == 'proxy-pass'
  ran = [d for d in tok['diffs'] if 'mismatches' in d]
  assert ran and all(d['mismatches'] == 0 for d in ran)
  # The final stdout line is the machine-readable summary.
  summary = json.loads(res.stdout.strip().splitlines()[-1])
  assert summary['overall'] == 'proxy-pass'


def test_unknown_stage_rejected():
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(_ROOT / 'scripts' / 'validate_release.py'),
       '--stages', 'bogus'],
      capture_output=True, text=True, timeout=120, env=env)
  assert res.returncode != 0
  assert 'unknown stages' in res.stderr
