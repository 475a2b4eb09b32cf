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


@pytest.mark.parametrize(
    'script', _EXAMPLES + _SCRIPTS,
    ids=lambda p: f'{p.parent.name}/{p.name}')
def test_script_help_runs(script):
  env = dict(os.environ)
  env['PYTHONPATH'] = str(_ROOT) + os.pathsep + env.get('PYTHONPATH', '')
  res = subprocess.run(
      [sys.executable, str(script), '--help'],
      capture_output=True, text=True, timeout=120, env=env)
  assert res.returncode == 0, f'{script.name} --help failed:\n{res.stderr}'
