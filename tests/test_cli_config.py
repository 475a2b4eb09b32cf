"""--config JSON support for the training CLIs (utils/cli.py)."""

import argparse
import json
import os

import pytest

from videoprism_tpu.utils.cli import parse_with_config


def _parser():
  p = argparse.ArgumentParser()
  p.add_argument('--learning-rate', type=float, default=1e-4)
  p.add_argument('--steps', type=int, default=100)
  p.add_argument('--augment', action='store_true')
  p.add_argument('--checkpoint-dir', default=None)
  return p


class TestParseWithConfig:

  def test_config_sets_defaults_cli_overrides(self, tmp_path):
    cfg = tmp_path / 'run.json'
    cfg.write_text(json.dumps({
        'learning-rate': 0.5, 'steps': 7, 'augment': True}))
    args = parse_with_config(_parser(), ['--config', str(cfg)])
    assert args.learning_rate == 0.5 and args.steps == 7 and args.augment
    # explicit flag wins over the config value
    args = parse_with_config(
        _parser(), ['--config', str(cfg), '--steps', '9'])
    assert args.steps == 9 and args.learning_rate == 0.5

  def test_underscore_keys_accepted(self, tmp_path):
    cfg = tmp_path / 'run.json'
    cfg.write_text(json.dumps({'learning_rate': 0.25}))
    args = parse_with_config(_parser(), ['--config', str(cfg)])
    assert args.learning_rate == 0.25

  def test_unknown_key_fails_fast(self, tmp_path):
    cfg = tmp_path / 'run.json'
    cfg.write_text(json.dumps({'learning-rte': 0.5}))  # typo
    with pytest.raises(SystemExit, match='learning-rte'):
      parse_with_config(_parser(), ['--config', str(cfg)])

  def test_non_object_rejected(self, tmp_path):
    cfg = tmp_path / 'run.json'
    cfg.write_text('[1, 2]')
    with pytest.raises(SystemExit, match='object'):
      parse_with_config(_parser(), ['--config', str(cfg)])

  def test_resolved_config_written_to_checkpoint_dir(self, tmp_path):
    ckpt = tmp_path / 'ckpts'
    args = parse_with_config(
        _parser(), ['--checkpoint-dir', str(ckpt), '--steps', '3'])
    assert args.steps == 3
    resolved = json.load(open(ckpt / 'resolved_config.json'))
    assert resolved['steps'] == 3
    assert 'config' not in resolved

  def test_no_config_is_a_noop(self):
    args = parse_with_config(_parser(), [])
    assert args.steps == 100 and args.config is None


@pytest.mark.slow
def test_distill_cli_runs_from_config(tmp_path):
  """End-to-end: a version-controlled JSON config drives the distill CLI."""
  import pathlib
  import subprocess
  import sys

  root = pathlib.Path(__file__).resolve().parent.parent
  cfg = tmp_path / 'distill.json'
  cfg.write_text(json.dumps({
      'mode': 'encoder', 'tiny': True, 'synthetic': True, 'steps': 2,
      'batch-size': 2, 'cpu-devices': 1, 'log-every': 1,
      'checkpoint-dir': str(tmp_path / 'ckpts')}))
  env = dict(os.environ)
  env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
  r = subprocess.run(
      [sys.executable, str(root / 'scripts' / 'distill.py'),
       '--config', str(cfg)],
      capture_output=True, text=True, env=env, timeout=600)
  assert r.returncode == 0, r.stdout + r.stderr
  assert 'step 2/2' in r.stdout
  assert (tmp_path / 'ckpts' / 'resolved_config.json').exists()
