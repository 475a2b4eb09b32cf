"""Train -> export servable weights -> load -> forward: the full
lifecycle bridge (scripts/export_params.py) from orbax training
checkpoints to the flat-key serving schema."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=600):
  proc = subprocess.run(
      [sys.executable] + args, cwd=_ROOT, capture_output=True, text=True,
      timeout=timeout)
  assert proc.returncode == 0, (proc.stdout, proc.stderr)
  return proc.stdout


def _train(ckpt_dir, *extra):
  return _run([
      'scripts/train_classifier.py', '--tiny', '--synthetic',
      '--steps', '2', '--batch-size', '2', '--num-classes', '5',
      '--warmup-steps', '1', '--checkpoint-dir', str(ckpt_dir),
      '--checkpoint-every', '1', '--log-every', '1',
      '--cpu-devices', '1', *extra])


def _apply_exported(npz_path):
  import jax

  jax.config.update('jax_platforms', 'cpu')
  import videoprism_tpu as vp
  from videoprism_tpu.models import classifier as vc
  from videoprism_tpu.models import factorized_encoder as fe

  sys.path.insert(0, os.path.join(_ROOT, 'scripts'))
  from smoke_configs import TINY_ENC

  params = vp.load_pretrained_weights(None, checkpoint_path=str(npz_path))
  cfg = vc.VideoClassifierConfig(
      encoder=fe.FactorizedEncoderConfig(**TINY_ENC), num_classes=5)
  clip = np.random.default_rng(0).random((1, 2, 12, 12, 3), np.float32)
  logits, _ = vc.apply(params, clip, cfg, train=False)
  return np.asarray(logits)


@pytest.mark.slow
def test_train_export_load_forward_roundtrip(tmp_path):
  """CLI training run -> export_params -> load_pretrained_weights ->
  classifier forward.  The exported npz is the zero-rename serving
  schema, so the standard loader consumes it directly."""
  ckpt_dir = tmp_path / 'ckpt'
  _train(ckpt_dir)
  out = tmp_path / 'model.npz'
  stdout = _run(['scripts/export_params.py', '--checkpoint-dir',
                 str(ckpt_dir), '-o', str(out)])
  assert 'wrote' in stdout and out.exists()
  logits = _apply_exported(out)
  assert logits.shape == (1, 5) and np.isfinite(logits).all()


@pytest.mark.slow
def test_ema_export_reads_decay_from_resolved_config(tmp_path):
  ckpt_dir = tmp_path / 'ckpt'
  _train(ckpt_dir, '--ema-decay', '0.9', '--steps', '3')
  # The run config was recorded; --ema picks the decay up from it.
  resolved = json.load(open(ckpt_dir / 'resolved_config.json'))
  assert resolved['ema_decay'] == 0.9
  out = tmp_path / 'ema.npz'
  stdout = _run(['scripts/export_params.py', '--checkpoint-dir',
                 str(ckpt_dir), '--ema', '-o', str(out)])
  assert 'decay 0.9' in stdout
  logits = _apply_exported(out)
  assert logits.shape == (1, 5) and np.isfinite(logits).all()


def test_missing_dir_fails_loudly(tmp_path):
  proc = subprocess.run(
      [sys.executable, 'scripts/export_params.py', '--checkpoint-dir',
       str(tmp_path / 'nope'), '-o', str(tmp_path / 'x.npz')],
      cwd=_ROOT, capture_output=True, text=True, timeout=120)
  assert proc.returncode != 0
  assert 'no such checkpoint directory' in proc.stderr + proc.stdout
