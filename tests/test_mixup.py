"""MixUp + label smoothing for classifier fine-tuning: loss math vs
numpy references, device-side mixing, train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.train import augment, make_optimizer, objectives
from videoprism_tpu.train.classifier_train_step import (
    create_classifier_train_state,
    make_classifier_train_step,
)

TINY_ENC = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)
C = 5


def _softmax(x):
  e = np.exp(x - x.max(-1, keepdims=True))
  return e / e.sum(-1, keepdims=True)


class TestLossMath:

  def test_label_smoothing_matches_numpy(self):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, C)).astype(np.float32)
    labels = np.array([0, 2, 4, 1])
    eps = 0.1
    loss, _ = objectives.softmax_cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels), label_smoothing=eps)
    log_p = np.log(_softmax(logits))
    q = (1 - eps) * np.eye(C)[labels] + eps / C
    ref = -np.mean(np.sum(q * log_p, axis=-1))
    np.testing.assert_allclose(float(loss), ref, rtol=1e-6)

  def test_soft_ce_equals_hard_ce_on_onehot(self):
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((4, C)).astype(np.float32))
    labels = jnp.asarray([1, 3, 0, 2])
    hard, hm = objectives.softmax_cross_entropy_loss(logits, labels)
    soft, sm = objectives.soft_cross_entropy_loss(
        logits, jax.nn.one_hot(labels, C))
    np.testing.assert_allclose(float(hard), float(soft), rtol=1e-6)
    assert float(hm['accuracy']) == float(sm['accuracy'])


class TestMixup:

  def test_shapes_and_probability_rows(self):
    rng = np.random.default_rng(2)
    videos = jnp.asarray(rng.random((6, 2, 12, 12, 3)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 4, 0])
    mixed, probs = augment.mixup(jax.random.PRNGKey(0), videos, labels, C,
                                 alpha=0.4)
    assert mixed.shape == videos.shape
    assert probs.shape == (6, C)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-6)
    assert np.asarray(probs).min() >= 0.0

  def test_mix_is_the_convex_combo_it_claims(self):
    """Recover lambda from the target rows and check the pixels blended
    with exactly the same weights."""
    rng = np.random.default_rng(3)
    videos = jnp.asarray(rng.random((4, 1, 6, 6, 3)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])  # distinct -> lambda readable
    mixed, probs = augment.mixup(jax.random.PRNGKey(1), videos, labels, C,
                                 alpha=0.3)
    probs = np.asarray(probs)
    mixed = np.asarray(mixed)
    videos = np.asarray(videos)
    for i in range(4):
      lam = probs[i, labels[i]]
      partner = int(np.argmax(probs[i] - lam * np.eye(C)[labels[i]]))
      if partner == labels[i]:  # self-pairing under the permutation
        np.testing.assert_allclose(mixed[i], videos[i], atol=1e-6)
        continue
      expect = lam * videos[i] + (1 - lam) * videos[partner]
      np.testing.assert_allclose(mixed[i], expect, atol=1e-5)

  def test_smoothing_composes(self):
    videos = jnp.zeros((2, 1, 6, 6, 3), jnp.float32)
    labels = jnp.asarray([0, 1])
    _, probs = augment.mixup(jax.random.PRNGKey(2), videos, labels, C,
                             alpha=0.2, label_smoothing=0.1)
    probs = np.asarray(probs)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-6)
    assert probs.min() >= 0.1 / C - 1e-6  # smoothing floor survives mixing

  def test_batch_mismatch_rejected(self):
    with pytest.raises(ValueError, match='videos'):
      augment.mixup(jax.random.PRNGKey(0),
                    jnp.zeros((3, 1, 6, 6, 3)), jnp.zeros((2,), jnp.int32),
                    C)


class TestTrainStepIntegration:

  @pytest.fixture(scope='class')
  def cfg(self):
    return vc.VideoClassifierConfig(
        encoder=fe.FactorizedEncoderConfig(**TINY_ENC), num_classes=C)

  def _batch(self, b=4):
    rng = np.random.default_rng(4)
    return {
        'video': jnp.asarray(rng.random((b, 2, 12, 12, 3)), jnp.float32),
        'label': jnp.asarray(rng.integers(0, C, b)),
    }

  @pytest.mark.parametrize('freeze', [False, True])
  def test_mixup_step_trains(self, cfg, freeze):
    optimizer = make_optimizer(learning_rate=3e-3, warmup_steps=1,
                               total_steps=50)
    state = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg, optimizer, freeze_backbone=freeze)
    step = jax.jit(make_classifier_train_step(
        cfg, optimizer, freeze_backbone=freeze, mixup_alpha=0.2,
        label_smoothing=0.1))
    batch = self._batch()
    losses = []
    for i in range(6):
      state, metrics = step(state, batch, jax.random.PRNGKey(i))
      losses.append(float(metrics['loss']))
      assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]

  def test_smoothing_only_step(self, cfg):
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=50)
    state = create_classifier_train_state(jax.random.PRNGKey(0), cfg,
                                          optimizer)
    step = jax.jit(make_classifier_train_step(cfg, optimizer,
                                              label_smoothing=0.1))
    _, metrics = step(state, self._batch(), jax.random.PRNGKey(0))
    # Smoothed loss is bounded below by the smoothing entropy floor.
    assert float(metrics['loss']) > 0.1 * np.log(C) * 0.5

  def test_mixup_sharded_step(self):
    """MixUp inside the GSPMD step: the batch permutation crosses data
    shards (XLA inserts the collective), one step runs finite.

    Runs in a SUBPROCESS (tests/_mixup_sharded_worker.py): this exact
    program has twice aborted the whole suite process inside XLA:CPU's
    runtime late in full runs while passing standalone — process
    isolation turns any recurrence into a legible failure here instead
    of a dead pytest (round-4 incident log, TODO.md)."""
    import os
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
    res = subprocess.run(
        [sys.executable, str(root / 'tests' / '_mixup_sharded_worker.py')],
        capture_output=True, text=True, timeout=600, env=env)
    assert res.returncode == 0, res.stdout[-1500:] + res.stderr[-1500:]
    assert 'sharded mixup step OK' in res.stdout

  def test_mixup_with_accumulation(self, cfg):
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=50)
    state = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg, optimizer, freeze_backbone=True)
    step = jax.jit(make_classifier_train_step(
        cfg, optimizer, freeze_backbone=True, accum_steps=2,
        mixup_alpha=0.2))
    batch = jax.tree.map(
        lambda x: x.reshape((2, 2) + x.shape[1:]), self._batch(4))
    _, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
