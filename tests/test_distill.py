"""Distillation tier tests (train/distill.py): loss math, step mechanics,
projection handling, accumulation equivalence, sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.train import distill
from videoprism_tpu.train.train_step import make_optimizer

ENC = dict(patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
           num_temporal_layers=1, num_heads=2, mlp_dim=32,
           atten_logit_cap=50.0, scan=True)
TEACHER_ENC = dict(ENC, model_dim=24, num_heads=3)
STUDENT_ENC = dict(ENC, model_dim=16)
CLIP_EXTRA = dict(num_auxiliary_layers=1, enable_causal_atten=True,
                  num_unimodal_layers=2, norm_policy='pre',
                  vocabulary_size=64)


def _video(b=2, seed=0):
  return jnp.asarray(
      np.random.RandomState(seed).rand(b, 2, 12, 12, 3), jnp.float32)


class TestLossMath:

  def test_cosine_loss_zero_for_identical(self):
    x = jnp.asarray(np.random.RandomState(0).randn(4, 7), jnp.float32)
    loss, metrics = distill.cosine_distill_loss(x, 3.0 * x)  # scale-free
    assert float(loss) < 1e-6
    assert float(metrics['cosine']) > 1 - 1e-6

  def test_kd_kl_zero_for_identical_logits(self):
    logits = jnp.asarray(np.random.RandomState(1).randn(4, 10), jnp.float32)
    assert float(distill.kd_kl_loss(logits, logits, 2.0)) < 1e-6
    assert float(distill.kd_kl_loss(logits, logits + 1.0, 2.0)) < 1e-6

  def test_kd_kl_positive_and_temperature_scaled(self):
    rng = np.random.RandomState(2)
    s = jnp.asarray(rng.randn(4, 10), jnp.float32)
    t = jnp.asarray(rng.randn(4, 10), jnp.float32)
    assert float(distill.kd_kl_loss(s, t, 1.0)) > 0


class TestEncoderDistill:

  def test_loss_decreases_and_proj_trains(self):
    t_cfg = fe.FactorizedEncoderConfig(**TEACHER_ENC)
    s_cfg = fe.FactorizedEncoderConfig(**STUDENT_ENC)
    teacher = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), t_cfg)
    opt = make_optimizer(1e-2, total_steps=50, warmup_steps=0)
    state = distill.create_distill_train_state(
        jax.random.PRNGKey(1), s_cfg, opt, teacher_dim=t_cfg.model_dim)
    assert 'proj' in state.trainable  # widths differ
    step = jax.jit(distill.make_encoder_distill_step(t_cfg, s_cfg, opt))
    batch = {'video': _video()}
    losses = []
    for i in range(8):
      state, metrics = step(state, teacher, batch, jax.random.PRNGKey(2 + i))
      losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert 0.0 < float(metrics['cosine']) <= 1.0

  def test_no_proj_when_widths_match(self):
    s_cfg = fe.FactorizedEncoderConfig(**STUDENT_ENC)
    opt = make_optimizer(1e-3, total_steps=10, warmup_steps=0)
    state = distill.create_distill_train_state(
        jax.random.PRNGKey(0), s_cfg, opt, teacher_dim=s_cfg.model_dim)
    assert 'proj' not in state.trainable

  def test_patch_mismatch_rejected(self):
    t_cfg = fe.FactorizedEncoderConfig(**dict(TEACHER_ENC, patch_size=4))
    s_cfg = fe.FactorizedEncoderConfig(**STUDENT_ENC)
    opt = make_optimizer(1e-3, total_steps=10, warmup_steps=0)
    with pytest.raises(ValueError, match='patch'):
      distill.make_encoder_distill_step(t_cfg, s_cfg, opt)

  def test_accumulation_matches_full_batch(self):
    """accum_steps=2 over half-batches == one step over the full batch
    (cosine loss is a per-example mean; grads average)."""
    t_cfg = fe.FactorizedEncoderConfig(**TEACHER_ENC)
    s_cfg = fe.FactorizedEncoderConfig(**STUDENT_ENC)
    teacher = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), t_cfg)
    opt = make_optimizer(1e-2, total_steps=10, warmup_steps=0)
    make_state = lambda: distill.create_distill_train_state(
        jax.random.PRNGKey(1), s_cfg, opt, teacher_dim=t_cfg.model_dim)
    video = _video(b=4)
    # dropout rngs differ between the two paths unless the config has
    # none; these tiny configs default to dropout-free, so paths agree.
    full = distill.make_encoder_distill_step(t_cfg, s_cfg, opt)
    acc = distill.make_encoder_distill_step(t_cfg, s_cfg, opt,
                                            accum_steps=2)
    s1, m1 = jax.jit(full)(make_state(), teacher, {'video': video},
                           jax.random.PRNGKey(7))
    s2, m2 = jax.jit(acc)(make_state(), teacher,
                          {'video': video.reshape(2, 2, *video.shape[1:])},
                          jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)
    # JAX's default matmul precision rounds through bf16 on CPU too
    # (docs/DESIGN.md §2); microbatch split changes reduction order, and
    # AdamW's sign-like step-1 update amplifies near-zero grads -> 1e-4.
    for a, b in zip(jax.tree.leaves(s1.trainable),
                    jax.tree.leaves(s2.trainable)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestClipVisionDistill:

  def test_loss_decreases(self):
    cfg_kw = dict(STUDENT_ENC, **CLIP_EXTRA)
    t_cfg = vclip.VideoCLIPConfig(**cfg_kw)
    s_cfg = vclip.VideoCLIPConfig(**cfg_kw)
    teacher = init_lib.init_video_clip(jax.random.PRNGKey(0), t_cfg)
    opt = make_optimizer(1e-2, total_steps=20, warmup_steps=0)
    state = distill.create_distill_train_state(
        jax.random.PRNGKey(1), s_cfg, opt, kind='clip_vision')
    step = jax.jit(distill.make_clip_vision_distill_step(t_cfg, s_cfg, opt))
    batch = {'video': _video()}
    losses = []
    for i in range(6):
      state, metrics = step(state, teacher, batch, jax.random.PRNGKey(3 + i))
      losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]

  def test_width_mismatch_rejected(self):
    t_cfg = vclip.VideoCLIPConfig(**dict(TEACHER_ENC, **CLIP_EXTRA))
    s_cfg = vclip.VideoCLIPConfig(**dict(STUDENT_ENC, **CLIP_EXTRA))
    opt = make_optimizer(1e-3, total_steps=10, warmup_steps=0)
    with pytest.raises(ValueError, match='model_dim'):
      distill.make_clip_vision_distill_step(t_cfg, s_cfg, opt)


class TestClassifierDistill:

  def _cfgs(self, classes=5):
    t = vc.VideoClassifierConfig(
        encoder=fe.FactorizedEncoderConfig(**TEACHER_ENC),
        num_classes=classes)
    s = vc.VideoClassifierConfig(
        encoder=fe.FactorizedEncoderConfig(**STUDENT_ENC),
        num_classes=classes)
    return t, s

  def test_blended_loss_decreases(self):
    t_cfg, s_cfg = self._cfgs()
    teacher = init_lib.init_video_classifier(jax.random.PRNGKey(0), t_cfg)
    opt = make_optimizer(1e-2, total_steps=20, warmup_steps=0)
    state = distill.create_distill_train_state(
        jax.random.PRNGKey(1), s_cfg, opt, kind='classifier')
    step = jax.jit(distill.make_classifier_distill_step(
        t_cfg, s_cfg, opt, temperature=2.0, alpha=0.5))
    batch = {'video': _video(), 'label': jnp.asarray([1, 3], jnp.int32)}
    losses = []
    for i in range(6):
      state, metrics = step(state, teacher, batch, jax.random.PRNGKey(5 + i))
      losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]
    assert 'kd_loss' in metrics and 'accuracy' in metrics

  def test_alpha_one_ignores_labels(self):
    t_cfg, s_cfg = self._cfgs()
    teacher = init_lib.init_video_classifier(jax.random.PRNGKey(0), t_cfg)
    opt = make_optimizer(1e-3, total_steps=10, warmup_steps=0)
    state = distill.create_distill_train_state(
        jax.random.PRNGKey(1), s_cfg, opt, kind='classifier')
    step = jax.jit(distill.make_classifier_distill_step(
        t_cfg, s_cfg, opt, alpha=1.0))
    batch_a = {'video': _video(), 'label': jnp.asarray([0, 0], jnp.int32)}
    batch_b = {'video': _video(), 'label': jnp.asarray([4, 2], jnp.int32)}
    _, ma = step(state, teacher, batch_a, jax.random.PRNGKey(2))
    _, mb = step(state, teacher, batch_b, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(ma['loss']), float(mb['loss']),
                               rtol=1e-6)

  def test_class_count_mismatch_rejected(self):
    t_cfg, _ = self._cfgs(classes=5)
    _, s_cfg = self._cfgs(classes=7)
    opt = make_optimizer(1e-3, total_steps=10, warmup_steps=0)
    with pytest.raises(ValueError, match='class'):
      distill.make_classifier_distill_step(t_cfg, s_cfg, opt)
    with pytest.raises(ValueError, match='alpha'):
      distill.make_classifier_distill_step(t_cfg, t_cfg, opt, alpha=1.5)


class TestShardedDistill:

  def test_sharded_step_matches_single_device(self):
    t_cfg = fe.FactorizedEncoderConfig(**TEACHER_ENC)
    s_cfg = fe.FactorizedEncoderConfig(**STUDENT_ENC)
    teacher = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), t_cfg)
    opt = make_optimizer(1e-2, total_steps=10, warmup_steps=0)
    state = distill.create_distill_train_state(
        jax.random.PRNGKey(1), s_cfg, opt, teacher_dim=t_cfg.model_dim)
    step = distill.make_encoder_distill_step(t_cfg, s_cfg, opt)
    batch = {'video': _video(b=8)}
    ref_state, ref_metrics = jax.jit(step)(state, teacher, batch,
                                           jax.random.PRNGKey(9))

    mesh = mesh_lib.make_mesh()  # all devices on the data axis
    jitted, sh_state, sh_teacher = distill.make_sharded_distill_step(
        step, mesh, state, teacher)
    got_state, got_metrics = jitted(sh_state, sh_teacher, batch,
                                    jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(got_metrics['loss']),
                               float(ref_metrics['loss']), rtol=1e-5)
    # Per-shard partial sums reduce in a different order than one
    # device; same 1e-4 rationale as the accumulation test above.
    for a, b in zip(jax.tree.leaves(ref_state.trainable),
                    jax.tree.leaves(got_state.trainable)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestDistillEval:

  def test_identical_models_score_perfectly(self):
    """Same cfg + same params as teacher and student: cosine == 1,
    agreement == 1, KL == 0 — the eval metrics' fixed point."""
    s_cfg = fe.FactorizedEncoderConfig(**STUDENT_ENC)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), s_cfg)
    eval_step = distill.make_distill_eval_step(s_cfg, s_cfg)
    metrics = eval_step({'student': params}, params,
                        np.asarray(_video(b=2)))
    assert float(metrics['eval_cosine']) > 1 - 1e-5

    enc_t = fe.FactorizedEncoderConfig(**STUDENT_ENC)
    c_cfg = vc.VideoClassifierConfig(encoder=enc_t, num_classes=4)
    c_params = init_lib.init_video_classifier(jax.random.PRNGKey(1), c_cfg)
    c_eval = distill.make_distill_eval_step(c_cfg, c_cfg,
                                            kind='classifier')
    m = c_eval({'student': c_params}, c_params, np.asarray(_video(b=2)))
    assert float(m['eval_agreement']) == 1.0
    assert float(m['eval_kl']) < 1e-5

  def test_evaluate_distill_sweeps_source(self):
    from videoprism_tpu.train import data as data_lib

    t_cfg = fe.FactorizedEncoderConfig(**TEACHER_ENC)
    s_cfg = fe.FactorizedEncoderConfig(**STUDENT_ENC)
    teacher = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), t_cfg)
    opt = make_optimizer(1e-3, total_steps=10, warmup_steps=0)
    state = distill.create_distill_train_state(
        jax.random.PRNGKey(1), s_cfg, opt, teacher_dim=t_cfg.model_dim)
    eval_step = distill.make_distill_eval_step(t_cfg, s_cfg)
    source = data_lib.SyntheticSource(num_examples=6, num_frames=2, size=12)
    out = distill.evaluate_distill(eval_step, state.trainable, teacher,
                                   source, batch_size=2, max_batches=2)
    assert set(out) == {'eval_cosine', 'num_examples'}
    assert out['num_examples'] == 4.0  # max_batches caps the population
    assert -1.0 <= out['eval_cosine'] <= 1.0
    # A tail smaller than batch_size still counts (it used to be
    # silently dropped): 5 examples at batch 2 -> all 5 scored.
    tail = distill.evaluate_distill(
        eval_step, state.trainable, teacher,
        data_lib.SyntheticSource(num_examples=5, num_frames=2, size=12),
        batch_size=2)
    assert tail['num_examples'] == 5.0
    # And a source smaller than one batch works outright.
    small = distill.evaluate_distill(
        eval_step, state.trainable, teacher,
        data_lib.SyntheticSource(num_examples=1, num_frames=2, size=12),
        batch_size=2)
    assert small['num_examples'] == 1.0
