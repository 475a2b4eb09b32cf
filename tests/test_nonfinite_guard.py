"""Non-finite gradient protection (make_optimizer skip_nonfinite).

bf16 training overflows occasionally produce NaN/inf gradients; the guard
must (a) leave params and optimizer moments untouched on a bad step,
(b) resume updating normally on the next good step, and (c) stand aside
after N consecutive bad steps so true divergence surfaces instead of
silently spinning.  Also checks the wrapped optimizer state composes with
the sharded train step's structural sharding assignment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import clip as vclip
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.train import (
    create_train_state,
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
)

TINY = dict(patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
            num_temporal_layers=1, mlp_dim=16, num_auxiliary_layers=0,
            vocabulary_size=32, enable_causal_atten=True,
            num_unimodal_layers=1, norm_policy='pre', model_dim=8,
            num_heads=2, atten_logit_cap=50.0, scan=True)


def _batch(nan: bool, batch=4, frames=2, size=12, text_len=8):
  video = np.random.default_rng(0).normal(size=(batch, frames, size, size, 3))
  if nan:
    video = video.copy()
    video[0, 0, 0, 0, 0] = np.nan
  ids = np.ones((batch, text_len), np.int32)
  return {
      'video': jnp.asarray(video, jnp.float32),
      'text_token_ids': jnp.asarray(ids),
      'text_paddings': jnp.zeros((batch, text_len), jnp.float32),
  }


def _leaves_equal(a, b):
  return all(
      np.array_equal(np.asarray(x), np.asarray(y))
      for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


class TestSkipNonfinite:

  def setup_method(self):
    self.cfg = vclip.VideoCLIPConfig(**TINY)
    # warmup_steps=0: the schedule's step-0 LR is the peak, so a good
    # step visibly moves the params (warmup's step-0 LR is 0.0).
    self.opt = make_optimizer(learning_rate=1e-3, warmup_steps=0,
                              total_steps=10, skip_nonfinite=2)
    self.state = create_train_state(jax.random.PRNGKey(0), self.cfg, self.opt)
    self.step = jax.jit(make_train_step(self.cfg, self.opt))
    self.rng = jax.random.PRNGKey(1)

  def test_bad_step_skipped_good_step_applies(self):
    # The jitted step donates the input state: snapshot to host first.
    p0 = jax.device_get(self.state.params)
    step0 = int(self.state.step)
    s1, m1 = self.step(self.state, _batch(nan=True), self.rng)
    # Params and moments untouched; the skip is visible as NaN grad_norm
    # (the host-side signal the trainers log on).
    p1 = jax.device_get(s1.params)
    assert _leaves_equal(p1, p0)
    assert not np.isfinite(float(m1['grad_norm']))
    assert int(s1.step) == step0 + 1

    s2, m2 = self.step(s1, _batch(nan=False), self.rng)
    assert not _leaves_equal(jax.device_get(s2.params), p1)
    assert np.isfinite(float(m2['loss']))
    assert np.isfinite(float(m2['grad_norm']))
    # All params still finite after the bad/good sequence.
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(s2.params))

  def test_consecutive_budget_then_surface(self):
    # Two consecutive bad steps are absorbed (budget=2)...
    s = self.state
    for _ in range(2):
      s, _ = self.step(s, _batch(nan=True), self.rng)
      assert all(np.isfinite(np.asarray(x)).all()
                 for x in jax.tree.leaves(s.params))
    # ...the third consecutive one exceeds the budget: apply_if_finite
    # stands aside and the divergence becomes visible in the params.
    s, _ = self.step(s, _batch(nan=True), self.rng)
    assert not all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(s.params))

  def test_good_step_resets_consecutive_count(self):
    s = self.state
    for _ in range(2):
      s, _ = self.step(s, _batch(nan=True), self.rng)
    s, _ = self.step(s, _batch(nan=False), self.rng)
    for _ in range(2):
      s, _ = self.step(s, _batch(nan=True), self.rng)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(s.params))

  def test_guard_off_poisons_params(self):
    opt = make_optimizer(learning_rate=1e-3, warmup_steps=0, total_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), self.cfg, opt)
    step = jax.jit(make_train_step(self.cfg, opt))
    s1, _ = step(state, _batch(nan=True), self.rng)
    assert not all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(s1.params))

  def test_validates_positive(self):
    with pytest.raises(ValueError):
      make_optimizer(skip_nonfinite=0)
    with pytest.raises(ValueError):
      make_optimizer(skip_nonfinite=-1)


def test_sharded_step_composes_with_guard():
  """ApplyIfFiniteState (namedtuple counters + inner state) must pass the
  structural sharding assignment; run one bad + one good step on the mesh."""
  cfg = vclip.VideoCLIPConfig(**TINY)
  opt = make_optimizer(learning_rate=1e-3, warmup_steps=0, total_steps=10,
                       skip_nonfinite=3)
  state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
  mesh = mesh_lib.make_mesh(model_parallelism=2)
  step, state = make_sharded_train_step(cfg, opt, mesh, state)
  rng = jax.random.PRNGKey(1)
  p0 = jax.device_get(state.params)
  s1, m1 = step(state, _batch(nan=True, batch=8), rng)
  assert not np.isfinite(float(m1['grad_norm']))
  p1 = jax.device_get(s1.params)
  assert _leaves_equal(p1, p0)
  s2, m2 = step(s1, _batch(nan=False, batch=8), rng)
  assert np.isfinite(float(m2['loss']))
  assert not _leaves_equal(jax.device_get(s2.params), p1)


class TestScheduleChoices:
  """make_optimizer schedule variants: warmup then cosine/linear/constant."""

  def _lr_trace(self, schedule, steps=10):
    # Drive the real optimizer on a scalar: the per-step update magnitude
    # of a constant gradient tracks the schedule's LR.
    params = {'w': jnp.ones(())}
    opt = make_optimizer(learning_rate=1e-2, warmup_steps=2,
                         total_steps=steps, schedule=schedule)
    state = opt.init(params)
    lrs = []
    for _ in range(steps):
      updates, state = opt.update({'w': jnp.ones(())}, state, params)
      lrs.append(-float(updates['w']))  # update magnitude tracks the LR
    return lrs

  def test_constant_holds_peak(self):
    lrs = self._lr_trace('constant')
    assert lrs[0] < lrs[2]              # warmup ramps
    assert lrs[4] == pytest.approx(lrs[8], rel=1e-3)  # then flat

  def test_cosine_and_linear_decay_to_zero(self):
    for schedule in ('cosine', 'linear'):
      lrs = self._lr_trace(schedule)
      assert lrs[3] > lrs[-1]
      assert lrs[-1] < 0.3 * max(lrs)

  def test_unknown_schedule_rejected(self):
    with pytest.raises(ValueError, match='schedule'):
      make_optimizer(schedule='polynomial')
