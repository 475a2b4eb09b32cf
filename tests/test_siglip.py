"""SigLIP sigmoid contrastive objective: loss math vs a numpy reference,
temperature-state plumbing, and train-step integration (single-device,
GSPMD-sharded, manual-TP) on the 8-device virtual CPU mesh."""

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
    objectives,
)

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
    num_temporal_layers=1, mlp_dim=32, num_auxiliary_layers=1,
    vocabulary_size=64, enable_causal_atten=True, num_unimodal_layers=2,
    norm_policy='pre', model_dim=16, num_heads=2, atten_logit_cap=50.0,
    scan=True)


def _batch(b=8, t=2, hw=12, seq=4, seed=0):
  k = jax.random.PRNGKey(seed)
  return {
      'video': jax.random.uniform(k, (b, t, hw, hw, 3)),
      'text_token_ids': jax.random.randint(k, (b, seq), 0, 64),
      'text_paddings': jnp.zeros((b, seq)),
  }


def _unit_rows(rng, n, d):
  x = rng.standard_normal((n, d)).astype(np.float32)
  return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestSiglipLoss:

  def test_matches_numpy_reference(self):
    rng = np.random.default_rng(0)
    v = _unit_rows(rng, 6, 16)
    t = _unit_rows(rng, 6, 16)
    log_t, bias = 1.3, -2.0
    loss, metrics = objectives.siglip_loss(
        jnp.asarray(v), jnp.asarray(t), jnp.asarray([log_t, bias]))

    logits = np.exp(log_t) * (v @ t.T) + bias
    signs = 2.0 * np.eye(6) - 1.0
    # log sigmoid(x) = -log1p(exp(-x)), stable form via logaddexp.
    ref = np.sum(np.logaddexp(0.0, -signs * logits)) / 6
    np.testing.assert_allclose(float(loss), ref, rtol=1e-6)
    np.testing.assert_allclose(float(metrics['logit_scale']),
                               np.exp(log_t), rtol=1e-6)
    assert float(metrics['logit_bias']) == pytest.approx(bias)

  def test_aligned_pairs_score_lower_than_shuffled(self):
    rng = np.random.default_rng(1)
    v = _unit_rows(rng, 8, 16)
    state = jnp.asarray([np.log(10.0), -10.0], jnp.float32)
    aligned, _ = objectives.siglip_loss(jnp.asarray(v), jnp.asarray(v),
                                        state)
    shuffled, _ = objectives.siglip_loss(
        jnp.asarray(v), jnp.asarray(np.roll(v, 1, axis=0)), state)
    assert float(aligned) < float(shuffled)

  def test_paper_init_starts_near_balance(self):
    """With t'=log10, b=-10 and orthogonal-ish embeddings every logit
    sits near -10: positives and the B-1 negatives contribute the same
    order of loss instead of negatives swamping the signal."""
    rng = np.random.default_rng(2)
    v = _unit_rows(rng, 16, 64)
    t = _unit_rows(rng, 16, 64)
    loss, _ = objectives.siglip_loss(
        jnp.asarray(v), jnp.asarray(t),
        objectives.init_temperature_state('siglip'))
    # -log sigmoid(-(-10)) ~ 4.5e-5 per negative; the positive pays ~10.
    assert 5.0 < float(loss) < 15.0

  def test_rejects_scalar_temperature(self):
    rng = np.random.default_rng(3)
    v = jnp.asarray(_unit_rows(rng, 4, 8))
    with pytest.raises(ValueError, match='shape'):
      objectives.siglip_loss(v, v, jnp.asarray(1.0))

  def test_gradients_flow_to_temperature_and_bias(self):
    rng = np.random.default_rng(4)
    v = jnp.asarray(_unit_rows(rng, 4, 8))
    t = jnp.asarray(_unit_rows(rng, 4, 8))

    def loss(state):
      return objectives.siglip_loss(v, t, state)[0]

    g = jax.grad(loss)(jnp.asarray([0.5, -1.0], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(np.abs(g[0])) > 0 and float(np.abs(g[1])) > 0

  def test_dispatcher_and_init(self):
    s = objectives.init_temperature_state('siglip')
    assert s.shape == (2,)
    np.testing.assert_allclose(np.asarray(s), [np.log(10.0), -10.0],
                               rtol=1e-6)
    i = objectives.init_temperature_state('infonce')
    assert i.shape == ()
    np.testing.assert_allclose(float(i), np.log(1 / 0.07), rtol=1e-6)
    with pytest.raises(ValueError, match='unknown'):
      objectives.init_temperature_state('nope')
    with pytest.raises(ValueError, match='unknown'):
      objectives.contrastive_loss('nope', i, i, i)


class TestSiglipTrainStep:

  @pytest.fixture(scope='class')
  def cfg(self):
    return vclip.VideoCLIPConfig(**TINY_CLIP)

  def test_single_device_loss_decreases(self, cfg):
    optimizer = make_optimizer(learning_rate=3e-3, warmup_steps=1,
                               total_steps=50)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer,
                               objective='siglip')
    assert state.log_temperature.shape == (2,)
    step = jax.jit(make_train_step(cfg, optimizer, objective='siglip'))
    batch = _batch(b=4)
    losses = []
    for i in range(8):
      state, metrics = step(state, batch, jax.random.PRNGKey(i))
      losses.append(float(metrics['loss']))
      assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert 'logit_bias' in metrics

  def test_unknown_objective_rejected(self, cfg):
    optimizer = make_optimizer()
    with pytest.raises(ValueError, match='unknown'):
      make_train_step(cfg, optimizer, objective='nope')

  def test_sharded_step_matches_single_device(self, cfg):
    """GSPMD data-parallel SigLIP step == the single-device step: the
    pairwise loss decomposes per logit, so gathering shards changes
    nothing numerically."""
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=50)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer,
                               objective='siglip')
    batch = _batch(b=8)
    rng = jax.random.PRNGKey(7)

    single = jax.jit(make_train_step(cfg, optimizer, objective='siglip'))
    s1, m1 = single(state, batch, rng)

    mesh = mesh_lib.make_mesh(model_parallelism=1)
    state2 = create_train_state(jax.random.PRNGKey(0), cfg, optimizer,
                                objective='siglip')
    sharded, state2 = make_sharded_train_step(
        cfg, optimizer, mesh, state2, objective='siglip')
    s2, m2 = sharded(state2, batch, rng)

    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.log_temperature),
                               np.asarray(s2.log_temperature), atol=1e-6)

  def test_accumulation_runs_and_updates_bias(self, cfg):
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=50)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer,
                               objective='siglip')
    step = jax.jit(make_train_step(cfg, optimizer, accum_steps=2,
                                   objective='siglip'))
    batch = jax.tree.map(
        lambda x: x.reshape(2, 2, *x.shape[1:]), _batch(b=4))
    # Two steps: the warmup schedule makes step 0's learning rate zero.
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    new_state, metrics = step(new_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert not np.allclose(np.asarray(new_state.log_temperature),
                           np.asarray(state.log_temperature))

  @pytest.mark.slow
  def test_tp_step_runs_siglip(self, cfg):
    from videoprism_tpu.train.tp_train_step import make_tp_train_step

    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=50)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer,
                               objective='siglip')
    single = jax.jit(make_train_step(cfg, optimizer, objective='siglip'))
    batch = _batch(b=8)
    rng = jax.random.PRNGKey(3)
    _, m1 = single(state, batch, rng)

    mesh = mesh_lib.make_mesh(model_parallelism=2)
    state2 = create_train_state(jax.random.PRNGKey(0), cfg, optimizer,
                                objective='siglip')
    tp_step, state2 = make_tp_train_step(
        cfg, optimizer, mesh, state2, kernel_interpret=True,
        objective='siglip')
    _, m2 = tp_step(state2, batch, rng)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=2e-4)
