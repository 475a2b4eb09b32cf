"""Optimizer breadth: make_optimizer's adafactor / lion / sgd rules.

Each rule must (a) build and step the tiny CLIP train state, (b) carry
the documented state-memory shape (adafactor's factored vectors, lion's
single moment, sgd's momentum-only), and (c) compose with the GSPMD
sharded train step on the 8-device mesh — the structural
_opt_state_shardings walk must keep working for every state pytree.
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

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
    num_temporal_layers=1, mlp_dim=32, num_auxiliary_layers=1,
    vocabulary_size=64, enable_causal_atten=True, num_unimodal_layers=2,
    norm_policy='pre', model_dim=16, num_heads=2, atten_logit_cap=50.0,
    scan=True)


def _batch(b=4, t=2, hw=12, seq=4):
  k = jax.random.PRNGKey(0)
  return {
      'video': jax.random.uniform(k, (b, t, hw, hw, 3)),
      'text_token_ids': jax.random.randint(k, (b, seq), 0, 64),
      'text_paddings': jnp.zeros((b, seq)),
  }


def _leaf_arrays(tree):
  return [x for x in jax.tree.leaves(tree) if hasattr(x, 'shape')]


@pytest.mark.parametrize('name', ['adamw', 'adafactor', 'lion', 'sgd'])
def test_each_rule_steps_and_moves_params(name):
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=10,
                       optimizer=name)
  state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
  step = jax.jit(make_train_step(cfg, opt))
  before = jax.tree.map(np.asarray, state.params)
  batch = _batch()
  for i in range(2):
    state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
  assert np.isfinite(float(metrics['loss']))
  moved = jax.tree.leaves(jax.tree.map(
      lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
      state.params, before))
  assert max(moved) > 0


def test_adafactor_state_is_factored():
  # The point of adafactor: 2-D params carry O(rows+cols) second-moment
  # state, not O(rows*cols) — nothing in the state may mirror a large
  # matrix except where factoring is off (1-D leaves).
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  adafactor = make_optimizer(optimizer='adafactor', warmup_steps=1,
                             total_steps=10)
  adamw = make_optimizer(optimizer='adamw', warmup_steps=1, total_steps=10)
  s_f = create_train_state(jax.random.PRNGKey(0), cfg, adafactor)
  s_a = create_train_state(jax.random.PRNGKey(0), cfg, adamw)
  bytes_f = sum(x.size * x.dtype.itemsize
                for x in _leaf_arrays(s_f.opt_state))
  bytes_a = sum(x.size * x.dtype.itemsize
                for x in _leaf_arrays(s_a.opt_state))
  # At tiny widths factoring only kicks in above min_dim_size_to_factor;
  # the contract here is structural: adafactor's state must be strictly
  # smaller than AdamW's two full moments.
  assert bytes_f < bytes_a


def test_lion_and_sgd_state_sizes():
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  param_bytes = sum(
      x.size * x.dtype.itemsize
      for x in _leaf_arrays(create_train_state(
          jax.random.PRNGKey(0), cfg,
          make_optimizer(optimizer='sgd', warmup_steps=1,
                         total_steps=10)).params))
  for name, max_factor in (('lion', 1.1), ('sgd', 1.1)):
    opt = make_optimizer(optimizer=name, warmup_steps=1, total_steps=10)
    st = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    opt_bytes = sum(x.size * x.dtype.itemsize
                    for x in _leaf_arrays(st.opt_state))
    # one moment tree (+ trivial scalars/schedule counts)
    assert opt_bytes < max_factor * param_bytes, (name, opt_bytes)


@pytest.mark.parametrize('name', ['adafactor', 'lion'])
def test_sharded_step_composes(name):
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=10,
                       optimizer=name)
  state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
  mesh = mesh_lib.make_mesh(2)
  step, sharded = make_sharded_train_step(cfg, opt, mesh, state)
  batch = _batch(b=8)
  sharded, metrics = step(sharded, batch, jax.random.PRNGKey(1))
  # Parity with the unsharded step.
  ref_step = jax.jit(make_train_step(cfg, opt))
  ref = create_train_state(jax.random.PRNGKey(0), cfg, opt)
  ref, ref_metrics = ref_step(ref, batch, jax.random.PRNGKey(1))
  assert np.isclose(float(metrics['loss']), float(ref_metrics['loss']),
                    atol=1e-5)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=3e-5),
      sharded.params, ref.params)


def test_unknown_optimizer_rejected():
  with pytest.raises(ValueError, match='unknown optimizer'):
    make_optimizer(optimizer='adamax')
