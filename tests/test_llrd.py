"""Layer-wise learning-rate decay (train/llrd.py): depth factors over
the scan-stacked tree, update scaling, trainer integration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.train import llrd, make_optimizer
from videoprism_tpu.train.classifier_train_step import (
    create_classifier_train_state,
    make_classifier_train_step,
)

N_SP, N_TMP = 3, 2


@pytest.fixture(scope='module')
def setup():
  cfg = vc.VideoClassifierConfig(
      encoder=fe.FactorizedEncoderConfig(
          patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
          num_spatial_layers=N_SP, num_temporal_layers=N_TMP, num_heads=2,
          mlp_dim=32, atten_logit_cap=50.0, scan=True),
      num_classes=4)
  params = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
  return cfg, params


class TestFactors:

  def test_depth_map(self, setup):
    cfg, params = setup
    d = 0.5
    f = llrd.layer_decay_factors(params, cfg, d)
    # Head at full rate.
    assert f['atten_pooler']['pooling_attention']['query']['w'] == 1.0
    assert f['projection']['linear']['kernel'] == 1.0
    assert f['encoder']['temporal_ln']['scale'] == 1.0
    # Temporal stack: layer i gets d^(n_tmp - i), as a [L,1,...] column.
    tcol = np.asarray(f['encoder']['temporal_encoder'][
        'transformers_stack']['x_layers']['self_attention']['query']['w'])
    assert tcol.shape == (N_TMP, 1, 1, 1)
    np.testing.assert_allclose(tcol.ravel(), [d ** 2, d ** 1])
    # Spatial stack below it.
    scol = np.asarray(f['encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']['ff_layer']['ffn_layer1'][
            'linear']['kernel'])
    assert scol.shape == (N_SP, 1, 1)
    np.testing.assert_allclose(scol.ravel(), [d ** 5, d ** 4, d ** 3])
    # Stack boundary and embedding tier.
    assert f['encoder']['spatial_ln']['scale'] == d ** N_TMP
    assert f['encoder']['patch_projection']['linear']['kernel'] == d ** 6
    assert f['encoder']['spatial_pos_emb']['emb_var'] == d ** 6

  def test_structure_matches_params(self, setup):
    cfg, params = setup
    f = llrd.layer_decay_factors(params, cfg, 0.9)
    assert (jax.tree.structure(f, is_leaf=lambda x: not isinstance(x, dict))
            == jax.tree.structure(
                params, is_leaf=lambda x: not isinstance(x, dict)))

  def test_decay_one_is_identity(self, setup):
    cfg, params = setup
    f = llrd.layer_decay_factors(params, cfg, 1.0)
    assert all(np.all(np.asarray(x) == 1.0) for x in jax.tree.leaves(f))

  def test_bad_decay_rejected(self, setup):
    cfg, params = setup
    with pytest.raises(ValueError, match='decay'):
      llrd.layer_decay_factors(params, cfg, 0.0)
    with pytest.raises(ValueError, match='decay'):
      llrd.layer_decay_factors(params, cfg, 1.5)


class TestTransform:

  def test_scales_sgd_updates_exactly(self, setup):
    cfg, params = setup
    d = 0.5
    opt = optax.chain(optax.sgd(1.0), llrd.scale_by_layer_decay(
        params, cfg, d))
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    factors = llrd.layer_decay_factors(params, cfg, d)
    want = jax.tree.map(lambda g, f: -g * f, grads, factors)
    for got, expect in zip(jax.tree.leaves(updates),
                           jax.tree.leaves(want)):
      np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                 rtol=1e-6)

  def test_trainer_step_with_llrd(self, setup):
    """AdamW + LLRD as the last chain link: per-layer step magnitudes
    follow the depth factors (AdamW normalizes gradient scale, so the
    update-norm ratio between stacked layers IS the factor ratio)."""
    cfg, params = setup
    optimizer = optax.chain(
        make_optimizer(learning_rate=1e-2, warmup_steps=0, total_steps=10,
                       schedule='constant', weight_decay=0.0),
        llrd.scale_by_layer_decay(params, cfg, 0.5))
    state = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg, optimizer,
        pretrained_params=params)
    step = jax.jit(make_classifier_train_step(cfg, optimizer))
    rng = np.random.default_rng(0)
    batch = {'video': jnp.asarray(rng.random((2, 2, 12, 12, 3)),
                                  jnp.float32),
             'label': jnp.asarray([1, 3])}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    before = params['encoder']['spatial_encoder']['transformers_stack'][
        'x_layers']['self_attention']['query']['w']
    after = new_state.params['encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']['self_attention']['query']['w']
    delta = np.abs(np.asarray(after) - np.asarray(before))
    per_layer = delta.reshape(N_SP, -1).mean(axis=1)
    # Bottom layer moved ~d^2 x less than the top spatial layer.
    assert per_layer[0] < per_layer[-1] * 0.5, per_layer
