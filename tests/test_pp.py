"""Pipeline-parallelism tests on the 8-device virtual CPU mesh.

`parallel/pp.py` shards a stacked transformer's LAYERS over the model mesh
axis (GPipe fill-and-drain, ppermute hand-offs).  These tests pin the
pipelined stack to `stacked_transformer`'s single-device math: plain and
causal/padded forwards, gradients through the schedule's collectives, the
flash kernel inside a stage, and the divisibility/layout guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import init as init_lib
from videoprism_tpu.ops.transformer import (
    TransformerLayerConfig,
    stacked_transformer,
)
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import pp as pp_lib


def _cfg(num_layers=4, **overrides):
  base = dict(
      num_layers=num_layers, hidden_dim=32, num_heads=2,
      norm_policy='pre', activation='gelu', enable_per_dim_scale=False,
      logit_cap=50.0, scan=True, dtype=jnp.float32)
  return TransformerLayerConfig(**{**base, **overrides})


def _params(cfg, d=16, seed=0):
  return init_lib._stacked_transformer(jax.random.PRNGKey(seed), d, cfg)


class TestPPForward:

  @pytest.mark.parametrize('model_parallelism', [2, 4])
  def test_matches_single_device(self, model_parallelism):
    cfg = _cfg(num_layers=4)
    mesh = mesh_lib.make_mesh(model_parallelism=model_parallelism)
    params = _params(cfg)
    b, t, d = 8, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = jnp.zeros((b, t))

    fwd = pp_lib.make_pp_stack_forward(params, cfg, mesh, n_microbatches=2)
    got = fwd(params, x, paddings)
    want = stacked_transformer(params, x, paddings, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

  def test_causal_with_paddings(self):
    """Text-tower-like stack: causal mask + real paddings per microbatch."""
    cfg = _cfg(num_layers=4, enable_causal_atten=True, activation='relu')
    mesh = mesh_lib.make_mesh(model_parallelism=4)  # (2, 4)
    params = _params(cfg)
    b, t, d = 4, 6, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = (jax.random.uniform(jax.random.PRNGKey(2), (b, t))
                > 0.6).astype(jnp.float32)

    fwd = pp_lib.make_pp_stack_forward(params, cfg, mesh, n_microbatches=2)
    got = fwd(params, x, paddings)
    want = stacked_transformer(params, x, paddings, cfg)
    # Padded rows may differ (garbage in = garbage out); compare real rows.
    keep = (1.0 - paddings)[..., None]
    np.testing.assert_allclose(np.asarray(got * keep),
                               np.asarray(want * keep),
                               atol=1e-5, rtol=1e-5)

  def test_flash_kernel_in_stage(self):
    cfg = _cfg(num_layers=2, attention_impl='flash', kernel_interpret=True)
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    params = _params(cfg)
    b, t, d = 4, 128, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = jnp.zeros((b, t))

    fwd = pp_lib.make_pp_stack_forward(
        params, cfg, mesh, n_microbatches=1, kernel_interpret=True)
    got = fwd(params, x, paddings)
    want = stacked_transformer(
        params, x, paddings,
        TransformerLayerConfig(**{
            **cfg.__dict__, 'attention_impl': 'xla',
            'kernel_interpret': False}))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

  def test_single_stage_degenerates(self):
    cfg = _cfg(num_layers=2)
    mesh = mesh_lib.make_mesh(model_parallelism=1)  # (8, 1)
    params = _params(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 16))
    paddings = jnp.zeros((8, 4))
    fwd = pp_lib.make_pp_stack_forward(params, cfg, mesh, n_microbatches=1)
    got = fwd(params, x, paddings)
    want = stacked_transformer(params, x, paddings, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


class TestPPGradients:

  def test_param_and_input_grads_match(self):
    """Backward through the fill-and-drain schedule: scan + ppermute
    transposes reproduce the single-device gradients."""
    cfg = _cfg(num_layers=4)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    params = _params(cfg)
    b, t, d = 8, 4, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = jnp.zeros((b, t))
    probe = jax.random.normal(jax.random.PRNGKey(2), (b, t, d))

    fwd = pp_lib.make_pp_stack_forward(params, cfg, mesh, n_microbatches=2)

    def pp_loss(p, xx):
      return jnp.sum(fwd(p, xx, paddings) * probe)

    def ref_loss(p, xx):
      return jnp.sum(stacked_transformer(p, xx, paddings, cfg) * probe)

    g_pp = jax.grad(pp_loss, argnums=(0, 1))(params, x)
    g_ref = jax.grad(ref_loss, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g_pp[1]), np.asarray(g_ref[1]),
                               atol=1e-5, rtol=1e-4)
    for a, b_ in zip(jax.tree.leaves(g_pp[0]), jax.tree.leaves(g_ref[0])):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                 atol=1e-5, rtol=1e-4)


class TestPPGuards:

  def test_guards(self):
    mesh = mesh_lib.make_mesh(model_parallelism=4)
    with pytest.raises(NotImplementedError):
      pp_lib.make_pp_stack_forward(
          {}, _cfg(scan=False), mesh, n_microbatches=2)
    with pytest.raises(ValueError):  # 6 layers over 4 stages
      pp_lib.make_pp_stack_forward(
          {}, _cfg(num_layers=6), mesh, n_microbatches=2)
    with pytest.raises(ValueError):  # tp_axis rejected at the low level
      pp_lib._validate_pp_cfg(_cfg(tp_axis='model'), 2)

  def test_microbatch_divisibility(self):
    cfg = _cfg(num_layers=2)
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # data=4
    params = _params(cfg)
    x = jnp.zeros((4, 4, 16))  # per-shard batch 1, m=3 -> indivisible
    with pytest.raises(ValueError):
      pp_lib.make_pp_stack_forward(params, cfg, mesh, n_microbatches=3)(
          params, x, jnp.zeros((4, 4)))


class TestPPInt8:

  def test_int8_tree_via_dequant_fallback(self):
    """PP stages run transformer_layer, whose int8 dispatch handles
    quantized stacked weights (dequantize-and-compose off-TPU)."""
    from videoprism_tpu import quantization

    cfg = _cfg(num_layers=4)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    params = _params(cfg)
    q_params = {'x_layers': quantization.quantize_for_serving(
        params['x_layers'])}
    b, t, d = 8, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    paddings = jnp.zeros((b, t))

    fwd = pp_lib.make_pp_stack_forward(q_params, cfg, mesh, n_microbatches=2)
    got = np.asarray(fwd(q_params, x, paddings), np.float32)
    want = np.asarray(stacked_transformer(
        {'x_layers': quantization.dequantize(
            q_params['x_layers'], jnp.float32)},
        x, paddings, cfg), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


class TestPPEncoder:

  def _enc_cfg(self, spatial=4):
    from videoprism_tpu.models import factorized_encoder as fe

    return fe.FactorizedEncoderConfig(
        patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
        num_spatial_layers=spatial, num_temporal_layers=1, num_heads=2,
        mlp_dim=32, atten_logit_cap=50.0, scan=True)

  @pytest.mark.parametrize('model_parallelism', [2, 4])
  def test_full_encoder_matches(self, model_parallelism):
    from videoprism_tpu.models import factorized_encoder as fe

    cfg = self._enc_cfg()
    mesh = mesh_lib.make_mesh(model_parallelism=model_parallelism)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
    video = jax.random.uniform(jax.random.PRNGKey(1), (8, 2, 12, 12, 3))

    fwd, sharded = pp_lib.make_pp_encoder_forward(
        params, cfg, mesh, n_microbatches=2)
    got = fwd(sharded, video)
    want, _ = fe.apply(params, video, cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

  def test_stage_weight_sharding(self):
    """Each stage holds only L/S spatial layers (the PP memory win)."""
    cfg = self._enc_cfg(spatial=4)
    mesh = mesh_lib.make_mesh(model_parallelism=4)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
    _, sharded = pp_lib.make_pp_encoder_forward(
        params, cfg, mesh, n_microbatches=2)
    leaf = sharded['spatial_encoder']['transformers_stack'][
        'x_layers']['self_attention']['query']['w']
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert shard_shapes == {(1,) + leaf.shape[1:]}  # 4 layers / 4 stages
    # Non-stack leaves replicated.
    pos = sharded['spatial_pos_emb']['emb_var']
    assert all(s.data.shape == pos.shape for s in pos.addressable_shards)

  def test_layer_divisibility_guard(self):
    cfg = self._enc_cfg(spatial=3)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
      pp_lib.make_pp_encoder_forward(params, cfg, mesh, n_microbatches=2)
