"""Fused inter-stack boundary kernels (LN + regroup + pos-emb) vs the
composed encoder glue (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from videoprism_tpu.ops import basic
from videoprism_tpu.ops.pallas import boundary

B, T, N, D = 2, 4, 16, 128


def _ln_params(key):
  return {'scale': jax.random.normal(key, (D,)) * 0.1,
          'bias': jax.random.normal(jax.random.fold_in(key, 1), (D,)) * 0.1}


class TestBoundaryKernels:

  def test_spatial_to_temporal_matches_composed(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (B * T, N, D))
    p = _ln_params(jax.random.PRNGKey(1))
    pos = jax.random.normal(jax.random.PRNGKey(2), (T, D)) * 0.02

    ref = basic.layer_norm(p, x, impl='xla')
    ref = ref.reshape(B, T, N, D).transpose(0, 2, 1, 3).reshape(B * N, T, D)
    ref = ref + pos

    got = boundary.spatial_to_temporal(
        x, p['scale'], p['bias'], pos, b=B, t=T, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

  def test_temporal_to_output_matches_composed(self):
    x = jax.random.normal(jax.random.PRNGKey(3), (B * N, T, D))
    p = _ln_params(jax.random.PRNGKey(4))

    ref = basic.layer_norm(p, x, impl='xla')
    ref = ref.reshape(B, N, T, D).transpose(0, 2, 1, 3).reshape(B, T * N, D)

    got = boundary.temporal_to_output(
        x, p['scale'], p['bias'], b=B, n=N, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

  def test_gradients_match_composed(self):
    x = jax.random.normal(jax.random.PRNGKey(5), (B * T, N, D))
    p = _ln_params(jax.random.PRNGKey(6))
    pos = jax.random.normal(jax.random.PRNGKey(7), (T, D)) * 0.02

    st = boundary.spatial_to_temporal_vjp(B, T, interpret=True)
    loss_k = lambda a: jnp.sum(jnp.square(st(*a)))
    loss_c = lambda a: jnp.sum(jnp.square(boundary._composed_st(
        *a, b=B, t=T, epsilon=1e-6)))
    args = (x, p['scale'], p['bias'], pos)
    gk = jax.grad(loss_k)(args)
    gc = jax.grad(loss_c)(args)
    for a, b_ in zip(gk, gc):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)

  def test_encoder_flash_path_matches_xla(self):
    """Full factorized encoder: the fused-boundary flash path == the
    composed xla path (the parity configuration) at fp32."""
    import dataclasses

    from videoprism_tpu.models import factorized_encoder as fe
    from videoprism_tpu.models import init as init_lib

    cfg = fe.FactorizedEncoderConfig(
        patch_size=18, pos_emb_shape=(4, 4, 4), model_dim=D,
        num_spatial_layers=1, num_temporal_layers=1, num_heads=2,
        mlp_dim=256, atten_logit_cap=50.0)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(8), cfg)
    video = jax.random.normal(jax.random.PRNGKey(9), (B, T, 72, 72, 3))

    ref, _ = fe.apply(params, video, cfg)
    fused_cfg = dataclasses.replace(
        cfg, attention_impl='flash', kernel_interpret=True)
    got, _ = fe.apply(params, video, fused_cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

  def test_supported_predicate(self):
    assert boundary.boundary_supported(256, 16, 768, 2)   # base
    assert boundary.boundary_supported(256, 8, 1408, 2)   # giant
    assert not boundary.boundary_supported(255, 16, 768, 2)  # unblockable N
    assert not boundary.boundary_supported(256, 16, 772, 2)  # D % 128
