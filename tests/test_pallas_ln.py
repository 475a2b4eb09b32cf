"""Fused Pallas LayerNorm vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.ops import basic


class TestFusedLayerNorm:

  @pytest.mark.parametrize('shape', [(64, 128), (2, 16, 256), (8, 3, 7, 128)])
  def test_matches_xla(self, shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    d = shape[-1]
    params = {'scale': jnp.linspace(-0.5, 0.5, d),
              'bias': jnp.linspace(0.2, -0.2, d)}
    ref = basic.layer_norm(params, x, impl='xla')
    got = basic.layer_norm(params, x, impl='pallas')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

  def test_direct_scale(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 128))
    params = {'scale': jnp.linspace(0.5, 1.5, 128),
              'bias': jnp.zeros(128)}
    ref = basic.layer_norm(params, x, impl='xla', direct_scale=True)
    got = basic.layer_norm(params, x, impl='pallas', direct_scale=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

  def test_unsupported_shapes_fall_back(self):
    # D not a lane multiple: silently uses the XLA path, same result.
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 100))
    params = {'scale': jnp.zeros(100), 'bias': jnp.zeros(100)}
    ref = basic.layer_norm(params, x, impl='xla')
    got = basic.layer_norm(params, x, impl='auto')
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
