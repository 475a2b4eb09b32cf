"""EMA-of-params tests (train/ema.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.train import ema as ema_lib


def _params(key=0):
  k = jax.random.PRNGKey(key)
  return {
      'a': {'w': jax.random.normal(k, (4, 8)),
            'b': jnp.ones((8,))},
      'scale': jnp.asarray(2.5),
  }


class TestEma:

  def test_update_matches_manual(self):
    decay = 0.9
    params = _params()
    update = ema_lib.make_ema_update(decay)
    state = ema_lib.init_ema(params)
    for t in range(1, 4):
      state = update(state, params)
      assert int(state.count) == t
    manual = jax.tree.map(
        lambda p: (1 - decay ** 3) * p, params)  # geometric series from 0
    jax.tree.map(
        lambda e, m: np.testing.assert_allclose(e, m, rtol=1e-6),
        state.ema, manual)

  def test_bias_correction_exact_after_one_step(self):
    """From a zero accumulator, debiased EMA == params after one update."""
    decay = 0.999
    params = _params()
    state = ema_lib.make_ema_update(decay)(ema_lib.init_ema(params), params)
    # fp32 rounding of (1 - decay) vs (1 - decay**1) leaves ~1e-5 relative.
    jax.tree.map(
        lambda c, p: np.testing.assert_allclose(c, p, rtol=1e-4),
        ema_lib.ema_params(state, decay), params)

  def test_tracks_moving_params(self):
    """The EMA lags a drifting param and converges when the drift stops."""
    decay = 0.5
    update = ema_lib.make_ema_update(decay)
    p = {'w': jnp.zeros((3,))}
    state = ema_lib.init_ema(p)
    target = {'w': jnp.full((3,), 7.0)}
    for _ in range(20):
      state = update(state, target)
    np.testing.assert_allclose(
        np.asarray(ema_lib.ema_params(state, decay)['w']),
        np.asarray(target['w']), rtol=1e-4)

  def test_dtype_and_structure_preserved(self):
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), _params())
    state = ema_lib.make_ema_update(0.99)(ema_lib.init_ema(params), params)
    assert jax.tree.structure(state.ema) == jax.tree.structure(params)
    for leaf in jax.tree.leaves(state.ema):
      assert leaf.dtype == jnp.bfloat16

  def test_invalid_decay(self):
    with pytest.raises(ValueError, match='decay'):
      ema_lib.make_ema_update(1.0)
    with pytest.raises(ValueError, match='decay'):
      ema_lib.make_ema_update(0.0)

  def test_sharding_preserved_on_mesh(self):
    """EMA leaves inherit the params' sharded layout (FSDP-compatible)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from videoprism_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    sh = NamedSharding(mesh, PartitionSpec('data'))
    params = {'w': jax.device_put(jnp.arange(16, dtype=jnp.float32), sh)}
    state = ema_lib.init_ema(params)
    state = ema_lib.make_ema_update(0.9)(state, params)
    assert state.ema['w'].sharding.is_equivalent_to(sh, 1)
