"""Training checkpoint save/restore roundtrip (orbax-backed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import clip as vclip
from videoprism_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from videoprism_tpu.train.checkpointing import TrainCheckpointer

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
    num_temporal_layers=1, mlp_dim=16, num_auxiliary_layers=0,
    vocabulary_size=32, enable_causal_atten=True, num_unimodal_layers=1,
    norm_policy='pre', model_dim=8, num_heads=2, atten_logit_cap=50.0,
    scan=True)


class TestTrainCheckpointer:

  @pytest.mark.slow
  def test_save_restore_roundtrip(self, tmp_path):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(warmup_steps=1, total_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step_fn = jax.jit(make_train_step(cfg, optimizer))
    batch = {
        'video': jnp.zeros((2, 2, 12, 12, 3)),
        'text_token_ids': jnp.zeros((2, 4), jnp.int32),
        'text_paddings': jnp.zeros((2, 4)),
    }
    state, _ = step_fn(state, batch, jax.random.PRNGKey(1))

    ckpt = TrainCheckpointer(str(tmp_path / 'ckpts'), async_save=False)
    assert ckpt.latest_step() is None
    assert ckpt.restore_latest(state) is None
    ckpt.save(int(state.step), state)
    ckpt.wait()
    assert ckpt.latest_step() == 1

    template = create_train_state(jax.random.PRNGKey(9), cfg, optimizer)
    restored = ckpt.restore_latest(template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()

  def test_maybe_save_cadence(self, tmp_path):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(warmup_steps=1, total_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    ckpt = TrainCheckpointer(str(tmp_path / 'c2'), async_save=False)
    assert not ckpt.maybe_save(3, state, every=2)
    assert ckpt.maybe_save(4, state, every=2)
    ckpt.wait()
    assert ckpt.latest_step() == 4
    ckpt.close()

  @pytest.mark.slow
  def test_cross_mesh_restore(self, tmp_path):
    """Save on a (4,2) TP+DP mesh, restore into an (8,1) pure-DP layout:
    orbax reshards to the template's shardings and values are identical
    (the elastic-resize path claimed by TrainCheckpointer.restore)."""
    from videoprism_tpu.parallel import mesh as mesh_lib
    from videoprism_tpu.train import make_sharded_train_step

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(warmup_steps=1, total_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)

    mesh_a = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    step_a, state_a = make_sharded_train_step(cfg, optimizer, mesh_a, state)
    batch = {
        'video': jnp.ones((8, 2, 12, 12, 3)) * 0.5,
        'text_token_ids': jnp.ones((8, 4), jnp.int32),
        'text_paddings': jnp.zeros((8, 4)),
    }
    state_a, _ = step_a(state_a, batch, jax.random.PRNGKey(1))
    expected = jax.device_get(state_a)

    ckpt = TrainCheckpointer(str(tmp_path / 'xmesh'), async_save=False)
    ckpt.save(int(state_a.step), state_a)
    ckpt.wait()

    # Template on a different mesh shape: 8-way data parallel.
    mesh_b = mesh_lib.make_mesh(model_parallelism=1)  # (8, 1)
    template = create_train_state(jax.random.PRNGKey(9), cfg, optimizer)
    _, template = make_sharded_train_step(cfg, optimizer, mesh_b, template)
    restored = ckpt.restore_latest(template)
    ckpt.close()

    assert int(restored.step) == 1
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(expected),
        jax.tree_util.tree_leaves_with_path(restored)):
      assert pa == pb
      np.testing.assert_array_equal(
          np.asarray(a), np.asarray(b),
          err_msg=jax.tree_util.keystr(pa))
    # Restored leaves actually carry mesh_b's sharding (not mesh_a's).
    q = restored.params['vision_encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']['self_attention']['query']['w']
    assert q.sharding.mesh.shape == {'data': 8, 'model': 1}
