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
