"""Offline GSPMD collective assertions (parallel/hlo_checks.py).

The classic tensor-parallel regression — XLA silently re-materializing
a model-sharded weight with a full-shape all-gather in every step —
is invisible to correctness tests and only shows up when someone
profiles a pod.  These tests compile the REAL TP serving forward and
TP+DP train step over the 8-device virtual mesh and assert on the
optimized HLO that no full-parameter all-gather exists (VERDICT r4
next-round #6, the offline half of pod readiness)."""

import jax
import jax.numpy as jnp
import pytest

from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.parallel import hlo_checks
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import sharding as shard_lib
from videoprism_tpu.train import (
    create_train_state,
    make_optimizer,
    make_sharded_train_step,
)

# Distinct dims so no activation shape can coincide with a weight shape.
TINY_ENC = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=32,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=4, mlp_dim=96,
    atten_logit_cap=50.0, scan=True)
TINY_CLIP = dict(
    **TINY_ENC, num_auxiliary_layers=1, enable_causal_atten=True,
    num_unimodal_layers=2, norm_policy='pre', vocabulary_size=128)


class TestDetector:

  def test_positive_control_finds_full_param_gather(self):
    """A deliberately replicated output of a sharded input IS a
    full-parameter all-gather — the detector must flag it."""
    mesh = mesh_lib.make_mesh(model_parallelism=8)
    from jax.sharding import NamedSharding, PartitionSpec

    w = jnp.zeros((64, 96))
    sharded = NamedSharding(mesh, PartitionSpec(None, 'model'))
    replicated = NamedSharding(mesh, PartitionSpec())
    compiled = (
        jax.jit(lambda p: p * 2.0, in_shardings=(sharded,),
                out_shardings=replicated)
        .lower(jax.ShapeDtypeStruct((64, 96), jnp.float32))
        .compile())
    params = {'w': w}
    bad = hlo_checks.full_param_allgathers(compiled, params)
    assert (64, 96) in bad
    with pytest.raises(AssertionError, match='all-gather'):
      hlo_checks.assert_no_full_param_allgather(compiled, params)

  def test_shape_parser_on_hlo_fragments(self):
    text = (
        '%ag.1 = f32[8,256,1024]{2,1,0} all-gather(f32[8,256,128]{2,1,0} '
        '%x), replica_groups={}\n'
        '%ags = (f32[4,8]{1,0}, f32[4,8]{1,0}) all-gather-start(...)\n'
        '%other = f32[2,2]{1,0} add(...)\n')
    got = hlo_checks.allgather_result_shapes(text)
    assert (8, 256, 1024) in got and (4, 8) in got
    assert (2, 2) not in got


class TestProductionPrograms:

  def test_tp_serving_forward_has_no_full_param_allgather(self):
    """GSPMD TP inference: model-sharded params must STAY sharded —
    communication is activation-sized (all-reduce/reduce-scatter after
    the contractions), never a weight gather."""
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
    pshard = shard_lib.param_shardings(params, mesh)
    data = mesh_lib.data_sharding(mesh, ndim=5)

    def forward(p, video):
      return fe.apply(p, video, cfg, train=False)[0]

    compiled = (
        jax.jit(forward, in_shardings=(pshard, data))
        .lower(params, jnp.zeros((4, 2, 12, 12, 3), jnp.float32))
        .compile())
    hlo_checks.assert_no_full_param_allgather(
        compiled, params, what='TP serving forward')
    # Sanity: the TP program actually communicates.
    summary = hlo_checks.collective_summary(compiled)
    assert summary, 'TP forward compiled with NO collectives?'

  def test_tp_dp_train_step_has_no_full_param_allgather(self):
    """The full GSPMD CLIP train step (TP params + DP batch + remat
    scan): forward, backward, and optimizer must never gather a full
    parameter — grads of sharded weights stay sharded."""
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step, sharded_state = make_sharded_train_step(cfg, optimizer, mesh,
                                                  state)
    rng = jax.random.PRNGKey(0)
    batch = {
        'video': jnp.zeros((8, 2, 12, 12, 3), jnp.float32),
        'text_token_ids': jnp.zeros((8, 4), jnp.int32),
        'text_paddings': jnp.zeros((8, 4), jnp.float32),
    }
    compiled = step.lower(sharded_state, batch, rng).compile()
    hlo_checks.assert_no_full_param_allgather(
        compiled, state.params, what='TP+DP train step')
    summary = hlo_checks.collective_summary(compiled)
    assert summary.get('all-reduce') or summary.get('reduce-scatter')

  def test_fsdp_step_gathers_params_by_design(self):
    """Contrast case: ZeRO-3 DOES all-gather full params around compute
    (that is the design — 1/dp resident, gather transiently).  The
    detector must see them, proving it reads real programs, and the
    assertion is meaningful only for the TP paths."""
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=10)
    state = create_train_state(jax.random.PRNGKey(1), cfg, optimizer)
    step, sharded_state = make_sharded_train_step(
        cfg, optimizer, mesh, state, fsdp=True, fsdp_min_size=0)
    batch = {
        'video': jnp.zeros((8, 2, 12, 12, 3), jnp.float32),
        'text_token_ids': jnp.zeros((8, 4), jnp.int32),
        'text_paddings': jnp.zeros((8, 4), jnp.float32),
    }
    compiled = step.lower(sharded_state, batch,
                          jax.random.PRNGKey(0)).compile()
    bad = hlo_checks.full_param_allgathers(compiled, state.params)
    assert bad, 'FSDP step compiled with no parameter all-gathers?'
