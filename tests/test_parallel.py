"""Multi-device mesh/sharding/training tests on an 8-device virtual CPU mesh.

What the reference never had (SURVEY.md §2.7): real GSPMD partitioning tests
— tensor-parallel param layouts, data-parallel batch sharding, and a full
sharded CLIP train step, all executed over 8 XLA host devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec

from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import sharding as shard_lib
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


def _batch(b=8, t=2, hw=12, seq=4):
  k = jax.random.PRNGKey(0)
  return {
      'video': jax.random.uniform(k, (b, t, hw, hw, 3)),
      'text_token_ids': jax.random.randint(k, (b, seq), 0, 64),
      'text_paddings': jnp.zeros((b, seq)),
  }


class TestMesh:

  def test_make_mesh_shapes(self):
    assert len(jax.devices()) == 8, 'conftest must force 8 host devices'
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    assert mesh.shape == {'data': 4, 'model': 2}
    mesh = mesh_lib.make_mesh(model_parallelism=1)
    assert mesh.shape == {'data': 8, 'model': 1}
    with pytest.raises(ValueError):
      mesh_lib.make_mesh(model_parallelism=3)

  def test_local_batch(self):
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    assert mesh_lib.local_batch_size(mesh, 16) == 4
    with pytest.raises(ValueError):
      mesh_lib.local_batch_size(mesh, 6)


class TestParamShardings:

  def test_partition_specs(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    specs = shard_lib.param_partition_specs(params)

    stack = specs['vision_encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']
    # Stacked (leading layer axis) attention weights: heads sharded.
    assert stack['self_attention']['query']['w'] == PartitionSpec(
        None, None, 'model', None)
    assert stack['self_attention']['post']['w'] == PartitionSpec(
        None, None, 'model', None)
    assert stack['self_attention']['post']['b'] == PartitionSpec()
    # MLP hidden sharded.
    assert stack['ff_layer']['ffn_layer1']['linear']['kernel'] == (
        PartitionSpec(None, None, 'model'))
    assert stack['ff_layer']['ffn_layer2']['linear']['kernel'] == (
        PartitionSpec(None, 'model', None))
    # LN replicated.
    assert stack['layer_norm']['scale'] == PartitionSpec()
    # Vocab sharded.
    assert specs['text_encoder']['token_emb']['emb_var'] == (
        PartitionSpec('model', None))

  def test_sharded_forward_matches_single_device(self):
    """TP+DP sharded CLIP forward == unsharded forward."""
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    batch = _batch()

    ref_v, ref_t, _ = vclip.apply(
        params, batch['video'], batch['text_token_ids'],
        batch['text_paddings'], cfg)

    mesh = mesh_lib.make_mesh(model_parallelism=2)
    sharded_params = shard_lib.shard_params(params, mesh)
    data_sh = lambda ndim: NamedSharding(
        mesh, PartitionSpec('data', *([None] * (ndim - 1))))
    sharded_batch = {
        'video': jax.device_put(batch['video'], data_sh(5)),
        'text_token_ids': jax.device_put(batch['text_token_ids'], data_sh(2)),
        'text_paddings': jax.device_put(batch['text_paddings'], data_sh(2)),
    }

    fwd = jax.jit(lambda p, b: vclip.apply(
        p, b['video'], b['text_token_ids'], b['text_paddings'], cfg)[:2])
    with mesh:
      got_v, got_t = fwd(sharded_params, sharded_batch)

    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               atol=2e-5)


class TestFSDP:
  """ZeRO-3 via GSPMD: params + optimizer moments sharded over ``data``."""

  def test_spec_augmentation(self):
    from videoprism_tpu.parallel import fsdp as fsdp_lib

    # Stacked attention w [L, D, N, H], heads on model -> D gets data
    # (leading layer axis excluded).
    spec = fsdp_lib.add_fsdp_axis(
        PartitionSpec(None, None, 'model', None), (12, 768, 12, 64), 4,
        min_size=0, skip_leading=True)
    assert spec == PartitionSpec(None, 'data', 'model', None)
    # MLP kernel [L, D, F] with F on model -> D gets data.
    spec = fsdp_lib.add_fsdp_axis(
        PartitionSpec(None, None, 'model'), (12, 768, 3072), 4,
        min_size=0, skip_leading=True)
    assert spec == PartitionSpec(None, 'data', 'model')
    # Non-divisible dims stay replicated.
    spec = fsdp_lib.add_fsdp_axis(PartitionSpec(), (7, 5), 4, min_size=0)
    assert spec == PartitionSpec()
    # Below min_size: untouched.
    spec = fsdp_lib.add_fsdp_axis(PartitionSpec(), (16,), 4, min_size=64)
    assert spec == PartitionSpec()
    # Ties prefer the later axis; unstacked leading axis is eligible.
    spec = fsdp_lib.add_fsdp_axis(PartitionSpec(), (256, 256), 4, min_size=0)
    assert spec == PartitionSpec(None, 'data')

  def test_fsdp_specs_cover_tree(self):
    from videoprism_tpu.parallel import fsdp as fsdp_lib

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    specs = fsdp_lib.fsdp_partition_specs(params, 4, min_size=0)
    stack = specs['vision_encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']
    # TP head split preserved, D additionally on data, layer axis intact.
    assert stack['self_attention']['query']['w'] == PartitionSpec(
        None, 'data', 'model', None)
    # LN scale [L, D]: D on data (no TP spec to compose with).
    assert stack['layer_norm']['scale'] == PartitionSpec(None, 'data')

  @pytest.mark.parametrize('model_parallelism', [1, 2])
  def test_fsdp_step_matches_unsharded(self, model_parallelism):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    mesh = mesh_lib.make_mesh(model_parallelism)
    step, fsdp_state = make_sharded_train_step(
        cfg, optimizer, mesh, state, fsdp=True, fsdp_min_size=0)

    batch = _batch(b=8)
    rng = jax.random.PRNGKey(1)
    fsdp_state, metrics = step(fsdp_state, batch, rng)

    ref_step = jax.jit(make_train_step(cfg, optimizer))
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    ref_state, ref_metrics = ref_step(ref_state, batch, rng)

    assert np.isclose(float(metrics['loss']), float(ref_metrics['loss']),
                      atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        fsdp_state.params, ref_state.params)

  def test_fsdp_actually_shards_state_memory(self):
    """Every large param leaf and its adam moments live at 1/(dp*tp) per
    device — the ZeRO-3 memory contract."""
    from videoprism_tpu.parallel import fsdp as fsdp_lib

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(warmup_steps=1, total_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (data=4, model=2)
    _, fsdp_state = make_sharded_train_step(
        cfg, optimizer, mesh, state, fsdp=True, fsdp_min_size=0)

    def shard_fraction(leaf):
      return leaf.addressable_shards[0].data.size / leaf.size

    w = fsdp_state.params['vision_encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']['self_attention']['query']['w']
    assert shard_fraction(w) == 1 / 8, w.sharding
    # Adam moments mirror the param layout (mu lives in opt_state[1][0]).
    mu_w = fsdp_state.opt_state[1][0].mu[0]['vision_encoder'][
        'spatial_encoder']['transformers_stack']['x_layers'][
        'self_attention']['query']['w']
    assert shard_fraction(mu_w) == 1 / 8, mu_w.sharding
    # Specs with no TP rule still shard over data.
    specs = fsdp_lib.fsdp_partition_specs(state.params, 4, min_size=0)
    pe = specs['vision_encoder']['spatial_pos_emb']['emb_var']
    assert 'data' in jax.tree.leaves(tuple(pe)), pe

  def test_fsdp_accum_step_matches_unsharded(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # microbatch 4 / data 4
    step, fsdp_state = make_sharded_train_step(
        cfg, optimizer, mesh, state, accum_steps=2, fsdp=True,
        fsdp_min_size=0)

    flat = _batch(b=8)
    mb_batch = {k: v.reshape(2, 4, *v.shape[1:]) for k, v in flat.items()}
    rng = jax.random.PRNGKey(1)
    fsdp_state, metrics = step(fsdp_state, mb_batch, rng)

    ref_step = jax.jit(make_train_step(cfg, optimizer, accum_steps=2))
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    ref_state, ref_metrics = ref_step(ref_state, mb_batch, rng)
    assert np.isclose(float(metrics['loss']), float(ref_metrics['loss']),
                      atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        fsdp_state.params, ref_state.params)


class TestManualTensorParallel:
  """shard_map TP that keeps the fused kernels (VERDICT round-1 item 2).

  Geometry chosen so the per-shard shapes stay kernel-eligible: D=256,
  4 heads x 64 -> 2 heads/shard = 128 lanes; MLP 512 -> 256/shard; 16
  spatial tokens pack to 128-row blocks.  Kernels run in interpret mode
  on the virtual CPU mesh.
  """

  CFG = dict(
      patch_size=6, pos_emb_shape=(2, 4, 4), model_dim=256,
      num_spatial_layers=2, num_temporal_layers=1, num_heads=4,
      mlp_dim=512, atten_logit_cap=50.0, scan=True)

  @pytest.fixture(scope='class')
  def setup(self):
    from videoprism_tpu.parallel import tp as tp_lib

    cfg = fe.FactorizedEncoderConfig(**self.CFG, attention_impl='flash')
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
    video = jax.random.uniform(jax.random.PRNGKey(1), (8, 2, 24, 24, 3))
    ref, _ = fe.apply(params, video, cfg, train=False)
    return tp_lib, cfg, params, video, np.asarray(ref)

  def test_tp_kernels_match_single_device(self, setup):
    tp_lib, cfg, params, video, ref = setup
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    fwd, sharded_params = tp_lib.make_tp_encoder_forward(
        params, cfg, mesh, kernel_interpret=True)
    got = np.asarray(fwd(sharded_params, video))
    np.testing.assert_allclose(got, ref, atol=2e-5)

  def test_tp_int8_matches_single_device(self, setup):
    """int8 + TP: scales shard with their weights, kernels run per-shard
    in partial-output mode.  Per-shard activation quantization sees
    different column subsets than single-device, so compare by cosine."""
    import dataclasses

    from videoprism_tpu import quantization as q

    tp_lib, cfg, params, video, ref = setup
    qp = q.quantize_for_serving(params)
    single, _ = fe.apply(
        qp, video, dataclasses.replace(cfg, kernel_interpret=True),
        train=False)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    fwd, sharded = tp_lib.make_tp_encoder_forward(
        qp, cfg, mesh, kernel_interpret=True)
    got = np.asarray(fwd(sharded, video)).astype(np.float32).ravel()

    for other in (np.asarray(single, np.float32).ravel(),
                  ref.astype(np.float32).ravel()):
      cos = float(np.dot(got, other)
                  / (np.linalg.norm(got) * np.linalg.norm(other)))
      assert cos > 0.995, cos

  def test_tp_xla_matches_single_device(self, setup):
    tp_lib, cfg, params, video, ref = setup
    import dataclasses
    cfg_xla = dataclasses.replace(cfg, attention_impl='xla')
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    fwd, sharded_params = tp_lib.make_tp_encoder_forward(
        params, cfg_xla, mesh, kernel_interpret=False)
    got = np.asarray(fwd(sharded_params, video))
    np.testing.assert_allclose(got, ref, atol=2e-5)

  def test_tp_4way(self, setup):
    tp_lib, cfg, params, video, ref = setup
    mesh = mesh_lib.make_mesh(model_parallelism=4)  # (2, 4)
    fwd, sharded_params = tp_lib.make_tp_encoder_forward(
        params, cfg, mesh, kernel_interpret=True)
    got = np.asarray(fwd(sharded_params, video))
    np.testing.assert_allclose(got, ref, atol=2e-5)

  def test_tp_validates_divisibility(self, setup):
    tp_lib, cfg, params, video, ref = setup
    import dataclasses
    bad = dataclasses.replace(cfg, num_heads=3)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    with pytest.raises(ValueError, match='num_heads'):
      tp_lib.validate_tp_config(bad, mesh)

  @pytest.mark.slow
  def test_tp_gradients_match_single_device(self, setup):
    """Backward through the TP shard_map (psum vjp + kernel backward)
    agrees with the single-device gradient."""
    tp_lib, cfg, params, video, ref = setup
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    fwd, sharded_params = tp_lib.make_tp_encoder_forward(
        params, cfg, mesh, kernel_interpret=True)

    def loss_tp(p):
      return jnp.sum(jnp.square(fwd(p, video)))

    def loss_ref(p):
      return jnp.sum(jnp.square(fe.apply(p, video, cfg, train=False)[0]))

    g_tp = jax.grad(loss_tp)(sharded_params)
    g_ref = jax.grad(loss_ref)(params)
    for path in (('patch_projection', 'linear', 'kernel'),
                 ('spatial_encoder', 'transformers_stack', 'x_layers',
                  'self_attention', 'query', 'w'),
                 ('spatial_encoder', 'transformers_stack', 'x_layers',
                  'ff_layer', 'ffn_layer1', 'linear', 'kernel')):
      a, b = g_tp, g_ref
      for k in path:
        a, b = a[k], b[k]
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=5e-4,
          err_msg='/'.join(path))


class TestManualTPTraining:
  """The shard_map TP train step (kernels kept per-shard) must produce
  the same loss and updated params as the plain single-device step."""

  @pytest.mark.slow
  def test_tp_step_matches_single_device(self):
    from videoprism_tpu.train import make_tp_train_step

    # Heads/MLP divisible by tp=2; pooler hidden = 4*D = 64 divisible.
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    batch = _batch(b=8)
    rng = jax.random.PRNGKey(1)

    ref_step = jax.jit(make_train_step(cfg, optimizer))
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    ref_state, ref_metrics = ref_step(ref_state, batch, rng)

    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    step, tp_state = make_tp_train_step(cfg, optimizer, mesh, state)
    tp_state, tp_metrics = step(tp_state, batch, rng)

    assert np.isclose(float(tp_metrics['loss']), float(ref_metrics['loss']),
                      atol=1e-5)
    np.testing.assert_allclose(
        float(tp_metrics['grad_norm']), float(ref_metrics['grad_norm']),
        rtol=1e-4)
    # Updated params identical (spot-check sharded + replicated leaves).
    for path in (('vision_encoder', 'spatial_encoder', 'transformers_stack',
                  'x_layers', 'self_attention', 'query', 'w'),
                 ('vision_encoder', 'spatial_encoder', 'transformers_stack',
                  'x_layers', 'layer_norm', 'scale'),
                 ('contrastive_vision_pooler', 'pooling_attention',
                  'post', 'w'),
                 ('text_encoder', 'token_emb', 'emb_var'),
                 ('vision_encoder', 'patch_projection', 'linear', 'kernel')):
      a, b = tp_state.params, ref_state.params
      for k in path:
        a, b = a[k], b[k]
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=2e-5,
          err_msg='/'.join(path))

  def test_tp_accum_step_matches_unsharded_accum(self):
    from videoprism_tpu.train import make_tp_train_step

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    flat = _batch(b=8)
    mb_batch = {k: v.reshape(2, 4, *v.shape[1:]) for k, v in flat.items()}
    rng = jax.random.PRNGKey(1)

    ref_step = jax.jit(make_train_step(cfg, optimizer, accum_steps=2))
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    ref_state, ref_metrics = ref_step(ref_state, mb_batch, rng)

    mesh = mesh_lib.make_mesh(model_parallelism=2)
    step, tp_state = make_tp_train_step(
        cfg, optimizer, mesh, state, accum_steps=2)
    tp_state, tp_metrics = step(tp_state, mb_batch, rng)

    assert np.isclose(float(tp_metrics['loss']), float(ref_metrics['loss']),
                      atol=1e-5)
    w_tp = tp_state.params['vision_encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']['self_attention']['query']['w']
    w_ref = ref_state.params['vision_encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']['self_attention']['query']['w']
    np.testing.assert_allclose(
        np.asarray(w_tp), np.asarray(w_ref), atol=2e-5)

  def test_tp_step_validates_divisibility(self):
    from videoprism_tpu.train import make_tp_train_step

    cfg = vclip.VideoCLIPConfig(**{**TINY_CLIP, 'num_heads': 3})
    optimizer = make_optimizer(warmup_steps=1, total_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    with pytest.raises(ValueError, match='not divisible'):
      make_tp_train_step(cfg, optimizer, mesh, state)


class TestPipelineTraining:
  """GPipe CLIP training: spatial-stack layers staged over ``model``."""

  def test_pp_step_matches_single_device(self):
    from videoprism_tpu.train import make_pp_train_step

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    batch = _batch(b=8)
    rng = jax.random.PRNGKey(1)

    ref_step = jax.jit(make_train_step(cfg, optimizer))
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    ref_state, ref_metrics = ref_step(ref_state, batch, rng)

    mesh = mesh_lib.make_mesh(model_parallelism=2)  # 2 stages x data 4
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    # B_local=2, T=2 -> 4 spatial frame rows per shard, 2 microbatches.
    step, pp_state = make_pp_train_step(
        cfg, optimizer, mesh, state, n_microbatches=2)
    pp_state, pp_metrics = step(pp_state, batch, rng)

    assert np.isclose(float(pp_metrics['loss']), float(ref_metrics['loss']),
                      atol=1e-5)
    # The stage-sharded stack AND the replicated towers update identically.
    for path in (('vision_encoder', 'spatial_encoder', 'transformers_stack',
                  'x_layers', 'self_attention', 'query', 'w'),
                 ('vision_encoder', 'temporal_encoder', 'transformers_stack',
                  'x_layers', 'ff_layer', 'ffn_layer1', 'linear', 'kernel'),
                 ('text_encoder', 'token_emb', 'emb_var'),
                 ('contrastive_vision_pooler', 'pooling_attention',
                  'post', 'w')):
      a, b = pp_state.params, ref_state.params
      for k in path:
        a, b = a[k], b[k]
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=2e-5, err_msg='/'.join(path))
    # The stack genuinely lives staged: 1/2 of the layer axis per device.
    w = pp_state.params['vision_encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']['self_attention']['query']['w']
    assert w.addressable_shards[0].data.shape[0] == w.shape[0] // 2

  def test_pp_step_validates_divisibility(self):
    from videoprism_tpu.train import make_pp_train_step

    cfg = vclip.VideoCLIPConfig(**{**TINY_CLIP, 'num_spatial_layers': 3})
    optimizer = make_optimizer(warmup_steps=1, total_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    with pytest.raises(ValueError, match='not divisible'):
      make_pp_train_step(cfg, optimizer, mesh, state, n_microbatches=2)


class TestTraining:

  @pytest.mark.slow
  def test_train_step_runs_and_decreases_loss(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step = jax.jit(make_train_step(cfg, optimizer))
    batch = _batch(b=4)
    rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(5):
      state, metrics = step(state, batch, jax.random.fold_in(rng, i))
      losses.append(float(metrics['loss']))
    assert int(state.step) == 5
    assert losses[-1] < losses[0], losses

  def test_bf16_fprop_train_step(self):
    """Mixed precision: bf16 forward/backward, fp32 params + update."""
    import dataclasses

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    bf16_cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step = jax.jit(make_train_step(bf16_cfg, optimizer))
    batch = _batch(b=4)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))

    assert np.isfinite(float(metrics['loss']))
    # Params and optimizer state stay fp32 (the cast is fprop-only).
    for leaf in jax.tree.leaves(new_state.params):
      assert leaf.dtype == jnp.float32, leaf.dtype
    for leaf in jax.tree.leaves(new_state.opt_state):
      if hasattr(leaf, 'dtype') and jnp.issubdtype(leaf.dtype, jnp.floating):
        assert leaf.dtype == jnp.float32, leaf.dtype

    # The bf16 loss tracks the fp32 loss (loose gate: one bf16 forward).
    ref_step = jax.jit(make_train_step(cfg, optimizer))
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    _, ref_metrics = ref_step(ref_state, batch, jax.random.PRNGKey(1))
    assert abs(float(metrics['loss']) - float(ref_metrics['loss'])) < 0.05

  def test_bf16_moments_optimizer(self):
    """mu stored bf16 (1/3 off AdamW state), nu fp32, loss tracks fp32."""
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100, mu_dtype=jnp.bfloat16)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    adam = state.opt_state[1][0]
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(adam.mu))
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(adam.nu))

    step = jax.jit(make_train_step(cfg, optimizer))
    batch = _batch(b=4)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    new_adam = new_state.opt_state[1][0]
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(new_adam.mu))

    ref_opt = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                             total_steps=100)
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, ref_opt)
    _, ref_metrics = jax.jit(make_train_step(cfg, ref_opt))(
        ref_state, batch, jax.random.PRNGKey(1))
    assert abs(float(metrics['loss']) - float(ref_metrics['loss'])) < 1e-5

  def test_accum_step_matches_manual_mean_of_grads(self):
    import optax

    from videoprism_tpu.train import train_step as ts

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step = jax.jit(make_train_step(cfg, optimizer, accum_steps=2))

    flat = _batch(b=8)
    mb_batch = {k: v.reshape(2, 4, *v.shape[1:]) for k, v in flat.items()}
    rng = jax.random.PRNGKey(1)
    new_state, metrics = step(state, mb_batch, rng)
    assert int(new_state.step) == 1

    # Manual reference: mean per-microbatch grads, one optimizer update.
    trainable = (state.params, state.log_temperature)
    rngs = jax.random.split(rng, 2)
    vg = jax.value_and_grad(ts.clip_loss_fn, has_aux=True)
    losses, grad_trees = [], []
    for i in range(2):
      mb = {k: v[i] for k, v in mb_batch.items()}
      (loss, _), g = vg(trainable, mb, cfg, rngs[i])
      losses.append(float(loss))
      grad_trees.append(g)
    grads = jax.tree.map(lambda a, b: (a + b) / 2, *grad_trees)
    updates, _ = optimizer.update(grads, state.opt_state, trainable)
    manual_params, _ = optax.apply_updates(trainable, updates)

    np.testing.assert_allclose(
        float(metrics['loss']), np.mean(losses), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        new_state.params, manual_params)

  def test_sharded_accum_step_matches_unsharded(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    step, sharded_state = make_sharded_train_step(
        cfg, optimizer, mesh, state, accum_steps=2)

    flat = _batch(b=8)
    mb_batch = {k: v.reshape(2, 4, *v.shape[1:]) for k, v in flat.items()}
    rng = jax.random.PRNGKey(1)
    sharded_state, metrics = step(sharded_state, mb_batch, rng)
    assert int(sharded_state.step) == 1

    # Fresh state for the reference: the sharded step donates its input,
    # and device_put may alias the original buffers.
    ref_step = jax.jit(make_train_step(cfg, optimizer, accum_steps=2))
    ref_state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    ref_state, ref_metrics = ref_step(ref_state, mb_batch, rng)
    np.testing.assert_allclose(
        float(metrics['loss']), float(ref_metrics['loss']), atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        sharded_state.params, ref_state.params)

  @pytest.mark.slow
  def test_sharded_train_step(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=100)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    mesh = mesh_lib.make_mesh(model_parallelism=2)
    step, sharded_state = make_sharded_train_step(
        cfg, optimizer, mesh, state)

    batch = _batch(b=8)
    rng = jax.random.PRNGKey(1)
    sharded_state, metrics = step(sharded_state, batch, rng)
    sharded_state, metrics = step(
        sharded_state, batch, jax.random.fold_in(rng, 1))
    assert int(sharded_state.step) == 2
    assert np.isfinite(float(metrics['loss']))
    assert np.isfinite(float(metrics['grad_norm']))

    # Params actually live sharded: a TP'd weight spans 2 devices.
    w = sharded_state.params['vision_encoder']['spatial_encoder'][
        'transformers_stack']['x_layers']['self_attention']['query']['w']
    assert len(w.sharding.device_set) >= 2
