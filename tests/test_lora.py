"""LoRA adapters (train/lora.py): leaf selection, delta layout, identity at
init, training behavior, export/bake-in."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.train import (
    LoraConfig,
    create_lora_classifier_train_state,
    create_lora_train_state,
    export_lora_classifier,
    init_lora,
    lora_num_params,
    make_lora_classifier_train_step,
    make_lora_train_step,
    make_optimizer,
    merge_lora,
)

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
    num_temporal_layers=1, mlp_dim=32, num_auxiliary_layers=1,
    enable_causal_atten=True, num_unimodal_layers=2, norm_policy='pre',
    model_dim=16, num_heads=2, atten_logit_cap=50.0, scan=True,
    vocabulary_size=64)
TINY_ENC = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
    num_temporal_layers=1, mlp_dim=32, model_dim=16, num_heads=2,
    atten_logit_cap=50.0, scan=True)
NUM_CLASSES = 5


def _clip_setup(targets=('query', 'value'), rank=2, **kw):
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
  lcfg = LoraConfig(rank=rank, targets=targets, **kw)
  lora = init_lora(jax.random.PRNGKey(1), params, lcfg)
  return cfg, params, lcfg, lora


def _clip_batch(n=4):
  rng = np.random.default_rng(0)
  return {
      'video': rng.random((n, 2, 12, 12, 3), np.float32),
      'text_token_ids': rng.integers(0, 64, (n, 6)).astype(np.int32),
      'text_paddings': np.zeros((n, 6), np.float32),
  }


class TestAdapterTree:

  def test_default_targets_select_qv_everywhere(self):
    _, params, _, lora = _clip_setup()
    # 4 transformer stacks (spatial/temporal/aux/text) x {query, value}.
    assert len(lora) == 8
    for key in lora:
      assert key.endswith(('query/w', 'value/w'))
      assert 'pooling_attention' not in key

  def test_target_expansion_and_pooler(self):
    _, params, _, lora = _clip_setup(
        targets=('query', 'key', 'value', 'post', 'ffn'),
        include_pooler=True)
    # 4 stacks x (4 attn + 2 ffn) + pooler x 4 attn.
    assert len(lora) == 4 * 6 + 4
    assert any('pooling_attention' in k for k in lora)
    assert any(k.endswith('ffn_layer1/linear/kernel') for k in lora)

  def test_shapes_carry_stack_axis_and_rank(self):
    _, params, lcfg, lora = _clip_setup(rank=3)
    ab = lora['vision_encoder/spatial_encoder/transformers_stack/x_layers/'
              'self_attention/query/w']
    assert ab['a'].shape == (2, 3, 16)      # [L, r, D]
    assert ab['b'].shape == (2, 3, 2, 8)    # [L, r, N, H]
    count = lora_num_params(lora)
    assert count == sum(int(np.prod(l.shape))
                        for l in jax.tree.leaves(lora))

  def test_bad_config_rejected(self):
    with pytest.raises(ValueError, match='rank'):
      LoraConfig(rank=0)
    with pytest.raises(ValueError, match='unknown LoRA targets'):
      LoraConfig(targets=('attention',))


class TestMerge:

  def test_identity_at_init(self):
    """b == 0 at init, so the merged forward equals the frozen forward."""
    cfg, params, lcfg, lora = _clip_setup()
    merged = merge_lora(params, lora, lcfg)
    batch = _clip_batch(2)
    v0, t0, _ = vclip.apply(params, batch['video'],
                            batch['text_token_ids'],
                            batch['text_paddings'], cfg)
    v1, t1, _ = vclip.apply(merged, batch['video'],
                            batch['text_token_ids'],
                            batch['text_paddings'], cfg)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))

  def test_delta_layouts_match_manual_einsum(self):
    """Random a/b: every adapted leaf layout (qkv, post, ffn) merges to
    W + scale * a^T b with the contraction on the matmul input dims."""
    cfg, params, lcfg, lora = _clip_setup(
        targets=('query', 'post', 'ffn'), rank=2)
    rng = np.random.default_rng(1)
    lora = jax.tree.map(lambda x: jnp.asarray(
        rng.standard_normal(x.shape), x.dtype), lora)
    merged = merge_lora(params, lora, lcfg)

    stack = 'vision_encoder/spatial_encoder/transformers_stack/x_layers'
    def leaf(tree, key):
      node = tree
      for k in key.split('/'):
        node = node[k]
      return np.asarray(node)

    q = f'{stack}/self_attention/query/w'
    a, b = np.asarray(lora[q]['a']), np.asarray(lora[q]['b'])
    np.testing.assert_allclose(
        leaf(merged, q), leaf(params, q) + np.einsum('lrd,lrnh->ldnh', a, b),
        rtol=1e-5)

    p = f'{stack}/self_attention/post/w'
    a, b = np.asarray(lora[p]['a']), np.asarray(lora[p]['b'])
    np.testing.assert_allclose(
        leaf(merged, p), leaf(params, p) + np.einsum('lrnh,lrd->ldnh', a, b),
        rtol=1e-5)

    f = f'{stack}/ff_layer/ffn_layer1/linear/kernel'
    a, b = np.asarray(lora[f]['a']), np.asarray(lora[f]['b'])
    np.testing.assert_allclose(
        leaf(merged, f), leaf(params, f) + np.einsum('lri,lrm->lim', a, b),
        rtol=1e-5)

  def test_alpha_scales_delta(self):
    cfg, params, _, _ = _clip_setup()
    lcfg1 = LoraConfig(rank=2, targets=('query',))
    lcfg2 = LoraConfig(rank=2, alpha=4.0, targets=('query',))
    lora = init_lora(jax.random.PRNGKey(1), params, lcfg1)
    lora = jax.tree.map(jnp.ones_like, lora)
    key = next(iter(lora))
    path = key.split('/')
    def leaf(tree):
      node = tree
      for k in path:
        node = node[k]
      return np.asarray(node, np.float64)
    d1 = leaf(merge_lora(params, lora, lcfg1)) - leaf(params)
    d2 = leaf(merge_lora(params, lora, lcfg2)) - leaf(params)
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-5)


class TestClipLoraTraining:

  def test_loss_drops_and_frozen_untouched(self):
    cfg, params, lcfg, _ = _clip_setup(rank=4)
    opt = make_optimizer(learning_rate=3e-3, warmup_steps=1, total_steps=40)
    state = create_lora_train_state(
        jax.random.PRNGKey(1), opt, params, lcfg)
    step = jax.jit(make_lora_train_step(cfg, opt, lcfg))
    batch = {k: jnp.asarray(v) for k, v in _clip_batch(4).items()}
    frozen_before = jax.tree.map(np.asarray, params)
    losses = []
    for i in range(12):
      state, metrics = step(state, params, batch, jax.random.PRNGKey(i))
      losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]
    jax.tree.map(np.testing.assert_array_equal, frozen_before,
                 jax.tree.map(np.asarray, params))
    # b left zero-init: adapters actually moved.
    b_norm = sum(float(jnp.sum(jnp.abs(ab['b'])))
                 for ab in state.params.values())
    assert b_norm > 0

  def test_accum_matches_flat_batch_step(self):
    cfg, params, lcfg, _ = _clip_setup(rank=2)
    opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=20)
    batch = _clip_batch(4)
    flat = {k: jnp.asarray(v) for k, v in batch.items()}
    micro = {k: jnp.asarray(v.reshape((2, 2) + v.shape[1:]))
             for k, v in batch.items()}

    s1 = create_lora_train_state(jax.random.PRNGKey(1), opt, params, lcfg)
    s2 = create_lora_train_state(jax.random.PRNGKey(1), opt, params, lcfg)
    step1 = jax.jit(make_lora_train_step(cfg, opt, lcfg))
    step2 = jax.jit(make_lora_train_step(cfg, opt, lcfg, accum_steps=2))
    s1, m1 = step1(s1, params, flat, jax.random.PRNGKey(0))
    s2, m2 = step2(s2, params, micro, jax.random.PRNGKey(0))
    # Not identical (negatives are per-microbatch) but both must be finite
    # and update the same tree structure.
    assert np.isfinite(float(m1['loss'])) and np.isfinite(float(m2['loss']))
    assert jax.tree.structure(s1.params) == jax.tree.structure(s2.params)


class TestClassifierLora:

  def test_train_export_serve(self):
    enc_cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
    cfg = vc.VideoClassifierConfig(encoder=enc_cfg, num_classes=NUM_CLASSES)
    pretrained = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(rank=2)
    opt = make_optimizer(learning_rate=5e-3, warmup_steps=1, total_steps=40)
    state = create_lora_classifier_train_state(
        jax.random.PRNGKey(1), opt, pretrained, lcfg)
    step = jax.jit(make_lora_classifier_train_step(cfg, opt, lcfg))

    rng = np.random.default_rng(0)
    batch = {
        'video': jnp.asarray(rng.random((4, 2, 12, 12, 3), np.float32)),
        'label': jnp.asarray(rng.integers(0, NUM_CLASSES, 4), jnp.int32),
    }
    losses = []
    for i in range(15):
      state, metrics = step(state, pretrained['encoder'], batch,
                            jax.random.PRNGKey(i))
      losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]

    # Export bakes adapters in: served logits == trainable-path logits.
    served = export_lora_classifier(pretrained, state, lcfg)
    logits_served, _ = vc.apply(served, batch['video'], cfg, train=False)
    full = dict(state.params['head'],
                encoder=merge_lora(pretrained['encoder'],
                                   state.params['lora'], lcfg))
    logits_merged, _ = vc.apply(full, batch['video'], cfg, train=False)
    np.testing.assert_array_equal(np.asarray(logits_served),
                                  np.asarray(logits_merged))
    # Param-tree schema preserved: same structure as the pretrained tree.
    assert jax.tree.structure(served) == jax.tree.structure(pretrained)
