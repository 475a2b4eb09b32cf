"""Classifier fine-tuning tests (train/classifier_train_step.py):
full vs frozen-backbone steps, labeled loader, sharded variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.train import (
    create_classifier_train_state,
    make_classifier_train_step,
    make_optimizer,
    make_sharded_classifier_train_step,
)
from videoprism_tpu.train import data as data_lib

TINY_ENC = dict(model_dim=16, num_heads=2, mlp_dim=32, num_spatial_layers=2,
                num_temporal_layers=1, patch_size=6, pos_emb_shape=(2, 2, 2),
                atten_logit_cap=50.0, scan=True)
NUM_CLASSES = 5


def _cfg():
  return vc.VideoClassifierConfig(
      encoder=fe.FactorizedEncoderConfig(**TINY_ENC),
      num_classes=NUM_CLASSES)


def _batch(b=4, accum=None, seed=0):
  rng = np.random.RandomState(seed)
  shape = (b, 2, 12, 12, 3) if accum is None else (accum, b, 2, 12, 12, 3)
  lshape = (b,) if accum is None else (accum, b)
  return {
      'video': rng.rand(*shape).astype('float32'),
      'label': rng.randint(0, NUM_CLASSES, size=lshape).astype('int32'),
  }


class TestClassifierStep:

  def test_full_finetune_loss_decreases(self):
    cfg = _cfg()
    opt = make_optimizer(learning_rate=3e-3, warmup_steps=1, total_steps=50)
    state = create_classifier_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = jax.jit(make_classifier_train_step(cfg, opt))
    batch = _batch()
    losses = []
    for i in range(8):
      state, metrics = step(state, batch, jax.random.PRNGKey(i))
      losses.append(float(metrics['loss']))
    assert int(state.step) == 8
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()

  def test_frozen_backbone_updates_head_only(self):
    cfg = _cfg()
    opt = make_optimizer(learning_rate=3e-3, warmup_steps=1, total_steps=50)
    state = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg, opt, freeze_backbone=True)
    step = jax.jit(make_classifier_train_step(cfg, opt,
                                              freeze_backbone=True))
    before = jax.tree.map(np.asarray, state.params)
    # Two steps: the warmup schedule starts at lr=0.
    state, metrics = step(state, _batch(), jax.random.PRNGKey(1))
    state, metrics = step(state, _batch(), jax.random.PRNGKey(2))
    after = jax.tree.map(np.asarray, state.params)
    # Encoder bit-identical; head moved.
    jax.tree.map(np.testing.assert_array_equal,
                 before['encoder'], after['encoder'])
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()),
        {k: before[k] for k in ('atten_pooler', 'projection')},
        {k: after[k] for k in ('atten_pooler', 'projection')}))
    assert max(moved) > 0
    assert np.isfinite(float(metrics['loss']))

  def test_frozen_opt_state_covers_head_only(self):
    """AdamW moments exist only for the pooler+projection subtree."""
    cfg = _cfg()
    opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=50)
    full = create_classifier_train_state(jax.random.PRNGKey(0), cfg, opt)
    frozen = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg, opt, freeze_backbone=True)
    n_full = sum(x.size for x in jax.tree.leaves(full.opt_state))
    n_frozen = sum(x.size for x in jax.tree.leaves(frozen.opt_state))
    n_encoder = sum(
        x.size for x in jax.tree.leaves(full.params['encoder']))
    assert n_frozen <= n_full - 2 * n_encoder  # both moments dropped

  def test_frozen_matches_stop_gradient_reference(self):
    """One frozen step == a full step whose encoder grads are zeroed and
    whose dropout-free loss uses the same eval-mode encoder features."""
    import optax

    cfg = _cfg()
    opt = optax.sgd(1e-2)  # stateless shapes keep the comparison simple
    state = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg, opt, freeze_backbone=True)
    step = jax.jit(make_classifier_train_step(cfg, opt,
                                              freeze_backbone=True))
    batch = _batch()
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))

    # Reference: explicit stop_gradient composition of the same modules.
    from videoprism_tpu.train import objectives
    from videoprism_tpu.train.classifier_train_step import (
        _head_forward,
        _split_head,
    )

    head, encoder = _split_head(
        jax.tree.map(np.asarray, state.params))

    def loss_fn(head):
      features, _ = fe.apply(encoder, batch['video'], cfg.encoder,
                             train=False)
      logits = _head_forward(head, jax.lax.stop_gradient(features), cfg,
                             train=True, rng=None)
      return objectives.softmax_cross_entropy_loss(
          logits, batch['label'])[0]

    grads = jax.grad(loss_fn)(head)
    expected = jax.tree.map(lambda p, g: p - 1e-2 * g, head, grads)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        {k: new_state.params[k] for k in ('atten_pooler', 'projection')},
        expected)

  def test_accumulation_matches_big_batch(self):
    """Frozen step with accum=2 x b=2 == loss of the b=4 batch (mean)."""
    import optax

    cfg = _cfg()
    opt = optax.sgd(1e-2)
    state = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg, opt, freeze_backbone=True)
    flat = _batch(b=4)
    stacked = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in flat.items()}
    s_acc, m_acc = jax.jit(make_classifier_train_step(
        cfg, opt, freeze_backbone=True, accum_steps=2))(
            state, stacked, jax.random.PRNGKey(1))
    s_big, m_big = jax.jit(make_classifier_train_step(
        cfg, opt, freeze_backbone=True))(state, flat, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_acc['loss']), float(m_big['loss']),
                               atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        jax.tree.map(np.asarray, s_acc.params),
        jax.tree.map(np.asarray, s_big.params))


class TestShardedClassifierStep:

  @pytest.mark.parametrize('freeze', [False, True])
  def test_matches_single_device(self, freeze):
    from videoprism_tpu.parallel import mesh as mesh_lib

    cfg = _cfg()
    opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, total_steps=50)
    state = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg, opt, freeze_backbone=freeze)
    ref_state = create_classifier_train_state(
        jax.random.PRNGKey(0), cfg, opt, freeze_backbone=freeze)
    mesh = mesh_lib.make_mesh()
    step, sh_state = make_sharded_classifier_train_step(
        cfg, opt, mesh, state, freeze_backbone=freeze)
    batch = _batch(b=8)
    with mesh:
      sh_state, metrics = step(sh_state, batch, jax.random.PRNGKey(1))
    ref_step = jax.jit(make_classifier_train_step(
        cfg, opt, freeze_backbone=freeze))
    ref_state, ref_metrics = ref_step(ref_state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics['loss']),
                               float(ref_metrics['loss']), atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        sh_state.params, ref_state.params)


class TestEvalLoop:

  def test_matches_direct_forward_with_tail_padding(self):
    """10 examples at batch 4 (padded tail) == one unbatched forward."""
    from videoprism_tpu import evaluation
    from videoprism_tpu.models import init as init_lib
    from videoprism_tpu.train import evaluate_classifier

    cfg = _cfg()
    params = init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg)
    source = data_lib.SyntheticLabeledSource(
        num_examples=10, num_frames=2, size=12, num_classes=NUM_CLASSES)
    metrics = evaluate_classifier(params, cfg, source, batch_size=4)
    assert metrics['num_examples'] == 10

    videos = np.stack([source.get(i)[0] for i in range(10)])
    labels = np.asarray([source.get(i)[1] for i in range(10)])
    logits, _ = vc.apply(params, videos, cfg, train=False)
    logits = np.asarray(logits, np.float32)
    expected = evaluation.classification_accuracy(logits, labels)
    assert metrics['top1_accuracy'] == expected['top1_accuracy']
    assert metrics['top5_accuracy'] == expected['top5_accuracy']
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    nll = -float(np.mean(
        np.asarray(log_probs)[np.arange(10), labels]))
    np.testing.assert_allclose(metrics['loss'], nll, rtol=1e-5)

  def test_training_improves_eval(self):
    """Overfit 8 clips; held-in eval loss drops and accuracy rises."""
    from videoprism_tpu.train import evaluate_classifier

    cfg = _cfg()
    opt = make_optimizer(learning_rate=5e-3, warmup_steps=1, total_steps=60)
    state = create_classifier_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = jax.jit(make_classifier_train_step(cfg, opt))
    source = data_lib.SyntheticLabeledSource(
        num_examples=8, num_frames=2, size=12, num_classes=NUM_CLASSES)
    batch = {
        'video': np.stack([source.get(i)[0] for i in range(8)]),
        'label': np.asarray([source.get(i)[1] for i in range(8)], np.int32),
    }
    before = evaluate_classifier(state.params, cfg, source, batch_size=4)
    for i in range(25):
      state, _ = step(state, batch, jax.random.PRNGKey(i))
    after = evaluate_classifier(state.params, cfg, source, batch_size=4)
    assert after['loss'] < before['loss']
    assert after['top1_accuracy'] >= before['top1_accuracy']

  def test_eval_seed_disjoint(self):
    a = data_lib.SyntheticLabeledSource(num_examples=4, num_frames=2,
                                        size=12, seed=0)
    b = data_lib.SyntheticLabeledSource(num_examples=4, num_frames=2,
                                        size=12, seed=1)
    assert np.abs(a.get(0)[0] - b.get(0)[0]).max() > 0


class TestLabeledLoader:

  def test_labeled_loader_shapes_and_determinism(self):
    source = data_lib.SyntheticLabeledSource(
        num_examples=12, num_frames=2, size=12, num_classes=NUM_CLASSES)
    batches = list(data_lib.labeled_loader(
        source, batch_size=4, shuffle=False, num_epochs=1, num_workers=1))
    assert len(batches) == 3
    for b in batches:
      assert b['video'].shape == (4, 2, 12, 12, 3)
      assert b['label'].shape == (4,)
      assert b['label'].dtype == jnp.int32
      assert (np.asarray(b['label']) < NUM_CLASSES).all()
    again = list(data_lib.labeled_loader(
        source, batch_size=4, shuffle=False, num_epochs=1, num_workers=1))
    np.testing.assert_array_equal(np.asarray(batches[0]['video']),
                                  np.asarray(again[0]['video']))

  def test_accum_layout(self):
    source = data_lib.SyntheticLabeledSource(
        num_examples=8, num_frames=2, size=12)
    batch = next(iter(data_lib.labeled_loader(
        source, batch_size=2, accum_steps=2, shuffle=False, num_epochs=1,
        num_workers=1)))
    assert batch['video'].shape == (2, 2, 2, 12, 12, 3)
    assert batch['label'].shape == (2, 2)
