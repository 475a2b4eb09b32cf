"""Training data pipeline tests: loader semantics + end-to-end train loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu.io import spm
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.train import (
    create_train_state,
    data as data_lib,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope='module')
def tokenizer(tmp_path_factory):
  pieces = [
      spm.Piece('<unk>', 0.0, spm.UNKNOWN),
      spm.Piece('<s>', 0.0, spm.CONTROL),
      spm.Piece('</s>', 0.0, spm.CONTROL),
      spm.Piece('▁', -4.0),
  ]
  for w in data_lib.SyntheticSource.vocab_words + ('.',):
    pieces.append(spm.Piece('▁' + w if w != '.' else '.', -1.0))
  model = spm.SpmModel(pieces=pieces, unk_id=0, bos_id=1, eos_id=2)
  path = tmp_path_factory.mktemp('spm') / 'train.model'
  spm.save_model(str(path), model)
  return SentencePieceTokenizer(str(path), use_native=False)


class TestBatchedLoader:

  def test_shapes_and_epochs(self, tokenizer):
    source = data_lib.SyntheticSource(num_examples=10)
    batches = list(data_lib.batched_loader(
        source, tokenizer, batch_size=4, num_epochs=2, max_text_len=8,
        num_workers=2))
    # 10 examples, batch 4, drop remainder -> 2 batches/epoch x 2 epochs.
    assert len(batches) == 4
    b = batches[0]
    assert b['video'].shape == (4, 4, 36, 36, 3)
    assert b['text_token_ids'].shape == (4, 8)
    assert b['text_paddings'].shape == (4, 8)
    assert str(b['text_token_ids'].dtype) == 'int32'

  def test_accum_steps_layout(self, tokenizer):
    source = data_lib.SyntheticSource(num_examples=10)
    batches = list(data_lib.batched_loader(
        source, tokenizer, batch_size=2, accum_steps=2, num_epochs=1,
        max_text_len=8, num_workers=1, shuffle=False))
    # 10 examples, 4 consumed per step -> 2 accumulation batches.
    assert len(batches) == 2
    b = batches[0]
    assert b['video'].shape == (2, 2, 4, 36, 36, 3)
    assert b['text_token_ids'].shape == (2, 2, 8)
    assert b['text_paddings'].shape == (2, 2, 8)
    # Microbatch layout = a flat batch of 4 reshaped: rows 0,1 in
    # microbatch 0 and rows 2,3 in microbatch 1.
    flat = list(data_lib.batched_loader(
        source, tokenizer, batch_size=4, num_epochs=1, max_text_len=8,
        num_workers=1, shuffle=False))[0]
    np.testing.assert_array_equal(
        np.asarray(b['video']).reshape(4, 4, 36, 36, 3),
        np.asarray(flat['video']))

  def test_accum_steps_guards(self, tokenizer):
    source = data_lib.SyntheticSource(num_examples=10)
    with pytest.raises(ValueError, match='drop_remainder'):
      next(iter(data_lib.batched_loader(
          source, tokenizer, batch_size=2, accum_steps=2,
          drop_remainder=False)))
    with pytest.raises(ValueError, match='yield nothing'):
      next(iter(data_lib.batched_loader(
          source, tokenizer, batch_size=4, accum_steps=4)))

  def test_multihost_local_rows(self):
    # Flat layout: contiguous per-process split of the global batch.
    idx = np.arange(8)
    np.testing.assert_array_equal(
        data_lib._local_rows(idx, 1, 8, 0, 2), [0, 1, 2, 3])
    np.testing.assert_array_equal(
        data_lib._local_rows(idx, 1, 8, 1, 2), [4, 5, 6, 7])
    # Accumulation layout: split within each microbatch row block, so
    # microbatch membership is identical on every host.
    np.testing.assert_array_equal(
        data_lib._local_rows(idx, 2, 4, 0, 2), [0, 1, 4, 5])
    np.testing.assert_array_equal(
        data_lib._local_rows(idx, 2, 4, 1, 2), [2, 3, 6, 7])
    # Single process: identity.
    np.testing.assert_array_equal(data_lib._local_rows(idx, 2, 4, 0, 1), idx)

  def test_multihost_guards(self, tokenizer):
    source = data_lib.SyntheticSource(num_examples=8)
    with pytest.raises(ValueError, match='requires a mesh sharding'):
      next(iter(data_lib.batched_loader(
          source, tokenizer, batch_size=4,
          process_index=0, process_count=2)))
    with pytest.raises(ValueError, match='not divisible'):
      next(iter(data_lib.batched_loader(
          source, tokenizer, batch_size=3, sharding=lambda n: None,
          process_index=0, process_count=2)))
    with pytest.raises(ValueError, match='out of range'):
      next(iter(data_lib.batched_loader(
          source, tokenizer, batch_size=4, sharding=lambda n: None,
          process_index=2, process_count=2)))
    # A partial final batch cannot split into equal per-process rows —
    # rejected up front, not as a reshape crash at epoch end.
    with pytest.raises(ValueError, match='multi-host.*drop_remainder'):
      next(iter(data_lib.batched_loader(
          source, tokenizer, batch_size=4, sharding=lambda n: None,
          process_index=0, process_count=2, drop_remainder=False)))

  def test_weight_decay_mask_spares_non_matmul_leaves(self):
    """AdamW decay hits only matmul/embedding weights: biases, LN
    scales, and the contrastive log_temperature must not shrink (the
    standard CLIP/ViT recipe — decaying the logit scale fights the
    learned temperature)."""
    from videoprism_tpu.train.train_step import _weight_decay_mask

    params = {
        'layer_norm': {'scale': jnp.ones((3, 4)), 'bias': jnp.ones((4,))},
        'self_attention': {'query': {'w': jnp.ones((4, 2, 2)),
                                     'b': jnp.ones((2, 2))}},
        'ffn_layer1': {'linear': {'kernel': jnp.ones((4, 8)),
                                  'bias': jnp.ones((8,))}},
        'token_emb': {'emb_var': jnp.ones((10, 4))},
    }
    trainable = (params, jnp.asarray(0.5))  # (tree, log_temperature)
    mask = _weight_decay_mask(trainable)
    assert mask[1] is False                       # log_temperature
    tree = mask[0]
    assert tree['self_attention']['query']['w'] is True
    assert tree['ffn_layer1']['linear']['kernel'] is True
    assert tree['token_emb']['emb_var'] is True
    assert tree['self_attention']['query']['b'] is False
    assert tree['layer_norm']['scale'] is False   # 2-D but named scale
    assert tree['layer_norm']['bias'] is False
    assert tree['ffn_layer1']['linear']['bias'] is False

    # End to end: zero gradients + heavy decay shrink only masked leaves.
    opt = make_optimizer(learning_rate=1e-2, weight_decay=1.0,
                         warmup_steps=0, total_steps=2, clip_norm=1e9,
                         schedule='constant')
    opt_state = opt.init(trainable)
    zero_grads = jax.tree.map(jnp.zeros_like, trainable)
    updates, _ = opt.update(zero_grads, opt_state, trainable)
    new = jax.tree.map(lambda p, u: p + u, trainable, updates)
    assert float(new[1]) == 0.5                   # log_temperature intact
    assert float(new[0]['layer_norm']['scale'][0, 0]) == 1.0
    assert float(new[0]['self_attention']['query']['w'][0, 0, 0]) < 1.0

  def test_shuffling_differs_across_epochs(self, tokenizer):
    source = data_lib.SyntheticSource(num_examples=8)
    batches = list(data_lib.batched_loader(
        source, tokenizer, batch_size=8, num_epochs=2, shuffle=True,
        max_text_len=8, num_workers=1))
    a, b = np.asarray(batches[0]['video']), np.asarray(batches[1]['video'])
    assert not np.array_equal(a, b)
    # Same content modulo order.
    np.testing.assert_allclose(
        np.sort(a.reshape(8, -1).sum(-1)), np.sort(b.reshape(8, -1).sum(-1)),
        rtol=1e-6)

  @pytest.mark.slow
  def test_end_to_end_training_loop(self, tokenizer):
    cfg = vclip.VideoCLIPConfig(
        patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
        num_temporal_layers=1, mlp_dim=16, num_auxiliary_layers=0,
        vocabulary_size=tokenizer.vocab_size, enable_causal_atten=True,
        num_unimodal_layers=1, norm_policy='pre', model_dim=8, num_heads=2,
        atten_logit_cap=50.0, scan=True)
    source = data_lib.SyntheticSource(num_examples=8, num_frames=2, size=12)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    step = jax.jit(make_train_step(cfg, optimizer))
    rng = jax.random.PRNGKey(1)

    losses = []
    for i, batch in enumerate(data_lib.batched_loader(
        source, tokenizer, batch_size=4, num_epochs=2, max_text_len=8,
        num_workers=1)):
      state, metrics = step(state, batch, jax.random.fold_in(rng, i))
      losses.append(float(metrics['loss']))
    assert len(losses) == 4
    assert all(np.isfinite(losses))

  def test_skip_batches_fast_forwards(self, tokenizer):
    """skip_batches=k yields exactly the full stream's batches[k:] —
    the resume contract (no decode happens for the skipped ones)."""
    source = data_lib.SyntheticSource(num_examples=10)
    mk = lambda skip: list(data_lib.batched_loader(
        source, tokenizer, batch_size=4, num_epochs=2, max_text_len=8,
        num_workers=1, skip_batches=skip))
    full = mk(0)
    for skip in (1, 3):
      resumed = mk(skip)
      assert len(resumed) == len(full) - skip
      for a, b in zip(resumed, full[skip:]):
        np.testing.assert_array_equal(np.asarray(a['video']),
                                      np.asarray(b['video']))
        np.testing.assert_array_equal(np.asarray(a['text_token_ids']),
                                      np.asarray(b['text_token_ids']))

  @pytest.mark.slow
  def test_resume_matches_uninterrupted(self, tokenizer, tmp_path):
    """Checkpoint at step 2, restore, fast-forward the loader and the
    fold_in(i) rng stream (the scripts/train_clip.py --resume recipe):
    the resumed run's final state equals the uninterrupted run's exactly."""
    from videoprism_tpu.train.checkpointing import TrainCheckpointer

    cfg = vclip.VideoCLIPConfig(
        patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
        num_temporal_layers=1, mlp_dim=16, num_auxiliary_layers=0,
        vocabulary_size=tokenizer.vocab_size, enable_causal_atten=True,
        num_unimodal_layers=1, norm_policy='pre', model_dim=8, num_heads=2,
        atten_logit_cap=50.0, scan=True)
    source = data_lib.SyntheticSource(num_examples=8, num_frames=2, size=12)
    optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                               total_steps=10)
    step = jax.jit(make_train_step(cfg, optimizer))
    rng = jax.random.PRNGKey(1)
    loader_kw = dict(batch_size=4, num_epochs=4, max_text_len=8,
                     num_workers=1)

    # Uninterrupted: 4 steps, checkpoint after step 2.
    state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
    ckpt = TrainCheckpointer(str(tmp_path / 'ck'), async_save=False)
    for i, batch in enumerate(data_lib.batched_loader(
        source, tokenizer, **loader_kw)):
      if i >= 4:
        break
      state, _ = step(state, batch, jax.random.fold_in(rng, i))
      ckpt.maybe_save(int(state.step), state, every=2)
    ckpt.wait()
    expected = jax.device_get(state)

    # Resumed: restore step 2, skip 2 batches, continue i = 2, 3.
    template = create_train_state(jax.random.PRNGKey(7), cfg, optimizer)
    state_r = ckpt.restore(2, template)  # the "crash" happened after 2
    start = int(state_r.step)
    assert start == 2
    for i, batch in enumerate(data_lib.batched_loader(
        source, tokenizer, skip_batches=start, **loader_kw), start=start):
      if i >= 4:
        break
      state_r, _ = step(state_r, batch, jax.random.fold_in(rng, i))
    ckpt.close()

    assert int(state_r.step) == int(expected.step)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(expected),
        jax.tree_util.tree_leaves_with_path(jax.device_get(state_r))):
      assert pa == pb
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                    err_msg=jax.tree_util.keystr(pa))


class _TaggedSource:
  """Tiny tagged source: get(i) -> (clip, '<tag>:<i>')."""

  def __init__(self, tag, n, frames=2, size=12):
    self.tag, self.n = tag, n
    self.frames, self.size = frames, size

  def __len__(self):
    return self.n

  def get(self, i):
    clip = np.full((self.frames, self.size, self.size, 3),
                   i / 100.0, np.float32)
    return clip, f'{self.tag}:{i}'


class TestMixtureSource:

  def test_default_weights_are_concatenation(self):
    mix = data_lib.MixtureSource(
        [_TaggedSource('a', 6), _TaggedSource('b', 2)])
    assert len(mix) == 8
    assert mix.shares == [0.75, 0.25]
    tags = [mix.get(j)[1].split(':')[0] for j in range(len(mix))]
    assert tags.count('a') == 6 and tags.count('b') == 2

  def test_weights_respected_and_interleaved(self):
    with pytest.warns(UserWarning, match='fewer slots'):
      mix = data_lib.MixtureSource(
          [_TaggedSource('a', 100), _TaggedSource('b', 100)],
          weights=[3.0, 1.0], virtual_size=40)
    tags = [mix.get(j)[1].split(':')[0] for j in range(len(mix))]
    assert tags.count('a') == 30 and tags.count('b') == 10
    # Smooth WRR: every window of 4 virtual slots holds exactly one 'b'.
    for start in range(0, 40, 4):
      assert tags[start:start + 4].count('b') == 1, (start, tags)
    # Truncated epochs sample an evenly-SPREAD subset, not a prefix.
    b_ids = sorted(int(mix.get(j)[1].split(':')[1])
                   for j in range(40) if tags[j] == 'b')
    assert len(set(b_ids)) == 10 and max(b_ids) >= 90

  def test_default_virtual_size_guarantees_full_coverage(self):
    """The review-found bug: equal weights over (10, 2) with a
    sum-sized epoch silently dropped 40% of the big source FOREVER.
    The full-coverage default epoch reaches every example."""
    mix = data_lib.MixtureSource(
        [_TaggedSource('a', 10), _TaggedSource('b', 2)],
        weights=[1.0, 1.0])
    assert len(mix) == 20  # max(ceil(10/.5), ceil(2/.5))
    seen_a = {int(mix.get(j)[1].split(':')[1]) for j in range(len(mix))
              if mix.get(j)[1].startswith('a')}
    assert seen_a == set(range(10))  # every big-source example reachable

  def test_default_size_coverage_holds_across_geometries(self):
    """ADVICE r4 hardening: at the full-coverage default epoch, every
    source's every example is reachable — for skewed weights and sizes,
    with no 'fewer slots' warning (the apportionment must never shave a
    source below len(source) in coverage mode)."""
    import warnings

    rng = np.random.default_rng(7)
    for _ in range(25):
      n = int(rng.integers(2, 5))
      lens = [int(x) for x in rng.integers(1, 12, n)]
      weights = [float(x) for x in rng.uniform(0.5, 3.0, n)]
      tags = [chr(ord('a') + i) for i in range(n)]
      with warnings.catch_warnings():
        warnings.simplefilter('error')   # coverage mode must not warn
        mix = data_lib.MixtureSource(
            [_TaggedSource(t, ln) for t, ln in zip(tags, lens)],
            weights=weights)
      got = {}
      for j in range(len(mix)):
        tag, idx = mix.get(j)[1].split(':')
        got.setdefault(tag, set()).add(int(idx))
      for t, ln in zip(tags, lens):
        assert got.get(t) == set(range(ln)), (t, lens, weights)

  def test_overshoot_shaves_most_overapportioned(self):
    """Explicit virtual_size with min-1-slot floors: the overshoot comes
    out of sources holding more than their fair share, and every source
    keeps >= 1 slot."""
    with pytest.warns(UserWarning, match='fewer slots'):
      mix = data_lib.MixtureSource(
          [_TaggedSource(t, 10) for t in 'abcde'],
          weights=[1.0, 1e-9, 1e-9, 1e-9, 1e-9], virtual_size=5)
    tags = [mix.get(j)[1].split(':')[0] for j in range(len(mix))]
    assert len(tags) == 5
    for t in 'abcde':
      assert tags.count(t) >= 1    # min-one-slot floor held

  def test_oversampled_source_wraps(self):
    mix = data_lib.MixtureSource(
        [_TaggedSource('a', 3)], weights=[1.0], virtual_size=7)
    ids = sorted(int(mix.get(j)[1].split(':')[1]) for j in range(7))
    assert ids == [0, 0, 0, 1, 1, 2, 2]  # index mod len, evenly wrapped

  def test_deterministic_across_instances(self):
    kw = dict(weights=[2.0, 1.0, 1.0], virtual_size=50)
    srcs = lambda: [_TaggedSource(t, 20) for t in 'abc']
    m1 = data_lib.MixtureSource(srcs(), **kw)
    m2 = data_lib.MixtureSource(srcs(), **kw)
    assert [m1.get(j)[1] for j in range(50)] == [
        m2.get(j)[1] for j in range(50)]

  @pytest.mark.parametrize('kwargs,needle', [
      (dict(sources=[]), 'at least one'),
      (dict(sources=[_TaggedSource('a', 4)], weights=[1.0, 2.0]),
       'weights'),
      (dict(sources=[_TaggedSource('a', 4)], weights=[0.0]), 'positive'),
      (dict(sources=[_TaggedSource('a', 4), _TaggedSource('b', 4)],
            virtual_size=1), 'virtual_size'),
  ])
  def test_validation(self, kwargs, needle):
    with pytest.raises(ValueError, match=needle):
      data_lib.MixtureSource(**kwargs)

  def test_num_views_must_agree(self):
    a, b = _TaggedSource('a', 4), _TaggedSource('b', 4)
    b.num_views = 3
    with pytest.raises(ValueError, match='num_views'):
      data_lib.MixtureSource([a, b])

  def test_loader_integration(self, tokenizer):
    """batched_loader over a mixture: every loader feature (shuffle,
    epochs, batching) runs unchanged, and both datasets appear."""
    mix = data_lib.MixtureSource(
        [data_lib.SyntheticSource(num_examples=6, num_frames=2, size=12),
         data_lib.SyntheticSource(num_examples=6, num_frames=2, size=12,
                                  seed=9)],
        weights=[1.0, 1.0], virtual_size=12)
    batches = list(data_lib.batched_loader(
        mix, tokenizer, batch_size=4, num_epochs=1, max_text_len=8,
        num_workers=1))
    assert len(batches) == 3
    assert batches[0]['video'].shape == (4, 2, 12, 12, 3)


class TestUnlabeledLoader:

  def test_video_only_batches(self):
    source = data_lib.SyntheticSource(num_examples=10)
    batches = list(data_lib.unlabeled_loader(
        source, batch_size=4, num_epochs=1, num_workers=2))
    assert len(batches) == 2  # drop remainder
    b = batches[0]
    assert set(b.keys()) == {'video'}
    assert b['video'].shape == (4, 4, 36, 36, 3)

  def test_accum_layout_and_labeled_source_compat(self):
    # Any (clip, *) source works — labels are ignored.
    source = data_lib.SyntheticLabeledSource(num_examples=8, num_classes=3)
    batches = list(data_lib.unlabeled_loader(
        source, batch_size=2, accum_steps=2, num_epochs=1, shuffle=False,
        num_workers=1))
    assert len(batches) == 2
    assert batches[0]['video'].shape == (2, 2, 4, 36, 36, 3)
