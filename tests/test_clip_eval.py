"""CLIP evaluation loops (train/eval_loop.py): retrieval + zero-shot sweeps
match direct single-batch computation through the same towers (padding /
batching must be invisible)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoprism_tpu import assets, evaluation
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.models import registry
from videoprism_tpu.train import (
    data as data_lib,
    evaluate_retrieval,
    evaluate_zero_shot,
)

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
    num_temporal_layers=1, mlp_dim=16, num_auxiliary_layers=0,
    vocabulary_size=1024, enable_causal_atten=True, num_unimodal_layers=1,
    norm_policy='pre', model_dim=8, num_heads=2, atten_logit_cap=50.0,
    scan=True)
MAX_LEN = 12


def _setup():
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
  tok = SentencePieceTokenizer(assets.test_spm_path())
  return cfg, params, tok


def _direct_embeddings(params, cfg, tok, source):
  """One unbatched forward per tower — the oracle for the sweeps."""
  n = len(source)
  videos = np.stack([source.get(i)[0] for i in range(n)])
  texts = [source.get(i)[1] for i in range(n)]
  ids, pads = registry.tokenize_texts(tok, texts, max_length=MAX_LEN)
  v, t, _ = vclip.apply(params, jnp.asarray(videos), jnp.asarray(ids),
                        jnp.asarray(pads), cfg, train=False)
  return np.asarray(v, np.float32), np.asarray(t, np.float32)


class TestEvaluateRetrieval:

  def test_matches_direct_forward_with_tail_padding(self):
    """7 pairs at video batch 4 / text batch 3 == one unbatched forward."""
    cfg, params, tok = _setup()
    source = data_lib.SyntheticSource(num_examples=7, num_frames=2, size=12)
    metrics = evaluate_retrieval(
        params, cfg, source, tok, batch_size=4, text_batch_size=3,
        max_text_len=MAX_LEN)
    assert metrics['num_pairs'] == 7

    v, t = _direct_embeddings(params, cfg, tok, source)
    expected = evaluation.retrieval_metrics(v, t)
    for k, val in expected.items():
      np.testing.assert_allclose(metrics[k], val, atol=1e-6, err_msg=k)

  def test_rank5_sharding_reaches_text_sweep(self):
    """The train CLI passes data_sharding(mesh, 5) for the videos; the
    rank-2 text sweep must adapt it instead of crashing device_put
    (regression: multi-device --eval-every died at the first eval)."""
    from videoprism_tpu.parallel import mesh as mesh_lib

    cfg, params, tok = _setup()
    mesh = mesh_lib.make_mesh()  # all 8 virtual devices on 'data'
    source = data_lib.SyntheticSource(num_examples=8, num_frames=2,
                                      size=12)
    metrics = evaluate_retrieval(
        params, cfg, source, tok, batch_size=8, max_text_len=MAX_LEN,
        sharding=mesh_lib.data_sharding(mesh, 5))
    base = evaluate_retrieval(
        params, cfg, source, tok, batch_size=8, max_text_len=MAX_LEN)
    for k, val in base.items():
      np.testing.assert_allclose(metrics[k], val, atol=1e-5, err_msg=k)

  def test_self_retrieval_is_perfect(self):
    """Querying video embeddings against themselves: R@1 == 1."""
    cfg, params, tok = _setup()
    source = data_lib.SyntheticSource(num_examples=5, num_frames=2, size=12)
    v, _ = _direct_embeddings(params, cfg, tok, source)
    m = evaluation.retrieval_metrics(v, v)
    assert m['v2t_recall@1'] == 1.0 and m['t2v_median_rank'] == 1.0


class TestEvaluateZeroShot:

  def test_matches_direct_forward(self):
    cfg, params, tok = _setup()
    names = ['running', 'swimming', 'playing drums']
    source = data_lib.SyntheticLabeledSource(
        num_examples=6, num_frames=2, size=12, num_classes=len(names))
    metrics = evaluate_zero_shot(
        params, cfg, source, tok, names, batch_size=4,
        max_text_len=MAX_LEN)
    assert metrics['num_classes'] == 3 and metrics['num_examples'] == 6

    def encode(texts):
      ids, pads = registry.tokenize_texts(tok, list(texts),
                                          max_length=MAX_LEN)
      return np.asarray(vclip.encode_text(
          params, jnp.asarray(ids), jnp.asarray(pads), cfg, train=False),
          np.float32)

    weights = evaluation.zero_shot_classifier(encode, names)
    videos = np.stack([source.get(i)[0] for i in range(6)])
    labels = np.asarray([source.get(i)[1] for i in range(6)], np.int64)
    v, _, _ = vclip.apply(params, jnp.asarray(videos), None, None, cfg,
                          train=False)
    expected = evaluation.classification_accuracy(
        np.asarray(v, np.float32) @ weights.T, labels)
    assert metrics['top1_accuracy'] == expected['top1_accuracy']
    assert metrics['top5_accuracy'] == expected['top5_accuracy']


class TestVideoTextManifest:

  def test_from_manifest_tab_and_comma(self, tmp_path):
    p = tmp_path / 'pairs.tsv'
    p.write_text('a.mp4\ta person running, fast\nb.mp4,drumming on water\n')
    src = data_lib.VideoTextSource.from_manifest(str(p), num_frames=2)
    assert src.video_paths == ['a.mp4', 'b.mp4']
    assert src.captions == ['a person running, fast', 'drumming on water']


class TestBestTracker:

  def test_reports_improvements_only(self):
    from videoprism_tpu.train.eval_loop import BestTracker

    t = BestTracker('top1_accuracy')  # max mode inferred
    assert t.update({'top1_accuracy': 0.5})      # first value = best
    assert not t.update({'top1_accuracy': 0.4})  # worse
    assert not t.update({'top1_accuracy': 0.5})  # equal: not improved
    assert t.update({'top1_accuracy': 0.6})
    assert t.best == 0.6
    # Many stale evals never flip it back (unlike EarlyStopper there is
    # no patience semantics to trip).
    for _ in range(5):
      assert not t.update({'top1_accuracy': 0.1})
    assert t.best == 0.6

  def test_min_mode_for_loss(self):
    from videoprism_tpu.train.eval_loop import BestTracker

    t = BestTracker('eval_loss')
    assert t.update({'eval_loss': 2.0})
    assert t.update({'eval_loss': 1.5})
    assert not t.update({'eval_loss': 1.9})
    assert t.best == 1.5

  def test_keep_best_cli_writes_best_dir(self, tmp_path):
    """train_clip --keep-best snapshots <dir>/best on eval improvement
    (end-to-end, tiny synthetic)."""
    import os
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env['PYTHONPATH'] = str(root) + os.pathsep + env.get('PYTHONPATH', '')
    ckpt_dir = tmp_path / 'ck'
    res = subprocess.run(
        [sys.executable, str(root / 'scripts' / 'train_clip.py'),
         '--synthetic', '--tiny', '--steps', '4', '--batch-size', '2',
         '--eval-every', '2', '--keep-best', '--cpu-devices', '1',
         '--checkpoint-dir', str(ckpt_dir)],
        capture_output=True, text=True, timeout=600, env=env)
    assert res.returncode == 0, res.stdout[-1500:] + res.stderr[-1500:]
    best = ckpt_dir / 'best'
    assert best.is_dir() and any(best.iterdir()), list(ckpt_dir.iterdir())
    # The run log records the best_checkpoint event.
    logs = list(ckpt_dir.glob('*.jsonl'))
    assert logs and 'best_checkpoint' in logs[0].read_text()


class TestEarlyStopper:

  def test_max_mode_default_and_patience(self):
    from videoprism_tpu.train.eval_loop import EarlyStopper

    s = EarlyStopper('top1_accuracy', patience=2)
    assert not s.update({'top1_accuracy': 0.5})
    assert not s.update({'top1_accuracy': 0.6})   # improved
    assert not s.update({'top1_accuracy': 0.6})   # stale 1
    assert s.update({'top1_accuracy': 0.55})      # stale 2 -> stop
    assert s.best == 0.6

  def test_min_mode_inferred_for_loss(self):
    from videoprism_tpu.train.eval_loop import EarlyStopper

    s = EarlyStopper('loss', patience=1)
    assert s.mode == 'min'
    assert not s.update({'loss': 2.0})
    assert not s.update({'loss': 1.0})
    assert s.update({'loss': 1.5})

  def test_rank_metrics_minimize(self):
    from videoprism_tpu.train.eval_loop import EarlyStopper

    assert EarlyStopper('t2v_median_rank', patience=1).mode == 'min'
    assert EarlyStopper('t2v_recall@1', patience=1).mode == 'max'

  def test_missing_metric_is_loud(self):
    from videoprism_tpu.train.eval_loop import EarlyStopper

    s = EarlyStopper('nope', patience=1)
    with pytest.raises(KeyError, match='nope'):
      s.update({'top1_accuracy': 1.0})

  def test_validation(self):
    from videoprism_tpu.train.eval_loop import EarlyStopper

    with pytest.raises(ValueError, match='patience'):
      EarlyStopper('x', patience=0)
    with pytest.raises(ValueError, match='mode'):
      EarlyStopper('x', patience=1, mode='sideways')
