"""End-to-end: model embeddings -> evaluation harness (retrieval protocol)."""

import jax
import jax.numpy as jnp
import numpy as np

from videoprism_tpu import evaluation
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import init as init_lib

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=1,
    num_temporal_layers=1, mlp_dim=16, num_auxiliary_layers=0,
    vocabulary_size=32, enable_causal_atten=True, num_unimodal_layers=1,
    norm_policy='pre', model_dim=8, num_heads=2, atten_logit_cap=50.0,
    scan=True)


class TestModelToEvaluation:

  def test_retrieval_metrics_from_model_embeddings(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    n = 6
    videos = jax.random.uniform(jax.random.PRNGKey(1), (n, 2, 12, 12, 3))
    ids = jax.random.randint(jax.random.PRNGKey(2), (n, 4), 0, 32)
    pads = jnp.zeros((n, 4))

    v_emb, t_emb, _ = vclip.apply(params, videos, ids, pads, cfg)
    metrics = evaluation.retrieval_metrics(
        np.asarray(v_emb), np.asarray(t_emb))
    for key in ('v2t_recall@1', 't2v_recall@1', 'v2t_median_rank'):
      assert key in metrics
      assert np.isfinite(metrics[key])
    assert 0.0 <= metrics['v2t_recall@1'] <= 1.0

  def test_zero_shot_classifier_from_text_tower(self):
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)

    def encode_texts(texts):
      # Toy "tokenizer": hash words into the tiny vocab.
      ids = np.zeros((len(texts), 4), np.int32)
      for i, t in enumerate(texts):
        for j, w in enumerate(t.split()[:4]):
          ids[i, j] = hash(w) % 32
      pads = np.zeros((len(texts), 4), np.float32)
      return np.asarray(vclip.encode_text(
          params, jnp.asarray(ids), jnp.asarray(pads), cfg))

    weights = evaluation.zero_shot_classifier(
        encode_texts, ['running', 'swimming'], batch_size=3)
    assert weights.shape == (2, 8)

    videos = jax.random.uniform(jax.random.PRNGKey(3), (3, 2, 12, 12, 3))
    v_emb, _, _ = vclip.apply(params, videos, None, None, cfg)
    scores = np.asarray(v_emb) @ weights.T
    acc = evaluation.classification_accuracy(
        scores, np.zeros(3, np.int64), ks=(1,))
    assert 0.0 <= acc['top1_accuracy'] <= 1.0
