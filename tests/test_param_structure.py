"""Param-tree structural tests mirroring the reference's leaf-count matrix.

The reference asserts exact flattened-param-leaf counts (e.g. Transformer =
17 leaves, FactorizedEncoder = 40 scan / 72 no-scan, CLIP = 88/136;
reference videoprism/layers_test.py:214, encoders_test.py:170,340).  These
counts are the checkpoint-schema contract, so we pin them too — plus a
direct tree-structure identity check against the reference module's init
when the oracle is importable.
"""

import jax
import jax.numpy as jnp
import pytest

from tests.conftest import requires_reference
from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.models import text_encoder as te

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0)


def _leaves(tree) -> int:
  return len(jax.tree.leaves(tree))


class TestLeafCounts:
  """Counts from reference videoprism tests (checkpoint-schema contract)."""

  def test_factorized_encoder(self):
    cfg = fe.FactorizedEncoderConfig(**TINY, scan=True)
    assert _leaves(init_lib.init_factorized_encoder(
        jax.random.PRNGKey(0), cfg)) == 40
    # No-scan: each stack's 16 shared leaves become 16 per layer
    # (2 spatial + 1 temporal layers here): 8 + 2*16 + 1*16 = 56.
    cfg = fe.FactorizedEncoderConfig(**TINY, scan=False)
    assert _leaves(init_lib.init_factorized_encoder(
        jax.random.PRNGKey(0), cfg)) == 56

  def test_transformer_layer(self):
    from videoprism_tpu.ops.transformer import TransformerLayerConfig

    cfg = TransformerLayerConfig(
        num_layers=1, hidden_dim=32, num_heads=2,
        enable_per_dim_scale=False)
    assert _leaves(init_lib._transformer_layer(
        jax.random.PRNGKey(0), 16, cfg)) == 16
    cfg_pds = TransformerLayerConfig(
        num_layers=1, hidden_dim=32, num_heads=2,
        enable_per_dim_scale=True)
    # Reference Transformer (with per-dim scale) = 17 leaves
    # (videoprism/layers_test.py:214).
    assert _leaves(init_lib._transformer_layer(
        jax.random.PRNGKey(0), 16, cfg_pds)) == 17

  def test_video_clip(self):
    clip_kwargs = dict(
        patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
        num_temporal_layers=1, mlp_dim=32, num_auxiliary_layers=1,
        vocabulary_size=64, enable_causal_atten=True,
        num_unimodal_layers=2, norm_policy='pre', model_dim=16,
        num_heads=2, atten_logit_cap=50.0)
    cfg = vclip.VideoCLIPConfig(**clip_kwargs, scan=True)
    # Reference: 88 leaves with scan (videoprism/encoders_test.py:340).
    assert _leaves(init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)) == 88
    # No-scan: +16 leaves per extra layer beyond 1 per stack
    # (spatial 2, temporal 1, aux 1, text 2): 88 + 16 + 0 + 0 + 16 = 120.
    cfg = vclip.VideoCLIPConfig(**clip_kwargs, scan=False)
    assert _leaves(init_lib.init_video_clip(
        jax.random.PRNGKey(0), cfg)) == 120


@requires_reference
class TestStructureIdentity:
  """Our init trees are structurally identical to the reference's."""

  @pytest.mark.parametrize('scan', [True, False])
  def test_factorized_encoder(self, scan):
    from videoprism import encoders as ref_encoders

    inputs = jnp.zeros((1, 2, 12, 12, 3))
    ref = ref_encoders.FactorizedEncoder(**TINY, scan=scan).init(
        jax.random.PRNGKey(0), inputs)['params']
    ours = init_lib.init_factorized_encoder(
        jax.random.PRNGKey(0),
        fe.FactorizedEncoderConfig(**TINY, scan=scan))
    assert jax.tree.structure(ref) == jax.tree.structure(ours)
    shapes_ref = jax.tree.map(lambda a: a.shape, ref)
    shapes_ours = jax.tree.map(lambda a: a.shape, ours)
    assert shapes_ref == shapes_ours

  def test_classifier(self):
    from videoprism import encoders as ref_encoders

    inputs = jnp.zeros((1, 2, 12, 12, 3))
    ref = ref_encoders.FactorizedVideoClassifier(
        encoder_params=dict(TINY, scan=True), num_classes=5).init(
            jax.random.PRNGKey(0), inputs)['params']
    ours = init_lib.init_video_classifier(
        jax.random.PRNGKey(0),
        vc.VideoClassifierConfig(
            encoder=fe.FactorizedEncoderConfig(**TINY, scan=True),
            num_classes=5))
    assert jax.tree.structure(ref) == jax.tree.structure(ours)

  def test_text_encoder(self):
    from videoprism import encoders as ref_encoders

    kwargs = dict(vocabulary_size=50, num_class_tokens=1, model_dim=16,
                  num_layers=2, mlp_dim=32, num_heads=2, scan=True)
    ids = jnp.zeros((1, 4), jnp.int32)
    pads = jnp.zeros((1, 4))
    ref = ref_encoders.TextEncoder(**kwargs).init(
        jax.random.PRNGKey(0), ids, pads)['params']
    ours = init_lib.init_text_encoder(
        jax.random.PRNGKey(0), te.TextEncoderConfig(**kwargs))
    assert jax.tree.structure(ref) == jax.tree.structure(ours)
