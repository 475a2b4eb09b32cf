"""Parity under trained-checkpoint-like weight statistics.

Random inits understate the numerical stress of real checkpoints: trained
LayerNorm scales sit far from the 0.0 init (the (scale+1) convention),
and trained attention logits drive the tanh soft-cap into saturation —
exactly where the reference's own MLX port needed debugging
(reference FLAX_TO_MLX_CONVERSION_GUIDE.md:307-358).  These tests rescale
random weights to those statistics and re-check oracle parity, plus a
bf16-vs-fp32 error budget at real depth.  What still requires network
access (the actual HF checkpoints) is tracked in WEIGHTS-VALIDATION.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.conftest import requires_reference
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe

TINY_ENCODER = dict(
    patch_size=6,
    pos_emb_shape=(2, 2, 2),
    model_dim=16,
    num_spatial_layers=2,
    num_temporal_layers=1,
    num_heads=2,
    mlp_dim=32,
    atten_logit_cap=50.0,
)

TINY_CLIP = dict(
    **TINY_ENCODER,
    num_auxiliary_layers=1,
    vocabulary_size=64,
    enable_causal_atten=True,
    num_unimodal_layers=2,
    norm_policy='pre',
    scan=True,
)


def _trained_like(params, seed=0, qk_gain=8.0, ln_scale_std=0.6,
                  ln_bias_std=0.3):
  """Rescales a random init toward trained-checkpoint statistics.

  * LayerNorm scales move off their 0.0 init (so (scale+1) is exercised
    at realistic O(1) spread) and biases off 0;
  * query/key projections are amplified so attention logits reach the
    tanh-cap saturation region (|logits| >~ cap);
  * everything else is left at init scale.
  """
  rng = np.random.default_rng(seed)

  def visit(path, leaf):
    name = '/'.join(str(p) for p in path)
    arr = np.asarray(leaf)
    if 'scale' in name:
      return jnp.asarray(
          rng.normal(0.0, ln_scale_std, arr.shape).astype(arr.dtype))
    if name.endswith('bias') and arr.ndim == 1 and 'layer_norm' in name:
      return jnp.asarray(
          rng.normal(0.0, ln_bias_std, arr.shape).astype(arr.dtype))
    if ('query/w' in name) or ('key/w' in name):
      return leaf * qk_gain
    return leaf

  from jax.tree_util import tree_map_with_path, keystr

  return tree_map_with_path(
      lambda p, leaf: visit([keystr((k,), simple=True) for k in p], leaf),
      params)


def _saturation_fraction(params, inputs, cfg):
  """Fraction of spatial-attention logits past 0.8x the cap (sanity that
  the rescale actually reaches the saturation regime)."""
  from videoprism_tpu.ops import basic
  from videoprism_tpu.ops import embeddings as emb_lib

  b, t, h, w, c = inputs.shape
  patches = emb_lib.image_to_patch(
      inputs.reshape(b * t, h, w, c), cfg.patch_size)
  x = basic.feed_forward(
      params['patch_projection'], patches, activation='identity')
  layer = jax.tree.map(
      lambda a: a[0],
      params['spatial_encoder']['transformers_stack']['x_layers'])
  normed = basic.layer_norm(layer['layer_norm'], x)
  q = jnp.einsum('bnd,dNH->bnNH', normed, layer['self_attention']['query']['w'])
  k = jnp.einsum('bnd,dNH->bnNH', normed, layer['self_attention']['key']['w'])
  hdim = q.shape[-1]
  logits = jnp.einsum('bTNH,bSNH->bNTS', q * hdim ** -0.5, k)
  return float(jnp.mean(jnp.abs(logits) > 0.8 * cfg.atten_logit_cap))


@requires_reference
class TestTrainedStatsParity:

  def test_encoder_parity_under_saturation(self):
    """Oracle parity holds with saturated soft-cap logits and O(1) LN
    scales — the regime real checkpoints operate in."""
    from videoprism import encoders as ref_encoders

    inputs = jax.random.uniform(jax.random.PRNGKey(3), (2, 2, 12, 12, 3))
    mod = ref_encoders.FactorizedEncoder(**TINY_ENCODER, scan=True)
    variables = mod.init(jax.random.PRNGKey(0), inputs)
    params = _trained_like(jax.tree.map(jnp.asarray, variables['params']))

    cfg = fe.FactorizedEncoderConfig(**TINY_ENCODER, scan=True)
    frac = _saturation_fraction(params, inputs, cfg)
    assert frac > 0.1, f'rescale failed to reach saturation ({frac=})'

    ref_emb, _ = mod.apply({'params': params}, inputs, train=False)
    got_emb, _ = fe.apply(params, inputs, cfg)
    assert np.isfinite(np.asarray(got_emb)).all()
    np.testing.assert_allclose(got_emb, ref_emb, atol=1e-5)

  def test_clip_parity_under_trained_stats(self):
    from videoprism import encoders as ref_encoders

    video = jax.random.uniform(jax.random.PRNGKey(4), (2, 2, 12, 12, 3))
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 5), 0, 64)
    pads = jnp.zeros((2, 5)).at[0, -2:].set(1.0)

    mod = ref_encoders.FactorizedVideoCLIP(**TINY_CLIP)
    variables = mod.init(jax.random.PRNGKey(0), video, ids, pads)
    params = _trained_like(jax.tree.map(jnp.asarray, variables['params']))

    ref_v, ref_t, _ = mod.apply(
        {'params': params}, video, ids, pads, train=False)
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    got_v, got_t, _ = vclip.apply(params, video, ids, pads, cfg)
    np.testing.assert_allclose(got_v, ref_v, atol=1e-5)
    np.testing.assert_allclose(got_t, ref_t, atol=1e-5)


class TestBf16ErrorBudget:

  def test_full_depth_bf16_vs_fp32(self):
    """bf16 fprop at real base depth (12+4 layers, D=768) under
    trained-like statistics: l2-normalized video embeddings must stay
    within the production error budget of the fp32 path.

    Budget: cosine similarity > 0.995 and max |Δ| < 0.05 on unit-norm
    embeddings — comfortably inside the margin retrieval metrics tolerate
    (the reference's own Flax<->MLX gate is 1e-3 on *normalized* embeddings
    only because both sides run fp32; bf16 serving trades this accuracy
    for 2x throughput, and this test pins how much).
    """
    base = dict(
        patch_size=18, pos_emb_shape=(16, 16, 16), model_dim=768,
        num_spatial_layers=12, num_temporal_layers=4, num_heads=12,
        mlp_dim=3072, atten_logit_cap=50.0, scan=True)
    cfg32 = fe.FactorizedEncoderConfig(**base, dtype=jnp.float32)
    from videoprism_tpu.models import init as init_lib

    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg32)
    params = _trained_like(params, qk_gain=4.0)
    # 4 frames at 144p (pos-emb interpolation path) keeps CPU time sane
    # while preserving full depth and width.
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 144, 144, 3))

    emb32, _ = fe.apply(params, video, cfg32)
    cfg16 = fe.FactorizedEncoderConfig(**base, dtype=jnp.bfloat16)
    emb16, _ = fe.apply(params, video, cfg16)

    def unit(x):
      x = np.asarray(x, np.float32).reshape(-1)
      return x / np.linalg.norm(x)

    a, b = unit(emb32), unit(emb16)
    cos = float(a @ b)
    max_abs = float(np.abs(a - b).max())
    assert cos > 0.995, cos
    assert max_abs < 0.05, max_abs
