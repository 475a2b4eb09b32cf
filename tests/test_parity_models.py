"""Model-level numerical parity vs the reference Flax oracle.

Strategy (SURVEY.md §4): initialize the reference module, feed the *same*
parameter tree to this framework's functional apply, and require max-abs-diff
well under the 1e-4 production parity budget.  Uses small configs so the
whole suite runs on CPU in seconds; tiny-vs-large only changes widths, not
code paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.conftest import requires_reference
from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import text_encoder as te

TOL = 1e-5

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


def _params(variables):
  return jax.tree.map(jnp.asarray, variables['params'])


def _video(b=2, t=2, hw=12, seed=3):
  return jax.random.uniform(jax.random.PRNGKey(seed), (b, t, hw, hw, 3))


class TestConvPatchEmbed:
  """The flash-impl conv patch embed (strided conv == rearrange+matmul by
  linearity) must agree with the reference-exact rearrange path."""

  def test_conv_equals_rearrange(self):
    import dataclasses

    inputs = _video(b=2, t=2, hw=12)
    cfg = fe.FactorizedEncoderConfig(**TINY_ENCODER, scan=True)
    from videoprism_tpu.models import init as init_lib

    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
    ref, _ = fe.apply(params, inputs, cfg)  # xla: rearrange + matmul
    got, _ = fe.apply(
        params, inputs,
        dataclasses.replace(cfg, attention_impl='flash'))  # conv embed
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@requires_reference
class TestFactorizedEncoderParity:

  @pytest.mark.parametrize('scan', [True, False])
  def test_forward(self, scan):
    from videoprism import encoders as ref_encoders

    inputs = _video()
    mod = ref_encoders.FactorizedEncoder(**TINY_ENCODER, scan=scan)
    variables = mod.init(jax.random.PRNGKey(0), inputs)
    params = _params(variables)

    ref_emb, ref_out = mod.apply({'params': params}, inputs, train=False)
    cfg = fe.FactorizedEncoderConfig(**TINY_ENCODER, scan=scan)
    got_emb, got_out = fe.apply(params, inputs, cfg)

    assert got_emb.shape == ref_emb.shape == (2, 2 * 4, 16)
    np.testing.assert_allclose(got_emb, ref_emb, atol=TOL)
    assert not ref_out and not got_out

  def test_intermediates_and_paddings(self):
    from videoprism import encoders as ref_encoders

    inputs = _video()
    frame_paddings = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    mod = ref_encoders.FactorizedEncoder(**TINY_ENCODER, scan=True)
    variables = mod.init(jax.random.PRNGKey(0), inputs)
    params = _params(variables)

    ref_emb, ref_out = mod.apply(
        {'params': params}, inputs, train=False,
        return_intermediate={'spatial_features'},
        frame_paddings=frame_paddings)
    cfg = fe.FactorizedEncoderConfig(**TINY_ENCODER, scan=True)
    got_emb, got_out = fe.apply(
        params, inputs, cfg, return_intermediate={'spatial_features'},
        frame_paddings=frame_paddings)

    np.testing.assert_allclose(got_emb, ref_emb, atol=TOL)
    np.testing.assert_allclose(
        got_out['spatial_features'], ref_out['spatial_features'], atol=TOL)

  def test_pos_emb_interpolation(self):
    """Input grid (3x3 patches, 4 frames) differs from pos_emb_shape (2,2,2):
    exercises the 2-D and 1-D bilinear pos-emb resize paths."""
    from videoprism import encoders as ref_encoders

    inputs = _video(b=1, t=4, hw=18)
    mod = ref_encoders.FactorizedEncoder(**TINY_ENCODER, scan=True)
    variables = mod.init(jax.random.PRNGKey(0), inputs)
    params = _params(variables)

    ref_emb, _ = mod.apply({'params': params}, inputs, train=False)
    cfg = fe.FactorizedEncoderConfig(**TINY_ENCODER, scan=True)
    got_emb, _ = fe.apply(params, inputs, cfg)

    assert got_emb.shape == (1, 4 * 9, 16)
    np.testing.assert_allclose(got_emb, ref_emb, atol=TOL)


@requires_reference
class TestTextEncoderParity:

  def test_forward(self):
    from videoprism import encoders as ref_encoders

    ids = jnp.array([[5, 9, 2, 0, 0], [7, 1, 4, 8, 0]], dtype=jnp.int32)
    paddings = jnp.array([[0., 0., 0., 1., 1.], [0., 0., 0., 0., 1.]])
    kwargs = dict(
        vocabulary_size=50, num_class_tokens=1, enable_causal_atten=True,
        model_dim=16, num_layers=2, mlp_dim=32, num_heads=2,
        atten_logit_cap=50.0, scan=True)
    mod = ref_encoders.TextEncoder(**kwargs)
    variables = mod.init(jax.random.PRNGKey(0), ids, paddings)
    params = _params(variables)

    ref = mod.apply({'params': params}, ids, paddings, train=False)
    cfg = te.TextEncoderConfig(**kwargs)
    got = te.apply(params, ids, paddings, cfg)

    assert got.shape == (2, 6, 16)
    np.testing.assert_allclose(got, ref, atol=TOL)


TINY_CLIP = dict(
    patch_size=6,
    pos_emb_shape=(2, 2, 2),
    num_spatial_layers=2,
    num_temporal_layers=1,
    mlp_dim=32,
    num_auxiliary_layers=1,
    vocabulary_size=50,
    enable_causal_atten=True,
    num_unimodal_layers=2,
    norm_policy='pre',
    model_dim=16,
    num_heads=2,
    atten_logit_cap=50.0,
    scan=True,
)


@requires_reference
class TestVideoCLIPParity:

  def test_both_towers(self):
    from videoprism import encoders as ref_encoders

    inputs = _video()
    ids = jnp.array([[5, 9, 2, 0], [7, 1, 4, 8]], dtype=jnp.int32)
    paddings = jnp.array([[0., 0., 1., 1.], [0., 0., 0., 0.]])

    mod = ref_encoders.FactorizedVideoCLIP(**TINY_CLIP)
    variables = mod.init(jax.random.PRNGKey(0), inputs, ids, paddings)
    params = _params(variables)

    ref_v, ref_t, ref_out = mod.apply(
        {'params': params}, inputs, ids, paddings, train=False,
        return_intermediate={'frame_embeddings', 'spatiotemporal_features'})
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    got_v, got_t, got_out = vclip.apply(
        params, inputs, ids, paddings, cfg,
        return_intermediate={'frame_embeddings', 'spatiotemporal_features'})

    assert got_v.shape == ref_v.shape == (2, 16)
    assert got_t.shape == ref_t.shape == (2, 16)
    np.testing.assert_allclose(got_v, ref_v, atol=TOL)
    np.testing.assert_allclose(got_t, ref_t, atol=TOL)
    np.testing.assert_allclose(
        got_out['frame_embeddings'], ref_out['frame_embeddings'], atol=TOL)
    np.testing.assert_allclose(
        got_out['spatiotemporal_features'],
        ref_out['spatiotemporal_features'], atol=TOL)
    # l2-normalized embeddings.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(got_v), axis=-1), 1.0, atol=1e-5)

  def test_unnormalized_and_frame_paddings(self):
    from videoprism import encoders as ref_encoders

    inputs = _video()
    frame_paddings = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    mod = ref_encoders.FactorizedVideoCLIP(**TINY_CLIP)
    variables = mod.init(jax.random.PRNGKey(0), inputs, None, None)
    params = _params(variables)
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)

    ref_v, _, _ = mod.apply(
        {'params': params}, inputs, None, None, train=False,
        normalize=False, frame_paddings=frame_paddings)
    got_v, _, _ = vclip.apply(
        params, inputs, None, None, cfg, normalize=False,
        frame_paddings=frame_paddings)
    np.testing.assert_allclose(got_v, ref_v, atol=TOL)
    # Unnormalized embeddings are not unit-norm.
    norms = np.linalg.norm(np.asarray(got_v), axis=-1)
    assert not np.allclose(norms, 1.0)

  def test_single_modality(self):
    from videoprism import encoders as ref_encoders

    inputs = _video(b=1)
    ids = jnp.array([[5, 9, 2, 0]], dtype=jnp.int32)
    paddings = jnp.array([[0., 0., 1., 1.]])

    mod = ref_encoders.FactorizedVideoCLIP(**TINY_CLIP)
    variables = mod.init(jax.random.PRNGKey(0), inputs, ids, paddings)
    params = _params(variables)
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)

    got_v, got_t, _ = vclip.apply(params, inputs, None, None, cfg)
    ref_v, ref_t, _ = mod.apply(
        {'params': params}, inputs, None, None, train=False)
    assert got_t is None and ref_t is None
    np.testing.assert_allclose(got_v, ref_v, atol=TOL)

    got_v2, got_t2, _ = vclip.apply(params, None, ids, paddings, cfg)
    ref_v2, ref_t2, _ = mod.apply(
        {'params': params}, None, ids, paddings, train=False)
    assert got_v2 is None and ref_v2 is None
    np.testing.assert_allclose(got_t2, ref_t2, atol=TOL)


@requires_reference
class TestClassifierParity:

  def test_forward(self):
    from videoprism import encoders as ref_encoders

    inputs = _video()
    mod = ref_encoders.FactorizedVideoClassifier(
        encoder_params=dict(TINY_ENCODER, scan=True), num_classes=7)
    variables = mod.init(jax.random.PRNGKey(0), inputs)
    params = _params(variables)

    ref_logits, ref_out = mod.apply(
        {'params': params}, inputs, train=False,
        return_intermediate={'global_embeddings'})
    cfg = vc.VideoClassifierConfig(
        encoder=fe.FactorizedEncoderConfig(**TINY_ENCODER, scan=True),
        num_classes=7)
    got_logits, got_out = vc.apply(
        params, inputs, cfg, return_intermediate={'global_embeddings'})

    assert got_logits.shape == (2, 7)
    np.testing.assert_allclose(got_logits, ref_logits, atol=TOL)
    np.testing.assert_allclose(
        got_out['global_embeddings'], ref_out['global_embeddings'], atol=TOL)


class TestBf16TextTower:

  def test_bf16_scan_carry_with_fp32_paddings(self):
    """Regression: fp32 text paddings must not promote bf16 activations
    inside the FFN (it broke the scan carry's dtype invariance)."""
    import jax.numpy as jnp

    kwargs = dict(
        vocabulary_size=50, num_class_tokens=1, enable_causal_atten=True,
        model_dim=16, num_layers=2, mlp_dim=32, num_heads=2,
        atten_logit_cap=50.0, scan=True, dtype=jnp.bfloat16)
    from videoprism_tpu.models import init as init_lib

    cfg = te.TextEncoderConfig(**kwargs)
    params = init_lib.init_text_encoder(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[5, 9, 2, 0]], dtype=jnp.int32)
    paddings = jnp.array([[0., 0., 1., 1.]], jnp.float32)  # fp32 on purpose
    out = te.apply(params, ids, paddings, cfg)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()
