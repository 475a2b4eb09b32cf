"""MLX weight-format interop: export/import roundtrip + format facts.

The exported flat dict must follow the reference converter's conventions
(reference convert_weights.py:88-104, 165-202): unstacked ``layers/{i}``
paths, ``kernel|scale|emb_var -> weight`` renames, attention ``w``/``b``
untouched.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from videoprism_tpu.io import mlx_compat
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import init as init_lib

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=3,
    num_temporal_layers=2, mlp_dim=32, num_auxiliary_layers=1,
    vocabulary_size=64, enable_causal_atten=True, num_unimodal_layers=2,
    norm_policy='pre', model_dim=16, num_heads=2, atten_logit_cap=50.0,
    scan=True)


def _params():
  cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
  return init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)


class TestMlxExportFormat:

  def test_key_conventions(self):
    flat = mlx_compat.export_mlx_weights(_params())
    keys = set(flat)
    # Unstacked per-layer paths with the reference's names.
    assert ('vision_encoder/spatial_encoder/transformers_stack/layers/0/'
            'self_attention/query/w') in keys
    assert ('vision_encoder/spatial_encoder/transformers_stack/layers/2/'
            'ff_layer/ffn_layer1/linear/weight') in keys
    # kernel/scale/emb_var all become weight.
    assert 'vision_encoder/patch_projection/linear/weight' in keys
    assert 'vision_encoder/spatial_ln/weight' in keys
    assert 'vision_encoder/spatial_pos_emb/weight' in keys
    assert 'text_encoder/token_emb/weight' in keys
    # No stacked or renamed leftovers.
    assert not any('/x_layers/' in k for k in keys)
    assert not any(k.endswith('/kernel') or k.endswith('/scale')
                   or k.endswith('/emb_var') for k in keys)
    # Unstacked shapes: per-layer (no leading layer axis).
    q = flat['vision_encoder/spatial_encoder/transformers_stack/layers/0/'
             'self_attention/query/w']
    assert q.shape == (16, 2, 8)

  def test_roundtrip_identity(self):
    params = _params()
    flat = mlx_compat.export_mlx_weights(params)
    restored = mlx_compat.import_mlx_weights(flat)
    assert jax.tree.structure(jax.tree.map(np.asarray, params)) == (
        jax.tree.structure(restored))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
      np.testing.assert_array_equal(np.asarray(a), b)

  def test_file_roundtrip(self):
    params = _params()
    with tempfile.TemporaryDirectory() as tmp:
      for fname in ('w_mlx.npz', 'w_mlx.safetensors'):
        path = os.path.join(tmp, fname)
        meta = os.path.join(tmp, fname + '.json')
        mlx_compat.save_mlx_weights(
            path, params, model_name='tiny', metadata_path=meta)
        restored = mlx_compat.load_mlx_weights(path)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
          np.testing.assert_array_equal(np.asarray(a), b)
        assert os.path.exists(meta)

  def test_imported_weights_run(self):
    """MLX-format file -> our tree -> forward parity with the original."""
    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
    restored = jax.tree.map(
        jnp.asarray,
        mlx_compat.import_mlx_weights(mlx_compat.export_mlx_weights(params)))
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 12, 12, 3))
    ref_v, _, _ = vclip.apply(params, video, None, None, cfg)
    got_v, _, _ = vclip.apply(restored, video, None, None, cfg)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
