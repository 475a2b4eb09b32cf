"""Loading reference-converter (``*_mlx``) weight files through the public
BoundModel loaders."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu.io import mlx_compat
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.models import registry

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)


class TestMlxWeightFileLoading:

  def test_load_video_encoder_from_mlx_file(self, tmp_path, monkeypatch):
    cfg = fe.FactorizedEncoderConfig(**TINY)
    params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)

    # Simulate a reference-converter output in ./weights/.
    weights_dir = tmp_path / 'weights'
    weights_dir.mkdir()
    name = 'videoprism_public_v1_base'
    mlx_compat.save_mlx_weights(
        str(weights_dir / f'{name}_mlx.safetensors'), params)
    monkeypatch.chdir(tmp_path)

    # Swap in the tiny architecture so the loaded tree matches.
    tiny_models = {
        name: lambda: vp.Model(cfg, fe.apply,
                               init_lib.init_factorized_encoder)}
    monkeypatch.setattr(registry, 'MODELS', tiny_models)

    bound = vp.load_video_encoder(name)
    emb, _ = bound(jnp.zeros((1, 2, 12, 12, 3)), train=False)
    ref, _ = fe.apply(params, jnp.zeros((1, 2, 12, 12, 3)), cfg)
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(ref))

    # quantize='int8' through the same public loader: int8 leaves, close
    # embeddings (dequantize fallback on CPU).
    q_bound = vp.load_video_encoder(name, quantize='int8')
    assert (q_bound.params['spatial_encoder']['transformers_stack']
            ['x_layers']['self_attention']['query']['w'].dtype == jnp.int8)
    # int8 only pays on the fused path: attention_impl defaults to
    # 'flash' when quantizing, and forcing 'xla' warns.
    assert q_bound.model.config.attention_impl == 'flash'
    with pytest.warns(UserWarning, match='int8'):
      vp.load_video_encoder(name, quantize='int8', attention_impl='xla')
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 12, 12, 3))
    q_emb, _ = q_bound(video, train=False)
    r, g = (np.asarray(fe.apply(params, video, cfg)[0], np.float32).ravel(),
            np.asarray(q_emb, np.float32).ravel())
    cos = float(np.dot(g, r) / (np.linalg.norm(g) * np.linalg.norm(r)))
    assert cos > 0.995, cos
    with pytest.raises(ValueError, match='unknown quantize'):
      vp.load_video_encoder(name, quantize='fp4')
