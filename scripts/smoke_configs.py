"""Shared tiny smoke-test architectures for the CLI scripts.

One source of truth for the ``--tiny`` geometries (the configs had begun
to drift between sibling scripts): a 2-frame 12x12 clip through a
2-spatial/1-temporal stack at model_dim 16.  Tests and CLIs that need
"the tiny model" import from here.
"""

TINY_ENC = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
    num_temporal_layers=1, mlp_dim=32, model_dim=16, num_heads=2,
    atten_logit_cap=50.0, scan=True)

TINY_CLIP = dict(
    **TINY_ENC, num_auxiliary_layers=1, enable_causal_atten=True,
    num_unimodal_layers=2, norm_policy='pre', vocabulary_size=1000)

# The [T, H, W, C] clip shape the tiny models expect.
TINY_CLIP_SHAPE = (2, 12, 12, 3)
