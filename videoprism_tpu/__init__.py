"""VideoPrism-TPU: a TPU-native (JAX/XLA/Pallas/pjit) VideoPrism framework.

A from-scratch rebuild of the VideoPrism video foundation-model stack
(factorized ViViT video encoders, video-text CLIP, video classification)
designed TPU-first: functional param-pytree models, scan-over-stacked-weights
transformer stacks matching the public "repeated" checkpoints, Pallas kernels
for the soft-capped attention hot path, and GSPMD sharding for multi-chip
serving and training.

Public API mirrors the reference `videoprism.models` module::

    import videoprism_tpu as vp
    model = vp.get_model('videoprism_public_v1_base')
    state = vp.load_pretrained_weights('videoprism_public_v1_base')
    fwd = jax.jit(lambda v: model.apply(state, v, train=False))
"""

__version__ = '0.1.0'

from videoprism_tpu import client, export
from videoprism_tpu.models import (
    CHECKPOINTS,
    CONFIGS,
    K400_NUM_CLASSES,
    MODEL_CONFIGS,
    MODELS,
    SSV2_NUM_CLASSES,
    TEXT_MAX_LEN,
    TEXT_TOKENIZERS,
    BoundModel,
    Model,
    get_model,
    get_model_config,
    has_model,
    load_classifier,
    load_model,
    load_pretrained_weights,
    load_text_tokenizer,
    load_video_encoder,
    tokenize_texts,
)

__all__ = [
    'CHECKPOINTS', 'CONFIGS', 'K400_NUM_CLASSES', 'MODEL_CONFIGS', 'MODELS',
    'SSV2_NUM_CLASSES', 'TEXT_MAX_LEN', 'TEXT_TOKENIZERS', 'BoundModel',
    'Model', 'client', 'export', 'get_model', 'get_model_config', 'has_model',
    'load_classifier',
    'load_model', 'load_pretrained_weights', 'load_text_tokenizer',
    'load_video_encoder', 'tokenize_texts',
]
