"""Model architectures and the public registry/loader API."""

from videoprism_tpu.models import classifier
from videoprism_tpu.models import clip
from videoprism_tpu.models import factorized_encoder
from videoprism_tpu.models import init
from videoprism_tpu.models import text_encoder
from videoprism_tpu.models.registry import (
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
    'classifier', 'clip', 'factorized_encoder', 'init', 'text_encoder',
    'CHECKPOINTS', 'CONFIGS', 'K400_NUM_CLASSES', 'MODEL_CONFIGS', 'MODELS',
    'SSV2_NUM_CLASSES', 'TEXT_MAX_LEN', 'TEXT_TOKENIZERS', 'BoundModel',
    'Model', 'get_model', 'get_model_config', 'has_model', 'load_classifier',
    'load_model', 'load_pretrained_weights', 'load_text_tokenizer',
    'load_video_encoder', 'tokenize_texts',
]
