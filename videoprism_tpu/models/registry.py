"""Model registry and the public loader API.

Preserves the reference's public surface verbatim — both the Flax side
(``get_model`` / ``load_pretrained_weights`` / ``load_text_tokenizer`` /
``tokenize_texts`` / ``has_model`` / ``MODELS`` / ``CONFIGS`` /
``CHECKPOINTS``; reference videoprism/models.py) and the native-tier side
(``load_model`` / ``load_video_encoder`` / ``load_classifier`` /
``MODEL_CONFIGS`` / ``get_model_config``; reference
videoprism/models_mlx.py) — on top of the functional TPU stack.

``get_model`` returns a :class:`Model` handle whose ``.apply(variables, ...)``
matches the reference Flax calling convention, so the README recipe

    model = get_model(name); state = load_pretrained_weights(name)
    jax.jit(lambda v: model.apply(state, v, train=False))(video)

works unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
from collections.abc import Callable, Mapping, Sequence
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from videoprism_tpu.io import checkpoints as ckpt_lib
from videoprism_tpu.io import text as text_lib
from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.models import text_encoder as te

Array = jax.Array

K400_NUM_CLASSES: int = 400
SSV2_NUM_CLASSES: int = 174

TEXT_MAX_LEN: int = 64
TEXT_TOKENIZERS = {
    'c4_en': {
        'model_path': 'gs://t5-data/vocabs/cc_en.32000/sentencepiece.model',
        'vocab_size': 32_000,
    },
}

# HuggingFace checkpoints: (repository, filename).  Same artifacts as the
# reference (videoprism/models.py:62-80) — the "repeated" scan-stacked npz
# files map 1:1 onto this framework's param trees.
CHECKPOINTS = {
    'videoprism_public_v1_base': (
        'google/videoprism-base-f16r288',
        'flax_base_f16r288_repeated.npz',
    ),
    'videoprism_public_v1_large': (
        'google/videoprism-large-f8r288',
        'flax_large_f8r288_repeated.npz',
    ),
    'videoprism_lvt_public_v1_base': (
        'google/videoprism-lvt-base-f16r288',
        'flax_lvt_base_f16r288_repeated.npz',
    ),
    'videoprism_lvt_public_v1_large': (
        'google/videoprism-lvt-large-f8r288',
        'flax_lvt_large_f8r288_repeated.npz',
    ),
}

# Architecture hyperparameters, identical to reference
# videoprism/models.py:82-161.
CONFIGS = {
    'videoprism_v1_base': dict(
        patch_size=18,
        pos_emb_shape=(16, 16, 16),
        model_dim=768,
        num_spatial_layers=12,
        num_temporal_layers=4,
        num_heads=12,
        mlp_dim=3072,
        atten_logit_cap=50.0,
        scan=True,
    ),
    'videoprism_v1_large': dict(
        patch_size=18,
        pos_emb_shape=(8, 16, 16),
        model_dim=1024,
        num_spatial_layers=24,
        num_temporal_layers=4,
        num_heads=16,
        mlp_dim=4096,
        atten_logit_cap=50.0,
        scan=True,
    ),
    'videoprism_v1_giant': dict(
        patch_size=18,
        pos_emb_shape=(8, 16, 16),
        model_dim=1408,
        num_spatial_layers=40,
        num_temporal_layers=4,
        num_heads=16,
        mlp_dim=6144,
        atten_logit_cap=50.0,
        scan=True,
    ),
    'videoprism_lvt_v1_base': dict(
        patch_size=18,
        pos_emb_shape=(16, 16, 16),
        num_spatial_layers=12,
        num_temporal_layers=4,
        mlp_dim=3072,
        num_auxiliary_layers=2,
        enable_causal_atten=True,
        num_unimodal_layers=12,
        norm_policy='pre',
        model_dim=768,
        num_heads=12,
        atten_logit_cap=50.0,
        scan=True,
    ),
    'videoprism_lvt_v1_large': dict(
        patch_size=18,
        pos_emb_shape=(8, 16, 16),
        num_spatial_layers=24,
        num_temporal_layers=4,
        mlp_dim=4096,
        num_auxiliary_layers=2,
        enable_causal_atten=True,
        num_unimodal_layers=12,
        norm_policy='pre',
        model_dim=1024,
        num_heads=16,
        atten_logit_cap=50.0,
        scan=True,
    ),
    'videoprism_lvt_v1_giant': dict(
        patch_size=18,
        pos_emb_shape=(8, 16, 16),
        num_spatial_layers=40,
        num_temporal_layers=4,
        mlp_dim=6144,
        num_auxiliary_layers=2,
        enable_causal_atten=True,
        num_unimodal_layers=16,
        norm_policy='primer_hybrid',
        model_dim=1408,
        num_heads=16,
        atten_logit_cap=50.0,
        scan=True,
    ),
}

# Convenience alias retained for users of the reference's native tier
# (reference videoprism/models_mlx.py:14-69).  Unlike the reference, the
# public-name configs here are complete (including `scan`).
MODEL_CONFIGS = {
    'videoprism_public_v1_base': dict(CONFIGS['videoprism_v1_base']),
    'videoprism_public_v1_large': dict(CONFIGS['videoprism_v1_large']),
    'videoprism_lvt_public_v1_base': dict(
        CONFIGS['videoprism_lvt_v1_base'], vocabulary_size=32_000),
    'videoprism_lvt_public_v1_large': dict(
        CONFIGS['videoprism_lvt_v1_large'], vocabulary_size=32_000),
}


def get_model_config(model_name: str) -> dict:
  """Returns a copy of the public-name config dict.

  Reference: videoprism/models_mlx.py:72-88.
  """
  if model_name not in MODEL_CONFIGS:
    available = ', '.join(MODEL_CONFIGS.keys())
    raise ValueError(
        f"Model '{model_name}' not found. Available models: {available}")
  return dict(MODEL_CONFIGS[model_name])


@dataclasses.dataclass
class Model:
  """A model handle: static config + pure apply/init functions.

  ``apply(variables, ...)`` accepts either a bare param tree or a
  ``{'params': tree}`` wrapper (the checkpoint layout), matching the
  reference Flax module calling convention.
  """

  config: Any
  _apply_fn: Callable[..., Any]
  _init_fn: Callable[..., Any]
  name: str | None = None

  @staticmethod
  def _unwrap(variables):
    if isinstance(variables, Mapping) and set(variables.keys()) == {'params'}:
      return variables['params']
    return variables

  def apply(self, variables, *args, **kwargs):
    return self._apply_fn(self._unwrap(variables), *args,
                          cfg=self.config, **kwargs)

  def init(self, rng) -> dict:
    return {'params': self._init_fn(rng, self.config)}

  def replace_config(self, **updates) -> 'Model':
    return dataclasses.replace(
        self, config=dataclasses.replace(self.config, **updates))

  # Convenience accessors used by serving/bench code.
  @property
  def fprop_dtype(self):
    return self.config.dtype


def encoder_config_of(cfg):
  """The FactorizedEncoderConfig inside any model-family config
  (classifier wraps it as ``.encoder``, CLIP derives it via
  ``.vision_config()``, encoders are it)."""
  if isinstance(cfg, vc.VideoClassifierConfig):
    return cfg.encoder
  if isinstance(cfg, vclip.VideoCLIPConfig):
    return cfg.vision_config()
  return cfg


def native_clip_geometry(cfg) -> tuple[int, int]:
  """(num_frames, frame_size) a config was trained at — the default
  clip geometry for exports (export.py) and server-side file decode
  (serving_http ``/v1/embed_file``)."""
  enc = encoder_config_of(cfg)
  return enc.pos_emb_shape[0], enc.pos_emb_shape[1] * enc.patch_size


def _encoder_model(config_name: str, **overrides) -> Model:
  cfg = fe.FactorizedEncoderConfig(**CONFIGS[config_name], **overrides)
  return Model(cfg, fe.apply, init_lib.init_factorized_encoder,
               name=config_name)


def _clip_model(config_name: str, vocab_size: int, **overrides) -> Model:
  cfg = vclip.VideoCLIPConfig(
      **CONFIGS[config_name], vocabulary_size=vocab_size, **overrides)
  return Model(cfg, vclip.apply, init_lib.init_video_clip, name=config_name)


def _classifier_model(config_name: str, num_classes: int, **overrides) -> Model:
  enc_cfg = fe.FactorizedEncoderConfig(**CONFIGS[config_name], **overrides)
  cfg = vc.VideoClassifierConfig(encoder=enc_cfg, num_classes=num_classes)
  return Model(cfg, vc.apply, init_lib.init_video_classifier,
               name=config_name)


def videoprism_v1_base() -> Model:
  """Builds VideoPrism v1 base (reference videoprism/models.py:164-166)."""
  return _encoder_model('videoprism_v1_base')


def videoprism_v1_large() -> Model:
  return _encoder_model('videoprism_v1_large')


def videoprism_v1_giant() -> Model:
  return _encoder_model('videoprism_v1_giant')


def videoprism_lvt_v1_base(text_tokenizer: str = 'c4_en') -> Model:
  vocab = TEXT_TOKENIZERS[text_tokenizer]['vocab_size']
  return _clip_model('videoprism_lvt_v1_base', vocab)


def videoprism_lvt_v1_large(text_tokenizer: str = 'c4_en') -> Model:
  vocab = TEXT_TOKENIZERS[text_tokenizer]['vocab_size']
  return _clip_model('videoprism_lvt_v1_large', vocab)


def videoprism_lvt_v1_giant(text_tokenizer: str = 'c4_en') -> Model:
  vocab = TEXT_TOKENIZERS[text_tokenizer]['vocab_size']
  return _clip_model('videoprism_lvt_v1_giant', vocab)


def videoprism_vc_v1_base(num_classes: int) -> Model:
  return _classifier_model('videoprism_v1_base', num_classes)


def videoprism_vc_v1_large(num_classes: int) -> Model:
  return _classifier_model('videoprism_v1_large', num_classes)


def videoprism_vc_v1_giant(num_classes: int) -> Model:
  return _classifier_model('videoprism_v1_giant', num_classes)


MODELS = {
    'videoprism_public_v1_base': videoprism_v1_base,
    'videoprism_public_v1_large': videoprism_v1_large,
    'videoprism_lvt_public_v1_base': functools.partial(
        videoprism_lvt_v1_base, text_tokenizer='c4_en'),
    'videoprism_lvt_public_v1_large': functools.partial(
        videoprism_lvt_v1_large, text_tokenizer='c4_en'),
}


def _get_model_name_by_hf_model_id(model_id: str) -> str | None:
  """HF repo id (e.g. ``google/videoprism-base-f16r288``) -> registry name.

  Reference: videoprism/models.py:236-252.
  """
  for model_name, value in CHECKPOINTS.items():
    if isinstance(value, tuple) and value[0] == model_id:
      return model_name
  return None


def has_model(
    model_name: str,
    models: Mapping[str, Callable[[], Model]] | None = None,
) -> bool:
  """Whether a model (registry name or HF id) is available.

  Reference: videoprism/models.py:255-265.
  """
  models = models or MODELS
  if model_name.startswith('google/'):
    model_name = _get_model_name_by_hf_model_id(model_name)
  return model_name is not None and model_name in models


def get_model(
    model_name: str | None,
    model_fn: Callable[[], Model] | None = None,
    models: Mapping[str, Callable[[], Model]] | None = None,
    fprop_dtype=None,
    attention_impl: str | None = None,
) -> Model:
  """Returns a VideoPrism :class:`Model` by name or HF model id.

  Reference: videoprism/models.py:268-303, extended with the TPU runtime
  knobs: ``fprop_dtype`` (e.g. ``jnp.bfloat16``) and ``attention_impl``
  (``'flash'`` enables the fused Pallas kernels — the production serving
  configuration; ``'xla'`` (default) is the bit-parity path).
  """
  if model_fn is None:
    assert model_name is not None
    models = models or MODELS
    if model_name.startswith('google/'):
      resolved = _get_model_name_by_hf_model_id(model_name)
      if resolved is None:
        raise ValueError(f'Failed to find model name with `{model_name}`.')
      model_name = resolved
    if model_name not in models:
      raise ValueError(f'Model `{model_name}` not found.')
    model_fn = models[model_name]

  model = model_fn()
  updates = {}
  if fprop_dtype is not None:
    updates['dtype'] = jnp.dtype(fprop_dtype)
  if attention_impl is not None:
    updates['attention_impl'] = attention_impl
  if updates:
    if isinstance(model.config, vc.VideoClassifierConfig):
      model = dataclasses.replace(
          model, config=dataclasses.replace(
              model.config,
              encoder=dataclasses.replace(model.config.encoder, **updates)))
    else:
      model = model.replace_config(**updates)
  return model


def load_pretrained_weights(
    model_name: str | None,
    checkpoint_path: str | None = None,
    checkpoints: Mapping[str, str | tuple[str, str]] | None = None,
):
  """Loads pretrained weights as a jnp pytree.

  By name (downloads from HuggingFace) or from an explicit local/remote path
  (npz or safetensors).  Reference: videoprism/models.py:306-336.
  """
  checkpoints = checkpoints or CHECKPOINTS

  if checkpoint_path is None:
    assert model_name is not None
    if model_name.startswith('google/'):
      model_name = _get_model_name_by_hf_model_id(model_name)

    entry = checkpoints[model_name]
    if isinstance(entry, tuple):
      import huggingface_hub  # lazy: needs network access

      repo_id, filename = entry
      checkpoint_path = huggingface_hub.hf_hub_download(
          repo_id=repo_id, filename=filename)
    else:
      checkpoint_path = entry

  variables = ckpt_lib.load_checkpoint(checkpoint_path)
  return jax.tree_util.tree_map(jnp.asarray, variables)


def load_text_tokenizer(name: str):
  """Loads a text tokenizer by registry name.

  Reference: videoprism/models.py:339-352.
  """
  from videoprism_tpu.io import tokenizers as tok_lib

  if name not in TEXT_TOKENIZERS:
    raise ValueError(f'Text tokenizer `{name}` not found.')
  model_path = TEXT_TOKENIZERS[name]['model_path']
  return tok_lib.SentencePieceTokenizer(model_path)


def tokenize_texts(
    tokenizer,
    inputs: Sequence[str],
    max_length: int = TEXT_MAX_LEN,
    add_bos: bool | None = None,
    canonicalize: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
  """Canonicalize + tokenize + pad a batch of texts.

  Returns (ids int32 [B, L], paddings float32 [B, L]; 1.0 = pad).
  Reference: videoprism/models.py:355-407.
  """
  if canonicalize:
    inputs = [text_lib.canonicalize_text(t) for t in inputs]

  batch_ids, batch_paddings = [], []
  if add_bos is None:
    add_bos = tokenizer.bos_token >= 0

  for ids in tokenizer.to_int(inputs, bos=add_bos, eos=False):
    ids_seq_len = len(ids)
    if ids_seq_len > max_length:
      ids = ids[:max_length]

    ids = np.asarray(ids, dtype=np.int32)
    paddings = np.zeros_like(ids, dtype=np.float32)

    if ids_seq_len < max_length:
      ids = np.pad(
          ids, (0, max_length - ids_seq_len), 'constant', constant_values=0)
      paddings = np.pad(
          paddings, (0, max_length - ids_seq_len), 'constant',
          constant_values=1.0)

    batch_ids.append(ids)
    batch_paddings.append(paddings)

  return np.asarray(batch_ids), np.asarray(batch_paddings)


# ---------------------------------------------------------------------------
# Bound-model convenience loaders (the reference's models_mlx.py surface).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BoundModel:
  """A model with its weights attached; callable like the reference's
  native-tier models (``model(video, text_ids, text_paddings)``)."""

  model: Model
  params: Any

  def __call__(self, *args, **kwargs):
    return self.model.apply(self.params, *args, **kwargs)

  @property
  def config(self):
    return self.model.config


def _resolve_weights(model_name: str, weights_path: str | None):
  """Finds weights: explicit path > local ``weights/`` dir (including
  reference-converter ``*_mlx`` files) > HF download."""
  from videoprism_tpu.io import mlx_compat

  def load(path: str):
    if '_mlx' in Path(path).name:
      # A file produced by the reference's MLX converter: unstacked
      # layers + renamed leaves; import back to our stacked schema.
      return jax.tree_util.tree_map(
          jnp.asarray, mlx_compat.load_mlx_weights(path))
    return load_pretrained_weights(model_name, checkpoint_path=path)

  if weights_path is not None:
    return load(weights_path)
  for candidate in (
      Path('weights') / f'{model_name}.safetensors',
      Path('weights') / f'{model_name}.npz',
      Path('weights') / f'{model_name}_mlx.safetensors',
      Path('weights') / f'{model_name}_mlx.npz',
  ):
    if candidate.exists():
      return load(str(candidate))
  return load_pretrained_weights(model_name)


def _maybe_quantize(params, quantize: str | None):
  if quantize is None:
    return params
  if quantize != 'int8':
    raise ValueError(f'unknown quantize mode {quantize!r}')
  from videoprism_tpu import quantization

  return quantization.quantize_for_serving(params)


def _quantize_attention_impl(attention_impl: str | None,
                             quantize: str | None) -> str | None:
  """int8 only pays on the fused flash path — with 'xla' the weights get
  dequantized inside every jitted forward, strictly slower than bf16.
  Default to 'flash' when quantizing; warn if 'xla' was forced."""
  if quantize != 'int8':
    return attention_impl
  if attention_impl is None:
    return 'flash'
  if attention_impl == 'xla':
    import warnings

    warnings.warn(
        "quantize='int8' with attention_impl='xla' dequantizes the weights "
        "inside every forward pass (slower than unquantized); use "
        "attention_impl='flash' to engage the int8 kernels.",
        stacklevel=3)
  return attention_impl


def load_model(model_name: str, weights_path: str | None = None,
               *, fprop_dtype=None, attention_impl: str | None = None,
               quantize: str | None = None) -> BoundModel:
  """Loads a pretrained video-text CLIP model with weights bound.

  Reference: videoprism/models_mlx.py:91-143, extended with the TPU
  serving knobs (``fprop_dtype``/``attention_impl`` as in
  :func:`get_model`; ``quantize='int8'`` converts the transformer matmul
  weights to the W8A8 serving kernels — see ``videoprism_tpu.quantization``).
  """
  if 'lvt' not in model_name:
    raise ValueError(
        f'`{model_name}` is not a video-text (lvt) model; use '
        'load_video_encoder() for vision-only backbones.')
  attention_impl = _quantize_attention_impl(attention_impl, quantize)
  model = get_model(model_name, fprop_dtype=fprop_dtype,
                    attention_impl=attention_impl)
  params = _maybe_quantize(
      _resolve_weights(model_name, weights_path), quantize)
  return BoundModel(model, params)


def load_video_encoder(
    model_name: str, weights_path: str | None = None,
    *, fprop_dtype=None, attention_impl: str | None = None,
    quantize: str | None = None) -> BoundModel:
  """Loads a pretrained vision-only backbone with weights bound.

  Reference: videoprism/models_mlx.py:146-210 (+ TPU serving knobs, see
  :func:`load_model`).
  """
  if 'lvt' in model_name:
    raise ValueError(
        f'`{model_name}` is a video-text model; use load_model() instead.')
  attention_impl = _quantize_attention_impl(attention_impl, quantize)
  model = get_model(model_name, fprop_dtype=fprop_dtype,
                    attention_impl=attention_impl)
  params = _maybe_quantize(
      _resolve_weights(model_name, weights_path), quantize)
  return BoundModel(model, params)


def load_classifier(
    model_name: str,
    num_classes: int,
    weights_path: str | None = None,
    head_rng: jax.Array | None = None,
    *,
    fprop_dtype=None,
    attention_impl: str | None = None,
) -> BoundModel:
  """Builds a classifier whose backbone is initialized from a pretrained
  checkpoint; the pooler and projection head are freshly initialized.

  Unlike the reference (which silently proceeds with fully random weights
  when the remap fails, videoprism/models_mlx.py:291-293), missing backbone
  weights raise.  ``fprop_dtype``/``attention_impl`` are the TPU serving
  knobs of :func:`get_model`, applied to the encoder config.

  Reference: videoprism/models_mlx.py:213-294.
  """
  if model_name.startswith('videoprism_lvt'):
    backbone_key = 'vision_encoder'
  else:
    backbone_key = None  # encoder-only checkpoint: tree IS the backbone

  config_name = (
      'videoprism_v1_large' if 'large' in model_name else
      'videoprism_v1_giant' if 'giant' in model_name else
      'videoprism_v1_base')
  overrides = {}
  if fprop_dtype is not None:
    overrides['dtype'] = jnp.dtype(fprop_dtype)
  if attention_impl is not None:
    overrides['attention_impl'] = attention_impl
  model = _classifier_model(config_name, num_classes, **overrides)

  pretrained = _resolve_weights(model_name, weights_path)
  pretrained = Model._unwrap(pretrained)
  if backbone_key is not None:
    if backbone_key not in pretrained:
      raise KeyError(
          f'Checkpoint for {model_name} has no `{backbone_key}` subtree; '
          f'top-level keys: {sorted(pretrained.keys())}')
    backbone = pretrained[backbone_key]
  else:
    backbone = pretrained

  head_rng = head_rng if head_rng is not None else jax.random.PRNGKey(0)
  params = model.init(head_rng)['params']
  expected = jax.tree.structure(params['encoder'])
  got = jax.tree.structure(backbone)
  if expected != got:
    raise ValueError(
        'Backbone checkpoint structure does not match the classifier '
        f'encoder: expected {expected}, got {got}')
  params['encoder'] = jax.tree.map(jnp.asarray, backbone)
  print(
      f'load_classifier: backbone loaded from {model_name}; pooler and '
      f'{num_classes}-way head are randomly initialized and must be trained.')
  return BoundModel(model, params)
