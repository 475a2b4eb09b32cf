"""Training tier: objectives and sharded train steps (TPU-native extension;
the reference repo is inference-only, SURVEY.md §2.7)."""

from videoprism_tpu.train import objectives
from videoprism_tpu.train.augment import (
    AugmentConfig,
    augment_clips,
    make_augment_fn,
)
from videoprism_tpu.train.classifier_train_step import (
    ClassifierTrainState,
    create_classifier_train_state,
    make_classifier_train_step,
    make_sharded_classifier_train_step,
)
from videoprism_tpu.train.eval_loop import (
    evaluate_classifier,
    evaluate_retrieval,
    evaluate_zero_shot,
    make_classifier_eval_step,
    make_clip_text_eval_step,
    make_clip_video_eval_step,
)
from videoprism_tpu.train.lora import (
    LoraConfig,
    create_lora_classifier_train_state,
    create_lora_train_state,
    export_lora_classifier,
    init_lora,
    lora_num_params,
    make_lora_classifier_train_step,
    make_lora_train_step,
    merge_lora,
)
from videoprism_tpu.train.distill import (
    DistillTrainState,
    cosine_distill_loss,
    create_distill_train_state,
    evaluate_distill,
    kd_kl_loss,
    make_classifier_distill_step,
    make_clip_vision_distill_step,
    make_distill_eval_step,
    make_encoder_distill_step,
    make_sharded_distill_step,
)
from videoprism_tpu.train.ema import (
    EmaState,
    ema_params,
    init_ema,
    make_ema_update,
)
from videoprism_tpu.train.train_step import (
    TrainState,
    accumulate_gradients,
    create_train_state,
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
)
from videoprism_tpu.train.pp_train_step import make_pp_train_step
from videoprism_tpu.train.tp_train_step import make_tp_train_step

__all__ = [
    'AugmentConfig', 'ClassifierTrainState', 'DistillTrainState',
    'EmaState', 'LoraConfig', 'TrainState',
    'accumulate_gradients', 'augment_clips', 'cosine_distill_loss',
    'create_classifier_train_state', 'create_distill_train_state',
    'evaluate_distill', 'kd_kl_loss', 'make_augment_fn', 'make_classifier_distill_step',
    'make_clip_vision_distill_step', 'make_distill_eval_step',
    'make_encoder_distill_step', 'make_sharded_distill_step',
    'create_lora_classifier_train_state', 'create_lora_train_state',
    'export_lora_classifier', 'init_lora', 'lora_num_params',
    'make_lora_classifier_train_step', 'make_lora_train_step', 'merge_lora',
    'create_train_state', 'ema_params', 'evaluate_classifier',
    'evaluate_retrieval', 'evaluate_zero_shot', 'init_ema',
    'make_classifier_eval_step', 'make_classifier_train_step',
    'make_clip_text_eval_step', 'make_clip_video_eval_step',
    'make_ema_update', 'make_optimizer', 'make_pp_train_step',
    'make_sharded_classifier_train_step', 'make_sharded_train_step',
    'make_tp_train_step', 'make_train_step', 'objectives',
]
