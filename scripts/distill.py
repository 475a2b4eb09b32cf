#!/usr/bin/env python
"""Distillation driver: big teacher → small student (train/distill.py).

The serving motivation: giant embeds ~36 clips/s/chip where base does
~163 (bench.py) — a student matching the teacher's embedding space
serves 4.5× the traffic per chip.  The student stays checkpoint-schema
pure, so the distilled weights drop straight into every serving path
(int8, TP, AOT export).

Smoke (synthetic data, CPU or one chip):
  python scripts/distill.py --mode encoder --tiny --synthetic --steps 5

Real encoder distillation (teacher weights required):
  python scripts/distill.py --mode encoder \
      --teacher videoprism_public_v1_large \
      --student videoprism_public_v1_base \
      --manifest videos.txt --output-student distilled_base.npz

Modes: ``encoder`` (token-level feature match, projection head bridges
widths), ``clip`` (pooled lvt retrieval embedding, widths must match),
``classifier`` (logit KD: τ²KL blended with CE by --alpha).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))

import numpy as np  # noqa: E402

import videoprism_tpu as vp  # noqa: E402
from videoprism_tpu.io import checkpoints as ckpt_lib  # noqa: E402
from videoprism_tpu.models import classifier as vc  # noqa: E402
from videoprism_tpu.models import clip as vclip  # noqa: E402
from videoprism_tpu.models import factorized_encoder as fe  # noqa: E402
from videoprism_tpu.models import init as init_lib  # noqa: E402
from videoprism_tpu.parallel import data_sharding, make_mesh  # noqa: E402
from videoprism_tpu.train import data as data_lib  # noqa: E402
from videoprism_tpu.train import distill  # noqa: E402
from videoprism_tpu.train.checkpointing import TrainCheckpointer  # noqa: E402
from videoprism_tpu.train.train_step import make_optimizer  # noqa: E402

from smoke_configs import TINY_ENC  # noqa: E402

TINY_TEACHER_ENC = dict(TINY_ENC, model_dim=24, num_heads=3)


def _enc_cfgs(args):
  if args.tiny:
    return (fe.FactorizedEncoderConfig(**TINY_TEACHER_ENC),
            fe.FactorizedEncoderConfig(**TINY_ENC))
  return (vp.get_model(args.teacher).config,
          vp.get_model(args.student).config)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--mode', default='encoder',
                      choices=('encoder', 'clip', 'classifier'))
  parser.add_argument('--teacher', default='videoprism_public_v1_large')
  parser.add_argument('--student', default='videoprism_public_v1_base')
  parser.add_argument('--teacher-checkpoint', default=None,
                      help='local weights for the teacher (default: the '
                           'usual weights-dir/HF resolution)')
  parser.add_argument('--student-init', default=None,
                      help='warm-start student checkpoint (default: '
                           'random init)')
  parser.add_argument('--num-classes', type=int, default=5,
                      help='classifier mode: shared class count')
  parser.add_argument('--temperature', type=float, default=2.0)
  parser.add_argument('--alpha', type=float, default=0.5,
                      help='classifier mode: KD weight (1.0 = ignore '
                           'labels)')
  parser.add_argument('--tiny', action='store_true')
  parser.add_argument('--synthetic', action='store_true')
  parser.add_argument('--manifest', default=None,
                      help='video manifest (captions/labels optional for '
                           'encoder/clip modes; classifier mode needs '
                           'video_path,int_label lines)')
  parser.add_argument('--num-frames', type=int, default=16)
  parser.add_argument('--frame-size', type=int, default=288)
  parser.add_argument('--batch-size', type=int, default=8)
  parser.add_argument('--accum-steps', type=int, default=1)
  parser.add_argument('--steps', type=int, default=1000)
  parser.add_argument('--learning-rate', type=float, default=1e-4)
  parser.add_argument('--warmup-steps', type=int, default=100)
  parser.add_argument('--weight-decay', type=float, default=1e-4)
  parser.add_argument('--model-parallelism', type=int, default=1)
  parser.add_argument('--checkpoint-dir', default=None)
  parser.add_argument('--checkpoint-every', type=int, default=500)
  parser.add_argument('--output-student', default=None,
                      help='after training: write the bare student params '
                           'as a servable checkpoint npz (projection head '
                           'dropped)')
  parser.add_argument('--eval-every', type=int, default=0,
                      help='every N steps: held-out distillation quality '
                           '(mean cosine to the teacher; classifier mode: '
                           'top-1 agreement + KL), student in eval mode')
  parser.add_argument('--eval-manifest', default=None,
                      help='held-out manifest (default: a disjoint '
                           'synthetic split for --synthetic/--tiny)')
  parser.add_argument('--eval-batches', type=int, default=8,
                      help='eval sweep length in batches')
  parser.add_argument('--log-every', type=int, default=10)
  parser.add_argument('--cpu-devices', type=int, default=0)
  parser.add_argument('--seed', type=int, default=0)
  from videoprism_tpu.utils.cli import parse_with_config
  args = parse_with_config(parser)

  if args.cpu_devices:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    # CPU platform + host-feature-scoped compile cache (a foreign
    # host's XLA:CPU AOT entries can SIGILL/segfault on load).
    force_cpu(args.cpu_devices)
  if not args.tiny and not (args.synthetic or args.manifest):
    raise SystemExit('need --manifest (or --synthetic / --tiny for smokes)')

  rng = jax.random.PRNGKey(args.seed)
  opt = make_optimizer(args.learning_rate, total_steps=args.steps,
                       warmup_steps=args.warmup_steps,
                       weight_decay=args.weight_decay)

  # ----- configs + teacher weights + step builder per mode -----
  teacher_rng, student_rng, data_rng = jax.random.split(rng, 3)
  if args.mode == 'encoder':
    t_cfg, s_cfg = _enc_cfgs(args)
    teacher = (init_lib.init_factorized_encoder(teacher_rng, t_cfg)
               if args.tiny or args.synthetic and not args.teacher_checkpoint
               else vp.load_pretrained_weights(
                   args.teacher, checkpoint_path=args.teacher_checkpoint))
    step = distill.make_encoder_distill_step(
        t_cfg, s_cfg, opt, accum_steps=args.accum_steps)
    state = distill.create_distill_train_state(
        student_rng, s_cfg, opt, teacher_dim=t_cfg.model_dim,
        student_params=(ckpt_lib.load_checkpoint(args.student_init)
                        if args.student_init else None))
  elif args.mode == 'clip':
    if args.tiny:
      from smoke_configs import TINY_CLIP
      t_cfg = s_cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    else:
      t_cfg = vp.get_model(args.teacher).config
      s_cfg = vp.get_model(args.student).config
    teacher = (init_lib.init_video_clip(teacher_rng, t_cfg)
               if args.tiny or args.synthetic and not args.teacher_checkpoint
               else vp.load_pretrained_weights(
                   args.teacher, checkpoint_path=args.teacher_checkpoint))
    step = distill.make_clip_vision_distill_step(
        t_cfg, s_cfg, opt, accum_steps=args.accum_steps)
    state = distill.create_distill_train_state(
        student_rng, s_cfg, opt, kind='clip_vision',
        student_params=(ckpt_lib.load_checkpoint(args.student_init)
                        if args.student_init else None))
  else:  # classifier
    te_cfg, se_cfg = _enc_cfgs(args)
    t_cfg = vc.VideoClassifierConfig(encoder=te_cfg,
                                     num_classes=args.num_classes)
    s_cfg = vc.VideoClassifierConfig(encoder=se_cfg,
                                     num_classes=args.num_classes)
    if args.tiny or (args.synthetic and not args.teacher_checkpoint):
      teacher = init_lib.init_video_classifier(teacher_rng, t_cfg)
    elif args.teacher_checkpoint:
      teacher = ckpt_lib.load_checkpoint(args.teacher_checkpoint)
    else:
      raise SystemExit('classifier mode needs --teacher-checkpoint (a '
                       'trained classifier; the registry ships only '
                       'untrained heads)')
    step = distill.make_classifier_distill_step(
        t_cfg, s_cfg, opt, temperature=args.temperature, alpha=args.alpha,
        accum_steps=args.accum_steps)
    state = distill.create_distill_train_state(
        student_rng, s_cfg, opt, kind='classifier',
        student_params=(ckpt_lib.load_checkpoint(args.student_init)
                        if args.student_init else None))
  teacher = vp.Model._unwrap(teacher)

  # ----- data -----
  num_frames = 2 if args.tiny else args.num_frames
  size = 12 if args.tiny else args.frame_size
  mesh = make_mesh(args.model_parallelism)
  shard = lambda ndim: data_sharding(
      mesh, ndim, batch_axis=1 if args.accum_steps > 1 else 0)
  if args.mode == 'classifier':
    if args.synthetic or args.tiny:
      source = data_lib.SyntheticLabeledSource(
          num_examples=64, num_frames=num_frames, size=size,
          num_classes=args.num_classes)
    else:
      source = data_lib.VideoLabelSource.from_manifest(
          args.manifest, num_frames=num_frames, target_size=size)
    loader = data_lib.labeled_loader(
        source, args.batch_size, seed=args.seed, sharding=shard,
        accum_steps=args.accum_steps)
  else:
    if args.synthetic or args.tiny:
      source = data_lib.SyntheticSource(
          num_examples=64, num_frames=num_frames, size=size)
    else:
      source = data_lib.VideoTextSource.from_manifest(
          args.manifest, allow_missing_captions=True,
          num_frames=num_frames, target_size=size)
    loader = data_lib.unlabeled_loader(
        source, args.batch_size, seed=args.seed, sharding=shard,
        accum_steps=args.accum_steps)

  # ----- held-out eval -----
  kind = {'encoder': 'encoder', 'clip': 'clip_vision',
          'classifier': 'classifier'}[args.mode]
  eval_step = eval_source = None
  if args.eval_every:
    eval_step = distill.make_distill_eval_step(t_cfg, s_cfg, kind=kind)
    if args.eval_manifest:
      if args.mode == 'classifier':
        eval_source = data_lib.VideoLabelSource.from_manifest(
            args.eval_manifest, num_frames=num_frames, target_size=size)
      else:
        eval_source = data_lib.VideoTextSource.from_manifest(
            args.eval_manifest, allow_missing_captions=True,
            num_frames=num_frames, target_size=size)
    elif args.mode == 'classifier':
      eval_source = data_lib.SyntheticLabeledSource(
          num_examples=32, num_frames=num_frames, size=size,
          num_classes=args.num_classes, seed=1)  # disjoint from training
    else:
      eval_source = data_lib.SyntheticSource(
          num_examples=32, num_frames=num_frames, size=size, seed=1)

  # ----- sharded step + train loop -----
  jitted, state, teacher = distill.make_sharded_distill_step(
      step, mesh, state, teacher, accum_steps=args.accum_steps,
      with_labels=args.mode == 'classifier')
  ckpt = (TrainCheckpointer(args.checkpoint_dir)
          if args.checkpoint_dir else None)
  step_rng = data_rng
  t0 = time.perf_counter()
  for i, batch in zip(range(args.steps), loader):
    state, metrics = jitted(state, teacher, batch,
                            jax.random.fold_in(step_rng, i))
    if (i + 1) % args.log_every == 0 or i + 1 == args.steps:
      dt = (time.perf_counter() - t0) / args.log_every
      t0 = time.perf_counter()
      line = ' '.join(f'{k}={float(np.asarray(v)):.4f}'
                      for k, v in sorted(metrics.items()))
      print(f'step {i + 1}/{args.steps} {line} ({dt * 1e3:.1f} ms/step)',
            flush=True)
    if eval_step is not None and (i + 1) % args.eval_every == 0:
      em = distill.evaluate_distill(
          eval_step, state.trainable, teacher, eval_source,
          batch_size=args.batch_size, max_batches=args.eval_batches)
      line = ' '.join(f'{k}={v:.4f}' for k, v in sorted(em.items()))
      print(f'eval @ step {i + 1}: {line}', flush=True)
      t0 = time.perf_counter()  # eval time must not pollute ms/step
    if ckpt is not None:
      ckpt.maybe_save(i + 1, state, every=args.checkpoint_every)
  if ckpt is not None:
    ckpt.save(args.steps, state)
    ckpt.close()
  if args.output_student:
    student = jax.device_get(state.trainable['student'])
    ckpt_lib.save_checkpoint(args.output_student, student)
    print(f'student checkpoint -> {args.output_student}')


if __name__ == '__main__':
  main()
