#!/usr/bin/env python
"""Classifier fine-tuning driver: full or frozen-backbone (VideoGLUE-style).

The reference publishes frozen-backbone VideoGLUE numbers
(reference README.md:188-195) but ships no training code — its
``load_classifier`` leaves a random pooler + head that "must be trained".
This driver trains them: sharded step over a (data, model) mesh, labeled
input pipeline with host prefetch, periodic orbax checkpoints.

Smoke run (synthetic labels, CPU or one chip):
  python scripts/train_classifier.py --synthetic --tiny --steps 10

Frozen-backbone fine-tune from a pretrained encoder checkpoint:
  python scripts/train_classifier.py --model videoprism_public_v1_base \
      --num-classes 400 --freeze-backbone \
      --manifest train.csv   # lines: /path/clip.mp4,<int label>

Serve what you trained: scripts/export_params.py turns the orbax
--checkpoint-dir (or its EMA) into a flat-key npz for
serve_embeddings --num-classes N --checkpoint; LoRA runs use
--export-merged instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import time

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))

import jax.numpy as jnp  # noqa: E402

import videoprism_tpu as vp  # noqa: E402
from videoprism_tpu.models import classifier as vc  # noqa: E402
from videoprism_tpu.models import factorized_encoder as fe  # noqa: E402
from videoprism_tpu.parallel import data_sharding, make_mesh  # noqa: E402
from videoprism_tpu.train import (  # noqa: E402
    create_classifier_train_state,
    data as data_lib,
    evaluate_classifier,
    make_classifier_eval_step,
    make_classifier_train_step,
    make_optimizer,
    make_sharded_classifier_train_step,
)
from videoprism_tpu.train import preemption  # noqa: E402
from videoprism_tpu.train.checkpointing import TrainCheckpointer  # noqa: E402

from smoke_configs import TINY_ENC  # noqa: E402


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--model', default='videoprism_public_v1_base',
                      help='backbone name (encoder or lvt checkpoint)')
  parser.add_argument('--num-classes', type=int, default=vp.K400_NUM_CLASSES)
  parser.add_argument('--freeze-backbone', action='store_true',
                      help='VideoGLUE protocol: encoder frozen in eval '
                           'mode (no backward through the stack, optimizer '
                           'state only for pooler + head)')
  parser.add_argument('--lora-rank', type=int, default=0,
                      help='adapt the frozen encoder with rank-r LoRA '
                           'adapters (+ trainable pooler/head); 0 = off')
  parser.add_argument('--lora-alpha', type=float, default=None,
                      help='LoRA merge scale numerator (default: rank)')
  parser.add_argument('--lora-targets', default='query,value',
                      help='comma list of query/key/value/post/ffn')
  parser.add_argument('--export-merged', default=None,
                      help='with --lora-rank: bake the trained adapters '
                           'into a full checkpoint-schema npz at this path')
  parser.add_argument('--tiny', action='store_true')
  parser.add_argument('--synthetic', action='store_true')
  parser.add_argument('--manifest', default=None,
                      help='CSV manifest: video_path,int_label per line')
  parser.add_argument('--tar-shards', default=None,
                      help='glob of uncompressed WebDataset-style .tar '
                           'shards (<key>.mp4 + <key>.cls label pairs); '
                           'alternative to --manifest')
  parser.add_argument('--init-checkpoint', default=None,
                      help='backbone weights (default: the usual '
                           'weights/-then-HF resolution via load_classifier; '
                           'random init when --tiny/--synthetic)')
  parser.add_argument('--batch-size', type=int, default=8)
  parser.add_argument('--accum-steps', type=int, default=1)
  parser.add_argument('--steps', type=int, default=1000)
  parser.add_argument('--learning-rate', type=float, default=1e-3)
  parser.add_argument('--warmup-steps', type=int, default=100)
  parser.add_argument('--early-stop-patience', type=int, default=0,
                      help='stop when --early-stop-metric fails to improve '
                           'for N consecutive evals (needs --eval-every; '
                           '0 = off)')
  parser.add_argument('--keep-best', action='store_true',
                      help='whenever an eval improves --early-stop-metric '
                           'on its best-so-far, snapshot the train state '
                           'under <checkpoint-dir>/best (max_to_keep=1; '
                           '+ /best_ema when --ema-decay) — the '
                           'checkpoint you SERVE, independent of the '
                           'rolling resume checkpoints')
  parser.add_argument('--early-stop-metric', default='top1_accuracy',
                      help='eval metric to watch (mode inferred: '
                           'loss/nll/rank minimize, else maximize)')
  parser.add_argument('--optimizer', default='adamw',
                      choices=['adamw', 'adafactor', 'lion', 'sgd'],
                      help='update rule: adamw (default), adafactor '
                           '(factored second moments — O(rows+cols) '
                           'state), lion (one bf16-safe moment; use a '
                           'smaller LR), sgd (Nesterov momentum)')
  parser.add_argument('--schedule', default='cosine',
                      choices=['cosine', 'linear', 'constant'],
                      help='post-warmup LR decay (constant suits '
                           'open-ended elastic runs)')
  parser.add_argument('--weight-decay', type=float, default=1e-4)
  parser.add_argument('--layer-decay', type=float, default=0.0,
                      help='layer-wise LR decay (BEiT/ViT fine-tuning '
                           'recipe): layer at depth d from the head '
                           'trains at lr * decay^d; one broadcasted '
                           'multiply over the scan-stacked leaves. '
                           '0 = off; 0.65-0.85 typical. Full fine-tune '
                           'only.')
  parser.add_argument('--skip-nonfinite', type=int, default=0,
                      help='skip optimizer updates whose gradients contain '
                           'NaN/inf (bf16 overflow protection), tolerating '
                           'up to N consecutive bad steps; 0 disables')
  parser.add_argument('--model-parallelism', type=int, default=1)
  parser.add_argument('--remat', action='store_true',
                      help='rematerialize the encoder stack (full '
                           'fine-tune memory relief; no-op when frozen)')
  parser.add_argument('--fprop-dtype', default='float32',
                      choices=['float32', 'bfloat16'])
  parser.add_argument('--mixup-alpha', type=float, default=0.0,
                      help='MixUp: blend clips + targets with per-example '
                           'Beta(alpha, alpha) weights inside the train '
                           'step (0 = off; 0.2 is the common recipe)')
  parser.add_argument('--label-smoothing', type=float, default=0.0,
                      help='spread this much target mass uniformly over '
                           'classes (composes with --mixup-alpha)')
  parser.add_argument('--augment', action='store_true',
                      help='device-side random resized crop + flip + '
                           'color jitter on the training clips')
  parser.add_argument('--augment-min-scale', type=float, default=0.3)
  parser.add_argument('--augment-strength', type=float, default=0.2)
  parser.add_argument('--eval-manifest', default=None,
                      help='held-out CSV manifest; with --synthetic, a '
                           'disjoint synthetic set is used instead')
  parser.add_argument('--eval-every', type=int, default=0,
                      help='evaluate every N steps (0: only at the end; '
                           'needs --eval-manifest or --synthetic)')
  parser.add_argument('--eval-batch-size', type=int, default=0,
                      help='default: --batch-size')
  parser.add_argument('--ema-decay', type=float, default=0.0,
                      help='track a bias-corrected EMA of the params; '
                           'eval uses it and it is checkpointed under '
                           '<checkpoint-dir>/ema (0 = off). Does not '
                           'compose with --lora-rank')
  parser.add_argument('--checkpoint-dir', default=None)
  parser.add_argument('--checkpoint-every', type=int, default=500)
  parser.add_argument('--resume', action='store_true',
                      help='resume from the latest checkpoint in '
                           '--checkpoint-dir (full train state + data/rng '
                           'stream fast-forward)')
  parser.add_argument('--metrics-dir', default=None)
  parser.add_argument('--log-every', type=int, default=10)
  parser.add_argument('--cpu-devices', type=int, default=0)
  parser.add_argument('--seed', type=int, default=0)
  from videoprism_tpu.utils.cli import parse_with_config
  args = parse_with_config(parser)

  if args.export_merged and not args.lora_rank:
    # Validate up front — discovering this only after a multi-hour run
    # (the export happens post-training) would waste the whole run.
    parser.error('--export-merged requires --lora-rank')

  if args.cpu_devices:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    # CPU platform + host-feature-scoped compile cache (a foreign
    # host's XLA:CPU AOT entries can SIGILL/segfault on load).
    force_cpu(args.cpu_devices)

  # --- model config + init ---
  pretrained = None
  if args.tiny:
    enc_cfg = fe.FactorizedEncoderConfig(**TINY_ENC, remat=args.remat)
    frames, size = 2, 12
  else:
    base = vp.CONFIGS[
        'videoprism_v1_large' if 'large' in args.model else
        'videoprism_v1_giant' if 'giant' in args.model else
        'videoprism_v1_base']
    enc_cfg = fe.FactorizedEncoderConfig(**base, remat=args.remat)
    frames, size = (16 if 'base' in args.model else 8), 288
    if not args.synthetic or args.init_checkpoint:
      bound = vp.load_classifier(args.model, args.num_classes,
                                 weights_path=args.init_checkpoint)
      pretrained = bound.params
  if args.fprop_dtype != 'float32':
    enc_cfg = dataclasses.replace(enc_cfg, dtype=jnp.dtype(args.fprop_dtype))
  cfg = vc.VideoClassifierConfig(encoder=enc_cfg,
                                 num_classes=args.num_classes)

  # --- data ---
  if args.synthetic:
    source = data_lib.SyntheticLabeledSource(
        num_examples=max(64, args.batch_size * args.accum_steps * 4),
        num_frames=frames, size=size, num_classes=args.num_classes)
  elif args.tar_shards:
    source = data_lib.TarShardSource.from_glob(
        args.tar_shards, labeled=True, num_frames=frames, target_size=size)
  else:
    source = data_lib.VideoLabelSource.from_manifest(
        args.manifest, num_frames=frames, target_size=size)
  eval_source = None
  if args.eval_manifest:
    eval_source = data_lib.VideoLabelSource.from_manifest(
        args.eval_manifest, num_frames=frames, target_size=size)
  elif args.synthetic and args.eval_every:
    eval_source = data_lib.SyntheticLabeledSource(
        num_examples=max(16, args.batch_size * 2), num_frames=frames,
        size=size, num_classes=args.num_classes, seed=1)
  mode = ('LoRA rank %d' % args.lora_rank if args.lora_rank else
          'frozen backbone' if args.freeze_backbone else 'full fine-tune')
  print(f'{len(source)} examples; {args.num_classes}-way; {mode}')

  # --- mesh + state + step ---
  mesh = make_mesh(args.model_parallelism)
  print(f'mesh: {dict(mesh.shape)} over {jax.device_count()} devices')
  optimizer = make_optimizer(
      learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
      total_steps=args.steps, weight_decay=args.weight_decay,
      skip_nonfinite=args.skip_nonfinite or None,
      schedule=args.schedule, optimizer=args.optimizer)
  if args.layer_decay:
    if args.freeze_backbone or args.lora_rank:
      parser.error('--layer-decay applies to the full fine-tune (the '
                   'frozen/LoRA paths train the head at one rate)')
    import optax

    from videoprism_tpu.models import init as init_lib
    from videoprism_tpu.train import llrd

    # Factor tree from shapes only — no duplicate init of real weights.
    shapes = jax.eval_shape(
        lambda: init_lib.init_video_classifier(jax.random.PRNGKey(0), cfg))
    optimizer = optax.chain(
        optimizer, llrd.scale_by_layer_decay(shapes, cfg,
                                             args.layer_decay))

  accum = args.accum_steps
  batch_axis = 1 if accum > 1 else 0
  lora_cfg = frozen_full = None
  if args.lora_rank:
    if args.freeze_backbone:
      parser.error('--lora-rank and --freeze-backbone are alternatives '
                   '(LoRA already freezes the backbone)')
    if args.mixup_alpha or args.label_smoothing:
      parser.error('--mixup-alpha/--label-smoothing are not wired into '
                   'the LoRA classifier step yet')
    from videoprism_tpu.models import init as init_lib
    from videoprism_tpu.train import (
        create_lora_classifier_train_state,
        lora_num_params,
        make_lora_classifier_train_step,
    )
    from videoprism_tpu.train.lora import LoraConfig

    lora_cfg = LoraConfig(
        rank=args.lora_rank, alpha=args.lora_alpha,
        targets=tuple(t for t in args.lora_targets.split(',') if t))
    frozen_full = (pretrained if pretrained is not None else
                   init_lib.init_video_classifier(
                       jax.random.PRNGKey(args.seed), cfg))
    frozen_full = jax.device_put(frozen_full)
    state = create_lora_classifier_train_state(
        jax.random.PRNGKey(args.seed + 2), optimizer, frozen_full, lora_cfg)
    print(f'LoRA: {lora_num_params(state.params["lora"]):,} adapter params '
          f'(targets {lora_cfg.targets})')
    lora_step = jax.jit(make_lora_classifier_train_step(
        cfg, optimizer, lora_cfg, accum_steps=accum))
    step_fn = lambda s, b, r: lora_step(s, frozen_full['encoder'], b, r)
    shard = ((lambda ndim: data_sharding(mesh, ndim, batch_axis=batch_axis))
             if jax.device_count() > 1 else None)
  else:
    state = create_classifier_train_state(
        jax.random.PRNGKey(args.seed), cfg, optimizer,
        pretrained_params=pretrained, freeze_backbone=args.freeze_backbone)
    if jax.device_count() > 1 or args.model_parallelism > 1:
      step_fn, state = make_sharded_classifier_train_step(
          cfg, optimizer, mesh, state, freeze_backbone=args.freeze_backbone,
          accum_steps=accum, mixup_alpha=args.mixup_alpha,
          label_smoothing=args.label_smoothing)
      shard = lambda ndim: data_sharding(mesh, ndim, batch_axis=batch_axis)
    else:
      step_fn = jax.jit(make_classifier_train_step(
          cfg, optimizer, freeze_backbone=args.freeze_backbone,
          accum_steps=accum, mixup_alpha=args.mixup_alpha,
          label_smoothing=args.label_smoothing))
      shard = None

  ckpt = (TrainCheckpointer(args.checkpoint_dir)
          if args.checkpoint_dir else None)

  ema_state = ema_update = ema_ckpt = None
  if args.ema_decay:
    if lora_cfg is not None:
      parser.error('--ema-decay does not compose with --lora-rank '
                   '(EMA would track adapters, eval needs the bake-in)')
    from videoprism_tpu.train import ema as ema_lib

    ema_update = ema_lib.make_ema_update(args.ema_decay)
    ema_state = ema_lib.init_ema(state.params)
    if args.checkpoint_dir:
      ema_ckpt = TrainCheckpointer(
          os.path.join(args.checkpoint_dir, 'ema'))

  start_step = 0
  if args.resume:
    if ckpt is None:
      raise SystemExit('--resume requires --checkpoint-dir')
    restored = ckpt.restore_latest(state)
    if restored is None:
      print(f'--resume: no checkpoint in {args.checkpoint_dir}; '
            'starting fresh')
    else:
      state = restored
      start_step = int(jax.device_get(state.step))
      print(f'--resume: restored step {start_step} '
            f'from {args.checkpoint_dir}')
      if ema_ckpt is not None:
        ema_restored = ema_ckpt.restore_latest(ema_state)
        if ema_restored is not None:
          ema_state = ema_restored

  # --- loop ---
  from videoprism_tpu.utils.logging import MetricsLogger

  loader = data_lib.labeled_loader(
      source, args.batch_size, seed=args.seed, num_epochs=None,
      sharding=shard, accum_steps=accum, skip_batches=start_step)
  rng = jax.random.PRNGKey(args.seed + 1)
  from videoprism_tpu.train import augment as augment_lib
  aug_fn = augment_lib.make_augment_fn(augment_lib.augment_config_from_flags(
      args.augment, crop_scale_min=args.augment_min_scale,
      strength=args.augment_strength))
  aug_rng = jax.random.PRNGKey(args.seed + 2)
  t0 = time.time()
  logger = MetricsLogger(args.metrics_dir or args.checkpoint_dir,
                         console_every=1)
  eval_step = make_classifier_eval_step(cfg) if eval_source else None

  def eval_params():
    if lora_cfg is not None:  # bake adapters in for the eval forward
      from videoprism_tpu.train import export_lora_classifier

      return export_lora_classifier(frozen_full, state, lora_cfg)
    if ema_state is not None:
      from videoprism_tpu.train import ema as ema_lib

      return ema_lib.ema_params(ema_state, args.ema_decay)
    return state.params

  def run_eval(step_no):
    ebs = args.eval_batch_size or args.batch_size
    if shard:  # each eval batch splits over the data axis
      dp = mesh.shape['data']
      ebs = -(-ebs // dp) * dp
    em = evaluate_classifier(
        eval_params(), cfg, eval_source, batch_size=ebs,
        # eval batches are flat [B, ...] even when training accumulates
        sharding=data_sharding(mesh, 5) if shard else None,
        eval_step=eval_step)
    em = {k: round(float(v), 4) for k, v in em.items()}
    logger.event('eval', step=step_no, **em)
    return em

  # SIGTERM (preemption / maintenance eviction) -> finish the in-flight
  # step, checkpoint, exit 75; `--resume` then continues bit-exactly.
  guard = preemption.PreemptionGuard().install()
  seen_nonfinite = 0
  stopped_early = 0  # set to the stopping step by early stopping
  stopper = None
  if args.early_stop_patience:
    if not (eval_source and args.eval_every):
      raise SystemExit('--early-stop-patience needs --eval-every and an '
                       'eval source')
    from videoprism_tpu.train.eval_loop import EarlyStopper
    stopper = EarlyStopper(args.early_stop_metric,
                           args.early_stop_patience)
  best_tracker = best_ckpt = best_ema_ckpt = None
  if args.keep_best:
    if not (eval_source and args.eval_every) or ckpt is None:
      raise SystemExit('--keep-best needs --eval-every, an eval source, '
                       'and --checkpoint-dir')
    from videoprism_tpu.train.eval_loop import BestTracker
    best_tracker = BestTracker(args.early_stop_metric)
    best_ckpt = TrainCheckpointer(
        os.path.join(args.checkpoint_dir, 'best'), max_to_keep=1)
    if ema_ckpt is not None:
      best_ema_ckpt = TrainCheckpointer(
          os.path.join(args.checkpoint_dir, 'best_ema'), max_to_keep=1)
  for i, batch in enumerate(loader, start=start_step):
    if i >= args.steps:
      break
    if aug_fn is not None:
      batch = dict(batch, video=aug_fn(jax.random.fold_in(aug_rng, i),
                                       batch['video']))
    state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
    if ema_update is not None:
      ema_state = ema_update(ema_state, state.params)
    if i % args.log_every == 0 or i == args.steps - 1:
      logger.log(i, metrics,
                 sec_per_step=round((time.time() - t0)
                                    / max(i - start_step, 1), 3))
      # The guard's cumulative skip counter catches bad steps BETWEEN
      # log points too (a per-step grad_norm fetch would sync every
      # step; this one scalar reads only when already logging).
      nf_total = getattr(state.opt_state, 'total_notfinite', None)
      if nf_total is not None:
        nf_total = int(jax.device_get(nf_total))
        if nf_total > seen_nonfinite:
          logger.event('nonfinite_steps', step=i, total=nf_total,
                       new=nf_total - seen_nonfinite)
          seen_nonfinite = nf_total
    saved_now = False
    if ckpt is not None:
      step_no = int(jax.device_get(state.step))
      saved_now = ckpt.maybe_save(step_no, state,
                                  every=args.checkpoint_every)
      if saved_now:
        logger.event('checkpoint_saved', step=step_no)
        if ema_ckpt is not None:
          ema_ckpt.maybe_save(step_no, ema_state,
                              every=args.checkpoint_every)
    if guard.should_stop(i + 1):
      preemption.exit_preempted(
          state, ckpt, logger, ema_ckpt=ema_ckpt, ema_state=ema_state,
          already_saved=saved_now, checkpoint_dir=args.checkpoint_dir)
    if eval_source and args.eval_every and (i + 1) % args.eval_every == 0:
      em = run_eval(i + 1)
      if best_tracker is not None and best_tracker.update(em):
        step_no = int(jax.device_get(state.step))
        best_ckpt.save(step_no, state)
        if best_ema_ckpt is not None:
          best_ema_ckpt.save(step_no, ema_state)
        logger.event('best_checkpoint', step=step_no,
                     metric=best_tracker.metric, value=best_tracker.best)
      if stopper is not None and stopper.update(em):
        logger.event('early_stop', step=i + 1,
                     metric=stopper.metric, best=stopper.best,
                     stale_evals=stopper.stale)
        print(f'early stop @ step {i + 1}: {stopper.metric} stuck at '
              f'{stopper.best} for {stopper.stale} evals')
        # saved_now: the periodic maybe_save may have just written this
        # exact step — orbax raises on a duplicate step save.
        if ckpt is not None and not saved_now:
          step_no = int(jax.device_get(state.step))
          ckpt.save(step_no, state)
          if ema_ckpt is not None:
            ema_ckpt.save(step_no, ema_state)
        stopped_early = i + 1
        break
  if eval_source and not stopped_early and not (
      args.eval_every and args.steps % args.eval_every == 0):
    run_eval(args.steps)
  if ckpt is not None:
    ckpt.wait()
  if ema_ckpt is not None:
    ema_ckpt.wait()
  for c in (best_ckpt, best_ema_ckpt):
    if c is not None:
      c.wait()
  if args.export_merged:
    if lora_cfg is None:
      parser.error('--export-merged requires --lora-rank')
    from videoprism_tpu.io.checkpoints import save_checkpoint
    from videoprism_tpu.train import export_lora_classifier

    save_checkpoint(args.export_merged,
                    export_lora_classifier(frozen_full, state, lora_cfg))
    print(f'merged LoRA checkpoint written to {args.export_merged}')
  done_steps = stopped_early or args.steps
  logger.event('run_complete', steps=done_steps,
               early_stopped=bool(stopped_early),
               wall_seconds=round(time.time() - t0, 1))
  logger.close()
  print(f'done: {done_steps} steps in {time.time() - t0:.1f}s'
        + (' (early stop)' if stopped_early else ''))


if __name__ == '__main__':
  main()
