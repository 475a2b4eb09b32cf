#!/usr/bin/env python
"""End-to-end contrastive CLIP (pre)training / fine-tuning driver.

The reference repo is inference-only; this makes the TPU stack trainable
out of the box: sharded train step over a (data, model) mesh, input
pipeline with host prefetch, periodic orbax checkpoints, metric logging.

Smoke run (synthetic data, CPU or one chip):
  python scripts/train_clip.py --synthetic --steps 10 --tiny

Real data: --videos-glob 'data/*.mp4' --captions captions.txt (one caption
per line, aligned with the sorted glob), plus a tokenizer model.

Serve what you trained: scripts/export_params.py turns the orbax
--checkpoint-dir (or its EMA) into a flat-key npz/safetensors tree for
serve_embeddings --checkpoint / quantize_checkpoint / export_model.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import glob
import os
import time

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import videoprism_tpu as vp  # noqa: E402
from videoprism_tpu.models import clip as vclip  # noqa: E402
from videoprism_tpu.parallel import make_mesh, data_sharding  # noqa: E402
from videoprism_tpu.train import (  # noqa: E402
    create_train_state,
    data as data_lib,
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
)
from videoprism_tpu.train import preemption  # noqa: E402
from videoprism_tpu.train.checkpointing import TrainCheckpointer  # noqa: E402

from smoke_configs import TINY_CLIP as TINY_CFG  # noqa: E402


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--model', default='videoprism_lvt_public_v1_base')
  parser.add_argument('--tiny', action='store_true',
                      help='tiny architecture for smoke tests')
  parser.add_argument('--synthetic', action='store_true')
  parser.add_argument('--videos-glob', default=None)
  parser.add_argument('--tar-shards', action='append', default=None,
                      help='glob of uncompressed WebDataset-style .tar '
                           'shards (<key>.mp4 + <key>.txt caption pairs); '
                           'alternative to --videos-glob/--captions.  '
                           'Repeat the flag for a multi-dataset MIXTURE '
                           '(weights via --mixture-weights)')
  parser.add_argument('--mixture-weights', default=None,
                      help='comma-separated positive sampling weights, '
                           'one per --tar-shards flag (default: '
                           'proportional to dataset sizes)')
  parser.add_argument('--captions', default=None)
  parser.add_argument('--tokenizer-model', default=None,
                      help='local SentencePiece model path')
  parser.add_argument('--init-checkpoint', default=None)
  parser.add_argument('--batch-size', type=int, default=8)
  parser.add_argument('--accum-steps', type=int, default=1,
                      help='gradient accumulation: microbatches of '
                           '--batch-size averaged per optimizer update '
                           '(effective batch = batch-size * accum-steps '
                           'at constant activation memory; contrastive '
                           'negatives stay per-microbatch)')
  parser.add_argument('--steps', type=int, default=1000)
  parser.add_argument('--eval-every', type=int, default=0,
                      help='run paired retrieval eval (t2v/v2t R@k) on a '
                           'held-out source every N steps (0 = off); '
                           'always evals after the final step')
  parser.add_argument('--eval-manifest', default=None,
                      help='video_path<TAB>caption manifest for the eval '
                           'source (default: a held-out synthetic source '
                           'under --synthetic)')
  parser.add_argument('--eval-batch-size', type=int, default=0,
                      help='eval video batch (default --batch-size)')
  parser.add_argument('--learning-rate', type=float, default=1e-4)
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
  parser.add_argument('--early-stop-metric', default='t2v_recall@1',
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
  parser.add_argument('--objective', default='infonce',
                      choices=['infonce', 'siglip'],
                      help='contrastive loss: symmetric InfoNCE (CLIP) or '
                           'pairwise sigmoid with learnable bias (SigLIP)')
  parser.add_argument('--model-parallelism', type=int, default=1)
  parser.add_argument('--tp-impl', default='gspmd',
                      choices=['gspmd', 'manual'],
                      help='tensor-parallel lowering: gspmd (XLA SPMD '
                           'partitioner, attention_impl=xla) or manual '
                           '(shard_map with per-shard fused Pallas '
                           'kernels + explicit psums — the fastest '
                           'measured training config, train/'
                           'tp_train_step.py)')
  parser.add_argument('--remat', action='store_true')
  parser.add_argument('--pp-microbatches', type=int, default=0,
                      help='pipeline-parallel training: stage the spatial '
                           'stack over the model mesh axis (GPipe) and '
                           'split the per-shard frame rows into this '
                           'many microbatches; requires '
                           '--model-parallelism > 1')
  parser.add_argument('--fsdp', action='store_true',
                      help='ZeRO-3: shard params + optimizer moments over '
                           'the data axis (per-chip state memory / dp, one '
                           'weight all-gather per layer per direction); '
                           'gspmd tp-impl only')
  parser.add_argument('--fprop-dtype', default='float32',
                      choices=['float32', 'bfloat16'],
                      help='mixed-precision training: forward/backward '
                           'compute in this dtype, params + optimizer '
                           'state stay float32 (the loss itself is always '
                           'computed in float32)')
  parser.add_argument('--skip-nonfinite', type=int, default=0,
                      help='skip optimizer updates whose gradients contain '
                           'NaN/inf (bf16 overflow protection), tolerating '
                           'up to N consecutive bad steps; 0 disables')
  parser.add_argument('--bf16-moments', action='store_true',
                      help='store the AdamW first moment in bfloat16 '
                           '(-1/3 optimizer state memory; nu stays fp32)')
  parser.add_argument('--lora-rank', type=int, default=0,
                      help='LoRA fine-tuning: freeze the checkpoint and '
                           'train rank-r adapters (+ temperature) only; '
                           '0 = off.  Optimizer state shrinks to the '
                           'adapter tree (megabytes at giant scale)')
  parser.add_argument('--lora-alpha', type=float, default=None,
                      help='LoRA merge scale numerator (default: rank)')
  parser.add_argument('--lora-targets', default='query,value',
                      help='comma list of query/key/value/post/ffn')
  parser.add_argument('--ema-decay', type=float, default=0.0,
                      help='track an EMA of the params for eval/serving '
                           '(0 = off; typical 0.999); checkpointed under '
                           '<checkpoint-dir>/ema')
  parser.add_argument('--augment', action='store_true',
                      help='device-side random resized crop + flip + '
                           'color jitter on the training clips')
  parser.add_argument('--augment-min-scale', type=float, default=0.3,
                      help='crop area-fraction lower bound')
  parser.add_argument('--augment-strength', type=float, default=0.2,
                      help='brightness/contrast/saturation jitter range')
  parser.add_argument('--checkpoint-dir', default=None)
  parser.add_argument('--checkpoint-every', type=int, default=500)
  parser.add_argument('--resume', action='store_true',
                      help='resume from the latest checkpoint in '
                           '--checkpoint-dir: restores the full train '
                           'state (params, optimizer moments, step, EMA) '
                           'and fast-forwards the data/rng streams so the '
                           'run continues exactly where it stopped')
  parser.add_argument('--metrics-dir', default=None,
                      help='JSONL metrics sink (defaults to checkpoint-dir)')
  parser.add_argument('--log-every', type=int, default=10)
  parser.add_argument('--cpu-devices', type=int, default=0,
                      help='force CPU with N virtual devices (multi-chip '
                           'smoke without TPU hardware); must be the '
                           'first device-touching flag to take effect')
  parser.add_argument('--seed', type=int, default=0)
  from videoprism_tpu.utils.cli import parse_with_config
  args = parse_with_config(parser)

  if args.cpu_devices:
    # Before any device query (the axon plugin ignores JAX_PLATFORMS env).
    from videoprism_tpu.utils.compilation_cache import force_cpu

    # CPU platform + host-feature-scoped compile cache (a foreign
    # host's XLA:CPU AOT entries can SIGILL/segfault on load).
    force_cpu(args.cpu_devices)

  # --- model config ---
  if args.tiny:
    cfg = vclip.VideoCLIPConfig(**TINY_CFG, remat=args.remat)
    frames, size = 2, 12
  else:
    base = vp.get_model_config(args.model)
    cfg = vclip.VideoCLIPConfig(**base, remat=args.remat)
    frames, size = (16 if 'base' in args.model else 8), 288
  if args.fprop_dtype != 'float32':
    cfg = dataclasses.replace(cfg, dtype=jnp.dtype(args.fprop_dtype))

  # --- tokenizer + data ---
  from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

  from videoprism_tpu import assets

  try:
    tok_path = assets.resolve_tokenizer_path(
        args.tokenizer_model,
        allow_fixture=args.synthetic or args.tiny)
  except ValueError as e:
    raise SystemExit(str(e)) from None
  tokenizer = SentencePieceTokenizer(tok_path)

  if args.synthetic:
    source = data_lib.SyntheticSource(
        num_examples=max(64, args.batch_size * args.accum_steps * 4),
        num_frames=frames, size=size)
  elif args.tar_shards:
    parts = [data_lib.TarShardSource.from_glob(
        g, num_frames=frames, target_size=size) for g in args.tar_shards]
    if len(parts) == 1 and args.mixture_weights is None:
      source = parts[0]
    else:
      weights = ([float(x) for x in args.mixture_weights.split(',')]
                 if args.mixture_weights else None)
      source = data_lib.MixtureSource(parts, weights=weights)
      print('mixture shares:', dict(zip(args.tar_shards, source.shares)))
  else:
    paths = sorted(glob.glob(args.videos_glob))
    captions = open(args.captions).read().splitlines()
    source = data_lib.VideoTextSource(
        paths, captions, num_frames=frames, target_size=size)
  print(f'{len(source)} training examples; config '
        f'{"tiny" if args.tiny else args.model}')

  eval_source = None
  if args.eval_manifest:
    eval_source = data_lib.VideoTextSource.from_manifest(
        args.eval_manifest, num_frames=frames, target_size=size)
  elif args.synthetic and args.eval_every:
    # Disjoint held-out synthetic examples (seed partitions the space).
    eval_source = data_lib.SyntheticSource(
        num_examples=16, num_frames=frames, size=size, seed=1)
  if args.eval_every and eval_source is None:
    parser.error('--eval-every needs --eval-manifest (or --synthetic)')

  # --- mesh + state ---
  mesh = make_mesh(args.model_parallelism)
  print(f'mesh: {dict(mesh.shape)} over {jax.device_count()} devices')

  optimizer = make_optimizer(
      learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
      total_steps=args.steps,
      mu_dtype=jnp.bfloat16 if args.bf16_moments else None,
      skip_nonfinite=args.skip_nonfinite or None,
      schedule=args.schedule, optimizer=args.optimizer)
  pretrained = None
  if args.init_checkpoint:
    state0 = vp.load_pretrained_weights(
        None, checkpoint_path=args.init_checkpoint)
    pretrained = state0.get('params', state0)

  accum = args.accum_steps
  batch_axis = 1 if accum > 1 else 0
  if args.lora_rank:
    if args.fsdp or args.pp_microbatches or args.tp_impl == 'manual':
      parser.error('--lora-rank composes with the plain/gspmd step only '
                   '(not --fsdp/--pp-microbatches/--tp-impl manual)')
    from videoprism_tpu.models import init as init_lib
    from videoprism_tpu.train import (
        create_lora_train_state,
        lora_num_params,
        make_lora_train_step,
    )
    from videoprism_tpu.train.lora import LoraConfig

    lora_cfg = LoraConfig(
        rank=args.lora_rank, alpha=args.lora_alpha,
        targets=tuple(t for t in args.lora_targets.split(',') if t))
    frozen = jax.device_put(
        pretrained if pretrained is not None
        else init_lib.init_video_clip(jax.random.PRNGKey(args.seed), cfg))
    state = create_lora_train_state(
        jax.random.PRNGKey(args.seed + 2), optimizer, frozen, lora_cfg,
        objective=args.objective)
    print(f'LoRA: {lora_num_params(state.params):,} adapter params '
          f'(targets {lora_cfg.targets})')
    lora_step = jax.jit(make_lora_train_step(
        cfg, optimizer, lora_cfg, accum_steps=accum,
        objective=args.objective))
    step_fn = lambda s, b, r: lora_step(s, frozen, b, r)
    shard = ((lambda ndim: data_sharding(mesh, ndim, batch_axis=batch_axis))
             if jax.device_count() > 1 else None)
    from videoprism_tpu.train.lora import merge_lora
    eval_fn = _make_eval_fn(
        args, cfg, mesh, shard, eval_source, tokenizer,
        transform=lambda adapters: merge_lora(frozen, adapters, lora_cfg))
    _run_training_loop(args, state, step_fn, shard, source, tokenizer,
                       accum, eval_fn=eval_fn)
    return
  state = create_train_state(
      jax.random.PRNGKey(args.seed), cfg, optimizer,
      pretrained_params=pretrained, objective=args.objective)
  if args.fsdp and (args.tp_impl == 'manual' or args.pp_microbatches
                    or jax.device_count() == 1):
    parser.error('--fsdp requires the gspmd tp-impl and more than one '
                 'device (it shards state over the data mesh axis)')
  if args.pp_microbatches:
    if args.model_parallelism < 2:
      parser.error('--pp-microbatches requires --model-parallelism > 1 '
                   '(the model axis is the stage axis)')
    from videoprism_tpu.train.pp_train_step import make_pp_train_step

    step_fn, state = make_pp_train_step(
        cfg, optimizer, mesh, state, n_microbatches=args.pp_microbatches,
        accum_steps=accum, objective=args.objective)
    shard = lambda ndim: data_sharding(mesh, ndim, batch_axis=batch_axis)
  elif args.tp_impl == 'manual' and (
      jax.device_count() > 1 or args.model_parallelism > 1):
    from videoprism_tpu.train.tp_train_step import make_tp_train_step

    # Manual TP keeps the fused kernels per shard ('flash' is its point;
    # off-TPU the dispatch degrades to the composed path per layer).
    flash_cfg = dataclasses.replace(cfg, attention_impl='flash')
    step_fn, state = make_tp_train_step(
        flash_cfg, optimizer, mesh, state, accum_steps=accum,
        objective=args.objective)
    shard = lambda ndim: data_sharding(mesh, ndim, batch_axis=batch_axis)
  elif jax.device_count() > 1 or args.model_parallelism > 1:
    step_fn, state = make_sharded_train_step(
        cfg, optimizer, mesh, state, accum_steps=accum, fsdp=args.fsdp,
        objective=args.objective)
    shard = lambda ndim: data_sharding(mesh, ndim, batch_axis=batch_axis)
  else:
    step_fn = jax.jit(make_train_step(
        cfg, optimizer, accum_steps=accum, objective=args.objective))
    shard = None

  eval_fn = _make_eval_fn(args, cfg, mesh, shard, eval_source, tokenizer)

  _run_training_loop(args, state, step_fn, shard, source, tokenizer, accum,
                     eval_fn=eval_fn)


def _make_eval_fn(args, cfg, mesh, shard, eval_source, tokenizer,
                  transform=None):
  """Mid-training paired-retrieval eval hook (None when --eval-every is
  off).  ``transform`` maps the loop's params to eval weights — the LoRA
  path passes the adapter->merged bake-in."""
  if not args.eval_every:
    return None
  from videoprism_tpu.train.eval_loop import evaluate_retrieval

  def eval_fn(params, step_no, logger):
    if transform is not None:
      params = transform(params)
    ebs = args.eval_batch_size or args.batch_size
    if shard is not None:  # each eval batch splits over the data axis
      dp = mesh.shape['data']
      ebs = -(-ebs // dp) * dp
    em = evaluate_retrieval(
        params, cfg, eval_source, tokenizer, batch_size=ebs,
        # eval batches are flat [B, ...] even when training accumulates
        sharding=data_sharding(mesh, 5) if shard is not None else None)
    em = {k: round(float(v), 4) for k, v in em.items()}
    logger.event('eval', step=step_no, **em)
    print(f'eval @ step {step_no}: ' + '  '.join(
        f'{k} {v}' for k, v in sorted(em.items())))
    return em

  return eval_fn


def _eval_params(args, state, ema_state):
  """Mid-training eval weights: the bias-corrected EMA when tracked
  (that is what --ema-decay exists for), else the live params."""
  if ema_state is None:
    return state.params
  from videoprism_tpu.train import ema as ema_lib

  return ema_lib.ema_params(ema_state, args.ema_decay)


def _run_training_loop(args, state, step_fn, shard, source, tokenizer,
                       accum, eval_fn=None):
  """Shared tail of every step-selection path: loader, checkpoints, EMA,
  metric logging."""
  ckpt = (TrainCheckpointer(args.checkpoint_dir)
          if args.checkpoint_dir else None)

  start_step = 0
  if getattr(args, 'resume', False):
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

  ema_state = ema_update = ema_ckpt = None
  if args.ema_decay:
    from videoprism_tpu.train import ema as ema_lib

    ema_update = ema_lib.make_ema_update(args.ema_decay)
    ema_state = ema_lib.init_ema(state.params)
    if args.checkpoint_dir:
      ema_ckpt = TrainCheckpointer(
          os.path.join(args.checkpoint_dir, 'ema'))
      if start_step:
        ema_restored = ema_ckpt.restore_latest(ema_state)
        if ema_restored is not None:
          ema_state = ema_restored

  from videoprism_tpu.utils.logging import MetricsLogger

  # skip_batches fast-forwards the deterministic index stream (no decode)
  # so a resumed run consumes exactly the batches the uninterrupted run
  # would have from start_step on; rng/augment fold_in(i) continue from
  # the same i via enumerate(start=start_step).
  loader = data_lib.batched_loader(
      source, tokenizer, args.batch_size, seed=args.seed,
      num_epochs=None, sharding=shard, accum_steps=accum,
      skip_batches=start_step)
  rng = jax.random.PRNGKey(args.seed + 1)
  # Augmentation runs on device, outside the train step (composes with
  # every step variant; under a mesh it inherits the batch's sharding).
  from videoprism_tpu.train import augment as augment_lib
  aug_fn = augment_lib.make_augment_fn(augment_lib.augment_config_from_flags(
      args.augment, crop_scale_min=args.augment_min_scale,
      strength=args.augment_strength))
  aug_rng = jax.random.PRNGKey(args.seed + 2)
  t0 = time.time()
  # console_every=1: this loop already throttles log() calls to log_every
  # (and always logs the final step).
  logger = MetricsLogger(args.metrics_dir or args.checkpoint_dir,
                         console_every=1)
  # SIGTERM (preemption / maintenance eviction) -> finish the in-flight
  # step, checkpoint, exit 75; `--resume` then continues bit-exactly.
  guard = preemption.PreemptionGuard().install()
  seen_nonfinite = 0
  stopped_early = 0  # set to the stopping step by early stopping
  stopper = None
  if args.early_stop_patience:
    if eval_fn is None:
      raise SystemExit('--early-stop-patience needs --eval-every')
    from videoprism_tpu.train.eval_loop import EarlyStopper
    stopper = EarlyStopper(args.early_stop_metric,
                           args.early_stop_patience)
  best_tracker = best_ckpt = best_ema_ckpt = None
  if args.keep_best:
    if eval_fn is None or ckpt is None:
      raise SystemExit('--keep-best needs --eval-every and '
                       '--checkpoint-dir')
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
    if eval_fn is not None and (i + 1) % args.eval_every == 0:
      em = eval_fn(_eval_params(args, state, ema_state), i + 1, logger)
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
  if eval_fn is not None and not stopped_early and \
      args.steps % args.eval_every:
    eval_fn(_eval_params(args, state, ema_state), args.steps, logger)
  if ckpt is not None:
    ckpt.wait()
  if ema_ckpt is not None:
    ema_ckpt.wait()
  for c in (best_ckpt, best_ema_ckpt):
    if c is not None:
      c.wait()
  done_steps = stopped_early or args.steps
  logger.event('run_complete', steps=done_steps,
               early_stopped=bool(stopped_early),
               wall_seconds=round(time.time() - t0, 1))
  logger.close()
  print(f'done: {done_steps} steps in {time.time() - t0:.1f}s'
        + (' (early stop)' if stopped_early else ''))


if __name__ == '__main__':
  main()
