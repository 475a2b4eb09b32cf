"""Benchmark harness: videoprism_public_v1_base clip-embedding throughput.

Prints ONE JSON line:
    {"metric": "clips_per_sec", "value": N, "unit": "clips/s/chip",
     "vs_baseline": R, ...}

Baseline: the reference's best published end-to-end forward on its own
native tier — MLX on Apple M3 Pro, 1.42 s per (1x16x288x288 + 3 texts) pass
(reference FLAX_TO_MLX_CONVERSION_GUIDE.md:409; BASELINE.md) — i.e. ~0.704
clips/s.  ``vs_baseline`` is our clips/s/chip divided by that.

Robustness contract (round 4): the one JSON line ALWAYS appears — a real
tiny-execution probe gates startup (the axon claim can LIST the chip while
execution hangs), a wall-clock budget (``--budget-s`` / env
``BENCH_BUDGET_S``) with a watchdog thread emits partial results and exits 0
if the sweep overruns, SIGTERM/SIGALRM emit what completed, and the sweep
runs headline-geometry-first so one measurement already yields a valid
headline.

Methodology: K forwards are chained inside one jitted ``fori_loop`` that
reduces each output to a scalar; a single 4-byte ``device_get`` forces
execution.  (On tunneled TPU backends ``block_until_ready`` does not actually
block, and fetching the [B, 4096, 768] output would time the tunnel, not the
chip.)  Per-pass time = total / K, amortizing dispatch overhead.  Sweeps
batch size for peak throughput; p50 single-clip latency reported from the
batch-1 runs.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import threading
import time

# Wall-clock budget accounting starts at process start: the watchdog
# (below) guarantees ONE parsed JSON line exists before any external
# timeout can kill this process (round 3's official bench artifact was
# lost to exactly that — rc=124, nothing printed).
_T0 = time.monotonic()

import jax

# Persistent compilation cache: first bench run on a machine pays the
# (multi-minute, remote-compile) XLA+Mosaic cost, later runs start hot.
jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp  # noqa: E402

BASELINE_CLIPS_PER_SEC = 1.0 / 1.42  # reference MLX M3 Pro headline

# Measured matmul ceiling of this chip on model-shaped bf16 matmuls
# (CLAUDE.md; direct probing — the chip's datasheet peak is higher but
# unreachable at these tile aspects).  MFU is reported against it so
# regressions vs speed-of-light are visible per round.
MEASURED_PEAK_TFLOPS = 214.0


def _model_flops_per_clip(cfg, num_frames: int) -> float:
  """Analytic forward FLOPs for one clip through a FactorizedEncoder.

  Counts the matmuls only (2*M*N*K per matmul): patch embedding, q/k/v/post
  projections, attention logits+context, and the two FFN matmuls — the
  >99% of the arithmetic.  LN/softmax/gelu are VPU-side and excluded.
  """
  d, f = cfg.model_dim, cfg.mlp_dim
  t = num_frames
  tokens_per_frame = (288 // cfg.patch_size) ** 2          # 256
  n_tok = t * tokens_per_frame
  patch_dim = cfg.patch_size * cfg.patch_size * 3          # 972
  embed = 2 * patch_dim * d * n_tok
  per_token_layer = 8 * d * d + 4 * d * f                  # qkvo + ffn
  attn_seq = lambda s: 4 * s * s * d                       # logits + ctx
  spatial = cfg.num_spatial_layers * (
      n_tok * per_token_layer + t * attn_seq(tokens_per_frame))
  temporal = cfg.num_temporal_layers * (
      n_tok * per_token_layer + tokens_per_frame * attn_seq(t))
  return float(embed + spatial + temporal)


def _make_forward(dtype, attention_impl: str, config_name: str,
                  input_dtype: str = 'float32', quantize: str = 'none'):
  from videoprism_tpu.models import factorized_encoder as fe
  from videoprism_tpu.models import init as init_lib
  from videoprism_tpu.models import registry

  cfg = fe.FactorizedEncoderConfig(
      **registry.CONFIGS[config_name],
      dtype=dtype, attention_impl=attention_impl)
  params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)
  if quantize == 'int8':
    from videoprism_tpu import quantization

    params = quantization.quantize_for_serving(params)
  params = jax.device_put(params)
  uint8_in = input_dtype == 'uint8'

  @functools.partial(jax.jit, static_argnames=('iters',))
  def forward_n(params, video, iters: int):
    def body(i, carry):
      acc, vid = carry
      # uint8 serving path: normalize on-device (fuses into the input
      # cast) — the staged input is 4x smaller in HBM.
      vid_f = vid.astype(dtype) / 255.0 if uint8_in else vid
      embeddings, _ = fe.apply(params, vid_f, cfg, train=False)
      s = jnp.sum(embeddings[0, 0]).astype(jnp.float32)
      # Feed a vanishing function of this pass's output into the next
      # pass's input: real data dependence, so XLA cannot hoist the
      # loop-invariant forward out of the loop, and the chain serializes.
      # Single-element in-place update — a full-tensor add here would bill
      # ~2 ms/iter of pure measurement overhead to the model.
      if uint8_in:
        vid = vid.at[0, 0, 0, 0, 0].max(
            (s * 0.0).astype(jnp.uint8))  # data dependence, value-neutral
      else:
        vid = vid.at[0, 0, 0, 0, 0].add(s * 1e-30)
      return acc + s, vid

    acc, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros((), jnp.float32), video))
    return acc

  return forward_n, params, cfg


def _time_forward(forward_n, params, video, warmup: int, runs: int,
                  iters: int):
  """Returns per-forward-pass seconds over ``runs`` timed chains."""
  import numpy as np

  # Warm with the SAME static iters — a different iters is a different
  # compiled program and the first timed run would swallow its compile.
  for _ in range(max(1, warmup)):
    np.asarray(forward_n(params, video, iters))
  times = []
  for _ in range(runs):
    t0 = time.perf_counter()
    np.asarray(forward_n(params, video, iters))
    times.append((time.perf_counter() - t0) / iters)
  return times


# The execution probe run in a killable child.  jax.devices() is NOT
# enough: the axon claim can LIST the chip while any actual execution
# hangs in the claim-retry loop (observed repeatedly; CLAUDE.md) — so the
# probe runs a real tiny computation and fetches its scalar.
_PROBE_SRC = ('import jax, jax.numpy as jnp, numpy as np; '
              'np.asarray(jnp.sum(jnp.ones((8, 8), jnp.float32)))')


def _wait_for_devices(max_wait_s: float, probe_timeout_s: float = 120) -> bool:
  """True once a real tiny EXECUTION completes; bounded, in a subprocess.

  A direct device call in THIS process would block uninterruptibly in
  the axon claim-retry loop — probing in a killable child keeps the wait
  bounded and leaves this process clean to initialize normally once a
  probe succeeds.  The probe budget is generous because plain claim
  acquisition has been measured at ~50s under contention.
  """
  import subprocess
  import sys

  deadline = time.monotonic() + max_wait_s
  while True:
    budget = min(probe_timeout_s, max(5.0, deadline - time.monotonic()))
    try:
      r = subprocess.run(
          [sys.executable, '-c', _PROBE_SRC],
          timeout=budget, capture_output=True)
      if r.returncode == 0:
        return True
    except subprocess.TimeoutExpired:
      pass
    if time.monotonic() >= deadline:
      return False
    print('bench: TPU claim pending (tiny execution did not complete); '
          f'retrying for {deadline - time.monotonic():.0f}s more',
          file=sys.stderr, flush=True)
    time.sleep(min(30, max(1, deadline - time.monotonic())))


class _Emitter:
  """Builds and prints the ONE output JSON line, exactly once.

  Both the main thread (normal completion, cooperative budget stop) and
  the watchdog thread (hard budget stop mid-compile) route through
  :meth:`emit` — whoever arrives first wins, so an external ``timeout``
  can only lose the artifact if it fires before our own budget does.
  """

  def __init__(self):
    self._lock = threading.Lock()
    self._emitted = False
    self.payload: dict = {}

  def emit(self, **extra) -> bool:
    with self._lock:
      if self._emitted:
        return False
      self._emitted = True
      out = dict(self.payload)
      out.update(extra)
      print(json.dumps(out), flush=True)
      return True


def _start_watchdog(emitter: '_Emitter', budget_s: float) -> None:
  """Emits the partial payload and exits 0 when the budget expires.

  A daemon timer thread: it fires even while the main thread is stuck in
  an uninterruptible remote compile or device fetch (where SIGALRM-style
  in-thread handling would wait for the call to return — possibly
  forever)."""

  def fire():
    emitter.payload.setdefault('value', None)
    if emitter.emit(budget_exhausted=True,
                    error=f'wall-clock budget ({budget_s:g}s) expired '
                          'mid-sweep; partial results only'):
      os._exit(0)

  remaining = budget_s - (time.monotonic() - _T0)
  t = threading.Timer(max(1.0, remaining), fire)
  t.daemon = True
  t.start()


def _sweep_order(batches: list) -> list:
  """Headline-first sweep order: the peak-throughput geometry (largest
  batch) runs first so a valid headline number exists after ONE
  measurement, then batch 1 (the p50-latency number), then the rest
  largest-first.  A budget stop mid-sweep therefore costs detail, not
  the headline."""
  ordered = sorted(set(batches), reverse=True)
  if 1 in ordered and len(ordered) > 1:
    ordered.remove(1)
    ordered.insert(1, 1)
  return ordered


def _install_signal_emitters(emitter: '_Emitter') -> None:
  """SIGTERM/SIGALRM → emit the partial payload, exit 0.

  An external supervisor's soft kill (e.g. ``timeout`` sends SIGTERM
  before SIGKILL) still yields a parsed artifact.  Best-effort: Python
  signal handlers only run between bytecodes, so a main thread stuck in
  an uninterruptible remote call is covered by the watchdog thread, not
  by this."""
  import signal

  def handler(signum, frame):
    emitter.payload.setdefault('value', None)
    if emitter.emit(interrupted=signal.Signals(signum).name):
      os._exit(0)

  for sig in (signal.SIGTERM, signal.SIGALRM):
    try:
      signal.signal(sig, handler)
    except (ValueError, OSError):  # non-main thread / unsupported
      pass


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--dtype', default='bfloat16',
                      choices=['bfloat16', 'float32'])
  parser.add_argument('--model', default='base',
                      choices=['base', 'large', 'giant'],
                      help='base: 16 frames; large/giant: 8 frames (per '
                           'the published checkpoint workloads; giant has '
                           'no public checkpoint but a perf target)')
  parser.add_argument('--attention', default='auto',
                      choices=['auto', 'xla', 'flash'])
  parser.add_argument('--input', default='float32',
                      choices=['float32', 'uint8'],
                      help='staged input dtype; uint8 measures the '
                           'production serving path (on-device /255)')
  parser.add_argument('--quantize', default='none',
                      choices=['none', 'int8'],
                      help='int8: W8A8 serving kernels (halved weight '
                           'streaming; wins at small batch on '
                           'large/giant)')
  parser.add_argument('--batch-sizes', default='1,8,16,32,64')
  parser.add_argument('--runs', type=int, default=3)
  parser.add_argument('--warmup', type=int, default=2)
  parser.add_argument('--iters', type=int, default=0,
                      help='forward passes chained per timed run; 0 = '
                           'auto, max(8, 256//batch) — small batches '
                           'chain more passes so the one-per-dispatch '
                           'tunnel RTT (~23 ms measured on this axon '
                           'link) is amortized equally per clip. '
                           'Round-2 b1 numbers under-read by ~27%% '
                           'because 8 iters left ~2.9 ms of RTT on '
                           'every 7 ms pass.')
  parser.add_argument('--claim-wait-s', type=float, default=1800,
                      help='max seconds to wait for the TPU claim before '
                           'emitting an error JSON (the axon claim can be '
                           'unavailable for hours, and jax.devices() then '
                           'blocks silently in a retry loop); clipped to '
                           'fit inside --budget-s')
  parser.add_argument('--budget-s', type=float,
                      default=float(os.environ.get('BENCH_BUDGET_S', 540)),
                      help='total wall-clock budget (env BENCH_BUDGET_S). '
                           'A watchdog emits the JSON line with whatever '
                           'batch sizes completed and exits 0 when it '
                           'expires — a partial artifact always beats '
                           'rc=124 with nothing printed (round 3).  The '
                           'default is deliberately under typical driver '
                           'timeouts; a warm-cache full sweep takes '
                           '~3-5 min, a cold b64+b1 fits comfortably.')
  args = parser.parse_args()

  emitter = _Emitter()
  emitter.payload = {
      'metric': 'clips_per_sec', 'value': None, 'unit': 'clips/s/chip',
      'vs_baseline': None,
  }
  _start_watchdog(emitter, args.budget_s)
  _install_signal_emitters(emitter)
  try:
    _run_sweep(args, emitter)
  except SystemExit:
    raise  # already emitted (claim-unavailable / all-batches-failed)
  except BaseException as e:
    # ANY other escape path (bad --batch-sizes parse, compile failure,
    # claim flap mid-setup, Ctrl-C) still yields the one parsed JSON
    # line — an uncaught traceback would take the daemon watchdog down
    # with the process and print nothing (review finding).
    emitter.payload.setdefault('value', None)
    emitter.emit(error=f'unexpected {type(e).__name__}: {e}')
    raise SystemExit(4)


def _run_sweep(args, emitter):
  # The claim wait must leave room inside the budget to actually measure;
  # when the claim never shows, the error JSON is still a parsed artifact.
  claim_wait = min(args.claim_wait_s,
                   max(30.0, args.budget_s - (time.monotonic() - _T0) - 60))
  if not _wait_for_devices(claim_wait):
    emitter.emit(
        error=f'device backend unavailable after {claim_wait:g}s '
              '(TPU claim not granted: a tiny execution never completed); '
              're-run when the claim returns')
    raise SystemExit(2)

  dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
  platform = jax.devices()[0].platform
  if platform != 'tpu':
    # CPU fallback (local testing): re-scope the cache dir so CPU AOT
    # entries never land in the shared TPU cache — a foreign-host CPU
    # entry has segfaulted the suite before (utils/compilation_cache).
    from videoprism_tpu.utils.compilation_cache import cache_dir

    jax.config.update('jax_compilation_cache_dir', cache_dir(cpu=True))

  attention = args.attention
  if attention == 'auto':
    attention = 'flash' if platform == 'tpu' else 'xla'

  config_name = f'videoprism_v1_{args.model}'
  num_frames = 16 if args.model == 'base' else 8
  forward, params, cfg = _make_forward(dtype, attention, config_name,
                                       args.input, args.quantize)
  flops_per_clip = _model_flops_per_clip(cfg, num_frames)

  emitter.payload.update({
      'model': f'videoprism_public_v1_{args.model}',
      'workload': f'{num_frames}x288x288',
      'platform': platform,
      'dtype': args.dtype,
      'attention': attention,
      'input': args.input,
      'quantize': args.quantize,
      'flops_per_clip': flops_per_clip,
  })

  # One-dispatch overhead (tunnel RTT + launch): timed on a trivial
  # program with the same scalar-fetch mechanism, reported so the
  # asymptotic per-pass numbers below have context.
  import numpy as np
  tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32))
  null = jax.jit(lambda x: jnp.sum(x))
  np.asarray(null(tiny))
  rtt = []
  for _ in range(5):
    t0 = time.perf_counter()
    np.asarray(null(tiny))
    rtt.append(time.perf_counter() - t0)
  rtt_ms = 1000.0 * statistics.median(rtt)

  emitter.payload['dispatch_rtt_ms'] = round(rtt_ms, 2)

  best_throughput = 0.0
  best_batch = 0
  per_batch = {}
  p50_latency_ms = None
  ordered = _sweep_order([int(x) for x in args.batch_sizes.split(',')])
  budget_stopped = False
  for i, b in enumerate(ordered):
    elapsed = time.monotonic() - _T0
    if i > 0 and elapsed > 0.85 * args.budget_s:
      # Cooperative stop: the next compile+measurement would likely cross
      # the budget and trip the hard watchdog — stop cleanly instead.
      budget_stopped = True
      break
    iters = args.iters or max(8, 256 // b)
    shape = (b, num_frames, 288, 288, 3)
    if args.input == 'uint8':
      video = jax.device_put(jax.random.randint(
          jax.random.PRNGKey(1), shape, 0, 256, jnp.uint8))
    else:
      video = jax.device_put(
          jax.random.uniform(jax.random.PRNGKey(1), shape, jnp.float32))
    try:
      times = _time_forward(
          forward, params, video, args.warmup, args.runs, iters)
    except Exception as e:  # OOM at large batch: report what fits
      per_batch[b] = f'failed: {type(e).__name__}'
      # The failure breadcrumb must reach the artifact even when no
      # later batch succeeds (review finding: only the success path
      # snapshotted per_batch into the payload).
      emitter.payload['per_batch_clips_per_sec'] = dict(per_batch)
      continue
    clips_per_sec = b / statistics.median(times)
    per_batch[b] = round(clips_per_sec, 3)
    if b == 1:
      p50_latency_ms = 1000.0 * statistics.median(times)
    if clips_per_sec > best_throughput:
      best_throughput, best_batch = clips_per_sec, b
    # Keep the payload current after EVERY measurement: if the watchdog
    # (or a later failure) fires, the artifact holds the best so far.
    emitter.payload.update({
        'value': round(best_throughput, 3),
        'vs_baseline': round(best_throughput / BASELINE_CLIPS_PER_SEC, 2),
        'best_batch': best_batch,
        'p50_latency_ms': (round(p50_latency_ms, 2)
                           if p50_latency_ms else None),
        'per_batch_clips_per_sec': dict(per_batch),
        # Model-FLOPs utilization vs the chip's MEASURED matmul ceiling
        # (214 TFLOP/s bf16, CLAUDE.md) — only meaningful on TPU.
        'mfu': (round(best_throughput * flops_per_clip
                      / (MEASURED_PEAK_TFLOPS * 1e12), 4)
                if platform == 'tpu' else None),
    })

  extra: dict = {'budget_exhausted': True} if budget_stopped else {}
  if best_batch == 0:
    # Every batch failed (or none ran): value stays null — say why, and
    # exit nonzero so the artifact is unambiguous.
    extra['error'] = ('no batch size completed; see '
                      'per_batch_clips_per_sec for per-batch failures')
    emitter.emit(**extra)
    raise SystemExit(3)
  emitter.emit(**extra)


if __name__ == '__main__':
  main()
