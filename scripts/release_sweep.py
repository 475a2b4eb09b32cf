"""Per-round all-family perf sweep → ONE committed results artifact.

VERDICT r3 weak-spot #2: the per-family perf story (large/giant/int8/lvt/
classifier/train-step) lived only in prose — the only machine-readable
artifacts were base-model BENCH_r0*.json.  This runs every headline bench
as a subprocess and writes one JSON file (``RESULTS_r{N}.json``) that makes
the CLAUDE.md perf table reproducible from a single command:

    python scripts/release_sweep.py --out RESULTS_r04.json

Robustness mirrors bench.py's round-4 contract: a real tiny-execution
probe gates startup (exit 75 when the axon claim is unavailable), each
leg runs under its own timeout, and the output file is rewritten after
EVERY leg — a kill mid-sweep leaves a valid partial artifact, never
nothing.  Legs that fail or time out are recorded as such and the sweep
continues.

Leg set (~12 subprocess runs, each with a warm compile cache after its
first run; full cold sweep ≈ 30-45 min, warm ≈ 15 min):
  base/large/giant × bf16/int8 forward throughput (bench.py),
  lvt-base/lvt-large CLIP × bf16/int8 + classifier-base (bench_clip.py),
  base train step (bench_train_step.py).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_SCRIPTS)
sys.path.insert(0, _SCRIPTS)
sys.path.insert(0, _ROOT)


def _legs(leg_budget_s: int) -> dict[str, list[str]]:
  """Leg name -> argv (sys.executable prepended at run time).

  bench.py legs carry ``--budget-s`` so each emits its own partial JSON
  under the subprocess timeout; batch lists match the documented peak
  geometries (CLAUDE.md §perf) plus batch 1 for p50 latency.
  """
  bench = os.path.join(_ROOT, 'bench.py')
  clip = os.path.join(_SCRIPTS, 'bench_clip.py')
  train = os.path.join(_SCRIPTS, 'bench_train_step.py')
  budget = ['--budget-s', str(leg_budget_s - 30)]
  legs = {}
  for model, batches in (('base', '1,16,32,64'), ('large', '1,8,16,32'),
                         ('giant', '1,8,16,32')):
    legs[f'{model}_bf16'] = [bench, '--model', model,
                             '--batch-sizes', batches] + budget
    legs[f'{model}_int8'] = [bench, '--model', model, '--quantize', 'int8',
                             '--batch-sizes', batches] + budget
  legs['lvt_base_bf16'] = [clip, '--model', 'videoprism_lvt_public_v1_base']
  legs['lvt_base_int8'] = legs['lvt_base_bf16'] + ['--quantize', 'int8']
  legs['lvt_large_bf16'] = [clip, '--model', 'videoprism_lvt_public_v1_large',
                            '--frames', '8']
  legs['lvt_large_int8'] = legs['lvt_large_bf16'] + ['--quantize', 'int8']
  legs['classifier_base'] = [clip, '--model', 'classifier_base']
  legs['classifier_base_int8'] = [clip, '--model', 'classifier_base',
                                  '--quantize', 'int8']
  legs['train_base_b2'] = [train, '--model', 'base', '--batch', '2']
  return legs


def _last_json_line(text: str):
  for line in reversed(text.strip().splitlines()):
    line = line.strip()
    if line.startswith('{'):
      try:
        return json.loads(line)
      except json.JSONDecodeError:
        continue
  return None


def _write_atomic(path: str, payload: dict) -> None:
  tmp = path + '.tmp'
  with open(tmp, 'w') as f:
    json.dump(payload, f, indent=1, sort_keys=True)
    f.write('\n')
  os.replace(tmp, path)


def main() -> int:
  parser = argparse.ArgumentParser(
      description=__doc__.split('\n')[0],
      formatter_class=argparse.RawDescriptionHelpFormatter)
  parser.add_argument('--out', default=os.path.join(_ROOT, 'RESULTS.json'),
                      help='output artifact path (rewritten after every '
                           'leg — a kill mid-sweep leaves a valid file)')
  parser.add_argument('--legs', default=None,
                      help='comma-separated subset of leg names '
                           '(default: all); --list shows them')
  parser.add_argument('--list', action='store_true',
                      help='print leg names and exit')
  parser.add_argument('--leg-timeout-s', type=int, default=900,
                      help='per-leg subprocess timeout')
  parser.add_argument('--skip-probe', action='store_true',
                      help='skip the TPU claim probe (CI/CPU smoke)')
  args = parser.parse_args()

  legs = _legs(args.leg_timeout_s)
  if args.list:
    print('\n'.join(legs))
    return 0
  if args.legs:
    unknown = [l for l in args.legs.split(',') if l not in legs]
    if unknown:
      parser.error(f'unknown legs {unknown}; available: {list(legs)}')
    legs = {k: v for k, v in legs.items() if k in args.legs.split(',')}

  if not args.skip_probe:
    from smoke_configs import ensure_tpu_executes

    ensure_tpu_executes()  # exit 75 when the claim is held elsewhere

  t_start = time.time()
  payload = {
      'harness': 'release_sweep',
      'started_unix': round(t_start, 1),
      'argv_note': 'each leg = `python <script> <args>`; parsed = its '
                   'one JSON output line',
      'legs': {},
  }
  _write_atomic(args.out, payload)

  for name, argv in legs.items():
    print(f'=== {name}: {" ".join(os.path.basename(a) for a in argv)}',
          flush=True)
    t0 = time.time()
    rec: dict = {'cmd': [os.path.relpath(a, _ROOT)
                         if os.path.isabs(a) else a for a in argv]}
    # Popen + kill-and-drain rather than subprocess.run(timeout=...):
    # on POSIX TimeoutExpired.stdout is None with capture_output even
    # when the child printed (verified on this host's 3.12) — a bench
    # leg that emitted its --budget-s partial JSON and then hung would
    # lose the artifact.  After kill(), communicate() returns whatever
    # the child had written.
    proc = subprocess.Popen(
        [sys.executable] + argv, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd=_ROOT)
    try:
      out, err = proc.communicate(timeout=args.leg_timeout_s)
      rec['rc'] = proc.returncode
    except subprocess.TimeoutExpired:
      proc.kill()
      out, err = proc.communicate()
      rec['rc'] = 'timeout'
    rec['parsed'] = _last_json_line(out or '')
    if rec['parsed'] is None:
      rec['stderr_tail'] = (err or '')[-800:]
    rec['seconds'] = round(time.time() - t0, 1)
    payload['legs'][name] = rec
    payload['total_seconds'] = round(time.time() - t_start, 1)
    _write_atomic(args.out, payload)
    val = (rec['parsed'] or {}).get('value') or (
        rec['parsed'] or {}).get('clips_per_sec') or (
        rec['parsed'] or {}).get('step_ms')
    print(f'    -> rc={rec["rc"]} value={val} ({rec["seconds"]}s)',
          flush=True)

  n_ok = sum(1 for r in payload['legs'].values()
             if isinstance(r.get('rc'), int) and r['rc'] == 0
             and r.get('parsed'))
  payload['summary'] = f'{n_ok}/{len(payload["legs"])} legs parsed ok'
  _write_atomic(args.out, payload)
  print(json.dumps({'harness': 'release_sweep', 'out': args.out,
                    'legs_ok': n_ok, 'legs_total': len(payload['legs']),
                    'total_seconds': payload['total_seconds']}))
  return 0 if n_ok == len(payload['legs']) else 1


if __name__ == '__main__':
  sys.exit(main())
