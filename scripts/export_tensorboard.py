#!/usr/bin/env python
"""Export a training run's metrics.jsonl to TensorBoard event files.

The trainers log structured JSONL (``utils.logging.MetricsLogger``:
one ``{"step": N, "time": T, <metric>: value, ...}`` record per log
point, plus ``{"event": name, ...}`` markers). This converts a run —
or several runs side by side — into TensorBoard scalars:

    python scripts/export_tensorboard.py /ckpts/run1 /ckpts/run2 \
        --out /tmp/tb && tensorboard --logdir /tmp/tb

Each input directory (or direct .jsonl path) becomes one TB run named
after its directory. Numeric fields become scalar series tagged
``train/<field>``; eval records (``{"event": "eval", ...}``) become
``eval/<field>``; other events appear as TB text markers. Wall-time is
taken from the record's ``time`` field, so TB's relative/wall views are
faithful to the original run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def iter_records(path: str):
  with open(path) as fh:
    for line in fh:
      line = line.strip()
      if line:
        yield json.loads(line)


def export_run(jsonl_path: str, out_dir: str) -> dict:
  from torch.utils.tensorboard import SummaryWriter

  writer = SummaryWriter(log_dir=out_dir)
  scalars = events = 0
  last_step = 0
  try:
    for rec in iter_records(jsonl_path):
      wall = rec.get('time')
      if 'event' in rec:
        name = rec['event']
        step = int(rec.get('step', last_step))
        numeric = {k: v for k, v in rec.items()
                   if k not in ('event', 'step', 'time')
                   and isinstance(v, (int, float))}
        if name == 'eval':
          for k, v in numeric.items():
            writer.add_scalar(f'eval/{k}', v, global_step=step,
                              walltime=wall)
            scalars += 1
        else:
          detail = {k: v for k, v in rec.items()
                    if k not in ('event', 'time')}
          writer.add_text(f'events/{name}', json.dumps(detail),
                          global_step=step, walltime=wall)
        events += 1
        continue
      step = int(rec['step'])
      last_step = step
      for k, v in rec.items():
        if k in ('step', 'time') or not isinstance(v, (int, float)):
          continue
        writer.add_scalar(f'train/{k}', v, global_step=step, walltime=wall)
        scalars += 1
  finally:
    writer.close()
  return {'scalars': scalars, 'events': events}


def main(argv=None) -> int:
  parser = argparse.ArgumentParser(
      description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
  parser.add_argument('runs', nargs='+',
                      help='metrics dirs (containing metrics.jsonl) or '
                           'direct .jsonl paths')
  parser.add_argument('--out', required=True, help='TB logdir to create')
  args = parser.parse_args(argv)

  total = {}
  used = set()
  for run in args.runs:
    jsonl = run if run.endswith('.jsonl') else os.path.join(
        run, 'metrics.jsonl')
    if not os.path.exists(jsonl):
      raise SystemExit(f'{jsonl}: not found')
    name = os.path.basename(
        os.path.dirname(os.path.abspath(jsonl))) or 'run'
    # Same basename from different parents must not merge into one TB
    # run (interleaved scalars with no warning) — suffix duplicates.
    base, n = name, 2
    while name in used:
      name = f'{base}-{n}'
      n += 1
    used.add(name)
    out_dir = os.path.join(args.out, name)
    stats = export_run(jsonl, out_dir)
    total[name] = stats
    print(f'{name}: {stats["scalars"]} scalars, {stats["events"]} events '
          f'-> {out_dir}')
  print(json.dumps({'out': args.out, 'runs': total}))
  return 0


if __name__ == '__main__':
  sys.exit(main())
