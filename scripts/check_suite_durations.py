#!/usr/bin/env python
"""Suite-time governance (VERDICT r4 #8): keep the release gate's cost a
reviewed decision, not drift.

The release gate emits a per-module duration artifact when run as

    VIDEOPRISM_DURATIONS_OUT=SUITE_DURATIONS_RUN.json \\
        python -m pytest tests/ -m "not slow" -q

(tests/conftest.py's session hook).  This checker diffs that run
against the committed baseline ``SUITE_DURATIONS.json``:

* flags any module slower than baseline by >50% AND >5 s absolute
  (small modules jitter; big regressions are what compound),
* flags NEW modules costing >60 s (candidates for ``slow`` demotion
  or a split),
* flags a fast-tier total projected past the budget (default 30 min).

Exit 0 clean, 1 with findings.  ``--update`` blesses the current run
as the new baseline (the reviewed decision).

    python scripts/check_suite_durations.py              # check
    python scripts/check_suite_durations.py --update     # bless
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_PATH = os.path.join(_ROOT, 'SUITE_DURATIONS_RUN.json')
BASELINE_PATH = os.path.join(_ROOT, 'SUITE_DURATIONS.json')


def check_durations(run: dict, baseline: dict | None, *,
                    regress_frac: float = 0.5, abs_floor_s: float = 5.0,
                    new_module_floor_s: float = 60.0,
                    budget_s: float = 30 * 60) -> list[str]:
  """Pure governance logic; returns human-readable findings."""
  findings: list[str] = []
  total = float(run.get('total_s', 0.0))
  if total > budget_s:
    findings.append(
        f'suite total {total / 60:.1f} min exceeds the {budget_s / 60:.0f}'
        f' min budget — demote heavy tests to `slow` or split modules')
  if baseline:
    base_mods = baseline.get('modules', {})
    for mod, sec in run.get('modules', {}).items():
      base = base_mods.get(mod)
      if base is None:
        if sec > new_module_floor_s:
          findings.append(
              f'NEW module {mod} costs {sec:.0f}s — mark its heavy tests '
              f'`slow` or split it, then bless with --update')
      elif sec > base * (1 + regress_frac) and sec - base > abs_floor_s:
        findings.append(
            f'{mod}: {base:.0f}s -> {sec:.0f}s '
            f'(+{(sec / base - 1) * 100:.0f}%) — investigate or bless '
            f'with --update')
  return findings


def merge_runs(runs: list[dict]) -> dict:
  """Merges chunked-gate artifacts (the release gate runs as 3
  sequential pytest chunks — the certified mitigation for the sporadic
  XLA:CPU long-process abort) into one run: module maps concatenate
  (summing on overlap), totals add."""
  modules: dict[str, float] = {}
  for run in runs:
    for mod, sec in run.get('modules', {}).items():
      modules[mod] = round(modules.get(mod, 0.0) + sec, 2)
  return {'total_s': round(sum(float(r.get('total_s', 0.0))
                               for r in runs), 1),
          'modules': dict(sorted(modules.items(), key=lambda kv: -kv[1]))}


def main() -> int:
  parser = argparse.ArgumentParser()
  parser.add_argument('--run', nargs='+', default=[RUN_PATH],
                      help='one artifact, or several chunk artifacts '
                           'to merge (chunked release gate)')
  parser.add_argument('--baseline', default=BASELINE_PATH)
  parser.add_argument('--budget-min', type=float, default=30.0)
  parser.add_argument('--update', action='store_true',
                      help='bless the current run as the new baseline')
  args = parser.parse_args()

  missing = [p for p in args.run if not os.path.exists(p)]
  if missing:
    print(f'no durations run artifact at {missing}; produce one with\n'
          f'  VIDEOPRISM_DURATIONS_OUT=SUITE_DURATIONS_RUN.json '
          f'python -m pytest tests/ -m "not slow" -q')
    return 1
  runs = []
  for p in args.run:
    with open(p) as f:
      runs.append(json.load(f))
  run = runs[0] if len(runs) == 1 else merge_runs(runs)
  baseline = None
  if os.path.exists(args.baseline):
    with open(args.baseline) as f:
      baseline = json.load(f)

  findings = check_durations(run, baseline,
                             budget_s=args.budget_min * 60)
  if args.update:
    with open(args.baseline, 'w') as f:
      json.dump(run, f, indent=1)
    print(f'baseline updated: {args.baseline} '
          f'(total {run["total_s"] / 60:.1f} min, '
          f'{len(run["modules"])} modules)')
    return 0
  if findings:
    for x in findings:
      print(f'DURATION REGRESSION: {x}')
    return 1
  total = run.get('total_s', 0.0)
  print(f'suite durations OK: {total / 60:.1f} min total, '
        f'{len(run.get("modules", {}))} modules, no regressions vs '
        f'{"baseline" if baseline else "(no baseline yet)"}')
  return 0


if __name__ == '__main__':
  sys.exit(main())
