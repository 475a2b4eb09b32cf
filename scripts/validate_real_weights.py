"""ONE command for the first network-enabled session: real-weight
validation, strict mode.

The single largest unproven claim in this repo (VERDICT r1-r3 item #1) is
that everything holds on google's actual released checkpoints — this
environment has no egress, so ``load_pretrained_weights``'s
``hf_hub_download`` path (reference models.py:331 ↔ models/registry.py)
has never fired.  WEIGHTS-VALIDATION.md holds the recipe;
``validate_release.py`` implements the stages with offline proxies.  This
wrapper removes every soft edge for the day network exists:

    python scripts/validate_real_weights.py

* probes egress first — **exit 75** (EX_TEMPFAIL, same convention as the
  TPU-claim probes) with a one-line message when offline, so schedulers
  retry instead of recording a misleading proxy-pass;
* runs every validate_release stage in ONLINE mode;
* grades strictly: ``proxy-pass`` counts as FAILURE here (a stage that
  silently degraded to its offline proxy did not validate real weights);
* writes ``validate_real_weights_report.json`` and prints one JSON line.

Optional: ``--msrvtt-dir`` with ``{video_id}.mp4`` + ``captions.tsv``
adds the real MSRVTT-1K R@1 comparison against the published 50.1.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_SCRIPTS)

EX_TEMPFAIL = 75
# The host load_pretrained_weights actually downloads from.
_EGRESS_PROBE_HOST = 'huggingface.co'


def have_egress(timeout_s: float = 10.0) -> bool:
  """True when a TCP connection to the checkpoint host succeeds."""
  try:
    with socket.create_connection((_EGRESS_PROBE_HOST, 443),
                                  timeout=timeout_s):
      return True
  except OSError:
    return False


def main() -> int:
  parser = argparse.ArgumentParser(
      description='Strict real-weight validation (exit 75 when offline).')
  parser.add_argument('--msrvtt-dir', default=None)
  parser.add_argument('--report', default='validate_real_weights_report.json')
  parser.add_argument('--stages', default=None,
                      help='forwarded to validate_release.py (default: all)')
  args = parser.parse_args()

  if not have_egress():
    print(f'no network egress (cannot reach {_EGRESS_PROBE_HOST}:443): '
          'real-weight validation needs the checkpoint downloads. '
          'Exit 75 — retry from a network-enabled session. '
          '(For offline proxies run scripts/validate_release.py --offline.)')
    return EX_TEMPFAIL

  report_path = (args.report if os.path.isabs(args.report)
                 else os.path.join(_ROOT, args.report))
  # A stale report from a previous run must never be gradable: remove it
  # up front so a crashed child can only leave "no report".
  try:
    os.unlink(report_path)
  except FileNotFoundError:
    pass
  cmd = [sys.executable, os.path.join(_SCRIPTS, 'validate_release.py'),
         '--report', args.report]
  if args.stages:
    cmd += ['--stages', args.stages]
  if args.msrvtt_dir:
    cmd += ['--msrvtt-dir', args.msrvtt_dir]
  # No --offline: every stage runs its real path.  Inherit stdout so the
  # long download/parity stages stream progress.
  proc = subprocess.run(cmd, cwd=_ROOT)
  try:
    with open(report_path) as f:
      report = json.load(f)
  except (OSError, json.JSONDecodeError) as e:
    print(json.dumps({'harness': 'validate_real_weights', 'overall': 'fail',
                      'detail': f'no report produced: {e}',
                      'rc': proc.returncode}))
    return 1
  if proc.returncode != 0:
    # validate_release only exits nonzero on a failed stage (or a crash
    # after writing) — never certify such a run, whatever the file says.
    print(json.dumps({'harness': 'validate_real_weights', 'overall': 'fail',
                      'detail': f'validate_release exited {proc.returncode}',
                      'rc': proc.returncode, 'report': args.report}))
    return 1

  # Strict grading: only a real 'pass' counts; a proxy-pass means the
  # stage silently fell back offline and validated nothing real.
  stages = {k: v['status'] for k, v in report.get('stages', {}).items()}
  degraded = sorted(k for k, s in stages.items() if s != 'pass')
  overall = 'pass' if stages and not degraded else 'fail'
  print(json.dumps({'harness': 'validate_real_weights', 'overall': overall,
                    'stages': stages, 'degraded': degraded,
                    'report': args.report}))
  return 0 if overall == 'pass' else 1


if __name__ == '__main__':
  sys.exit(main())
