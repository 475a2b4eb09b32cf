#!/usr/bin/env python
"""Elastic training supervisor: restart preempted trainers automatically.

Completes the failure-recovery loop that `videoprism_tpu.train.preemption`
starts (the reference has no elastic-recovery subsystem at all —
SURVEY.md §5): the trainer turns a preemption SIGTERM into a consistent
checkpoint and exit status 75 (``EX_TEMPFAIL``); this supervisor relaunches
it with ``--resume`` until it finishes for real.  Because ``--resume`` with
an empty checkpoint dir just starts from step 0, the flag is appended
unconditionally and the very first launch needs no special casing.

    python scripts/run_elastic.py -- \
        python scripts/train_clip.py --synthetic --tiny --steps 2000 \
            --checkpoint-dir /tmp/ck

Semantics:
- child exits 0            -> done, exit 0.
- child exits 75           -> preempted-but-checkpointed: relaunch with
                              ``--resume`` after ``--backoff`` seconds.
- child exits anything else-> real failure: by default exit with that code;
                              ``--restart-on-failure`` retries those too
                              (crash-looping bugs are bounded by
                              ``--max-restarts``).
- supervisor gets SIGTERM/SIGINT -> forward it to the child ONCE and wait:
  the child checkpoints and exits 75, and the supervisor re-exits 75 so an
  outer scheduler sees "resumable", not "crashed".  A second signal kills
  the child hard.
"""

import argparse
import signal
import subprocess
import sys
import time

EXIT_PREEMPTED = 75  # mirrors videoprism_tpu.train.preemption.EXIT_PREEMPTED


def build_command(command: list[str], append_resume: bool) -> list[str]:
  if append_resume and '--resume' not in command:
    return list(command) + ['--resume']
  return list(command)


def supervise(command: list[str], *, max_restarts: int, backoff: float,
              restart_on_failure: bool, append_resume: bool = True,
              _log=print) -> int:
  """Runs ``command`` until it exits cleanly; returns the exit code."""
  cmd = build_command(command, append_resume)
  signalled = {'count': 0}
  child = {'proc': None}

  def forward(signum, frame):
    del frame
    signalled['count'] += 1
    proc = child['proc']
    if proc is None or proc.poll() is not None:
      return
    if signalled['count'] == 1:
      _log(f'run_elastic: forwarding signal {signum} to pid {proc.pid}')
      proc.send_signal(signum)
    else:
      _log(f'run_elastic: second signal {signum}, killing pid {proc.pid}')
      proc.kill()

  prev = {s: signal.signal(s, forward)
          for s in (signal.SIGTERM, signal.SIGINT)}
  restarts = 0
  try:
    while True:
      child['proc'] = subprocess.Popen(cmd)
      code = child['proc'].wait()
      child['proc'] = None
      if signalled['count']:
        # The stop was ours, not the fleet's: propagate the child's
        # status (75 if it checkpointed in time) instead of restarting.
        _log(f'run_elastic: stopped by signal, child exited {code}')
        return code
      if code == 0:
        if restarts:
          _log(f'run_elastic: finished after {restarts} restart(s)')
        return 0
      resumable = code == EXIT_PREEMPTED
      if not resumable and not restart_on_failure:
        _log(f'run_elastic: child failed with exit {code} (not a '
             'preemption); pass --restart-on-failure to retry crashes')
        return code
      if restarts >= max_restarts:
        _log(f'run_elastic: exit {code} but restart budget '
             f'({max_restarts}) exhausted')
        return code
      restarts += 1
      kind = 'preempted' if resumable else f'failed (exit {code})'
      _log(f'run_elastic: child {kind}; restart {restarts}/{max_restarts} '
           f'in {backoff:g}s')
      time.sleep(backoff)
      if signalled['count']:
        # The stop signal landed between child exits (no live child to
        # forward it to). Relaunching now would strand a trainer past
        # the scheduler's grace period — propagate instead; the child
        # already checkpointed (exit 75) or failed.
        _log(f'run_elastic: stop signal during backoff, exiting {code}')
        return code
  finally:
    for s, h in prev.items():
      signal.signal(s, h)


def main(argv=None) -> int:
  parser = argparse.ArgumentParser(
      description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
  parser.add_argument('--max-restarts', type=int, default=1000,
                      help='restart budget across the whole run')
  parser.add_argument('--backoff', type=float, default=5.0,
                      help='seconds to wait before each relaunch')
  parser.add_argument('--restart-on-failure', action='store_true',
                      help='also restart on non-preemption failures '
                           '(any nonzero exit, e.g. a flaky host)')
  parser.add_argument('--no-append-resume', action='store_true',
                      help="don't append --resume to the command (for "
                           'commands that manage resume themselves)')
  parser.add_argument('command', nargs=argparse.REMAINDER,
                      help='trainer command, after a literal --')
  args = parser.parse_args(argv)
  command = args.command
  if command and command[0] == '--':
    command = command[1:]
  if not command:
    parser.error('no command given; usage: run_elastic.py [flags] -- cmd ...')
  if args.max_restarts < 0:
    parser.error('--max-restarts must be >= 0')
  return supervise(command, max_restarts=args.max_restarts,
                   backoff=args.backoff,
                   restart_on_failure=args.restart_on_failure,
                   append_resume=not args.no_append_resume)


if __name__ == '__main__':
  sys.exit(main())
