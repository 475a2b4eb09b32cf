"""CLI config files for the training drivers.

Production training runs are launched from version-controlled configs,
not hand-typed flag strings.  ``parse_with_config(parser)`` adds
``--config run.json`` to any argparse CLI:

* the JSON object's keys are the long option names (dashes or
  underscores), its values become the parser *defaults* — so flags given
  explicitly on the command line still win (CLI > config > built-in);
* unknown keys fail fast with the offending name (a typo'd key silently
  falling back to a built-in default is how week-long runs get wasted);
* when the parsed args carry a ``checkpoint_dir``, the fully resolved
  configuration is written there as ``resolved_config.json`` — the run's
  reproducibility record next to its checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Sequence


def parse_with_config(parser: argparse.ArgumentParser,
                      argv: Sequence[str] | None = None,
                      save_resolved: bool = True) -> argparse.Namespace:
  """Parses ``argv`` with ``--config`` JSON defaults layered in."""
  parser.add_argument('--config', default=None, metavar='JSON',
                      help='JSON file of option defaults (long names, '
                           'dashes or underscores); explicit CLI flags '
                           'override it')
  pre = argparse.ArgumentParser(add_help=False)
  pre.add_argument('--config', default=None)
  known, _ = pre.parse_known_args(argv)
  if known.config:
    with open(known.config) as f:
      loaded = json.load(f)
    if not isinstance(loaded, dict):
      raise SystemExit(f'--config {known.config}: expected a JSON object, '
                       f'got {type(loaded).__name__}')
    valid = {a.dest for a in parser._actions}
    updates: dict[str, Any] = {}
    for key, value in loaded.items():
      dest = key.replace('-', '_')
      if dest == 'config':
        raise SystemExit('--config files cannot nest another "config" key')
      if dest not in valid:
        raise SystemExit(f'--config {known.config}: unknown option {key!r} '
                         f'(no --{dest.replace("_", "-")} flag)')
      updates[dest] = value
    parser.set_defaults(**updates)
  args = parser.parse_args(argv)
  if save_resolved:
    ckpt_dir = getattr(args, 'checkpoint_dir', None)
    if ckpt_dir:
      os.makedirs(ckpt_dir, exist_ok=True)
      resolved = {k: v for k, v in sorted(vars(args).items())
                  if k != 'config'}
      with open(os.path.join(ckpt_dir, 'resolved_config.json'), 'w') as f:
        json.dump(resolved, f, indent=2, default=str)
  return args
