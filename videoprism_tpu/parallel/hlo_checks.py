"""Offline GSPMD collective assertions — pod-readiness checks.

The classic GSPMD tensor-parallel regression: a sharding annotation
slips (or an XLA upgrade re-partitions differently) and the compiler
silently materializes a model-sharded WEIGHT with a full-shape
all-gather inside every forward — correctness is unchanged, memory and
ICI traffic explode, and nothing fails until someone profiles a pod.
These checks catch it at compile time on a virtual CPU mesh, no
hardware needed (SURVEY §2.7 north-star; VERDICT r4 next-round #6).

Detection principle: a full-parameter gather reproduces the parameter's
exact full shape as an ``all-gather`` result.  Activation collectives
(``[B, T, D]``-shaped) cannot collide with weight shapes
(``[D, H]`` / ``[D, N, H]`` / scan-stacked ``[L, ...]``) in any real
model geometry, so matching gathered result shapes against the set of
full parameter shapes is precise.  ``min_size`` skips tiny leaves
(biases, scales) whose 1-d shapes could coincide with activation rows.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np

# `%all-gather.3 = f32[8,256,1024]{2,1,0} all-gather(...)` — the result
# shape(s) sit between `=` and the op name.  all-gather-start results
# are tuples (buffers in flight); -done carries the final shape again.
_AG_LINE = re.compile(r'=\s*(.+?)\s+all-gather(?:-start|-done)?\(')
_SHAPE = re.compile(r'[a-z0-9]+\[([0-9,]*)\]')


def allgather_result_shapes(hlo_text: str) -> list[tuple[int, ...]]:
  """Result shapes of every all-gather(-start/-done) in optimized HLO."""
  shapes: list[tuple[int, ...]] = []
  for line in hlo_text.splitlines():
    m = _AG_LINE.search(line)
    if m is None:
      continue
    for dims in _SHAPE.findall(m.group(1)):
      shapes.append(tuple(int(x) for x in dims.split(',') if x))
  return shapes


def full_param_allgathers(
    compiled_or_text: Any,
    params: Any,
    *,
    min_size: int = 1024,
) -> list[tuple[int, ...]]:
  """All-gather results whose shape equals a FULL parameter's shape.

  ``compiled_or_text``: a ``jax.stages.Compiled`` (``.as_text()`` is
  the optimized, partitioned HLO) or that text directly.  ``params``:
  the UNSHARDED parameter pytree (full shapes).  Leaves smaller than
  ``min_size`` elements are ignored — a gathered activation row can
  coincide with a bias shape, never with a matrix.
  """
  text = (compiled_or_text if isinstance(compiled_or_text, str)
          else compiled_or_text.as_text())
  param_shapes = {
      tuple(int(d) for d in leaf.shape)
      for leaf in jax.tree_util.tree_leaves(params)
      if hasattr(leaf, 'shape') and int(np.prod(leaf.shape)) >= min_size
      and len(leaf.shape) >= 2
  }
  return [s for s in allgather_result_shapes(text) if s in param_shapes]


def assert_no_full_param_allgather(
    compiled_or_text: Any,
    params: Any,
    *,
    min_size: int = 1024,
    what: str = 'compiled program',
) -> None:
  """Raises AssertionError when the optimized HLO re-materializes any
  full parameter via all-gather — the signature of a dropped/defeated
  tensor-parallel sharding."""
  bad = full_param_allgathers(compiled_or_text, params, min_size=min_size)
  if bad:
    raise AssertionError(
        f'{what}: GSPMD materialized full parameter(s) via all-gather — '
        f'shapes {sorted(set(bad))}. A tensor-parallel sharding was '
        f'dropped or defeated; per-chip memory and ICI traffic scale '
        f'with the FULL model. Check param_partition_specs coverage for '
        f'these shapes.')


def collective_summary(compiled_or_text: Any) -> dict[str, int]:
  """Instruction counts per collective kind (diagnostics for round
  logs): how a step communicates, at a glance."""
  text = (compiled_or_text if isinstance(compiled_or_text, str)
          else compiled_or_text.as_text())
  kinds = ('all-gather', 'all-reduce', 'reduce-scatter',
           'collective-permute', 'all-to-all')
  out: dict[str, int] = {}
  for kind in kinds:
    n = len(re.findall(rf'\s{kind}(?:-start)?\(', text))
    if n:
      out[kind] = n
  return out
