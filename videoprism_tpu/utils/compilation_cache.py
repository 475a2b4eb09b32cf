"""Persistent-compilation-cache configuration that survives host changes.

XLA:CPU cache entries embed AOT machine code for the exact CPU feature
set of the compiling host.  This environment lands on a different VM
(different AVX/AMX feature mix) session to session while ``~/.cache``
persists — loading a foreign entry is at best the ``cpu_aot_loader``
"could lead to execution errors such as SIGILL" warning and at worst a
hard crash (observed: a reproducible segfault in
``jax compilation_cache.get_executable_and_time`` deserializing a
previous session's CPU entry, killing the whole test suite).  TPU
entries have no such problem: they target the same remote chip whatever
the host looks like.

Policy: TPU runs share the plain cache dir; CPU runs use a sibling dir
suffixed with a hash of the host's CPU flags — full reuse on the same
machine shape, a clean slate anywhere else.
"""

from __future__ import annotations

import hashlib
import os


def host_cpu_tag() -> str:
  """8-hex fingerprint of the host's CPU feature flags + the effective
  XLA:CPU ISA cap.

  The cap matters too: ``--xla_cpu_max_isa=AVX512`` changes the LLVM
  subtarget (and derived preferences like prefer-no-scatter/gather), so
  capped and uncapped processes on the SAME host produce mutually
  foreign AOT entries — seen as ``cpu_aot_loader`` machine-feature
  mismatch errors when they share a dir."""
  isa = ''
  for tok in os.environ.get('XLA_FLAGS', '').split():
    if tok.startswith('--xla_cpu_max_isa'):
      isa = tok
  try:
    with open('/proc/cpuinfo') as f:
      for line in f:
        if line.startswith('flags'):
          flags = ' '.join(sorted(line.split(':', 1)[1].split()))
          return hashlib.sha256(
              f'{flags}|{isa}'.encode()).hexdigest()[:8]
  except OSError:
    pass
  import platform

  return hashlib.sha256(
      f'{platform.machine()}-{platform.processor()}|{isa}'.encode()
  ).hexdigest()[:8]


def cache_dir(cpu: bool, base: str | None = None) -> str:
  """The compilation-cache directory for this run's backend."""
  base = base or os.environ.get(
      'JAX_COMPILATION_CACHE_DIR',
      os.path.expanduser('~/.cache/jax_comp_cache'))
  return f'{base}-cpu-{host_cpu_tag()}' if cpu else base


def force_cpu(num_devices: int, base: str | None = None) -> None:
  """The one call behind every ``--cpu-devices`` flag: CPU platform, N
  virtual devices, a host-feature-scoped compilation cache, and an ISA
  cap below AMX (XLA:CPU LLVM codegen has segfaulted on this
  environment's AMX hosts under long sessions).  Must run BEFORE any
  device query (the axon plugin ignores the ``JAX_PLATFORMS`` env var,
  so the config route is the only one)."""
  import jax

  if '--xla_cpu_max_isa' not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_cpu_max_isa=AVX512')
  jax.config.update('jax_platforms', 'cpu')
  jax.config.update('jax_num_cpu_devices', int(num_devices))
  jax.config.update('jax_compilation_cache_dir', cache_dir(True, base))
  # NOTE: in LONG processes XLA:CPU persistent-cache (de)serialization
  # can kill the process (segv/abort/silent exit-0); fresh processes
  # pass — retry/chunk instead of wiping the cache dir (see
  # tests/conftest.py for the full crash-class note).
