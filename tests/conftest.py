"""Test configuration: 8 virtual CPU devices + the reference Flax oracle.

All tests run on CPU with ``xla_force_host_platform_device_count=8`` so that
multi-device mesh/sharding tests exercise real GSPMD partitioning without TPU
hardware (SURVEY.md §4).

The upstream Flax implementation (mounted read-only at /root/reference) is
importable as the ``videoprism`` package and serves as the *numerical oracle*:
parity tests initialize a reference module, then drive the reference and this
framework with the SAME parameter tree and compare outputs.
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
# --xla_cpu_max_isa=AVX512: cap XLA:CPU codegen below AMX.  This
# environment's VMs rotate CPU shapes; on an AMX host the suite
# segfaulted twice inside XLA:CPU backend_compile_and_load (LLVM
# codegen) late in the run — same test passes in isolation.  Capping
# the ISA trades a little CPU-test speed for not crashing; numerics are
# unaffected for the parity tests (oracle and ours run under the same
# backend in the same process).
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count=8'
    + ' --xla_cpu_max_isa=AVX512'
)

# jax may already be imported by a pytest plugin, in which case the env vars
# above were captured too late — force the config directly (safe while no
# backend has been initialized yet).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
# Persistent compilation cache: this host is single-core, so XLA compiles
# dominate suite wall time — warm re-runs skip them.  The dir is SCOPED
# BY HOST CPU FEATURES (utils/compilation_cache.py): XLA:CPU cache
# entries embed AOT machine code for the compiling host, and this
# environment lands on a different VM session to session — loading a
# foreign entry has segfaulted the whole suite (jax
# compilation_cache.get_executable_and_time).  (CLI subprocess tests
# inherit their scripts' own cache-dir setup.)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from videoprism_tpu.utils.compilation_cache import cache_dir  # noqa: E402

jax.config.update(
    'jax_compilation_cache_dir',
    cache_dir(cpu=True,
              base=os.path.expanduser('~/.cache/jax_comp_cache_tests')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
# KNOWN CRASH CLASS (round-5 deep-dive; rounds 3-4 saw it too): in
# LONG pytest processes, XLA:CPU persistent-cache (de)serialization
# crashes nondeterministically around the 70-80% mark — seen in ONE
# session as a segv in get_executable_and_time (read), a segv AND an
# abort in put_executable_and_time (write), and twice as a SILENT
# exit(0) (~50-byte log, no summary, stale lastfailed, rc=0 LIES).
# The same modules pass every time in fresh/chunked processes —
# accumulated process state in the CPU backend, not a defect in any
# test.  Operational rules: (1) the RELEASE GATE is the 3-chunk
# sequential run (certified repeatedly; merge durations with
# check_suite_durations.py --run .durations_chunk*.json); (2) certify
# any run ONLY by its printed summary line — never rc alone; (3) do
# NOT wipe/quarantine the cache dir over a crash (cold runs crash
# MORE: writes are the hotter path); (4)
# jax_persistent_cache_enable_xla_caches='none' was tried and reverted
# (re-keys entries -> forces cold recompiles; crash reproduced under
# it).

_REFERENCE_PATH = '/root/reference'
# VIDEOPRISM_TPU_NO_REFERENCE=1 simulates an absent reference checkout:
# oracle/compat tests must skip cleanly and everything else (incl. the
# bundled-asset goldens) must stay green — the self-containedness contract.
_NO_REFERENCE = os.environ.get('VIDEOPRISM_TPU_NO_REFERENCE') == '1'
if (not _NO_REFERENCE and os.path.isdir(_REFERENCE_PATH)
    and _REFERENCE_PATH not in sys.path):
  sys.path.insert(0, _REFERENCE_PATH)

import pytest  # noqa: E402

# The <5-min iteration gate (`pytest -m core`): parity oracles,
# param-structure/API locks, and one representative module per
# subsystem.  Centralized here (not per-file marks) so the tier is easy
# to see and retune; `slow`-marked tests are excluded even in these
# modules.  The FULL fast suite (`-m "not slow"`) remains the release
# gate — core exists to keep mid-session iteration honest as the suite
# grows (VERDICT r3 weak-spot #4).
_CORE_MODULES = {
    'test_parity_layers',     # oracle: every primitive vs the reference
    'test_parity_models',     # oracle: all three model families
    'test_param_structure',   # checkpoint-schema preservation contract
    'test_api',               # public-surface name mirror
    'test_tokenizers',        # golden ids vs reference fixtures
    'test_fused_blocks',      # pallas kernel tier (interpret mode)
    'test_serving',           # micro-batching service
    'test_parallel',          # mesh/GSPMD/TP/train steps, 8-dev CPU mesh
    'test_streaming',         # exact streaming pooler
    'test_bench_contract',    # the perf-artifact contract
}
# Individually-heavy tests excluded from core (they stay in the fast
# suite): measured >30s each on this one-core host.
_CORE_EXCLUDE = {
    'test_accum_step_matches_manual_mean_of_grads',  # 56s
}


def pytest_collection_modifyitems(config, items):
  for item in items:
    if (item.module.__name__ in _CORE_MODULES
        and 'slow' not in item.keywords
        and item.originalname not in _CORE_EXCLUDE):
      item.add_marker(pytest.mark.core)


# ---------------- suite-time governance (VERDICT r4 #8) -----------------
# Release-gate runs set VIDEOPRISM_DURATIONS_OUT=<path>; this plugin then
# writes per-MODULE wall time (setup+call+teardown summed) as JSON.
# scripts/check_suite_durations.py diffs that against the committed
# SUITE_DURATIONS.json baseline and flags >50% module regressions or a
# fast tier projected past its budget — suite growth becomes a reviewed
# decision, not drift.
_module_durations: dict = {}


def pytest_runtest_logreport(report):
  if os.environ.get('VIDEOPRISM_DURATIONS_OUT'):
    module = report.nodeid.split('::', 1)[0]
    _module_durations[module] = (
        _module_durations.get(module, 0.0) + report.duration)


def pytest_sessionfinish(session, exitstatus):
  out = os.environ.get('VIDEOPRISM_DURATIONS_OUT')
  if not out or not _module_durations:
    return
  import json

  payload = {
      'total_s': round(sum(_module_durations.values()), 1),
      'modules': {m: round(s, 2) for m, s in
                  sorted(_module_durations.items(),
                         key=lambda kv: -kv[1])},
  }
  with open(out, 'w') as f:
    json.dump(payload, f, indent=1)


@pytest.fixture(scope='session')
def rng():
  import jax

  return jax.random.PRNGKey(0)


def reference_file(path: str) -> bool:
  """Whether a reference-checkout data file may be used by tests."""
  return not _NO_REFERENCE and os.path.exists(path)


def has_reference() -> bool:
  if _NO_REFERENCE:
    return False
  try:
    import videoprism  # noqa: F401

    return True
  except ImportError:
    return False


requires_reference = pytest.mark.skipif(
    not has_reference(), reason='reference Flax oracle not importable'
)
