"""Compilation-cache scoping (utils/compilation_cache.py): CPU AOT
entries must never be shared across host shapes OR across XLA:CPU ISA
caps — both produce foreign machine code (observed as cpu_aot_loader
feature-mismatch errors / a suite-killing segfault)."""

import os

from videoprism_tpu.utils import compilation_cache as cc


def test_cpu_dir_is_scoped_and_tpu_is_not():
  assert cc.cache_dir(cpu=False, base='/x/cache') == '/x/cache'
  cpu_dir = cc.cache_dir(cpu=True, base='/x/cache')
  assert cpu_dir.startswith('/x/cache-cpu-') and len(cpu_dir.split('-')[-1]) == 8


def test_isa_cap_changes_the_scope(monkeypatch):
  """Capped (--xla_cpu_max_isa=AVX512) and uncapped processes on the
  same host must not share a CPU cache dir: the cap changes the LLVM
  subtarget and the derived scatter/gather preferences."""
  monkeypatch.setenv('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
  uncapped = cc.host_cpu_tag()
  monkeypatch.setenv(
      'XLA_FLAGS',
      '--xla_force_host_platform_device_count=8 --xla_cpu_max_isa=AVX512')
  capped = cc.host_cpu_tag()
  assert uncapped != capped
  # Deterministic within one configuration.
  assert capped == cc.host_cpu_tag()
  monkeypatch.setenv('XLA_FLAGS', '--xla_cpu_max_isa=AVX2')
  assert cc.host_cpu_tag() not in (capped, uncapped)


def test_force_cpu_is_importable_and_documented():
  # force_cpu is the mandated entry point for every --cpu-devices path
  # (CLAUDE.md gotcha) — keep its contract visible.
  assert callable(cc.force_cpu)
  assert 'ISA' in (cc.force_cpu.__doc__ or '')
