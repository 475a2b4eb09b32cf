"""Multi-host initialization logic (env-mocked; single process).

``jax.distributed.initialize`` cannot actually run under one process, so
these tests assert the *decision logic*: when initialize() must call it,
with what arguments, and when it must stay quiet.
"""

import jax
import pytest

from videoprism_tpu.parallel import distributed


@pytest.fixture()
def record_init(monkeypatch):
  calls = []

  def fake_initialize(coordinator_address=None, num_processes=None,
                      process_id=None):
    calls.append(dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id))

  monkeypatch.setattr(jax.distributed, 'initialize', fake_initialize)
  monkeypatch.setattr(distributed, '_already_initialized', lambda: False)
  for var in ('COORDINATOR_ADDRESS', 'TPU_WORKER_HOSTNAMES',
              'MEGASCALE_COORDINATOR_ADDRESS'):
    monkeypatch.delenv(var, raising=False)
  return calls


class TestInitialize:

  def test_single_host_no_env_is_noop(self, record_init):
    distributed.initialize()
    assert record_init == []

  def test_explicit_coordinator_initializes(self, record_init):
    distributed.initialize('10.0.0.1:8476', num_processes=4, process_id=1)
    assert record_init == [dict(coordinator_address='10.0.0.1:8476',
                                num_processes=4, process_id=1)]

  @pytest.mark.parametrize('var', ['COORDINATOR_ADDRESS',
                                   'TPU_WORKER_HOSTNAMES',
                                   'MEGASCALE_COORDINATOR_ADDRESS'])
  def test_env_autodetect_initializes(self, record_init, monkeypatch, var):
    monkeypatch.setenv(var, 'host0:8476')
    distributed.initialize()
    # Auto-detection path: args left None so jax reads TPU metadata/env.
    assert record_init == [dict(coordinator_address=None,
                                num_processes=None, process_id=None)]

  def test_already_initialized_is_noop(self, record_init, monkeypatch):
    """Covers re-entry AND the running-multi-process case (which always
    implies an initialized client).  The guard must NOT query
    jax.process_count()/jax.devices() — that would initialize the backend
    and break jax.distributed.initialize on real pods."""
    monkeypatch.setattr(distributed, '_already_initialized', lambda: True)
    distributed.initialize('10.0.0.1:8476')
    assert record_init == []

  def test_is_primary(self):
    assert distributed.is_primary() == (jax.process_index() == 0)
