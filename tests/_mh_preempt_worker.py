"""Worker for the two-process preemption-agreement test.

Only process 0 receives the (self-delivered) SIGTERM; both processes must
agree to stop at the same sync step via the guard's flag allgather —
otherwise a sharded orbax save would deadlock with each process saving a
different step.
"""

import os
import signal
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 2)

from videoprism_tpu.parallel import distributed

distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                       num_processes=nproc, process_id=proc_id)
assert jax.process_count() == nproc

from videoprism_tpu.train import preemption

guard = preemption.PreemptionGuard(sync_every=4).install()

# Phase 1: no signal anywhere -> nobody stops, including at a sync step.
for step in (1, 2, 3, 4):
  assert not guard.should_stop(step), f'spurious stop at {step}'

# Phase 2: only process 0 is signalled.
if proc_id == 0:
  os.kill(os.getpid(), signal.SIGTERM)
  assert guard.triggered

# Off-sync steps never stop (even the locally-signalled process keeps
# stepping so the processes stay in lockstep for the collective).
for step in (5, 6, 7):
  assert not guard.should_stop(step), f'early stop at {step} (proc {proc_id})'
# The sync step agrees across processes.
assert guard.should_stop(8), f'no agreement at sync step (proc {proc_id})'

print(f'PREEMPT-AGREE-OK proc={proc_id}')
