#!/bin/bash
# One-shot hardware validation/measurement session — run when the TPU
# claim becomes available.  Order matters: cheapest signal first.
# Goal: close the seq-group coarsening question (CLAUDE.md: the fused
# attention-block twins ship gated off via tb.SEQ_GROUP_DISPATCH=False
# pending this A/B + the VMEM smoke).
set -x
cd /root/repo

# 0. Tunnel sanity (fails fast if the claim is still unavailable).
timeout 180 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices())
print(float(np.asarray(jnp.sum(jnp.ones((8,128))))))" || exit 1

# 1. MXU M-sweep: does M=512+ beat M=256 on model-shaped matmuls?
timeout 1500 python -u scripts/probes/probe_mxu_m.py

# 2. Seq-group A/B on the production attention kernel.
timeout 1800 python -u scripts/probes/bench_seqgroup.py

# 3. VMEM budget smoke (REQUIRED after the seq-group budget formulas).
timeout 900 python scripts/smoke_vmem.py

# 4. Bench sanity at base (fast args) — regression check vs 163 clips/s.
timeout 900 python bench.py --batch-sizes 1,64 --runs 2
