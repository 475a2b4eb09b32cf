#!/bin/bash
# One-shot hardware validation for the session-10 serving features —
# run when the TPU claim becomes available.  Cheapest signal first.
#
# What this session changed that CPU tests cannot fully validate:
#   * per-request latency histograms + /metrics (serving_http)
#   * ?dtype=float16 egress on /v1/embed[_file]   [VALIDATED in-session]
#   * online index mutation (add/remove/save)     [add+save VALIDATED]
#   * pad_frames_to serving                        [VALIDATED in-session]
#   * /v1/classify_long + /v1/embed_long — VALIDATED (session 11): the
#     first run found+fixed the weights-baked-into-HLO 413 (commit
#     2c30352); the re-run caught a claim window and stage 3 passed
#     (classify_long top1 agrees with one-shot classify on the demo
#     clip).  Full script re-ran green: smoke_serving 4/4, bench
#     163.3 b64 / 149.7 b1 / p50 6.68 ms / mfu 0.743, entry() +
#     dryrun_multichip(8) all legs.
# smoke_serving.py stages cover all of the above.
set -x
cd /root/repo

# 0. Claim probe (exit 75 = still unavailable; retry later).
timeout 240 python -c "
import sys; sys.path.insert(0, 'scripts')
import smoke_configs; smoke_configs.ensure_tpu_executes()
print('claim OK')" || exit 75

# 1. Serving hardware smoke (now incl. fp16 egress, index add/save,
#    pad-frames short clip through the padded bf16+flash geometry).
timeout 900 python scripts/smoke_serving.py || exit 1

# 2. Headline bench regression (expect ~163 clips/s base bf16 b64,
#    b1 p50 ~6.7 ms; chip drifts ~10% process-to-process).
timeout 900 python bench.py --batch-sizes 1,64 --runs 2

# 3. Driver entries still green.
timeout 900 python __graft_entry__.py
timeout 900 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
