"""Seq-group crossover map: where does G>1 win on the real kernel?

Session-7 follow-up to bench_seqgroup.py, which showed g=2 +7% at
b=16 t=256 d=768 (the b1 serving grid) but -2% at b=64.  This sweeps
the grid-size axis to find the crossover so the production gate
(tb.SEQ_GROUP_DISPATCH) can be small-grid-conditioned rather than
all-or-nothing.
"""
import sys
sys.path.insert(0, '/root/repo')
from bench_seqgroup import bench  # noqa: E402  (same dir)

# base spatial geometry, grid-size sweep (b1 serving = 16 sequences)
for b in (4, 8, 16, 32):
  bench(b, 256, 768, 12, 64, (1, 2))
# base temporal packed blocks (b1 = 32 blocks of 128 tokens)
for b in (16, 32):
  bench(b, 128, 768, 12, 64, (1, 2, 4))
