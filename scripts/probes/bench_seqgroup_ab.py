"""Interleaved seq-group A/B: alternate g=1/g=2 timings to cancel drift.

bench_seqgroup.py / bench_seqgroup2.py showed the g=1-vs-g=2 delta
flipping sign between process runs (~10% process-to-process drift on the
tunneled chip).  This interleaves the two variants measurement-by-
measurement and reports paired medians, which is robust to slow drift.
"""
import functools, time, sys
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
import jax.numpy as jnp
import numpy as np
from videoprism_tpu.ops.pallas import transformer_block as tb

print(jax.devices(), flush=True)


def paired_ab(b, t, d, n, h, g2, iters=50, reps=15):
  nh = n * h
  ks = jax.random.split(jax.random.PRNGKey(0), 12)
  mk = lambda k, shape, s=0.02: (s * jax.random.normal(k, shape)).astype(
      jnp.bfloat16)
  x = jax.device_put(mk(ks[0], (b, t, d), 1.0))
  mask = jax.device_put(jnp.zeros((1, 1, t), jnp.float32))
  w = [jax.device_put(a) for a in (
      mk(ks[1], (d,)), mk(ks[2], (d,)),
      mk(ks[3], (d, nh)), mk(ks[4], (nh,)),
      mk(ks[5], (d, nh)), mk(ks[6], (nh,)),
      mk(ks[7], (d, nh)), mk(ks[8], (nh,)),
      mk(ks[9], (nh, d)), mk(ks[10], (d,)))]
  kw = dict(num_heads=n, dim_per_head=h, logit_cap=50.0,
            query_scale=h ** -0.5)

  def make_chain(g):
    @functools.partial(jax.jit, static_argnames=('iters',))
    def chain(x, iters: int):
      def body(i, carry):
        acc, x = carry
        o = tb.fused_attention_block(x, mask, *w, seq_group=g, **kw)
        s = jnp.sum(o[0, 0]).astype(jnp.float32)
        x = x.at[0, 0, 0].add(s * 1e-30)
        return acc + s, x
      return jax.lax.fori_loop(0, iters, body,
                               (jnp.zeros((), jnp.float32), x))[0]
    return chain

  c1, c2 = make_chain(1), make_chain(g2)
  np.asarray(c1(x, iters)); np.asarray(c2(x, iters))  # warm both
  deltas, t1s, t2s = [], [], []
  for _ in range(reps):
    t0 = time.perf_counter(); np.asarray(c1(x, iters))
    e1 = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter(); np.asarray(c2(x, iters))
    e2 = (time.perf_counter() - t0) / iters
    t1s.append(e1); t2s.append(e2); deltas.append((e1 - e2) / e1)
  med = sorted(deltas)[len(deltas) // 2]
  print(f'b={b} t={t} d={d}  g1 med {sorted(t1s)[reps//2]*1e3:.3f} ms  '
        f'g{g2} med {sorted(t2s)[reps//2]*1e3:.3f} ms  '
        f'paired delta med {med*100:+.1f}%  '
        f'(min {min(deltas)*100:+.1f}%, max {max(deltas)*100:+.1f}%)',
        flush=True)


paired_ab(16, 256, 768, 12, 64, 2)   # base spatial, b1 serving grid
paired_ab(64, 256, 768, 12, 64, 2)   # base spatial, throughput grid
paired_ab(16, 128, 768, 12, 64, 2)   # base temporal packed, b1
paired_ab(32, 128, 768, 12, 64, 4)   # base temporal packed, b4-ish
