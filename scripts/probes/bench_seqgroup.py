"""A/B: fused_attention_block seq_group=1 vs 2/4 (fori-loop chained)."""
import functools, time, sys, os
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
import jax.numpy as jnp
import numpy as np
from videoprism_tpu.ops.pallas import transformer_block as tb

print(jax.devices(), flush=True)


def bench(b, t, d, n, h, groups, iters=50):
  nh = n * h
  ks = jax.random.split(jax.random.PRNGKey(0), 12)
  mk = lambda k, shape, s=0.02: (s * jax.random.normal(k, shape)).astype(
      jnp.bfloat16)
  x = jax.device_put(mk(ks[0], (b, t, d), 1.0))
  mask = jax.device_put(jnp.zeros((1, 1, t), jnp.float32))
  w = [mk(ks[1], (d,)), mk(ks[2], (d,)),
       mk(ks[3], (d, nh)), mk(ks[4], (nh,)),
       mk(ks[5], (d, nh)), mk(ks[6], (nh,)),
       mk(ks[7], (d, nh)), mk(ks[8], (nh,)),
       mk(ks[9], (nh, d)), mk(ks[10], (d,))]
  w = [jax.device_put(a) for a in w]
  kw = dict(num_heads=n, dim_per_head=h, logit_cap=50.0,
            query_scale=h ** -0.5)

  for g in groups:
    @functools.partial(jax.jit, static_argnames=('iters',))
    def chain(x, iters: int, g=g):
      def body(i, carry):
        acc, x = carry
        o = tb.fused_attention_block(x, mask, *w, seq_group=g, **kw)
        s = jnp.sum(o[0, 0]).astype(jnp.float32)
        x = x.at[0, 0, 0].add(s * 1e-30)
        return acc + s, x
      return jax.lax.fori_loop(0, iters, body,
                               (jnp.zeros((), jnp.float32), x))[0]
    np.asarray(chain(x, iters))
    best = 1e9
    for _ in range(3):
      t0 = time.perf_counter()
      np.asarray(chain(x, iters))
      best = min(best, (time.perf_counter() - t0) / iters)
    print(f'b={b} t={t} d={d} g={g}: {best*1e3:.3f} ms/layer-half',
          flush=True)


# base spatial: b64 throughput grid (1024 seqs) is too slow to compile
# for a probe; 64 sequences shows the same per-step geometry.
bench(64, 256, 768, 12, 64, (1, 2))
# base spatial latency grid (b1 = 16 frame-sequences)
bench(16, 256, 768, 12, 64, (1, 2))
# base temporal packed (128-token blocks)
bench(64, 128, 768, 12, 64, (1, 2, 4))
