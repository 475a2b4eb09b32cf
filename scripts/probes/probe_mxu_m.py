"""TPU probe: matmul TFLOPs vs M at base/large projection shapes.

If [256, D] @ [D, N] runs the MXU at materially lower efficiency than
[512+, D] @ [D, N], coarsening the attention-block grid (2+ sequences per
step) has headroom. fori_loop-chained with a data dependence (CLAUDE.md).
"""
import functools, time, os, sys
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
import jax.numpy as jnp
import numpy as np

print(jax.devices())

@functools.partial(jax.jit, static_argnames=('iters',))
def chain(a, w, iters: int):
  def body(i, carry):
    acc, a = carry
    o = jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.bfloat16)
    s = jnp.sum(o[0]).astype(jnp.float32)
    a = a.at[0, 0].add(s * 1e-30)
    return acc + s, a
  acc, _ = jax.lax.fori_loop(0, iters, body,
                             (jnp.zeros((), jnp.float32), a))
  return acc

for d, n in [(768, 768), (768, 3072)]:
  for m in (256, 512, 1024, 2048):
    a = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(0), (m, d), jnp.bfloat16))
    w = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(1), (d, n), jnp.bfloat16))
    iters = max(64, (4096 * 2048) // (m) // 8)
    np.asarray(chain(a, w, iters))
    t0 = time.perf_counter()
    np.asarray(chain(a, w, iters))
    dt = (time.perf_counter() - t0) / iters
    tf = 2 * m * d * n / dt / 1e12
    print(f'[{m:5d},{d}] @ [{d},{n}]: {dt*1e6:8.1f} us  {tf:6.1f} TF/s',
          flush=True)
    with open('/tmp/probe_mxu_results.txt', 'a') as fh:
      fh.write(f'{m} {d} {n} {dt*1e6:.1f} {tf:.1f}\n')
