"""Hardware smoke for the scoped-VMEM budget formulas.

The budget predicates in ``ops/pallas/transformer_block.py`` (and the
int8 twins in ``ops/pallas/int8_blocks.py``) exclude pipeline buffers
from the ~16 MB scoped-VMEM stack based on hardware measurement; the
CPU/interpret test suite **cannot** catch a real scoped-VMEM overflow, so
any change to a budget formula must re-run this script on a real TPU.

It pushes the largest shipping geometries (base/large/giant spatial
layers, t=256) through every kernel path the production dispatch can
choose — monolithic attention block, head-chunked attention (2 and 4
chunks where divisible+fitting), monolithic FFN, F-chunked FFN, and the
int8 W8A8 chunked variants — and checks cosine parity against the
composed jnp twins.  A budget formula that over-promises fails here with
a Mosaic scoped-VMEM allocation error instead of in production.

Run:  python scripts/smoke_vmem.py            (~2-4 min incl. compiles)
Exit: 0 = all exercised paths pass; 1 = any failure.
"""

from __future__ import annotations

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from videoprism_tpu.ops.pallas import int8_blocks as i8  # noqa: E402
from videoprism_tpu.ops.pallas import transformer_block as tb  # noqa: E402

# The shipping spatial-layer geometries (t=256 tokens per frame); the
# temporal (t<=16) and text (t=65) geometries are strictly smaller.
GEOMETRIES = (
    # name,   t,    d,  n,  h,    f
    ('base', 256, 768, 12, 64, 3072),
    ('large', 256, 1024, 16, 64, 4096),
    ('giant', 256, 1408, 16, 88, 6144),
)
BATCH = 2  # per-kernel grid dim; VMEM residency is batch-independent
DTYPE = jnp.bfloat16


def _seed(name: str) -> int:
  """Deterministic per-geometry seed (str hash is salted per process —
  PYTHONHASHSEED — which would make failures non-reproducible)."""
  return zlib.crc32(name.encode()) % 2**31


def _cos(a, b):
  a = np.asarray(a, np.float32).ravel()
  b = np.asarray(b, np.float32).ravel()
  return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def _force(x):
  # block_until_ready does not block over the axon tunnel; a 4-byte
  # scalar fetch does (CLAUDE.md).
  return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def _attn_operands(key, t, d, n, h):
  ks = jax.random.split(key, 12)
  nh = n * h
  mk = lambda k, shape, s=0.02: (s * jax.random.normal(k, shape)).astype(
      DTYPE)
  x = mk(ks[0], (BATCH, t, d), 1.0)
  mask = jnp.zeros((1, 1, t), jnp.float32)
  return dict(
      x=x, mask=mask,
      ln_s=mk(ks[1], (d,)), ln_b=mk(ks[2], (d,)),
      wq=mk(ks[3], (d, nh)), bq=mk(ks[4], (nh,)),
      wk=mk(ks[5], (d, nh)), bk=mk(ks[6], (nh,)),
      wv=mk(ks[7], (d, nh)), bv=mk(ks[8], (nh,)),
      wo=mk(ks[9], (nh, d)), bo=mk(ks[10], (d,)))


def _quant_cols(w):
  """Per-output-column symmetric int8 (matches quantization._quantize_leaf
  semantics for a flattened [in, out] weight)."""
  wf = np.asarray(w, np.float32)
  s = np.maximum(np.abs(wf).max(axis=0) / 127.0, 1e-12)
  q = np.clip(np.round(wf / s), -127, 127).astype(np.int8)
  return jnp.asarray(q), jnp.asarray(s, jnp.float32)


def run_attention(name, t, d, n, h, results):
  ops = _attn_operands(jax.random.PRNGKey(_seed(name)), t, d, n, h)
  kw = dict(num_heads=n, dim_per_head=h, logit_cap=50.0,
            query_scale=h ** -0.5)
  ref = tb._composed_attention_block(
      ops['x'], ops['mask'], ops['ln_s'], ops['ln_b'],
      ops['wq'], ops['bq'], ops['wk'], ops['bk'],
      ops['wv'], ops['bv'], ops['wo'], ops['bo'], epsilon=1e-6, **kw)
  _force(ref)

  args = (ops['x'], ops['mask'], ops['ln_s'], ops['ln_b'],
          ops['wq'], ops['bq'], ops['wk'], ops['bk'],
          ops['wv'], ops['bv'], ops['wo'], ops['bo'])
  nh = n * h

  paths = []
  if tb.attention_block_supported(t, d, nh, DTYPE.dtype.itemsize):
    paths.append(('mono', lambda: tb.fused_attention_block(*args, **kw)))
  # Exercise the chunked path even when the monolithic one is the
  # production choice — a formula change can flip the dispatch.
  for chunks in (2, 4):
    if n % chunks == 0 and tb._attn_chunk_fits(
        t, d, (n // chunks) * h, DTYPE.dtype.itemsize):
      paths.append((f'chunk{chunks}', lambda c=chunks:
                    tb.fused_attention_block_chunked(*args, chunks=c, **kw)))

  # Sequence-group coarsening (G sequences per grid step): the
  # attention_seq_group_for budget also excludes pipeline buffers (which
  # scale with G), so it too can only overflow on hardware.
  gsel = tb.attention_seq_group_for(8, t, d, nh, DTYPE.dtype.itemsize)
  if gsel > 1:
    reps = (2 * gsel) // BATCH  # two grid steps at group gsel
    xg = jnp.concatenate([ops['x']] * reps, axis=0)
    refg = jnp.concatenate([ref] * reps, axis=0)
    _check(f'{name} attn seqgroup{gsel} (t={t} d={d} nh={nh})',
           lambda: tb.fused_attention_block(xg, *args[1:],
                                            seq_group=gsel, **kw),
           refg, 0.999, results)

  i8c = i8.attention_int8_chunks_for(t, d, n, h, DTYPE.dtype.itemsize)
  if i8c is not None:
    wq8, sq = _quant_cols(ops['wq'])
    wk8, sk = _quant_cols(ops['wk'])
    wv8, sv = _quant_cols(ops['wv'])
    wo8, so = _quant_cols(ops['wo'])
    paths.append((f'int8x{i8c}', lambda: i8.int8_attention_block_chunked(
        ops['x'], ops['mask'], ops['ln_s'], ops['ln_b'],
        wq8, sq, ops['bq'], wk8, sk, ops['bk'], wv8, sv, ops['bv'],
        wo8, so, ops['bo'], chunks=i8c, epsilon=1e-6, **kw)))

  for label, fn in paths:
    _check(f'{name} attn {label} (t={t} d={d} nh={nh})', fn, ref,
           0.99 if label.startswith('int8') else 0.999, results)


def run_ffn(name, t, d, f, results):
  rows = BATCH * t
  key = jax.random.PRNGKey(_seed(name) + 1)
  ks = jax.random.split(key, 6)
  mk = lambda k, shape, s=0.02: (s * jax.random.normal(k, shape)).astype(
      DTYPE)
  x = mk(ks[0], (rows, d), 1.0)
  pads = jnp.zeros((rows, 1), DTYPE)
  ln_s, ln_b = mk(ks[1], (d,)), mk(ks[2], (d,))
  w1, b1 = mk(ks[3], (d, f)), mk(ks[4], (f,))
  w2, b2 = mk(ks[5], (f, d)), mk(ks[4], (d,))
  ref = tb._composed_ffn_block(x, pads, ln_s, ln_b, w1, b1, w2, b2,
                               activation='gelu', epsilon=1e-6)
  _force(ref)
  args = (x, pads, ln_s, ln_b, w1, b1, w2, b2)

  paths = []
  if tb.ffn_block_supported(rows, d, f, DTYPE.dtype.itemsize):
    paths.append(('mono', lambda: tb.fused_ffn_block(*args)))
  for chunks in (2, 4):
    if f % chunks == 0 and tb._ffn_chunk_row_block(
        rows, d, f // chunks, DTYPE.dtype.itemsize) is not None:
      paths.append((f'chunk{chunks}', lambda c=chunks:
                    tb.fused_ffn_block_chunked(*args, chunks=c)))
  i8c = i8.ffn_int8_chunks_for(rows, d, f, DTYPE.dtype.itemsize)
  if i8c is not None:
    w18, s1 = _quant_cols(w1)
    w28, s2 = _quant_cols(w2)
    paths.append((f'int8x{i8c}', lambda: i8.int8_ffn_block_chunked(
        x, pads, ln_s, ln_b, w18, s1, b1, w28, s2, b2, chunks=i8c)))

  for label, fn in paths:
    _check(f'{name} ffn  {label} (rows={rows} d={d} f={f})', fn, ref,
           0.99 if label.startswith('int8') else 0.999, results)


def run_long_attention(name, t, d, n, h, results):
  """The beyond-T-cap int8 path (aux-encoder geometry): row-blocked int8
  projections around the bf16 flash core."""
  ops = _attn_operands(jax.random.PRNGKey(_seed(name)), t, d, n, h)
  kw = dict(num_heads=n, dim_per_head=h, logit_cap=50.0,
            query_scale=h ** -0.5)
  ref = tb._composed_attention_block(
      ops['x'], ops['mask'], ops['ln_s'], ops['ln_b'],
      ops['wq'], ops['bq'], ops['wk'], ops['bk'],
      ops['wv'], ops['bv'], ops['wo'], ops['bo'], epsilon=1e-6, **kw)
  _force(ref)
  if not i8.attn_int8_projection_supported(
      BATCH * t, d, n * h, DTYPE.dtype.itemsize):
    results.append((f'{name} attn proj+flash (t={t})', False,
                    'projection path unexpectedly unsupported'))
    return
  wq8, sq = _quant_cols(ops['wq'])
  wk8, sk = _quant_cols(ops['wk'])
  wv8, sv = _quant_cols(ops['wv'])
  wo8, so = _quant_cols(ops['wo'])
  mask4d = ops['mask'][:, None]  # [1, 1, 1, T] additive
  _check(f'{name} attn proj+flash (t={t} d={d})',
         lambda: i8.int8_projected_flash_attention(
             ops['x'], mask4d, ops['ln_s'], ops['ln_b'],
             wq8, sq, ops['bq'], wk8, sk, ops['bk'], wv8, sv, ops['bv'],
             wo8, so, ops['bo'], epsilon=1e-6, **kw),
         ref, 0.99, results)


def run_mono_layer(name, t, d, n, h, f, results):
  """The int8 whole-layer kernel (attention + FFN in one pallas_call) —
  the _layer_int8_cfg budget can only overflow on hardware."""
  nh = n * h
  cfg = i8._layer_int8_cfg(t, d, nh, f, n, DTYPE.dtype.itemsize)
  if cfg is None:
    results.append((f'{name} layer mono (t={t} d={d})', False,
                    'mono layer unexpectedly unsupported'))
    return
  ops = _attn_operands(jax.random.PRNGKey(_seed(name)), t, d, n, h)
  key = jax.random.PRNGKey(_seed(name) + 2)
  ks = jax.random.split(key, 4)
  mk = lambda k, shape, s=0.02: (s * jax.random.normal(k, shape)).astype(
      DTYPE)
  ln2_s, ln2_b = mk(ks[0], (d,)), mk(ks[1], (d,))
  w1, b1 = mk(ks[2], (d, f)), mk(ks[0], (f,))
  w2, b2 = mk(ks[3], (f, d)), mk(ks[1], (d,))
  kw = dict(num_heads=n, dim_per_head=h, logit_cap=50.0,
            query_scale=h ** -0.5)

  x1 = tb._composed_attention_block(
      ops['x'], ops['mask'], ops['ln_s'], ops['ln_b'],
      ops['wq'], ops['bq'], ops['wk'], ops['bk'],
      ops['wv'], ops['bv'], ops['wo'], ops['bo'], epsilon=1e-6, **kw)
  pads = jnp.zeros((BATCH * t, 1), DTYPE)
  ref = tb._composed_ffn_block(
      x1.reshape(BATCH * t, d), pads, ln2_s, ln2_b, w1, b1, w2, b2,
      activation='gelu', epsilon=1e-6).reshape(BATCH, t, d)
  _force(ref)

  wq8, sq = _quant_cols(ops['wq'])
  wk8, sk = _quant_cols(ops['wk'])
  wv8, sv = _quant_cols(ops['wv'])
  wo8, so = _quant_cols(ops['wo'])
  w18, s1 = _quant_cols(w1)
  w28, s2 = _quant_cols(w2)
  hc, fc = cfg
  _check(f'{name} layer mono hc={hc} fc={fc} (t={t} d={d} f={f})',
         lambda: i8.int8_layer_block(
             ops['x'], ops['mask'], pads.reshape(BATCH, t, 1),
             ops['ln_s'], ops['ln_b'],
             wq8, sq, ops['bq'], wk8, sk, ops['bk'], wv8, sv, ops['bv'],
             wo8, so, ops['bo'], ln2_s, ln2_b,
             w18, s1, b1, w28, s2, b2, epsilon=1e-6, **kw),
         ref, 0.99, results)


def _check(label, fn, ref, gate, results):
  try:
    out = fn()
    _force(out)
    cos = _cos(out, ref)
    ok = np.isfinite(np.asarray(out, np.float32)).all() and cos >= gate
    results.append((label, ok, f'cos={cos:.6f}'))
  except Exception as e:  # scoped-VMEM overflow surfaces here
    results.append((label, False, f'{type(e).__name__}: {e}'))


def main():
  import argparse

  parser = argparse.ArgumentParser(description=__doc__.split('\n')[0])
  parser.parse_args()
  if jax.default_backend() != 'tpu':
    print('SKIP: smoke_vmem.py requires a real TPU '
          f'(backend={jax.default_backend()}). The budget formulas can '
          'only overflow on hardware.')
    return 0
  from smoke_configs import ensure_tpu_executes

  # One clear line instead of a long hang when the axon claim is held
  # elsewhere (exit 75: retry later).
  ensure_tpu_executes()
  results = []
  for name, t, d, n, h, f in GEOMETRIES:
    run_attention(name, t, d, n, h, results)
    run_ffn(name, t, d, f, results)
  # The packed temporal geometry (128-token blocks) picks seq_group=4 —
  # exercise its budget too (attention only; its FFN rows are covered).
  run_attention('base-temporal', 128, 768, 12, 64, results)
  # Beyond-T-cap (aux encoder) int8 projection path; t=2048 keeps the
  # composed oracle's [N,T,T] probs affordable while exercising the same
  # kernels as the real t=4096.
  run_long_attention('aux-base', 2048, 768, 12, 64, results)
  run_long_attention('aux-large', 2048, 1024, 16, 64, results)
  # Int8 whole-layer kernel: every geometry _layer_int8_cfg admits in
  # production (base spatial/temporal, base+large text towers).
  run_mono_layer('base-spatial', 256, 768, 12, 64, 3072, results)
  run_mono_layer('base-temporal', 128, 768, 12, 64, 3072, results)
  run_mono_layer('text-base', 64, 768, 12, 64, 3072, results)
  run_mono_layer('text-large', 64, 1024, 16, 64, 4096, results)
  width = max(len(r[0]) for r in results)
  failed = 0
  for label, ok, detail in results:
    print(f'{"PASS" if ok else "FAIL"}  {label:<{width}}  {detail}')
    failed += not ok
  print(f'{len(results) - failed}/{len(results)} kernel paths pass')
  return 1 if failed else 0


if __name__ == '__main__':
  sys.exit(main())
