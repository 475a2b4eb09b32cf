"""Turnkey real-checkpoint validation: one command, one JSON report.

The north-star acceptance criteria (WEIGHTS-VALIDATION.md; reference
verify_clip_models.py:62-95, README.md:199-214) in a single runnable
artifact.  With network access:

    python scripts/validate_release.py

runs, in order, and writes ``validate_release_report.json``:

  1. checkpoints — download + load all four released checkpoints through
     the public loader (``load_pretrained_weights``; param counts
     checked against the published sizes).
  2. parity     — ``verify_parity.py --checkpoint <name> --json`` for
     both lvt models against the Flax oracle, gate 1e-4.
  3. tokenizer  — our SentencePiece implementation vs the ``sentencepiece``
     C++ wheel (if installed) on the real ``c4_en.model``, over a ~350
     string corpus (unicode, digits, byte-fallback, whitespace edge
     cases); always also diffed against our native C++ core.
  4. retrieval  — embeddings from the lvt-base checkpoint through
     ``evaluation.retrieval_metrics`` (protocol smoke; pass ``--msrvtt-dir``
     with ``{video_id}.mp4`` clips + ``captions.tsv`` for the real
     MSRVTT-1K R@1 to compare vs the published 50.1).
  5. int8_delta — quantize, re-embed, report embedding cosine and the
     retrieval-delta vs the bf16 path.
  6. export     — AOT StableHLO artifacts for both lvt towers:
     serialize → deserialize → match against the direct apply (the
     serving fleet ships these artifacts).

Offline (this build environment has no egress), the SAME stages run on
their strongest local proxies — ``--offline`` forces it, and stages also
degrade per-stage automatically when a download fails:

  checkpoints: synthetic tiny checkpoint through the same npz loader;
  parity:      verify_parity.py random-init mode (full lvt widths, same
               oracle + gate — measured 7e-8 in round 2);
  tokenizer:   pure-Python vs native C++ core on the bundled 1k fixture
               (+ reference binary fixture goldens when mounted);
  retrieval / int8_delta: tiny random CLIP end-to-end through the same
               code paths (metrics sanity-gated, not quality-gated).

Every stage emits {status: pass|fail|skip|proxy-pass, ...}; exit code is
1 iff any stage is 'fail'.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update('jax_platforms', 'cpu')
from videoprism_tpu.utils.compilation_cache import cache_dir  # noqa: E402

jax.config.update('jax_compilation_cache_dir', cache_dir(cpu=True))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

RELEASED = {
    # name -> published param count (reference README.md:157-162).
    'videoprism_public_v1_base': 114_000_000,
    'videoprism_public_v1_large': 354_000_000,
    'videoprism_lvt_public_v1_base': 248_000_000,
    'videoprism_lvt_public_v1_large': 580_000_000,
}
LVT_MODELS = ('videoprism_lvt_public_v1_base',
              'videoprism_lvt_public_v1_large')
PARITY_GATE = 1e-4


# --------------------------------------------------------------------------
# Tokenizer corpus: deterministic, ~350 strings covering the divergence
# risks (unicode normalization, digits, byte fallback, whitespace).
# --------------------------------------------------------------------------


def tokenizer_corpus() -> list[str]:
  import random
  import string

  rng = random.Random(20260817)
  corpus = [
      '', ' ', '  ', 'a', 'the quick brown fox jumps over the lazy dog.',
      'hello world', 'Hello, World!', 'HELLO WORLD',
      '123', '3.14159', '1,000,000 dollars', 'room 101b',
      'year 2026; month 08; day 17',
      'don\'t stop believing', 'it\'s a "test" -- really!',
      'multiple   spaces\tand\ttabs', ' leading and trailing ',
      'newline\ncharacters\nhere',
      'café résumé naïve', 'Zürich São Paulo',  # latin accents
      '日本語のテキスト', '中文文本', '한국어 텍스트',  # CJK
      'Привет мир', 'مرحبا بالعالم', 'שלום עולם',  # cyrillic/rtl
      '🎬🎥📹', 'emoji 🚀 in text', '👨‍👩‍👧‍👦 family',  # emoji + ZWJ
      'ﬁligree ﬂoor',  # ligatures (NFKC-normalized by spm)
      '①②③ circled', 'Ⅻ roman numeral',  # NFKC compat chars
      'a' * 200, 'ab' * 100, 'supercalifragilisticexpialidocious',
      'http://example.com/path?q=1&r=2', 'user@example.com',
      'snake_case_identifier camelCaseIdentifier',
      'C++ and C# and F#', '#hashtag @mention',
      '​ zero width space', 'nbsp here',
  ]
  letters = string.ascii_letters + string.digits + ' .,!?-\'"'
  for _ in range(200):
    corpus.append(''.join(rng.choices(letters, k=rng.randint(1, 120))))
  unicode_pool = 'áéíóúñçßøåæ日本語中文한국어🎬🚀✓†‡§¶'
  for _ in range(100):
    corpus.append(''.join(rng.choices(letters + unicode_pool,
                                      k=rng.randint(1, 80))))
  return corpus


# --------------------------------------------------------------------------
# Stages.  Each returns a dict with at least {'status': ...}.
# --------------------------------------------------------------------------


def stage_checkpoints(offline: bool) -> dict:
  import videoprism_tpu as vp

  if not offline:
    loaded = {}
    try:
      for name, published in RELEASED.items():
        state = vp.load_pretrained_weights(name)
        tree = state.get('params', state) if isinstance(state, dict) else state
        n = int(sum(x.size for x in jax.tree.leaves(tree)))
        loaded[name] = {
            'params': n,
            'published': published,
            # Published counts are rounded to millions.
            'count_ok': abs(n - published) < 0.01 * published,
        }
        del state, tree
      ok = all(v['count_ok'] for v in loaded.values())
      return {'status': 'pass' if ok else 'fail', 'models': loaded}
    except Exception as e:
      print(f'  checkpoint download failed ({type(e).__name__}: {e}); '
            'falling back to the offline loader proxy')

  # Offline proxy: the same npz-loader plumbing on a synthetic tree.
  import tempfile

  from videoprism_tpu.io import checkpoints as ckpt_lib

  tree = {
      'spatial': {'w': np.arange(12, dtype=np.float32).reshape(3, 4)},
      'stack': {'x_layers': {'b': np.ones((2, 5), np.float32)}},
  }
  with tempfile.TemporaryDirectory() as tmp:
    path = os.path.join(tmp, 'fixture.npz')
    ckpt_lib.save_checkpoint(path, {'params': tree})
    state = vp.load_pretrained_weights(None, checkpoint_path=path)
    got = state['params'] if 'params' in state else state
    same = (
        jax.tree.structure(got) == jax.tree.structure(tree)
        and all(np.array_equal(np.asarray(a), b) for a, b in
                zip(jax.tree.leaves(got), jax.tree.leaves(tree))))
  return {'status': 'proxy-pass' if same else 'fail',
          'detail': 'loader round-trip on synthetic npz '
                    '(real download needs network)'}


def stage_parity(offline: bool) -> dict:
  results = {}
  worst_overall = 0.0
  any_fail = False
  any_real = False
  for model in LVT_MODELS:
    base_cmd = [sys.executable, os.path.join(_ROOT, 'verify_parity.py'),
                '--model', model, '--json', '--gate', str(PARITY_GATE)]

    def run(cmd):
      proc = subprocess.run(cmd, capture_output=True, text=True,
                            cwd=_ROOT, timeout=7200)
      line = next((l for l in reversed(proc.stdout.splitlines())
                   if l.startswith('{')), None)
      return proc, line

    t0 = time.time()
    if offline:
      proc, line = run(base_cmd)
    else:
      proc, line = run(base_cmd + ['--checkpoint', model])
      if proc.returncode != 0 and line is None:
        # Download failure etc: random-init (offline proxy) mode.
        print(f'  {model}: checkpoint parity failed to run; '
              'retrying in random-init proxy mode')
        proc, line = run(base_cmd)
    if line is None:
      results[model] = {'status': 'fail',
                        'detail': proc.stdout[-500:] + proc.stderr[-500:]}
      any_fail = True
      continue
    rec = json.loads(line)
    if rec.get('skip'):
      results[model] = {'status': 'skip', 'detail': rec['skip']}
      continue
    ok = bool(rec['pass'])
    any_fail |= not ok
    any_real |= rec.get('checkpoint') is not None
    worst_overall = max(worst_overall, rec['worst_abs_diff'])
    results[model] = {
        'status': ('pass' if rec.get('checkpoint') else 'proxy-pass')
                  if ok else 'fail',
        'worst_abs_diff': rec['worst_abs_diff'],
        'seconds': round(time.time() - t0, 1),
    }
  statuses = {r['status'] for r in results.values()}
  status = ('fail' if any_fail else
            'skip' if statuses == {'skip'} else
            'pass' if any_real else 'proxy-pass')
  return {'status': status, 'gate': PARITY_GATE,
          'worst_abs_diff': worst_overall, 'models': results}


def _diff_tokenizers(tok_a, tok_b, corpus, label) -> dict:
  mismatches = []
  for s in corpus:
    a, b = tok_a.to_int(s), tok_b.to_int(s)
    if a != b:
      mismatches.append({'text': s[:80], 'a': a[:20], 'b': b[:20]})
  return {
      'pair': label, 'strings': len(corpus),
      'mismatches': len(mismatches),
      'examples': mismatches[:5],
  }


def stage_tokenizer(offline: bool) -> dict:
  from videoprism_tpu import assets
  from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

  corpus = tokenizer_corpus()
  diffs = []

  # (a) real c4_en.model vs the C++ sentencepiece wheel (network + wheel).
  if not offline:
    try:
      import sentencepiece as spm_cc

      import videoprism_tpu as vp

      ours = vp.load_text_tokenizer('c4_en')
      cc = spm_cc.SentencePieceProcessor(model_file=ours.model_path)
      gold = [list(cc.EncodeAsIds(s)) for s in corpus]
      mine = [ours.to_int(s) for s in corpus]
      bad = [i for i, (a, b) in enumerate(zip(mine, gold)) if a != b]
      diffs.append({
          'pair': 'c4_en: videoprism_tpu vs sentencepiece-C++',
          'strings': len(corpus), 'mismatches': len(bad),
          'examples': [{'text': corpus[i][:80], 'a': mine[i][:20],
                        'b': gold[i][:20]} for i in bad[:5]],
      })
    except ImportError:
      diffs.append({'pair': 'c4_en vs sentencepiece-C++',
                    'skip': 'sentencepiece wheel not installed'})
    except Exception as e:
      diffs.append({'pair': 'c4_en vs sentencepiece-C++',
                    'skip': f'{type(e).__name__}: {e}'})

  # (b) always: pure-Python vs our native C++ core on the bundled fixture.
  py = SentencePieceTokenizer(assets.test_spm_path(), use_native=False)
  nat = SentencePieceTokenizer(assets.test_spm_path(), use_native=True)
  if nat._native is not None:
    diffs.append(_diff_tokenizers(
        nat, py, corpus, 'bundled-1k: native-C++ vs python'))
  else:
    diffs.append({'pair': 'bundled-1k: native-C++ vs python',
                  'skip': 'native tokenizer unavailable'})

  # (c) reference binary fixture goldens when the checkout is mounted.
  ref_spm = '/root/reference/videoprism/assets/testdata/test_spm.model'
  if os.path.exists(ref_spm):
    t = SentencePieceTokenizer(ref_spm)
    golden_ok = (t.to_int('blah') == [80, 180, 60])
    diffs.append({'pair': 'reference-fixture C++ goldens',
                  'strings': 1, 'mismatches': 0 if golden_ok else 1})

  ran = [d for d in diffs if 'mismatches' in d]
  if not ran:
    return {'status': 'skip', 'diffs': diffs}
  ok = all(d['mismatches'] == 0 for d in ran)
  real = any('sentencepiece-C++' in d['pair'] for d in ran)
  return {'status': ('pass' if real else 'proxy-pass') if ok else 'fail',
          'diffs': diffs}


def _tiny_clip():
  """A tiny random lvt-style model through the real code paths."""
  import videoprism_tpu as vp
  from videoprism_tpu.models import clip as vclip
  from videoprism_tpu.models import init as init_lib

  cfg = vclip.VideoCLIPConfig(
      model_dim=64, num_spatial_layers=2, num_temporal_layers=1,
      num_auxiliary_layers=1, num_heads=2, mlp_dim=128, patch_size=6,
      pos_emb_shape=(2, 2, 2), vocabulary_size=128,
      num_unimodal_layers=2, atten_logit_cap=50.0)
  params = init_lib.init_video_clip(jax.random.PRNGKey(0), cfg)
  model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
  return model, params, cfg


def _embed_all(model, params, videos, text_ids, text_pads):
  fwd = jax.jit(lambda p, v, ti, tp: model.apply(p, v, ti, tp, train=False))
  v_emb, t_emb, _ = fwd(params, videos, text_ids, text_pads)
  return np.asarray(v_emb, np.float32), np.asarray(t_emb, np.float32)


def _load_lvt_or_tiny(offline: bool):
  """(model, params, is_real, videos, text_ids, text_pads)"""
  import videoprism_tpu as vp
  from videoprism_tpu import assets
  from videoprism_tpu.io import video as video_lib

  if not offline:
    try:
      name = 'videoprism_lvt_public_v1_base'
      model = vp.get_model(name)
      state = vp.load_pretrained_weights(name)
      params = state.get('params', state)
      clip = video_lib.load_video(assets.demo_video_path(), num_frames=16)
      videos = np.stack([clip, clip[::-1]])  # 2 "different" clips
      tok = vp.load_text_tokenizer('c4_en')
      ids, pads = vp.tokenize_texts(
          tok, ['a colorful moving gradient with a bouncing square',
                'a reversed colorful moving gradient'], max_length=64)
      return model, params, True, videos, ids, pads
    except Exception as e:
      print(f'  real lvt-base unavailable ({type(e).__name__}: {e}); '
            'using the tiny offline proxy model')
  model, params, cfg = _tiny_clip()
  n = 4
  videos = np.asarray(jax.random.uniform(
      jax.random.PRNGKey(1), (n, 2, 12, 12, 3)), np.float32)
  ids = np.asarray(jax.random.randint(
      jax.random.PRNGKey(2), (n, 8), 3, 128), np.int32)
  pads = np.zeros((n, 8), np.float32)
  return model, params, False, videos, ids, pads


def stage_retrieval(offline: bool, msrvtt_dir: str | None,
                    shared: dict) -> dict:
  from videoprism_tpu import evaluation

  model, params, is_real, videos, ids, pads = _load_lvt_or_tiny(offline)
  shared.update(model=model, params=params, is_real=is_real,
                videos=videos, ids=ids, pads=pads)

  if msrvtt_dir and is_real:
    return _real_msrvtt(model, params, msrvtt_dir)

  v_emb, t_emb = _embed_all(model, params, videos, ids, pads)
  shared.update(v_emb=v_emb, t_emb=t_emb)
  metrics = evaluation.retrieval_metrics(v_emb, t_emb)
  # Protocol sanity gates (quality needs real data): metrics in range and
  # self-retrieval is perfect.
  self_metrics = evaluation.retrieval_metrics(v_emb, v_emb)
  sane = (0.0 <= metrics['t2v_recall@1'] <= 1.0
          and self_metrics['t2v_recall@1'] == 1.0)
  return {
      'status': ('pass' if is_real else 'proxy-pass') if sane else 'fail',
      'detail': ('bundled-demo smoke' if is_real else
                 'tiny-model protocol smoke') +
                '; pass --msrvtt-dir for the published-R@1 comparison',
      't2v_r1': float(metrics['t2v_recall@1']),
      'self_retrieval_r1': float(self_metrics['t2v_recall@1']),
  }


def _real_msrvtt(model, params, msrvtt_dir: str) -> dict:
  """MSRVTT-1K protocol: {video_id}.mp4 clips + captions.tsv
  (video_id<TAB>caption, one row per test pair)."""
  import videoprism_tpu as vp
  from videoprism_tpu import evaluation
  from videoprism_tpu.io import video as video_lib

  rows = []
  with open(os.path.join(msrvtt_dir, 'captions.tsv')) as f:
    for line in f:
      vid, cap = line.rstrip('\n').split('\t', 1)
      rows.append((vid, cap))
  tok = vp.load_text_tokenizer('c4_en')
  ids, pads = vp.tokenize_texts(tok, [c for _, c in rows], max_length=64)
  fwd = jax.jit(lambda p, v, ti, tp: model.apply(p, v, ti, tp, train=False))
  v_embs, t_embs = [], []
  for i, (vid, _) in enumerate(rows):
    clip = video_lib.load_video(
        os.path.join(msrvtt_dir, f'{vid}.mp4'), num_frames=16)[None]
    v, t, _ = fwd(params, clip, ids[i:i + 1], pads[i:i + 1])
    v_embs.append(np.asarray(v)[0])
    t_embs.append(np.asarray(t)[0])
  metrics = evaluation.retrieval_metrics(
      np.stack(v_embs), np.stack(t_embs))
  published = 0.501  # reference README.md:201 (LvT-B t2v R@1, MSRVTT-1K)
  return {'status': 'pass' if metrics['t2v_recall@1'] > published - 0.02
          else 'fail',
          'clips': len(rows), 't2v_r1': float(metrics['t2v_recall@1']),
          'published_r1': published, **{k: float(v)
                                        for k, v in metrics.items()}}


def stage_int8_delta(offline: bool, shared: dict) -> dict:
  from videoprism_tpu import evaluation, quantization

  if 'model' not in shared:
    return {'status': 'skip', 'detail': 'retrieval stage did not run'}
  model, params = shared['model'], shared['params']
  videos, ids, pads = shared['videos'], shared['ids'], shared['pads']
  is_real = shared['is_real']

  qparams = quantization.quantize_for_serving(params)
  v_bf16, t_bf16 = shared.get('v_emb'), shared.get('t_emb')
  if v_bf16 is None:
    v_bf16, t_bf16 = _embed_all(model, params, videos, ids, pads)
  v_q, t_q = _embed_all(model, qparams, videos, ids, pads)

  def cos(a, b):
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return float((num / den).min())

  r_bf16 = evaluation.retrieval_metrics(v_bf16, t_bf16)['t2v_recall@1']
  r_q = evaluation.retrieval_metrics(v_q, t_q)['t2v_recall@1']
  worst_cos = min(cos(v_bf16, v_q), cos(t_bf16, t_q))
  ok = worst_cos > 0.99 and abs(r_q - r_bf16) <= (0.01 if is_real else 0.5)
  return {
      'status': ('pass' if is_real else 'proxy-pass') if ok else 'fail',
      'worst_embedding_cosine': worst_cos,
      'r1_bf16': float(r_bf16), 'r1_int8': float(r_q),
      'r1_delta': float(r_q - r_bf16),
  }


def stage_export(offline: bool, shared: dict) -> dict:
  """AOT artifacts for the serving fleet: export both lvt towers, round-
  trip serialize→deserialize, and match against the direct apply — the
  release check that the shipped StableHLO computes the shipped model."""
  from videoprism_tpu import export as export_lib

  if 'model' not in shared:
    return {'status': 'skip', 'detail': 'retrieval stage did not run'}
  model, params = shared['model'], shared['params']
  videos, ids, pads = shared['videos'], shared['ids'], shared['pads']
  is_real = shared['is_real']

  worst = 0.0
  sizes = {}
  for tower in ('video', 'text'):
    art = export_lib.export_forward(model, params, tower=tower,
                                    text_len=ids.shape[1])
    blob = art.serialize()
    sizes[tower] = len(blob)
    back = export_lib.ExportedForward.deserialize(blob)
    if tower == 'video':
      got = np.asarray(back(params, videos[:2]))
      want, _, _ = model.apply(params, videos[:2], None, None, train=False)
    else:
      got = np.asarray(back(params, ids[:2], pads[:2]))
      _, want, _ = model.apply(params, None, ids[:2], pads[:2],
                               train=False)
    worst = max(worst, float(np.max(np.abs(got - np.asarray(want)))))
  ok = worst <= 1e-5
  return {
      'status': ('pass' if is_real else 'proxy-pass') if ok else 'fail',
      'max_abs_diff_vs_direct': worst,
      'artifact_bytes': sizes,
  }


def stage_suite_durations(offline: bool) -> dict:
  """Suite-time governance (VERDICT r4 #8): the release gate's pytest
  run writes SUITE_DURATIONS_RUN.json (conftest hook, enabled via
  VIDEOPRISM_DURATIONS_OUT); this stage diffs it against the committed
  SUITE_DURATIONS.json baseline — module regressions >50% or a
  blown fast-tier budget fail the release."""
  scripts_dir = os.path.dirname(os.path.abspath(__file__))
  if scripts_dir not in sys.path:
    sys.path.insert(0, scripts_dir)
  from check_suite_durations import (BASELINE_PATH, RUN_PATH,
                                     check_durations)

  if not os.path.exists(RUN_PATH):
    return {'status': 'skip',
            'detail': 'no SUITE_DURATIONS_RUN.json — run the gate with '
                      'VIDEOPRISM_DURATIONS_OUT=SUITE_DURATIONS_RUN.json'}
  with open(RUN_PATH) as f:
    run = json.load(f)
  baseline = None
  if os.path.exists(BASELINE_PATH):
    with open(BASELINE_PATH) as f:
      baseline = json.load(f)
  findings = check_durations(run, baseline)
  return {
      'status': 'fail' if findings else 'pass',
      'total_min': round(run.get('total_s', 0.0) / 60, 1),
      'modules': len(run.get('modules', {})),
      'findings': findings,
      'baseline': bool(baseline),
  }


STAGES = ('checkpoints', 'parity', 'tokenizer', 'retrieval', 'int8_delta',
          'export', 'suite_durations')


def main() -> int:
  parser = argparse.ArgumentParser(
      description='One-command release validation (JSON report).')
  parser.add_argument('--offline', action='store_true',
                      help='force the no-network proxies for every stage')
  parser.add_argument('--stages', default=','.join(STAGES),
                      help=f'comma-separated subset of {STAGES}')
  parser.add_argument('--msrvtt-dir', default=None,
                      help='MSRVTT-1K dir ({video_id}.mp4 + captions.tsv) '
                           'for the real published-R@1 comparison')
  parser.add_argument('--report', default='validate_release_report.json')
  args = parser.parse_args()

  wanted = [s.strip() for s in args.stages.split(',') if s.strip()]
  unknown = set(wanted) - set(STAGES)
  if unknown:
    parser.error(f'unknown stages: {sorted(unknown)}')

  shared: dict = {}
  report = {'offline': args.offline, 'stages': {}}
  for stage in STAGES:
    if stage not in wanted:
      continue
    print(f'=== {stage} ===')
    t0 = time.time()
    try:
      if stage == 'checkpoints':
        result = stage_checkpoints(args.offline)
      elif stage == 'parity':
        result = stage_parity(args.offline)
      elif stage == 'tokenizer':
        result = stage_tokenizer(args.offline)
      elif stage == 'retrieval':
        result = stage_retrieval(args.offline, args.msrvtt_dir, shared)
      elif stage == 'int8_delta':
        result = stage_int8_delta(args.offline, shared)
      elif stage == 'suite_durations':
        result = stage_suite_durations(args.offline)
      else:
        result = stage_export(args.offline, shared)
    except Exception as e:
      import traceback

      traceback.print_exc()
      result = {'status': 'fail', 'detail': f'{type(e).__name__}: {e}'}
    result['seconds'] = round(time.time() - t0, 1)
    report['stages'][stage] = result
    print(f'  -> {result["status"]} ({result["seconds"]}s)')

  statuses = [r['status'] for r in report['stages'].values()]
  report['overall'] = 'fail' if 'fail' in statuses else (
      'pass' if all(s == 'pass' for s in statuses) else 'proxy-pass')
  with open(args.report, 'w') as f:
    json.dump(report, f, indent=2, default=str)
  print(json.dumps({'overall': report['overall'],
                    'stages': {k: v['status']
                               for k, v in report['stages'].items()},
                    'report': args.report}))
  return 1 if report['overall'] == 'fail' else 0


if __name__ == '__main__':
  sys.exit(main())
