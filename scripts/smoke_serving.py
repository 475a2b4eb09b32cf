#!/usr/bin/env python
"""Hardware serving smoke: drive every production serving config on the
real chip over real HTTP sockets.

The CPU test fixtures are all tiny fp32 models, so bugs that only exist
in the production configuration surface here first — this script's first
run caught two: bf16 embeddings npy-serialized as opaque void16
(client-unusable), and ``make_text_query_encoder`` rejecting
``Model.init``'s ``{'params': ...}`` wrapper.

Configs driven (random weights — numerics are exercised, semantics are
not):

1. base bf16+flash, int8-quantized, over HTTP: raw-frame ``/v1/embed``
   vs ``/v1/embed_file`` (server-side decode) — embeddings must agree,
   responses must be float32, fp16 egress (``?dtype=float16``) must
   track them, ``/stats`` + ``/metrics`` (incl. request-latency
   histograms) must serve.
2. lvt-base bf16 (``pad_frames_to=16``): text tower over
   ``/v1/embed_text``, ``/v1/search`` against an index,
   ``/v1/search_video`` with a ``video/*`` body, multi-view
   ``/v1/embed_file``, server-side zero-shot (``/v1/zero_shot`` == the
   client-side protocol), ``/v1/localize`` over a frames service,
   online index mutation (``/v1/index/add`` + ``save`` + reload), and a
   short (8-frame) clip through the padded 16-frame geometry.
3. classifier-base bf16: ``/v1/classify`` with a ``video/*`` body.
4. AOT export: ``EmbeddingService(exported=...)`` must match direct
   apply bit-for-bit.

Run when the TPU claim is available (tunnel RTT makes each request
~0.3-0.5 s; whole script is a few minutes warm-cache)::

    python scripts/smoke_serving.py            # all stages
    python scripts/smoke_serving.py --stages 1,4
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_clip_mp4(path: str, frames: int = 16, size: int = 288) -> None:
  """A camera-footage-like synthetic clip (moving gradient + noise) —
  compressible like real video, unlike pure noise."""
  import cv2

  writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), 12.0,
                           (size, size))
  if not writer.isOpened():
    raise RuntimeError('cv2.VideoWriter failed to open (mp4v codec)')
  rng = np.random.RandomState(0)
  yy, xx = np.mgrid[0:size, 0:size]
  yy = yy.astype(np.float32)
  xx = xx.astype(np.float32)
  for t in range(frames):
    base = 128 + 90 * np.sin(xx / 30 + t * 0.4) * np.cos(yy / 40 - t * 0.2)
    frame = np.stack([base, np.roll(base, t * 3, 1), base[::-1]], -1)
    frame = np.clip(frame + rng.randn(size, size, 3) * 6, 0,
                    255).astype(np.uint8)
    writer.write(frame)
  writer.release()


def _cos(a, b) -> float:
  a = np.asarray(a, np.float32).ravel()
  b = np.asarray(b, np.float32).ravel()
  return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def main() -> int:
  parser = argparse.ArgumentParser(description=__doc__.split('\n')[0])
  parser.add_argument('--stages', default='1,2,3,4',
                      help='comma-separated subset of 1,2,3,4')
  parser.add_argument('--clip', default='/tmp/videoprism_smoke_clip.mp4')
  args = parser.parse_args()
  stages = {int(s) for s in args.stages.split(',')}

  import jax
  import jax.numpy as jnp

  jax.config.update('jax_compilation_cache_dir',
                    os.path.expanduser('~/.cache/jax_comp_cache'))

  from smoke_configs import ensure_tpu_executes

  # One clear line instead of a 10-minute hang when the axon claim is
  # held elsewhere (exit 75: retry later).
  ensure_tpu_executes()

  import videoprism_tpu as vp
  from videoprism_tpu import retrieval, serving, serving_http
  from videoprism_tpu.client import VideoPrismClient
  from videoprism_tpu.io import video as vio
  from videoprism_tpu.models import registry as registry_mod

  make_clip_mp4(args.clip)
  clip = vio.load_video(args.clip, 16, 288, as_uint8=True)

  def serve(model, state, **kw):
    svc = serving.EmbeddingService(
        model, state, batch_buckets=(1,),
        **{k: v for k, v in kw.items()
           if k in ('quantize', 'exported', 'pad_frames_to')})
    svc.start()
    httpd = serving_http.EmbeddingHTTPServer(
        svc, host='127.0.0.1', port=0,
        **{k: v for k, v in kw.items()
           if k in ('text_encode_fn', 'index', 'frames_service',
                    'index_save_path')})
    httpd.start()
    return svc, httpd, VideoPrismClient(f'http://127.0.0.1:{httpd.port}')

  model = vp.get_model('videoprism_public_v1_base', attention_impl='flash',
                       fprop_dtype=jnp.bfloat16)
  state = model.init(jax.random.PRNGKey(0))

  if 1 in stages:
    svc, httpd, c = serve(model, state, quantize='int8')
    e1 = c.embed(clip)
    e2 = c.embed_file(args.clip)
    assert e1.dtype == np.float32 and e2.dtype == np.float32, (
        e1.dtype, e2.dtype)
    cos = _cos(e1, e2)
    assert cos > 0.9999, cos
    # Half-width egress: ?dtype=float16 (the wire, not the chip, bounds
    # network-attached serving).
    c16 = VideoPrismClient(f'http://127.0.0.1:{httpd.port}',
                           response_dtype='float16')
    e16 = c16.embed(clip)
    assert e16.dtype == np.float16 and _cos(e16, e1) > 0.999, e16.dtype
    assert c.stats()['requests_served'] >= 3
    with urllib.request.urlopen(f'http://127.0.0.1:{httpd.port}/metrics',
                                timeout=30) as r:
      body = r.read()
    assert b'videoprism_requests_served_total' in body
    assert b'videoprism_request_latency_seconds_bucket' in body
    httpd.stop()
    svc.stop()
    print(f'1. int8 HTTP: embed==embed_file cosine {cos:.6f}, '
          f'fp16 egress cosine {_cos(e16, e1):.6f}  OK', flush=True)

  if 2 in stages:
    from videoprism_tpu import assets
    from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

    lvt = vp.get_model('videoprism_lvt_public_v1_base',
                       attention_impl='flash', fprop_dtype=jnp.bfloat16)
    lvt_state = lvt.init(jax.random.PRNGKey(1))
    tok = SentencePieceTokenizer(assets.test_spm_path())
    text_fn = retrieval.make_text_query_encoder(lvt_state, lvt.config, tok)
    dim = text_fn(['warmup']).shape[-1]
    index = retrieval.VideoIndex(
        np.random.RandomState(0).randn(5, dim).astype(np.float32),
        [f'v{i}' for i in range(5)])
    frames_svc = serving.EmbeddingService(
        retrieval.make_frame_embeddings_model(lvt.config), lvt_state,
        batch_buckets=(1,))
    frames_svc.start()
    index_save = args.clip + '.index.npz'
    svc, httpd, c = serve(lvt, lvt_state, text_encode_fn=text_fn,
                          index=index, frames_service=frames_svc,
                          index_save_path=index_save, pad_frames_to=16)
    t = c.embed_text(['a person drumming', 'the ocean'])
    assert t.shape == (2, dim) and np.isfinite(t).all(), t.shape
    assert len(c.search(['drumming'], k=3)[0]) == 3
    assert len(c.search_video_file(args.clip, k=2)) == 2
    # ViViT multi-view protocol server-side: 2x2 views, one decode,
    # aggregated embedding stays unit-norm.
    mv = c.embed_file(args.clip, temporal_views=2, spatial_views=2)
    assert mv.shape == (dim,) and abs(np.linalg.norm(mv) - 1.0) < 1e-3
    # Server-side zero-shot: register once, classify in one round trip
    # (remote) == the two-request client-side protocol.
    names = ['drumming on a bottle', 'swimming in the sea']
    zs_local = c.zero_shot(clip, names, temperature=1.0)
    zs_remote = c.zero_shot(clip, names, temperature=1.0, remote=True)
    assert [p['label'] for p in zs_local] == [
        p['label'] for p in zs_remote], (zs_local, zs_remote)
    assert abs(zs_local[0]['prob'] - zs_remote[0]['prob']) < 1e-3
    # Moment localization over the frames service: the container ships,
    # per-frame CLIP embeddings sweep server-side.
    loc = c.localize(args.clip, ['a person drumming'], k=2,
                     window_sizes=(2, 4))
    assert loc['frames'] == 16, loc
    segs = loc['results'][0]['segments']
    assert segs and all(0 <= g['start'] < g['end'] <= 16 for g in segs)
    # Long-video localization: windowed per-frame embeddings with the
    # overlapping sweep (stride < window -> per-frame spatial reuse on
    # chip), same container.
    loc_long = c.localize_long_file(args.clip, ['a person drumming'],
                                    k=2, window=8, stride=4,
                                    window_sizes=(2, 4), timeout_s=580)
    assert loc_long['frames'] == 16, loc_long
    segs_long = loc_long['results'][0]['segments']
    assert segs_long and all(
        0 <= g['start'] < g['end'] <= 16 for g in segs_long)
    # Online index mutation on the real chip: add the clip (file body,
    # server-side decode), find it top-1, persist + reload.
    assert c.index_add_file(args.clip, id='smoke-add') == 'smoke-add'
    top = c.search_video_file(args.clip, k=1)[0]
    assert top[0] == 'smoke-add' and top[1] > 0.999, top
    saved = c.index_save()
    assert saved['size'] == 6, saved  # 5 synthetic + the add
    assert len(retrieval.load_index(index_save)) == 6
    os.unlink(index_save)
    # Long-video embedding at the native window (16 frames — the
    # already-compiled geometry; a different window would pay a fresh
    # tunnel compile): one window for this clip, pooled row unit-norm.
    e_long = c.embed_long_file(args.clip, timeout_s=580)
    assert abs(np.linalg.norm(e_long) - 1.0) < 1e-2, np.linalg.norm(e_long)
    # Variable-length serving (pad_frames_to=16): an 8-frame clip rides
    # the SAME compiled geometry with a frame_paddings mask, and must
    # differ from attending the pad as black frames.
    short = clip[:8]
    e_short = c.embed(short)
    black = np.concatenate([short, np.zeros_like(short)], axis=0)
    e_black = c.embed(black)
    assert np.isfinite(e_short).all()
    assert abs(np.linalg.norm(e_short) - 1.0) < 1e-2
    assert _cos(e_short, e_black) < 0.9999, _cos(e_short, e_black)
    httpd.stop()
    frames_svc.stop()
    svc.stop()
    print(f'2. lvt text/search/search_video_file/multi-view/zero-shot/'
          f'localize/index-add+save/pad-frames: {t.shape}, '
          f'|mv|={np.linalg.norm(mv):.4f}, '
          f'zs={zs_remote[0]["label"]!r}@{zs_remote[0]["prob"]}, '
          f'loc={segs[0]}, short-vs-black cos='
          f'{_cos(e_short, e_black):.4f}  OK', flush=True)

  if 3 in stages:
    import dataclasses

    clf = registry_mod.videoprism_vc_v1_base(num_classes=7)
    clf = clf.replace_config(encoder=dataclasses.replace(
        clf.config.encoder, dtype=jnp.bfloat16, attention_impl='flash'))
    clf_state = clf.init(jax.random.PRNGKey(2))
    svc, httpd, c = serve(clf, clf_state)
    preds = c.classify_file(args.clip, k=3)
    assert len(preds) == 3
    assert abs(sum(p['prob'] for p in preds)) <= 1 + 1e-6
    # Long-video path: the same container through the exact streaming
    # pooler (8-frame windows, stride 4 -> overlapping sweep on chip).
    long_preds = c.classify_long_file(args.clip, k=3, window=8, stride=4,
                                      timeout_s=580)
    assert len(long_preds) == 3
    total = sum(p['prob'] for p in long_preds)
    assert 0.0 < total <= 1.0 + 1e-6, total  # top-3 of a 7-way softmax
    # Async job form of the same sweep: submit -> poll -> result must
    # equal the synchronous reply (the compiled programs are shared, so
    # this adds one sweep, not one compile).
    import json as json_mod

    jid = c.submit_job('classify_long', args.clip, k=3, window=8,
                       stride=4)
    job_out = json_mod.loads(c.wait_job(jid, poll_s=1.0, timeout_s=580))
    assert job_out['predictions'] == long_preds, (job_out, long_preds)
    httpd.stop()
    svc.stop()
    print(f'3. bf16 classifier classify_file: top1={preds[0]}, '
          f'classify_long top1={long_preds[0]} (async job == sync)  OK',
          flush=True)

  if 4 in stages:
    from videoprism_tpu import export as export_lib

    art = export_lib.export_forward(model, state)  # symbolic batch
    blob = art.serialize()
    svc, httpd, c = serve(model, state,
                          exported=export_lib.ExportedForward.deserialize(
                              blob))
    e_art = c.embed(clip)
    httpd.stop()
    svc.stop()
    ref, _ = model.apply(state, clip[None].astype(np.float32) / 255.0,
                         train=False)
    err = float(np.max(np.abs(
        e_art - np.asarray(ref)[0].astype(np.float32))))
    assert err == 0.0, err  # same lowering -> bit-identical
    print(f'4. AOT-artifact serving: {len(blob)} B artifact, '
          f'max|diff|={err}  OK', flush=True)

  print('ALL SERVING SMOKES PASS')
  return 0


if __name__ == '__main__':
  sys.exit(main())
