#!/usr/bin/env python
"""Stand up the HTTP embedding server (stdlib, no extra deps).

  python scripts/serve_embeddings.py --model videoprism_public_v1_base \
      --quantize int8 --port 8000

Client (the SDK handles 503 backoff / deadlines / auth)::

    from videoprism_tpu.client import VideoPrismClient
    emb = VideoPrismClient('http://HOST:8000').embed(clip_uint8)
    emb = VideoPrismClient('http://HOST:8000').embed_file('clip.mp4')
    # embed_file ships the compressed container (10-50x less wire than
    # raw frames) and decodes server-side with the native decoder.

or two lines of raw numpy::

    import numpy as np, urllib.request, io
    buf = io.BytesIO(); np.save(buf, clip_uint8)   # [T, H, W, 3]
    req = urllib.request.Request('http://HOST:8000/v1/embed',
                                 buf.getvalue(),
                                 {'Content-Type': 'application/x-npy'})
    emb = np.load(io.BytesIO(urllib.request.urlopen(req).read()))

Concurrent clients micro-batch into one TPU dispatch (the service's
bucketed queue); ``GET /stats`` exposes the counters.

Smoke (tiny random model, CPU):
  python scripts/serve_embeddings.py --tiny --cpu-devices 2 --smoke
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import signal
import threading

import jax

jax.config.update(
    'jax_compilation_cache_dir',
    os.environ.get('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/jax_comp_cache')))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import videoprism_tpu as vp  # noqa: E402
from videoprism_tpu import assets  # noqa: E402
from videoprism_tpu import serving  # noqa: E402
from videoprism_tpu.serving import EmbeddingService  # noqa: E402
from videoprism_tpu.serving_http import EmbeddingHTTPServer  # noqa: E402


def _build_extra_model(spec: str, args):
  """``NAME=MODEL[:int8]`` → (name, started EmbeddingService,
  text_encode_fn, text_service, warmup clip shape, reload_fn).

  MODEL is a registry name (bf16 + flash, weights auto-resolved — lvt
  models get a text tower) or the ``tiny``/``tiny_clip`` smoke fixtures
  (random init).  Bucket/wait/shedding knobs are shared with the default
  model; classifier extras are not supported here (they need a trained
  checkpoint + ``--num-classes`` — run them as the default model)."""
  from smoke_configs import TINY_CLIP, TINY_CLIP_SHAPE, TINY_ENC

  name, _, model_spec = spec.partition('=')
  if not name or not model_spec:
    raise SystemExit(f'--extra-model expects NAME=MODEL[:int8], '
                     f'got {spec!r}')
  model_name, _, quant = model_spec.partition(':')
  quantize = quant or None
  if quantize not in (None, 'int8'):
    raise SystemExit(f'--extra-model {spec!r}: unknown option {quant!r} '
                     "(only ':int8')")
  if model_name == 'tiny':
    from videoprism_tpu.models import factorized_encoder as fe
    from videoprism_tpu.models import init as init_lib

    cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    state = model.init(jax.random.PRNGKey(7))
    clip_shape = TINY_CLIP_SHAPE
  elif model_name == 'tiny_clip':
    from videoprism_tpu.models import clip as vclip
    from videoprism_tpu.models import init as init_lib

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(7))
    clip_shape = TINY_CLIP_SHAPE
  else:
    model = vp.get_model(model_name, fprop_dtype=jnp.bfloat16,
                         attention_impl='flash')
    state = vp.load_pretrained_weights(model_name)
    clip_shape = (args.warmup_frames or 16, 288, 288, 3)
  service = EmbeddingService(
      model, state,
      batch_buckets=tuple(int(b) for b in args.buckets.split(',')),
      max_wait_ms=args.max_wait_ms, quantize=quantize,
      max_pending=args.max_pending, cache_entries=args.cache)
  service.start()
  text_encode_fn = text_service = None
  from videoprism_tpu.models.clip import VideoCLIPConfig
  if isinstance(model.config, VideoCLIPConfig):
    from videoprism_tpu import retrieval
    from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

    try:
      tok_path = assets.resolve_tokenizer_path(
          args.tokenizer_model, allow_fixture=model_name == 'tiny_clip')
    except ValueError as e:
      raise SystemExit(str(e)) from None
    tokenizer = SentencePieceTokenizer(tok_path)
    text_service = serving.TextEncodeService(
        retrieval.make_text_query_encoder(
            model._unwrap(state), model.config, tokenizer),
        max_wait_ms=args.max_wait_ms, max_pending=args.max_pending,
        cache_entries=args.cache)
    text_service.start()
    text_encode_fn = text_service.encode

  def reload_fn():
    """SIGHUP leg for this model: re-resolve the registry weights and
    swap them in (and rebuild the text closure — it holds its own copy
    of the tree, or /v1/search would mix embedding spaces)."""
    if model_name in ('tiny', 'tiny_clip'):
      print(f'reload[{name}]: tiny fixture serves random init; skipped')
      return
    new_state = vp.load_pretrained_weights(model_name)
    service.reload_state(new_state)
    if text_service is not None:
      from videoprism_tpu import retrieval

      text_service.reload(retrieval.make_text_query_encoder(
          model._unwrap(new_state), model.config, tokenizer))
    print(f'reload[{name}]: serving new weights', flush=True)

  return name, service, text_encode_fn, text_service, clip_shape, reload_fn


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--model', default='videoprism_public_v1_base')
  parser.add_argument('--checkpoint', default=None,
                      help='local npz/safetensors (default: the usual '
                           'weights-dir resolution; random init with --tiny)')
  parser.add_argument('--quantize', default=None, choices=[None, 'int8'])
  parser.add_argument('--buckets', default='1,4,8',
                      help='micro-batch buckets, comma-separated')
  parser.add_argument('--max-wait-ms', type=float, default=5.0)
  parser.add_argument('--max-pending', type=int, default=None,
                      help='bound the request queue; full -> HTTP 503 '
                           '(load shedding). Default: unbounded.')
  parser.add_argument('--cache', type=int, default=0, metavar='N',
                      help='content-addressed LRU over embed results: a '
                           'clip (or text) whose exact bytes were served '
                           'before skips the chip. N entries per service '
                           '(video result budget 1 GiB); cleared on hot '
                           'reload. Default: off.')
  parser.add_argument('--auth-token', default=None,
                      help='require "Authorization: Bearer <token>" on the '
                           'POST endpoints; defaults to $VIDEOPRISM_AUTH_TOKEN '
                           '(env keeps the secret out of process listings)')
  parser.add_argument('--host', default='0.0.0.0')
  parser.add_argument('--port', type=int, default=8000)
  parser.add_argument('--warmup-frames', type=int, default=0,
                      help='pre-compile every bucket at [N, 288, 288, 3] '
                           'uint8 before accepting traffic (0: skip)')
  parser.add_argument('--num-classes', type=int, default=0,
                      help='serve a TRAINED classifier: builds the '
                           'classifier architecture over --model\'s '
                           'encoder config; requires --checkpoint with '
                           'the full classifier tree from '
                           'train_classifier.py (0: embedding server)')
  parser.add_argument('--labels', default=None, metavar='FILE',
                      help='one class name per line; attaches names to '
                           '/v1/classify predictions')
  parser.add_argument('--from-export', default=None, metavar='ARTIFACT',
                      help='AOT StableHLO artifact from '
                           'scripts/export_model.py (symbolic batch): the '
                           'video forward runs from it with no Python '
                           'tracing/jit on startup. Must be exported from '
                           'the same checkpoint (+ --quantize setting).')
  parser.add_argument('--from-export-text', default=None, metavar='ARTIFACT',
                      help="text-tower artifact (export_model.py --tower "
                           "text) for /v1/embed_text — AOT, no re-trace "
                           "(lvt models)")
  parser.add_argument('--index', default=None,
                      help='retrieval.VideoIndex npz (from '
                           'scripts/build_video_index.py): enables '
                           'POST /v1/search + /v1/index/add (lvt models '
                           'only). "new" / "new-ann" starts an EMPTY '
                           'mutable corpus (exact / HNSW) to be filled '
                           'over the wire — a vector database.')
  parser.add_argument('--index-backend',
                      choices=('host', 'device', 'device-int8'),
                      default='host',
                      help='where /v1/search sweeps the corpus: host '
                           '(numpy exact / HNSW, the default) or device '
                           '(DeviceAcceleratedIndex: exact search over '
                           'the HBM-sharded snapshot; mutations still '
                           'apply host-side and refresh it). device-int8 '
                           'stores the HBM corpus as per-row-scaled int8 '
                           '— half the sweep bytes, ranking-tier scores')
  parser.add_argument('--index-save-path', default=None,
                      help='enables POST /v1/index/save: persist the '
                           '(mutated) index atomically to this npz path '
                           '(may equal --index to update it in place)')
  parser.add_argument('--tokenizer-model', default=None,
                      help='SentencePiece model for /v1/embed_text '
                           '(lvt models; default: bundled fixture or '
                           '$VIDEOPRISM_SPM_PATH)')
  parser.add_argument('--enable-localize', action='store_true',
                      help='lvt models: also serve the per-frame '
                           'embedding forward and enable /v1/localize '
                           '(text-to-time moment search). The frames '
                           'service shares the float weight tree (one '
                           'HBM copy).')
  parser.add_argument('--extra-model', action='append', default=None,
                      metavar='NAME=MODEL[:int8]',
                      help='serve another model from the same process/port '
                           'at /v1/models/<NAME>/... (repeatable). MODEL is '
                           'a registry name (weights auto-resolve; lvt '
                           'models get their text tower too) or "tiny"/'
                           '"tiny_clip" for smoke fixtures. ":int8" turns '
                           'on W8A8 serving for that model. Buckets/wait/'
                           'shedding knobs are shared; one SIGHUP '
                           'hot-reloads every model on the pod.')
  parser.add_argument('--job-max-queued', type=int, default=8,
                      help='async long-video jobs (/v1/jobs) admission '
                           'bound: submits beyond this shed with '
                           '503 + Retry-After')
  parser.add_argument('--job-ttl-s', type=float, default=3600.0,
                      help='seconds a finished job (and its result) is '
                           'retained for GET /v1/jobs/<id>/result')
  parser.add_argument('--pad-frames', action='store_true',
                      help='accept clips SHORTER than the warmup frame '
                           'count on /v1/embed: they pad + mask '
                           '(frame_paddings) into the one compiled '
                           'geometry instead of compiling per length')
  parser.add_argument('--tiny', action='store_true',
                      help='tiny random model (wire-format smoke testing)')
  parser.add_argument('--tiny-clip', action='store_true',
                      help='tiny random lvt model (text/search smoke)')
  parser.add_argument('--cpu-devices', type=int, default=0)
  parser.add_argument('--smoke', action='store_true',
                      help='start, self-request once, print, and exit')
  args = parser.parse_args()

  # Serving a real lvt model exposes the text tower — resolve the
  # tokenizer BEFORE loading/warming multi-GB weights so missing
  # configuration fails in milliseconds (the bundled fixture is a TEST
  # vocabulary and would silently produce garbage text embeddings).
  tok_path = None
  if args.tiny or args.tiny_clip or 'lvt' in args.model:
    try:
      tok_path = assets.resolve_tokenizer_path(
          args.tokenizer_model,
          allow_fixture=args.tiny or args.tiny_clip)
    except ValueError as e:
      raise SystemExit(str(e)) from None

  if args.cpu_devices:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    # CPU platform + host-feature-scoped compile cache (a foreign
    # host's XLA:CPU AOT entries can SIGILL/segfault on load).
    force_cpu(args.cpu_devices)

  from smoke_configs import TINY_CLIP, TINY_CLIP_SHAPE, TINY_ENC

  if args.num_classes:
    from videoprism_tpu.models import classifier as vc
    from videoprism_tpu.models import factorized_encoder as fe
    from videoprism_tpu.models import init as init_lib

    # Same production knobs as the embedding path below: bf16 + fused
    # kernels (fp32/XLA here would also make --quantize int8 dequantize
    # inside every step instead of engaging the int8 kernels).
    enc_cfg = (fe.FactorizedEncoderConfig(**TINY_ENC) if args.tiny
               else vp.get_model(args.model, fprop_dtype=jnp.bfloat16,
                                 attention_impl='flash').config)
    cfg = vc.VideoClassifierConfig(encoder=enc_cfg,
                                   num_classes=args.num_classes)
    model = vp.Model(cfg, vc.apply, init_lib.init_video_classifier)
    if args.tiny:
      state = model.init(jax.random.PRNGKey(0))
      clip_shape = TINY_CLIP_SHAPE
    elif args.checkpoint:
      state = vp.load_pretrained_weights(None,
                                         checkpoint_path=args.checkpoint)
      clip_shape = (args.warmup_frames or 16, 288, 288, 3)
    else:
      raise SystemExit('--num-classes serving needs --checkpoint (a '
                       'trained classifier tree from train_classifier.py '
                       '-- the registry ships only untrained heads)')
  elif args.tiny_clip:
    from videoprism_tpu.models import clip as vclip
    from videoprism_tpu.models import init as init_lib

    cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(0))
    clip_shape = TINY_CLIP_SHAPE
  elif args.tiny:
    from videoprism_tpu.models import factorized_encoder as fe
    from videoprism_tpu.models import init as init_lib

    cfg = fe.FactorizedEncoderConfig(**TINY_ENC)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    state = model.init(jax.random.PRNGKey(0))
    clip_shape = TINY_CLIP_SHAPE
  else:
    model = vp.get_model(args.model, fprop_dtype=jnp.bfloat16,
                         attention_impl='flash')
    if args.checkpoint:
      state = vp.load_pretrained_weights(None,
                                         checkpoint_path=args.checkpoint)
    else:
      state = vp.load_pretrained_weights(args.model)
    clip_shape = (args.warmup_frames or 16, 288, 288, 3)

  if args.from_export:
    print(f'video forward: AOT artifact {args.from_export} (no re-trace)')
  pad_frames_to = clip_shape[0] if args.pad_frames else None
  if args.pad_frames and args.from_export:
    raise SystemExit('--pad-frames builds the forward from model code; '
                     'it does not compose with --from-export')
  if args.pad_frames:
    print(f'pad-frames: clips shorter than {pad_frames_to} frames pad + '
          'mask into the one compiled geometry')
  service = EmbeddingService(
      model, state,
      batch_buckets=tuple(int(b) for b in args.buckets.split(',')),
      max_wait_ms=args.max_wait_ms, quantize=args.quantize,
      max_pending=args.max_pending, exported=args.from_export,
      pad_frames_to=pad_frames_to, cache_entries=args.cache)
  service.start()
  if args.warmup_frames or args.tiny or args.tiny_clip:
    print(f'warming up buckets at clip shape {clip_shape} ...')
    service.warmup(clip_shape, np.uint8)

  # lvt models also serve the text tower (+ search when an index rides
  # along); the text encoder always uses the FLOAT weights — `state` here
  # is untouched by the service's int8 conversion of its own copy.
  text_encode_fn = index = text_service = None
  from videoprism_tpu.models.clip import VideoCLIPConfig
  if isinstance(model.config, VideoCLIPConfig):
    from videoprism_tpu import retrieval
    from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

    if tok_path is None:  # CLIP config under a name the early check missed
      try:
        tok_path = assets.resolve_tokenizer_path(
            args.tokenizer_model,
            allow_fixture=args.tiny or args.tiny_clip)
      except ValueError as e:
        raise SystemExit(str(e)) from None
    tokenizer = SentencePieceTokenizer(tok_path)
    # Coalesce concurrent text requests into shared dispatches (the
    # video path gets this from EmbeddingService's micro-batcher).
    text_service = serving.TextEncodeService(
        retrieval.make_text_query_encoder(
            model._unwrap(state), model.config, tokenizer,
            exported=args.from_export_text),
        max_wait_ms=args.max_wait_ms, max_pending=args.max_pending,
        cache_entries=args.cache)
    text_service.start()
    text_encode_fn = text_service.encode
    if args.index in ('new', 'new-ann'):
      index = (retrieval.ANNVideoIndex() if args.index == 'new-ann'
               else retrieval.VideoIndex())
      print(f'search index: empty mutable corpus ({args.index}); '
            'fill via POST /v1/index/add')
    elif args.index:
      index = retrieval.load_index(args.index)
      kind = ('hnsw' if getattr(index, 'native', False) else
              'exact' if type(index) is retrieval.VideoIndex else
              'ann-fallback-exact')
      print(f'search index: {len(index)} videos from {args.index} ({kind})')
    if index is not None and args.index_backend.startswith('device'):
      import jax.numpy as jnp
      from videoprism_tpu.device_index import DeviceAcceleratedIndex
      storage = (jnp.int8 if args.index_backend == 'device-int8'
                 else jnp.bfloat16)
      index = DeviceAcceleratedIndex(index, storage_dtype=storage)
      print(f'search backend: {args.index_backend} (HBM-sharded exact '
            'sweep; host tier keeps CRUD, snapshot refreshes on mutation)')
  elif args.index:
    raise SystemExit('--index needs an lvt (CLIP) model')
  elif args.from_export_text:
    raise SystemExit('--from-export-text needs an lvt (CLIP) model')
  if args.index_save_path and index is None:
    raise SystemExit('--index-save-path needs --index')
  if args.index_backend != 'host' and index is None:
    raise SystemExit(f'--index-backend {args.index_backend} needs --index')

  frames_service = None
  if args.enable_localize:
    if text_encode_fn is None:
      raise SystemExit('--enable-localize needs an lvt (CLIP) model '
                       '(localization scores text against per-frame '
                       'CLIP embeddings)')
    from videoprism_tpu import retrieval as retrieval_mod

    # Same float tree as the text tower: device placement of an
    # already-placed tree is a no-op, so this adds a forward, not a
    # second HBM copy of the weights.
    frames_model = retrieval_mod.make_frame_embeddings_model(model.config)
    frames_service = EmbeddingService(
        frames_model, state,
        batch_buckets=tuple(int(b) for b in args.buckets.split(',')),
        max_wait_ms=args.max_wait_ms, max_pending=args.max_pending)
    frames_service.start()
    if args.warmup_frames or args.tiny or args.tiny_clip:
      frames_service.warmup(clip_shape, np.uint8)

  labels = None
  if args.labels:
    labels = [ln.strip() for ln in open(args.labels)
              if ln.strip()]
  auth_token = args.auth_token or os.environ.get('VIDEOPRISM_AUTH_TOKEN')
  server = EmbeddingHTTPServer(service, args.host, args.port,
                               quiet=args.smoke,
                               text_encode_fn=text_encode_fn, index=index,
                               auth_token=auth_token,
                               text_service=text_service, labels=labels,
                               frames_service=frames_service,
                               index_save_path=args.index_save_path,
                               job_max_queued=args.job_max_queued,
                               job_ttl_s=args.job_ttl_s)
  if auth_token:
    print('auth: bearer token required on POST endpoints')

  # Additional models on the same process/port (/v1/models/<name>/...).
  extra_services = []
  extra_reloads = []
  for spec in args.extra_model or []:
    (name, svc2, text_fn2, text_svc2, shape2,
     reload2) = _build_extra_model(spec, args)
    server.add_model(name, svc2, text_encode_fn=text_fn2,
                     text_service=text_svc2)
    extra_services.append((svc2, text_svc2))
    extra_reloads.append((name, reload2))
    if args.warmup_frames or spec.split('=', 1)[1].startswith('tiny'):
      print(f'warming up model {name!r} at clip shape {shape2} ...')
      svc2.warmup(shape2, np.uint8)
    print(f'extra model {name!r}: /v1/models/{name}/embed'
          + (', .../embed_text' if text_fn2 is not None else ''))

  # Preemption/eviction sends SIGTERM: route it through the same graceful
  # path as ctrl-C so in-flight requests drain instead of dropping.
  def _sigterm(signum, frame):
    del signum, frame
    raise KeyboardInterrupt
  signal.signal(signal.SIGTERM, _sigterm)

  # SIGHUP = hot weight reload (the classic daemon convention): re-read
  # the checkpoint and swap it in with zero downtime. Runs in a thread so
  # a multi-GB load never stalls the accept loop.
  def _reload():
    try:
      if args.tiny or args.tiny_clip:
        print('reload: --tiny serves random init; nothing to re-read')
      else:
        src = args.checkpoint or args.model
        print(f'reload: re-reading weights from {src} ...', flush=True)
        if args.checkpoint:
          new_state = vp.load_pretrained_weights(
              None, checkpoint_path=args.checkpoint)
        else:
          new_state = vp.load_pretrained_weights(args.model)
        service.reload_state(new_state)
        if text_service is not None:
          # lvt models serve BOTH towers: the text encoder closure holds
          # its own copy of the weights, so it must be rebuilt too or
          # /v1/search would score across mismatched embedding spaces.
          text_service.reload(retrieval.make_text_query_encoder(
              model._unwrap(new_state), model.config, tokenizer,
              exported=args.from_export_text))
        print(f'reload: serving new weights '
              f'(reload #{service.stats()["reloads"]})', flush=True)
    except Exception as e:
      print(f'reload FAILED (still serving old weights): {e}', flush=True)
    # One SIGHUP reloads EVERY model on the pod; a failing extra leaves
    # the others (and itself, on old weights) serving.
    for extra_name, reload2 in extra_reloads:
      try:
        reload2()
      except Exception as e:
        print(f'reload[{extra_name}] FAILED (still serving old '
              f'weights): {e}', flush=True)

  signal.signal(signal.SIGHUP, lambda *_: threading.Thread(
      target=_reload, daemon=True).start())

  endpoints = 'POST /v1/embed, GET /healthz, GET /stats'
  if text_encode_fn is not None:
    endpoints += ', POST /v1/embed_text'
  if index is not None:
    endpoints += (', POST /v1/search, POST /v1/search_video, '
                  'POST /v1/index/add')
  if args.index_save_path:
    endpoints += ', POST /v1/index/save'
  if args.num_classes:
    endpoints += ', POST /v1/classify'
  if frames_service is not None:
    endpoints += ', POST /v1/localize'
  if extra_services:
    endpoints += ', GET /v1/models'
  print(f'serving on http://{args.host}:{server.port} ({endpoints})')
  if args.smoke:
    import io
    import json
    import urllib.request

    server.start()
    buf = io.BytesIO()
    np.save(buf, np.zeros(clip_shape, np.uint8))
    req = urllib.request.Request(
        f'http://127.0.0.1:{server.port}/v1/embed', buf.getvalue(),
        {'Content-Type': 'application/x-npy'})
    emb = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
    print(f'smoke embed -> {emb.shape} {emb.dtype}')
    if text_encode_fn is not None:
      req = urllib.request.Request(
          f'http://127.0.0.1:{server.port}/v1/embed_text',
          json.dumps({'texts': ['a person playing drums']}).encode(),
          {'Content-Type': 'application/json'})
      out = json.loads(urllib.request.urlopen(req).read())
      print(f'smoke embed_text -> {len(out["embeddings"][0])}-d')
    if index is not None:
      req = urllib.request.Request(
          f'http://127.0.0.1:{server.port}/v1/search',
          json.dumps({'texts': ['drums'], 'k': 3}).encode(),
          {'Content-Type': 'application/json'})
      out = json.loads(urllib.request.urlopen(req).read())
      print(f'smoke search -> {out["results"][0]}')
      # Online mutation: add one clip, find it, persist if configured.
      buf = io.BytesIO()
      np.save(buf, np.zeros(clip_shape, np.uint8))
      req = urllib.request.Request(
          f'http://127.0.0.1:{server.port}/v1/index/add?id=smoke',
          buf.getvalue(), {'Content-Type': 'application/x-npy'})
      out = json.loads(urllib.request.urlopen(req).read())
      print(f'smoke index add -> {out}')
      buf = io.BytesIO()
      np.save(buf, np.zeros(clip_shape, np.uint8))
      req = urllib.request.Request(
          f'http://127.0.0.1:{server.port}/v1/search_video?k=1',
          buf.getvalue(), {'Content-Type': 'application/x-npy'})
      out = json.loads(urllib.request.urlopen(req).read())
      print(f'smoke search_video -> {out["results"][0]}')
      if args.index_save_path:
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/v1/index/save', b'',
            {'Content-Type': 'application/json'})
        out = json.loads(urllib.request.urlopen(req).read())
        print(f'smoke index save -> {out}')
    for spec in args.extra_model or []:
      name = spec.partition('=')[0]
      buf = io.BytesIO()
      np.save(buf, np.zeros(TINY_CLIP_SHAPE, np.uint8))
      req = urllib.request.Request(
          f'http://127.0.0.1:{server.port}/v1/models/{name}/embed',
          buf.getvalue(), {'Content-Type': 'application/x-npy'})
      emb = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
      print(f'smoke embed via model {name!r} -> {emb.shape} {emb.dtype}')
    server.stop()
    service.stop()
    if text_service is not None:
      text_service.stop()
    if frames_service is not None:
      frames_service.stop()
    for svc2, text_svc2 in extra_services:
      svc2.stop()
      if text_svc2 is not None:
        text_svc2.stop()
    return
  try:
    server.serve_forever()
  except KeyboardInterrupt:
    pass
  finally:
    server.stop()
    # A mutable corpus autosaves on drain (SIGTERM/ctrl-C): in-memory
    # /v1/index/add work must not depend on a manual /v1/index/save
    # having happened before the pod went away.  Unconditional (even
    # when empty): a corpus intentionally emptied via /v1/index/remove
    # must not resurrect from a stale file on restart.
    if args.index_save_path and index is not None:
      try:
        from videoprism_tpu.retrieval import save_index_atomic

        save_index_atomic(index, args.index_save_path)
        print(f'index autosave: {len(index)} videos -> '
              f'{args.index_save_path}', flush=True)
      except Exception as e:
        print(f'index autosave FAILED: {e}', flush=True)
    service.stop()
    if text_service is not None:
      text_service.stop()
    if frames_service is not None:
      frames_service.stop()
    for svc2, text_svc2 in extra_services:
      svc2.stop()
      if text_svc2 is not None:
        text_svc2.stop()


if __name__ == '__main__':
  main()
