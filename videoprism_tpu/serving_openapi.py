"""Machine-readable API description: ``GET /openapi.json``.

A hand-maintained OpenAPI 3.0 document for the serving surface —
integrators point generators/Postman/validation proxies at it, and the
test suite cross-checks it against the handler's actual routes so the
spec cannot silently rot (tests/test_openapi.py).

Conditional surfaces (text tower, search index, classifier,
localization) are documented unconditionally with their 404 behavior
noted — one spec describes every deployment shape.
"""

from __future__ import annotations

_NPY = 'application/x-npy'
_JSON = 'application/json'
_VIDEO = 'video/mp4'

_ERROR = {'type': 'object', 'properties': {'error': {'type': 'string'}}}
_PREDICTIONS = {
    'type': 'object',
    'properties': {'predictions': {'type': 'array', 'items': {
        'type': 'object',
        'properties': {'class': {'type': 'integer'},
                       'prob': {'type': 'number'},
                       'label': {'type': 'string'}}}}},
}
_SEARCH_RESULTS = {
    'type': 'object',
    'properties': {'results': {'type': 'array', 'items': {
        'type': 'array', 'items': {
            'type': 'object',
            'properties': {'id': {'type': 'string'},
                           'score': {'type': 'number'}}}}}},
}


def _q(name, schema_type='integer', description=''):
  return {'name': name, 'in': 'query', 'required': False,
          'schema': {'type': schema_type}, 'description': description}


_DTYPE_PARAM = _q('dtype', 'string',
                  "response dtype: 'float16' halves embedding bytes")
_FILE_GEOM = [
    _q('frames', description='frames to sample (default: model-native)'),
    _q('size', description='center-crop size (default: model-native)'),
    _q('temporal_views', description='ViViT multi-view protocol: N'),
    _q('spatial_views', description='ViViT multi-view protocol: M'),
]
_WINDOW_PARAMS = [
    _q('window', description='frames per window (default: model-native)'),
    _q('stride', description='window stride, <= window (default: window)'),
    _q('frame_stride', description='temporal subsampling of the source'),
    _q('size', description='center-crop size (default: model-native)'),
]


def _op(summary, *, params=(), request=None, response=None,
        response_desc='OK', tags=('inference',)):
  op = {'summary': summary, 'tags': list(tags), 'responses': {
      '200': {'description': response_desc},
      '400': {'description': 'malformed request', 'content': {
          _JSON: {'schema': _ERROR}}},
  }}
  if params:
    op['parameters'] = list(params)
  if request:
    op['requestBody'] = {'required': True, 'content': request}
  if response:
    op['responses']['200']['content'] = response
  return op


_CLIP_BODY = {
    _NPY: {'schema': {'type': 'string', 'format': 'binary'}},
    _JSON: {'schema': {'type': 'object', 'properties': {
        'shape': {'type': 'array', 'items': {'type': 'integer'}},
        'dtype': {'type': 'string'},
        'data_b64': {'type': 'string'}}}},
}
_VIDEO_BODY = {_VIDEO: {'schema': {'type': 'string', 'format': 'binary'}}}
_NPY_RESPONSE = {_NPY: {'schema': {'type': 'string', 'format': 'binary'}}}


def openapi_spec() -> dict:
  """The OpenAPI 3.0.3 document for one serving process.

  Per-model routing: every ``/v1/<endpoint>`` also exists at
  ``/v1/models/{model}/<endpoint>`` (documented once via the templated
  path).  Endpoints that need an optional surface (text tower, index,
  classifier, frames service) reply 404 on servers without it.
  """
  paths = {
      '/': {'get': _op('Built-in demo console (HTML)', tags=('meta',),
                       response_desc='the console page')},
      '/healthz': {'get': _op(
          'Liveness: 200 serving, 503 after an error streak',
          tags=('meta',))},
      '/stats': {'get': _op('Service counters + latency stats (JSON)',
                            tags=('meta',))},
      '/metrics': {'get': _op(
          'Prometheus text exposition (counters, gauges, request-latency '
          'histograms)', tags=('meta',))},
      '/openapi.json': {'get': _op('This document', tags=('meta',))},
      '/v1/models': {'get': _op('List served models and their surfaces',
                                tags=('meta',))},
      '/v1/embed': {'post': _op(
          'Embed one clip [T,H,W,3] (micro-batched) or a batch '
          '[B,T,H,W,3] (direct path); response in the request format',
          params=[_DTYPE_PARAM], request=_CLIP_BODY,
          response=_NPY_RESPONSE)},
      '/v1/embed_file': {'post': _op(
          'Embed an uploaded video container (server-side decode — the '
          'cheap wire path; 10-50x less than raw frames)',
          params=_FILE_GEOM + [_DTYPE_PARAM], request=_VIDEO_BODY,
          response=_NPY_RESPONSE)},
      '/v1/embed_long': {'post': _op(
          'Embed a container of ANY length: incremental decode + '
          'windowed forwards at constant memory; l2-normalized mean of '
          'window embeddings (per_window=1: the raw [N, D] windows)',
          params=_WINDOW_PARAMS + [
              _q('per_window', 'boolean'), _DTYPE_PARAM],
          request=_VIDEO_BODY, response=_NPY_RESPONSE)},
      '/v1/embed_text': {'post': _op(
          'Text tower (lvt servers): {"texts": [...]} -> '
          '{"embeddings": [[...], ...]}',
          request={_JSON: {'schema': {'type': 'object', 'properties': {
              'texts': {'type': 'array',
                        'items': {'type': 'string'}}}}}})},
      '/v1/search': {'post': _op(
          'Text-to-video retrieval against the attached index: '
          '{"texts": [...], "k": 5, "filter": {...}} — "filter" '
          'restricts to rows whose index metadata contains every given '
          'key/value (attach metadata at /v1/index/add?meta=)',
          request={_JSON: {'schema': {'type': 'object', 'properties': {
              'texts': {'type': 'array', 'items': {'type': 'string'}},
              'k': {'type': 'integer'},
              'filter': {'type': 'object'}}}}},
          response={_JSON: {'schema': _SEARCH_RESULTS}})},
      '/v1/search_video': {'post': _op(
          'Video-to-video similarity: one clip (or video/* container) '
          'embeds and queries the index; ?filter= (URL-encoded JSON) '
          'restricts to metadata-matching rows',
          params=[_q('k'),
                  _q('filter', 'string',
                     'URL-encoded JSON metadata requirements')]
          + _FILE_GEOM,
          request={**_CLIP_BODY, **_VIDEO_BODY},
          response={_JSON: {'schema': _SEARCH_RESULTS}})},
      '/v1/index/add': {'post': _op(
          'Online corpus mutation: embed the body (clip or video/* '
          'container) and append it to the search index under ?id= '
          '(default: content hash); searchable immediately.  ?meta= '
          '(URL-encoded JSON object) attaches row metadata for '
          'filtered /v1/search',
          params=[_q('id', 'string'),
                  _q('meta', 'string',
                     'URL-encoded JSON metadata object')] + _FILE_GEOM,
          request={**_CLIP_BODY, **_VIDEO_BODY})},
      '/v1/index/remove': {'post': _op(
          'Remove clips from the search index by id: {"ids": [...]} -> '
          '{"removed": n, "size": m} (HNSW corpora tombstone the rows '
          'and compact on save)',
          request={_JSON: {'schema': {'type': 'object', 'properties': {
              'ids': {'type': 'array', 'items': {'type': 'string'}}}}}})},
      '/v1/index/save': {'post': _op(
          'Persist the (mutated) index atomically to the server-'
          'configured path (404 without --index-save-path)',
          tags=('admin',))},
      '/v1/classify': {'post': _op(
          'Classifier servers: one clip (or video/* container) -> '
          'softmax top-k predictions',
          params=[_q('k')] + _FILE_GEOM,
          request={**_CLIP_BODY, **_VIDEO_BODY},
          response={_JSON: {'schema': _PREDICTIONS}})},
      '/v1/classify_long': {'post': _op(
          'Classifier servers: a container of ANY length through the '
          'EXACT streaming pooler (logits equal one-shot pooling)',
          params=[_q('k')] + _WINDOW_PARAMS, request=_VIDEO_BODY,
          response={_JSON: {'schema': _PREDICTIONS}})},
      '/v1/zero_shot/classes': {'post': _op(
          'Register a zero-shot label set (lvt servers): class-name '
          'prompts run through the text tower once and cache under a '
          'content-hash id',
          request={_JSON: {'schema': {'type': 'object', 'properties': {
              'classes': {'type': 'array', 'items': {'type': 'string'}},
              'templates': {'type': 'array',
                            'items': {'type': 'string'}}}}}})},
      '/v1/zero_shot': {'post': _op(
          'Zero-shot classify a clip against a registered set '
          '(?set=<id> from /v1/zero_shot/classes) in one round trip',
          params=[_q('set', 'string'), _q('k')] + _FILE_GEOM,
          request={**_CLIP_BODY, **_VIDEO_BODY},
          response={_JSON: {'schema': _PREDICTIONS}})},
      '/v1/localize': {'post': _op(
          'Text-to-time moment localization (lvt servers with a frames '
          'service): sliding windows of per-frame CLIP embeddings '
          'scored against each query',
          params=[_q('q', 'string',
                     'localization query (repeatable; video/* bodies)'),
                  _q('k'), _q('window_sizes', 'string')] + _FILE_GEOM,
          request={**_CLIP_BODY, **_VIDEO_BODY})},
      '/v1/localize_long': {'post': _op(
          'Moment localization over a container of ANY length (lvt '
          'servers with model code): windowed per-frame embeddings at '
          'constant memory, overlap-averaged when stride < window',
          params=[_q('q', 'string', 'localization query (repeatable)'),
                  _q('k'), _q('window_sizes', 'string'),
                  _q('iou_threshold', 'number')] + _WINDOW_PARAMS,
          request=_VIDEO_BODY)},
      '/v1/jobs': {'get': _op(
          'List retained jobs (newest first) + run/fail counters '
          '(bearer-gated)', tags=('meta',)), 'post': _op(
          'Submit an async long-video sweep: ?kind=classify_long|'
          'embed_long|localize_long plus that endpoint\'s query params '
          'and video/* body; replies {"job": id} immediately and the '
          'sweep runs on the server\'s job worker (bounded queue -> '
          '503 + Retry-After)',
          params=[_q('kind', 'string',
                     'classify_long | embed_long | localize_long'),
                  _q('q', 'string', 'localize_long queries (repeatable)'),
                  _q('k'), _q('per_window', 'boolean'),
                  _DTYPE_PARAM] + _WINDOW_PARAMS,
          request=_VIDEO_BODY)},
      '/v1/jobs/{id}': {'get': _op(
          'Job status: queued | running | cancelling | done | error | '
          'cancelled, +timing and live progress '
          '{"done": windows, "total": windows-or-null} '
          '(bearer-gated like the POST surface)',
          tags=('meta',))},
      '/v1/jobs/{id}/result': {'get': _op(
          'The finished sweep\'s bytes — exactly what the synchronous '
          'endpoint would have replied (npy for embed_long, JSON '
          'otherwise); 409 while queued/running, 410 for error/'
          'cancelled')},
      '/v1/jobs/{id}/cancel': {'post': _op(
          'Cancel a job: queued cancels immediately; a RUNNING sweep '
          'is interrupted cooperatively at its next window boundary '
          '(reply "cancelling", poll status for the terminal '
          '"cancelled"; partial result discarded).  409 only for '
          'finished jobs', tags=('admin',))},
      '/debug/trace': {'post': _op(
          'Capture a jax.profiler trace of the live process for ?ms= '
          'milliseconds (auth-gated; 409 when one is already running)',
          params=[_q('ms')], tags=('admin',))},
      '/v1/models/{model}/{endpoint}': {'post': _op(
          'Every /v1/<endpoint> above, addressed at one model of a '
          'multi-model server (unknown model -> 404 with a listing)',
          tags=('meta',))},
  }
  return {
      'openapi': '3.0.3',
      'info': {
          'title': 'VideoPrism TPU serving API',
          'version': '1.0.0',
          'description':
              'Micro-batching video-embedding / classification / '
              'retrieval server.  POST endpoints accept optional '
              '"Authorization: Bearer <token>" (required when the '
              'server was started with one) and an "X-Deadline-Ms" '
              'queueing deadline (504 on lapse).  Request bodies may '
              'be gzipped (Content-Encoding: gzip).  503 + Retry-After '
              'signals load shedding.',
      },
      'paths': paths,
  }
