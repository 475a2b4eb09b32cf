"""OpenAPI document (GET /openapi.json): served, well-formed, and
cross-checked against the handler's ACTUAL routes so the spec cannot
silently rot when endpoints are added or renamed."""

import json
import pathlib
import re
import urllib.request

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import serving, serving_http
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.serving_openapi import openapi_spec

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)


def _handler_routes() -> set[str]:
  """Route literals the handler dispatches on, scraped from its source:
  exact matches (``self.path == '/x'`` / ``in ('/a', '/b')``) and
  prefixes (``startswith('/x')``)."""
  src = pathlib.Path(serving_http.__file__).read_text()
  routes = set(re.findall(r"startswith\('(/[a-z0-9_/]+)'\)", src))
  routes |= set(re.findall(r"self\.path == '(/[a-z0-9_./]+)'", src))
  for group in re.findall(r"self\.path in \(([^)]+)\)", src):
    routes |= set(re.findall(r"'(/[a-z0-9_./]+)'", group))
  # Dispatch internals, not endpoints: the model-scoped prefix rewrites
  # to /v1/<endpoint>; /v1/zero_shot/ is the same endpoint family.
  return routes - {'/v1/models/'}


class TestSpecMatchesHandler:

  def test_every_handler_route_is_documented(self):
    spec_paths = set(openapi_spec()['paths'])
    for route in _handler_routes():
      documented = any(
          p == route or p.startswith(route) or route.startswith(p)
          for p in spec_paths)
      assert documented, f'handler route {route} missing from openapi'

  def test_every_documented_path_exists_in_handler_source(self):
    src = pathlib.Path(serving_http.__file__).read_text()
    for p in openapi_spec()['paths']:
      if p in ('/', '/openapi.json'):
        continue  # the console root and this document's own literal
      literal = p.split('{')[0].rstrip('/')
      assert literal and literal in src, f'spec path {p} not in handler'
    assert "'/'" in src  # the console root route
    assert "'/openapi.json'" in src

  def test_document_shape(self):
    spec = openapi_spec()
    assert spec['openapi'].startswith('3.0')
    assert spec['info']['title']
    for path, ops in spec['paths'].items():
      assert path.startswith('/'), path
      for method, op in ops.items():
        assert method in ('get', 'post'), (path, method)
        assert op['summary'], path
        assert '200' in op['responses'], path
    json.dumps(spec)  # must be pure-JSON serializable


class TestServedDocument:

  def test_get_openapi_json(self):
    cfg = fe.FactorizedEncoderConfig(**TINY)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    service = serving.EmbeddingService(
        model, model.init(jax.random.PRNGKey(0)), batch_buckets=(1,))
    service.start()
    httpd = serving_http.EmbeddingHTTPServer(service, host='127.0.0.1',
                                             port=0)
    httpd.start()
    try:
      url = f'http://127.0.0.1:{httpd.port}/openapi.json'
      with urllib.request.urlopen(url, timeout=30) as r:
        assert r.headers['Content-Type'].startswith('application/json')
        doc = json.loads(r.read())
      assert doc == openapi_spec()
    finally:
      httpd.stop()
      service.stop()
