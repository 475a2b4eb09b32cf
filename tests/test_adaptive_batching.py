"""Adaptive micro-batch wait (serving._CoalesceGovernor): a lone
low-QPS client stops paying the coalescing timer; concurrency restores
it.  Structural assertions (governor state) rather than wall-clock ones
where possible — the CI host is one slow core."""

import threading
import time

import jax
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import serving
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)
CLIP_SHAPE = (2, 12, 12, 3)


class TestGovernor:

  def test_decays_to_zero_wait_on_singleton_streak(self):
    g = serving._CoalesceGovernor(0.005, adaptive=True)
    assert g.wait_s() == 0.005  # conservative cold start
    for _ in range(40):
      g.observe(False)
    assert g.wait_s() == 0.0

  def test_one_coalesced_dispatch_restores_the_timer(self):
    g = serving._CoalesceGovernor(0.005, adaptive=True)
    for _ in range(40):
      g.observe(False)
    assert g.wait_s() == 0.0
    g.observe(True)
    assert g.wait_s() == 0.005

  def test_adaptive_false_always_waits(self):
    g = serving._CoalesceGovernor(0.005, adaptive=False)
    for _ in range(100):
      g.observe(False)
    assert g.wait_s() == 0.005
    assert g.rate == 1.0  # frozen: observe() is a no-op


@pytest.fixture(scope='module')
def service():
  cfg = fe.FactorizedEncoderConfig(**TINY)
  model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
  state = model.init(jax.random.PRNGKey(0))
  svc = serving.EmbeddingService(model, state, batch_buckets=(1, 4),
                                 max_wait_ms=200.0)
  svc.start()
  svc.warmup(CLIP_SHAPE)
  yield svc
  svc.stop()


class TestServiceAdaptation:

  def test_singleton_streak_drops_the_wait_then_burst_restores_it(
      self, service):
    clip = np.zeros(CLIP_SHAPE, np.float32)
    # Sequential singletons: each dispatch sees batch==1 and an empty
    # queue, so the governor decays...
    for _ in range(35):
      service.embed(clip)
    assert service._governor.wait_s() == 0.0
    assert service.stats()['coalesce_rate'] < 0.05

    # ...and a low-load request now dispatches immediately: with the
    # 200 ms timer still armed this request could not finish this fast.
    t0 = time.monotonic()
    service.embed(clip)
    assert time.monotonic() - t0 < 0.15

    # Concurrent bursts re-arm the timer: requests queued during the
    # previous batch's execution coalesce (observe(True)) even with the
    # timer at zero, and the rate recovers.
    for _ in range(4):
      threads = [threading.Thread(target=service.embed, args=(clip,))
                 for _ in range(4)]
      for t in threads:
        t.start()
      for t in threads:
        t.join()
    assert service._governor.rate > serving._CoalesceGovernor.THRESHOLD

  def test_text_service_adapts_too(self):
    calls = []

    def encode(texts):
      calls.append(len(texts))
      return np.zeros((len(texts), 4), np.float32)

    svc = serving.TextEncodeService(encode, max_wait_ms=200.0)
    svc.start()
    try:
      for _ in range(35):
        svc.encode(['one text'])
      assert svc._governor.wait_s() == 0.0
      assert svc.stats()['text_coalesce_rate'] < 0.05
      t0 = time.monotonic()
      svc.encode(['another'])
      assert time.monotonic() - t0 < 0.15
    finally:
      svc.stop()

  def test_adaptive_wait_false_keeps_fixed_behavior(self):
    cfg = fe.FactorizedEncoderConfig(**TINY)
    model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
    svc = serving.EmbeddingService(
        model, model.init(jax.random.PRNGKey(0)), batch_buckets=(1,),
        max_wait_ms=1.0, adaptive_wait=False)
    svc.start()
    try:
      clip = np.zeros(CLIP_SHAPE, np.float32)
      for _ in range(40):
        svc.embed(clip)
      assert svc._governor.wait_s() == 0.001
    finally:
      svc.stop()
