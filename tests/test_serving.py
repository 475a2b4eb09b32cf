"""Serving tier tests: shard_map data parallelism + micro-batching service."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import videoprism_tpu as vp
from videoprism_tpu import serving
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.parallel import mesh as mesh_lib

TINY = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)


@pytest.fixture(scope='module')
def model_and_state():
  cfg = fe.FactorizedEncoderConfig(**TINY)
  model = vp.Model(cfg, fe.apply, init_lib.init_factorized_encoder)
  state = model.init(jax.random.PRNGKey(0))
  return model, state


class TestDataParallelForward:

  def test_matches_single_device(self, model_and_state):
    model, state = model_and_state
    mesh = mesh_lib.make_mesh(model_parallelism=1)  # 8-way dp
    fwd = serving.data_parallel_forward(
        lambda p, v: model.apply(p, v, train=False)[0], mesh)
    video = jax.random.uniform(jax.random.PRNGKey(1), (8, 2, 12, 12, 3))
    ref, _ = model.apply(state, video, train=False)
    got = fwd(state, video)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # Output is actually sharded over the mesh.
    assert len(got.sharding.device_set) == 8


class TestEmbeddingService:

  def test_embed_batch_pads_to_bucket(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(2, 4))
    videos = np.random.default_rng(0).random((3, 2, 12, 12, 3),
                                             np.float32)
    out = service.embed_batch(videos)
    assert out.shape == (3, 8, 16)
    ref, _ = model.apply(state, jnp.asarray(videos), train=False)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-6)

  @pytest.mark.slow
  def test_concurrent_requests_microbatch(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(
        model, state, batch_buckets=(1, 4), max_wait_ms=50)
    service.warmup((2, 12, 12, 3))
    service.start()
    try:
      rng = np.random.default_rng(1)
      clips = [rng.random((2, 12, 12, 3), np.float32) for _ in range(6)]
      results = [None] * 6

      def worker(i):
        results[i] = service.embed(clips[i])

      threads = [threading.Thread(target=worker, args=(i,))
                 for i in range(6)]
      for t in threads:
        t.start()
      for t in threads:
        t.join(timeout=120)

      for i, clip in enumerate(clips):
        assert results[i] is not None
        ref, _ = model.apply(state, jnp.asarray(clip[None]),
                             train=False)
        np.testing.assert_allclose(
            results[i], np.asarray(ref[0]), atol=1e-5)
    finally:
      service.stop()


class TestLatencyHistogram:
  """Per-request latency histogram (`serving._LatencyHistogram`):
  bucket placement, quantile estimates, snapshot wire shape."""

  def test_observe_buckets_and_sum(self):
    h = serving._LatencyHistogram()
    h.observe(0.003)   # (0.002, 0.005]
    h.observe(0.003)
    h.observe(0.07)    # (0.05, 0.1]
    h.observe(42.0)    # +Inf overflow bucket
    assert h.count == 4
    assert h.sum == pytest.approx(0.003 + 0.003 + 0.07 + 42.0)
    snap = h.snapshot()
    assert snap['counts'][snap['bounds_s'].index(0.005)] == 2
    assert snap['counts'][snap['bounds_s'].index(0.1)] == 1
    assert snap['counts'][-1] == 1          # +Inf
    assert len(snap['counts']) == len(snap['bounds_s']) + 1
    assert sum(snap['counts']) == snap['count'] == 4

  def test_boundary_value_lands_in_le_bucket(self):
    """Prometheus histogram buckets are `le` (inclusive upper bound):
    an observation exactly on a bound must count in that bucket."""
    h = serving._LatencyHistogram()
    h.observe(0.01)
    assert h.counts[h.BOUNDS.index(0.01)] == 1

  def test_quantile_estimates(self):
    h = serving._LatencyHistogram()
    assert h.quantile(0.5) is None          # empty
    for _ in range(99):
      h.observe(0.003)
    h.observe(3.0)
    assert h.quantile(0.5) == 0.005         # bucket upper bound
    assert h.quantile(0.999) == 5.0
    h2 = serving._LatencyHistogram()
    h2.observe(99.0)
    assert h2.quantile(0.5) == float('inf')  # overflow bucket

  def test_service_records_request_latency(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0)
    service.start()
    try:
      clip = np.random.default_rng(3).random((2, 12, 12, 3), np.float32)
      service.embed(clip)
      service.embed(clip)
      hist = service.stats()['request_latency']
      assert hist['count'] == 2
      assert hist['sum_s'] > 0.0
      assert sum(hist['counts']) == 2
    finally:
      service.stop()


class TestEmbeddingServiceOversized:

  def test_embed_batch_larger_than_max_bucket(self, model_and_state):
    """Regression: batches above the largest bucket are chunked, not
    crashed with a negative-padding error."""
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(2, 4))
    videos = np.random.default_rng(2).random((9, 2, 12, 12, 3), np.float32)
    out = service.embed_batch(videos)
    assert out.shape == (9, 8, 16)
    ref, _ = model.apply(state, jnp.asarray(videos), train=False)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


class TestServiceValidation:

  def test_mesh_rejects_indivisible_buckets(self, model_and_state):
    """Regression: bucket 1 or 4 on an 8-way data axis used to fail deep
    inside shard_map dispatch; now it is a constructor error."""
    model, state = model_and_state
    mesh = mesh_lib.make_mesh(model_parallelism=1)  # 8-way dp
    with pytest.raises(ValueError, match='not divisible'):
      serving.EmbeddingService(model, state, batch_buckets=(1, 4, 8),
                               mesh=mesh)

  def test_mesh_with_divisible_buckets_serves(self, model_and_state):
    model, state = model_and_state
    mesh = mesh_lib.make_mesh(model_parallelism=1)
    service = serving.EmbeddingService(model, state, batch_buckets=(8,),
                                       mesh=mesh)
    videos = np.random.default_rng(5).random((3, 2, 12, 12, 3), np.float32)
    out = service.embed_batch(videos)
    ref, _ = model.apply(state, jnp.asarray(videos), train=False)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

  def test_bad_buckets_rejected(self, model_and_state):
    model, state = model_and_state
    with pytest.raises(ValueError, match='positive'):
      serving.EmbeddingService(model, state, batch_buckets=())
    with pytest.raises(ValueError, match='positive'):
      serving.EmbeddingService(model, state, batch_buckets=(0, 4))

  def test_max_pending_backpressure(self, model_and_state):
    """A full queue sheds load with ServiceOverloaded instead of growing
    an unbounded backlog (service NOT started, so nothing drains)."""
    model, state = model_and_state
    service = serving.EmbeddingService(
        model, state, batch_buckets=(2,), max_pending=1)
    clip = np.zeros((2, 12, 12, 3), np.float32)

    def first_caller():  # occupies the single queue slot until released
      try:
        service.embed(clip, timeout=10.0)
      except Exception:
        pass  # manual release hands back result=None; ignore

    blocked = threading.Thread(target=first_caller, daemon=True)
    blocked.start()
    deadline = threading.Event()
    for _ in range(100):  # wait for the first request to occupy the slot
      if service._queue.full():
        break
      deadline.wait(0.05)
    assert service._queue.full()
    with pytest.raises(serving.ServiceOverloaded, match='pending'):
      service.embed(clip)
    service._queue.get_nowait()[2].event.set()  # unblock the first caller
    blocked.join(timeout=10)
    with pytest.raises(ValueError, match='max_pending'):
      serving.EmbeddingService(model, state, batch_buckets=(2,),
                               max_pending=0)

  def test_embed_rejects_batched_input(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(2,))
    with pytest.raises(ValueError, match='single clip'):
      service.embed(np.zeros((2, 2, 12, 12, 3), np.float32))

  def test_mixed_dtype_requests_grouped(self, model_and_state):
    """Regression: a uint8 clip queued with a float32 clip of the same
    shape must not be np.stack-promoted past the /255 normalization."""
    model, state = model_and_state
    service = serving.EmbeddingService(
        model, state, batch_buckets=(1, 2), max_wait_ms=100)
    service.start()
    try:
      rng = np.random.default_rng(9)
      clip_u8 = rng.integers(0, 256, (2, 12, 12, 3), np.uint8)
      clip_f32 = rng.random((2, 12, 12, 3)).astype(np.float32)
      results = {}

      def worker(name, clip):
        results[name] = service.embed(clip)

      threads = [threading.Thread(target=worker, args=('u8', clip_u8)),
                 threading.Thread(target=worker, args=('f32', clip_f32))]
      for t in threads:
        t.start()
      for t in threads:
        t.join(timeout=120)

      ref_u8, _ = model.apply(
          state, jnp.asarray(clip_u8[None].astype(np.float32) / 255.0),
          train=False)
      ref_f32, _ = model.apply(state, jnp.asarray(clip_f32[None]),
                               train=False)
      np.testing.assert_allclose(results['u8'], np.asarray(ref_u8[0]),
                                 atol=1e-5)
      np.testing.assert_allclose(results['f32'], np.asarray(ref_f32[0]),
                                 atol=1e-5)
    finally:
      service.stop()

  def test_int8_quantized_serving(self, model_and_state):
    """quantize='int8' serves close-to-fp32 embeddings (this tiny model
    falls back to dequantize+composed on CPU — the plumbing and quality
    contract are what's under test)."""
    model, state = model_and_state
    service = serving.EmbeddingService(
        model, state, batch_buckets=(2,), quantize='int8')
    ref_service = serving.EmbeddingService(model, state, batch_buckets=(2,))
    clip = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(7), (2, 12, 12, 3)))
    service.start(); ref_service.start()
    try:
      got = np.asarray(service.embed(clip), np.float32).ravel()
      ref = np.asarray(ref_service.embed(clip), np.float32).ravel()
    finally:
      service.stop(); ref_service.stop()
    cos = float(np.dot(got, ref)
                / (np.linalg.norm(got) * np.linalg.norm(ref)))
    assert cos > 0.995

  def test_stats(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(2,))
    assert service.stats()['requests_served'] == 0
    clip = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(11), (2, 12, 12, 3)))
    service.start()
    try:
      service.embed(clip)
      service.embed(clip)
    finally:
      service.stop()
    s = service.stats()
    assert s['requests_served'] == 2
    assert s['batches_run'] >= 1
    assert s['errors'] == 0
    assert s['batch_latency_p50_s'] > 0
    assert s['batch_latency_p99_s'] >= s['batch_latency_p50_s']

  def test_unknown_quantize_rejected(self, model_and_state):
    model, state = model_and_state
    with pytest.raises(ValueError, match='unknown quantize'):
      serving.EmbeddingService(model, state, quantize='int4')

  def test_uint8_ingestion(self, model_and_state):
    """uint8 clips are normalized on-device and match the fp32 path."""
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(4,))
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (3, 2, 12, 12, 3), np.uint8)
    out_u8 = service.embed_batch(u8)
    out_f32 = service.embed_batch(u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(out_u8, out_f32, atol=1e-5)

  def test_mixed_shape_requests_grouped(self, model_and_state):
    """Two concurrent requests with different frame counts must both
    succeed (grouped into separate sub-batches), not crash np.stack."""
    model, state = model_and_state
    service = serving.EmbeddingService(
        model, state, batch_buckets=(1, 2), max_wait_ms=100)
    service.start()
    try:
      rng = np.random.default_rng(6)
      clip_a = rng.random((2, 12, 12, 3), np.float32)
      clip_b = rng.random((4, 12, 12, 3), np.float32)
      results = {}

      def worker(name, clip):
        results[name] = service.embed(clip)

      threads = [threading.Thread(target=worker, args=('a', clip_a)),
                 threading.Thread(target=worker, args=('b', clip_b))]
      for t in threads:
        t.start()
      for t in threads:
        t.join(timeout=120)

      for name, clip in (('a', clip_a), ('b', clip_b)):
        ref, _ = model.apply(state, jnp.asarray(clip[None]), train=False)
        np.testing.assert_allclose(results[name], np.asarray(ref[0]),
                                   atol=1e-5)
    finally:
      service.stop()


class TestPriorityClasses:

  def test_interactive_preempts_batch_class(self, model_and_state):
    """Queued interactive requests dequeue before EARLIER-queued
    batch-class ones; FIFO within each class."""
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0)
    gate = threading.Event()
    order = []
    real_forward = service._forward

    def gated_forward(params, videos):
      order.append(float(np.asarray(videos)[0, 0, 0, 0, 0]))
      gate.wait(30)  # hold the worker so the queue builds up
      return real_forward(params, videos)

    service._forward = gated_forward
    service.start()
    try:
      def submit(tag, priority):
        clip = np.full((2, 12, 12, 3), tag, np.float32)
        return threading.Thread(
            target=lambda: service.embed(clip, timeout=120,
                                         priority=priority))

      threads = [submit(0.01, 'interactive')]  # occupies the worker
      threads[0].start()
      deadline = time.monotonic() + 10
      while not order and time.monotonic() < deadline:
        time.sleep(0.005)
      assert order, 'worker never picked up the first request'
      # Queue builds while the worker is held: batch-class first, then
      # interactive — dequeue order must still be interactive-first.
      for tag, prio in ((0.11, 'batch'), (0.12, 'batch'),
                        (0.21, 'interactive'), (0.22, 'interactive')):
        t = submit(tag, prio)
        t.start()
        threads.append(t)
        deadline = time.monotonic() + 10
        while service._queue.qsize() < len(threads) - 1 \
              and time.monotonic() < deadline:
          time.sleep(0.005)
      gate.set()
      for t in threads:
        t.join(timeout=120)
      assert [round(x, 2) for x in order] == [0.01, 0.21, 0.22,
                                              0.11, 0.12], order
      stats = service.stats()
      assert stats['requests_served'] == 5
      assert stats['batch_priority_served'] == 2
    finally:
      gate.set()
      service.stop()

  def test_batch_ages_into_interactive_rank(self, model_and_state):
    """VERDICT r4 #5: starvation is bounded — a batch-class request that
    has waited batch_age_s outranks interactive requests that arrive
    after that point, so sustained interactive load delays batch work
    by at most the bound instead of forever."""
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0, batch_age_s=0.2)
    gate = threading.Event()
    order = []
    real_forward = service._forward

    def gated_forward(params, videos):
      order.append(float(np.asarray(videos)[0, 0, 0, 0, 0]))
      gate.wait(30)
      return real_forward(params, videos)

    service._forward = gated_forward
    service.start()
    try:
      def submit(tag, priority):
        clip = np.full((2, 12, 12, 3), tag, np.float32)
        t = threading.Thread(
            target=lambda: service.embed(clip, timeout=120,
                                         priority=priority))
        t.start()
        return t

      threads = [submit(0.01, 'interactive')]  # occupies the worker
      deadline = time.monotonic() + 10
      while not order and time.monotonic() < deadline:
        time.sleep(0.005)
      assert order, 'worker never picked up the first request'
      threads.append(submit(0.5, 'batch'))       # the aging candidate
      deadline = time.monotonic() + 10
      while service._queue.qsize() < 1 and time.monotonic() < deadline:
        time.sleep(0.005)
      time.sleep(0.25)                           # > batch_age_s
      # "Saturating" interactive arrivals AFTER the batch aged out.
      for tag in (0.2, 0.3):
        threads.append(submit(tag, 'interactive'))
        deadline = time.monotonic() + 10
        while service._queue.qsize() < len(threads) - 1 \
              and time.monotonic() < deadline:
          time.sleep(0.005)
      gate.set()
      for t in threads:
        t.join(timeout=120)
      # The aged batch request ran BEFORE the younger interactives.
      assert [round(x, 2) for x in order] == [0.01, 0.5, 0.2, 0.3], order
    finally:
      gate.set()
      service.stop()

  def test_abandoned_waiter_dropped_by_worker(self, model_and_state):
    """ADVICE r4: a request whose embed() timeout fired while queued is
    dropped at dequeue time (like an expired deadline) — it must not
    consume a batch slot with no one waiting."""
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       max_wait_ms=1.0)
    gate = threading.Event()
    forwarded = []
    real_forward = service._forward

    def gated_forward(params, videos):
      forwarded.append(float(np.asarray(videos)[0, 0, 0, 0, 0]))
      gate.wait(30)
      return real_forward(params, videos)

    service._forward = gated_forward
    service.start()
    try:
      t0 = threading.Thread(
          target=lambda: service.embed(
              np.full((2, 12, 12, 3), 0.01, np.float32), timeout=120))
      t0.start()
      deadline = time.monotonic() + 10
      while not forwarded and time.monotonic() < deadline:
        time.sleep(0.005)
      # This one times out while queued behind the held worker...
      with pytest.raises(TimeoutError, match='timed out'):
        service.embed(np.full((2, 12, 12, 3), 0.5, np.float32),
                      timeout=0.05)
      before = service.stats()['requests_expired']
      gate.set()
      t0.join(timeout=120)
      deadline = time.monotonic() + 10
      while service.stats()['requests_expired'] == before \
            and time.monotonic() < deadline:
        time.sleep(0.01)
      # ...and the worker dropped it without running a forward for it.
      assert service.stats()['requests_expired'] == before + 1
      assert 0.5 not in [round(x, 2) for x in forwarded]
    finally:
      gate.set()
      service.stop()

  def test_unknown_priority_rejected(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    try:
      with pytest.raises(ValueError, match='priority'):
        service.embed(np.zeros((2, 12, 12, 3), np.float32),
                      priority='background')
    finally:
      service.stop()


class TestTensorParallelService:

  def test_tp_service_matches_single_device(self, model_and_state):
    """EmbeddingService(tensor_parallel=True): params head/hidden-sharded
    over the model axis, batch over data — output equals single-device."""
    model, state = model_and_state
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    service = serving.EmbeddingService(
        model, state, batch_buckets=(4,), mesh=mesh, tensor_parallel=True)
    videos = np.random.default_rng(8).random((4, 2, 12, 12, 3), np.float32)
    out = service.embed_batch(videos)
    ref, _ = model.apply(state, jnp.asarray(videos), train=False)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

  def test_dp_mesh_int8_service(self, model_and_state):
    """quantize='int8' under data-parallel shard_map serving: replicated
    quantized params, per-shard dispatch (dequant fallback on CPU)."""
    model, state = model_and_state
    mesh = mesh_lib.make_mesh(model_parallelism=1)  # 8-way dp
    service = serving.EmbeddingService(
        model, state, batch_buckets=(8,), mesh=mesh, quantize='int8')
    videos = np.random.default_rng(10).random((8, 2, 12, 12, 3),
                                              np.float32)
    out = np.asarray(service.embed_batch(videos), np.float32)
    ref = np.asarray(
        model.apply(state, jnp.asarray(videos), train=False)[0],
        np.float32)
    g, r = out.ravel(), ref.ravel()
    cos = float(np.dot(g, r) / (np.linalg.norm(g) * np.linalg.norm(r)))
    assert cos > 0.995, cos

  def test_tp_int8_service(self, model_and_state):
    """quantize='int8' composes with tensor_parallel at the service level
    (scales shard with their weights; the quantized tree is never
    materialized as a full single-device replica)."""
    model, state = model_and_state
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    service = serving.EmbeddingService(
        model, state, batch_buckets=(4,), mesh=mesh, tensor_parallel=True,
        quantize='int8')
    videos = np.random.default_rng(9).random((4, 2, 12, 12, 3), np.float32)
    out = np.asarray(service.embed_batch(videos), np.float32)
    ref = np.asarray(
        model.apply(state, jnp.asarray(videos), train=False)[0], np.float32)
    g, r = out.ravel(), ref.ravel()
    cos = float(np.dot(g, r) / (np.linalg.norm(g) * np.linalg.norm(r)))
    assert cos > 0.995, cos

  def test_tp_requires_mesh(self, model_and_state):
    model, state = model_and_state
    with pytest.raises(ValueError, match='requires a mesh'):
      serving.EmbeddingService(model, state, tensor_parallel=True)

  def test_model_code_params_gating(self, model_and_state):
    """model_code_params(): the plain tree on single-program services,
    None under tensor_parallel (state is model-axis-sharded) and on
    AOT-exported services (fresh model-code jits would defeat the
    cold-start artifact) — the long-video endpoints key off this."""
    model, state = model_and_state
    plain = serving.EmbeddingService(model, state, batch_buckets=(1,))
    try:
      got = plain.model_code_params()
      assert got is not None
      ref_leaves = jax.tree_util.tree_leaves(model._unwrap(state))
      got_leaves = jax.tree_util.tree_leaves(got)
      assert len(got_leaves) == len(ref_leaves)
      # The exported flag alone must flip the gate (the artifact itself
      # is irrelevant to the decision).
      plain._exported = True
      assert plain.model_code_params() is None
    finally:
      plain._exported = False
      plain.stop()
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    tp = serving.EmbeddingService(
        model, state, batch_buckets=(4,), mesh=mesh, tensor_parallel=True)
    try:
      assert tp.model_code_params() is None
    finally:
      tp.stop()

  def test_tp_clip_vision_service(self):
    """tensor_parallel serving of an lvt tower: the vision side (encoder
    + aux ViT + contrastive pooler + l2-norm) runs Megatron-sharded and
    matches the single-device CLIP video embeddings."""
    import videoprism_tpu as vp
    from videoprism_tpu.models import clip as vclip
    from videoprism_tpu.models import init as init_lib

    cfg = vclip.VideoCLIPConfig(
        patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
        num_spatial_layers=2, num_temporal_layers=1,
        num_auxiliary_layers=1, num_heads=2, mlp_dim=32,
        vocabulary_size=64, num_unimodal_layers=1, atten_logit_cap=50.0)
    state = init_lib.init_video_clip(jax.random.PRNGKey(3), cfg)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    service = serving.EmbeddingService(
        model, state, batch_buckets=(4,), mesh=mesh, tensor_parallel=True)
    videos = np.random.default_rng(11).random((4, 2, 12, 12, 3),
                                              np.float32)
    out = service.embed_batch(videos)
    ref, _, _ = vclip.apply(state, jnp.asarray(videos), None, None, cfg,
                            train=False)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)

  def test_tp_int8_clip_vision_service(self):
    """int8 + tensor_parallel on an lvt vision tower — the giant-tower
    production serving combination (host-side quantization, scales
    Megatron-sharded alongside their weights)."""
    import videoprism_tpu as vp
    from videoprism_tpu.models import clip as vclip
    from videoprism_tpu.models import init as init_lib

    cfg = vclip.VideoCLIPConfig(
        patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
        num_spatial_layers=2, num_temporal_layers=1,
        num_auxiliary_layers=1, num_heads=2, mlp_dim=32,
        vocabulary_size=64, num_unimodal_layers=1, atten_logit_cap=50.0)
    state = init_lib.init_video_clip(jax.random.PRNGKey(5), cfg)
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    service = serving.EmbeddingService(
        model, state, batch_buckets=(4,), mesh=mesh, tensor_parallel=True,
        quantize='int8')
    videos = np.random.default_rng(13).random((4, 2, 12, 12, 3),
                                              np.float32)
    out = np.asarray(service.embed_batch(videos), np.float32)
    ref, _, _ = vclip.apply(state, jnp.asarray(videos), None, None, cfg,
                            train=False)
    g, r = out.ravel(), np.asarray(ref, np.float32).ravel()
    cos = float(np.dot(g, r) / (np.linalg.norm(g) * np.linalg.norm(r)))
    assert cos > 0.995, cos

  def test_tp_classifier_service(self):
    """tensor_parallel serving of a classifier (encoder + TP-aware
    pooler + head) matches single-device logits."""
    import videoprism_tpu as vp
    from videoprism_tpu.models import classifier as vc
    from videoprism_tpu.models import factorized_encoder as fe
    from videoprism_tpu.models import init as init_lib

    cfg = vc.VideoClassifierConfig(
        encoder=fe.FactorizedEncoderConfig(**TINY), num_classes=10)
    state = init_lib.init_video_classifier(jax.random.PRNGKey(4), cfg)
    model = vp.Model(cfg, vc.apply, init_lib.init_video_classifier)
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    service = serving.EmbeddingService(
        model, state, batch_buckets=(4,), mesh=mesh, tensor_parallel=True)
    videos = np.random.default_rng(12).random((4, 2, 12, 12, 3),
                                              np.float32)
    out = service.embed_batch(videos)
    ref, _ = vc.apply(state, jnp.asarray(videos), cfg, train=False)
    assert out.shape == (4, 10)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


class TestDataParallelOn2DMesh:

  def test_dp_axis_of_2d_mesh(self, model_and_state):
    """data_parallel_forward over the data axis of a (4, 2) mesh: batch
    splits 4 ways, params replicated across all 8 devices."""
    model, state = model_and_state
    mesh = mesh_lib.make_mesh(model_parallelism=2)  # (4, 2)
    fwd = serving.data_parallel_forward(
        lambda p, v: model.apply(p, v, train=False)[0], mesh)
    video = jax.random.uniform(jax.random.PRNGKey(3), (4, 2, 12, 12, 3))
    ref, _ = model.apply(state, video, train=False)
    got = fwd(state, video)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestGracefulStop:

  def test_stop_fails_queued_requests_immediately(self, model_and_state):
    """Requests still queued at stop() get an immediate error instead of
    blocking their callers until the embed timeout."""
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(2,))
    clip = np.zeros((2, 12, 12, 3), np.float32)
    errors = []

    def caller():
      try:
        service.embed(clip, timeout=60.0)
      except Exception as e:
        errors.append(e)

    # Never started: the request just sits in the queue.
    t = threading.Thread(target=caller, daemon=True)
    t.start()
    for _ in range(100):
      if not service._queue.empty():
        break
      threading.Event().wait(0.05)
    service.stop()
    t.join(timeout=10)
    assert not t.is_alive()
    assert len(errors) == 1 and 'stopped' in str(errors[0])

  def test_embed_after_stop_fails_fast(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(2,))
    service.start()
    service.stop()
    with pytest.raises(RuntimeError, match='stopped'):
      service.embed(np.zeros((2, 12, 12, 3), np.float32))

  def test_restart_after_stop_serves_again(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    service.start()
    service.stop()
    service.start()
    try:
      emb = service.embed(np.zeros((2, 12, 12, 3), np.float32))
      assert np.isfinite(np.asarray(emb)).all()
    finally:
      service.stop()


class TestDeadlines:

  def test_expired_request_dropped_unserved(self, model_and_state):
    """Deadline passes while queued (service not yet started): once the
    worker comes up it drops the stale request with DeadlineExceeded and
    never runs it on the chip."""
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    clip = np.zeros((2, 12, 12, 3), np.float32)
    errors, results = [], []

    def caller():
      try:
        results.append(service.embed(clip, timeout=60.0, deadline_ms=50))
      except Exception as e:
        errors.append(e)

    t = threading.Thread(target=caller, daemon=True)
    t.start()
    for _ in range(100):
      if not service._queue.empty():
        break
      threading.Event().wait(0.01)
    threading.Event().wait(0.2)  # let the 50 ms deadline lapse
    service.start()
    try:
      t.join(timeout=30)
      assert not t.is_alive()
      assert not results
      assert len(errors) == 1
      assert isinstance(errors[0], serving.DeadlineExceeded)
      assert service.stats()['requests_expired'] == 1
      assert service.stats()['requests_served'] == 0
    finally:
      service.stop()

  def test_generous_deadline_serves_normally(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    service.start()
    try:
      out = service.embed(np.zeros((2, 12, 12, 3), np.float32),
                          deadline_ms=60_000)
      assert out.shape == (8, 16)
      assert service.stats()['requests_expired'] == 0
    finally:
      service.stop()

  def test_invalid_deadline_rejected(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    with pytest.raises(ValueError, match='deadline_ms'):
      service.embed(np.zeros((2, 12, 12, 3), np.float32), deadline_ms=0)


class TestHotReload:

  def test_reload_swaps_weights_without_restart(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    service.start()
    clip = np.random.default_rng(3).random((2, 12, 12, 3), np.float32)
    try:
      before = service.embed(clip)
      new_state = jax.tree.map(lambda x: x * 0.5, state)
      service.reload_state(new_state)
      after = service.embed(clip)
      ref, _ = model.apply(new_state, jnp.asarray(clip[None]), train=False)
      np.testing.assert_allclose(after, np.asarray(ref[0]), atol=1e-5)
      assert not np.allclose(before, after)
      assert service.stats()['reloads'] == 1
    finally:
      service.stop()

  def test_reload_rejects_different_architecture(self, model_and_state):
    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,))
    bad = jax.tree.map(lambda x: x, state)
    # Perturb one leaf's shape.
    bad['params']['patch_projection']['linear']['bias'] = np.zeros(
        (99,), np.float32)
    with pytest.raises(ValueError, match='reload_state'):
      service.reload_state(bad)

  def test_reload_keeps_quantized_serving_quantized(self, model_and_state):
    def int8_leaves(tree):
      return sum(jnp.asarray(x).dtype == jnp.int8
                 for x in jax.tree.leaves(tree))

    model, state = model_and_state
    service = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                       quantize='int8')
    n_q = int8_leaves(service._state)
    assert n_q > 0
    service.reload_state(jax.tree.map(lambda x: x * 0.5, state))
    assert int8_leaves(service._state) == n_q
    assert service.stats()['reloads'] == 1


class TestTextEncodeService:
  """Cross-request text coalescing — pure queue/threading logic, tested
  with a fake encoder (no model)."""

  def _fake_encoder(self, calls):
    def encode(texts):
      calls.append(list(texts))
      return np.asarray([[float(len(t))] * 4 for t in texts])
    return encode

  def test_results_fan_back_out_correctly(self):
    calls = []
    svc = serving.TextEncodeService(self._fake_encoder(calls),
                                    max_wait_ms=50)
    results = {}

    def worker(key, texts):
      results[key] = svc.encode(texts)

    threads = [threading.Thread(target=worker, args=(k, t)) for k, t in
               [('a', ['x', 'yy']), ('b', ['zzz']), ('c', ['pppp', 'q'])]]
    # Queue ALL requests before the worker exists, then start: the first
    # batch must coalesce everything — deterministic under any load
    # (a live worker + thread-start jitter would make the batch count
    # timing-dependent).
    for t in threads:
      t.start()
    deadline = threading.Event()
    for _ in range(200):
      if svc._queue.qsize() == 3:
        break
      deadline.wait(0.01)
    assert svc._queue.qsize() == 3
    svc.start()
    try:
      for t in threads:
        t.join(timeout=30)
      np.testing.assert_allclose(results['a'][:, 0], [1, 2])
      np.testing.assert_allclose(results['b'][:, 0], [3])
      np.testing.assert_allclose(results['c'][:, 0], [4, 1])
      assert len(calls) == 1  # one underlying call for all three
      assert svc.stats()['text_requests_served'] == 3
      assert svc.stats()['text_batches_run'] == 1
    finally:
      svc.stop()

  def test_reload_swaps_encoder_between_batches(self):
    calls = []
    svc = serving.TextEncodeService(self._fake_encoder(calls))
    svc.start()
    try:
      assert svc.encode(['ab'])[0, 0] == 2.0
      svc.reload(lambda texts: np.zeros((len(texts), 4)))
      assert svc.encode(['ab'])[0, 0] == 0.0
    finally:
      svc.stop()

  def test_encoder_error_broadcasts_and_service_survives(self):
    def boom(texts):
      raise RuntimeError('tokenizer exploded')

    svc = serving.TextEncodeService(boom)
    svc.start()
    try:
      with pytest.raises(RuntimeError, match='exploded'):
        svc.encode(['x'])
      svc.reload(lambda texts: np.ones((len(texts), 2)))
      assert svc.encode(['x']).shape == (1, 2)
      assert svc.stats()['text_errors'] == 1
    finally:
      svc.stop()

  def test_stop_fails_queued_and_rejects_new(self):
    svc = serving.TextEncodeService(lambda t: np.zeros((len(t), 2)))
    svc.start()
    svc.stop()
    with pytest.raises(RuntimeError, match='stopped'):
      svc.encode(['x'])

  def test_validation(self):
    svc = serving.TextEncodeService(lambda t: np.zeros((len(t), 2)))
    with pytest.raises(ValueError, match='empty'):
      svc.encode([])
    with pytest.raises(ValueError, match='deadline_ms'):
      svc.encode(['x'], deadline_ms=-1)
    with pytest.raises(ValueError, match='max_texts'):
      serving.TextEncodeService(lambda t: t, max_texts=0)

  def test_expired_deadline_dropped(self):
    svc = serving.TextEncodeService(lambda t: np.zeros((len(t), 2)))
    errors = []

    def caller():
      try:
        svc.encode(['x'], deadline_ms=50)
      except Exception as e:
        errors.append(e)

    t = threading.Thread(target=caller, daemon=True)
    t.start()  # service not started: request queues, deadline lapses
    threading.Event().wait(0.2)
    svc.start()
    try:
      t.join(timeout=30)
      assert len(errors) == 1
      assert isinstance(errors[0], serving.DeadlineExceeded)
    finally:
      svc.stop()


class TestExportedServing:
  """EmbeddingService(exported=...): the AOT StableHLO artifact replaces
  the jitted model.apply forward (videoprism_tpu/export.py) — cold-start
  serving with no Python tracing."""

  @pytest.fixture(scope='class')
  def artifact(self, model_and_state):
    from videoprism_tpu import export as export_lib
    model, state = model_and_state
    return export_lib.export_forward(model, state)  # symbolic batch

  def _clip(self, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    v = rng.rand(2, 12, 12, 3)
    if dtype == np.uint8:
      return (v * 255).astype(np.uint8)
    return v.astype(dtype)

  def test_matches_jit_forward(self, model_and_state, artifact):
    model, state = model_and_state
    svc = serving.EmbeddingService(model, state, batch_buckets=(1, 4),
                                   exported=artifact)
    svc.start()
    try:
      clip = self._clip()
      got = svc.embed(clip)
      ref, _ = model.apply(state, clip[None], train=False)
      np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-6)
      batch = np.stack([self._clip(s) for s in range(3)])
      got_b = svc.embed_batch(batch)
      ref_b, _ = model.apply(state, batch, train=False)
      np.testing.assert_allclose(got_b, np.asarray(ref_b), atol=1e-6)
    finally:
      svc.stop()

  def test_uint8_ingestion_normalizes(self, model_and_state, artifact):
    model, state = model_and_state
    svc = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                   exported=artifact)
    svc.start()
    try:
      clip = self._clip(seed=3, dtype=np.uint8)
      got = svc.embed(clip)
      ref, _ = model.apply(
          state, clip[None].astype(np.float32) / 255.0, train=False)
      np.testing.assert_allclose(got, np.asarray(ref)[0], atol=1e-5)
    finally:
      svc.stop()

  def test_loads_from_path(self, model_and_state, artifact, tmp_path):
    model, state = model_and_state
    path = str(tmp_path / 'enc.stablehlo')
    artifact.save(path)
    svc = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                   exported=path)
    svc.start()
    try:
      clip = self._clip(seed=5)
      ref, _ = model.apply(state, clip[None], train=False)
      np.testing.assert_allclose(svc.embed(clip), np.asarray(ref)[0],
                                 atol=1e-6)
    finally:
      svc.stop()

  def test_rejects_mesh_and_tp(self, model_and_state, artifact):
    model, state = model_and_state
    mesh = mesh_lib.make_mesh()
    with pytest.raises(ValueError, match='exported'):
      serving.EmbeddingService(model, state, exported=artifact, mesh=mesh)
    with pytest.raises(ValueError, match='exported'):
      serving.EmbeddingService(model, state, exported=artifact,
                               tensor_parallel=True, mesh=mesh)

  def test_hot_reload_serves_new_weights(self, model_and_state, artifact):
    model, state = model_and_state
    svc = serving.EmbeddingService(model, state, batch_buckets=(1,),
                                   exported=artifact)
    svc.start()
    try:
      new_state = model.init(jax.random.PRNGKey(7))
      svc.reload_state(new_state)
      clip = self._clip(seed=9)
      ref, _ = model.apply(new_state, clip[None], train=False)
      np.testing.assert_allclose(svc.embed(clip), np.asarray(ref)[0],
                                 atol=1e-6)
    finally:
      svc.stop()

  def test_mismatched_artifact_fails_loudly(self, model_and_state, artifact):
    """An int8-quantized state with an artifact exported from the float
    model must fail at construction with a actionable message, not at
    call time inside jax.export."""
    model, state = model_and_state
    with pytest.raises(ValueError, match='param leaves'):
      serving.EmbeddingService(model, state, batch_buckets=(1,),
                               exported=artifact, quantize='int8')
