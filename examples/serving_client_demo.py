#!/usr/bin/env python
"""The full network serving story in one runnable file.

Stands up the HTTP embedding server in-process (the same
``EmbeddingService`` + ``EmbeddingHTTPServer`` that
``scripts/serve_embeddings.py`` deploys), then talks to it exclusively
through the client SDK — the flow a network-attached user runs against a
remote TPU fleet:

  1. ``client.embed`` — raw frames over the wire (keep-alive, npy).
  2. ``client.embed_file`` — ship the compressed CONTAINER instead;
     the server decodes with the native FFmpeg decoder.  10-50x less
     wire than raw frames — the difference that matters when the link,
     not the chip, is the bottleneck (measured; docs/DESIGN.md §7).
  3. ``client.embed_text`` + ``client.zero_shot`` — the lvt text tower
     and one-call CLIP zero-shot classification (prompt ensembling,
     softmax over cosine similarities).
  4. ``client.stats`` / ``client.healthy`` — the observability surface.

  python examples/serving_client_demo.py [VIDEO.mp4] [--checkpoint CKPT]

Runs on CPU out of the box with a tiny random-weight model (embeddings
are then meaningless — the WIRE FLOW is what this demos); pass a real
checkpoint + ``--model`` for meaningful outputs on a TPU host.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

import videoprism_tpu as vp
from videoprism_tpu import assets


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument(
      'video', nargs='?', default=assets.demo_video_path(),
      help='path to an mp4 (default: the bundled demo clip)')
  parser.add_argument('--model', default=None,
                      help='lvt registry name (e.g. '
                           'videoprism_lvt_public_v1_base); default: a '
                           'tiny random model on CPU')
  parser.add_argument('--checkpoint', default=None,
                      help='local npz/safetensors for --model')
  parser.add_argument('--tokenizer-model', default=None,
                      help='SentencePiece model (real models need the '
                           'real c4_en.model; the bundled fixture only '
                           'feeds the tiny demo)')
  args = parser.parse_args()

  from videoprism_tpu import retrieval, serving, serving_http
  from videoprism_tpu.client import VideoPrismClient
  from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

  tiny = args.model is None
  if tiny:
    from videoprism_tpu.utils.compilation_cache import force_cpu

    force_cpu(1)
    from videoprism_tpu.models import clip as vclip
    from videoprism_tpu.models import init as init_lib

    cfg = vclip.VideoCLIPConfig(
        patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
        num_spatial_layers=2, num_temporal_layers=1, num_heads=2,
        mlp_dim=32, atten_logit_cap=50.0, scan=True,
        num_auxiliary_layers=1, vocabulary_size=1000,
        enable_causal_atten=True, num_unimodal_layers=1,
        norm_policy='pre')
    model = vp.Model(cfg, vclip.apply, init_lib.init_video_clip)
    state = model.init(jax.random.PRNGKey(0))
    frames, size = 2, 12
  else:
    import jax.numpy as jnp

    model = vp.get_model(args.model, fprop_dtype=jnp.bfloat16,
                         attention_impl='flash')
    state = (vp.load_pretrained_weights(None,
                                        checkpoint_path=args.checkpoint)
             if args.checkpoint else vp.load_pretrained_weights(args.model))
    from videoprism_tpu.models.registry import native_clip_geometry
    frames, size = native_clip_geometry(model.config)

  tok_path = assets.resolve_tokenizer_path(args.tokenizer_model,
                                           allow_fixture=tiny)
  tokenizer = SentencePieceTokenizer(tok_path)

  # --- server (in-process here; scripts/serve_embeddings.py in prod) ---
  service = serving.EmbeddingService(model, state, batch_buckets=(1, 4))
  service.start()
  text_fn = retrieval.make_text_query_encoder(
      model._unwrap(state), model.config, tokenizer)
  # The frames service enables /v1/localize (text-to-time search); it
  # shares the weight tree with the pooled service (one HBM copy).
  frames_service = serving.EmbeddingService(
      retrieval.make_frame_embeddings_model(model.config), state,
      batch_buckets=(1,))
  frames_service.start()
  httpd = serving_http.EmbeddingHTTPServer(
      service, host='127.0.0.1', port=0, text_encode_fn=text_fn,
      frames_service=frames_service)
  httpd.start()
  print(f'serving on 127.0.0.1:{httpd.port}')

  # --- everything below is pure client-side, network only ---
  client = VideoPrismClient(f'http://127.0.0.1:{httpd.port}')

  from videoprism_tpu.io import video as video_lib
  clip = video_lib.load_video(args.video, num_frames=frames,
                              target_size=size, as_uint8=True)
  emb = client.embed(clip)                       # raw frames on the wire
  print(f'embed:      {emb.shape} |e|={np.linalg.norm(emb):.4f}')

  emb_f = client.embed_file(args.video)          # ship the container
  cos = float(np.dot(emb, emb_f)
              / (np.linalg.norm(emb) * np.linalg.norm(emb_f)))
  print(f'embed_file: {emb_f.shape} cosine-vs-embed={cos:.6f} '
        '(same decode server-side)')

  texts = client.embed_text(['a person drumming on water bottles',
                             'a cat sleeping'])
  print(f'embed_text: {texts.shape}')

  preds = client.zero_shot(args.video, ['drumming', 'sleeping cat',
                                        'surfing'], k=3)
  print('zero_shot: ', preds)

  # Server-side zero-shot: the class prompts encode ONCE (the set caches
  # under a content-hash id); each clip is then one round trip with no
  # per-call text-tower work — the mode for scoring many clips against
  # one label set.
  preds_remote = client.zero_shot(args.video, ['drumming', 'sleeping cat',
                                               'surfing'], k=3, remote=True)
  print('zero_shot (remote, cached prototypes):', preds_remote)

  # WHEN does it happen: per-frame CLIP embeddings swept against the
  # query server-side; segments are frame ranges (divide by 'frames'
  # for position fractions of the video).
  loc = client.localize(args.video, ['a person drumming'], k=2,
                        frames=frames, size=size)
  print('localize:  ', loc['results'][0]['segments'])

  print('healthy:   ', client.healthy())
  stats = client.stats()
  print(f'stats:      {stats["requests_served"]} requests in '
        f'{stats["batches_run"]} batches')

  httpd.stop()
  frames_service.stop()
  service.stop()


if __name__ == '__main__':
  main()
