"""Generates the repo's bundled test/demo assets, deterministically.

The reference ships a demo video and a binary SentencePiece fixture
(``/root/reference/videoprism/assets/``); this repo builds its own from
scratch so the framework is fully self-contained — the test suite and the
examples must work with the reference checkout absent.

Outputs (committed to git; re-run only when intentionally regenerating —
the committed goldens in tests/test_bundled_assets.py are tied to these
exact bytes):

  videoprism_tpu/assets/testdata/test_spm_1k.model
      1000-piece unigram SentencePiece model (byte-fallback table, 730
      English word/subword pieces, deterministic rank-based scores),
      serialized with our own protobuf wire writer (io/spm.py).
  videoprism_tpu/assets/demo.mp4
      2-second synthetic demo clip, 48 frames @ 192x192, 24 fps: moving
      gradient + bouncing square + a frame-index position bar (robust to
      lossy encoding, so tests can verify which frames were sampled).

Run:  python scripts/make_assets.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from videoprism_tpu.io import spm

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'videoprism_tpu', 'assets')

# 730 surface forms: a fixed common-English inventory.  Order matters
# (ids and scores are rank-based); append only at the end if extending.
_WORDS = """
the of and to in a is that for it as was with be by on not he i this are
or his from at which but have an had they you were their one all we can
her has there been if more when will would who so no him she my its out
up what about into than them could only over time new some these two may
then do first any like now such our man even most me state after also
made many did must before back see through way where get much go well
your know should down work year because come people just say each those
take day good how long own too little use us very great still men here
life both between old under last never place same another think house
while high right might came off find states since used give against
three himself look few general hand school part small american home
during number again world fact said water less public put thing almost
hands enough far took head yet government system better set told nothing
night end why called didn eyes asked later knew point next city business
program case group towards young days got area come want face until
power need really within deal once door car does room turned always
quite big social second open possible white together however sure
something without thought light help early though brought music money
making across already four every information move order upon country
left away hour problem video model frame image text token embed encode
decode train learn deep neural network attention transformer layer
vision language audio speech signal data batch input output weight bias
scale shift norm mean query key value head block stack patch pixel clip
sample rate time step size shape grid mesh chip core memory cache fast
slow run load save test check score rank match search index table list
map tree node edge graph path root leaf hash sort merge split join
filter reduce apply bind wrap cast view copy share send read write
stream buffer queue stack heap pool lock sync wait spawn fork exec
"""
_SUFFIXES = ['s', 'ed', 'ing', 'er', 'ly', 'es', 'est', 'tion', 'ment',
             'ness', 'able', 'al', 'ic', 'ous', 'ive', 'ful', 'less',
             'y', 'en', 'an', 'ar', 'or', 'in', 'on', 'at', 'it', 'is',
             'le', 'll', 're', 've', 'st', 'nt', 'nd', 'th', 'ch', 'sh',
             'wh', 'qu', 'tr', 'br', 'gr', 'pr', 'pl', 'cl', 'bl', 'fl',
             'sl', 'sp', 'sc', 'sk', 'sm', 'sn', 'sw', 'tw', 'dr', 'cr',
             'fr', 'wr', 'str', 'spr', 'thr', 'ight', 'ough', 'ould',
             'ation', 'ition']
_PUNCT = list(".,!?;:'\"-()[]/%$#@&*+=<>_")
_CHARS = [chr(c) for c in range(ord('a'), ord('z') + 1)]
_DIGITS = [str(d) for d in range(10)]


def build_spm_fixture(path: str) -> None:
  pieces = [
      spm.Piece('<unk>', 0.0, spm.UNKNOWN),
      spm.Piece('<s>', 0.0, spm.CONTROL),
      spm.Piece('</s>', 0.0, spm.CONTROL),
  ]
  pieces += [spm.Piece(f'<0x{i:02X}>', 0.0, spm.BYTE) for i in range(256)]

  surfaces: list[str] = ['▁']
  seen = {'▁'}

  def add(s: str) -> None:
    if s and s not in seen:
      seen.add(s)
      surfaces.append(s)

  for w in _WORDS.split():
    add('▁' + w)
  for s in _SUFFIXES:
    add(s)
  for c in _CHARS + _DIGITS + _PUNCT:
    add(c)
    add('▁' + c)

  budget = 1000 - len(pieces)
  if len(surfaces) < budget:
    # Top up with two-char combos so the vocab is exactly 1000.
    for a in _CHARS:
      for b in _CHARS:
        add(a + b)
        if len(surfaces) >= budget:
          break
      if len(surfaces) >= budget:
        break
  surfaces = surfaces[:budget]

  # Rank-based scores: earlier pieces (common words) outscore later ones;
  # single chars get a constant low score so multi-char pieces win.
  for rank, s in enumerate(surfaces):
    if len(s.replace('▁', '')) <= 1:
      score = -8.0 if s != '▁' else -5.0
    else:
      score = -1.0 - 6.0 * rank / len(surfaces)
    pieces.append(spm.Piece(s, round(score, 4)))

  assert len(pieces) == 1000, len(pieces)
  model = spm.SpmModel(
      pieces=pieces, model_type=spm.UNIGRAM, byte_fallback=True,
      unk_id=0, bos_id=1, eos_id=2, pad_id=-1, normalizer_name='nmt_nfkc')
  os.makedirs(os.path.dirname(path), exist_ok=True)
  spm.save_model(path, model)
  print(f'wrote {path} ({os.path.getsize(path)} bytes, 1000 pieces)')


def build_demo_video(path: str, frames: int = 48, size: int = 192,
                     fps: int = 24) -> None:
  import cv2

  os.makedirs(os.path.dirname(path), exist_ok=True)
  writer = cv2.VideoWriter(
      path, cv2.VideoWriter_fourcc(*'mp4v'), fps, (size, size))
  if not writer.isOpened():
    raise RuntimeError('cv2.VideoWriter failed to open (mp4v codec)')
  yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
  for i in range(frames):
    t = i / (frames - 1)
    # Moving diagonal gradient (deterministic, smooth under compression).
    r = (255 * ((xx + t) % 1.0)).astype(np.uint8)
    g = (255 * ((yy + 0.5 * t) % 1.0)).astype(np.uint8)
    b = np.full((size, size), int(64 + 128 * t), np.uint8)
    frame = np.stack([b, g, r], axis=-1)  # BGR for cv2
    # Bouncing square.
    cx = int((size - 40) * abs(2 * ((i / 16.0) % 1.0) - 1.0)) + 4
    cy = int((size - 40) * abs(2 * ((i / 23.0) % 1.0) - 1.0)) + 4
    frame[cy:cy + 32, cx:cx + 32] = (255, 255, 255)
    # Frame-index position bar: a black marker whose x-position encodes i
    # linearly — survives lossy encoding, so tests can check sampling.
    bar_x = int((size - 16) * i / (frames - 1))
    frame[:12, :] = (230, 230, 230)
    frame[:12, bar_x:bar_x + 16] = (10, 10, 10)
    writer.write(frame)
  writer.release()
  print(f'wrote {path} ({os.path.getsize(path)} bytes, '
        f'{frames}f @ {size}x{size} {fps}fps)')


def main():
  import argparse

  parser = argparse.ArgumentParser(description=__doc__.split('\n')[0])
  parser.parse_args()
  build_spm_fixture(os.path.join(ASSETS, 'testdata', 'test_spm_1k.model'))
  build_demo_video(os.path.join(ASSETS, 'demo.mp4'))


if __name__ == '__main__':
  main()
