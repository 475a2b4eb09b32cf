"""Bundled assets: a demo video and a binary SentencePiece test fixture.

Fills the role of the reference's ``videoprism/assets/`` directory
(demo mp4 + ``testdata/test_spm.model``) with assets generated from
scratch by ``scripts/make_assets.py`` — the framework is self-contained:
tests and examples run without any external checkout or download.
"""

from __future__ import annotations

import os

_DIR = os.path.dirname(os.path.abspath(__file__))


def demo_video_path() -> str:
  """Bundled 48-frame 192x192 synthetic demo clip (mp4)."""
  return os.path.join(_DIR, 'demo.mp4')


def test_spm_path() -> str:
  """Bundled 1000-piece unigram SentencePiece model (byte fallback)."""
  return os.path.join(_DIR, 'testdata', 'test_spm_1k.model')
