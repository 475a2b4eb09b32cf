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


def resolve_tokenizer_path(explicit: str | None = None, *,
                           allow_fixture: bool = False) -> str:
  """Tokenizer path resolution: explicit flag > ``$VIDEOPRISM_SPM_PATH`` >
  (smoke runs only) the bundled test fixture.

  Real lvt checkpoints need the real 32k ``c4_en.model``: its piece ids
  ARE the row indices of the checkpoint's vocabulary embedding table.  The
  bundled fixture is a 1000-piece TEST vocabulary — every id is < 1000, so
  nothing crashes, but the text embeddings are semantically garbage.  It
  is therefore handed out only when the caller says fixtures are
  acceptable (tiny/synthetic smoke modes); otherwise missing tokenizer
  configuration fails fast instead of silently corrupting results.
  """
  path = explicit or os.environ.get('VIDEOPRISM_SPM_PATH')
  if path:
    return path
  if allow_fixture:
    return test_spm_path()
  raise ValueError(
      'no tokenizer model configured: pass --tokenizer-model '
      '/path/to/c4_en.model (or set $VIDEOPRISM_SPM_PATH). The bundled '
      'fixture is a 1000-piece TEST vocabulary whose ids do not match '
      'real checkpoints; it is only used automatically in '
      '--tiny/--synthetic smoke modes.')
