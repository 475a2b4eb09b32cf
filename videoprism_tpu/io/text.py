"""Text canonicalization (reference videoprism/utils.py:172-201)."""

from __future__ import annotations

import string


def canonicalize_text(text: str) -> str:
  """Lowercase, strip punctuation to spaces, collapse whitespace, end with '.'.

  Examples:
    "Hello, World!"   -> "hello world."
    "  Hello   WORLD" -> "hello world."
  """
  p = string.punctuation
  text = text.translate(str.maketrans(p, ' ' * len(p)))
  text = text.lower()
  text = ' '.join(text.split())
  return text + '.'
