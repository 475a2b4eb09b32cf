"""SentencePiece-compatible text tokenizers (pure Python + optional C++ core).

Drop-in replacement for the reference's ``sentencepiece``-backed tokenizer
(reference videoprism/tokenizers.py:29-192) with no native wheel dependency:
the serialized model is decoded by :mod:`videoprism_tpu.io.spm` and text is
segmented by our own implementation of the SentencePiece **unigram Viterbi**
algorithm (and greedy score-ordered BPE for bpe-type models).

Compatibility notes (validated against the reference's golden ids for its
bundled 1000-piece test model):
  * normalization: NFKC + whitespace collapse + dummy-prefix + ``▁`` escaping
    per the model's NormalizerSpec;
  * unknown characters score ``min_score - 10.0`` (SentencePiece's
    kUnkPenalty) and map to ``unk_id``;
  * CONTROL/UNKNOWN pieces never match text.
"""

from __future__ import annotations

import os
import unicodedata
from collections.abc import Sequence
from typing import Protocol, TYPE_CHECKING

from videoprism_tpu.io import spm

if TYPE_CHECKING:
  import tensorflow as tf

_WHITESPACE_ESCAPE = '▁'  # '▁'
_UNK_PENALTY = 10.0


class Tokenizer(Protocol):
  """Tokenizer interface (reference videoprism/tokenizers.py:29-77)."""

  def to_int(
      self, text: str | Sequence[str], *, bos: bool = False, eos: bool = False
  ) -> list[int] | list[list[int]]:
    ...

  def to_int_tf_op(
      self, text: str | Sequence[str], *, bos: bool = False, eos: bool = False
  ) -> 'tf.Tensor | tf.RaggedTensor':
    ...

  @property
  def pad_token(self) -> int:
    ...

  @property
  def eos_token(self) -> int:
    ...

  @property
  def bos_token(self) -> int:
    ...

  @property
  def vocab_size(self) -> int:
    ...


class _Trie:
  """Character trie over vocabulary pieces for lattice construction."""

  __slots__ = ('children', 'piece_id')

  def __init__(self):
    self.children: dict[str, _Trie] = {}
    self.piece_id: int | None = None

  def insert(self, piece: str, piece_id: int) -> None:
    node = self
    for ch in piece:
      nxt = node.children.get(ch)
      if nxt is None:
        nxt = _Trie()
        node.children[ch] = nxt
      node = nxt
    node.piece_id = piece_id

  def matches(self, text: str, start: int):
    """Yields (end_index, piece_id) for all vocab pieces prefixing
    text[start:]."""
    node = self
    for i in range(start, len(text)):
      node = node.children.get(text[i])
      if node is None:
        return
      if node.piece_id is not None:
        yield i + 1, node.piece_id


class SentencePieceTokenizer(Tokenizer):
  """Loads a serialized SentencePiece model and tokenizes like the C++ lib.

  Like the reference (videoprism/tokenizers.py:83-100), legacy ``gs://``
  paths resolve to the public ``c4_en.model`` copy on HuggingFace; local
  paths load directly.
  """

  def __init__(self, model_path: str = 'c4_en.model',
               use_native: bool | None = None):
    local_path = _resolve_model_path(model_path)
    # Resolved on-disk path: lets tools hand the same binary model to an
    # external implementation (scripts/validate_release.py diffs against
    # the sentencepiece C++ wheel via this).
    self.model_path = local_path
    self._spm = spm.load_model(local_path)
    self._trie = _Trie()
    self._scores: list[float] = []
    matchable = []
    matchable_scores = []
    for idx, piece in enumerate(self._spm.pieces):
      self._scores.append(piece.score)
      is_match = piece.type in (spm.NORMAL, spm.USER_DEFINED)
      matchable.append(is_match)
      if is_match:
        self._trie.insert(piece.piece, idx)
        matchable_scores.append(piece.score)
    min_score = min(matchable_scores) if matchable_scores else 0.0
    self._unk_score = min_score - _UNK_PENALTY

    # Byte-fallback table: with trainer_spec.byte_fallback, SentencePiece
    # replaces each UNK piece in the output by the <0xXX> BYTE pieces of
    # its surface text (sentencepiece_processor.cc post-processing; the
    # reference consumes this via EncodeAsIds, videoprism/tokenizers.py:119).
    self._byte_ids: dict[int, int] = {}
    if self._spm.byte_fallback:
      for idx, piece in enumerate(self._spm.pieces):
        if piece.type == spm.BYTE and len(piece.piece) == 6:
          try:
            self._byte_ids[int(piece.piece[1:5], 16)] = idx
          except ValueError:
            pass
    self._use_byte_fallback = len(self._byte_ids) == 256

    # piece -> id for the BPE merge loop (built once; rebuilding per
    # encode call would be O(vocab) per string).
    self._piece_ids: dict[str, int] = {
        p.piece: i for i, p in enumerate(self._spm.pieces)
        if p.type in (spm.NORMAL, spm.USER_DEFINED)}

    # Native (C++) Viterbi core; Python fallback on any failure.  Control
    # with use_native / $VIDEOPRISM_NATIVE_TOKENIZER=0.
    self._native = None
    if use_native is None:
      use_native = os.environ.get(
          'VIDEOPRISM_NATIVE_TOKENIZER', '1') != '0'
    if use_native and self._spm.model_type == spm.UNIGRAM:
      try:
        from videoprism_tpu import native as native_lib

        self._native = native_lib.NativeUnigramEncoder(
            [p.piece for p in self._spm.pieces], self._scores, matchable,
            self._spm.unk_id, self._unk_score)
      except (RuntimeError, OSError):
        self._native = None

  # ------------------------------ normalize ------------------------------

  def _normalize(self, text: str) -> str:
    """NormalizerSpec subset: NFKC, whitespace collapse, prefix, escape."""
    if 'nfkc' in self._spm.normalizer_name or not self._spm.normalizer_name:
      text = unicodedata.normalize('NFKC', text)
    if self._spm.remove_extra_whitespaces:
      text = ' '.join(text.split())
    if not text:
      return text
    if self._spm.add_dummy_prefix:
      text = ' ' + text
    if self._spm.escape_whitespaces:
      text = text.replace(' ', _WHITESPACE_ESCAPE)
    return text

  # ------------------------------- encode --------------------------------

  def _encode_unigram(self, text: str) -> list[int]:
    """Viterbi max-score segmentation over the piece lattice."""
    n = len(text)
    neg_inf = float('-inf')
    best = [neg_inf] * (n + 1)
    best[0] = 0.0
    back: list[tuple[int, int]] = [(-1, -1)] * (n + 1)

    for start in range(n):
      base = best[start]
      if base == neg_inf:
        continue
      matched_single = False
      for end, piece_id in self._trie.matches(text, start):
        if end == start + 1:
          matched_single = True
        score = base + self._scores[piece_id]
        if score > best[end]:
          best[end] = score
          back[end] = (start, piece_id)
      if not matched_single:
        # OOV character -> unk with penalty (SentencePiece kUnkPenalty).
        score = base + self._unk_score
        if score > best[start + 1]:
          best[start + 1] = score
          back[start + 1] = (start, self._spm.unk_id)

    spans: list[tuple[int, int, int]] = []  # (start, end, piece_id)
    pos = n
    while pos > 0:
      start, piece_id = back[pos]
      spans.append((start, pos, piece_id))
      pos = start
    spans.reverse()

    ids: list[int] = []
    for start, end, piece_id in spans:
      if self._use_byte_fallback and piece_id == self._spm.unk_id:
        # SentencePiece byte fallback: the UNK piece is replaced by the
        # <0xXX> BYTE pieces of its surface text's UTF-8 encoding.
        ids.extend(self._byte_ids[b]
                   for b in text[start:end].encode('utf-8'))
      else:
        ids.append(piece_id)
    return ids

  def _encode_bpe(self, text: str) -> list[int]:
    """Score-ordered greedy merging (SentencePiece BPE semantics: repeatedly
    merge the adjacent pair whose merged piece has the highest score)."""
    piece_ids = self._piece_ids
    symbols = list(text)
    while True:
      best_score, best_idx, best_id = float('-inf'), -1, -1
      for i in range(len(symbols) - 1):
        merged = symbols[i] + symbols[i + 1]
        pid = piece_ids.get(merged)
        if pid is not None and self._scores[pid] > best_score:
          best_score, best_idx, best_id = self._scores[pid], i, pid
      if best_idx < 0:
        break
      symbols[best_idx:best_idx + 2] = [symbols[best_idx]
                                        + symbols[best_idx + 1]]
    ids: list[int] = []
    for s in symbols:
      pid = piece_ids.get(s)
      if pid is not None:
        ids.append(pid)
      elif self._use_byte_fallback:
        # Same post-processing as the unigram path: OOV surface -> its
        # UTF-8 <0xXX> BYTE pieces instead of unk.
        ids.extend(self._byte_ids[b] for b in s.encode('utf-8'))
      else:
        ids.append(self._spm.unk_id)
    return ids

  def encode(self, text: str) -> list[int]:
    text = self._normalize(text)
    if not text:
      return []
    if self._spm.model_type == spm.BPE:
      return self._encode_bpe(text)
    if self._native is not None:
      ids = self._native.encode(text)
      if self._use_byte_fallback and self._spm.unk_id in ids:
        # The native core returns ids without surface spans; byte
        # fallback needs them, so re-encode through the Python lattice.
        return self._encode_unigram(text)
      return ids
    return self._encode_unigram(text)

  def decode(self, ids: Sequence[int]) -> str:
    pieces = []
    for i in ids:
      p = self._spm.pieces[i]
      if p.type in (spm.CONTROL, spm.UNKNOWN):
        continue
      pieces.append(p.piece)
    text = ''.join(pieces).replace(_WHITESPACE_ESCAPE, ' ')
    return text.lstrip(' ') if self._spm.add_dummy_prefix else text

  def id_to_piece(self, idx: int) -> str:
    return self._spm.pieces[idx].piece

  # ----------------------------- public API ------------------------------

  def to_int(
      self, text: str | Sequence[str], *, bos: bool = False, eos: bool = False
  ) -> list[int] | list[list[int]]:
    """Tokenizes text (reference videoprism/tokenizers.py:102-125)."""

    def _single(s: str) -> list[int]:
      return (
          ([self.bos_token] if bos else [])
          + self.encode(s)
          + ([self.eos_token] if eos else [])
      )

    if isinstance(text, str):
      return _single(text)
    return [_single(s) for s in text]

  def to_int_tf_op(
      self, text: 'str | Sequence[str] | tf.Tensor', *,
      bos: bool = False, eos: bool = False
  ) -> 'tf.Tensor | tf.RaggedTensor':
    """TF-op wrapper for tf.data pipelines (reference
    videoprism/tokenizers.py:127-172).  Requires TensorFlow."""
    try:
      import tensorflow as tf  # pytype: disable=import-error
    except ImportError as e:
      raise ImportError(
          'TensorFlow is required for to_int_tf_op(). '
          'Install tensorflow or tensorflow-cpu.'
      ) from e

    text = tf.convert_to_tensor(text)
    if text.ndim == 0:

      def fn(txt):
        s = txt.numpy().decode()
        return tf.constant(self.to_int(s, bos=bos, eos=eos), tf.int32)

      return tf.py_function(fn, [text], tf.int32)

    def fn(txt):
      strings = [s.decode() for s in txt.numpy().tolist()]
      return tf.ragged.constant(self.to_int(strings, bos=bos, eos=eos))

    out_type = tf.RaggedTensorSpec([text.shape[0], None], tf.int32)
    return tf.py_function(fn, [text], Tout=out_type)

  @property
  def pad_token(self) -> int:
    return self._spm.pad_id

  @property
  def eos_token(self) -> int:
    return self._spm.eos_id

  @property
  def bos_token(self) -> int:
    return self._spm.bos_id

  @property
  def vocab_size(self) -> int:
    return len(self._spm.pieces)


def _resolve_model_path(model_path: str) -> str:
  """Resolves a tokenizer model path to a local file.

  Legacy ``gs://`` paths (the registry's c4_en entry) fall back to the
  public ``c4_en.model`` copy: first a local cache / ``VIDEOPRISM_SPM_PATH``,
  then HuggingFace download (reference videoprism/tokenizers.py:92-98).
  """
  if model_path.startswith('gs://'):
    model_path = 'c4_en.model'

  if os.path.exists(model_path):
    return model_path

  env_path = os.environ.get('VIDEOPRISM_SPM_PATH')
  if env_path and os.path.exists(env_path):
    return env_path

  for cache_dir in (
      os.path.join(os.path.expanduser('~'), '.cache', 'videoprism_tpu'),
      os.path.join(os.path.expanduser('~'), '.cache', 'videoprism'),
  ):
    candidate = os.path.join(cache_dir, model_path)
    if os.path.exists(candidate):
      return candidate

  try:
    from huggingface_hub import hf_hub_download  # lazy: needs network

    return hf_hub_download(
        repo_id='tom-moroney/videoprism-mlx', filename=model_path)
  except Exception as e:
    raise FileNotFoundError(
        f'Tokenizer model {model_path!r} not found locally (also checked '
        '$VIDEOPRISM_SPM_PATH and ~/.cache/videoprism_tpu) and could not be '
        'downloaded from HuggingFace.'
    ) from e
