"""Tokenizer tests: SPM proto codec, unigram Viterbi goldens, tokenize_texts.

Two layers of validation (mirrors reference videoprism/tokenizers_test.py and
models_test.py:93-116 but with a self-generated fixture):

  * a fixture model built programmatically with our own proto writer, with
    hand-derivable Viterbi goldens;
  * if the reference checkout is present, its binary ``test_spm.model`` is
    decoded with our parser and must reproduce the reference test suite's
    golden ids ([80, 180, 60] for "blah") — proving drop-in compatibility
    with the C++ sentencepiece library the reference uses.
"""

import os

import numpy as np
import pytest

from tests import conftest

from videoprism_tpu.io import spm
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
from videoprism_tpu.models import tokenize_texts

REF_SPM = '/root/reference/videoprism/assets/testdata/test_spm.model'


@pytest.fixture(scope='module')
def fixture_model_path(tmp_path_factory):
  """Builds a tiny unigram model: scores chosen so whole-word pieces win."""
  pieces = [
      spm.Piece('<unk>', 0.0, spm.UNKNOWN),
      spm.Piece('<s>', 0.0, spm.CONTROL),
      spm.Piece('</s>', 0.0, spm.CONTROL),
      spm.Piece('▁', -4.0),          # 3
      spm.Piece('▁hello', -1.0),     # 4
      spm.Piece('▁world', -1.5),     # 5
      spm.Piece('he', -3.0),         # 6
      spm.Piece('l', -5.0),          # 7
      spm.Piece('o', -5.0),          # 8
      spm.Piece('▁w', -3.5),         # 9
      spm.Piece('r', -5.0),          # 10
      spm.Piece('d', -5.0),          # 11
      spm.Piece('lo', -4.0),         # 12
      spm.Piece('.', -2.0),          # 13
      spm.Piece('▁hell', -3.0),      # 14
      spm.Piece('wor', -3.0),        # 15
  ]
  model = spm.SpmModel(
      pieces=pieces, model_type=spm.UNIGRAM,
      unk_id=0, bos_id=1, eos_id=2, pad_id=-1,
      normalizer_name='nfkc')
  path = tmp_path_factory.mktemp('spm') / 'fixture.model'
  spm.save_model(str(path), model)
  return str(path)


class TestFixtureTokenizer:

  def test_properties(self, fixture_model_path):
    t = SentencePieceTokenizer(fixture_model_path)
    assert t.vocab_size == 16
    assert (t.bos_token, t.eos_token, t.pad_token) == (1, 2, -1)
    # Resolved on-disk path is exposed (validate_release.py hands the
    # same binary to the sentencepiece C++ wheel for the release diff).
    assert t.model_path == str(fixture_model_path)

  def test_viterbi_goldens(self, fixture_model_path):
    t = SentencePieceTokenizer(fixture_model_path)
    # '▁hello ▁world .' beats any char-level split.
    assert t.to_int('hello world.') == [4, 5, 13]
    assert t.to_int('hello') == [4]
    # 'world' alone normalizes to '▁world' == piece 5.
    assert t.to_int('world') == [5]
    # 'worl' forces a composite: '▁' + 'wor' + 'l' (-4-3-5 = -12) beats
    # '▁w' + 'o' + 'r' + 'l' (-3.5-5-5-5 = -18.5).
    assert t.to_int('worl') == [3, 15, 7]
    # OOV char: '▁' then unk (score min-10).
    assert t.to_int('z') == [3, 0]
    # bos/eos wrapping.
    assert t.to_int('hello', bos=True, eos=True) == [1, 4, 2]
    # batch.
    assert t.to_int(['hello', 'hello world.']) == [[4], [4, 5, 13]]
    # whitespace collapse + dummy prefix.
    assert t.to_int('  hello   world. ') == [4, 5, 13]
    assert t.to_int('') == []

  def test_decode_roundtrip(self, fixture_model_path):
    t = SentencePieceTokenizer(fixture_model_path)
    assert t.decode(t.to_int('hello world.')) == 'hello world.'
    assert t.decode(t.to_int('hello', bos=True, eos=True)) == 'hello'

  def test_tf_op(self, fixture_model_path):
    tf = pytest.importorskip('tensorflow')
    t = SentencePieceTokenizer(fixture_model_path)
    out = t.to_int_tf_op('hello world.')
    assert out.numpy().tolist() == [4, 5, 13]
    ragged = t.to_int_tf_op(['hello', 'hello world.'])
    assert [r.numpy().tolist() for r in ragged] == [[4], [4, 5, 13]]

  def test_tokenize_texts(self, fixture_model_path):
    t = SentencePieceTokenizer(fixture_model_path)
    ids, paddings = tokenize_texts(t, ['Hello, WORLD!', 'hello'], max_length=6)
    # canonicalize: 'Hello, WORLD!' -> 'hello world.' and 'hello' ->
    # 'hello.' (trailing period appended); bos (id 1) prepended because
    # bos_token >= 0 (reference videoprism/models.py:383-384).
    np.testing.assert_array_equal(
        ids, [[1, 4, 5, 13, 0, 0], [1, 4, 13, 0, 0, 0]])
    np.testing.assert_array_equal(
        paddings, [[0, 0, 0, 0, 1, 1], [0, 0, 0, 1, 1, 1]])
    assert ids.dtype == np.int32 and paddings.dtype == np.float32

  def test_tokenize_texts_truncation(self, fixture_model_path):
    t = SentencePieceTokenizer(fixture_model_path)
    ids, paddings = tokenize_texts(t, ['hello world'], max_length=2)
    assert ids.shape == (1, 2)
    np.testing.assert_array_equal(paddings, [[0, 0]])


@pytest.fixture(scope='module')
def byte_fallback_model_path(tmp_path_factory):
  """Unigram model with trainer_spec.byte_fallback and a full <0xXX> table
  (the layout of modern SentencePiece vocabs, e.g. T5X/Gemma-style)."""
  pieces = [
      spm.Piece('<unk>', 0.0, spm.UNKNOWN),
      spm.Piece('<s>', 0.0, spm.CONTROL),
      spm.Piece('</s>', 0.0, spm.CONTROL),
  ]
  pieces += [spm.Piece(f'<0x{i:02X}>', 0.0, spm.BYTE) for i in range(256)]
  base = len(pieces)  # 259
  pieces += [
      spm.Piece('▁', -4.0),          # base
      spm.Piece('▁hello', -1.0),     # base+1
      spm.Piece('.', -2.0),          # base+2
  ]
  model = spm.SpmModel(
      pieces=pieces, model_type=spm.UNIGRAM, byte_fallback=True,
      unk_id=0, bos_id=1, eos_id=2, pad_id=-1, normalizer_name='nfkc')
  path = tmp_path_factory.mktemp('spm_bf') / 'byte_fallback.model'
  spm.save_model(str(path), model)
  return str(path), base


class TestByteFallback:
  """SentencePiece byte-fallback semantics: UNK pieces are replaced by the
  <0xXX> BYTE pieces of their surface's UTF-8 bytes (the encode path the
  reference consumes via EncodeAsIds, videoprism/tokenizers.py:102-125)."""

  def test_roundtrips_proto_flag(self, byte_fallback_model_path):
    path, _ = byte_fallback_model_path
    model = spm.load_model(path)
    assert model.byte_fallback is True
    assert sum(p.type == spm.BYTE for p in model.pieces) == 256

  def test_oov_ascii_char_becomes_byte_piece(self, byte_fallback_model_path):
    path, base = byte_fallback_model_path
    t = SentencePieceTokenizer(path)
    # 'z' (0x7A) has no piece: '▁' + <0x7A>.
    assert t.to_int('z') == [base, 3 + 0x7A]

  def test_oov_unicode_becomes_utf8_bytes(self, byte_fallback_model_path):
    path, base = byte_fallback_model_path
    t = SentencePieceTokenizer(path)
    # 'é' = U+00E9 = UTF-8 C3 A9; '雪' = U+96EA = UTF-8 E9 9B AA.
    assert t.to_int('é') == [base, 3 + 0xC3, 3 + 0xA9]
    assert t.to_int('hello雪') == [
        base + 1, 3 + 0xE9, 3 + 0x9B, 3 + 0xAA]

  def test_known_pieces_unaffected(self, byte_fallback_model_path):
    path, base = byte_fallback_model_path
    t = SentencePieceTokenizer(path)
    assert t.to_int('hello.') == [base + 1, base + 2]

  def test_without_flag_stays_unk(self, fixture_model_path):
    t = SentencePieceTokenizer(fixture_model_path)
    assert t.to_int('z') == [3, 0]  # no byte table -> unk as before

  def test_bpe_path_uses_byte_fallback(self, tmp_path):
    """Regression: byte fallback must apply on the BPE path too, not just
    the unigram lattice."""
    pieces = [
        spm.Piece('<unk>', 0.0, spm.UNKNOWN),
        spm.Piece('<s>', 0.0, spm.CONTROL),
        spm.Piece('</s>', 0.0, spm.CONTROL),
    ]
    pieces += [spm.Piece(f'<0x{i:02X}>', 0.0, spm.BYTE) for i in range(256)]
    base = len(pieces)
    pieces += [spm.Piece('▁', -1.0), spm.Piece('a', -2.0),
               spm.Piece('▁a', -0.5)]
    model = spm.SpmModel(
        pieces=pieces, model_type=spm.BPE, byte_fallback=True,
        unk_id=0, normalizer_name='nfkc')
    path = str(tmp_path / 'bpe_bf.model')
    spm.save_model(path, model)
    t = SentencePieceTokenizer(path)
    # 'a' merges to '▁a'; 'é' (UTF-8 C3 A9) has no piece -> byte pieces.
    assert t.to_int('aé') == [base + 2, 3 + 0xC3, 3 + 0xA9]


@pytest.mark.skipif(not conftest.reference_file(REF_SPM),
                    reason='reference fixture not available')
class TestReferenceModelCompatibility:
  """Our parser+Viterbi must reproduce the C++ sentencepiece golden ids from
  the reference test suite (reference videoprism/tokenizers_test.py:57-73)."""

  def test_reference_goldens(self):
    t = SentencePieceTokenizer(REF_SPM)
    assert t.vocab_size == 1000
    bos, eos = t.bos_token, t.eos_token
    assert (bos, eos) == (1, 2)
    assert t.to_int('blah') == [80, 180, 60]
    assert t.to_int('blah', bos=True) == [bos, 80, 180, 60]
    assert t.to_int('blah', eos=True) == [80, 180, 60, eos]
    assert t.to_int('blah', bos=True, eos=True) == [bos, 80, 180, 60, eos]
    assert t.to_int(['blah', 'blah blah']) == (
        [[80, 180, 60], [80, 180, 60, 80, 180, 60]])

  def test_reference_model_decode(self):
    t = SentencePieceTokenizer(REF_SPM)
    assert t.decode([80, 180, 60]) == 'blah'


class TestTokenizeTextsFlags:

  def test_add_bos_and_canonicalize_flags(self, fixture_model_path):
    t = SentencePieceTokenizer(fixture_model_path)
    # add_bos=False suppresses the bos even though bos_token >= 0.
    ids, _ = tokenize_texts(t, ['hello'], max_length=4, add_bos=False)
    assert ids[0][0] != 1
    # canonicalize=False skips lowercasing/punctuation/period append:
    # 'hello' has no trailing '.' piece then.
    ids_canon, _ = tokenize_texts(t, ['hello'], max_length=4)
    ids_raw, _ = tokenize_texts(t, ['hello'], max_length=4,
                                canonicalize=False)
    assert 13 in ids_canon[0]      # '.' piece from canonicalization
    assert 13 not in ids_raw[0]
