"""Native (C++) tokenizer core vs the pure-Python oracle."""

import os
import random
import string

import pytest

from tests import conftest

from videoprism_tpu.io.tokenizers import SentencePieceTokenizer

REF_SPM = '/root/reference/videoprism/assets/testdata/test_spm.model'

pytestmark = pytest.mark.skipif(
    not conftest.reference_file(REF_SPM),
    reason='reference fixture not available')


@pytest.fixture(scope='module')
def tokenizers():
  native = SentencePieceTokenizer(REF_SPM, use_native=True)
  python = SentencePieceTokenizer(REF_SPM, use_native=False)
  if native._native is None:
    pytest.skip('native tokenizer library unavailable (no g++?)')
  return native, python


class TestNativeTokenizer:

  def test_goldens(self, tokenizers):
    native, _ = tokenizers
    assert native.to_int('blah') == [80, 180, 60]
    assert native.to_int('blah', bos=True, eos=True) == [1, 80, 180, 60, 2]

  def test_matches_python_on_random_texts(self, tokenizers):
    native, python = tokenizers
    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + ' .,!?-🎬日本語'
    for _ in range(300):
      text = ''.join(
          rng.choices(alphabet, k=rng.randint(0, 150)))
      assert native.encode(text) == python.encode(text), text

  def test_oov_and_edge_cases(self, tokenizers):
    native, python = tokenizers
    for text in ('', ' ', 'ÿ€', 'ß' * 50, 'a' * 5000):
      assert native.encode(text) == python.encode(text), repr(text)

  def test_env_var_disables(self, monkeypatch):
    monkeypatch.setenv('VIDEOPRISM_NATIVE_TOKENIZER', '0')
    tok = SentencePieceTokenizer(REF_SPM)
    assert tok._native is None
    assert tok.to_int('blah') == [80, 180, 60]
