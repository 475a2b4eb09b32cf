"""Goldens over the repo's own bundled assets (videoprism_tpu/assets/).

These make the framework self-contained: unlike the reference-checkout
compatibility tests (which skip when /root/reference is absent), these
goldens always run.  The assets are generated deterministically by
scripts/make_assets.py; the constants here are tied to the committed
bytes — regenerate assets and goldens together, in one commit.

Fills the role of reference videoprism/models_test.py:93-116 (bundled
fixture golden ids) and the bundled demo mp4 (videoprism/assets/).
"""

import os

import numpy as np
import pytest

from videoprism_tpu import assets
from videoprism_tpu.io import video as video_lib
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
from videoprism_tpu.models import tokenize_texts


@pytest.fixture(scope='module')
def tok():
  return SentencePieceTokenizer(assets.test_spm_path())


class TestBundledTokenizerFixture:

  def test_files_committed(self):
    assert os.path.exists(assets.test_spm_path())
    assert os.path.exists(assets.demo_video_path())

  def test_properties(self, tok):
    assert tok.vocab_size == 1000
    assert (tok.bos_token, tok.eos_token, tok.pad_token) == (1, 2, -1)

  def test_golden_ids(self, tok):
    assert tok.to_int('hello world.') == [277, 645, 710, 425, 752]
    assert tok.to_int('the model encodes video frames') == \
        [260, 517, 523, 617, 516, 518, 617]
    assert tok.to_int('attention is all you need!') == \
        [530, 266, 295, 291, 471, 756]
    assert tok.to_int('') == []
    assert tok.to_int('hello world.', bos=True, eos=True) == \
        [1, 277, 645, 710, 425, 752, 2]

  def test_byte_fallback_golden(self, tok):
    # 'é' = UTF-8 C3 A9 -> byte pieces 3+0xC3, 3+0xA9;
    # '雪' = UTF-8 E9 9B AA.
    assert tok.to_int('café 雪') == [688, 807, 198, 172, 259, 236, 158, 173]

  def test_decode_roundtrip(self, tok):
    s = 'the model encodes video frames'
    assert tok.decode(tok.to_int(s)) == s

  def test_tokenize_texts_golden(self, tok):
    ids, pad = tokenize_texts(
        tok, ['The model encodes Video FRAMES!'], max_length=12)
    np.testing.assert_array_equal(
        ids, [[1, 260, 517, 523, 617, 516, 518, 617, 752, 0, 0, 0]])
    np.testing.assert_array_equal(
        pad, [[0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1]])


def _bar_pos(frame):
  """x-position (0..1) of the dark frame-index marker in the top bar."""
  row = frame[2]
  dark = np.where(row.mean(-1) < 0.3)[0]
  assert len(dark), 'marker not found'
  return float(dark.mean()) / frame.shape[1]


class TestBundledDemoVideo:

  def test_cv2_load_semantics(self):
    clip = video_lib.load_video(assets.demo_video_path(), num_frames=16)
    assert clip.shape == (16, 288, 288, 3)
    assert clip.dtype == np.float32
    assert 0.0 <= clip.min() and clip.max() <= 1.0

  def test_uniform_sampling_via_index_bar(self):
    """The baked-in position bar encodes the source frame index; uniform
    16-of-48 sampling must land markers on a near-linear ramp."""
    clip = video_lib.load_video(assets.demo_video_path(), num_frames=16)
    pos = np.array([_bar_pos(f) for f in clip])
    assert (np.diff(pos) > 0).all(), pos
    expected = np.linspace(pos[0], pos[-1], 16)
    assert np.abs(pos - expected).max() < 0.05, pos

  def test_native_decoder_reads_it(self):
    from videoprism_tpu import native

    try:
      dec = native.NativeVideoDecoder(assets.demo_video_path())
    except Exception:
      pytest.skip('native decoder unavailable on this host')
    try:
      assert (dec.num_frames, dec.width, dec.height) == (48, 192, 192)
      out = dec.sample(
          np.linspace(0, 47, 16).round().astype(int), 192)
      assert out.shape == (16, 192, 192, 3) and out.dtype == np.uint8
    finally:
      dec.close()
