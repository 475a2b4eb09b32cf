"""Minimal SentencePiece ``model.proto`` reader/writer (no protobuf dep).

The reference consumes SentencePiece through the C++ ``sentencepiece`` wheel
(reference videoprism/tokenizers.py:26,99-100).  This TPU stack has no such
dependency: we parse the serialized ``ModelProto`` directly from the protobuf
wire format and run our own unigram/BPE segmenter
(:mod:`videoprism_tpu.io.tokenizers`).

Only the fields needed for inference-time tokenization are decoded:

  ModelProto:      pieces = 1 (repeated SentencePiece),
                   trainer_spec = 2, normalizer_spec = 3
  SentencePiece:   piece = 1 (string), score = 2 (float),
                   type = 3 (enum: NORMAL=1, UNKNOWN=2, CONTROL=3,
                   USER_DEFINED=4, UNUSED=5, BYTE=6)
  TrainerSpec:     model_type = 3 (UNIGRAM=1, BPE=2, WORD=3, CHAR=4),
                   byte_fallback = 35,
                   unk_id = 40, bos_id = 41, eos_id = 42, pad_id = 43
  NormalizerSpec:  name = 1, add_dummy_prefix = 3,
                   remove_extra_whitespaces = 4, escape_whitespaces = 5

The writer emits the same subset, which is enough for self-contained test
fixtures (the reference ships a binary fixture it cannot regenerate; ours is
built programmatically in the test suite).
"""

from __future__ import annotations

import dataclasses
import struct

# SentencePiece.Type values.
NORMAL = 1
UNKNOWN = 2
CONTROL = 3
USER_DEFINED = 4
UNUSED = 5
BYTE = 6

# TrainerSpec.ModelType values.
UNIGRAM = 1
BPE = 2
WORD = 3
CHAR = 4


@dataclasses.dataclass
class Piece:
  piece: str
  score: float = 0.0
  type: int = NORMAL


@dataclasses.dataclass
class SpmModel:
  """The decoded subset of a SentencePiece ModelProto."""

  pieces: list[Piece]
  model_type: int = UNIGRAM
  byte_fallback: bool = False
  unk_id: int = 0
  bos_id: int = 1
  eos_id: int = 2
  pad_id: int = -1
  add_dummy_prefix: bool = True
  remove_extra_whitespaces: bool = True
  escape_whitespaces: bool = True
  normalizer_name: str = ''


# --------------------------- wire-format reader ---------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
  result = 0
  shift = 0
  while True:
    b = data[pos]
    pos += 1
    result |= (b & 0x7F) << shift
    if not b & 0x80:
      return result, pos
    shift += 7
    if shift > 63:
      raise ValueError('varint too long')


def _iter_fields(data: bytes):
  """Yields (field_number, wire_type, value) over one message's bytes."""
  pos = 0
  n = len(data)
  while pos < n:
    key, pos = _read_varint(data, pos)
    field, wire = key >> 3, key & 0x7
    if wire == 0:  # varint
      value, pos = _read_varint(data, pos)
    elif wire == 1:  # fixed64
      value = data[pos:pos + 8]
      pos += 8
    elif wire == 2:  # length-delimited
      length, pos = _read_varint(data, pos)
      value = data[pos:pos + length]
      pos += length
    elif wire == 5:  # fixed32
      value = data[pos:pos + 4]
      pos += 4
    else:
      raise ValueError(f'Unsupported wire type {wire} for field {field}')
    yield field, wire, value


def _parse_piece(data: bytes) -> Piece:
  piece = Piece(piece='')
  for field, wire, value in _iter_fields(data):
    if field == 1:
      piece.piece = value.decode('utf-8')
    elif field == 2:
      piece.score = struct.unpack('<f', value)[0]
    elif field == 3:
      piece.type = value
  return piece


def _signed(value: int) -> int:
  """int32 varints are sign-extended to 64 bits on the wire."""
  if value >= 1 << 63:
    value -= 1 << 64
  return value


def parse_model(data: bytes) -> SpmModel:
  """Decodes a serialized SentencePiece ModelProto."""
  model = SpmModel(pieces=[])
  for field, wire, value in _iter_fields(data):
    if field == 1:  # pieces
      model.pieces.append(_parse_piece(value))
    elif field == 2:  # trainer_spec
      for f2, w2, v2 in _iter_fields(value):
        if f2 == 3:
          model.model_type = v2
        elif f2 == 35:
          model.byte_fallback = bool(v2)
        elif f2 == 40:
          model.unk_id = _signed(v2)
        elif f2 == 41:
          model.bos_id = _signed(v2)
        elif f2 == 42:
          model.eos_id = _signed(v2)
        elif f2 == 43:
          model.pad_id = _signed(v2)
    elif field == 3:  # normalizer_spec
      for f3, w3, v3 in _iter_fields(value):
        if f3 == 1:
          model.normalizer_name = v3.decode('utf-8')
        elif f3 == 3:
          model.add_dummy_prefix = bool(v3)
        elif f3 == 4:
          model.remove_extra_whitespaces = bool(v3)
        elif f3 == 5:
          model.escape_whitespaces = bool(v3)
  return model


def load_model(path: str) -> SpmModel:
  with open(path, 'rb') as f:
    return parse_model(f.read())


# --------------------------- wire-format writer ---------------------------


def _varint(value: int) -> bytes:
  if value < 0:
    value += 1 << 64  # sign-extend like protobuf int32/int64
  out = bytearray()
  while True:
    b = value & 0x7F
    value >>= 7
    if value:
      out.append(b | 0x80)
    else:
      out.append(b)
      return bytes(out)


def _field(number: int, wire: int) -> bytes:
  return _varint((number << 3) | wire)


def _len_delimited(number: int, payload: bytes) -> bytes:
  return _field(number, 2) + _varint(len(payload)) + payload


def _serialize_piece(p: Piece) -> bytes:
  out = _len_delimited(1, p.piece.encode('utf-8'))
  out += _field(2, 5) + struct.pack('<f', p.score)
  out += _field(3, 0) + _varint(p.type)
  return out


def serialize_model(model: SpmModel) -> bytes:
  out = b''
  for p in model.pieces:
    out += _len_delimited(1, _serialize_piece(p))
  trainer = (
      _field(3, 0) + _varint(model.model_type)
      + _field(35, 0) + _varint(int(model.byte_fallback))
      + _field(40, 0) + _varint(model.unk_id)
      + _field(41, 0) + _varint(model.bos_id)
      + _field(42, 0) + _varint(model.eos_id)
      + _field(43, 0) + _varint(model.pad_id)
  )
  out += _len_delimited(2, trainer)
  normalizer = (
      _len_delimited(1, model.normalizer_name.encode('utf-8'))
      + _field(3, 0) + _varint(int(model.add_dummy_prefix))
      + _field(4, 0) + _varint(int(model.remove_extra_whitespaces))
      + _field(5, 0) + _varint(int(model.escape_whitespaces))
  )
  out += _len_delimited(3, normalizer)
  return out


def save_model(path: str, model: SpmModel) -> None:
  with open(path, 'wb') as f:
    f.write(serialize_model(model))
