"""Minimal protobuf wire-format primitives (proto3 subset).

The reference decodes protobuf with the Rust ``protobuf`` crate
(event_handler.rs:119-125, ``unpack_data``). This container has no protoc
and no network to fetch the spark-protobuf jar, so the engine ships a
hand-rolled, descriptor-driven codec for the fixed message set in
:mod:`.messages` — standard varint + length-delimited encoding, nothing
project-specific. Only the wire types the SDS schemas use are implemented:
VARINT (0) for uint64/enum and LEN (2) for string/bytes/sub-message.
"""

from __future__ import annotations


def encode_varint(value: int) -> bytes:
    if value < 0:
        raise ValueError("negative varint not supported (schemas use uint64)")
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            # keep the codec's error taxonomy: malformed input must raise
            # ValueError (classifiable -> W5 quarantine), never IndexError
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            # varints are 64-bit: the 10th byte of a max-length encoding
            # contributes one bit, so an unmasked result can reach 2^70-1;
            # protobuf parsers truncate to the low 64 bits
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def encode_tag(field_number: int, wire_type: int) -> bytes:
    return encode_varint((field_number << 3) | wire_type)


def encode_len_delimited(field_number: int, payload: bytes) -> bytes:
    return encode_tag(field_number, 2) + encode_varint(len(payload)) + payload


def encode_varint_field(field_number: int, value: int) -> bytes:
    return encode_tag(field_number, 0) + encode_varint(value)


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) triples; value is int for
    VARINT and bytes for LEN. Unknown wire types are skipped where possible
    (I64=1, I32=5), matching protobuf's unknown-field tolerance."""
    pos = 0
    n = len(buf)
    while pos < n:
        # single-byte fast path: tags and small lengths dominate real
        # streams; the full varint loop only runs on continuation bytes
        b = buf[pos]
        if b < 0x80:
            tag, pos = b, pos + 1
        else:
            tag, pos = decode_varint(buf, pos)
        field_number, wire_type = tag >> 3, tag & 0x07
        if field_number == 0:
            # the spec reserves field number 0; accepting it would let
            # zero-filled/corrupt buffers "decode" to all-defaults instead
            # of raising the classifiable ValueError (W5 quarantine)
            raise ValueError("field number 0 is invalid")
        if wire_type == 0:
            if pos < n and buf[pos] < 0x80:
                value, pos = buf[pos], pos + 1
            else:
                value, pos = decode_varint(buf, pos)
        elif wire_type == 2:
            if pos < n and buf[pos] < 0x80:
                length, pos = buf[pos], pos + 1
            else:
                length, pos = decode_varint(buf, pos)
            value = buf[pos : pos + length]
            if len(value) != length:
                raise ValueError("truncated length-delimited field")
            pos += length
        elif wire_type == 1:
            value = buf[pos : pos + 8]
            if len(value) != 8:
                raise ValueError("truncated i64 field")
            pos += 8
        elif wire_type == 5:
            value = buf[pos : pos + 4]
            if len(value) != 4:
                raise ValueError("truncated i32 field")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
        yield field_number, wire_type, value
