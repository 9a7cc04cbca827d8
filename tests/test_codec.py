"""Round-trip and default-semantics tests for the protobuf wire codec."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from consensource_sds_spark.codec import decode_message, encode_message
from consensource_sds_spark.codec.wire import decode_varint, encode_varint
from consensource_sds_spark.sources import fixtures as fx


@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_varint_roundtrip(n):
    buf = encode_varint(n)
    out, pos = decode_varint(buf, 0)
    assert out == n and pos == len(buf)


def test_truncated_input_raises_value_error():
    """Malformed payloads must fail with the codec's ValueError taxonomy
    (classifiable -> W5 quarantine), never a bare IndexError."""
    import pytest

    from consensource_sds_spark.codec.wire import iter_fields

    with pytest.raises(ValueError):
        decode_varint(b"\x80\x80", 0)  # continuation bit set, buffer ends
    with pytest.raises(ValueError):
        decode_varint(b"", 0)
    # tag says length-delimited of 100 bytes, payload shorter
    with pytest.raises(ValueError):
        list(iter_fields(b"\x0a\x64abc"))


def test_varint_ten_byte_encoding_masked_to_64_bits():
    """Max-length (10-byte) varints carry up to 70 payload bits; parsers
    truncate to the low 64. Without the mask, a hostile 10th byte yields an
    oversized Python int that overflows Arrow's LongType conversion."""
    # bits 0..62 from nine 0xff bytes, bit 63 from the final 0x01
    out, pos = decode_varint(b"\xff" * 9 + b"\x01", 0)
    assert out == 2**64 - 1 and pos == 10
    # excess bits in the 10th byte are dropped, not kept
    out, _ = decode_varint(b"\xff" * 9 + b"\x7f", 0)
    assert out == 2**64 - 1


def test_field_number_zero_rejected():
    """The spec reserves field number 0: zero-filled buffers must raise the
    classifiable ValueError, not silently decode to all-defaults (which
    would drop a corrupt StateChange with no quarantine row)."""
    import pytest

    from consensource_sds_spark.codec.wire import iter_fields

    with pytest.raises(ValueError):
        list(iter_fields(b"\x00\x00"))
    with pytest.raises(ValueError):
        decode_message("Agent", b"\x00\x00")


def test_u64_high_range_wraps_to_i64():
    """u64 values in [2^63, 2^64) — e.g. a 'never expires' sentinel — decode
    to their two's-complement i64 view (matching the JVM backend's
    cast('long') and Spark's LongType) and round-trip back to the same
    wire bytes."""
    from consensource_sds_spark.codec import wire

    buf = wire.encode_varint_field(4, 2**64 - 1) + wire.encode_varint_field(5, 2**63)
    out = decode_message("Accreditation", buf)
    assert out["valid_from"] == -1
    assert out["valid_to"] == -(2**63)
    assert encode_message("Accreditation", out) == buf


def test_unknown_enum_number_clamps_to_zero_value():
    """Enum numbers outside the declared domain (newer proto, corruption)
    clamp to the zero value name — including 64-bit varints, which first
    narrow to int32 as protobuf-java does."""
    from consensource_sds_spark.codec import wire

    for n in (99, 2**32 + 99, 2**64 - 1):
        buf = wire.encode_varint_field(4, n)  # Request.status
        assert decode_message("Request", buf)["status"] == "UNSET_STATUS"
    # int32 narrowing happens BEFORE the domain check (protobuf-java
    # semantics): 2^33+1 narrows to 1, which IS in domain
    assert decode_message("Request", wire.encode_varint_field(4, 2**33 + 1))["status"] == "OPEN"
    # enums_as_number view stays within int32 (Arrow-safe)
    v = decode_message("Request", wire.encode_varint_field(4, 2**64 - 1), enums_as_number=True)["status"]
    assert -(2**31) <= v < 2**31


def test_agent_roundtrip():
    a = fx.make_agent()
    out = decode_message("Agent", encode_message("Agent", a))
    assert out == {"public_key": "test_public_key", "organization_id": "test_org", "name": "test", "timestamp": 1}


def test_proto3_defaults_on_empty():
    out = decode_message("Agent", b"")
    assert out == {"public_key": "", "organization_id": "", "name": "", "timestamp": 0}


def test_enum_as_number_and_name():
    r = fx.make_request()
    enc = encode_message("Request", r)
    assert decode_message("Request", enc)["status"] == "OPEN"
    assert decode_message("Request", enc, enums_as_number=True)["status"] == 1


def test_organization_nested_roundtrip():
    org = fx.make_certifying_body()
    out = decode_message("Organization", encode_message("Organization", org))
    assert out["id"] == "test_cert_org"
    assert out["organization_type"] == "CERTIFYING_BODY"
    assert out["certifying_body_details"]["accreditations"][0]["valid_to"] == 2
    assert out["factory_details"] is None
    assert out["authorizations"] == [{"public_key": "test_public_key", "role": "ADMIN"}]


def test_container_and_state_change_list_roundtrip():
    sc = fx.state_change("agent", "k1", [fx.make_agent()])
    enc = encode_message("StateChangeList", {"state_changes": [sc]})
    out = decode_message("StateChangeList", enc)
    change = out["state_changes"][0]
    assert change["address"] == sc["address"]
    assert change["change_type"] == "SET"
    inner = decode_message("AgentContainer", change["value"])
    assert inner["entries"][0]["public_key"] == "test_public_key"


def test_delete_state_change_defaults():
    sc = fx.state_change("assertion", "a1", None, change_type="DELETE")
    enc = encode_message("StateChangeList", {"state_changes": [sc]})
    out = decode_message("StateChangeList", enc)["state_changes"][0]
    assert out["change_type"] == "DELETE"
    assert out["value"] == b""


@settings(max_examples=50)
@given(
    st.text(max_size=30),
    st.text(max_size=30),
    st.integers(min_value=0, max_value=2**63 - 1),
)
def test_agent_property_roundtrip(pk, name, ts):
    a = {"public_key": pk, "organization_id": "", "name": name, "timestamp": ts}
    assert decode_message("Agent", encode_message("Agent", a)) == a


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_arbitrary_bytes_never_escape_value_error(buf):
    """Fuzz the quarantine taxonomy: any byte string either decodes to a
    dict or raises ValueError — never IndexError/KeyError/OverflowError
    (those would surface as opaque Python-worker crashes inside the Arrow
    decode UDF instead of classifiable W5 dead-letter rows)."""
    try:
        out = decode_message("Agent", buf)
        assert isinstance(out, dict)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_mutated_valid_message_never_escapes_value_error(data):
    """Bit-flip / truncation fuzz over a structurally valid message."""
    a = {"public_key": "pk", "organization_id": "org", "name": "n", "timestamp": 7}
    buf = bytearray(encode_message("Agent", a))
    cut = data.draw(st.integers(min_value=0, max_value=len(buf)))
    flip = data.draw(st.integers(min_value=0, max_value=max(0, len(buf) - 1)))
    mutated = buf[:flip] + bytes([buf[flip] ^ data.draw(st.integers(1, 255))]) + buf[flip + 1 :]
    for payload in (bytes(buf[:cut]), bytes(mutated)):
        try:
            out = decode_message("Agent", payload)
            assert isinstance(out, dict)
        except ValueError:
            pass


def test_duplicated_singular_message_field_merges_like_protobuf():
    """Regression (r9 review): a legal wire encoding may emit a singular
    sub-message field in multiple chunks; the spec (and protobuf-java,
    the JVM backend) MERGES them — parsing the concatenated chunk bytes.
    Last-wins replacement dropped the first chunk's repeated entries."""
    from consensource_sds_spark.codec.wire import encode_len_delimited

    a = encode_message("Accreditation", {"standard_id": "a"})
    b = encode_message("Accreditation", {"standard_id": "b"})
    # Organization field 6 = certifying_body_details (CertifyingBody,
    # whose field 1 is repeated accreditations); emit it twice
    chunk1 = encode_len_delimited(6, encode_len_delimited(1, a))
    chunk2 = encode_len_delimited(6, encode_len_delimited(1, b))
    decoded = decode_message("Organization", bytes(chunk1 + chunk2))
    accs = decoded["certifying_body_details"]["accreditations"]
    assert [x["standard_id"] for x in accs] == ["a", "b"]


def test_wire_type_mismatch_skips_like_unknown_field():
    """Regression (r9 review): protobuf-java (the JVM backend) and the
    reference's rust codegen both file a known field number carrying the
    WRONG wire type under unknown fields and keep parsing. Raising made
    the same bytes crash one backend and decode on the other."""
    from consensource_sds_spark.codec.wire import encode_varint_field

    # Agent field 1 (public_key) is LEN; send it as a varint, followed by
    # a well-formed name field — the name must still decode
    buf = encode_varint_field(1, 7) + encode_message("Agent", {"name": "n"})
    decoded = decode_message("Agent", bytes(buf))
    assert decoded["public_key"] == ""  # skipped -> proto3 default
    assert decoded["name"] == "n"


def test_negative_enum_roundtrips_through_encode():
    """Regression (r9 review): the decoder deliberately wraps hostile
    enum wire values to signed int32; re-encoding that decoded dict
    (fixture regeneration, quarantine replay) must produce the 64-bit
    two's-complement varint protobuf uses, not raise."""
    from consensource_sds_spark.codec.wire import encode_varint_field

    hostile = encode_varint_field(3, 0xFFFFFFFFFFFFFFFF)  # change_type = -1
    decoded = decode_message("StateChange", bytes(hostile), enums_as_number=True)
    assert decoded["change_type"] == -1
    re_encoded = encode_message("StateChange", decoded)
    assert decode_message("StateChange", re_encoded, enums_as_number=True)["change_type"] == -1
