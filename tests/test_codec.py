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
