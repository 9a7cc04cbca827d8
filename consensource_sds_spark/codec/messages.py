"""Descriptor-driven encode/decode for the SDS message set.

Message shapes and enum domains mirror exactly what the reference reads
(/root/reference/src/event_handler.rs:209-437; envelope :41-111; containers
transformer.rs:3-41). Field numbers for the Sawtooth envelope messages follow
the public sawtooth-core protos (events.proto, transaction_receipt.proto);
entity field numbers follow declaration order of the field lists in
SURVEY.md §1.1 (the consensource-common protos are not vendored in the
reference, so the numbering is this package's own — used consistently by
both encoder and decoder).

Decoded values are plain Python dicts shaped like the StructTypes in
:mod:`consensource_sds_spark.schemas`; enums decode to their NAME strings.
"""

from __future__ import annotations

from consensource_sds_spark.codec import wire

# enum name tables (proto3: first value = 0 default)
ENUMS: dict[str, list[str]] = {
    "OrganizationType": ["UNSET_TYPE", "CERTIFYING_BODY", "STANDARDS_BODY", "FACTORY", "INGESTION"],
    "Role": ["UNSET_ROLE", "ADMIN", "TRANSACTOR"],
    "RequestStatus": ["UNSET_STATUS", "OPEN", "IN_PROGRESS", "CLOSED", "CERTIFIED", "PRE_CERTIFIED"],
    "AssertionType": ["UNSET_TYPE", "STANDARD", "CERTIFICATE", "FACTORY"],
    # sawtooth transaction_receipt.proto StateChange.Type
    "StateChangeType": ["TYPE_UNSET", "SET", "DELETE"],
    # sawtooth client_event.proto (public sawtooth-core)
    "FilterType": ["FILTER_TYPE_UNSET", "SIMPLE_ANY", "SIMPLE_ALL", "REGEX_ANY", "REGEX_ALL"],
    "SubscribeStatus": ["STATUS_UNSET", "OK", "INVALID_FILTER", "UNKNOWN_BLOCK"],
    "UnsubscribeStatus": ["STATUS_UNSET", "OK", "INTERNAL_ERROR"],
}

# field kind vocabulary: "string" | "bytes" | "uint64" | "enum:<E>"
# | "msg:<M>" | "rep:<M>" (repeated message) | "rep_string" (repeated string)
MESSAGES: dict[str, dict[int, tuple[str, str]]] = {
    # --- Sawtooth envelope (public sawtooth-core field numbers) ---
    "Attribute": {1: ("key", "string"), 2: ("value", "string")},
    "Event": {1: ("event_type", "string"), 2: ("attributes", "rep:Attribute"), 3: ("data", "bytes")},
    "EventList": {1: ("events", "rep:Event")},
    "StateChange": {1: ("address", "string"), 2: ("value", "bytes"), 3: ("change_type", "enum:StateChangeType")},
    "StateChangeList": {1: ("state_changes", "rep:StateChange")},
    # --- Sawtooth subscription protocol (public client_event.proto;
    # built/consumed by the reference at subscriber.rs:58-106, 180-223) ---
    "EventFilter": {
        1: ("key", "string"),
        2: ("match_string", "string"),
        3: ("filter_type", "enum:FilterType"),
    },
    "EventSubscription": {1: ("event_type", "string"), 2: ("filters", "rep:EventFilter")},
    "ClientEventsSubscribeRequest": {
        1: ("subscriptions", "rep:EventSubscription"),
        2: ("last_known_block_ids", "rep_string"),
    },
    "ClientEventsSubscribeResponse": {
        1: ("status", "enum:SubscribeStatus"),
        2: ("response_message", "string"),
    },
    "ClientEventsUnsubscribeRequest": {},
    "ClientEventsUnsubscribeResponse": {1: ("status", "enum:UnsubscribeStatus")},
    # --- certificate_registry entities (SURVEY §1.1 field lists) ---
    "OrgContact": {1: ("name", "string"), 2: ("phone_number", "string"), 3: ("language_code", "string")},
    "OrgAuthorization": {1: ("public_key", "string"), 2: ("role", "enum:Role")},
    "Accreditation": {
        1: ("standard_id", "string"),
        2: ("standard_version", "string"),
        3: ("accreditor_id", "string"),
        4: ("valid_from", "uint64"),
        5: ("valid_to", "uint64"),
    },
    "CertifyingBody": {1: ("accreditations", "rep:Accreditation")},
    "FactoryAddress": {
        1: ("street_line_1", "string"),
        2: ("street_line_2", "string"),
        3: ("city", "string"),
        4: ("state_province", "string"),
        5: ("country", "string"),
        6: ("postal_code", "string"),
    },
    "Factory": {1: ("address", "msg:FactoryAddress")},
    "Organization": {
        1: ("id", "string"),
        2: ("name", "string"),
        3: ("organization_type", "enum:OrganizationType"),
        4: ("contacts", "rep:OrgContact"),
        5: ("authorizations", "rep:OrgAuthorization"),
        6: ("certifying_body_details", "msg:CertifyingBody"),
        7: ("factory_details", "msg:Factory"),
    },
    "Agent": {
        1: ("public_key", "string"),
        2: ("organization_id", "string"),
        3: ("name", "string"),
        4: ("timestamp", "uint64"),
    },
    "Certificate": {
        1: ("id", "string"),
        2: ("certifying_body_id", "string"),
        3: ("factory_id", "string"),
        4: ("standard_id", "string"),
        5: ("standard_version", "string"),
        6: ("valid_from", "uint64"),
        7: ("valid_to", "uint64"),
    },
    "Request": {
        1: ("id", "string"),
        2: ("factory_id", "string"),
        3: ("standard_id", "string"),
        4: ("status", "enum:RequestStatus"),
        5: ("request_date", "uint64"),
    },
    "StandardVersion": {
        1: ("version", "string"),
        2: ("link", "string"),
        3: ("description", "string"),
        4: ("approval_date", "uint64"),
    },
    "Standard": {
        1: ("id", "string"),
        2: ("organization_id", "string"),
        3: ("name", "string"),
        4: ("versions", "rep:StandardVersion"),
    },
    "Assertion": {
        1: ("id", "string"),
        2: ("address", "string"),
        3: ("assertor_pub_key", "string"),
        4: ("assertion_type", "enum:AssertionType"),
        5: ("object_id", "string"),
        6: ("data_id", "string"),
    },
}

# entity containers: trivial {entries: [T]} wrappers (transformer.rs:3-27;
# instantiated via containerize! at event_handler.rs:205-208, 330, 347, 364,
# 386, 415)
for _entity in ("Organization", "Agent", "Certificate", "Request", "Standard", "Assertion"):
    MESSAGES[f"{_entity}Container"] = {1: ("entries", f"rep:{_entity}")}


def encode_message(name: str, obj: dict) -> bytes:
    """proto3 encoding: default-valued scalar fields are omitted."""
    desc = MESSAGES[name]
    out = bytearray()
    for fnum in sorted(desc):
        fname, kind = desc[fnum]
        val = obj.get(fname)
        if val is None:
            continue
        if kind == "string":
            if val != "":
                out += wire.encode_len_delimited(fnum, val.encode("utf-8"))
        elif kind == "bytes":
            if val != b"":
                out += wire.encode_len_delimited(fnum, bytes(val))
        elif kind == "uint64":
            # negative ints are the i64 view of a u64 >= 2^63 (the decode
            # side wraps, matching Spark's LongType) — wrap back for the wire
            v = int(val)
            if v < 0:
                v += 0x10000000000000000
            if v != 0:
                out += wire.encode_varint_field(fnum, v)
        elif kind.startswith("enum:"):
            num = val if isinstance(val, int) else ENUMS[kind[5:]].index(val)
            # the decode side wraps hostile enum values to signed int32;
            # protobuf encodes a negative enum as its 64-bit
            # two's-complement (10-byte) varint — wrap back like the
            # uint64 branch so decode->encode round-trips
            if num < 0:
                num += 0x10000000000000000
            if num != 0:
                out += wire.encode_varint_field(fnum, num)
        elif kind.startswith("msg:"):
            out += wire.encode_len_delimited(fnum, encode_message(kind[4:], val))
        elif kind.startswith("rep:"):
            for item in val:
                out += wire.encode_len_delimited(fnum, encode_message(kind[4:], item))
        elif kind == "rep_string":
            for item in val:
                out += wire.encode_len_delimited(fnum, item.encode("utf-8"))
        else:  # pragma: no cover
            raise ValueError(f"unknown kind {kind}")
    return bytes(out)


# decode dispatch: integer kind tags + per-(message, enum-mode) compiled
# descriptors. decode_message runs per wire message inside the Arrow UDF —
# the per-call dictcomp + str.startswith dispatch of the naive form was
# ~35% of ingest decode time (profiled), all of it hoistable to one
# compile per message type per process.
_K_STRING, _K_BYTES, _K_U64, _K_ENUM, _K_MSG, _K_REP, _K_REPSTR = range(7)

#: (name, enums_as_number) -> (default_template, rep_field_names, fields)
#: where fields maps fnum -> (fname, ktag, extra, expected_wire_type, kind)
_COMPILED: dict = {}


def _compile(name: str, enums_as_number: bool):
    desc = MESSAGES[name]
    template: dict = {}
    reps: list[str] = []
    fields: dict = {}
    for fnum, (fname, kind) in desc.items():
        extra = None
        if kind == "string":
            ktag, wt, dflt = _K_STRING, 2, ""
        elif kind == "bytes":
            ktag, wt, dflt = _K_BYTES, 2, b""
        elif kind == "uint64":
            ktag, wt, dflt = _K_U64, 0, 0
        elif kind.startswith("enum:"):
            extra = ENUMS[kind[5:]]
            ktag, wt, dflt = _K_ENUM, 0, (0 if enums_as_number else extra[0])
        elif kind.startswith("msg:"):
            ktag, wt, dflt, extra = _K_MSG, 2, None, kind[4:]
        elif kind.startswith("rep:"):
            ktag, wt, dflt, extra = _K_REP, 2, None, kind[4:]
            reps.append(fname)
        else:  # rep_string
            ktag, wt, dflt = _K_REPSTR, 2, None
            reps.append(fname)
        template[fname] = dflt
        fields[fnum] = (fname, ktag, extra, wt, kind)
    return template, tuple(reps), fields


def decode_message(name: str, buf: bytes, enums_as_number: bool = False) -> dict:
    """Decode to a dict with every declared field present (proto3 defaults),
    mirroring the Rust codegen's getter semantics (get_* returns defaults).

    ``enums_as_number=True`` leaves enum fields as their wire numbers — the
    Spark pipeline decodes them JVM-side (CASE WHEN, operator P3)."""
    key = (name, enums_as_number)
    comp = _COMPILED.get(key)
    if comp is None:
        comp = _COMPILED[key] = _compile(name, enums_as_number)
    template, reps, fields = comp
    obj = template.copy()
    for fname in reps:  # lists are the one mutable default: fresh per call
        obj[fname] = []
    if not isinstance(buf, bytes):
        buf = bytes(buf)
    # singular sub-message chunks accumulate and decode ONCE after the
    # scan: a legally re-emitted singular message field MERGES per the
    # proto spec (protobuf-java parses later chunks into the same
    # builder), and parsing the concatenated chunk bytes is exactly that
    # merge — last-wins dict replacement dropped the first chunk's
    # repeated entries (backend divergence, r9 review)
    msg_chunks: dict = {}
    for fnum, wt, raw in wire.iter_fields(buf):
        f = fields.get(fnum)
        if f is None:
            continue  # unknown-field tolerance
        fname, ktag, extra, expect_wt, kind = f
        # wire-type/kind disagreement: protobuf-java (the JVM backend) and
        # the reference's rust codegen both file such tags under UNKNOWN
        # fields and keep parsing — raising here would make the same bytes
        # crash one backend and decode on the other. The value was already
        # length-validated by iter_fields, so skipping is safe; truly
        # unparseable buffers (bad varints, truncation) still raise there.
        if wt != expect_wt:
            continue
        if ktag == _K_STRING:
            obj[fname] = raw.decode("utf-8")
        elif ktag == _K_REP:
            obj[fname].append(decode_message(extra, raw, enums_as_number))
        elif ktag == _K_U64:
            # u64 in [2^63, 2^64) -> two's-complement i64, matching the JVM
            # backend's cast("long"); an unwrapped Python int would overflow
            # the Arrow LongType conversion (opaque worker crash, not a
            # classifiable ValueError)
            obj[fname] = raw - 0x10000000000000000 if raw >= 0x8000000000000000 else raw
        elif ktag == _K_ENUM:
            # enum wire values are int32 (protobuf-java narrows the varint);
            # wrap so hostile 64-bit payloads can't overflow Arrow or index
            # the name table out of range
            v = raw & 0xFFFFFFFF
            if v >= 0x80000000:
                v -= 0x100000000
            if enums_as_number:
                obj[fname] = v
            else:
                obj[fname] = extra[v] if 0 <= v < len(extra) else extra[0]
        elif ktag == _K_MSG:
            prev = msg_chunks.get(fname)
            msg_chunks[fname] = (extra, bytes(raw) if prev is None else prev[1] + bytes(raw))
        elif ktag == _K_REPSTR:
            obj[fname].append(raw.decode("utf-8"))
        else:  # _K_BYTES
            obj[fname] = raw
    for fname, (extra, chunks) in msg_chunks.items():
        obj[fname] = decode_message(extra, chunks, enums_as_number)
    return obj
