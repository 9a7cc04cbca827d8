"""Fixed schemas for the SDS pipeline (no inference anywhere).

The reference's schemas are compile-time protobuf definitions; every field
listed here is a field the reference actually reads (projection list derived
from /root/reference/src/event_handler.rs:209-437, event envelope from
:41-111). Integer times are epoch seconds widened u64 -> i64
(event_handler.rs:248-249, 340, 356-357, 379, 405) => LongType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Sentinel for "version still current" (database::data_manager::MAX_BLOCK_NUM,
#: imported at event_handler.rs:9) = i64::MAX.
MAX_BLOCK_NUM = 9223372036854775807


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


S, L, B = StringType(), LongType(), BinaryType()

# ---------------------------------------------------------------------------
# Input: event envelope (event_handler.rs:41-42, 62-111)
# ---------------------------------------------------------------------------

ATTRIBUTE = _s(_f("key", S), _f("value", S))

#: One row per Sawtooth event. ``batch_ord`` is the arrival ordinal within a
#: delivery (the reference relies on Vec order for last-wins block parsing,
#: event_handler.rs:88); a DataFrame has no implicit order so we carry it.
EVENT = _s(
    _f("event_type", S),
    _f("attributes", ArrayType(ATTRIBUTE)),
    _f("data", B),
    _f("batch_ord", L),
)

#: Decoded StateChange (sawtooth transaction_receipt.proto;
#: event_handler.rs:105-110). change_type in {'SET','DELETE','TYPE_UNSET'}.
STATE_CHANGE = _s(_f("address", S), _f("value", B), _f("change_type", S))


def event_envelope_schema() -> StructType:
    """EVENT + ``delivery_id`` — the microbatch/stream envelope shape
    produced by fixtures.events_df, the validator source, and consumed by
    the streaming runner. Built FRESH per call (StructType.add mutates in
    place, so a shared module-level instance is a mutation hazard);
    defined once so the three consumers cannot drift."""
    return StructType(EVENT.fields + [_f("delivery_id", L, False)])

# ---------------------------------------------------------------------------
# Decoded entity structs (field lists: event_handler.rs:209-437)
# Proto enums arrive as their wire *numbers* (LongType); the JVM-side
# CASE WHEN in operators/transforms.py decodes them to enum-name strings,
# mirroring the reference's exhaustive match arms (P3).
# ---------------------------------------------------------------------------

ORG_CONTACT = _s(_f("name", S), _f("phone_number", S), _f("language_code", S))
ORG_AUTHORIZATION = _s(_f("public_key", S), _f("role", L))
ORG_ACCREDITATION = _s(
    _f("standard_id", S),
    _f("standard_version", S),
    _f("accreditor_id", S),
    _f("valid_from", L),
    _f("valid_to", L),
)
FACTORY_ADDRESS = _s(
    _f("street_line_1", S),
    _f("street_line_2", S),
    _f("city", S),
    _f("state_province", S),
    _f("country", S),
    _f("postal_code", S),
)

ORGANIZATION = _s(
    _f("id", S),
    _f("name", S),
    _f("organization_type", L),
    _f("contacts", ArrayType(ORG_CONTACT)),
    _f("authorizations", ArrayType(ORG_AUTHORIZATION)),
    _f("accreditations", ArrayType(ORG_ACCREDITATION)),  # certifying_body_details
    _f("factory_address", FACTORY_ADDRESS),  # factory_details.address
)

AGENT = _s(_f("public_key", S), _f("organization_id", S), _f("name", S), _f("timestamp", L))

CERTIFICATE = _s(
    _f("id", S),
    _f("certifying_body_id", S),
    _f("factory_id", S),
    _f("standard_id", S),
    _f("standard_version", S),
    _f("valid_from", L),
    _f("valid_to", L),
)

REQUEST = _s(
    _f("id", S),
    _f("factory_id", S),
    _f("standard_id", S),
    _f("status", L),
    _f("request_date", L),
)

STANDARD_VERSION = _s(
    _f("version", S), _f("link", S), _f("description", S), _f("approval_date", L)
)
STANDARD = _s(
    _f("id", S),
    _f("organization_id", S),
    _f("name", S),
    _f("versions", ArrayType(STANDARD_VERSION)),
)

ASSERTION = _s(
    _f("id", S),
    _f("address", S),
    _f("assertor_pub_key", S),
    _f("assertion_type", L),
    _f("object_id", S),
    _f("data_id", S),
)

ENTITY_SCHEMAS = {
    "organization": ORGANIZATION,
    "agent": AGENT,
    "certificate": CERTIFICATE,
    "request": REQUEST,
    "standard": STANDARD,
    "assertion": ASSERTION,
}

# ---------------------------------------------------------------------------
# Output: reporting tables (database::models::*, event_handler.rs:209-437;
# column lists per /root/repo/FIXTURES.md §3). Every SINK_TABLES entry
# carries the SCD2 pair (start_block_num, end_block_num); BLOCKS_TABLE is
# deliberately a plain block log (no versioning) and is not in SINK_TABLES.
# ---------------------------------------------------------------------------

_SCD2 = (_f("start_block_num", L, False), _f("end_block_num", L, False))

BLOCKS_TABLE = _s(_f("block_num", L, False), _f("block_id", S, False))

ORGANIZATIONS_TABLE = _s(
    _f("organization_id", S, False), _f("name", S), _f("organization_type", S), *_SCD2
)
ACCREDITATIONS_TABLE = _s(
    _f("organization_id", S, False),
    _f("standard_id", S),
    _f("standard_version", S),
    _f("accreditor_id", S),
    _f("valid_from", L),
    _f("valid_to", L),
    *_SCD2,
)
AUTHORIZATIONS_TABLE = _s(
    _f("organization_id", S, False), _f("public_key", S), _f("role", S), *_SCD2
)
CONTACTS_TABLE = _s(
    _f("organization_id", S, False),
    _f("name", S),
    _f("phone_number", S),
    _f("language_code", S),
    *_SCD2,
)
ADDRESSES_TABLE = _s(
    _f("organization_id", S, False),
    _f("street_line_1", S),
    _f("street_line_2", S),
    _f("city", S),
    _f("state_province", S),
    _f("country", S),
    _f("postal_code", S),
    *_SCD2,
)
AGENTS_TABLE = _s(
    _f("public_key", S, False),
    _f("organization_id", S),
    _f("name", S),
    _f("timestamp", L),
    *_SCD2,
)
CERTIFICATES_TABLE = _s(
    _f("certificate_id", S, False),
    _f("certifying_body_id", S),
    _f("factory_id", S),
    _f("standard_id", S),
    _f("standard_version", S),
    _f("valid_from", L),
    _f("valid_to", L),
    *_SCD2,
)
REQUESTS_TABLE = _s(
    _f("request_id", S, False),
    _f("factory_id", S),
    _f("standard_id", S),
    _f("status", S),
    _f("request_date", L),
    *_SCD2,
)
STANDARDS_TABLE = _s(
    _f("standard_id", S, False), _f("organization_id", S), _f("name", S), *_SCD2
)
STANDARD_VERSIONS_TABLE = _s(
    _f("standard_id", S, False),
    _f("version", S),
    _f("link", S),
    _f("description", S),
    _f("approval_date", L),
    *_SCD2,
)
ASSERTIONS_TABLE = _s(
    _f("assertion_id", S, False),
    _f("address", S),
    _f("assertor_pub_key", S),
    _f("assertion_type", S),
    _f("object_id", S),
    _f("data_id", S),
    *_SCD2,
)

#: table name -> sink schema. Version keys (the column whose re-emission at
#: a block closes a table's previous open versions) live ONLY in
#: ``operators.scd2.ENTITY_GROUPS`` — child tables version as whole groups
#: with their parent entity (SURVEY §2.4 U3), so the key is a property of
#: the entity group, not of each table.
SINK_TABLES: dict[str, StructType] = {
    "organizations": ORGANIZATIONS_TABLE,
    "accreditations": ACCREDITATIONS_TABLE,
    "authorizations": AUTHORIZATIONS_TABLE,
    "contacts": CONTACTS_TABLE,
    "addresses": ADDRESSES_TABLE,
    "agents": AGENTS_TABLE,
    "certificates": CERTIFICATES_TABLE,
    "requests": REQUESTS_TABLE,
    "standards": STANDARDS_TABLE,
    "standard_versions": STANDARD_VERSIONS_TABLE,
    "assertions": ASSERTIONS_TABLE,
}
