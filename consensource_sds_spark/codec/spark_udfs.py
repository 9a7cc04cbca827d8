"""Arrow-batched pandas UDFs wrapping the protobuf codec.

These are the ONLY Python-side steps in the ingest pipeline (the slow-path
equivalent of the reference's ``unpack_data``, event_handler.rs:119-125).
Everything around them — event-type filters, explodes, namespace predicate,
enum CASE WHEN, NULLIF, SCD2 stamping/merging — is JVM-side Catalyst work.

Design notes for scale: decode is embarrassingly parallel and stateless, so
it scales linearly with partitions; Arrow moves the binary column to Python
in columnar batches (no per-row pickling). If a protobuf jar is available in
a real deployment, ``from_protobuf`` can replace these one-for-one since the
output StructTypes match :mod:`consensource_sds_spark.schemas`.
"""

from __future__ import annotations

import functools

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType

from consensource_sds_spark import schemas
from consensource_sds_spark.codec.messages import decode_message

_CONTAINER_MSG = {
    "organization": "OrganizationContainer",
    "agent": "AgentContainer",
    "certificate": "CertificateContainer",
    "request": "RequestContainer",
    "standard": "StandardContainer",
    "assertion": "AssertionContainer",
}


def _shape_organization(entry: dict) -> dict:
    """Flatten the oneof-style detail messages into the ORGANIZATION struct.

    The conditional extraction (only read certifying_body_details for
    CERTIFYING_BODY orgs, factory_details for FACTORY — operator P8,
    event_handler.rs:236-257, 289-318) happens JVM-side; here we surface
    whatever the wire carried."""
    cbd = entry.get("certifying_body_details")
    fd = entry.get("factory_details")
    return {
        "id": entry["id"],
        "name": entry["name"],
        "organization_type": entry["organization_type"],
        "contacts": entry["contacts"],
        "authorizations": entry["authorizations"],
        "accreditations": cbd["accreditations"] if cbd else None,
        "factory_address": fd["address"] if fd else None,
    }


_SHAPERS = {"organization": _shape_organization}


# factory results are cached: transforms rebuild these plans per microbatch
# per entity space under foreachBatch, and re-wrapping the identical
# closure re-serializes the UDF command for shipment every time (inputs
# are static module-level tables — once per process is enough)
@functools.lru_cache(maxsize=None)
def decode_state_changes():
    """BINARY (encoded StateChangeList) -> ARRAY<STATE_CHANGE> (P7 + U1 prep).

    NULL input decodes to [] — matching the JVM builders, whose
    ``from_protobuf(NULL)`` is NULL coalesced back to array() so both
    backends agree on ``size()``/``posexplode_outer`` over the column."""

    @pandas_udf(ArrayType(schemas.STATE_CHANGE))
    def _decode(data: pd.Series) -> pd.Series:
        def one(buf):
            if buf is None:
                return []
            msg = decode_message("StateChangeList", bytes(buf))
            return [
                {"address": c["address"], "value": c["value"], "change_type": c["change_type"]}
                for c in msg["state_changes"]
            ]

        return data.map(one)

    return _decode


@functools.lru_cache(maxsize=None)
def decode_container(space: str):
    """BINARY (encoded <Entity>Container) -> ARRAY<entity struct> (P7 + U2 prep).

    Containers exist because multiple entities can hash-collide into one
    address (transformer.rs:3-7) — state at an address is a list. NULL
    input decodes to [] (JVM-builder parity, see decode_state_changes)."""
    schema = ArrayType(schemas.ENTITY_SCHEMAS[space])
    msg_name = _CONTAINER_MSG[space]
    shaper = _SHAPERS.get(space)

    @pandas_udf(schema)
    def _decode(data: pd.Series) -> pd.Series:
        def one(buf):
            if buf is None:
                return []
            entries = decode_message(msg_name, bytes(buf), enums_as_number=True)["entries"]
            return [shaper(e) for e in entries] if shaper else entries

        return data.map(one)

    return _decode
