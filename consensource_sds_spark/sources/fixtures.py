"""Test-fixture builders: in-memory entities -> encoded event batches.

Entity factories mirror the reference's test fixtures 1:1
(event_handler.rs:631-747: make_agent, make_certifying_body, make_factory,
make_certificate, make_request, make_standard, make_assertion) so the golden
transform tests pin identical values. The event-envelope builders produce
rows matching schemas.EVENT, the same wire shape the ZMQ subscriber receives
(subscriber.rs:87-93 -> event_handler.rs:41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from consensource_sds_spark import schemas
from consensource_sds_spark.addressing import make_address
from consensource_sds_spark.codec.messages import encode_message

PUBLIC_KEY = "test_public_key"
ORG_ID = "test_org"
CERT_ORG_ID = "test_cert_org"
FACTORY_ID = "test_factory"
STANDARDS_BODY_ID = "test_standards_body"
CERT_ID = "test_cert"
REQUEST_ID = "test_request"
STANDARD_ID = "test_standard"
ASSERTION_ID = "test_assertion"
ASSERTION_ADDRESS = "some_state_address"


def make_agent() -> dict:
    return {"public_key": PUBLIC_KEY, "organization_id": ORG_ID, "name": "test", "timestamp": 1}


def make_certifying_body() -> dict:
    return {
        "id": CERT_ORG_ID,
        "name": "test",
        "organization_type": "CERTIFYING_BODY",
        "contacts": [{"name": "test", "phone_number": "test", "language_code": "test"}],
        "authorizations": [{"public_key": PUBLIC_KEY, "role": "ADMIN"}],
        "certifying_body_details": {
            "accreditations": [
                {
                    "standard_id": STANDARD_ID,
                    "standard_version": "test",
                    "accreditor_id": "test",
                    "valid_from": 1,
                    "valid_to": 2,
                }
            ]
        },
    }


def make_factory() -> dict:
    return {
        "id": FACTORY_ID,
        "name": "test",
        "organization_type": "FACTORY",
        "contacts": [{"name": "test", "phone_number": "test", "language_code": "test"}],
        "factory_details": {
            "address": {
                "street_line_1": "test",
                "city": "test",
                "state_province": "test",
                "country": "test",
                "postal_code": "test",
            }
        },
    }


def make_certificate() -> dict:
    return {
        "id": CERT_ID,
        "certifying_body_id": CERT_ORG_ID,
        "factory_id": FACTORY_ID,
        "standard_id": STANDARD_ID,
        "standard_version": "test",
        "valid_from": 1,
        "valid_to": 2,
    }


def make_request() -> dict:
    return {
        "id": REQUEST_ID,
        "status": "OPEN",
        "standard_id": STANDARD_ID,
        "factory_id": FACTORY_ID,
        "request_date": 1,
    }


def make_standard() -> dict:
    return {
        "id": STANDARD_ID,
        "name": "test",
        "organization_id": STANDARDS_BODY_ID,
        "versions": [
            {"version": "test", "link": "test", "description": "test", "approval_date": 1}
        ],
    }


def make_assertion() -> dict:
    return {
        "id": ASSERTION_ID,
        "address": ASSERTION_ADDRESS,
        "assertor_pub_key": PUBLIC_KEY,
        "assertion_type": "FACTORY",
        "object_id": FACTORY_ID,
    }


_ENTITY_MSG = {
    "organization": "Organization",
    "agent": "Agent",
    "certificate": "Certificate",
    "request": "Request",
    "standard": "Standard",
    "assertion": "Assertion",
}


def encode_container(space: str, entities: list[dict]) -> bytes:
    return encode_message(f"{_ENTITY_MSG[space]}Container", {"entries": entities})


def state_change(space: str, key: str, entities: list[dict] | None, change_type: str = "SET", address: str | None = None) -> dict:
    """One StateChange dict ready for encode (DELETE carries no value)."""
    return {
        "address": address or make_address(space, key),
        "value": encode_container(space, entities) if entities is not None else b"",
        "change_type": change_type,
    }


def block_commit_event(block_num: int, block_id: str, batch_ord: int = 0) -> dict:
    return {
        "event_type": "sawtooth/block-commit",
        "attributes": [
            {"key": "block_num", "value": str(block_num)},
            {"key": "block_id", "value": block_id},
        ],
        "data": b"",
        "batch_ord": batch_ord,
    }


def state_delta_event(changes: list[dict], batch_ord: int = 1) -> dict:
    return {
        "event_type": "sawtooth/state-delta",
        "attributes": [],
        "data": encode_message("StateChangeList", {"state_changes": changes}),
        "batch_ord": batch_ord,
    }


def delivery(block_num: int, block_id: str, changes: list[dict]) -> list[dict]:
    """A standard one-block delivery: block-commit + one state-delta event."""
    events = [block_commit_event(block_num, block_id, 0)]
    if changes:
        events.append(state_delta_event(changes, 1))
    return events


def events_df(spark: SparkSession, deliveries: list[list[dict]]) -> DataFrame:
    """Deliveries -> events DataFrame with delivery_id (microbatch shape)."""
    rows = []
    for did, evs in enumerate(deliveries):
        for e in evs:
            rows.append(
                (e["event_type"], [(a["key"], a["value"]) for a in e["attributes"]], e["data"], e["batch_ord"], did)
            )
    return spark.createDataFrame(rows, schemas.event_envelope_schema())
