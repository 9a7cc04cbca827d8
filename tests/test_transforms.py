"""Golden transform tests — 1:1 ports of the reference's six unit tests
(event_handler.rs:454-629), driven end-to-end through the encoded event
envelope (wire bytes -> parse -> dispatch -> decode -> at_block rows)."""

from __future__ import annotations

import pytest

from consensource_sds_spark.operators import transforms as T
from consensource_sds_spark.schemas import MAX_BLOCK_NUM
from consensource_sds_spark.sources import fixtures as fx

MAX = MAX_BLOCK_NUM


def _entries(spark, space, entity, block_num=1, key="k"):
    ev = fx.events_df(spark, [fx.delivery(block_num, "blockid1", [fx.state_change(space, key, [entity])])])
    blocks = T.parse_blocks(ev)
    deltas = T.with_address_space(T.parse_state_deltas(ev))
    return T.entity_entries(T.changes_at_blocks(deltas, blocks), space)


def _data_rows(df):
    return [
        tuple(r) for r in df.drop("delivery_id", "batch_ord", "change_idx", "entry_idx").collect()
    ]


def test_agent_at_block(spark):
    """event_handler.rs:540-553 (+ empty-string org_id -> NULL, :335-338)."""
    rows = _data_rows(T.to_agents(_entries(spark, "agent", fx.make_agent())))
    assert rows == [("test_public_key", "test_org", "test", 1, 1, MAX)]


def test_agent_empty_org_id_null(spark):
    agent = dict(fx.make_agent(), organization_id="")
    rows = _data_rows(T.to_agents(_entries(spark, "agent", agent)))
    assert rows == [("test_public_key", None, "test", 1, 1, MAX)]


def test_cert_body_at_block(spark):
    """event_handler.rs:454-498: org + accreditation + auth + contact, NO address."""
    e = _entries(spark, "organization", fx.make_certifying_body())
    assert _data_rows(T.to_organizations(e)) == [("test_cert_org", "test", "CERTIFYING_BODY", 1, MAX)]
    assert _data_rows(T.to_accreditations(e)) == [
        ("test_cert_org", "test_standard", "test", "test", 1, 2, 1, MAX)
    ]
    assert _data_rows(T.to_authorizations(e)) == [("test_cert_org", "test_public_key", "ADMIN", 1, MAX)]
    assert _data_rows(T.to_contacts(e)) == [("test_cert_org", "test", "test", "test", 1, MAX)]
    assert T.to_addresses(e).count() == 0


def test_factory_at_block(spark):
    """event_handler.rs:500-538: factory + contact + address, NO accreditations;
    street_line_2 absent -> NULL (P4)."""
    e = _entries(spark, "organization", fx.make_factory())
    assert _data_rows(T.to_organizations(e)) == [("test_factory", "test", "FACTORY", 1, MAX)]
    assert T.to_accreditations(e).count() == 0
    assert T.to_authorizations(e).count() == 0
    assert _data_rows(T.to_contacts(e)) == [("test_factory", "test", "test", "test", 1, MAX)]
    assert _data_rows(T.to_addresses(e)) == [
        ("test_factory", "test", None, "test", "test", "test", "test", 1, MAX)
    ]


def test_certificate_at_block(spark):
    """event_handler.rs:555-571."""
    rows = _data_rows(T.to_certificates(_entries(spark, "certificate", fx.make_certificate())))
    assert rows == [("test_cert", "test_cert_org", "test_factory", "test_standard", "test", 1, 2, 1, MAX)]


def test_request_at_block(spark):
    """event_handler.rs:573-587 (enum decode OPEN)."""
    rows = _data_rows(T.to_requests(_entries(spark, "request", fx.make_request())))
    assert rows == [("test_request", "test_factory", "test_standard", "OPEN", 1, 1, MAX)]


def test_standard_at_block(spark):
    """event_handler.rs:589-612: standard + one version."""
    e = _entries(spark, "standard", fx.make_standard())
    assert _data_rows(T.to_standards(e)) == [("test_standard", "test_standards_body", "test", 1, MAX)]
    assert _data_rows(T.to_standard_versions(e)) == [
        ("test_standard", "test", "test", "test", 1, 1, MAX)
    ]


def test_assertion_at_block(spark):
    """event_handler.rs:614-629 (data_id absent -> NULL)."""
    rows = _data_rows(T.to_assertions(_entries(spark, "assertion", fx.make_assertion())))
    assert rows == [
        ("test_assertion", "some_state_address", "test_public_key", "FACTORY", "test_factory", None, 1, MAX)
    ]


def test_block_parse_last_wins(spark):
    """A1: two block-commit events in one delivery -> later one wins
    (Iterator::last, event_handler.rs:88)."""
    ev = fx.events_df(
        spark,
        [[fx.block_commit_event(7, "first", 0), fx.block_commit_event(8, "second", 1)]],
    )
    assert [tuple(r) for r in T.parse_blocks(ev).collect()] == [(0, 8, "second")]


def test_namespace_filter_drops_foreign(spark):
    """F5: state change at a foreign address dropped (event_handler.rs:109)."""
    foreign = fx.state_change("agent", "k", [fx.make_agent()], address="f" * 70)
    ours = fx.state_change("agent", "k", [fx.make_agent()])
    ev = fx.events_df(spark, [fx.delivery(1, "b1", [foreign, ours])])
    deltas = T.parse_state_deltas(ev)
    assert deltas.count() == 1
    assert deltas.first()["address"] == ours["address"]


def test_invalid_changes_quarantine(spark):
    """W5: in-namespace unknown infix + TYPE_UNSET assertion -> quarantine."""
    from consensource_sds_spark.addressing import NAMESPACE

    unknown = fx.state_change("agent", "k", [fx.make_agent()], address=NAMESPACE + "99" + "a" * 62)
    unset = fx.state_change("assertion", "a", None, change_type="TYPE_UNSET")
    ev = fx.events_df(spark, [fx.delivery(1, "b1", [unknown, unset])])
    deltas = T.with_address_space(T.parse_state_deltas(ev))
    assert T.invalid_changes(deltas).count() == 2


def test_block_commit_missing_attr_raises(spark):
    """A block-commit event without block_num fails loudly (the reference
    panics at block_num[0], event_handler.rs:81) instead of emitting a NULL
    block row into the non-nullable schema."""
    ev = dict(fx.block_commit_event(1, "b1"), attributes=[{"key": "block_id", "value": "b1"}])
    df = fx.events_df(spark, [[ev]])
    with pytest.raises(Exception, match="missing attribute 'block_num'"):
        T.parse_blocks(df).collect()


def test_block_commit_repeated_attr_first_wins(spark):
    """Event_Attribute is a repeated proto field: two block_num attributes in
    one event are legal on the wire; the reference takes the first match
    (filter + [0], event_handler.rs:66-78). A map lookup would throw
    DUPLICATED_MAP_KEY and poison the whole microbatch."""
    ev = dict(
        fx.block_commit_event(1, "b1"),
        attributes=[
            {"key": "block_num", "value": "7"},
            {"key": "block_num", "value": "8"},
            {"key": "block_id", "value": "b1"},
        ],
    )
    assert [tuple(r) for r in T.parse_blocks(fx.events_df(spark, [[ev]])).collect()] == [(0, 7, "b1")]


def test_delta_without_block_commit_quarantined(spark):
    """A delivery carrying state deltas but no block-commit event is a hard
    EventParseError in the reference (event_handler.rs:88-93); here its
    changes must land in the quarantine — not be silently dropped by the
    block join — and never reach the entity tables."""
    sc = fx.state_change("agent", "k", [fx.make_agent()])
    ev = fx.events_df(spark, [[fx.state_delta_event([sc])]])
    blocks = T.parse_blocks(ev)
    changes = T.changes_at_blocks(T.with_address_space(T.parse_state_deltas(ev)), blocks)
    q = T.invalid_changes(changes).collect()
    assert len(q) == 1 and q[0]["address"] == sc["address"] and q[0]["block_num"] is None
    assert T.entity_entries(changes, "agent").count() == 0


def test_non_assertion_delete_with_payload_processed(spark):
    """parse_operation has no change-type match outside the assertion arm
    (event_handler.rs:141-175): a DELETE in the agent space with a non-empty
    payload is unpacked and processed like a SET, not dropped."""
    sc = fx.state_change("agent", "k", [fx.make_agent()], change_type="DELETE")
    ev = fx.events_df(spark, [fx.delivery(1, "b1", [sc])])
    blocks = T.parse_blocks(ev)
    changes = T.changes_at_blocks(T.with_address_space(T.parse_state_deltas(ev)), blocks)
    rows = _data_rows(T.to_agents(T.entity_entries(changes, "agent")))
    assert rows == [("test_public_key", "test_org", "test", 1, 1, MAX)]
    # and an empty-value DELETE (the normal wire shape) contributes no entries
    sc2 = fx.state_change("agent", "k", None, change_type="DELETE")
    ev2 = fx.events_df(spark, [fx.delivery(1, "b1", [sc2])])
    changes2 = T.changes_at_blocks(T.with_address_space(T.parse_state_deltas(ev2)), T.parse_blocks(ev2))
    assert T.entity_entries(changes2, "agent").count() == 0


def test_heartbeat_empty_delivery(spark):
    """F1: empty EventList -> no block row, no deltas (event_handler.rs:43-52)."""
    ev = fx.events_df(spark, [[]])
    assert T.parse_blocks(ev).count() == 0
    assert T.parse_state_deltas(ev).count() == 0


def test_assertion_delete_tombstone(spark):
    """W3: DELETE becomes (state_address, block_num) tombstone."""
    sc = fx.state_change("assertion", "a1", None, change_type="DELETE")
    ev = fx.events_df(spark, [fx.delivery(3, "b3", [sc])])
    blocks = T.parse_blocks(ev)
    deltas = T.with_address_space(T.parse_state_deltas(ev))
    rows = T.assertion_deletes(T.changes_at_blocks(deltas, blocks)).collect()
    assert [(r["state_address"], r["block_num"]) for r in rows] == [(sc["address"], 3)]


def test_idless_multiblock_frame_fails_loudly(spark):
    """Regression (r9 review): an events frame WITHOUT delivery_id gets
    stamped as one delivery; if it actually carries several distinct
    block-commit heights, last-wins would keep only the highest and
    misattribute every other block's changes to it. Fail loud instead.
    A single-height id-less frame stays legal (the stamped path)."""
    import pytest

    from consensource_sds_spark.operators.transforms import parse_blocks
    from consensource_sds_spark.sources import fixtures as fx

    two = fx.events_df(
        spark,
        [
            fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])]),
            fx.delivery(2, "b2", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])]),
        ],
    ).drop("delivery_id")
    with pytest.raises(Exception, match="delivery_id"):
        parse_blocks(two).collect()
    one = fx.events_df(
        spark,
        [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])],
    ).drop("delivery_id")
    assert [(r["block_num"], r["block_id"]) for r in parse_blocks(one).collect()] == [(1, "b1")]
