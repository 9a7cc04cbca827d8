"""The SDS transform layer as pure ``DataFrame -> DataFrame`` functions.

Implements SURVEY.md §2 operators F1-F5, P1-P8, U1-U3, A1-A3 against the
event-envelope schema; the reference implementation is
/root/reference/src/event_handler.rs:40-437 + transformer.rs. Every function
is batch/streaming agnostic (no actions, no state) so the same plan runs
under ``spark.read`` and inside ``foreachBatch``.

Input contract: an events DataFrame with schemas.EVENT columns plus a
``delivery_id`` column grouping the events of one ZMQ delivery (the
reference processes one delivery at a time, subscriber.rs:87-93; a Spark
microbatch may carry many — each delivery contributes at most one block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from consensource_sds_spark.addressing import INFIX_TO_SPACE, NAMESPACE
from consensource_sds_spark.codec import descriptor
from consensource_sds_spark.codec.messages import ENUMS
from consensource_sds_spark.codec.spark_udfs import decode_container, decode_state_changes
from consensource_sds_spark.schemas import MAX_BLOCK_NUM

BLOCK_COMMIT = "sawtooth/block-commit"
STATE_DELTA = "sawtooth/state-delta"

# DB enum domains = proto enum names, exactly the reference's match arms
# (event_handler.rs:222-232, 264-272, 371-378, 422-427). Derived from the
# codec's authoritative tables (wire number = list position) so encoder,
# descriptor set and this decode layer cannot drift apart.
ORG_TYPE_ENUM = dict(enumerate(ENUMS["OrganizationType"]))
#: wire numbers for the P8 conditional fan-outs — derived, never literal,
#: so a reordered/extended enum table cannot silently strand the filters
#: on stale numbers while decode_enum follows the table (r9 review)
_ORG_CERTIFYING_BODY = ENUMS["OrganizationType"].index("CERTIFYING_BODY")
_ORG_FACTORY = ENUMS["OrganizationType"].index("FACTORY")
ROLE_ENUM = dict(enumerate(ENUMS["Role"]))
REQUEST_STATUS_ENUM = dict(enumerate(ENUMS["RequestStatus"]))
ASSERTION_TYPE_ENUM = dict(enumerate(ENUMS["AssertionType"]))


def _when_chain(col: Column, mapping: dict, default) -> Column:
    """Value-mapping CASE WHEN chain with a fall-through default."""
    expr = None
    for key, val in mapping.items():
        expr = F.when(col == key, val) if expr is None else expr.when(col == key, val)
    return expr.otherwise(default)


def decode_enum(col: Column, mapping: dict[int, str]) -> Column:
    """P3: proto enum number -> name via a JVM-side CASE WHEN chain."""
    return _when_chain(col, mapping, mapping[0])


def nullif_empty(col: Column) -> Column:
    """P4: empty-string -> NULL (event_handler.rs:298-311, 335-338, 429-432)."""
    return F.nullif(col, F.lit(""))


def scd2_stamp(df: DataFrame, block_col: str = "block_num") -> DataFrame:
    """P6: stamp start/end block versioning columns (event_handler.rs:233-234
    et al.); end = MAX_BLOCK_NUM sentinel = 'still current'."""
    return df.withColumn("start_block_num", F.col(block_col).cast("long")).withColumn(
        "end_block_num", F.lit(MAX_BLOCK_NUM).cast("long")
    )


def _ensure_delivery(events: DataFrame) -> DataFrame:
    if "delivery_id" not in events.columns:
        events = events.withColumn("delivery_id", F.lit(0).cast("long"))
    return events


# ---------------------------------------------------------------------------
# Envelope parsing
# ---------------------------------------------------------------------------


def _attr(key: str) -> Column:
    """F4 + A2: FIRST attribute with this key (the reference filters the
    repeated attribute list and indexes [0], event_handler.rs:66-78 — a
    repeated key is legal on the wire and must not error), fail-fast when
    the key is missing (``block_num[0]`` on an empty Vec panics there;
    raise_error is the classifiable equivalent). A map_from_entries lookup
    would instead throw DUPLICATED_MAP_KEY on a repeated key and return
    silent NULLs — violating the non-nullable block schema — on a missing
    one."""
    first = F.get(F.filter(F.col("attributes"), lambda a: a["key"] == key), 0)["value"]
    return F.coalesce(
        first, F.raise_error(F.lit(f"block-commit event missing attribute {key!r}"))
    )


def parse_blocks(events: DataFrame) -> DataFrame:
    """F2 + F4 + A2 + P1 + A1: one (delivery_id, block_num, block_id) row per
    delivery that contains block-commit events; among several in one delivery
    the LAST wins (Iterator::last, event_handler.rs:88) — expressed as
    ``max_by`` over the arrival ordinal. Parse failure is fail-fast like the
    reference: a missing attribute raises via :func:`_attr` (it panics on
    any block-commit event, last or not — map(..).last() drains the
    iterator), and ANSI mode makes a malformed block_num cast raise."""
    stamped = "delivery_id" not in events.columns
    events = _ensure_delivery(events)
    agg = (
        events.filter(F.col("event_type") == BLOCK_COMMIT)
        .select(
            "delivery_id",
            F.col("batch_ord"),
            _attr("block_num").cast("long").alias("block_num"),
            _attr("block_id").alias("block_id"),
        )
        .groupBy("delivery_id")
        .agg(
            F.max_by(F.struct("block_num", "block_id"), "batch_ord").alias("b"),
            F.countDistinct("block_num").alias("_nb"),
        )
    )
    if stamped:
        # an id-less frame was stamped as ONE delivery; if it actually
        # carries several distinct block-commit heights, last-wins would
        # keep only the highest and misattribute every other block's
        # changes to it (silent corruption) — fail loud instead. Frames
        # WITH delivery_id keep the reference's legal last-wins per
        # delivery (Iterator::last over one EventList).
        agg = agg.select(
            "delivery_id",
            F.when(
                F.col("_nb") > 1,
                F.raise_error(
                    F.lit(
                        "events frame has no delivery_id but carries multiple "
                        "distinct block-commit heights; deliveries are not "
                        "separable — produce the frame with a delivery_id "
                        "column (transform_events passes it through)"
                    )
                ),
            )
            .otherwise(F.col("b"))
            .alias("b"),
        )
    return agg.select("delivery_id", "b.block_num", "b.block_id")


def parse_state_deltas(events: DataFrame) -> DataFrame:
    """F3 + P7 + U1 + F5: state-delta events -> exploded StateChanges within
    the family namespace. The namespace predicate re-checks the source-side
    subscription filter (subscriber.rs:205-223; client re-check
    event_handler.rs:100,109) and is JVM-side, so Catalyst can push it.

    Output: delivery_id, batch_ord, change_idx, address, value, change_type.
    (batch_ord, change_idx) preserve intra-delivery order — the reference
    applies operations in Vec order (event_handler.rs:56-58)."""
    events = _ensure_delivery(events)
    # decode backend: from_protobuf (JVM, zero Python crossings) when the
    # spark-protobuf classes are on the classpath, Arrow pandas UDF otherwise
    # — see codec.descriptor.decode_backend
    if descriptor.decode_backend(events.sparkSession) == "jvm":
        decoded = descriptor.state_changes_col(F.col("data"))
    else:
        decoded = decode_state_changes()(F.col("data"))
    return (
        events.filter(F.col("event_type") == STATE_DELTA)
        .select("delivery_id", "batch_ord", F.posexplode(decoded).alias("change_idx", "sc"))
        .select(
            "delivery_id",
            "batch_ord",
            "change_idx",
            F.col("sc.address").alias("address"),
            F.col("sc.value").alias("value"),
            F.col("sc.change_type").alias("change_type"),
        )
        .filter(F.col("address").startswith(NAMESPACE))
    )


def with_address_space(deltas: DataFrame) -> DataFrame:
    """A3: 7-way address-space dispatch on chars 7-8 of the address
    (event_handler.rs:134-202), as a derived routing column."""
    infix = F.substring(F.col("address"), 7, 2)
    return deltas.withColumn("address_space", _when_chain(infix, INFIX_TO_SPACE, "another_family"))


def changes_at_blocks(deltas: DataFrame, blocks: DataFrame) -> DataFrame:
    """Attach each state change to its delivery's block (the reference gets
    this for free by processing one delivery at a time). blocks is tiny
    (<= one row per delivery) -> broadcast. LEFT join: a delivery carrying
    state deltas but no block-commit event is a hard EventParseError in the
    reference (event_handler.rs:88-93); here its changes keep a NULL
    block_num so :func:`invalid_changes` quarantines them instead of an
    inner join silently discarding them."""
    return deltas.join(F.broadcast(blocks), "delivery_id", "left")


def invalid_changes_pred(deltas_with_space: DataFrame) -> Column:
    """The W5 dead-letter predicate, shared by :func:`invalid_changes`
    and the pipeline's free emptiness probe (an observed metric on the
    changes checkpoint) — two copies drifting apart would let a row be
    counted clean but quarantined, or vice versa."""
    pred = (F.col("address_space") == "another_family") | (
        (F.col("address_space") == "assertion") & (F.col("change_type") == "TYPE_UNSET")
    )
    if "block_num" in deltas_with_space.columns:
        pred = pred | F.col("block_num").isNull()
    return pred


def invalid_changes(deltas_with_space: DataFrame) -> DataFrame:
    """W5 dead-letter split: TYPE_UNSET assertions, unknown address spaces,
    and (post :func:`changes_at_blocks`) changes from a delivery with no
    block-commit event all error in the reference (event_handler.rs:88-93,
    192-200); here they route to a quarantine DataFrame instead of
    poisoning the stream."""
    return deltas_with_space.filter(invalid_changes_pred(deltas_with_space))


def entity_entries(deltas_with_space: DataFrame, space: str) -> DataFrame:
    """P7 + U2 for one entity type: decode the container, explode entries.
    The reference unpacks non-assertion changes regardless of change_type
    (parse_operation has no type match outside the assertion arm,
    event_handler.rs:141-175 — a DELETE's empty value decodes to an empty
    container, zero entries); only the assertion space is SET-gated (DELETE
    -> tombstone, TYPE_UNSET -> quarantine). NULL-block rows (delivery with
    no block-commit event) are quarantine-bound, not entries."""
    if descriptor.decode_backend(deltas_with_space.sparkSession) == "jvm":
        decoded = descriptor.container_entries_col(space, F.col("value"))
    else:
        decoded = decode_container(space)(F.col("value"))
    pred = (F.col("address_space") == space) & F.col("block_num").isNotNull()
    if space == "assertion":
        pred = pred & (F.col("change_type") == "SET")
    return (
        deltas_with_space.filter(pred)
        .select(
            "delivery_id",
            "batch_ord",
            "change_idx",
            "address",
            "block_num",
            F.posexplode(decoded).alias("entry_idx", "e"),
        )
    )


# ---------------------------------------------------------------------------
# Per-entity at_block transforms -> sink-table rows (P2-P6, P8, U3)
# Each mirrors a FromStateAtBlock impl (event_handler.rs:209-437) and is
# pinned by the same golden tests (tests/test_transforms.py).
# ---------------------------------------------------------------------------

# delivery_id leads: (batch_ord, change_idx, entry_idx) are PER-DELIVERY
# ordinals, so two deliveries at the same block height (an intra-batch
# fork) would otherwise produce colliding order keys — the sink's
# emission<->new-row join and its version sequencing key on the full
# four-tuple
_ORDER_COLS = ["delivery_id", "batch_ord", "change_idx", "entry_idx"]


def _proj(entries: DataFrame, *cols: Column) -> DataFrame:
    out = entries.select(*_ORDER_COLS, "block_num", *cols)
    return scd2_stamp(out).drop("block_num")


def to_agents(entries: DataFrame) -> DataFrame:
    """event_handler.rs:331-345."""
    return _proj(
        entries,
        F.col("e.public_key").alias("public_key"),
        nullif_empty(F.col("e.organization_id")).alias("organization_id"),
        F.col("e.name").alias("name"),
        F.col("e.timestamp").alias("timestamp"),
    )


def to_organizations(entries: DataFrame) -> DataFrame:
    """event_handler.rs:219-235."""
    return _proj(
        entries,
        F.col("e.id").alias("organization_id"),
        F.col("e.name").alias("name"),
        decode_enum(F.col("e.organization_type"), ORG_TYPE_ENUM).alias("organization_type"),
    )


def to_accreditations(entries: DataFrame) -> DataFrame:
    """U3 child fan-out, CERTIFYING_BODY only (P8; event_handler.rs:236-257)."""
    certifying = entries.filter(F.col("e.organization_type") == _ORG_CERTIFYING_BODY)
    acc = certifying.select(
        *_ORDER_COLS,
        "block_num",
        F.col("e.id").alias("organization_id"),
        F.explode(F.coalesce(F.col("e.accreditations"), F.array())).alias("a"),
    )
    return scd2_stamp(
        acc.select(
            *_ORDER_COLS,
            "block_num",
            "organization_id",
            F.col("a.standard_id").alias("standard_id"),
            F.col("a.standard_version").alias("standard_version"),
            F.col("a.accreditor_id").alias("accreditor_id"),
            F.col("a.valid_from").alias("valid_from"),
            F.col("a.valid_to").alias("valid_to"),
        )
    ).drop("block_num")


def to_authorizations(entries: DataFrame) -> DataFrame:
    """U3; event_handler.rs:258-276."""
    auth = entries.select(
        *_ORDER_COLS,
        "block_num",
        F.col("e.id").alias("organization_id"),
        F.explode(F.coalesce(F.col("e.authorizations"), F.array())).alias("a"),
    )
    return scd2_stamp(
        auth.select(
            *_ORDER_COLS,
            "block_num",
            "organization_id",
            F.col("a.public_key").alias("public_key"),
            decode_enum(F.col("a.role"), ROLE_ENUM).alias("role"),
        )
    ).drop("block_num")


def to_contacts(entries: DataFrame) -> DataFrame:
    """U3; event_handler.rs:277-288."""
    c = entries.select(
        *_ORDER_COLS,
        "block_num",
        F.col("e.id").alias("organization_id"),
        F.explode(F.coalesce(F.col("e.contacts"), F.array())).alias("c"),
    )
    return scd2_stamp(
        c.select(
            *_ORDER_COLS,
            "block_num",
            "organization_id",
            F.col("c.name").alias("name"),
            F.col("c.phone_number").alias("phone_number"),
            F.col("c.language_code").alias("language_code"),
        )
    ).drop("block_num")


def to_addresses(entries: DataFrame) -> DataFrame:
    """U3 0..1 child, FACTORY only (P8; event_handler.rs:289-318), with the
    empty-string->NULL normalization on the three optional lines (P4)."""
    factory = entries.filter(
        (F.col("e.organization_type") == _ORG_FACTORY) & F.col("e.factory_address").isNotNull()
    )
    return _proj(
        factory,
        F.col("e.id").alias("organization_id"),
        F.col("e.factory_address.street_line_1").alias("street_line_1"),
        nullif_empty(F.col("e.factory_address.street_line_2")).alias("street_line_2"),
        F.col("e.factory_address.city").alias("city"),
        nullif_empty(F.col("e.factory_address.state_province")).alias("state_province"),
        F.col("e.factory_address.country").alias("country"),
        nullif_empty(F.col("e.factory_address.postal_code")).alias("postal_code"),
    )


def to_certificates(entries: DataFrame) -> DataFrame:
    """event_handler.rs:348-362."""
    return _proj(
        entries,
        F.col("e.id").alias("certificate_id"),
        F.col("e.certifying_body_id").alias("certifying_body_id"),
        F.col("e.factory_id").alias("factory_id"),
        F.col("e.standard_id").alias("standard_id"),
        F.col("e.standard_version").alias("standard_version"),
        F.col("e.valid_from").alias("valid_from"),
        F.col("e.valid_to").alias("valid_to"),
    )


def to_requests(entries: DataFrame) -> DataFrame:
    """event_handler.rs:365-384."""
    return _proj(
        entries,
        F.col("e.id").alias("request_id"),
        F.col("e.factory_id").alias("factory_id"),
        F.col("e.standard_id").alias("standard_id"),
        decode_enum(F.col("e.status"), REQUEST_STATUS_ENUM).alias("status"),
        F.col("e.request_date").alias("request_date"),
    )


def to_standards(entries: DataFrame) -> DataFrame:
    """event_handler.rs:387-395."""
    return _proj(
        entries,
        F.col("e.id").alias("standard_id"),
        F.col("e.organization_id").alias("organization_id"),
        F.col("e.name").alias("name"),
    )


def to_standard_versions(entries: DataFrame) -> DataFrame:
    """U3 1..n child; event_handler.rs:397-409."""
    v = entries.select(
        *_ORDER_COLS,
        "block_num",
        F.col("e.id").alias("standard_id"),
        F.explode(F.coalesce(F.col("e.versions"), F.array())).alias("v"),
    )
    return scd2_stamp(
        v.select(
            *_ORDER_COLS,
            "block_num",
            "standard_id",
            F.col("v.version").alias("version"),
            F.col("v.link").alias("link"),
            F.col("v.description").alias("description"),
            F.col("v.approval_date").alias("approval_date"),
        )
    ).drop("block_num")


def to_assertions(entries: DataFrame) -> DataFrame:
    """event_handler.rs:416-437 (SET only; DELETE -> assertion_deletes)."""
    return _proj(
        entries,
        F.col("e.id").alias("assertion_id"),
        F.col("e.address").alias("address"),
        F.col("e.assertor_pub_key").alias("assertor_pub_key"),
        decode_enum(F.col("e.assertion_type"), ASSERTION_TYPE_ENUM).alias("assertion_type"),
        F.col("e.object_id").alias("object_id"),
        nullif_empty(F.col("e.data_id")).alias("data_id"),
    )


def assertion_deletes(deltas_with_space: DataFrame) -> DataFrame:
    """W3: an assertion DELETE becomes a tombstone (state address + block)
    that closes the open version (event_handler.rs:185-191). Output:
    state_address, block_num, plus order cols."""
    return deltas_with_space.filter(
        (F.col("address_space") == "assertion")
        & (F.col("change_type") == "DELETE")
        & F.col("block_num").isNotNull()
    ).select(
        "delivery_id",
        "batch_ord",
        "change_idx",
        F.col("address").alias("state_address"),
        F.col("block_num").cast("long").alias("block_num"),
    )
