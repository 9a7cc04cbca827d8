"""End-to-end microbatch transform: events DataFrame -> PipelineBatch.

This is ``handle_events`` (event_handler.rs:28-38) as one declarative plan
per sink table. It is pure (no actions, no state) so the identical code runs
under ``spark.read`` for tests/backfill and inside ``foreachBatch`` for
streaming (see :mod:`consensource_sds_spark.streaming.runner`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from consensource_sds_spark.operators import transforms as T
from consensource_sds_spark.operators.scd2 import PipelineBatch

#: entity group -> (entity-key expression over the exploded entry, table builders)
_GROUPS: dict[str, tuple[str, dict]] = {
    "organization": (
        "e.id",
        {
            "organizations": T.to_organizations,
            "accreditations": T.to_accreditations,
            "authorizations": T.to_authorizations,
            "contacts": T.to_contacts,
            "addresses": T.to_addresses,
        },
    ),
    "agent": ("e.public_key", {"agents": T.to_agents}),
    "certificate": ("e.id", {"certificates": T.to_certificates}),
    "request": ("e.id", {"requests": T.to_requests}),
    "standard": ("e.id", {"standards": T.to_standards, "standard_versions": T.to_standard_versions}),
    # assertion versioning key = state address; the proto's own ``address``
    # field records where the assertion lives, so SET emissions (e.address)
    # and DELETE tombstones (the StateChange address) key the same cell.
    "assertion": ("e.address", {"assertions": T.to_assertions}),
}


def _emissions(entries: DataFrame, key_expr: str) -> DataFrame:
    return entries.select(
        F.col(key_expr).alias("vkey"),
        F.col("block_num").cast("long").alias("block_num"),
        "batch_ord",
        "change_idx",
        "entry_idx",
        F.lit(False).alias("is_delete"),
    )


def transform_events(events: DataFrame) -> PipelineBatch:
    """Parse + dispatch + decode + project one microbatch of envelope rows."""
    blocks = T.parse_blocks(events)
    deltas = T.with_address_space(T.parse_state_deltas(events))
    changes = T.changes_at_blocks(deltas, blocks)

    tables: dict[str, DataFrame] = {}
    emissions: dict[str, DataFrame] = {}
    for group, (key_expr, builders) in _GROUPS.items():
        entries = T.entity_entries(changes, group)
        emissions[group] = _emissions(entries, key_expr)
        for table, build in builders.items():
            tables[table] = build(entries)

    deletes = T.assertion_deletes(changes).select(
        F.col("state_address").alias("vkey"),
        "block_num",
        "batch_ord",
        "change_idx",
        F.lit(0).alias("entry_idx"),
        F.lit(True).alias("is_delete"),
    )
    emissions["assertion"] = emissions["assertion"].unionByName(deletes)

    return PipelineBatch(
        block=blocks.select("block_num", "block_id"),
        tables=tables,
        emissions=emissions,
        quarantine=T.invalid_changes(changes),
    )
