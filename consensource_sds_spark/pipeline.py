"""End-to-end microbatch transform: events DataFrame -> PipelineBatch.

This is ``handle_events`` (event_handler.rs:28-38) as one declarative plan
per sink table. It is pure (no actions, no state) so the identical code runs
under ``spark.read`` for tests/backfill and inside ``foreachBatch`` for
streaming (see :mod:`consensource_sds_spark.streaming.runner`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from consensource_sds_spark.operators import transforms as T
from consensource_sds_spark.operators.scd2 import PipelineBatch

#: events per decode task in the materialized (foreachBatch) path — sized so
#: a task's real decode work (~10 changes/event) comfortably exceeds the
#: fixed Arrow-UDF task overhead
_EVENTS_PER_TASK = 128

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
        "delivery_id",
    )


def transform_events(
    events: DataFrame, materialize: bool = False, n_buckets: int | None = None
) -> PipelineBatch:
    """Parse + dispatch + decode + project one microbatch of envelope rows.

    ``materialize=False`` (default) keeps the batch a pure plan — no
    actions, replayable under ``spark.read`` for tests/backfill.
    ``materialize=True`` pins the decode pipeline in memory stage by stage
    — the foreachBatch body uses this:

    - the raw events land in ONE localCheckpoint, so the block parse and
      the state-delta decode both read memory instead of re-scanning (or,
      for a driver-built batch, re-converting) the source;
    - the decoded+dispatched state changes land in a second checkpoint,
      and a ``collect_set`` over it prunes which entity groups get plans
      built at all — a single-entity microbatch costs O(1) downstream
      jobs, not O(groups);
    - each present group's decoded ENTRIES land in a per-group checkpoint
      (one concurrent wave), so the emission streams, the table builders,
      and every downstream pass the sink makes over them are narrow
      in-memory projections — the per-entity protobuf container decode
      runs exactly once per batch, not once per consumer.

    The returned batch carries ``materialized=True`` so the sink skips its
    own defensive materialization of the emission union.

    ``n_buckets`` (the sink's bucket count, e.g. ``store._n_buckets()``)
    makes the TOUCHED-BUCKET sets ride the same checkpoint waves as
    observed metrics — per-group key buckets on each entries checkpoint,
    assertion-delete buckets on the changes checkpoint — so the sink's
    ``apply()`` skips its separate bucket-distinct job entirely (one
    fewer serial driver round trip per microbatch). The bucket mapping is
    the store's own ``_bucket_expr`` (murmur3 pmod — part of the on-disk
    layout), and the batch records which n it used so a sink with a
    different bucket count falls back to computing its own.

    Partitioning: the decode chain is re-chunked to the BATCH size, not the
    source's partition count — an Arrow UDF task costs ~15-20 ms of python
    round-trip regardless of rows, so a 10k-row microbatch spread over 32
    near-empty partitions pays 32x task overhead for no parallelism gain
    (measured ~40% of the decode wall-clock). The event count rides the
    events checkpoint as an observed metric; the chunk target caps at
    ``defaultParallelism`` so a large backfill batch keeps every core."""
    if materialize:
        from pyspark.sql import Observation

        obs_ev = Observation()
        events = events.observe(obs_ev, F.count(F.lit(1)).alias("n")).localCheckpoint()
        n_ev = obs_ev.get["n"]
        k = max(1, min(events.sparkSession.sparkContext.defaultParallelism, (n_ev + _EVENTS_PER_TASK - 1) // _EVENTS_PER_TASK))
        events = events.coalesce(k)  # no-op when k >= current partition count
    blocks = T.parse_blocks(events)
    deltas = T.with_address_space(T.parse_state_deltas(events))
    changes = T.changes_at_blocks(deltas, blocks)
    present: set[str] | None = None
    # plan-only batches can't know emptiness without an action; the sink
    # handles their (possibly empty) quarantine frame as before
    has_quarantine = True
    entries_by_group: dict[str, DataFrame] = {}
    touched_buckets: dict[str, list[int]] | None = None
    if materialize:
        from consensource_sds_spark.operators.scd2 import ScdParquetStore

        # the group-pruning distinct rides the checkpoint's own job as an
        # observed metric — no separate collect action. With n_buckets,
        # the assertion-DELETE tombstone buckets ride the same job (their
        # keys never appear in any entries frame).
        obs = Observation()
        # the quarantine emptiness probe rides the same job: the steady
        # state of a healthy stream is ZERO dead letters per batch, and
        # without the flag the sink paid a full parquet write job (writer
        # setup + dynamic-overwrite commit over an empty frame) every
        # batch just to land nothing (r10 ingest A/B finding)
        metrics = [
            F.collect_set("address_space").alias("spaces"),
            F.sum(T.invalid_changes_pred(changes).cast("int")).alias("n_quar"),
        ]
        if n_buckets is not None:
            del_bucket = F.when(
                (F.col("address_space") == "assertion") & (F.col("change_type") == "DELETE"),
                ScdParquetStore._bucket_expr("address", n_buckets),
            )
            metrics.append(F.collect_set(del_bucket).alias("del_buckets"))
        changes = changes.observe(obs, *metrics)
        changes = changes.localCheckpoint()
        got = obs.get
        present = set(got["spaces"])
        has_quarantine = bool(got["n_quar"])  # SUM over empty -> None
        groups = [g for g in _GROUPS if g in present]
        bucket_obs: dict[str, "Observation"] = {}

        def _ckpt(g: str) -> DataFrame:
            e = T.entity_entries(changes, g)
            if n_buckets is not None:
                o = Observation()
                bucket_obs[g] = o
                e = e.observe(
                    o,
                    F.collect_set(
                        ScdParquetStore._bucket_expr(_GROUPS[g][0], n_buckets)
                    ).alias("b"),
                )
            return e.localCheckpoint()

        if groups:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(groups)) as pool:
                entries_by_group = dict(zip(groups, pool.map(_ckpt, groups)))
        if n_buckets is not None:
            touched_buckets = {g: set(bucket_obs[g].get["b"]) for g in groups}
            dels = set(got.get("del_buckets") or [])
            if dels:
                touched_buckets["assertion"] = touched_buckets.get("assertion", set()) | dels
            touched_buckets = {g: sorted(b) for g, b in touched_buckets.items() if b}

    tables: dict[str, DataFrame] = {}
    emissions: dict[str, DataFrame] = {}
    for group, (key_expr, builders) in _GROUPS.items():
        if present is not None and group not in present:
            continue
        entries = entries_by_group.get(group)
        if entries is None:
            entries = T.entity_entries(changes, group)
        emissions[group] = _emissions(entries, key_expr)
        for table, build in builders.items():
            tables[table] = build(entries)

    if present is None or "assertion" in present:
        deletes = T.assertion_deletes(changes).select(
            F.col("state_address").alias("vkey"),
            "block_num",
            "batch_ord",
            "change_idx",
            F.lit(0).alias("entry_idx"),
            F.lit(True).alias("is_delete"),
            "delivery_id",
        )
        emissions["assertion"] = emissions["assertion"].unionByName(deletes)

    return PipelineBatch(
        # delivery_id rides along: it is the serial ARRIVAL key the sink's
        # intra-batch fork resolution orders deliveries by, and the exact
        # handle for rewinding a superseded delivery's emissions (which
        # carry the same id) — see ScdParquetStore.apply
        block=blocks.select("delivery_id", "block_num", "block_id"),
        tables=tables,
        emissions=emissions,
        # None when the observed metric proved the batch clean: the sink
        # then skips the quarantine write job entirely — the healthy
        # stream's steady state pays nothing for the W5 lane
        quarantine=T.invalid_changes(changes) if has_quarantine else None,
        materialized=materialize,
        touched_buckets=touched_buckets,
        buckets_n=n_buckets if touched_buckets is not None else None,
    )
