"""Bucketed open-partition cost model: apply() rewrites O(touched buckets),
not O(live state) — the Delta-MERGE "touched files only" analog that makes
per-microbatch maintenance viable at 100 TB live state."""

from __future__ import annotations

import pytest

from consensource_sds_spark.operators.scd2 import ScdParquetStore
from consensource_sds_spark.pipeline import transform_events
from consensource_sds_spark.schemas import MAX_BLOCK_NUM
from consensource_sds_spark.sources import fixtures as fx


@pytest.fixture()
def store(spark, tmp_path):
    return ScdParquetStore(spark, str(tmp_path / "reporting"))


def _apply(spark, store, deliveries, batch_id=None):
    store.apply(transform_events(fx.events_df(spark, deliveries)), batch_id=batch_id)


def _wide_batch(block, n=200, suffix=""):
    return fx.delivery(
        block,
        f"b{block}",
        [
            fx.state_change(
                "agent", f"k{i}", [dict(fx.make_agent(), public_key=f"k{i}", name=f"v{block}{suffix}")]
            )
            for i in range(n)
        ],
    )


def test_one_key_batch_rewrites_exactly_one_bucket(spark, store):
    """After a wide batch spreads 200 keys over the open buckets, a
    single-key batch must replace ONLY the bucket that key hashes to;
    every other open-bucket manifest pointer carries over verbatim."""
    _apply(spark, store, [_wide_batch(1)])
    before = dict(store._manifest()["tables"]["agents"]["open_buckets"])
    assert len(before) > 1  # 200 keys genuinely spread across buckets

    one = fx.delivery(
        2, "b2", [fx.state_change("agent", "k7", [dict(fx.make_agent(), public_key="k7", name="v2")])]
    )
    _apply(spark, store, [one])
    after = dict(store._manifest()["tables"]["agents"]["open_buckets"])

    changed = {b for b in set(before) | set(after) if before.get(b) != after.get(b)}
    assert len(changed) == 1, f"expected exactly one rewritten bucket, got {sorted(changed)}"
    # untouched pointers are the SAME directories, not rewritten copies
    untouched = set(before) - changed
    assert untouched and all(before[b] == after[b] for b in untouched)

    cur = {r["public_key"]: r["name"] for r in store.current("agents").collect()}
    assert len(cur) == 200 and cur["k7"] == "v2" and cur["k8"] == "v1"
    closed = store.read("agents").filter("end_block_num != %d" % MAX_BLOCK_NUM).collect()
    assert [(r["public_key"], r["start_block_num"], r["end_block_num"]) for r in closed] == [
        ("k7", 1, 2)
    ]


def test_bucket_pruned_read_matches_full_scan(spark, store):
    """current(buckets=[...]) is partition pruning: the union over all
    buckets equals the unrestricted read, and each bucket holds only keys
    that hash to it."""
    from pyspark.sql import functions as F

    _apply(spark, store, [_wide_batch(1)])
    n = store._n_buckets()
    total = 0
    for b in range(n):
        rows = store.current("agents", buckets=[b]).collect()
        total += len(rows)
        for r in rows:
            got = spark.range(1).select(
                F.pmod(F.hash(F.lit(r["public_key"])), F.lit(n)).alias("b")
            ).first()["b"]
            assert got == b
    assert total == 200


def test_bucket_count_is_owned_by_the_layout(spark, tmp_path):
    """A store reopened with a different n_buckets default keeps the
    on-disk bucketing (the manifest owns the number)."""
    path = str(tmp_path / "reporting")
    s1 = ScdParquetStore(spark, path, n_buckets=4)
    _apply(spark, s1, [_wide_batch(1, n=50)])
    assert s1._manifest()["n_buckets"] == 4

    s2 = ScdParquetStore(spark, path, n_buckets=32)
    _apply(spark, s2, [_wide_batch(2, n=50)])
    assert s2._manifest()["n_buckets"] == 4
    assert {r["name"] for r in s2.current("agents").collect()} == {"v2"}
    assert s2.current("agents").count() == 50


def test_rewind_then_apply_preserves_bucketing(spark, store):
    """Fork repair rewrites all buckets (RESTORE cost) but the repaired
    layout keeps serving bucket-pruned applies afterwards."""
    _apply(spark, store, [_wide_batch(1)])
    _apply(spark, store, [_wide_batch(2)])
    # fork at block 2
    forked = fx.delivery(
        2, "b2-fork", [fx.state_change("agent", "k3", [dict(fx.make_agent(), public_key="k3", name="f2")])]
    )
    _apply(spark, store, [forked])
    cur = {r["public_key"]: (r["name"], r["start_block_num"]) for r in store.current("agents").collect()}
    assert cur["k3"] == ("f2", 2)
    assert cur["k4"] == ("v1", 1)  # block-2 version rewound, v1 re-opened
    before = dict(store._manifest()["tables"]["agents"]["open_buckets"])
    one = fx.delivery(
        5, "b5", [fx.state_change("agent", "k3", [dict(fx.make_agent(), public_key="k3", name="v5")])]
    )
    _apply(spark, store, [one])
    after = dict(store._manifest()["tables"]["agents"]["open_buckets"])
    changed = {b for b in set(before) | set(after) if before.get(b) != after.get(b)}
    assert len(changed) == 1


def test_producer_observed_buckets_match_sink_computation(spark, tmp_path):
    """transform_events(n_buckets=...) rides the touched-bucket sets on its
    own checkpoint waves; they must equal what apply()'s own distinct over
    the emission union would compute — including assertion DELETE
    tombstones, whose keys never appear in any entries frame."""
    from pyspark.sql import functions as F

    from consensource_sds_spark.operators.scd2 import ScdParquetStore
    from consensource_sds_spark.pipeline import transform_events
    from consensource_sds_spark.sources import fixtures as fx

    addr = fx.make_address("assertion", fx.ASSERTION_ID)
    a = dict(fx.make_assertion(), address=addr)
    deliveries = [
        fx.delivery(
            1,
            "b1",
            [
                fx.state_change("agent", f"k{i}", [dict(fx.make_agent(), public_key=f"pk{i}")])
                for i in range(5)
            ]
            + [fx.state_change("assertion", fx.ASSERTION_ID, [a])],
        ),
        fx.delivery(
            2,
            "b2",
            [fx.state_change("assertion", fx.ASSERTION_ID, None, change_type="DELETE")],
        ),
    ]
    ev = fx.events_df(spark, deliveries)
    n = 16
    batch = transform_events(ev, materialize=True, n_buckets=n)
    assert batch.buckets_n == n and batch.touched_buckets is not None

    # recompute the reference answer the sink's fallback path would
    expect: dict[str, set[int]] = {}
    for g, emis in batch.emissions.items():
        rows = emis.select(ScdParquetStore._bucket_expr("vkey", n).alias("b")).distinct().collect()
        got = {r["b"] for r in rows}
        if got:
            expect[g] = got
    assert {g: set(b) for g, b in batch.touched_buckets.items()} == expect
    # the delete's bucket is present even though block-2 has no SET entries
    del_bucket = spark.range(1).select(
        F.pmod(F.hash(F.lit(addr)), F.lit(n)).alias("b")
    ).first()["b"]
    assert del_bucket in set(batch.touched_buckets["assertion"])

    # and the store applies it end to end (tombstone closes the version)
    store = ScdParquetStore(spark, str(tmp_path / "store"), n_buckets=n)
    store.apply(batch)
    assert store.current("assertions").count() == 0
    assert store.read("assertions").count() == 1
