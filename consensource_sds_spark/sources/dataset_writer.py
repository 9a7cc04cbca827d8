"""Sharded training-dataset writer — the sink side of the corpus pipeline.

x36 computes the deterministic shard assignment and its skew audit; this
module is the writer-side twin it documents: repartition BY THE SHARD KEY so
each output file is exactly one shard, written co-located (no post-hoc sort
or file-stitching), plus the split column from x25 so the layout is
``split=train/shard_id=17/part-*.parquet`` — the layout a training loader
expects (deterministic shard membership, stable under re-runs and appends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: same expression family as x25/x36 (content-free key hash)
_SHARD = "CAST(conv(substring(md5(CAST({key} AS STRING)), 1, 8), 16, 10) AS BIGINT) % {n}"
_BUCKET = "conv(substring(md5(CAST({key} AS STRING)), 1, 4), 16, 10) % 100"

#: parquet row-group bound for every file this engine writes. One-file-per-
#: shard layouts are deliberate (loader-friendly), but a single-row-group
#: file is a ONE-TASK scan for any later reader (byte-range splits assign a
#: row group to the task holding its midpoint) — bounding row groups at
#: 16 MiB keeps even one-file shards splittable ~8-way per 128 MiB, so
#: downstream scan parallelism never depends on file count.
ROW_GROUP_BYTES = 16 * 1024 * 1024


def with_shard_columns(df: DataFrame, key: str = "doc_id", n_shards: int = 64) -> DataFrame:
    """Attach deterministic ``split`` (80/10/10) and ``shard_id`` columns."""
    bucket = _BUCKET.format(key=key)
    return df.withColumn(
        "split",
        F.expr(
            f"CASE WHEN {bucket} < 80 THEN 'train' WHEN {bucket} < 90 THEN 'val'"
            " ELSE 'test' END"
        ),
    ).withColumn("shard_id", F.expr(_SHARD.format(key=key, n=n_shards)))


def _with_bloom(writer, bloom_columns, bloom_ndv):
    """Attach parquet bloom-filter writer options for ``bloom_columns`` —
    point-lookup scan skipping for any reader that consults footer blooms
    (parquet-mr record reader, Trino, Hive; ~1.2 MB per 10^6 NDV per
    column per file). Spark's own vectorized scan does not yet consult
    them, so this is a STORAGE-layer property for the mixed-engine lake,
    not a claim about this engine's plans."""
    for c in bloom_columns or ():
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_ndv)
        )
    return writer


def write_training_shards(
    df: DataFrame, out_dir: str, key: str = "doc_id", n_shards: int = 64,
    bloom_columns: list | None = None, bloom_ndv: int = 1_000_000,
    files_per_shard: int = 1,
) -> None:
    """Write ``split=<s>/shard_id=<k>/`` partitioned parquet, one file per
    (split, shard): ``repartition(split, shard_id)`` co-locates each
    partition's rows on one task BEFORE the partitioned write, so the
    writer emits one file per directory instead of one-per-input-task
    (the small-files problem at 100 TB is writer-task x partition count —
    this bounds it at partition count).

    ``files_per_shard`` is the write-parallelism knob that layout caps:
    at 1 the whole write funnels through <= 3 x n_shards tasks — with 16
    shards at the 100 TB posture that is ~TBs through ONE task. Raising
    it salts the repartition (deterministic key hash) so each directory
    gets UP TO ``files_per_shard`` co-located files — hash placement can
    land two salt groups of one directory on the same task (they then
    merge into one file), so the count is approximate; the shuffle is
    overprovisioned 8x so such collisions are rare rather than the ~1/e
    norm an exact-count repartition would give. Loaders glob the shard
    directory either way, and the row-group bound below keeps scan
    parallelism independent of file count regardless."""
    sharded = with_shard_columns(df, key=key, n_shards=n_shards)
    if files_per_shard > 1:
        # explicit partition count: AQE would otherwise coalesce the salted
        # shuffle back into few partitions on small inputs, collapsing the
        # parallelism (and the per-dir file count) the salt exists to buy.
        # 8x the group count: empty partitions are free at write time,
        # collided salt groups are not (they halve a directory's files)
        salt = F.pmod(F.xxhash64(F.col(key)), F.lit(files_per_shard))
        sharded = sharded.repartition(
            8 * 3 * n_shards * files_per_shard, F.col("split"), F.col("shard_id"), salt
        )
    else:
        sharded = sharded.repartition("split", "shard_id")
    writer = sharded.write.mode("overwrite").option("parquet.block.size", ROW_GROUP_BYTES)
    _with_bloom(writer, bloom_columns, bloom_ndv).partitionBy("split", "shard_id").parquet(out_dir)


def write_range_clustered(
    df: DataFrame, out_dir: str, col: str, n_files: int = 8,
    bloom_columns: list | None = None, bloom_ndv: int = 1_000_000,
) -> None:
    """Range-clustered layout: ``repartitionByRange`` + in-partition sort on
    the cluster key before writing, so each output file owns a disjoint key
    range and its parquet row-group min/max stats are tight. Readers
    filtering on the key then skip whole files/row groups from footer stats
    alone — the sort-based data-skipping that makes selective scans on a
    100 TB table touch O(selectivity) bytes (the single-dimension form of
    Z-ordering; OPTIMIZE ... ZORDER in table-format terms)."""
    writer = (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .option("parquet.block.size", ROW_GROUP_BYTES)
    )
    _with_bloom(writer, bloom_columns, bloom_ndv).parquet(out_dir)
