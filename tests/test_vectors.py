"""functions/vectors.py: the shared JVM-side embedding math. dot/norm/
cosine are exercised constantly through the ANN suites; unit() is the
normalize-at-ingest lever (the PQ rerank's metric-gap fix) and gets its
contract pinned directly."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from consensource_sds_spark.functions import vectors as V


def test_cosine_zero_vector_is_null_not_error(spark):
    """Regression: under Spark 4's default ANSI mode an unguarded division
    threw DIVIDE_BY_ZERO on the first all-zero embedding, aborting the whole
    job; cosine must yield NULL for a zero-norm side instead."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.5, 0.5]), (2, [0.0, 0.0], [0.5, 0.5]), (3, [1.0, 0.0], [0.0, 0.0])],
        "id long, a array<float>, b array<float>",
    )
    out = {r["id"]: r["c"] for r in df.select("id", V.cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert math.isclose(out[1], math.sqrt(0.5), rel_tol=1e-6)
    assert out[2] is None and out[3] is None


def test_unit_normalizes_and_passes_zero_through(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 0.0, 0.0])],
        "id long, v array<float>",
    )
    out = {
        r["id"]: (r["u"], r["n"])
        for r in df.select(
            "id", V.unit(F.col("v")).alias("u"), V.norm(V.unit(F.col("v"))).alias("n")
        ).collect()
    }
    assert [round(x, 6) for x in out[1][0]] == [0.6, 0.8]
    assert math.isclose(out[1][1], 1.0, rel_tol=1e-6)
    assert out[2][0] == [0.0, 0.0] and out[2][1] == 0.0  # zero passes through
    assert out[3][0] == [-1.0, 0.0, 0.0]
    # storage dtype stays float (the embedding column contract)
    schema = df.select(V.unit(F.col("v")).alias("u")).schema["u"].dataType.simpleString()
    assert schema == "array<float>"


def test_unit_makes_l2_and_cosine_orderings_agree(spark):
    """The documented reason unit() exists: for unit vectors
    |a-b|^2 = 2 - 2*cos(a,b), so L2-nearest == cosine-nearest. Pinned on
    a trio where the RAW orderings disagree (a long near-parallel vector
    is cosine-close but L2-far)."""
    q = [1.0, 0.0]
    cands = {10: [10.0, 0.5], 11: [0.9, 0.5]}  # 10: cosine-best, 11: L2-best (raw)
    rows = [(i, v) for i, v in cands.items()]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    qc = F.array(*[F.lit(x) for x in q])
    raw = {
        r["id"]: (r["l2"], r["cos"])
        for r in df.select(
            "id",
            F.aggregate(
                F.zip_with(qc, F.col("v"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("l2"),
            V.cosine(qc, F.col("v")).alias("cos"),
        ).collect()
    }
    assert raw[10][1] > raw[11][1] and raw[10][0] > raw[11][0]  # orderings disagree raw
    un = {
        r["id"]: (r["l2"], r["cos"])
        for r in df.select(
            "id",
            F.aggregate(
                F.zip_with(
                    V.unit(qc), V.unit(F.col("v")), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("l2"),
            V.cosine(V.unit(qc), V.unit(F.col("v"))).alias("cos"),
        ).collect()
    }
    # after unit(): smaller L2 <=> larger cosine, and |a-b|^2 == 2-2cos
    assert (un[10][0] < un[11][0]) == (un[10][1] > un[11][1])
    for i in (10, 11):
        assert math.isclose(un[i][0], 2 - 2 * un[i][1], rel_tol=1e-5)


def test_modal_width_memo_invalidates_on_file_rewrite(spark, tmp_path):
    """The per-session modal-width memo (load_finite_embeddings) is keyed
    by the parquet's mtime+size: an in-place rewrite of embeddings.parquet
    that changes the table's modal width must re-derive the width instead
    of silently admitting against the stale one (r9 advice; x70 keys its
    standing index the same way)."""
    import os
    import shutil
    import time

    from consensource_sds_spark.queries import load_finite_embeddings

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    for t in ("region", "nation"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{sf}/{t}.parquet")

    def write_emb(dim: int, n: int = 20) -> None:
        spark.createDataFrame(
            [(i, [float(i)] * dim, 0) for i in range(n)],
            "vec_id long, embedding array<float>, label int",
        ).toPandas().to_parquet(f"{sf}/embeddings.parquet")

    write_emb(8)
    assert load_finite_embeddings(spark, sf).count() == 20
    # rewrite IN PLACE with a different width; nudge mtime so the change
    # is visible even on coarse-mtime filesystems
    time.sleep(0.05)
    write_emb(12, n=10)
    os.utime(f"{sf}/embeddings.parquet")
    got = load_finite_embeddings(spark, sf)
    # stale width (8) would admit ZERO of the new 12-wide rows
    assert got.count() == 10
    assert got.select(F.size("embedding")).distinct().collect()[0][0] == 12
