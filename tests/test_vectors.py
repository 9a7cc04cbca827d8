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


def test_file_version_directory_stamp_sees_older_mtime_adds_and_deletes(tmp_path):
    """Directory stamps include file count + total bytes (r10 advice): a
    rewrite that ADDS a file with an OLDER mtime (cp -p restore) or
    DELETES a non-max file used to keep the max(mtime,size) stamp
    unchanged and serve the stale pooled frame."""
    import os

    from consensource_sds_spark.queries import _file_version

    d = tmp_path / "table.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * 100)
    os.utime(d / "part-0.parquet", ns=(2_000_000_000, 2_000_000_000))
    v1 = _file_version(str(d))

    # add a file with an OLDER mtime and a size below the max
    (d / "part-1.parquet").write_bytes(b"y" * 50)
    os.utime(d / "part-1.parquet", ns=(1_000_000_000, 1_000_000_000))
    v2 = _file_version(str(d))
    assert v2 != v1

    # delete the non-max file: stamp must change again
    (d / "part-1.parquet").unlink()
    assert _file_version(str(d)) != v2
    # hidden/underscore sidecars stay invisible to the stamp
    (d / "_SUCCESS").write_bytes(b"")
    assert _file_version(str(d)) == v1


def test_modal_width_memo_evicts_superseded_keys(spark, tmp_path):
    """A rewritten embeddings table must not leave its old width memo
    entry behind (same hygiene as load()'s pool eviction)."""
    import os
    import shutil
    import time

    from consensource_sds_spark.queries import _MODAL_WIDTH, load_finite_embeddings

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
    load_finite_embeddings(spark, sf).count()
    time.sleep(0.05)
    write_emb(12, n=10)
    os.utime(f"{sf}/embeddings.parquet")
    load_finite_embeddings(spark, sf).count()
    app = spark.sparkContext.applicationId
    mine = [k for k in _MODAL_WIDTH if k[0] == app and k[1] == sf]
    assert len(mine) == 1 and _MODAL_WIDTH[mine[0]] == 12


def test_admission_doors_agree_on_hostile_vectors(spark):
    """Lane equivalence for the single-sourced ANN admission rule (r10
    verdict #4): the Column-side door (V.admit_col — the _probe_cells
    DataFrame lane) and the python-side door (V.admit_value — the
    _select_cells_driver lane) must admit EXACTLY the same hostile
    vectors, for both a pinned width and the width-agnostic form."""
    from consensource_sds_spark.functions import vectors as V

    dim = 4
    hostile = [
        (0, [1.0, 2.0, 3.0, 4.0]),  # clean
        (1, None),  # NULL vector
        (2, [1.0, float("nan"), 3.0, 4.0]),  # NaN element
        (3, [1.0, float("inf"), 3.0, 4.0]),  # +Inf
        (4, [1.0, float("-inf"), 3.0, 4.0]),  # -Inf
        (5, []),  # empty
        (6, [1.0, 2.0, 3.0]),  # ragged (short)
        (7, [1.0, 2.0, 3.0, 4.0, 5.0]),  # ragged (long)
        (8, [0.0, 0.0, 0.0, 0.0]),  # zero vector (admitted; scoring rule's problem)
        (9, [1e308, -1e308, 1.0, 2.0]),  # huge but finite
    ]
    df = spark.createDataFrame(hostile, "qid long, qe array<double>")
    col_admitted = {
        r["qid"] for r in df.filter(V.admit_col(F.col("qe"), dim)).collect()
    }
    py_admitted = {qid for qid, qe in hostile if V.admit_value(qe, dim)}
    assert col_admitted == py_admitted == {0, 8, 9}

    # width-agnostic form (dim unknown): finite-only on both sides
    col_fin = {r["qid"] for r in df.filter(V.finite(F.col("qe"))).collect()}
    py_fin = {qid for qid, qe in hostile if V.admit_value(qe)}
    assert col_fin == py_fin == {0, 5, 6, 7, 8, 9}

    # the ann_ingest driver door is literally the shared predicate
    from consensource_sds_spark.streaming.ann_ingest import _admit_query

    assert _admit_query is V.admit_value
