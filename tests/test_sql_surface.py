"""spark.sql surface: the reference consumers' "query the mirror with
SQL" workflow — input tables and SCD2 store views registered by name,
queried with plain ANSI SQL (current / history / as-of)."""

from __future__ import annotations

import pytest

from consensource_sds_spark import sql as S
from consensource_sds_spark.operators.scd2 import ScdParquetStore
from consensource_sds_spark.pipeline import transform_events
from consensource_sds_spark.sources import fixtures as fx

SF = "/root/testdata/sf0.001"


def test_input_tables_queryable_by_name(spark):
    names = S.register_input_tables(spark, SF)
    assert "lineitem" in names and "events" in names
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").first()["n"]
    assert n > 1000
    # events carries ts_us, and joins across registered views work
    row = spark.sql(
        """
        SELECT e.event_type, COUNT(*) AS n
        FROM events e WHERE e.ts_us IS NOT NULL
        GROUP BY e.event_type ORDER BY n DESC LIMIT 1
        """
    ).first()
    assert row["n"] > 0


def test_store_views_current_history_asof(spark, tmp_path):
    store = ScdParquetStore(spark, str(tmp_path / "reporting"))
    deliveries = [
        fx.delivery(
            b,
            f"block{b}",
            [
                fx.state_change(
                    "agent", "a1", [dict(fx.make_agent(), public_key="pk1", name=f"n@b{b}")]
                )
            ],
        )
        for b in (1, 2, 3)
    ]
    store.apply(transform_events(fx.events_df(spark, deliveries)))
    S.register_store_views(spark, store, as_of_block=2)

    # current: one open row, the block-3 version
    cur = spark.sql("SELECT name FROM agents").collect()
    assert [r["name"] for r in cur] == ["n@b3"]
    # history: all three versions
    hist = spark.sql(
        "SELECT name FROM agents_history ORDER BY start_block_num"
    ).collect()
    assert [r["name"] for r in hist] == ["n@b1", "n@b2", "n@b3"]
    # as-of block 2: the version live at that block
    asof = spark.sql("SELECT name FROM agents_asof").collect()
    assert [r["name"] for r in asof] == ["n@b2"]
    # blocks view exists
    assert spark.sql("SELECT COUNT(*) AS n FROM blocks").first()["n"] == 3


def test_corpus_views(spark, tmp_path):
    from consensource_sds_spark.sql import register_corpus_views
    from consensource_sds_spark.streaming.corpus_ingest import ingest_batch

    good = " ".join(f"tok{i}" for i in range(30))
    out = str(tmp_path / "corpus")
    batch = spark.createDataFrame(
        [(1, good, "en", "a", len(good))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    ingest_batch(spark, batch, 0, out, out + "_digest_index", 4, out + "_band_index")
    # a quarantine lane (malformed rows dead-lettered by run_corpus_stream)
    # must also surface through the query door
    spark.createDataFrame(
        [(99, None, "raw-malformed-line")], "doc_id long, text string, raw string"
    ).write.parquet(out + "_quarantine")
    names = register_corpus_views(spark, out)
    assert set(names) == {
        "corpus",
        "corpus_digest_index",
        "corpus_band_index",
        "corpus_quarantine",
    }
    assert spark.sql("SELECT COUNT(*) AS n FROM corpus_quarantine").first()["n"] == 1
    assert spark.sql("SELECT COUNT(*) AS n FROM corpus").first()["n"] == 1
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM corpus c JOIN corpus_digest_index i ON c.doc_id = i.keep_doc_id"
    ).first()["n"] == 1


def test_media_and_ann_views(spark, tmp_path):
    """The new streaming surfaces are queryable by name through the sql
    door, same as the corpus: media feature/quarantine lanes and the ANN
    index + centroids."""
    import numpy as np

    from consensource_sds_spark import sql as SQL
    from consensource_sds_spark.operators import multimodal as MM
    from consensource_sds_spark.streaming.ann_ingest import (
        ingest_embedding_batch,
        init_ann_index,
        train_centroids,
    )
    from consensource_sds_spark.streaming.media_ingest import ingest_media_batch

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    media = spark.createDataFrame(
        [
            (1, "image", MM.encode_png_pixels(px), "image/png", 8, 8, None),
            (2, "video", b"foreign-bytes", "video/mp4", None, None, 10),
        ],
        MM.MEDIA_SCHEMA,
    )
    mdir = str(tmp_path / "media")
    ingest_media_batch(media, 0, mdir)
    assert set(SQL.register_media_views(spark, mdir)) == {"media_features", "media_quarantine"}
    assert SQL.sql(spark, "SELECT COUNT(*) n FROM media_features").first()["n"] == 1
    assert SQL.sql(spark, "SELECT media_id FROM media_quarantine").first()["media_id"] == 2

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    adir = str(tmp_path / "ann")
    init_ann_index(spark, adir, train_centroids(spark, e, k=4, iters=1))
    ingest_embedding_batch(spark, e, 0, adir)
    assert SQL.register_ann_views(spark, adir) == ["ann_index", "ann_centroids"]
    per_cell = SQL.sql(
        spark, "SELECT cell, COUNT(*) n FROM ann_index GROUP BY cell ORDER BY cell"
    ).collect()
    assert sum(r["n"] for r in per_cell) == e.count() and len(per_cell) <= 4
    assert SQL.sql(spark, "SELECT COUNT(*) n FROM ann_centroids").first()["n"] == 4
