"""JSONL source: schema-pinned parse + corrupt-line quarantine."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from consensource_sds_spark.sources.jsonl import read_jsonl

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def test_good_and_corrupt_lines_split(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        "{broken json line\n"
        '{"doc_id": 3, "text": null, "lang": "en"}\n'
    )
    good, quarantine = read_jsonl(spark, str(p), SCHEMA)
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in good.collect()}
    assert rows == {1: ("hello world", "en"), 2: ("bonjour", "fr"), 3: (None, "en")}
    assert good.columns == ["doc_id", "text", "lang"]
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert bad == ["{broken json line"]


def test_type_mismatch_quarantined_not_coerced(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": "not_a_number", "text": "x", "lang": "en"}\n'
        '{"doc_id": 7, "text": "ok", "lang": "en"}\n'
    )
    good, quarantine = read_jsonl(spark, str(p), SCHEMA)
    assert [r["doc_id"] for r in good.collect()] == [7]
    assert quarantine.count() == 1


def test_reserved_corrupt_column_rejected(spark):
    """A schema already containing _corrupt_record (e.g. built from a
    prior read's quarantine output) must be rejected up front with a
    clear error — silently doubling the field produces an ambiguous
    reference on the split filters."""
    import pytest
    from pyspark.sql.types import StringType, StructField, StructType

    from consensource_sds_spark.sources.jsonl import read_jsonl

    bad = StructType(
        [
            StructField("doc_id", StringType(), True),
            StructField("_corrupt_record", StringType(), True),
        ]
    )
    with pytest.raises(ValueError, match="reserved column"):
        read_jsonl(spark, "/nonexistent", bad)
