"""End-to-end corpus build: the composed pipeline writes the sharded
layout, survivors satisfy every stage's own invariant, and the audit
trail accounts for every dropped document exactly once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from consensource_sds_spark.corpus import build_training_corpus
from consensource_sds_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_build_training_corpus(spark, tmp_path):
    out = str(tmp_path / "corpus")
    stats = build_training_corpus(spark, SF, out, domain_cap=5, n_shards=4)

    written = spark.read.parquet(out)
    n_total = load(spark, SF, "documents").count()
    n_kept = written.count()
    dropped = {(r["stage"], r["reason"]): r["n_dropped"] for r in stats.collect()}
    # conservation: every doc either survives or is attributed to one stage
    assert n_kept + sum(dropped.values()) == n_total
    assert n_kept > 0

    # layout: split=*/shard_id=* directories, shard ids within range
    splits = {d.split("=")[1] for d in os.listdir(out) if d.startswith("split=")}
    assert splits <= {"train", "val", "test"} and "train" in splits
    shard_ids = {r["shard_id"] for r in written.select("shard_id").distinct().collect()}
    assert shard_ids <= set(range(4))

    # stage invariants on the survivors
    surv = written
    # exact dedup: content digests unique
    assert surv.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    # domain cap respected
    per_src = surv.groupBy("source").count().agg(F.max("count")).first()[0]
    assert per_src <= 5
    # filter rules: no shorties survive (x43's cheapest gate)
    assert surv.filter(F.expr("size(split(text,' ')) < 20")).count() == 0

    # deterministic: same input -> identical survivor set and shards
    out2 = str(tmp_path / "corpus2")
    build_training_corpus(spark, SF, out2, domain_cap=5, n_shards=4)
    a = sorted(r["doc_id"] for r in written.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(out2).select("doc_id").collect())
    assert a == b
