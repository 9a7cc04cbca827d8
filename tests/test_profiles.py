"""Profile-gated join strategy (VERDICT r1 item 2): fact-sized broadcast
hints exist only in the local latency profile; the cluster profile leaves
non-dim join sides to AQE's runtime-sized decision. True dims
(supplier/nation/region) broadcast unconditionally."""

from __future__ import annotations

from consensource_sds_spark.queries.relational import (
    q03_shipping_priority,
    q05_local_supplier_volume,
)

SF = "/root/testdata/sf0.001"


def _n_hints(df) -> int:
    # ResolvedHint nodes in the analyzed logical plan == broadcast hints the
    # query itself placed (the optimizer later folds them into the join).
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def test_local_profile_keeps_latency_hints(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PROFILE", "local")
    assert _n_hints(q03_shipping_priority(spark, SF)) == 2  # customer + o*c build
    assert _n_hints(q05_local_supplier_volume(spark, SF)) == 5  # + s/n/r dims


def test_cluster_profile_has_no_fact_broadcast(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PROFILE", "cluster")
    # q03 joins only facts (customer is not a dim): zero static hints
    assert _n_hints(q03_shipping_priority(spark, SF)) == 0
    # q05 keeps exactly the three true-dim hints (supplier/nation/region)
    assert _n_hints(q05_local_supplier_volume(spark, SF)) == 3


def test_cluster_profile_results_match_local(spark, monkeypatch):
    from tests.conftest import rows_set

    monkeypatch.setenv("SPARK_GRAFT_PROFILE", "local")
    local = rows_set(q05_local_supplier_volume(spark, SF))
    monkeypatch.setenv("SPARK_GRAFT_PROFILE", "cluster")
    cluster = rows_set(q05_local_supplier_volume(spark, SF))
    assert local == cluster and len(local) > 0


def test_cache_off_relayout_splits_single_row_group_inputs(spark, monkeypatch):
    """With the buffer pool off, a single-row-group parquet input is
    re-laid out once per session into a multi-file scratch copy so scans
    parallelize; SPARK_GRAFT_RELAYOUT=0 disables it and scans the
    original file."""
    import consensource_sds_spark.queries as Q

    monkeypatch.setenv("SPARK_GRAFT_CACHE", "0")
    Q._LAYOUT.clear()
    df = Q.load(spark, "/root/testdata/sf0.001", "documents")
    assert len(df.inputFiles()) > 1  # re-laid copy is multi-file
    # second load reuses the session-cached layout (no second write)
    laid = dict(Q._LAYOUT)
    df2 = Q.load(spark, "/root/testdata/sf0.001", "documents")
    assert dict(Q._LAYOUT) == laid and len(df2.inputFiles()) > 1
    # row content is identical to the original
    orig = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert df.count() == orig.count()
    assert df.exceptAll(orig).isEmpty()

    monkeypatch.setenv("SPARK_GRAFT_RELAYOUT", "0")
    Q._LAYOUT.clear()
    Q.load(spark, "/root/testdata/sf0.001", "documents")
    assert not Q._LAYOUT  # disabled: no scratch copy, original file scanned
    # tiny tables never re-lay (below one chunk): the layout cache maps them
    # to their ORIGINAL path, meaning no scratch copy was written
    monkeypatch.delenv("SPARK_GRAFT_RELAYOUT")
    Q._LAYOUT.clear()
    Q.load(spark, "/root/testdata/sf0.001", "nation")
    (laid_path,) = Q._LAYOUT.values()
    assert laid_path == "/root/testdata/sf0.001/nation.parquet"


def test_relayout_content_addressed_reuse_and_stale_cleanup(spark, monkeypatch, tmp_path):
    """The re-laid copy is content-addressed (input path+mtime+size): a new
    session (fresh process-local cache) finds the finished copy by address
    and writes NOTHING; replacing the input file invalidates only that
    input's stale copies."""
    import os
    import shutil

    import consensource_sds_spark.queries as Q

    monkeypatch.setenv("SPARK_GRAFT_CACHE", "0")
    monkeypatch.setenv("SPARK_GRAFT_LAYOUT_DIR", str(tmp_path / "layout"))
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/documents.parquet", sf / "documents.parquet")

    Q._LAYOUT.clear()
    Q.load(spark, str(sf), "documents")
    base = str(tmp_path / "layout")
    dirs1 = sorted(os.listdir(base))
    assert len(dirs1) == 1 and dirs1[0].startswith("documents-")
    mtime1 = os.stat(os.path.join(base, dirs1[0])).st_mtime_ns

    # "new session": clear the process-local cache; the disk copy must be
    # reused byte-for-byte (same dir, not rewritten, no extra dirs)
    Q._LAYOUT.clear()
    df = Q.load(spark, str(sf), "documents")
    assert sorted(os.listdir(base)) == dirs1
    assert os.stat(os.path.join(base, dirs1[0])).st_mtime_ns == mtime1
    assert len(df.inputFiles()) > 1

    # replace the input (new mtime) -> new address, stale copy reclaimed
    os.utime(sf / "documents.parquet", ns=(1, 1))
    Q._LAYOUT.clear()
    Q.load(spark, str(sf), "documents")
    dirs2 = sorted(os.listdir(base))
    assert len(dirs2) == 1 and dirs2 != dirs1
