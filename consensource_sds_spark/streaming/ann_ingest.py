"""Incremental ANN (IVF) index — the similarity-search member of the
standing-index family (digest index: exact dedup; band index: LSH
near-dedup; THIS: embedding nearest-neighbor), maintained continuously
under Structured Streaming.

A training-data pipeline's embedding corpus grows batch-by-batch exactly
like its text corpus; rebuilding a vector index nightly at 10^9 vectors is
the same non-starter as rescanning the corpus per microbatch. The IVF
(inverted-file) layout fits Spark's storage model directly:

- **centroids** (k rows, k x dim floats — KBs to MBs) are the only
  global state, trained once per index generation
  (:func:`train_centroids`, Lloyd iterations with deterministic
  md5-ordered seeds) and stored at ``<index>/_centroids`` (underscore
  prefix: invisible to parquet directory scans, the ``_bloom`` trick);
- the **index** is plain parquet partitioned by ``(batch_id, cell)``:
  ``cell`` partitioning turns every probe into PARTITION PRUNING (only
  the nprobe cells' directories are read — the IVF promise, delivered by
  the scan layer instead of a custom kernel), and ``batch_id``
  partitioning makes a crash-replayed microbatch overwrite its own
  output (dynamic overwrite — idempotence by layout, identical to
  corpus_ingest's corpus rows);
- **assignment** is a broadcast of the centroids against the batch
  (the small side REALLY is small here) + one ``max_by`` per vector —
  x11's cell assignment reused at ingest time;
- **probes** (:func:`ann_probe`) broadcast the query set (bounded by
  contract), prune the index to the union of the queries' top-nprobe
  cells, score candidates with the shared JVM vector functions, and
  take per-query top-k with one window — no shuffle ever touches the
  full index.

Compaction (:func:`compact_ann_index`) folds per-batch partitions into a
consolidated ``batch_id=-1`` per cell, same crash story as
``compact_indexes``: the fold is written first, old partitions dropped
after, and probes are agnostic to duplicate rows in between because
scoring dedups on vec_id.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from consensource_sds_spark.functions import vectors as V

#: file-stream schema for embedding drops (mirrors testdata embeddings)
EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"

#: consolidated partition id written by compaction — never a real batch
_COMPACTED_BATCH_ID = -1

#: probes collect (query x nprobe) cell ids to the driver to drive
#: partition pruning; cap the literal IN list like the bloom path does
_MAX_PRUNE_CELLS = 4096

#: ADC probe shape switch: below this many broadcast bytes of per-pair
#: fused distance tables, one broadcast join beats three (measured ~0.5 s
#: of local-mode stage latency at the bench's 100-query batch); above it,
#: the decomposed per-query/per-cell tables bound broadcast traffic to
#: (queries + cells) x m x k instead of queries x nprobe x m x k
_ADC_FUSED_LUT_MAX_BYTES = 32 * 1024 * 1024

#: last ADC probe's physical-shape record — {"shape": "fused"|"decomposed",
#: "fused_bytes": int, "pairs": int}; written by every :func:`ann_probe_adc`
#: call so harnesses (scaling deep block, tests) can observe the size gate
#: actually flipping instead of trusting the threshold arithmetic.
#: SEQUENTIAL-ONLY: concurrent probes in one process interleave writes
#: here — a caller that needs a race-free record passes its own dict via
#: ``ann_probe_adc(..., shape_out=...)`` and reads that instead.
LAST_ADC_SHAPE: dict = {}


def _centroids_path(index_dir: str) -> str:
    return os.path.join(os.path.abspath(index_dir), "_centroids")


def _pq_path(index_dir: str) -> str:
    return os.path.join(os.path.abspath(index_dir), "_pq_codebook")


def _pq_residual_marker(index_dir: str) -> str:
    return os.path.join(os.path.abspath(index_dir), "_pq_residual")


def train_centroids(spark: SparkSession, emb: DataFrame, k: int, iters: int = 3) -> DataFrame:
    """k centroids by Lloyd iteration (x40's update step, looped).

    Seeds are the k vectors with the smallest md5(vec_id) — deterministic,
    order-free, and scattered (hash order is uncorrelated with insertion
    order, the property random seeding wants). Each iteration: broadcast
    the k current centroids, assign every vector to its nearest by cosine
    (ties toward the lower cell id), recompute cell means component-wise
    via posexplode + (cell, dim) aggregation — never a collect of vectors;
    only the k x dim centroid table itself is driver-held between
    iterations (it IS the broadcast side). Empty cells keep their previous
    centroid. Returns (cell INT, centroid ARRAY<FLOAT>).

    The vector admission rule (``functions.vectors.admit``) applies
    before training: ONE NaN member would turn its cell's mean into a
    NaN centroid and poison every assignment of the generation, and a
    ragged member skews its cell mean (or aborts the posexplode
    aggregation) — excluded like every other corpus-side door."""
    e = V.admit(emb.select("vec_id", "embedding"))
    seeds = (
        e.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h")
        .limit(k)
        .withColumn("cell", (F.row_number().over(Window.orderBy("_h")) - 1).cast("int"))
        .select("cell", F.col("embedding").alias("centroid"))
    )
    cent = seeds.localCheckpoint()
    for _ in range(iters):
        asg = assign_cells(e, cent)
        dims = asg.join(e, "vec_id").select(
            "cell", F.posexplode("embedding").alias("dim", "val")
        )
        means = (
            dims.groupBy("cell", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).getField("m").alias("centroid")
            )
            .select("cell", F.expr("transform(centroid, x -> CAST(x AS FLOAT))").alias("centroid"))
        )
        # empty cells (no member this round) retain their previous centroid
        cent = (
            cent.alias("old")
            .join(means.alias("new"), "cell", "left")
            .select("cell", F.coalesce(F.col("new.centroid"), F.col("old.centroid")).alias("centroid"))
            .localCheckpoint()
        )
    return cent


def assign_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cell): nearest centroid by cosine, ties to the lower cell
    id — x11's rule. The centroid side is broadcast (k x dim, the
    genuinely-small side); one max_by per vector, no shuffle of the
    embedding frame."""
    # norms hoisted out of the k-way cross join: the row norm is one O(d)
    # fold per VECTOR instead of one per (vector, centroid) pair, and the
    # k centroid norms ride the broadcast (V.cosine_with_norms)
    scored = emb.select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("_rn")
    ).crossJoin(
        F.broadcast(
            centroids.select(
                F.col("cell").alias("_c"),
                F.col("centroid").alias("_ce"),
                V.norm(F.col("centroid")).alias("_cn"),
            )
        )
    )
    return (
        scored.select(
            "vec_id",
            "_c",
            V.cosine_with_norms(
                F.col("_ce"), F.col("embedding"), F.col("_cn"), F.col("_rn")
            ).alias("_cos"),
        )
        .groupBy("vec_id")
        .agg(F.max_by("_c", F.struct(F.col("_cos"), (-F.col("_c")).alias("_neg"))).alias("cell"))
    )


def init_ann_index(spark: SparkSession, index_dir: str, centroids: DataFrame) -> None:
    """Pin this index generation's centroids. Assignment determinism —
    and therefore probe/partition agreement — depends on every later
    batch using THESE centroids, so they are written once and never
    silently replaced (re-clustering = a new index built beside the old,
    the standard ANN index-rotation story)."""
    path = _centroids_path(index_dir)
    if os.path.exists(path):
        raise ValueError(f"{path} exists; ANN centroids are immutable per index generation")
    centroids.coalesce(1).write.parquet(path)


def load_centroids(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(_centroids_path(index_dir))


# ---------------------------------------------------------------------------
# Product quantization (Jegou 2011; x84/x85's registry twins are the
# oracle-checked forms) — the VECTOR-compression half of the index. IVF
# cell partitioning shrinks what a probe READS to nprobe directories;
# PQ codes shrink what those directories WEIGH: the ADC probe scans only
# (vec_id, cell, codes) — column pruning drops the dim x float32
# embedding payload entirely — and ranks candidates from a per-query
# (m x k) distance table. At 10^9 vectors x 64 floats that is the
# difference between reading 256 GB and reading 8 GB per full sweep.
#
# The codebook is a PER-GENERATION artifact exactly like the centroids
# (immutable once ingest starts — codes written under one codebook must
# never be scored against another), stored at ``_pq_codebook``. Enable PQ
# at generation init, BEFORE the first batch: mixed code/no-code
# partitions would make the probe read nulls, so ``init_pq`` refuses an
# index that already holds batches.
# ---------------------------------------------------------------------------


def _subvec(col, s_col, d: int):
    """The s-th d-dim sub-vector of ``col`` as array<double> (1-based
    element_at; s is a column)."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda i: F.element_at(col, (s_col * d + i).cast("int")).cast("double"),
    )


def _l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _residual_expr(emb_col, cent_col):
    """x − c as array<double> — the by_residual frame (Jegou 2011 §IV.B;
    FAISS IndexIVFPQ's default). One expression shared by codebook
    training, ingest-time encode, and the probe's query-residual stage so
    all three see the identical residual geometry.

    Width-guarded per row: zip_with NULL-pads the shorter array, so an
    under-width embedding (wrong encoder version) would come out exactly
    centroid-width with a NULL-poisoned tail — downstream width checks
    pass, the L2 folds go NULL, and max_by's tiebreaker writes garbage
    code 0 for the whole batch with no error. Mismatches raise instead."""
    res = F.zip_with(emb_col, cent_col, lambda x, y: x.cast("double") - y.cast("double"))
    return F.when(F.size(emb_col) == F.size(cent_col), res).otherwise(
        F.raise_error(
            F.concat(
                F.lit("embedding width "),
                F.size(emb_col).cast("string"),
                F.lit(" does not match centroid width "),
                F.size(cent_col).cast("string"),
            )
        )
    )


def _residuals(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding=residual, cell): each vector minus its ASSIGNED
    cell centroid, assignment by the same :func:`assign_cells` rule the
    index uses. Broadcast centroid join — no shuffle of the embedding
    frame beyond the assignment it already pays."""
    asg = assign_cells(emb, centroids)
    return (
        emb.join(asg, "vec_id")
        .join(F.broadcast(centroids.select("cell", "centroid")), "cell")
        .select(
            "vec_id",
            _residual_expr(F.col("embedding"), F.col("centroid")).alias("embedding"),
            "cell",
        )
    )


def train_pq_codebook(
    spark: SparkSession,
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Per-subspace Lloyd: cut ``dim`` into ``m`` subspaces and train
    ``k`` codewords in each — all m k-means runs ride ONE DataFrame keyed
    by the subspace id (never a per-subspace driver loop over data).
    Seeds are the k smallest-md5 vectors' sub-vectors (train_centroids's
    determinism rule). Returns (s INT, code INT, cw ARRAY<FLOAT>).

    With ``centroids`` (the generation's coarse IVF table) the codebook
    trains on RESIDUALS — each vector minus its assigned centroid, the
    FAISS IndexIVFPQ by_residual default: residuals concentrate near
    zero, so the same codeword budget spends on fine structure instead of
    re-describing cell position, and ADC recall rises at fixed m/k
    (pinned in tests/test_ann_recall.py). Pass the SAME centroids the
    index pins; pair with ``init_pq(..., by_residual=True)`` so encode
    and probe use the matching residual frame.

    Scale: per iteration one (n x m) explode joined against the broadcast
    (m x k) codebook, one argmin max_by per (vec, s), one (s, code, dim)
    mean agg — linear in n, codebook-sized state only; the residual
    variant adds one broadcast centroid join in front."""
    # dim from the RAW frame (residuals preserve width) and the m check
    # BEFORE the residual build — a misconfigured m must not burn a full
    # assignment cross-join pass just to produce an argument error. The
    # residual frame is checkpointed once, otherwise the k-way assignment
    # re-executes for the seed build and every Lloyd iteration's asg/means.
    dim = len(emb.select("embedding").first()["embedding"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if centroids is not None:
        emb = _residuals(emb, centroids).select("vec_id", "embedding").localCheckpoint()
    d = dim // m
    spaces = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s")
    sub = emb.select("vec_id", spaces, "embedding").select(
        "vec_id", "s", _subvec(F.col("embedding"), F.col("s"), d).alias("sv")
    )
    seeds = (
        emb.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h")
        .limit(k)
        .withColumn("code", (F.row_number().over(Window.orderBy("_h")) - 1).cast("int"))
        .select("code", spaces, "embedding")
        .select("s", "code", _subvec(F.col("embedding"), F.col("s"), d).alias("cw"))
    )
    cb = seeds.localCheckpoint()
    for _ in range(iters):
        asg = _nearest_code(sub, cb)
        means = (
            sub.join(asg, ["vec_id", "s"])
            .select("s", "code", F.posexplode("sv").alias("dim", "val"))
            .groupBy("s", "code", "dim")
            .agg(F.avg("val").alias("mn"))
            .groupBy("s", "code")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mn"))).getField("mn").alias("cw"))
        )
        cb = (
            cb.alias("old")
            .join(means.alias("new"), ["s", "code"], "left")
            .select("s", "code", F.coalesce(F.col("new.cw"), F.col("old.cw")).alias("cw"))
            .localCheckpoint()
        )
    return cb.select("s", "code", F.expr("transform(cw, x -> CAST(x AS FLOAT))").alias("cw"))


def init_pq(
    spark: SparkSession, index_dir: str, codebook: DataFrame, by_residual: bool = False
) -> None:
    """Pin this generation's PQ codebook. Must run BEFORE the first batch
    (codes and codebook version together); immutable like the centroids.
    ``by_residual`` records that the codebook was trained on residuals
    (``train_pq_codebook(..., centroids=...)``) — the marker routes
    encode AND probe through the matching residual frame, because codes
    written in one geometry scored in the other are garbage."""
    path = _pq_path(index_dir)
    if os.path.exists(path):
        raise ValueError(f"{path} exists; PQ codebooks are immutable per index generation")
    if os.path.isdir(index_dir) and any(x.startswith("batch_id=") for x in os.listdir(index_dir)):
        raise ValueError(
            f"{index_dir} already holds batches; PQ must be enabled at generation init "
            "(mixed code/no-code partitions would corrupt ADC probes)"
        )
    codebook.coalesce(1).write.parquet(path)
    if by_residual:
        # marker LAST: a crash between the two writes leaves a plain-PQ
        # codebook dir, which init_pq's immutability check forces the
        # caller to wipe and redo — never a half-residual generation
        with open(_pq_residual_marker(index_dir), "w") as f:
            f.write("{}")


def has_pq(index_dir: str) -> bool:
    return os.path.exists(_pq_path(index_dir))


def pq_is_residual(index_dir: str) -> bool:
    return os.path.exists(_pq_residual_marker(index_dir))


def load_pq_codebook(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(_pq_path(index_dir))


def _nearest_code(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """argmin_code L2(sv, cw) per (vec_id, s), ties to the LOWER code —
    the ONE assignment rule Lloyd training and encode share (codes
    written under one tie rule and scored under another are garbage, the
    geometry-mismatch class this module guards against everywhere)."""
    return (
        sub.join(F.broadcast(cb), "s")
        .withColumn("_d2", _l2(F.col("sv"), F.col("cw")))
        .groupBy("vec_id", "s")
        .agg(
            F.max_by("code", F.struct((-F.col("_d2")).alias("_n"), (-F.col("code")).alias("_c"))).alias("code"),
        )
    )


def pq_encode(emb: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, codes ARRAY<INT> in subspace order): nearest codeword per
    subspace by L2, ties to the lower code — x84's encode as a reusable
    frame function. One explode + broadcast join + argmin, linear."""
    first = codebook.select(F.max(F.size("cw")).alias("d"), F.max("s").alias("ms")).first()
    d, m = int(first["d"]), int(first["ms"]) + 1
    # geometry guard PER ROW, in-plan: under ANSI (this repo's Spark 4
    # default) an unguarded element_at past a short row's end raises a
    # bare INVALID_ARRAY_INDEX mid-write, an over-wide row would silently
    # encode from its prefix, and the previous eager first()-row probe
    # both missed every row after the first AND re-executed the upstream
    # assignment lineage once per microbatch just to read one width
    guarded = F.when(F.size("embedding") == m * d, F.col("embedding")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("embedding width "),
                F.size("embedding").cast("string"),
                F.lit(f" does not match the codebook's m*d = {m}*{d}"),
            )
        )
    )
    spaces = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s")
    sub = emb.select("vec_id", guarded.alias("embedding")).select(
        "vec_id", spaces, "embedding"
    ).select("vec_id", "s", _subvec(F.col("embedding"), F.col("s"), d).alias("sv"))
    asg = _nearest_code(
        sub, codebook.select("s", "code", F.expr("transform(cw, x -> CAST(x AS DOUBLE))").alias("cw"))
    )
    return asg.groupBy("vec_id").agg(
        F.array_sort(F.collect_list(F.struct("s", "code"))).getField("code").alias("codes")
    )


#: per-generation driver artifacts for the ADC probe (codebook tensor,
#: centroid dict, residual flag), keyed by (realpath, artifact file
#: stamps). Bounded LRU: a long-lived probe service touches a handful of
#: live generations, never an unbounded set.
_PROBE_ARTIFACT_MEMO: "OrderedDict[tuple, dict]" = None  # type: ignore[assignment]
_PROBE_ARTIFACT_MEMO_MAX = 8


def _dir_stamp(path: str) -> tuple:
    """(name, mtime_ns, size) of every entry under an artifact directory —
    the memo invalidation key. Artifacts are immutable per generation by
    construction (init_* raise on overwrite), but a failed ``init_pq`` is
    wiped-and-redone by contract, so trust the filesystem, not the path."""
    return tuple(
        (de.name, de.stat().st_mtime_ns, de.stat().st_size)
        for de in sorted(os.scandir(path), key=lambda d: d.name)
    )


def _memoized(key: tuple, build):
    """Stamped LRU for immutable per-generation artifacts."""
    global _PROBE_ARTIFACT_MEMO
    if _PROBE_ARTIFACT_MEMO is None:
        from collections import OrderedDict

        _PROBE_ARTIFACT_MEMO = OrderedDict()
    art = _PROBE_ARTIFACT_MEMO.get(key)
    if art is not None:
        _PROBE_ARTIFACT_MEMO.move_to_end(key)
        return art
    art = build()
    _PROBE_ARTIFACT_MEMO[key] = art
    while len(_PROBE_ARTIFACT_MEMO) > _PROBE_ARTIFACT_MEMO_MAX:
        _PROBE_ARTIFACT_MEMO.popitem(last=False)
    return art


def _cent_probe_artifacts(spark: SparkSession, index_dir: str) -> dict:
    """Driver-side numpy copies of the generation's immutable coarse
    centroids (+ norms + cell dtype) — the IVF cell-selection inputs
    every probe shares — memoized per generation. The probes previously
    re-collected (or re-scanned + checkpointed) the centroid table on
    EVERY call: pure fixed overhead per query batch. Centroids are
    written exactly once per generation (:func:`init_ann_index` raises
    on overwrite), so a stamped cache is semantics-free; compaction and
    new batches never touch the file, and a retrain lands in a fresh
    generation directory (new realpath)."""
    import numpy as np

    key = ("cent", os.path.realpath(index_dir), _dir_stamp(_centroids_path(index_dir)))

    def build() -> dict:
        cent_df = load_centroids(spark, index_dir).select("cell", "centroid")
        cent = {
            r["cell"]: np.asarray(r["centroid"], dtype=np.float64)
            for r in cent_df.collect()
        }
        return {
            "cent": cent,
            "cent_norm": {c: float(np.sqrt((v * v).sum())) for c, v in cent.items()},
            "cell_type": cent_df.schema["cell"].dataType,
            # the generation's vector width — the query-side admission
            # rule filters against it (a ragged query fed to the numpy
            # cell selection would raise a shape mismatch and abort the
            # whole probe batch, the job-abort class the admission rule
            # exists to exclude)
            "dim": len(next(iter(cent.values()))) if cent else -1,
        }

    return _memoized(key, build)


def _pq_probe_artifacts(spark: SparkSession, index_dir: str) -> dict:
    """:func:`_cent_probe_artifacts` plus the PQ lane's immutable inputs:
    the codebook as an (m, k, dsub) tensor and the residual flag. Same
    stamped-memo discipline (:func:`init_pq` raises on overwrite; a
    failed init is wiped-and-redone, which the stamp catches)."""
    import numpy as np

    key = (
        "pq",
        os.path.realpath(index_dir),
        _dir_stamp(_pq_path(index_dir)),
        _dir_stamp(_centroids_path(index_dir)),
        os.path.exists(_pq_residual_marker(index_dir)),
    )

    def build() -> dict:
        cb_rows = load_pq_codebook(spark, index_dir).collect()
        m = max(r["s"] for r in cb_rows) + 1
        n_codes = max(r["code"] for r in cb_rows) + 1
        dsub = len(cb_rows[0]["cw"])
        cw = np.zeros((m, n_codes, dsub))
        for r in cb_rows:
            cw[r["s"], r["code"]] = r["cw"]
        art = dict(_cent_probe_artifacts(spark, index_dir))
        art.update(
            m=m,
            n_codes=n_codes,
            dsub=dsub,
            cw=cw,
            residual=pq_is_residual(index_dir),
        )
        return art

    return _memoized(key, build)


#: the probe-side vector admission rule, single-sourced with the
#: DataFrame lane's Column predicate (``V.admit_col``) so the two doors
#: cannot drift (r10 verdict #4); see ``functions.vectors.admit_value``
_admit_query = V.admit_value


def _select_cells_driver(art: dict, qvec: dict, nprobe: int):
    """Per query the top-``nprobe`` cells by centroid cosine, computed
    driver-side from the memoized centroids — the SAME selection rule as
    :func:`_probe_cells` (ties toward the lower cell id; a NULL cosine —
    zero norm on either side — sorts after every number). Returns
    ((qid, cell) pairs, sorted union of needed cell ids)."""
    import numpy as np

    cent, cent_norm = art["cent"], art["cent_norm"]
    pairs: list = []
    needed_set: set = set()
    for qid, qe in qvec.items():
        qn = float(np.sqrt((qe * qe).sum()))
        scored = []
        for c, ce in cent.items():
            denom = qn * cent_norm[c]
            cos = float(qe @ ce) / denom if denom > 0 else None
            scored.append((0 if cos is not None else 1, -(cos or 0.0), c))
        scored.sort()
        for _, _, c in scored[:nprobe]:
            pairs.append((qid, c))
            needed_set.add(c)
    return pairs, sorted(needed_set)


def _probe_cells(spark: SparkSession, index_dir: str, qs: DataFrame, nprobe: int):
    """Each query's top-``nprobe`` cells by centroid cosine + the union of
    needed cell ids (the driver-bounded partition-pruning set), derived
    IN-PLAN. ``qs`` is (qid, qe); the rerank entry point uses this so its
    shortlist and exact stages prune to the same cells from ONE
    derivation (the direct probes select cells driver-side against the
    memoized centroids instead — :func:`_select_cells_driver`, same
    rule)."""
    cent = load_centroids(spark, index_dir)
    # probe-side admission rule, the shared door (V.admit_col — the
    # Column twin of the driver lane's _admit_query/V.admit_value)
    dim = _cent_probe_artifacts(spark, index_dir)["dim"]
    qs = qs.filter(V.admit_col(F.col("qe"), dim))
    # norms hoisted out of the k-way cross join (one fold per query /
    # per centroid, not per pair) — same bit-identical rewrite as
    # assign_cells
    scored = qs.withColumn("_qn", V.norm(F.col("qe"))).crossJoin(
        F.broadcast(
            cent.select(
                F.col("cell").alias("_c"),
                F.col("centroid").alias("_ce"),
                V.norm(F.col("centroid")).alias("_cn"),
            )
        )
    ).select(
        "qid",
        "qe",
        "_c",
        V.cosine_with_norms(F.col("_ce"), F.col("qe"), F.col("_cn"), F.col("_qn")).alias("_cos"),
    )
    wc = Window.partitionBy("qid").orderBy(F.desc("_cos"), F.asc("_c"))
    q_cells = (
        scored.withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") <= nprobe)
        .select("qid", "qe", F.col("_c").alias("cell"))
        .localCheckpoint()
    )
    needed = sorted({r["cell"] for r in q_cells.select("cell").distinct().collect()})
    return q_cells, needed


def ann_probe_adc(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    cells: tuple[DataFrame, list[int]] | None = None,
    shape_out: dict | None = None,
) -> DataFrame:
    """Top-k per query by PQ asymmetric distance over the standing index —
    the probe that never reads a database embedding: the scan projects
    (vec_id, cell, codes) only (column pruning drops the float payload),
    partition-prunes to the queries' nprobe cells, and scores each
    candidate with an in-row fold over broadcast flat distance tables
    (the classic ADC lookup). The tables are built DRIVER-side in numpy —
    the FAISS deployment shape: queries are a driver-bounded probe set by
    this function's contract (a corpus-scale left side goes through
    x84-x86's in-plan rank instead) — and SHARED across the query batch
    via the exact decomposition

        sum_s ||(q - cent_c)_s - cw[s, code_s]||^2
          = sum_s (A_q[s, code_s] + B_c[s, code_s]) + gamma_qc

        A_q[s, code]  = ||q_s - cw[s, code]||^2      (one table PER QUERY,
                                                      probed-cell-independent)
        B_c[s, code]  = 2*cent_c_s.cw[s, code]
                        + ||cent_c_s||^2             (one table PER CELL,
                                                      shared by every query
                                                      probing that cell)
        gamma_qc      = -2 * q . cent_c              (one scalar per pair)

    Two physical shapes, chosen by broadcast size (both exact, same
    values to fp rounding):

    - **fused** (pairs x m x k <= ``_ADC_FUSED_LUT_MAX_BYTES``): one row
      per (query, probed cell) carrying A+B pre-added driver-side plus
      the gamma scalar — a SINGLE broadcast hash join and one table
      lookup per subspace. Measured at the bench's 100-query batch the
      extra broadcast-join stages of the decomposed shape cost ~0.5 s of
      pure local-mode latency, so small probes take the one-join plan.
    - **decomposed** (above the threshold): three bounded broadcasts —
      A per query, B per probed cell, gamma per pair — so broadcast
      bytes grow as (queries + cells) x m x k instead of
      queries x nprobe x m x k: at a 10k-query x nprobe=32 operating
      point that is ~30x less broadcast traffic, the at-scale shape.

    Non-residual indexes have no centroid term (B = gamma = 0; A alone
    IS the per-pair table). The plan stays scan -> broadcast hash
    join(s) -> fold -> top-k window, with no per-code explode and no
    scoring shuffle; the fold is UNROLLED over the m known-at-plan-time
    subspaces (no per-row sequence allocation). The generation's
    immutable codebook/centroid artifacts are memoized driver-side
    (:func:`_pq_probe_artifacts`), so a warm probe pays ONE collect job
    (the query set) before the scoring job. Returns
    (qid, vec_id, adc_dist, rank), rank 1 = nearest. Approximate by
    construction; the exact-rerank pattern runs :func:`ann_probe` on this
    result's ids.

    Compaction-duplicate tolerance: candidate rows dedup on vec_id before
    scoring (codes are identical for a vec_id within a generation, so
    dropping either copy is exact).

    ``cells`` is the pre-computed ``_probe_cells`` pair for these same
    (queries, nprobe) — pass it when a caller (the rerank stage) already
    derived the probed-cell set, so the centroid scoring + driver collect
    run once per probe, not once per stage."""
    import numpy as np

    art = _pq_probe_artifacts(spark, index_dir)
    m, n_codes, dsub = art["m"], art["n_codes"], art["dsub"]
    cw, residual, cent = art["cw"], art["residual"], art["cent"]
    dim = m * dsub

    # qvec dedups qids (a qid appears once per probed cell in the cells
    # frame); pairs stays (qid, cell)-unique by construction on both paths
    qvec: dict = {}
    if cells is not None:
        q_cells, needed = cells
        pairs = []
        for r in q_cells.select("qid", "qe", "cell").collect():
            if r["qid"] not in qvec:
                qvec[r["qid"]] = np.asarray(r["qe"], dtype=np.float64)
            pairs.append((r["qid"], r["cell"]))
        qid_type = q_cells.schema["qid"].dataType
    else:
        for r in queries.select("qid", F.col("embedding").alias("qe")).collect():
            if not _admit_query(r["qe"], dim):
                continue
            qvec[r["qid"]] = np.asarray(r["qe"], dtype=np.float64)
        pairs, needed = _select_cells_driver(art, qvec, nprobe)
        qid_type = queries.schema["qid"].dataType

    A = {}
    for qid, qe in qvec.items():
        if len(qe) != dim:
            # same contract as _residual_expr's in-plan guard: a wrong
            # encoder version must raise, never NULL-poison the fold
            raise ValueError(
                f"query embedding width {len(qe)} does not match index dim {dim}"
            )
        diff = qe.reshape(m, 1, dsub) - cw
        A[qid] = (diff * diff).sum(axis=2)
    if residual:
        B = {}
        for c in needed:
            cs = cent[c].reshape(m, 1, dsub)
            B[c] = 2.0 * (cs * cw).sum(axis=2) + (cs * cs).sum(axis=2)
        gamma = {
            (qid, c): float(-2.0 * (qvec[qid] @ cent[c])) for qid, c in pairs
        }
    lut_type = T.ArrayType(T.DoubleType())

    idx = ann_index(spark, index_dir).select("vec_id", "cell", "codes")
    if len(needed) <= _MAX_PRUNE_CELLS:
        idx = idx.filter(F.col("cell").isin(needed))  # partition pruning
    cand = idx.dropDuplicates(["vec_id"])

    # the per-candidate score is a pure in-row fold over the code array,
    # UNROLLED s-ascending over the m known-at-plan-time subspaces (the
    # fixed-order-fold determinism rule; no per-row sequence allocation):
    # one (fused) or two (decomposed) table lookups per subspace, no
    # per-code explode, no scoring shuffle (every join side below is an
    # explicit broadcast). A corrupt code value indexes past the table
    # and ABORTS under ANSI (fail-fast, the posture every corrupt-index
    # path here takes); a NULL codes array folds to NULL and sinks via
    # asc_nulls_last instead of claiming rank 1.
    def _pos(s: int):
        return (F.lit(s * n_codes) + F.element_at(F.col("codes"), s + 1) + 1).cast(
            "int"
        )

    fused_bytes = len(pairs) * m * n_codes * 8
    # observability for the size gate (read by scaling.py's deep block and
    # tests): which physical shape THIS call took, and why. ``shape_out``
    # is the per-call record (race-free under concurrent probes);
    # LAST_ADC_SHAPE keeps the last call's copy for convenience under the
    # documented sequential-only contract.
    record = dict(
        shape="fused" if fused_bytes <= _ADC_FUSED_LUT_MAX_BYTES else "decomposed",
        fused_bytes=fused_bytes,
        pairs=len(pairs),
    )
    if shape_out is not None:
        shape_out.clear()
        shape_out.update(record)
    LAST_ADC_SHAPE.clear()
    LAST_ADC_SHAPE.update(record)
    if fused_bytes <= _ADC_FUSED_LUT_MAX_BYTES:
        # fused: one (qid, cell) row carries A+B pre-added + gamma —
        # single broadcast join, single lookup per subspace
        lut_rows = []
        for qid, c in pairs:
            t = A[qid] + B[c] if residual else A[qid]
            g = gamma[(qid, c)] if residual else 0.0
            lut_rows.append((qid, c, [float(x) for x in t.ravel()], g))
        qlut = spark.createDataFrame(
            lut_rows,
            T.StructType(
                [
                    T.StructField("qid", qid_type),
                    T.StructField("cell", art["cell_type"]),
                    T.StructField("lut", lut_type),
                    T.StructField("gamma", T.DoubleType()),
                ]
            ),
        )
        cand = cand.join(F.broadcast(qlut), "cell")
        score = F.col("gamma")
        for s in range(m):
            score = score + F.element_at(F.col("lut"), _pos(s))
    else:
        # decomposed: A per query + B per cell + gamma per pair — three
        # bounded broadcasts, (queries + cells) x m x k bytes total
        qpairs = spark.createDataFrame(
            [
                (qid, c, gamma[(qid, c)] if residual else 0.0)
                for qid, c in pairs
            ],
            T.StructType(
                [
                    T.StructField("qid", qid_type),
                    T.StructField("cell", art["cell_type"]),
                    T.StructField("gamma", T.DoubleType()),
                ]
            ),
        )
        qluta = spark.createDataFrame(
            [(qid, [float(x) for x in t.ravel()]) for qid, t in A.items()],
            T.StructType(
                [T.StructField("qid", qid_type), T.StructField("lut", lut_type)]
            ),
        )
        cand = cand.join(F.broadcast(qpairs), "cell").join(F.broadcast(qluta), "qid")
        score = F.col("gamma")
        if residual:
            clutb = spark.createDataFrame(
                [(c, [float(x) for x in t.ravel()]) for c, t in B.items()],
                T.StructType(
                    [
                        T.StructField("cell", art["cell_type"]),
                        T.StructField("lut_c", lut_type),
                    ]
                ),
            )
            cand = cand.join(F.broadcast(clutb), "cell")
            for s in range(m):
                score = score + F.element_at(F.col("lut"), _pos(s)) + F.element_at(
                    F.col("lut_c"), _pos(s)
                )
        else:
            for s in range(m):
                score = score + F.element_at(F.col("lut"), _pos(s))
    cand = cand.select("qid", "vec_id", score.alias("adc_dist"))
    wk = Window.partitionBy("qid").orderBy(F.asc_nulls_last("adc_dist"), F.asc("vec_id"))
    return (
        cand.withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= k)
        .select("qid", "vec_id", "adc_dist", F.col("_rn").alias("rank"))
    )



def ann_probe_adc_rerank(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    refine: int = 4,
) -> DataFrame:
    """Two-stage retrieval — the standard PQ deployment: ADC shortlists
    ``refine * k`` candidates per query WITHOUT reading embeddings, then
    the exact cosine stage reads the float payload for ONLY those
    shortlist ids (queries x refine x k rows — driver-bounded, an IN
    filter on vec_id over the already-cell-pruned scan) and re-ranks the
    final top-k. Output schema matches :func:`ann_probe` (qid, vec_id,
    cosine, rank), so callers swap probes freely; quantization error then
    affects only RECALL of the shortlist, never the returned scores.

    Metric note: the shortlist ranks by L2 ADC (the classic PQ objective)
    while the rerank scores cosine — on varying-norm corpora the two
    orderings diverge, so ``refine`` buys recall against BOTH quantization
    error and the metric gap (normalize vectors at ingest to remove the
    latter entirely)."""
    # derive the probed-cell set ONCE and hand it to the shortlist stage —
    # the centroid cross-join + driver collect is per-probe work, and the
    # rerank scan must prune to the SAME nprobe cells the shortlist came
    # from (every shortlisted id lives in one of them); without the cell
    # filter the vec_id IN list alone reads row groups of every cell
    # directory, undoing the probe's partition pruning
    qs = queries.select("qid", F.col("embedding").alias("qe")).localCheckpoint()
    cells = _probe_cells(spark, index_dir, qs, nprobe)
    _q_cells, needed = cells
    short = ann_probe_adc(
        spark, index_dir, queries, k=refine * k, nprobe=nprobe, cells=cells
    ).select("qid", "vec_id").localCheckpoint()
    ids = [r["vec_id"] for r in short.select("vec_id").distinct().collect()]
    emb = ann_index(spark, index_dir).select("vec_id", "embedding", "cell")
    if len(needed) <= _MAX_PRUNE_CELLS:
        emb = emb.filter(F.col("cell").isin(needed))
    emb = (
        emb.drop("cell")
        .filter(F.col("vec_id").isin(ids))
        .dropDuplicates(["vec_id"])
    )
    # norms hoisted before the rerank pair join (query norm once per query
    # on the broadcast side, candidate norm once per shortlisted vector)
    cand = (
        short.join(emb.withColumn("_en", V.norm(F.col("embedding"))), "vec_id")
        .join(F.broadcast(qs.withColumn("_qn", V.norm(F.col("qe")))), "qid")
        .select(
            "qid",
            "vec_id",
            V.cosine_with_norms(
                F.col("qe"), F.col("embedding"), F.col("_qn"), F.col("_en")
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= k)
        .select("qid", "vec_id", "cosine", F.col("_rn").alias("rank"))
    )


def ingest_embedding_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    quarantine_dir: str | None = None,
) -> None:
    """One microbatch: assign cells against the pinned centroids, append
    under ``(batch_id, cell)`` with dynamic overwrite (replay-idempotent).
    Pure function of (batch, centroids) — same code for backfill and
    stream, corpus_ingest's contract.

    Non-finite and wrong-width vectors are rejected at the door (the
    same unconditional drop as corpus ingest's NULL doc_id rule):
    admitted into the index a NaN row would score NaN against every
    query — and NaN sorts ABOVE every real similarity, so each poisoned
    row would steal a top-k slot from every probe that touches its cell
    — while a ragged row aborts the probe's fold outright. The width to
    admit against is the GENERATION's own (its pinned centroids), not a
    modal guess.

    ``quarantine_dir`` (optional) persists the rejected rows as a
    dead-letter lane — (vec_id, embedding, reason) under a batch_id
    partition, replay-idempotent like the index write — so "where did my
    vectors go" is answerable from disk, the same posture as corpus
    ingest's W5 quarantine. Default None: the healthy path pays nothing
    (no extra job, no empty writes — the W5 gating lesson)."""
    spark = batch_df.sparkSession
    cent = load_centroids(spark, index_dir)
    gen_dim = cent.select(F.size("centroid").alias("_mw")).distinct()
    admitted = (
        batch_df.filter(V.finite(F.col("embedding")))
        .join(F.broadcast(gen_dim), F.size(F.col("embedding")) == F.col("_mw"))
        .drop("_mw")
    )
    if quarantine_dir is not None:
        dim_lit = int(cent.select(F.size("centroid")).first()[0])
        # ~admit_col is True for NULL too (finite() coalesces NULL->False)
        rejected = batch_df.filter(~V.admit_col(F.col("embedding"), dim_lit)).select(
            "vec_id",
            "embedding",
            F.when(F.col("embedding").isNull(), F.lit("null_vector"))
            .when(~V.finite(F.col("embedding")), F.lit("non_finite"))
            .otherwise(F.lit("wrong_width"))
            .alias("reason"),
        )
        # gated like W5: clean batches must not pay a writer setup +
        # dynamic-overwrite commit over an empty frame
        if rejected.limit(1).count() > 0:
            (
                rejected.withColumn("batch_id", F.lit(batch_id))
                .coalesce(1)
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(quarantine_dir)
            )
    batch_df = admitted
    asg = assign_cells(batch_df, cent)
    rows = batch_df.join(asg, "vec_id").select(
        "vec_id", "embedding", "label", F.col("cell").cast("int").alias("cell")
    )
    if has_pq(index_dir):
        enc_in = batch_df
        if pq_is_residual(index_dir):
            # reuse the assignment already computed for partitioning — the
            # residual frame must subtract the SAME centroid the row files
            # under
            enc_in = rows.join(F.broadcast(cent.select("cell", "centroid")), "cell").select(
                "vec_id",
                _residual_expr(F.col("embedding"), F.col("centroid")).alias("embedding"),
            )
        rows = rows.join(pq_encode(enc_in, load_pq_codebook(spark, index_dir)), "vec_id")
    (
        rows.withColumn("batch_id", F.lit(batch_id))
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("batch_id", "cell")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(index_dir)
    )


def ann_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The standing index as a frame (cell/batch_id partition columns
    included; ``_centroids`` is invisible to the scan).

    A freshly initialized generation holds only underscore-prefixed
    artifacts (``_centroids``, ``_GEN_DONE``, maybe ``_pq_codebook``) —
    invisible to the parquet scan, so an unguarded read raises
    UNABLE_TO_INFER_SCHEMA and every probe-family entry point would crash
    before the first batch lands (describe_ann_index already guards this
    exact state); return an empty, correctly-shaped frame instead."""
    if not any(x.startswith("batch_id=") for x in os.listdir(index_dir)):
        ddl = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT, cell INT, batch_id INT"
        if has_pq(index_dir):
            ddl += ", codes ARRAY<INT>"
        return spark.createDataFrame([], ddl)
    return spark.read.parquet(index_dir)


def ann_probe(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    _exclude_self: bool = False,
) -> DataFrame:
    """Top-k cosine neighbors per query over the standing index.

    ``queries`` is (qid BIGINT, embedding ARRAY<FLOAT>) and BOUNDED by
    contract (a probe set, not a corpus — corpus x corpus goes through
    x13/x14's cell-keyed join instead). Plan: (1) each query's top-nprobe
    cells, selected driver-side against the generation's MEMOIZED
    centroids (:func:`_cent_probe_artifacts`; same rule as
    :func:`_probe_cells`) — one collect job for the query set instead of
    the former checkpoint-the-queries + checkpoint-the-cells +
    collect-the-union trio; (2) the union of needed cells — at most
    queries x nprobe ids, a driver-bounded set — becomes a
    partition-pruning IN filter on the index scan, so only those cell
    directories are READ; (3) candidates join the broadcast query set
    (original float values round-tripped verbatim, so scores are
    bit-identical to the former in-plan path), cosine-score with the
    shared JVM vector ops, dedup on (qid, vec_id)
    (compaction-duplicate tolerance), one window takes top-k. Ties break
    toward the lower vec_id."""
    import numpy as np

    import math

    art = _cent_probe_artifacts(spark, index_dir)
    qraw: dict = {}
    qvec: dict = {}
    qn: dict = {}
    for r in queries.select(F.col("qid"), F.col("embedding").alias("qe")).collect():
        if not _admit_query(r["qe"], art["dim"]):
            continue
        qraw[r["qid"]] = r["qe"]
        qvec[r["qid"]] = np.asarray(r["qe"], dtype=np.float64)
        # the query vector's L2 norm is loop-invariant across its whole
        # candidate set, but Catalyst re-runs the O(d) norm fold per
        # CANDIDATE row when it rides inside the cosine expression —
        # compute it once per query here, in the exact JVM fold order
        # (left-to-right double accumulate, f32->f64 casts exact), so the
        # per-candidate score is bit-identical to the in-plan form
        acc = 0.0
        for x in qraw[r["qid"]]:
            acc += float(x) * float(x)
        qn[r["qid"]] = math.sqrt(acc)
    pairs, needed = _select_cells_driver(art, qvec, nprobe)
    q_cells = spark.createDataFrame(
        [(qid, qraw[qid], qn[qid], c) for qid, c in pairs],
        T.StructType(
            [
                T.StructField("qid", queries.schema["qid"].dataType),
                T.StructField("qe", queries.schema["embedding"].dataType),
                T.StructField("qn", T.DoubleType()),
                T.StructField("cell", art["cell_type"]),
            ]
        ),
    )
    idx = ann_index(spark, index_dir)
    if len(needed) <= _MAX_PRUNE_CELLS:
        idx = idx.filter(F.col("cell").isin(needed))  # partition pruning
    # db-side norm hoisted BELOW the broadcast join (r12): inside the join
    # projection the O(d) fold re-ran once per (query, vec) pair — every
    # vec in a probed cell scores against every query probing that cell
    # (~12x at the bench shape). One projected column per scanned vec
    # leaves only the dot product as per-pair work; operand order
    # (qn * _vn) matches the former qn * norm(embedding) bit-exactly.
    # Measured (interleaved A/B, 60k-vector index, 100 queries, checksums
    # identical): 2.534 -> 1.705 s (1.49x).
    idx = idx.select(
        "cell", "vec_id", "embedding", V.norm(F.col("embedding")).alias("_vn")
    )
    denom = F.col("qn") * F.col("_vn")
    cand = idx.join(F.broadcast(q_cells), "cell").select(
        "qid",
        "vec_id",
        F.when(denom > 0, V.dot(F.col("qe"), F.col("embedding")) / denom).alias(
            "cosine"
        ),
    )
    if _exclude_self:
        # replay safety for the dedup probe: an already-ingested copy of
        # the query itself (same vec_id) is not a "duplicate of the corpus"
        cand = cand.filter(F.col("vec_id") != F.col("qid"))
    # a vec duplicated across batch partitions (mid-compaction crash) or
    # reachable via two probed cells must score once. Partitioning by qid
    # ALONE satisfies both the (qid, vec_id) dedup aggregate and the
    # top-k window below (hash(qid) clusters every (qid, vec_id) group),
    # so the scored candidate set crosses the wire ONCE instead of twice
    # (r11; the dedup's former (qid, vec_id) exchange fed a second
    # qid-only exchange for the window)
    cand = cand.repartition("qid")
    cand = cand.groupBy("qid", "vec_id").agg(F.max("cosine").alias("cosine"))
    wk = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= k)
        .select("qid", "vec_id", "cosine", F.col("_rn").alias("rank"))
    )


def semantic_dedup_batch(
    spark: SparkSession,
    index_dir: str,
    batch_df: DataFrame,
    threshold: float = 0.9,
    nprobe: int = 2,
) -> DataFrame:
    """SemDeDup's question at INGEST time: which incoming vectors are
    semantic near-duplicates of the standing corpus? The batch probes the
    IVF index (partition-pruned to the batch's nprobe cells) and any hit
    with cosine >= threshold marks the newcomer — the embedding twin of
    the digest (x58/x69) and band (x66) probes, so a streaming pipeline
    can drop semantically-redundant documents without ever pairing the
    corpus against itself.

    Returns the SURVIVING rows of ``batch_df`` (vec_id, embedding, label).
    Recall follows the nprobe lever (an off-cell near-dup is missed —
    the IVF trade pinned in test_ann_ingest); precision is exact, every
    drop is backed by a scored pair. A replayed batch is safe: its own
    previously-ingested vectors match at cosine ~1.0 BY vec_id, and
    same-id hits are ignored exactly like the digest probe ignores its
    own doc_id."""
    q = batch_df.select(F.col("vec_id").alias("qid"), "embedding")
    hits = (
        ann_probe(spark, index_dir, q, k=1, nprobe=nprobe, _exclude_self=True)
        .filter(F.col("cosine") >= threshold)
        .select(F.col("qid").alias("vec_id"))
    )
    return batch_df.join(hits, "vec_id", "left_anti")


def run_embedding_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream embedding parquet drops into the standing IVF index.
    Centroids must be pinned first (:func:`init_ann_index`)."""
    stream = spark.readStream.schema(EMB_SCHEMA).parquet(source_dir)

    def body(batch_df: DataFrame, batch_id: int) -> None:
        ingest_embedding_batch(spark, batch_df, batch_id, index_dir)

    writer = stream.writeStream.foreachBatch(body).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def _live_batch_dirs(index_dir: str) -> list[str]:
    return [
        d
        for d in os.listdir(index_dir)
        if d.startswith("batch_id=") and d != f"batch_id={_COMPACTED_BATCH_ID}"
    ]


def compact_ann_index(spark: SparkSession, index_dir: str) -> None:
    """Fold per-batch partitions into ``batch_id=-1`` (one file set per
    cell). Consolidated rows are written first (localCheckpoint pins them
    so the overwrite never reads its own target), per-batch partitions
    dropped after; a crash in between leaves duplicate vec_ids, which
    probes tolerate (max-per-(qid, vec_id) dedup), so the next compaction
    converges."""
    if not os.path.isdir(index_dir):
        return
    live = _live_batch_dirs(index_dir)
    if not live:
        return
    cols = ["vec_id", "embedding", "label", "cell"] + (["codes"] if has_pq(index_dir) else [])
    consolidated = (
        ann_index(spark, index_dir)
        .select(*cols)
        .dropDuplicates(["vec_id"])
        .repartition("cell")
        .withColumn("batch_id", F.lit(_COMPACTED_BATCH_ID))
        .localCheckpoint()
    )
    (
        consolidated.write.mode("overwrite")
        .partitionBy("batch_id", "cell")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(index_dir)
    )
    for d in live:
        shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)


# ---------------------------------------------------------------------------
# Generation management + the centroid-drift retrain policy — the ANN
# member of the maintenance trio (store compact / index compact / bloom
# rebuild). Centroids are immutable per generation (init_ann_index
# enforces it), so adapting to distribution drift means building the NEXT
# generation beside the current one and cutting probes over atomically —
# the standard ANN index-rotation story, here as directory layout:
#
#   <root>/gen=0/{_centroids, batch_id=*/cell=*}   (complete: _GEN_DONE)
#   <root>/gen=1/...                               (being built, no marker)
#
# ``current_generation`` resolves the highest COMPLETE generation; readers
# stay on it while a rebuild runs; the ``_GEN_DONE`` marker lands last
# (atomic create), so a crash mid-rebuild leaves an ignored partial dir
# that the next retrain wipes and rebuilds — convergent like every other
# maintenance op here.
# ---------------------------------------------------------------------------

#: sentinel marking a generation directory fully built (centroids +
#: vectors + this file, in that order)
_GEN_DONE = "_GEN_DONE"


def _gen_dirs(root: str) -> list[tuple[int, str]]:
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        if d.startswith("gen="):
            try:
                out.append((int(d.split("=", 1)[1]), os.path.join(root, d)))
            except ValueError:
                continue
    return sorted(out)


def current_generation(root: str) -> str | None:
    """Path of the newest COMPLETE generation (None before the first
    finishes). Probes and ingest resolve through this, so a half-built
    next generation is invisible until its marker lands."""
    done = [p for _n, p in _gen_dirs(root) if os.path.exists(os.path.join(p, _GEN_DONE))]
    return done[-1] if done else None


def _write_gen_marker(gen_dir: str, n_vectors: int) -> None:
    """Publish the completion marker, recording the vector count the
    generation was built over (the retrain policy's growth baseline)."""
    import json

    tmp = os.path.join(gen_dir, _GEN_DONE + ".tmp")
    with open(tmp, "w") as f:
        f.write(json.dumps({"n_vectors_at_build": int(n_vectors)}))
    os.replace(tmp, os.path.join(gen_dir, _GEN_DONE))


def _n_at_build(gen_dir: str) -> int:
    """Vector count recorded in the generation marker (0 for legacy empty
    markers — the permissive direction: retrain stays allowed)."""
    import json

    try:
        with open(os.path.join(gen_dir, _GEN_DONE)) as f:
            return int(json.load(f).get("n_vectors_at_build", 0))
    except (OSError, ValueError):
        return 0


def init_ann_generations(spark: SparkSession, root: str, centroids: DataFrame) -> str:
    """Create generation 0 under ``root`` with the given centroids and
    mark it complete (empty index, ready for ingest)."""
    gen0 = os.path.join(root, "gen=0")
    init_ann_index(spark, gen0, centroids)
    _write_gen_marker(gen0, 0)
    return gen0


def describe_ann_index(spark: SparkSession, index_dir: str) -> dict:
    """describe()-grade balance stats for one generation: vector count,
    configured cell count, occupancy skew (``max_cell_frac`` — the share
    of the corpus in the fullest cell; 1/k when perfectly balanced) and
    the empty-cell fraction. One cell-keyed count over the index — the
    same cadence-cheap shape as the SCD2 store's describe()."""
    k = load_centroids(spark, index_dir).count()
    if not any(d.startswith("batch_id=") for d in os.listdir(index_dir)):
        return {
            "n_vectors": 0,
            "n_cells": k,
            "occupied_cells": 0,
            "max_cell_frac": 0.0,
            "empty_cell_frac": 1.0,
        }
    per_cell = ann_index(spark, index_dir).groupBy("cell").agg(
        F.count_distinct("vec_id").alias("n")
    )
    row = per_cell.agg(
        F.sum("n").alias("total"), F.max("n").alias("mx"), F.count(F.lit(1)).alias("occupied")
    ).collect()[0]
    total = int(row["total"] or 0)
    return {
        "n_vectors": total,
        "n_cells": k,
        "occupied_cells": int(row["occupied"]),
        "max_cell_frac": round(int(row["mx"]) / total, 4) if total else 0.0,
        "empty_cell_frac": round(1.0 - int(row["occupied"]) / k, 4),
    }


def maybe_retrain(
    spark: SparkSession,
    root: str,
    balance_factor: float = 4.0,
    empty_frac_threshold: float = 0.5,
    min_vectors: int = 1024,
    rows_per_cell: int | None = None,
    iters: int = 2,
) -> str | None:
    """Retrain-on-drift policy, batch-cadence cheap: read the current
    generation's balance stats; when the fullest cell holds more than
    ``balance_factor`` times its fair share (1/k) — the signature of
    incoming data drifting away from the trained centroids — or more than
    ``empty_frac_threshold`` of cells sit empty, build the next
    generation: train fresh centroids FROM the standing vectors, re-ingest
    them (one batch 0, same assignment path as streaming), and publish the
    completion marker last. Returns the new generation dir, or None when
    balanced (a no-op costs one count aggregate). ``rows_per_cell`` grows
    k with the corpus (k = n/rows_per_cell, the deployment policy);
    default keeps the current k. Below ``min_vectors`` nothing retrains —
    tiny indexes are always "skewed".

    A crash anywhere mid-build leaves a marker-less dir: readers never see
    it, and the next call wipes and rebuilds it — convergent."""
    cur = current_generation(root)
    if cur is None:
        return None
    stats = describe_ann_index(spark, cur)
    n, k = stats["n_vectors"], stats["n_cells"]
    if n < min_vectors:
        return None
    # growth gate — the universal churn breaker: a policy rebuild over the
    # SAME vectors is deterministic, so if the data hasn't materially grown
    # since this generation was built, rebuilding again would reproduce it
    # (a skew the retrain could not fix — e.g. genuinely concentrated data
    # — must not trigger a rebuild per batch forever)
    if n < 1.1 * _n_at_build(cur):
        return None
    skewed = stats["max_cell_frac"] > balance_factor / k
    hollow = stats["empty_cell_frac"] > empty_frac_threshold
    if not (skewed or hollow):
        return None
    if rows_per_cell:
        new_k = max(4, n // rows_per_cell)
    elif hollow:
        # a mostly-empty index means k exceeds the data's support: a
        # retrain at the SAME k would likely leave cells empty again and
        # the policy would churn a new generation every batch. Shrink to
        # the occupied count (Lloyd seeds are data points, so these cells
        # have members) — one retrain, then quiescent. (When ALSO skewed,
        # the retrain itself redistributes the fat cell.)
        new_k = max(2, stats["occupied_cells"])
    else:
        new_k = k
    if hollow and not skewed and new_k == k:
        return None  # the shrink would be structural no-op; never churn
    cur_n = int(os.path.basename(cur).split("=", 1)[1])
    nxt = os.path.join(root, f"gen={cur_n + 1}")
    if os.path.isdir(nxt):  # crashed previous attempt (no marker, or it
        # would BE current): wipe and rebuild
        shutil.rmtree(nxt)
    vectors = (
        ann_index(spark, cur)
        .select("vec_id", "embedding", "label")
        .dropDuplicates(["vec_id"])
        .localCheckpoint()  # pin: the rebuild must not re-read mid-swap state
    )
    init_ann_index(spark, nxt, train_centroids(spark, vectors, k=new_k, iters=iters))
    if has_pq(cur):
        # a PQ generation stays a PQ generation: fresh per-subspace
        # codebook from the same snapshot, pinned before the re-ingest so
        # batch 0 lands with codes; a residual generation stays residual,
        # trained against the NEW generation's just-pinned centroids
        shape = load_pq_codebook(spark, cur).select(F.max("s"), F.max("code")).first()
        residual = pq_is_residual(cur)
        init_pq(
            spark,
            nxt,
            train_pq_codebook(
                spark,
                vectors,
                m=int(shape[0]) + 1,
                k=int(shape[1]) + 1,
                centroids=load_centroids(spark, nxt) if residual else None,
            ),
            by_residual=residual,
        )
    ingest_embedding_batch(spark, vectors, 0, nxt)
    _write_gen_marker(nxt, n)
    return nxt


def maybe_compact_ann(spark: SparkSession, index_dir: str, max_live_batches: int = 64) -> bool:
    """Threshold compaction policy for one ANN generation — the IVF
    member of the maintenance-cadence family (``maybe_compact_indexes``,
    ``ScdParquetStore.maybe_compact``): fold per-batch partitions into
    the consolidated ``batch_id=-1`` once more than ``max_live_batches``
    have accumulated. Listing-cost only (one listdir) under threshold;
    returns True when a compaction ran."""
    if os.path.isdir(index_dir) and len(_live_batch_dirs(index_dir)) > max_live_batches:
        compact_ann_index(spark, index_dir)
        return True
    return False


def run_embedding_stream_generations(
    spark: SparkSession,
    source_dir: str,
    root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    auto_retrain: bool = False,
    reclaim_old: bool = False,
    auto_compact: bool = False,
    max_live_batches: int = 64,
    **policy,
):
    """Generation-aware embedding stream: every microbatch lands in the
    CURRENT generation, and with ``auto_retrain`` the drift policy runs at
    batch cadence inside the same foreachBatch body — the ANN analog of
    ``run_corpus_stream(auto_compact=True)``. Because ingest and retrain
    run serially in the batch body, a rebuild's vector snapshot always
    includes every batch already applied (no ingest/swap race). A crash
    between retrain and the checkpoint commit replays the batch into the
    NEW generation; its rows then exist both there (batch partition) and
    in the rebuild snapshot (batch 0) — probes dedup on vec_id and
    compaction folds the duplicates, the same tolerance the mid-compaction
    crash already relies on. ``reclaim_old`` drops superseded generations
    after a successful retrain; ``auto_compact`` additionally runs the
    :func:`maybe_compact_ann` threshold fold on the current generation
    each batch (listdir-cheap under threshold). Extra ``policy`` kwargs
    pass through to :func:`maybe_retrain`. Generation 0 must exist
    (:func:`init_ann_generations`)."""
    stream = spark.readStream.schema(EMB_SCHEMA).parquet(source_dir)

    def body(batch_df: DataFrame, batch_id: int) -> None:
        gen = current_generation(root)
        if gen is None:
            raise ValueError(f"{root}: no complete ANN generation; run init_ann_generations first")
        ingest_embedding_batch(spark, batch_df, batch_id, gen)
        if auto_retrain and maybe_retrain(spark, root, **policy) is not None and reclaim_old:
            drop_old_generations(root, keep=1)
        if auto_compact:
            maybe_compact_ann(spark, current_generation(root), max_live_batches=max_live_batches)

    writer = stream.writeStream.foreachBatch(body).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def drop_old_generations(root: str, keep: int = 1) -> list[str]:
    """Reclaim superseded COMPLETE generations, newest ``keep`` retained.
    In-flight readers finish from open handles (POSIX); new probes already
    resolve to the current generation."""
    done = [p for _n, p in _gen_dirs(root) if os.path.exists(os.path.join(p, _GEN_DONE))]
    dropped = done[:-keep] if keep else done
    for p in dropped:
        shutil.rmtree(p, ignore_errors=True)
    return dropped


__all__ = [
    "semantic_dedup_batch",
    "EMB_SCHEMA",
    "train_pq_codebook",
    "init_pq",
    "has_pq",
    "load_pq_codebook",
    "pq_encode",
    "pq_is_residual",
    "ann_probe_adc",
    "ann_probe_adc_rerank",
    "train_centroids",
    "assign_cells",
    "init_ann_index",
    "load_centroids",
    "ingest_embedding_batch",
    "ann_index",
    "ann_probe",
    "run_embedding_stream",
    "compact_ann_index",
    "current_generation",
    "init_ann_generations",
    "describe_ann_index",
    "maybe_retrain",
    "run_embedding_stream_generations",
    "maybe_compact_ann",
    "drop_old_generations",
]
