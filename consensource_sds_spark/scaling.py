"""Scaling-curve measurement: does the engine grow LINEARLY with data?

Plan pins (bucketed probes, banded joins, broadcast guards) prove a query
is SHAPED right; this module measures that the shape holds — each stage of
the dedup/ingest/ANN family runs against a generated 1x corpus and a
generated ``factor``x corpus (same deterministic generator, same planted
dup/skew RATES — see ``sources/synth.py``) and reports the wall-clock
ratio. A stage whose ratio blows past the data ratio has a superlinear
term a plan pin structurally cannot catch (candidate-pair explosion,
growing driver collect, accidental re-scan) — ``tests/test_scaling.py``
asserts every ratio stays below ``factor * 1.5``.

At bench scale Spark's fixed per-job overheads (task launch, planning)
make ratios LAND well under the data ratio — sublinear-looking numbers
mean overhead amortization, not magic. The pin is one-sided: ratios far
ABOVE the data ratio are the defect being hunted.

Methodology: per (stage, scale) the stage runs twice and the MIN is kept
(first run absorbs codegen; min rides out host CPU steal — the same
discipline as bench.py's headline). Streaming/ANN stages clean their
standing state between runs so both runs measure the same work.
"""

from __future__ import annotations

import contextlib
import math
import os
import shutil
import tempfile
import time
from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def scaled_shuffle_partitions(spark: SparkSession, n_rows: int) -> int:
    """Reduce-side parallelism derived from the input size (guide §2.2:
    size partitions to the data, not to a constant tuned for one scale).

    The bench session's latency-tuned default (``cpus // 4``) is sized for
    sf0.1's <10 MB shuffles, where extra reduce tasks only add scheduling
    latency. The scaled corpora this module generates move 10-30x their
    zstd-parquet bytes through the wide stages (token/window explodes), so
    past the toy floor every core should hold a reduce partition: measured
    at the 30x corpus on 32 cores, partitions=32 vs the session's 8 gives
    x76 1.58x, x77 1.33x, x07 1.29x, bpe_train 1.67x, ann_probe 1.11x
    (interleaved min-of-3, checksums identical); 64 is slightly worse, and
    AQE coalescing from 64 loses to right-sized static locally (50-100 ms
    re-planning per shuffle). On 8 cores the same rule lands ~30 partitions
    and measures equal to the 8-core optimum (within noise), so the
    low-core bench run is not penalized.

    ``rows / SPARK_GRAFT_ROWS_PER_SHUFFLE_PARTITION`` (default 5,000 — one
    generator-shaped partition per base corpus), clamped between the
    session's configured default and 4x ``defaultParallelism``. On a real
    cluster set the env to land partitions in the guide's 100 MB-1 GB
    band for the deployment's row width; the clamp keeps the derivation
    from ever starving (below the session floor) or shattering (above 4x
    the cores) a stage."""
    rows_per = int(os.environ.get("SPARK_GRAFT_ROWS_PER_SHUFFLE_PARTITION", "5000"))
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hi = 4 * spark.sparkContext.defaultParallelism
    return max(sess, min(math.ceil(n_rows / max(rows_per, 1)), hi))


@contextlib.contextmanager
def _shuffle_parts(spark: SparkSession, n_rows: int):
    """Scope ``spark.sql.shuffle.partitions`` to the size-derived value for
    one stage run, restoring the session default afterwards."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(scaled_shuffle_partitions(spark, n_rows)))
    try:
        yield
    finally:
        spark.conf.set(key, prev)

#: registry queries covering the x-family cost shapes: exact dedup
#: (hash-agg), MinHash (wide projection), SimHash banding (candidate pair
#: join), brute top-k (bounded broadcast), quality scoring (scan-shaped),
#: repetition signals (explode+agg), domain cap (window over over-cap
#: only), boilerplate scrub (chunk explode + tiny broadcast), SemDeDup
#: (label-keyed pair join — THE quadratic-unless-bounded one), centroid
#: pruning (per-(label, i) collect-and-fold — state bounded by cluster
#: size, which the generator holds constant as labels grow).
SCALING_QUERIES = (
    "x01_dedup_exact",
    "x02_minhash_signatures",
    "x07_simhash_neardup",
    "x10_cosine_topk",
    "x21_quality_score",
    "x33_repetition_signals",
    "x61_domain_doc_cap",
    "x64_boilerplate_scrub",
    "x65_semantic_dedup",
    "x76_exact_substring_matches",
    "x77_exact_substring_scrub",
    "x82_centroid_outlier_prune",
)


def _timed(fn: Callable[[], None], runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


#: the deep-scale set — the stages whose measured 10x exponent runs
#: closest to linear-in-pairs rather than linear-in-bytes, and therefore
#: the most likely to CURVE past the first measured decade: the substring
#: family (stride-1 window relations, the honest linear cost of EXACT
#: matching — r7's worst 10x ratio at 9.0), SimHash banding (whose r9
#: 30x point CAUGHT the 32-bit signature's band saturation at ratio 45 —
#: the rework to Manku 3-of-6 block keys measures 2.8; this pin is what
#: keeps that fixed), and SemDeDup's label-keyed pair join (the steepest
#: remaining 10x stage at ~6.5; 30x measures 6.1 — fixed-cost
#: amortization, not a curve). They get a second, deeper scale point;
#: the batched BPE trainer (driver-looped by design) rides along in the
#: same deep block as a custom stage.
DEEP_SCALE_QUERIES = (
    "x76_exact_substring_matches",
    "x77_exact_substring_scrub",
    "x07_simhash_neardup",
    "x65_semantic_dedup",
)


def measure_scaling(
    spark: SparkSession,
    base_docs: int = 5_000,
    base_vectors: int = 2_000,
    factor: int = 10,
    queries: tuple[str, ...] = SCALING_QUERIES,
    runs: int = 2,
    stream_batches: int = 3,
    deep_factor: int | None = 30,
) -> dict:
    """Run every scaling stage at 1x and ``factor``x; return
    ``{"factor": f, "base_docs": n, "stages": {name: {"t1_sec", "tN_sec",
    "ratio"}}}``. Stage timings are min-of-``runs``.

    ``deep_factor`` adds one more decade of evidence for the steepest
    stages (``DEEP_SCALE_QUERIES`` — the substring family + SimHash
    banding — plus the batched BPE trainer): a ``factor{deep_factor}``
    sub-block with adjacent-t1-paired ratios — superlinear
    candidate-pair terms that hide inside a 10x ratio's overhead damping
    show up at 30x. ``None`` (or a value equal to ``factor``) disables
    it; it is also skipped when ``queries`` was narrowed past every
    deep-eligible query (the BPE deep stage rides with the block, not
    alone)."""
    from consensource_sds_spark.corpus import build_training_corpus
    from consensource_sds_spark.queries import REGISTRY, all_queries
    from consensource_sds_spark.queries.extensions import _bpe_train_merges_incremental
    from consensource_sds_spark.sources.synth import generate_bpe_text, write_corpus
    from consensource_sds_spark.streaming.ann_ingest import (
        ann_probe,
        ingest_embedding_batch,
        init_ann_index,
        train_centroids,
    )
    from consensource_sds_spark.streaming.corpus_ingest import _index_table_name, ingest_batch

    all_queries()
    # session hygiene: when this runs late in a long bench session, cached
    # pooled tables and checkpoint RDDs from earlier blocks raise old-gen
    # GC pressure that can inflate a single stage's wall-clock several
    # fold (observed: one stage 0.6 s in isolation, 6.7 s mid-session) —
    # exactly the kind of noise a RATIO pin cannot tolerate. Drop the
    # caches and hint a full GC so every stage starts from the same heap
    # state; pool entries are EVICTED (not just uncached) so the stage
    # queries' load() calls rebuild real caches (see queries.drop_pool).
    from consensource_sds_spark.queries import drop_pool

    drop_pool(spark)
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    work = tempfile.mkdtemp(prefix="scaling_")
    out: dict[str, dict] = {}
    try:
        dirs: dict[int, str] = {}
        for s in (1, factor):
            dirs[s] = write_corpus(
                spark, os.path.join(work, f"scale{s}"), base_docs * s, base_vectors * s
            )

        def stage(
            name: str,
            fn1: Callable[[], None],
            fnN: Callable[[], None],
            rows1: int = base_docs,
            rowsN: int = base_docs * factor,
        ) -> None:
            # each scale point runs at its size-derived reduce parallelism
            # (see scaled_shuffle_partitions) — the ratio then compares the
            # operator as each scale would actually be deployed, instead of
            # charging the Nx side for the 1x side's latency-tuned config
            with _shuffle_parts(spark, rows1):
                t1 = _timed(fn1, runs)
            with _shuffle_parts(spark, rowsN):
                tN = _timed(fnN, runs)
            out[name] = {
                "t1_sec": round(t1, 3),
                f"t{factor}_sec": round(tN, 3),
                "ratio": round(tN / t1, 2) if t1 > 0 else None,
            }

        for q in queries:
            fn = REGISTRY[q].fn
            stage(
                q,
                lambda fn=fn: _noop_write(fn(spark, dirs[1])),
                lambda fn=fn: _noop_write(fn(spark, dirs[factor])),
            )

        def corpus_build(scale: int) -> None:
            dest = os.path.join(work, f"cb{scale}")
            try:
                build_training_corpus(spark, dirs[scale], dest, domain_cap=50 * scale, n_shards=16).collect()
            finally:
                shutil.rmtree(dest, ignore_errors=True)

        stage("corpus_build", lambda: corpus_build(1), lambda: corpus_build(factor))

        def corpus_stream(scale: int) -> None:
            # standing-index ingest: the batches ACCUMULATE index state, so
            # each run starts clean and replays the same batch sequence
            dest = os.path.join(work, f"cs{scale}")
            corpus = os.path.join(dest, "corpus")
            idx = corpus + "_digest_index"
            band = corpus + "_band_index"
            fp = corpus + "_fp_index"
            docs = spark.read.parquet(os.path.join(dirs[scale], "documents.parquet"))
            try:
                for b in range(stream_batches):
                    batch = docs.filter(F.pmod(F.hash("doc_id"), stream_batches) == b)
                    ingest_batch(
                        spark, batch, b, corpus, idx, n_shards=8,
                        band_dir=band, fingerprint_dir=fp,
                    )
            finally:
                for d in (idx, band, fp):
                    spark.sql(f"DROP TABLE IF EXISTS {_index_table_name(d)}")
                shutil.rmtree(dest, ignore_errors=True)

        stage("corpus_stream", lambda: corpus_stream(1), lambda: corpus_stream(factor))

        def bpe_train(scale: int) -> None:
            # incremental-pair-count BPE trainer (r11; merge table
            # property-pinned == the batched recount's): merge count and
            # batch size FIXED across scales, so rounds — and with them
            # driver actions — are identical at 1x and Nx; the text comes
            # from generate_bpe_text, whose DISTINCT-WORD count grows
            # ~linearly with the corpus (the documents table's fixed synth
            # vocabulary would make every post-scan round scale-invariant
            # and the ratio a near-vacuous ~1), so the ratio measures the
            # one-time full count + per-round DELTA jobs' corpus dependence
            _bpe_train_merges_incremental(
                spark, generate_bpe_text(spark, base_docs * scale), 32, batch_m=8
            )

        stage("bpe_train", lambda: bpe_train(1), lambda: bpe_train(factor))

        def ann(scale: int, probe_out: dict) -> None:
            dest = os.path.join(work, f"ann{scale}")
            emb = spark.read.parquet(os.path.join(dirs[scale], "embeddings.parquet"))
            # k held FIXED across scales: training cost is n*k*dim, so a
            # scale-proportional k would make the 10x build pay 100x by
            # DESIGN (the deployment policy grows k ~ sqrt(n), a documented
            # IVF trade) — fixing k isolates the engine's n-dependence,
            # which is what this pin is hunting; cells grow 10x and the
            # nprobe=2 probe should grow ~linearly with cell size.
            k = 16
            # build is min-of-``runs`` like every other stage (the ratio pin
            # cannot tolerate one mid-session GC stall); each run builds into
            # a fresh dir, the probe reads the last one
            dests = [f"{dest}_{r}" for r in range(runs)]
            try:
                build = float("inf")
                for d in dests:
                    t0 = time.perf_counter()
                    init_ann_index(spark, d, train_centroids(spark, emb, k=k, iters=2))
                    ingest_embedding_batch(spark, emb.select("vec_id", "embedding", "label"), 0, d)
                    build = min(build, time.perf_counter() - t0)
                probe_out["build"] = build
                q = emb.filter(F.col("vec_id") < 100).select(F.col("vec_id").alias("qid"), "embedding")
                probe_out["probe"] = _timed(
                    lambda: _noop_write(ann_probe(spark, dests[-1], q, k=10, nprobe=2)), runs
                )
            finally:
                for d in dests:
                    shutil.rmtree(d, ignore_errors=True)

        ann1: dict = {}
        annN: dict = {}
        with _shuffle_parts(spark, base_vectors):
            ann(1, ann1)
        with _shuffle_parts(spark, base_vectors * factor):
            ann(factor, annN)
        for part in ("build", "probe"):
            out[f"ann_{part}"] = {
                "t1_sec": round(ann1[part], 3),
                f"t{factor}_sec": round(annN[part], 3),
                "ratio": round(annN[part] / ann1[part], 2) if ann1[part] > 0 else None,
            }

        deep_out: dict[str, dict] | None = None
        deep_queries = tuple(q for q in DEEP_SCALE_QUERIES if q in queries)
        if deep_factor and deep_factor != factor and deep_queries:
            # documents-only corpus: the deep-scale stages never read
            # embeddings, so the deep-scale dir keeps vectors at base size
            dir_deep = write_corpus(
                spark,
                os.path.join(work, f"scale{deep_factor}"),
                base_docs * deep_factor,
                base_vectors,
            )
            # this pass runs LAST, after corpus/stream/ANN stages have
            # raised heap pressure — re-run the session hygiene AND
            # re-measure the 1x side HERE, so the ratio pairs a late-session
            # numerator with a late-session denominator (pairing it with the
            # start-of-session t1 would let mid-session GC inflation
            # masquerade as superlinearity)
            drop_pool(spark)
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            deep_out = {}
            for q in deep_queries:
                fn = REGISTRY[q].fn
                with _shuffle_parts(spark, base_docs):
                    t1 = _timed(lambda fn=fn: _noop_write(fn(spark, dirs[1])), runs)
                with _shuffle_parts(spark, base_docs * deep_factor):
                    tN = _timed(lambda fn=fn: _noop_write(fn(spark, dir_deep)), runs)
                deep_out[q] = {
                    "t1_sec": round(t1, 3),
                    f"t{deep_factor}_sec": round(tN, 3),
                    "ratio": round(tN / t1, 2) if t1 > 0 else None,
                }
            # the incremental BPE trainer's deep point: same adjacent-t1
            # pairing (its own 1x re-run, not the start-of-session one).
            # Merge count and batch size stay FIXED across scales; with
            # the standing counts table the per-round recount is gone, so
            # the remaining corpus dependence is the one-time initial
            # count + the touched-row deltas (r10 verdict #5's lever).
            with _shuffle_parts(spark, base_docs):
                bpe_t1 = _timed(lambda: bpe_train(1), runs)
            with _shuffle_parts(spark, base_docs * deep_factor):
                bpe_tN = _timed(lambda: bpe_train(deep_factor), runs)
            deep_out["bpe_train"] = {
                "t1_sec": round(bpe_t1, 3),
                f"t{deep_factor}_sec": round(bpe_tN, 3),
                "ratio": round(bpe_tN / bpe_t1, 2) if bpe_t1 > 0 else None,
            }

            # ANN probe deep points (r9 verdict item #4): the heaviest
            # standing-index stages without a 30x row. A VECTORS-deep
            # corpus (docs stay at base — the probes never read them);
            # centroid count k FIXED like the 10x block, so cells grow
            # 30x and a fixed-size probe's candidate set grows ~30x —
            # the ratio isolates the engine's n-dependence. The PQ
            # codebook uses the production 256-codeword size, which also
            # puts the ADC size gate's flip point in measurable range:
            # the SMALL probe (100 queries x nprobe 2 = 200 pairs,
            # ~3 MB of fused tables) must take the fused one-join shape,
            # the WIDE probe (600 queries x nprobe 4 = 2400 pairs,
            # ~39 MB) must flip to the decomposed three-broadcast shape
            # — both observed via the probe's per-call shape_out record,
            # not inferred from the threshold arithmetic.
            from consensource_sds_spark.streaming.ann_ingest import (
                ann_probe_adc,
                init_pq,
                train_pq_codebook,
            )

            dir_deep_vec = write_corpus(
                spark,
                os.path.join(work, f"vecs{deep_factor}"),
                base_docs,
                base_vectors * deep_factor,
            )

            def ann_deep(src_dir: str, tag: str, probe_out: dict) -> None:
                d = os.path.join(work, f"ann_deep_{tag}")
                emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
                try:
                    cent = train_centroids(spark, emb, k=16, iters=1)
                    init_ann_index(spark, d, cent)
                    init_pq(
                        spark,
                        d,
                        train_pq_codebook(spark, emb, m=8, k=256, iters=0, centroids=cent),
                        by_residual=True,
                    )
                    ingest_embedding_batch(
                        spark, emb.select("vec_id", "embedding", "label"), 0, d
                    )
                    q = emb.filter(F.col("vec_id") < 100).select(
                        F.col("vec_id").alias("qid"), "embedding"
                    )
                    probe_out["probe"] = _timed(
                        lambda: _noop_write(ann_probe(spark, d, q, k=10, nprobe=2)), runs
                    )
                    shape_small: dict = {}
                    probe_out["probe_adc"] = _timed(
                        lambda: _noop_write(
                            ann_probe_adc(spark, d, q, k=10, nprobe=2, shape_out=shape_small)
                        ),
                        runs,
                    )
                    probe_out["adc_shape_small"] = shape_small.get("shape")
                    qw = emb.filter(F.col("vec_id") < 600).select(
                        F.col("vec_id").alias("qid"), "embedding"
                    )
                    shape_wide: dict = {}
                    _noop_write(ann_probe_adc(spark, d, qw, k=10, nprobe=4, shape_out=shape_wide))
                    probe_out["adc_shape_wide"] = shape_wide.get("shape")
                finally:
                    shutil.rmtree(d, ignore_errors=True)

            deep1: dict = {}
            deepN: dict = {}
            with _shuffle_parts(spark, base_vectors):
                ann_deep(dirs[1], "1", deep1)
            with _shuffle_parts(spark, base_vectors * deep_factor):
                ann_deep(dir_deep_vec, str(deep_factor), deepN)
            for part, name in (("probe", "ann_probe"), ("probe_adc", "ann_probe_adc")):
                deep_out[name] = {
                    "t1_sec": round(deep1[part], 3),
                    f"t{deep_factor}_sec": round(deepN[part], 3),
                    "ratio": round(deepN[part] / deep1[part], 2) if deep1[part] > 0 else None,
                }
            deep_out["ann_probe_adc"]["shape_small"] = deepN["adc_shape_small"]
            deep_out["ann_probe_adc"]["shape_wide"] = deepN["adc_shape_wide"]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    result = {
        "factor": factor,
        "base_docs": base_docs,
        "base_vectors": base_vectors,
        "stages": out,
    }
    if deep_out is not None:
        result[f"factor{deep_factor}"] = {
            "factor": deep_factor,
            "stages": deep_out,
        }
    return result


__all__ = [
    "measure_scaling",
    "scaled_shuffle_partitions",
    "SCALING_QUERIES",
    "DEEP_SCALE_QUERIES",
]
