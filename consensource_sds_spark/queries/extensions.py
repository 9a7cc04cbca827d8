"""Training-data-pipeline operators: dedup, similarity search, text analysis.

These are the driver-mandated extensions beyond the reference's own surface
(SURVEY §2.8): each is a first-class oracle-checked query over the
``documents`` / ``embeddings`` tables. Determinism rules: hashing is md5
(identical hex in Spark and DuckDB), minhash seeds are fixed integers,
tie-breaks are explicit.

Scale design per operator is noted in the docstrings — the local plans are
the same ones that hold on a 1000-executor cluster (shuffle keys are
shingle/band/bucket ids, never doc x doc cross joins, except where a
bounded query set makes the cross join broadcast-sized).
"""

from __future__ import annotations

import itertools as _it

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from consensource_sds_spark.functions import checkpoints as CKPT
from consensource_sds_spark.functions import text as TXT
from consensource_sds_spark.functions import vectors as V
from consensource_sds_spark.queries import (
    finite_embeddings_oracle as _finite_embeddings,
    load,
    load_finite_embeddings as _load_finite_embeddings,
    local_hint,
    register,
)

# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------


@register(
    "x01_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def x01_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content digest; keep lowest doc_id.
    Scale: one shuffle on the digest; partial agg makes it map-side cheap."""
    d = load(spark, sf_dir, "documents")
    # group on the digest's 16 raw bytes (unhex), rebuild the identical
    # lowercase hex result post-agg: same equality, half the bytes in the
    # agg hash table and on the digest exchange (r11, narrower types)
    return (
        d.groupBy(F.unhex(F.md5("text")).alias("_ch"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .select(
            F.lower(F.hex("_ch")).alias("content_hash"), "keep_doc_id", "n_copies"
        )
    )


def minhash_signatures_frame(d):
    """x02's signature construction over ANY (doc_id, text) frame — the
    batch registry entry below and the streaming band-index ingest
    (streaming/corpus_ingest.py) share this one implementation, so a
    streamed document gets the IDENTICAL signature its batch twin would.
    No per-seed explode: each shingle row computes the 8 slice columns and
    one groupBy(doc_id) takes 8 MINs (map-side partial agg)."""
    # SQL-string expressions: one parse per column vs dozens of client->JVM
    # Column round trips (plan-build latency, not plan shape).
    toks = "split(text, ' ')"
    sh = d.select(
        "doc_id",
        F.expr(
            f"explode(array_distinct(zip_with(slice({toks}, 1, size({toks}) - 1),"
            f" slice({toks}, 2, size({toks}) - 1), (a, b) -> concat_ws(' ', a, b)))) AS sh"
        ),
    )
    h0, h1 = "md5(sh)", "md5(concat('x:', sh))"
    # NOTE (r11, measured-and-rejected): converting the 8 string MINs to
    # BIGINT mins (conv base 16) flips SortAggregate -> HashAggregate in
    # the plan, but an isolated interleaved A/B at 50k docs measured it
    # ~15% SLOWER (0.835 -> 0.967 s): doc-ordered input makes the sort
    # near-free while conv costs 8 string parses per shingle. Kept as the
    # string form; see OPTIMIZATION_r11.md.
    sig = sh.groupBy("doc_id").agg(
        *[
            F.expr(f"min(substring({h0 if s < 4 else h1}, {(s % 4) * 8 + 1}, 8)) AS h{s}")
            for s in range(8)
        ]
    )
    stack = ", ".join(f"{s}L, h{s}" for s in range(8))
    return sig.selectExpr("doc_id", f"stack(8, {stack}) AS (seed, minhash)")


def minhash_band_values(d):
    """(doc_id, band, band_val) LSH band table for ANY (doc_id, text)
    frame — x03's banding over :func:`minhash_signatures_frame`; the
    probe key of the standing band index (x66 / streaming ingest)."""
    sig = minhash_signatures_frame(d)
    return (
        sig.withColumn("band", (F.col("seed") / 2).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "|",
                F.array_sort(F.collect_list(F.struct("seed", "minhash"))).getField("minhash"),
            ).alias("band_val")
        )
    )



@register(
    "x02_minhash_signatures",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    )
    SELECT doc_id, seed,
           MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                      CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
    FROM hashed, (SELECT UNNEST(range(8)) AS seed)
    GROUP BY doc_id, seed
    """,
)

def x02_minhash_signatures(spark, sf_dir):
    """MinHash signatures over word-2-shingles: 8 slots = 8-hex-char slices
    of two md5 digests (md5(sh), md5('x:'||sh)). MIN over fixed-width
    lowercase hex is numeric MIN, so slot values stay engine-portable while
    hashing costs 2 digests per shingle, not 8.

    Scale/plan: see :func:`minhash_signatures_frame` (the shared
    implementation). The wide signature unpivots to (doc_id, seed,
    minhash) rows."""
    return minhash_signatures_frame(load(spark, sf_dir, "documents"))


@register(
    "x03_minhash_lsh_pairs",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    ), sig AS (
      SELECT doc_id, seed,
             MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                        CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
      FROM hashed, (SELECT UNNEST(range(8)) AS seed)
      GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 2 AS band, STRING_AGG(minhash, '|' ORDER BY seed) AS band_val
      FROM sig GROUP BY doc_id, seed // 2
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                             AND a.doc_id < b.doc_id
    """,
)
def x03_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH near-dup candidates: 4 bands x 2 rows; docs sharing a
    band value are candidates. Scale: the join key is (band, band_val) — a
    bucket join, never doc x doc; hot buckets = actual near-dup clusters.
    Banding comes from :func:`minhash_band_values` — the SAME helper the
    standing streaming band index probes with, so the batch LSH family and
    the incremental index can never desynchronize."""
    bands = minhash_band_values(load(spark, sf_dir, "documents"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "x44_minhash_jaccard_estimate",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    ), sig AS (
      SELECT doc_id, seed,
             MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                        CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
      FROM hashed, (SELECT UNNEST(range(8)) AS seed)
      GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 2 AS band, STRING_AGG(minhash, '|' ORDER BY seed) AS band_val
      FROM sig GROUP BY doc_id, seed // 2
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                               AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) / 8.0, 4)
             AS est_jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.doc_a
    JOIN sig sb ON sb.doc_id = p.doc_b AND sb.seed = sa.seed
    GROUP BY p.doc_a, p.doc_b
    """,
)
def x44_minhash_jaccard_estimate(spark, sf_dir):
    """MinHash Jaccard ESTIMATION over the LSH candidates: matching-slot
    fraction of the 8-slot signatures — the cheap ranking pass between
    candidate generation (x03) and exact verification (x04) that lets a
    100 TB pipeline verify only high-estimate pairs.

    Scale/plan: pure equi joins — pairs join the signature table per side
    on doc id + seed (signatures are 8 rows/doc, so the join input is
    O(pairs x 8), never corpus-sized), then an 8-row-per-pair count."""
    pairs = x03_minhash_lsh_pairs(spark, sf_dir)
    sig = x02_minhash_signatures(spark, sf_dir)
    sa = sig.selectExpr("doc_id AS doc_a", "seed", "minhash AS ma")
    sb = sig.selectExpr("doc_id AS doc_b", "seed", "minhash AS mb")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0)) / 8.0, 4
            ).alias("est_jaccard")
        )
    )


@register(
    "x04_ngram_jaccard_pairs",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    ), sig AS (
      SELECT doc_id, seed,
             MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                        CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
      FROM hashed, (SELECT UNNEST(range(8)) AS seed)
      GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 2 AS band, STRING_AGG(minhash, '|' ORDER BY seed) AS band_val
      FROM sig GROUP BY doc_id, seed // 2
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                               AND a.doc_id < b.doc_id
    ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_both
      FROM cand c JOIN sh a ON a.doc_id = c.doc_a
                  JOIN sh b ON b.doc_id = c.doc_b AND a.sh = b.sh
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 4) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) >= 0.5
    """,
)
def x04_ngram_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard verify behind the LSH prefilter — the production
    near-dedup composition: x03's candidate pairs (never doc x doc) are
    verified by exact shingle Jaccard (|A∩B| via an inverted-index join
    restricted to candidates, |A∪B| = |A|+|B|-|A∩B|), keeping pairs with
    jaccard >= 0.5.

    Scale: the expensive join runs only over LSH candidates, so its size is
    O(near-dup pairs), not O(n^2); shingle lists shuffle once on doc_id."""
    cand = x03_minhash_lsh_pairs(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(F.array_distinct(TXT.shingles(F.col("text")))).alias("sh"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        cand.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, (F.col("doc_b") == F.col("b.doc_id")) & (F.col("a.sh") == F.col("b.sh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("both"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("both").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("both"))
    # sizes is CORPUS-sized (one row per doc), not a dimension: a static
    # broadcast would OOM executors at the scale this query advertises —
    # local_hint broadcasts only in the local profile and leaves the
    # strategy to AQE's runtime sizing on a cluster
    return (
        inter.join(local_hint(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(local_hint(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "x05_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), n AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT AS n0,
             ('0x' || substr(md5(tok), 9, 8))::BIGINT AS n1
      FROM tok
    ), bits AS (
      SELECT doc_id, half, bitpos,
             SUM((((CASE WHEN half = 0 THEN n0 ELSE n1 END)
                   >> CAST(4 * (7 - bitpos // 4) + bitpos % 4 AS BIGINT)) & 1) * 2 - 1) AS weight
      FROM n, (SELECT UNNEST(range(2)) AS half), (SELECT UNNEST(range(32)) AS bitpos)
      GROUP BY doc_id, half, bitpos
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN half = 0 AND weight > 0
                         THEN CAST(1 AS BIGINT) * (1 << bitpos) ELSE 0 END) AS BIGINT) AS simhash_lo,
           CAST(SUM(CASE WHEN half = 1 AND weight > 0
                         THEN CAST(1 AS BIGINT) * (1 << bitpos) ELSE 0 END) AS BIGINT) AS simhash_hi
    FROM bits GROUP BY doc_id
    """,
)
def x05_simhash(spark, sf_dir):
    """64-bit SimHash as two 32-bit halves (simhash_lo from md5 hex chars
    1-8, simhash_hi from chars 9-16): per token, each half's 8 hex digits
    give 32 bits (digit k -> bits 4k..4k+3); per bit position sum +1/-1
    weights (duplicates count); sign -> bit.

    64 bits, not 32 (r9 deep-scale finding): the banding join downstream
    (x07) keys on signature fragments, and fragment width is what bounds
    RANDOM bucket collisions — a 32-bit signature caps fragments at 8
    bits for hamming<=3, whose 256 bucket values saturate at any real
    corpus size (measured: candidate pairs grew 919x for 30x docs,
    n^2/128). Two BIGINT halves rather than one 64-bit value keeps every
    bit op in non-negative i64 range on BOTH engines (a u64-wide value
    would sign-wrap in Spark and overflow DuckDB's BIGINT parse).

    Scale/plan: no bit-position explode, and the 64 per-bit counters are
    PACKED 2-per-long into 32-BIT lanes, so the hash aggregate is 32 long
    SUMs + COUNT instead of 64 SUMs (narrow agg buffer, short codegen).
    Per token: parse each md5 8-hex-char half to ONE long (conv base 16),
    then each group g extracts hex nibble g and packs its bit pairs at
    offsets 0/32. After the agg, lane count c_j and token count n give
    the signed weight sign via 2*c_j > n; no unpack shuffle. The 32-bit
    lanes are safe at any real doc length: lane carry needs >= 2^32
    tokens and the signed packed sum overflows at >= 2^30 tokens. Partial
    agg collapses map-side, so the shuffle carries ~one 33-long row per
    doc per partition."""
    # Expressions are built as SQL strings (one parse call each) rather than
    # stacked Column operators: the wide bit-twiddling tree costs hundreds of
    # client->JVM round trips as Columns (~0.6 s per plan build, measured)
    # and one parse as a string. Identical logical plan either way.
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.expr("explode(split(text, ' ')) AS tok")).select(
        "doc_id",
        F.expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) AS bigint) AS n0"),
        F.expr("cast(conv(substring(md5(tok), 9, 8), 16, 10) AS bigint) AS n1"),
    )
    aggs = [F.expr("count(1) AS n_tok")]
    for h in range(2):
        for g in range(8):  # hex digit g (most significant first) -> bits 4g..4g+3
            sh = 4 * (7 - g)
            nib = f"(shiftright(n{h}, {sh}) & 15)"
            # bits (0,1) of the nibble -> 32-bit lanes of h{h}g{g}a; (2,3) -> ...b
            aggs.append(
                F.expr(f"sum(({nib} & 1) + shiftleft(shiftright({nib}, 1) & 1, 32)) AS h{h}g{g}a")
            )
            aggs.append(
                F.expr(
                    f"sum((shiftright({nib}, 2) & 1) + shiftleft(shiftright({nib}, 3) & 1, 32)) AS h{h}g{g}b"
                )
            )
    weights = tok.groupBy("doc_id").agg(*aggs)

    def _lane(h: int, j: int) -> str:
        g, m = j // 4, j % 4
        col = f"h{h}g{g}a" if m < 2 else f"h{h}g{g}b"
        return f"(shiftright({col}, {32 * (m % 2)}) & 4294967295)"

    def _half(h: int) -> str:
        terms = " + ".join(f"IF(({_lane(h, j)} * 2) > n_tok, {1 << j}L, 0L)" for j in range(32))
        return f"cast({terms} AS bigint)"

    return weights.select(
        "doc_id",
        F.expr(f"{_half(0)} AS simhash_lo"),
        F.expr(f"{_half(1)} AS simhash_hi"),
    )


_SIMHASH_ORACLE_CTE = """
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), n AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT AS n0,
             ('0x' || substr(md5(tok), 9, 8))::BIGINT AS n1
      FROM tok
    ), bits AS (
      SELECT doc_id, half, bitpos,
             SUM((((CASE WHEN half = 0 THEN n0 ELSE n1 END)
                   >> CAST(4 * (7 - bitpos // 4) + bitpos % 4 AS BIGINT)) & 1) * 2 - 1) AS weight
      FROM n, (SELECT UNNEST(range(2)) AS half), (SELECT UNNEST(range(32)) AS bitpos)
      GROUP BY doc_id, half, bitpos
    ), sim AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN half = 0 AND weight > 0
                           THEN CAST(1 AS BIGINT) * (1 << bitpos) ELSE 0 END) AS BIGINT) AS lo,
             CAST(SUM(CASE WHEN half = 1 AND weight > 0
                           THEN CAST(1 AS BIGINT) * (1 << bitpos) ELSE 0 END) AS BIGINT) AS hi
      FROM bits GROUP BY doc_id
    )
"""


#: the 64-bit signature's block layout for x07's banding: (half, shift,
#: mask) — 11+11+10 bits per half, 6 blocks covering all 64 bits
_SIMHASH_BLOCKS = (
    (0, 0, 2047), (0, 11, 2047), (0, 22, 1023),
    (1, 0, 2047), (1, 11, 2047), (1, 22, 1023),
)

#: every 3-of-6 block combination (20): hamming <= 3 touches at most 3
#: blocks, so at least one combination's 3 blocks are all intact
_SIMHASH_COMBOS = tuple(_it.combinations(range(6), 3))


def _simhash_key_exprs(lo: str, hi: str, shl: str, shr: str) -> list[str]:
    """The 20 banding-key expressions over a (lo, hi) signature pair —
    one per 3-block combination, the combination id packed into the low
    5 bits so candidates join on ONE BIGINT. ``shl``/``shr`` are the
    engine's shift spellings (Spark shiftleft(x, n) / DuckDB (x << n));
    block packing uses 11 bits per block (the widest), so a key is
    <= 2^38 — comfortably i64 on both engines."""
    blocks = [
        shr.format(x=(lo if h == 0 else hi), n=sh) + f" & {mask}"
        for h, sh, mask in _SIMHASH_BLOCKS
    ]
    blocks = [f"({b})" for b in blocks]
    keys = []
    for cid, (i, j, k) in enumerate(_SIMHASH_COMBOS):
        packed = shl.format(x=f"({shl.format(x=blocks[i], n=11)} | {blocks[j]})", n=11)
        keys.append(f"(({packed} | {blocks[k]}) * 32 + {cid})")
    return keys


def _x07_oracle() -> str:
    keys = _simhash_key_exprs("lo", "hi", "({x} << {n})", "({x} >> {n})")
    return (
        _SIMHASH_ORACLE_CTE
        + f"""
    , keys AS (
      SELECT doc_id, lo, hi, UNNEST(list_value({", ".join(keys)})) AS bkey
      FROM sim
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.lo AS la, a.hi AS ha, b.lo AS lb, b.hi AS hb
      FROM keys a JOIN keys b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 3
    """
    )


@register("x07_simhash_neardup", oracle=_x07_oracle())
def x07_simhash_neardup(spark, sf_dir):
    """SimHash near-dup pairs at scale, the Manku et al. (WWW'07, public
    method) table layout: the 64-bit signature splits into 6 blocks
    (11+11+10 bits per half); hamming distance <= 3 touches at most 3
    blocks, so at least one of the 20 3-block combinations is fully
    intact — candidates = docs sharing any combination's packed 33-bit
    key (combination id in the low 5 bits, so the join key is ONE
    BIGINT), then the exact hamming check (two xor + popcounts)
    verifies.

    Why 20 wide keys instead of 4 narrow bands (r9 deep-scale finding):
    pigeonhole over 4 bands caps each band at signature_bits/4 wide, and
    RANDOM bucket collisions grow as n^2 / 2^band_bits — with the old
    32-bit signature's 8-bit bands the measured candidate set grew 919x
    for 30x docs (n^2/128: every bucket saturated, 8.1e8 candidate pairs
    at 150k docs). A 33-bit key pushes the random-collision knee to
    n ~ 2^33/20 ≈ 4e8 docs, and hot keys that remain are TRUE near-dup
    clusters.

    Scale: the signature table is ~20 bytes/doc; the key join shuffles 20
    rows/doc (the documented Manku tradeoff: more tables for
    exponentially fewer false candidates); the verify is one xor +
    popcount per half per candidate.

    Pair dedup is a per-row FILTER, not distinct(): a near-dup pair is
    minted once per intact 3-block combination (up to 20 copies), but
    every combination's intactness is computable from the two signatures
    alone, so keeping only the row whose own combination id (the key's
    low 5 bits) is the FIRST intact one emits exactly one row per pair —
    map-side, streaming. The former distinct() was an aggregation over
    the full candidate-pair set: an extra exchange of every survivor at
    cluster scale, and the one operator AQE skew handling cannot split
    when a hot band key (shared boilerplate) concentrates k^2 pairs on
    one partition. With the filter, the only wide operator left is the
    key join itself, which AQE skew-join CAN split."""
    sim = x05_simhash(spark, sf_dir)
    keys = _simhash_key_exprs(
        "simhash_lo", "simhash_hi", "shiftleft({x}, {n})", "shiftright({x}, {n})"
    )
    banded = sim.selectExpr(
        "doc_id",
        "simhash_lo",
        "simhash_hi",
        f"explode(array({', '.join(keys)})) AS bkey",
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash_lo").alias("la"),
        F.col("simhash_hi").alias("ha"),
        "bkey",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash_lo").alias("lb"),
        F.col("simhash_hi").alias("hb"),
        F.col("bkey").alias("bkey2"),
    )

    def _blk(h: int, sh: int, mask: int, lo: str, hi: str) -> str:
        return f"(shiftright({lo if h == 0 else hi}, {sh}) & {mask})"

    eq = [
        f"({_blk(h, sh, m, 'la', 'ha')} = {_blk(h, sh, m, 'lb', 'hb')})"
        for h, sh, m in _SIMHASH_BLOCKS
    ]
    first_intact = (
        "CASE "
        + " ".join(
            f"WHEN {eq[i]} AND {eq[j]} AND {eq[k]} THEN {cid}"
            for cid, (i, j, k) in enumerate(_SIMHASH_COMBOS)
        )
        + " END"
    )
    cand = a.join(
        b, (F.col("bkey") == F.col("bkey2")) & (F.col("doc_a") < F.col("doc_b"))
    ).filter(
        # hamming first (2 xor+popcount, prunes random collisions), then
        # the first-intact-combination dedup; both fuse into the join
        # condition, so no non-pair row ever leaves the join
        F.expr(
            f"bit_count(la ^ lb) + bit_count(ha ^ hb) <= 3"
            f" AND (bkey % 32) = ({first_intact})"
        )
    )
    return cand.selectExpr(
        "doc_a",
        "doc_b",
        "cast(bit_count(la ^ lb) + bit_count(ha ^ hb) AS bigint) AS hamming",
    )


@register(
    "x25_dataset_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
          FROM documents)
    """,
)
def x25_dataset_split(spark, sf_dir):
    """Deterministic train/val/test assignment (80/10/10) by content-free
    key hash — the standard reproducible dataset split: stable under
    re-runs, re-partitioning, and incremental appends (a doc's split never
    changes), no shuffle at all (pure map)."""
    d = load(spark, sf_dir, "documents")
    return d.selectExpr(
        "doc_id",
        "CASE WHEN conv(substring(md5(cast(doc_id AS string)), 1, 4), 16, 10) % 100 < 80 THEN 'train' "
        "WHEN conv(substring(md5(cast(doc_id AS string)), 1, 4), 16, 10) % 100 < 90 THEN 'val' "
        "ELSE 'test' END AS split",
    )


@register(
    "x26_stratified_sample",
    oracle="""
    SELECT doc_id, source, lang FROM (
      SELECT doc_id, source, lang,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source, lang) AS n
      FROM documents)
    WHERE rn <= CAST(CEIL(0.1 * n) AS BIGINT)
    """,
)
def x26_stratified_sample(spark, sf_dir):
    """Exact 10% stratified sample per (source, lang) stratum: rank rows by
    a deterministic key hash inside each stratum and keep the top ceil(10%).
    One shuffle on the stratum key; deterministic across runs (hash order,
    not RNG), so pipeline re-runs sample identical docs."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(F.expr("md5(cast(doc_id AS string))"), "doc_id")
    wn = Window.partitionBy("source", "lang")
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
        .filter(F.col("rn") <= F.ceil(0.1 * F.col("n")))
        .select("doc_id", "source", "lang")
    )


def connected_components(pairs, a_col="doc_a", b_col="doc_b"):
    """Resolve an undirected candidate-pair frame into connected
    components: (node, cluster_id) for every node APPEARING IN A PAIR,
    cluster_id = the component's minimum node id. Frame-level core of the
    oracle-checked x06 — alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): O(log n) rounds on adversarially long chains, two
    node-keyed shuffles per round over the candidate subgraph only, and
    ZERO driver actions per round (the convergence fingerprint rides each
    round's one localCheckpoint job as an Observation).
    ``connected_components.last_rounds`` records the converged round
    count."""
    from pyspark.sql import Observation

    # invariant through every round: u > v (child points at smaller parent)
    e = (
        pairs.select(
            F.greatest(a_col, b_col).alias("u"), F.least(a_col, b_col).alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    connected_components.last_rounds = 0
    prev = None
    for rnd in range(25):
        # large-star: for each center c, neighbors larger than c re-point at
        # m(c) = min(neighborhood(c) U {c}). Both orientations of every
        # undirected edge are considered; exactly the larger-endpoint
        # orientation emits.
        adj = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = adj.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("mn", "u").alias("m")
        )
        large = (
            adj.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star: group by child, point every parent (and the child) at
        # the minimum parent.
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        joined = large.join(mins2, "u")
        small = (
            mins2.select("u", F.col("m").alias("v"))
            .unionByName(
                joined.filter(F.col("v") != F.col("m")).select(
                    F.col("v").alias("u"), F.col("m").alias("v")
                )
            )
            .distinct()
        )
        obs = Observation()
        # fingerprint = (cardinality, order-independent XOR of pair hashes):
        # bit_xor never overflows (ANSI-safe) and is a set identity up to
        # 64-bit collision
        new_e = small.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).localCheckpoint()  # the one job this round; metrics ride along
        # the FINAL round's checkpoint stays live (the returned labels
        # read it); every superseded round frees eagerly
        _free_local_checkpoint(e)
        e = new_e
        connected_components.last_rounds = rnd + 1
        cur = tuple(obs.get.values())
        if cur == prev or cur[0] == 0:
            break
        prev = cur
    else:
        # the label extraction below assumes the fixpoint (every non-root
        # points at its component minimum); returning labels from an
        # unconverged graph would silently mislabel clusters — fail loudly
        raise RuntimeError(
            "connected_components did not converge within 25 rounds "
            f"(fingerprint still moving: {cur}); the input pair graph is "
            "adversarially deep — raise the round cap"
        )
    # fixpoint is stars: every non-root points at its component minimum
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id")).unionByName(
        e.select(F.col("v").alias("node"), F.col("v").alias("cluster_id")).distinct()
    )
    return labels.groupBy("node").agg(F.min("cluster_id").alias("cluster_id"))


@register(
    "x06_dedup_clusters",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    ), sig AS (
      SELECT doc_id, seed,
             MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                        CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
      FROM hashed, (SELECT UNNEST(range(8)) AS seed)
      GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 2 AS band, STRING_AGG(minhash, '|' ORDER BY seed) AS band_val
      FROM sig GROUP BY doc_id, seed // 2
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                               AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand
    ), reach(doc_id, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc_id = e.dst
    ), lab AS (
      SELECT doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
           COALESCE(l.cluster_id, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    """,
)
def x06_dedup_clusters(spark, sf_dir):
    """Dedup decision: resolve x03's LSH candidate pairs into connected
    components and pick one survivor per cluster — the output a near-dedup
    pipeline actually ships: (doc_id, cluster_id, keep) for EVERY document,
    keep = (doc_id == min doc_id of its component); singletons keep
    themselves.

    Core algorithm lives in :func:`connected_components` (alternating
    large-star/small-star contraction, zero driver actions per round);
    this entry pairs it with x03's candidates and the final left join
    back to documents. ``last_rounds`` on the function records the
    converged round count for tests."""
    pairs = x03_minhash_lsh_pairs(spark, sf_dir)
    lab = connected_components(pairs).select(
        F.col("node").alias("l_doc"), "cluster_id"
    )
    x06_dedup_clusters.last_rounds = connected_components.last_rounds
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.join(lab, docs["doc_id"] == lab["l_doc"], "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias("keep"),
    )


@register(
    "x08_dedup_apply",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    ), sig AS (
      SELECT doc_id, seed,
             MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                        CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
      FROM hashed, (SELECT UNNEST(range(8)) AS seed)
      GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 2 AS band, STRING_AGG(minhash, '|' ORDER BY seed) AS band_val
      FROM sig GROUP BY doc_id, seed // 2
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                               AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand
    ), reach(doc_id, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc_id = e.dst
    ), lab AS (
      SELECT doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY doc_id
    )
    SELECT source, lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    WHERE COALESCE(l.cluster_id, d.doc_id) = d.doc_id
    GROUP BY source, lang
    """,
)
def x08_dedup_apply(spark, sf_dir):
    """The dedup pipeline's final product: apply x06's keep decision to the
    corpus and report the surviving volume per (source, lang) — what a
    100 TB near-dedup run actually ships (survivor set + the accounting
    that says how much each slice shrank). One broadcast-sized join of the
    keep labels against the corpus, then a partial-agg rollup."""
    keep = x06_dedup_clusters(spark, sf_dir).filter(F.col("keep"))
    d = load(spark, sf_dir, "documents")
    return (
        d.join(keep.select("doc_id"), "doc_id", "left_semi")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("kept_chars"))
    )


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------

_COSINE_ORACLE_CTE = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 5),
         p AS (
           SELECT qid, cid,
                  list_sum(list_transform(range(1, len(qe) + 1),
                                          i -> CAST(qe[i] AS DOUBLE) * ce[i])) AS dot,
                  sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * x))) AS qn,
                  sqrt(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * x))) AS cn
           FROM q, c)
"""


@register(
    "x10_cosine_topk",
    oracle=_finite_embeddings(_COSINE_ORACLE_CTE
    + """
    SELECT qid, cid, cosine FROM (
      SELECT qid, cid, ROUND(dot / NULLIF(qn * cn, 0), 6) + 0 AS cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY dot / NULLIF(qn * cn, 0) DESC NULLS LAST, cid) AS rn
      FROM p)
    WHERE rn <= 5
    """),
)
def x10_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline: bounded query set (5 vectors)
    broadcast against all candidates; rank-then-filter per query. Scale:
    candidates stream through executors once; queries are broadcast — the
    canonical exact-kNN plan. (IVF variant: x11.)

    Norms are precomputed per row BEFORE the pair join (O(n) instead of
    O(n*q) norm evaluations — the higher-order-function reduce is the
    expensive interpreted part of the plan); the per-pair work is the dot
    product alone. Same doubles, same order of operations as the oracle.

    Zero-norm guard (the x65/x47 rule): an all-zero vector on either side
    has no cosine — NULL, sinking below every scored candidate — instead
    of an ANSI DIVIDE_BY_ZERO job abort on a legal input."""
    e = _load_finite_embeddings(spark, sf_dir)
    norm = "sqrt(aggregate(embedding, 0D, (acc, x) -> acc + cast(x AS double) * x))"
    q = e.filter(F.col("vec_id") < 5).selectExpr("vec_id AS qid", "embedding AS qe", f"{norm} AS qn")
    c = e.filter(F.col("vec_id") >= 5).selectExpr("vec_id AS cid", "embedding AS ce", f"{norm} AS cn")
    scored = c.crossJoin(F.broadcast(q)).selectExpr(
        "qid",
        "cid",
        "aggregate(zip_with(qe, ce, (x, y) -> cast(x AS double) * y), 0D, (acc, x) -> acc + x)"
        " / nullif(qn * cn, 0D) AS raw_cos",
    )
    w = Window.partitionBy("qid").orderBy(F.col("raw_cos").desc_nulls_last(), "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "cid", F.round("raw_cos", 6).alias("cosine"))
    )


@register(
    "x11_ivf_assign",
    oracle=_finite_embeddings(_COSINE_ORACLE_CTE.replace("vec_id < 5", "vec_id < 8").replace("vec_id >= 5", "vec_id >= 0")
    + """
    SELECT cid AS vec_id, qid AS centroid_id
    FROM p
    QUALIFY ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dot / (qn * cn) DESC, qid) = 1
    """),
)
def x11_ivf_assign(spark, sf_dir):
    """IVF-style coarse quantization: assign every vector to its nearest of
    8 fixed centroids (vec_id < 8 as deterministic seeds). At scale this is
    the partitioning step of IVF-ANN: search only probes matching cells.
    Ties break toward the lower centroid id."""
    e = _load_finite_embeddings(spark, sf_dir)
    # norms hoisted out of the k-way cross join: the candidate norm is one
    # fold per ROW instead of one per (row, centroid) pair (V.cosine_with_norms)
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        V.norm(F.col("embedding")).alias("qn"),
    )
    allv = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        V.norm(F.col("embedding")).alias("cn"),
    )
    scored = allv.crossJoin(F.broadcast(cent)).select(
        "cid",
        "qid",
        V.cosine_with_norms(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")).alias("raw_cos"),
    )
    return (
        scored.groupBy(F.col("cid").alias("vec_id"))
        .agg(F.max_by("qid", F.struct(F.col("raw_cos"), (-F.col("qid")).alias("neg"))).alias("centroid_id"))
    )


#: x12's broadcast-side row cap: ~100k x 64-float vectors ~ 25 MB serialized,
#: safely under executor broadcast budgets. Above this the exact baseline is
#: the wrong tool and callers are refused toward the bucketed paths.
_X12_MAX_BROADCAST_ROWS = 100_000


@register(
    "x12_embedding_neardup",
    oracle=_finite_embeddings(_COSINE_ORACLE_CTE.replace("vec_id < 5", "vec_id < 250").replace("vec_id >= 5", "vec_id >= 250")
    + """
    SELECT qid AS vec_a, cid AS vec_b, ROUND(dot / (qn * cn), 6) + 0 AS cosine
    FROM p WHERE dot / (qn * cn) > 0.4
    """),
)
def x12_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup: pairs above a similarity threshold.
    This is the BOUNDED-EXACT baseline (the recall yardstick for x13/x14);
    its broadcast side is size-guarded in-signature — a limit-probe
    (O(cap), never O(n)) refuses inputs past ``_X12_MAX_BROADCAST_ROWS``
    so no unbounded crossJoin is reachable through the registry. The scale
    path is x13 (IVF cells) / x14 (multi-probe)."""
    e = _load_finite_embeddings(spark, sf_dir)
    # norms hoisted before the cross join (one fold per row, not per pair)
    a = e.filter(F.col("vec_id") < 250).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        V.norm(F.col("embedding")).alias("qn"),
    )
    b = e.filter(F.col("vec_id") >= 250).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        V.norm(F.col("embedding")).alias("cn"),
    )
    if a.limit(_X12_MAX_BROADCAST_ROWS + 1).count() > _X12_MAX_BROADCAST_ROWS:
        raise ValueError(
            "x12 is the bounded-exact near-dup baseline; its broadcast side "
            f"exceeds {_X12_MAX_BROADCAST_ROWS} rows. Use x13_ivf_neardup / "
            "x14_multiprobe_ivf for unbounded corpora."
        )
    scored = b.crossJoin(F.broadcast(a)).select(
        F.col("qid").alias("vec_a"),
        F.col("cid").alias("vec_b"),
        V.cosine_with_norms(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")).alias("raw_cos"),
    )
    return scored.filter(F.col("raw_cos") > 0.4).select(
        "vec_a", "vec_b", F.round("raw_cos", 6).alias("cosine")
    )


@register(
    "x13_ivf_neardup",
    oracle=_finite_embeddings(_COSINE_ORACLE_CTE.replace("vec_id < 5", "vec_id < 8").replace("vec_id >= 5", "vec_id >= 0")
    + """
    , asg AS (
      SELECT cid AS vec_id, qid AS centroid_id
      FROM p
      QUALIFY ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dot / (qn * cn) DESC, qid) = 1
    ), withv AS (
      SELECT a.vec_id, a.centroid_id, e.embedding FROM asg a JOIN embeddings e USING (vec_id)
    )
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           ROUND(
             list_sum(list_transform(range(1, len(x.embedding) + 1),
                                     i -> CAST(x.embedding[i] AS DOUBLE) * y.embedding[i]))
             / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * v)))
              * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * v)))), 6) + 0 AS cosine
    FROM withv x JOIN withv y ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
    WHERE list_sum(list_transform(range(1, len(x.embedding) + 1),
                                  i -> CAST(x.embedding[i] AS DOUBLE) * y.embedding[i]))
          / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * v)))
           * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * v)))) > 0.4
    """),
)
def x13_ivf_neardup(spark, sf_dir):
    """The wired x11 -> x12 composition: embedding near-dup restricted to
    IVF cells. Every vector is assigned to its nearest centroid (x11), then
    only INTRA-CELL pairs are cosine-scored — the shuffle key is
    centroid_id and no doc x doc cross join exists anywhere in the plan.

    Scale: with k centroids the pair work drops from n^2 to sum of cell^2
    ~ n^2/k, and each cell's pairs co-locate on one shuffle partition; skew
    (one hot cell) is handled by AQE skew-split or a finer k. Recall is the
    usual IVF trade: pairs straddling a cell boundary are missed unless
    multi-probe assignment (top-2 cells per vector) is enabled — the
    brute-force x12 is the exact-recall baseline this approximates."""
    asg = x11_ivf_assign(spark, sf_dir)
    e = _load_finite_embeddings(spark, sf_dir).select(
        "vec_id", "embedding", V.norm(F.col("embedding")).alias("_nrm")
    )
    # norms ride the assignment join (one fold per vector), so the
    # intra-cell pair join's per-pair work is the dot product alone
    v = asg.join(e, "vec_id")
    a = v.select(
        F.col("vec_id").alias("va"), F.col("centroid_id").alias("ca"),
        F.col("embedding").alias("ea"), F.col("_nrm").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("vb"), F.col("centroid_id").alias("cb"),
        F.col("embedding").alias("eb"), F.col("_nrm").alias("nb"),
    )
    scored = a.join(b, (F.col("ca") == F.col("cb")) & (F.col("va") < F.col("vb"))).select(
        F.col("va").alias("vec_a"),
        F.col("vb").alias("vec_b"),
        V.cosine_with_norms(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias("raw_cos"),
    )
    return scored.filter(F.col("raw_cos") > 0.4).select(
        "vec_a", "vec_b", F.round("raw_cos", 6).alias("cosine")
    )


@register(
    "x14_multiprobe_ivf",
    oracle=_finite_embeddings(_COSINE_ORACLE_CTE.replace("vec_id < 5", "vec_id < 8").replace("vec_id >= 5", "vec_id >= 0")
    + """
    , asg AS (
      SELECT cid AS vec_id, qid AS centroid_id
      FROM (SELECT qid, cid, dot / (qn * cn) AS cos,
                   ROW_NUMBER() OVER (PARTITION BY cid
                                      ORDER BY dot / (qn * cn) DESC, qid) AS rn
            FROM p)
      WHERE rn <= 2
    ), cand AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM asg a JOIN asg b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    ), withv AS (SELECT vec_id, embedding FROM embeddings)
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           ROUND(
             list_sum(list_transform(range(1, len(x.embedding) + 1),
                                     i -> CAST(x.embedding[i] AS DOUBLE) * y.embedding[i]))
             / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * v)))
              * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * v)))), 6) + 0 AS cosine
    FROM cand JOIN withv x ON x.vec_id = va JOIN withv y ON y.vec_id = vb
    WHERE list_sum(list_transform(range(1, len(x.embedding) + 1),
                                  i -> CAST(x.embedding[i] AS DOUBLE) * y.embedding[i]))
          / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * v)))
           * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * v)))) > 0.4
    """),
)
def x14_multiprobe_ivf(spark, sf_dir):
    """Multi-probe IVF near-dup: each vector is assigned to its TOP-2
    nearest centroids, and pairs sharing ANY cell are scored — the standard
    recall lever over single-probe x13 (pairs straddling one cell boundary
    are recovered at ~2x the candidate cost, still never doc x doc).
    Candidate pairs are deduped BEFORE the expensive cosine (a pair can
    share both cells)."""
    e = _load_finite_embeddings(spark, sf_dir)
    # norms hoisted before both the assignment cross join and the exact
    # pair scoring below (one fold per row, not per pair)
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        V.norm(F.col("embedding")).alias("qn"),
    )
    allv = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        V.norm(F.col("embedding")).alias("cn"),
    )
    scored = allv.crossJoin(F.broadcast(cent)).select(
        "cid",
        "qid",
        V.cosine_with_norms(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")).alias("cos"),
    )
    w = Window.partitionBy("cid").orderBy(F.col("cos").desc(), "qid")
    asg = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(F.col("cid").alias("vec_id"), F.col("qid").alias("centroid_id"))
    )
    a = asg.select(F.col("vec_id").alias("va"), "centroid_id")
    b = asg.select(F.col("vec_id").alias("vb"), F.col("centroid_id").alias("c2"))
    cand = (
        a.join(b, (F.col("centroid_id") == F.col("c2")) & (F.col("va") < F.col("vb")))
        .select("va", "vb")
        .distinct()
    )
    ex = e.select(
        F.col("vec_id").alias("xid"), F.col("embedding").alias("xe"),
        V.norm(F.col("embedding")).alias("xn"),
    )
    ey = e.select(
        F.col("vec_id").alias("yid"), F.col("embedding").alias("ye"),
        V.norm(F.col("embedding")).alias("yn"),
    )
    pairs = (
        cand.join(ex, F.col("va") == F.col("xid"))
        .join(ey, F.col("vb") == F.col("yid"))
        .select(
            "va", "vb",
            V.cosine_with_norms(F.col("xe"), F.col("ye"), F.col("xn"), F.col("yn")).alias("raw_cos"),
        )
    )
    return pairs.filter(F.col("raw_cos") > 0.4).select(
        F.col("va").alias("vec_a"), F.col("vb").alias("vec_b"), F.round("raw_cos", 6).alias("cosine")
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@register(
    "x20_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                               AS n_tokens,
           LENGTH(text)                                               AS n_chars_measured,
           ROUND(list_sum(list_transform(string_split(text, ' '), t -> CAST(LENGTH(t) AS DOUBLE)))
                 / len(string_split(text, ' ')), 4)                   AS mean_token_len,
           len(list_distinct(string_split(text, ' ')))                AS n_unique
    FROM documents
    """,
)
def x20_token_stats(spark, sf_dir):
    """Token counting (whitespace model) + char stats, all codegen'd."""
    d = load(spark, sf_dir, "documents")
    toks = TXT.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        F.round(TXT.mean_token_len(F.col("text")), 4).alias("mean_token_len"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
    )


@register(
    "x21_quality_score",
    oracle="""
    SELECT doc_id,
           ROUND((LEAST(len(string_split(text,' ')) / 100.0, 1.0)
                + CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' '))
                + LEAST(5.0 * len(list_filter(string_split(text,' '),
                        t -> t IN ('the','a','of','and','to','is'))) / len(string_split(text,' ')), 1.0)
                 ) / 3, 4) AS quality
    FROM documents
    """,
)
def x21_quality_score(spark, sf_dir):
    """Pretraining-style quality heuristic (length/diversity/stopword-rate)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", TXT.quality_score(F.col("text")).alias("quality"))


@register(
    "x22_lang_id",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','is')))   AS s_en,
        len(list_filter(string_split(text,' '), t -> t IN ('le','la','les','et','un','une')))  AS s_fr,
        len(list_filter(string_split(text,' '), t -> t IN ('el','los','y','en','un','una')))   AS s_es,
        len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ein','zu'))) AS s_de
      FROM documents)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_en IS NULL THEN NULL
                WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
                WHEN s_es >= s_de THEN 'es'
                ELSE 'de' END AS predicted_lang
    FROM s
    """,
)
def x22_lang_id(spark, sf_dir):
    """Language-ID heuristic: per-language function-word hit argmax with
    fixed precedence (no model; deterministic). NULL text -> NULL on both
    engines (the scores are NULL, which would otherwise fall through the
    CASE to 'de')."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.col("lang").alias("labeled_lang"), TXT.lang_id(F.col("text")).alias("predicted_lang")
    )


@register(
    "x23_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g')))) AS fp
    FROM documents
    """,
)
def x23_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", TXT.fingerprint(F.col("text")).alias("fp"))


@register(
    "x24_source_lang_profile",
    oracle="""
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars
    FROM documents GROUP BY source, lang
    """,
)
def x24_source_lang_profile(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
    )


@register(
    "x27_sequence_packing",
    oracle="""
    SELECT doc_id, n_tokens, bin_id,
           CAST(SUM(n_tokens) OVER (PARTITION BY bin_id) AS BIGINT) AS bin_tokens
    FROM (
      SELECT doc_id, n_tokens,
             (CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1) // 2048 AS bin_id
      FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents))
    """,
)
def x27_sequence_packing(spark, sf_dir):
    """Deterministic sequence packing for training batches: documents are
    packed in stable doc_id order into ~2048-token bins by bucketing the
    running token total (bin = (cumsum-1) div budget). Contiguous-cumsum
    packing is the streaming-friendly packer (vs. first-fit bin packing,
    which is inherently sequential), and the prefix sum is DISTRIBUTED —
    not a global Window.orderBy, which funnels the whole corpus through
    one window task: range-partition by doc_id, running sum WITHIN each
    partition (parallel), then add each partition's starting offset (a
    second cumsum over the n_partitions-row totals frame, broadcast
    back). The checkpoint pins the partition ids so the in-partition sums
    and the offsets frame can never disagree on boundaries; results are
    identical for ANY boundary choice, so the range sampling doesn't
    affect determinism."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr("cast(size(split(text, ' ')) AS bigint) AS n_tokens"))
    n_parts = max(1, spark.sparkContext.defaultParallelism)
    ranged = (
        toks.repartitionByRange(n_parts, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_in = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    run = ranged.withColumn("_run", F.sum("n_tokens").over(w_in))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        ranged.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("_t"))
        .select("_pid", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"))
    )
    binned = run.join(F.broadcast(offs), "_pid").withColumn(
        "bin_id", ((F.col("_run") + F.col("_off") - 1) / 2048).cast("long")
    )
    wb = Window.partitionBy("bin_id")
    return binned.select(
        "doc_id", "n_tokens", "bin_id", F.sum("n_tokens").over(wb).alias("bin_tokens")
    )


@register(
    "x28_top_bigrams",
    oracle="""
    SELECT bg, COUNT(*) AS n
    FROM (
      SELECT UNNEST(list_transform(range(1, len(string_split(text,' '))),
                    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS bg
      FROM documents)
    GROUP BY bg
    ORDER BY n DESC, bg
    LIMIT 50
    """,
)
def x28_top_bigrams(spark, sf_dir):
    """Corpus-wide n-gram count table (the building block of n-gram LMs and
    contamination checks): explode bigrams, hash-aggregate, top-k. Scale:
    partial aggregation collapses the long tail map-side; top-50 is
    TakeOrderedAndProject — no global sort, no full count table collected."""
    d = load(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    bg = d.select(
        F.expr(
            f"explode(zip_with(slice({toks}, 1, size({toks}) - 1),"
            f" slice({toks}, 2, size({toks}) - 1), (a, b) -> concat_ws(' ', a, b))) AS bg"
        )
    )
    return (
        bg.groupBy("bg")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bg")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Approximate aggregates (no SQL oracle — semantics are approximate;
# the driver records the weaker rows-only check)
# --------------------------------------------------------------------------


@register(
    "x31_length_percentiles",
    oracle="""
    SELECT source,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4)  AS p50,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 4)  AS p90,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.99), 4) AS p99,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def x31_length_percentiles(spark, sf_dir):
    """Exact per-source length percentiles (corpus QA / filter-threshold
    tuning): Spark's exact `percentile` (interpolating, = DuckDB
    quantile_cont). Exact quantiles shuffle each group's values; at 100 TB
    swap to `approx_percentile` (t-digest sketch, mergeable, no value
    shuffle) — the x30 pattern — once exactness stops being worth it."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.round(F.expr("percentile(cast(n_chars AS double), 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(cast(n_chars AS double), 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(cast(n_chars AS double), 0.99)"), 4).alias("p99"),
        F.count("*").alias("n_docs"),
    )


@register("x30_approx_count_distinct", oracle=None)
def x30_approx_count_distinct(spark, sf_dir):
    """HyperLogLog++ distinct counting — the at-scale substitute for exact
    COUNT(DISTINCT) (no shuffle of distinct values, mergeable sketches)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("approx_suppliers"),
    )


# --------------------------------------------------------------------------
# Privacy / compliance scrubbing
# --------------------------------------------------------------------------

#: PII patterns shared by the Spark plan and the DuckDB oracle. Kept to the
#: regex subset that Java's engine and RE2 interpret identically (no
#: backrefs, no lookaround), and backslash-free ([.] not \.) because Spark
#: SQL string literals process backslash escapes while DuckDB's do not.
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
_PII_IP = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
_PII_PHONE = "[0-9]{3}-[0-9]{4}"


@register(
    "x32_pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.7 tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(raw, '{_PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(raw, '{_PII_IP}'))    AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(raw,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS clean
    FROM aug
    """,
)
def x32_pii_redaction(spark, sf_dir):
    """PII scrubbing (email / IPv4 / phone -> typed placeholders), the
    compliance pass every pretraining corpus runs before training.

    The synthetic documents are pre-normalized lowercase prose with no PII,
    so the query first APPENDS deterministic fake PII derived from doc_id
    (declared fixture step, identical expression in the oracle) — the
    redaction chain is then exercised on every row instead of passing
    vacuously. Phone counting is omitted on purpose: the phone pattern is a
    substring of nothing else, but its count would double-count the IP octets
    only after they are gone, so counts are taken on the raw text for the
    disjoint patterns (email, IP) and redaction order is email -> IP ->
    phone (each pattern matches disjoint spans of the raw text).

    Scale: pure regexp_* projection — codegen'd, no shuffle, scales with the
    scan; the patterns are shared constants with the oracle."""
    d = load(spark, sf_dir, "documents")
    raw = (
        "concat(text, ' contact user', CAST(doc_id AS STRING), '@example.com ip 10.0.', "
        "CAST(doc_id % 256 AS STRING), '.7 tel 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
    )
    aug = d.select("doc_id", F.expr(f"{raw} AS raw"))
    return aug.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all(raw, '{_PII_EMAIL}', 0)) AS n_emails"),
        F.expr(f"size(regexp_extract_all(raw, '{_PII_IP}', 0)) AS n_ips"),
        F.expr(
            f"regexp_replace(regexp_replace(regexp_replace(raw,"
            f" '{_PII_EMAIL}', '<EMAIL>'),"
            f" '{_PII_IP}', '<IP>'),"
            f" '{_PII_PHONE}', '<PHONE>') AS clean"
        ),
    )


@register(
    "x33_repetition_signals",
    oracle="""
    WITH tc AS (
      SELECT doc_id, tok, COUNT(*) AS n
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok
    ), st AS (
      SELECT doc_id, tok, n,
             CAST(SUM(n) OVER (PARTITION BY doc_id) AS BIGINT)   AS n_tokens,
             COUNT(*) OVER (PARTITION BY doc_id)                 AS n_unique,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS rn
      FROM tc
    ), bi AS (
      SELECT doc_id,
             ROUND(1.0 - CAST(len(list_distinct(list_transform(
                       range(1, len(string_split(text,' '))),
                       i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))) AS DOUBLE)
                       / NULLIF(len(string_split(text,' ')) - 1, 0), 4) AS dup_bigram_frac
      FROM documents
    )
    SELECT st.doc_id, st.n_tokens, st.n_unique,
           ROUND(1.0 - CAST(st.n_unique AS DOUBLE) / st.n_tokens, 4) AS dup_token_frac,
           st.tok AS top_tok,
           ROUND(CAST(st.n AS DOUBLE) / st.n_tokens, 4) AS top_tok_frac,
           bi.dup_bigram_frac
    FROM st JOIN bi ON st.doc_id = bi.doc_id
    WHERE st.rn = 1
    """,
)
def x33_repetition_signals(spark, sf_dir):
    """Per-document repetition signals (the Gopher/C4-family quality
    filters): duplicate-token fraction, duplicate-bigram fraction, and the
    most-frequent token with its mass share (ties -> lexicographically
    smallest token, deterministic).

    Scale/plan: token frequencies come from explode -> (doc_id, tok)
    hash-agg -> (doc_id) hash-agg — both shuffles are keyed by doc_id
    prefixes and collapse map-side; the per-doc top token is a single
    ``min(struct(-n, tok))`` (no window, no second sort). The bigram
    fraction is a per-row higher-order-function projection joined back on
    doc_id. Nothing is ever keyed by token alone, so skewed vocabulary
    (stopwords) cannot hot-spot a reducer."""
    d = load(spark, sf_dir, "documents")
    tc = (
        d.select("doc_id", F.expr("explode(split(text, ' ')) AS tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("n"))
    )
    st = tc.groupBy("doc_id").agg(
        F.expr("CAST(sum(n) AS BIGINT) AS n_tokens"),
        F.expr("count(*) AS n_unique"),
        F.expr("min(struct(-n AS neg_n, tok)) AS top"),
    )
    toks = "split(text, ' ')"
    bi = d.select(
        "doc_id",
        F.expr(
            f"round(1.0d - CAST(size(array_distinct(zip_with(slice({toks}, 1, size({toks}) - 1),"
            f" slice({toks}, 2, size({toks}) - 1), (a, b) -> concat_ws(' ', a, b)))) AS DOUBLE)"
            f" / nullif(size({toks}) - 1, 0), 4) AS dup_bigram_frac"
        ),
    )
    return st.join(bi, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_unique",
        F.expr("round(1.0d - CAST(n_unique AS DOUBLE) / n_tokens, 4) AS dup_token_frac"),
        F.col("top.tok").alias("top_tok"),
        F.expr("round(CAST(-top.neg_n AS DOUBLE) / n_tokens, 4) AS top_tok_frac"),
        "dup_bigram_frac",
    )


@register(
    "x34_benchmark_contamination",
    oracle="""
    WITH grams AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, len(string_split(text,' ')) - 2),
               i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
                    string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3]))) AS g
      FROM documents)
    SELECT c.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
    FROM grams c JOIN grams b ON c.g = b.g
    WHERE b.doc_id % 23 = 0 AND c.doc_id % 23 <> 0
    GROUP BY c.doc_id, b.doc_id
    """,
)
def x34_benchmark_contamination(spark, sf_dir):
    """Benchmark-contamination check: flag corpus documents sharing word
    n-grams with a held-out benchmark set (here: docs with doc_id % 23 == 0
    standing in for the eval suite; 4-grams for the synthetic vocabulary —
    production pipelines use the same shape with 8-13-grams).

    Scale/plan: the benchmark side is tiny relative to the corpus (eval
    suites are thousands of docs vs billions), so its distinct n-grams are
    BROADCAST; the corpus n-gram stream probes the build map-side — no
    shuffle of corpus n-grams, and the (doc, bench) pair counts collapse via
    partial aggregation. The corpus is never self-joined."""
    d = load(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(F.array_distinct(TXT.shingles(F.col("text"), 4))).alias("g")
    )
    bench = grams.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    corpus = grams.filter(F.col("doc_id") % 23 != 0)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )


@register(
    "x38_passage_dedup",
    oracle="""
    WITH p AS (
      SELECT doc_id, UNNEST(list_transform(
               range(0, CAST(ceil(len(string_split(text,' ')) / 16.0) AS BIGINT)),
               k -> array_to_string(string_split(text,' ')[k*16+1 : k*16+16], ' '))) AS passage
      FROM documents)
    SELECT md5(passage) AS passage_hash,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*)               AS n_occurrences,
           MIN(doc_id)            AS keep_doc_id
    FROM p GROUP BY md5(passage) HAVING COUNT(DISTINCT doc_id) > 1
    """,
)
def x38_passage_dedup(spark, sf_dir):
    """Passage-level exact dedup (sub-document granularity): chunk every
    document into aligned 16-token passages, hash them, and report passages
    occurring in more than one document with the survivor (min doc_id) — the
    repeated-boilerplate remover that document-level dedup misses.

    Scale/plan: one explode + one hash-agg keyed by the passage digest;
    COUNT(DISTINCT doc_id) expands to a two-level partial aggregate
    ((hash, doc) then (hash)), so no digest ever accumulates unbounded
    state; HAVING filters before anything is returned. Digest-keyed shuffle
    is uniform by construction."""
    d = load(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    p = d.select(
        "doc_id",
        F.expr(
            f"explode(transform(sequence(0, CAST(ceil(size({toks}) / 16.0) AS BIGINT) - 1),"
            f" k -> concat_ws(' ', slice({toks}, k*16+1, 16)))) AS passage"
        ),
    )
    # group on the digest's 16 raw bytes, rebuild the identical lowercase
    # hex result post-agg: the COUNT(DISTINCT) expansion shuffles one
    # (digest, doc_id) row per pair, so the narrower key cuts both
    # exchanges' bytes (r11, narrower types)
    return (
        p.groupBy(F.unhex(F.md5("passage")).alias("_ph"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            F.lower(F.hex("_ph")).alias("passage_hash"),
            "n_docs",
            "n_occurrences",
            "keep_doc_id",
        )
    )


@register(
    "x35_mixture_weights",
    oracle="""
    WITH s AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(CAST(n_docs AS DOUBLE) / SUM(CAST(n_docs AS DOUBLE)) OVER (), 6) AS raw_share,
           ROUND(pow(n_docs, 0.5) / SUM(pow(n_docs, 0.5)) OVER (), 6)             AS weight,
           CAST(ROUND(10000 * pow(n_docs, 0.5) / SUM(pow(n_docs, 0.5)) OVER (), 0) AS BIGINT)
                                                                                  AS target_docs
    FROM s
    """,
)
def x35_mixture_weights(spark, sf_dir):
    """Domain-mixture resampling weights: temperature-flattened source
    shares (w_s proportional to n_s^alpha, alpha=0.5) and the per-source
    document budget for a 10k-doc epoch — the source-balancing step of
    pretraining data curation (upsamples small high-value sources, caps the
    head).

    Scale/plan: the corpus collapses to one count per source (partial agg);
    the unpartitioned window then runs over the k-row source table, never
    the corpus — single-reducer is the right plan for k ~ dozens of
    sources."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    return s.selectExpr(
        "source",
        "n_docs",
        "round(CAST(n_docs AS DOUBLE) / sum(CAST(n_docs AS DOUBLE)) over (), 6) AS raw_share",
        "round(pow(n_docs, 0.5d) / sum(pow(n_docs, 0.5d)) over (), 6) AS weight",
        "CAST(round(10000 * pow(n_docs, 0.5d) / sum(pow(n_docs, 0.5d)) over (), 0) AS BIGINT)"
        " AS target_docs",
    )


@register(
    "x36_shard_assignment",
    oracle="""
    SELECT shard_id, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM (SELECT doc_id, n_chars,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS shard_id
          FROM documents)
    GROUP BY shard_id
    """,
)
def x36_shard_assignment(spark, sf_dir):
    """Deterministic output-shard assignment + skew audit: every doc maps to
    shard md5(key) % 64 (stable under re-runs and appends — the writer-side
    twin of x25's split), and the query reports per-shard doc/byte totals,
    which is exactly the balance check run before committing a sharded
    training dataset.

    Scale/plan: pure map projection then one 64-group hash agg; in the real
    writer the same expression feeds ``repartition(64, shard_id)`` +
    partitioned write, so shard files are written co-located with no
    post-hoc sort."""
    d = load(spark, sf_dir, "documents")
    return (
        d.selectExpr(
            "doc_id",
            "n_chars",
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 64"
            " AS shard_id",
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "x41_subword_chunking",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]{1,4}'))              AS n_pieces,
           CAST(CEIL(len(regexp_extract_all(text, '[a-z]{1,4}')) / 128.0) AS BIGINT)
                                                                    AS n_chunks,
           len(regexp_extract_all(text, '[a-z]{1,4}')) % 128        AS last_chunk_fill
    FROM documents
    """,
)
def x41_subword_chunking(spark, sf_dir):
    """BPE-ish subword counting + training-chunk sizing: a greedy regex
    splits words into <=4-char pieces (the cheap stand-in for a BPE
    tokenizer's piece count — same shape: regex scan, piece count, fixed
    context-length math), then docs are sized into 128-piece training
    chunks. Complements x20 (whitespace token model) and x27 (packing by
    whitespace count).

    Scale: regexp_extract_all + size is a pure codegen projection — no
    shuffle; exactly the expression a real tokenizer-budget audit runs
    before the (Python-side, Arrow-batched) tokenizer itself."""
    d = load(spark, sf_dir, "documents")
    pieces = "size(regexp_extract_all(text, '[a-z]{1,4}', 0))"
    return d.selectExpr(
        "doc_id",
        f"CAST({pieces} AS BIGINT) AS n_pieces",
        f"CAST(ceil({pieces} / 128.0d) AS BIGINT) AS n_chunks",
        f"CAST({pieces} % 128 AS BIGINT) AS last_chunk_fill",
    )


@register(
    "x42_vocab_oov",
    oracle="""
    WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    vocab AS (SELECT tok FROM (
        SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok ORDER BY n DESC, tok LIMIT 20)),
    j AS (SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
          FROM tok t LEFT JOIN vocab v ON t.tok = v.tok)
    SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(oov) AS BIGINT) AS n_oov,
           ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 4) AS oov_rate
    FROM j GROUP BY doc_id
    """,
)
def x42_vocab_oov(spark, sf_dir):
    """Frequency-based vocabulary construction + out-of-vocabulary audit:
    build the top-20 token vocabulary (ties -> lexicographic, so the cut is
    deterministic), then report each document's OOV token rate — the
    tokenizer-fitting step and the coverage metric that decides whether a
    vocab/corpus pairing is usable.

    Scale/plan: vocab = one token-keyed partial agg + TakeOrdered (no
    global sort); the corpus-sized side then LEFT-joins the vocab as a
    BROADCAST build (real vocabs are ~100k entries — always the small
    side), so the token stream never shuffles for membership, and the
    per-doc rollup shuffles once on doc_id."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 4).alias("oov_rate"),
        )
    )


def with_filter_verdict(df):
    """Stamp the x43 rule verdict onto ANY frame with (text, lang) columns
    — batch tables and streaming microbatches run the IDENTICAL rules
    (streaming/corpus_ingest.py imports this; the registry entry below is
    the batch/oracle face of the same projection). Adds ``verdict``,
    ``n_tokens``, ``uniq_ratio``; first tripped rule wins, rules ordered
    cheapest-first; pure codegen projection, no shuffle."""
    sig = df.withColumns(
        {
            "n_tokens": F.expr("size(split(text, ' '))"),
            "uniq_ratio": F.expr(
                "CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)"
                " / size(split(text, ' '))"
            ),
        }
    )
    return sig.withColumns(
        {
            "verdict": F.expr(
                # NULL text/lang would fall through every comparison to
                # 'keep' (CASE treats NULL predicates as not-true) — a real
                # hazard for STREAMED crawl batches, so malformed rows trip
                # first and are attributed, never silently admitted
                "CASE WHEN n_tokens IS NULL OR lang IS NULL THEN 'malformed'"
                " WHEN n_tokens < 20 THEN 'too_short'"
                " WHEN lang != 'en' THEN 'non_english'"
                " WHEN uniq_ratio < 0.25 THEN 'too_repetitive'"
                " ELSE 'keep' END"
            ),
            "n_tokens": F.col("n_tokens").cast("long"),
            "uniq_ratio": F.round("uniq_ratio", 4),
        }
    )


@register(
    "x43_filter_pipeline",
    oracle="""
    WITH sig AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS uniq_ratio
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN n_tokens IS NULL OR lang IS NULL THEN 'malformed'
                WHEN n_tokens < 20       THEN 'too_short'
                WHEN lang <> 'en'        THEN 'non_english'
                WHEN uniq_ratio < 0.25   THEN 'too_repetitive'
                ELSE 'keep' END AS verdict,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(uniq_ratio, 4) AS uniq_ratio
    FROM sig
    """,
)
def x43_filter_pipeline(spark, sf_dir):
    """Composite document-filter pipeline: the final keep/drop decision
    with a REASON column (first tripped rule wins, rules ordered
    cheapest-first) — the auditable filter stage real corpus pipelines ship
    (every dropped doc is attributable, rates per reason are monitorable
    via one groupBy on the output).

    Scale: single codegen projection over the signal expressions — the
    CASE chain short-circuits, so the expensive signals only evaluate for
    docs that survive the cheap gates; no shuffle."""
    d = load(spark, sf_dir, "documents")
    return with_filter_verdict(d).select("doc_id", "verdict", "n_tokens", "uniq_ratio")


@register(
    "x39_int8_quantize",
    oracle=_finite_embeddings("""
    WITH b AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s,
             embedding
      FROM embeddings
    ), e AS (
      SELECT vec_id, s,
             list_transform(embedding,
               x -> CASE WHEN s = 0 THEN 0.0 ELSE
                 abs(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) * 127 / s) * s / 127)
               END) AS err
      FROM b
    )
    SELECT vec_id, ROUND(s, 6) AS scale,
           ROUND(CAST(list_max(err) AS DOUBLE), 6)            AS max_abs_err,
           ROUND(CAST(list_sum(err) AS DOUBLE) / len(err), 6) AS mean_abs_err
    FROM e
    """),
)
def x39_int8_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization audit (the storage/bandwidth
    lever for ANN at scale: 4x smaller vectors, SIMD int8 dot products):
    scale = max|x|, q = round(x * 127 / scale), and the query reports the
    per-vector reconstruction error the quantizer introduces. The output is
    scalar stats (not the int8 array) so the oracle hash is
    representation-independent.

    Scale/plan: pure per-row higher-order-function math inside codegen — no
    shuffle, no UDF; the same expressions feed the actual quantized writer.

    Zero-vector guard: max|x| = 0 makes the scale divisor zero, but the
    zero vector quantizes EXACTLY (every q = 0), so its per-component
    error is 0 by definition — the CASE branch says so on both engines
    instead of an ANSI DIVIDE_BY_ZERO job abort on a legal input."""
    e = _load_finite_embeddings(spark, sf_dir)
    b = e.select(
        "vec_id",
        "embedding",
        F.expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s"),
    )
    err = b.select(
        "vec_id",
        "s",
        F.expr(
            "transform(embedding, x -> CASE WHEN s = 0D THEN 0D ELSE abs(CAST(x AS DOUBLE)"
            " - round(CAST(x AS DOUBLE) * 127 / s) * s / 127) END) AS err"
        ),
    )
    return err.select(
        "vec_id",
        F.round("s", 6).alias("scale"),
        F.expr("round(array_max(err), 6) AS max_abs_err"),
        F.expr("round(aggregate(err, 0.0d, (acc, x) -> acc + x) / size(err), 6) AS mean_abs_err"),
    )


@register(
    "x40_kmeans_update",
    oracle=_finite_embeddings("""
    WITH c AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
    p AS (
      SELECT e.vec_id AS cid, e.embedding AS ce, qid,
             list_sum(list_transform(range(1, len(qe) + 1),
                                     i -> CAST(qe[i] AS DOUBLE) * ce[i]))
             / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * x)))
                * sqrt(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * x)))) AS cos
      FROM embeddings e, c
    ), a AS (
      SELECT cid, ce, qid FROM p
      QUALIFY ROW_NUMBER() OVER (PARTITION BY cid ORDER BY cos DESC, qid) = 1
    ), d0 AS (SELECT qid, ce, UNNEST(range(1, len(ce) + 1)) AS i FROM a),
    d AS (SELECT qid AS centroid_id, i, AVG(CAST(ce[i] AS DOUBLE)) AS m FROM d0 GROUP BY 1, 2),
    old0 AS (SELECT qid, qe, UNNEST(range(1, len(qe) + 1)) AS i FROM c),
    old AS (SELECT qid, i, CAST(qe[i] AS DOUBLE) AS o FROM old0),
    n AS (SELECT qid AS centroid_id, COUNT(*) AS n_members FROM a GROUP BY 1)
    SELECT d.centroid_id, n_members,
           ROUND(sqrt(SUM(m * m)), 6)             AS new_norm,
           ROUND(sqrt(SUM((m - o) * (m - o))), 6) AS shift
    FROM d JOIN old ON old.qid = d.centroid_id AND old.i = d.i
           JOIN n ON n.centroid_id = d.centroid_id
    GROUP BY d.centroid_id, n_members
    """),
)
def x40_kmeans_update(spark, sf_dir):
    """One Lloyd iteration of distributed k-means over the embeddings (the
    training step behind x11's IVF index: assign -> recompute centroids),
    reported as per-centroid membership plus new-centroid norm and shift
    from the seed — scalar summaries, so the hash is layout-independent.

    Scale/plan: assignment is the x11 broadcast argmax (centroids are tiny
    and broadcast; candidates stream once). Centroid recompute explodes
    members to (centroid, dim) and hash-aggregates AVG per dimension —
    the shuffle key is (centroid, dim) (k x 64 cells), so partial
    aggregation absorbs the member fan-in map-side; nothing ever gathers a
    whole cluster's vectors on one node. Iterating = re-feeding the new
    centroids; each round is this same two-shuffle job."""
    e = _load_finite_embeddings(spark, sf_dir)
    # norms hoisted out of the assignment cross join (one fold per row)
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        V.norm(F.col("embedding")).alias("qn"),
    )
    allv = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        V.norm(F.col("embedding")).alias("cn"),
    )
    scored = allv.crossJoin(F.broadcast(cent)).select(
        "cid",
        "ce",
        "qid",
        V.cosine_with_norms(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")).alias("raw_cos"),
    )
    asg = scored.groupBy("cid").agg(
        F.max_by("qid", F.struct(F.col("raw_cos"), (-F.col("qid")).alias("neg"))).alias(
            "centroid_id"
        ),
        F.first("ce").alias("ce"),
    )
    # per-(centroid, dim) count == cluster size, so membership falls out of
    # the same aggregate — referencing asg twice would duplicate the
    # assignment cross-join subtree in the plan
    dims = (
        asg.select("centroid_id", F.posexplode("ce").alias("pos", "val"))
        .groupBy("centroid_id", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"), F.count("*").alias("cnt"))
    )
    old = cent.select(F.col("qid").alias("centroid_id"), F.posexplode("qe").alias("pos", "o"))
    return (
        dims.join(F.broadcast(old), ["centroid_id", "pos"])
        .groupBy("centroid_id")
        .agg(
            F.max("cnt").alias("n_members"),
            F.expr("round(sqrt(sum(m * m)), 6) AS new_norm"),
            F.expr("round(sqrt(sum((m - CAST(o AS DOUBLE)) * (m - CAST(o AS DOUBLE)))), 6) AS shift"),
        )
        .select("centroid_id", "n_members", "new_norm", "shift")
    )


@register(
    "x45_tfidf_top_term",
    oracle="""
    WITH tfc AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
      GROUP BY doc_id, term),
    dfc AS (
      SELECT doc_id, term, tf,
             CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
      FROM tfc),
    ranked AS (
      SELECT doc_id, term, tf, df,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tf DESC, df ASC, term ASC) AS rk
      FROM dfc)
    SELECT doc_id, term AS top_term, CAST(tf AS BIGINT) AS tf, df,
           ROUND(tf * ln((SELECT COUNT(*) FROM documents) / CAST(df AS DOUBLE)), 4)
             AS tfidf
    FROM ranked WHERE rk = 1
    """,
)
def x45_tfidf_top_term(spark, sf_dir):
    """Per-document most-distinctive term by TF-IDF — the keyword-extraction
    primitive of corpus triage (topic drift audits, cluster labeling).

    Plan: one explode -> (doc_id, term) hash agg for tf, then document
    frequency as a COUNT window over the term partition (reuses the same
    shuffled data — no second explode, no self-join), then a per-doc
    row_number pick. Ranking ties break on exact integers (tf DESC, df ASC,
    term ASC), so top-term selection is cross-engine deterministic; the
    logged idf only decorates the already-chosen row. Scale: two shuffles
    (term-grouped agg is partial-agg friendly; per-doc pick shuffles the
    distinct doc-term pairs, far smaller than the token stream)."""
    d = load(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tfc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tfc.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        dfc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("term").alias("top_term"),
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df").cast("double")), 4
            ).alias("tfidf"),
        )
    )


@register(
    "x46_unigram_lm_score",
    oracle="""
    WITH tfc AS (
      SELECT doc_id, term, COUNT(*) AS k
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
      GROUP BY doc_id, term),
    cc AS (
      SELECT doc_id, k,
             CAST(SUM(k) OVER (PARTITION BY term) AS BIGINT) AS c
      FROM tfc),
    stats AS (
      SELECT CAST(SUM(k) AS BIGINT) AS t_total, COUNT(DISTINCT term) AS v
      FROM tfc)
    SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
           ROUND(ln(t_total + v) - SUM(k * ln(c + 1)) / SUM(k), 4) AS nll
    FROM cc, stats GROUP BY doc_id, t_total, v
    """,
)
def x46_unigram_lm_score(spark, sf_dir):
    """Per-document mean negative log-likelihood under a corpus unigram
    language model with add-one smoothing — the cheap statistical
    perplexity-style quality filter (documents of improbable words score
    high): nll = ln(T+V) - mean_tokens(ln(count(term)+1)).

    Plan: one explode -> (doc_id, term, k) agg; corpus term counts as a SUM
    window over the term partition (no second pass over the token stream);
    corpus totals (T = tokens, V = vocab) as a 1-row aggregate broadcast;
    final per-doc agg weights each distinct term by its in-doc count. Scale:
    the token stream is shuffled once, everything after runs on distinct
    doc-term pairs; T/V recompute one extra agg over those pairs — at 100 TB
    they'd come from the corpus-stats table the vocab job (x42) maintains."""
    d = load(spark, sf_dir, "documents")
    tfc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    stats = tfc.agg(
        F.sum("k").alias("t_total"), F.count_distinct("term").alias("v")
    )
    cc = tfc.withColumn("c", F.sum("k").over(Window.partitionBy("term")))
    return (
        cc.crossJoin(F.broadcast(stats))
        .groupBy("doc_id", "t_total", "v")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.round(
                F.log(F.col("t_total") + F.col("v"))
                - F.sum(F.col("k") * F.log(F.col("c") + 1)) / F.sum("k"),
                4,
            ).alias("nll"),
        )
        .select("doc_id", "n_tokens", "nll")
    )


#: signed-random-projection signature: bit b = sign of <embedding, w_b>,
#: where hyperplane weights w_b[i] derive from md5(b || '_' || i) — the
#: engines share the hash, so the planes are identical everywhere with no
#: shipped weight table. 8 bits over dim 64 (sequence(0,7) / range(0,8)).
_SRP_SPARK = (
    "array_join(transform(sequence(0, 7), b -> IF("
    "aggregate(zip_with(embedding, transform(sequence(1, 64), i -> "
    "conv(substring(md5(concat(b, '_', i)), 1, 8), 16, 10) / 4294967296.0 - 0.5),"
    " (x, w) -> cast(x AS double) * w), cast(0.0 AS double), (acc, v) -> acc + v)"
    " >= 0.0, '1', '0')), '')"
)

_SRP_DUCK = """
    list_aggregate(list_transform(range(0, 8), b -> CASE WHEN
      list_sum(list_transform(range(1, 65), i ->
        CAST(embedding[i] AS DOUBLE) *
        (('0x' || substr(md5(b || '_' || i), 1, 8))::BIGINT / 4294967296.0 - 0.5)))
      >= 0.0 THEN '1' ELSE '0' END), 'string_agg', '')
"""


@register(
    "x47_srp_neardup",
    oracle=_finite_embeddings(f"""
    WITH sig AS (
      SELECT vec_id, embedding, {_SRP_DUCK} AS srp
      FROM embeddings)
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           ROUND(
             list_sum(list_transform(range(1, len(x.embedding) + 1),
                                     i -> CAST(x.embedding[i] AS DOUBLE) * y.embedding[i]))
             / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * v)))
              * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * v)))), 6) + 0 AS cosine
    FROM sig x JOIN sig y ON x.srp = y.srp AND x.vec_id < y.vec_id
    WHERE sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * v)))
        * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * v))) > 0
      AND list_sum(list_transform(range(1, len(x.embedding) + 1),
                                  i -> CAST(x.embedding[i] AS DOUBLE) * y.embedding[i]))
          / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * v)))
           * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * v)))) > 0.2
    """),
)
def x47_srp_neardup(spark, sf_dir):
    """Signed-random-projection (hyperplane) LSH near-dup — the fourth ANN
    family next to MinHash (Jaccard), SimHash (token cosine) and IVF
    (centroid cells): 8 sign bits of md5-derived hyperplane projections
    form the bucket key; only same-bucket pairs are exactly cosine-verified.
    P(bucket collision) = (1 - theta/pi)^8, so near-parallel vectors
    collide and the bucket join never goes doc x doc.

    Scale: signatures are one map-side pass (512 md5-derived weights per
    row, no weight table shipped); the pair join shuffles on the 8-bit
    bucket key — same posture as x03/x13. Unlike IVF it needs no trained
    centroids (data-independent), the standard cold-start ANN choice; the
    recall lever is multiple independent bucket tables (x14's multi-probe
    analog), traded here for the single-table plan."""
    e = _load_finite_embeddings(spark, sf_dir).select(
        "vec_id",
        "embedding",
        F.expr(_SRP_SPARK).alias("srp"),
        V.norm(F.col("embedding")).alias("_nrm"),
    )
    # norms hoisted before the bucket pair join (one fold per row)
    a = e.select(
        F.col("vec_id").alias("va"), F.col("srp").alias("sa"),
        F.col("embedding").alias("ea"), F.col("_nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vb"), F.col("srp").alias("sb"),
        F.col("embedding").alias("eb"), F.col("_nrm").alias("nb"),
    )
    scored = a.join(b, (F.col("sa") == F.col("sb")) & (F.col("va") < F.col("vb"))).select(
        F.col("va").alias("vec_a"),
        F.col("vb").alias("vec_b"),
        V.cosine_with_norms(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias("raw_cos"),
    )
    return scored.filter(F.col("raw_cos") > 0.2).select(
        "vec_a", "vec_b", F.round("raw_cos", 6).alias("cosine")
    )


def _winnow_selections(d):
    """The ONE winnowing construction every consumer derives from — the
    x48/x49/x73 registry entries and the streaming fingerprint index all
    fingerprint through here, so a streamed document can never diverge
    from its batch twin. Output: (doc_id, pos, sel) where sel packs
    (hash * 2^20 + (2^20-1 - pos0)) so a window MIN implements min-hash
    with rightmost tie-break in one pass.

    Shingles are CAPPED at 2^20-1 per document IN-PLAN: past that the
    packed position field (2^20-1 - pos0) goes negative and the borrow
    silently corrupts fp_hash (hash-1) — a ~1M-token document would take
    wrong fingerprints into the standing index and containment probes
    would silently miss it. Chunk longer docs (x41) before
    fingerprinting; the cap makes an unchunked giant safe, not fully
    fingerprinted (tail beyond 2^20 shingles uncovered)."""
    sh = d.select(
        "doc_id",
        F.posexplode(F.slice(TXT.shingles(F.col("text"), 3), 1, 1048575)).alias("pos0", "g"),
    )
    enc = sh.select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        (
            F.expr("cast(conv(substring(md5(g), 1, 8), 16, 10) AS bigint)") * 1048576
            + (F.lit(1048575) - F.col("pos0") - 1)
        ).alias("e"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    return enc.select("doc_id", "pos", F.min("e").over(w).alias("sel")).filter(F.col("pos") >= 4)


def winnow_fingerprint_hashes(d):
    """:func:`_winnow_selections` reduced to the distinct (doc_id, fp_hash)
    set — the postings the fingerprint INDEX stores and the containment
    probes join on."""
    return (
        _winnow_selections(d)
        .select("doc_id", (F.col("sel") / 1048576).cast("long").alias("fp_hash"))
        .distinct()
    )



@register(
    "x48_winnowing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(range(1, len(ts) - 1)) AS pos,
             UNNEST(list_transform(range(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
      FROM toks WHERE len(ts) >= 3),
    enc AS (
      SELECT doc_id, pos,
             ('0x' || substr(md5(g), 1, 8))::BIGINT * 1048576
               + (1048575 - pos) AS e
      FROM sh WHERE pos <= 1048575),
    win AS (
      SELECT doc_id, pos,
             MIN(e) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
      FROM enc)
    SELECT DISTINCT doc_id,
           CAST(1048575 - sel % 1048576 AS BIGINT) AS fp_pos,
           CAST(sel // 1048576 AS BIGINT)          AS fp_hash
    FROM win WHERE pos >= 4
    """,
)
def x48_winnowing(spark, sf_dir):
    """Winnowing fingerprints (the MOSS local-fingerprinting scheme,
    Schleimer/Wilkerson/Aiken 2003 [PK]): hash word 3-grams, slide a
    4-hash window, keep each window's minimum hash (ties -> rightmost),
    dedupe selections. Guarantees a shared fingerprint for any match of
    >= w+k-1 tokens — position-robust partial-overlap detection, where
    shingle-set methods (x02-x04) only score whole documents.

    Plan: one explode -> encoded (hash, pos) pair packed into a single
    BIGINT (hash*2^20 + (2^20-1-pos), so MIN implements min-hash with
    rightmost tie-break in one window pass — no argmin self-join), one
    window over (doc_id, pos), one distinct. Scale: everything partitions
    by doc_id (the explode never shuffles across documents); the 2^52
    encode bound caps docs at 2^20-1 shingles, ENFORCED in-plan by
    :func:`_winnow_selections` (the shared construction) — chunk longer
    docs (x41's chunker) before fingerprinting."""
    return (
        _winnow_selections(load(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            (F.lit(1048575) - F.col("sel") % 1048576).alias("fp_pos"),
            (F.col("sel") / 1048576).cast("long").alias("fp_hash"),
        )
        .distinct()
    )


@register(
    "x49_fingerprint_matches",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(range(1, len(ts) - 1)) AS pos,
             UNNEST(list_transform(range(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
      FROM toks WHERE len(ts) >= 3),
    enc AS (
      SELECT doc_id, pos,
             ('0x' || substr(md5(g), 1, 8))::BIGINT * 1048576
               + (1048575 - pos) AS e
      FROM sh WHERE pos <= 1048575),
    win AS (
      SELECT doc_id, pos,
             MIN(e) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
      FROM enc),
    fp AS (
      SELECT DISTINCT doc_id, CAST(sel // 1048576 AS BIGINT) AS fp_hash
      FROM win WHERE pos >= 4),
    sized AS (
      SELECT doc_id, fp_hash,
             CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_fp
      FROM fp)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared,
           ROUND(COUNT(*) / CAST(LEAST(ANY_VALUE(a.n_fp), ANY_VALUE(b.n_fp)) AS DOUBLE), 4)
             AS containment
    FROM sized a JOIN sized b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    """,
)
def x49_fingerprint_matches(spark, sf_dir):
    """The MOSS match step over x48's winnowed fingerprints: an inverted
    index on fp_hash joins documents sharing any fingerprint, pairs are
    scored by shared-fingerprint count and containment (shared / smaller
    doc's fingerprint count — the asymmetric measure that catches a doc
    quoted inside a larger one, which symmetric Jaccard dilutes).

    Plan: fingerprints -> per-doc count window -> inverted-index self-join
    on fp_hash -> (doc_a, doc_b) count agg. Scale: the join key is the
    fingerprint hash (never doc x doc); winnowing already thinned postings
    ~2x/w, and hot boilerplate hashes get a postings-length cap before the
    join (the x03/x04 LSH-prefilter rule — drop hashes with df above a
    skew bound; df maxes at 7 on this corpus, so the cap is a no-op
    here). At 100 TB, x48's fingerprints would be a materialized table,
    not recomputed per query."""
    # x48 keys fingerprints by (doc_id, pos, hash); the index wants the
    # distinct hash SET per doc (a hash winnowed at two positions is one
    # posting, else shared counts double)
    fps = winnow_fingerprint_hashes(load(spark, sf_dir, "documents"))
    sized = fps.withColumn(
        "n_fp", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    a = sized.select(
        F.col("doc_id").alias("doc_a"), "fp_hash", F.col("n_fp").alias("na")
    )
    b = sized.select(
        F.col("doc_id").alias("doc_b"), F.col("fp_hash").alias("fb"), F.col("n_fp").alias("nb")
    )
    return (
        a.join(b, (F.col("fp_hash") == F.col("fb")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.round(
                F.count(F.lit(1))
                / F.least(F.any_value("na"), F.any_value("nb")).cast("double"),
                4,
            ).alias("containment"),
        )
        .filter(F.col("shared") >= 2)
    )


@register("x50_hll_sketch_rollup", oracle=None)
def x50_hll_sketch_rollup(spark, sf_dir):
    """Mergeable-sketch distinct counting (Apache DataSketches HLL via
    Spark 4 built-ins): month-level sketches of distinct customers are
    UNIONED into per-year estimates — the re-aggregation that exact
    COUNT(DISTINCT) cannot do (distinct counts don't add) and x30's
    approx_count_distinct doesn't expose (its sketch never leaves the
    aggregate). This is the at-scale architecture: a 100 TB fact table is
    sketched ONCE into a tiny (group, sketch-blob) table, and every
    coarser rollup (year, region, all-time) is a cheap sketch union over
    that table — no second pass over raw data. Rows-only check here
    (estimates are approximate by design); tests/test_sketches.py pins the
    accuracy envelope against exact counts."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("oyear"), F.month("o_orderdate").alias("omonth")
    ).agg(F.expr("hll_sketch_agg(o_custkey, 14)").alias("sk"))
    return (
        monthly.groupBy("oyear")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("est_customers"),
            F.count(F.lit(1)).alias("n_months"),
        )
        .select("oyear", "est_customers", "n_months")
    )


@register(
    "x51_mixture_sample",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    t AS (
      SELECT source, n_docs,
             CAST(ROUND(10000 * pow(n_docs, 0.5) / SUM(pow(n_docs, 0.5)) OVER (), 0)
                  AS BIGINT) AS target_docs
      FROM s),
    rated AS (
      SELECT d.doc_id, d.source,
             CAST(t.target_docs AS DOUBLE) / t.n_docs AS rate,
             (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT % 1000000)
               / 1000000.0 AS u
      FROM documents d JOIN t USING (source)),
    copies AS (
      SELECT doc_id, source,
             CAST(FLOOR(rate) AS BIGINT)
               + CASE WHEN u < rate - FLOOR(rate) THEN 1 ELSE 0 END AS n_copies
      FROM rated)
    SELECT doc_id, source, UNNEST(range(0, n_copies)) AS copy_id
    FROM copies
    """,
)
def x51_mixture_sample(spark, sf_dir):
    """Materialize the training mixture: apply x35's temperature-flattened
    per-source budgets to the corpus — stochastic-rounding replication
    (floor(rate) copies + one more iff the doc's hash-uniform < the
    fractional part), so small sources upsample and large ones downsample
    to their budget, deterministically (a doc's copy count never changes
    across runs or partitionings; no RNG state).

    Plan/scale: per-source budgets are a k-row aggregate broadcast into
    the corpus scan; copy fan-out is posexplode(array_repeat) map-side —
    the corpus is read once, shuffled zero times. The epoch writer (x36's
    sharder) consumes (doc_id, copy_id) directly."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    t = s.selectExpr(
        "source",
        "n_docs",
        "CAST(round(10000 * pow(n_docs, 0.5d) / sum(pow(n_docs, 0.5d)) over (), 0)"
        " AS BIGINT) AS target_docs",
    )
    rated = d.select("doc_id", "source").join(F.broadcast(t), "source").select(
        "doc_id",
        "source",
        (F.col("target_docs").cast("double") / F.col("n_docs")).alias("rate"),
        (
            F.expr(
                "conv(substring(md5(CAST(doc_id AS string)), 1, 6), 16, 10) % 1000000"
            )
            / 1000000.0
        ).alias("u"),
    )
    copies = rated.select(
        "doc_id",
        "source",
        (
            F.floor("rate")
            + F.when(F.col("u") < F.col("rate") - F.floor("rate"), 1).otherwise(0)
        ).alias("n_copies"),
    )
    return copies.select(
        "doc_id",
        "source",
        F.posexplode(F.array_repeat(F.lit(1), F.col("n_copies").cast("int"))).alias(
            "copy_id", "_one"
        ),
    ).select("doc_id", "source", F.col("copy_id").cast("long").alias("copy_id"))


@register(
    "x52_length_batching",
    oracle="""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    binned AS (
      SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
             (ROW_NUMBER() OVER (PARTITION BY n_tokens // 64 ORDER BY doc_id) - 1) // 32
               AS batch_id
      FROM toks),
    withmax AS (
      SELECT bucket, batch_id, n_tokens,
             MAX(n_tokens) OVER (PARTITION BY bucket, batch_id) AS bmax
      FROM binned)
    SELECT bucket, batch_id, COUNT(*) AS n_docs,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(bmax - n_tokens) AS BIGINT) AS padding_waste
    FROM withmax
    GROUP BY bucket, batch_id
    """,
)
def x52_length_batching(spark, sf_dir):
    """Length-grouped batching for inference/training: documents are
    bucketed by token-length band (64-token bands), then packed 32 to a
    batch in stable doc_id order; each batch reports its padding waste
    (sum of pad tokens if every member pads to the batch max) — the
    batching policy that minimizes pad FLOPs vs random batching.

    Plan: one map pass for lengths, one window per (bucket) for batch
    numbering, one (bucket, batch) agg. Scale: the shuffle key is the
    length band — bounded cardinality, uniform by construction; at 100 TB
    the row_number window becomes the per-band monotonic id the sharded
    writer already assigns per partition."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.expr("CAST(size(split(text, ' ')) AS bigint)").alias("n_tokens")
    )
    binned = toks.select(
        "doc_id",
        "n_tokens",
        F.expr("n_tokens div 64").alias("bucket"),
        (
            (
                F.row_number().over(
                    Window.partitionBy(F.expr("n_tokens div 64")).orderBy("doc_id")
                )
                - 1
            )
            / 32
        ).cast("long").alias("batch_id"),
    )
    wmax = Window.partitionBy("bucket", "batch_id")
    return (
        binned.withColumn("bmax", F.max("n_tokens").over(wmax))
        .groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum(F.col("bmax") - F.col("n_tokens")).alias("padding_waste"),
        )
    )


#: x03's candidate-pair CTE chain (shared by the graph-analytics oracles)
_LSH_CAND_CTE = """
    WITH sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    ), sig AS (
      SELECT doc_id, seed,
             MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                        CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
      FROM hashed, (SELECT UNNEST(range(8)) AS seed)
      GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 2 AS band, STRING_AGG(minhash, '|' ORDER BY seed) AS band_val
      FROM sig GROUP BY doc_id, seed // 2
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                               AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand
    )
"""


@register(
    "x53_pagerank",
    oracle=_LSH_CAND_CTE
    + """
    , deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT src AS doc_id, 1.0 AS r FROM deg),
    r1 AS (SELECT e.dst AS doc_id, 0.15 + 0.85 * CAST(SUM(CAST(p.r / d.deg AS DECIMAL(30,15))) AS DOUBLE) AS r
           FROM edges e JOIN r0 p ON p.doc_id = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    r2 AS (SELECT e.dst AS doc_id, 0.15 + 0.85 * CAST(SUM(CAST(p.r / d.deg AS DECIMAL(30,15))) AS DOUBLE) AS r
           FROM edges e JOIN r1 p ON p.doc_id = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    r3 AS (SELECT e.dst AS doc_id, 0.15 + 0.85 * CAST(SUM(CAST(p.r / d.deg AS DECIMAL(30,15))) AS DOUBLE) AS r
           FROM edges e JOIN r2 p ON p.doc_id = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst)
    SELECT r3.doc_id, ROUND(r3.r, 6) AS rank, CAST(d.deg AS BIGINT) AS degree
    FROM r3 JOIN deg d ON d.src = r3.doc_id
    """,
)
def x53_pagerank(spark, sf_dir):
    """Damped PageRank (d=0.85, 3 synchronous iterations) over the LSH
    candidate graph — centrality on the near-dup graph ranks template/
    boilerplate hubs (documents similar to MANY others), the signal dedup
    triage uses to distinguish a mirrored page from a template family.

    Iterative dataflow done Spark-style: degrees computed once and the
    edge list localCheckpoint'ed (reused every round without replanning);
    each round is one shuffle — contributions r/deg flow along edges,
    grouped on the destination, accumulated in DECIMAL (the dsum rule) so
    per-round sums are independent of partitioning/summation order. Fixed iteration count keeps it
    deterministic and oracle-expressible (unrolled CTEs); production runs
    to convergence with x06's monotone-sum stopping rule. Scale: state per
    round is one (node, rank) table partitioned by node id; the classic
    power-iteration plan."""
    pairs = x03_minhash_lsh_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    edges = edges.localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(F.col("src").alias("doc_id"), F.lit(1.0).alias("r"))
    contrib_edges = edges.join(deg, "src").select(
        "src", "dst", "deg"
    ).localCheckpoint()
    for _ in range(3):
        ranks = (
            contrib_edges.join(ranks, F.col("src") == F.col("doc_id"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(0.15)
                    + 0.85
                    * F.sum((F.col("r") / F.col("deg")).cast("decimal(30,15)")).cast("double")
                ).alias("r")
            )
            .select(F.col("dst").alias("doc_id"), "r")
        )
    return (
        ranks.join(deg, F.col("doc_id") == F.col("src"))
        .select("doc_id", F.round("r", 6).alias("rank"), F.col("deg").alias("degree"))
    )


# --------------------------------------------------------------------------
# Data-quality / profiling gates (the audits a pipeline runs before a
# training job consumes a drop)
# --------------------------------------------------------------------------


@register(
    "x54_column_profile",
    oracle="""
    WITH long AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
      UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem),
    counted AS (
      SELECT col, val, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY col ORDER BY COUNT(*) DESC, val) AS rk
      FROM long GROUP BY col, val)
    SELECT col, val, n, CAST(rk AS BIGINT) AS rk
    FROM counted WHERE rk <= 3
    """,
)
def x54_column_profile(spark, sf_dir):
    """Categorical column profiling: top-3 most frequent values per audited
    column — the "what's actually in this column" check every intake audit
    starts with. Columns are unpivoted to (col, val) long form so ONE
    hash-agg + one per-column rank serves any number of columns (vs. one
    job per column); ties break on value for determinism. Scale: the agg
    collapses to distinct (col, value) pairs map-side; the rank window
    partitions by column — parallel across audited columns."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    long = (
        o.selectExpr("'o_orderstatus' AS col", "o_orderstatus AS val")
        .unionByName(o.selectExpr("'o_orderpriority' AS col", "o_orderpriority AS val"))
        .unionByName(li.selectExpr("'l_returnflag' AS col", "l_returnflag AS val"))
    )
    counted = long.groupBy("col", "val").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("col").orderBy(F.col("n").desc(), "val")
    return (
        counted.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("col", "val", "n", "rk")
    )


@register(
    "x55_fk_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk,
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL) AS orphans,
           (SELECT COUNT(*) FROM lineitem) AS total
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE n.n_nationkey IS NULL),
           (SELECT COUNT(*) FROM customer)
    """,
)
def x55_fk_integrity(spark, sf_dir):
    """Referential-integrity audit: orphan-row counts for each declared FK
    edge (child rows whose parent key is missing), as one result table —
    the join-safety gate run before any star-join workload trusts the
    drop. Each edge is a LEFT ANTI join (Spark's native orphan scan);
    parent key sets are dims or dim-sized, so the audits broadcast where
    it matters and never shuffle the child twice. Rates are left to the
    consumer (orphans/total both reported)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    def edge(name, child, child_key, parent, parent_key):
        orphans = child.join(
            parent, child[child_key] == parent[parent_key], "left_anti"
        ).count()
        total = child.count()
        return (name, orphans, total)

    rows = [
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
    ]
    return spark.createDataFrame(rows, "fk string, orphans bigint, total bigint")


@register(
    "x56_completeness_profile",
    oracle="""
    SELECT 'c_name' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(c_name) AS n_null,
           COUNT(DISTINCT c_name)   AS n_distinct
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
           COUNT(DISTINCT c_mktsegment)
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', COUNT(*), COUNT(*) - COUNT(c_acctbal),
           COUNT(DISTINCT c_acctbal)
    FROM customer
    """,
)
def x56_completeness_profile(spark, sf_dir):
    """Column completeness/cardinality profile: rows, nulls, exact distinct
    per audited column — the schema-health gate (a column going 90% null
    or collapsing to one value is the classic upstream-breakage signal).
    One aggregate per column over a single scan (Spark computes all three
    columns' stats in one pass — the selects share the cached relation);
    at 100 TB exact COUNT(DISTINCT) swaps for the x50 HLL sketch, same
    output contract."""
    c = load(spark, sf_dir, "customer")
    parts = [
        c.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
        )
        for col in ("c_name", "c_mktsegment", "c_acctbal")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "x57_distribution_drift",
    oracle="""
    WITH tagged AS (
      SELECT source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 2 AS snap
      FROM documents),
    counts AS (
      SELECT source,
             COUNT(*) FILTER (WHERE snap = 0) AS na,
             COUNT(*) FILTER (WHERE snap = 1) AS nb
      FROM tagged GROUP BY source),
    tot AS (
      SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb FROM counts)
    SELECT source, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           ROUND((na / CAST(ta AS DOUBLE) - nb / CAST(tb AS DOUBLE))
                 * ln((na / CAST(ta AS DOUBLE)) / (nb / CAST(tb AS DOUBLE))), 6)
             AS psi_term
    FROM counts, tot
    WHERE na > 0 AND nb > 0
    """,
)
def x57_distribution_drift(spark, sf_dir):
    """Population-stability drift between two corpus snapshots (proxied by
    a deterministic hash split of doc_id): per-source PSI terms
    (p_a - p_b) * ln(p_a / p_b) — the intake gate that catches a source
    silently vanishing or flooding between drops; consumers sum the terms
    (PSI > 0.2 = investigate). One pass: conditional counts per source,
    totals as a 1-row broadcast, pure map arithmetic after. Zero-count
    cells are excluded (their PSI term is infinite; a disappeared source
    shows up in x24/x56 instead)."""
    d = load(spark, sf_dir, "documents")
    snap = F.expr("conv(substring(md5(CAST(doc_id AS string)), 1, 4), 16, 10) % 2")
    counts = d.select("source", snap.alias("snap")).groupBy("source").agg(
        F.count(F.when(F.col("snap") == 0, 1)).alias("na"),
        F.count(F.when(F.col("snap") == 1, 1)).alias("nb"),
    )
    tot = counts.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    pa = F.col("na") / F.col("ta").cast("double")
    pb = F.col("nb") / F.col("tb").cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "source",
            "na",
            "nb",
            F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
        )
    )


@register(
    "x58_incremental_dedup",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, md5(text) AS digest,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 2 AS snap
      FROM documents),
    corpus AS (
      SELECT digest, MIN(doc_id) AS keep_doc_id
      FROM tagged WHERE snap = 0 GROUP BY digest)
    SELECT t.doc_id, t.digest, c.keep_doc_id AS dup_of,
           c.keep_doc_id IS NOT NULL AS is_dup
    FROM tagged t LEFT JOIN corpus c ON t.digest = c.digest
    WHERE t.snap = 1
    """,
)
def x58_incremental_dedup(spark, sf_dir):
    """Incremental (new-batch-vs-corpus) exact dedup: each incoming
    document's content digest is probed against the standing corpus digest
    table; hits report which retained document they duplicate. This is the
    ingest-time form of x01 — the corpus is NOT rescanned per batch, only
    its (digest, keep_doc_id) index is joined (here both sides derive from
    the same table via the x57 hash split; in production the index is the
    materialized table the SCD2 store maintains).

    Scale: the probe is a hash join keyed on digest — the incoming batch
    (small) builds, the corpus index streams; with the index bucketed on
    digest the join is shuffle-free on the corpus side. The streaming twin
    is dedup.py's dropDuplicatesWithinWatermark when "corpus" means the
    watermark horizon instead of all history."""
    d = load(spark, sf_dir, "documents")
    tagged = d.select(
        "doc_id",
        F.md5("text").alias("digest"),
        F.expr("conv(substring(md5(CAST(doc_id AS string)), 1, 4), 16, 10) % 2").alias("snap"),
    )
    corpus = (
        tagged.filter(F.col("snap") == 0)
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_doc_id"))
    )
    return (
        tagged.filter(F.col("snap") == 1)
        .join(corpus, "digest", "left")
        .select(
            "doc_id",
            "digest",
            F.col("keep_doc_id").alias("dup_of"),
            F.col("keep_doc_id").isNotNull().alias("is_dup"),
        )
    )


@register(
    "x60_rendezvous_resharding",
    oracle="""
    WITH w8 AS (
      SELECT doc_id, s AS shard,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || s), 1, 8))::BIGINT AS wt
      FROM documents, (SELECT UNNEST(range(0, 8)) AS s)),
    a8 AS (
      SELECT doc_id, shard
      FROM w8 QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY wt DESC, shard) = 1),
    w9 AS (
      SELECT doc_id, s AS shard,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || s), 1, 8))::BIGINT AS wt
      FROM documents, (SELECT UNNEST(range(0, 9)) AS s)),
    a9 AS (
      SELECT doc_id, shard
      FROM w9 QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY wt DESC, shard) = 1)
    SELECT a8.shard AS shard_before, a9.shard AS shard_after,
           COUNT(*) AS n_docs
    FROM a8 JOIN a9 USING (doc_id)
    GROUP BY 1, 2
    """,
)
def x60_rendezvous_resharding(spark, sf_dir):
    """Rendezvous (highest-random-weight) sharding + reshard audit: each
    doc's shard is argmax over shards of md5(doc:shard); the query compares
    the 8-shard and 9-shard assignments as a movement matrix. The property
    under audit is WHY consistent placement matters at 100 TB: adding a
    shard moves only the docs whose new shard WINS their argmax (~1/9 of
    the corpus, all into the new shard — every off-diagonal cell lands in
    shard 8), where mod-hashing (x36) reshuffles nearly everything.

    Plan: weights are generated map-side (shards x docs rows from one
    explode), argmax is one window per assignment, the matrix is a tiny
    agg. The x36 sharder would adopt this expression for stable
    incremental re-partitioning."""
    d = load(spark, sf_dir, "documents").select("doc_id")

    def assign(n):
        w = d.select(
            "doc_id", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("shard")
        ).withColumn(
            "wt",
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(doc_id AS string), ':', "
                "CAST(shard AS string))), 1, 8), 16, 10) AS BIGINT)"
            ),
        )
        win = Window.partitionBy("doc_id").orderBy(F.col("wt").desc(), "shard")
        return (
            w.withColumn("rk", F.row_number().over(win))
            .filter(F.col("rk") == 1)
            .select("doc_id", "shard")
        )
    before = assign(8).withColumnRenamed("shard", "shard_before")
    after = assign(9).withColumnRenamed("shard", "shard_after")
    return (
        before.join(after, "doc_id")
        .groupBy("shard_before", "shard_after")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "x61_domain_doc_cap",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM (SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rk
          FROM documents)
    WHERE rk <= 10
    """,
)
def x61_domain_doc_cap(spark, sf_dir, cap: int = 10):
    """Per-domain document cap (the C4/RefinedWeb anti-boilerplate step):
    keep at most K docs per source, preferring longer documents, with
    doc_id as the deterministic tie-break — so re-runs and appends pick
    identical survivors.

    Scale — the pre-aggregation guard: count per source first (partial-agg,
    map-side combine, cheap), and route ONLY sources OVER the cap through
    the rank window; an under-cap source's rows pass through with no sort
    at all (anti join against the over-cap source list). Aggregation-key
    skew on a C4-scale mega-domain would otherwise make the window sort the
    bottleneck AQE cannot split; with the guard, the window's input is
    bounded by the over-cap sources' rows and every bounded domain is a
    shuffle-free pass-through. The over-cap source LIST is tiny (one row
    per hot domain) — broadcast in the latency profile, AQE-sized on a
    cluster. Plan shape pinned by tests/test_plans.py."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    over = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select("source")
    )
    under_rows = docs.join(local_hint(over), "source", "left_anti")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    capped = (
        docs.join(local_hint(over), "source", "left_semi")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
    return under_rows.unionByName(capped).select("doc_id", "source", "n_chars")


#: approx_top_k item budget for x62 — two orders above the qualifying set
#: at any tested SF, so threshold selection is never rank-truncated
_X62_K = 10_000


@register(
    "x62_vocab_heavy_hitters",
    oracle="""
    SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok
    HAVING COUNT(*) >= 100
    """,
)
def x62_vocab_heavy_hitters(spark, sf_dir):
    """Vocabulary heavy hitters via approx_top_k (Spark 4's frequent-items
    sketch): the tokens a tokenizer-training / stopword-mining pass wants,
    without a full groupBy over 10^11 token occurrences.

    The sketch is mergeable (partial per partition, one combine), so the
    shuffle moves sketch bytes, not token rows. Selection is by count
    THRESHOLD, not rank, so the output set is deterministic whenever the
    tracked-item budget covers the tail (exact regime — true at test SF;
    at 100 TB the same plan returns epsilon-bounded counts and the
    threshold keeps the set stable for any item far from the boundary).

    The item budget k is sized two orders above the expected qualifying
    set so the rank cap can never silently truncate threshold selection
    (the r4 shape used k=100, which would drop qualifiers the moment more
    than 100 tokens cleared the threshold); tests pin that the qualifying
    set stays far below k at test SF."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    top = toks.agg(F.expr(f"approx_top_k(tok, {_X62_K}, 100000)").alias("tk"))
    return (
        top.select(F.explode("tk").alias("s"))
        .select(
            F.col("s.item").alias("token"),
            F.col("s.count").cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") >= 100)
    )


@register(
    "x63_source_vocab_overlap",
    oracle="""
    WITH v AS (
      SELECT DISTINCT source, tok
      FROM (SELECT source, UNNEST(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ), c AS (
      SELECT source, COUNT(*) AS n FROM v GROUP BY source
    ), i AS (
      SELECT a.source AS sa, b.source AS sb, COUNT(*) AS inter
      FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT ca.source AS source_a, cb.source AS source_b,
           CAST(COALESCE(i.inter, 0) AS BIGINT) AS inter_cnt,
           CAST(ca.n + cb.n - COALESCE(i.inter, 0) AS BIGINT) AS union_cnt,
           ROUND(COALESCE(i.inter, 0)
                 / CAST(ca.n + cb.n - COALESCE(i.inter, 0) AS DOUBLE), 6) AS jaccard
    FROM c ca
    JOIN c cb ON ca.source < cb.source
    LEFT JOIN i ON i.sa = ca.source AND i.sb = cb.source
    """,
)
def x63_source_vocab_overlap(spark, sf_dir):
    """Pairwise source-vocabulary overlap via theta sketches — the
    sketch-based contamination/diversity screen (x34 is the exact join
    check; this is what actually runs first at corpus scale). Theta
    sketches, unlike HLL, support set INTERSECTION, so per-slice sketches
    built in one pass answer all O(slices^2) overlap questions without
    re-touching the data.

    One shuffle builds a sketch per source (the plan shows
    partial_theta_sketch_agg map-side combine — sketch bytes shuffle, not
    token rows); the pair grid is |sources|^2 sketch pairs — driver-tiny,
    broadcast — and every estimate is sketch-local. As a lazy registry
    plan the self-join recomputes the sketch table on both sides; a
    pipeline persists it once and pays ONE pass. Below the sketch's
    nominal capacity (2^12 entries) theta is EXACT, which is what the
    oracle pins at test SF; at 100 TB the same plan returns ~1.6%
    relative-error estimates."""
    v = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # NO count_distinct alongside the sketch: an exact distinct aggregate
    # forces an Expand + shuffle of every distinct (source, tok) row — the
    # exact pass the sketch exists to avoid — and its output was never used
    sk = v.groupBy("source").agg(F.expr("theta_sketch_agg(tok)").alias("sk"))
    a = sk.select(F.col("source").alias("source_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("source").alias("source_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
    inter = F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))").cast("long")
    union = F.expr("theta_sketch_estimate(theta_union(sk_a, sk_b))").cast("long")
    return pairs.select(
        "source_a",
        "source_b",
        inter.alias("inter_cnt"),
        union.alias("union_cnt"),
        F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
    )


def scrub_boilerplate(d):
    """Frame-level core of the oracle-checked x64: remove passages
    repeated across >1 documents of ``d`` (doc_id, text) and reassemble
    each document's surviving passages in order; returns (doc_id,
    clean_text, n_removed) for EVERY input document — all-boilerplate
    docs come back with '', NULL-text docs come back with clean_text
    NULL and n_removed 0 (the explode would otherwise silently DROP
    them; '' would conflate 'no text' with 'all boilerplate scrubbed' —
    hostile-fixture finding). See x64's docstring for the plan shape."""
    null_docs = d.filter(F.col("text").isNull()).select(
        "doc_id",
        F.lit(None).cast("string").alias("clean_text"),
        F.lit(0).cast("long").alias("n_removed"),
    )
    toks = "split(text, ' ')"
    p = d.select(
        "doc_id",
        F.expr(
            f"explode(transform(sequence(0, CAST(ceil(size({toks}) / 16.0) AS BIGINT) - 1),"
            f" k -> struct(k AS k, concat_ws(' ', slice({toks}, k*16+1, 16)) AS passage))) AS c"
        ),
    ).select("doc_id", F.col("c.k").alias("k"), F.col("c.passage").alias("passage"))
    # "repeated across >1 documents" == min(doc_id) != max(doc_id): same
    # predicate as COUNT(DISTINCT doc_id) > 1 (NULL doc_ids are ignored by
    # both forms), but min/max are plain hash-aggregable partials — ONE
    # passage-keyed exchange instead of the distinct's two-level
    # (passage, doc_id) expand + re-agg (r11; measured 1.7x on the stage)
    rep = (
        p.groupBy("passage")
        .agg(F.min("doc_id").alias("_dmin"), F.max("doc_id").alias("_dmax"))
        .filter(F.col("_dmin") != F.col("_dmax"))
        .select("passage", F.lit(True).alias("_rep"))
    )
    flagged = p.join(rep, "passage", "left")
    scrubbed = flagged.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_rep").isNull(), F.struct("k", "passage"))
                    )
                ),
                lambda s: s.getField("passage"),
            ),
        ).alias("clean_text"),
        F.sum(F.when(F.col("_rep").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
    )
    return scrubbed.unionByName(null_docs)


def near_dup_clusters(d):
    """Frame-level near-dedup over ANY (doc_id, text) frame: x02/x03's
    banding (shared construction, :func:`minhash_band_values`) -> the
    banded candidate self-join -> :func:`connected_components`. Returns
    (doc_id, cluster_id) for EVERY input document (singletons map to
    themselves) — what corpus.py runs on CLEANED text, with the identical
    code path the oracle-checked registry entries exercise on the raw
    table."""
    bands = minhash_band_values(d)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    lab = connected_components(pairs).select(F.col("node").alias("l_doc"), "cluster_id")
    docs = d.select("doc_id")
    return docs.join(lab, docs["doc_id"] == lab["l_doc"], "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )


@register(
    "x64_boilerplate_scrub",
    oracle="""
    WITH p AS (
      SELECT doc_id, k, passage FROM (
        SELECT doc_id, UNNEST(range(0, CAST(ceil(len(string_split(text,' ')) / 16.0) AS BIGINT))) AS k,
               string_split(text,' ') AS toks
        FROM documents) t,
        LATERAL (SELECT array_to_string(t.toks[k*16+1 : k*16+16], ' ') AS passage)
    ), rep AS (
      SELECT passage FROM p GROUP BY passage HAVING COUNT(DISTINCT doc_id) > 1
    ), kept AS (
      SELECT doc_id, k, passage FROM p WHERE passage NOT IN (SELECT passage FROM rep)
    )
    SELECT d.doc_id,
           -- NULL text stays NULL (no text is not 'all boilerplate');
           -- otherwise all-scrubbed docs come back as ''
           CASE WHEN MAX(d.text) IS NULL AND COUNT(p_all.k) = 0 THEN NULL
                ELSE COALESCE(string_agg(kept.passage, ' ' ORDER BY kept.k), '')
           END AS clean_text,
           CAST(COUNT(p_all.k) - COUNT(kept.k) AS BIGINT) AS n_removed
    FROM documents d
    LEFT JOIN p p_all ON p_all.doc_id = d.doc_id
    LEFT JOIN kept ON kept.doc_id = d.doc_id AND kept.k = p_all.k
    GROUP BY d.doc_id
    """,
)
def x64_boilerplate_scrub(spark, sf_dir):
    """Boilerplate REMOVAL (the rewrite stage x38 only reports): passages
    repeated across >1 documents are scrubbed from EVERY document and the
    surviving passages are re-assembled in order — C4's repeated-line
    filter at passage granularity ("we removed any line that occurred
    more than X times in the corpus", Raffel et al. 2020). A document
    that was ALL boilerplate survives with empty text (the downstream
    length filter is the place that drops it — stages stay single-purpose
    and auditable via n_removed).

    Scale/plan: same chunk explode as x38, ONE digest-keyed hash-agg for
    the repeated set, then ONE passage-keyed join stamps a repeated flag
    (the repeated set is HAVING-filtered and tiny — boilerplate is by
    definition a small distinct set with high multiplicity, so at scale
    this side broadcasts), and ONE doc-keyed groupBy produces the
    reassembled text (array_sort on (k, passage) structs, collect_list
    skipping the flagged nulls) AND the n_removed count in the same
    pass. No join back to documents: every document yields >=1 chunk, so
    the doc-keyed groupBy already covers all of them (an all-boilerplate
    doc collects an empty array -> ''). vs the first shape this drops the
    separate per-doc totals aggregate, the anti-join, and the documents
    join — two fewer shuffles; nothing is quadratic."""
    return scrub_boilerplate(load(spark, sf_dir, "documents"))


#: per-cluster row bound for x65 — the label-keyed pair join costs
#: sum(|cluster|²) and one cluster's pairs land on ONE shuffle partition
#: (a single join key; AQE cannot split it), so the bound caps the worst
#: single-task pair count at ~4x10^8 dot products. A label whose upstream
#: clustering (x40) emits more rows is SUB-SPLIT into ceil(n/bound)
#: secondary hash bands and pairs form within a band only — the standard
#: SemDeDup-at-scale concession (documented recall caveat on the
#: operator) instead of an operational cliff that aborts the whole pass.
_X65_MAX_CLUSTER_ROWS = 20_000


@register(
    "x65_semantic_dedup",
    oracle=_finite_embeddings("""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
    SELECT a.vec_id, a.label,
           NOT EXISTS (
             SELECT 1 FROM e b
             WHERE b.label = a.label AND b.vec_id < a.vec_id
               AND sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
                 * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x))) > 0
               AND list_sum(list_transform(range(1, len(a.embedding)+1),
                                           i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))
                   / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
                    * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x))))
                   >= 0.3
           ) AS keep
    FROM e a
    """),
)
def x65_semantic_dedup(spark, sf_dir, threshold: float = 0.3, max_cluster_rows: int | None = None):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedded corpus — within each cluster, drop every
    vector that has a semantically-near predecessor (cosine >= threshold
    to a smaller vec_id in the SAME cluster); the smallest member of each
    semantic group survives. Clusters here are the precomputed ``label``
    column (in a pipeline, x40's k-means assignment); the test threshold
    0.3 sits in the synthetic embeddings' similarity tail — production
    embeddings use ~0.95+.

    Scale/plan — the whole point of SemDeDup: clustering bounds the
    quadratic. The pair join is label-keyed (equi-shuffle, never a global
    cross join), so cost is sum(|cluster|^2) not n^2, and cluster size is
    controlled upstream by k (x40). That control is ENFORCED, not
    assumed: a per-label row count (map-side-combined, one row per label)
    is broadcast-joined back, and any label over ``max_cluster_rows`` is
    SUB-SPLIT into ``ceil(n / max_cluster_rows)`` secondary hash bands
    (``pmod(xxhash64(vec_id), n_bands)``), with pairs forming only WITHIN
    a (label, band) key — one degenerate mega-cluster would otherwise be
    a single join key whose |c|² pairs land on one shuffle partition AQE
    cannot split. Labels under the bound get exactly one band, so their
    semantics are untouched (and the oracle matches exactly on data whose
    clusters are all bounded). RECALL CAVEAT for sub-split labels: a
    near-duplicate pair hashed into different bands is missed — the
    standard SemDeDup-at-scale concession (the kept set can only GROW vs
    the unsplit answer, never lose a vector); re-clustering with larger k
    upstream restores exactness. The guard rides the same plan as the
    pair join (tiny label-count broadcast, no driver collect, no separate
    job). Norms are computed once per vector BEFORE the pair join;
    per-pair work is one double-precision dot (same op order as the
    oracle). The dropped set distincts on vec_id, then one anti/semi pass
    stamps keep — output covers EVERY vector, so the apply stage is a
    plain filter."""
    if max_cluster_rows is None:
        max_cluster_rows = _X65_MAX_CLUSTER_ROWS
    e = _load_finite_embeddings(spark, sf_dir)
    sizes = (
        e.groupBy("label")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "label",
            F.greatest(
                F.ceil(F.col("_n") / F.lit(max_cluster_rows)).cast("int"), F.lit(1)
            ).alias("_nb"),
        )
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    ne = e.join(F.broadcast(sizes), "label").select(
        "vec_id",
        "label",
        "embedding",
        norm(F.col("embedding")).alias("nrm"),
        F.pmod(F.xxhash64("vec_id"), F.col("_nb")).cast("int").alias("sub"),
    )
    a = ne.select(
        F.col("vec_id").alias("va"),
        F.col("label").alias("la"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
        F.col("sub").alias("sa"),
    )
    b = ne.select(
        F.col("vec_id").alias("vb"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
        F.col("sub").alias("sb"),
    )
    # LEFT SEMI, not inner-join + distinct (r11): the semantics are EXISTS
    # (drop a vector when ANY smaller near-predecessor exists), and a semi
    # join both (a) stops scanning a vector's candidate bucket at its
    # FIRST near match — in a dense semantic cluster that's 1 dot product
    # instead of |cluster| of them per dropped vector — and (b) emits each
    # vec_id at most once by construction, so the former distinct's extra
    # exchange + two hash aggregates over the pair-survivor set disappear
    # from the plan. The when() guard rides in the join condition:
    # division only evaluates on a positive denominator (one all-zero
    # embedding would otherwise abort the pass with ANSI DIVIDE_BY_ZERO;
    # zero-norm is never near).
    dropped = a.join(
        b,
        (F.col("la") == F.col("lb"))
        & (F.col("sa") == F.col("sb"))
        & (F.col("vb") < F.col("va"))
        & F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            dot / (F.col("na") * F.col("nb")) >= threshold,
        ).otherwise(F.lit(False)),
        "left_semi",
    ).select(F.col("va").alias("vec_id"))
    return e.join(dropped.withColumn("_drop", F.lit(True)), "vec_id", "left").select(
        "vec_id", "label", F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep")
    )


@register(
    "x66_incremental_neardup_probe",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, snap, sh FROM (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 2 AS snap,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, snap, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    ), sig AS (
      SELECT doc_id, snap, seed,
             MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                        CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
      FROM hashed, (SELECT UNNEST(range(8)) AS seed)
      GROUP BY doc_id, snap, seed
    ), bands AS (
      SELECT doc_id, snap, seed // 2 AS band,
             STRING_AGG(minhash, '|' ORDER BY seed) AS band_val
      FROM sig GROUP BY doc_id, snap, seed // 2
    )
    SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
    FROM bands n JOIN bands c ON n.band = c.band AND n.band_val = c.band_val
    WHERE n.snap = 1 AND c.snap = 0
    """,
)
def x66_incremental_neardup_probe(spark, sf_dir):
    """Incremental (new-batch-vs-corpus) NEAR-dup probe — the LSH twin of
    x58's exact-digest probe: the incoming batch's band values are joined
    against the standing corpus band INDEX, so ingest-time near-dedup
    never rescans or re-pairs the corpus (x03 re-pairs everything; this
    answers "which retained docs does the new batch near-duplicate"
    touching only batch x matching-buckets). Here both sides derive from
    one table via the x57/x58 hash split (snap 0 = corpus, snap 1 =
    incoming); in production the corpus side is the materialized band
    table the ingest pipeline maintains append-only.

    Scale: the probe is an equi-join on (band, band_val) — the batch side
    (small) builds, the corpus index streams; with the index bucketed on
    the band key the corpus side is shuffle-free, and candidate volume is
    bounded by the batch's bucket occupancy, never corpus x corpus. The
    exact-verify step is x04/x44 on the emitted pairs."""
    # banding via the ONE shared helper the standing streaming band index
    # probes with (an inline copy here could silently drift from the index's
    # bucket-key wire format)
    bands = minhash_band_values(load(spark, sf_dir, "documents")).withColumn(
        "snap",
        F.expr("conv(substring(md5(CAST(doc_id AS string)), 1, 4), 16, 10) % 2"),
    )
    new = bands.filter(F.col("snap") == 1).select(
        F.col("doc_id").alias("new_doc_id"), "band", "band_val"
    )
    corpus = bands.filter(F.col("snap") == 0).select(
        F.col("doc_id").alias("corpus_doc_id"), "band", "band_val"
    )
    return new.join(corpus, ["band", "band_val"]).select("new_doc_id", "corpus_doc_id").distinct()


# --------------------------------------------------------------------------
# Tokenizer / index construction primitives
# --------------------------------------------------------------------------


@register(
    "x67_bpe_pair_counts",
    oracle="""
    WITH w AS (
      SELECT w, COUNT(*) AS wc FROM (
        SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) >= 2 GROUP BY w
    ), p AS (
      SELECT UNNEST(list_transform(range(1, len(w)),
                                   i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, wc
      FROM w
    ), c AS (
      SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count FROM p GROUP BY pair
    )
    SELECT pair, pair_count FROM (
      SELECT pair, pair_count,
             ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS rn FROM c)
    WHERE rn <= 20
    """,
)
def x67_bpe_pair_counts(spark, sf_dir):
    """One BPE merge step's pair statistics (Sennrich et al. 2016,
    arXiv:1508.07909): count adjacent character pairs across the corpus and
    rank the top merge candidates — the inner-loop primitive of
    byte-pair-encoding tokenizer training, run distributed. Top 20 pairs,
    deterministically tie-broken by the pair string.

    Scale — the classic BPE word-frequency compression: the CORPUS only
    feeds one word-count aggregation (map-side combined; output is
    vocab-sized, millions of rows at 100 TB, not billions). Pair explode
    and pair counting run over the VOCAB weighted by word frequency, so
    per-merge-iteration cost is O(vocab), independent of corpus size. The
    final top-N is a single-partition window over at most |alphabet|^2
    rows — bounded by construction. Iterating merges re-runs only the
    vocab-sized stages (words re-segmented by the learned merge), never
    the corpus scan."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = words.select(
        F.expr("explode(transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))) AS pair"),
        "wc",
    )
    counts = pairs.groupBy("pair").agg(F.sum("wc").alias("pair_count"))
    rn = F.row_number().over(Window.orderBy(F.desc("pair_count"), F.asc("pair")))
    return counts.withColumn("_rn", rn).filter(F.col("_rn") <= 20).drop("_rn")


@register(
    "x68_inverted_index",
    oracle="""
    WITH per_doc AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
      WHERE len(term) > 0 GROUP BY term, doc_id
    ), capped AS (
      SELECT term, doc_id, tf,
             ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM per_doc
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
           array_to_string(list(doc_id ORDER BY doc_id) FILTER (WHERE rn <= 50), ',')
             AS postings_head
    FROM capped GROUP BY term
    """,
)
def x68_inverted_index(spark, sf_dir):
    """Inverted-index construction: per term, document frequency, corpus
    frequency, and the head of the doc_id-sorted posting list (first 50
    ids, comma-joined — the first "page" of a paged posting layout). The
    index q47's full-text search and x34's contamination scan would probe.

    Scale — bounded state at every stage, the property a naive
    collect_list-then-slice build lacks: (term, doc_id, tf) aggregates on
    the compound key (map-side combined); the posting cap is applied with
    a row_number window BEFORE any array materializes, so no executor ever
    holds a stop-word's full posting list — per-group arrays are <= 50
    entries by construction. The window's term-keyed shuffle is reused by
    the final term aggregate (same partitioning, no extra Exchange). Full
    posting lists at scale come from emitting every (rn div 50) page the
    same way, not from bigger arrays."""
    d = load(spark, sf_dir, "documents")
    g = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.length("term") > 0
    )
    per_doc = g.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = per_doc.withColumn("rn", F.row_number().over(w))
    return (
        capped.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.array_sort(
                F.collect_list(F.when(F.col("rn") <= 50, F.col("doc_id")))
            ).alias("_pl"),
        )
        .select(
            "term",
            "df",
            "cf",
            F.expr("concat_ws(',', transform(_pl, x -> CAST(x AS STRING)))").alias(
                "postings_head"
            ),
        )
    )


@register(
    "x69_bloom_digest_probe",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, md5(text) AS digest,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 2 AS snap
      FROM documents)
    SELECT t.doc_id AS new_doc_id, t.digest,
           EXISTS (SELECT 1 FROM tagged c WHERE c.snap = 0 AND c.digest = t.digest)
             AS is_dup
    FROM tagged t
    WHERE t.snap = 1
    """,
)
def x69_bloom_digest_probe(spark, sf_dir):
    """Bloom-accelerated incremental exact-dup probe — x58's question
    ("which incoming docs duplicate the corpus") answered through the
    functions/bloom.py filter: the corpus side folds to a bits-only
    summary (distributed per-partition build, OR treeReduce), the batch
    side is screened by an Arrow-vectorized membership UDF, and only the
    screened CANDIDATES take the exact semi-join that clears false
    positives. The oracle is the plain exact intersection — the gate
    proves the bloom path changes cost, never answers.

    Scale: the corpus contributes one digest projection feeding a
    ~10-bits/doc bitmap (1.2 GB per 10^9 docs vs tens of GB of index) and
    one semi-join whose probe side is only the candidate set — expected
    batch_dups + FPR x batch, not the batch. At 1% FPR a 99%-novel batch
    sends ~2% of its rows into the join. The streaming twin
    (streaming/corpus_ingest.py) holds the same filter driver-side and
    skips the join entirely when no candidate exists."""
    from consensource_sds_spark.functions.bloom import build_bits, might_contain_col

    d = (
        load(spark, sf_dir, "documents")
        .withColumn("digest", F.md5("text"))
        .withColumn(
            "snap", F.expr("conv(substring(md5(CAST(doc_id AS string)), 1, 4), 16, 10) % 2")
        )
    )
    corpus = d.filter(F.col("snap") == 0)
    batch = d.filter(F.col("snap") == 1)
    # ~8 bits/doc (pow2-rounded): a deliberately TIGHT sizing so a few
    # false positives reach the clearing join at every scale factor — the
    # gate then proves FP-clearing, not just the all-miss fast path
    # sizing count: in a real pipeline the standing digest index KNOWS its
    # cardinality (table metadata); this demo's corpus is a derived split,
    # so one count pays for the bitmap sizing
    n = corpus.count()
    bits = build_bits(corpus.select("digest"), "digest", m_bits=1 << max(11, (8 * max(n, 1)).bit_length()))
    hit = might_contain_col(spark, bits)
    # bloom misses are is_dup=false with NO join work; only candidates
    # (true dups + FPs) reach the exact semi-join that settles them.
    # localCheckpoint materializes the screen ONCE: as a lazy plan the
    # Arrow membership UDF would re-hash every batch digest a second time
    # when the final left join re-evaluates this branch — and it lets the
    # bitmap broadcast release NOW instead of pinning m/8 bytes on the
    # executors until driver GC (the leak bloom.py warns about)
    screened = batch.withColumn("_hit", hit("digest")).localCheckpoint()
    hit.bloom_broadcast.unpersist()
    confirmed = (
        screened.filter(F.col("_hit"))
        .join(corpus.select("digest").distinct(), "digest", "left_semi")
        .select("digest")
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        screened.join(confirmed, "digest", "left")
        .select(
            F.col("doc_id").alias("new_doc_id"),
            "digest",
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
        )
    )


@register(
    "x70_ann_ivf_topk",
    oracle=_finite_embeddings("""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
         p AS (
           SELECT qid, cid,
                  list_sum(list_transform(range(1, len(qe) + 1),
                                          i -> CAST(qe[i] AS DOUBLE) * ce[i])) AS dot,
                  sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * x))) AS qn,
                  sqrt(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * x))) AS cn
           FROM q, c)
    SELECT qid, vec_id, cosine, rank FROM (
      SELECT qid, cid AS vec_id, ROUND(dot / (qn * cn), 6) + 0 AS cosine,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot / (qn * cn) DESC, cid) AS rank
      FROM p)
    WHERE rank <= 10
    """),
)
def x70_ann_ivf_topk(spark, sf_dir):
    """The standing IVF ANN index (streaming/ann_ingest.py) under the
    oracle gate: train centroids, ingest every vector into the
    (batch_id, cell)-partitioned index, probe the 5-query set with
    nprobe = ALL cells. Full-probe IVF is EXACT by construction — the
    approximation lives solely in nprobe — so the oracle is plain
    brute-force top-10, and any deviation convicts the plumbing
    (assignment, partition pruning, candidate dedup, tie rule), not the
    ANN trade-off. The nprobe<k recall envelope is pinned separately in
    tests/test_ann_ingest.py.

    The index materializes under a content-fingerprinted temp dir
    (embeddings file mtime+size in the key) so repeated gate runs reuse
    it but regenerated testdata can never serve a stale index; the build
    is staged and renamed in, so concurrent processes adopt whoever wins.

    Scale: the probe reads ONLY probed-cell directories (partition
    pruning — here all of them, by design); queries broadcast; per-query
    top-k is one window over candidate scores."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from consensource_sds_spark.streaming.ann_ingest import (
        ann_probe,
        ingest_embedding_batch,
        init_ann_index,
        train_centroids,
    )

    e = _load_finite_embeddings(spark, sf_dir)
    src = _os.path.join(_os.path.abspath(sf_dir), "embeddings.parquet")
    st = _os.stat(src)
    key = _hl.md5(f"{src}|{st.st_mtime_ns}|{st.st_size}".encode()).hexdigest()[:16]
    d = _os.path.join(_tf.gettempdir(), f"sds_ann_{key}")
    if not _os.path.exists(_os.path.join(d, "_centroids")):
        stage = f"{d}.building-{_os.getpid()}"
        _sh.rmtree(stage, ignore_errors=True)
        init_ann_index(spark, stage, train_centroids(spark, e, k=8, iters=2))
        ingest_embedding_batch(spark, e.select("vec_id", "embedding", "label"), 0, stage)
        try:
            _os.rename(stage, d)
        except OSError:
            _sh.rmtree(stage, ignore_errors=True)  # lost the race; use the winner's
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), "embedding")
    out = ann_probe(spark, d, q, k=10, nprobe=8)
    return out.select("qid", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")


@register(
    "x71_per_lang_quality_floor",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens
      FROM documents
    ), floors AS (
      SELECT lang, quantile_cont(n_tokens, 0.25) AS floor_tokens
      FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang, CAST(s.n_tokens AS BIGINT) AS n_tokens,
           ROUND(f.floor_tokens, 4) AS floor_tokens,
           s.n_tokens < f.floor_tokens AS below_floor
    FROM scored s JOIN floors f ON s.lang = f.lang
    """,
)
def x71_per_lang_quality_floor(spark, sf_dir):
    """Per-LANGUAGE calibrated quality floors — the multilingual-corpus
    practice a single global threshold gets wrong (a p25 length cut tuned
    on English silently deletes half of a terser language): each language
    contributes its own 25th-percentile token-count floor, and every doc
    is flagged against ITS OWN language's floor. Output covers every doc
    (flagging, not filtering — the x43 pipeline consumes the verdict).

    Scale: one exact per-lang percentile over the langs' token counts
    (languages are few — the groupBy is dozens of rows; swap to
    approx_percentile at 100 TB per x31's note), broadcast back against
    the corpus stream — the corpus shuffles ZERO times; the only wide
    operation is over the lang-count aggregate."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("double").alias("n_tokens")
    )
    floors = d.groupBy("lang").agg(
        F.expr("percentile(n_tokens, 0.25)").alias("floor_raw")
    )
    return (
        d.join(F.broadcast(floors), "lang")
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round("floor_raw", 4).alias("floor_tokens"),
            (F.col("n_tokens") < F.col("floor_raw")).alias("below_floor"),
        )
    )


@register(
    "x72_leakage_safe_split",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    ), sig AS (
      SELECT doc_id, seed,
             MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                        CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
      FROM hashed, (SELECT UNNEST(range(8)) AS seed)
      GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 2 AS band, STRING_AGG(minhash, '|' ORDER BY seed) AS band_val
      FROM sig GROUP BY doc_id, seed // 2
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                               AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cand
    ), reach(doc_id, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc_id = e.dst
    ), lab AS (
      SELECT doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
           CASE WHEN ('0x' || substr(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 4))::BIGINT % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 4))::BIGINT % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    """,
)
def x72_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test assignment: x25's deterministic hash
    split keyed by the NEAR-DUP CLUSTER id (x06) instead of the doc id,
    so a document and its near-duplicates always land in the SAME split —
    the contamination-prevention step naive per-doc splitting misses
    (a test doc whose near-twin sits in train is evaluation leakage).
    Output: every doc with its cluster id and co-assigned split.

    Scale: the cluster map is x06's large-star/small-star output (bounded
    rounds, candidate-subgraph-sized); singleton docs skip it entirely
    (cluster_id = doc_id via the left join + coalesce); the split stamp
    is one hash expression — no extra shuffle beyond x06's own."""
    clusters = x06_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    return clusters.selectExpr(
        "doc_id",
        "cluster_id",
        "CASE WHEN conv(substring(md5(cast(cluster_id AS string)), 1, 4), 16, 10) % 100 < 80 THEN 'train' "
        "WHEN conv(substring(md5(cast(cluster_id AS string)), 1, 4), 16, 10) % 100 < 90 THEN 'val' "
        "ELSE 'test' END AS split",
    )


@register(
    "x73_incremental_containment_probe",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 2 AS snap
      FROM documents),
    sh AS (
      SELECT doc_id, snap, UNNEST(range(1, len(ts) - 1)) AS pos,
             UNNEST(list_transform(range(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
      FROM toks WHERE len(ts) >= 3),
    enc AS (
      SELECT doc_id, snap, pos,
             ('0x' || substr(md5(g), 1, 8))::BIGINT * 1048576
               + (1048575 - pos) AS e
      FROM sh),
    win AS (
      SELECT doc_id, snap, pos,
             MIN(e) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
      FROM enc),
    fp AS (
      SELECT DISTINCT doc_id, snap, CAST(sel // 1048576 AS BIGINT) AS fp_hash
      FROM win WHERE pos >= 4),
    sized AS (
      SELECT doc_id, snap, fp_hash,
             CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_fp
      FROM fp)
    SELECT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id,
           COUNT(*) AS shared,
           ROUND(COUNT(*) / CAST(ANY_VALUE(n.n_fp) AS DOUBLE), 4) AS containment
    FROM sized n JOIN sized c ON n.fp_hash = c.fp_hash
    WHERE n.snap = 1 AND c.snap = 0
    GROUP BY n.doc_id, c.doc_id
    HAVING COUNT(*) >= 2
    """,
)
def x73_incremental_containment_probe(spark, sf_dir):
    """Incremental doc-in-doc CONTAINMENT probe — the winnowing twin of
    x66's band probe and the last member of the ingest probe family
    (exact digest -> near-dup bands -> semantic ANN -> partial-overlap
    fingerprints): the incoming batch's winnowed fingerprints (x48) probe
    the standing corpus fingerprint index, and hits are scored by
    containment relative to the NEW doc (shared / new doc's fingerprint
    count — "how much of the newcomer already exists in the corpus",
    which catches a crawl page quoting a retained document even when
    whole-document similarity is low). Same snap-split demonstration as
    x58/x66/x69; the PRODUCTION form is
    streaming/corpus_ingest.py's standing ``<out>_fp_index``
    (``containment_index=True``) with :func:`probe_containment` — same
    winnowing helper, same scoring.

    Scale: the probe joins on fp_hash — batch-fingerprints x matching
    postings, never corpus x corpus; with the index bucketed on fp_hash
    the corpus side is shuffle-free (the corpus_ingest index treatment);
    winnowing has already thinned each doc to ~2/w of its shingles."""
    d = load(spark, sf_dir, "documents")
    snap = d.select(
        "doc_id",
        F.expr("conv(substring(md5(CAST(doc_id AS string)), 1, 4), 16, 10) % 2").alias("snap"),
    )
    fp = winnow_fingerprint_hashes(d.select("doc_id", "text")).join(snap, "doc_id")
    sized = fp.withColumn("n_fp", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    new = sized.filter(F.col("snap") == 1).select(
        F.col("doc_id").alias("new_doc_id"), "fp_hash", F.col("n_fp").alias("n_new")
    )
    corp = sized.filter(F.col("snap") == 0).select(
        F.col("doc_id").alias("corpus_doc_id"), F.col("fp_hash").alias("fh")
    )
    return (
        new.join(corp, F.col("fp_hash") == F.col("fh"))
        .groupBy("new_doc_id", "corpus_doc_id")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.round(F.count(F.lit(1)) / F.first("n_new").cast("double"), 4).alias("containment"),
        )
        .filter(F.col("shared") >= 2)
    )


#: BPE training wire format: symbols inside a word's segmentation string
#: are delimited by a DOUBLED \x01 sentinel, so a single non-overlapping
#: left-to-right string replace of "\x01L\x01\x01R\x01" -> "\x01LR\x01"
#: applies one merge with EXACT greedy BPE semantics (adjacent occurrences
#: never share boundary chars; a symbol-suffix can never false-match
#: across the sentinel). Spark's ``replace`` and DuckDB's ``replace`` both
#: scan left-to-right non-overlapping, which is what makes the same
#: construction the operator AND its oracle.
_BPE_SEP = "\x01\x01"
#: separates lhs/rhs inside a pair key (never appears in corpus tokens)
_BPE_PSEP = "\x02"
_BPE_N_MERGES = 8


def _bpe_oracle(n_merges: int = _BPE_N_MERGES) -> str:
    """Unrolled DuckDB BPE training: the merge loop is inherently
    sequential (merge k+1's pair counts depend on merge k's rewrite), so
    the oracle unrolls N iterations as a CTE chain — plain ANSI SQL, no
    recursion — with the identical segmentation wire format and the
    identical (count DESC, pair-key ASC) tie-break as the Spark side."""
    s, sep, p = "\x01", _BPE_SEP, _BPE_PSEP
    parts = [
        f"""v0 AS (
      SELECT wc, '{sep}' || array_to_string(list_transform(range(1, len(w)+1),
                   i -> substr(w, CAST(i AS INT), 1)), '{sep}') || '{sep}' AS seg
      FROM (SELECT w, COUNT(*) AS wc
            FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
            WHERE len(w) >= 2 GROUP BY w))"""
    ]
    for k in range(n_merges):
        parts.append(
            f"""p{k} AS (
      SELECT pk, CAST(SUM(wc) AS BIGINT) AS cnt FROM (
        SELECT wc, UNNEST(list_transform(range(1, len(syms)),
                     i -> syms[i] || '{p}' || syms[i+1])) AS pk
        FROM (SELECT wc, list_filter(string_split(seg, '{sep}'), x -> x <> '') AS syms
              FROM v{k}))
      GROUP BY pk)"""
        )
        parts.append(f"b{k} AS (SELECT pk, cnt FROM p{k} ORDER BY cnt DESC, pk LIMIT 1)")
        if k + 1 < n_merges:
            parts.append(
                f"""v{k + 1} AS (
      SELECT wc, replace(seg,
        '{s}' || string_split(pk, '{p}')[1] || '{sep}' || string_split(pk, '{p}')[2] || '{s}',
        '{s}' || string_split(pk, '{p}')[1] || string_split(pk, '{p}')[2] || '{s}') AS seg
      FROM v{k}, b{k})"""
            )
    union = "\n    UNION ALL\n    ".join(
        f"SELECT {k + 1} AS merge_rank, string_split(pk, '{p}')[1] AS lhs, "
        f"string_split(pk, '{p}')[2] AS rhs, cnt AS pair_count FROM b{k}"
        for k in range(n_merges)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + union


def _bpe_seg_expr(col: str = "w"):
    """Segmentation-string expression for a word column (the \\x01\\x01
    wire format; safe for 0/1-char words — Spark's descending-sequence
    surprise ``sequence(1, 0) == [1, 0]`` is guarded away)."""
    chars = F.when(
        F.length(col) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.substring(F.col(col), i, F.lit(1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(F.lit(_BPE_SEP), F.concat_ws(_BPE_SEP, chars), F.lit(_BPE_SEP))


# eager release of superseded localCheckpoints (measurements + contract in
# functions/checkpoints.py; the module-level alias keeps the trainers'
# call sites monkeypatchable for A/B harnesses)
_free_local_checkpoint = CKPT.free_local_checkpoint


def _bpe_train_merges(spark, d, n_merges: int) -> list[tuple[int, str, str, int]]:
    """The x74 training loop body, shared with x75's apply stage: returns
    the ranked merge list [(rank, lhs, rhs, pair_count)]."""
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = words.select("wc", _bpe_seg_expr("w").alias("seg")).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for k in range(n_merges):
        top = (
            vocab.select("wc", F.explode(_bpe_pair_keys_expr()).alias("pk"))
            .groupBy("pk")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pk"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pk, cnt = top[0]["pk"], int(top[0]["cnt"])
        lhs, rhs = pk.split(_BPE_PSEP)
        merges.append((k + 1, lhs, rhs, cnt))
        pat = "\x01" + lhs + _BPE_SEP + rhs + "\x01"
        rep = "\x01" + lhs + rhs + "\x01"
        nv = vocab.select(
            "wc", F.replace(F.col("seg"), F.lit(pat), F.lit(rep)).alias("seg")
        ).localCheckpoint()
        _free_local_checkpoint(vocab)  # superseded by nv (already materialized)
        vocab = nv
    _free_local_checkpoint(vocab)  # trainer-owned; only merges leave this scope
    return merges


def _bpe_pair_keys_expr(col: str = "seg"):
    """Adjacent-pair key array over a segmentation column (shared by the
    greedy, batched, and incremental trainers)."""
    syms = F.filter(F.split(col, _BPE_SEP), lambda x: x != F.lit(""))
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat(
                F.element_at(syms, i), F.lit(_BPE_PSEP), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _bpe_select_compatible(
    cands: list[tuple[str, int]], batch_m: int
) -> list[tuple[str, str, int]]:
    """The (cnt DESC, pk ASC)-ordered prefix of candidates such that no
    two selected merges share a symbol — lhs, rhs, or the created
    lhs+rhs. Symbol-disjoint merges commute (their replace patterns can
    never overlap in a segmentation string) and leave each other's pair
    counts unchanged, so every selected merge applies with its snapshot
    count exact."""
    sel: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for pk, cnt in cands:
        lhs, rhs = pk.split(_BPE_PSEP)
        syms = {lhs, rhs, lhs + rhs}
        if used & syms:
            continue
        sel.append((lhs, rhs, int(cnt)))
        used |= syms
        if len(sel) >= batch_m:
            break
    return sel


def _bpe_train_merges_batched(
    spark, d, n_merges: int, batch_m: int = 16
) -> tuple[list[tuple[int, str, str, int]], int]:
    """Scale path for BPE training (VERDICT r7 #2: the greedy loop is one
    Spark job per merge — 30k+ serial jobs at real vocab sizes, days of
    scheduler latency): per ROUND, one vocab-sized pair-count job
    collects the top ``8 * batch_m`` candidate pairs and the driver keeps
    the (cnt DESC, pk ASC) prefix of pairwise symbol-disjoint merges
    (:func:`_bpe_select_compatible`), applying them all as ONE chained
    JVM replace + one checkpoint — driver actions drop from ~2N (greedy:
    argmax + checkpoint per merge) to ~2N/batch_m, while each round stays
    O(vocab) exactly like the greedy loop.

    Semantics: symbol-disjoint merges commute and keep their snapshot
    counts exact at application time, so the emitted (lhs, rhs,
    pair_count) rows are individually exact. The ONLY divergence from
    exact greedy (:func:`_bpe_train_merges`, the small-N oracle regime)
    is ordering: a pair CREATED by an earlier batch member can outrank a
    later member, which pure greedy would have interposed — the standard
    batched-BPE concession. ``batch_m=1`` degenerates to exact greedy
    (property-pinned in tests/test_bpe_property.py).

    Returns ``(merges, rounds)``; ``rounds`` is the number of pair-count
    jobs run (bench publishes it so jobs ≈ N/M stays visible)."""
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = words.select("wc", _bpe_seg_expr("w").alias("seg")).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        top = (
            vocab.select("wc", F.explode(_bpe_pair_keys_expr()).alias("pk"))
            .groupBy("pk")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pk"))
            .limit(8 * batch_m)
            .collect()
        )
        rounds += 1
        if not top:
            break
        sel = _bpe_select_compatible(
            [(r["pk"], int(r["cnt"])) for r in top],
            min(batch_m, n_merges - len(merges)),
        )
        seg = F.col("seg")
        for lhs, rhs, cnt in sel:
            merges.append((len(merges) + 1, lhs, rhs, cnt))
            seg = F.replace(
                seg,
                F.lit("\x01" + lhs + _BPE_SEP + rhs + "\x01"),
                F.lit("\x01" + lhs + rhs + "\x01"),
            )
        nv = vocab.select("wc", seg.alias("seg")).localCheckpoint()
        _free_local_checkpoint(vocab)  # superseded by nv (already materialized)
        vocab = nv
    _free_local_checkpoint(vocab)  # trainer-owned; only merges leave this scope
    return merges, rounds


def _bpe_train_merges_incremental(
    spark, d, n_merges: int, batch_m: int = 16
) -> tuple[list[tuple[int, str, str, int]], int]:
    """The batched trainer with an INCREMENTAL standing pair-count table
    (r10 verdict #5): the per-round full recount — explode every vocab
    row's adjacent pairs and re-aggregate, the job the r10 deep-scale
    decomposition showed carrying ALL the 30x growth (20.8 of 23.6 s) —
    is replaced by a delta job over only the rows a round's merges
    actually TOUCHED. After applying symbol-disjoint merges M, a word's
    pair multiset changes iff its segmentation contains an occurrence of
    some m in M (classic incremental BPE: pair counts change only around
    merge occurrences), so:

    - round candidates come from the standing ``counts`` table — a scan
      + TakeOrdered over O(distinct pairs) rows, no explode;
    - the chained replace runs over the whole vocab (a cheap JVM map, the
      phase the decomposition measured FIXED-cost), and ``seg != seg2``
      marks the touched rows;
    - touched rows contribute their old pairs at ``-wc`` and new pairs
      at ``+wc``; one union + sum folds the delta into ``counts``
      (zero-count pairs evicted so the table tracks the LIVE pair set).

    Per-round shuffled rows drop from O(total vocab pair instances) to
    O(distinct pairs + touched-row pair instances); merge selection sees
    bit-identical counts (integer arithmetic, same (cnt DESC, pk ASC)
    order), so the merge table EQUALS the recount trainer's — pinned by
    ``test_bpe_property.py::test_incremental_trainer_matches_batched``.

    Returns ``(merges, rounds)`` like the batched form; the initial full
    pair count is job 0, not a round."""
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = words.select("wc", _bpe_seg_expr("w").alias("seg")).localCheckpoint()
    counts = (
        vocab.select("wc", F.explode(_bpe_pair_keys_expr()).alias("pk"))
        .groupBy("pk")
        .agg(F.sum("wc").alias("cnt"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    # `vocab` becomes a PROJECTION over the latest checkpoint after round 1,
    # so the checkpoint handle is tracked separately for the eager free
    vocab_ck = vocab
    while len(merges) < n_merges:
        top = (
            counts.orderBy(F.desc("cnt"), F.asc("pk")).limit(8 * batch_m).collect()
        )
        rounds += 1
        if not top:
            break
        sel = _bpe_select_compatible(
            [(r["pk"], int(r["cnt"])) for r in top],
            min(batch_m, n_merges - len(merges)),
        )
        seg2 = F.col("seg")
        for lhs, rhs, cnt in sel:
            merges.append((len(merges) + 1, lhs, rhs, cnt))
            seg2 = F.replace(
                seg2,
                F.lit("\x01" + lhs + _BPE_SEP + rhs + "\x01"),
                F.lit("\x01" + lhs + rhs + "\x01"),
            )
        nv = vocab.select("wc", "seg", seg2.alias("seg2")).localCheckpoint()
        _free_local_checkpoint(vocab_ck)  # superseded by nv (materialized)
        vocab_ck = nv
        touched = nv.filter(F.col("seg") != F.col("seg2"))
        delta = touched.select(
            F.explode(_bpe_pair_keys_expr("seg")).alias("pk"),
            (-F.col("wc")).alias("cnt"),
        ).unionByName(
            touched.select(
                F.explode(_bpe_pair_keys_expr("seg2")).alias("pk"),
                F.col("wc").alias("cnt"),
            )
        )
        new_counts = (
            counts.unionByName(delta)
            .groupBy("pk")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") > 0)
            .localCheckpoint()
        )
        _free_local_checkpoint(counts)  # superseded (new_counts materialized)
        counts = new_counts
        vocab = nv.select("wc", F.col("seg2").alias("seg"))
    _free_local_checkpoint(vocab_ck)  # trainer-owned; only merges leave
    _free_local_checkpoint(counts)
    return merges, rounds


@register("x74_bpe_train", oracle=_bpe_oracle())
def x74_bpe_train(spark, sf_dir, n_merges: int = _BPE_N_MERGES):
    """Complete BPE tokenizer training (Sennrich et al. 2016,
    arXiv:1508.07909), N merges: x67 is one iteration's pair statistics;
    this runs the full driver loop and emits the ranked merge table
    (merge_rank, lhs, rhs, pair_count) — the artifact a tokenizer ships.

    Scale — the classic BPE frequency compression (same argument as x67):
    the CORPUS feeds exactly ONE word-count aggregation (map-side
    combined; output is vocab-sized — millions of rows at 100 TB, not
    billions). Every merge iteration then runs over the VOCAB only:
    pair-explode + weighted count + a 1-row argmax collect (the one
    driver action per iteration — bounded control plane, the merge
    decision itself, inherently sequential). The merge applies as ONE
    JVM-side string replace over the segmentation column (the \\x01\\x01
    wire format above — exact greedy left-to-right BPE semantics), and
    the vocab localCheckpoints each iteration so the plan never grows
    with N. Iteration cost is O(vocab), independent of corpus size.

    This exact greedy loop is one driver action per merge — the right
    oracle regime at demo N, but 30k+ serial jobs at real vocab sizes;
    :func:`_bpe_train_merges_batched` is the production path (top-M
    symbol-disjoint merges per job, jobs ~ N/M, bench block ``bpe``)."""
    merges = _bpe_train_merges(spark, load(spark, sf_dir, "documents"), n_merges)
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count bigint"
    )


def _bpe_wt_chain(n_merges: int = _BPE_N_MERGES) -> str:
    """The shared apply-side CTE chain: x74 training (unrolled) + the
    learned merges applied to every DISTINCT corpus word, ending in
    ``wt(w, tok)`` — per-word BPE token counts. x75 aggregates it per
    document; x81 per language."""
    s, sep, p = "\x01", _BPE_SEP, _BPE_PSEP
    train = _bpe_oracle(n_merges)
    chain = train[len("WITH ") : train.rindex("SELECT 1 AS merge_rank")].rstrip().rstrip(",")
    # drop the final UNION ALL select block: keep only the CTE chain
    chain = chain[: chain.rindex(")") + 1]
    # Each m{k} must yield EXACTLY one row even when training exhausted the
    # pair supply before merge k (b{k} empty — the Spark loop breaks early).
    # A scalar subquery returns NULL on an empty b{k}; COALESCE degrades the
    # merge to an identity replace on the pair separator (never in a seg),
    # so the aseg x m0 x ... cross join below keeps its rows.
    merge_cte = ",\n    ".join(
        f"""m{k} AS (SELECT
        COALESCE((SELECT '{s}' || string_split(pk, '{p}')[1] || '{sep}' || string_split(pk, '{p}')[2] || '{s}' FROM b{k}), '{p}') AS pat,
        COALESCE((SELECT '{s}' || string_split(pk, '{p}')[1] || string_split(pk, '{p}')[2] || '{s}' FROM b{k}), '{p}') AS rep)"""
        for k in range(n_merges)
    )
    applied_seg = "seg"
    for k in range(n_merges):
        applied_seg = f"replace({applied_seg}, m{k}.pat, m{k}.rep)"
    froms = ", ".join(f"m{k}" for k in range(n_merges))
    return f"""WITH {chain},
    {merge_cte},
    aw AS (SELECT DISTINCT w FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)),
    aseg AS (
      -- COALESCE: DuckDB array_to_string([]) is NULL (Spark array_join
      -- gives ''), so the EMPTY word must not poison its seg to NULL —
      -- it segments to zero tokens
      SELECT w, '{sep}' || COALESCE(array_to_string(list_transform(range(1, len(w)+1),
                   i -> substr(w, CAST(i AS INT), 1)), '{sep}'), '') || '{sep}' AS seg
      FROM aw),
    applied AS (SELECT w, {applied_seg} AS seg FROM aseg, {froms}),
    wt AS (SELECT w, len(list_filter(string_split(seg, '{sep}'), x -> x <> '')) AS tok FROM applied)"""


def _bpe_apply_oracle(n_merges: int = _BPE_N_MERGES) -> str:
    """x75's oracle: the shared wt chain aggregated per document."""
    return f"""{_bpe_wt_chain(n_merges)}
    SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(tok) AS BIGINT) AS n_bpe_tokens
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents) dw
    JOIN wt USING (w)
    GROUP BY doc_id"""


def _bpe_token_count_per_word(words, merges):
    """(w, tok) over the DISTINCT words of ``words``: apply the learned
    merge table (compiled to a nested JVM replace over the doubled-sentinel
    segmentation) and count non-empty tokens — the ONE apply-side
    construction x75 and x81 share, so the merge-pattern wire format
    ('\\x01' + lhs + SEP + rhs + '\\x01') lives in a single place."""
    seg = _bpe_seg_expr("w")
    for _rank, lhs, rhs, _cnt in merges:
        seg = F.replace(
            seg,
            F.lit("\x01" + lhs + _BPE_SEP + rhs + "\x01"),
            F.lit("\x01" + lhs + rhs + "\x01"),
        )
    tok = F.size(F.filter(F.split(seg, _BPE_SEP), lambda x: x != F.lit("")))
    return words.select("w").distinct().select("w", tok.alias("tok"))


def _bpe_validate_freshness(merges: list[tuple[int, str, str, int]]) -> None:
    """Reject merge tables where an EARLIER merge references a LATER
    merge's output symbol. Tables trained by any of this module's
    trainers have this property by construction (a pair can only be
    counted once both its symbols exist), and it is exactly what makes
    the priority-order apply (:func:`_bpe_segment_words_scalable`)
    equivalent to the sequential full-replace chain: a pair that only
    forms after a later merge runs must itself rank later, so the
    lowest-rank-present loop replays the sequential order. A violating
    table (hand-edited, corrupted) would silently tokenize differently
    between the two forms — fail fast instead."""
    later_outputs: set[str] = set()
    for _rank, lhs, rhs, _cnt in reversed(merges):
        if lhs in later_outputs or rhs in later_outputs:
            raise ValueError(
                f"merge table violates creation order: ({lhs!r}, {rhs!r}) "
                "references a symbol created by a later-ranked merge"
            )
        later_outputs.add(lhs + rhs)


def _bpe_segment_words_scalable(words, merges: list[tuple[int, str, str, int]]):
    """Production BPE apply over DISTINCT words — the path that survives
    a tokenizer-realistic merge table. The chain form
    (:func:`_bpe_token_count_per_word`) compiles N nested JVM replaces:
    exact and fast at oracle N, but the N-deep Column tree dies OUTRIGHT
    at tokenizer scale — measured on this Spark 4.1 build:
    ``java.lang.StackOverflowError`` converting the expression at
    N=1024, and already 2x slower than this path at N=256 (4.99 s
    plan+run vs 2.31 s over a 5k-word vocab). Here the merge table ships
    once into
    an Arrow pandas UDF closure and each distinct word is segmented with
    the classic lowest-rank-adjacent-pair loop (rank-priority apply, the
    tokenizers deployment algorithm) — per-WORD python cost on the
    vocab-bounded side of the (vocab x occurrences) join, never per
    occurrence, so corpus cost stays one equi-join + agg regardless of N.
    Merging the chosen pair takes ALL its non-overlapping occurrences
    left-to-right, matching the chain's java replace semantics exactly;
    equivalence on trained tables is property-pinned
    (test_bpe_property.py) and guarded by
    :func:`_bpe_validate_freshness`. Returns (w, seg array<string>)."""
    _bpe_validate_freshness(merges)
    ranks = {(lhs, rhs): rank for rank, lhs, rhs, _cnt in merges}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg_udf(col: pd.Series) -> pd.Series:
        def seg(word: str) -> list[str]:
            syms = list(word)
            while len(syms) >= 2:
                best_rank = None
                best_pair = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, (syms[i], syms[i + 1])
                if best_pair is None:
                    break
                lhs, rhs = best_pair
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return col.map(seg)

    return words.select("w").distinct().select("w", seg_udf(F.col("w")).alias("seg"))


def bpe_tokenize_corpus(docs, merges: list[tuple[int, str, str, int]]):
    """Per-document (n_words, n_bpe_tokens) with a PRODUCTION-sized merge
    table: x75's exact join/agg shape (distinct-word segment -> broadcast
    back over occurrences) with the scalable apply
    (:func:`_bpe_segment_words_scalable`) on the vocab side."""
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    wt = _bpe_segment_words_scalable(words, merges).select(
        "w", F.size("seg").alias("tok")
    )
    return (
        words.join(wt, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("tok").cast("bigint").alias("n_bpe_tokens"),
        )
    )


@register("x75_bpe_tokenize", oracle=_bpe_apply_oracle())
def x75_bpe_tokenize(spark, sf_dir, n_merges: int = _BPE_N_MERGES):
    """BPE APPLY — the other half of the tokenizer lifecycle: train the
    merge table (x74's loop) and tokenize the corpus with it, emitting
    per-document (n_words, n_bpe_tokens) — the token-budget accounting a
    training-data pipeline runs before packing sequences (x35/x52 feed on
    exactly these counts).

    Scale: training is x74 (corpus touched once, then vocab-sized
    iterations). APPLY costs one pass over the DISTINCT words — the merge
    table is driver-held (N rows) and compiles into a single nested
    JVM-side replace chain, evaluated once per distinct word, never per
    occurrence; per-doc counts then come from one (vocab x occurrences)
    equi-join + aggregation, with the vocab side broadcastable at scale.
    The segmentation wire format (and therefore greedy merge semantics)
    is shared with x74 and its oracle."""
    d = load(spark, sf_dir, "documents")
    merges = _bpe_train_merges(spark, d, n_merges)
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    wt = _bpe_token_count_per_word(words, merges)
    return (
        words.join(wt, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("tok").cast("bigint").alias("n_bpe_tokens"),
        )
    )


#: exact-substring window width (tokens) and the boilerplate posting cap
_X76_W = 8
_X76_MAX_POSTING = 50
_X76_MIN_SHARED = 4


def _x76_window_hashes(w: int = _X76_W, distinct: bool = False):
    """Per-doc array of W-token window identities over ``ts`` for the
    ExactSubstr family (x76/x77): struct(h1, h2) of two independently-
    salted xxhash64 chains over the window's tokens. Shared by both
    entries so the hash identity cannot drift between the match and scrub
    halves. Tokens feed the hash DIRECTLY (xxhash64 is a multi-column
    hash) — no per-window concat_ws string build and no cryptographic
    md5, which the r11 profile measured at ~45% of x76 (guide §1.2:
    per-task work, once the shape is right). Token-sequence equality <=>
    (h1, h2) equality up to ~2^-128 collisions, the same contract the
    former unhex(md5(concat_ws(..))) carried — the 1L salt heading the
    second chain de-correlates its internal state from the first.
    ``distinct=True`` dedups a doc's repeated windows inside the array
    (map-side; x76's set semantics), saving the downstream relation-wide
    distinct exchange; x77 keeps every occurrence (positions matter)."""
    args = ", ".join(f"element_at(ts, i + {k})" for k in range(w))
    body = (
        f"transform(sequence(1, size(ts) - {w} + 1),"
        f" i -> struct(xxhash64({args}) AS h1, xxhash64(1L, {args}) AS h2))"
    )
    if distinct:
        body = f"array_distinct({body})"
    return F.when(F.size("ts") >= w, F.expr(body)).otherwise(
        F.expr("CAST(array() AS array<struct<h1:bigint,h2:bigint>>)")
    )


@register(
    "x76_exact_substring_matches",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    win AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_transform(range(1, len(ts) - {_X76_W} + 2),
                    i -> md5(array_to_string(ts[i:i+{_X76_W}-1], ' ')))) AS h
      FROM toks WHERE len(ts) >= {_X76_W}),
    capped AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) <= {_X76_MAX_POSTING}),
    w2 AS (SELECT win.doc_id, win.h FROM win JOIN capped USING (h))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared
    FROM w2 a JOIN w2 b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {_X76_MIN_SHARED}
    """,
)
def x76_exact_substring_matches(spark, sf_dir):
    """EXACT substring-overlap detection (Lee et al. 2022,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better", the ExactSubstr method re-expressed for Spark): two docs
    sharing any W-token run of IDENTICAL text are reported with the count
    of shared windows. Unlike x48/x49 winnowing — which SAMPLES ~2/w of
    shingles and has sampling recall — stride-1 hashing of every W-token
    window has recall 1.0 for runs >= W tokens: the suffix-array result
    for fixed W, without the suffix array (which doesn't distribute; the
    stride-1 window relation does).

    Scale: the window relation is O(total_tokens) rows — the honest cost
    of exact matching, LINEAR, produced map-side (one transform+explode,
    no shuffle until the hash agg). Distinct (doc, h) collapses repeated
    in-doc runs; the posting cap drops boilerplate hashes shared by
    > {_X76_MAX_POSTING} docs BEFORE the pair join (x49's treatment — a
    k-doc hash would mint k^2 pairs), so pair volume is bounded per hash.
    The pair stage keys on the window hash — never doc x doc."""
    return exact_substring_matches(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )


def exact_substring_matches(
    docs: "DataFrame",
    w: int = _X76_W,
    max_posting: int = _X76_MAX_POSTING,
    min_shared: int = _X76_MIN_SHARED,
) -> "DataFrame":
    """x76's frame-level body over any (doc_id, text) frame: returns
    (doc_a, doc_b, shared). Shared with the focused internals tests the
    same way :func:`exact_substring_scrub` is for x77, so a test cannot
    silently pin a stale copy of the shape."""
    d = docs.select("doc_id", F.split("text", " ").alias("ts"))
    # h is internal-only (never in the result), so its representation is
    # free to choose. The r11 profile showed the window-relation map pass
    # (one string concat + md5 per window, O(total_tokens) windows) was
    # ~45% of the whole query, so h is now TWO independently-salted
    # xxhash64 chains fed the 8 tokens DIRECTLY — no per-window string
    # build, no cryptographic digest — packed in one struct. Two
    # independent 64-bit chains keep the ~2^-128 per-pair collision odds
    # of the former md5 (a SINGLE xxhash64 measured 1.9x but at 1e12
    # windows its birthday collisions would dent the 'exact, recall 1.0'
    # contract — measured, rejected). Equality of (h1,h2) == equality of
    # the window's token sequence exactly as md5-of-concat was.
    # array_distinct dedups each doc's repeated windows MAP-SIDE (a doc's
    # windows all sit in its own array), which is exactly what the former
    # frame-level .distinct() computed — minus its full-relation exchange.
    win = d.select("doc_id", F.explode(_x76_window_hashes(w, distinct=True)).alias("h")).filter(
        F.col("h").isNotNull()
    )
    # posting cap as a COUNT window over h instead of a groupBy+self-join:
    # the r11 plan showed the O(total_tokens) window-md5 Generate running
    # TWICE (the cap branch could not reuse the join branch's exchange —
    # join-side isnotnull pushdown made the subtrees differ). One window
    # pass caps in place: ONE Generate, one (doc_id,h) exchange, and the
    # h-partitioned/sorted window output feeds the pair join with no
    # further exchange. _n counts exactly the rows the former
    # groupBy("h") counted (NULL doc_ids included: the count predicate
    # cannot push below the window).
    w2 = (
        win.withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .filter(F.col("_n") <= max_posting)
        .select("doc_id", "h")
    )
    # pair generation WITHOUT the former self-join: the capped relation is
    # already h-partitioned (window output), so collect_list(doc_id) per h
    # adds NO exchange — and the cap filter runs BEFORE the collect, so
    # every list is <= max_posting elements (the spillable window pass
    # keeps the one-giant-hash case disk-bound, where an uncapped
    # collect_list would hold the whole posting in one agg buffer). Sorted
    # pairs (i < j over the sorted list) reproduce doc_a < doc_b exactly;
    # each (doc, h) is unique (array_distinct upstream), so every unordered
    # pair contributes 1 — identical to the former join+filter+count. The
    # r11 A/B at 150k docs: join form 6.35 s -> 3.18 s, checksums equal;
    # plan drops one Sort, the BroadcastExchange and the pair join.
    g = (
        w2.groupBy("h")
        .agg(F.collect_list("doc_id").alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    ds = F.array_sort(F.col("docs"))
    pairs = F.flatten(
        F.transform(
            ds,
            lambda a, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    return (
        g.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        # strict inequality restores the old self-join's doc_a < doc_b
        # contract when a caller hands a frame with DUPLICATE doc_id rows
        # (i < j over the sorted list would emit equal-id pairs there);
        # no-op on the registry's unique-doc_id input, one long compare
        # per pair
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


@register(
    "x77_exact_substring_scrub",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(range(1, len(ts)+1)) AS pos,
             UNNEST(ts) AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
    win AS (
      SELECT doc_id, UNNEST(range(1, len(ts) - {_X76_W} + 2)) AS i,
             UNNEST(list_transform(range(1, len(ts) - {_X76_W} + 2),
                    i -> md5(array_to_string(ts[i:i+{_X76_W}-1], ' ')))) AS h
      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
      WHERE len(ts) >= {_X76_W}),
    owner AS (
      SELECT h, MIN(doc_id) AS own FROM win GROUP BY h
      HAVING COUNT(DISTINCT doc_id) >= 2),
    removed AS (SELECT win.doc_id, win.i FROM win JOIN owner USING (h)
                WHERE win.doc_id <> owner.own),
    cover AS (
      SELECT DISTINCT doc_id, i + off AS pos
      FROM removed, (SELECT UNNEST(range({_X76_W})) AS off)),
    flagged AS (
      SELECT t.doc_id, t.pos, t.token, (c.pos IS NOT NULL) AS rm
      FROM toks t LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.pos = c.pos)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           COALESCE(STRING_AGG(CASE WHEN NOT rm THEN token END, ' ' ORDER BY pos), '')
             AS text_scrubbed
    FROM flagged GROUP BY doc_id
    """,
)
def x77_exact_substring_scrub(spark, sf_dir):
    """The APPLY half of exact-substring dedup (Lee et al. 2022's cut
    step, x76's sibling): every W-token window shared ACROSS documents is
    removed from every doc except the window's canonical owner (min
    doc_id) — one copy of each duplicated span survives corpus-wide —
    and the surviving tokens reassemble in order (x64's collect-skip-
    nulls reassembly at token granularity). Frame-level body in
    :func:`exact_substring_scrub` (the corpus build's optional stage).

    Scale — crucially there is NO pair join anywhere: ownership is one
    hash-agg over the window relation (min doc + distinct-doc count per
    hash), removal coverage is a bounded W-fan-out explode over removed
    windows (O(tokens x W) worst case, linear), and reconstruction is one
    doc-keyed aggregate. A boilerplate window shared by k docs costs k
    removal rows, never k^2 — the reason the scrub scales where naive
    pairwise span-diffing would not."""
    return exact_substring_scrub(load(spark, sf_dir, "documents").select("doc_id", "text"))


def exact_substring_scrub(docs: "DataFrame", w: int = _X76_W) -> "DataFrame":
    """x77's frame-level body over any (doc_id, text) frame: returns
    (doc_id, n_tokens, n_removed, text_scrubbed). See the registry
    docstring for semantics and the scale argument."""
    # null-text docs produce no row (posexplode of a null array emitted
    # nothing, so they never reached the former groupBy either)
    d = docs.select("doc_id", F.split("text", " ").alias("ts")).filter(
        F.col("ts").isNotNull()
    )
    # h is internal-only: the shared double-xxhash64 window identity (see
    # :func:`_x76_window_hashes` for the hash-choice rationale; every
    # occurrence kept here — positions matter for the cut)
    # the isnotnull(h) filter mirrors the former inner join's null-key
    # drop (h was never null, so it is a no-op on data)
    win = (
        d.select("doc_id", F.posexplode(_x76_window_hashes(w)).alias("i0", "h"))
        .select("doc_id", (F.col("i0") + 1).alias("i"), "h")
        .filter(F.col("h").isNotNull())
    )
    # "shared by >= 2 distinct docs, owned by the min" needs only min/max
    # (min != max <=> COUNT(DISTINCT doc_id) >= 2, NULLs ignored by both
    # forms) — and computing them as ONE min/max window over h replaces
    # the former groupBy("h") + join-back entirely: the r11 plan showed
    # the O(total_tokens) window-md5 Generate running TWICE (once per
    # branch); now the window relation is generated ONCE, exchanged once
    # by h, and filtered in place (r11; x76 gets the same treatment)
    wh = Window.partitionBy("h")
    removed = (
        win.select(
            "doc_id",
            "i",
            F.min("doc_id").over(wh).alias("_own"),
            F.max("doc_id").over(wh).alias("_dmax"),
        )
        .filter((F.col("_own") != F.col("_dmax")) & (F.col("doc_id") != F.col("_own")))
        .select("doc_id", "i")
    )
    # Reassembly rethought at the DOC level (r11, guide §8: decide with
    # small rows, move big rows once). The former shape exploded the full
    # corpus to a (doc_id, pos, token) relation, hash-joined it with the
    # coverage rows, then re-shuffled every token into a giant
    # collect_list + array_sort aggregate — two full token-relation
    # exchanges carrying the text payload. Instead: aggregate the removal
    # coverage to ONE position-set row per affected doc (collect_set
    # dedups overlapping windows in-agg — the former distinct's exchange
    # folds into this aggregate), join that small relation back to the
    # docs once, and reassemble map-side with array higher-order
    # functions: array_except keeps surviving positions in ascending
    # order (exactly what the former array_sort-by-pos produced) and
    # transform/element_at rebuilds the text with zero further shuffles.
    cov = (
        removed.select(
            "doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + w - 1)).alias("pos")
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("rmpos"))
    )
    j = d.join(cov, ["doc_id"], "left")
    rm = F.coalesce(F.col("rmpos"), F.expr("CAST(array() AS array<int>)"))
    kept_pos = F.array_except(F.sequence(F.lit(1), F.size("ts")), rm)
    scrub = F.concat_ws(" ", F.transform(kept_pos, lambda p: F.element_at(F.col("ts"), p)))
    return j.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        (F.size("ts") - F.size(kept_pos)).cast("long").alias("n_removed"),
        scrub.alias("text_scrubbed"),
    )


@register(
    "x78_histogram_quantile_rollup",
    oracle="""
    WITH mm AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents),
    b AS (
      SELECT source,
             CAST(LEAST(63, ((CAST(n_chars AS BIGINT) - mn) * 64)
                            // (CAST(mx AS BIGINT) - mn + 1)) AS INT) AS bin
      FROM documents, mm),
    c AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY source, bin),
    merged AS (SELECT 'ALL' AS source, bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM c GROUP BY bin),
    u AS (SELECT * FROM c UNION ALL SELECT * FROM merged),
    cum AS (
      SELECT source, bin,
             CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS tot
      FROM u)
    SELECT source,
           MIN(CASE WHEN cum * 100 >= 50 * tot THEN bin END) AS p50_bin,
           MIN(CASE WHEN cum * 100 >= 95 * tot THEN bin END) AS p95_bin,
           MIN(CASE WHEN cum * 100 >= 99 * tot THEN bin END) AS p99_bin
    FROM cum GROUP BY source
    """,
)
def x78_histogram_quantile_rollup(spark, sf_dir):
    """Mergeable quantile sketches — the third classic mergeable-summary
    family beside x50's HLL (distinct) and x63's theta (overlap): a
    64-bin equi-width histogram per source whose bin counts ADD, so any
    coarser grain's quantiles come from summing fine-grain bins, never
    from re-scanning raw data. The 'ALL' row here is computed exactly
    that way — a rollup of the per-source bin counts — which is the whole
    operational point at 100 TB: sketch once at the finest grain, answer
    p50/p95/p99 at every grain from KB-sized summaries (the
    fixed-bin-histogram member of the quantile-sketch family; KLL and
    t-digest refine the bin placement, the merge algebra is the same).

    Exactness discipline: binning is PURE INTEGER (``(x-mn)*64 //
    (mx-mn+1)``) and the quantile walk compares ``cum*100 >= q*tot`` in
    integers — no float anywhere until nothing is left to diverge, so
    the oracle matches bit-for-bit. The global (mn, mx) is a 1-row
    scalar broadcast (the allowed BNLJ); everything else is two
    hash-aggs and one per-source window over <=64 rows each."""
    d = load(spark, sf_dir, "documents").select("source", "n_chars")
    mm = d.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    binned = d.join(F.broadcast(mm)).select(
        "source",
        F.least(
            F.lit(63).cast("long"),
            # bigint arithmetic: n_chars is int32, and (n_chars - mn) * 64
            # overflows (ANSI abort) past ~33.5M-char documents
            F.expr("((CAST(n_chars AS BIGINT) - mn) * 64) DIV (CAST(mx AS BIGINT) - mn + 1)"),
        )
        .cast("int")
        .alias("bin"),
    )
    c = binned.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    # the ALL grain rolls up from the per-source BIN COUNTS (mergeability
    # in action); grouping-sets-style explode keeps it one subtree — a
    # self-union would plan the binning scan (and its scalar broadcast)
    # twice
    u = (
        c.select(F.explode(F.array(F.col("source"), F.lit("ALL"))).alias("source"), "bin", "cnt")
        .groupBy("source", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    wcum = Window.partitionBy("source").orderBy("bin")
    wtot = Window.partitionBy("source")
    cum = u.select(
        "source",
        "bin",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("tot"),
    )
    pick = lambda q: F.min(  # noqa: E731
        F.when(F.col("cum") * 100 >= q * F.col("tot"), F.col("bin"))
    )
    return cum.groupBy("source").agg(
        pick(50).alias("p50_bin"), pick(95).alias("p95_bin"), pick(99).alias("p99_bin")
    )


@register(
    "x79_zipf_fit",
    oracle="""
    WITH tc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents)
      GROUP BY source, w),
    ranked AS (
      SELECT source, w, c,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, w) AS r
      FROM tc),
    terms AS (
      SELECT source,
             CAST(ln(r) AS DECIMAL(30,10)) AS x,
             CAST(ln(c) AS DECIMAL(30,10)) AS y
      FROM ranked),
    s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x * y AS DECIMAL(30,10))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(30,10))) AS sxx
      FROM terms GROUP BY source)
    SELECT source, n_terms,
           CASE WHEN n_terms >= 2 THEN
             ROUND(CAST(n_terms * sxy - sx * sy AS DOUBLE)
                   / NULLIF(CAST(n_terms * sxx - sx * sx AS DOUBLE), 0), 4) + 0
           END AS zipf_slope
    FROM s
    """,
)
def x79_zipf_fit(spark, sf_dir):
    """Corpus-health diagnostic: the Zipf exponent per source — the slope
    of ln(term frequency) against ln(frequency rank). Natural text sits
    near -1; a source whose slope is far shallower (near-uniform token
    use: machine-generated filler, template spam) or far steeper
    (tiny-vocabulary repetition) is a data-quality flag the per-doc
    signals (x21/x33) can miss because it only shows in the SOURCE-level
    distribution.

    Exactness discipline: the least-squares slope is computed from
    DECIMAL-accumulated sums (every ln() term and every product is cast
    to DECIMAL(30,10) BEFORE summation on both engines), so the partial
    aggregation order cannot move the result — the only doubles are the
    final numerator/denominator division. Scale: one token explode ->
    (source, term) hash-agg, one per-source rank window over the
    vocab-sized term table, one per-source fold to 5 sums; nothing
    touches the corpus twice."""
    d = load(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wr = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("w"))
    dec = lambda col: col.cast("decimal(30,10)")  # noqa: E731
    terms = tc.withColumn("r", F.row_number().over(wr)).select(
        "source",
        dec(F.log(F.col("r"))).alias("x"),
        dec(F.log(F.col("c"))).alias("y"),
    )
    s = terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
    )
    return s.select(
        "source",
        "n_terms",
        # a slope needs >= 2 ranked terms: one distinct token per source
        # (pure template spam — the pathology x79 exists to flag) zeroed
        # the denominator and ABORTED the query under ANSI; NULL instead
        F.when(
            F.col("n_terms") >= 2,
            F.round(
                (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / F.nullif(
                    (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
                    F.lit(0.0),
                ),
                4,
            ),
        ).alias("zipf_slope"),
    )


@register(
    "x80_gopher_quality_rules",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS words,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS n_ellipsis
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             -- list_sum([]) is NULL in DuckDB, but a 0-word doc has total
             -- word length 0 (Spark's fold starts at 0); NULL text keeps
             -- NULL (no words at all, not zero-length words)
             CASE WHEN words IS NULL THEN NULL ELSE
               COALESCE(list_sum(list_transform(words, w -> CAST(length(w) AS BIGINT))), 0)
             END AS sum_len,
             CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
             -- NULL text has NO stop-word count (CASE WHEN would silently
             -- turn the NULL list_contains into 0 = "no stop words")
             CASE WHEN words IS NULL THEN NULL ELSE
               (CASE WHEN list_contains(words, 'the') THEN 1 ELSE 0 END
              + CASE WHEN list_contains(words, 'be') THEN 1 ELSE 0 END
              + CASE WHEN list_contains(words, 'to') THEN 1 ELSE 0 END
              + CASE WHEN list_contains(words, 'of') THEN 1 ELSE 0 END
              + CASE WHEN list_contains(words, 'and') THEN 1 ELSE 0 END
              + CASE WHEN list_contains(words, 'that') THEN 1 ELSE 0 END
              + CASE WHEN list_contains(words, 'have') THEN 1 ELSE 0 END
              + CASE WHEN list_contains(words, 'with') THEN 1 ELSE 0 END)
             END AS n_stop,
             n_hash, n_ellipsis
      FROM base)
    -- COALESCE(flag, false): a NULL-text doc has no words and FAILS every
    -- rule — non-NULL flags keep the audit columns boolean on both
    -- engines (NULL booleans also render differently across pandas
    -- bridges: None vs nan)
    SELECT doc_id, n_words,
           COALESCE(n_words BETWEEN 50 AND 100000, false) AS word_count_ok,
           COALESCE(CAST(sum_len AS DOUBLE) / GREATEST(n_words, 1) BETWEEN 3 AND 10, false) AS mean_word_len_ok,
           COALESCE(CAST(n_hash + n_ellipsis AS DOUBLE) / GREATEST(n_words, 1) < 0.1, false) AS symbol_ratio_ok,
           COALESCE(CAST(n_alpha AS DOUBLE) / GREATEST(n_words, 1) >= 0.8, false) AS alpha_word_frac_ok,
           COALESCE(n_stop >= 2, false) AS stopword_ok,
           COALESCE((n_words BETWEEN 50 AND 100000)
             AND (CAST(sum_len AS DOUBLE) / GREATEST(n_words, 1) BETWEEN 3 AND 10)
             AND (CAST(n_hash + n_ellipsis AS DOUBLE) / GREATEST(n_words, 1) < 0.1)
             AND (CAST(n_alpha AS DOUBLE) / GREATEST(n_words, 1) >= 0.8)
             AND (n_stop >= 2), false) AS gopher_pass
    FROM m
    """,
)
def x80_gopher_quality_rules(spark, sf_dir):
    """The Gopher document-quality rule set (Rae et al. 2021,
    arXiv:2112.11446 §A1.1) as per-rule flags, not one opaque score: word
    count in [50, 100k], mean word length in [3, 10], symbol-to-word ratio
    ('#' chars + '...' runs) < 0.1, >= 80% of words contain an alphabetic
    character, and >= 2 of the 8 canonical stop words present. Emitting
    each flag separately is what makes the gate auditable — a corpus
    health dashboard wants WHICH rule kills a source, not just the kill
    rate (complements x21's continuous score and x43's filter pipeline).

    Exactness: every ratio is one double division of exact BIGINTs
    (counts / counts), so both engines compute bit-identical IEEE results;
    rule thresholds compare those. Scale: a single narrow projection pass
    over the corpus — per-doc higher-order functions, no shuffle at all
    (the plan is scan -> project; Catalyst prunes to (doc_id, text)).

    NULL text fails every rule: the flags coalesce to False (both
    engines) so the audit columns stay non-NULL booleans — a doc with no
    words is not a Gopher pass, and NULL booleans render differently
    across the two pandas bridges (hostile-fixture finding)."""
    d = load(spark, sf_dir, "documents")
    m = _gopher_metrics(d.select("doc_id", "text"))
    r = _gopher_rules()
    fl = F.lit(False)
    return m.select(
        "doc_id",
        F.col("_g_n_words").alias("n_words"),
        F.coalesce(r["word_count"], fl).alias("word_count_ok"),
        F.coalesce(r["mean_word_len"], fl).alias("mean_word_len_ok"),
        F.coalesce(r["symbol_ratio"], fl).alias("symbol_ratio_ok"),
        F.coalesce(r["alpha_word_frac"], fl).alias("alpha_word_frac_ok"),
        F.coalesce(r["stopword"], fl).alias("stopword_ok"),
        F.coalesce(
            r["word_count"] & r["mean_word_len"] & r["symbol_ratio"]
            & r["alpha_word_frac"] & r["stopword"],
            fl,
        ).alias("gopher_pass"),
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: the underscore-prefixed metric columns _gopher_metrics adds
_GOPHER_METRIC_COLS = (
    "_g_n_words", "_g_sum_len", "_g_n_alpha", "_g_n_stop", "_g_n_hash", "_g_n_ellipsis"
)


def _gopher_metrics(df):
    """Stamp the Gopher rule inputs (exact BIGINT counts, underscore
    columns) onto any frame with a ``text`` column — x80's oracle face and
    the corpus build's gopher_gate stage share these expressions."""
    words = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    df = df.withColumn("_gw", words)
    stop_hits = sum(F.array_contains("_gw", w).cast("int") for w in _GOPHER_STOPWORDS)
    return df.withColumns(
        {
            "_g_n_words": F.size("_gw").cast("bigint"),
            "_g_sum_len": F.aggregate(
                F.transform("_gw", lambda w: F.length(w).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
            "_g_n_alpha": F.size(F.filter("_gw", lambda w: w.rlike("[A-Za-z]"))).cast("bigint"),
            "_g_n_stop": stop_hits,
            "_g_n_hash": F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("#"), F.lit(""))),
            "_g_n_ellipsis": (
                (F.length("text") - F.length(F.replace(F.col("text"), F.lit("..."), F.lit(""))))
                / 3
            ).cast("bigint"),
        }
    ).drop("_gw")


def _gopher_rules() -> dict:
    """Rule-name -> boolean Column over _gopher_metrics output (Rae 2021
    §A1.1 thresholds)."""
    nw = F.greatest(F.col("_g_n_words"), F.lit(1))
    return {
        "word_count": F.col("_g_n_words").between(50, 100000),
        "mean_word_len": (F.col("_g_sum_len").cast("double") / nw).between(3, 10),
        "symbol_ratio": (F.col("_g_n_hash") + F.col("_g_n_ellipsis")).cast("double") / nw < 0.1,
        "alpha_word_frac": F.col("_g_n_alpha").cast("double") / nw >= 0.8,
        "stopword": F.col("_g_n_stop") >= 2,
    }


#: the full rule set, in verdict-attribution order (subset with rules=)
GOPHER_RULES = ("word_count", "mean_word_len", "symbol_ratio", "alpha_word_frac", "stopword")


def with_gopher_verdict(df, rules: tuple[str, ...] | None = None):
    """Stamp ``gopher_verdict`` onto any frame with a ``text`` column:
    'keep', or the FIRST failing rule in x80's flag order — per-rule
    attribution for the corpus build's drop audit, the same
    first-tripped-wins discipline as with_filter_verdict. NULL text trips
    'malformed' (a NULL predicate would otherwise fall through every
    WHEN to 'keep' — the x43 hazard). ``rules`` selects a subset by name
    (default: all five) — deployments tune the set per corpus (e.g. the
    stopword rule presumes English prose and annihilates code or
    synthetic-vocabulary corpora). Pure projection, no shuffle."""
    m = _gopher_metrics(df)
    r = _gopher_rules()
    active = rules if rules is not None else tuple(r)
    unknown = set(active) - set(r)
    if unknown:
        raise ValueError(f"unknown gopher rules: {sorted(unknown)}")
    verdict = F.when(F.col("text").isNull(), F.lit("malformed"))
    for name in r:  # canonical order, filtered to the active subset
        if name in active:
            verdict = verdict.when(~r[name], F.lit(name))
    return m.withColumn("gopher_verdict", verdict.otherwise(F.lit("keep"))).drop(
        *_GOPHER_METRIC_COLS
    )


def _bpe_fertility_oracle(n_merges: int = _BPE_N_MERGES) -> str:
    """x81's oracle: the shared wt chain aggregated per language."""
    return f"""{_bpe_wt_chain(n_merges)}
    SELECT lang, COUNT(*) AS n_words, CAST(SUM(tok) AS BIGINT) AS n_bpe_tokens,
           ROUND(CAST(SUM(tok) AS DOUBLE) / COUNT(*), 4) AS fertility
    FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS w FROM documents) dw
    JOIN wt USING (w)
    GROUP BY lang"""


@register("x81_token_fertility_by_lang", oracle=_bpe_fertility_oracle())
def x81_token_fertility_by_lang(spark, sf_dir, n_merges: int = _BPE_N_MERGES):
    """Tokenizer fertility (BPE tokens per word) per language — the
    standard multilingual-tokenizer health metric: a tokenizer trained on
    a skewed corpus over-fragments the minority languages, inflating
    their effective sequence lengths and training cost; per-lang fertility
    is the number a mixture designer (x35) reads before setting weights.

    Scale: training is x74 (corpus touched once, then vocab-sized
    iterations); apply is x75's distinct-word nested-replace; the only
    addition is carrying ``lang`` through the occurrence join and
    aggregating to one row per language. Fertility is a double division
    of exact BIGINT sums, identical on both engines."""
    d = load(spark, sf_dir, "documents")
    merges = _bpe_train_merges(spark, d, n_merges)
    words = d.select("lang", F.explode(F.split("text", " ")).alias("w"))
    wt = _bpe_token_count_per_word(words, merges)
    return (
        words.join(wt, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("tok").cast("bigint").alias("n_bpe_tokens"),
            F.round(F.sum("tok").cast("double") / F.count(F.lit(1)), 4).alias("fertility"),
        )
    )


@register(
    "x82_centroid_outlier_prune",
    oracle=_finite_embeddings("""
    WITH u AS (
      SELECT vec_id, label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings),
    cs AS (
      SELECT label, i,
             list_sum(list(CAST(v AS DOUBLE) ORDER BY vec_id)) AS s
      FROM u GROUP BY label, i),
    cent AS (
      SELECT label, list(s ORDER BY i) AS ce FROM cs GROUP BY label),
    sc AS (
      SELECT e.vec_id, e.label,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
                                     i -> CAST(e.embedding[i] AS DOUBLE) * ce[i])) AS dot,
             sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x))) AS en,
             sqrt(list_sum(list_transform(ce, x -> x * x))) AS cn
      FROM embeddings e JOIN cent USING (label)),
    r AS (
      SELECT vec_id, label, dot / NULLIF(en * cn, 0) AS c,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY dot / NULLIF(en * cn, 0) ASC NULLS FIRST, vec_id) AS rn,
             COUNT(*) OVER (PARTITION BY label) AS n
      FROM sc)
    SELECT vec_id, label, ROUND(c, 6) + 0 AS centroid_cos,
           rn <= CAST(ceil(0.1 * n) AS BIGINT) AS pruned
    FROM r
    """),
)
def x82_centroid_outlier_prune(spark, sf_dir):
    """Prototype-distance data pruning (Sorscher et al. 2022,
    arXiv:2206.14486): score every vector by cosine to its cluster
    centroid and flag the 10% farthest per label as prune candidates —
    the SemDeDup complement (x65 removes redundant NEAR-centroid
    near-twins; this surfaces the misclustered/outlier tail a curated
    training set drops or routes to review).

    Exactness across engines: the centroid component is a SEQUENTIAL
    left-to-right double fold over the label's values in vec_id order
    (collect -> sort -> fold on both engines, so partial-agg order cannot
    move a bit; verified fold-identical to DuckDB's list_sum; a DECIMAL
    sum would be order-free too, but the float->decimal cast itself
    diverges between engines on 11th-digit ties). Cosine is
    scale-invariant, so the un-divided sum IS the centroid direction.
    Per-row dot/norm folds are sequential in both engines (the x10
    discipline); the prune cut is a RANK (farthest-first, vec_id
    tie-break), never a float-threshold comparison. Scale: one explode ->
    (label, i) agg for centroids (state = one value list per label
    component — bounded by cluster size, the same contract x65 enforces;
    output = labels x dim, tiny), centroid table broadcast back, one
    narrow pass for scores, one per-label rank window — linear in n."""
    e = _load_finite_embeddings(spark, sf_dir)
    u = e.select("label", "vec_id", F.posexplode("embedding").alias("i", "v"))
    cs = u.groupBy("label", "i").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("vec_id", "v"))),
                lambda x: x["v"].cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s")
    )
    cent = cs.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "s"))),
            lambda x: x["s"].cast("double"),
        ).alias("ce")
    )
    sc = e.join(F.broadcast(cent), "label").selectExpr(
        "vec_id",
        "label",
        "aggregate(zip_with(embedding, ce, (x, y) -> cast(x AS double) * y), 0D,"
        " (acc, x) -> acc + x) AS dot",
        "sqrt(aggregate(embedding, 0D, (acc, x) -> acc + cast(x AS double) * x)) AS en",
        "sqrt(aggregate(ce, 0D, (acc, x) -> acc + x * x)) AS cn",
    )
    # zero-norm guard (the x65/x47 rule): an all-zero embedding has no
    # direction — cosine is NULL, never an ANSI DIVIDE_BY_ZERO abort; it
    # ranks FIRST (most outlier), pinned by an explicit NULLS FIRST on
    # both engines (Spark asc defaults nulls-first, DuckDB nulls-LAST)
    c = F.when(
        (F.col("en") > 0) & (F.col("cn") > 0), F.col("dot") / (F.col("en") * F.col("cn"))
    )
    w = Window.partitionBy("label").orderBy(c.asc_nulls_first(), F.asc("vec_id"))
    wn = Window.partitionBy("label")
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .select(
            "vec_id",
            "label",
            F.round(c, 6).alias("centroid_cos"),
            (F.col("rn") <= F.ceil(F.lit(0.1) * F.col("n"))).alias("pruned"),
        )
    )


@register(
    "x83_ngram_novelty",
    oracle="""
    WITH g AS (
      SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS bg
      FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents)),
    dg AS (SELECT DISTINCT doc_id, bg FROM g WHERE bg IS NOT NULL),
    first AS (SELECT bg, MIN(doc_id) AS first_doc FROM dg GROUP BY bg)
    SELECT dg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(SUM(CASE WHEN first.first_doc = dg.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           ROUND(CAST(SUM(CASE WHEN first.first_doc = dg.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
    FROM dg JOIN first USING (bg)
    GROUP BY dg.doc_id
    """,
)
def x83_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    bigrams whose first corpus appearance (min doc_id — the arrival
    order) is this document. A crawl-freshness/curriculum signal: a
    near-zero-novelty doc is recombined boilerplate even when no single
    document duplicates it (the case x01/x03 miss), and a per-source
    novelty average tells a mixture designer which feeds still add new
    content (pairs with x63's sketch-level overlap, at n-gram
    granularity).

    Scale: bigram explode -> distinct -> min-agg on the bigram key (the
    same shuffle family as x28/x68; partial aggs make the min map-side
    cheap), then one join back on the bigram key reusing that shuffle,
    and a doc_id re-agg. All counts exact BIGINTs; novelty is one double
    division. Never doc x doc; state per key is one BIGINT."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dg = (
        d.select("doc_id", F.explode(bigrams).alias("bg"))
        .distinct()
    )
    first = dg.groupBy("bg").agg(F.min("doc_id").alias("first_doc"))
    j = dg.join(first, "bg")
    novel = F.sum((F.col("first_doc") == F.col("doc_id")).cast("int")).cast("bigint")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        novel.alias("n_novel"),
        F.round(novel.cast("double") / F.count(F.lit(1)), 6).alias("novelty"),
    )


#: PQ geometry: 64-dim vectors cut into _PQ_M subspaces of _PQ_D dims;
#: codebook = the first _PQ_K vectors' sub-vectors (deterministic seeds,
#: the x11 convention — a k-means codebook is the production variant,
#: x40 supplies the update step)
_PQ_M = 8
_PQ_D = 8
_PQ_K = 16


def _pq_seed_stages(e):
    """The PQ pipeline x84 and x85 share over the deterministic seed
    codebook: returns ``(enc, qd)`` — the database encode table
    (did, s, code) and the per-query distance tables (qid, s, code, d2).
    One definition so a threshold/fold fix cannot drift between the two
    entries (x86's residual variant derives its own residual-space
    twins)."""
    subv = F.transform(
        F.sequence(F.lit(1), F.lit(_PQ_D)),
        lambda i: F.element_at(
            F.col("embedding"), (F.col("s") * _PQ_D + i).cast("int")
        ).cast("double"),
    )
    spaces = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("s")
    cb = (
        e.filter(F.col("vec_id") < _PQ_K)
        .select(F.col("vec_id").alias("code"), spaces, "embedding")
        .select("code", "s", subv.alias("cw"))
    )
    l2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    db = (
        e.filter(F.col("vec_id") >= _PQ_K)
        .select(F.col("vec_id").alias("did"), spaces, "embedding")
        .select("did", "s", subv.alias("dv"))
    )
    wmin = Window.partitionBy("did", "s").orderBy(F.asc("d2"), F.asc("code"))
    enc = (
        db.join(F.broadcast(cb), "s")
        .withColumn("d2", l2(F.col("dv"), F.col("cw")))
        .withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select("did", "s", "code")
    )
    q = (
        e.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("qid"), spaces, "embedding")
        .select("qid", "s", subv.alias("qv"))
    )
    qd = (
        q.join(F.broadcast(cb), "s")
        .select("qid", "s", "code", l2(F.col("qv"), F.col("cw")).alias("d2"))
    )
    return enc, qd


def _pq_adc_rank(enc, qd, cand=None, k: int = 5):
    """ADC summation + per-query top-k over the encode/distance-table
    frames (the shared x84/x85 tail): s-sorted sequential fold, rank cut
    with did tie-break; ``cand`` (qid, did) semi-join-filters candidates
    first (x85's cell pruning).

    The emitted distance is the RAW double: the folds are fixed-order
    and bit-identical across engines, while a decimal ROUND is NOT — at
    1e9-magnitude distances (hostile fixture's 1e4 vector) a .5-boundary
    digit resolves differently under Spark's BigDecimal HALF_UP vs
    DuckDB's double-multiply rounding, and the DECIMAL detour the money
    queries use is itself lossy at these magnitudes x scale 10."""
    adc = enc.join(F.broadcast(qd), ["s", "code"])
    if cand is not None:
        # NO broadcast hint: cand is IVF-candidate-sized (~nprobe/ncells of
        # the database per query) — database-scale at the deployment size
        # this family advertises, so hinting it hard-codes an executor OOM;
        # a plain left_semi lets the planner size the build at runtime
        adc = adc.join(cand, ["qid", "did"], "left_semi")
    adc = adc.groupBy("qid", "did").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("s", "d2"))),
            F.lit(0.0),
            lambda acc, x: acc + x["d2"],
        ).alias("dist")
    )
    wtop = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("did"))
    return (
        adc.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= k)
        .select("qid", "did", F.col("dist").alias("adc_dist"))
    )



@register(
    "x84_pq_adc_topk",
    oracle=_finite_embeddings(f"""
    WITH ss AS (SELECT UNNEST(range(0, {_PQ_M})) AS s),
    cb AS (
      SELECT vec_id AS code, s,
             list_transform(range(1, {_PQ_D} + 1),
                            i -> CAST(embedding[s * {_PQ_D} + i] AS DOUBLE)) AS cw
      FROM embeddings, ss WHERE vec_id < {_PQ_K}),
    db AS (
      SELECT vec_id AS did, s,
             list_transform(range(1, {_PQ_D} + 1),
                            i -> CAST(embedding[s * {_PQ_D} + i] AS DOUBLE)) AS dv
      FROM embeddings, ss WHERE vec_id >= {_PQ_K}),
    enc0 AS (
      SELECT did, db.s, code,
             list_sum(list_transform(range(1, {_PQ_D} + 1),
                                     i -> (dv[i] - cw[i]) * (dv[i] - cw[i]))) AS d2
      FROM db JOIN cb ON db.s = cb.s),
    enc AS (
      SELECT did, s, code FROM enc0
      QUALIFY ROW_NUMBER() OVER (PARTITION BY did, s ORDER BY d2 ASC, code) = 1),
    q AS (
      SELECT vec_id AS qid, s,
             list_transform(range(1, {_PQ_D} + 1),
                            i -> CAST(embedding[s * {_PQ_D} + i] AS DOUBLE)) AS qv
      FROM embeddings, ss WHERE vec_id < 5),
    qd AS (
      SELECT qid, q.s, code,
             list_sum(list_transform(range(1, {_PQ_D} + 1),
                                     i -> (qv[i] - cw[i]) * (qv[i] - cw[i]))) AS d2
      FROM q JOIN cb ON q.s = cb.s),
    adc AS (
      SELECT qid, did, list_sum(list(d2 ORDER BY s)) AS dist
      FROM enc JOIN qd USING (s, code) GROUP BY qid, did)
    SELECT qid, did, dist AS adc_dist  -- raw double: see _pq_adc_rank
    FROM adc
    QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, did) <= 5
    """),
)
def x84_pq_adc_topk(spark, sf_dir):
    """Product quantization with asymmetric distance (Jegou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"): cut each vector
    into 8 subspaces of 8 dims, encode the database as 8 one-byte
    codeword ids against a fixed codebook, answer top-k by summing
    per-subspace query->codeword distance TABLES — never touching the
    raw database vectors at query time. THE compression that makes
    billion-vector ANN fit storage budgets (64 floats -> 8 bytes here);
    IVF (x13/x14) shrinks the search set, PQ shrinks the vectors, real
    deployments compose both.

    Scale: encode is (n x m) rows joined against an (m x k) broadcast
    codebook — linear, one argmin window keyed (did, s); the query side
    builds a per-query (m x k) distance table (tiny broadcast); ADC is
    one equi-join on (s, code) + a per-(qid, did) fold. Determinism: all
    distance folds are fixed-order sequential doubles (the x82
    discipline — subspace folds via s-sorted collect, engine-verified
    bit-identical); argmin and top-k cuts are RANKS with code/did
    tie-breaks."""
    enc, qd = _pq_seed_stages(_load_finite_embeddings(spark, sf_dir))
    return _pq_adc_rank(enc, qd)


@register(
    "x85_ivfadc_topk",
    oracle=_finite_embeddings(f"""
    WITH ss AS (SELECT UNNEST(range(0, {_PQ_M})) AS s),
    cells AS (
      SELECT did, ctr AS cell FROM (
        SELECT d0.vec_id AS did, c0.vec_id AS ctr,
               list_sum(list_transform(range(1, {_PQ_M * _PQ_D} + 1),
                 i -> (CAST(d0.embedding[i] AS DOUBLE) - CAST(c0.embedding[i] AS DOUBLE))
                    * (CAST(d0.embedding[i] AS DOUBLE) - CAST(c0.embedding[i] AS DOUBLE)))) AS d2
        FROM embeddings d0, embeddings c0
        WHERE d0.vec_id >= {_PQ_K} AND c0.vec_id < 8)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY did ORDER BY d2 ASC, ctr) = 1),
    qcells AS (
      SELECT qid, ctr AS cell FROM (
        SELECT q0.vec_id AS qid, c0.vec_id AS ctr,
               list_sum(list_transform(range(1, {_PQ_M * _PQ_D} + 1),
                 i -> (CAST(q0.embedding[i] AS DOUBLE) - CAST(c0.embedding[i] AS DOUBLE))
                    * (CAST(q0.embedding[i] AS DOUBLE) - CAST(c0.embedding[i] AS DOUBLE)))) AS d2
        FROM embeddings q0, embeddings c0
        WHERE q0.vec_id < 5 AND c0.vec_id < 8)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2 ASC, ctr) <= 2),
    cand AS (SELECT qid, did FROM qcells JOIN cells USING (cell)),
    cb AS (
      SELECT vec_id AS code, s,
             list_transform(range(1, {_PQ_D} + 1),
                            i -> CAST(embedding[s * {_PQ_D} + i] AS DOUBLE)) AS cw
      FROM embeddings, ss WHERE vec_id < {_PQ_K}),
    db AS (
      SELECT vec_id AS did, s,
             list_transform(range(1, {_PQ_D} + 1),
                            i -> CAST(embedding[s * {_PQ_D} + i] AS DOUBLE)) AS dv
      FROM embeddings, ss WHERE vec_id >= {_PQ_K}),
    enc0 AS (
      SELECT did, db.s, code,
             list_sum(list_transform(range(1, {_PQ_D} + 1),
                                     i -> (dv[i] - cw[i]) * (dv[i] - cw[i]))) AS d2
      FROM db JOIN cb ON db.s = cb.s),
    enc AS (
      SELECT did, s, code FROM enc0
      QUALIFY ROW_NUMBER() OVER (PARTITION BY did, s ORDER BY d2 ASC, code) = 1),
    q AS (
      SELECT vec_id AS qid, s,
             list_transform(range(1, {_PQ_D} + 1),
                            i -> CAST(embedding[s * {_PQ_D} + i] AS DOUBLE)) AS qv
      FROM embeddings, ss WHERE vec_id < 5),
    qd AS (
      SELECT qid, q.s, code,
             list_sum(list_transform(range(1, {_PQ_D} + 1),
                                     i -> (qv[i] - cw[i]) * (qv[i] - cw[i]))) AS d2
      FROM q JOIN cb ON q.s = cb.s),
    adc AS (
      SELECT qid, did, list_sum(list(d2 ORDER BY s)) AS dist
      FROM enc JOIN qd USING (s, code)
      JOIN cand USING (qid, did)
      GROUP BY qid, did)
    SELECT qid, did, dist AS adc_dist  -- raw double: see _pq_adc_rank
    FROM adc
    QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, did) <= 5
    """),
)
def x85_ivfadc_topk(spark, sf_dir):
    """IVFADC — the IVF x PQ composition (Jegou 2011 §IV; the FAISS
    IndexIVFPQ deployment shape, no-residual variant): coarse-assign every
    database vector to its nearest of 8 centroids, probe each query's 2
    nearest cells, and rank ONLY those candidates by PQ asymmetric
    distance. x11/x13 shrink the SEARCH SET, x84 shrinks the VECTORS;
    composed, a billion-vector index stores 8 bytes/vector and scans
    nprobe/8 of them per query — this entry pins the composition
    end-to-end under the oracle.

    Scale: the cell assignment is the x11 plan (broadcast centroids +
    argmin rank, linear); candidate filtering is one equi-join on the
    cell id BEFORE any per-pair work (at scale the cell id is a partition
    key, so probes prune partitions — the standing-index form is
    streaming/ann_ingest.py); the ADC stage inherits x84's shapes.
    Determinism: identical discipline to x82/x84 (fixed-order folds,
    rank cuts only)."""
    e = _load_finite_embeddings(spark, sf_dir)
    full_l2 = F.aggregate(
        F.zip_with("ve", "ce", lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("ctr"), F.col("embedding").alias("ce")
    )

    def assign(side, id_alias, keep):
        scored = side.select(F.col("vec_id").alias(id_alias), F.col("embedding").alias("ve")) \
            .crossJoin(F.broadcast(cent)).select(id_alias, "ctr", full_l2.alias("d2"))
        w = Window.partitionBy(id_alias).orderBy(F.asc("d2"), F.asc("ctr"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= keep)
            .select(id_alias, F.col("ctr").alias("cell"))
        )

    cells = assign(e.filter(F.col("vec_id") >= _PQ_K), "did", 1)
    qcells = assign(e.filter(F.col("vec_id") < 5), "qid", 2)
    cand = qcells.join(cells, "cell").select("qid", "did")
    enc, qd = _pq_seed_stages(e)
    return _pq_adc_rank(enc, qd, cand=cand)


@register(
    "x86_ivfpq_residual_topk",
    oracle=_finite_embeddings(f"""
    WITH ss AS (SELECT UNNEST(range(0, {_PQ_M})) AS s),
    ctr AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 8),
    asg AS (
      SELECT did, cell FROM (
        SELECT d0.vec_id AS did, ctr.cell,
               list_sum(list_transform(range(1, {_PQ_M * _PQ_D} + 1),
                 i -> (CAST(d0.embedding[i] AS DOUBLE) - CAST(ctr.ce[i] AS DOUBLE))
                    * (CAST(d0.embedding[i] AS DOUBLE) - CAST(ctr.ce[i] AS DOUBLE)))) AS d2
        FROM embeddings d0, ctr WHERE d0.vec_id >= {_PQ_K})
      QUALIFY ROW_NUMBER() OVER (PARTITION BY did ORDER BY d2 ASC, cell) = 1),
    res AS (
      SELECT e.vec_id AS did, asg.cell,
             list_transform(range(1, {_PQ_M * _PQ_D} + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) - CAST(ctr.ce[i] AS DOUBLE)) AS rv
      FROM embeddings e JOIN asg ON e.vec_id = asg.did JOIN ctr USING (cell)),
    cb AS (
      SELECT CAST(did - {_PQ_K} AS INT) AS code, s,
             list_transform(range(1, {_PQ_D} + 1), i -> rv[s * {_PQ_D} + i]) AS cw
      FROM res, ss WHERE did BETWEEN {_PQ_K} AND {2 * _PQ_K - 1}),
    enc0 AS (
      SELECT r.did, r.s, cb.code,
             list_sum(list_transform(range(1, {_PQ_D} + 1),
                                     i -> (rsub[i] - cw[i]) * (rsub[i] - cw[i]))) AS d2
      FROM (SELECT did, s,
                   list_transform(range(1, {_PQ_D} + 1), i -> rv[s * {_PQ_D} + i]) AS rsub
            FROM res, ss) r JOIN cb ON r.s = cb.s),
    enc AS (
      SELECT did, s, code FROM enc0
      QUALIFY ROW_NUMBER() OVER (PARTITION BY did, s ORDER BY d2 ASC, code) = 1),
    qc AS (
      SELECT qid, cell FROM (
        SELECT q0.vec_id AS qid, ctr.cell,
               list_sum(list_transform(range(1, {_PQ_M * _PQ_D} + 1),
                 i -> (CAST(q0.embedding[i] AS DOUBLE) - CAST(ctr.ce[i] AS DOUBLE))
                    * (CAST(q0.embedding[i] AS DOUBLE) - CAST(ctr.ce[i] AS DOUBLE)))) AS d2
        FROM embeddings q0, ctr WHERE q0.vec_id < 5)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2 ASC, cell) <= 2),
    qres AS (
      SELECT qc.qid, qc.cell,
             list_transform(range(1, {_PQ_M * _PQ_D} + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) - CAST(ctr.ce[i] AS DOUBLE)) AS qrv
      FROM qc JOIN embeddings e ON e.vec_id = qc.qid JOIN ctr USING (cell)),
    qd AS (
      SELECT qq.qid, qq.cell, qq.s, cb.code,
             list_sum(list_transform(range(1, {_PQ_D} + 1),
                                     i -> (qsub[i] - cw[i]) * (qsub[i] - cw[i]))) AS d2
      FROM (SELECT qid, cell, s,
                   list_transform(range(1, {_PQ_D} + 1), i -> qrv[s * {_PQ_D} + i]) AS qsub
            FROM qres, ss) qq JOIN cb ON qq.s = cb.s),
    cand AS (SELECT qid, did, cell FROM qc JOIN asg USING (cell)),
    adc AS (
      SELECT cand.qid, cand.did, list_sum(list(qd.d2 ORDER BY qd.s)) AS dist
      FROM cand
      JOIN enc ON enc.did = cand.did
      JOIN qd ON qd.qid = cand.qid AND qd.cell = cand.cell
              AND qd.s = enc.s AND qd.code = enc.code
      GROUP BY cand.qid, cand.did)
    SELECT qid, did, dist AS adc_dist  -- raw double: see _pq_adc_rank
    FROM adc
    QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist ASC, did) <= 5
    """),
)
def x86_ivfpq_residual_topk(spark, sf_dir):
    """Residual IVFPQ (Jegou 2011 §IV.B; FAISS IndexIVFPQ's by_residual
    DEFAULT): quantize each vector's RESIDUAL from its coarse centroid
    instead of the raw vector, and build the query's distance table PER
    PROBED CELL (its residual differs per cell) — table work scales with
    nprobe, the classic accuracy/probe-cost trade. With a TRAINED
    codebook residuals concentrate near zero and the codebook budget buys
    accuracy; with this entry's deterministic SEED codewords the recall
    is deliberately weak (the residual's fine structure is exactly what
    untrained codewords destroy — measured ~8x chance on the testdata,
    pinned in test_ann_recall), so what the oracle pins here is the
    residual-ADC PIPELINE's exactness end-to-end; the trained variant
    lives operationally in streaming/ann_ingest.train_pq_codebook.

    Scale: identical shapes to x85 (broadcast centroids, argmin windows,
    equi-join candidate filter, per-(qid, did) sorted fold) plus one
    (query x nprobe) residual expansion — all tiny-side; the corpus-side
    work stays one encode pass. Determinism: residual arithmetic is
    per-element double subtraction (order-free); every fold is
    fixed-order sequential; cuts are ranks (the x82/x84 discipline)."""
    e = _load_finite_embeddings(spark, sf_dir)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    ctr = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), as_double.alias("ce")
    )
    l2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def assign(side, id_alias, keep):
        scored = side.select(F.col("vec_id").alias(id_alias), as_double.alias("ve")) \
            .crossJoin(F.broadcast(ctr)).select(id_alias, "cell", l2(F.col("ve"), F.col("ce")).alias("d2"))
        w = Window.partitionBy(id_alias).orderBy(F.asc("d2"), F.asc("cell"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= keep)
            .select(id_alias, "cell")
        )

    db = e.filter(F.col("vec_id") >= _PQ_K)
    # the assignment/residual stage feeds the codebook, the encode AND the
    # candidate filter — checkpoint once so the centroid cross join plans
    # once (q91's single-scan discipline), not per consumer
    asg = assign(db, "did", 1).localCheckpoint()
    res = (
        db.select(F.col("vec_id").alias("did"), as_double.alias("ve"))
        .join(asg, "did")
        .join(F.broadcast(ctr), "cell")
        .select("did", "cell", F.zip_with("ve", "ce", lambda x, y: x - y).alias("rv"))
        .localCheckpoint()
    )
    spaces = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("s")
    rsub = F.slice(F.col("rv"), F.col("s") * _PQ_D + 1, _PQ_D)
    cb = (
        res.filter(F.col("did").between(_PQ_K, 2 * _PQ_K - 1))
        .select((F.col("did") - _PQ_K).cast("int").alias("code"), spaces, "rv")
        .select("code", "s", rsub.alias("cw"))
    )
    wmin = Window.partitionBy("did", "s").orderBy(F.asc("d2"), F.asc("code"))
    enc = (
        res.select("did", spaces, "rv")
        .select("did", "s", rsub.alias("dsub"))
        .join(F.broadcast(cb), "s")
        .withColumn("d2", l2(F.col("dsub"), F.col("cw")))
        .withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select("did", "s", "code")
    )
    qc = assign(e.filter(F.col("vec_id") < 5), "qid", 2).localCheckpoint()
    qres = (
        qc.join(
            e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), as_double.alias("ve")),
            "qid",
        )
        .join(F.broadcast(ctr), "cell")
        .select("qid", "cell", F.zip_with("ve", "ce", lambda x, y: x - y).alias("rv"))
    )
    qd = (
        qres.select("qid", "cell", spaces, "rv")
        .select("qid", "cell", "s", rsub.alias("qsub"))
        .join(F.broadcast(cb), "s")
        .select("qid", "cell", "s", "code", l2(F.col("qsub"), F.col("cw")).alias("d2"))
    )
    cand = qc.join(asg, "cell").select("qid", "did", "cell")
    adc = (
        cand.join(enc, "did")
        .join(F.broadcast(qd), ["qid", "cell", "s", "code"])
        .groupBy("qid", "did")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("s", "d2"))),
                F.lit(0.0),
                lambda acc, x: acc + x["d2"],
            ).alias("dist")
        )
    )
    wtop = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("did"))
    return (
        adc.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 5)
        # raw double, not ROUND: see _pq_adc_rank's precision note
        .select("qid", "did", F.col("dist").alias("adc_dist"))
    )


@register(
    "x87_effective_tokens_by_source",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      FROM documents),
    win AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens_raw,
           CAST(SUM(CASE WHEN w.doc_id IS NOT NULL THEN tok ELSE 0 END) AS BIGINT)
             AS n_tokens_effective,
           ROUND(CAST(SUM(CASE WHEN w.doc_id IS NOT NULL THEN tok ELSE 0 END) AS DOUBLE)
                 / SUM(tok), 6) AS effective_ratio
    FROM t LEFT JOIN win w ON t.doc_id = w.doc_id
    GROUP BY t.source
    """,
)
def x87_effective_tokens_by_source(spark, sf_dir):
    """Effective (post-exact-dedup) token contribution per source — the
    number a mixture designer (x35) actually budgets on: raw token counts
    overweight sources that shovel duplicates, so the weightable quantity
    is the tokens of each source's DEDUP WINNERS (x01's min-doc_id rule;
    a duplicated doc's tokens count once, attributed to the winner's
    source). ``effective_ratio`` near 0 flags a feed that is mostly
    recycled content even when per-doc quality signals pass.

    Scale: one digest hash-agg for the winner set (x01's shape), one
    key join back, one source rollup — all map-side-combinable; counts
    are exact BIGINTs, the ratio one double division."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("tok")
    )
    win = (
        d.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(1).alias("_w"))
    )
    j = t.join(win, "doc_id", "left")
    eff = F.sum(F.when(F.col("_w") == 1, F.col("tok")).otherwise(F.lit(0))).cast("bigint")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("bigint").alias("n_tokens_raw"),
        eff.alias("n_tokens_effective"),
        F.round(eff.cast("double") / F.sum("tok"), 6).alias("effective_ratio"),
    )


@register(
    "x88_split_leakage_audit",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(string_split(text,' '))),
                                     i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS sh
        FROM documents)
    ), hashed AS (
      SELECT doc_id, md5(sh) AS h0, md5('x:' || sh) AS h1 FROM sh
    ), sig AS (
      SELECT doc_id, seed,
             MIN(substr(CASE WHEN seed < 4 THEN h0 ELSE h1 END,
                        CAST((seed % 4) * 8 + 1 AS BIGINT), 8)) AS minhash
      FROM hashed, (SELECT UNNEST(range(8)) AS seed)
      GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 2 AS band, STRING_AGG(minhash, '|' ORDER BY seed) AS band_val
      FROM sig GROUP BY doc_id, seed // 2
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                               AND a.doc_id < b.doc_id
    ), sp AS (
      SELECT doc_id,
             CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
            FROM documents)
    )
    SELECT LEAST(sa.split, sb.split) AS split_a,
           GREATEST(sa.split, sb.split) AS split_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           LEAST(sa.split, sb.split) <> GREATEST(sa.split, sb.split) AS is_leak
    FROM pairs
    JOIN sp sa ON sa.doc_id = pairs.doc_a
    JOIN sp sb ON sb.doc_id = pairs.doc_b
    GROUP BY 1, 2, 4
    """,
)
def x88_split_leakage_audit(spark, sf_dir):
    """Cross-split contamination audit: count the x03 near-dup candidate
    pairs that land on each side of the NAIVE x25 doc_id-hash split —
    every ``is_leak`` pair is a test/val document whose near-twin sits in
    train, the quiet eval inflation x72's cluster-keyed split exists to
    prevent. Run as a gate after any split change: the leak rows must be
    zero (or explicitly accepted) before the split ships.

    Scale: the pair side is x03's banded equi-join (never doc x doc);
    the split map is a pure projection joined twice on doc_id; output is
    at most the handful of (split, split) combinations. All counts exact
    BIGINTs; pair canonicalization via LEAST/GREATEST on the split
    label, so (train, test) and (test, train) fold together."""
    pairs = x03_minhash_lsh_pairs(spark, sf_dir)
    sp = x25_dataset_split(spark, sf_dir)
    j = (
        pairs.join(sp.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "_sa"), "doc_a")
        .join(sp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "_sb"), "doc_b")
    )
    sa, sb = F.least("_sa", "_sb"), F.greatest("_sa", "_sb")
    return (
        j.select(sa.alias("split_a"), sb.alias("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_a", "split_b", "n_pairs",
            (F.col("split_a") != F.col("split_b")).alias("is_leak"),
        )
    )


@register(
    "x89_bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, w, i FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents)),
    uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM toks GROUP BY w),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM uni),
    bg AS (
      SELECT doc_id, w1, w2 FROM (
        SELECT doc_id, w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        FROM toks)
      WHERE w2 IS NOT NULL),
    bgc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM bg GROUP BY w1, w2),
    scored AS (
      SELECT bg.doc_id,
             CAST(ln((cb + 1.0) / (cw + vocab)) AS DECIMAL(30,10)) AS lp
      FROM bg JOIN bgc USING (w1, w2) JOIN uni ON uni.w = bg.w1, v)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) + 0 AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def x89_bigram_lm_score(spark, sf_dir):
    """Per-document mean bigram log-likelihood under the corpus's own
    add-1-smoothed bigram model — the fluency upgrade over x46's unigram
    score: word-salad that passes unigram frequency (common words, wrong
    order) scores low here, so it is the cheap in-engine stand-in for the
    perplexity filters (CCNet, Wenzek 2020) production pipelines run with
    external LMs.

    Scale: unigram + bigram hash-aggs over one token explode (the
    x28/x83 shuffle family), the corpus-total vocab as a 1-row scalar
    broadcast (x46's allowance), then one equi-join per table back onto
    the doc bigram stream and a per-doc fold. Exactness: each ln term is
    computed from exact BIGINT counts then DECIMAL-accumulated (x79's
    discipline — order-free summation), one double division at the
    end."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pair_structs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, (i + 1).cast("int")).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = d.select("doc_id", F.explode(pair_structs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    uni = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("vocab"))
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    scored = (
        bg.join(bgc, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("cb") + F.lit(1.0)) / (F.col("cw") + F.col("vocab")))
            .cast("decimal(30,10)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("lp").cast("double") / F.count(F.lit(1)), 6).alias("avg_logp"),
    )


@register(
    "x90_heaps_vocab_growth",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id, w FROM (
        SELECT source, doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)),
    per_doc AS (
      SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM toks GROUP BY source, doc_id),
    first_seen AS (
      SELECT source, w, MIN(doc_id) AS first_doc
      FROM toks GROUP BY source, w),
    new_terms AS (
      SELECT source, first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY source, first_doc),
    cum AS (
      SELECT p.source, p.doc_id,
             SUM(p.n_tok) OVER (PARTITION BY p.source ORDER BY p.doc_id) AS n_cum,
             SUM(COALESCE(nt.n_new, 0)) OVER (PARTITION BY p.source ORDER BY p.doc_id) AS v_cum
      FROM per_doc p LEFT JOIN new_terms nt
        ON nt.source = p.source AND nt.doc_id = p.doc_id),
    -- pts quantize ln at 1e-7 and UNSCALE to exact integers: every
    -- regression term then lives in integer/decimal space (bit-identical
    -- across engines), and only the final scale-0 numerator/denominator
    -- convert to double — a SINGLE correctly-rounded conversion on both
    -- engines. Casting a scale-14 decimal sum to double instead is
    -- DOUBLE-rounded in DuckDB (int128 -> double -> /1e14) and differs
    -- from Spark's BigDecimal conversion in the last ulp. Width bounds
    -- (documented): |xi| <= ~4.4e8 (ln of a u64 token count), so the
    -- DECIMAL(18/27,0) casts hold to ~2e9 points per source.
    pts AS (
      SELECT source,
             CAST(CAST(ln(n_cum) AS DECIMAL(15,7)) * 10000000 AS BIGINT) AS xi,
             CAST(CAST(ln(v_cum) AS DECIMAL(15,7)) * 10000000 AS BIGINT) AS yi
      FROM cum),
    s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(SUM(xi) AS DECIMAL(19,0)) AS sx, CAST(SUM(yi) AS DECIMAL(19,0)) AS sy,
             CAST(SUM(CAST(xi * yi AS DECIMAL(27,0))) AS DECIMAL(27,0)) AS sxy,
             CAST(SUM(CAST(xi * xi AS DECIMAL(27,0))) AS DECIMAL(27,0)) AS sxx
      FROM pts GROUP BY source)
    SELECT source, n_points,
           CASE WHEN n_points >= 2 THEN
             CAST(CAST(n_points AS DECIMAL(10,0)) * sxy - sx * sy AS DOUBLE)
               / NULLIF(CAST(CAST(n_points AS DECIMAL(10,0)) * sxx - sx * sx AS DOUBLE), 0)
           END AS heaps_beta
    FROM s
    """,
)
def x90_heaps_vocab_growth(spark, sf_dir):
    """Corpus-health diagnostic, x79's sibling: the Heaps-law exponent
    per source — the slope of ln(cumulative vocabulary) against
    ln(cumulative tokens) over the source's documents in arrival
    (doc_id) order. Natural text grows vocabulary as N^beta with beta
    ~0.4-0.6; beta near 0 is a source that stopped contributing new
    language (template spam, a stuck crawler re-fetching one site), beta
    near 1 is near-random token soup — both invisible to per-doc
    signals and the cheap leading indicator for x87's effective-token
    collapse.

    Scale: one token explode feeds BOTH the per-doc token counts and the
    per-(source, term) first-occurrence min-agg (vocab-sized); the
    cumulative series is two running-sum windows over the per-DOC table
    (rows = documents, not tokens); the slope is x79's DECIMAL-summed
    least squares — every cross-row sum is exact (BIGINT running sums,
    DECIMAL regression terms), so window/agg order cannot move a bit.

    Exactness (hostile-fixture finding, two layers): the ln points
    quantize at 1e-7 and UNSCALE to exact BIGINTs, so every regression
    term — cross products, sums, the n*sxy - sx*sy combination — is
    computed in integer/decimal space, bit-identical across engines; at
    (30,10) each engine rounded the too-wide cross term its own way,
    and a source with nearly-degenerate ln-token spread (one giant doc
    up front) amplified that 1e-6 noise into the slope's third decimal.
    Only the final SCALE-0 numerator/denominator convert to double (a
    single correctly-rounded conversion on both engines — casting a
    scale-14 decimal sum instead is DOUBLE-rounded in DuckDB:
    int128 -> double -> /1e14, off Spark's BigDecimal conversion by an
    ulp), and the slope is emitted RAW (a final ROUND could still split
    a .5 boundary across engines — the x84 lesson). Width bounds: |xi|
    <= ~4.4e8 (ln of a u64 token count) keeps the DECIMAL(19/27,0)
    terms exact to ~2e9 documents per source."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("source", "doc_id", F.explode(F.split("text", " ")).alias("w"))
    per_doc = toks.groupBy("source", "doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    new_terms = (
        toks.groupBy("source", "w")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("source", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    wrun = Window.partitionBy("source").orderBy("doc_id")
    cum = (
        per_doc.join(new_terms, ["source", "doc_id"], "left")
        .select(
            "source",
            "doc_id",
            F.sum("n_tok").over(wrun).alias("n_cum"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(wrun).alias("v_cum"),
        )
    )
    qi = lambda col: F.expr(f"CAST(CAST({col} AS DECIMAL(15,7)) * 10000000 AS BIGINT)")  # noqa: E731
    pts = cum.select("source", qi("ln(n_cum)").alias("xi"), qi("ln(v_cum)").alias("yi"))
    s = pts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("xi").cast("decimal(19,0)").alias("sx"),
        F.sum("yi").cast("decimal(19,0)").alias("sy"),
        F.sum(F.expr("CAST(xi * yi AS DECIMAL(27,0))")).cast("decimal(27,0)").alias("sxy"),
        F.sum(F.expr("CAST(xi * xi AS DECIMAL(27,0))")).cast("decimal(27,0)").alias("sxx"),
    )
    npd = F.col("n_points").cast("decimal(10,0)")
    return s.select(
        "source",
        "n_points",
        # a slope needs >= 2 points: a single-document source (stuck
        # crawler — exactly what this diagnostic targets) previously
        # ABORTED under ANSI (double 0/0), and with only decimal-truncation
        # noise in the denominator the two engines disagree on the
        # meaningless 1-point value — NULL by construction on both
        F.when(
            F.col("n_points") >= 2,
            (npd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.nullif(
                (npd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
                F.lit(0.0),
            ),
        ).alias("heaps_beta"),
    )


@register(
    "x91_term_burstiness",
    oracle="""
    WITH tc AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS k FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)
      GROUP BY doc_id, w),
    d AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
    agg AS (
      SELECT w, CAST(SUM(k) AS BIGINT) AS total,
             CAST(SUM(k * k) AS BIGINT) AS sk2,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM tc GROUP BY w)
    SELECT w, df, total,
           ROUND(CAST(nd * sk2 - total * total AS DOUBLE)
                 / (CAST(nd AS DOUBLE) * total), 6) + 0 AS vmr
    FROM agg, d
    WHERE total >= 50
    QUALIFY ROW_NUMBER() OVER (
      ORDER BY CAST(nd * sk2 - total * total AS DOUBLE)
               / (CAST(nd AS DOUBLE) * total) DESC, w) <= 20
    """,
)
def x91_term_burstiness(spark, sf_dir):
    """The 20 burstiest frequent terms by variance-to-mean ratio of
    per-document counts (Church & Gale 1995): a Poisson-spread term has
    VMR ~1; content words CLUMP (high VMR — they saturate the few docs
    about their topic), so a frequent term whose VMR is near 1 across a
    whole source is machine-padding (keyword stuffing, template filler)
    — the term-level lens the doc-level repetition signals (x33) and
    source-level fits (x79/x90) bracket from either side.

    Exactness: VMR = (D*sum(k^2) - total^2) / (D*total) entirely from
    exact BIGINT aggregates — one double division at the end, so the
    ranking is bit-stable across engines (BIGINT products here are safe
    to ~3e9 occurrences per term; production would lift sk2 into
    DECIMAL). Scale: one (doc, term) hash-agg then a vocab-sized term
    agg; the doc count is a 1-row scalar broadcast; the top-20 cut is a
    rank."""
    d = load(spark, sf_dir, "documents")
    tc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    agg = tc.groupBy("w").agg(
        F.sum("k").cast("bigint").alias("total"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("sk2"),
        F.count(F.lit(1)).alias("df"),
    )
    vmr = (
        (F.col("nd") * F.col("sk2") - F.col("total") * F.col("total")).cast("double")
        / (F.col("nd").cast("double") * F.col("total"))
    )
    scored = (
        agg.crossJoin(F.broadcast(nd))
        .filter(F.col("total") >= 50)
        .select("w", "df", "total", vmr.alias("vmr"))
    )
    wtop = Window.orderBy(F.desc("vmr"), F.asc("w"))
    return (
        scored.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") <= 20)
        .select("w", "df", "total", F.round("vmr", 6).alias("vmr"))
    )


#: continuation-boundary window width (tokens)
_X92_W = 6


@register(
    "x92_continuation_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    sized AS (SELECT doc_id, ts, len(ts) AS n FROM t WHERE len(ts) >= {_X92_W}),
    heads AS (
      SELECT doc_id AS head_doc,
             array_to_string(ts[1:{_X92_W}], ' ') AS win
      FROM sized),
    tails AS (
      SELECT doc_id AS tail_doc,
             array_to_string(ts[n - {_X92_W} + 1:n], ' ') AS win
      FROM sized)
    SELECT tail_doc, head_doc, md5(win) AS boundary_hash
    FROM tails JOIN heads USING (win)
    WHERE tail_doc <> head_doc
    """,
)
def x92_continuation_pairs(spark, sf_dir):
    """Cross-document continuation detection: documents whose LAST
    6 tokens (_X92_W) equal another document's FIRST 6 tokens —
    the signature of one source document split across crawl records
    (pagination, shard boundaries, fetch truncation+retry). Downstream a
    reassembly pass chains these pairs (x06's components over this edge
    list) and concatenates; x76 finds shared windows ANYWHERE (dedup
    territory), this finds the boundary-aligned ones (reassembly
    territory).

    Scale: each doc contributes exactly ONE head key and ONE tail key
    (O(n) rows, vs x76's O(tokens) window relation), and the match is an
    equi-join on the window string — hot boilerplate openings (identical
    first lines across a template's pages) are real fan-out the
    downstream chain step must cap, exactly like x76's posting cap.
    Pure-projection keys, one shuffle each side.

    DRIVER-SIGNAL NOTE (the x30/x50 rows-only convention): the driver's
    hash row for this entry is VACUOUS on the provided testdata — the
    synthetic documents have no boundary-aligned continuation structure,
    so Spark and the oracle both return 0 rows and the green row pins
    nothing. The behavior pin lives in a crafted-corpus differential
    test against this same registry oracle:
    tests/test_text_edges.py::test_x92_continuation_pairs_nonvacuous."""
    d = load(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    sized = d.select("doc_id", ts.alias("ts"), F.size(ts).alias("n")).filter(
        F.col("n") >= _X92_W
    )
    heads = sized.select(
        F.col("doc_id").alias("head_doc"),
        F.concat_ws(" ", F.slice("ts", 1, _X92_W)).alias("win"),
    )
    tails = sized.select(
        F.col("doc_id").alias("tail_doc"),
        F.concat_ws(" ", F.slice(F.col("ts"), F.col("n") - _X92_W + 1, F.lit(_X92_W))).alias("win"),
    )
    return (
        tails.join(heads, "win")
        .filter(F.col("tail_doc") != F.col("head_doc"))
        .select("tail_doc", "head_doc", F.md5("win").alias("boundary_hash"))
    )
