"""Deterministic synthetic corpus generator — the scaling bench's data arm.

The driver-provided testdata is fixed at its scale factors, so nothing in
the repo can MEASURE how the dedup/ingest/ANN family grows with data: plan
pins prove a probe is index-shaped, but only a 1x-vs-10x run catches an
accidental candidate-pair explosion. This module generates documents and
embeddings tables of any size, SCHEMA-compatible with the testdata
(``documents``: doc_id/text/lang/source/n_chars; ``embeddings``:
vec_id/embedding/label), entirely from hash expressions — distributed
(``spark.range`` + JVM expressions; no driver-side data, no Python row
path), and deterministic (same n -> byte-identical content; the 1x corpus
is a strict statistical shrink of the 10x corpus, never a different
distribution).

Built-in structure, mirroring what the dedup family exists to find, with
RATES (not counts) held constant across scales so cost curves stay
honest:

- ~10% of docs are byte-exact duplicates of an earlier doc (same text,
  new doc_id) — the x01/x58 target;
- ~2% are near-duplicates (an earlier doc's text plus a marker token) —
  the LSH/SimHash target; near-dup CLUSTERS stay O(1)-sized, so banded
  joins grow linearly, which is the property the scaling pin verifies;
- one hot source ("src0") holds ~30% of docs — the x61 domain-cap skew;
- embeddings carry planted cluster structure (per-label centroid + noise)
  with cluster SIZE fixed at ~200 rows and the LABEL COUNT growing with
  n — exactly how a production SemDeDup deployment re-chooses k as the
  corpus grows, keeping the label-keyed pair join linear overall.

Tables land as ``<out_dir>/documents.parquet`` / ``embeddings.parquet``
(directory form), which ``queries.load`` reads exactly like the testdata
files — so every registry query runs unmodified against a generated dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the token universe — small-English-ish words like the testdata's, so
#: generated docs pass the same filter rules real docs do (letters only,
#: plausible token/char ratios). 63 words; bigram space 63^2 = 3969.
_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark line "
    "sort window query plan join shuffle filter push prune broadcast stage "
    "task core disk memory cache spill skew salt bucket shard range split "
    "stream state event block chain agent record field type index probe "
    "digest band sketch vector label token chunk source domain corpus text "
    "sample weight score rank"
).split()

#: fraction of docs that byte-duplicate an earlier doc
_DUP_FRAC = 0.10
#: every Nth doc is a near-duplicate of its predecessor
_NEAR_EVERY = 50
#: target rows per embedding cluster (label count grows with n)
_ROWS_PER_LABEL = 200


def generate_documents(spark: SparkSession, n: int) -> DataFrame:
    """n synthetic documents as a DataFrame (see module docstring for the
    planted dup/near-dup/skew structure)."""
    n_uniq = max(1, int(n * (1.0 - _DUP_FRAC)))
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    # A dup doc must replicate its TARGET's text byte-exactly, so it goes
    # through the same (seed, near) resolution the target itself used — a
    # hash-chosen target that happens to be a near-dup doc renders with the
    # target's shifted seed AND its marker suffix (previously such dups
    # rendered un-markered text identical to no document, quietly diluting
    # the ~10% exact-dup invariant by ~2%).
    target = F.when(
        F.col("doc_id") >= n_uniq,
        F.pmod(F.xxhash64(F.lit("dup"), F.col("doc_id")), F.lit(n_uniq)),
    ).otherwise(F.col("doc_id"))
    near = (target % _NEAR_EVERY == 1) & (target < n_uniq) & (target > 0)
    seed = F.when(near, target - 1).otherwise(target)
    df = base.select("doc_id", seed.alias("_seed"), near.alias("_near"))
    ntok = F.pmod(F.xxhash64(F.lit("len"), F.col("_seed")), F.lit(31)) + 25
    token = lambda i: F.element_at(  # noqa: E731
        vocab, (F.pmod(F.xxhash64(F.lit("tok"), F.col("_seed"), i), F.lit(len(_VOCAB))) + 1).cast("int")
    )
    text = F.concat_ws(" ", F.transform(F.sequence(F.lit(1), ntok.cast("int")), token))
    text = F.when(F.col("_near"), F.concat(text, F.lit(" marker"))).otherwise(text)
    lang = (
        F.when(F.pmod(F.xxhash64(F.lit("lang"), F.col("doc_id")), F.lit(10)) < 9, F.lit("en"))
        .otherwise(
            F.element_at(
                F.array(F.lit("fr"), F.lit("de"), F.lit("es")),
                (F.pmod(F.xxhash64(F.lit("l2"), F.col("doc_id")), F.lit(3)) + 1).cast("int"),
            )
        )
    )
    source = F.when(
        F.pmod(F.xxhash64(F.lit("hot"), F.col("doc_id")), F.lit(10)) < 3, F.lit("src0")
    ).otherwise(
        F.concat(F.lit("src"), F.pmod(F.xxhash64(F.lit("src"), F.col("doc_id")), F.lit(20)))
    )
    return df.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).alias("n_chars"),
    )


def generate_embeddings(
    spark: SparkSession, n: int, dim: int = 64, rows_per_label: int = _ROWS_PER_LABEL
) -> DataFrame:
    """n synthetic embeddings: per-label centroid + per-vector noise, unit
    structure close to the testdata's (float array, int label). The label
    count scales with n (fixed ~``rows_per_label`` cluster size) — the
    production SemDeDup contract that keeps sum(|cluster|^2) linear in n."""
    n_labels = max(1, n // rows_per_label)
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    label = F.pmod(F.xxhash64(F.lit("lab"), F.col("vec_id")), F.lit(n_labels)).cast("int")
    unit = lambda salt, *cols: (  # noqa: E731  hash -> uniform [-1, 1)
        (F.pmod(F.xxhash64(F.lit(salt), *cols), F.lit(2000)) - 1000) / 1000.0
    )
    df = base.select("vec_id", label.alias("label"))
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (unit("ctr", F.col("label"), i) * 0.8 + unit("nz", F.col("vec_id"), i) * 0.3).cast(
            "float"
        ),
    )
    return df.select("vec_id", emb.alias("embedding"), "label")


def generate_bpe_text(spark: SparkSession, n_docs: int, words_per_doc: int = 12) -> DataFrame:
    """n_docs rows of (text) for BPE-training benchmarks: each word is 8
    base64 chars of a per-(doc, position) sha2 — a 64-symbol alphabet
    with an effectively unbounded merge supply (every round of a batched
    trainer can fill its batch) and a DISTINCT-WORD count that grows
    ~linearly with n_docs, so per-round pair-count cost genuinely scales
    with the corpus. The testdata documents table (31-word vocabulary,
    pair supply exhausted near 90 merges) measures neither."""
    return spark.range(n_docs).select(
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words_per_doc)),
                lambda i: F.substring(
                    F.base64(
                        F.unhex(
                            F.sha2(
                                F.concat_ws("_", F.col("id").cast("string"), i.cast("string")),
                                256,
                            )
                        )
                    ),
                    1,
                    8,
                ),
            ),
        ).alias("text")
    )


def write_corpus(spark: SparkSession, out_dir: str, n_docs: int, n_vectors: int, dim: int = 64) -> str:
    """Materialize a generated corpus under ``out_dir`` in the testdata
    layout (``documents.parquet`` / ``embeddings.parquet`` directories) so
    registry queries and pipeline stages run against it unmodified."""
    os.makedirs(out_dir, exist_ok=True)
    parts = max(2, spark.sparkContext.defaultParallelism)
    generate_documents(spark, n_docs).repartition(parts).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    generate_embeddings(spark, n_vectors, dim=dim).repartition(parts).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


__all__ = ["generate_bpe_text", "generate_documents", "generate_embeddings", "write_corpus"]
