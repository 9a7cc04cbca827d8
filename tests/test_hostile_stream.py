"""The hostile program, extended to the STREAMING/stateful lanes (r9
verdict item #2): every stateful surface — sessionize
(applyInPandasWithState), windowed aggregation (append mode), trending
(update mode + read-time resolve), corpus ingest (exact + band dedup +
quarantine), ANN ingest/probe, the SCD2 apply, and the media ingest
(systematic payload corruption) — is driven over a hostile DELIVERY (microbatched adversarial inputs: NULL/duplicate/tied/
pre-1970 timestamps, NULL keys/values, unicode, empty batches, poison
vectors, u64 sentinels) and compared against its BATCH twin or an exact
arrival-order replay model.

The registry-wide hostile sweep (test_hostile_gate.py) proves engine
parity on adversarial TABLES; this file proves the stateful machinery —
watermark late-filtering, state round-trips, standing-index probes,
store transactions — preserves those semantics under adversarial
DELIVERY, where r9's per-lane unit pins only covered hand-picked cases.

Divergences this sweep found (now fixed in streaming/sessions.py, each
asserted below):

- a NULL ``value`` ABORTED the whole session stream (NaN -> Decimal ->
  ValueError in ``_cents``) where the batch twin's SQL SUM skips NULLs;
- an all-NULL-value session emitted total 0.0 where SQL SUM gives NULL;
- NULL-timestamp events arrived as NaT whose ``.value`` is int64-min —
  a silent bogus pre-epoch session (the batch twin filters them);
- a NULL ``user_id`` group failed the Arrow conversion against the
  non-nullable output schema (the batch twin groups NULL users).

Engine-inherent (pinned, not fixable): Structured Streaming's INITIAL
watermark is epoch 0, so a pre-1970 event is late-dropped on arrival in
every stateful lane; batch twins see it. The oracles model this.
"""

from __future__ import annotations

import datetime
import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from consensource_sds_spark.sources.hostile import (
    delivery_document_batches,
    write_hostile_sf,
)

_EPOCH = datetime.datetime(1970, 1, 1)
_US = datetime.timedelta(microseconds=1)


def _seeds() -> list[int]:
    """Same exploration knob as the registry sweep (test_hostile_gate):
    default TWO seeds (r10 verdict #3) — the crafted rows are
    seed-independent but the filler events/docs vary, so a second seed
    re-runs every lane over different session splits / window contents /
    dup placements at bounded cost (2-seed suite measured 355 s on the
    r11 build host, ~2x the 1-seed sweep); deeper sweeps via
    SPARK_GRAFT_HOSTILE_SEEDS (comma-separated)."""
    import os

    return [int(s) for s in os.environ.get("SPARK_GRAFT_HOSTILE_SEEDS", "94,7").split(",")]


@pytest.fixture(scope="module", params=_seeds())
def hostile_sf(request, tmp_path_factory):
    return write_hostile_sf(
        str(tmp_path_factory.mktemp("hostile_sf") / f"sf_{request.param}"),
        seed=request.param,
    )


def _event_batches(spark, hostile_sf, cols):
    """The hostile events table as a ts-ordered 3-batch delivery. Ordered
    delivery makes watermark admission exactly modelable: with a 30 s
    delay, the only late-dropped rows are those below the INITIAL epoch-0
    watermark (ts < 1970) — plus NULL-ts rows, which have no event time."""
    ev = spark.read.parquet(f"{hostile_sf}/events.parquet")
    rows = ev.select(*cols).orderBy(F.asc_nulls_first("ts")).collect()
    n = len(rows)
    return [rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]


def _run_batches(spark, batches, schema, src, start_stream):
    """Deliver each batch as one file-source microbatch, draining the
    stream (availableNow) after each append — one stream run per batch so
    state/watermark round-trip through the checkpoint every time."""
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)
        q = start_stream()
        q.awaitTermination(300)


def _admitted(rows):
    """The watermark admission model for ts-ordered delivery (see
    _event_batches): NULL ts never enters; pre-epoch ts is below the
    initial watermark."""
    return [r for r in rows if r["ts"] is not None and r["ts"] >= _EPOCH]


def _cents_model(v) -> int:
    if v is None or v != v:
        return 0
    return int(Decimal(repr(v * 100)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# Lane 1: sessionize (applyInPandasWithState) vs a python session model
# ---------------------------------------------------------------------------


def test_hostile_sessionize_stream_matches_session_model(spark, hostile_sf, tmp_path):
    from consensource_sds_spark.streaming.sessions import run_session_stream

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    batches = _event_batches(spark, hostile_sf, ["user_id", "ts", "value"])
    sentinel = [(999_999, datetime.datetime(2100, 1, 1), 1.0)]
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    gap_s = 1800
    _run_batches(
        spark,
        batches + [sentinel],
        schema,
        src,
        lambda: run_session_stream(spark, src, out, ckpt, schema, gap_sec=gap_s),
    )

    got = spark.read.parquet(out).filter("user_id IS NULL OR user_id != 999999")

    def key(r):
        tv = r["total_value"]
        return (
            r["user_id"],
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
            None if tv is None else round(tv, 2),
        )

    stream = sorted(map(key, got.collect()), key=str)

    # python replay: gap-split per user over the admitted rows; cents
    # HALF_UP like SQL round; all-NULL-value session -> NULL total
    by_user: dict = {}
    for r in _admitted([r for b in batches for r in b]):
        by_user.setdefault(r["user_id"], []).append(r)
    expect = []
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: r["ts"])
        sessions: list[list] = []
        for r in evs:
            us = (r["ts"] - _EPOCH) // _US
            c, nv = _cents_model(r["value"]), int(r["value"] is not None)
            if sessions and us - sessions[-1][1] <= gap_s * 1_000_000:
                s = sessions[-1]
                s[1], s[2], s[3], s[4] = us, s[2] + 1, s[3] + c, s[4] + nv
            else:
                sessions.append([us, us, 1, c, nv])
        for s, e, n, c, nv in sessions:
            expect.append((uid, s, e, n, round(c / 100.0, 2) if nv else None))
    assert stream == sorted(expect, key=str)
    # the hostile axes actually executed: a NULL-user session, an
    # all-NULL-value session, and a tied-microsecond multi-event burst
    assert any(k[0] is None for k in stream)
    assert any(k[4] is None for k in stream)
    assert any(k[1] == k[2] and k[3] > 1 for k in stream)


# ---------------------------------------------------------------------------
# Lane 2: windowed aggregation, append mode vs the same transform in batch
# ---------------------------------------------------------------------------

_EV_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _win_key(r):
    tv = r["total_value"]
    return (
        str(r["window_start"]),
        str(r["window_end"]),
        r["event_type"],
        r["n_events"],
        None if tv is None else round(float(tv), 2),
    )


def test_hostile_windowed_stream_matches_batch_twin(spark, hostile_sf, tmp_path):
    from consensource_sds_spark.streaming.windows import (
        run_windowed_stream,
        windowed_event_stats,
    )

    batches = _event_batches(spark, hostile_sf, ["event_type", "ts", "value"])
    sentinel = [("zz_sentinel", datetime.datetime(2100, 1, 1), 1.0)]
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _run_batches(
        spark,
        batches + [sentinel],
        _EV_SCHEMA,
        src,
        lambda: run_windowed_stream(spark, src, out, ckpt, _EV_SCHEMA, window="1 hour"),
    )
    got = spark.read.parquet(out).filter(
        "event_type IS NULL OR event_type != 'zz_sentinel'"
    )
    stream = set(map(_win_key, got.collect()))
    kept = spark.createDataFrame(_admitted([r for b in batches for r in b]), _EV_SCHEMA)
    batch = set(map(_win_key, windowed_event_stats(kept, window="1 hour").collect()))
    assert stream == batch
    # NULL event_type is a real group; some window totals are NULL (all
    # values NULL) — the axes reached the state store, not just the plan
    assert any(k[2] is None for k in stream)
    assert any(k[4] is None for k in stream)


# ---------------------------------------------------------------------------
# Lane 3: trending (update mode + max-batch_id resolve) vs batch top-k
# ---------------------------------------------------------------------------


def test_hostile_trending_stream_matches_batch_topk(spark, hostile_sf, tmp_path):
    from consensource_sds_spark.streaming.windows import (
        latest_trending,
        run_trending_stream,
        topk_per_window,
        windowed_event_stats,
    )

    batches = _event_batches(spark, hostile_sf, ["event_type", "ts", "value"])
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _run_batches(
        spark,
        batches,
        _EV_SCHEMA,
        src,
        lambda: run_trending_stream(spark, src, out, ckpt, _EV_SCHEMA, window="1 hour"),
    )

    def key(r):
        return (
            str(r["window_start"]),
            str(r["window_end"]),
            r["event_type"],
            r["n_events"],
            r["rk"],
        )

    stream = set(map(key, latest_trending(spark.read.parquet(out), k=3).collect()))
    kept = spark.createDataFrame(_admitted([r for b in batches for r in b]), _EV_SCHEMA)
    batch = set(
        map(key, topk_per_window(windowed_event_stats(kept, window="1 hour"), k=3).collect())
    )
    assert stream == batch and stream


# ---------------------------------------------------------------------------
# Lane 4: corpus ingest — exact + band dedup + quarantine vs arrival replay
# ---------------------------------------------------------------------------

_DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def _x43_keep(text, lang) -> bool:
    """Python twin of extensions.with_filter_verdict (split-on-space
    token count, uniq ratio) — an independent replay of the gate."""
    if text is None or lang is None:
        return False
    toks = text.split(" ")
    if len(toks) < 20 or lang != "en":
        return False
    return len(set(toks)) / len(toks) >= 0.25


def _exact_replay(doc_batches):
    """Arrival-order exact-dedup model: quarantine NULL-key rows, gate,
    then first-seen digest wins (min doc_id within a batch)."""
    seen: set = set()
    kept: set = set()
    quarantined = 0
    for b in doc_batches:
        bykey: dict = {}
        for r in b:
            if r["doc_id"] is None or r["text"] is None:
                quarantined += 1
                continue
            if not _x43_keep(r["text"], r["lang"]):
                continue
            d = hashlib.md5(r["text"].encode()).hexdigest()
            if d in seen:
                continue
            if d not in bykey or r["doc_id"] < bykey[d][0]:
                bykey[d] = (r["doc_id"], r["text"])
        for d, (did, text) in bykey.items():
            seen.add(d)
            kept.add(did)
    return kept, quarantined


def test_hostile_corpus_ingest_exact_lane_matches_replay(spark, hostile_sf, tmp_path):
    from consensource_sds_spark.streaming.corpus_ingest import (
        read_corpus,
        run_corpus_stream,
    )

    doc_batches = delivery_document_batches()
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _run_batches(
        spark,
        doc_batches,
        _DOC_SCHEMA,
        src,
        lambda: run_corpus_stream(spark, src, out, ckpt, quarantine=True),
    )
    got = {r["doc_id"] for r in read_corpus(spark, out).select("doc_id").collect()}
    expect, n_quar = _exact_replay(doc_batches)
    assert got == expect
    # within-batch dup collapsed to min doc_id; cross-batch dups lost
    assert 1 in got and 2 not in got
    assert 3 in got and 10 not in got
    assert 16 not in got
    # unicode/separator docs survived the whole pipeline byte-identically
    texts = {
        r["doc_id"]: r["text"]
        for r in read_corpus(spark, out).select("doc_id", "text").collect()
    }
    originals = {r["doc_id"]: r["text"] for b in doc_batches for r in b if r["doc_id"]}
    for did in (5, 14):
        assert texts[did] == originals[did]
    # quarantine lane holds exactly the NULL-key rows
    quar = spark.read.parquet(str(tmp_path / "out_quarantine"))
    assert quar.count() == n_quar == 2


def test_hostile_corpus_ingest_band_lane_matches_replay(spark, hostile_sf, tmp_path):
    from consensource_sds_spark.queries.extensions import minhash_band_values
    from consensource_sds_spark.streaming.corpus_ingest import (
        read_corpus,
        run_corpus_stream,
    )

    doc_batches = delivery_document_batches()
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _run_batches(
        spark,
        doc_batches,
        _DOC_SCHEMA,
        src,
        lambda: run_corpus_stream(spark, src, out, ckpt, near_dedup=True),
    )
    got = {r["doc_id"] for r in read_corpus(spark, out).select("doc_id").collect()}

    # replay: exact model first, then the band predecessor rule using the
    # repo's OWN signature function (the machinery under test is the
    # streaming join/standing-index path, not the hash recipe)
    exact_kept, _ = _exact_replay(doc_batches)
    all_rows = [r for b in doc_batches for r in b if r["doc_id"] in exact_kept]
    bands = {}
    for r in (
        minhash_band_values(
            spark.createDataFrame(all_rows, _DOC_SCHEMA).select("doc_id", "text")
        )
        .select("doc_id", "band", "band_val")
        .collect()
    ):
        bands.setdefault(r["doc_id"], set()).add((r["band"], r["band_val"]))
    expect: set = set()
    index_bands: dict = {}
    for b in doc_batches:
        fresh = sorted(r["doc_id"] for r in b if r["doc_id"] in exact_kept)
        retained = []
        for did in fresh:
            smaller_hit = any(
                bands[did] & bands[o] for o in fresh if o < did
            )
            corpus_hit = any(bands[did] & bv for o, bv in index_bands.items())
            if not smaller_hit and not corpus_hit:
                retained.append(did)
        # only RETAINED docs' bands enter the standing index — dropped
        # near-dups must never become probes' reference points
        # (corpus_ingest.py's band insert narrows batch_bands to the
        # survivors); so in a chain A~B, B~C, A!~C, B is dropped against
        # A and C SURVIVES — C only probes against A's bands
        for did in retained:
            index_bands[did] = bands[did]
        expect.update(retained)
    assert got == expect
    # the crafted near-dup pair was actually caught by the band lane
    assert 4 in got and 11 not in got
    # pin the retained-only index semantics directly (not just through the
    # replay model): the dropped near-dup's bands must be ABSENT from the
    # standing index — a dup must never become a later probe's reference
    # point — while every retained doc's bands are present
    from consensource_sds_spark.streaming.corpus_ingest import band_index

    idx_docs = {
        r["doc_id"]
        for r in band_index(spark, f"{out}_band_index").select("doc_id").distinct().collect()
    }
    assert 11 not in idx_docs and 2 not in idx_docs and 10 not in idx_docs
    assert idx_docs == expect


# ---------------------------------------------------------------------------
# Lane 5: ANN ingest + all-cells probe vs brute-force cosine top-k
# ---------------------------------------------------------------------------


def test_hostile_ann_ingest_and_probe_match_brute_force(spark, hostile_sf, tmp_path):
    from consensource_sds_spark.functions import vectors as V
    from consensource_sds_spark.streaming.ann_ingest import (
        ann_index,
        ann_probe,
        ingest_embedding_batch,
        init_ann_index,
        train_centroids,
    )

    emb = spark.read.parquet(f"{hostile_sf}/embeddings.parquet")
    d = str(tmp_path / "idx")
    rows = emb.orderBy("vec_id").collect()
    n = len(rows)
    batches = [rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]
    admitted = V.admit(emb)
    cent = train_centroids(spark, admitted, k=4, iters=2)
    init_ann_index(spark, d, cent)
    for i, b in enumerate(batches):
        ingest_embedding_batch(spark, spark.createDataFrame(b, emb.schema), i, d)
    # index == the admission rule's set: every poison vector (NaN/Inf/
    # NULL/NULL-element/ragged/empty) excluded, everything else stored
    stored = {r["vec_id"] for r in ann_index(spark, d).select("vec_id").collect()}
    assert stored == {r["vec_id"] for r in admitted.select("vec_id").collect()}

    # probe with clean (1, 3, 104), zero-norm (0), and the poison block —
    # all-NaN (8), NULL (12), NULL-element (13), ragged-short (14),
    # empty (16); an all-cells probe is EXACT, so it must equal brute
    # force over admitted x admitted
    q = emb.filter("vec_id IN (0, 1, 3, 8, 12, 13, 14, 16, 104)").select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    got = ann_probe(spark, d, q, k=5, nprobe=4)

    def key(r):
        c = r["cosine"]
        return (r["qid"], r["rank"], r["vec_id"], None if c is None else round(c, 9))

    stream = set(map(key, got.collect()))
    qa = V.admit(q.withColumnRenamed("embedding", "qe"), col="qe")
    cand = qa.crossJoin(admitted.select("vec_id", "embedding")).select(
        "qid", "vec_id", V.cosine(F.col("qe"), F.col("embedding")).alias("cosine")
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    brute = (
        cand.withColumn("rank", F.row_number().over(wk))
        .filter("rank <= 5")
        .select("qid", "vec_id", "cosine", "rank")
    )
    assert stream == set(map(key, brute.collect()))
    # the zero-norm query executed (NULL cosines, ranked by vec_id) and
    # every poison/ragged query was excluded, not job-aborting
    assert any(k[0] == 0 and k[3] is None for k in stream)
    assert {k[0] for k in stream} == {0, 1, 3, 104}


# ---------------------------------------------------------------------------
# Lane 6: SCD2 apply under hostile deliveries vs a last-wins version model
# ---------------------------------------------------------------------------


def test_hostile_scd2_deliveries_match_version_model(spark, tmp_path):
    from consensource_sds_spark.operators.scd2 import ScdParquetStore
    from consensource_sds_spark.pipeline import transform_events
    from consensource_sds_spark.schemas import MAX_BLOCK_NUM
    from consensource_sds_spark.sources import fixtures as fx

    store = ScdParquetStore(spark, str(tmp_path / "reporting"))

    def agent(pk, name, ts=1, org="test_org"):
        return dict(fx.make_agent(), public_key=pk, name=name, timestamp=ts, organization_id=org)

    uni = "名前テスト 🧪 éèê ‮RTL‬"
    u64 = 0xFFFFFFFFFFFFFFFF  # u64 sentinel -> i64 -1 (P2 widening)
    uni_assert_id = "assertion‮🧪"
    uni_assert_addr = fx.make_address("assertion", uni_assert_id)
    hostile_assertion = dict(
        fx.make_assertion(), id=uni_assert_id, address=uni_assert_addr
    )
    deliveries = [
        # block 1: unicode key+name, u64 timestamp, TWO same-key SETs in
        # one change list (reference UPDATE-then-INSERT sequencing: the
        # first becomes a zero-width version, the second current), an
        # empty-string organization_id (P4 -> NULL)
        fx.delivery(
            1,
            "b1",
            [
                fx.state_change("agent", uni, [agent(uni, "первый", ts=u64)]),
                fx.state_change("agent", "pk_a", [agent("pk_a", "loser")]),
                fx.state_change("agent", "pk_a", [agent("pk_a", "winner")]),
                fx.state_change("agent", "pk_b", [agent("pk_b", "", org="")]),
                fx.state_change(
                    "assertion", uni_assert_id, [hostile_assertion], address=uni_assert_addr
                ),
            ],
        ),
        # heartbeat: a block with no state changes — must be a no-op
        fx.delivery(2, "b2", []),
        # block 3: re-SET the unicode key (closes v1), DELETE the unicode
        # assertion (W3 tombstone — the one space the reference deletes),
        # and an agent DELETE which the reference IGNORES (no agent
        # delete arm in event_handler.rs) — it must be a no-op, not a
        # crash or a closed version
        fx.delivery(
            3,
            "b3",
            [
                fx.state_change("agent", uni, [agent(uni, "второй")]),
                fx.state_change("agent", "pk_a", None, change_type="DELETE"),
                fx.state_change(
                    "assertion", uni_assert_id, None, change_type="DELETE", address=uni_assert_addr
                ),
            ],
        ),
    ]
    for i, dl in enumerate(deliveries):
        store.apply(transform_events(fx.events_df(spark, [dl])), batch_id=i)

    got = sorted(
        (r["public_key"], r["name"], r["organization_id"], r["timestamp"],
         r["start_block_num"], r["end_block_num"])
        for r in store.read("agents").collect()
    )
    expect = sorted(
        [
            (uni, "первый", "test_org", -1, 1, 3),
            (uni, "второй", "test_org", 1, 3, MAX_BLOCK_NUM),
            ("pk_a", "loser", "test_org", 1, 1, 1),  # zero-width v1
            ("pk_a", "winner", "test_org", 1, 1, MAX_BLOCK_NUM),  # delete ignored
            ("pk_b", "", None, 1, 1, MAX_BLOCK_NUM),
        ]
    )
    assert got == expect
    cur = {r["public_key"]: r["name"] for r in store.current("agents").collect()}
    assert cur == {uni: "второй", "pk_a": "winner", "pk_b": ""}
    # the unicode assertion's version is closed [1, 3) by the W3 tombstone
    arows = [
        (r["assertion_id"], r["start_block_num"], r["end_block_num"])
        for r in store.read("assertions").collect()
    ]
    assert arows == [(uni_assert_id, 1, 3)]
    assert store.current("assertions").count() == 0


# ---------------------------------------------------------------------------
# Lane 7: media ingest under systematic payload corruption
# ---------------------------------------------------------------------------


def test_hostile_media_ingest_corruption_sweep(spark, tmp_path):
    """Fuzz-grade hostility for the media lane: a valid payload of EVERY
    pure-codec format, truncated at each quartile and bit-flipped at
    seeded positions, streamed through ``run_media_stream``. The pins:

    - the stream SURVIVES (a decoder exception outside the
      MALFORMED_MEDIA_ERRORS taxonomy — a TypeError or
      ZeroDivisionError from crafted bytes — would wedge the stream
      permanently, since a deterministic replay fails identically);
    - every payload lands in EXACTLY one lane (features + quarantine
      partition the input — nothing lost, nothing doubled);
    - unmodified payloads still decode (the sweep's control rows);
    - a second identical run produces identical lane assignments
      (decode is deterministic — no wall-clock/ordering dependence).
    """
    import random

    import numpy as np

    from consensource_sds_spark.operators import multimodal as MM
    from consensource_sds_spark.streaming.media_ingest import (
        read_media_features,
        run_media_stream,
    )

    rng = random.Random(17)
    x = np.linspace(0, 4 * np.pi, 32)
    px = (
        (np.outer(np.sin(x), np.cos(x))[:, :, None] * np.array([90, 50, 20]) + 128)
        .clip(0, 255)
        .astype(np.uint8)
    )
    t = np.arange(4000)
    wave = np.stack(
        [(7000 * np.sin(t / 21)).astype(np.int64), (5000 * np.sin(t / 33)).astype(np.int64)],
        axis=1,
    )
    def wav_bytes(samples: np.ndarray, rate: int = 16000) -> bytes:
        ch = samples.shape[1]
        data = samples.astype("<i2").tobytes()
        fmt = (
            b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
            + ch.to_bytes(2, "little") + rate.to_bytes(4, "little")
            + (rate * ch * 2).to_bytes(4, "little") + (ch * 2).to_bytes(2, "little")
            + (16).to_bytes(2, "little")
        )
        body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    # every format with an in-repo ENCODER (GIF is decode-only)
    valid = {
        "png": (MM.encode_png_pixels(px), "image"),
        "jpeg": (MM.encode_jpeg_pixels(px, quant=1), "image"),
        "bmp": (MM.encode_bmp_pixels(px), "image"),
        "flac": (MM.encode_flac_samples(wave), "audio"),
        "wav": (wav_bytes(wave), "audio"),
    }

    rows = []
    mid = 0
    for fmt, (payload, modality) in valid.items():
        variants = [payload]  # control: the unmodified payload
        n = len(payload)
        for q in (1, 2, 3):  # truncate at quartiles (header/mid/late)
            variants.append(payload[: (n * q) // 4])
        variants.append(payload[:7])  # sub-header stub
        for _ in range(8):  # seeded bit flips anywhere in the file
            pos = rng.randrange(n)
            b = bytearray(payload)
            b[pos] ^= 1 << rng.randrange(8)
            variants.append(bytes(b))
        for v in variants:
            rows.append((mid, modality, v, None, None, None, None))
            mid += 1

    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "media", "ckpt"))
    df.coalesce(2).write.mode("append").parquet(src)
    run_media_stream(spark, src, out, ckpt)  # pin 1: survives

    feats = {r["media_id"] for r in read_media_features(spark, out).collect()}
    quar = {r["media_id"] for r in spark.read.parquet(out + "_quarantine").collect()}
    all_ids = set(range(mid))
    assert feats | quar == all_ids  # nothing lost
    assert not (feats & quar)  # nothing doubled
    # controls decoded: media_id of each format's unmodified payload is
    # the first of its 13-variant block
    controls = set(range(0, mid, 13))
    assert controls <= feats, controls - feats

    # pin 4: determinism — the same delivery through a fresh stream gives
    # identical lane assignments
    src2, out2, ckpt2 = (str(tmp_path / d) for d in ("src2", "media2", "ckpt2"))
    df.coalesce(2).write.mode("append").parquet(src2)
    run_media_stream(spark, src2, out2, ckpt2)
    feats2 = {r["media_id"] for r in read_media_features(spark, out2).collect()}
    assert feats2 == feats


def test_hostile_scd2_fork_repair_over_hostile_values(spark, tmp_path):
    """Fork repair (W4) combined with the hostile VALUE axes: the chain
    being rewound holds unicode keys, u64-sentinel timestamps and
    empty-string-normalized fields — the rewind must restore exactly the
    pre-fork hostile state (re-opened versions byte-identical), and the
    forked chain's replacement values land on top. Fork machinery and
    hostile values each have their own suites; this pins the CROSS of
    the two axes (a rewind that round-trips hostile payloads through the
    store's close/reopen columns)."""
    from consensource_sds_spark.operators.scd2 import ScdParquetStore
    from consensource_sds_spark.pipeline import transform_events
    from consensource_sds_spark.schemas import MAX_BLOCK_NUM
    from consensource_sds_spark.sources import fixtures as fx

    store = ScdParquetStore(spark, str(tmp_path / "reporting"))
    uni = "鍵🧪‮fork‬"
    u64 = 0xFFFFFFFFFFFFFFFF

    def agent(name, ts=1, org="test_org"):
        return dict(
            fx.make_agent(), public_key=uni, name=name, timestamp=ts, organization_id=org
        )

    def apply(dl, i):
        store.apply(transform_events(fx.events_df(spark, [dl])), batch_id=i)

    apply(fx.delivery(1, "b1", [fx.state_change("agent", uni, [agent("v1", ts=u64)])]), 0)
    apply(fx.delivery(2, "b2", [fx.state_change("agent", uni, [agent("v2", org="")])]), 1)
    apply(fx.delivery(3, "b3", [fx.state_change("agent", uni, [agent("v3")])]), 2)
    # fork at height 2: different id, different hostile content
    apply(fx.delivery(2, "b2f", [fx.state_change("agent", uni, [agent("грозный", ts=u64)])]), 3)

    got = sorted(
        (r["public_key"], r["name"], r["organization_id"], r["timestamp"],
         r["start_block_num"], r["end_block_num"])
        for r in store.read("agents").collect()
    )
    # v1's re-opened-then-re-closed version keeps its hostile payload
    # (u64 -> -1) exactly; the fork's replacement is current
    assert got == sorted(
        [
            (uni, "v1", "test_org", -1, 1, 2),
            (uni, "грозный", "test_org", -1, 2, MAX_BLOCK_NUM),
        ]
    )
    blocks = {r["block_num"]: r["block_id"] for r in store.blocks().collect()}
    assert blocks == {1: "b1", 2: "b2f"}
