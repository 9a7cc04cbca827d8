"""Hostile gate fixture: the same ten tables as the driver's testdata,
schema-identical and contract-respecting (unique PKs, valid FKs, the
generator's own enum domains) — but with every VALUE the TPC-H-ish
generator never emits.

The oracle gate at sf0.01 proves Spark == DuckDB on well-behaved data;
the r8 review sweep showed where that is blind — every defect it found
lived in an input domain the testdata lacks (zero-norm embeddings,
32k-token docs, u64 sentinels, pre-1970 dates). This module makes that
domain a FIXTURE, so the whole registry can be swept against both
engines on it (``scripts/verify_gate.py`` with ``SPARK_GRAFT_GATE_SF``
pointed here): any divergence is a real both-sides bug, a missing
NULL/empty guard, or an undocumented input contract.

Hostile axes, all inside the schema + referential contract:

- NULLs in every nullable NON-KEY column (group keys included — both
  engines group NULL together, but expressions over them differ fast);
- ties everywhere a window or top-k could be cut (identical totalprice,
  shipdate, quantity, acctbal, ts microseconds);
- strings: empty, whitespace-only, unicode (CJK/emoji/combining/RTL),
  embedded separators (comma, quote, newline, tab) that stress every
  string function AND the hash canonicalization path itself;
- doubles: -0.0, 1e12 money magnitudes, negative balances. Money stays
  EXACT 2-DECIMAL (the generator's own invariant at every SF — cents
  residue 0) and below ~5e13: above that, DuckDB's double->DECIMAL(s=10)
  cast (which scales by 10^10 IN DOUBLE first) diverges from Spark's
  shortest-string cast, so bigger values would flag the ORACLE RECIPE's
  engine bound, not a repo defect;
- timestamps: pre-1970 (negative epoch), the epoch second itself,
  far-future, duplicate-to-the-microsecond;
- documents: empty text, single char, whitespace-only, one giant token
  (no spaces), a single token repeated thousands of times, byte-exact
  duplicate pairs, near-duplicate pairs, unicode-only text, a ~40k-char
  doc; ``n_chars`` stays consistent with ``text`` (the generator's own
  invariant) including NULL text -> NULL n_chars;
- embeddings: the zero vector, byte-exact duplicates, near-duplicates,
  a 1e4-magnitude vector and a 1e-30 vector (well outside the gaussian
  testdata's range; component stats must accumulate order-free to stay
  engine-identical at these magnitudes), all-negative, and a constant
  vector.

Determinism: a fixed-seed ``random.Random`` fills the bulk rows, so a
failure on this fixture reproduces bit-for-bit.
"""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH = datetime.datetime(1970, 1, 1)


def _us(dt: datetime.datetime) -> datetime.datetime:
    return dt


def _ts(y, m, d, h=0, mi=0, s=0, us=0) -> datetime.datetime:
    return datetime.datetime(y, m, d, h, mi, s, us)


_SEGMENTS = ["BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY", "AUTOMOBILE"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_STATUS = ["P", "O", "F"]
_RFLAG = ["R", "A", "N"]
_LSTATUS = ["O", "F"]
_ETYPES = ["view", "click", "signup", "purchase", "error"]
_LANGS = ["en", "de", "fr", "es", "zh"]
_PTYPES = ["LARGE", "STANDARD", "ECONOMY", "SMALL", "PROMO", "MEDIUM"]

#: strings no TPC-H generator emits — exercised through every string
#: function and through the gate's CSV canonicalization
_HOSTILE_NAMES = [
    "",
    " ",
    "  \t ",
    "名前テスト",
    "🧪 emoji name",
    "éèê combining é",
    "‮RTL‬",
    "comma, quote\" and 'single'",
    "line\nbreak",
    "tab\tsep",
    "UPPER lower MiXeD",
    "a" * 300,
]


def _doc_texts() -> list[str | None]:
    """Crafted doc bodies covering the text-operator edge domains."""
    return [
        None,  # NULL text (n_chars NULL too)
        "",  # empty
        "x",  # single char
        "   ",  # whitespace-only
        "\t\n \t",  # exotic whitespace
        "supercalifragilistic" * 400,  # one ~8k-char token, NO spaces
        ("tok " * 4000).strip(),  # one token repeated 4000x
        "the quick brown fox jumps over the lazy dog " * 900,  # ~40k chars
        "彼は急いで市場へ行った 彼は急いで市場へ行った",  # CJK, no ascii
        "🙂 🙃 🙂 🙃 emoji tokens only 🙂",
        "MiXeD CaSe ToKeNs MiXeD CaSe ToKeNs",
        "punctuation!!! ??? ;;; ,,, ... --- !!!",
        "dup twin alpha beta gamma delta epsilon zeta eta theta",
        "dup twin alpha beta gamma delta epsilon zeta eta theta",  # byte-exact dup
        "dup twin alpha beta gamma delta epsilon zeta eta thetb",  # near-dup (1 char)
        "numbers 123 456 789 0 -1 3.14 1e9 0x7f",
        'quotes "double" and \'single\' and `back`',
        "comma,separated,values,in,one,token and, spaced , commas",
        "Line one\nLine two\nLine three\n",
        "word " + "word " * 2 + "unique_tail_marker",
        # a 3-doc continuation CHAIN (x92): doc k's last 6 tokens = doc
        # k+1's first 6 — the one structure the driver's testdata never
        # contains, so x92's engine-vs-engine row is vacuous everywhere
        # but here (2 real pairs, including the chain's middle doc
        # playing both tail and head)
        "one two three alpha bravo charlie delta echo foxtrot",
        "alpha bravo charlie delta echo foxtrot middle words golf hotel india juliet kilo lima",
        "golf hotel india juliet kilo lima and the story concludes here",
    ]


def write_hostile_sf(out_dir: str, seed: int = 94) -> str:
    """Write the ten-table hostile fixture under ``out_dir`` (created);
    returns ``out_dir``. Row counts stay small (gate-sweep friendly):
    region 5 / nation 25 / customer 60 / supplier 10 / part 60 /
    orders 240 / lineitem 900 / events 300 / documents ~120 /
    embeddings ~120."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)

    def w(name: str, data: dict, schema: pa.Schema) -> None:
        pq.write_table(
            pa.Table.from_pydict(data, schema=schema),
            os.path.join(out_dir, f"{name}.parquet"),
        )

    # region / nation: tiny dims — hostile names, valid keys
    w(
        "region",
        {
            "r_regionkey": list(range(5)),
            "r_name": ["", " ASIA ", "EUROPE", "名前", "AMERICA,\"Q\""],
        },
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
    )
    w(
        "nation",
        {
            "n_nationkey": list(range(25)),
            "n_name": [
                _HOSTILE_NAMES[i % len(_HOSTILE_NAMES)] if i % 3 == 0 else f"NATION{i}"
                for i in range(25)
            ],
            "n_regionkey": [i % 5 for i in range(25)],
        },
        pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
    )

    # customer: NULL balances/segments, tied balances, -0.0, extremes
    n_cust = 60
    c_bal = []
    c_seg = []
    c_name = []
    for i in range(n_cust):
        if i % 11 == 0:
            c_bal.append(None)
        elif i % 7 == 0:
            c_bal.append(-0.0)
        elif i % 5 == 0:
            c_bal.append(1234.5)  # tie cluster
        elif i == 1:
            c_bal.append(1e12)
        elif i == 2:
            c_bal.append(-999999.99)
        elif i == 3:
            c_bal.append(0.01)
        else:
            c_bal.append(round(rng.uniform(-5000, 10000), 2))
        c_seg.append(None if i % 13 == 0 else _SEGMENTS[i % 5])
        c_name.append(_HOSTILE_NAMES[i % len(_HOSTILE_NAMES)] if i % 4 == 0 else f"Customer#{i:03d}")
    w(
        "customer",
        {
            "c_custkey": list(range(1, n_cust + 1)),
            "c_name": c_name,
            "c_nationkey": [i % 25 for i in range(n_cust)],
            "c_acctbal": c_bal,
            "c_mktsegment": c_seg,
        },
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )

    # supplier
    w(
        "supplier",
        {
            "s_suppkey": list(range(1, 11)),
            "s_name": [_HOSTILE_NAMES[i] if i < len(_HOSTILE_NAMES) else f"Supplier#{i}" for i in range(10)],
            "s_nationkey": [i % 25 for i in range(10)],
            "s_acctbal": [None, -0.0, 0.0, 1234.5, 1234.5, -1e9, 0.01, 42.42, 42.42, 7.0],
        },
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
    )

    # part: NULL sizes/prices, empty names, tied retail prices
    n_part = 60
    w(
        "part",
        {
            "p_partkey": list(range(1, n_part + 1)),
            "p_name": [
                _HOSTILE_NAMES[i % len(_HOSTILE_NAMES)] if i % 3 == 0 else f"part {i} green steel"
                for i in range(n_part)
            ],
            "p_brand": [f"Brand#{(i % 25) + 1}" for i in range(n_part)],
            "p_type": [None if i % 17 == 0 else _PTYPES[i % 6] for i in range(n_part)],
            "p_size": [None if i % 19 == 0 else (i % 50) for i in range(n_part)],
            "p_retailprice": [
                None if i % 23 == 0 else (99.99 if i % 4 == 0 else round(rng.uniform(1, 2000), 2))
                for i in range(n_part)
            ],
        },
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )

    # orders: pre-1970 dates, epoch boundary, ties, NULL price/date
    n_ord = 240
    o_date = []
    o_price = []
    for i in range(n_ord):
        if i == 0:
            o_date.append(_ts(1969, 12, 31, 23, 59, 59, 999999))  # negative epoch
        elif i == 1:
            o_date.append(_ts(1970, 1, 1))
        elif i == 2:
            o_date.append(_ts(2099, 12, 31))
        elif i % 9 == 0:
            o_date.append(None)
        elif i % 4 == 0:
            o_date.append(_ts(2024, 1, 15, 12, 0, 0))  # tie cluster
        else:
            o_date.append(_ts(2024, 1, 1) + datetime.timedelta(minutes=rng.randrange(0, 43200)))
        if i % 10 == 0:
            o_price.append(None)
        elif i % 6 == 0:
            o_price.append(5000.0)  # tie cluster
        elif i == 5:
            o_price.append(1e12)
        else:
            o_price.append(round(rng.uniform(100, 400000), 2))
    w(
        "orders",
        {
            "o_orderkey": list(range(1, n_ord + 1)),
            "o_custkey": [(i % n_cust) + 1 for i in range(n_ord)],
            "o_orderstatus": [_STATUS[i % 3] for i in range(n_ord)],
            "o_totalprice": o_price,
            "o_orderdate": o_date,
            "o_orderpriority": [None if i % 29 == 0 else _PRIORITIES[i % 5] for i in range(n_ord)],
        },
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    # lineitem: NULLs in every measure, 0/1 discount bounds, tied
    # quantities/dates, duplicate (orderkey, linenumber) NOT allowed —
    # linenumber unique within order
    n_li = 900
    rows: dict[str, list] = {k: [] for k in (
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    )}
    per_order: dict[int, int] = {}
    for i in range(n_li):
        ok = (i % n_ord) + 1
        per_order[ok] = per_order.get(ok, 0) + 1
        rows["l_orderkey"].append(ok)
        rows["l_partkey"].append((i % n_part) + 1)
        rows["l_suppkey"].append((i % 10) + 1)
        rows["l_linenumber"].append(per_order[ok])
        rows["l_quantity"].append(
            None if i % 31 == 0 else (25.0 if i % 5 == 0 else float(rng.randrange(1, 51)))
        )
        rows["l_extendedprice"].append(
            None if i % 37 == 0 else (1e12 if i == 7 else round(rng.uniform(900, 100000), 2))
        )
        rows["l_discount"].append(
            None if i % 41 == 0 else [0.0, 0.01, 0.05, 0.06, 0.07, 0.1, 1.0][i % 7]
        )
        rows["l_tax"].append(None if i % 43 == 0 else round(rng.uniform(0, 0.08), 2))
        rows["l_returnflag"].append(_RFLAG[i % 3])
        rows["l_linestatus"].append(_LSTATUS[i % 2])
        if i == 0:
            rows["l_shipdate"].append(_ts(1969, 6, 1))
        elif i % 13 == 0:
            rows["l_shipdate"].append(None)
        elif i % 3 == 0:
            rows["l_shipdate"].append(_ts(2024, 2, 1))  # tie cluster
        else:
            rows["l_shipdate"].append(
                _ts(2023, 6, 1) + datetime.timedelta(hours=rng.randrange(0, 9000))
            )
    w(
        "lineitem",
        rows,
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )

    # events: duplicate-microsecond ts, NULL ts/value/props, hostile JSON
    n_ev = 300
    ev_ts = []
    ev_val = []
    ev_props = []
    for i in range(n_ev):
        if i % 17 == 0:
            ev_ts.append(None)
        elif i % 5 == 0:
            ev_ts.append(_ts(2024, 1, 10, 10, 0, 0, 123456))  # exact tie
        elif i == 1:
            ev_ts.append(_ts(1969, 12, 31, 12, 0, 0))
        else:
            ev_ts.append(_ts(2024, 1, 1) + datetime.timedelta(seconds=rng.randrange(0, 2_500_000)))
        if i % 19 == 0:
            ev_val.append(None)
        elif i % 23 == 0:
            ev_val.append(-0.0)
        elif i == 4:
            ev_val.append(1e10)
        else:
            ev_val.append(round(rng.uniform(-100, 100), 2))
        ev_props.append(
            [
                None,
                "{}",
                '{"k": null}',
                '{"k": -1}',
                '{"k": 0, "extra": "x,y\\"z"}',
                '{"k": 999999999999}',
                f'{{"k": {i}}}',
            ][i % 7]
        )
    w(
        "events",
        {
            "event_id": list(range(1, n_ev + 1)),
            "ts": ev_ts,
            "user_id": [None if i % 39 == 0 else (i % 40) + 1 for i in range(n_ev)],
            "event_type": [None if i % 37 == 0 else _ETYPES[i % 5] for i in range(n_ev)],
            "value": ev_val,
            "props": ev_props,
        },
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )

    # documents: crafted edge bodies + seeded filler so per-lang/source
    # groups stay populated
    texts = _doc_texts()
    vocab = ["spark", "table", "merge", "window", "batch", "filter", "join", "the", "a", "data"]
    while len(texts) < 120:
        texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 60))))
    w(
        "documents",
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": [None if i % 41 == 0 else _LANGS[i % 5] for i in range(len(texts))],
            "source": [f"src{i % 8}" for i in range(len(texts))],
            "n_chars": [None if t is None else len(t) for t in texts],
        },
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )

    # embeddings: zero vector, exact dup pair, near-dup pair, float32
    # over/underflow magnitudes, constant vector; labels keep all 10 ids
    dim = 64
    vecs: list[list[float]] = []
    vecs.append([0.0] * dim)  # zero norm
    base = [round(rng.uniform(-1, 1), 4) for _ in range(dim)]
    vecs.append(base)
    vecs.append(list(base))  # byte-exact duplicate
    near = list(base)
    near[0] += 1e-4
    vecs.append(near)  # near-duplicate
    vecs.append([1e4] * dim)  # far outside the gaussian range
    vecs.append([1e-30] * dim)  # float32 underflow trap
    vecs.append([-1.0] * dim)  # constant negative
    vecs.append([0.5] * dim)  # constant positive
    # non-finite poison (the finite-vector admission rule's test bed):
    # NaN sorts above every real similarity in Spark's ordering, so an
    # unguarded top-k would hand these rows the top slots; a NaN centroid
    # would poison a whole k-means generation
    vecs.append([float("nan")] * dim)  # all-NaN
    vecs.append([float("inf")] * dim)  # all-Inf
    one_nan = [0.25] * dim
    one_nan[dim // 2] = float("nan")
    vecs.append(one_nan)  # single poisoned element
    one_ninf = [0.25] * dim
    one_ninf[0] = float("-inf")
    vecs.append(one_ninf)
    vecs.append(None)  # NULL vector
    one_null = [0.25] * dim
    one_null[3] = None  # type: ignore[call-overload]
    # NULL ELEMENT: the engine-parity trap — DuckDB's list_filter DROPS
    # elements whose predicate is NULL (so a bare isnan-OR-isinf filter
    # admits this row) while Spark's exists-under-three-valued-logic
    # rejects it; the oracle predicate needs an explicit x IS NULL arm
    vecs.append(one_null)
    # ragged widths (the job-abort class: ANSI division by size(empty),
    # element_at past a short vector, skewed centroid means)
    vecs.append([0.5] * (dim - 1))  # one short
    vecs.append([0.5] * (dim + 3))  # one long
    vecs.append([])  # empty
    while len(vecs) < 120:
        vecs.append([round(rng.gauss(0, 1), 4) for _ in range(dim)])
    w(
        "embeddings",
        {
            "vec_id": list(range(len(vecs))),
            "embedding": vecs,
            "label": [i % 10 for i in range(len(vecs))],
        },
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )
    return out_dir


def _pass_pad(rng: random.Random) -> str:
    """Quality-passing padding UNIQUE per call: >=24 distinct seeded
    tokens, so a padded doc clears every x43 gate (token count, uniq
    ratio) WITHOUT becoming a near-duplicate of every other padded doc —
    a shared literal tail here made the whole fixture one LSH cluster
    and the band lane correctly (but uselessly) dropped everything."""
    return " " + " ".join(f"pad{rng.randrange(10_000_000)}" for _ in range(24))


def delivery_document_batches(seed: int = 94) -> list[list[dict]]:
    """Hostile DELIVERY fixture for the corpus-ingest streaming lanes: a
    list of microbatches of DOC_SCHEMA rows (doc_id BIGINT, text, lang,
    source, n_chars) where the hostile axes live INSIDE quality-passing
    documents, so they reach the dedup joins and standing indexes instead
    of dying at the x43 gate:

    - byte-exact duplicate pairs WITHIN one batch and ACROSS batches
      (first-arrival-wins must hold in both geometries);
    - a near-duplicate pair (one token changed in a ~40-token doc) for
      the band/LSH lane, split across batches;
    - unicode (CJK/emoji/combining) and embedded separators (newline,
      quote, comma) inside passing English-tagged docs — they stress
      tokenization, hashing, and the parquet/CSV canonicalization;
    - rows for the quarantine lane: NULL text, NULL doc_id;
    - rows for each x43 reject arm (short, non-English, repetitive);
    - an EMPTY batch (heartbeat — must be a no-op, not a crash);
    - seeded passing filler so batches are never single-row.
    """
    rng = random.Random(seed)

    def filler(i: int) -> str:
        words = [f"w{rng.randrange(400)}" for _ in range(24)]
        return f"filler {i} " + " ".join(words) + _pass_pad(rng)

    dup = "duplicate twin body alpha beta gamma delta" + _pass_pad(rng)
    xdup = "cross batch duplicate body epsilon zeta eta" + _pass_pad(rng)
    near_a = "near duplicate body one theta iota kappa lambda" + _pass_pad(rng)
    near_b = near_a.replace("kappa", "kappax")  # one token differs
    uni = "unicode 名前テスト 🧪 éèê ‮RTL‬ tokens inside english doc" + _pass_pad(rng)
    seps = 'separators "quoted, token"\nnewline\ttab token' + _pass_pad(rng)

    def row(doc_id, text, lang="en", source="src0"):
        return {
            "doc_id": doc_id,
            "text": text,
            "lang": lang,
            "source": source,
            "n_chars": None if text is None else len(text),
        }

    b0 = [
        row(1, dup),
        row(2, dup),  # within-batch byte dup (1 wins: lower doc_id)
        row(3, xdup),
        row(4, near_a),
        row(5, uni),
        row(6, None),  # quarantine: NULL text
        row(None, "null doc id row" + _pass_pad(rng)),  # quarantine: NULL key
        row(7, "too short"),  # x43 too_short
        row(8, filler(8)),
        row(9, filler(9)),
    ]
    b1: list[dict] = []  # EMPTY batch: the heartbeat delivery
    b2 = [
        row(10, xdup),  # cross-batch byte dup of 3 — must lose
        row(11, near_b),  # near-dup of 4 — the band lane's target
        row(12, "nicht englisch aber lang genug " * 10, lang="de"),  # non_english
        row(13, ("loop " * 80).strip()),  # too_repetitive
        row(14, seps),
        row(15, filler(15)),
    ]
    b3 = [
        row(16, dup),  # dup of batch-0 doc across TWO batches
        row(17, filler(17)),
        row(18, filler(18)),
    ]
    return [b0, b1, b2, b3]


__all__ = ["write_hostile_sf", "delivery_document_batches"]
