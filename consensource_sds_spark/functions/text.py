"""Text-analysis column builders for large-scale corpus pipelines.

All JVM-side (built-in functions + higher-order lambdas) — no Python UDFs in
the hot path, so these run inside whole-stage codegen and scale with the
scan. Token model: whitespace-delimited lowercase words (the engine's
documents are pre-normalized; :func:`fingerprint` shows the normalization).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language function-word sets for the n-gram/stopword language-ID
#: heuristic; deterministic and intentionally minimal (no external models).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "fr": ("le", "la", "les", "et", "un", "une"),
    "es": ("el", "los", "y", "en", "un", "una"),
    "de": ("der", "die", "das", "und", "ein", "zu"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Raw single-space split — deliberately NO lowercasing and NO
    whitespace normalization: this is the cheapest JVM-side tokenizer,
    and every consumer's DuckDB oracle applies the IDENTICAL split, so
    the cross-engine contract is exact. Operators whose semantics need
    case-folded or whitespace-collapsed tokens normalize EXPLICITLY on
    both sides first (e.g. x28's lower() before splitting); feeding
    un-normalized text to case-sensitive consumers (stopword counts,
    lang_id) undercounts by design — the registry documents each
    operator's normalization posture rather than hiding one here."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def shingles(text: Column, n: int = 2) -> Column:
    """Word n-gram shingles.

    Implemented as zip_with over shifted slices rather than
    transform(sequence, i -> element_at(toks, i)...): a lambda that
    references the token array k times re-evaluates the split() per element
    (O(len^2) per document — measured 7x slower); slices evaluate it O(n)
    times total."""
    toks = tokens(text)
    size = F.size(toks)
    if n == 2:
        return F.zip_with(
            F.slice(toks, 1, size - 1), F.slice(toks, 2, size - 1), lambda a, b: F.concat_ws(" ", a, b)
        )
    # clamp: docs shorter than n tokens have zero n-shingles (slice raises on
    # negative length; DuckDB's range() equivalent returns empty)
    width = F.greatest(size - (n - 1), F.lit(0))
    out = F.slice(toks, 1, width)
    for k in range(1, n):
        out = F.zip_with(out, F.slice(toks, 1 + k, width), lambda a, b: F.concat_ws(" ", a, b))
    return out


def stopword_count(text: Column, words: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words))).cast("long")


def unique_token_ratio(text: Column) -> Column:
    toks = tokens(text)
    return F.size(F.array_distinct(toks)) / F.size(toks)


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    return F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / F.size(toks)


def quality_score(text: Column) -> Column:
    """Composite heuristic quality in [0,1]: favors mid-length docs with
    diverse vocabulary and a sane stopword rate (the usual pretraining-corpus
    filter features: length / stopword ratio / repetition).

    The stopword term multiplies BEFORE dividing ((s*5)/n, matching the
    oracle's 5.0*s/n): (s/n)*5 differs in the last ulp for some s/n, and a
    doc landing adjacent to a .00005 rounding boundary would then hash
    differently across engines."""
    n = token_count(text)
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_count(text) * 5 / n, F.lit(1.0))
    return F.round((length_term + unique_token_ratio(text) + stop_term) / 3, 4)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Stopword-hit argmax with fixed precedence en > fr > es > de
    (deterministic ties); NULL text -> NULL (without the guard, NULL scores
    fail every comparison and fall through to the otherwise branch,
    deterministically mislabeling malformed rows as 'de')."""
    s = lang_scores(text)
    ranked = (
        F.when((s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] >= s["de"]), "en")
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["de"]), "fr")
        .when(s["es"] >= s["de"], "es")
        .otherwise("de")
    )
    return F.when(text.isNotNull(), ranked)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-collapsed lowercase text.

    The whitespace class is spelled explicitly: Java's ``\\s`` includes
    vertical tab (\\x0B), RE2's (DuckDB oracle) does not — the shared
    subset keeps fingerprints engine-identical on un-normalized text."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, "[ \t\n\f\r]+", " "))))
