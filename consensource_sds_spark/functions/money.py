"""Money expressions — the engine's one rounding contract for ``value``
columns.

Doubles cannot accumulate money: partial-aggregation order changes the
last ULPs, which flips cross-engine hashes and near-tie ranks. Every
surface that totals ``value`` therefore folds it to LONG CENTS first —
``cast(round(value * 100) AS bigint)``, SQL ``round`` = HALF_UP over the
double's shortest decimal representation — sums exactly in integers, and
divides back once at the end. These helpers are that contract in one
place; the DuckDB oracle SQL spells the same expression textually, and
the Python-side streaming sessionizer mirrors it with
``decimal.ROUND_HALF_UP`` (``streaming/sessions.py::_cents``, pinned
differentially by ``tests/test_sessions.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_cents(value: Column) -> Column:
    """``value`` (double) as exact integer cents, SQL-round (HALF_UP)."""
    return F.round(value * 100).cast("bigint")


def cents_total(value: Column, scale: int = 2) -> Column:
    """Exact money total of a double ``value`` column: sum in integer
    cents, convert back to a display double once."""
    return F.round(F.sum(to_cents(value)) / 100.0, scale)
