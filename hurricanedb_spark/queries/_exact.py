"""Cross-engine-deterministic arithmetic helpers.

The driver's correctness gate hashes result values, so Spark and the DuckDB
oracle must produce bit-identical numbers. Floating-point SUM/AVG are
order-dependent; both engines parallelize, so `sum(double)` is not
reproducible. The fix: route money/quantity aggregates through exact
decimal arithmetic (associative, order-independent), then cast the final
result to DOUBLE the same way on both sides.

Spark side:   F.sum(col.cast(DECIMAL)).cast("double")
Oracle side:  CAST(SUM(CAST(col AS DECIMAL(12,4))) AS DOUBLE)

Precision budget: money/quantity columns cast to DECIMAL(12,4) (values
< 10^8, 2 stored decimals), fractional columns (discount/tax, < 10) to
DECIMAL(8,4). Products like price*(1-disc)*(1+tax) then peak at
decimal(32,12) — under both engines' 38-digit cap, so no precision-loss
rounding is ever triggered and results are exact on both sides. Wider
casts (e.g. 18,4) would overflow 38 digits on a three-way product and
silently round differently per engine.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(12,4)"  # money/quantity columns (exact, product-safe)
FRAC = "decimal(8,4)"  # fractional columns: discount, tax


def dcol(name: str) -> Column:
    """Money/quantity column cast to exact decimal."""
    return F.col(name).cast(DEC)


def fcol(name: str) -> Column:
    """Fractional (discount/tax-like) column cast to narrow exact decimal."""
    return F.col(name).cast(FRAC)


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent SUM over a money-ish double column -> DOUBLE.

    The sum is first cast down to DECIMAL(30,scale) — lossless because the
    data carries at most `scale` true fractional digits — so the scaled
    integer stays < 2^53 and the final double cast rounds once. (DuckDB
    casts wide decimals to double through int128 with TWO roundings; this
    keeps both engines on the single-rounding path.)"""
    c = dcol(col) if isinstance(col, str) else col
    return F.sum(c).cast(f"decimal(30,{scale})").cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Deterministic AVG: exact decimal sum, then one double division."""
    c = dcol(col) if isinstance(col, str) else col
    return (
        F.sum(c).cast(f"decimal(30,{scale})").cast("double") / F.count(c)
    ).alias(alias)


# --- oracle-side (DuckDB SQL) fragments -------------------------------------


def o_dcol(name: str) -> str:
    return f"CAST({name} AS DECIMAL(12,4))"


def o_fcol(name: str) -> str:
    return f"CAST({name} AS DECIMAL(8,4))"


def o_dsum(expr: str, alias: str, scale: int = 4) -> str:
    return f"CAST(CAST(SUM({expr}) AS DECIMAL(30,{scale})) AS DOUBLE) AS {alias}"


def o_davg(expr: str, alias: str, scale: int = 4) -> str:
    return (
        f"(CAST(CAST(SUM({expr}) AS DECIMAL(30,{scale})) AS DOUBLE)"
        f" / COUNT({expr})) AS {alias}"
    )
