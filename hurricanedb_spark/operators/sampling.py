"""Deterministic sampling / dataset splitting for training-data pipelines.

Beyond the reference's surface (SURVEY.md training-data operators): a
large-scale corpus pipeline needs reproducible train/val/test assignment
and per-stratum subsampling that (a) is a pure function of a stable key —
independent of partitioning, row order, cluster size, or re-runs — and
(b) executes as a narrow per-row map (no shuffle, no RNG state).

Both properties come from hashing the key with md5 (bit-identical in
every engine, so the DuckDB oracle reproduces assignments exactly) and
bucketing the first two hex digits into [0, 256). Spark's own
`df.sample`/`randomSplit` are partition-order-sensitive and re-run
unstable, which is why they are not used here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX = "0123456789abcdef"
N_BUCKETS = 256


def md5_bucket(key: Column) -> Column:
    """Uniform bucket in [0, 256) from the first two hex digits of
    md5(key-as-string). Pure built-ins (md5/substring/instr) — stays in
    whole-stage codegen and is reproducible across engines and runs."""
    h = F.md5(key.cast("string"))
    d1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return (d1 * 16 + d2).alias("bucket")


def hash_split(df: DataFrame, key_col: str, splits: dict[str, float], out_col: str = "split") -> DataFrame:
    """Assign each row to a named split by deterministic key hash.

    `splits` maps name -> fraction (must sum to ~1). Bucket thresholds are
    cumulative over insertion order, e.g. {"train": .8, "val": .1,
    "test": .1} -> buckets [0,205) / [205,230) / [230,256)
    (int(round(0.8*256)) == 205)."""
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = md5_bucket(F.col(key_col))
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = bucket < int(round(acc * N_BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, chosen purely by key hash: stable under
    re-runs, repartitioning, and incremental arrival (a row's fate never
    changes as the dataset grows — unlike df.sample)."""
    threshold = int(round(fraction * N_BUCKETS))
    return df.filter(md5_bucket(F.col(key_col)) < threshold)


def stratified_sample(df: DataFrame, key_col: str, fraction: float, strata: list[str]) -> DataFrame:
    """Per-stratum deterministic sample: salt the hash key with the
    stratum values so each stratum draws an independent ~fraction,
    still as a narrow shuffle-free map."""
    salted = F.concat_ws("\x1f", F.col(key_col).cast("string"), *[F.col(c).cast("string") for c in strata])
    threshold = int(round(fraction * N_BUCKETS))
    return df.filter(md5_bucket(salted) < threshold)
