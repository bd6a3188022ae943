"""IdSet two-phase subquery — the reference's IN_SUBQUERY protocol.

The broker executes the inner query, serializes its ID_SET(...) result
to a base64 literal, and rewrites the outer filter to
IN_ID_SET(col, '<base64>')
(pinot-broker/.../BaseBrokerRequestHandler.java:783-820 handleSubquery;
pinot-core/.../transform/function/InIdSetTransformFunction.java).

Spark-first: a plain LEFT SEMI JOIN is the better plan when both sides
live in one engine (Catalyst pushes it down; `q_in_subquery` covers it).
This module reproduces the *protocol* itself for the cases it exists for —
shipping a computed set to a different query, session, or service:

  id_set(df, col)          driver-side inner-query execution -> base64
                           literal in the reference's ACTUAL IdSet wire
                           format (round-13, operators/idset_wire.py:
                           type tag + roaring / roaring64 / guava-bloom
                           payload, byte-identical to pinot-core's
                           IdSet.toBase64String) — a literal produced
                           here round-trips through a real reference
                           deployment and vice versa.
  in_id_set(col, literal)  membership predicate. Reference-wire literals
                           of exact types (EMPTY / ROARING_BITMAP /
                           ROARING_64) decode to an in-plan IN list, so
                           the filter stays JVM-side and pushes into the
                           scan; BLOOM_FILTER literals probe through an
                           Arrow-native scalar UDF (approximate, like
                           the reference's BloomFilterIdSet.contains).
                           The pre-round-13 base64-JSON literals still
                           decode (legacy sniff: a JSON array's first
                           byte '[' can never be a valid type tag).

At scale: an IdSet is only shippable because it is small (the reference
bounds it the same way); for large inner results use the semi-join path.
"""

from __future__ import annotations

import base64
import json

import pyarrow as pa  # Arrow scalar-UDF batches (round-15)
from pyspark.sql import Column, DataFrame, functions as F


DEFAULT_MAX_IDS = 1_000_000  # the reference bounds IdSets the same way
                             # (bitmap/bloom structures with size limits)


class IdSetTooLargeError(ValueError):
    """Inner-query result exceeds the shippable-IdSet bound. Use the
    semi-join formulation (q_in_subquery) instead — it never collects."""


def id_set(
    df: DataFrame,
    col: str,
    max_ids: int = DEFAULT_MAX_IDS,
    size_threshold_in_bytes: int | None = None,
    expected_insertions: int | None = None,
    fpp: float | None = None,
) -> str:
    """Execute the inner query: distinct values of `col`, serialized as
    the reference's base64 IdSet wire literal (IdSets.create semantics:
    int -> RoaringBitmapIdSet, long -> Roaring64NavigableMapIdSet,
    float/double/string/binary -> BloomFilterIdSet).

    Guarded: collects at most max_ids+1 distinct values and raises
    IdSetTooLargeError past the bound instead of pulling an unbounded
    result onto the driver."""
    from hurricanedb_spark.operators.idset_wire import (
        DEFAULT_EXPECTED_INSERTIONS,
        DEFAULT_FPP,
        DEFAULT_SIZE_THRESHOLD,
        encode_idset,
        spark_type_to_pinot,
    )

    sel = df.select(col)
    data_type = spark_type_to_pinot(sel.schema.fields[0].dataType.simpleString())
    if not data_type:
        raise ValueError(
            f"id_set: unsupported column type "
            f"{sel.schema.fields[0].dataType.simpleString()!r}"
        )
    rows = sel.distinct().limit(max_ids + 1).collect()
    if len(rows) > max_ids:
        raise IdSetTooLargeError(
            f"inner query produced more than {max_ids} distinct ids; "
            "use the LEFT SEMI JOIN path for unbounded sets"
        )
    vals = [r[0] for r in rows if r[0] is not None]
    blob = encode_idset(
        vals,
        data_type,
        size_threshold_in_bytes=(
            DEFAULT_SIZE_THRESHOLD
            if size_threshold_in_bytes is None
            else size_threshold_in_bytes
        ),
        expected_insertions=(
            DEFAULT_EXPECTED_INSERTIONS
            if expected_insertions is None
            else expected_insertions
        ),
        fpp=DEFAULT_FPP if fpp is None else fpp,
    )
    return base64.b64encode(blob).decode()


def _decode_literal(idset_literal: str):
    """base64 literal -> ('json', values) | ('idset', PinotIdSet)."""
    from hurricanedb_spark.operators.idset_wire import decode_idset

    raw = base64.b64decode(idset_literal)
    if raw[:1] in (b"[", b" ", b"\t"):  # legacy base64-JSON array
        return "json", json.loads(raw.decode())
    return "idset", decode_idset(raw)


def in_id_set(col: Column, idset_literal: str) -> Column:
    """IN_ID_SET(col, '<base64>'): membership in a serialized IdSet.
    Exact forms decode at plan build into a JVM-side IN-list constant
    (Catalyst folds and pushes it toward the scan); bloom forms probe
    through an Arrow scalar UDF (the reference's approximate semantics
    for FLOAT/DOUBLE/STRING/BYTES sets, BloomFilterIdSet.java)."""
    kind, payload = _decode_literal(idset_literal)
    if kind == "json":
        return col.isin(payload)
    idset = payload
    if idset.exact:
        from hurricanedb_spark.operators.idset_wire import TYPE_ROARING64

        vals = idset.values()
        if len(vals) == 0:
            return F.lit(False)
        if len(vals) <= 1000:
            # small exact set: in-plan IN list, scan-pushable
            if idset.type_id == TYPE_ROARING64:
                vals = [
                    int(v) - (1 << 64) if v >= 1 << 63 else int(v)
                    for v in vals
                ]
            else:
                vals = [
                    int(v) - (1 << 32) if v >= 1 << 31 else int(v)
                    for v in vals
                ]
            return col.isin(vals)
        # large exact set (round-13, found at sf1: a 450k-value isin
        # literal list inflates plan construction and ships ~20MB task
        # binaries): probe through the cached-decode vectorized UDF

    blob_b64 = idset_literal

    # ARROW scalar UDF (round-15): the batch carries the true column
    # type (int64 + validity bitmap), so exact LONG probes never
    # degrade to float64 — sets past 2^53 and LONG-funnel blooms need
    # no CAST-AS-STRING channel on this path (probe_arrow keeps the
    # FLOAT/DOUBLE raw-bits and STRING funnel routes of probe_series)
    def _probe_fn(s: pa.Array) -> pa.Array:
        from hurricanedb_spark.operators.idset_wire import probe_arrow

        return probe_arrow(s, blob_b64)

    return F.arrow_udf(_probe_fn, "boolean")(col)
