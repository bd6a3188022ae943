"""IdSet two-phase subquery — the reference's IN_SUBQUERY protocol.

The broker executes the inner query, serializes its ID_SET(...) result
(bitmap/bloom) to a base64 literal, and rewrites the outer filter to
IN_ID_SET(col, '<base64>')
(pinot-broker/.../BaseBrokerRequestHandler.java:783-820 handleSubquery;
pinot-core/.../transform/function/InIdSetTransformFunction.java).

Spark-first: a plain LEFT SEMI JOIN is the better plan when both sides
live in one engine (Catalyst pushes it down; `q_in_subquery` covers it).
This module reproduces the *protocol* itself for the cases it exists for —
shipping a computed set to a different query, session, or service:

  id_set(df, col)          driver-side inner-query execution -> portable
                           base64 literal (sorted distinct values, JSON)
  in_id_set(col, literal)  membership predicate; the literal decodes to an
                           in-plan array constant, so the filter stays
                           JVM-side and pushes into the scan as an IN list.

At scale: an IdSet is only shippable because it is small (the reference
bounds it the same way); for large inner results use the semi-join path.
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import Column, DataFrame, functions as F


DEFAULT_MAX_IDS = 1_000_000  # the reference bounds IdSets the same way
                             # (bitmap/bloom structures with size limits)


class IdSetTooLargeError(ValueError):
    """Inner-query result exceeds the shippable-IdSet bound. Use the
    semi-join formulation (q_in_subquery) instead — it never collects."""


def id_set(df: DataFrame, col: str, max_ids: int = DEFAULT_MAX_IDS) -> str:
    """Execute the inner query: distinct values of `col`, serialized as a
    base64 JSON array literal (sorted for determinism).

    Guarded: collects at most max_ids+1 distinct values and raises
    IdSetTooLargeError past the bound instead of pulling an unbounded
    result onto the driver."""
    rows = df.select(col).distinct().limit(max_ids + 1).collect()
    if len(rows) > max_ids:
        raise IdSetTooLargeError(
            f"inner query produced more than {max_ids} distinct ids; "
            "use the LEFT SEMI JOIN path for unbounded sets"
        )
    vals = sorted(r[0] for r in rows if r[0] is not None)
    return base64.b64encode(json.dumps(vals).encode()).decode()


def in_id_set(col: Column, idset_literal: str) -> Column:
    """IN_ID_SET(col, '<base64>'): membership in a serialized IdSet. The
    literal is decoded at plan build; the comparison is a JVM-side
    array_contains against a constant array (Catalyst folds it to an IN
    list and pushes it toward the scan)."""
    vals = json.loads(base64.b64decode(idset_literal).decode())
    return col.isin(vals)
