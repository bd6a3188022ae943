"""AND-composition of segment index access paths.

The reference composes index-backed filter operators under AND by
intersecting their docId bitmaps before any forward-index read
(pinot-core/.../operator/filter/FilterOperatorUtils.java:183-220,
getAndFilterOperator: child filter operators are sorted by selectivity
and their bitmaps intersected; non-index children become one shared
scan-based residual). Here each accelerable conjunct contributes a
per-segment docId bound:

  None          -> that conjunct cannot bound this segment (no index,
                   unsupported shape) — contributes nothing
  empty array   -> the segment is pruned entirely
  docId array   -> a (possibly superset) bound; intersected

and the composition ships ONE intersected roaring allowlist per
surviving segment into its decode task, with the exact residual
conjunction ALWAYS re-applied — so indexes can only remove work, never
change results, exactly like the single-index paths.
"""

from __future__ import annotations


def read_segments_multi_index(
    spark,
    segment_dirs: list[str],
    plan_fns: list,
    residual_sql: str,
    columns: list[str] | None,
    predicate_columns: list[str],
):
    """Distributed scan bounded by the intersection of several index
    access paths. `plan_fns` are callables (segment_dir) -> docId bound
    per the contract above (json_match_segment_docs /
    text_match_segment_docs / geo_radius_segment_docs). Planning is
    O(#segments x #conjuncts) threaded driver-side metadata reads —
    the same cost class as the reference broker's routing + per-segment
    filter planning; per-segment allowlists travel with the decode
    task, never through a shuffle."""
    import numpy as np
    from pyspark.sql import functions as F

    from hurricanedb_spark.sources import pinot_segment as ps

    def plan_for(s):
        docs = None
        for fn in plan_fns:
            d = fn(s)
            if d is None:
                continue
            d = np.asarray(d, dtype=np.uint32)
            docs = d if docs is None else np.intersect1d(docs, d)
            if len(docs) == 0:
                return None  # some conjunct proves the segment empty
        return (s, None if docs is None else ps.roaring_serialize(docs))

    plans = [
        p for p in ps.parallel_segment_map(plan_for, segment_dirs) if p is not None
    ]
    return ps.read_segments_allowlist(
        spark,
        plans,
        columns,
        segment_dirs,
        F.expr(residual_sql),
        predicate_columns=predicate_columns,
    )
