"""Star-tree v2 binary store (sources/startree_v2.py): layout goldens
pinned to the reference constants (magic 0xBADDA55B00DAD00D, 28-byte
nodes, header shape — StarTreeBuilderUtils.java / OffHeapStarTree.java)
and query-equivalence against direct aggregation."""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
import pytest

from hurricanedb_spark.sources import pinot_segment as ps
from hurricanedb_spark.sources import startree_v2 as st


def _dataset(n=4000, seed=6):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "country": rng.choice(["US", "DE", "IN", "BR"], n),
            "browser": rng.choice(["chrome", "safari", "edge"], n),
            "device": rng.choice(["mobile", "desktop"], n),
            "clicks": rng.integers(0, 100, n).astype(np.int64),
            "latency": rng.random(n) * 50,
        }
    )


SPEC = st.StarTreeSpec(
    split_order=["country", "browser", "device"],
    function_column_pairs=[
        "count__*", "sum__clicks", "min__clicks", "max__latency",
    ],
    max_leaf_records=2,
)


def _segment_with_tree(tmp_path, pdf, specs=None):
    seg = str(tmp_path / "seg")
    ps.write_segment_pandas(pdf, seg)
    st.write_star_trees(seg, pdf, specs or [SPEC])
    return seg


def test_tree_binary_layout_goldens(tmp_path):
    seg = _segment_with_tree(tmp_path, _dataset(500))
    d = os.path.join(seg, "v3")
    assert os.path.isfile(os.path.join(d, "star_tree_index"))
    assert os.path.isfile(os.path.join(d, "star_tree_index_map"))
    with open(os.path.join(d, "star_tree_index_map"), encoding="utf-8") as f:
        imap = f.read()
    # StarTreeIndexMapUtils key format, tree buffer first at offset 0
    assert "0.null.STAR_TREE.OFFSET = 0" in imap
    assert "0.country.FORWARD_INDEX.OFFSET" in imap
    assert "0.sum__clicks.FORWARD_INDEX.OFFSET" in imap
    with open(os.path.join(d, "star_tree_index"), "rb") as f:
        blob = f.read()
    # little-endian magic + version, header size, numDims
    (magic,) = struct.unpack_from("<q", blob, 0)
    assert magic & ((1 << 64) - 1) == 0xBADDA55B00DAD00D
    version, header_size, num_dims = struct.unpack_from("<iii", blob, 8)
    assert (version, num_dims) == (1, 3)
    tree = st.deserialize_tree(blob[: len(blob)])
    assert tree.dims == ["country", "browser", "device"]
    # root node: dimensionId/value ALL, covers the base records
    root = tree.nodes[0]
    assert root[0] == -1 and root[1] == -1 and root[2] == 0
    # metadata keys per StarTreeV2Constants.MetadataKey
    meta = ps.read_segment_metadata(seg)
    assert meta.props["startree.v2.count"] == ["1"]
    assert meta.props["startree.v2.0.split.order"] == ["country,browser,device"]
    assert "count__*" in meta.props["startree.v2.0.function.column.pairs"][0]


def test_node_ranges_tile_and_children_sorted(tmp_path):
    seg = _segment_with_tree(tmp_path, _dataset(1000))
    tree, records, spec = st.load_star_tree(seg)
    for i, (dim_id, dim_val, start, end, agg_doc, first, last) in enumerate(
        tree.nodes
    ):
        assert 0 <= start <= end <= len(records)
        assert 0 <= agg_doc < len(records)
        if first != -1:
            kids = [tree.nodes[c] for c in range(first, last + 1)]
            vals = [k[1] for k in kids]
            assert vals == sorted(vals)  # ALL=-1 first
            non_star = [k for k in kids if k[1] != -1]
            # value children tile the parent's record range
            assert non_star[0][2] == start
            assert non_star[-1][3] == end
            for a, b in zip(non_star, non_star[1:]):
                assert a[3] == b[2]


@pytest.mark.parametrize(
    "group_by",
    [["country"], ["country", "browser"], ["country", "browser", "device"], ["browser"]],
)
def test_query_equivalence_group_by(tmp_path, group_by):
    pdf = _dataset()
    seg = _segment_with_tree(tmp_path, pdf)
    metrics = ["count__*", "sum__clicks", "min__clicks", "max__latency"]
    got = st.star_tree_aggregate(seg, group_by, metrics)
    # decode dictIds back to values for comparison
    for d in group_by:
        lut = np.sort(pdf[d].unique())
        got[d] = got[d].map(lambda i: lut[i])
    exp = (
        pdf.assign(**{"count__*": 1})
        .groupby(group_by, as_index=False)
        .agg(
            **{
                "count__*": ("count__*", "sum"),
                "sum__clicks": ("clicks", "sum"),
                "min__clicks": ("clicks", "min"),
                "max__latency": ("latency", "max"),
            }
        )
    )
    got = got.sort_values(group_by).reset_index(drop=True)
    exp = exp.sort_values(group_by).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[exp.columns].astype(exp.dtypes.to_dict()), exp, check_dtype=False,
        atol=1e-9,
    )


def test_query_equivalence_with_filter(tmp_path):
    pdf = _dataset()
    seg = _segment_with_tree(tmp_path, pdf)
    got = st.star_tree_aggregate(
        seg, ["browser"], ["count__*", "sum__clicks"], where=("country", "=", "DE")
    )
    lut = np.sort(pdf["browser"].unique())
    got["browser"] = got["browser"].map(lambda i: lut[i])
    sub = pdf[pdf["country"] == "DE"]
    exp = (
        sub.assign(one=1)
        .groupby("browser", as_index=False)
        .agg(**{"count__*": ("one", "sum"), "sum__clicks": ("clicks", "sum")})
    )
    got = got.sort_values("browser").reset_index(drop=True)
    exp = exp.sort_values("browser").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    # absent filter value -> empty result
    empty = st.star_tree_aggregate(
        seg, ["browser"], ["count__*"], where=("country", "=", "XX")
    )
    assert len(empty) == 0


def test_global_aggregate_uses_star_path(tmp_path):
    pdf = _dataset()
    seg = _segment_with_tree(tmp_path, pdf)
    got = st.star_tree_aggregate(seg, [], ["count__*", "sum__clicks"])
    assert int(got["count__*"].iloc[0]) == len(pdf)
    assert int(got["sum__clicks"].iloc[0]) == int(pdf["clicks"].sum())


def test_star_records_fraction_bounded(tmp_path):
    # the star-tree's whole point: pre-aggregated records stay a small
    # multiple of the distinct-combination count
    pdf = _dataset(8000)
    seg = _segment_with_tree(tmp_path, pdf)
    _tree, records, _spec = st.load_star_tree(seg)
    base = len(pdf.groupby(["country", "browser", "device"]))
    assert base <= len(records) <= 10 * base


def test_multiple_trees_per_segment(tmp_path):
    pdf = _dataset(1500)
    seg = str(tmp_path / "seg2")
    ps.write_segment_pandas(pdf, seg)
    spec2 = st.StarTreeSpec(
        split_order=["device", "country"],
        function_column_pairs=["count__*", "sum__clicks"],
        max_leaf_records=4,
    )
    st.write_star_trees(seg, pdf, [SPEC, spec2])
    meta = ps.read_segment_metadata(seg)
    assert meta.props["startree.v2.count"] == ["2"]
    tree1, _r1, s1 = st.load_star_tree(seg, 0)
    tree2, _r2, s2 = st.load_star_tree(seg, 1)
    assert tree1.dims == SPEC.split_order
    assert tree2.dims == spec2.split_order
    got = st.star_tree_aggregate(seg, ["device"], ["sum__clicks"], tree_id=1)
    lut = np.sort(pdf["device"].unique())
    got["device"] = got["device"].map(lambda i: lut[i])
    exp = pdf.groupby("device", as_index=False).agg(sum__clicks=("clicks", "sum"))
    got = got.sort_values("device").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["device", "sum__clicks"]], exp.rename(columns={}), check_dtype=False
    )


def test_skip_star_node_creation(tmp_path):
    pdf = _dataset(800)
    seg = str(tmp_path / "seg3")
    ps.write_segment_pandas(pdf, seg)
    spec = st.StarTreeSpec(
        split_order=["country", "browser"],
        function_column_pairs=["count__*"],
        max_leaf_records=1,
        skip_star_for=("country",),
    )
    st.write_star_trees(seg, pdf, [spec])
    tree, records, loaded_spec = st.load_star_tree(seg)
    assert loaded_spec.skip_star_for == ("country",)
    # root's children (splitting country) must have no star child
    first, last = tree.nodes[0][5], tree.nodes[0][6]
    assert all(tree.nodes[c][1] != -1 for c in range(first, last + 1))
    # queries still correct: country group (no star path needed)
    got = st.star_tree_aggregate(seg, ["country"], ["count__*"])
    assert int(got["count__*"].sum()) == len(pdf)


def test_in_filter(tmp_path):
    pdf = _dataset()
    seg = _segment_with_tree(tmp_path, pdf)
    got = st.star_tree_aggregate(
        seg, ["browser"], ["count__*"], where=("country", "in", ["DE", "IN"])
    )
    lut = np.sort(pdf["browser"].unique())
    got["browser"] = got["browser"].map(lambda i: lut[i])
    sub = pdf[pdf["country"].isin(["DE", "IN"])]
    exp = sub.assign(one=1).groupby("browser", as_index=False).agg(
        **{"count__*": ("one", "sum")}
    )
    got = got.sort_values("browser").reset_index(drop=True)
    exp = exp.sort_values("browser").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_theta_sketch_function_column_pair(tmp_path):
    """distinctCountThetaSketch as a star-tree function-column pair
    (DistinctCountThetaSketchStarTreeV2Test analog): tree records carry
    SERIALIZED DataSketches compact sketches, traversal unions them, and
    every estimate equals the exact per-group ndv (below nominalEntries
    the sketch is exact by construction)."""
    import numpy as np
    import pandas as pd

    from hurricanedb_spark.operators.theta_ds import deserialize
    from hurricanedb_spark.sources import pinot_segment as ps
    from hurricanedb_spark.sources import startree_v2 as st

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "city": rng.choice(["a", "b", "c"], 500),
            "status": rng.choice(["X", "Y"], 500),
            "user": rng.integers(0, 80, 500).astype(np.int64),
        }
    )
    seg = str(tmp_path / "seg_theta")
    ps.write_segment_pandas(pdf, seg)
    spec = st.StarTreeSpec(
        split_order=["city", "status"],
        function_column_pairs=["count__*", "distinctcountthetasketch__user"],
        max_leaf_records=2,
    )
    st.write_star_trees(seg, pdf, [spec])

    tid = st.fitting_tree_id(
        seg, ["city"], ["count__*"], []
    )
    assert tid == 0  # numeric pairs on a theta-carrying tree still fit

    # group by city: sketch estimates == exact distinct users
    out = st.star_tree_aggregate(
        seg, ["city"], ["count__*", "distinctcountthetasketch__user"]
    )
    lut = st._segment_dictionary(seg, "city")
    got = {
        lut[int(r["city"])]: round(
            deserialize(bytes(r["distinctcountthetasketch__user"])).estimate()
        )
        for _, r in out.iterrows()
    }
    want = pdf.groupby("city")["user"].nunique().to_dict()
    assert got == want

    # global (star path both dims)
    g = st.star_tree_aggregate(seg, [], ["distinctcountthetasketch__user"])
    est = deserialize(
        bytes(g["distinctcountthetasketch__user"].iloc[0])
    ).estimate()
    assert round(est) == pdf["user"].nunique()

    # filtered: status = 'Y'
    f = st.star_tree_aggregate(
        seg, ["city"], ["distinctcountthetasketch__user"],
        where=("status", "=", "Y"),
    )
    got_f = {
        lut[int(r["city"])]: round(
            deserialize(bytes(r["distinctcountthetasketch__user"])).estimate()
        )
        for _, r in f.iterrows()
    }
    sub = pdf[pdf["status"] == "Y"]
    assert got_f == sub.groupby("city")["user"].nunique().to_dict()


def test_theta_pair_over_preaggregated_sketch_column(tmp_path):
    """PreAggregated* pattern: building a theta pair over a column that
    ALREADY holds serialized sketches unions their hash sets (BYTES
    type-dispatch), never hashes the blobs."""
    import numpy as np
    import pandas as pd

    from hurricanedb_spark.operators.theta_ds import (
        build_sketch,
        deserialize,
        serialize,
    )
    from hurricanedb_spark.sources import pinot_segment as ps
    from hurricanedb_spark.sources import startree_v2 as st

    # two rows per dim value carrying overlapping pre-built sketches
    pops = {"a": [range(0, 10), range(5, 20)], "b": [range(50, 60), range(50, 60)]}
    rows = [
        (d, bytearray(serialize(build_sketch(list(p), k=1024), 10)))
        for d, ps_ in pops.items()
        for p in ps_
    ]
    pdf = pd.DataFrame(rows, columns=["d", "sk"])
    seg = str(tmp_path / "seg_pre")
    ps.write_segment_pandas(pdf, seg)
    st.write_star_trees(
        seg,
        pdf,
        [st.StarTreeSpec(["d"], ["distinctcountthetasketch__sk"], 1)],
    )
    out = st.star_tree_aggregate(seg, ["d"], ["distinctcountthetasketch__sk"])
    lut = st._segment_dictionary(seg, "d")
    got = {
        lut[int(r["d"])]: round(
            deserialize(bytes(r["distinctcountthetasketch__sk"])).estimate()
        )
        for _, r in out.iterrows()
    }
    assert got == {"a": 20, "b": 10}  # unions, not blob counts
