"""Multimodal plumbing tests: binary payload columns through Arrow-batched
mapInPandas — schema, batching, 1->N explode."""

from __future__ import annotations

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synth_media_from_documents,
)


def test_media_table_schema(spark, sf_dir):
    media = synth_media_from_documents(load_table(spark, sf_dir, "documents"))
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    assert types["media_type"] == "string"
    assert media.count() == 500


def test_extract_features(spark, sf_dir):
    media = synth_media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 500
    r = rows[0]
    assert len(r.feature) == 8
    assert r.n_bytes > 0
    assert r.feature[0] == float(r.n_bytes)  # first feature = byte length


def test_frame_sample_explodes(spark, sf_dir):
    media = synth_media_from_documents(load_table(spark, sf_dir, "documents")).limit(20)
    frames = frame_sample(media, every_n_bytes=64).collect()
    assert len(frames) > 20  # 1->N explode
    by_media = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f)
    for mid, fs in by_media.items():
        fs.sort(key=lambda f: f.frame_no)
        assert [f.frame_no for f in fs] == list(range(len(fs)))
        assert all(f.frame_offset == i * 64 for i, f in enumerate(fs))
