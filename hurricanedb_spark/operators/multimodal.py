"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions over
mapInPandas.

Decode kernels (operators/codecs.py): REAL for PNG / BMP / PCM-WAV —
stdlib zlib/struct/wave implementations, no external codec needed.
Formats that genuinely require external codecs (JPEG/MP3/video) fall
back to deterministic byte-statistics features; swapping in
PIL/librosa/ffmpeg is a one-function change at the `_decode_features`
dispatch. The distributed plumbing is the part that has to be right at
100 TB (binary payloads make partitions heavy: size
`spark.sql.files.maxPartitionBytes` down so a partition of decoded
frames fits in executor memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from hurricanedb_spark.operators import codecs

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes int, decoder string, "
    "feature array<float>"
)


def _byte_stat_features(payload: bytes) -> list[float]:
    """Deterministic fallback for codec-less formats: 8 'features' from
    byte statistics (the honest stand-in where JPEG/MP3/video decode
    would plug in)."""
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:64]) % 997),
        float(min(payload)),
        float(max(payload)),
        float(payload[n // 2]),
        float(n % 251),
    ]


def _decode_features(payload: bytes) -> tuple[str, list[float]]:
    """Sniff the payload and decode with a real kernel where one exists
    (PNG/BMP/WAV — codecs.py); otherwise byte-stat fallback. Returns
    (decoder_name, features) so downstream can tell real decodes apart.

    Corrupt/truncated payloads must NEVER kill the Spark stage: at 100 TB
    some fraction of files is always damaged, so any parse failure —
    not just the typed UnsupportedMediaError — degrades to byte-stat
    features with decoder='corrupt' (distinguishable from clean
    'byte-stats' fallbacks for formats we simply lack a codec for)."""
    if payload is None or len(payload) == 0:
        return "empty", [0.0] * 8
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return "png", codecs.image_features(codecs.decode_png(bytes(payload)))
        if payload[:2] == b"BM":
            return "bmp", codecs.image_features(codecs.decode_bmp(bytes(payload)))
        if payload[:4] == b"RIFF":
            rate, _, samples = codecs.decode_wav(bytes(payload))
            return "wav", codecs.audio_features(rate, samples)
        if payload[:3] == b"\xff\xd8\xff":
            # Pillow-gated seam: decodes for real where Pillow exists,
            # raises UnsupportedMediaError (-> byte-stat fallback) here
            return "jpeg", codecs.image_features(codecs.decode_jpeg(bytes(payload)))
    except codecs.CorruptMediaError:
        return "corrupt", _byte_stat_features(bytes(payload))
    except codecs.UnsupportedMediaError:
        pass
    except Exception:  # truncated/garbled container: struct/zlib/index errors
        return "corrupt", _byte_stat_features(bytes(payload))
    return "byte-stats", _byte_stat_features(bytes(payload))


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams batches — payloads never materialize on the driver
    and each task holds only one Arrow batch of binaries at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "decoder": decoded.map(lambda t: t[0]),
                    "feature": decoded.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' shape: explode each video payload into per-frame
    rows (here: one row per N-byte block boundary — the real kernel would
    emit decoded frames). Shows the 1->N mapInPandas explode pattern whose
    output is larger than its input — the case where per-batch streaming
    matters most."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "frame_offset": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = 0 if payload is None else len(payload)
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(i)
                    rows["frame_offset"].append(off)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema="media_id long, frame_no int, frame_offset int")


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents table (text
    bytes as payload) so the plumbing is testable without codec libs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.col("doc_id") % 640).cast("int").alias("width"),
        (F.col("doc_id") % 480).cast("int").alias("height"),
    )
