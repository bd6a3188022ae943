"""Regenerate tests/fixtures/reallib_segment_golden.json — the
REAL-library byte goldens for the segment-format surfaces (guava bloom,
RoaringBitmap, LZ4/Snappy/Zstd chunk codecs), captured from the actual
jars bundled with this container's pyspark distribution.

The round-12 sketch capture (tools/java/RealLibGolden.java) proved that
re-derived byte formats can hide cross-library bugs for many rounds;
this applies the same methodology to the segment store's remaining
byte surfaces (reference writers:
OnHeapGuavaBloomFilterCreator.java, BitmapInvertedIndexWriter.java,
LZ4Compressor.java / SnappyCompressor.java / ZstandardCompressor.java).

Both directions are captured:
  - the Java harness records the real libraries' bytes (pytest then
    asserts the Python readers decode them, and — where the formats are
    deterministic: bloom, roaring, lz4, snappy — that the Python
    writers produce the identical bytes);
  - the Python writers' blobs are fed INTO the harness, which records
    whether the real libraries accept them (readFrom / deserialize /
    decompress round-trip).

Usage:  python tools/gen_reallib_segment_golden.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hurricanedb_spark.sources.pinot_segment import (  # noqa: E402
    _compress_chunk,
    bloom_serialize,
    roaring_serialize,
)

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(
    HERE, "..", "tests", "fixtures", "reallib_segment_golden.json"
)


def payload_cases() -> dict[str, bytes]:
    """Deterministic chunk payloads spanning the compressibility range
    (no RNG: byte-exact across regenerations)."""
    text = (
        b"event=page_view user=u%04d country=DE latency_ms=123 ok=true\n"
    )
    records = b"".join(text % (i % 97) for i in range(130))  # ~8KB, runs
    mixed = bytes((i * 131 + (i >> 3)) & 0xFF for i in range(4096))
    return {
        "records8k": records,
        "pseudo4k": mixed,  # weakly compressible deterministic pattern
        "zeros4k": b"\x00" * 4096,
        "tiny": b"pinot",
    }


def bloom_cases() -> dict[str, tuple[int, float, list[str]]]:
    """(n_insertions, fpp, values) — n matches len(values), the
    reference's cardinality argument."""
    v100 = [f"val-{i}" for i in range(100)]
    v5000 = [f"k{i * 31}" for i in range(5000)]
    uni = ["", "héllo", "日本語テキスト", "emoji-😀-tail", "ascii"]
    return {
        "b1_p05": (1, 0.05, ["only-one"]),
        "b100_p05": (100, 0.05, v100),
        "b100_p001": (100, 0.001, v100),
        "b5000_p01": (5000, 0.01, v5000),
        "b_unicode_p03": (5, 0.03, uni),
    }


BLOOM_ABSENT_PROBES = ["nope-1", "nope-2", "絶対ない-x"]


def roaring_cases() -> dict[str, list[int]]:
    return {
        "empty": [],
        "small_array": [1, 5, 7, 100, 65535],
        "dense_run": list(range(10_000)),  # run container expected
        "alternating_bitmap": list(range(0, 10_000, 2)),  # 5000 vals, no runs
        # ascending insertion order — the reference's creators add docIds
        # monotonically (OnHeapBitmapInvertedIndexCreator.add uses an
        # incrementing _nextDocId), which keeps RoaringBitmapWriter on
        # its appender fast path where runCompress applies; out-of-order
        # adds fall back to plain RoaringBitmap.add and never
        # run-optimize, a path the reference writers never take
        "multi_container": sorted(
            [k * 65536 + j for k in (0, 2, 7) for j in range(50)]
            + list(range(3 * 65536, 3 * 65536 + 8000))
        ),
        "sparse_high": [65536 * k + 17 for k in range(40)],
        "run_and_array_mix": list(range(5000)) + [9 * 65536 + 1, 9 * 65536 + 9],
    }


def idset_cases() -> dict[str, tuple]:
    """(data_type, size_threshold, expected_insertions, fpp, values,
    member_probes, absent_probes) — exercising every IdSet type tag:
    INT -> RoaringBitmapIdSet, LONG -> Roaring64NavigableMapIdSet
    (incl. negative and >32-bit ids — multiple high keys), FLOAT /
    DOUBLE (raw-bits funnel routes) / STRING (unencodedChars, incl.
    non-BMP) / BYTES -> BloomFilterIdSet, and a forced conversion via
    sizeThresholdInBytes=0 (IdSets.java:60-78)."""
    return {
        "int_roaring": (
            "INT", 8 << 20, 100, 0.03,
            [1, 5, 7, 4096, 70000, -3], [1, -3, 70000], [2, 9999999],
        ),
        "long_roaring64": (
            "LONG", 8 << 20, 100, 0.03,
            [1, 2, (1 << 40) + 7, -5, 1 << 33], [1, -5, (1 << 40) + 7],
            [3, 1 << 41],
        ),
        "float_bloom": (
            "FLOAT", 8 << 20, 50, 0.03,
            [1.5, -2.25, 0.0], [1.5, -2.25], [9.75],
        ),
        "double_bloom": (
            "DOUBLE", 8 << 20, 50, 0.03,
            [3.141592653589793, -1e300], [3.141592653589793], [2.5],
        ),
        "string_bloom": (
            "STRING", 8 << 20, 100, 0.01,
            ["", "héllo", "日本語", "emoji-😀", "plain text"],
            ["héllo", "emoji-😀", "plain text"], ["nope", "絶対ない"],
        ),
        "bytes_bloom": (
            "BYTES", 8 << 20, 30, 0.05,
            [b"\x01\x02\x03", b"", b"\xff" * 16], [b"\x01\x02\x03"],
            [b"\x00"],
        ),
        "int_forced_bloom": (
            "INT", 0, 200, 0.02,
            list(range(100)), [0, 50, 99], [1000, -7],
        ),
    }


def _idset_valhex(dtype: str, vals) -> str:
    import numpy as np

    if dtype in ("INT", "LONG"):
        return np.asarray([int(v) for v in vals], "<i8").tobytes().hex()
    if dtype in ("FLOAT", "DOUBLE"):
        return np.asarray([float(v) for v in vals], "<f8").tobytes().hex()
    if dtype == "STRING":
        assert not any("\x00" in v for v in vals)
        return "\x00".join(vals).encode("utf-8").hex()
    return ":".join(v.hex() for v in vals)  # BYTES


def main() -> None:
    jars = os.path.join(
        os.path.dirname(__import__("pyspark").__file__), "jars"
    )
    rows: list[str] = []

    for name, p in payload_cases().items():
        rows.append(f"payload\t{name}\t{p.hex()}")
        for codec in ("LZ4", "LZ4_LENGTH_PREFIXED", "SNAPPY", "ZSTANDARD"):
            blob = _compress_chunk(p, codec)
            rows.append(f"pyc\t{name}|{codec}\t{blob.hex()}")

    for name, (n, fpp, values) in bloom_cases().items():
        assert not any(" " in v for v in values), "TSV join uses spaces"
        vals_hex = " ".join(values).encode("utf-8").hex()
        rows.append(f"bloom\t{name}\t{n}\t{fpp}\t{vals_hex}")
        rows.append(f"pybloom\t{name}\t{bloom_serialize(values, fpp).hex()}")
        for probe in values[:3] + BLOOM_ABSENT_PROBES:
            rows.append(
                f"bloomprobe\t{name}\t{probe.encode('utf-8').hex()}"
            )

    import numpy as np

    for name, values in roaring_cases().items():
        le = np.asarray(values, dtype="<u4").tobytes()
        rows.append(f"roar\t{name}\t{le.hex()}")
        rows.append(f"pyroar\t{name}\t{roaring_serialize(values).hex()}")

    from hurricanedb_spark.operators.idset_wire import encode_idset

    for name, (
        dtype, threshold, insertions, fpp, vals, members, absents
    ) in idset_cases().items():
        rows.append(
            f"idset\t{name}\t{dtype}\t{threshold}\t{insertions}\t{fpp}"
            f"\t{_idset_valhex(dtype, vals)}"
        )
        blob = encode_idset(
            vals, dtype,
            size_threshold_in_bytes=threshold,
            expected_insertions=insertions,
            fpp=fpp,
        )
        rows.append(f"pyidset\t{name}\t{blob.hex()}")
        for probe in list(members) + list(absents):
            rows.append(
                f"idsetprobe\t{name}\t{_idset_valhex(dtype, [probe])}"
            )

    with tempfile.TemporaryDirectory() as tmp:
        tsv = os.path.join(tmp, "cases.tsv")
        with open(tsv, "w", encoding="utf-8") as f:
            f.write("\n".join(rows) + "\n")
        subprocess.run(
            ["javac", "-encoding", "UTF-8", "-cp", f"{jars}/*",
             "SegmentLibGolden.java"],
            cwd=os.path.join(HERE, "java"),
            check=True,
        )
        proc = subprocess.run(
            ["java", "-Dfile.encoding=UTF-8",
             "-cp", f".:{jars}/*", "SegmentLibGolden", tsv],
            cwd=os.path.join(HERE, "java"),
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr)
            raise SystemExit(proc.returncode)
        out = proc.stdout
    parsed = json.loads(out)  # validate before writing
    with open(FIXTURE, "w", encoding="utf-8") as f:
        f.write(out)
    summary = {
        "bloom_py_equal": sum(r["py_equal"] for r in parsed["bloom"]),
        "bloom_total": len(parsed["bloom"]),
        "roaring_py_equal": sum(r["py_equal"] for r in parsed["roaring"]),
        "roaring_total": len(parsed["roaring"]),
        "comp_py_ok": sum(
            r["py_decompress_ok"] for r in parsed["compression"]
        ),
        "comp_identical": sum(
            r["py_identical"] for r in parsed["compression"]
        ),
        "comp_total": len(parsed["compression"]),
        "idset_py_equal": sum(r["py_equal"] for r in parsed["idset"]),
        "idset_total": len(parsed["idset"]),
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
