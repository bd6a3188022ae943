"""Staleness control for on-disk segment-store fixtures.

Several registered queries build a native segment store from a
parquet table once and cache it under
/tmp/hurricanedb_segments/<basename(sf_dir)>..., keyed by directory
NAME with a bare `_written` marker. That key is wrong the moment the
sf_dir is REGENERATED in place (tools/gen_scale.py writes to the same
path every round): the old marker still satisfies the check and the
query silently reads a stale store built from different data — found
in round 11 as a 10x value mismatch on every segment-store row of the
sf1 scale audit, while the sf0.01/sf0.1 gates (whose parquet never
changes) stayed green.

The marker now records a fingerprint of every source parquet file
(name, size, crc32 of the first, middle and last 64 KiB —
content-sensitive, metadata-cheap); a mismatch wipes the fixture
directory (a rebuild must never mix old and new segments) and
rebuilds. Old "ok" markers mismatch by construction, so pre-existing
stale caches self-heal on first touch. The middle window (round-11
ADVICE) catches a same-size regeneration whose changes fall only in
interior row groups — the head/tail windows alone would pass it as
fresh; mtime is deliberately NOT part of the key so a byte-identical
regeneration (gen_scale re-runs every round) does not force a
rebuild.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

_PROBE = 65536

# Wire-format epoch: bump when serialized bytes STORED inside fixture
# stores change meaning, so every cached store rebuilds once even
# though its source parquet is unchanged. r12: the real-jar capture
# corrected the theta murmur3 constant/seed-hash/compact preamble and
# the clearspring offer path — sketch blobs inside pre-r12 stores are
# in the old hash space and must not be unioned with fresh builds.
# r13: .bloom index buffers gained the reference's 8-byte TYPE/VERSION
# envelope and guava-exact sizing — pre-r13 bloom blobs fail the new
# reader's envelope check, so stores rebuild once.
_FORMAT_EPOCH = "segment-wire-r13"


def _fingerprint(sf_dir: str) -> str:
    rows: list = [_FORMAT_EPOCH]
    for name in sorted(os.listdir(sf_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(sf_dir, name)
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            head = f.read(_PROBE)
            f.seek(max(0, (size - _PROBE) // 2))
            mid = f.read(_PROBE)
            f.seek(max(0, size - _PROBE))
            tail = f.read(_PROBE)
        rows.append(
            (name, size, zlib.crc32(head), zlib.crc32(mid), zlib.crc32(tail))
        )
    return json.dumps(rows)


def fixture_stale(marker: str, sf_dir: str) -> bool:
    """True when the fixture must be (re)built: marker absent, or its
    recorded source fingerprint no longer matches `sf_dir`'s parquet
    set. When stale AND the fixture directory already exists, the whole
    directory is wiped first so the rebuild starts clean."""
    try:
        with open(marker, encoding="utf-8") as f:
            if f.read() == _fingerprint(sf_dir):
                return False
    except OSError:
        pass
    base = os.path.dirname(marker)
    if os.path.isdir(base):
        shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    return True


def write_fixture_marker(marker: str, sf_dir: str) -> None:
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w", encoding="utf-8") as f:
        f.write(_fingerprint(sf_dir))
