"""PEP 249 (DB-API 2.0) client over the broker HTTP surface.

The reference ships a JDBC client (pinot-clients/pinot-jdbc-client,
PinotConnection/PinotStatement over the broker's query endpoint); this is
the Python-native analog: `connect(url).cursor().execute(sql)` against
sql/server.py. Cursors stream through the chunked NDJSON endpoint
(/query/sql/stream), so `fetchone`/`fetchmany` hold at most one row
block in memory — the full result never materializes client-side, the
same property the reference's streaming entry point (entry point 3)
provides to its clients.

stdlib urllib only; values arrive as the endpoint's JSON renderings
(timestamps as ISO strings, bytes as base64) — the wire contract, not a
lossy client-side guess.
"""

from __future__ import annotations

import datetime
import json
import urllib.request
from collections import deque

apilevel = "2.0"
threadsafety = 1  # threads may share the module, not connections
paramstyle = "qmark"


class DBAPITypeObject:
    """PEP 249 type object: compares equal to each member type-name the
    broker reports in dataSchema.columnDataTypes (server._type_name),
    so `cur.description[i][1] == NUMBER` works the standard way."""

    def __init__(self, *names: str):
        self._names = frozenset(names)

    def __eq__(self, other) -> bool:
        if isinstance(other, DBAPITypeObject):
            return self._names == other._names
        return other in self._names

    def __hash__(self) -> int:
        return hash(self._names)

    def __repr__(self) -> str:
        return f"DBAPITypeObject({', '.join(sorted(self._names))})"


STRING = DBAPITypeObject("STRING", "JSON")
NUMBER = DBAPITypeObject("INT", "LONG", "FLOAT", "DOUBLE", "BIG_DECIMAL", "BOOLEAN")
DATETIME = DBAPITypeObject("TIMESTAMP", "DATE")
BINARY = DBAPITypeObject("BYTES")
ARRAY = DBAPITypeObject(
    "INT_ARRAY", "LONG_ARRAY", "FLOAT_ARRAY", "DOUBLE_ARRAY", "STRING_ARRAY",
    "BOOLEAN_ARRAY", "TIMESTAMP_ARRAY", "BYTES_ARRAY",
)
ROWID = DBAPITypeObject()  # no rowid concept

_ALL_TYPES = (STRING, NUMBER, DATETIME, BINARY, ARRAY)


def _type_code(name: str) -> DBAPITypeObject:
    for t in _ALL_TYPES:
        if name == t:
            return t
    return STRING if not name.endswith("_ARRAY") else ARRAY


class Error(Exception):
    pass


class DatabaseError(Error):
    pass


class ProgrammingError(Error):
    pass


def _render_param(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _interpolate(operation: str, parameters) -> str:
    if not parameters:
        return operation
    out, pi, in_str = [], 0, False
    for ch in operation:
        if ch == "'":
            in_str = not in_str
            out.append(ch)
        elif ch == "?" and not in_str:
            if pi >= len(parameters):
                raise ProgrammingError("not enough parameters for '?' markers")
            out.append(_render_param(parameters[pi]))
            pi += 1
        else:
            out.append(ch)
    if pi != len(parameters):
        raise ProgrammingError(
            f"{len(parameters)} parameters for {pi} '?' markers"
        )
    return "".join(out)


class Cursor:
    arraysize = 1000

    def __init__(self, conn: "Connection"):
        self._conn = conn
        self._resp = None
        self._buffer: deque = deque()
        self._exhausted = True
        self.description = None
        self.rowcount = -1

    # ---- PEP 249 surface ----
    def execute(self, operation: str, parameters=None) -> "Cursor":
        self.close_result()
        sql = _interpolate(operation, parameters)
        req = urllib.request.Request(
            self._conn.url + "/query/sql/stream",
            data=json.dumps({"sql": sql, "chunkSize": self.arraysize}).encode(),
            headers={"Content-Type": "application/json"},
        )
        self._resp = urllib.request.urlopen(req, timeout=self._conn.timeout)
        head = json.loads(self._resp.readline())
        if head.get("exceptions"):
            raise DatabaseError(head["exceptions"])
        schema = head["dataSchema"]
        # 7-tuples per PEP 249: (name, type_code, display_size,
        # internal_size, precision, scale, null_ok); type_code is a
        # module type object comparing equal to the broker's type name
        self.description = [
            (name, _type_code(typ), None, None, None, None, None)
            for name, typ in zip(schema["columnNames"], schema["columnDataTypes"])
        ]
        self._buffer.clear()
        self._exhausted = False
        self.rowcount = -1
        return self

    def executemany(self, operation: str, seq_of_parameters) -> "Cursor":
        """Run the operation once per parameter set. The engine is
        read-only (no DML), so each execution's result is simply
        consumed; the cursor is left positioned on the LAST result set,
        matching common driver behavior for a SELECT executemany."""
        params = list(seq_of_parameters)
        if not params:
            raise ProgrammingError("executemany with an empty parameter sequence")
        for p in params[:-1]:
            self.execute(operation, p)
            self.fetchall()  # drain so the stream closes cleanly
        return self.execute(operation, params[-1])

    def _pull_block(self) -> None:
        line = self._resp.readline()
        if not line.strip():
            self._exhausted = True
            return
        block = json.loads(line)
        if "rows" in block:
            self._buffer.extend(tuple(r) for r in block["rows"])
            return
        # trailer: rowcount + in-band errors
        self._exhausted = True
        if block.get("exceptions"):
            raise DatabaseError(block["exceptions"])
        self.rowcount = block.get("numRowsResultSet", self.rowcount)

    def fetchone(self):
        while not self._buffer and not self._exhausted:
            self._pull_block()
        return self._buffer.popleft() if self._buffer else None

    def fetchmany(self, size: int | None = None):
        size = size or self.arraysize
        out = []
        while len(out) < size:
            row = self.fetchone()
            if row is None:
                break
            out.append(row)
        return out

    def fetchall(self):
        out = []
        while True:
            row = self.fetchone()
            if row is None:
                return out
            out.append(row)

    def close_result(self) -> None:
        if self._resp is not None:
            try:
                self._resp.close()
            except Exception:  # noqa: BLE001 — already broken stream
                pass
            self._resp = None
        self._buffer.clear()
        self._exhausted = True

    def close(self) -> None:
        self.close_result()

    def setinputsizes(self, sizes) -> None:  # PEP 249 no-op
        pass

    def setoutputsize(self, size, column=None) -> None:  # PEP 249 no-op
        pass

    def __iter__(self):
        return iter(self.fetchone, None)


class Connection:
    def __init__(self, url: str, timeout: float = 120.0):
        self.url = url.rstrip("/")
        self.timeout = timeout
        self._closed = False

    def cursor(self) -> Cursor:
        if self._closed:
            raise ProgrammingError("connection is closed")
        return Cursor(self)

    def commit(self) -> None:  # read-only engine: transactions are no-ops
        pass

    def rollback(self) -> None:
        pass

    def close(self) -> None:
        self._closed = True

    def __enter__(self) -> "Connection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def connect(url: str, timeout: float = 120.0) -> Connection:
    """connect('http://host:port') -> Connection over the broker HTTP
    endpoint (sql/server.py serve())."""
    return Connection(url, timeout)
