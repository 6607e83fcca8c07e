"""WARC (ISO 28500) source: stream Common-Crawl-style ``.warc`` /
``.warc.gz`` files into the engine's ``pages`` schema.

The reference's S1 operator is a live Jsoup crawler
(``dto/indexing/PageAnalyzer.java:220-260``); the batch engine consumes an
already-crawled corpus per BASELINE.json's input_hint, and at web scale
that corpus arrives as WARC — so this source closes the last format gap
between "a user's Common Crawl dump" and ``build_index``.

Layout notes (what the parser relies on):

* a WARC file is a sequence of records: a ``WARC/1.x`` version line, CRLF
  header lines, one empty line, ``Content-Length`` payload bytes, and a
  blank-line record separator;
* Common Crawl gzips each record as its OWN gzip member — Python's
  ``gzip`` transparently reads concatenated members, so the same
  sequential parser serves ``.warc`` and ``.warc.gz``;
* ``response`` records carry an HTTP/1.1 message as payload: the status
  code comes from its status line and the HTML from its body (honoring
  ``Content-Length`` framing inside the HTTP payload is unnecessary —
  the WARC Content-Length already frames the whole message).

Scale shape: :class:`WarcDatasource` is a ``FileBasedDatasource`` whose
``_read_stream`` yields one Arrow batch per ``batch_records`` records —
records stream through bounded memory, blocks pipeline into downstream
``map_batches`` stages, and file-level parallelism comes from Ray Data's
reader (one task per file / file group).  No whole-file buffering.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from email.utils import parsedate_to_datetime

import pyarrow as pa

__all__ = ["read_warc", "WarcDatasource", "write_warc", "parse_warc_stream"]

_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("code", pa.int32()),
    ("warc_type", pa.string()),
])


def _parse_warc_date(s: str):
    """WARC-Date is ISO-8601 (``2026-08-18T00:00:00Z``)."""
    from datetime import datetime, timezone

    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        try:
            dt = parsedate_to_datetime(s)
        except Exception:  # noqa: BLE001 — malformed date -> epoch
            return 0
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def _read_headers(stream) -> list[bytes] | None:
    """Read one CRLF-terminated header block (version line + headers).
    Returns None at clean EOF.  Tolerates blank separator lines between
    records."""
    lines: list[bytes] = []
    while True:
        line = stream.readline()
        if not line:
            return None if not lines else lines
        if line in (b"\r\n", b"\n"):
            if lines:
                return lines
            continue  # inter-record padding
        lines.append(line.rstrip(b"\r\n"))


def _parse_http_payload(payload: bytes) -> tuple[int, bytes]:
    """(status code, body) from an HTTP/1.x response message."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        sep = payload.find(b"\n\n")
        body_at = sep + 2 if sep >= 0 else 0
    else:
        body_at = sep + 4
    if sep < 0:
        return 200, payload  # not an HTTP message — treat whole as body
    head = payload[:sep].split(b"\r\n", 1)[0]
    parts = head.split()
    code = 200
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            code = int(parts[1])
        except ValueError:
            code = 200
    return code, payload[body_at:]


def parse_warc_stream(stream, *, keep_types: tuple[str, ...] = ("response",)):
    """Yield ``(url, ts_us, html, code, warc_type)`` per WARC record.

    ``stream`` is any binary file object positioned at the first record
    (gzip-wrapping, if needed, is the caller's job).
    """
    while True:
        header_lines = _read_headers(stream)
        if not header_lines:
            return
        if not header_lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"not a WARC record header: {header_lines[0][:40]!r}")
        hdr: dict[str, str] = {}
        for line in header_lines[1:]:
            k, _, v = line.partition(b":")
            hdr[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        length = int(hdr.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        wtype = hdr.get("warc-type", "")
        if wtype not in keep_types:
            continue
        url = hdr.get("warc-target-uri", "")
        ts = _parse_warc_date(hdr.get("warc-date", ""))
        ctype = hdr.get("content-type", "")
        if "msgtype=response" in ctype or ctype.startswith("application/http"):
            code, body = _parse_http_payload(payload)
        else:
            code, body = 200, payload
        yield url, ts, body, code, wtype


def _batches(stream, batch_records: int,
             keep_types: tuple[str, ...]):
    rows: list[tuple] = []
    for rec in parse_warc_stream(stream, keep_types=keep_types):
        rows.append(rec)
        if len(rows) >= batch_records:
            yield _to_table(rows)
            rows = []
    if rows:
        yield _to_table(rows)


def _to_table(rows: list[tuple]) -> pa.Table:
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "code": pa.array([r[3] for r in rows], pa.int32()),
        "warc_type": pa.array([r[4] for r in rows], pa.string()),
    })


try:  # Ray import deferred so the parser works standalone
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        """Streaming WARC reader: one Arrow block per ``batch_records``
        records; memory bounded by the largest single record."""

        _FILE_EXTENSIONS = ["warc", "warc.gz", "gz"]

        def __init__(self, paths, *, batch_records: int = 256,
                     keep_types: tuple[str, ...] = ("response",), **kwargs):
            super().__init__(paths, **kwargs)
            self._batch_records = batch_records
            self._keep_types = tuple(keep_types)

        def _read_stream(self, f, path: str):
            # Ray/Arrow already decompress ``.gz`` paths before handing the
            # stream over (Arrow's gzip codec reads concatenated members, so
            # Common-Crawl per-record members are fine); ``f`` is plain WARC
            # bytes here for both layouts.
            yield from _batches(io.BufferedReader(f), self._batch_records,
                                self._keep_types)

except ImportError:  # pragma: no cover
    WarcDatasource = None  # type: ignore[assignment]


def read_warc(paths, *, batch_records: int = 256,
              keep_types: tuple[str, ...] = ("response",), **read_kwargs):
    """``ray.data.Dataset`` over WARC ``response`` records with the engine's
    pages schema: ``url, warc_ts, html, code, warc_type``."""
    import ray.data as rd

    return rd.read_datasource(
        WarcDatasource(paths, batch_records=batch_records,
                       keep_types=keep_types), **read_kwargs)


# --------------------------------------------------------------------------
# writer (fixtures / tests / exporting a crawl back out)
# --------------------------------------------------------------------------

def write_warc(path: str, records, *, compress: bool | None = None) -> int:
    """Write ``(url, ts_us, html_bytes, code)`` tuples as WARC response
    records (one gzip member per record when ``compress`` — Common Crawl
    layout).  Returns the record count.  Deterministic: record ids derive
    from the url, not uuid4."""
    from datetime import datetime, timezone

    if compress is None:
        compress = path.endswith(".gz")
    n = 0
    with open(path, "wb") as out:
        for url, ts_us, html, code in records:
            dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
            http = (f"HTTP/1.1 {int(code)} OK\r\n"
                    f"Content-Type: text/html\r\n"
                    f"Content-Length: {len(html)}\r\n\r\n"
                    ).encode("latin-1") + bytes(html)
            digest = hashlib.blake2b(str(url).encode("utf-8"),
                                     digest_size=4).hexdigest()
            rec_id = f"<urn:fixture:{digest}>"
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Record-ID: {rec_id}\r\n"
                f"WARC-Date: {dt.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
                f"WARC-Target-URI: {url}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode("latin-1")
            record = head + http + b"\r\n\r\n"
            out.write(gzip.compress(record) if compress else record)
            n += 1
    return n
