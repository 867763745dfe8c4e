"""WARC (Web ARChive) source — the Common-Crawl-native input format,
parsed with the standard library only (ISO 28500 framing is plain
text + Content-Length; per-record gzip members via ``zlib``).

Reads concatenated WARC records from plain ``.warc`` or
member-gzipped ``.warc.gz`` files into the engine's web_pages shape
``(url: string, warc_ts: timestamp[us], html: binary)`` — one
``read_binary_files`` task per file (Common-Crawl ships ~1 GB
segments, one segment per task is the standard partitioning), then a
vectorless but C-heavy per-file parse (``bytes.find`` scans, zlib
streaming) inside ``map_batches``.  Non-``response`` records
(warcinfo, request, metadata) are skipped; the HTTP header block is
stripped so ``html`` is the payload body only.

Reference anchor: the north rule's 'Common-Crawl-style web pages'
framing (BASELINE.json input_hint); the reference repo validates
in-memory records and has no file format of its own.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the WARC.gz layout:
    one member per record) into one plain byte stream — stdlib
    ``gzip.decompress`` walks the members in ONE linear pass (a
    per-member ``data[pos:]`` slice loop would memcpy the remaining
    buffer once per record: quadratic, ~tens of TB of copies on a
    ~1 GB, 50 K-member Common-Crawl segment)."""
    import gzip

    return gzip.decompress(data)  # stdlib handles multi-member streams


def parse_warc_bytes(data: bytes) -> list[tuple[str, int | None, bytes]]:
    """Parse one WARC file's bytes into (url, ts_us, body) tuples for
    ``response`` records.  Framing per ISO 28500: a ``WARC/1.x``
    header block terminated by CRLFCRLF, ``Content-Length`` octets of
    payload, then CRLFCRLF before the next record.  The payload of a
    response record is an HTTP message; its own header block is
    stripped.  Malformed trailing garbage ends the scan (truncated
    fetches are a fact of crawl life — parse what framed cleanly)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    out: list[tuple[str, int | None, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(_CRLF2, start)
        if hdr_end < 0:
            break
        header = data[start:hdr_end].decode("utf-8", "replace")
        fields: dict[str, str] = {}
        for line in header.split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break  # unframed record: cannot skip safely
        body_start = hdr_end + 4
        if body_start + length > n:
            break  # truncated final record: drop, never emit a cut body
        body = data[body_start:body_start + length]
        pos = body_start + length
        if fields.get("warc-type") == "response":
            url = fields.get("warc-target-uri", "")
            ts = _parse_warc_date(fields.get("warc-date"))
            # strip the HTTP response header block if present
            if body[:5] in (b"HTTP/",):
                he = body.find(_CRLF2)
                body = body[he + 4:] if he >= 0 else b""
            out.append((url, ts, body))
    return out


def _parse_warc_date(s: str | None) -> int | None:
    """WARC-Date (ISO 8601 Zulu) → microseconds since epoch."""
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        return int(dt.astimezone(timezone.utc).timestamp() * 1_000_000)
    except ValueError:
        return None


def read_warc(paths: str | list[str]):
    """WARC file(s) → Dataset(url, warc_ts, html) — one parse task per
    file (Common-Crawl's natural partitioning; pass many segment paths
    and the streaming executor pipelines them)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def _parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int | None] = []
        bodies: list[bytes] = []
        for blob in t.column("bytes").to_pylist():
            for url, ts, body in parse_warc_bytes(blob):
                urls.append(url)
                tss.append(ts)
                bodies.append(body)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
        })

    return ds.map_batches(_parse, batch_format="pyarrow", batch_size=1)


def write_warc(records: list[tuple[str, int, bytes]], path: str,
               gzip_members: bool = False) -> None:
    """Serialize (url, ts_us, html) records as a minimal valid WARC
    file (response records with an HTTP/1.1 200 wrapper) — the test
    and round-trip counterpart of :func:`read_warc`."""
    chunks: list[bytes] = []
    for url, ts_us, body in records:
        dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
        # whole seconds -> WARC/1.0 form; sub-second -> WARC/1.1
        # fractional form, so the read side round-trips microseconds
        fmt = ("%Y-%m-%dT%H:%M:%SZ" if ts_us % 1_000_000 == 0
               else "%Y-%m-%dT%H:%M:%S.%fZ")
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body)
        header = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {dt.strftime(fmt)}\r\n"
            f"Content-Length: {len(http)}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
        ).encode() + b"\r\n"
        rec = header + http + _CRLF2
        if gzip_members:
            co = zlib.compressobj(wbits=zlib.MAX_WBITS | 16)
            rec = co.compress(rec) + co.flush()
        chunks.append(rec)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
