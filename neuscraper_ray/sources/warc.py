"""WARC ingestion for Ray Data (from-scratch stdlib parser, no warcio).

Covers the reference's two ingest paths re-expressed Ray-Data-first:

- S4 (CommonCrawl stream, ``/root/reference/src/warc/build.py:119-124``):
  ``read_warc(paths)`` — ``ray.data.read_binary_files`` over ``.warc`` /
  ``.warc.gz`` files, one parse task per file, emitting the pages schema
  ``(url, warc_ts, html)`` for ``rec_type == response`` records.
- S1 (ClueWeb22 WARC-by-offset, ``/root/reference/src/build_test.py:24-55``):
  ``read_warc_member`` — random access to one gzip member using the
  fixed-width 11-byte offset sidecar (``'{:010d}\\n'``), stripping WARC
  header lines up to the first blank line.

The WARC format itself is public (ISO 28500): records are
``WARC/1.0\\r\\n`` + header lines + blank line + ``Content-Length``
payload + ``\\r\\n\\r\\n``; a *response* record's payload is an HTTP
response whose body follows the first blank line.
"""

from __future__ import annotations

import gzip
import io
from email.utils import parsedate_to_datetime

import pyarrow as pa

import ray.data


def _parse_warc_stream(stream: io.BufferedIOBase):
    """Yield (headers: dict, payload: bytes) per WARC record."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            # tolerate garbage between records
            continue
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                    "latin-1"
                )
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    """HTTP response payload -> body (after the first blank line)."""
    sep = payload.find(b"\r\n\r\n")
    if sep == -1:
        sep = payload.find(b"\n\n")
        return payload[sep + 2 :] if sep != -1 else payload
    return payload[sep + 4 :]


def _warc_ts_us(headers: dict) -> int | None:
    d = headers.get("warc-date")
    if not d:
        return None
    try:
        import datetime

        dt = datetime.datetime.fromisoformat(d.replace("Z", "+00:00"))
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        try:
            return int(parsedate_to_datetime(d).timestamp() * 1_000_000)
        except Exception:
            return None


def parse_warc_bytes(data: bytes) -> pa.Table:
    """One WARC(.gz) file's bytes -> pages table (response records only)."""
    if data[:2] == b"\x1f\x8b":
        stream: io.BufferedIOBase = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        stream = io.BytesIO(data)
    urls, tss, htmls = [], [], []
    for headers, payload in _parse_warc_stream(stream):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        urls.append(url)
        tss.append(_warc_ts_us(headers) or 0)
        htmls.append(_http_body(payload))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.large_binary()),
        }
    )


def read_warc(paths: str | list[str]) -> ray.data.Dataset:
    """WARC files -> pages Dataset. One parse task per file (files are
    the natural shard unit; a giant WARC is a straggler — the reference
    has the same file-granular boundary via its process pool,
    ``warc/build.py:192``)."""
    files = ray.data.read_binary_files(paths, include_paths=False)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_warc_bytes(b) for b in batch.column("bytes").to_pylist()]
        return pa.concat_tables(tables) if tables else parse_warc_bytes(b"")

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


# ------------------------- S1: offset-sidecar random access ---------------


def read_offset_sidecar(offset_path: str) -> list[int]:
    """Fixed-width ``'{:010d}\\n'`` offsets (11 bytes per entry)."""
    out = []
    with open(offset_path, "rb") as f:
        while True:
            rec = f.read(11)
            if len(rec) < 11:
                return out
            out.append(int(rec[:10]))


def read_warc_member(warc_path: str, offsets: list[int], doc_id: int) -> bytes:
    """Random-access one document's HTML from a member-gzipped WARC.

    Mirrors ``_get_html_from_warc`` (build_test.py:24-55): seek to the
    doc's gzip member, decompress it alone, strip record header lines up
    to the first blank line, return the rest."""
    start, end = offsets[doc_id], offsets[doc_id + 1]
    with open(warc_path, "rb") as f:
        f.seek(start)
        member = f.read(end - start)
    raw = gzip.decompress(member)
    # strip header lines up to first blank line; drop the record's
    # trailing WARC separator (two CRLFs per ISO 28500)
    sep = raw.find(b"\r\n\r\n")
    if sep == -1:
        sep = raw.find(b"\n\n")
        body = raw[sep + 2 :] if sep != -1 else raw
    else:
        body = raw[sep + 4 :]
    return body[:-4] if body.endswith(b"\r\n\r\n") else body


# ------------------------------- test-support writer ----------------------


def write_warc_gz(
    path: str, records: list[tuple[str, str, bytes]], http_headers: bool = True
) -> list[int]:
    """Write a member-gzipped WARC (one gzip member per record) and
    return member offsets (test fixture; also exercises the S1 layout).

    records: (url, iso_date, html_body). ``http_headers=False`` writes
    ClueWeb22-style records (HTML directly after the WARC header).
    """
    offsets = []
    with open(path, "wb") as f:
        for url, date, body in records:
            if http_headers:
                http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            else:
                http = body
            hdr = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + f"WARC-Date: {date}\r\n".encode()
                + f"Content-Length: {len(http)}\r\n".encode()
                + b"\r\n"
            )
            offsets.append(f.tell())
            f.write(gzip.compress(hdr + http + b"\r\n\r\n"))
        offsets.append(f.tell())
    return offsets
