"""pages -> nodes: decode + DOM parse + text-node sequence extraction.

One stateless ``map_batches`` UDF (Arrow in / Arrow out). For every input
page it emits the NeuScraper node sequence (see
``neuscraper_ray.domparse``) plus ONE sentinel row (``node_id = -1``) so
that every url survives to the per-url assembly groupby even when the
page has zero text nodes — this removes the left-outer join the
reference needs to re-align dropped urls
(``/root/reference/src/eval/run_eval.py:9-28``).

Decode semantics follow the reference's *intent* (``app/builder.py:110-122``):
try utf-8, fall back to latin-1 (which always succeeds), rather than the
buggy ``bytes.encode`` path at ``warc/build.py:131``.
"""

from __future__ import annotations

import pyarrow as pa

from neuscraper_ray.domparse import chunk_sequence, extract_node_sequence

CHUNK_SIZE = 384  # reference: /root/reference/src/warc/build.py:22

NODES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("node_id", pa.int32()),
        ("node_ord", pa.int32()),
        ("chunk_id", pa.int32()),
        ("text", pa.large_string()),
        ("tag", pa.string()),
        ("is_textnode", pa.bool_()),
        ("has_text", pa.bool_()),
    ]
)


# BOMs in sniff order — utf-32-le's BOM starts with utf-16-le's, so
# the 4-byte marks must be tested first
_BOMS = (
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

# HTML5-style meta charset scan over the head: both the <meta
# charset="X"> and <meta http-equiv content="...; charset=X"> forms
_META_CHARSET_RE = None  # compiled lazily (module import stays cheap)

_SNIFF_LIMIT = 1024  # bytes scanned for the meta declaration (HTML5 §13.2)


def sniff_encoding(raw: bytes) -> str | None:
    """Detected encoding name, or None when only the fallback chain
    applies: BOM first (authoritative), then an HTML5-style meta
    charset scan of the first 1 KiB. The declared name must resolve
    via ``codecs.lookup`` — unknown labels are ignored like chardet's
    can't-detect path, not errors."""
    import codecs
    import re

    global _META_CHARSET_RE
    for bom, name in _BOMS:
        if raw[: len(bom)] == bom:
            return name
    if _META_CHARSET_RE is None:
        _META_CHARSET_RE = re.compile(
            rb"<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-]+)", re.I
        )
    m = _META_CHARSET_RE.search(raw[:_SNIFF_LIMIT])
    if m:
        name = m.group(1).decode("ascii", errors="replace")
        try:
            codecs.lookup(name)
        except LookupError:
            return None
        return name
    return None


def decode_html(raw: bytes) -> str:
    """bytes -> str, never raises. M1 with chardet-breadth sniffing:
    a BOM is authoritative (decoded with replace — BOMs don't lie
    about the family, only about stray bytes); a declared meta charset
    is tried STRICT (a page lying about its encoding falls through);
    then the utf-8-strict -> latin-1 chain (latin-1 never fails, so no
    page is ever dropped). The reference's intent per SURVEY §3.1 —
    its own chardet call is behind a swallowed exception."""
    enc = sniff_encoding(raw)
    if enc is not None:
        if enc.startswith(("utf-16", "utf-32")):
            bom = next(b for b, n in _BOMS if n == enc)
            return raw[len(bom) :].decode(enc, errors="replace")
        if enc == "utf-8-sig":  # -sig strips its own BOM
            return raw.decode(enc, errors="replace")
        try:
            return raw.decode(enc)
        except (UnicodeDecodeError, LookupError):
            pass
    try:
        return raw.decode("utf-8")
    except (UnicodeDecodeError, AttributeError):
        return raw.decode("latin-1", errors="replace")


def page_to_node_rows(url: str, html_bytes: bytes) -> list[tuple]:
    """Pure per-page extraction -> list of node-row tuples (+ sentinel).

    A page whose parse raises is NOT silently dropped (the reference's
    bare ``except: continue`` at warc/build.py:151-153 loses the url
    AND the reason): its sentinel row carries tag ``#error`` so the
    document lands in the output with ``drop_reason="parse_error"`` —
    per-row error lineage instead of disappearance.
    """
    rows: list[tuple] = []
    err = False
    try:
        seq = extract_node_sequence(decode_html(html_bytes))
    except Exception:
        seq = []
        err = True
    chunk_of = {}
    for ci, (s, e) in enumerate(chunk_sequence(len(seq), CHUNK_SIZE)):
        for pos in range(s, e):
            chunk_of[pos] = ci
    for ord_, (node_id, text, tag, is_tn, has_text) in enumerate(seq):
        rows.append((url, node_id, ord_, chunk_of[ord_], text, tag, is_tn, has_text))
    sentinel_tag = "#error" if err else "#page"
    rows.append((url, -1, -1, -1, "", sentinel_tag, False, False))  # sentinel
    return rows


def extract_nodes_batch(batch: pa.Table) -> pa.Table:
    """Arrow batch of pages -> Arrow batch of node rows."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out: list[tuple] = []
    for url, html_bytes in zip(urls, htmls):
        out.extend(page_to_node_rows(url, html_bytes))
    cols = list(zip(*out))
    arrays = [
        pa.array(cols[0], pa.string()),
        pa.array(cols[1], pa.int32()),
        pa.array(cols[2], pa.int32()),
        pa.array(cols[3], pa.int32()),
        pa.array(cols[4], pa.large_string()),
        pa.array(cols[5], pa.string()),
        pa.array(cols[6], pa.bool_()),
        pa.array(cols[7], pa.bool_()),
    ]
    return pa.Table.from_arrays(arrays, schema=NODES_SCHEMA)
