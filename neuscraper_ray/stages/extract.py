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


def decode_html(raw: bytes) -> str:
    """bytes -> str: utf-8 with latin-1 fallback (never raises)."""
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
