"""M16: original-HTML reconstruction from annotation-instrumented pages.

The reference's AnnotateHtml tooling instruments a page before
annotation — a ``semanticlayout``/``mattrdefaults`` attribute pair on
``<html>``, a ``data-dcnode-id`` attribute on every element, and bare
text nodes wrapped in ``<span ... instrument_node>`` so they get ids —
and ``get_original_html`` strips all of it back out to recover the
page as crawled (``/root/reference/src/api/AnnotateHtmlApi.py:841-869``,
BeautifulSoup node walk). This module is the engine's vectorized
equivalent: three RE2 passes over zero-copy Arrow (DuckDB
``regexp_replace(..., 'g')`` reproduces them token-for-token — both
engines run RE2, no backtracking semantics to diverge on), plus the
deterministic INSTRUMENTER used by tests and the rows-only query to
prove the round trip byte-identical (instrument -> strip == original).

Scale shape: a pure map — zero shuffle, html bytes touched once.
"""

from __future__ import annotations

import re

import pyarrow as pa

# the three instrumentation artifacts, in strip order: unwrap the
# injected spans FIRST (their open tag carries a dcnode id that rule 2
# would otherwise orphan), then the per-element ids, then the <html>
# layout attrs
INSTR_SPAN_RE = r'<span data-dcnode-id="\d+" instrument_node="">([^<]*)</span>'
DCNODE_ATTR_RE = r' data-dcnode-id="\d+"'
LAYOUT_ATTR_RE = r' (?:semanticlayout|mattrdefaults)="[^"]*"'


def strip_instrumentation(html_col) -> pa.Array:
    """Arrow string array/ChunkedArray of instrumented html -> original
    html. Vectorized: three ``pc.replace_substring_regex`` passes."""
    import pyarrow.compute as pc

    x = pc.replace_substring_regex(html_col, INSTR_SPAN_RE, "\\1")
    x = pc.replace_substring_regex(x, DCNODE_ATTR_RE, "")
    return pc.replace_substring_regex(x, LAYOUT_ATTR_RE, "")


def sql_strip_instrumentation(expr: str) -> str:
    """DuckDB twin of :func:`strip_instrumentation` (same RE2 patterns,
    same order; regexp_replace with the 'g' flag)."""
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '{INSTR_SPAN_RE}', '\\1', 'g'), "
        f"'{DCNODE_ATTR_RE}', '', 'g'), "
        f"'{LAYOUT_ATTR_RE}', '', 'g')"
    )


_TAG_RE = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)((?:\s[^<>]*?)?)(/?)>")
_TEXT_RE = re.compile(r">([^<>]*[^<>\s][^<>]*)<")


def instrument_html(html: str) -> str:
    """Deterministically instrument a page the way the annotation
    tooling does: layout attrs on ``<html>``, sequential
    ``data-dcnode-id`` on every element open tag, every non-whitespace
    bare text run wrapped in an instrument span. Pure function — the
    fixture side of the M16 round trip (strip(instrument(h)) == h is
    pinned in tests and in the ``pages_original_html`` query)."""
    counter = [0]

    def tag_sub(m: re.Match) -> str:
        name, attrs, selfclose = m.group(1), m.group(2), m.group(3)
        nid = counter[0]
        counter[0] += 1
        extra = ' semanticlayout="grid" mattrdefaults="1"' if name == "html" else ""
        return f'<{name}{attrs}{extra} data-dcnode-id="{nid}"{selfclose}>'

    out = _TAG_RE.sub(tag_sub, html)

    def text_sub(m: re.Match) -> str:
        nid = counter[0]
        counter[0] += 1
        return (
            f'><span data-dcnode-id="{nid}" instrument_node="">'
            f"{m.group(1)}</span><"
        )

    return _TEXT_RE.sub(text_sub, out)
