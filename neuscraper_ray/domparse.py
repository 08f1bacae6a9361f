"""HTML DOM parsing + NeuScraper-style node instrumentation (pure functions).

Replicates the *semantics* of the reference's DOM layer with the Python
stdlib only (no bs4 in this environment):

- stack-order DFS node-id assignment with bare-text wrapping in
  ``<span instrument_node>`` elements (reference:
  ``/root/reference/src/warc/build.py:37-67`` ``add_node_id``) — note the
  reference uses an explicit LIFO stack, so *sibling subtrees are numbered
  in reverse document order*; the text child of an existing ``<span>`` is
  never wrapped (and therefore never becomes a text node);
- text-node definition: instrumented span whose parent is not
  ``<noscript>`` (``/root/reference/src/api/CommonCrawlApi.py:53``);
- node-sequence extraction in document order: text nodes with non-empty
  ``strip('\\r\\n\\t\\xa0 ')``-ed text, plus ``ol``/``dl``/``table``
  container nodes which are emitted into the model sequence even when
  their text is empty (``/root/reference/src/warc/build.py:83-95``,
  ``src/build_train.py:117-132``) but only written to the nodes table when
  non-empty (``/root/reference/src/warc/build.py:155-165``).

Only elements reachable from the FIRST top-level element receive node ids
(the reference instruments ``soup.find_all()[0]``); trailing top-level
fragments are ignored, exactly like the reference.

These functions are shared verbatim by the Ray pipeline UDFs and by the
single-process oracle (``neuscraper_ray.oracle``), which is what makes the
byte-identical conformance test meaningful.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

STRIP_CHARS = "\r\n\t\xa0 "
CONTAINER_TAGS = ("ol", "dl", "table")

# HTML5 void elements: no end tag, never have children.
VOID_TAGS = frozenset(
    {
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "link",
        "meta",
        "param",
        "source",
        "track",
        "wbr",
    }
)


class Element:
    """One DOM element. ``children`` holds Elements and raw strings.

    ``has_str`` is maintained by the parser (set when a string child is
    appended) so ``instrument`` can skip the per-child type scan on the
    common all-element case; after wrapping, it is True only for
    ``span`` elements that legitimately keep bare strings."""

    __slots__ = ("tag", "parent", "children", "node_id", "instrument", "has_str")

    def __init__(self, tag: str, parent: "Element | None" = None, instrument: bool = False):
        self.tag = tag
        self.parent = parent
        self.children: list[Element | str] = []
        self.node_id: int | None = None
        self.instrument = instrument
        self.has_str = False

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<{self.tag} id={self.node_id} n_children={len(self.children)}>"


class _DomBuilder(HTMLParser):
    """Event-driven DOM builder (stdlib html.parser backend).

    Kept as the reference backend for `parse_html_stdlib`; the hot path
    uses the regex scanner below, which implements the same tree
    semantics ~4x faster (we need no attributes, positions, or entity
    edge cases — see docstring of `parse_html`).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self._stack: list[Element] = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        el = Element(tag, self._stack[-1])
        self._stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self._stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        el = Element(tag, self._stack[-1])
        self._stack[-1].children.append(el)

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data: str) -> None:
        if data:
            top = self._stack[-1]
            top.children.append(data)
            top.has_str = True

    # comments / doctype / processing instructions are dropped; the
    # synthetic corpus does not emit them (documented divergence from
    # bs4, which models comments as wrappable strings).


def parse_html_stdlib(html: str) -> Element:
    """stdlib-backed parse (reference backend, used in equivalence tests)."""
    builder = _DomBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


RAWTEXT_TAGS = frozenset({"script", "style"})
_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:_-]*")
_RAW_CLOSE = {t: re.compile(f"</{t}", re.IGNORECASE) for t in RAWTEXT_TAGS}


def parse_html(html: str) -> Element:
    """Parse an HTML string into a document tree (virtual root element).

    Tailored single-pass scanner with the same tree semantics as the
    stdlib backend: lowercased tag names, void elements never nest,
    stray end tags ignored, unclosed tags closed at the nearest matching
    ancestor, comments/doctype dropped, charrefs unescaped in text,
    script/style content kept raw as a single text child. Attributes are
    not materialized (nothing downstream reads them). Deterministic for
    any input; byte-equivalent to the stdlib backend on well-formed HTML
    (tested), which is what the corpus generator emits.
    """
    root = Element("[document]")
    stack = [root]
    i = 0
    n = len(html)
    find = html.find
    name_match = _NAME_RE.match
    unescape = _unescape
    El = Element
    el_new = Element.__new__
    while i < n:
        lt = find("<", i)
        if lt == -1:
            top = stack[-1]
            top.children.append(unescape(html[i:]))
            top.has_str = True
            break
        if lt > i:
            top = stack[-1]
            top.children.append(unescape(html[i:lt]))
            top.has_str = True
        if lt + 1 == n:  # trailing bare '<': kept as raw text
            top = stack[-1]
            top.children.append(html[lt:])
            top.has_str = True
            break
        nxt = html[lt + 1]
        if nxt == "!" or nxt == "?":
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                i = n if end == -1 else end + 3
            else:
                end = find(">", lt)
                i = n if end == -1 else end + 1
            continue
        gt = find(">", lt)
        if gt == -1:
            top = stack[-1]
            top.children.append(html[lt:])
            top.has_str = True
            break
        i = gt + 1
        # match names in place on the big string — no per-tag body slice
        if nxt == "/":
            m = name_match(html, lt + 2, gt)
            if m:
                name = m.group(0).lower()
                for k in range(len(stack) - 1, 0, -1):
                    if stack[k].tag == name:
                        del stack[k:]
                        break
            continue
        m = name_match(html, lt + 1, gt)
        if not m:
            # '<' followed by junk: html.parser treats it as text-ish;
            # we drop it (deterministic; absent from the corpus)
            continue
        name = m.group(0).lower()
        # inlined Element(...) — ~190k constructions per 2k pages make
        # the call overhead itself measurable in the parse hot loop
        top = stack[-1]
        el = el_new(El)
        el.tag = name
        el.parent = top
        el.children = []
        el.node_id = None
        el.instrument = False
        el.has_str = False
        top.children.append(el)
        if name not in VOID_TAGS:
            if name in RAWTEXT_TAGS:
                mm = _RAW_CLOSE[name].search(html, i)
                close = mm.start() if mm else -1
                if close == -1:
                    if i < n:
                        el.children.append(html[i:])
                        el.has_str = True
                    break
                if close > i:
                    el.children.append(html[i:close])  # raw, no unescape
                    el.has_str = True
                gt2 = find(">", close)
                i = n if gt2 == -1 else gt2 + 1
            else:
                # self-closing check, whitespace-tolerant ("<br />"), in
                # place; str.isspace matches what body.rstrip() stripped
                j = gt - 1
                while j > lt and html[j].isspace():
                    j -= 1
                if html[j] != "/" or j <= lt:
                    stack.append(el)
    return root


from html import unescape as _html_unescape


def _unescape(text: str) -> str:
    if "&" in text:
        return _html_unescape(text)
    return text


def instrument(doc: Element) -> int:
    """Assign stack-order node ids and wrap bare text in instrument spans.

    Mirrors ``add_node_id`` (/root/reference/src/warc/build.py:37-67):
    explicit LIFO stack starting at the first top-level element; children
    pushed in document order (hence *visited* in reverse); every string
    child is replaced by a ``<span instrument_node>`` wrapper *except*
    direct string children of an existing ``<span>``, which stay bare.

    Returns the number of ids assigned (0 for a tree with no elements).
    """
    first = next((c for c in doc.children if isinstance(c, Element)), None)
    if first is None:
        return 0
    stack = [first]
    next_id = 0
    while stack:
        node = stack.pop()
        node.node_id = next_id
        next_id += 1
        if node.instrument:
            # a wrapper holds exactly the one bare string it wrapped —
            # span semantics keep it bare, so there is nothing to scan
            continue
        children = node.children
        if not node.has_str:
            # no string children (parser-maintained flag): nothing to
            # wrap, push as-is
            stack.extend(children)  # LIFO: last child explored first
            continue
        to_push: list[Element] = []
        new_children: list[Element | str] = []
        for child in children:
            if isinstance(child, str):
                if node.tag == "span":
                    new_children.append(child)  # reference skips span text
                    continue
                wrapper = Element("span", node, instrument=True)
                wrapper.children.append(child)
                wrapper.has_str = True  # it IS a bare-string holder
                new_children.append(wrapper)
                to_push.append(wrapper)
            else:
                new_children.append(child)
                to_push.append(child)
        node.children = new_children
        # after wrapping, only span nodes legitimately keep bare strings
        node.has_str = node.tag == "span"
        stack.extend(to_push)  # LIFO: last child explored first
    return next_id


def iter_elements(doc: Element):
    """Yield elements in document (pre)order, like ``soup.find_all()``."""
    stack = [c for c in reversed(doc.children) if isinstance(c, Element)]
    while stack:
        el = stack.pop()
        yield el
        stack.extend(c for c in reversed(el.children) if isinstance(c, Element))


def subtree_text(el: Element) -> str:
    """All descendant strings concatenated in document order (bs4 ``.text``)."""
    parts: list[str] = []
    stack: list[Element | str] = [el]
    while stack:
        node = stack.pop()
        if isinstance(node, str):
            parts.append(node)
        else:
            stack.extend(reversed(node.children))
    return "".join(parts)


def extract_node_sequence(html: str) -> list[tuple[int, str, str, bool, bool]]:
    """HTML -> ordered model node sequence.

    Returns ``[(node_id, text, tag, is_textnode, has_text), ...]`` in
    document order, where

    - text nodes (instrumented span, parent != noscript) are included iff
      their stripped text is non-empty;
    - ``ol``/``dl``/``table`` containers are always included
      (``has_text=False`` marks empty containers, which occupy a chunk
      slot but are absent from the nodes table — reference quirk, see
      module docstring);
    - ``text`` is stripped with ``STRIP_CHARS``; container text is the
      full (stripped) subtree text, duplicating descendant text-node
      text exactly as the reference's ``.text`` does.
    """
    doc = parse_html(html)
    if instrument(doc) == 0:
        return []
    return node_sequence_from_doc(doc)


def node_columns_from_doc(
    doc: Element,
    ids: list[int],
    texts: list[str],
    tags: list[str],
    is_tns: list[bool],
    has_ts: list[bool],
) -> None:
    """Columnar twin of ``node_sequence_from_doc``: appends the model
    node sequence directly into caller-provided column lists (one
    append per field instead of a tuple per row) — the hot path for
    the fused extract+score stage, where per-row tuples were ~10% of
    all parse-stage time. ``node_sequence_from_doc`` zips these same
    columns, so there is exactly ONE walk implementation."""
    app_i = ids.append
    app_t = texts.append
    app_g = tags.append
    app_n = is_tns.append
    app_h = has_ts.append
    # inlined preorder walk (identical order to iter_elements); an
    # instrument wrapper always holds exactly the one string it wrapped,
    # so its text is children[0] — no subtree walk needed
    stack = [c for c in reversed(doc.children) if isinstance(c, Element)]
    push = stack.append
    while stack:
        el = stack.pop()
        if el.instrument:
            if el.parent is not None and el.parent.tag != "noscript":
                text = el.children[0].strip(STRIP_CHARS)
                if text:
                    app_i(el.node_id)
                    app_t(text)
                    app_g("#text")
                    app_n(True)
                    app_h(True)
            continue  # wrapper children are strings only
        if el.node_id is not None and el.tag in CONTAINER_TAGS:
            text = subtree_text(el).strip(STRIP_CHARS)
            app_i(el.node_id)
            app_t(text)
            app_g(el.tag)
            app_n(False)
            app_h(len(text) > 0)
        children = el.children
        if el.has_str:
            for c in reversed(children):
                if isinstance(c, Element):
                    push(c)
        else:
            stack.extend(reversed(children))
    return None


def node_sequence_from_doc(doc: Element) -> list[tuple[int, str, str, bool, bool]]:
    """The walk of ``extract_node_sequence`` over an already-parsed,
    already-instrumented tree (callers that also need the tree — e.g.
    annotation projection — parse once and share it)."""
    ids: list[int] = []
    texts: list[str] = []
    tags: list[str] = []
    is_tns: list[bool] = []
    has_ts: list[bool] = []
    node_columns_from_doc(doc, ids, texts, tags, is_tns, has_ts)
    return list(zip(ids, texts, tags, is_tns, has_ts))


def chunk_sequence(n_nodes: int, chunk_size: int = 384) -> list[tuple[int, int]]:
    """Chunk boundaries ``[(start, end), ...]`` over the node sequence.

    Mirrors ``_chunk_nodes`` (/root/reference/src/warc/build.py:25-35):
    fixed-size contiguous chunks of ``chunk_size`` sequence positions.
    """
    return [(i, min(i + chunk_size, n_nodes)) for i in range(0, n_nodes, chunk_size)]
