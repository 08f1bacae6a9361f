"""Normalized content renderer with separator rules (M14 parity).

Re-implements ``get_content_for_nodes`` + ``get_text_separator``
(``/root/reference/src/api/AnnotateHtmlApi.py:492-738``) over our
Element tree: given an ordered list of node ids, emit the page text
with a separator chosen per adjacent text-node pair, plus per-node
(start, end) character offsets.

Separator rule order (first match wins, reference :562-596):
 1. visibility change between the text nodes        -> "\\n"
 2. a <br> element strictly between them            -> "\\n"
 3. different innermost block ancestors             -> "\\n"
 4. raw text has a space/tab at the boundary        -> " "
 5. both inline elements, no visual margin between  -> ""
 6. punctuation adjacent to a space at the boundary -> ""
 7. otherwise                                       -> " "

Visual (VDOM) rules degrade to neutral defaults here — the ClueWeb22
vdom feature stream is unavailable, so every node is "visible" (rule 1
never fires, matching the reference's behavior when features are
zero-initialized) and margins are absent (rule 5 decided by the tag
lists alone). Inline-``style`` attributes are likewise not consulted
(our parser does not materialize attributes). BLOCK/INLINE element sets
mirror ``AnnotateHtmlApi.py:15-22``.

NOTE: the flagship inference path does NOT use this renderer — final
page text is the descending-node-id no-separator concat
(``get_text.py:36-37``), replicated in ``stages.assemble``. This module
covers the reference's annotation-export surface.
"""

from __future__ import annotations

import bisect
import string

from neuscraper_ray.domparse import Element, STRIP_CHARS, instrument, iter_elements, parse_html, subtree_text

INLINE_ELEMENT = {
    "a", "abbr", "acronym", "b", "bdo", "big", "br", "cite", "code", "dfn",
    "em", "i", "img", "input", "kbd", "label", "map", "object", "q", "samp",
    "script", "small", "span", "strong", "sub", "sup", "textarea", "time",
    "tt", "var",
}

BLOCK_ELEMENT = {
    "address", "article", "aside", "blockquote", "canvas", "dd", "div", "dl",
    "dt", "fieldset", "figcaption", "caption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "li",
    "main", "nav", "noscript", "ol", "output", "p", "pre", "section",
    "table", "tr", "td", "th", "tbody", "thead", "tfoot", "ul", "video",
    "h7", "h8", "h9", "applet", "audio", "button", "datalist", "frameset",
    "legend", "menu", "summary", "textarea", "title",
}


class RenderIndex:
    """Precomputed document-order indexes for separator decisions."""

    def __init__(self, doc: Element):
        self.by_id: dict[int, Element] = {}
        self.pos: dict[int, int] = {}  # node_id -> doc-order position
        self.elements: list[Element] = []
        self.title: Element | None = None
        br_positions: list[int] = []
        istext: list[bool] = []
        for el in iter_elements(doc):
            if el.node_id is None:
                continue
            p = len(self.elements)
            self.elements.append(el)
            self.by_id[el.node_id] = el
            self.pos[el.node_id] = p
            if el.tag == "br":
                br_positions.append(p)
            is_tn = el.instrument and el.parent is not None and el.parent.tag != "noscript"
            istext.append(is_tn)
            if el.tag == "title" and self.title is None:
                self.title = el
        self.br_positions = br_positions
        self.is_textnode = istext
        # subtree end position per element (pre-order => contiguous range)
        n = len(self.elements)
        self.sub_end = [0] * n
        self._compute_subtree_ends(doc)
        # next text-node position at-or-after each position
        nxt = [n] * (n + 1)
        for i in range(n - 1, -1, -1):
            nxt[i] = i if istext[i] else nxt[i + 1]
        self.next_text = nxt
        self._block_cache: dict[int, Element | None] = {}

    def _compute_subtree_ends(self, doc: Element) -> None:
        def walk(el: Element) -> int:
            start = self.pos.get(el.node_id) if el.node_id is not None else None
            end = start + 1 if start is not None else 0
            for c in el.children:
                if isinstance(c, Element):
                    end = max(end, walk(c))
            if start is not None:
                self.sub_end[start] = end
            return end

        for c in doc.children:
            if isinstance(c, Element):
                walk(c)

    def first_textnode(self, el: Element) -> Element | None:
        p = self.pos.get(el.node_id)
        if p is None:
            return None
        q = self.next_text[p]
        return self.elements[q] if q < self.sub_end[p] else None

    def br_between(self, prev_tn: Element, curr_tn: Element) -> bool:
        a, b = self.pos[prev_tn.node_id], self.pos[curr_tn.node_id]
        lo = bisect.bisect_right(self.br_positions, a)
        return lo < len(self.br_positions) and self.br_positions[lo] < b

    def innermost_block(self, el: Element | None) -> Element | None:
        while el is not None and el.tag not in BLOCK_ELEMENT:
            el = el.parent
        return el


def _is_inline(node: Element) -> bool:
    # for a text node (instrument span) the reference checks the
    # ENCLOSING element's tag (AnnotateHtmlApi.py:669-681)
    el = node.parent if node.instrument else node
    if el is None:
        return True
    return el.tag in INLINE_ELEMENT


def _space_between(prev_text: str, curr_text: str) -> bool:
    if prev_text and prev_text[-1] in (" ", "\t"):
        return True
    return bool(curr_text) and curr_text[0] in (" ", "\t")


def _starts_punct_space(text: str) -> bool:
    if not text or text.isspace() or text[0] not in string.punctuation:
        return False
    return len(text) == 1 or text[1] == " "


def _ends_space_punct(text: str) -> bool:
    if not text or text.isspace() or text[-1] not in string.punctuation:
        return False
    return len(text) == 1 or text[-2] == " "


def text_separator(
    idx: RenderIndex,
    prev_tn: Element | None,
    curr_tn: Element,
    default_separator: str = "\n",
    vdom: dict | None = None,
) -> str:
    """``vdom`` (node_id -> VDomFeatures, see ``neuscraper_ray.vdom``)
    activates the visual rules; without it every node is visible and
    margin-free (the reference's zero-init behaviour is visibility
    False — we choose visible so rule 1 stays inert, documented)."""
    if prev_tn is None:
        return default_separator
    if vdom is not None:
        from neuscraper_ray.vdom import is_visible

        pv = vdom.get(prev_tn.node_id)
        cv = vdom.get(curr_tn.node_id)
        if pv is not None and cv is not None and is_visible(pv) != is_visible(cv):
            return "\n"
    if idx.br_between(prev_tn, curr_tn):
        return "\n"
    prev_block = idx.innermost_block(prev_tn)
    curr_block = idx.innermost_block(curr_tn)
    if prev_block is None or curr_block is None or prev_block.node_id != curr_block.node_id:
        return "\n"
    prev_text = subtree_text(prev_tn)
    curr_text = subtree_text(curr_tn)
    if _space_between(prev_text, curr_text):
        return " "
    if _is_inline(prev_tn) and _is_inline(curr_tn) and not _margin_between(vdom, prev_tn, curr_tn):
        return ""
    if _starts_punct_space(curr_text) or _ends_space_punct(prev_text):
        return ""
    return " "


def _margin_between(vdom: dict | None, prev_tn: Element, curr_tn: Element) -> bool:
    if vdom is None:
        return False  # no visual info = no margin
    from neuscraper_ray.vdom import has_margin_between

    return bool(
        has_margin_between(vdom.get(prev_tn.node_id), vdom.get(curr_tn.node_id))
    )


def render_content(
    html: str | Element,
    node_ids: list[int],
    add_html_title: bool = True,
    trim_space: bool = True,
    default_text_separator: str = "\n",
    vdom: dict | None = None,
) -> tuple[str, dict[int, tuple[int, int]]]:
    """-> (page_text, {node_id: (start, end)}). Reference
    ``get_content_for_nodes`` (AnnotateHtmlApi.py:492-559)."""
    if isinstance(html, Element):
        doc = html
    else:
        doc = parse_html(html)
        instrument(doc)
    idx = RenderIndex(doc)
    out: list[str] = []
    out_len = 0
    offsets: dict[int, tuple[int, int]] = {}

    if add_html_title and idx.title is not None:
        t = subtree_text(idx.title)
        t = t.strip(STRIP_CHARS) if trim_space else t
        if t:
            out.append(t)
            out_len += len(t)
            offsets[idx.title.node_id] = (0, out_len)

    prev_tn: Element | None = None
    for nid in node_ids:
        el = idx.by_id.get(nid)
        if el is None:
            continue
        node_text = subtree_text(el)
        if trim_space:
            node_text = node_text.strip(STRIP_CHARS)
        if node_text == "":
            continue
        curr_tn = self_or_first_text(idx, el)
        sep = (
            "\n"
            if curr_tn is None
            else text_separator(idx, prev_tn, curr_tn, default_text_separator, vdom)
        )
        if out_len == 0:
            sep = ""
        start = out_len + len(sep)
        out.append(sep)
        out.append(node_text)
        out_len = start + len(node_text)
        offsets[nid] = (start, out_len)
        prev_tn = curr_tn
    return "".join(out), offsets


def self_or_first_text(idx: RenderIndex, el: Element) -> Element | None:
    return el if idx.is_textnode[idx.pos[el.node_id]] else idx.first_textnode(el)
