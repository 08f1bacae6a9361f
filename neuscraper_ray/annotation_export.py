"""Annotation offset export (M15 parity).

Re-implements ``get_primary_content_with_annotation_offset`` +
``remove_nested_node`` (reference
``/root/reference/src/api/AnnotateHtmlApi.py:295-488``) over our
Element tree: render the primary content (M14 renderer, per-text-node
offsets), then project every annotation type onto (start, end) spans of
that text — per-type maps keyed by node id — including the reference's
table/list sub-element expansion and its quirks:

- annotation node lists are processed in DESCENDING node-id order
  (stack-order ids descend in document order — reference :258);
- an empty Primary list exports ``" "`` (one space), a missing Primary
  key exports ``""`` (reference :300-306, :420);
- ``Title`` offsets key on the PARENT of each annotated text node and
  extend the end across repeated parents (reference :424-449);
- tables expand to caption/th/tr/td descendants (BFS), lists to li;
  nested ``tr``/``td``/``li`` keep only the OUTERMOST node, where
  "nested" is decided in id space as the half-open range
  [nodeid, max_descendant_id) — the subtree's max-id node itself
  escapes the range; quirk reproduced exactly (reference :478-488);
- ``InvisibleText`` groups consecutive invisible text nodes; the span
  end is the START offset of the last invisible node (``[0]``, not
  ``[1]`` — reference :393-399), keyed by the first node of the run;
- binary mode returns utf-8 bytes with BYTE offsets (same boundaries
  re-measured, reference ``get_binary`` flag).

Annotation type ids follow ``labels.ANNOTATION_TYPES`` (Primary=1,
Heading=2, Title=3, Paragraph=4, Table=5, List=6); a missing Primary
entry defaults to every text node, as the reference does when the
ClueWeb22 annotation stream carries none (reference :255-256).
"""

from __future__ import annotations

from neuscraper_ray.domparse import Element, instrument, parse_html
from neuscraper_ray.labels import ANNOTATION_TYPES, get_text_nodeids
from neuscraper_ray.render import RenderIndex, render_content

TABLE_ELEMENT = ("caption", "th", "tr", "td")
LIST_ELEMENT = ("li",)
SUB_ELEMENT_ANNOTATION_NAME = {
    "caption": "TableCaption",
    "th": "TableHeader",
    "tr": "TableRow",
    "td": "TableCell",
    "li": "ListItem",
}

_PRIMARY = ANNOTATION_TYPES["Primary"]
_HEADING = ANNOTATION_TYPES["Heading"]
_TITLE = ANNOTATION_TYPES["Title"]
_PARAGRAPH = ANNOTATION_TYPES["Paragraph"]
_TABLE = ANNOTATION_TYPES["Table"]
_LIST = ANNOTATION_TYPES["List"]

Offsets = dict[int, tuple[int, int]]


def _last_descendant_id(idx: RenderIndex, nodeid: int) -> int:
    """Max node id in the subtree == nodeid + subtree_size - 1 (the
    LIFO numbering assigns each subtree a contiguous id range)."""
    p = idx.pos[nodeid]
    return nodeid + (idx.sub_end[p] - p) - 1


def remove_nested_node(idx: RenderIndex, nodeid_list: list[int]) -> set[int]:
    """-> node ids to SKIP so only outermost nodes remain.

    Ascending id order processes ancestors before descendants; a node
    already covered by an earlier node's [id, max_descendant_id) range
    is nested. The range excludes the subtree's max-id node — the
    reference's exclusive upper bound, kept bug-for-bug."""
    included: set[int] = set()
    skip: set[int] = set()
    for nid in sorted(nodeid_list):
        if nid in included:
            skip.add(nid)
        if nid in idx.pos:
            included.update(range(nid, _last_descendant_id(idx, nid)))
    return skip


def find_node_in_children(
    idx: RenderIndex, nodeid: int, target_tags: tuple[str, ...]
) -> dict[str, list[int]]:
    """BFS over the subtree (node itself included): tag -> node ids in
    visit order (reference :741-765)."""
    result: dict[str, list[int]] = {t: [] for t in target_tags}
    el = idx.by_id.get(nodeid)
    if el is None:
        return result
    queue: list[Element] = [el]
    while queue:
        cur = queue.pop(0)
        if cur.tag in result:
            result[cur.tag].append(cur.node_id)
        queue.extend(c for c in cur.children if isinstance(c, Element))
    return result


def node_content_offsets(
    idx: RenderIndex, textnode_offset: Offsets, nodeids: list[int]
) -> Offsets:
    """Per annotated ELEMENT: (start of first, end of last) over the
    text nodes of its subtree chain that appear in the rendered
    offsets (reference ``get_node_content_offset`` :452-474)."""
    out: Offsets = {}
    for nid in nodeids:
        start = end = -1
        for tid in get_text_nodeids(idx, nid):
            if tid in textnode_offset:
                if start == -1:
                    start = textnode_offset[tid][0]
                end = textnode_offset[tid][1]
        if start != -1 and end != -1:
            out[nid] = (start, end)
    return out


def title_content_offsets(
    idx: RenderIndex, textnode_offset: Offsets, title_nodeids: list[int]
) -> Offsets:
    """Title annotations sit on TEXT nodes: key the span on each text
    node's parent, extending the end across repeats (reference
    :424-449)."""
    out: Offsets = {}
    for tid in title_nodeids:
        if tid not in textnode_offset:
            continue
        el = idx.by_id.get(tid)
        if el is None or el.parent is None or el.parent.node_id is None:
            continue
        pid = el.parent.node_id
        start, end = textnode_offset[tid]
        if pid in out:
            out[pid] = (out[pid][0], end)
        else:
            out[pid] = (start, end)
    return out


def _expand_sub_elements(
    idx: RenderIndex,
    textnode_offset: Offsets,
    container_ids: list[int],
    tags: tuple[str, ...],
    nested_tags: frozenset[str],
    annotation_offset: dict[str, Offsets],
) -> None:
    for container in container_ids:
        if container not in idx.pos:
            continue
        found = find_node_in_children(idx, container, tags)
        for tag in tags:
            if not found[tag]:
                continue
            tag_offsets = node_content_offsets(idx, textnode_offset, found[tag])
            skip: set[int] = set()
            if tag in nested_tags:
                skip = remove_nested_node(idx, list(tag_offsets.keys()))
            name = SUB_ELEMENT_ANNOTATION_NAME[tag]
            bucket = annotation_offset.setdefault(name, {})
            for nid, span in tag_offsets.items():
                if nid not in skip:
                    bucket[nid] = span


def annotation_offsets(
    html_or_doc: str | Element,
    annotation_to_nodeids: dict[int, list[int]] | None = None,
    add_html_title: bool = True,
    vdom: dict | None = None,
    binary: bool = False,
) -> tuple[str | bytes, dict[str, Offsets]]:
    """-> (primary_text, {annotation_name: {node_id: (start, end)}}).

    ``vdom`` (node_id -> VDomFeatures) activates the InvisibleText
    annotation; without it every node is visible and the key is absent
    (same neutral default as the renderer). ``binary=True`` returns
    utf-8 bytes and byte offsets."""
    if isinstance(html_or_doc, Element):
        doc = html_or_doc
    else:
        doc = parse_html(html_or_doc)
        instrument(doc)
    idx = RenderIndex(doc)

    ann = {k: sorted(v, reverse=True) for k, v in (annotation_to_nodeids or {}).items()}
    if _PRIMARY not in ann:
        ann[_PRIMARY] = sorted(
            (
                idx.elements[p].node_id
                for p in range(len(idx.elements))
                if idx.is_textnode[p]
            ),
            reverse=True,
        )
    primary_nodeids = ann[_PRIMARY]
    if len(primary_nodeids) == 0:
        return (b" " if binary else " "), {}

    text, textnode_offset = render_content(
        doc, primary_nodeids, add_html_title=add_html_title, vdom=vdom
    )

    annotation_offset: dict[str, Offsets] = {}

    title_el = idx.title
    if add_html_title and title_el is not None and title_el.node_id in textnode_offset:
        annotation_offset["HtmlTitle"] = {
            title_el.node_id: textnode_offset[title_el.node_id]
        }

    if _TITLE in ann:
        annotation_offset["Title"] = title_content_offsets(
            idx, textnode_offset, ann[_TITLE]
        )
    if _HEADING in ann:
        annotation_offset["Heading"] = node_content_offsets(
            idx, textnode_offset, ann[_HEADING]
        )
    if _PARAGRAPH in ann:
        annotation_offset["Paragraph"] = node_content_offsets(
            idx, textnode_offset, ann[_PARAGRAPH]
        )

    if _TABLE in ann:
        _expand_sub_elements(
            idx,
            textnode_offset,
            ann[_TABLE],
            TABLE_ELEMENT,
            frozenset({"tr", "td"}),
            annotation_offset,
        )
        annotation_offset["Table"] = node_content_offsets(
            idx, textnode_offset, ann[_TABLE]
        )

    if _LIST in ann:
        _expand_sub_elements(
            idx,
            textnode_offset,
            ann[_LIST],
            LIST_ELEMENT,
            frozenset({"li"}),
            annotation_offset,
        )
        annotation_offset["List"] = node_content_offsets(
            idx, textnode_offset, ann[_LIST]
        )

    if vdom is not None:
        from neuscraper_ray.vdom import is_visible

        inv_start = inv_end = inv_first_nid = -1
        for tid, span in textnode_offset.items():
            if title_el is not None and tid == title_el.node_id:
                continue
            f = vdom.get(tid)
            visible = True if f is None else is_visible(f)
            if not visible:
                if inv_start == -1:
                    inv_start = span[0]
                    inv_first_nid = tid
                inv_end = span[0]  # reference quirk: start offset as end
            elif inv_start != -1 and inv_end != -1:
                annotation_offset.setdefault("InvisibleText", {})[inv_first_nid] = (
                    inv_start,
                    inv_end,
                )
                inv_start = inv_end = inv_first_nid = -1
        if inv_start != -1 and inv_end != -1:
            annotation_offset.setdefault("InvisibleText", {})[inv_first_nid] = (
                inv_start,
                inv_end,
            )

    if binary:
        # re-measure the same boundaries in utf-8 bytes
        cum = _char_to_byte_table(text)
        annotation_offset = {
            name: {nid: (cum[s], cum[e]) for nid, (s, e) in spans.items()}
            for name, spans in annotation_offset.items()
        }
        return text.encode("utf-8"), annotation_offset

    return text, annotation_offset


def _char_to_byte_table(text: str) -> list[int]:
    """cum[i] = byte length of text[:i] (offset boundary conversion)."""
    cum = [0] * (len(text) + 1)
    total = 0
    for i, ch in enumerate(text):
        total += len(ch.encode("utf-8"))
        cum[i + 1] = total
    return cum


# ------------------------------------------------------ pipeline stage

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_LIST_TAGS = frozenset({"ul", "ol"})


def structural_annotations(idx: RenderIndex) -> dict[int, list[int]]:
    """Derive an annotation stream from the markup itself (the
    stand-in for ClueWeb22's annotation sidecar, which the synthetic
    corpus does not carry): headings, paragraphs, tables, lists."""
    ann: dict[int, list[int]] = {}
    for el in idx.elements:
        t = el.tag
        if t in _HEADING_TAGS:
            ann.setdefault(_HEADING, []).append(el.node_id)
        elif t == "p":
            ann.setdefault(_PARAGRAPH, []).append(el.node_id)
        elif t == "table":
            ann.setdefault(_TABLE, []).append(el.node_id)
        elif t in _LIST_TAGS:
            ann.setdefault(_LIST, []).append(el.node_id)
    return ann


def export_annotations_batch(batch):
    """Vectorizable map_batches body: pages (url, html) -> one row per
    annotation span: (url, annotation, node_id, start, end) — the
    M15 export surface as a flat, writable table."""
    import pyarrow as pa

    urls_out: list[str] = []
    names: list[str] = []
    nids: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    from neuscraper_ray.stages.extract import decode_html

    for url, html in zip(
        batch.column("url").to_pylist(), batch.column("html").to_pylist()
    ):
        if isinstance(html, (bytes, bytearray)):
            html = decode_html(html)  # M1: utf-8 -> latin-1 fallback
        doc = parse_html(html)
        instrument(doc)
        idx = RenderIndex(doc)
        _, ann = annotation_offsets(doc, structural_annotations(idx))
        for name, spans in ann.items():
            for nid, (s, e) in spans.items():
                urls_out.append(url)
                names.append(name)
                nids.append(nid)
                starts.append(s)
                ends.append(e)
    return pa.table(
        {
            "url": pa.array(urls_out, pa.string()),
            "annotation": pa.array(names, pa.string()),
            "node_id": pa.array(nids, pa.int64()),
            "start": pa.array(starts, pa.int64()),
            "end": pa.array(ends, pa.int64()),
        }
    )
