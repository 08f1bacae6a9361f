"""Annotation -> text-node label projection (M10 parity, train-data path).

Reference (``/root/reference/src/build_train.py:69-90`` +
``src/api/AnnotateHtmlApi.py:263-276``): ClueWeb22 annotations arrive as
``{annotation_type: [node_id, ...]}``; each annotated node expands to
the text nodes of its subtree via ``get_text_nodeids`` — a walk along
the document-order text-node chain from the subtree's first text node
while ``nodeid >= last_textnode.nodeid`` (a quirk of the stack-order
ids, reproduced exactly) — and every covered text node gets a 6-dim
multi-hot label (``labels[ann - 1] = 1``).

Annotation enum (``AnnotateHtml_pb2.py:28-67``):
None=0, Primary=1, Heading=2, Title=3, Paragraph=4, Table=5, List=6.
"""

from __future__ import annotations

from neuscraper_ray.domparse import Element, instrument, parse_html
from neuscraper_ray.render import RenderIndex

N_CLASSES = 6
ANNOTATION_TYPES = {
    "Primary": 1,
    "Heading": 2,
    "Title": 3,
    "Paragraph": 4,
    "Table": 5,
    "List": 6,
}


def _text_chain(idx: RenderIndex) -> tuple[dict[int, int], list[int]]:
    """-> (node_id -> chain position, chain of text node_ids in doc order)."""
    chain = [
        idx.elements[p].node_id
        for p in range(len(idx.elements))
        if idx.is_textnode[p]
    ]
    return {nid: i for i, nid in enumerate(chain)}, chain


def get_text_nodeids(idx: RenderIndex, nodeid: int) -> list[int]:
    """Reference ``get_text_nodeids`` semantics (AnnotateHtmlApi.py:263-276)."""
    if nodeid not in idx.pos:
        return []
    p = idx.pos[nodeid]
    end = idx.sub_end[p]
    # first/last text node of the subtree in document order
    first_p = idx.next_text[p]
    if first_p >= end:
        return []
    last_p = first_p
    q = first_p
    while True:
        q = idx.next_text[q + 1]
        if q >= end:
            break
        last_p = q
    first_id = idx.elements[first_p].node_id
    last_id = idx.elements[last_p].node_id
    chain_pos, chain = _text_chain(idx)
    out = []
    i = chain_pos[first_id]
    while i < len(chain) and chain[i] >= last_id:
        out.append(chain[i])
        i += 1
    return out


def project_annotations(
    html_or_doc: str | Element, annotation_to_nodeids: dict[int, list[int]]
) -> dict[int, list[int]]:
    """-> {text_node_id: [annotation_type, ...]} (build_train.py:69-79)."""
    if isinstance(html_or_doc, Element):
        doc = html_or_doc
    else:
        doc = parse_html(html_or_doc)
        instrument(doc)
    idx = RenderIndex(doc)
    node_to_ann: dict[int, list[int]] = {}
    for ann, node_list in annotation_to_nodeids.items():
        for node in node_list:
            for tn in get_text_nodeids(idx, node):
                node_to_ann.setdefault(tn, []).append(ann)
    return node_to_ann


def compute_labels(
    node_sequence: list[int], node2ann: dict[int, list[int]]
) -> list[list[int]]:
    """Multi-hot per sequence node (build_train.py:81-90)."""
    out = []
    for node in node_sequence:
        labels = [0] * N_CLASSES
        for ann in node2ann.get(node, ()):
            labels[ann - 1] = 1
        out.append(labels)
    return out
