"""M15 parity tests: annotation offset export
(reference AnnotateHtmlApi.py:295-488 semantics over our tree)."""

import pytest

from neuscraper_ray.annotation_export import (
    annotation_offsets,
    find_node_in_children,
    remove_nested_node,
)
from neuscraper_ray.domparse import instrument, parse_html, subtree_text
from neuscraper_ray.labels import ANNOTATION_TYPES
from neuscraper_ray.render import RenderIndex

HTML = (
    "<html><head><title>My Page</title></head><body>"
    "<h1>Big Heading</h1>"
    "<p>First paragraph text.</p>"
    "<table><tr><td>cell one</td><td>cell two</td></tr>"
    "<tr><td><table><tr><td>inner cell</td></tr></table></td></tr></table>"
    "<ul><li>item one<ul><li>nested item</li></ul></li><li>item two</li></ul>"
    "</body></html>"
)


def _doc_and_index(html=HTML):
    doc = parse_html(html)
    instrument(doc)
    return doc, RenderIndex(doc)


def _ids_by_tag(idx, tag):
    return [el.node_id for el in idx.elements if el.tag == tag]


def test_default_primary_and_html_title():
    doc, idx = _doc_and_index()
    text, ann = annotation_offsets(doc)
    assert text.startswith("My Page")
    s, e = ann["HtmlTitle"][idx.title.node_id]
    assert text[s:e] == "My Page"


def test_heading_paragraph_spans_slice_text():
    doc, idx = _doc_and_index()
    h1 = _ids_by_tag(idx, "h1")
    p = _ids_by_tag(idx, "p")
    text, ann = annotation_offsets(
        doc,
        {ANNOTATION_TYPES["Heading"]: h1, ANNOTATION_TYPES["Paragraph"]: p},
    )
    (s, e) = ann["Heading"][h1[0]]
    assert text[s:e] == "Big Heading"
    (s, e) = ann["Paragraph"][p[0]]
    assert text[s:e] == "First paragraph text."


def test_table_expansion_keeps_outermost_rows_and_cells():
    doc, idx = _doc_and_index()
    tables = _ids_by_tag(idx, "table")
    outer = min(tables)  # ancestors have smaller stack-order ids
    text, ann = annotation_offsets(doc, {ANNOTATION_TYPES["Table"]: [outer]})
    # outer table has 2 rows; the inner table's row must be skipped
    tr_ids = set(ann["TableRow"].keys())
    all_tr = set(_ids_by_tag(idx, "tr"))
    assert tr_ids < all_tr and len(tr_ids) == 2
    # cells: the outer td that CONTAINS the inner table covers the inner
    # td, so only outermost cells remain
    td_ids = set(ann["TableCell"].keys())
    inner_td_texts = {text[s:e] for s, e in ann["TableCell"].values()}
    assert "cell one" in inner_td_texts and "cell two" in inner_td_texts
    for td in td_ids:
        for other in td_ids:
            if td == other:
                continue
            # no reported cell contains another reported cell
            p1, p2 = idx.pos[td], idx.pos[other]
            assert not (p1 < p2 < idx.sub_end[p1])
    (s, e) = ann["Table"][outer]
    assert text[s:e].startswith("cell one")


def test_list_expansion_keeps_outermost_items():
    doc, idx = _doc_and_index()
    uls = _ids_by_tag(idx, "ul")
    outer = min(uls)
    text, ann = annotation_offsets(doc, {ANNOTATION_TYPES["List"]: [outer]})
    li_ids = set(ann["ListItem"].keys())
    assert len(li_ids) == 2  # "item one" (covers nested) and "item two"
    spans = {text[s:e] for s, e in ann["ListItem"].values()}
    assert any(t.startswith("item one") for t in spans)
    assert "item two" in spans
    assert "nested item" not in spans  # nested li skipped


def test_title_annotation_keys_on_parent_and_extends():
    # two text nodes under DISTINCT parents -> two Title entries
    html = "<html><body><div><b>part one</b><b>part two</b></div></body></html>"
    doc, idx = _doc_and_index(html)
    tids = [el.node_id for p, el in enumerate(idx.elements) if idx.is_textnode[p]]
    assert len(tids) == 2
    text, ann = annotation_offsets(doc, {ANNOTATION_TYPES["Title"]: tids})
    assert len(ann["Title"]) == 2
    covered = sorted(text[s:e] for s, e in ann["Title"].values())
    assert covered == ["part one", "part two"]

    # two text nodes under the SAME parent -> one entry, end extended
    html2 = "<html><body><div>part one<br>part two</div></body></html>"
    doc2, idx2 = _doc_and_index(html2)
    tids2 = [el.node_id for p, el in enumerate(idx2.elements) if idx2.is_textnode[p]]
    assert len(tids2) == 2
    text2, ann2 = annotation_offsets(doc2, {ANNOTATION_TYPES["Title"]: tids2})
    assert len(ann2["Title"]) == 1
    (s, e) = next(iter(ann2["Title"].values()))
    assert text2[s:e].startswith("part one") and text2[s:e].endswith("part two")


def test_empty_primary_quirks():
    doc, _ = _doc_and_index()
    text, ann = annotation_offsets(doc, {ANNOTATION_TYPES["Primary"]: []})
    assert text == " " and ann == {}
    btext, bann = annotation_offsets(
        doc, {ANNOTATION_TYPES["Primary"]: []}, binary=True
    )
    assert btext == b" " and bann == {}


def test_invisible_text_runs_with_start_as_end_quirk():
    from neuscraper_ray.vdom import VDomFeatures

    doc, idx = _doc_and_index()
    text, _ = annotation_offsets(doc)
    # mark the two table-cell text nodes of the first row invisible
    tn = [
        el.node_id
        for p, el in enumerate(idx.elements)
        if idx.is_textnode[p] and subtree_text(el).strip() in ("cell one", "cell two")
    ]
    vdom = {}
    for nid in tn:
        f = VDomFeatures()
        f.position_w = 0
        vdom[nid] = f
    t2, ann = annotation_offsets(doc, vdom=vdom)
    assert "InvisibleText" in ann
    assert len(ann["InvisibleText"]) == 1  # consecutive run merges
    (s, e) = next(iter(ann["InvisibleText"].values()))
    # reference quirk: end is the START offset of the last invisible node
    assert t2[s:].startswith("cell one")
    assert t2[e:].startswith("cell two")


def test_binary_offsets_on_unicode():
    html = "<html><head><title>Tîtle ✓</title></head><body><p>bödy ţext</p></body></html>"
    doc, idx = _doc_and_index(html)
    text, ann = annotation_offsets(doc, {ANNOTATION_TYPES["Paragraph"]: _ids_by_tag(idx, "p")})
    btext, bann = annotation_offsets(
        doc, {ANNOTATION_TYPES["Paragraph"]: _ids_by_tag(idx, "p")}, binary=True
    )
    assert btext == text.encode("utf-8")
    for name in ann:
        for nid, (s, e) in ann[name].items():
            bs, be = bann[name][nid]
            assert btext[bs:be] == text[s:e].encode("utf-8")


def test_remove_nested_node_id_range_semantics():
    doc, idx = _doc_and_index()
    tables = sorted(_ids_by_tag(idx, "table"))
    trs = _ids_by_tag(idx, "tr")
    # outer table covers every tr
    skip = remove_nested_node(idx, tables + trs)
    assert set(trs) <= skip or len(skip) >= len(trs) - 1  # boundary quirk may
    # spare the subtree's max-id node (exclusive upper bound)
    # a leaf never covers anything
    assert remove_nested_node(idx, [trs[0]]) == set()


def test_find_node_in_children_includes_self():
    doc, idx = _doc_and_index()
    tr = _ids_by_tag(idx, "tr")[0]
    found = find_node_in_children(idx, tr, ("tr", "td"))
    assert tr in found["tr"]
    assert len(found["td"]) >= 1
