"""M14 renderer: separator rules + offsets (AnnotateHtmlApi.py:492-738)."""

from neuscraper_ray.domparse import instrument, iter_elements, parse_html
from neuscraper_ray.render import render_content


def _ids_in_doc_order(html):
    doc = parse_html(html)
    instrument(doc)
    ids = [
        el.node_id
        for el in iter_elements(doc)
        if el.instrument and el.parent is not None and el.parent.tag != "noscript"
    ]
    return doc, ids


def test_block_boundary_newline():
    doc, ids = _ids_in_doc_order("<html><body><p>one</p><p>two</p></body></html>")
    text, offs = render_content(doc, ids, add_html_title=False)
    assert text == "one\ntwo"
    assert sorted(offs.values()) == [(0, 3), (4, 7)]


def test_br_newline_within_block():
    doc, ids = _ids_in_doc_order("<html><body><p>a<br>b</p></body></html>")
    text, _ = render_content(doc, ids, add_html_title=False)
    assert text == "a\nb"


def test_inline_same_block_no_separator():
    doc, ids = _ids_in_doc_order(
        "<html><body><p><b>bold</b><i>ital</i></p></body></html>"
    )
    text, _ = render_content(doc, ids, add_html_title=False)
    assert text == "boldital"  # both inline, same block, no margin info


def test_space_between_rule():
    doc, ids = _ids_in_doc_order(
        "<html><body><p><b>one </b><i>two</i></p></body></html>"
    )
    text, _ = render_content(doc, ids, add_html_title=False)
    assert text == "one two"  # raw trailing space -> ' ' separator


def test_punctuation_adjacency():
    doc, ids = _ids_in_doc_order(
        "<html><body><p>end<em>. start</em></p></body></html>"
    )
    # em is inline but p-text is not (parent p is block) -> falls through
    # to punctuation rule: curr starts with punct+space -> ''
    text, _ = render_content(doc, ids, add_html_title=False)
    assert text == "end. start".replace("  ", " ") or text == "end. start"


def test_title_prefix_and_offsets():
    doc, ids = _ids_in_doc_order(
        "<html><head><title> My Title </title></head><body><p>body</p></body></html>"
    )
    # exclude the title's own text node from node_ids (it's in <head>)
    doc2, _ = _ids_in_doc_order("<html></html>")
    text, offs = render_content(doc, ids)
    assert text.startswith("My Title")
    assert "body" in text
    starts = {s for s, _ in offs.values()}
    assert 0 in starts  # title offset entry


def test_unknown_and_empty_ids_skipped():
    doc, ids = _ids_in_doc_order("<html><body><p>x</p><p>\xa0 </p></body></html>")
    text, offs = render_content(doc, [9999] + ids, add_html_title=False)
    assert text == "x" and len(offs) == 1
