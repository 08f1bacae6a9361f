"""Unit tests for the DOM layer (reference semantics: stack-order ids,
span-text skip, noscript exclusion, ol/dl/table container rule, strip)."""

from neuscraper_ray.domparse import (
    STRIP_CHARS,
    extract_node_sequence,
    instrument,
    iter_elements,
    parse_html,
    subtree_text,
)


def _ids(html):
    doc = parse_html(html)
    instrument(doc)
    return {el.tag: el.node_id for el in iter_elements(doc)}


def test_stack_order_reverses_siblings():
    # reference pops a LIFO stack => last sibling's subtree numbered first
    html = "<html><a></a><b><c></c></b></html>"
    doc = parse_html(html)
    instrument(doc)
    els = {el.tag: el.node_id for el in iter_elements(doc)}
    assert els["html"] == 0
    assert els["b"] == 1  # last child popped first
    assert els["c"] == 2
    assert els["a"] == 3


def test_text_wrapped_in_instrument_span():
    doc = parse_html("<div>hello</div>")
    instrument(doc)
    els = list(iter_elements(doc))
    assert [e.tag for e in els] == ["div", "span"]
    assert els[1].instrument and els[1].node_id == 1
    assert subtree_text(els[1]) == "hello"


def test_span_text_never_wrapped():
    # reference: `if node.name == "span" and isinstance(child, str): continue`
    seq = extract_node_sequence("<html><span>orphan text</span></html>")
    assert seq == []  # the span's text never becomes a text node


def test_noscript_text_excluded():
    seq = extract_node_sequence(
        "<html><noscript>enable js</noscript><div>real</div></html>"
    )
    texts = [t for _, t, _, _, _ in seq]
    assert texts == ["real"]


def test_container_emitted_even_when_empty():
    seq = extract_node_sequence("<html><table></table><div>x</div></html>")
    by_tag = {tag: (text, has) for _, text, tag, _, has in seq}
    assert by_tag["table"] == ("", False)
    assert by_tag["#text"] == ("x", True)


def test_container_text_duplicates_descendants():
    seq = extract_node_sequence("<html><table><tr><td>a</td><td>b</td></tr></table></html>")
    tags = [tag for _, _, tag, _, _ in seq]
    texts = [t for _, t, _, _, _ in seq]
    assert tags[0] == "table" and texts[0] == "ab"
    assert set(texts[1:]) == {"a", "b"}


def test_strip_chars_and_empty_dropped():
    seq = extract_node_sequence("<html><p>\xa0 \t\r\n</p><p>\xa0 hi \t</p></html>")
    assert [t for _, t, _, _, _ in seq] == ["hi"]


def test_only_first_toplevel_fragment_numbered():
    # reference instruments soup.find_all()[0] only
    seq = extract_node_sequence("<div>first</div><div>second</div>")
    assert [t for _, t, _, _, _ in seq] == ["first"]


def test_node_zero_is_root():
    doc = parse_html("<html><body>t</body></html>")
    n = instrument(doc)
    assert n == 3  # html, body, wrapper span
    els = list(iter_elements(doc))
    assert els[0].tag == "html" and els[0].node_id == 0


def test_document_order_emission_with_stack_ids():
    # two paragraphs: doc order p1 then p2, but p2 subtree has smaller ids? No:
    # stack numbering gives LAST sibling the lower id; emission stays doc order.
    seq = extract_node_sequence("<html><p>one</p><p>two</p></html>")
    texts = [t for _, t, _, _, _ in seq]
    ids = [i for i, _, _, _, _ in seq]
    assert texts == ["one", "two"]
    assert ids[0] > ids[1]  # first-in-document got the higher id


def test_void_elements_do_not_nest():
    seq = extract_node_sequence("<html><p>a<br>b</p></html>")
    texts = [t for _, t, _, _, _ in seq]
    assert texts == ["a", "b"]


def test_strip_constant_matches_reference():
    assert STRIP_CHARS == "\r\n\t\xa0 "


def _tree_sig(el):
    out = []
    stack = [el]
    while stack:
        node = stack.pop()
        if isinstance(node, str):
            out.append(("#str", node))
        else:
            out.append(("#el", node.tag))
            stack.extend(reversed(node.children))
    return out


def test_scanner_equivalent_to_stdlib_backend():
    from neuscraper_ray.domparse import parse_html_stdlib
    from neuscraper_ray.synth import gen_pages
    from neuscraper_ray.stages.extract import decode_html

    pages = gen_pages(120, seed=42, start=7000)
    for raw in pages.column("html").to_pylist():
        h = decode_html(raw)
        assert _tree_sig(parse_html(h)) == _tree_sig(parse_html_stdlib(h))


def test_scanner_handles_rawtext_and_junk():
    seq = extract_node_sequence(
        "<html><script>if (a<b) { alert('<p>not a tag</p>'); }</script>"
        "<style>p { color: red }</style><p>real</p></html>"
    )
    texts = [t for _, t, _, _, _ in seq]
    # script/style text ARE text nodes in the reference (only noscript
    # is excluded); content is raw, instrumented like any bare string
    assert "real" in texts
    assert any("alert" in t for t in texts)
    assert any("color" in t for t in texts)


def test_scanner_entities_and_comments():
    seq = extract_node_sequence(
        "<html><!-- a comment --><p>a &amp; b &lt;c&gt;</p><!DOCTYPE junk></html>"
    )
    assert [t for _, t, _, _, _ in seq] == ["a & b <c>"]


def test_chunk_boundaries_384_385():
    from neuscraper_ray.domparse import chunk_sequence

    assert chunk_sequence(0) == []
    assert chunk_sequence(1) == [(0, 1)]
    assert chunk_sequence(384) == [(0, 384)]
    assert chunk_sequence(385) == [(0, 384), (384, 385)]
    assert chunk_sequence(768) == [(0, 384), (384, 768)]
    assert chunk_sequence(10, chunk_size=4) == [(0, 4), (4, 8), (8, 10)]
