"""Property-based equivalence: the regex-scanner parser must build the
same tree as the stdlib html.parser backend on arbitrary well-formed
HTML (hypothesis-generated)."""

import hypothesis.strategies as st
from hypothesis import given, settings

from neuscraper_ray.domparse import (
    extract_node_sequence,
    instrument,
    parse_html,
    parse_html_stdlib,
)

_TAGS = ["div", "p", "span", "b", "table", "ol", "li", "noscript", "em", "section"]
_VOID = ["br", "img", "hr"]
_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="<>&\x00", categories=("L", "N", "P", "Zs")
    ),
    max_size=20,
)


@st.composite
def html_node(draw, depth=0):
    kind = draw(st.integers(0, 5))
    if depth >= 3 or kind == 0:
        return draw(_TEXT)
    if kind == 1:
        return f"<{draw(st.sampled_from(_VOID))}>"
    tag = draw(st.sampled_from(_TAGS))
    children = draw(st.lists(html_node(depth=depth + 1), max_size=4))
    return f"<{tag}>" + "".join(children) + f"</{tag}>"


@st.composite
def html_doc(draw):
    body = "".join(draw(st.lists(html_node(), min_size=1, max_size=5)))
    return f"<html><body>{body}</body></html>"


def _sig(doc):
    out = []
    stack = [doc]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(("t", n))
        else:
            out.append(("e", n.tag))
            stack.extend(reversed(n.children))
    return out


@given(html_doc())
@settings(max_examples=200, deadline=None)
def test_scanner_matches_stdlib_on_generated_html(html):
    assert _sig(parse_html(html)) == _sig(parse_html_stdlib(html))


@given(html_doc())
@settings(max_examples=100, deadline=None)
def test_extraction_total_and_deterministic(html):
    seq1 = extract_node_sequence(html)
    seq2 = extract_node_sequence(html)
    assert seq1 == seq2
    ids = [nid for nid, _, _, _, _ in seq1]
    assert len(ids) == len(set(ids))  # node ids unique
    for _, text, tag, is_tn, has_text in seq1:
        if is_tn:
            assert text  # text nodes only emitted when non-empty
        assert has_text == (len(text) > 0)


@given(html_doc(), st.integers(2, 7))
@settings(max_examples=50, deadline=None)
def test_instrument_ids_dense(html, _):
    doc = parse_html(html)
    n = instrument(doc)
    from neuscraper_ray.domparse import iter_elements

    ids = sorted(el.node_id for el in iter_elements(doc) if el.node_id is not None)
    assert ids == list(range(n))
