"""VDOM feature parse (M6) + visual rules feeding the renderer."""

from neuscraper_ray.domparse import instrument, iter_elements, parse_html
from neuscraper_ray.render import render_content
from neuscraper_ray.vdom import (
    FIELD_ORDER,
    VDomFeatures,
    has_margin_between,
    inherit_missing,
    is_visible,
    parse_node_raw_feature,
)


def test_parse_raw_feature():
    nid, f = parse_node_raw_feature("id12px100py200pw300ph40op100fw700fs16")
    assert nid == 12
    assert (f.position_x, f.position_y, f.position_w, f.position_h) == (100, 200, 300, 40)
    assert f.opacity == 100 and f.font_weight == 700 and f.font_size == 16
    assert f.border_style_left == 0  # untouched fields zero-init


def test_serialization_order_is_30_fields():
    f = VDomFeatures(position_x=1, border_style_bottom=9)
    arr = f.to_array()
    assert len(arr) == len(FIELD_ORDER) == 30
    assert arr[0] == 1 and arr[-1] == 9


def test_visibility_and_margin_rules():
    vis = VDomFeatures(position_w=100, position_h=20, opacity=100)
    hid = VDomFeatures(position_w=1, position_h=20, opacity=100)
    clear = VDomFeatures(position_w=100, position_h=20, opacity=0)
    assert is_visible(vis) and not is_visible(hid) and not is_visible(clear)
    a = VDomFeatures(position_x=0, position_w=50)
    b_far = VDomFeatures(position_x=100)
    b_near = VDomFeatures(position_x=52)
    assert has_margin_between(a, b_far)
    assert not has_margin_between(a, b_near)
    assert has_margin_between(None, b_near)
    assert has_margin_between(a, VDomFeatures(position_x=52, offset_left=7))


def test_inherit_missing_walks_ancestors():
    feats = {0: VDomFeatures(font_size=20)}
    parent_of = {2: 1, 1: 0}
    out = inherit_missing(feats, parent_of, [0, 1, 2, 5])
    assert out[2].font_size == 20 and out[1].font_size == 20
    assert out[5].font_size == 0  # orphan zero-inits


def test_render_visibility_rule_fires_with_vdom():
    html = "<html><body><p><b>one</b><i>two</i></p></body></html>"
    doc = parse_html(html)
    instrument(doc)
    tn = [
        el.node_id
        for el in iter_elements(doc)
        if el.instrument and el.parent is not None and el.parent.tag != "noscript"
    ]
    # without vdom: inline same-block -> no separator
    text, _ = render_content(doc, tn, add_html_title=False)
    assert text == "onetwo"
    # with vdom: first visible, second hidden -> visibility change -> \n
    vdom = {
        tn[0]: VDomFeatures(position_w=100, position_h=20, opacity=100),
        tn[1]: VDomFeatures(position_w=1, position_h=20, opacity=100),
    }
    text2, _ = render_content(doc, tn, add_html_title=False, vdom=vdom)
    assert text2 == "one\ntwo"
