"""VDOM visual-feature parsing (M6 parity).

ClueWeb22 ships one encoded visual-feature string per DOM node
(``nodeRawFeature``); the reference parses it with the regex
``([a-z][a-z])(\\d+)`` into a 30-field struct and serializes it in a
fixed order (``/root/reference/src/api/AnnotateHtmlApi.py:13,84-130,
804-837``). This module reproduces that parse/serialize contract as
pure functions producing a ``VDomFeatures`` dataclass or the 30-int
array directly (the Arrow-friendly form: ``fixed_size_list<int32, 30>``),
plus the inheritance rule (a node missing features inherits its
parent's; otherwise zero-init) and the two rules the renderer consumes:
``is_visible`` and ``has_margin_between``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

REGEX_PATTERN = re.compile(r"([a-z][a-z])(\d+)")

# serialization order (AnnotateHtmlApi.py:804-837)
FIELD_ORDER = [
    "position_x", "position_y", "position_w", "position_h",
    "offset_left", "offset_top", "offset_w", "offset_h",
    "client_left", "client_top", "client_w", "client_h",
    "font_color_a", "font_color_r", "font_color_b", "font_color_g",
    "font_weight", "font_size", "font_italic", "font_decoration",
    "list_style", "display_style", "cursor_style", "line_height",
    "text_transform", "opacity",
    "border_style_left", "border_style_top",
    "border_style_right", "border_style_bottom",
]

# attribute code -> field (AnnotateHtmlApi.py:88-130); "id" carries the
# node id and is returned separately
ATTR_TO_FIELD = {
    "px": "position_x", "py": "position_y", "pw": "position_w", "ph": "position_h",
    "ol": "offset_left", "ot": "offset_top", "ow": "offset_w", "oh": "offset_h",
    "cl": "client_left", "ct": "client_top", "cw": "client_w", "ch": "client_h",
    "ca": "font_color_a", "cr": "font_color_r", "cb": "font_color_b", "cg": "font_color_g",
    "fw": "font_weight", "fs": "font_size", "fi": "font_italic", "fd": "font_decoration",
    "lt": "list_style", "di": "display_style", "cu": "cursor_style", "lh": "line_height",
    "tt": "text_transform", "op": "opacity",
    "bl": "border_style_left", "bt": "border_style_top",
    "br": "border_style_right", "bb": "border_style_bottom",
}


@dataclass
class VDomFeatures:
    position_x: int = 0
    position_y: int = 0
    position_w: int = 0
    position_h: int = 0
    offset_left: int = 0
    offset_top: int = 0
    offset_w: int = 0
    offset_h: int = 0
    client_left: int = 0
    client_top: int = 0
    client_w: int = 0
    client_h: int = 0
    font_color_a: int = 0
    font_color_r: int = 0
    font_color_b: int = 0
    font_color_g: int = 0
    font_weight: int = 0
    font_size: int = 0
    font_italic: int = 0
    font_decoration: int = 0
    list_style: int = 0
    display_style: int = 0
    cursor_style: int = 0
    line_height: int = 0
    text_transform: int = 0
    opacity: int = 0
    border_style_left: int = 0
    border_style_top: int = 0
    border_style_right: int = 0
    border_style_bottom: int = 0

    def to_array(self) -> list[int]:
        """30-int array in the reference serialization order."""
        return [getattr(self, f) for f in FIELD_ORDER]


def parse_node_raw_feature(attribute_str: str) -> tuple[int, VDomFeatures]:
    """-> (node_id, features). Unknown codes ignored, like the reference."""
    f = VDomFeatures()
    node_id = 0
    for m in REGEX_PATTERN.finditer(attribute_str):
        code, value = m.group(1), int(m.group(2))
        if code == "id":
            node_id = value
        else:
            name = ATTR_TO_FIELD.get(code)
            if name is not None:
                setattr(f, name, value)
    return node_id, f


def inherit_missing(
    features: dict[int, VDomFeatures], parent_of: dict[int, int], node_ids: list[int]
) -> dict[int, VDomFeatures]:
    """Nodes with no feature record inherit the nearest ancestor's
    (AnnotateHtmlApi.py:179-190); roots zero-init."""
    out = dict(features)
    for nid in node_ids:
        if nid in out:
            continue
        cur = nid
        seen = set()
        while cur in parent_of and cur not in seen:
            seen.add(cur)
            cur = parent_of[cur]
            if cur in out:
                out[nid] = out[cur]
                break
        else:
            out[nid] = VDomFeatures()
    return out


def is_visible(f: VDomFeatures) -> bool:
    """AnnotateHtmlApi.py:599-609 (sans the dead title check)."""
    return not (f.position_w <= 2 or f.position_h <= 2 or f.opacity == 0)


def has_margin_between(prev: VDomFeatures | None, curr: VDomFeatures) -> bool:
    """AnnotateHtmlApi.py:691-703: visual gap or offset >= 5px."""
    if prev is None:
        return True
    if prev.position_x + prev.position_w + 5 <= curr.position_x:
        return True
    return curr.offset_left >= 5 or curr.client_left >= 5
