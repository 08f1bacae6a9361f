"""Stdlib protobuf wire decoder for the ClueWeb22 AnnotateHtml sidecar
(S3): round-trips, wire-format edge cases, and the zip-source
integration feeding vdom + label projection."""

import os

import pyarrow as pa
import pytest

from neuscraper_ray.sources.protowire import (
    ANNOTATE_HTML_SCHEMA,
    NODE_ANNOTATION_SCHEMA,
    WireError,
    decode_annotate_html,
    decode_message,
    encode_message,
    iter_fields,
    _varint,
    _tag,
)


def _sample_msg() -> dict:
    return {
        "url": "https://example.org/a",
        "urlhash": "ABCD",
        "language": "en",
        "topic": ["news", "sports"],
        "htmlByte": "<html><body><p>hi</p></body></html>".encode(),
        "annotations": [
            {"nodeId": 3, "type": 1},
            {"nodeId": 7, "type": 4},
        ],
        "nodeRawFeature": ["id3px10py20pw30ph40fs12", "id7px0py0pw5ph5fs0"],
        "cw22id": "clueweb22-en0001-01-00000",
    }


def test_roundtrip_annotate_html():
    payload = encode_message(_sample_msg(), ANNOTATE_HTML_SCHEMA)
    row = decode_annotate_html(payload)
    assert row["url"] == "https://example.org/a"
    assert row["topic"] == ["news", "sports"]
    assert row["html"].startswith("<html>")
    assert row["annotation_node_ids"] == [3, 7]
    assert row["annotation_types"] == [1, 4]
    assert row["node_raw_features"][0].startswith("id3px10")
    assert row["cw22id"].endswith("00000")


def test_defaults_for_missing_fields():
    row = decode_message(b"", ANNOTATE_HTML_SCHEMA)
    assert row["url"] == "" and row["topic"] == [] and row["htmlByte"] == b""
    assert row["annotations"] == []


def test_unknown_fields_skipped():
    # append an unknown field no=99 (varint) and no=100 (bytes)
    payload = encode_message(_sample_msg(), ANNOTATE_HTML_SCHEMA)
    extra = _tag(99, 0) + _varint(12345) + _tag(100, 2) + _varint(3) + b"xyz"
    row = decode_annotate_html(payload + extra)
    assert row["url"] == "https://example.org/a"


def test_negative_int32_varint():
    # protobuf encodes negative int32 as 10-byte two's-complement varint
    body = encode_message({"nodeId": -5, "type": 2}, NODE_ANNOTATION_SCHEMA)
    out = decode_message(body, NODE_ANNOTATION_SCHEMA)
    assert out["nodeId"] == -5 and out["type"] == 2


def test_packed_repeated_varints():
    # topic is a string field; use a synthetic schema with repeated int32
    schema = {1: ("xs", "int32", True)}
    packed = _varint(1) + _varint(2) + _varint(300)
    buf = _tag(1, 2) + _varint(len(packed)) + packed
    assert decode_message(buf, schema)["xs"] == [1, 2, 300]
    # unpacked form decodes identically
    buf2 = b"".join(_tag(1, 0) + _varint(v) for v in (1, 2, 300))
    assert decode_message(buf2, schema)["xs"] == [1, 2, 300]


def test_truncated_payload_raises():
    payload = encode_message(_sample_msg(), ANNOTATE_HTML_SCHEMA)
    with pytest.raises(WireError):
        list(iter_fields(payload[:-3]))


def test_zip_source_decodes_annotate_html_end_to_end(tmp_path):
    """S3 integration: zip of AnnotateHtml blobs -> Dataset rows ->
    vdom feature parse + annotation projection inputs."""
    from neuscraper_ray.sources.zipblobs import read_zip_blobs, write_zip_blobs
    from neuscraper_ray.vdom import parse_node_raw_feature

    members = []
    for i in range(4):
        m = _sample_msg()
        m["url"] = f"https://example.org/{i}"
        m["cw22id"] = f"clueweb22-en0001-01-{i:05d}"
        members.append((m["cw22id"] + ".bin", encode_message(m, ANNOTATE_HTML_SCHEMA)))
    members.append(("bad.bin", b"\x00\x01garbage"))  # undecodable: skipped
    zp = os.path.join(tmp_path, "vdom.zip")
    write_zip_blobs(zp, members)

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("cw22id", pa.string()),
            ("html", pa.string()),
            ("annotation_node_ids", pa.list_(pa.int32())),
            ("annotation_types", pa.list_(pa.int32())),
            ("node_raw_features", pa.list_(pa.string())),
        ]
    )
    ds = read_zip_blobs(zp, lambda name, b: decode_annotate_html(b), schema)
    rows = sorted(ds.take_all(), key=lambda r: r["url"])
    assert len(rows) == 4  # bad member skipped, like the reference
    node_id, feats = parse_node_raw_feature(rows[0]["node_raw_features"][0])
    assert node_id == 3 and feats.position_x == 10 and feats.font_size == 12
    assert list(rows[0]["annotation_types"]) == [1, 4]


def test_vdom_features_schema_roundtrip():
    """The VDomFeatures message schema matches vdom.FIELD_ORDER
    (field numbers 1-30 in serialization order) and round-trips."""
    from neuscraper_ray.sources.protowire import VDOM_FEATURES_SCHEMA
    from neuscraper_ray.vdom import FIELD_ORDER

    assert [VDOM_FEATURES_SCHEMA[i + 1][0] for i in range(30)] == FIELD_ORDER
    vals = {name: i * 3 - 5 for i, name in enumerate(FIELD_ORDER)}
    buf = encode_message(vals, VDOM_FEATURES_SCHEMA)
    assert decode_message(buf, VDOM_FEATURES_SCHEMA) == vals


from hypothesis import given, settings
from hypothesis import strategies as st

_i32 = st.integers(-(2**31), 2**31 - 1)


@settings(max_examples=200, deadline=None)
@given(
    url=st.text(max_size=50),
    topic=st.lists(st.text(max_size=10), max_size=5),
    html=st.binary(max_size=200),
    anns=st.lists(st.tuples(_i32, st.integers(0, 6)), max_size=8),
    feats=st.lists(st.text(max_size=30), max_size=6),
)
def test_roundtrip_property(url, topic, html, anns, feats):
    msg = {
        "url": url,
        "urlhash": "h",
        "language": "xx",
        "topic": topic,
        "htmlByte": html,
        "annotations": [{"nodeId": n, "type": t} for n, t in anns],
        "nodeRawFeature": feats,
        "cw22id": "id",
    }
    out = decode_message(encode_message(msg, ANNOTATE_HTML_SCHEMA), ANNOTATE_HTML_SCHEMA)
    assert out == msg
