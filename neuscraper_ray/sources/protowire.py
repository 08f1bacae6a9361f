"""Minimal protobuf wire-format decoder (stdlib only) for the
ClueWeb22 ``AnnotateHtml`` VDOM sidecar.

The reference decodes zip members with the generated
``AnnotateHtml.ParseFromString`` (ref ``src/build_test.py:144-145``,
schema ``src/api/AnnotateHtml_pb2.py``). No protobuf library exists in
this environment, but the schema is three small messages over
varint/string/bytes fields, and the protobuf wire format is public and
stable: tag = (field_no << 3) | wire_type, wire types 0 (varint),
1 (fixed64), 2 (length-delimited), 5 (fixed32). This module implements
exactly that, schema-driven, so the VDOM zip source (S3) decodes real
``AnnotateHtml`` payloads end-to-end with no third-party dependency.

Schema (field numbers from ``AnnotateHtml_pb2.py``):

- ``AnnotateHtml``: url(1 str), urlhash(2 str), language(3 str),
  topic(4 repeated str), htmlByte(5 bytes),
  annotations(6 repeated NodeAnnotation), nodeRawFeature(7 repeated
  str — the textual per-node visual-feature strings ``vdom.py``
  parses), cw22id(8 str).
- ``NodeAnnotation``: nodeId(1 int32), type(2 enum — the 6-value
  AnnotationType consumed by ``labels.project_annotations``).
- ``VDomFeatures``: 30 int32 fields (numbers 1-30, the order of
  ``vdom.FIELD_ORDER``) — decoded generically when present.

Unknown fields are skipped per protobuf rules; repeated varint fields
accept both packed (wire type 2) and unpacked encodings.
"""

from __future__ import annotations

from typing import Any

# kind: "string" | "bytes" | "int32" | "enum" | nested schema dict
# spec: (name, kind, repeated)
NODE_ANNOTATION_SCHEMA: dict[int, tuple] = {
    1: ("nodeId", "int32", False),
    2: ("type", "enum", False),
}

from neuscraper_ray.vdom import FIELD_ORDER as _VDOM_FIELD_ORDER

VDOM_FEATURES_SCHEMA: dict[int, tuple] = {
    i + 1: (name, "int32", False) for i, name in enumerate(_VDOM_FIELD_ORDER)
}

ANNOTATE_HTML_SCHEMA: dict[int, tuple] = {
    1: ("url", "string", False),
    2: ("urlhash", "string", False),
    3: ("language", "string", False),
    4: ("topic", "string", True),
    5: ("htmlByte", "bytes", False),
    6: ("annotations", NODE_ANNOTATION_SCHEMA, True),
    7: ("nodeRawFeature", "string", True),
    8: ("cw22id", "string", False),
}


class WireError(ValueError):
    pass


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if i >= len(buf):
            raise WireError("truncated varint")
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7
        if shift >= 70:
            raise WireError("varint too long")


def _to_int32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value); value is int (wt 0/1/5) or
    bytes (wt 2)."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field_no, wt = tag >> 3, tag & 7
        if field_no == 0:
            raise WireError("field number 0")
        if wt == 0:
            val, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise WireError("truncated length-delimited field")
            val = buf[i : i + ln]
            i += ln
        elif wt == 1:
            if i + 8 > n:
                raise WireError("truncated fixed64")
            val = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == 5:
            if i + 4 > n:
                raise WireError("truncated fixed32")
            val = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise WireError(f"unsupported wire type {wt}")
        yield field_no, wt, val


def decode_message(buf: bytes, schema: dict[int, tuple]) -> dict[str, Any]:
    """Schema-driven decode; defaults are protobuf defaults ('' / 0 /
    b'' / [] / None for missing nested singulars)."""
    out: dict[str, Any] = {}
    for no, (name, kind, repeated) in schema.items():
        if repeated:
            out[name] = []
        elif kind == "string":
            out[name] = ""
        elif kind == "bytes":
            out[name] = b""
        elif isinstance(kind, dict):
            out[name] = None
        else:
            out[name] = 0
    for no, wt, val in iter_fields(buf):
        spec = schema.get(no)
        if spec is None:
            continue  # unknown field: skip (protobuf rule)
        name, kind, repeated = spec
        if isinstance(kind, dict):
            if wt != 2:
                raise WireError(f"message field {name} with wire type {wt}")
            v = decode_message(val, kind)
            if repeated:
                out[name].append(v)
            else:
                out[name] = v
        elif kind == "string":
            if wt != 2:
                raise WireError(f"string field {name} with wire type {wt}")
            v = val.decode("utf-8")
            if repeated:
                out[name].append(v)
            else:
                out[name] = v
        elif kind == "bytes":
            if wt != 2:
                raise WireError(f"bytes field {name} with wire type {wt}")
            out[name] = val if not repeated else out[name] + [val]
        else:  # int32 / enum varints
            if wt == 2 and repeated:  # packed
                i = 0
                while i < len(val):
                    v, i = _read_varint(val, i)
                    out[name].append(_to_int32(v))
            elif wt == 0:
                v = _to_int32(val)
                if repeated:
                    out[name].append(v)
                else:
                    out[name] = v
            else:
                raise WireError(f"varint field {name} with wire type {wt}")
    return out


def decode_annotate_html(payload: bytes) -> dict[str, Any]:
    """One VDOM zip member -> flat row dict (the S3 source decoder).

    ``html`` is the utf-8 decode of htmlByte (latin-1 fallback,
    matching the M1 policy); annotations flatten to parallel lists for
    Arrow friendliness."""
    msg = decode_message(payload, ANNOTATE_HTML_SCHEMA)
    html_b = msg["htmlByte"]
    try:
        html = html_b.decode("utf-8")
    except UnicodeDecodeError:
        html = html_b.decode("latin-1")
    return {
        "url": msg["url"],
        "urlhash": msg["urlhash"],
        "language": msg["language"],
        "topic": msg["topic"],
        "html": html,
        "cw22id": msg["cw22id"],
        "annotation_node_ids": [a["nodeId"] for a in msg["annotations"]],
        "annotation_types": [a["type"] for a in msg["annotations"]],
        "node_raw_features": msg["nodeRawFeature"],
    }


# ---------------------------------------------------------------- encode
# (test support + the write side of the source: enough of the wire
# format to round-trip the schema above)


def _varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # two's complement, 10 bytes (protobuf rule)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(no: int, wt: int) -> bytes:
    return _varint(no << 3 | wt)


def encode_message(values: dict[str, Any], schema: dict[int, tuple]) -> bytes:
    by_name = {spec[0]: (no, spec[1], spec[2]) for no, spec in schema.items()}
    out = bytearray()
    for name, v in values.items():
        no, kind, repeated = by_name[name]
        items = v if repeated else [v]
        for item in items:
            if isinstance(kind, dict):
                body = encode_message(item, kind)
                out += _tag(no, 2) + _varint(len(body)) + body
            elif kind == "string":
                b = item.encode("utf-8")
                out += _tag(no, 2) + _varint(len(b)) + b
            elif kind == "bytes":
                out += _tag(no, 2) + _varint(len(item)) + item
            else:
                out += _tag(no, 0) + _varint(item)
    return bytes(out)
