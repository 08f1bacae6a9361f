"""M10 label projection + S3 zip-blob source."""

import json

import pyarrow as pa

from neuscraper_ray.domparse import instrument, iter_elements, parse_html
from neuscraper_ray.labels import compute_labels, get_text_nodeids, project_annotations
from neuscraper_ray.render import RenderIndex
from neuscraper_ray.sources.zipblobs import read_zip_blobs, write_zip_blobs


def _doc(html):
    d = parse_html(html)
    instrument(d)
    return d


def test_get_text_nodeids_covers_subtree():
    doc = _doc("<html><div id=a><p>one</p><p>two</p></div><p>out</p></html>")
    idx = RenderIndex(doc)
    by_tag = {}
    for el in iter_elements(doc):
        by_tag.setdefault(el.tag, []).append(el)
    div = by_tag["div"][0]
    tns = get_text_nodeids(idx, div.node_id)
    texts = {idx.by_id[t] for t in tns}
    from neuscraper_ray.domparse import subtree_text

    assert {subtree_text(e) for e in texts} == {"one", "two"}


def test_project_and_multihot():
    html = "<html><main><p>keep this</p></main><footer><span>c</span>nope</footer></html>"
    doc = _doc(html)
    main = next(el for el in iter_elements(doc) if el.tag == "main")
    node2ann = project_annotations(doc, {1: [main.node_id], 4: [main.node_id]})
    assert node2ann  # the p's text node got Primary+Paragraph
    (tn, anns), = node2ann.items()
    assert sorted(anns) == [1, 4]
    labels = compute_labels([tn, 99999], node2ann)
    assert labels[0] == [1, 0, 0, 1, 0, 0]
    assert labels[1] == [0] * 6


def test_empty_subtree_no_text_nodes():
    doc = _doc("<html><table></table><p>x</p></html>")
    idx = RenderIndex(doc)
    table = next(el for el in iter_elements(doc) if el.tag == "table")
    assert get_text_nodeids(idx, table.node_id) == []
    assert get_text_nodeids(idx, 424242) == []


SCHEMA = pa.schema([("doc", pa.string()), ("n", pa.int64())])


def test_zip_blob_source(tmp_path):
    p1 = str(tmp_path / "a.zip")
    p2 = str(tmp_path / "b.zip")
    write_zip_blobs(p1, [("m1", b'{"doc": "x", "n": 1}'), ("m2", b"NOT JSON")])
    write_zip_blobs(p2, [("m3", b'{"doc": "y", "n": 2}')])

    def decode(name, payload):
        d = json.loads(payload)
        return {"doc": d["doc"], "n": d["n"]}

    ds = read_zip_blobs([p1, p2], decode, SCHEMA)
    df = ds.to_pandas().sort_values("doc").reset_index(drop=True)
    assert df["doc"].tolist() == ["x", "y"]  # bad member skipped
    assert df["n"].tolist() == [1, 2]
