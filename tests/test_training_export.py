"""End-to-end §3.2 lifecycle: AnnotateHtml VDOM zip -> labeled
training chunks (S3 + M3/M7 + M8 + M9 + M10 composed)."""

import os

from neuscraper_ray.domparse import extract_node_sequence
from neuscraper_ray.functions.tokenizer import HashTokenizer
from neuscraper_ray.labels import compute_labels, project_annotations
from neuscraper_ray.pipelines.training_export import clueweb_training_chunks
from neuscraper_ray.sources.protowire import (
    ANNOTATE_HTML_SCHEMA,
    encode_message,
)
from neuscraper_ray.sources.zipblobs import write_zip_blobs

HTML = (
    "<html><body><h1>Title text</h1><p>First paragraph here.</p>"
    "<p>Second paragraph body.</p><div>Footer junk</div></body></html>"
)


def _member(url: str, ann_pairs: list[tuple[int, int]]) -> bytes:
    return encode_message(
        {
            "url": url,
            "urlhash": "h",
            "language": "en",
            "topic": [],
            "htmlByte": HTML.encode(),
            "annotations": [
                {"nodeId": n, "type": t} for n, t in ann_pairs
            ],
            "nodeRawFeature": [],
            "cw22id": url.rsplit("/", 1)[-1],
        },
        ANNOTATE_HTML_SCHEMA,
    )


def test_zip_to_training_chunks(tmp_path):
    seq = extract_node_sequence(HTML)
    assert len(seq) >= 4  # title + 2 paragraphs + footer text nodes
    # annotate the FIRST sequence node as Heading(2), second as Paragraph(4)
    n0, n1 = seq[0][0], seq[1][0]
    zp = os.path.join(tmp_path, "vdom.zip")
    write_zip_blobs(
        zp,
        [
            ("a.bin", _member("https://x.org/a", [(n0, 2), (n1, 4)])),
            ("b.bin", _member("https://x.org/b", [])),
        ],
    )
    # chunk_size=2 forces multiple chunks per page
    out = (
        clueweb_training_chunks(zp, chunk_size=2)
        .to_pandas()
        .sort_values(["url", "chunk_id"])
        .reset_index(drop=True)
    )
    a = out[out["url"] == "https://x.org/a"]
    assert len(a) == (len(seq) + 1) // 2  # ceil(n/2) chunks
    assert [len(x) for x in a["node_ids"]] == [
        2
    ] * (len(seq) // 2) + ([1] if len(seq) % 2 else [])
    # every node's token row is padded to 50
    assert all(len(t) == 50 for row in a["token_ids"] for t in row)
    # labels match the single-process composition exactly
    node2ann = project_annotations(HTML, {2: [n0], 4: [n1]})
    want = compute_labels([s[0] for s in seq], node2ann)
    got = [list(l) for row in a["labels"] for l in row]
    assert got == [list(map(int, w)) for w in want]
    # the annotated nodes carry their one-hot positions (type-1 indexed)
    assert got[0][1] == 1 and sum(got[0]) >= 1
    # token ids are the deterministic hash tokenizer's
    tok = HashTokenizer()
    assert list(a["token_ids"][0][0]) == tok.tokenize_sequence(seq[0][1])
    # unannotated page still chunks, labels all zero
    b = out[out["url"] == "https://x.org/b"]
    assert len(b) == (len(seq) + 1) // 2
    assert all(int(x) == 0 for row in b["labels"] for l in row for x in l)
