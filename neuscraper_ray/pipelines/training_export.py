"""ClueWeb VDOM zips -> labeled training chunks, as one streaming DAG.

The reference's second lifecycle (SURVEY §3.2; ``build_test.py`` /
``build_train.py``): iterate a zip of per-page ``AnnotateHtml``
protobufs, parse each page's HTML, project node-level annotations onto
text nodes, tokenize each sequence node, split the node sequence into
384-node chunks, and emit one training record per chunk —
``{'Labels': ..., 'TokenId': ..., 'NodeIds': ..., 'Url': ...}``
(ref ``build_test.py:128-131``, ``build_train.py:100-141``).

Here that is a single Dataset pipeline composed from the parity
pieces: the S3 zip source + stdlib protobuf decoder
(``sources/zipblobs.py`` + ``sources/protowire.py``), M3/M7 DOM
instrumentation + node-sequence extraction (``domparse.py``), M10
annotation projection (``labels.py``), M8 hash tokenization
(``functions/tokenizer.py``) and M9 chunking
(``domparse.chunk_sequence``). One zip file = one read task; the
per-page work is a stateless ``map_batches`` (tokenizer state is
module-cached per worker); output rows are Arrow-nested
(chunk-granular), so downstream training ingest can
``ds.random_shuffle(seed)`` / ``streaming_split`` them directly.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from neuscraper_ray.domparse import (
    chunk_sequence,
    instrument,
    node_sequence_from_doc,
    parse_html,
)
from neuscraper_ray.functions.tokenizer import HashTokenizer
from neuscraper_ray.labels import compute_labels, project_annotations
from neuscraper_ray.sources.protowire import decode_annotate_html
from neuscraper_ray.sources.zipblobs import read_zip_blobs

PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("cw22id", pa.string()),
        ("html", pa.string()),
        ("annotation_node_ids", pa.list_(pa.int32())),
        ("annotation_types", pa.list_(pa.int32())),
    ]
)

CHUNK_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("cw22id", pa.string()),
        ("chunk_id", pa.int32()),
        ("node_ids", pa.list_(pa.int32())),
        ("token_ids", pa.list_(pa.list_(pa.int32()))),
        ("labels", pa.list_(pa.list_(pa.int8()))),
    ]
)

_TOKENIZER: HashTokenizer | None = None


def _tokenizer() -> HashTokenizer:
    global _TOKENIZER
    if _TOKENIZER is None:
        _TOKENIZER = HashTokenizer()
    return _TOKENIZER


def pages_to_chunks(batch: pa.Table, chunk_size: int = 384) -> pa.Table:
    """One decoded AnnotateHtml page -> N chunk rows (pure batch fn)."""
    tok = _tokenizer()
    rows: dict[str, list] = {f.name: [] for f in CHUNK_SCHEMA}
    for i in range(batch.num_rows):
        url = batch.column("url")[i].as_py()
        cw22id = batch.column("cw22id")[i].as_py()
        html = batch.column("html")[i].as_py()
        ann_nodes = batch.column("annotation_node_ids")[i].as_py() or []
        ann_types = batch.column("annotation_types")[i].as_py() or []
        doc = parse_html(html)
        if instrument(doc) == 0:
            continue
        seq = node_sequence_from_doc(doc)
        if not seq:
            continue
        ann_to_nodes: dict[int, list[int]] = {}
        for n, t in zip(ann_nodes, ann_types):
            ann_to_nodes.setdefault(t, []).append(n)
        node2ann = project_annotations(doc, ann_to_nodes)
        node_ids = [s[0] for s in seq]
        texts = [s[1] for s in seq]
        labels = compute_labels(node_ids, node2ann)
        token_ids = [tok.tokenize_sequence(t) for t in texts]
        for ci, (a, b) in enumerate(chunk_sequence(len(seq), chunk_size)):
            rows["url"].append(url)
            rows["cw22id"].append(cw22id)
            rows["chunk_id"].append(ci)
            rows["node_ids"].append(node_ids[a:b])
            rows["token_ids"].append(token_ids[a:b])
            rows["labels"].append(labels[a:b])
    return pa.table(
        {f.name: pa.array(rows[f.name], f.type) for f in CHUNK_SCHEMA}
    )


def clueweb_training_chunks(
    zip_paths: str | list[str], chunk_size: int = 384
) -> ray.data.Dataset:
    """VDOM zip archives -> Dataset of training chunk rows."""
    pages = read_zip_blobs(
        zip_paths, lambda name, b: decode_annotate_html(b), PAGE_SCHEMA
    )
    return pages.map_batches(
        lambda t: pages_to_chunks(t, chunk_size),
        batch_format="pyarrow",
        batch_size=None,  # zip-granular blocks; re-bundling would
        # collapse parallelism (CLAUDE.md rule)
    )
