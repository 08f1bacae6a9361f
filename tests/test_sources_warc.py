"""WARC source: stream reader (S4) and offset-sidecar random access (S1)."""

import ray.data

from neuscraper_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    read_warc_member,
    write_warc_gz,
)

RECORDS = [
    ("https://a.example.com/1", "2023-05-01T00:00:00Z", b"<html><p>alpha page</p></html>"),
    ("https://b.example.com/2", "2023-05-02T12:30:00Z", b"<html><p>beta page</p></html>"),
    ("https://c.example.com/3", "2023-05-03T23:59:59Z", b"<html><table><tr><td>x</td></tr></table></html>"),
]


def test_roundtrip_stream(tmp_path):
    p = str(tmp_path / "f.warc.gz")
    write_warc_gz(p, RECORDS)
    with open(p, "rb") as f:
        t = parse_warc_bytes(f.read())
    assert t.column("url").to_pylist() == [r[0] for r in RECORDS]
    assert t.column("html").to_pylist() == [r[2] for r in RECORDS]
    ts = t.column("warc_ts").to_pylist()
    assert ts[0].year == 2023 and ts[0].month == 5


def test_read_warc_dataset(tmp_path):
    p1 = str(tmp_path / "a.warc.gz")
    p2 = str(tmp_path / "b.warc.gz")
    write_warc_gz(p1, RECORDS[:2])
    write_warc_gz(p2, RECORDS[2:])
    ds = read_warc([p1, p2])
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 3
    assert df["url"].tolist() == sorted(r[0] for r in RECORDS)


def test_member_random_access(tmp_path):
    p = str(tmp_path / "c.warc.gz")
    offsets = write_warc_gz(p, RECORDS, http_headers=False)
    assert len(offsets) == len(RECORDS) + 1
    for i, (_, _, body) in enumerate(RECORDS):
        assert read_warc_member(p, offsets, i) == body


def test_warc_feeds_curation_pipeline(tmp_path):
    """WARC -> pages -> extract: sources compose with the DAG."""
    from neuscraper_ray.stages.scorer import extract_score_batch

    p = str(tmp_path / "d.warc.gz")
    write_warc_gz(p, RECORDS)
    ds = read_warc([p])
    preds = ds.map_batches(extract_score_batch, batch_format="pyarrow")
    out = preds.to_pandas()
    # every url at least has its sentinel row
    assert set(out["url"]) == {r[0] for r in RECORDS}


def test_plain_uncompressed_warc(tmp_path):
    """Non-gzip .warc files parse through the same reader."""
    import gzip as _g

    p = str(tmp_path / "plain.warc")
    pgz = str(tmp_path / "tmp.warc.gz")
    write_warc_gz(pgz, RECORDS[:2])
    # decompress members into one plain file
    raw = b""
    with open(pgz, "rb") as f:
        data = f.read()
    import io, zlib

    # member-gzipped: decompress sequentially
    buf = io.BytesIO(data)
    while True:
        start = buf.tell()
        head = buf.read(2)
        if len(head) < 2:
            break
        buf.seek(start)
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        raw += d.decompress(buf.read())
        buf.seek(len(data) - len(d.unused_data))
        if not d.unused_data:
            break
    with open(p, "wb") as f:
        f.write(raw)
    t = parse_warc_bytes(raw)
    assert t.column("url").to_pylist() == [r[0] for r in RECORDS[:2]]


def test_jsonl_source_roundtrip(tmp_path):
    """S5 parity: JSONL line reader via ray.data.read_json + seeded
    shuffle — same rows as the parquet path, deterministic order."""
    import json
    import os

    import duckdb
    import ray.data

    rows = duckdb.sql(
        "SELECT event_id, event_type FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet') LIMIT 200"
    ).df()
    p = os.path.join(tmp_path, "events.jsonl")
    with open(p, "w") as f:
        for r in rows.to_dict("records"):
            f.write(json.dumps(r) + "\n")
    ds = ray.data.read_json(p)
    got = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    want = rows.sort_values("event_id").reset_index(drop=True)
    assert got.equals(want)
    # seeded shuffle is deterministic across runs
    a = ds.random_shuffle(seed=11).to_pandas()["event_id"].tolist()
    b = ds.random_shuffle(seed=11).to_pandas()["event_id"].tolist()
    assert a == b and sorted(a) == sorted(want["event_id"].tolist())
