"""K1-K4 sink parity: the reference's JSONL/CSV/TSV writers are
subsumed by Ray's native sinks — prove the round-trips, not just the
claim."""

import os

import duckdb

import ray.data


def _docs(n=120):
    return ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
    ).limit(n)


def test_csv_sink_roundtrip(tmp_path):
    out = os.path.join(tmp_path, "csv")
    _docs().write_csv(out)
    back = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM read_csv_auto('{out}/*.csv') ORDER BY doc_id"
    ).df()
    want = _docs().to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == want["doc_id"].tolist()
    assert back["n_chars"].tolist() == want["n_chars"].tolist()


def test_jsonl_sink_roundtrip(tmp_path):
    out = os.path.join(tmp_path, "jsonl")
    _docs().write_json(out)
    back = duckdb.sql(
        f"SELECT doc_id, lang FROM read_json_auto('{out}/*.json') ORDER BY doc_id"
    ).df()
    want = _docs().to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == want["doc_id"].tolist()
    assert back["lang"].tolist() == want["lang"].tolist()
