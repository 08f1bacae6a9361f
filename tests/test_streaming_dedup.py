"""Shared-mutable-index streaming dedup: first-wins invariant under
arbitrary partitioning and concurrent arrival."""

import pandas as pd

import ray.data

from neuscraper_ray.stages.streaming_dedup import streaming_dedup


def _corpus(n_distinct=40, copies=25):
    rows = []
    for c in range(copies):
        for i in range(n_distinct):
            rows.append({"doc_id": c * n_distinct + i, "text": f"document body {i}"})
    return rows


def test_exactly_one_survivor_per_distinct_text():
    rows = _corpus()
    ds = ray.data.from_items(rows).repartition(16)
    out, dd = streaming_dedup(ds, n_shards=4)
    df = out.to_pandas()
    # one survivor per distinct text, none missing
    assert sorted(df["text"].unique()) == sorted({r["text"] for r in rows})
    assert len(df) == 40
    assert df["text"].is_unique
    assert dd.index_size() == 40
    # every survivor is a real input row
    valid = {(r["doc_id"], r["text"]) for r in rows}
    assert all((i, t) in valid for i, t in zip(df["doc_id"], df["text"]))


def test_invariant_holds_across_partitionings():
    rows = _corpus(n_distinct=17, copies=7)
    for parts in (1, 3, 11):
        ds = ray.data.from_items(rows).repartition(parts)
        out, _ = streaming_dedup(ds, n_shards=3)
        df = out.to_pandas()
        assert len(df) == 17 and df["text"].is_unique


def test_task_retry_replay_is_idempotent():
    """The exact worker-loss scenario: a batch whose inserts landed is
    re-executed (Ray task retry). The replay must get the SAME keep
    answers — the survivor is not dropped, and the index is unchanged."""
    import pyarrow as pa

    from neuscraper_ray.stages.streaming_dedup import StreamingDeduper

    dd = StreamingDeduper(n_shards=3)
    b1 = pa.table({"doc_id": [1, 2, 3, 2], "text": ["a", "b", "c", "b"]})
    b2 = pa.table({"doc_id": [10, 11], "text": ["b", "d"]})
    first = dd(b1)
    assert first.column("doc_id").to_pylist() == [1, 2, 3]
    # another batch claims nothing already owned
    assert dd(b2).column("doc_id").to_pylist() == [11]
    # replay of b1 (identical content => identical owner token)
    replay = dd(b1)
    assert replay.column("doc_id").to_pylist() == [1, 2, 3]
    # replay of b2 likewise
    assert dd(b2).column("doc_id").to_pylist() == [11]
    assert dd.index_size() == 4  # a b c d — replays inserted nothing new


def test_stream_continues_after_duplicates_dropped():
    # consuming incrementally: later batches of known texts add nothing
    rows = _corpus(n_distinct=10, copies=2)
    ds = ray.data.from_items(rows).repartition(4)
    out, dd = streaming_dedup(ds, n_shards=2)
    seen = 0
    for batch in out.iter_batches(batch_size=8, batch_format="pandas"):
        seen += len(batch)
    assert seen == 10 and dd.index_size() == 10
