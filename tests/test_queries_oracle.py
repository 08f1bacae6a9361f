"""Driver-contract conformance: every queries() entry with an
oracle_sql() entry must match DuckDB exactly (row count, schema, values)
at sf0.01 — the same comparison the grading driver performs."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


SQL_QUERIES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name, con):
    q = entry_mod.queries()[name]
    result = q(SF_DIR)
    if hasattr(result, "to_pandas"):
        result = result.to_pandas()
    expected = con.execute(entry_mod.oracle_sql()[name]).df()
    got, want = _normalize(result), _normalize(expected)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(SQL_QUERIES) - {"curate_labels", "curate_drop_reasons"})


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    q = entry_mod.queries()[name]
    result = q(SF_DIR)
    if hasattr(result, "to_pandas"):
        result = result.to_pandas()
    assert result is not None and len(result.columns) > 0


def test_all_queries_run_at_smallest_scale():
    """Every query must also survive sf0.001 (scale-dependent empties,
    tiny partitions) — rows-only smoke across the whole surface."""
    heavy = {"curate_labels", "curate_drop_reasons"}  # covered via entry()
    for name, q in entry_mod.queries().items():
        if name in heavy:
            continue
        res = q("/root/testdata/sf0.001")
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        assert res is not None and len(res.columns) > 0, name


EDGE_EVENT_QUERIES = [
    "events_funnel",
    "events_daily_active_users",
    "events_type_transitions",
    "events_purchase_view_window",
    "events_asof_join",
    "events_rolling_count",
    "events_user_sessions",
    "events_top_sessions",
    "events_distinct_users_by_type",
]


@pytest.mark.parametrize("name", EDGE_EVENT_QUERIES)
def test_edge_case_events_match_oracle(name, tmp_path):
    """Adversarial event streams through the driver comparison: window
    boundary ties (view exactly AT the purchase ts, view exactly at the
    -1h edge), purchases with no views, view-only users, same-ts
    duplicate events, single-event users, and user ids that collide in
    one co-partition bucket (u and u+NUM_BUCKETS)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neuscraper_ray.config import NUM_BUCKETS

    t0 = pd.Timestamp("2025-01-01 12:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: boundary ties — views at exactly -60min, -1us, and AT ts
        (1, t0 - 60 * m, "view"),
        (1, t0 - pd.Timedelta(microseconds=1), "view"),
        (1, t0, "view"),
        (1, t0, "purchase"),
        # user 2: purchase with no views at all
        (2, t0, "purchase"),
        # user 3: view-only
        (3, t0 - 5 * m, "view"),
        # user 4: two purchases at the SAME ts + an old view (>1h before)
        (4, t0 - 61 * m, "view"),
        (4, t0 + m, "purchase"),
        (4, t0 + m, "purchase"),
        # bucket collision: user 1 + NUM_BUCKETS shares user 1's bucket
        (1 + NUM_BUCKETS, t0 - m, "view"),
        (1 + NUM_BUCKETS, t0, "purchase"),
        # user 5: session-gap exactly 30min (not > 30min) then > 30min
        (5, t0, "view"),
        (5, t0 + 30 * m, "view"),
        (5, t0 + 61 * m, "view"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    result = entry_mod.queries()[name](str(tmp_path))
    if hasattr(result, "to_pandas"):
        result = result.to_pandas()
    expected = c.execute(entry_mod.oracle_sql()[name]).df()
    got, want = _normalize(result), _normalize(expected)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_edge_case_q19_out_of_range_size(tmp_path):
    """q19's disjunctive predicate through the driver comparison on a
    planted part table that includes a p_size BELOW the SQL twin's
    BETWEEN-1 lower bound (the generator never emits one, which once
    masked an engine path that only applied the upper bound), plus
    size/quantity rows at and beyond every boundary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # (p_partkey, p_brand, p_size)
    parts = [
        (1, "Brand#1", 0),   # below BETWEEN 1 AND 10 — must NOT count
        (2, "Brand#1", 5),   # in range
        (3, "Brand#1", 10),  # upper boundary
        (4, "Brand#3", 26),  # over Brand#3's max 25 — must NOT count
        (5, "Brand#5", 40),  # Brand#5 upper boundary
        (6, "Brand#2", 5),   # non-matching brand
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([p[0] for p in parts], pa.int64()),
                "p_brand": pa.array([p[1] for p in parts]),
                "p_size": pa.array([p[2] for p in parts], pa.int64()),
            }
        ),
        tmp_path / "part.parquet",
    )
    # (l_partkey, l_quantity): boundary hits and misses per group
    lines = [
        (1, 5.0),   # size-0 part: excluded even with in-range qty
        (2, 1.0),   # Brand#1 qty lower boundary — counts
        (2, 15.0),  # Brand#1 qty upper boundary — counts
        (2, 16.0),  # qty over — excluded
        (3, 7.0),   # boundary size, in-range qty — counts
        (4, 20.0),  # size over — excluded
        (5, 50.0),  # Brand#5 both boundaries — counts
        (5, 19.0),  # qty under Brand#5's 20 — excluded
        (6, 5.0),   # wrong brand — excluded
    ]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_quantity": pa.array([r[1] for r in lines], pa.float64()),
                "l_extendedprice": pa.array(
                    [100.0 + i for i in range(len(lines))], pa.float64()
                ),
                "l_discount": pa.array([0.05] * len(lines), pa.float64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    c = duckdb.connect()
    for t in ("part", "lineitem"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    name = "q19_disjunctive_revenue"
    result = entry_mod.queries()[name](str(tmp_path))
    if hasattr(result, "to_pandas"):
        result = result.to_pandas()
    expected = c.execute(entry_mod.oracle_sql()[name]).df()
    got, want = _normalize(result), _normalize(expected)
    assert int(want["n_lines"].iloc[0]) == 4  # the planted truth
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_edge_case_fertility_zero_subtokens(tmp_path):
    """docs_fertility_by_lang on a language whose every document is
    whitespace-only: sum(n_subtokens)=0, so chars_per_subtoken_ppm must
    be the shared zero-guard's 0 on BOTH engines (DuckDB integer
    division would otherwise error; numpy would silently emit 0 with a
    warning)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "   \t ",            # zz: whitespace-only — 0 subtokens
        " \t\t  ",           # zz: whitespace-only
        "hello world one",   # en: normal doc
    ]
    langs = ["zz", "zz", "en"]
    t = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs),
            "source": pa.array(["edge"] * len(texts)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    name = "docs_fertility_by_lang"
    result = entry_mod.queries()[name](str(tmp_path))
    if hasattr(result, "to_pandas"):
        result = result.to_pandas()
    expected = c.execute(entry_mod.oracle_sql()[name]).df()
    got, want = _normalize(result), _normalize(expected)
    zz = want[want["lang"] == "zz"]
    assert int(zz["n_subtokens"].iloc[0]) == 0  # the planted degeneracy
    assert int(zz["chars_per_subtoken_ppm"].iloc[0]) == 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


EDGE_QUERIES = ["docs_chunk_dedup", "docs_vocab_stats", "docs_top_terms"]


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_case_docs_match_oracle(name, tmp_path):
    """Degenerate documents — empty text, one word, exactly one chunk,
    exact duplicate docs, duplicated chunk inside ONE doc — through the
    same Ray-vs-DuckDB comparison the driver performs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "",                                   # 0 words -> 0 chunks
        "solo",                               # partial chunk
        "a b c d e f g h i j",                # exactly one full chunk
        "a b c d e f g h i j",                # exact duplicate doc
        "a b c d e f g h i j k",              # full chunk + 1-word tail
        " ".join(["x"] * 25),                 # repeated chunk within one doc
        "solo",                               # duplicate of the 1-word doc
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["edge"] * len(texts)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    result = entry_mod.queries()[name](str(tmp_path))
    if hasattr(result, "to_pandas"):
        result = result.to_pandas()
    expected = c.execute(entry_mod.oracle_sql()[name]).df()
    got, want = _normalize(result), _normalize(expected)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
