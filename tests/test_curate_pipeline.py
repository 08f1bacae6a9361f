"""End-to-end conformance: Ray pipeline == single-process oracle.

Gates (BASELINE.md): byte-identical extracted_text and scrubbed_text per
url; keep/drop F1 >= 0.99 (exact agreement expected — same pure
functions); invariance under different partitionings.
"""

import pandas as pd
import pytest
import ray.data

from neuscraper_ray.oracle import oracle_curate
from neuscraper_ray.pipelines.curate import CurateConfig, curate
from neuscraper_ray.synth import gen_pages

N_PAGES = 400


@pytest.fixture(scope="module")
def pages_table():
    return gen_pages(N_PAGES, seed=42)


@pytest.fixture(scope="module")
def oracle_df(pages_table):
    return oracle_curate(pages_table).sort_values("url").reset_index(drop=True)


def _run_ray(pages_table, num_blocks, cfg=None):
    ds = ray.data.from_arrow(pages_table).repartition(num_blocks)
    out = curate(ds, cfg or CurateConfig(scorer_actors=2, num_buckets=16))
    df = out.to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def _check_match(ray_df: pd.DataFrame, oracle_df: pd.DataFrame):
    assert len(ray_df) == len(oracle_df) == N_PAGES
    assert list(ray_df["url"]) == list(oracle_df["url"])
    # byte-identical text per url
    assert list(ray_df["extracted_text"]) == list(oracle_df["extracted_text"])
    assert list(ray_df["scrubbed_text"]) == list(oracle_df["scrubbed_text"])
    # keep/drop: exact agreement (F1 == 1.0 >= 0.99)
    assert list(ray_df["keep"]) == list(oracle_df["keep"])
    assert list(ray_df["drop_reason"]) == list(oracle_df["drop_reason"])
    assert ray_df["ppl"].tolist() == pytest.approx(oracle_df["ppl"].tolist())
    assert list(ray_df["lang_pred"]) == list(oracle_df["lang_pred"])


def test_ray_matches_oracle(pages_table, oracle_df):
    _check_match(_run_ray(pages_table, num_blocks=8), oracle_df)


def test_partitioning_invariance(pages_table, oracle_df):
    # different block count + different bucket count => identical output
    cfg = CurateConfig(scorer_actors=2, num_buckets=5)
    _check_match(_run_ray(pages_table, num_blocks=23, cfg=cfg), oracle_df)


def test_every_url_present_even_empty_pages(pages_table):
    df = _run_ray(pages_table, num_blocks=8)
    assert df["url"].is_unique
    empties = df[df["extracted_text"] == ""]
    assert (~empties["keep"]).all()
    assert (empties["drop_reason"] == "empty").all()


def test_keep_rate_sane(oracle_df):
    # the synthetic corpus is built so both classes are well represented
    rate = oracle_df["keep"].mean()
    assert 0.3 < rate < 0.85, rate


def test_duplicate_url_across_blocks_set_union(pages_table, oracle_df):
    """FIXTURES #5: the same url in multiple input blocks. Reference
    semantics union node ids as a set per url (inference.py:126-129), so
    ingesting a page twice yields the same single output row."""
    import pyarrow as pa

    doubled = pa.concat_tables([pages_table, pages_table.slice(0, 50)])
    ds = ray.data.from_arrow(doubled).repartition(13)
    out = curate(ds, CurateConfig(num_buckets=7)).to_pandas()
    out = out.sort_values("url").reset_index(drop=True)
    assert len(out) == N_PAGES  # still one row per distinct url
    assert list(out["extracted_text"]) == list(oracle_df["extracted_text"])
    assert list(out["keep"]) == list(oracle_df["keep"])


def test_mark_duplicates_stage(pages_table):
    """dup family pages share bodies across urls: exact-dup marking
    points every non-canonical copy at the min url of its group."""
    ds = ray.data.from_arrow(pages_table).repartition(8)
    cfg = CurateConfig(num_buckets=16, mark_duplicates=True)
    df = curate(ds, cfg).to_pandas()
    assert "dup_of" in df.columns
    dups = df[df["dup_of"] != ""]
    assert len(dups) > 0  # the corpus plants duplicate bodies
    by_text = df[df["extracted_text"] != ""].groupby("extracted_text")["url"]
    expected_dup_urls = set()
    for _, urls in by_text:
        if len(urls) > 1:
            expected_dup_urls.update(sorted(urls)[1:])  # all but min url
    assert set(dups["url"]) == expected_dup_urls
    # canonical rows are never marked
    for _, r in dups.iterrows():
        assert r["dup_of"] < r["url"]


def test_mark_duplicates_join_fallback_matches_broadcast(pages_table):
    """broadcast_limit=0 forces the distributed content-hash join path;
    it must mark exactly the same dup_of set as the broadcast path."""
    from neuscraper_ray.pipelines.curate import curate
    from neuscraper_ray.stages.dedup_mark import mark_duplicates

    ds = ray.data.from_arrow(pages_table).repartition(8)
    docs = curate(ds, CurateConfig(num_buckets=16)).materialize()
    bc = mark_duplicates(docs).to_pandas().sort_values("url").reset_index(drop=True)
    jn = (
        mark_duplicates(docs, broadcast_limit=0)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert sorted(bc.columns) == sorted(jn.columns)
    pd.testing.assert_series_equal(bc["dup_of"], jn["dup_of"])
    assert (bc["dup_of"] != "").any()


def test_mark_duplicates_hash_col_paths_match_recompute(pages_table):
    """The precomputed-hash fast paths (hash_col=..., broadcast AND
    bucketed) must mark exactly the same dup_of as the md5-recompute
    path."""
    from neuscraper_ray.pipelines.curate import curate, filter_chain, assemble_pages
    from neuscraper_ray.stages.dedup_mark import mark_duplicates
    from neuscraper_ray.stages.scorer import extract_score_batch

    ds = ray.data.from_arrow(pages_table).repartition(8)
    cfg = CurateConfig(num_buckets=16)
    preds = ds.map_batches(
        extract_score_batch,
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
        fn_kwargs={"num_buckets": cfg.num_buckets},
    )
    docs = filter_chain(
        assemble_pages(preds, cfg, has_bucket=True), cfg, with_content_hash=True
    ).materialize()

    def dup_series(out):
        df = out.to_pandas().sort_values("url").reset_index(drop=True)
        return df["dup_of"]

    base = dup_series(mark_duplicates(docs))  # md5 recompute, broadcast
    fast_bc = dup_series(mark_duplicates(docs, hash_col="content_hash"))
    fast_bk = dup_series(
        mark_duplicates(docs, hash_col="content_hash", broadcast_limit=0)
    )
    pd.testing.assert_series_equal(base, fast_bc)
    pd.testing.assert_series_equal(base, fast_bk)
    assert (base != "").any()


def test_actor_pool_scorer_path_matches_oracle(pages_table, oracle_df):
    """The non-fused variant (separate NodeScorer actor pool over node
    rows — the GPU-model shape) must produce identical output."""
    cfg = CurateConfig(
        fused_scorer=False, scorer_actors=2, num_buckets=8
    )
    _check_match(_run_ray(pages_table, num_blocks=6, cfg=cfg), oracle_df)


def test_parse_error_lineage_units():
    """Parse-failure lineage, hop by hop (the mock cannot cross Ray
    worker processes, so each stage is exercised in-process)."""
    from unittest import mock
    import pyarrow as pa
    import neuscraper_ray.stages.extract as ex
    from neuscraper_ray.stages.assemble import assemble_bucket_arrow, assemble_bucket
    from neuscraper_ray.stages.verdict import decide
    import pandas as pd

    # 1. extractor marks the sentinel with tag '#error'
    with mock.patch.object(ex, "extract_node_sequence", side_effect=ValueError):
        rows = ex.page_to_node_rows("u_bad", b"<html>x</html>")
    assert rows == [("u_bad", -1, -1, -1, "", "#error", False, False)]

    # 2. both assembly variants surface parse_error per url
    t = pa.table(
        {
            "url": ["u_bad", "u_ok", "u_ok"],
            "node_id": pa.array([-1, -1, 3], pa.int32()),
            "text": pa.array(["", "", "hello"], pa.large_string()),
            "err": [True, False, False],
        }
    )
    out = assemble_bucket_arrow(t).to_pandas().set_index("url")
    assert bool(out.loc["u_bad", "parse_error"]) and not bool(out.loc["u_ok", "parse_error"])
    assert out.loc["u_ok", "extracted_text"] == "hello"
    out2 = assemble_bucket(t.to_pandas()).set_index("url")
    assert bool(out2.loc["u_bad", "parse_error"]) and not bool(out2.loc["u_ok", "parse_error"])

    # 3. verdict prefers parse_error over empty
    assert decide("", "und", 0.0, [], 0, parse_error=True) == (False, "parse_error")
    assert decide("", "und", 0.0, [], 0, parse_error=False) == (False, "empty")


def test_tiny_block_size_invariance(pages_table, oracle_df):
    """Byte-identical output when Ray splits blocks aggressively
    (target_max_block_size small enough to fragment every stage)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024  # 64 KiB
        _check_match(_run_ray(pages_table, num_blocks=17), oracle_df)
    finally:
        ctx.target_max_block_size = old


def test_generator_determinism():
    """FIXTURES #10: generator(seed=42) twice -> identical bytes."""
    import pyarrow as pa

    a = gen_pages(150, seed=42, start=300)
    b = gen_pages(150, seed=42, start=300)
    assert a.equals(b)
    c = gen_pages(150, seed=43, start=300)
    assert not a.equals(c)


def test_mark_duplicates_pin_and_checkpoint_arms_identical(tmp_path):
    """mark_duplicates' size switch: the object-store pin arm (input
    bytes under dedup_pin_input_limit) and the parquet-checkpoint arm
    must emit byte-identical rows; an in-memory source (no input
    files) must take the checkpoint arm, never a bogus 0-byte pin."""
    from neuscraper_ray.synth import write_pages

    paths = write_pages(str(tmp_path / "pages"), 200, rows_per_file=100)

    def run(**kw):
        return (
            curate(
                ray.data.read_parquet(paths),
                CurateConfig(num_buckets=8, mark_duplicates=True, **kw),
            )
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )

    pin = run()  # small files -> pin arm
    ckpt = run(dedup_pin_input_limit=0)  # forced checkpoint arm
    pd.testing.assert_frame_equal(pin, ckpt)
    assert (pin["dup_of"] != "").any()
