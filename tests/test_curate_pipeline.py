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
    out = curate(ds, cfg or CurateConfig(scorer_actors=2, ppl_actors=1, num_buckets=16))
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
    cfg = CurateConfig(scorer_actors=2, ppl_actors=1, num_buckets=5)
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
