"""Stage registry: named composition equals the hand-built pipeline."""

import pytest
import ray.data

from neuscraper_ray.pipelines.curate import CurateConfig, curate
from neuscraper_ray.registry import build_pipeline, get_stage, list_stages, register_stage
from neuscraper_ray.synth import gen_pages


def test_builtin_stages_listed():
    assert {"extract_score", "assemble", "filters"} <= set(list_stages())


def test_unknown_stage_raises():
    with pytest.raises(KeyError, match="registered"):
        get_stage("nope")


def test_composed_pipeline_equals_curate():
    pages = gen_pages(120, seed=42)
    cfg = CurateConfig(num_buckets=4)
    pipe = build_pipeline(["extract_score", "assemble", "filters"], cfg)
    a = pipe(ray.data.from_arrow(pages)).to_pandas().sort_values("url").reset_index(drop=True)
    b = curate(ray.data.from_arrow(pages), cfg).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(a["extracted_text"]) == list(b["extracted_text"])
    assert list(a["keep"]) == list(b["keep"])


def test_custom_stage_plugs_in():
    @register_stage("only_kept_test")
    def only_kept(cfg):
        return lambda ds: ds.filter(lambda r: r["keep"])

    pages = gen_pages(80, seed=42)
    pipe = build_pipeline(
        ["extract_score", "assemble", "filters", "only_kept_test"],
        CurateConfig(num_buckets=4),
    )
    df = pipe(ray.data.from_arrow(pages)).to_pandas()
    assert df["keep"].all() and len(df) > 0
