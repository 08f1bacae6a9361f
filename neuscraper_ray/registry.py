"""Typed pipeline-step registry (§2.11 user-extension surface).

The reference's extension points are implicit — edit a task list, a
threshold list, a ``__init_subclass__`` tokenizer registry, closure-
wrapped process fns (SURVEY §2.11). Here the surface is explicit: a
named registry of stage factories, each ``CurateConfig -> (Dataset ->
Dataset)``, so a pipeline is a list of names and third-party stages
plug in with one decorator:

    @register_stage("my_filter")
    def my_filter(cfg):
        def apply(ds):
            return ds.map_batches(...)
        return apply

    pipe = build_pipeline(["extract_score", "assemble", "filters",
                           "my_filter"], CurateConfig())
    out = pipe(ray.data.read_parquet(...))
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data

from neuscraper_ray.pipelines.curate import CurateConfig

StageFactory = Callable[[CurateConfig], Callable[[ray.data.Dataset], ray.data.Dataset]]

_REGISTRY: dict[str, StageFactory] = {}


def register_stage(name: str) -> Callable[[StageFactory], StageFactory]:
    def deco(factory: StageFactory) -> StageFactory:
        if name in _REGISTRY:
            raise ValueError(f"stage {name!r} already registered")
        _REGISTRY[name] = factory
        return factory

    return deco


def get_stage(name: str) -> StageFactory:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def list_stages() -> list[str]:
    return sorted(_REGISTRY)


def build_pipeline(
    names: list[str], cfg: CurateConfig | None = None
) -> Callable[[ray.data.Dataset], ray.data.Dataset]:
    """Compose registered stages into one Dataset -> Dataset callable."""
    cfg = cfg or CurateConfig()
    stages = [get_stage(n)(cfg) for n in names]

    def run(ds: ray.data.Dataset) -> ray.data.Dataset:
        for s in stages:
            ds = s(ds)
        return ds

    return run


# ----------------------------- built-in stages -----------------------------


@register_stage("extract_score")
def _extract_score(cfg: CurateConfig):
    from neuscraper_ray.stages.scorer import extract_score_batch

    def apply(ds):
        return ds.map_batches(
            extract_score_batch,
            batch_format="pyarrow",
            batch_size=cfg.parse_batch_size,
            fn_kwargs={"num_buckets": cfg.num_buckets},
        )

    return apply


@register_stage("extract_nodes")
def _extract_nodes(cfg: CurateConfig):
    from neuscraper_ray.pipelines.curate import extract_nodes

    return lambda ds: extract_nodes(ds, cfg)


@register_stage("score_nodes")
def _score_nodes(cfg: CurateConfig):
    from neuscraper_ray.pipelines.curate import score_nodes

    return lambda ds: score_nodes(ds, cfg)


@register_stage("assemble")
def _assemble(cfg: CurateConfig):
    from neuscraper_ray.pipelines.curate import assemble_pages

    return lambda ds: assemble_pages(ds, cfg, has_bucket=True)


@register_stage("assemble_unbucketed")
def _assemble_unbucketed(cfg: CurateConfig):
    from neuscraper_ray.pipelines.curate import assemble_pages

    return lambda ds: assemble_pages(ds, cfg, has_bucket=False)


@register_stage("filters")
def _filters(cfg: CurateConfig):
    from neuscraper_ray.pipelines.curate import filter_chain

    return lambda ds: filter_chain(ds, cfg)


@register_stage("mark_duplicates")
def _mark_dups(cfg: CurateConfig):
    from neuscraper_ray.stages.dedup_mark import mark_duplicates

    return lambda ds: mark_duplicates(ds.materialize())
