"""The flagship pipeline: pages -> curated documents.

Streaming `ray.data.Dataset` DAG (never materializes the full input):

  read pages
   -> map_batches(extract_nodes_batch)      stateless tasks  (decode+DOM)
   -> map_batches(NodeScorer, actors)       per-node classification @0.9
   -> add url-hash bucket column
   -> groupby(bucket).map_groups(assemble)  the ONE all-to-all shuffle
   -> map_batches(langid)                   stateless
   -> map_batches(PerplexityScorer, actors) LM table once per actor
   -> map_batches(heuristics)               stateless
   -> map_batches(scrub)                    stateless (module regexes)
   -> map_batches(verdict)                  stateless

Replaces the reference's three-script filesystem-mediated lifecycle
(/root/reference/src/warc/build.py -> src/scraper/commoncrawl.py ->
src/warc/get_text.py) with a single streaming DAG.
"""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from neuscraper_ray.stages.assemble import add_bucket, assemble_bucket
from neuscraper_ray.stages.extract import extract_nodes_batch
from neuscraper_ray.stages.heuristics import heuristics_batch
from neuscraper_ray.stages.langid import langid_batch
from neuscraper_ray.stages.perplexity import PerplexityScorer
from neuscraper_ray.stages.scorer import NodeScorer
from neuscraper_ray.stages.scrub import scrub_batch
from neuscraper_ray.stages.verdict import verdict_batch


@dataclass
class CurateConfig:
    parse_batch_size: int = 64        # html is wide (large_binary) -> small batches
    score_batch_size: int = 4096      # node rows are narrow
    scorer_actors: int | tuple = (2, 8)
    ppl_actors: int | tuple = (1, 4)
    num_buckets: int = 64             # assembly shuffle fan-in (>= cluster cores)
    filter_batch_size: int = 1024


def extract_nodes(pages: ray.data.Dataset, cfg: CurateConfig | None = None) -> ray.data.Dataset:
    """pages -> node rows (with per-page sentinel rows)."""
    cfg = cfg or CurateConfig()
    return pages.map_batches(
        extract_nodes_batch,
        batch_format="pyarrow",
        batch_size=cfg.parse_batch_size,
    )


def score_nodes(nodes: ray.data.Dataset, cfg: CurateConfig | None = None) -> ray.data.Dataset:
    """node rows -> kept predictions (+ sentinels), actor pool."""
    cfg = cfg or CurateConfig()
    return nodes.map_batches(
        NodeScorer,
        batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
        concurrency=cfg.scorer_actors,
    )


def assemble_pages(preds: ray.data.Dataset, cfg: CurateConfig | None = None) -> ray.data.Dataset:
    """predictions -> one row per url with extracted_text."""
    cfg = cfg or CurateConfig()
    bucketed = preds.map_batches(
        lambda t: add_bucket(t, cfg.num_buckets),
        batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
    )
    return bucketed.groupby("bucket").map_groups(
        assemble_bucket, batch_format="pandas"
    )


def filter_chain(docs: ray.data.Dataset, cfg: CurateConfig | None = None) -> ray.data.Dataset:
    """assembled docs -> +lang_pred +ppl +quality_flags +scrub +keep."""
    cfg = cfg or CurateConfig()
    b = cfg.filter_batch_size
    docs = docs.map_batches(langid_batch, batch_format="pandas", batch_size=b)
    docs = docs.map_batches(
        PerplexityScorer,
        batch_format="pandas",
        batch_size=b,
        concurrency=cfg.ppl_actors,
    )
    docs = docs.map_batches(heuristics_batch, batch_format="pandas", batch_size=b)
    docs = docs.map_batches(scrub_batch, batch_format="pandas", batch_size=b)
    docs = docs.map_batches(verdict_batch, batch_format="pandas", batch_size=b)
    return docs


def curate(pages: ray.data.Dataset, cfg: CurateConfig | None = None) -> ray.data.Dataset:
    """Full pipeline. Lazy; caller consumes (write_parquet / iter / agg)."""
    cfg = cfg or CurateConfig()
    nodes = extract_nodes(pages, cfg)
    preds = score_nodes(nodes, cfg)
    docs = assemble_pages(preds, cfg)
    return filter_chain(docs, cfg)
