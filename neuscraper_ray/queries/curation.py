"""Flagship-pipeline views and corpus reports (curate labels/sweeps, annotation offsets, media features).

Split from the original single-module ``queries.py`` (see the package
``__init__`` for the registry); behavior-identical, same oracle SQL
contract per query (``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from neuscraper_ray.config import NUM_BUCKETS

from neuscraper_ray.queries._shared import _read


def media_features(sf_dir: str):
    """Multimodal decode: a deterministic synthetic media table
    (binary payload + typed metadata struct, sized to the sf scale;
    every 3rd payload is a REAL stdlib-encoded PNG cycling all five
    scanline filters, the rest the FIMG fixture format) through the
    actor-pool image decoder -> per-item feature vectors. The PNG path
    is a real pure-stdlib codec (zlib IDAT inflate + per-scanline
    unfilter, ``functions/multimodal.decode_png``); rows-only because
    DuckDB has no image functions to twin it with."""
    import pyarrow.parquet as _pq

    from neuscraper_ray.functions.multimodal import decode_images, gen_media_table

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    media = gen_media_table(max(64, n_docs // 4), seed=7)
    ds = ray.data.from_arrow(media)
    out = decode_images(ds, concurrency=2, batch_size=16)
    return out.select_columns(["doc_id", "features", "decode_ok"])


def corpus_report(sf_dir: str):
    """One-row corpus health report — the numbers a curation run prints
    before anything trains: doc count, distinct languages, total
    whitespace tokens, quality-filter keep rate (e4 fixed-point), and
    exact-duplicate rate (ppm). Pure composition of the engine's own
    pure batch functions, so every cell matches the SQL oracle exactly.

    Scale shape: a FUSED multi-aggregate pass computes doc/keep/token
    partials plus the per-batch language set in one read (one tiny row
    per batch, zero shuffle — the read is paid once, not per metric),
    and the distinct-text count reuses ``exact_dedup``'s md5-bucketed
    exchange followed by a distributed ``count()`` — the text itself
    never reaches the driver."""
    from neuscraper_ray.functions.dedup import exact_dedup
    from neuscraper_ray.functions.textstats import token_count_batch
    from neuscraper_ray.stages.heuristics import quality_filter_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        nt = token_count_batch(t).column("n_tokens").to_numpy()
        keep = quality_filter_batch(t).column("keep").to_numpy()
        langs = ",".join(sorted(set(t.column("lang").to_pylist())))
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "n_kept": pa.array([int(keep.sum())], pa.int64()),
                "total_tokens": pa.array([int(nt.sum())], pa.int64()),
                "langs": pa.array([langs], pa.string()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n_docs"] for r in rows)
    n_kept = sum(r["n_kept"] for r in rows)
    total_tokens = sum(r["total_tokens"] for r in rows)
    langs: set[str] = set()
    for r in rows:
        if r["langs"]:
            langs.update(r["langs"].split(","))

    n_distinct = exact_dedup(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        id_col="doc_id",
        text_col="text",
    ).count()

    return pd.DataFrame(
        [
            {
                "n_docs": n_docs,
                "n_langs": len(langs),
                "total_tokens": total_tokens,
                "keep_rate_e4": (n_kept * 10_000) // n_docs if n_docs else 0,
                "dup_rate_ppm": ((n_docs - n_distinct) * 1_000_000) // n_docs
                if n_docs
                else 0,
            }
        ]
    )




def _pages_dir_for(sf_dir: str, mult: int = 4) -> str:
    """Deterministic synthetic pages cache for a testdata scale.

    ``mult`` scales pages per document row: 4 for correctness-path
    callers (entry / curate queries), 16 for the benchmark, where the
    corpus must be big enough that compute dominates the ~2s serial
    floor of a local Ray session at 32 cpus.
    """
    import os

    import pyarrow.parquet as pq

    from neuscraper_ray.synth import SYNTH_VERSION, write_pages

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_pages = n_docs * mult
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/neuscraper_pages_v{SYNTH_VERSION}_{tag}_{n_pages}"
    # >=128 files so every parallelism level is scheduler-bound, not
    # partition-bound; shards capped at ~160 pages — coarser blocks
    # (600+ pages/task) measurably degrade 32-cpu throughput (straggly
    # 1s+ tasks at phase boundaries, less pipelining)
    write_pages(out, n_pages, rows_per_file=max(64, min(160, n_pages // 128)))
    return out


def curate_labels(sf_dir: str):
    """Flagship pipeline over the synthetic pages table. Rows-only by
    nature: the pipeline is HTML parsing + a model-scored node
    classifier + trained langid — not SQL-expressible. Its value
    correctness is gated instead by the conformance suite
    (byte-identical extracted/scrubbed text per url vs the
    single-process oracle, keep/drop F1 >= 0.99, partitioning
    invariance — tests/test_curate_pipeline.py)."""
    from neuscraper_ray.pipelines.curate import CurateConfig, curate

    pages = ray.data.read_parquet(_pages_dir_for(sf_dir))
    out = curate(pages, CurateConfig())
    df = out.to_pandas().sort_values("url").reset_index(drop=True)
    df["quality_flags"] = df["quality_flags"].map(
        lambda fl: ",".join(list(fl)) if fl is not None else ""
    )
    return df[
        ["url", "extracted_text", "keep", "drop_reason", "scrubbed_text", "lang_pred", "ppl", "n_kept"]
    ]


def pages_annotation_offsets(sf_dir: str):
    """M15 export over the synthetic pages corpus: one row per
    annotation span (url, annotation, node_id, start, end). Rows-only:
    the operator is an HTML parse + renderer walk (non-SQL); its
    semantics are pinned by tests/test_annotation_export.py."""
    from neuscraper_ray.annotation_export import export_annotations_batch

    pages = ray.data.read_parquet(_pages_dir_for(sf_dir), columns=["url", "html"])
    return pages.map_batches(
        export_annotations_batch, batch_format="pyarrow", batch_size=32
    )


def pages_original_html(sf_dir: str):
    """M16 original-HTML reconstruction over the synthetic pages
    corpus (ref ``AnnotateHtmlApi.py:841-869``): each page is first
    deterministically instrumented the way the annotation tooling does
    (layout attrs, per-element dcnode ids, instrument-span-wrapped
    text nodes), then STRIPPED back with the vectorized RE2 chain —
    one row per url with the reconstruction proof
    (url, n_chars, roundtrip_ok). Rows-only: the pages table is not a
    driver-registered oracle view; the DuckDB twin of the strip chain
    (``stages.original_html.sql_strip_instrumentation``) is pinned
    value-identical in tests/test_original_html.py, and roundtrip_ok
    is itself the per-row proof (strip(instrument(html)) == html,
    byte-compared in the query)."""
    import pyarrow.compute as pc

    from neuscraper_ray.stages.extract import decode_html
    from neuscraper_ray.stages.original_html import (
        instrument_html,
        strip_instrumentation,
    )

    pages = ray.data.read_parquet(_pages_dir_for(sf_dir), columns=["url", "html"])

    def reconstruct(t: pa.Table) -> pa.Table:
        orig = [decode_html(h) for h in t.column("html").to_pylist()]
        inst = pa.array([instrument_html(h) for h in orig], pa.string())
        got = strip_instrumentation(inst)
        ok = pc.equal(got, pa.array(orig, pa.string()))
        return pa.table(
            {
                "url": t.column("url"),
                "n_chars": pa.array(
                    [len(h) for h in orig], pa.int64()
                ),
                "roundtrip_ok": ok,
            }
        )

    return pages.map_batches(reconstruct, batch_format="pyarrow", batch_size=64)


def curate_task_sweep(sf_dir: str):
    """A2 full task x threshold sweep eval table (ref
    ``inference.py:78-88``: 6 tasks x 8 thresholds computed during
    eval, of which only Primary@0.9 is saved): per (task, thr_pct) the
    number of predicted nodes and of urls with >=1 prediction.

    Shape: the grid rows never leave the extract task un-aggregated —
    each page-granular batch collapses to <=48 partial rows (pandas
    groupby), and the final groupby runs over a 48-key bounded space.
    ``n_urls`` sums per-batch distinct-url counts, exact because the
    pages table is one row per url and batches are page-granular.
    Rows-only by nature (neural node scorer — non-SQL, same family as
    curate_labels); the grid itself is pinned in
    tests/test_filters.py: the Primary@90 slice is bit-equal to the
    flagship predicted set, higher thresholds nest inside lower ones,
    and the sweep is deterministic."""
    from neuscraper_ray.stages.scorer import extract_sweep_batch

    pages = ray.data.read_parquet(_pages_dir_for(sf_dir), columns=["url", "html"])
    sweep = pages.map_batches(
        extract_sweep_batch, batch_format="pyarrow", batch_size=32
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["task", "thr_pct"], sort=False).agg(
            n_nodes=("node_id", "size"), n_urls=("url", "nunique")
        )
        return g.reset_index()

    agg = (
        sweep.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["task", "thr_pct"])
        .aggregate(
            Sum("n_nodes", alias_name="n_nodes"),
            Sum("n_urls", alias_name="n_urls"),
        )
    )
    df = agg.to_pandas().sort_values(["task", "thr_pct"]).reset_index(drop=True)
    df["n_nodes"] = df["n_nodes"].astype("int64")
    df["n_urls"] = df["n_urls"].astype("int64")
    return df


def curate_drop_reasons(sf_dir: str):
    """Drop-reason histogram of the flagship pipeline. Rows-only for
    the same reason as curate_labels (model-scored, non-SQL); the
    histogram itself is additionally pinned against the oracle's
    drop reasons in the conformance tests."""
    from neuscraper_ray.pipelines.curate import CurateConfig, curate

    pages = ray.data.read_parquet(_pages_dir_for(sf_dir))
    out = curate(pages, CurateConfig())
    agg = out.groupby("drop_reason").aggregate(Count(alias_name="n_docs"))
    df = agg.to_pandas().sort_values("drop_reason").reset_index(drop=True)
    df["n_docs"] = df["n_docs"].astype("int64")
    return df
