"""The flagship pipeline: pages -> curated documents.

Streaming `ray.data.Dataset` DAG (never materializes the full input):

  read pages (url, html — prune the rest at the read)
   -> map_batches(extract_score_batch)      stateless tasks, page-granular
        decode + DOM parse + node scorer @0.9; only predicted nodes
        (+1 sentinel/page) leave the task, with a url-hash bucket col
   -> groupby(bucket).map_groups(assemble)  the ONE all-to-all shuffle
        (polars group-concat, desc node-id, per-url set-union)
   -> map_batches(filters_fused_batch)      stateless tasks
        langid -> perplexity (broadcast LM table) -> heuristics ->
        scrub -> verdict, hand-fused into one operator
  [-> mark_duplicates]                      optional dup_of stage

Replaces the reference's three-script filesystem-mediated lifecycle
(/root/reference/src/warc/build.py -> src/scraper/commoncrawl.py ->
src/warc/get_text.py) with a single streaming DAG.

Skew notes: giant pages (multi-chunk, >384 nodes) amortize inside
page-granular extract batches (cost ratio ~20x mean over a 32-page
batch ~= 1.6x task skew); the scorer is per-node with no fixed-size
padding, so the reference's node-count-bucketed GPU batching concern
does not arise — in the actor-pool variant (fused_scorer=False) node
rows batch evenly by count regardless of page of origin. Assembly skew
is bounded by url-hash bucketing (num_buckets), never by url
cardinality or page size.
"""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from neuscraper_ray.config import NUM_BUCKETS
from neuscraper_ray.stages.assemble import add_bucket
from neuscraper_ray.stages.extract import extract_nodes_batch
from neuscraper_ray.stages.scorer import NodeScorer


@dataclass
class CurateConfig:
    parse_batch_size: int = 32        # PAGES per extract+score task (html is wide)
    score_batch_size: int = 4096      # node rows per scorer batch (actor path)
    scorer_actors: int | tuple = (2, 8)  # actor pool size, fused_scorer=False path
    num_buckets: int = NUM_BUCKETS    # assembly shuffle fan-in (>= cluster cores)
    fused_scorer: bool = True         # explicit extract+score fusion (see
    # stages.scorer.extract_score_batch); set False to run the scorer as
    # a separate actor pool — the right shape when the node model needs
    # per-worker state (GPU weights); batch granularity is then node rows
    mark_duplicates: bool = False     # append dup_of (exact-dup canonical
    # url); the two-pass hash projection pins the curated docs in the
    # object store only below dedup_pin_input_limit input bytes —
    # above it they stream to a parquet checkpoint instead — see
    # stages.dedup_mark and dedup_checkpoint_dir
    dedup_pin_input_limit: int = 8 << 30  # input-parquet-bytes ceiling
    # for the object-store materialize arm of mark_duplicates (curated
    # docs are a fraction of input bytes, so this bounds the pin well
    # under half the default 32 GiB store); unknown input size (non-
    # file datasets) counts as over the limit — the checkpoint arm is
    # always the safe one. Both arms are pinned byte-identical in
    # tests/test_curate_pipeline.py.
    emit_content_hash: bool = False   # emit the md5 content_hash column
    # without marking (the runner's two-phase mark feed: partitions are
    # curated+committed independently, then one corpus-wide mark pass
    # resolves duplicate groups that span partitions)
    dedup_checkpoint_dir: str | None = None  # parquet checkpoint for
    # mark_duplicates (must be empty/nonexistent); None -> fresh
    # tempdir under /tmp. The files double as a resume point: they ARE
    # the curated corpus, dup marking is a cheap re-read.


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


def assemble_pages(
    preds: ray.data.Dataset, cfg: CurateConfig | None = None, has_bucket: bool = False
) -> ray.data.Dataset:
    """predictions -> one row per url with extracted_text.

    ``has_bucket=True`` when upstream already attached the url-hash
    bucket column (the fused extract+score path does). batch_size=None
    everywhere: operate on incoming blocks as-is — a row-count batch
    size would make Ray bundle upstream page-granular tasks into giant
    fused tasks, collapsing parallelism.
    """
    cfg = cfg or CurateConfig()
    if not has_bucket:
        preds = preds.map_batches(
            lambda t: add_bucket(t, cfg.num_buckets),
            batch_format="pyarrow",
            batch_size=None,
        )
    from neuscraper_ray.stages.assemble import assemble_bucket_arrow

    return preds.groupby("bucket").map_groups(
        assemble_bucket_arrow, batch_format="pyarrow"
    )


def filter_chain(
    docs: ray.data.Dataset,
    cfg: CurateConfig | None = None,
    with_content_hash: bool = False,
) -> ray.data.Dataset:
    """assembled docs -> +lang_pred +ppl +quality_flags +scrub +keep.

    Hand-fused into ONE stateless operator (see
    ``stages.verdict.filters_fused_batch``): the five filter fns are
    cheap per row, so separate operators would only add executor
    startup/queue cost. The LM table is broadcast once per driver
    (``ray.put`` cached) and fetched zero-copy per worker.
    ``with_content_hash`` additionally emits the md5 ``content_hash``
    column in the same pass (the mark_duplicates feed).
    """
    cfg = cfg or CurateConfig()
    from neuscraper_ray.stages.langid import get_langid_ref
    from neuscraper_ray.stages.perplexity import get_table_ref
    from neuscraper_ray.stages.verdict import filters_fused_batch

    return docs.map_batches(
        filters_fused_batch,
        batch_format="pandas",
        batch_size=None,
        fn_kwargs={
            "table_ref": get_table_ref(),
            "langid_ref": get_langid_ref(),
            "with_content_hash": with_content_hash,
        },
    )


def curate(pages: ray.data.Dataset, cfg: CurateConfig | None = None) -> ray.data.Dataset:
    """Full pipeline. Lazy; caller consumes (write_parquet / iter / agg)."""
    cfg = cfg or CurateConfig()
    if cfg.fused_scorer:
        from neuscraper_ray.stages.scorer import extract_score_batch

        preds = pages.map_batches(
            extract_score_batch,
            batch_format="pyarrow",
            batch_size=cfg.parse_batch_size,
            fn_kwargs={"num_buckets": cfg.num_buckets},
        )
        docs = assemble_pages(preds, cfg, has_bucket=True)
    else:
        nodes = extract_nodes(pages, cfg)
        preds = score_nodes(nodes, cfg)
        docs = assemble_pages(preds, cfg)
    out = filter_chain(
        docs, cfg, with_content_hash=cfg.mark_duplicates or cfg.emit_content_hash
    )
    if cfg.mark_duplicates:
        import os
        import tempfile

        from neuscraper_ray.stages.dedup_mark import mark_duplicates

        # Dup marking needs two passes over the curated docs (hash
        # projection, then the mark). Size switch: when the INPUT
        # parquet bytes (known statically, a conservative bound on the
        # curated output) fit under dedup_pin_input_limit, pin the
        # curated docs in the object store — no parquet round-trip, the
        # fast arm on a node-sized corpus. Otherwise STREAM them to a
        # parquet checkpoint: the object store only ever holds
        # in-flight blocks, the canonical projection re-reads ONLY the
        # (content_hash, url) columns (column-pruned scan; text bytes
        # never move for pass 1), and the mark pass streams the files
        # back through — the checkpoint doubles as a resume point at
        # 100-TB scale (it IS the curated corpus on disk; the runner's
        # two-phase --mark-duplicates is the recommended production
        # route and never enters this branch). content_hash was
        # computed IN the filter pass above either way — the corpus is
        # md5-hashed exactly once end to end.
        try:
            in_files = pages.input_files()
            # [] = in-memory / non-file source: size unknown, NOT zero
            in_bytes = (
                sum(os.path.getsize(f) for f in in_files) if in_files else None
            )
        except Exception:  # non-file source: size unknown -> checkpoint
            in_bytes = None
        if (
            cfg.dedup_checkpoint_dir is None
            and in_bytes is not None
            and in_bytes <= cfg.dedup_pin_input_limit
        ):
            from neuscraper_ray.stages.dedup_mark import (
                BROADCAST_CANON_LIMIT,
                build_canonical_map_driver,
                mark_with_canon,
            )

            m = out.materialize()
            # corpus is known-bounded here, so the canonical index
            # folds on the driver (zero exchanges); an extreme dup rate
            # still falls back to the bucketed group-mark shuffle
            canon = build_canonical_map_driver(m, "content_hash")
            if len(canon) <= BROADCAST_CANON_LIMIT:
                return mark_with_canon(m, ray.put(canon), hash_col="content_hash")
            return mark_duplicates(m, hash_col="content_hash")
        ckpt = cfg.dedup_checkpoint_dir
        if ckpt is None:
            ckpt = tempfile.mkdtemp(prefix="curate_dedup_ckpt_")
        elif os.path.isdir(ckpt) and os.listdir(ckpt):
            raise ValueError(
                f"dedup_checkpoint_dir {ckpt!r} is not empty; stale files "
                "would pollute the dup-marking re-read"
            )
        out.write_parquet(ckpt)
        out = mark_duplicates(
            ray.data.read_parquet(ckpt),
            hash_col="content_hash",
            proj=ray.data.read_parquet(ckpt, columns=["content_hash", "url"]),
        )
    return out
