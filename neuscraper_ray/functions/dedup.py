"""Deduplication operators for web-scale corpora.

All operate on a ``ray.data.Dataset`` with an id column and a text
column and are built from shuffle-minimal primitives:

- **exact**: content hash in a vectorized ``map_batches`` ->
  ``groupby(hash)`` keep-first. One shuffle keyed on a short hash (never
  on the raw text).
- **MinHash + LSH** near-dup: word-shingle minhash signatures per batch
  -> explode to (band, band_hash, id) rows -> coarse-bucket groupby ->
  candidate pairs -> min-label cluster ids. The only all-to-all moves
  (n_bands x id) rows, not text.
- **SimHash**: 64-bit simhash per doc; near-dup candidates via 4-way
  band blocking (Hamming distance <= 3 guarantee by pigeonhole).
- **n-gram Jaccard** verify: exact similarity for a candidate pair list
  (small side), used as the precise check behind either blocker.

Hashing lives in ``polyhash`` (shared Mersenne-61 polynomial family):
one vectorized pass per batch — no per-shingle / per-word Python
hashing — and semantics a DuckDB oracle reproduces value-for-value
(``__ray_entry__.oracle_sql``: docs_minhash_clusters,
docs_simhash_pairs are hash-verified, not rows-only).

Cluster assignment (``near_dup_clusters``) is distributed min-label
propagation: per round, labels co-partition with the symmetrized edge
list by a node-hash bucket, neighbor messages are generated in-bucket,
and a ``groupby(node).min`` reduces — O(diameter) rounds, each a
bounded shuffle of (node, label) rows. The edge list is never
materialized on the driver, so it holds when edges exceed driver
memory; only the final (doc, cluster) result (output-sized) comes back.

Reference parity: mirrors the dedup semantics a corpus-curation stack
needs around OpenMatch/NeuScraper's extraction core (the reference
itself dedups per-url only — src/warc/get_text.py keeps one text per
url); these operators extend that to corpus-level near-dup at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from neuscraper_ray.config import NUM_BUCKETS
from neuscraper_ray.functions import polyhash as ph
from neuscraper_ray.functions.textstats import md5_hex

# ---------------------------------------------------------------- exact


def exact_dedup(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """One row per distinct text: min id + copy count.

    Output: ``(id_col, n_copies: int64)`` — the kept representative.
    """
    def add_hash(batch: pa.Table) -> pa.Table:
        hs = md5_hex(batch.column(text_col).to_pylist())
        t = batch.select([id_col]).append_column("h", pa.array(hs, pa.string()))
        # shuffle key is a coarse bucket of the hash, not the hash
        # itself: one group per DISTINCT TEXT would pay per-group
        # Python at corpus scale (CLAUDE.md pitfall); the md5 is
        # uniform, so its first 4 hex chars bucket evenly
        hb = np.fromiter(
            (int(s[:4], 16) % NUM_BUCKETS for s in hs),
            dtype=np.int32,
            count=len(hs),
        )
        return t.append_column("hb", pa.array(hb))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", sort=False)[id_col].agg(["min", "size"])
        return pd.DataFrame(
            {
                id_col: g["min"].to_numpy(),
                "n_copies": g["size"].to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def soft_dedup_weights(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Soft deduplication (the SoftDeDup idea: DOWNWEIGHT duplicated
    content instead of dropping it — each of a text's n copies trains
    with weight 1/n, so the group contributes one document's worth of
    gradient). -> ``(doc_id, n_copies, weight_ppm)`` for EVERY doc,
    weight_ppm = 1e6 // n_copies.

    Same single (id, md5) exchange as :func:`exact_dedup` — the only
    difference is the in-bucket merge emits every row with its group's
    size (transform, not agg) instead of one representative."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = md5_hex(batch.column(text_col).to_pylist())
        t = batch.select([id_col]).append_column("h", pa.array(hs, pa.string()))
        hb = np.fromiter(
            (int(s[:4], 16) % NUM_BUCKETS for s in hs),
            dtype=np.int32,
            count=len(hs),
        )
        return t.append_column("hb", pa.array(hb))

    def weigh_bucket(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby("h", sort=False)[id_col].transform("size").to_numpy()
        n = n.astype(np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "n_copies": n,
                "weight_ppm": 1_000_000 // n,
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(weigh_bucket, batch_format="pandas")
    )


def exact_dedup_fp(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """``exact_dedup`` keyed on the vectorized Mersenne-61 polyhash
    text fingerprint instead of md5. Same output contract:
    ``(id_col, n_copies)`` per distinct text, min id kept. SQL twin:
    ``polyhash.sql_fingerprint`` (an int64 GROUP BY key, where the md5
    variant's oracle groups on the raw text).

    MEASURED NEGATIVE RESULT (kept on purpose): the hypothesis that
    replacing the per-row hashlib loop with this vectorized kernel
    would speed the hot path up is FALSE — hashlib's C md5 hashes
    ~1.1us/doc on sf0.1 documents vs ~25us/doc for the mod-M
    polynomial (numpy does ~10 uint64 ops per character; md5's C loop
    simply wins), so ``exact_dedup`` (md5) REMAINS the default. This
    variant stays as the SQL-twin-keyed alternative and for corpora
    where a 64-bit int key downstream is worth more than hash speed.
    Collision trade-off: 61-bit fingerprints collide with probability
    ~n^2/2^61 per bucket (md5's 128 bits effectively never); both
    variants' dup structure is pinned equal in tests.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        from neuscraper_ray.functions.joins import _bucket_i64

        fp = ph.fingerprints(batch.column(text_col).to_pylist())
        t = batch.select([id_col]).append_column("h", pa.array(fp, pa.int64()))
        # splitmix64 decorrelates the bucket from the hash's low bits
        return t.append_column(
            "hb", pa.array(_bucket_i64(fp, NUM_BUCKETS), pa.int32())
        )

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", sort=False)[id_col].agg(["min", "size"])
        return pd.DataFrame(
            {
                id_col: g["min"].to_numpy(),
                "n_copies": g["size"].to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------- line-level

LINE_STRIP = " \t\r"  # SQL twin: trim(x, ' ' || chr(9) || chr(13))


def line_dedup_stats(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = NUM_BUCKETS,
) -> ray.data.Dataset:
    """CCNet/RefinedWeb-style duplicated-line statistics: per document,
    how many of its distinct non-empty lines (split on ``\\n``, trimmed
    of ``LINE_STRIP``) also appear in at least one OTHER document.
    -> ``(doc_id, n_lines, n_dup_lines, dup_line_ppm)`` for every doc
    (zero rows for docs with no non-empty lines).

    Scale shape: lines are extracted with pyarrow kernels
    (split_pattern / list_flatten / utf8_trim — no Python string loop),
    de-duplicated per doc in-batch (global, since a doc lives in one
    batch), then exchanged TWICE, both times as (hash-bucketed) pairs:
    once by LINE bucket — a line's global doc-count is decidable
    in-bucket because equal lines share a bucket — collapsing
    immediately to per-(bucket, doc) partial counts, and once by DOC
    bucket to sum partials. No per-distinct-line groupby (CLAUDE.md
    pitfall), no driver materialization, duplicate-line index never
    built. A doc's partial rows are bounded by min(its lines, B).
    """
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import _bucket_i64, str_buckets

    def pairs(batch: pa.Table) -> pa.Table:
        lines = pc.split_pattern(batch.column(text_col), "\n")
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        trimmed = pc.utf8_trim(flat, LINE_STRIP)
        keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy()
        df = pd.DataFrame(
            {
                id_col: ids[parents[keep]],
                "line": trimmed.to_pandas()[keep].to_numpy(),
            }
        ).drop_duplicates()
        df["b"] = str_buckets(df["line"].tolist(), num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def line_bucket_agg(df: pd.DataFrame) -> pd.DataFrame:
        # pairs are (doc, line)-distinct, so size == distinct doc count
        nd = df.groupby("line", sort=False)[id_col].transform("size")
        out = (
            df.assign(isdup=(nd >= 2).astype(np.int64))
            .groupby(id_col, as_index=False)
            .agg(n_lines=("line", "size"), n_dup_lines=("isdup", "sum"))
        )
        return out

    def zeros(batch: pa.Table) -> pa.Table:
        z = np.zeros(len(batch), dtype=np.int64)
        return pa.table(
            {id_col: batch.column(id_col), "n_lines": z, "n_dup_lines": z}
        )

    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["db"] = _bucket_i64(df[id_col].to_numpy(), num_buckets)
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, as_index=False).agg(
            n_lines=("n_lines", "sum"), n_dup_lines=("n_dup_lines", "sum")
        )
        nl = g["n_lines"].to_numpy()
        nd = g["n_dup_lines"].to_numpy()
        g["dup_line_ppm"] = np.where(nl > 0, (nd * 1_000_000) // np.maximum(nl, 1), 0)
        return g[[id_col, "n_lines", "n_dup_lines", "dup_line_ppm"]]

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("b")
        .map_groups(line_bucket_agg, batch_format="pandas")
    )
    # sentinel zero-partials keep line-less docs in the output
    zero_rows = ds.select_columns([id_col]).map_batches(
        zeros, batch_format="pyarrow"
    )
    return (
        partials.union(zero_rows)
        .map_batches(doc_bucket, batch_format="pandas", batch_size=None)
        .groupby("db")
        .map_groups(fold, batch_format="pandas")
    )


def _linify_batch(
    batch: pa.Table,
    *,
    id_col: str,
    text_col: str,
    sep: str,
    strip: str,
    num_buckets: int,
    source_col: str | None = None,
) -> pa.Table:
    """Shared line-extraction kernel under :func:`line_dedup_apply`
    and :func:`boilerplate_lines_apply`: split each doc on ``sep``,
    trim ``strip``, drop empties, derive an offsets-based in-doc line
    index (no Python string loop), bucket real lines by LINE-text hash
    (``hb``) and append one sentinel row per input doc so line-less
    docs survive to reassembly. Sentinels are routed by a DOC-id hash
    bucket — they never interact with the in-bucket line logic (both
    consumers split on ``line_idx < 0``), and pinning them to one
    bucket would make that bucket O(n_docs) hot at scale."""
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import _bucket_i64, str_buckets

    lines = pc.split_pattern(batch.column(text_col), sep).combine_chunks()
    offs = lines.offsets.to_numpy()
    flat = lines.values
    parents = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    line_idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
        offs[:-1].astype(np.int64), np.diff(offs)
    )
    trimmed = pc.utf8_trim(flat, strip)
    keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).to_numpy()
    cols = {id_col: pa.array(ids[parents[keep]], pa.int64())}
    if source_col is not None:
        srcs = batch.column(source_col).to_numpy(zero_copy_only=False)
        cols[source_col] = pa.array(srcs[parents[keep]], pa.string())
    cols["line_idx"] = pa.array(line_idx[keep], pa.int64())
    cols["line"] = trimmed.filter(pa.array(keep))
    out = pa.table(cols)
    hb = str_buckets(out.column("line"), num_buckets)
    out = out.append_column("hb", pa.array(hb, pa.int32()))
    n = len(batch)
    scols = {id_col: batch.column(id_col)}
    if source_col is not None:
        scols[source_col] = pa.array([""] * n, pa.string())
    scols["line_idx"] = pa.array(np.full(n, -1, dtype=np.int64))
    scols["line"] = pa.array([""] * n, pa.string())
    scols["hb"] = pa.array(
        _bucket_i64(ids, num_buckets).astype(np.int32)
    )
    return pa.concat_tables([out, pa.table(scols)])


def line_dedup_apply(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = NUM_BUCKETS,
    sep: str = "\n",
    strip: str = LINE_STRIP,
) -> ray.data.Dataset:
    """CCNet-style line-level deduplication APPLIED (Wenzek et al.
    2020 §3.1 drop every repeated occurrence of a line): split each
    document on ``sep``, trim units of ``strip``, drop empties,
    keep only the FIRST corpus-wide occurrence of each distinct
    trimmed unit (first = lexicographic min ``(doc_id, line_idx)`` —
    deterministic under any partitioning and task order), and
    reassemble the surviving units (``sep``-joined) per document in
    original order.
    -> ``(doc_id, n_lines, n_kept, text_dedup)`` for EVERY input doc
    (0/0/'' for docs with no non-empty units). The companion
    statistics view is :func:`line_dedup_stats`; the paragraph
    granularity (MassiveText) is :func:`paragraph_dedup_apply`.

    Scale shape (the ``docs_chunk_dedup`` topology at line
    granularity): lines extracted with pyarrow kernels plus an
    offsets-derived in-document line index (no Python string loop);
    TWO keyed exchanges, both on coarse vectorized buckets — once by
    LINE-text hash (every copy of a line lands in one bucket, so the
    in-bucket first-occurrence scan is globally correct; dedup keys
    on the exact text, the hash only routes) and once by DOC id to
    reassemble. One sentinel row per doc keeps line-less docs in the
    output. No stage holds the corpus; the driver holds nothing.
    """
    import polars as pl

    from neuscraper_ray.functions.joins import _bucket_i64

    def linify(batch: pa.Table) -> pa.Table:
        return _linify_batch(
            batch,
            id_col=id_col,
            text_col=text_col,
            sep=sep,
            strip=strip,
            num_buckets=num_buckets,
        )

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        sent = df[df["line_idx"] < 0].copy()
        real = df[df["line_idx"] >= 0].sort_values(
            ["line", id_col, "line_idx"], kind="mergesort"
        )
        real = real.assign(keep=~real["line"].duplicated().to_numpy())
        sent = sent.assign(keep=True)
        out = pd.concat([real, sent], ignore_index=True)
        out["db"] = _bucket_i64(out[id_col].to_numpy(), num_buckets)
        return out[[id_col, "line_idx", "line", "keep", "db"]]

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        pf = pl.from_pandas(df)
        real = pf.filter(pl.col("line_idx") >= 0)
        stats = real.group_by(id_col).agg(
            pl.len().cast(pl.Int64).alias("n_lines"),
            pl.col("keep").sum().cast(pl.Int64).alias("n_kept"),
        )
        txt = (
            real.filter(pl.col("keep"))
            .sort([id_col, "line_idx"])
            .group_by(id_col, maintain_order=True)
            .agg(pl.col("line").str.join(sep).alias("text_dedup"))
        )
        out = (
            pf.filter(pl.col("line_idx") < 0)
            .select(id_col)
            .unique()
            .join(stats, on=id_col, how="left")
            .join(txt, on=id_col, how="left")
            .with_columns(
                pl.col("n_lines").fill_null(0),
                pl.col("n_kept").fill_null(0),
                pl.col("text_dedup").fill_null(""),
            )
        )
        return out.to_pandas()

    return (
        ds.map_batches(linify, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(mark, batch_format="pandas")
        .groupby("db")
        .map_groups(assemble, batch_format="pandas")
    )


PARA_STRIP = LINE_STRIP + "\n"
"""Paragraph trim set (SQL twin: trim(x, ' '||chr(9)||chr(13)||chr(10)))
— a paragraph may carry interior newlines but sheds surrounding ones."""


def paragraph_dedup_apply(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = NUM_BUCKETS,
) -> ray.data.Dataset:
    """MassiveText/Gopher-style exact PARAGRAPH deduplication (Rae et
    al. 2021 §A.1.2 "we remove exact duplicate paragraphs"): the
    :func:`line_dedup_apply` machinery at ``\\n\\n`` granularity —
    first corpus-wide occurrence of each distinct trimmed paragraph
    wins, survivors reassembled per doc joined by ``\\n\\n``.
    Completes the dedup granularity ladder: whole-doc md5 -> paragraph
    -> line -> 10-word chunk -> 3-gram shingle. Output columns are the
    shared (doc_id, n_lines, n_kept, text_dedup) contract with "lines"
    meaning paragraphs; the query layer renames to n_paras."""
    return line_dedup_apply(
        ds,
        id_col=id_col,
        text_col=text_col,
        num_buckets=num_buckets,
        sep="\n\n",
        strip=PARA_STRIP,
    )


def boilerplate_lines_apply(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
    min_docs: int = 2,
    num_buckets: int = NUM_BUCKETS,
) -> ray.data.Dataset:
    """Boilerplate-line removal (CCNet §3.1 / RefinedWeb "remove
    frequent lines"): a trimmed non-empty line that occurs in
    >= ``min_docs`` DISTINCT documents of the same scope is boilerplate
    — nav bars, cookie banners, footers — and EVERY occurrence is
    removed. Scope is ``source_col`` (per-domain template text) or the
    whole corpus when ``source_col=None`` (the CCNet/RefinedWeb
    crawl-wide frequency rule). Unlike :func:`line_dedup_apply` (first
    occurrence wins) this keeps NO occurrence, which is the semantics a
    crawl pipeline wants for template text: the first copy of a cookie
    banner is exactly as worthless as the thousandth.
    -> ``(id_col, n_lines, n_boiler, text_clean)`` for EVERY input doc
    (0/0/'' for docs with no non-empty lines).

    Scale shape: identical two-exchange topology to
    :func:`line_dedup_apply` — lines extracted with pyarrow kernels,
    ONE exchange keyed on a coarse LINE-text-hash bucket (all copies of
    a line land in one bucket regardless of scope, so the in-bucket
    per-(scope, line) distinct-doc count is globally correct), ONE
    exchange keyed on doc id to reassemble. Per-domain frequency needs
    no per-domain shuffle. Text lines move once; nothing is
    driver-side.
    """
    import polars as pl

    from neuscraper_ray.functions.joins import _bucket_i64

    group_cols = ["line"] if source_col is None else [source_col, "line"]

    def linify(batch: pa.Table) -> pa.Table:
        return _linify_batch(
            batch,
            id_col=id_col,
            text_col=text_col,
            sep="\n",
            strip=LINE_STRIP,
            num_buckets=num_buckets,
            source_col=source_col,
        )

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        pf = pl.from_pandas(df)
        real = pf.filter(pl.col("line_idx") >= 0).with_columns(
            (
                pl.col(id_col).n_unique().over(group_cols)
                < min_docs
            ).alias("keep")
        )
        sent = pf.filter(pl.col("line_idx") < 0).with_columns(
            pl.lit(True).alias("keep")
        )
        out = pl.concat([real, sent]).to_pandas()
        out["db"] = _bucket_i64(out[id_col].to_numpy(), num_buckets)
        return out[[id_col, "line_idx", "line", "keep", "db"]]

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        pf = pl.from_pandas(df)
        real = pf.filter(pl.col("line_idx") >= 0)
        stats = real.group_by(id_col).agg(
            pl.len().cast(pl.Int64).alias("n_lines"),
            (pl.len() - pl.col("keep").sum()).cast(pl.Int64).alias("n_boiler"),
        )
        txt = (
            real.filter(pl.col("keep"))
            .sort([id_col, "line_idx"])
            .group_by(id_col, maintain_order=True)
            .agg(pl.col("line").str.join("\n").alias("text_clean"))
        )
        out = (
            pf.filter(pl.col("line_idx") < 0)
            .select(id_col)
            .unique()
            .join(stats, on=id_col, how="left")
            .join(txt, on=id_col, how="left")
            .with_columns(
                pl.col("n_lines").fill_null(0),
                pl.col("n_boiler").fill_null(0),
                pl.col("text_clean").fill_null(""),
            )
        )
        return out.to_pandas()

    return (
        ds.map_batches(linify, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(mark, batch_format="pandas")
        .groupby("db")
        .map_groups(assemble, batch_format="pandas")
    )


# ------------------------------------------------- snapshot-incremental


def snapshot_anti_dedup(
    ds_new: ray.data.Dataset,
    ds_old: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_col: str = "source",
    num_buckets: int = NUM_BUCKETS,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 23,
) -> ray.data.Dataset:
    """Incremental (snapshot-over-snapshot) exact dedup: keep only the
    rows of ``ds_new`` whose content hash does NOT appear anywhere in
    ``ds_old`` — the CommonCrawl-style "dedup this month's crawl
    against everything already ingested" pass.
    -> ``(id_col, keep_col)`` of the surviving new docs.

    Scale shape: BOTH snapshots may be 100-TB-sized, so neither side is
    broadcast. Each side is reduced to (id, md5, side) in a vectorized
    ``map_batches`` projection — the text never moves — then ONE keyed
    exchange on a coarse md5 bucket co-locates every copy of a hash,
    and the in-bucket anti-join is a vectorized ``isin`` against that
    bucket's old-side hashes. The exchange carries ~50 bytes/doc
    regardless of doc size.

    ``bloom_prefilter=True`` is the extreme-scale swap-in: ONE extra
    pass over the old side builds a packed Bloom bitmap of its text
    fingerprints (per-batch bitmap partials, driver OR-fold, 1 MiB at
    the default — ``functions/sketch.py``), broadcast once; new docs
    whose fingerprint is DEFINITELY absent (no false negatives — same
    text means same fingerprint) skip the md5 comparison entirely and
    ride the exchange as (id, keep)-only pass-through rows, so only
    the maybes (true dups + the bounded false-positive rate) carry
    hashes and join the in-bucket check. Output is asserted
    value-identical to the exact path in tests.
    """
    from neuscraper_ray.functions.joins import _bucket_i64

    bm_ref = None
    if bloom_prefilter:
        from neuscraper_ray.functions.sketch import bloom_build

        def fp_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"fp": pa.array(ph.fingerprints(batch.column(text_col).to_pylist()))}
            )

        bm = bloom_build(
            ds_old.map_batches(fp_rows, batch_format="pyarrow"), "fp", n_bits=bloom_bits
        )
        bm_ref = ray.put(bm)

    def project(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            texts = batch.column(text_col).to_pylist()
            if side and bm_ref is not None:
                from neuscraper_ray.functions.sketch import bloom_maybe_contains

                maybe = bloom_maybe_contains(
                    ray.get(bm_ref), ph.fingerprints(texts).astype(np.uint64)
                )
            else:
                maybe = np.ones(n, dtype=bool)
            # definite-new rows skip md5 entirely and spread on an id
            # bucket; maybes (and the whole old side) bucket on the hash
            if side and bm_ref is not None:
                hs = [""] * n
                mh = iter(md5_hex([t for t, m in zip(texts, maybe) if m]))
                for i, m in enumerate(maybe):
                    if m:
                        hs[i] = next(mh)
            else:
                hs = md5_hex(texts)
            ids = (
                batch.column(id_col).to_numpy().astype(np.int64)
                if side
                else np.full(n, -1, dtype=np.int64)
            )
            hb = np.where(
                np.asarray([bool(s) for s in hs]),
                np.fromiter(
                    (int(s[:4], 16) % num_buckets if s else 0 for s in hs),
                    dtype=np.int32,
                    count=n,
                ),
                _bucket_i64(ids, num_buckets),
            ).astype(np.int32)
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    keep_col: batch.column(keep_col)
                    if side
                    else pa.array([""] * n, pa.string()),
                    "h": pa.array(hs, pa.string()),
                    "hb": pa.array(hb),
                    "side": pa.array(np.full(n, side, dtype=np.int8)),
                }
            )

        return fn

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        new = df[df["side"] == 1]
        old_h = df.loc[df["side"] == 0, "h"]
        keep = (new["h"] == "") | ~new["h"].isin(old_h)
        return new.loc[keep, [id_col, keep_col]]

    both = ds_new.map_batches(project(1), batch_format="pyarrow").union(
        ds_old.map_batches(project(0), batch_format="pyarrow")
    )
    return both.groupby("hb").map_groups(anti, batch_format="pandas")


SNAPSHOT_NEAR_BROADCAST_OLD_LIMIT = 100_000


def _snapshot_near_broadcast(
    ds_new: ray.data.Dataset,
    old_tb: "pa.Table",
    id_col: str,
    text_col: str,
    keep_col: str,
    threshold_e6: int,
    a_par: np.ndarray,
    b_par: np.ndarray,
) -> ray.data.Dataset:
    """Small-old-snapshot arm of :func:`snapshot_near_anti_dedup`:
    the OLD side's derived (id, shingles, signature) table fits the
    broadcast limit, so pack it once on the driver — per-band sorted
    band-hash arrays for O(log n) candidate lookup plus the ragged
    shingle values/offsets for exact verification — ``ray.put`` it,
    and decide every new doc inside one ``map_batches`` pass over
    ``ds_new`` with ZERO exchanges (the join path pays six). Candidate
    generation (band match), verification (exact Jaccard at
    ``threshold_e6``) and the anti semantics are bit-identical to the
    join arm; tests pin the two arms value-equal."""
    import pyarrow.compute as _pc

    n_old = old_tb.num_rows
    old_sigs = (
        old_tb.column("sig")
        .combine_chunks()
        .flatten()
        .to_numpy()
        .reshape(n_old, ph.N_PERM)
        .view(np.uint64)
    )
    bh_old = ph.band_hashes(old_sigs, ph.N_BANDS)  # (n_old, N_BANDS) uint64
    sh_col = old_tb.column("sh").combine_chunks()
    old_lens = _pc.list_value_length(sh_col).to_numpy().astype(np.int64)
    old_vals = np.ascontiguousarray(sh_col.flatten().to_numpy())
    old_offs = np.zeros(n_old + 1, dtype=np.int64)
    np.cumsum(old_lens, out=old_offs[1:])
    # per-band posting index: sorted band hashes + the argsort that
    # maps a sorted position back to the old doc row
    band_sorted = []
    band_order = []
    for b in range(ph.N_BANDS):
        order = np.argsort(bh_old[:, b], kind="stable").astype(np.int32)
        band_sorted.append(np.ascontiguousarray(bh_old[order, b]))
        band_order.append(order)
    packed = ray.put(
        {
            "band_sorted": band_sorted,
            "band_order": band_order,
            "old_vals": old_vals,
            "old_offs": old_offs,
        }
    )

    def keep_rows(t: pa.Table) -> pa.Table:
        P = ray.get(packed)  # zero-copy views out of the object store
        ids = t.column(id_col).to_numpy().astype(np.int64)
        texts = t.column(text_col).to_pylist()
        n = len(texts)
        dw = ph.DocWords(texts)
        sh32, sdoc = ph.doc_shingles32(dw)
        sigs = ph.minhash_sigs(sh32, sdoc, n, a_par, b_par)
        bh_new = ph.band_hashes(sigs.view(np.uint64), ph.N_BANDS)
        bounds = np.searchsorted(sdoc, np.arange(n + 1))
        # candidate pairs from every band, then global pair dedup
        pair_keys: list[np.ndarray] = []
        for b in range(ph.N_BANDS):
            sb = P["band_sorted"][b]
            lo = np.searchsorted(sb, bh_new[:, b], side="left")
            hi = np.searchsorted(sb, bh_new[:, b], side="right")
            counts = hi - lo
            nz = counts > 0
            if not nz.any():
                continue
            c = counts[nz]
            starts = lo[nz]
            ends = np.cumsum(c)
            flat = (
                np.arange(ends[-1], dtype=np.int64)
                - np.repeat(ends - c, c)
                + np.repeat(starts, c)
            )
            i_new = np.repeat(np.nonzero(nz)[0].astype(np.int64), c)
            i_old = P["band_order"][b][flat].astype(np.int64)
            pair_keys.append(i_new * n_old + i_old)
        hit = np.zeros(n, dtype=bool)
        if pair_keys:
            keys = np.unique(np.concatenate(pair_keys))
            ov, oo = P["old_vals"], P["old_offs"]
            for key in keys:
                i = int(key // n_old)
                if hit[i]:
                    continue
                j = int(key % n_old)
                a = sh32[bounds[i] : bounds[i + 1]].astype(np.int64)
                bsh = ov[oo[j] : oo[j + 1]]
                inter = len(np.intersect1d(a, bsh, assume_unique=True))
                union = len(a) + len(bsh) - inter
                j6 = (inter * 1_000_000) // union if union else 1_000_000
                if j6 >= threshold_e6:
                    hit[i] = True
        keep = ~hit
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                keep_col: t.column(keep_col).cast(pa.string()).filter(
                    pa.array(keep)
                ),
            }
        )

    return ds_new.map_batches(keep_rows, batch_format="pyarrow")


def snapshot_near_anti_dedup(
    ds_new: ray.data.Dataset,
    ds_old: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_col: str = "source",
    threshold_e6: int = 500_000,
    num_buckets: int = NUM_BUCKETS,
    broadcast_old_limit: int = SNAPSHOT_NEAR_BROADCAST_OLD_LIMIT,
) -> ray.data.Dataset:
    """Incremental (snapshot-over-snapshot) NEAR-dup dedup: keep only
    the rows of ``ds_new`` that are not MinHash-LSH-candidate +
    exact-Jaccard-verified (>= ``threshold_e6``) near-duplicates of ANY
    ``ds_old`` doc — the companion to :func:`snapshot_anti_dedup`
    (exact hashes) for the "this month's crawl re-renders last month's
    pages with a new footer" case. -> ``(id_col, keep_col)`` of the
    surviving new docs. Ids must be unique across both sides.

    Scale shape, size-switched like ``minhash_precision_pairs`` /
    ``mark_duplicates``: when the OLD snapshot's derived table holds
    <= ``broadcast_old_limit`` docs (a backfill against a small seed
    set, or the bench geometry) it broadcasts as a packed per-band
    posting index and every new doc is decided in one zero-exchange
    ``map_batches`` pass (:func:`_snapshot_near_broadcast`). Above the
    limit BOTH snapshots may be corpus-sized, so neither side
    broadcasts anywhere: each side reduces to a derived (id, shingles,
    signature) table in one vectorized pass (text never moves again);
    band rows from both sides co-partition on a coarse band-hash
    bucket and the in-bucket merge emits only NEW x OLD candidate
    pairs (never new x new — the old snapshot is purely an anti-join
    side). Two co-partitioned ``hash_join`` passes attach each side's
    shingles (global pair dedup rides the first join's in-bucket
    ``unique``), exact Jaccard verifies vectorized per edge batch, and
    the final anti-join co-partitions hits with the new docs on a
    coarse id bucket. Semantics (and fixed-point e6) are reproduced
    exactly by ``polyhash.sql_snapshot_near_anti`` and both arms are
    pinned value-identical in tests."""
    import pyarrow as _pa

    from neuscraper_ray.functions.joins import _bucket_i64, hash_join

    a_par, b_par = ph.minhash_params()

    def derived_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        texts = t.column(text_col).to_pylist()
        dw = ph.DocWords(texts)
        sh32, sdoc = ph.doc_shingles32(dw)
        sigs = ph.minhash_sigs(sh32, sdoc, len(texts), a_par, b_par)
        bounds = np.searchsorted(sdoc, np.arange(len(texts) + 1))
        lists = [
            sh32[bounds[i] : bounds[i + 1]].astype(np.int64).tolist()
            for i in range(len(texts))
        ]
        return pa.table(
            {
                "doc_id": ids.astype(np.int64),
                "sh": _pa.array(lists, _pa.list_(_pa.int64())),
                "sig": _pa.array(
                    sigs.astype(np.int64).tolist(), _pa.list_(_pa.int64())
                ),
            }
        )

    derived_old = ds_old.map_batches(derived_rows, batch_format="pyarrow").materialize()
    n_old = derived_old.count()
    if n_old == 0:
        # no prior snapshot: every new doc survives (and the broadcast
        # packer would pa.concat_tables([]) on an empty derived table)
        def passthrough(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: t.column(id_col).cast(pa.int64()),
                    keep_col: t.column(keep_col).cast(pa.string()),
                }
            )

        return ds_new.map_batches(passthrough, batch_format="pyarrow")
    if n_old <= broadcast_old_limit:
        old_tb = pa.concat_tables(
            list(derived_old.iter_batches(batch_format="pyarrow"))
        ).combine_chunks()
        return _snapshot_near_broadcast(
            ds_new, old_tb, id_col, text_col, keep_col, threshold_e6,
            a_par, b_par,
        )

    derived_new = ds_new.map_batches(derived_rows, batch_format="pyarrow").materialize()

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        return fn

    bands = (
        derived_new.map_batches(_band_rows_from_sigs, batch_format="pyarrow")
        .map_batches(tag(1), batch_format="pyarrow", batch_size=None)
        .union(
            derived_old.map_batches(_band_rows_from_sigs, batch_format="pyarrow")
            .map_batches(tag(0), batch_format="pyarrow", batch_size=None)
        )
    )

    def add_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df["coarse"] = (df["band_hash"] % num_buckets).astype(np.int32)
        return df

    def cross_pairs(df: pd.DataFrame) -> pd.DataFrame:
        new = df.loc[df["side"] == 1, ["band", "band_hash", "doc_id"]]
        old = df.loc[df["side"] == 0, ["band", "band_hash", "doc_id"]]
        m = new.merge(old, on=["band", "band_hash"], suffixes=("_n", "_o"))
        out = m.rename(columns={"doc_id_n": "id_n", "doc_id_o": "id_o"})[
            ["id_n", "id_o"]
        ]
        return out.drop_duplicates()

    edges = (
        bands.map_batches(add_coarse, batch_format="pandas")
        .groupby("coarse")
        .map_groups(cross_pairs, batch_format="pandas")
    )

    shingles = derived_new.select_columns(["doc_id", "sh"]).union(
        derived_old.select_columns(["doc_id", "sh"])
    )
    edge_schema = _pa.schema([("id_n", _pa.int64()), ("id_o", _pa.int64())])
    sh_schema = _pa.schema([("doc_id", _pa.int64()), ("sh", _pa.list_(_pa.int64()))])
    with_n = hash_join(
        edges, shingles, "id_n", "doc_id", edge_schema, sh_schema,
        num_buckets=num_buckets,
        left_prepare=lambda lf: lf.unique(subset=["id_n", "id_o"]),
    ).map_batches(
        lambda t: t.rename_columns(["id_n", "id_o", "sh_n"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    wn_schema = _pa.schema(
        [("id_n", _pa.int64()), ("id_o", _pa.int64()), ("sh_n", _pa.list_(_pa.int64()))]
    )
    both = hash_join(
        with_n, shingles, "id_o", "doc_id", wn_schema, sh_schema,
        num_buckets=num_buckets,
    )

    def hits(t: pa.Table) -> pa.Table:
        id_n = t.column("id_n").to_numpy()
        sh_n = t.column("sh_n").to_pylist()
        sh_o = t.column("sh").to_pylist()
        out = []
        for i in range(t.num_rows):
            a = np.asarray(sh_n[i], dtype=np.int64)
            b = np.asarray(sh_o[i], dtype=np.int64)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            j = (inter * 1_000_000) // union if union else 1_000_000
            if j >= threshold_e6:
                out.append(id_n[i])
        return pa.table({"hit_id": np.asarray(out, dtype=np.int64)})

    hit_ids = both.map_batches(hits, batch_format="pyarrow", batch_size=None)

    # anti-join: hits co-partition with the new docs on a coarse id
    # bucket — the hit list may itself be corpus-sized, so it is never
    # pulled to the driver or broadcast
    def new_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                keep_col: t.column(keep_col).cast(pa.string()),
                "isdoc": pa.array(np.ones(len(ids), dtype=np.int8)),
                "db": pa.array(_bucket_i64(ids, num_buckets), pa.int32()),
            }
        )

    def hit_rows(t: pa.Table) -> pa.Table:
        ids = t.column("hit_id").to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                keep_col: pa.array([""] * len(ids), pa.string()),
                "isdoc": pa.array(np.zeros(len(ids), dtype=np.int8)),
                "db": pa.array(_bucket_i64(ids, num_buckets), pa.int32()),
            }
        )

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        new = df[df["isdoc"] == 1]
        bad = df.loc[df["isdoc"] == 0, id_col]
        return new.loc[~new[id_col].isin(bad), [id_col, keep_col]]

    combined = ds_new.map_batches(new_rows, batch_format="pyarrow").union(
        hit_ids.map_batches(hit_rows, batch_format="pyarrow")
    )
    return combined.groupby("db").map_groups(anti, batch_format="pandas")


def ngram_coverage_stats(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = NUM_BUCKETS,
) -> ray.data.Dataset:
    """N-gram coverage (the Lee-et-al "Deduplicating Training Data"
    memorization signal at shingle granularity): per document, how many
    of its DISTINCT word-3-gram shingles also occur in at least one
    OTHER document -> ``(doc_id, n_shingles, n_shared, coverage_ppm)``
    for EVERY doc. A doc that is a near-copy of another scores close to
    1e6 even when no line or whole-text hash matches — the finest-grain
    member of the dedup-statistics family (whole-doc md5 ->
    line_dedup_stats -> this).

    Shingles are the shared ``polyhash.doc_shingles32`` 32-bit
    Mersenne-61 hashes (same values as the minhash/Jaccard family and
    the SQL twin ``polyhash.sql_shingle_ctes``): empty docs contribute
    the single shingle 0, docs with 0 < n < 3 words one shingle over
    all words — so every doc has >= 1 shingle and no zero-sentinel
    union is needed.

    Scale shape (the ``line_dedup_stats`` topology at shingle
    granularity): per-doc distinct (doc, shingle) pairs are emitted
    vectorized, then exchanged TWICE as hash-bucketed pairs — once by
    SHINGLE bucket (a shingle's global doc-count is decidable in-bucket
    because equal shingles share a bucket), collapsing immediately to
    per-(bucket, doc) partial counts, and once by DOC bucket to sum
    partials. No per-distinct-shingle Ray group, no driver
    materialization; text never moves past the first map."""
    from neuscraper_ray.functions.joins import _bucket_i64

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        dw = ph.DocWords(texts)
        sh32, sdoc = ph.doc_shingles32(dw)
        s = sh32.astype(np.int64)
        return pa.table(
            {
                id_col: ids[sdoc],
                "s32": s,
                "b": pa.array(_bucket_i64(s, num_buckets)),
            }
        )

    def shingle_bucket_agg(df: pd.DataFrame) -> pd.DataFrame:
        # pairs are (doc, shingle)-distinct, so size == distinct doc count
        nd = df.groupby("s32", sort=False)[id_col].transform("size")
        return (
            df.assign(isdup=(nd >= 2).astype(np.int64))
            .groupby(id_col, as_index=False)
            .agg(n_shingles=("s32", "size"), n_shared=("isdup", "sum"))
        )

    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["db"] = _bucket_i64(df[id_col].to_numpy(), num_buckets)
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, as_index=False).agg(
            n_shingles=("n_shingles", "sum"), n_shared=("n_shared", "sum")
        )
        # every doc has >= 1 shingle, so the divide is always defined
        g["coverage_ppm"] = (g["n_shared"].to_numpy() * 1_000_000) // g[
            "n_shingles"
        ].to_numpy()
        return g[[id_col, "n_shingles", "n_shared", "coverage_ppm"]]

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("b")
        .map_groups(shingle_bucket_agg, batch_format="pandas")
        .map_batches(doc_bucket, batch_format="pandas", batch_size=None)
        .groupby("db")
        .map_groups(fold, batch_format="pandas")
    )


# ----------------------------------------------------------- exactsubstr

EXACTSUBSTR_K = 50
"""Lee et al. 2022 (arXiv:2107.06499) dedup 50-token repeated spans;
the registered query uses a smaller k so the operator fires on the
short-doc test corpus."""

EXACTSUBSTR_BROADCAST_MARK_LIMIT = 2_000_000
"""At or below this many duplicate window occurrences the mark table
ships once via ``ray.put`` (two int64 columns — ~32 MB at the limit)
and removal is a zero-shuffle vectorized map. Above it, marks and docs
co-partition on a coarse doc-id bucket instead — the honest exchange
when a corpus is so self-repetitive the mark table itself is
cluster-sized (Lee et al. report ~3% of C4 tokens in duplicate spans,
so at 100 TB the fallback is the expected path). Both paths are
asserted value-identical in tests."""


def _rolling_window_hashes(
    dw: "ph.DocWords", k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (doc_index, win_idx within doc, window hash) for every
    k-token window fully inside one document. Window hash = fold
    init 0, ``h*BASE_S + word_hash`` mod M over the k BASE_W1 word
    hashes — exactly the oracle's ``list_reduce`` in
    ``polyhash.sql_exactsubstr_dedup``. k vectorized passes, no
    per-window Python."""
    h = dw.h1
    if len(h) < k:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    valid = np.nonzero(dw.word_doc[: len(h) - k + 1] == dw.word_doc[k - 1 :])[0]
    s = np.zeros(len(valid), dtype=np.uint64)
    bs = np.uint64(ph.BASE_S)
    for j in range(k):
        s = ph._red(ph.mulmod(s, bs) + h[valid + j])
    win_doc = dw.word_doc[valid]
    win_idx = valid - dw.wstart[win_doc]
    return win_doc, win_idx.astype(np.int64), s.astype(np.int64)


def _apply_span_removal(
    ids: np.ndarray,
    texts: list[str],
    mark_doc: np.ndarray,
    mark_win: np.ndarray,
    k: int,
) -> pa.Table:
    """Remove every token covered by a duplicate-window mark and
    reassemble -> (doc_id, n_tokens, n_removed, text_dedup) for every
    input doc. ``mark_doc`` must be sorted (ties on win order don't
    matter); all-numpy: coverage is a +1/-1 diff array over the
    batch-flattened token axis (every window sits inside one doc, so
    one flat cumsum never leaks across doc boundaries)."""
    import polars as pl

    n = len(ids)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
                "text_dedup": pa.array([], pa.string()),
            }
        )
    ws = (
        pl.Series("t", texts, dtype=pl.String)
        .str.extract_all(r"[^ \t\n\x0b\x0c\r]+")
        .to_arrow()
    )
    ws = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
    offs = ws.offsets.to_numpy().astype(np.int64)
    vals = ws.values
    if offs[0] != 0:  # sliced list array: rebase the flat view
        vals = vals.slice(offs[0])
        offs = offs - offs[0]
    lens = np.diff(offs)
    total = int(offs[-1])
    # gather this batch's marks: searchsorted ranges per doc, then one
    # ragged gather — no per-doc Python
    lo = np.searchsorted(mark_doc, ids)
    hi = np.searchsorted(mark_doc, ids, side="right")
    cnt = hi - lo
    tm = int(cnt.sum())
    removed = np.zeros(total, dtype=bool)
    if tm:
        cum = np.cumsum(cnt)
        gather = np.arange(tm, dtype=np.int64) - np.repeat(cum - cnt, cnt) + np.repeat(
            lo, cnt
        )
        starts = offs[np.repeat(np.arange(n), cnt)] + mark_win[gather]
        dif = np.zeros(total + 1, dtype=np.int64)
        np.add.at(dif, starts, 1)
        np.add.at(dif, starts + k, -1)
        removed = np.cumsum(dif[:total]) > 0
    parents = np.repeat(np.arange(n), lens)
    n_removed = np.bincount(parents[removed], minlength=n)
    kept = pl.DataFrame(
        {
            "i": parents[~removed],
            "w": pl.from_arrow(vals.filter(pa.array(~removed))),
        }
    )
    joined = kept.group_by("i", maintain_order=True).agg(
        pl.col("w").str.join(" ").alias("text_dedup")
    )
    out = (
        pl.DataFrame({"i": np.arange(n), "doc_id": ids})
        .join(joined, on="i", how="left")
        .with_columns(pl.col("text_dedup").fill_null(""))
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "n_removed": pa.array(n_removed.astype(np.int64), pa.int64()),
            "text_dedup": out["text_dedup"].to_arrow().cast(pa.string()),
        }
    )


def exactsubstr_dedup(
    ds: ray.data.Dataset,
    k: int = EXACTSUBSTR_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = NUM_BUCKETS,
    broadcast_mark_limit: int = EXACTSUBSTR_BROADCAST_MARK_LIMIT,
) -> ray.data.Dataset:
    """ExactSubstr-style deduplication (Lee et al. 2022,
    arXiv:2107.06499) at whitespace-token granularity: every k-token
    span whose token sequence already occurred earlier in the corpus
    (earlier = lexicographically smaller (doc_id, win_idx) — first
    occurrence wins, deterministic under any partitioning) has its
    tokens REMOVED from the text; surviving tokens reassemble in
    order. -> (doc_id, n_tokens, n_removed, text_dedup) for every doc.

    The reference paper builds a corpus-wide suffix array; the
    distributed shape here replaces it with a rolling polynomial hash
    over OVERLAPPING k-token windows (one int64 row per token — text
    never multiplies by k) bucketed by window hash, so the
    first-occurrence scan is in-bucket and globally correct at hash
    granularity. Dedup identity IS the 61-bit window hash (collisions
    ~2^-61 per pair); the DuckDB oracle computes the identical hash,
    so both engines agree bit-for-bit even on a collision.

    Scale shape: ONE keyed exchange of (doc_id, win_idx, wh) rows on a
    coarse window-hash bucket; the mark table (dup occurrences only)
    then either broadcasts (``ray.put``, zero further shuffle) or —
    above ``broadcast_mark_limit`` — co-partitions with the docs on a
    coarse doc-id bucket (second keyed exchange; text moves once). No
    stage holds the corpus; the driver holds at most the mark count.
    """
    from neuscraper_ray.functions.joins import _bucket_i64

    def windowize(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        dw = ph.DocWords(t.column(text_col).to_pylist())
        win_doc, win_idx, wh = _rolling_window_hashes(dw, k)
        return pa.table(
            {
                id_col: pa.array(ids[win_doc], pa.int64()),
                "win_idx": pa.array(win_idx, pa.int64()),
                "wh": pa.array(wh, pa.int64()),
                "hb": pa.array(_bucket_i64(wh, num_buckets), pa.int32()),
            }
        )

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["wh", id_col, "win_idx"], kind="mergesort")
        dup = df[df["wh"].duplicated().to_numpy()]
        return dup[[id_col, "win_idx"]]

    marks = (
        ds.map_batches(windowize, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(mark, batch_format="pandas")
        .materialize()
    )
    n_marks = marks.count()

    if n_marks <= broadcast_mark_limit:
        if n_marks == 0:
            mark_doc = np.empty(0, dtype=np.int64)
            mark_win = np.empty(0, dtype=np.int64)
        else:
            mpd = marks.to_pandas().sort_values(id_col, kind="mergesort")
            mark_doc = mpd[id_col].to_numpy().astype(np.int64)
            mark_win = mpd["win_idx"].to_numpy().astype(np.int64)
        marks_ref = ray.put((mark_doc, mark_win))

        def apply_broadcast(t: pa.Table) -> pa.Table:
            md, mw = ray.get(marks_ref)
            ids = t.column(id_col).to_numpy().astype(np.int64)
            return _apply_span_removal(
                ids, t.column(text_col).to_pylist(), md, mw, k
            )

        return ds.map_batches(apply_broadcast, batch_format="pyarrow")

    # bucketed fallback: neither side broadcasts. Marks ride as
    # sentinel rows (win_idx >= 0, empty text); docs carry win_idx -1.
    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "win_idx": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "text": t.column(text_col).cast(pa.string()),
                "db": pa.array(_bucket_i64(ids, num_buckets), pa.int32()),
            }
        )

    def mark_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "win_idx": t.column("win_idx").cast(pa.int64()),
                "text": pa.array([""] * len(ids), pa.string()),
                "db": pa.array(_bucket_i64(ids, num_buckets), pa.int32()),
            }
        )

    def apply_bucket(df: pd.DataFrame) -> pd.DataFrame:
        is_doc = df["win_idx"].to_numpy() < 0
        docs = df[is_doc]
        mk = df[~is_doc].sort_values([id_col, "win_idx"], kind="mergesort")
        out = _apply_span_removal(
            docs[id_col].to_numpy().astype(np.int64),
            docs["text"].tolist(),
            mk[id_col].to_numpy().astype(np.int64),
            mk["win_idx"].to_numpy().astype(np.int64),
            k,
        )
        return out.to_pandas()

    both = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        marks.map_batches(mark_rows, batch_format="pyarrow")
    )
    return both.groupby("db").map_groups(apply_bucket, batch_format="pandas")


def intra_doc_dedup(
    ds: ray.data.Dataset,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """WITHIN-document repeated-span removal (the intra-doc rung of
    the ExactSubstr ladder — Gopher's "repetition removal" applied,
    not just measured as in ``textstats.repetition_stats_batch``):
    every k-token window whose token sequence already occurred EARLIER
    IN THE SAME DOCUMENT (earlier = smaller win_idx) has its tokens
    removed; survivors reassemble in order.
    -> ``(doc_id, n_tokens, n_removed, text_dedup)`` for every doc.

    Identity and removal geometry are shared verbatim with
    :func:`exactsubstr_dedup` (same ``_rolling_window_hashes`` fold,
    same ``_apply_span_removal`` coverage diff), only the
    first-occurrence scope shrinks from corpus to document — which
    collapses the topology to ZERO exchanges: every decision is local
    to the doc, so the whole operator is one stateless ``map_batches``
    and scales embarrassingly at any corpus size. The DuckDB twin
    (``polyhash.sql_intra_doc_dedup``) computes the identical window
    hashes with ``PARTITION BY doc_id, wh``.
    """

    def batch(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        texts = t.column(text_col).to_pylist()
        dw = ph.DocWords(texts)
        win_doc, win_idx, wh = _rolling_window_hashes(dw, k)
        # duplicate = same hash at an earlier win_idx in the SAME doc
        order = np.lexsort((win_idx, wh, win_doc))
        d, h, w = win_doc[order], wh[order], win_idx[order]
        first = np.ones(len(d), dtype=bool)
        if len(d):
            first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        mdoc, mwin = ids[d[~first]], w[~first]
        o2 = np.lexsort((mwin, mdoc))  # _apply_span_removal wants
        return _apply_span_removal(  # marks sorted by doc id value
            ids, texts, mdoc[o2], mwin[o2], k
        )

    return ds.map_batches(batch, batch_format="pyarrow")


# ------------------------------------------------------------- minhash


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Sorted-unique 32-bit word-k-shingle hashes of one text
    (``polyhash`` contract; vectorized)."""
    dw = ph.DocWords([text])
    sh32, _ = ph.doc_shingles32(dw, k)
    return sh32


def minhash_signature(
    text: str,
    a: np.ndarray | None = None,
    b: np.ndarray | None = None,
    k: int = 3,
) -> np.ndarray:
    """(n_perm,) uint64 minhash signature via the exact mod-prime
    universal family (a*s + b stays < 2^63 — no uint64 wrap)."""
    if a is None or b is None:
        a, b = ph.minhash_params()
    dw = ph.DocWords([text])
    sh32, shdoc = ph.doc_shingles32(dw, k)
    return ph.minhash_sigs(sh32, shdoc, 1, a, b)[0]


class MinHasher:
    """Actor-pool stage: text -> LSH band rows (doc_id, band, band_hash).

    One vectorized pass per batch (codepoint decode -> word hashes ->
    shingles -> signatures -> band folds); state (the permutation
    params) built once per actor."""

    def __init__(self, n_perm: int = ph.N_PERM, n_bands: int = ph.N_BANDS, shingle_k: int = 3):
        assert n_perm % n_bands == 0
        self.a, self.b = ph.minhash_params(n_perm)
        self.n_bands = n_bands
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return minhash_signature(text, self.a, self.b, self.k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        dw = ph.DocWords(texts)
        sh32, shdoc = ph.doc_shingles32(dw, self.k)
        sigs = ph.minhash_sigs(sh32, shdoc, len(texts), self.a, self.b)
        bh = ph.band_hashes(sigs, self.n_bands)  # (n_docs, n_bands)
        n_docs = len(texts)
        return pa.table(
            {
                "doc_id": np.repeat(ids, self.n_bands),
                "band": np.tile(np.arange(self.n_bands, dtype=np.int32), n_docs),
                "band_hash": bh.reshape(-1).view(np.int64),  # < M: sign-safe
            }
        )


_MINHASHER_CACHE: dict[tuple, "MinHasher"] = {}


def _cached_minhasher(args: tuple) -> "MinHasher":
    """Per-worker-process MinHasher (params are deterministic)."""
    mh = _MINHASHER_CACHE.get(args)
    if mh is None:
        mh = _MINHASHER_CACHE[args] = MinHasher(*args)
    return mh


def minhash_candidate_pairs(
    ds: ray.data.Dataset,
    n_perm: int = ph.N_PERM,
    n_bands: int = ph.N_BANDS,
    shingle_k: int = 3,
    num_buckets: int = NUM_BUCKETS,
    star: bool = False,
) -> ray.data.Dataset:
    """Dataset(doc_id, text) -> Dataset(id_a, id_b) candidate near-dup pairs.

    Pairs sharing any LSH band bucket; may repeat across coarse buckets
    (different bands) — consumers treat the pair list as a multiset.
    """
    # plain-function stage, NOT an actor pool: the only state (the
    # seeded permutation params) is deterministic and costs
    # microseconds to build, so a module-cached instance in ordinary
    # tasks avoids the per-call actor-pool spin-up (~1 s per query
    # invocation, measured round 3 — the bulk of the r2 bench delta)
    hasher_args = (n_perm, n_bands, shingle_k)

    def band_rows(batch: pa.Table) -> pa.Table:
        return _cached_minhasher(hasher_args)(batch)

    bands = ds.map_batches(band_rows, batch_format="pyarrow", batch_size=1024)
    return _pairs_from_band_rows(bands, num_buckets, star=star)


def _pairs_from_band_rows(
    bands: ray.data.Dataset, num_buckets: int, star: bool = False
) -> ray.data.Dataset:
    """Dataset(doc_id, band, band_hash) -> Dataset(id_a, id_b) pairs
    sharing any band bucket (multiset across coarse buckets).

    Groups by a COARSE bucket of the band hash (not by (band, band_hash)
    itself — that cardinality is n_docs x n_bands, and a map_groups
    call per mostly-singleton group costs more than the hashing);
    inside each coarse bucket the per-bucket pair generation is one
    vectorized self-merge.

    ``star=True`` emits a STAR per (band, band_hash) group — every
    member connected to the group's min doc_id — instead of the full
    clique: O(k) edges per k-member group instead of O(k^2), with
    IDENTICAL connected components (a web corpus's boilerplate
    families form 10k-member band groups, where the clique is 50M
    edges and the star 10k). Use it when the consumer only needs
    connectivity (``near_dup_clusters``); pair-output consumers
    (jaccard/precision audits) need the full candidate multiset."""

    def add_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df["coarse"] = (df["band_hash"] % num_buckets).astype(np.int32)
        return df

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["band", "band_hash", "doc_id"]]
        if star:
            g = df.groupby(["band", "band_hash"], sort=False)["doc_id"]
            mn = g.transform("min")
            hit = df["doc_id"] != mn
            out = pd.DataFrame(
                {"id_a": mn[hit], "id_b": df.loc[hit, "doc_id"]}
            )
            return out.drop_duplicates()
        m = df.merge(df, on=["band", "band_hash"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = m.rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b"})[
            ["id_a", "id_b"]
        ]
        return out.drop_duplicates()

    return (
        bands.map_batches(add_coarse, batch_format="pandas")
        .groupby("coarse")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def verify_jaccard_pairs(
    pairs: list[tuple[int, int]],
    texts_by_id: dict[int, str],
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> list[tuple[int, int, float]]:
    """Exact n-gram Jaccard verification of a (small) candidate list."""
    out = []
    cache: dict[int, np.ndarray] = {}
    for ia, ib in pairs:
        for i in (ia, ib):
            if i not in cache:
                cache[i] = _shingles(texts_by_id[i], shingle_k)
        a, b = cache[ia], cache[ib]
        inter = len(np.intersect1d(a, b, assume_unique=True))
        union = len(a) + len(b) - inter
        j = inter / union if union else 1.0
        if j >= threshold:
            out.append((ia, ib, j))
    return out


def jaccard_verified_pairs(
    ds: ray.data.Dataset,
    threshold_e6: int = 500_000,
    num_buckets: int = NUM_BUCKETS,
) -> ray.data.Dataset:
    """LSH candidates verified with EXACT shingle-set Jaccard ->
    Dataset(id_a, id_b, jacc_e6) — fixed-point e6 so Ray and the SQL
    oracle (``polyhash.sql_jaccard_pairs``) agree bit-for-bit.

    A composition of the engine's own operators, all scale-shaped:
    candidates from the banded LSH blocking (never all pairs), a
    per-doc shingle-list table (materialized once — the derived column
    you would persist to parquet in production), and TWO co-partitioned
    ``hash_join`` passes to attach each side's shingles to its edges;
    the exact intersections then run vectorized per edge batch. No
    stage ever holds the corpus, the full edge list, or a per-distinct-
    value Ray group.
    """
    import pyarrow as _pa

    from neuscraper_ray.functions.joins import hash_join

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        dw = ph.DocWords(texts)
        sh32, sdoc = ph.doc_shingles32(dw)
        bounds = np.searchsorted(sdoc, np.arange(len(texts) + 1))
        lists = [
            sh32[bounds[i] : bounds[i + 1]].astype(np.int64).tolist()
            for i in range(len(texts))
        ]
        return pa.table(
            {
                "doc_id": ids.astype(np.int64),
                "sh": _pa.array(lists, _pa.list_(_pa.int64())),
            }
        )

    shingles = ds.map_batches(shingle_rows, batch_format="pyarrow").materialize()

    # candidates are a multiset across bands; ALL copies of a pair
    # share the id_a join bucket, so the global dedup happens in-bucket
    # via left_prepare — no separate dedup shuffle
    edges = minhash_candidate_pairs(ds, num_buckets=num_buckets)

    edge_schema = _pa.schema([("id_a", _pa.int64()), ("id_b", _pa.int64())])
    sh_schema = _pa.schema(
        [("doc_id", _pa.int64()), ("sh", _pa.list_(_pa.int64()))]
    )
    withe_a = hash_join(
        edges, shingles, "id_a", "doc_id", edge_schema, sh_schema,
        num_buckets=num_buckets,
        left_prepare=lambda lf: lf.unique(subset=["id_a", "id_b"]),
    ).map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "sh_a"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    wa_schema = _pa.schema(
        [("id_a", _pa.int64()), ("id_b", _pa.int64()), ("sh_a", _pa.list_(_pa.int64()))]
    )
    both = hash_join(
        withe_a, shingles, "id_b", "doc_id", wa_schema, sh_schema,
        num_buckets=num_buckets,
    )

    def verify(t: pa.Table) -> pa.Table:
        id_b = t.column("id_b").to_numpy()
        id_a = t.column("id_a").to_numpy()
        sh_a = t.column("sh_a").to_pylist()
        sh_b = t.column("sh").to_pylist()
        out_a, out_b, out_j = [], [], []
        for i in range(t.num_rows):
            a = np.asarray(sh_a[i], dtype=np.int64)
            b = np.asarray(sh_b[i], dtype=np.int64)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            j = (inter * 1_000_000) // union if union else 1_000_000
            if j >= threshold_e6:
                out_a.append(id_a[i])
                out_b.append(id_b[i])
                out_j.append(j)
        return pa.table(
            {
                "id_a": np.asarray(out_a, dtype=np.int64),
                "id_b": np.asarray(out_b, dtype=np.int64),
                "jacc_e6": np.asarray(out_j, dtype=np.int64),
            }
        )

    return both.map_batches(verify, batch_format="pyarrow", batch_size=None)


def _band_rows_from_sigs(t: pa.Table) -> pa.Table:
    """Dataset(doc_id, sh, sig) batch -> (doc_id, band, band_hash) rows.

    Bands are re-derived from the ALREADY-computed signatures (the
    shingle+minhash text pass runs once, not once per consumer); sig
    lists are fixed-width N_PERM so the values buffer reshapes
    zero-copy. Shared by the broadcast and join precision paths, which
    tests assert value-identical."""
    n = t.num_rows
    ids = t.column("doc_id").to_numpy()
    sigs = (
        t.column("sig")
        .combine_chunks()
        .flatten()
        .to_numpy()
        .reshape(n, ph.N_PERM)
        .view(np.uint64)
    )
    bh = ph.band_hashes(sigs, ph.N_BANDS)
    return pa.table(
        {
            "doc_id": np.repeat(ids, ph.N_BANDS),
            "band": np.tile(np.arange(ph.N_BANDS, dtype=np.int32), n),
            "band_hash": bh.reshape(-1).view(np.int64),
        }
    )


def _precision_pairs_broadcast(
    derived: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    """Small-corpus path of ``minhash_precision_pairs``: the derived
    (doc_id, shingles, signature) table is pulled once, packed into
    flat numpy arrays (sorted ids + fixed-width sig matrix + ragged
    shingle values/offsets) and broadcast via ``ray.put``; candidate
    edges then verify in plain ``map_batches`` with ZERO join
    exchanges.

    Global pair dedup without a dedup shuffle: pair generation carries
    the generating band, and the verify stage keeps an edge only when
    its band is the FIRST band where the two signatures' band hashes
    agree — a pure function of the pair, so exactly one copy of every
    candidate pair survives no matter how many band buckets produced
    it (the multiset -> set step the join path does with
    ``left_prepare unique``)."""
    import pyarrow.compute as _pc

    tb = pa.concat_tables(
        list(derived.iter_batches(batch_format="pyarrow"))
    ).combine_chunks()
    ids = tb.column("doc_id").to_numpy()
    order = np.argsort(ids, kind="stable")
    ids_sorted = ids[order]
    n = len(ids)
    sig_mat = (
        tb.column("sig").combine_chunks().flatten().to_numpy().reshape(n, ph.N_PERM)
    )[order]
    sh_col = tb.column("sh").combine_chunks()
    lens = _pc.list_value_length(sh_col).to_numpy().astype(np.int64)
    vals = sh_col.flatten().to_numpy()
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    new_lens = lens[order]
    new_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_offs[1:])
    # ragged gather: reorder the concatenated shingle values by doc order
    gather = (
        np.arange(new_offs[-1], dtype=np.int64)
        - np.repeat(new_offs[:-1], new_lens)
        + np.repeat(offs[:-1][order], new_lens)
    )
    vals_sorted = vals[gather]
    state_ref = ray.put((ids_sorted, sig_mat, vals_sorted, new_offs))

    bands = derived.map_batches(_band_rows_from_sigs, batch_format="pyarrow")

    def add_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df["coarse"] = (df["band_hash"] % num_buckets).astype(np.int32)
        return df

    def bucket_pairs_with_band(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["band", "band_hash", "doc_id"]]
        m = df.merge(df, on=["band", "band_hash"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = m.rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b"})[
            ["id_a", "id_b", "band"]
        ]
        # (id_a, id_b, band) lives in exactly one coarse bucket, so the
        # in-bucket dedup is global at this granularity
        return out.drop_duplicates()

    edges = (
        bands.map_batches(add_coarse, batch_format="pandas")
        .groupby("coarse")
        .map_groups(bucket_pairs_with_band, batch_format="pandas")
    )

    def verify(t: pa.Table) -> pa.Table:
        sids, smat, svals, soffs = ray.get(state_ref)
        id_a = t.column("id_a").to_numpy()
        id_b = t.column("id_b").to_numpy()
        band = t.column("band").to_numpy()
        pos_a = np.searchsorted(sids, id_a)
        pos_b = np.searchsorted(sids, id_b)
        bh_a = ph.band_hashes(smat[pos_a].view(np.uint64), ph.N_BANDS)
        bh_b = ph.band_hashes(smat[pos_b].view(np.uint64), ph.N_BANDS)
        first = np.argmax(bh_a == bh_b, axis=1)  # >=1 match by construction
        keep = band == first
        pos_a, pos_b = pos_a[keep], pos_b[keep]
        kn = int(keep.sum())
        est = (
            (smat[pos_a] == smat[pos_b]).sum(axis=1).astype(np.int64) * 1_000_000
        ) // ph.N_PERM
        jacc = np.empty(kn, dtype=np.int64)
        for i in range(kn):
            a = svals[soffs[pos_a[i]] : soffs[pos_a[i] + 1]]
            b = svals[soffs[pos_b[i]] : soffs[pos_b[i] + 1]]
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            jacc[i] = (inter * 1_000_000) // union if union else 1_000_000
        return pa.table(
            {
                "id_a": id_a[keep],
                "id_b": id_b[keep],
                "est_jacc_e6": est,
                "jacc_e6": jacc,
                "abs_err_e6": np.abs(est - jacc),
            }
        )

    return edges.map_batches(verify, batch_format="pyarrow", batch_size=None)


PRECISION_BROADCAST_DOC_LIMIT = 100_000
"""Below this many documents the derived (shingles + signature) table
broadcasts via ``ray.put`` (~few hundred MB ceiling: one copy per node,
zero-copy reads from the local object store) and the precision audit
pays ONE all-to-all (pair generation) instead of three. Above it, the
two co-partitioned ``hash_join`` passes attach each side — the path
whose shuffle volume stays O(derived x 2 + edges) at any scale. Both
paths are asserted value-identical in ``tests``."""


def minhash_precision_pairs(
    ds: ray.data.Dataset,
    num_buckets: int = NUM_BUCKETS,
    broadcast_doc_limit: int = PRECISION_BROADCAST_DOC_LIMIT,
) -> ray.data.Dataset:
    """Estimator-quality audit of the MinHash sketch itself: for every
    LSH candidate pair, the SIGNATURE-estimated Jaccard (matching
    positions / N_PERM) next to the EXACT shingle-set Jaccard and the
    absolute error -> Dataset(id_a, id_b, est_jacc_e6, jacc_e6,
    abs_err_e6). The same self-documenting-quality pattern as the ANN
    queries' recall@10 column: the approximation ships its own
    measured accuracy.

    Scale shape: identical to ``jaccard_verified_pairs`` — banded LSH
    candidates (never all pairs), a per-doc derived table carrying
    BOTH the shingle list and the 64-slot signature, and two
    co-partitioned ``hash_join`` passes attaching each side to its
    edges; both comparisons run vectorized per edge batch. Fixed-point
    e6 so the DuckDB oracle agrees bit-for-bit.
    """
    import pyarrow as _pa

    from neuscraper_ray.functions.joins import hash_join

    a_par, b_par = ph.minhash_params()

    def derived_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        dw = ph.DocWords(texts)
        sh32, sdoc = ph.doc_shingles32(dw)
        sigs = ph.minhash_sigs(sh32, sdoc, len(texts), a_par, b_par)
        bounds = np.searchsorted(sdoc, np.arange(len(texts) + 1))
        sh_lists = [
            sh32[bounds[i] : bounds[i + 1]].astype(np.int64).tolist()
            for i in range(len(texts))
        ]
        return pa.table(
            {
                "doc_id": ids.astype(np.int64),
                "sh": _pa.array(sh_lists, _pa.list_(_pa.int64())),
                # sig values < M = 2^61-1: sign-safe as int64
                "sig": _pa.array(
                    sigs.astype(np.int64).tolist(), _pa.list_(_pa.int64())
                ),
            }
        )

    derived = ds.map_batches(derived_rows, batch_format="pyarrow").materialize()
    n_docs = derived.count()
    if n_docs == 0:
        # the broadcast path would pa.concat_tables([]) on an empty
        # derived table; an empty corpus has no candidate pairs
        return ray.data.from_arrow(
            pa.table(
                {
                    c: pa.array([], pa.int64())
                    for c in (
                        "id_a", "id_b", "est_jacc_e6", "jacc_e6", "abs_err_e6"
                    )
                }
            )
        )
    if n_docs <= broadcast_doc_limit:
        return _precision_pairs_broadcast(derived, num_buckets)

    edges = _pairs_from_band_rows(
        derived.map_batches(_band_rows_from_sigs, batch_format="pyarrow"),
        num_buckets=num_buckets,
    )

    edge_schema = _pa.schema([("id_a", _pa.int64()), ("id_b", _pa.int64())])
    d_schema = _pa.schema(
        [
            ("doc_id", _pa.int64()),
            ("sh", _pa.list_(_pa.int64())),
            ("sig", _pa.list_(_pa.int64())),
        ]
    )
    with_a = hash_join(
        edges, derived, "id_a", "doc_id", edge_schema, d_schema,
        num_buckets=num_buckets,
        left_prepare=lambda lf: lf.unique(subset=["id_a", "id_b"]),
    ).map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "sh_a", "sig_a"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    wa_schema = _pa.schema(
        [
            ("id_a", _pa.int64()),
            ("id_b", _pa.int64()),
            ("sh_a", _pa.list_(_pa.int64())),
            ("sig_a", _pa.list_(_pa.int64())),
        ]
    )
    both = hash_join(
        with_a, derived, "id_b", "doc_id", wa_schema, d_schema,
        num_buckets=num_buckets,
    )

    def verify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        id_a = t.column("id_a").to_numpy()
        id_b = t.column("id_b").to_numpy()
        sh_a = t.column("sh_a").to_pylist()
        sh_b = t.column("sh").to_pylist()
        # signatures are fixed-width: values-buffer reshape, then one
        # (n, 64) block comparison
        def _sig_block(col) -> np.ndarray:
            if n == 0:
                return np.empty((0, ph.N_PERM), dtype=np.int64)
            return (
                col.combine_chunks().flatten().to_numpy().reshape(n, ph.N_PERM)
            )

        sig_a = _sig_block(t.column("sig_a"))
        sig_b = _sig_block(t.column("sig"))
        est = (
            (sig_a == sig_b).sum(axis=1).astype(np.int64) * 1_000_000
        ) // ph.N_PERM
        jacc = np.empty(n, dtype=np.int64)
        for i in range(n):
            a = np.asarray(sh_a[i], dtype=np.int64)
            b = np.asarray(sh_b[i], dtype=np.int64)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            jacc[i] = (inter * 1_000_000) // union if union else 1_000_000
        return pa.table(
            {
                "id_a": id_a,
                "id_b": id_b,
                "est_jacc_e6": est,
                "jacc_e6": jacc,
                "abs_err_e6": np.abs(est - jacc),
            }
        )

    return both.map_batches(verify, batch_format="pyarrow", batch_size=None)


# ------------------------------------------- distributed label propagation


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: process-stable int -> uint64 mix for
    bucketing (never ``builtins.hash`` — per-process salt)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# Below this many edge rows the cluster graph trivially fits one
# process and the distributed rounds' shuffle overhead dominates, so
# propagate_min_labels collects and runs the vectorized local fixpoint.
DRIVER_EDGE_LIMIT = 2_000_000


def _local_min_labels(edges: pd.DataFrame) -> pd.DataFrame:
    """Vectorized (no per-edge Python loop) min-label fixpoint on a
    local edge list -> DataFrame(doc_id, cluster_id)."""
    edges = edges.drop_duplicates(["id_a", "id_b"])
    nodes = pd.unique(pd.concat([edges["id_a"], edges["id_b"]], ignore_index=True))
    lab = pd.Series(nodes, index=nodes)
    while True:
        la = edges["id_a"].map(lab).to_numpy()
        lb = edges["id_b"].map(lab).to_numpy()
        m = pd.DataFrame(
            {
                "n": np.concatenate([edges["id_a"].to_numpy(), edges["id_b"].to_numpy()]),
                "c": np.concatenate([lb, la]),
            }
        )
        new = m.groupby("n")["c"].min()
        new = np.minimum(lab, new.reindex(lab.index).fillna(lab).astype(np.int64))
        if new.equals(lab):
            break
        lab = new
    out = pd.DataFrame({"doc_id": lab.index.to_numpy(), "cluster_id": lab.to_numpy()})
    return out.astype({"doc_id": np.int64, "cluster_id": np.int64}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def propagate_min_labels(
    edges: ray.data.Dataset,
    num_buckets: int = NUM_BUCKETS,
    max_rounds: int = 64,
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
) -> pd.DataFrame:
    """Connected-component min labels over an undirected edge Dataset
    (id_a, id_b) -> DataFrame(doc_id, cluster_id).

    Size switch (both paths tested for equality in
    ``tests/test_polyhash.py``):

    - edge count <= ``driver_edge_limit``: the edge list is collected
      and labeled with a VECTORIZED pandas fixpoint (no per-edge Python
      loop). A near-dup edge list this small is driver-trivial; the
      distributed rounds below would spend more on shuffle constants
      than the whole job.
    - above the limit: distributed min-label propagation. Per round:
      labels co-partition with the symmetrized edges on bucket(node),
      neighbor messages ``(nbr, label(node))`` are emitted in-bucket
      (vectorized pandas merge), and ``groupby(node).min`` reduces.
      Labels only decrease, so a fixpoint is detected by an unchanged
      global label sum (one cheap aggregate per round). Rounds needed =
      component diameter; LSH components are near-cliques (band
      buckets connect most members directly), so this converges in a
      handful of bounded shuffles without ever holding the edge list
      in one process.
    """

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy()
        b = t.column("id_b").to_numpy()
        node = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        return pa.table(
            {
                "bucket": (_mix64(node) % np.uint64(num_buckets)).astype(np.int32),
                "node": node,
                "other": nbr,
                "is_label": np.zeros(len(node), dtype=bool),
            }
        )

    # materialized once: every round re-consumes the edge blocks without
    # re-running the upstream candidate-pair pipeline (lineage re-exec)
    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()
    n_sym = sym.count()
    if n_sym == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype=np.int64),
                "cluster_id": pd.Series(dtype=np.int64),
            }
        )
    if n_sym <= 2 * driver_edge_limit:  # sym holds both directions
        edf = sym.to_pandas()
        return _local_min_labels(
            pd.DataFrame({"id_a": edf["node"], "id_b": edf["other"]})
        )

    from ray.data.aggregate import Sum

    def _min_label_by_node(msgs: ray.data.Dataset) -> ray.data.Dataset:
        """(node, cand) -> (node, label=min cand), shuffled on a
        node-hash bucket with a vectorized in-bucket min — never a
        per-node Dataset.groupby (one Python call per node)."""

        def add_nb(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy()
            nb = (_mix64(node) % np.uint64(num_buckets)).astype(np.int32)
            return t.append_column("nb", pa.array(nb))

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", sort=False, as_index=False)["cand"].min()
            return g.rename(columns={"cand": "label"})

        return (
            msgs.map_batches(add_nb, batch_format="pyarrow")
            .groupby("nb")
            .map_groups(merge, batch_format="pandas")
        )

    def init_labels(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        other = t.column("other").to_numpy()
        return pa.table({"node": node, "cand": np.minimum(node, other)})

    labels = _min_label_by_node(
        sym.map_batches(init_labels, batch_format="pyarrow")
    ).materialize()
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    def label_rows(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        label = t.column("label").to_numpy()
        return pa.table(
            {
                "bucket": (_mix64(node) % np.uint64(num_buckets)).astype(np.int32),
                "node": node,
                "other": label,
                "is_label": np.ones(len(node), dtype=bool),
            }
        )

    def emit_msgs(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["is_label"]]
        edge = df[~df["is_label"]]
        # label(node) flows to each neighbor + stays on node itself
        m = edge.merge(
            lab[["node", "other"]].rename(columns={"other": "label"}), on="node"
        )
        return pd.DataFrame(
            {
                "node": np.concatenate([m["other"].to_numpy(), lab["node"].to_numpy()]),
                "cand": np.concatenate([m["label"].to_numpy(), lab["other"].to_numpy()]),
            }
        )

    converged = False
    for _ in range(max_rounds):
        msgs = (
            sym.union(labels.map_batches(label_rows, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(emit_msgs, batch_format="pandas")
        )
        labels = _min_label_by_node(msgs).materialize()
        new_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # A component with diameter > max_rounds (a long chain of
        # pairwise near-dups) would otherwise return WRONG cluster ids
        # silently, diverging from the recursive-CTE oracle. Fail loud;
        # the caller can rerun with a higher bound.
        raise RuntimeError(
            f"propagate_min_labels did not converge in {max_rounds} rounds "
            "(component diameter exceeds max_rounds); rerun with a larger "
            "max_rounds"
        )

    out = labels.to_pandas().rename(columns={"node": "doc_id", "label": "cluster_id"})
    out = out.astype({"doc_id": np.int64, "cluster_id": np.int64})
    return out.sort_values("doc_id").reset_index(drop=True)


def near_dup_clusters(
    ds: ray.data.Dataset,
    n_perm: int = ph.N_PERM,
    n_bands: int = ph.N_BANDS,
    shingle_k: int = 3,
    num_buckets: int = NUM_BUCKETS,
) -> pd.DataFrame:
    """-> DataFrame(doc_id, cluster_id) for docs in any near-dup pair;
    cluster_id = min doc_id reachable over candidate edges (distributed
    min-label propagation — see ``propagate_min_labels``). Edges are
    the per-band-bucket STAR (identical connectivity to the clique at
    O(k) instead of O(k^2) per bucket — the web-corpus boilerplate-
    family safeguard; see ``_pairs_from_band_rows``)."""
    edges = minhash_candidate_pairs(
        ds, n_perm, n_bands, shingle_k, num_buckets, star=True
    )
    return propagate_min_labels(edges, num_buckets)


# -------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    """64-bit SimHash (``polyhash`` contract: +-1 vote per word
    occurrence by each bit of the 64-bit word hash)."""
    return int(ph.simhashes(ph.DocWords([text]))[0])


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sims = ph.simhashes(ph.DocWords(batch.column(text_col).to_pylist()))
    return batch.append_column("simhash", pa.array(sims, pa.int64()))


def simhash_near_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    num_buckets: int = NUM_BUCKETS,
) -> pd.DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via 4-band
    blocking (any pair within distance 3 shares at least one exact
    16-bit band — pigeonhole)."""
    hashed = ds.map_batches(
        lambda t: simhash_batch(t, text_col).select([id_col, "simhash"]),
        batch_format="pyarrow",
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sh = batch.column("simhash").to_numpy().astype(np.uint64)
        out_id, out_band, out_key, out_sim = [], [], [], []
        for b in range(4):
            key = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_key.append(key)
            out_sim.append(sh.astype(np.int64))
        t = pa.table(
            {
                id_col: np.concatenate(out_id),
                "band": np.concatenate(out_band),
                "key": np.concatenate(out_key),
                "simhash": np.concatenate(out_sim),
                "coarse": (np.concatenate(out_key) % num_buckets).astype(np.int32),
            }
        )
        return t

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the coarse bucket: self-merge on the exact
        # (band, key), then Hamming-verify the joined simhashes
        cols = [id_col, "band", "key", "simhash"]
        m = df[cols].merge(df[cols], on=["band", "key"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if m.empty:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=np.int64),
                    "id_b": pd.Series(dtype=np.int64),
                    "hamming": pd.Series(dtype=np.int64),
                }
            )
        x = m["simhash_a"].to_numpy().astype(np.uint64) ^ m["simhash_b"].to_numpy().astype(np.uint64)
        ham = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        for _ in range(64):
            ham += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "id_a": m[f"{id_col}_a"].to_numpy()[keep],
                "id_b": m[f"{id_col}_b"].to_numpy()[keep],
                "hamming": ham[keep],
            }
        ).drop_duplicates(["id_a", "id_b"])

    pairs = (
        hashed.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    df = pairs.to_pandas()
    if df.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64), "hamming": pd.Series(dtype=np.int64)})
    df = df.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return df.reset_index(drop=True)
