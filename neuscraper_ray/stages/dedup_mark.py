"""Exact-duplicate marking for the flagship pipeline (dedup-adjacent
stage per the north rule).

Shuffle-minimal design:
1. a (content_hash, url) PROJECTION of the curated docs — never the
   text — is hash-grouped to find groups with >1 url and their
   canonical (min) url;
2. the canonical map (only urls that HAVE a duplicate — a small
   fraction of any real corpus) is broadcast via ``ray.put`` and each
   batch marks ``dup_of`` locally.

When the caller already carries a ``content_hash`` column (the curate
pipeline computes it inside ``filters_fused_batch``, where the docs
stream through anyway), pass ``hash_col`` and the corpus is NEVER
re-hashed: the projection is a pure column select and the mark pass is
one vectorized pandas ``.map``. Without ``hash_col`` the md5 is
computed here (a per-row hashlib loop — no vectorized md5 exists; the
md5 choice is load-bearing for the DuckDB ``md5()`` oracle).

The all-to-all exchange moves 16-byte hashes + urls, and the document
table itself is touched in place. At extreme duplicate rates
(canonical map too big to broadcast) marking switches automatically
to a single content-hash-bucketed shuffle of the doc rows, in which
each bucket decides its groups locally — no canonical index exists
anywhere. Both paths are asserted equal in
tests/test_curate_pipeline.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _md5_hex(texts: list) -> list[str]:
    # curate convention: empty extracted text -> "" (never a dedup key)
    from neuscraper_ray.functions.textstats import md5_hex

    return md5_hex(texts, empty_as_blank=True)


def _hash_batch(batch: pa.Table, column: str) -> pa.Table:
    return pa.table(
        {
            "content_hash": pa.array(
                _md5_hex(batch.column(column).to_pylist()), pa.string()
            ),
            "url": batch.column("url"),
        }
    )


def canonical_dups(
    docs: ray.data.Dataset,
    column: str = "extracted_text",
    hash_col: str | None = None,
) -> ray.data.Dataset:
    """-> Dataset(content_hash, canonical_url) for groups with >=2
    members — the duplicate-group index, still distributed.

    Empty texts are excluded (every empty page would otherwise form one
    giant duplicate group). With ``hash_col`` the projection is a pure
    column select (no md5 pass over the corpus).
    """
    if hash_col is not None:
        proj = docs.select_columns([hash_col, "url"])
        if hash_col != "content_hash":
            proj = proj.rename_columns({hash_col: "content_hash"})
    else:
        proj = docs.map_batches(
            lambda t: _hash_batch(t, column), batch_format="pyarrow", batch_size=None
        )

    def dup_groups(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["content_hash"] != ""]
        g = df.groupby("content_hash", sort=False)["url"]
        out = g.agg(["min", "size"]).reset_index()
        out.columns = ["content_hash", "canonical_url", "n"]
        return out[out["n"] >= 2][["content_hash", "canonical_url"]]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from neuscraper_ray.config import NUM_BUCKETS
        from neuscraper_ray.functions.joins import str_buckets

        # deterministic across processes (never builtins.hash — that is
        # salted per interpreter and would split groups between workers)
        df["b"] = str_buckets(df["content_hash"].tolist(), NUM_BUCKETS)
        return df

    return (
        proj.map_batches(add_bucket, batch_format="pandas", batch_size=None)
        .groupby("b")
        .map_groups(dup_groups, batch_format="pandas")
    )


def build_canonical_map(
    docs: ray.data.Dataset,
    column: str = "extracted_text",
    hash_col: str | None = None,
) -> dict[str, str]:
    """Driver-side {content_hash: canonical_url} (the broadcast path)."""
    dup = canonical_dups(docs, column, hash_col=hash_col).to_pandas()
    return dict(zip(dup["content_hash"], dup["canonical_url"]))


def build_canonical_map_driver(
    docs: ray.data.Dataset, hash_col: str = "content_hash"
) -> dict[str, str]:
    """Small-corpus canonical index: pull the (hash, url) projection to
    the driver and fold it in one vectorized pandas groupby — NO keyed
    exchange at all. Only legal when the corpus is known-bounded (the
    curate pin arm gates on ``dedup_pin_input_limit`` input bytes, so
    the pull is ~124 B/doc under that same bound); measured 2.7 s ->
    ~0.3 s vs the distributed ``canonical_dups`` exchange at the 80k-
    page bench geometry, where the all-to-all's fixed task overheads
    dwarf the 8-group reduction. Value-identical to
    ``build_canonical_map`` (same min-url-per-group rule)."""
    proj = docs.select_columns([hash_col, "url"]).to_pandas()
    ne = proj[proj[hash_col] != ""]
    g = ne.groupby(hash_col, sort=False)["url"].agg(["min", "size"])
    dup = g[g["size"] >= 2]
    return dict(zip(dup.index, dup["min"]))


# Above this many duplicate groups the canonical map stops being a
# cheap ray.put broadcast and mark_duplicates switches to the
# content-hash-bucketed group-mark shuffle.
BROADCAST_CANON_LIMIT = 1_000_000


def mark_with_canon(
    docs: ray.data.Dataset, canon_ref, hash_col: str = "content_hash"
) -> ray.data.Dataset:
    """Mark ``dup_of`` against an already-broadcast canonical map
    (``ray.put({content_hash: canonical_url})``) — zero shuffle, one
    vectorized map per batch. Shared by the single-pipeline broadcast
    path and the runner's corpus-wide phase-2 mark."""

    def mark(t: pa.Table) -> pa.Table:
        # arrow in/out: only the two string columns are pulled into
        # pandas for the dict map — list-typed columns (quality_flags)
        # stay zero-copy and survive the parquet round-trip
        cmap = ray.get(canon_ref)
        h = t.column(hash_col).to_pandas()
        u = t.column("url").to_pandas()
        c = h.map(cmap).fillna("")
        dup = c.where((c != u) & (h != ""), "")
        return t.append_column("dup_of", pa.array(dup.tolist(), pa.string()))

    return docs.map_batches(mark, batch_format="pyarrow", batch_size=None)


def mark_duplicates(
    docs: ray.data.Dataset,
    column: str = "extracted_text",
    broadcast_limit: int = BROADCAST_CANON_LIMIT,
    hash_col: str | None = None,
    proj: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Append ``dup_of``: canonical url for non-canonical exact dups,
    "" otherwise. Two passes over ``docs`` (it is re-executed for the
    projection; pass a checkpointed dataset when upstream is
    expensive). With ``hash_col`` both passes reuse the precomputed
    hashes: the projection is a column select and the mark is a
    vectorized map — zero md5 work here. ``proj`` overrides the
    projection-pass source — pass a column-pruned parquet read of the
    same rows (the curate pipeline's dedup checkpoint) so pass 1 never
    deserializes text bytes at all.

    Size switch: at or below ``broadcast_limit`` duplicate groups the
    canonical map ships once via ``ray.put`` and every batch marks
    locally (zero shuffle of doc rows); above it the doc rows are
    shuffled ONCE by a coarse bucket of their content hash and each
    bucket marks its groups locally (min-url canonical) — the honest
    all-to-all cost when the dup index itself is cluster-sized, with
    no index built at all."""
    canon_ds = canonical_dups(
        proj if proj is not None else docs, column, hash_col=hash_col
    ).materialize()
    if canon_ds.count() <= broadcast_limit:
        canon = dict(
            zip(*(canon_ds.to_pandas()[c] for c in ("content_hash", "canonical_url")))
        )
        canon_ref = ray.put(canon)

        if hash_col is not None:
            return mark_with_canon(docs, canon_ref, hash_col=hash_col)

        def mark_arrow(batch: pa.Table) -> pa.Table:
            cmap = ray.get(canon_ref)
            texts = batch.column(column).to_pylist()
            urls = batch.column("url").to_pylist()
            dup_of = []
            for t, u in zip(texts, urls):
                if not t:
                    dup_of.append("")
                    continue
                c = cmap.get(hashlib.md5(t.encode("utf-8")).hexdigest(), "")
                dup_of.append("" if c in ("", u) else c)
            return batch.append_column("dup_of", pa.array(dup_of, pa.string()))

        return docs.map_batches(mark_arrow, batch_format="pyarrow", batch_size=None)

    from neuscraper_ray.config import NUM_BUCKETS

    out_cols = list(docs.schema().names) + ["dup_of"]
    effective_hash = hash_col or "content_hash"

    def add_hash(t: pa.Table) -> pa.Table:
        # arrow in/out: only string columns are touched, so list-typed
        # columns survive (and stay zero-copy) through the shuffle
        from neuscraper_ray.functions.joins import str_buckets

        if hash_col is None:
            t = t.append_column(
                "content_hash",
                pa.array(_md5_hex(t.column(column).to_pylist()), pa.string()),
            )
        hb = str_buckets(t.column(effective_hash).to_pylist(), NUM_BUCKETS)
        return t.append_column("hbucket", pa.array(hb, pa.int32()))

    def mark_bucket(t: pa.Table) -> pa.Table:
        # every member of a content-hash group lands in this bucket, so
        # canonical (min url) and membership are decidable locally
        h = t.column(effective_hash).to_pandas()
        u = t.column("url").to_pandas()
        dup_of = pd.Series("", index=h.index, dtype=object)
        ne_mask = h != ""
        if ne_mask.any():
            g = u[ne_mask].groupby(h[ne_mask], sort=False)
            cmin = g.transform("min")
            csize = g.transform("size")
            hit = (csize > 1) & (u[ne_mask] != cmin)
            dup_of.loc[cmin.index[hit]] = cmin[hit]
        t = t.append_column("dup_of", pa.array(dup_of.tolist(), pa.string()))
        return t.select(out_cols)

    return (
        docs.map_batches(add_hash, batch_format="pyarrow", batch_size=None)
        .groupby("hbucket")
        .map_groups(mark_bucket, batch_format="pyarrow")
    )
