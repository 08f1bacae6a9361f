"""Exact-duplicate marking for the flagship pipeline (dedup-adjacent
stage per the north rule).

Two-pass, shuffle-minimal design:
1. a (content_hash, url) PROJECTION of the curated docs — never the
   text — is hash-grouped to find groups with >1 url and their
   canonical (min) url;
2. the canonical map (only urls that HAVE a duplicate — a small
   fraction of any real corpus) is broadcast via ``ray.put`` and each
   batch marks ``dup_of`` locally.

The all-to-all exchange therefore moves 16-byte hashes + urls, and the
document table itself is touched in place. At extreme duplicate rates
(canonical map too big to broadcast) swap step 2 for a bucketed join
keyed by the same content hash; the projection pass is unchanged.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _hash_batch(batch: pa.Table, column: str) -> pa.Table:
    hs = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t else ""
        for t in batch.column(column).to_pylist()
    ]
    return pa.table(
        {"content_hash": pa.array(hs, pa.string()), "url": batch.column("url")}
    )


def build_canonical_map(
    docs: ray.data.Dataset, column: str = "extracted_text"
) -> dict[str, str]:
    """-> {content_hash: canonical_url} for groups with >=2 members.

    Empty texts are excluded (every empty page would otherwise form one
    giant duplicate group).
    """
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
        import zlib

        # deterministic across processes (never builtins.hash — that is
        # salted per interpreter and would split groups between workers)
        df["b"] = [zlib.crc32(h.encode()) & 63 for h in df["content_hash"]]
        return df

    dup = (
        proj.map_batches(add_bucket, batch_format="pandas", batch_size=None)
        .groupby("b")
        .map_groups(dup_groups, batch_format="pandas")
        .to_pandas()
    )
    return dict(zip(dup["content_hash"], dup["canonical_url"]))


def mark_duplicates(
    docs: ray.data.Dataset, column: str = "extracted_text"
) -> ray.data.Dataset:
    """Append ``dup_of``: canonical url for non-canonical exact dups,
    "" otherwise. Two passes over ``docs`` (it is re-executed for the
    projection; pass a materialized/checkpointed dataset when upstream
    is expensive)."""
    canon = build_canonical_map(docs, column)
    canon_ref = ray.put(canon)

    def mark(batch: pa.Table) -> pa.Table:
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

    return docs.map_batches(mark, batch_format="pyarrow", batch_size=None)
