"""Per-url page-text assembly: predicted nodes -> extracted_text.

Reference semantics (``/root/reference/src/warc/get_text.py:36-43``):
join predictions with the TextNodes sidecar, sort by TextNodeId
**descending**, ``groupby(Url).agg(''.join)`` — the final page text is
the kept node texts concatenated in descending node-id order with no
separator. In our DAG node text rides along with the prediction, so the
join disappears and only the per-url grouping remains.

Scale design: the groupby key is a salted hash bucket
(vectorized seeded xxhash of the url, ``joins.str_buckets``), not the
raw url — ``map_groups`` then
receives ONE large batch per bucket instead of one tiny batch per url,
and the per-url work inside the bucket is a vectorized pandas
sort + groupby-agg. This keeps the only mandatory all-to-all exchange
in the pipeline at a controlled fan-in, independent of url cardinality.
Every url appears in the output (sentinel rows guarantee >=1 row/url),
with ``extracted_text=""`` when nothing was kept.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa


def add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    from neuscraper_ray.functions.joins import str_buckets

    b = str_buckets(batch.column("url"), num_buckets)
    return batch.append_column("bucket", pa.array(b, pa.int32()))


def assemble_page_text(node_ids: list[int], texts: list[str]) -> str:
    """Pure per-url assembly: descending node-id order, no separator."""
    order = sorted(range(len(node_ids)), key=lambda i: node_ids[i], reverse=True)
    return "".join(texts[i] for i in order)


def assemble_bucket_arrow(t: pa.Table) -> pa.Table:
    """Arrow/polars variant of ``assemble_bucket`` (the hot path):
    identical semantics — strings never become Python objects (polars
    group_by + str.join run in Rust on the Arrow buffers), and the
    whole body is ONE lazy plan with ONE join: the per-url error
    aggregate runs over ALL rows and sentinels guarantee >=1 row per
    url, so it doubles as the url spine (the former separate
    ``all_urls`` frame + second join measured ~40% of this kernel's
    time across its nine eager collects)."""
    import polars as pl

    cols = ["url", "node_id", "text"]
    names = t.schema.names
    err_col = "err" if "err" in names else ("tag" if "tag" in names else None)
    if err_col:
        cols.append(err_col)
    lf = pl.from_arrow(t.select(cols)).lazy()
    if err_col == "tag":
        lf = lf.with_columns((pl.col("tag") == "#error").alias("err")).drop("tag")
    elif err_col is None:
        lf = lf.with_columns(pl.lit(False).alias("err"))
    errs = lf.group_by("url").agg(pl.col("err").any().alias("parse_error"))
    agg = (
        lf.filter(pl.col("node_id") >= 0)
        # reference semantics: predicted node ids are a per-url SET
        # (union across chunks/occurrences) — duplicate (url, node_id)
        # rows are identical by construction, so any-keep is exact and
        # the sort below makes the row order deterministic again
        .unique(subset=["url", "node_id"], keep="first")
        .sort(["url", "node_id"], descending=[False, True])
        .group_by("url", maintain_order=True)
        .agg(
            [
                pl.col("text").str.join("").alias("extracted_text"),
                pl.len().alias("n_kept"),
                # Gopher line rules: kept node texts are the "lines"
                pl.col("text")
                .str.contains(r"^[-*•]")
                .mean()
                .alias("bullet_ratio"),
                pl.col("text").str.ends_with("...").mean().alias("ellipsis_ratio"),
            ]
        )
    )
    out = (
        errs.join(agg, on="url", how="left")
        .with_columns(
            [
                pl.col("extracted_text").fill_null(""),
                pl.col("n_kept").fill_null(0).cast(pl.Int32),
                pl.col("bullet_ratio").fill_null(0.0).cast(pl.Float64),
                pl.col("ellipsis_ratio").fill_null(0.0).cast(pl.Float64),
            ]
        )
        .select(
            "url",
            "extracted_text",
            "n_kept",
            "bullet_ratio",
            "ellipsis_ratio",
            "parse_error",
        )
        .collect()
    )
    return out.to_arrow()


def assemble_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One hash bucket of predictions (+ sentinels) -> one row per url.
    (pandas variant; the pipeline hot path uses ``assemble_bucket_arrow``)"""
    if "err" in df.columns:
        err_by_url = df.groupby("url", sort=False)["err"].any()
    elif "tag" in df.columns:
        err_by_url = (df["tag"] == "#error").groupby(df["url"], sort=False).any()
    else:
        err_by_url = None
    real = df[df["node_id"] >= 0]
    if len(real):
        # reference semantics: predicted node ids are a per-url SET
        # (union across chunks/occurrences, inference.py:126-129) — a url
        # ingested from two shards must not double its text
        real = real.drop_duplicates(["url", "node_id"])
        real = real.sort_values(["url", "node_id"], ascending=[True, False], kind="mergesort")
        bullets = real["text"].str.match(r"[-*•]").astype(float)
        ellipses = real["text"].str.endswith("...").astype(float)
        agg = real.assign(_b=bullets, _e=ellipses).groupby("url", sort=False).agg(
            extracted_text=("text", "".join),
            n_kept=("node_id", "size"),
            bullet_ratio=("_b", "mean"),
            ellipsis_ratio=("_e", "mean"),
        )
    else:
        agg = pd.DataFrame(
            columns=["extracted_text", "n_kept", "bullet_ratio", "ellipsis_ratio"]
        )
    all_urls = pd.Index(df["url"].unique(), name="url")
    out = agg.reindex(all_urls)
    out["extracted_text"] = out["extracted_text"].astype(object).fillna("")
    out["n_kept"] = out["n_kept"].astype("float64").fillna(0).astype(np.int32)
    out["bullet_ratio"] = out["bullet_ratio"].astype("float64").fillna(0.0)
    out["ellipsis_ratio"] = out["ellipsis_ratio"].astype("float64").fillna(0.0)
    if err_by_url is not None:
        out["parse_error"] = err_by_url.reindex(all_urls).fillna(False).astype(bool)
    else:
        out["parse_error"] = False
    return out.reset_index()
