"""URL canonicalization + URL-level deduplication.

The first dedup pass of a real crawl pipeline (CCNet / CommonCrawl
processing dedups by normalized URL before touching content): two
fetches of ``HTTPS://www.Example.com/page/?utm_source=feed#top`` and
``https://example.com/page`` are the same document, and dropping the
repeat by URL key is orders of magnitude cheaper than content hashing.

Canonicalization is a fixed regex chain applied in order —

1. drop the fragment (``#...``),
2. drop ``utm_*`` tracking parameters (each with its trailing ``&``),
3. strip dangling ``?`` / ``&`` separators left behind,
4. lowercase the scheme-and-host prefix (the part up to the first
   ``/`` after ``://``; the path stays case-sensitive per RFC 3986),
5. strip a ``www.`` host prefix,
6. strip one trailing ``/``

— expressed once as polars expressions (vectorized, no Python row
loop) and once as the byte-identical DuckDB ``regexp_replace`` chain
(:func:`sql_url_norm_ctes`), so the oracle reproduces every value.

The ``documents`` test table carries no URL column, so the query layer
derives one deterministically from ``(doc_id, source)`` — the SAME
arithmetic expression in both engines (:func:`derive_url_expr` /
``RAW_URL_SQL``) — exercising every rule: mixed-case scheme, ``www.``
and upper-case hosts, tracking params, fragments, trailing slashes,
and genuine key collisions: path = ``doc_id % 7``, so every source with
more than 14 documents MUST contain true URL duplicates by pigeonhole
(7 paths x 2 normalized suffix classes), independent of how doc_ids are
assigned to sources — the 500-row sf0.01 grading table carries hundreds.

Scale shape: ONE keyed exchange on a coarse vectorized url-hash bucket
(every copy of a normalized URL lands in one bucket, so the in-bucket
first-occurrence scan is globally correct; CLAUDE.md bucket rule), and
the domain rollup rides the same exchange with an in-bucket combiner —
the final ``groupby(domain)`` moves O(domains x buckets) rows only.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from neuscraper_ray.config import NUM_BUCKETS

# ---------------------------------------------------------- derivation

RAW_URL_SQL = """
CASE WHEN doc_id % 7 = 0 THEN 'HTTPS://' ELSE 'https://' END ||
CASE WHEN doc_id % 3 = 0 THEN 'www.' || source
     WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END ||
'.example.com/d/' || CAST(doc_id % 7 AS VARCHAR) ||
CASE doc_id % 4 WHEN 0 THEN '/' WHEN 1 THEN '?utm_source=feed&page=2'
     WHEN 2 THEN '#sec' ELSE '' END
""".strip()


def derive_url_expr():
    """Polars twin of ``RAW_URL_SQL`` over (doc_id, source) columns."""
    import polars as pl

    scheme = (
        pl.when(pl.col("doc_id") % 7 == 0)
        .then(pl.lit("HTTPS://"))
        .otherwise(pl.lit("https://"))
    )
    host = (
        pl.when(pl.col("doc_id") % 3 == 0)
        .then(pl.lit("www.") + pl.col("source"))
        .when(pl.col("doc_id") % 5 == 0)
        .then(pl.col("source").str.to_uppercase())
        .otherwise(pl.col("source"))
    )
    suffix = (
        pl.when(pl.col("doc_id") % 4 == 0)
        .then(pl.lit("/"))
        .when(pl.col("doc_id") % 4 == 1)
        .then(pl.lit("?utm_source=feed&page=2"))
        .when(pl.col("doc_id") % 4 == 2)
        .then(pl.lit("#sec"))
        .otherwise(pl.lit(""))
    )
    return (
        scheme
        + host
        + pl.lit(".example.com/d/")
        + (pl.col("doc_id") % 7).cast(pl.String)
        + suffix
    )


# ------------------------------------------------------ normalization


def normalize_url_expr(col):
    """Polars expression canonicalizing a URL string column (rules 1-6
    above). ``str.replace`` = first occurrence = DuckDB
    ``regexp_replace`` without 'g'; ``replace_all`` = with 'g'."""
    u = col.str.replace(r"#.*$", "")
    u = u.str.replace_all(r"utm_[A-Za-z0-9_]*=[^&#]*&?", "")
    u = u.str.replace(r"[?&]+$", "")
    prefix = u.str.extract(r"^([^/]*//[^/]*)", 1).fill_null("")
    u = prefix.str.to_lowercase() + u.str.slice(prefix.str.len_bytes())
    return u.str.replace(r"://www\.", "://").str.replace(r"/$", "")


def sql_url_norm_ctes(from_table: str = "documents") -> str:
    """The DuckDB CTE chain producing (doc_id, url_norm) — regex-for-
    regex the twin of :func:`normalize_url_expr` over ``RAW_URL_SQL``.
    Ends with CTE ``normed(doc_id, url_norm)``."""
    return f"""
raw AS (SELECT doc_id, {RAW_URL_SQL} AS u FROM {from_table}),
s1 AS (SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM raw),
s2 AS (SELECT doc_id, regexp_replace(
         regexp_replace(u, 'utm_[A-Za-z0-9_]*=[^&#]*&?', '', 'g'),
         '[?&]+$', '') AS u FROM s1),
s3 AS (SELECT doc_id,
         lower(regexp_extract(u, '^[^/]*//[^/]*'))
           || substr(u, length(regexp_extract(u, '^[^/]*//[^/]*')) + 1) AS u
       FROM s2),
normed AS (SELECT doc_id,
         regexp_replace(regexp_replace(u, '://www\\.', '://'), '/$', '')
           AS url_norm FROM s3)
""".strip()


# ------------------------------------------------------------ operators


def _normed_bucketed(ds: ray.data.Dataset, num_buckets: int) -> ray.data.Dataset:
    """(doc_id, url_norm, hb): derive + canonicalize per batch, bucket
    on the normalized url's seeded hash."""
    import polars as pl

    from neuscraper_ray.functions.joins import str_buckets

    def partial(t: pa.Table) -> pa.Table:
        pf = pl.from_arrow(t.select(["doc_id", "source"]))
        pf = pf.with_columns(derive_url_expr().alias("u"))
        pf = pf.select(
            pl.col("doc_id"), normalize_url_expr(pl.col("u")).alias("url_norm")
        )
        out = pf.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("url_norm", pa.string())])
        )
        hb = str_buckets(out.column("url_norm"), num_buckets)
        return out.append_column("hb", pa.array(hb, pa.int32()))

    return ds.map_batches(partial, batch_format="pyarrow")


def url_dedup(ds: ray.data.Dataset, num_buckets: int = NUM_BUCKETS) -> ray.data.Dataset:
    """-> (doc_id, url_norm, keep) for EVERY input doc; keep is True on
    the minimum doc_id per normalized URL (deterministic under any
    partitioning / task order)."""

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url_norm", "doc_id"], kind="mergesort")
        df = df.assign(keep=~df["url_norm"].duplicated().to_numpy())
        return df[["doc_id", "url_norm", "keep"]]

    return (
        _normed_bucketed(ds, num_buckets)
        .groupby("hb")
        .map_groups(mark, batch_format="pandas")
    )


BLOCK_DOMAINS = ("src2.example.com", "src13.example.com")
"""Hard domain blocklist (RefinedWeb ships a ~4.6M-domain list; this
deterministic stand-in hits every test scale — sources are src0..N)."""

URL_FRAGMENTS = (("/d/3", 100), ("/d/5", 50), ("/d/6", 50), ("src1", 30))
"""Weighted URL substrings (fixed-point e2), the RefinedWeb soft URL
score: strict fragments weigh 100, soft ones less; matches add up
(e.g. a 'src1*' host plus '/d/5' scores 80)."""

KEEP_BELOW_E2 = 100


def url_filter_batch(t: pa.Table, block: list) -> pa.Table:
    """Pure vectorized kernel under :func:`url_filter` (and the
    curation-funnel composition): (doc_id, source) + a PREPARED
    blocklist (a list, sorted once at broadcast time — the production
    list is millions of domains, so no per-batch sort/convert here) ->
    (doc_id, url_norm, domain, blocked, score_e2, keep)."""
    import polars as pl

    pf = pl.from_arrow(t.select(["doc_id", "source"]))
    pf = pf.with_columns(derive_url_expr().alias("u"))
    pf = pf.select(
        pl.col("doc_id"), normalize_url_expr(pl.col("u")).alias("url_norm")
    )
    pf = pf.with_columns(
        pl.col("url_norm")
        .str.extract(r"://([^/]*)", 1)
        .fill_null("")
        .alias("domain")
    )
    score = pl.lit(0, dtype=pl.Int64)
    for frag, w in URL_FRAGMENTS:
        score = score + pl.col("url_norm").str.contains(
            frag, literal=True
        ).cast(pl.Int64) * w
    pf = pf.with_columns(
        pl.col("domain").is_in(block).alias("blocked"),
        score.alias("score_e2"),
    )
    pf = pf.with_columns(
        (~pl.col("blocked") & (pl.col("score_e2") < KEEP_BELOW_E2)).alias(
            "keep"
        )
    )
    return pf.to_arrow().cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("url_norm", pa.string()),
                ("domain", pa.string()),
                ("blocked", pa.bool_()),
                ("score_e2", pa.int64()),
                ("keep", pa.bool_()),
            ]
        )
    )


def url_filter(ds: ray.data.Dataset) -> ray.data.Dataset:
    """RefinedWeb-style URL filtering (Penedo et al. 2023 §3.1: curated
    domain blocklist + weighted word-fragment URL score) ->
    ``(doc_id, url_norm, domain, blocked, score_e2, keep)`` for every
    doc. ``keep`` = domain not blocklisted AND fragment score < 1.00.

    Scale shape: ZERO shuffle — one vectorized polars pass per batch;
    the blocklist is broadcast ONCE via ``ray.put`` and looked up with
    ``is_in`` inside the batch fn (the production list is millions of
    domains — per-batch reshipping would dominate). SQL twin
    :func:`sql_url_filter` is generated from the SAME constants."""
    block_ref = ray.put(sorted(set(BLOCK_DOMAINS)))

    def fn(t: pa.Table) -> pa.Table:
        return url_filter_batch(t, ray.get(block_ref))

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_url_filter(from_table: str = "documents") -> str:
    """DuckDB twin of :func:`url_filter`, generated from the same
    BLOCK_DOMAINS / URL_FRAGMENTS / KEEP_BELOW_E2 constants."""
    in_list = ", ".join(f"'{d}'" for d in BLOCK_DOMAINS)
    score = " + ".join(
        f"CASE WHEN position('{frag}' IN url_norm) > 0 THEN {w} ELSE 0 END"
        for frag, w in URL_FRAGMENTS
    )
    return f"""
WITH {sql_url_norm_ctes(from_table)},
f AS (
  SELECT doc_id, url_norm,
    coalesce(regexp_extract(url_norm, '://([^/]*)', 1), '') AS domain
  FROM normed
),
sc AS (
  SELECT doc_id, url_norm, domain,
    (domain IN ({in_list})) AS blocked,
    ({score})::BIGINT AS score_e2
  FROM f
)
SELECT doc_id, url_norm, domain, blocked, score_e2,
  (NOT blocked AND score_e2 < {KEEP_BELOW_E2}) AS keep
FROM sc
""".strip()


def domain_stats(ds: ray.data.Dataset, num_buckets: int = NUM_BUCKETS) -> pd.DataFrame:
    """Per-domain crawl report over canonicalized URLs: doc count,
    distinct-URL count, and URL-duplication rate (fixed-point e4 so
    the oracle matches bit-for-bit). Distinct-per-domain is exact with
    no distinct-shuffle: each normalized URL lives in exactly one hash
    bucket, so in-bucket ``nunique`` partials sum to the global count.
    """
    from ray.data.aggregate import Sum

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        dom = df["url_norm"].str.extract(r"://([^/]*)", expand=False)
        g = (
            pd.DataFrame({"domain": dom, "url_norm": df["url_norm"]})
            .groupby("domain", sort=False)
            .agg(n_docs=("url_norm", "size"), n_unique_urls=("url_norm", "nunique"))
            .reset_index()
        )
        return g

    agg = (
        _normed_bucketed(ds, num_buckets)
        .groupby("hb")
        .map_groups(bucket_partial, batch_format="pandas")
        .groupby("domain")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_unique_urls", alias_name="n_unique_urls"),
        )
    )
    df = agg.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    df["n_unique_urls"] = df["n_unique_urls"].astype("int64")
    df["dup_rate_e4"] = ((df["n_docs"] - df["n_unique_urls"]) * 10000) // df["n_docs"]
    return df[["domain", "n_docs", "n_unique_urls", "dup_rate_e4"]]


def domain_cap(
    ds: ray.data.Dataset, cap: int = 25, num_buckets: int = NUM_BUCKETS
) -> ray.data.Dataset:
    """Per-domain crawl-budget cap: keep at most ``cap`` documents per
    canonical host, chosen by smallest doc-id fingerprint (uniform in
    the id, rerun-stable, engine-independent) — the anti-spam /
    diversity rule every web corpus applies so one mirror farm cannot
    dominate the training mix (RefinedWeb §3.1 caps URLs per domain;
    C4 variants cap pages per host). Returns the kept rows as
    ``(domain, doc_id, rn)`` with ``rn`` the 1-based in-domain rank.

    Scale shape: the same top-k combiner prune as
    ``docs_sample_per_lang`` — each batch keeps at most ``cap`` rows
    per domain BEFORE the shuffle (a domain's global cap-smallest set
    is a subset of the union of batch-local cap-smallest sets), then
    ONE domain-bucket exchange of the surviving (doc_id, domain, fp)
    triples (<= cap x domains x batches rows), in-bucket vectorized
    sort + cumcount. Document text never moves."""
    import numpy as np
    import polars as pl

    from neuscraper_ray.functions.joins import str_buckets
    from neuscraper_ray.functions.polyhash import int_fingerprints

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        pf = pl.from_pandas(df[["doc_id", "source"]])
        dom = (
            pf.with_columns(derive_url_expr().alias("u"))
            .select(
                normalize_url_expr(pl.col("u"))
                .str.extract(r"://([^/]*)", 1)
                # unreachable with the current normalizer (always emits
                # a scheme) but keeps str_buckets null-safe if URL
                # derivation ever changes; oracle mirrors with coalesce
                .fill_null("")
                .alias("domain")
            )["domain"]
            .to_pandas()
        )
        out = pd.DataFrame(
            {
                "domain": dom,
                "doc_id": df["doc_id"].to_numpy(),
                "fp": int_fingerprints(df["doc_id"].to_numpy()).astype(np.int64),
            }
        ).sort_values(["domain", "fp", "doc_id"], kind="mergesort")
        out = out[out.groupby("domain", sort=False).cumcount() < cap].copy()
        out["hb"] = str_buckets(out["domain"].tolist(), num_buckets)
        return out

    def take_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        df = df.sort_values(["domain", "fp", "doc_id"], kind="mergesort")
        df["rn"] = (df.groupby("domain", sort=False).cumcount() + 1).astype(np.int64)
        return df.loc[df["rn"] <= cap, ["domain", "doc_id", "rn"]]

    return (
        ds.map_batches(prune, batch_format="pandas")
        .groupby("hb")
        .map_groups(take_bucket, batch_format="pandas")
    )
