"""Driver-contract query implementations (see ``__ray_entry__``).

Each function takes ``sf_dir`` (a ``/root/testdata/sf*`` directory) and
returns a Dataset / pandas DataFrame / pyarrow Table whose row set,
schema and values match the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` (column names included — aggregates are
aliased identically on both sides; floats are rounded identically).

Ray-Data-first patterns on display (mapping to SURVEY.md §2):
- column pruning at the read (every ``read_parquet`` passes columns);
- partial (map-side) aggregation before every groupby shuffle;
- broadcast joins via ``ray.put`` for dimension tables (J1) and
  key-set anti joins (J2);
- the url-hash-bucketed groupby-concat assembly pattern (G1);
- streaming-shaped sessionization as a per-key ``map_groups`` (§2.10).

None of these call ``ray.init``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from neuscraper_ray.config import NUM_BUCKETS

# --------------------------------------------------------------- helpers


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _preagg_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    count_alias: str | None = None,
) -> ray.data.Dataset:
    """Map-side partial aggregation: one row per key per batch, then a
    small groupby over the partials — the shuffle moves O(groups x
    batches) rows instead of the full table."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False)[sum_cols].sum()
        if count_alias:
            cnt = df.groupby(keys, sort=False).size().reset_index(name=count_alias)
            g = g.merge(cnt, on=keys)
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=32768)
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


# ------------------------------------------------------------- documents


def docs_token_count(sf_dir: str):
    from neuscraper_ray.functions.textstats import token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"]
    )


def docs_content_hash(sf_dir: str):
    from neuscraper_ray.functions.textstats import content_hash_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(content_hash_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "content_hash"]
    )


def docs_exact_dedup(sf_dir: str):
    from neuscraper_ray.functions.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds, id_col="doc_id", text_col="text")


def docs_exact_dedup_fp(sf_dir: str):
    """Polyhash-fingerprint exact dedup: same output contract as
    docs_exact_dedup, SQL-verified via the shared Mersenne-61 polyhash
    (int64 key). NOT faster than the md5 variant — hashlib's C md5
    beats the vectorized mod-M kernel ~23x per doc (measured; see
    functions/dedup.py:exact_dedup_fp) — kept as the SQL-twin-keyed
    alternative. Both variants' dup structure is pinned equal in
    tests/test_functions.py."""
    from neuscraper_ray.functions.dedup import exact_dedup_fp

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup_fp(ds, id_col="doc_id", text_col="text")


C4_AUG_GOOD = (
    "One good sentence right here today. Another good sentence follows"
    " it closely. A third sentence ends this paragraph."
)
C4_AUG_SHORT = "Too short line."
C4_AUG_JS = "Please enable javascript to view the full content here."
C4_AUG_BRACE = "curly brace line {"
C4_AUG_LOREM = "some lorem ipsum filler text"


def docs_c4_clean(sf_dir: str):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2: keep lines
    ending in terminal punctuation with >= 5 words and no
    'javascript'; drop pages with < 3 sentences, 'lorem ipsum' or
    '{'). Zero-shuffle vectorized pass; SQL-verified with shared
    constants (stages/heuristics.py:c4_clean_batch / sql_c4_clean).
    The raw synthetic corpus triggers NO rule (no terminal
    punctuation anywhere), so — like docs_scrub — deterministic
    rule-exercising lines are planted identically in both engines
    (doc_id % 4 picks kept/short/javascript lines; % 11 plants the
    brace page rule; % 13 plants lorem ipsum)."""
    from neuscraper_ray.stages.heuristics import c4_clean_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def aug_and_clean(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        m4 = ids % 4
        add = np.where(
            m4 == 0,
            "\n" + C4_AUG_GOOD,
            np.where(m4 == 1, "\n" + C4_AUG_SHORT, np.where(m4 == 2, "\n" + C4_AUG_JS, "")),
        )
        add11 = np.where(ids % 11 == 0, "\n" + C4_AUG_BRACE, "")
        add13 = np.where(ids % 13 == 0, "\n" + C4_AUG_LOREM, "")
        aug = t.column("text").to_numpy(zero_copy_only=False) + add + add11 + add13
        t2 = pa.table(
            {"doc_id": pa.array(ids), "text": pa.array(aug, pa.string())}
        )
        return c4_clean_batch(t2)

    return ds.map_batches(aug_and_clean, batch_format="pyarrow")


def docs_soft_dedup(sf_dir: str):
    """Soft dedup (downweight, don't drop): every doc gets
    weight_ppm = 1e6 // n_copies of its exact-text duplicate group, so
    a group contributes one doc's worth of training signal. Rides the
    exact-dedup (id, md5) exchange with a transform-size in-bucket
    merge (see functions/dedup.py:soft_dedup_weights). SQL-verified
    (count(*) OVER (PARTITION BY md5(text)))."""
    from neuscraper_ray.functions.dedup import soft_dedup_weights

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return soft_dedup_weights(ds, id_col="doc_id", text_col="text")


def docs_line_dedup(sf_dir: str):
    """CCNet/RefinedWeb-style duplicated-line fraction per document
    (distinct trimmed non-empty lines shared with >=1 other doc).
    SQL-verified; two pair-shaped exchanges, no duplicate-line index
    (see functions/dedup.py:line_dedup_stats). The synthetic corpus
    has single-line docs, so here dup lines == whole-text dups; the
    multi-line semantics are pinned on planted docs in
    tests/test_functions.py."""
    from neuscraper_ray.functions.dedup import line_dedup_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return line_dedup_stats(ds, id_col="doc_id", text_col="text")


def docs_line_dedup_apply(sf_dir: str):
    """CCNet line dedup APPLIED: drop every corpus-wide repeat of a
    trimmed non-empty line (first occurrence by (doc_id, line_idx)
    wins), reassemble the survivors per doc. SQL-verified; the
    ``docs_chunk_dedup`` two-exchange topology at line granularity
    (see functions/dedup.py:line_dedup_apply). Multi-line semantics
    pinned on planted docs in tests/test_functions.py."""
    from neuscraper_ray.functions.dedup import line_dedup_apply

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return line_dedup_apply(ds, id_col="doc_id", text_col="text")


def docs_paragraph_dedup(sf_dir: str):
    """MassiveText/Gopher exact paragraph dedup APPLIED (split on
    blank line, first corpus-wide occurrence of each distinct trimmed
    paragraph wins, survivors rejoined with \\n\\n per doc). The
    paragraph rung of the dedup granularity ladder; SQL-verified via
    the string_split(chr(10)||chr(10)) twin. Same two-exchange
    topology as docs_line_dedup_apply (see
    functions/dedup.py:paragraph_dedup_apply). The synthetic corpus is
    single-paragraph, so here this degenerates to whole-text dedup;
    multi-paragraph semantics are pinned on planted docs in
    tests/test_functions.py."""
    from neuscraper_ray.functions.dedup import paragraph_dedup_apply

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = paragraph_dedup_apply(ds, id_col="doc_id", text_col="text")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_paras": t.column("n_lines"),
                "n_kept": t.column("n_kept"),
                "text_dedup": t.column("text_dedup"),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow", batch_size=None)


def docs_ngram_coverage(sf_dir: str):
    """N-gram coverage per document (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): the fraction of each
    doc's distinct word-3-gram shingles that occur in >=1 other doc —
    the finest-grain dedup statistic (whole-doc md5 -> line dedup ->
    this), catching near-copies that share no full line. SQL-verified
    via the shared Mersenne-61 shingle hashes
    (polyhash.sql_shingle_ctes); two pair-shaped exchanges, no
    per-distinct-shingle group (see
    functions/dedup.py:ngram_coverage_stats)."""
    from neuscraper_ray.functions.dedup import ngram_coverage_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_coverage_stats(ds, id_col="doc_id", text_col="text")


def docs_boilerplate_lines(sf_dir: str):
    """Boilerplate-line removal (CCNet/RefinedWeb "frequent lines"
    rule, crawl-wide scope): a trimmed line shared by >=2 distinct
    docs anywhere in the corpus is template text; EVERY occurrence is
    removed. Distinct from docs_line_dedup_apply (first occurrence
    wins): NO copy survives. SQL-verified; the same two-exchange
    line-granularity topology (see
    functions/dedup.py:boilerplate_lines_apply — which also takes a
    source_col for the per-domain template variant, pinned on planted
    docs in tests/test_functions.py). The synthetic corpus is
    single-line so boilerplate == whole-text dup groups here (8 fire
    at sf0.1)."""
    from neuscraper_ray.functions.dedup import boilerplate_lines_apply

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return boilerplate_lines_apply(ds, source_col=None, min_docs=2)


def _snapshot_parity_filter(want: int):
    """Vectorized source-parity split (srcN: N even = prior snapshot,
    N odd = new crawl) — the deterministic snapshot boundary both
    engines share; SQL twin CAST(substr(source, 4) AS BIGINT) % 2."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        nums = pc.cast(
            pc.utf8_slice_codeunits(t.column("source"), 3, 2**30), pa.int64()
        )
        return t.filter(pc.equal(pc.bit_wise_and(nums, 1), want))

    return fn


def docs_incremental_dedup(sf_dir: str):
    """Snapshot-over-snapshot exact dedup: keep the new crawl's docs
    (odd-numbered sources) whose content hash appears nowhere in the
    prior snapshot (even-numbered sources) — the ingest-time dedup
    pass a rolling 100-TB crawl runs every cycle. SQL-verified
    (md5 anti-join). Neither side is broadcast: one keyed exchange of
    (id, md5) rows, in-bucket vectorized isin; text never moves (see
    functions/dedup.py:snapshot_anti_dedup)."""
    from neuscraper_ray.functions.dedup import snapshot_anti_dedup

    new = _read(sf_dir, "documents", ["doc_id", "text", "source"]).map_batches(
        _snapshot_parity_filter(1), batch_format="pyarrow"
    )
    old = _read(sf_dir, "documents", ["doc_id", "text", "source"]).map_batches(
        _snapshot_parity_filter(0), batch_format="pyarrow"
    )
    return snapshot_anti_dedup(new, old)


def docs_incremental_near_dedup(sf_dir: str):
    """Snapshot-over-snapshot NEAR-dup dedup: keep the new crawl's
    docs (odd-numbered sources) that are not MinHash-LSH-candidate +
    exact-Jaccard-verified (>= 0.5) near-duplicates of ANY
    prior-snapshot doc (even-numbered sources) — what
    docs_incremental_dedup does for exact copies, extended to the
    re-rendered/near-identical-page case a rolling crawl hits every
    cycle. Neither snapshot is broadcast anywhere; band buckets of the
    old snapshot form the anti-join side (see functions/dedup.py:
    snapshot_near_anti_dedup for the exchange-by-exchange shape)."""
    from neuscraper_ray.functions.dedup import snapshot_near_anti_dedup

    new = _read(sf_dir, "documents", ["doc_id", "text", "source"]).map_batches(
        _snapshot_parity_filter(1), batch_format="pyarrow"
    )
    old = _read(sf_dir, "documents", ["doc_id", "text", "source"]).map_batches(
        _snapshot_parity_filter(0), batch_format="pyarrow"
    )
    return snapshot_near_anti_dedup(new, old)


def docs_quality_model(sf_dir: str):
    """Learned quality classifier (fastText-style hashed-ngram model,
    GPT-3/LLaMA recipe) DISTILLED from the Gopher/C4 rule filter:
    train a closed-form Naive Bayes on heuristic labels in one
    zero-shuffle counting pass, score every doc with the broadcast
    model in a second. Rows-only (the model's log-odds depend on
    corpus counts through float log — no SQL twin; the teacher
    docs_quality_filter IS the SQL-anchored path); determinism,
    signal direction and distillation agreement >= teacher base rate
    are pinned in tests/test_functions.py. Output carries
    teacher_keep so agreement is visible in the result."""
    from neuscraper_ray.functions.quality_model import quality_model_distill

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return quality_model_distill(ds)


def docs_bpe_merges(sf_dir: str):
    """BPE tokenizer training (Sennrich 2016, the HF-tokenizers shape):
    ONE distributed corpus pass builds the top-V (word, count) table
    (combiner + term-bucket + per-bucket top-V — the vocabulary never
    leaves the cluster unbounded), then the merge loop runs driver-side
    on that corpus-size-independent table. 64 character-level merges,
    deterministic tie-break (count desc, lexicographic pair asc).
    Rows-only (iterative fixpoint, no SQL twin); first merges pinned by
    hand on the classic Sennrich vocab, partitioning- and
    top_v-invariance pinned in tests/test_functions.py."""
    from neuscraper_ray.functions.bpe import bpe_train

    ds = _read(sf_dir, "documents", ["text"])
    return bpe_train(ds, n_merges=64)


def docs_bpe_tokenize(sf_dir: str):
    """Train-then-apply BPE token counting: the 64-merge table from
    docs_bpe_merges, applied in a zero-shuffle broadcast-merges pass —
    per-doc whitespace-word count and BPE token count (the
    tokens-per-doc number a training-data budget is written in).
    Rows-only (depends on the trained merge table); encode semantics
    pinned on hand-computed words in tests/test_functions.py."""
    from neuscraper_ray.functions.bpe import bpe_encode_lens, bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(_read(sf_dir, "documents", ["text"]), n_merges=64)
    return bpe_encode_lens(ds, merges)


def docs_url_dedup(sf_dir: str):
    """URL-level deduplication — the cheap first dedup pass of a crawl
    pipeline (before any content hashing): canonicalize each document's
    URL (fragment / utm-param / case / www. / trailing-slash rules, see
    functions/urls.py) and keep the minimum doc_id per normalized URL.
    SQL-verified regex-for-regex. The documents table has no URL column
    so one is derived deterministically from (doc_id, source) — the
    same expression in both engines — with planted collisions. ONE
    keyed exchange on a coarse url-hash bucket; text never moves."""
    from neuscraper_ray.functions.urls import url_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return url_dedup(ds)


def docs_url_filter(sf_dir: str):
    """RefinedWeb URL filtering (domain blocklist + weighted fragment
    score): the cheapest quality gate of a crawl pipeline, run before
    any content is fetched or parsed. SQL-verified from the SAME
    constants (functions/urls.py:url_filter / sql_url_filter).
    Zero-shuffle: one vectorized pass, blocklist broadcast once via
    ray.put (the production list is millions of domains)."""
    from neuscraper_ray.functions.urls import url_filter

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return url_filter(ds)


def docs_domain_stats(sf_dir: str):
    """Per-domain crawl report over canonicalized URLs: doc count,
    exact distinct-URL count and URL-duplication rate per host. The
    rollup a 100-TB crawl needs before deciding per-domain crawl
    budgets. Exact distinct with no extra shuffle: rides the url-hash
    bucket exchange (a URL lives in exactly one bucket), in-bucket
    nunique partials sum to the global count, final groupby moves
    O(domains x buckets) rows. SQL-verified."""
    from neuscraper_ray.functions.urls import domain_stats

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return domain_stats(ds)


def docs_domain_cap(sf_dir: str):
    """Per-domain crawl-budget cap (keep <= 25 docs per canonical
    host, smallest-fingerprint-first): the anti-spam diversity rule a
    web corpus applies before mixing, so one mirror farm cannot
    dominate training (RefinedWeb caps per-domain URLs). SQL-verified
    — the rank is a pure function of (domain, doc_id) via the shared
    polyhash contract. Scale shape: batch-local top-cap combiner prune
    BEFORE the one domain-bucket exchange; text never moves (see
    functions/urls.py:domain_cap)."""
    from neuscraper_ray.functions.urls import domain_cap

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return domain_cap(ds, cap=25)


def docs_lang_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )
    df = agg.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    # fixed-point mean: exact integer arithmetic matches SQL bit-for-bit
    df["avg_chars_e2"] = (df["sum_chars"].astype("int64") * 100) // df["n_docs"]
    return df[["lang", "n_docs", "avg_chars_e2"]]


def docs_word_stats(sf_dir: str):
    from neuscraper_ray.functions.textstats import word_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(word_stats_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_words", "n_distinct_words", "mean_word_len_e4"]
    )


def docs_repetition_stats(sf_dir: str):
    """Gopher-style within-document repetition quality stats (Rae et
    al. 2021 §A.1.1 adapted to word n-grams): per doc the character
    coverage of the most-repeated word-2-gram and of all duplicated
    word-3-grams. Pure map stage — zero shuffle at any corpus size;
    integer-exact so the DuckDB oracle reproduces it value-for-value
    (``polyhash.sql_repetition_stats``)."""
    from neuscraper_ray.functions.textstats import repetition_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(repetition_stats_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_words", "total_chars", "top2_cov", "dup3_chars"]
    )


def docs_quality_filter(sf_dir: str):
    """Standalone Gopher-rule quality filter over the raw corpus:
    per-doc keep/drop decision + first-failing-rule drop_reason, with
    every ratio threshold in cross-multiplied integer form (exact, so
    the DuckDB oracle reproduces it value-for-value). Pure map stage —
    zero shuffle at any corpus size."""
    from neuscraper_ray.stages.heuristics import quality_filter_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(quality_filter_batch, batch_format="pyarrow")


def docs_source_quality(sf_dir: str):
    """Per-source quality rollup: how much of each ingest source
    survives the Gopher filter, at what average length. The curation
    report a 100-TB operator needs before deciding which crawls to
    keep. Map-side combiner (one row per source per batch) -> tiny
    low-cardinality groupby; fixed-point integer rates so DuckDB
    matches bit-for-bit."""
    from neuscraper_ray.stages.heuristics import drop_reasons

    ds = _read(sf_dir, "documents", ["text", "source", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        reason, _ = drop_reasons(t.column("text").to_pylist())
        df = pd.DataFrame(
            {
                "source": t.column("source").to_numpy(zero_copy_only=False),
                "kept": (reason == "").astype(np.int64),
                "n_chars": t.column("n_chars").to_numpy(),
            }
        )
        g = df.groupby("source", sort=False, as_index=False).agg(
            n_docs=("kept", "size"), n_kept=("kept", "sum"), sum_chars=("n_chars", "sum")
        )
        return g

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )
    df = agg.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    df["n_kept"] = df["n_kept"].astype("int64")
    df["keep_rate_e4"] = (df["n_kept"] * 10000) // df["n_docs"]
    df["avg_chars_e2"] = (df["sum_chars"].astype("int64") * 100) // df["n_docs"]
    return df[["source", "n_docs", "n_kept", "keep_rate_e4", "avg_chars_e2"]]


def docs_length_filter(sf_dir: str):
    """Range filter pushed INTO the parquet read (row-group statistics
    prune untouched ranges; the reader applies the exact predicate) —
    no post-read filter stage at all."""
    import pyarrow.compute as pc

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
        filter=(pc.field("n_chars") >= 150) & (pc.field("n_chars") <= 350),
    )


def docs_scrub(sf_dir: str):
    """PII/toxicity scrub over document text — SQL-verifiable: the same
    pattern chain as ``stages.scrub`` expressed as chained
    ``regexp_replace`` calls in the DuckDB oracle (RE2-compatible
    patterns, no lookarounds, left-to-right non-overlapping semantics
    match Python ``re.sub``)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        from neuscraper_ray.stages.scrub import scrub_text

        # plant deterministic PII on every 7th doc so the regex chain is
        # genuinely exercised (the raw corpus contains none); the SQL
        # oracle constructs the identical augmented text
        aug = [
            t
            + (
                f" contact user{i}@example.com or 192.168.0.{i % 256} now"
                if i % 7 == 0
                else ""
            )
            for i, t in zip(df["doc_id"].tolist(), df["text"].tolist())
        ]
        res = [scrub_text(t) for t in aug]
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "scrubbed": [r[0] for r in res],
                "pii_count": np.asarray([r[1] for r in res], dtype=np.int64),
            }
        )
        return out

    return ds.map_batches(scrub, batch_format="pandas")


def docs_langid(sf_dir: str):
    """Language-ID over document text (non-SQL: model-based, rows-only)."""
    from neuscraper_ray.stages.langid import langid_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda df: langid_batch(df, column="text"), batch_format="pandas"
    ).select_columns(["doc_id", "lang_pred", "lang_score"])


def docs_minhash_clusters(sf_dir: str):
    """MinHash-LSH near-dup clusters, SQL-verified: the polyhash
    contract is reproduced value-for-value by a DuckDB oracle
    (shingles -> signatures -> band folds -> recursive-CTE closure)."""
    from neuscraper_ray.functions.dedup import near_dup_clusters

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return near_dup_clusters(ds)


def docs_dedup_apply(sf_dir: str):
    """End-to-end near-dup DEDUPLICATION of the corpus: MinHash-LSH
    clusters -> keep one representative per cluster (the min doc_id
    label) plus every unclustered doc. The op a user actually runs to
    emit a deduplicated corpus, composed from the cluster machinery
    plus the co-partitioned ``hash_join`` (labels ride the join's one
    keyed shuffle — the corpus is never collected, and the label side
    stays distributed, so the shape holds when near-dups are 50% of a
    web corpus). SQL-verified against the recursive-CTE closure
    oracle."""
    from neuscraper_ray.functions.dedup import near_dup_clusters
    from neuscraper_ray.functions.joins import hash_join

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    labels = near_dup_clusters(_read(sf_dir, "documents", ["doc_id", "text"]))
    if len(labels) == 0:
        return ds
    joined = hash_join(
        ds,
        ray.data.from_pandas(labels),
        left_on="doc_id",
        right_on="doc_id",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()), ("n_chars", pa.int64())]
        ),
        right_schema=pa.schema(
            [("doc_id", pa.int64()), ("cluster_id", pa.int64())]
        ),
        how="left",
    )

    def keep_reps(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cl = t.column("cluster_id")
        mask = pc.or_kleene(pc.is_null(cl), pc.equal(cl, t.column("doc_id")))
        return t.filter(pc.fill_null(mask, True)).select(
            ["doc_id", "lang", "n_chars"]
        )

    return joined.map_batches(keep_reps, batch_format="pyarrow", batch_size=None)


def docs_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs, Hamming <= 3 — SQL-verified (the 4-band
    blocking is exhaustive for distance <= 3 by pigeonhole, so exact
    all-pairs Hamming SQL is a complete oracle)."""
    from neuscraper_ray.functions.dedup import simhash_near_dup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_near_dup_pairs(ds)


def docs_jaccard_pairs(sf_dir: str):
    """LSH-candidate pairs verified with exact n-gram Jaccard >= 0.5
    (fixed-point e6) — SQL-verified, and a composition showcase:
    banded blocking -> pair dedup -> two co-partitioned hash_joins
    attaching per-doc shingle lists -> vectorized exact verify."""
    from neuscraper_ray.functions.dedup import jaccard_verified_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return jaccard_verified_pairs(ds)


def docs_minhash_precision(sf_dir: str):
    """Sketch-quality audit: signature-estimated vs exact Jaccard per
    LSH candidate pair, with the absolute error as a column — the
    approximation ships its own measured accuracy (the ANN recall@10
    pattern applied to MinHash). SQL-verified bit-for-bit (e6
    fixed point on both engines)."""
    from neuscraper_ray.functions.dedup import minhash_precision_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_precision_pairs(ds)


def docs_dedup_cluster_stats(sf_dir: str):
    """Duplication-profile report: the near-dup cluster SIZE
    distribution — (cluster_size, n_clusters, n_docs) including the
    singleton row — the headline table a dedup paper/report states
    ("X% of the corpus sits in clusters of size >= k").

    Scale shape: rides ``near_dup_clusters``'s labels regime (driver-
    resident below the documented edge limit); the histogram is
    O(|clusters|) driver arithmetic plus ONE corpus count for the
    singleton row — the corpus text is scanned once by the cluster
    machinery and never again."""
    from neuscraper_ray.functions.dedup import near_dup_clusters

    total = _read(sf_dir, "documents", ["doc_id"]).count()
    labels = near_dup_clusters(_read(sf_dir, "documents", ["doc_id", "text"]))
    if len(labels) == 0:
        sizes = pd.DataFrame({"cluster_size": [], "n_clusters": []})
        clustered = 0
    else:
        cs = labels.groupby("cluster_id").size()
        sizes = (
            cs.value_counts()
            .rename_axis("cluster_size")
            .reset_index(name="n_clusters")
        )
        clustered = int(len(labels))
    single = pd.DataFrame({"cluster_size": [1], "n_clusters": [total - clustered]})
    out = pd.concat([sizes, single], ignore_index=True)
    out["cluster_size"] = out["cluster_size"].astype("int64")
    out["n_clusters"] = out["n_clusters"].astype("int64")
    out["n_docs"] = (out["cluster_size"] * out["n_clusters"]).astype("int64")
    out = out[out["n_clusters"] > 0]
    return out.sort_values("cluster_size", kind="mergesort").reset_index(drop=True)


def docs_cross_source_overlap(sf_dir: str):
    """Inter-corpus leakage report: verified near-dup pairs
    (exact-Jaccard >= 0.5) whose two documents come from DIFFERENT
    sources — the cross-source contamination check a multi-corpus
    pretraining mix needs before assigning mixing weights (a duplicate
    that exists in two sources silently doubles its weight).

    Scale shape: the pair list from ``jaccard_verified_pairs`` is
    output-sized, so sources attach by broadcasting the pair-id SET
    and scanning documents filtered to it (never broadcasting the
    corpus-sized doc->source map), with the final filter + merge on
    the output-sized frame."""
    from neuscraper_ray.functions.dedup import jaccard_verified_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = jaccard_verified_pairs(ds).to_pandas()  # output-sized
    cols = ["id_a", "id_b", "source_a", "source_b", "jacc_e6"]
    if pairs.empty:
        return pd.DataFrame(
            {
                c: pd.Series([], dtype="object" if c.startswith("source") else "int64")
                for c in cols
            }
        )
    ids = set(pairs["id_a"].astype(int)) | set(pairs["id_b"].astype(int))
    ids_ref = ray.put(ids)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"].isin(ray.get(ids_ref))]

    src = (
        _read(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(pick, batch_format="pandas")
        .to_pandas()
    )
    m = dict(zip(src["doc_id"].astype(int), src["source"]))
    pairs["source_a"] = pairs["id_a"].astype(int).map(m)
    pairs["source_b"] = pairs["id_b"].astype(int).map(m)
    out = pairs[pairs["source_a"] != pairs["source_b"]]
    return out[cols].reset_index(drop=True)


def docs_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: per-language rates (en keeps
    1-in-2, others 1-in-10) via a polyhash gate on doc_id — zero
    shuffle, streams, engine-independent (the same rows on any
    partitioning and any rerun), and SQL-verifiable. The scale story
    for corpus downsampling: sampling decisions must be a pure
    function of the row, never of task layout or RNG state. The gate
    key is ``polyhash.int_fingerprints`` (fingerprint of the decimal
    id string) — fully vectorized, no per-row digest loop, and
    reproduced in SQL as ``sql_fingerprint(doc_id::VARCHAR)``."""
    from neuscraper_ray.functions.polyhash import int_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        mod = np.where(df["lang"].to_numpy() == "en", 2, 10)
        h = int_fingerprints(df["doc_id"].to_numpy())
        return df[h % mod == 0]

    return ds.map_batches(keep, batch_format="pandas")


def docs_train_split(sf_dir: str):
    """Deterministic train/valid/test split assignment: every doc gets
    a disjoint split from a uniform polyhash gate on its id (1% test,
    5% valid, 94% train) — the held-out-eval partitioning step of a
    training-data pipeline. Unlike RNG-based splits, the assignment is
    a pure function of the row: stable across reruns, partitionings
    and engines (the SQL oracle reproduces every value), and safe to
    recompute incrementally as the corpus grows — a doc never migrates
    between splits. Zero shuffle: one vectorized map pass; in
    production the result feeds ``write_parquet(partition_cols=
    ['split'])`` for three resumable output trees."""
    from neuscraper_ray.functions.polyhash import gate_ppm, int_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        g = gate_ppm(int_fingerprints(df["doc_id"].to_numpy()))
        split = np.where(g < 10_000, "test", np.where(g < 60_000, "valid", "train"))
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "gate": g, "split": split}
        )

    return ds.map_batches(assign, batch_format="pandas")


def _alpha_half_rates(totals: pd.DataFrame) -> dict[str, int]:
    """(source, n_tokens) totals frame -> rate_ppm per source: the
    alpha=0.5 temperature weights (isqrt of total tokens, exact Python
    ints) scaled so the largest-rate source saturates at 1e6 ppm (no
    upsampling). Shared by docs_temperature_mix and the curation
    funnel; SQL twin is the corrected-sqrt CTE chain."""
    import math

    weights = {
        str(s): (int(t), math.isqrt(int(t)))
        for s, t in zip(totals["source"], totals["n_tokens"])
    }
    pos = [(t, w) for t, w in weights.values() if w > 0]
    if not pos:
        return {s: 0 for s in weights}
    c = min((t * 1_000_000) // w for t, w in pos)
    return {s: (0 if t == 0 else (w * c) // t) for s, (t, w) in weights.items()}


def docs_temperature_mix(sf_dir: str):
    """Temperature-based source mixing (the mT5/UniMax recipe at
    alpha = 0.5): a source's sampling weight is total_tokens^alpha, so
    small sources are upweighted relative to proportional sampling
    without exploding them. Emits per doc (doc_id, source, n_tokens,
    rate_ppm, keep) where rate_ppm is the source's keep probability in
    ppm (the largest feasible scaling with every rate <= 1, i.e. no
    upsampling) and keep is the deterministic polyhash gate — a pure
    function of the row, reproducible on any partitioning.

    Exactness: alpha = 0.5 is an INTEGER sqrt on both engines — Python
    ``math.isqrt`` driver-side, and in SQL ``floor(sqrt(x::DOUBLE))``
    corrected by one down/up step (exact while totals < 2^52; a 100-TB
    corpus is ~2.5e13 tokens/source). Rates use HUGEINT in SQL and
    Python ints driver-side, so no overflow either side.

    Scale shape: pass 1 is per-source combiner partials -> a tiny
    groupby (O(sources x batches) rows); the weight/rate table is
    computed on the driver frame (|sources| rows) and broadcast via
    ``ray.put``; pass 2 is a zero-shuffle vectorized gate."""
    from neuscraper_ray.functions.polyhash import gate_ppm, int_fingerprints
    from neuscraper_ray.functions.textstats import token_count_batch

    def tok_fn(t: pa.Table) -> pa.Table:
        return token_count_batch(t).select(["doc_id", "source", "n_tokens"])

    tok = _read(sf_dir, "documents", ["doc_id", "source", "text"]).map_batches(
        tok_fn, batch_format="pyarrow"
    )

    totals = _preagg_sum(
        tok.select_columns(["source", "n_tokens"]), ["source"], ["n_tokens"]
    ).to_pandas()
    rates_ref = ray.put(_alpha_half_rates(totals))

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        rates = ray.get(rates_ref)
        r = df["source"].map(rates).to_numpy().astype(np.int64)
        h = gate_ppm(int_fingerprints(df["doc_id"].to_numpy()))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "source": df["source"].to_numpy(),
                "n_tokens": df["n_tokens"].to_numpy(),
                "rate_ppm": r,
                "keep": h < r,
            }
        )

    return tok.map_batches(gate, batch_format="pandas")


def docs_curation_funnel(sf_dir: str):
    """The full LLM-data curation recipe composed END-TO-END from the
    engine's own operators — URL filter (RefinedWeb) -> Gopher/C4
    quality rules -> exact dedup (min doc_id per md5) -> temperature
    source mixing (alpha=0.5) — emitting the per-stage attrition
    funnel ``(stage, n_docs)``. Every stage has an SQL twin, so the
    whole composition is SQL-verified: the oracle chains the same four
    stage twins as CTEs.

    Scale shape: pass A is a zero-shuffle gate pass collapsed to
    per-batch count partials; pass B re-applies the gates, hashes only
    the survivors, and runs ONE md5-bucket exchange for the dedup
    stage; the dedup survivors (id/source/count columns only —
    metadata-sized) are materialized once and reused for the tiny
    per-source totals groupby, the broadcast-rate mix gate, and the
    counts. Text never crosses an exchange."""
    from neuscraper_ray.functions.joins import str_buckets
    from neuscraper_ray.functions.polyhash import gate_ppm, int_fingerprints
    from neuscraper_ray.functions.urls import BLOCK_DOMAINS, url_filter_batch
    from neuscraper_ray.stages.heuristics import quality_filter_batch

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    block_ref = ray.put(sorted(set(BLOCK_DOMAINS)))

    def gate_flags(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        keep_u = (
            url_filter_batch(t.select(["doc_id", "source"]), ray.get(block_ref))
            .column("keep")
            .to_numpy(zero_copy_only=False)
        )
        keep_q = (
            quality_filter_batch(t, column="text")
            .column("keep")
            .to_numpy()
            .astype(bool)
        )
        return keep_u, keep_q

    # ---- pass A: per-batch count partials (zero shuffle)
    def count_partial(t: pa.Table) -> pa.Table:
        keep_u, keep_q = gate_flags(t)
        return pa.table(
            {
                "n_input": pa.array([len(t)], pa.int64()),
                "n_url": pa.array([int(keep_u.sum())], pa.int64()),
                "n_urlq": pa.array([int((keep_u & keep_q).sum())], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )

    # ---- pass B: survivors -> md5-bucket dedup exchange
    def survivors(t: pa.Table) -> pa.Table:
        keep_u, keep_q = gate_flags(t)
        both = keep_u & keep_q
        t2 = t.filter(pa.array(both))
        import pyarrow.compute as pc

        from neuscraper_ray.functions.textstats import md5_hex

        hs = md5_hex(t2.column("text").to_pylist())
        n_tok = pc.add(pc.count_substring(t2.column("text"), " "), 1)
        return pa.table(
            {
                "doc_id": t2.column("doc_id"),
                "source": t2.column("source"),
                "n_tokens": pc.cast(n_tok, pa.int64()),
                "h": pa.array(hs, pa.string()),
                "hb": pa.array(str_buckets(hs, NUM_BUCKETS), pa.int32()),
            }
        )

    def dedup_mark(df: pd.DataFrame) -> pd.DataFrame:
        first = df.groupby("h", sort=False)["doc_id"].transform("min")
        out = df[df["doc_id"].to_numpy() == first.to_numpy()]
        return out[["doc_id", "source", "n_tokens"]]

    s3 = (
        ds.map_batches(survivors, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(dedup_mark, batch_format="pandas")
        .materialize()  # id/source/count columns only; reused 3x below
    )
    n_dedup = s3.count()

    totals = _preagg_sum(
        s3.select_columns(["source", "n_tokens"]), ["source"], ["n_tokens"]
    ).to_pandas()
    rates_ref = ray.put(_alpha_half_rates(totals))

    def mix_partial(df: pd.DataFrame) -> pd.DataFrame:
        rates = ray.get(rates_ref)
        r = df["source"].map(rates).to_numpy().astype(np.int64)
        g = gate_ppm(int_fingerprints(df["doc_id"].to_numpy()))
        return pd.DataFrame({"n_mix": [int((g < r).sum())]})

    n_mix = int(
        s3.map_batches(mix_partial, batch_format="pandas")
        .to_pandas()["n_mix"]
        .sum()
    )

    return pd.DataFrame(
        {
            "stage": [
                "input",
                "url_filter",
                "quality_filter",
                "exact_dedup",
                "temperature_mix",
            ],
            "n_docs": np.array(
                [
                    int(counts["n_input"]),
                    int(counts["n_url"]),
                    int(counts["n_urlq"]),
                    int(n_dedup),
                    n_mix,
                ],
                dtype=np.int64,
            ),
        }
    )


def docs_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3/Gopher recipe): count each
    non-benchmark doc's word-3-gram shingles that also occur in the
    benchmark subset (doc_id % 20 == 0). Benchmark shingle set built
    distributed (per-batch unique -> bucketed distinct), broadcast once
    via ray.put, looked up with vectorized searchsorted. SQL-verified
    via the shared polyhash contract."""
    from neuscraper_ray.functions.decontam import (
        benchmark_shingle_array,
        decontaminate,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = benchmark_shingle_array(ds)
    return decontaminate(ds, ray.put(bench))


def docs_token_quantiles(sf_dir: str):
    """Exact distributed quantiles of per-doc token count.

    Scale shape: token counts are small integers, so the full
    distribution compresses to a (value, count) histogram — per-batch
    ``np.unique`` partials (combiner), one tiny groupby-sum shuffle,
    and the quantile read-off happens on the aggregated histogram
    (thousands of rows at any corpus size, never the corpus itself).
    Matches DuckDB ``quantile_disc`` exactly: index ceil(p*n)-1 of the
    ascending values."""
    import math

    from neuscraper_ray.functions.textstats import token_count_batch

    ps = [0.25, 0.5, 0.75, 0.9, 0.99]
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        nt = token_count_batch(t).column("n_tokens").to_numpy()
        vals, cnts = np.unique(nt, return_counts=True)
        return pa.table(
            {
                "value": vals,
                "cnt": cnts.astype(np.int64),
                # coarse merge bucket: groupby on the raw value would pay
                # per-group Python (CLAUDE.md pitfall); 16 groups with a
                # vectorized in-bucket merge cost O(1) calls
                "hb": (vals % 16).astype(np.int32),
            }
        )

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("value", sort=False, as_index=False)["cnt"].sum()

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("value")
    )
    values = hist["value"].to_numpy()
    counts = hist["cnt"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_vals = []
    for p in ps:
        idx = max(0, math.ceil(p * n) - 1)  # DuckDB quantile_disc
        out_vals.append(int(values[np.searchsorted(cum, idx + 1)]))
    return pd.DataFrame({"p": np.asarray(ps, dtype=np.float64), "value": out_vals})


def docs_length_quantiles_by_lang(sf_dir: str):
    """Grouped exact quantiles (p50/p90 of n_chars per language) via
    the same histogram-partials shape as ``docs_token_quantiles``:
    per-batch (lang, value, count) combiner rows, one small
    groupby-sum shuffle, per-group quantile read-off on the aggregated
    histogram (|langs| x |distinct lengths| rows — corpus-size
    independent)."""
    import math

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], sort=False).size().reset_index(name="cnt")
        g["hb"] = (g["n_chars"] % 16).astype(np.int32)
        return g

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "n_chars"], sort=False, as_index=False)[
            "cnt"
        ].sum()

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values(["lang", "n_chars"])
    )
    out_rows = []
    for lang, g in hist.groupby("lang", sort=True):
        values = g["n_chars"].to_numpy()
        cum = np.cumsum(g["cnt"].to_numpy())
        n = int(cum[-1])
        row = {"lang": lang}
        for name, p in (("p50_chars", 0.5), ("p90_chars", 0.9)):
            idx = max(0, math.ceil(p * n) - 1)  # DuckDB quantile_disc
            row[name] = int(values[np.searchsorted(cum, idx + 1)])
        out_rows.append(row)
    out = pd.DataFrame(out_rows)
    out["p50_chars"] = out["p50_chars"].astype("int64")
    out["p90_chars"] = out["p90_chars"].astype("int64")
    return out


def _term_counts(
    ds: ray.data.Dataset,
    *,
    lower: bool = False,
    distinct_per_doc: bool = False,
    bucket_post=None,
) -> pd.DataFrame:
    """Distributed corpus term counts — the shared combiner +
    term-bucket machinery under ``docs_top_terms`` (raw term
    frequency), ``docs_lm_buckets`` (lowered vocab counts) and
    ``docs_tfidf_terms`` (per-doc-distinct document frequency).

    Polars explode+group_by inside each batch collapses the word
    stream to per-batch (term, n) partials; the shuffle is keyed on a
    vectorized TERM BUCKET (never the raw term — per-group Python cost
    at real term cardinality); each bucket merges vectorized (a term's
    global count lives entirely in one bucket) and optionally applies
    ``bucket_post`` (e.g. per-bucket top-k) so the driver sees bounded
    rows. Words are maximal runs of non-ASCII-whitespace (the SQL
    oracle's regex split — engine-independent, unlike locale split)."""
    import polars as pl

    from neuscraper_ray.functions.joins import str_buckets

    def partial(t: pa.Table) -> pa.Table:
        pf = pl.from_arrow(t.select(["text"]))
        w = (
            pf.select(
                pl.col("text").str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("w")
            )
            .with_row_index("i")
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
        )
        if lower:
            w = w.with_columns(pl.col("w").str.to_lowercase())
        if distinct_per_doc:
            w = w.unique(["i", "w"])
        agg = w.group_by("w").agg(pl.len().alias("n")).rename({"w": "term"})
        out = agg.to_arrow().cast(
            pa.schema([("term", pa.string()), ("n", pa.int64())])
        )
        hb = str_buckets(out.column("term"), NUM_BUCKETS)
        return out.append_column("hb", pa.array(hb, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", sort=False, as_index=False)["n"].sum()
        return bucket_post(g) if bucket_post is not None else g

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )


def docs_top_terms(sf_dir: str):
    """Corpus-wide term frequency, top 20 (count desc, term asc) — the
    combiner + per-bucket-top-k pattern end-to-end (``_term_counts``):
    the global top-k is a subset of the union of per-bucket top-ks, so
    the driver sees k x num_buckets rows."""
    k = 20

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
        return g.head(k)

    cand = _term_counts(
        _read(sf_dir, "documents", ["text"]), bucket_post=bucket_topk
    )
    cand = cand.sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
    return cand.head(k).reset_index(drop=True)


def docs_vocab_stats(sf_dir: str):
    """Corpus vocabulary statistics — distinct-term count, hapax count
    (terms seen once; the Heaps-law tail that dominates real web
    vocab), total token count and type/token ratio in ppm. The
    report-card numbers a curation run prints before training.

    Scale shape: the ``_term_counts`` combiner + term-bucket merge,
    with each bucket COLLAPSED to one (n_terms, n_hapax, total_tokens)
    partial row inside the bucket task — the driver folds
    num_buckets rows, never the vocabulary (a 10^9-term web vocab
    never leaves the cluster)."""

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_terms": [len(g)],
                "n_hapax": [int((g["n"] == 1).sum())],
                "total_tokens": [int(g["n"].sum())],
            }
        )

    parts = _term_counts(
        _read(sf_dir, "documents", ["text"]), lower=True, bucket_post=bucket_stats
    )
    n_terms = int(parts["n_terms"].sum())
    n_hapax = int(parts["n_hapax"].sum())
    total = int(parts["total_tokens"].sum())
    return pd.DataFrame(
        {
            "n_terms": pd.Series([n_terms], dtype="int64"),
            "n_hapax": pd.Series([n_hapax], dtype="int64"),
            "total_tokens": pd.Series([total], dtype="int64"),
            "ttr_ppm": pd.Series([(n_terms * 1_000_000) // total], dtype="int64"),
        }
    )


def docs_bigram_pmi(sf_dir: str):
    """Top-20 adjacent-word bigrams by pointwise mutual information —
    the collocation detector of a corpus report (and the phrase-mining
    prep for tokenizer training). Integer-exact score
    ``(n_xy * 1e9) // (n_x * n_y)`` is rank-equivalent to PMI for a
    fixed corpus (the log and the constant N factor are monotone), so
    DuckDB reproduces ranking and tie-break (score desc, x asc, y asc)
    value-for-value; int64-safe while n_xy < 9.2e9 (the SQL twin uses
    HUGEINT throughout).

    Scale shape: pass 1 builds unigram counts with the
    ``_term_counts`` machinery and broadcasts them once via ray.put
    (sharded broadcast at web vocab, as in docs_lm_buckets); pass 2 is
    a per-batch polars bigram combiner (explode + shift-over-doc, no
    per-row Python), shuffled on a vectorized BIGRAM bucket; each
    bucket merges, applies the global min-count filter (a bigram's
    global count lives entirely in one bucket), scores against the
    broadcast unigrams and emits only its own top-k. Driver sees
    k x num_buckets rows."""
    import polars as pl

    from neuscraper_ray.functions.joins import str_buckets

    k = 20
    min_count = 5
    ds = _read(sf_dir, "documents", ["text"])

    uni = _term_counts(ds, lower=True)
    uni_ref = ray.put(uni.rename(columns={"term": "term", "n": "n_uni"}))

    def partial(t: pa.Table) -> pa.Table:
        pf = pl.from_arrow(t.select(["text"]))
        ex = (
            pf.select(
                pl.col("text").str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("w")
            )
            .with_row_index("i")
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
            .with_columns(pl.col("w").str.to_lowercase())
        )
        bg = (
            ex.with_columns(pl.col("w").shift(-1).over("i").alias("y"))
            .drop_nulls("y")
            .rename({"w": "x"})
            .group_by(["x", "y"])
            .agg(pl.len().alias("n_xy"))
            .with_columns((pl.col("x") + "\x1f" + pl.col("y")).alias("bk"))
        )
        out = bg.to_arrow().cast(
            pa.schema(
                [
                    ("x", pa.string()),
                    ("y", pa.string()),
                    ("n_xy", pa.int64()),
                    ("bk", pa.string()),
                ]
            )
        )
        hb = str_buckets(out.column("bk"), NUM_BUCKETS)
        return out.drop_columns(["bk"]).append_column(
            "hb", pa.array(hb, pa.int32())
        )

    def bucket_score(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["x", "y"], sort=False, as_index=False)["n_xy"].sum()
        g = g[g["n_xy"] >= min_count]
        u = ray.get(uni_ref)
        g = g.merge(u.rename(columns={"term": "x", "n_uni": "n_x"}), on="x")
        g = g.merge(u.rename(columns={"term": "y", "n_uni": "n_y"}), on="y")
        g["score"] = (g["n_xy"] * 1_000_000_000) // (g["n_x"] * g["n_y"])
        g = g.sort_values(
            ["score", "x", "y"], ascending=[False, True, True], kind="mergesort"
        )
        return g[["x", "y", "n_xy", "score"]].head(k)

    cand = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(bucket_score, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["score", "x", "y"], ascending=[False, True, True], kind="mergesort"
    )
    return cand.head(k).reset_index(drop=True)


def _bigram_lm_score_sharded(ds, model_ds):
    """Web-vocab arm of ``docs_bigram_lm_score``: the trained model is
    never collected or broadcast. Model rows re-key on a vectorized
    x-term bucket; corpus (doc_id, x, y) pair rows (plus one sentinel
    per doc so 0-pair docs survive) shuffle to the SAME buckets — x is
    the conditioning term for both the unigram denominator and the
    bigram numerator, so one bucket co-locates everything a pair
    needs; scoring joins run vectorized in-bucket; per-doc partial
    (count, sum) rows then fold on a coarse doc-id bucket. Two keyed
    exchanges, both coarse, text never moves past the tokenize."""
    import polars as pl

    from neuscraper_ray.functions.joins import _bucket_i64, str_buckets

    def model_rows(t: pa.Table) -> pa.Table:
        xb = str_buckets(t.column("x"), NUM_BUCKETS)
        return pa.table(
            {
                "doc_id": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                "x": t.column("x").cast(pa.string()),
                "y": t.column("y").cast(pa.string()),
                "n_xy": t.column("n_xy").cast(pa.int64()),
                "xb": pa.array(xb, pa.int32()),
            }
        )

    def pair_rows(t: pa.Table) -> pa.Table:
        pf = pl.from_arrow(t.select(["doc_id", "text"]))
        ex = (
            pf.select(
                "doc_id",
                pl.col("text").str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("w"),
            )
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
            .with_columns(pl.col("w").str.to_lowercase())
        )
        pairs = (
            ex.with_columns(pl.col("w").shift(-1).over("doc_id").alias("y"))
            .drop_nulls("y")
            .rename({"w": "x"})
            .select(["doc_id", "x", "y"])
        )
        out = pairs.to_arrow().cast(
            pa.schema(
                [("doc_id", pa.int64()), ("x", pa.string()), ("y", pa.string())]
            )
        )
        xb = str_buckets(out.column("x"), NUM_BUCKETS)
        out = out.append_column(
            "n_xy", pa.array(np.full(out.num_rows, -1, dtype=np.int64))
        ).append_column("xb", pa.array(xb, pa.int32()))
        n = t.num_rows
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        sent = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "x": pa.array([""] * n, pa.string()),
                "y": pa.array([""] * n, pa.string()),
                "n_xy": pa.array(np.full(n, -2, dtype=np.int64)),
                "xb": pa.array(_bucket_i64(ids, NUM_BUCKETS), pa.int32()),
            }
        )
        return pa.concat_tables([out, sent])

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        model = df[df["doc_id"] < 0]
        uni = model.loc[model["y"] == "", ["x", "n_xy"]].rename(
            columns={"n_xy": "n_x"}
        )
        bg = model[model["y"] != ""][["x", "y", "n_xy"]]
        pr = df[(df["doc_id"] >= 0) & (df["n_xy"] == -1)][["doc_id", "x", "y"]]
        j = pr.merge(bg, on=["x", "y"]).merge(uni, on="x")
        j["cond"] = (j["n_xy"].to_numpy() * 1_000_000) // j["n_x"].to_numpy()
        part = j.groupby("doc_id", sort=False, as_index=False).agg(
            npair=("cond", "size"), s=("cond", "sum")
        )
        sent = df.loc[df["n_xy"] == -2, ["doc_id"]].assign(npair=0, s=0)
        out = pd.concat([part, sent], ignore_index=True)
        out["db"] = _bucket_i64(out["doc_id"].to_numpy(), NUM_BUCKETS)
        return out

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False, as_index=False).agg(
            n_pairs=("npair", "sum"), s=("s", "sum")
        )
        npv = g["n_pairs"].to_numpy()
        g["lm_ppm"] = np.where(npv > 0, g["s"].to_numpy() // np.maximum(npv, 1), 0)
        return g[["doc_id", "n_pairs", "lm_ppm"]]

    both = ds.map_batches(pair_rows, batch_format="pyarrow").union(
        model_ds.map_batches(model_rows, batch_format="pyarrow")
    )
    return (
        both.groupby("xb")
        .map_groups(score_bucket, batch_format="pandas")
        .groupby("db")
        .map_groups(fold, batch_format="pandas")
    )


LM_BROADCAST_VOCAB_LIMIT = 5_000_000
"""At or below this many (x, y, n_xy) model rows the trained LM table
ships once via ``ray.put`` (~200 MB ceiling: one copy per node) and
scoring is a zero-shuffle vectorized join per batch. Above it — web-
scale bigram vocab is billions of rows, multi-GB per worker if
broadcast — the model is never collected: model rows and corpus
(doc, x, y) pair rows co-partition on the SAME vectorized x-term
bucket, score in-bucket, and per-doc partial sums fold on a coarse
doc-id bucket. Both paths are asserted value-identical in tests."""


def docs_bigram_lm_score(
    sf_dir: str, broadcast_vocab_limit: int = LM_BROADCAST_VOCAB_LIMIT
):
    """KenLM-style n-gram LM scoring of each document (the CCNet /
    north-star perplexity gate, one order up from the unigram LM in
    ``docs_lm_buckets``): train a bigram LM on the corpus itself, then
    score every doc by its mean conditional bigram probability
    ``p(y|x) = n_xy / n_x`` in ppm — integer-exact fixed point
    (per-pair ``(n_xy * 1e6) // n_x``, per-doc floor-mean), so DuckDB
    reproduces it value-for-value. Rank-equivalent to negative
    cross-entropy for comparison purposes (the log is monotone per
    pair; the arithmetic mean of probs is the standard integer-exact
    stand-in used across this repo's scoring ops). Corpus-trained, so
    every doc bigram is in-vocabulary — no backoff path needed; with a
    held-out LM you'd left-join and add-one the misses.

    Scale shape: ONE fused count pass — each batch tokenizes once and
    emits BOTH unigram partials (as ``y=""`` rows; a token is a
    non-empty non-whitespace run, so the empty ``y`` is an unambiguous
    unigram tag) and bigram partials into the same (x, y, n_xy) table,
    shuffled on a vectorized (x,y) bucket and merged in-bucket. Below
    ``broadcast_vocab_limit`` model rows the table is collected once,
    split driver-side and broadcast; pass 2 is then one vectorized
    polars join per batch, zero shuffle. ABOVE the limit the model
    stays distributed: model rows re-key on an x-term bucket, corpus
    pair rows shuffle to the same buckets (x is the conditioning term
    for both the unigram and bigram lookup, so one bucket co-locates
    everything a pair needs), scoring joins run in-bucket, and per-doc
    partials fold on a coarse doc-id bucket — the honest two-exchange
    cost when the LM itself is cluster-sized. The unigram slice is
    count-identical to ``_term_counts(lower=True)`` (same explode,
    same group; the oracle conformance test pins the resulting ``n_x``
    values end-to-end). int64-safe while n_xy < 9.2e12 (the SQL twin
    uses HUGEINT throughout)."""
    import polars as pl

    from neuscraper_ray.functions.joins import str_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    # ---- pass 1 (fused): unigram + bigram counts in one tokenize
    def counts_partial(t: pa.Table) -> pa.Table:
        pf = pl.from_arrow(t.select(["text"]))
        ex = (
            pf.select(
                pl.col("text").str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("w")
            )
            .with_row_index("i")
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
            .with_columns(pl.col("w").str.to_lowercase())
        )
        uni = (
            ex.group_by("w")
            .agg(pl.len().alias("n_xy"))
            .rename({"w": "x"})
            .with_columns(pl.lit("").alias("y"))
            .select(["x", "y", "n_xy"])
        )
        bg = (
            ex.with_columns(pl.col("w").shift(-1).over("i").alias("y"))
            .drop_nulls("y")
            .rename({"w": "x"})
            .group_by(["x", "y"])
            .agg(pl.len().alias("n_xy"))
            .select(["x", "y", "n_xy"])
        )
        both = pl.concat([uni, bg]).with_columns(
            (pl.col("x") + "\x1f" + pl.col("y")).alias("bk")
        )
        out = both.to_arrow().cast(
            pa.schema(
                [
                    ("x", pa.string()),
                    ("y", pa.string()),
                    ("n_xy", pa.int64()),
                    ("bk", pa.string()),
                ]
            )
        )
        hb = str_buckets(out.column("bk"), NUM_BUCKETS)
        return out.drop_columns(["bk"]).append_column(
            "hb", pa.array(hb, pa.int32())
        )

    def counts_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["x", "y"], sort=False, as_index=False)["n_xy"].sum()

    model_ds = (
        ds.map_batches(counts_partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(counts_merge, batch_format="pandas")
        .materialize()
    )
    if model_ds.count() > broadcast_vocab_limit:
        return _bigram_lm_score_sharded(ds, model_ds)

    model = model_ds.to_pandas()  # LM table (uni + bigram), collected once
    is_uni = (model["y"] == "").to_numpy()
    uni_ref = ray.put(
        pl.DataFrame(
            {"x": model["x"][is_uni], "n_x": model["n_xy"][is_uni]}
        )
    )
    bg_ref = ray.put(pl.from_pandas(model[~is_uni][["x", "y", "n_xy"]]))

    # ---- pass 3: per-batch scoring against the broadcast LM
    def score_batch(t: pa.Table) -> pa.Table:
        bgdf = ray.get(bg_ref)
        unidf = ray.get(uni_ref)
        n = t.num_rows
        pf = pl.from_arrow(t.select(["text"]))
        ex = (
            pf.select(
                pl.col("text").str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("w")
            )
            .with_row_index("i")
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
            .with_columns(pl.col("w").str.to_lowercase())
        )
        agg = (
            ex.with_columns(pl.col("w").shift(-1).over("i").alias("y"))
            .drop_nulls("y")
            .rename({"w": "x"})
            .join(bgdf, on=["x", "y"], how="left")
            .join(unidf, on="x", how="left")
            .with_columns(
                ((pl.col("n_xy") * 1_000_000) // pl.col("n_x")).alias("cond")
            )
            .group_by("i")
            .agg(pl.len().alias("np"), pl.col("cond").sum().alias("s"))
        )
        n_pairs = np.zeros(n, dtype=np.int64)
        s = np.zeros(n, dtype=np.int64)
        ii = agg["i"].to_numpy().astype(np.int64)
        n_pairs[ii] = agg["np"].to_numpy()
        s[ii] = agg["s"].to_numpy()
        lm_ppm = np.where(n_pairs > 0, s // np.maximum(n_pairs, 1), 0)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_pairs": pa.array(n_pairs),
                "lm_ppm": pa.array(lm_ppm),
            }
        )

    return ds.map_batches(score_batch, batch_format="pyarrow")


def docs_chunk_dedup(sf_dir: str, chunk_words: int = 10):
    """Chunk-level exact deduplication — the scalable approximation of
    ExactSubstr dedup (Lee et al. 2022, arXiv:2107.06499, which dedups
    repeated 50-token spans suffix-array-style): segment each document
    into non-overlapping ``chunk_words``-word chunks, keep only the
    FIRST occurrence of each distinct chunk corpus-wide (first =
    lexicographic min (doc_id, chunk_idx) — deterministic under any
    partitioning and task order), and reassemble the surviving text
    per document. Emits (doc_id, n_chunks, n_kept, text_dedup).

    Scale shape: two keyed exchanges, both on coarse vectorized
    buckets, neither on a high-cardinality key. Stage 1 chunkifies per
    batch (polars explode + int-range-over-doc + group_by join — no
    per-row Python) and emits one sentinel row per doc so 0-chunk docs
    survive to the output. Stage 2 buckets by CHUNK TEXT hash: every
    copy of a chunk lands in one bucket, so the in-bucket
    first-occurrence scan is globally correct; dedup keys on the exact
    text (the hash only routes), so there is no collision caveat vs
    the SQL oracle. Stage 3 buckets by doc id and reassembles kept
    chunks in chunk order with a vectorized in-bucket join. No stage
    holds the corpus; the driver holds nothing."""
    import polars as pl

    from neuscraper_ray.functions.joins import _bucket_i64, str_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunkify(t: pa.Table) -> pa.Table:
        pf = pl.from_arrow(t.select(["doc_id", "text"]))
        ch = (
            pf.select(
                "doc_id",
                pl.col("text").str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("w"),
            )
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
            .with_columns(
                (pl.int_range(0, pl.len()).over("doc_id") // chunk_words).alias(
                    "chunk_idx"
                )
            )
            .group_by(["doc_id", "chunk_idx"], maintain_order=True)
            .agg(pl.col("w").str.join(" ").alias("chunk"))
        )
        out = ch.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("chunk_idx", pa.int64()),
                    ("chunk", pa.string()),
                ]
            )
        )
        hb = str_buckets(out.column("chunk"), NUM_BUCKETS)
        out = out.append_column("hb", pa.array(hb, pa.int32()))
        n = t.num_rows
        sentinel = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "chunk_idx": pa.array(np.full(n, -1, dtype=np.int64)),
                "chunk": pa.array([""] * n, pa.string()),
                "hb": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )
        return pa.concat_tables([out, sentinel])

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        sent = df[df["chunk_idx"] < 0].copy()
        real = df[df["chunk_idx"] >= 0].sort_values(
            ["chunk", "doc_id", "chunk_idx"], kind="mergesort"
        )
        real = real.assign(keep=~real["chunk"].duplicated().to_numpy())
        sent = sent.assign(keep=True)
        out = pd.concat([real, sent], ignore_index=True)
        out["db"] = _bucket_i64(out["doc_id"].to_numpy(), NUM_BUCKETS)
        return out[["doc_id", "chunk_idx", "chunk", "keep", "db"]]

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        pf = pl.from_pandas(df)
        real = pf.filter(pl.col("chunk_idx") >= 0)
        stats = real.group_by("doc_id").agg(
            pl.len().cast(pl.Int64).alias("n_chunks"),
            pl.col("keep").sum().cast(pl.Int64).alias("n_kept"),
        )
        txt = (
            real.filter(pl.col("keep"))
            .sort(["doc_id", "chunk_idx"])
            .group_by("doc_id", maintain_order=True)
            .agg(pl.col("chunk").str.join(" ").alias("text_dedup"))
        )
        out = (
            pf.filter(pl.col("chunk_idx") < 0)
            .select("doc_id")
            .unique()
            .join(stats, on="doc_id", how="left")
            .join(txt, on="doc_id", how="left")
            .with_columns(
                pl.col("n_chunks").fill_null(0),
                pl.col("n_kept").fill_null(0),
                pl.col("text_dedup").fill_null(""),
            )
        )
        return out.to_pandas()

    return (
        ds.map_batches(chunkify, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(mark, batch_format="pandas")
        .groupby("db")
        .map_groups(assemble, batch_format="pandas")
    )


def docs_exactsubstr_dedup(sf_dir: str, k: int = 20):
    """ExactSubstr dedup (Lee et al. 2022, arXiv:2107.06499): remove
    every k-token span whose token sequence already occurred earlier
    in the corpus (first occurrence by (doc_id, win_idx) keeps its
    tokens) and reassemble -> (doc_id, n_tokens, n_removed,
    text_dedup) for every doc. k=20 here (not the paper's 50) so the
    operator fires on the short-doc test corpus; semantics are
    k-independent. The distributed shape — rolling-hash windows, one
    window-hash-bucketed exchange, broadcast-or-bucketed mark apply —
    is documented on :func:`neuscraper_ray.functions.dedup.
    exactsubstr_dedup`; the DuckDB twin
    (``polyhash.sql_exactsubstr_dedup``) computes the identical
    window hashes, so both engines agree bit-for-bit."""
    from neuscraper_ray.functions.dedup import exactsubstr_dedup

    return exactsubstr_dedup(_read(sf_dir, "documents", ["doc_id", "text"]), k=k)


def docs_lm_buckets(sf_dir: str):
    """CCNet-style LM quality bucketing (Wenzek et al. 2020,
    arXiv:1911.00359), with the pretrained KenLM replaced by a
    corpus-derived unigram LM so the whole operator is integer-exact
    and SQL-verifiable: per-doc mean relative token frequency in ppm
    (``(freqsum * 1e6) // (n_tokens * total_tokens)`` — bounded
    [0, 1e6], so the quantile histogram stays corpus-size-independent),
    then head/middle/tail by exact tertiles.

    Scale shape: (1) vocab built with the combiner + crc32-term-bucket
    merge (the top_terms machinery, no top-k) and broadcast via
    ray.put — at 10^9-term web vocab the broadcast swaps for the
    term-bucket co-partition arm IMPLEMENTED in
    ``_bigram_lm_score_sharded`` (same topology, one order down);
    (2) one vectorized polars join per batch scores
    docs; (3) tertiles read off a bounded (value, count) histogram;
    (4) one broadcast-threshold label pass. Scores are materialized
    once (2 int columns) and reused for both the histogram and the
    label pass."""
    import polars as pl

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    # ---- pass 1: corpus vocab (lowered term -> count), distributed merge
    vocab = _term_counts(ds, lower=True)
    total_tokens = int(vocab["n"].sum())
    vocab_ref = ray.put(pl.DataFrame({"term": vocab["term"], "c": vocab["n"]}))

    # ---- pass 2: per-doc score_ppm over the broadcast LM
    def score_batch(t: pa.Table) -> pa.Table:
        vdf = ray.get(vocab_ref)
        n = t.num_rows
        pf = pl.from_arrow(t.select(["text"]))
        agg = (
            pf.select(
                pl.col("text").str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("w")
            )
            .with_row_index("i")
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
            .with_columns(pl.col("w").str.to_lowercase())
            .join(vdf, left_on="w", right_on="term", how="left")
            .group_by("i")
            .agg(pl.len().alias("nw"), pl.col("c").sum().alias("freqsum"))
        )
        nw = np.zeros(n, dtype=np.int64)
        fs = np.zeros(n, dtype=np.int64)
        ii = agg["i"].to_numpy().astype(np.int64)
        nw[ii] = agg["nw"].to_numpy()
        fs[ii] = agg["freqsum"].to_numpy()
        # ppm of mean relative token frequency; int64-safe while
        # freqsum * 1e6 < 2^63 (holds through ~10^12 total tokens; the
        # SQL twin uses HUGEINT throughout)
        denom = np.where(nw > 0, nw * total_tokens, 1)
        score = np.where(nw > 0, (fs * 1_000_000) // denom, 0)
        return pa.table(
            {"doc_id": t.column("doc_id"), "score_ppm": pa.array(score)}
        )

    scores = ds.map_batches(score_batch, batch_format="pyarrow").materialize()

    # ---- pass 3: exact tertiles off the bounded histogram
    import math

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, cnts = np.unique(t.column("score_ppm").to_numpy(), return_counts=True)
        return pa.table(
            {
                "value": vals,
                "cnt": cnts.astype(np.int64),
                "hb": (vals % 16).astype(np.int32),
            }
        )

    def hist_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("value", sort=False, as_index=False)["cnt"].sum()

    hist = (
        scores.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(hist_merge, batch_format="pandas")
        .to_pandas()
        .sort_values("value")
    )
    values = hist["value"].to_numpy()
    cum = np.cumsum(hist["cnt"].to_numpy())
    n_total = int(cum[-1]) if len(cum) else 0
    ts = []
    for p in (1 / 3, 2 / 3):
        idx = max(0, math.ceil(p * n_total) - 1)  # DuckDB quantile_disc
        ts.append(int(values[np.searchsorted(cum, idx + 1)]))
    t_lo, t_hi = ts

    # ---- pass 4: broadcast-threshold labels
    def label(t: pa.Table) -> pa.Table:
        s = t.column("score_ppm").to_numpy()
        lab = np.where(s >= t_hi, "head", np.where(s >= t_lo, "middle", "tail"))
        return t.append_column("lm_bucket", pa.array(lab.astype(object)))

    return scores.map_batches(label, batch_format="pyarrow")


def docs_tfidf_terms(sf_dir: str):
    """Top-3 TF-IDF keywords per document — the keyword-extraction
    operator of a curation report. Integer-exact score
    ``(tf * 1e6) // df`` (rank-equivalent to tf·idf for a fixed
    corpus; no float log so DuckDB reproduces the ranking and its
    term-asc tie-break value-for-value).

    Scale shape: document frequencies are built with the combiner +
    crc32-term-bucket merge and broadcast once via ray.put (sharded
    broadcast at web vocab); scoring + per-doc top-k is one vectorized
    polars pass per batch (sort + rank-over-window, no per-doc Python).
    Zero corpus shuffle."""
    import polars as pl

    k = 3
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    dfreq = _term_counts(ds, lower=True, distinct_per_doc=True)
    df_ref = ray.put(pl.DataFrame({"term": dfreq["term"], "df": dfreq["n"]}))

    def topk_batch(t: pa.Table) -> pa.Table:
        vdf = ray.get(df_ref)
        pf = pl.from_arrow(t.select(["doc_id", "text"]))
        ranked = (
            pf.select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("w"),
            )
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
            .with_columns(pl.col("w").str.to_lowercase().alias("term"))
            .group_by(["doc_id", "term"])
            .agg(pl.len().alias("tf"))
            .join(vdf, on="term", how="left")
            .with_columns(((pl.col("tf") * 1_000_000) // pl.col("df")).alias("score"))
            .sort(["doc_id", "score", "term"], descending=[False, True, False])
            .with_columns(
                pl.int_range(0, pl.len()).over("doc_id").alias("rank")
            )
            .filter(pl.col("rank") < k)
            .with_columns((pl.col("rank") + 1).alias("rank"))
            .select(["doc_id", "rank", "term", "score"])
        )
        return ranked.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("rank", pa.int64()),
                    ("term", pa.string()),
                    ("score", pa.int64()),
                ]
            )
        )

    return ds.map_batches(topk_batch, batch_format="pyarrow")


def embeddings_project(sf_dir: str):
    """Dimensionality reduction by deterministic +-1 sign projection
    (Achlioptas-style, hash-derived signs) in fixed-point integer
    arithmetic — SQL-verified bit-for-bit. Pure map stage, zero
    shuffle; long-format (vec_id, k, comp) output."""
    from neuscraper_ray.functions.ann import project_batch

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ds.map_batches(project_batch, batch_format="pyarrow")


def docs_fingerprint(sf_dir: str):
    """Rolling-hash fingerprint per document (SQL-verified: DuckDB
    reproduces the base-257 mod-2^61-1 fold via list_reduce)."""
    from neuscraper_ray.functions.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"]
    )


# ---------------------------------------------------------------- events


def events_type_agg(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])
    agg = _preagg_sum(ds, ["event_type"], ["value"], count_alias="n_events")
    df = agg.to_pandas().rename(columns={"value": "total_value"})
    df["total_value"] = df["total_value"].round(2)
    df["n_events"] = df["n_events"].astype("int64")
    return df[["event_type", "n_events", "total_value"]]


def events_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "value"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.floor("h")
        return df[["hour", "value"]]

    hours = ds.map_batches(add_hour, batch_format="pandas")
    agg = _preagg_sum(hours, ["hour"], ["value"], count_alias="n_events")
    df = agg.to_pandas().rename(columns={"value": "total_value"})
    df["total_value"] = df["total_value"].round(2)
    df["n_events"] = df["n_events"].astype("int64")
    return df[["hour", "n_events", "total_value"]]


def events_user_sessions(sf_dir: str):
    """Sessionization: a new session starts after a >30-minute gap.

    Streaming-shaped operator (SURVEY §2.10): per-user ordered scan,
    expressed as groupby(user).map_groups over ts-sorted groups. At
    10^12 scale the key would be bucketed (hash(user) % B) with the
    same in-bucket pandas body.
    """
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all events of every user in this bucket: vectorized per-user scan
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new_s = prev.isna() | ((df["ts"] - prev) > pd.Timedelta(minutes=30))
        out = (
            new_s.groupby(df["user_id"], sort=False)
            .sum()
            .rename("n_sessions")
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    return bucketed.groupby("bucket").map_groups(
        sessions_bucket, batch_format="pandas"
    )


def events_rolling_count(sf_dir: str):
    """Sliding window: per event, count of same-user events in the
    last 15 minutes (inclusive RANGE semantics, matching SQL
    ``RANGE BETWEEN INTERVAL 15 MINUTE PRECEDING AND CURRENT ROW``).

    Bucketed sorted scan: per-user ranges are embedded in disjoint
    composite-key intervals so TWO searchsorted calls over the whole
    bucket answer every user's window — no per-event work, no per-user
    Python loop, no state actor.
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        # One vectorized pass over the whole bucket — no per-user Python
        # loop. After sorting by (user, ts), embed each user's events in
        # a disjoint composite-key range key = user_rank*K + ts_rel with
        # K > ts_span + delta, so a single global searchsorted answers
        # every user's window query: a left probe at ts-delta can go at
        # most `delta` below the user's range start, which still lands
        # strictly above the previous user's range end.
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        delta = np.int64(15 * 60 * 1_000_000)
        urank = pd.factorize(df["user_id"].to_numpy())[0].astype(np.int64)
        ts_rel = ts - (ts.min() if len(ts) else 0)
        K = (ts_rel.max() if len(ts) else 0) + delta + 2
        key = urank * K + ts_rel
        left = np.searchsorted(key, key - delta, side="left")
        right = np.searchsorted(key, key, side="right")
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "n_15min": (right - left).astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(windows, batch_format="pandas")
    )


def events_sample(sf_dir: str):
    """Seeded shuffle (O4 parity) + DETERMINISTIC 5% hash sample: keep
    a row iff ``fingerprint(str(event_id)) % 20 == 0``.

    Unlike a seeded ``random_sample`` (engine-specific RNG, rows-only
    checkable), the kept SET is engine-independent — the DuckDB oracle
    reproduces it exactly (``sql_fingerprint(event_id::VARCHAR)``).
    Hash-sampling is also the scale-correct semantics: it streams with
    ZERO shuffle and re-runs pick the same rows, with the gate one
    vectorized ``int_fingerprints`` pass (no per-row digest loop).
    The O4 seeded ``random_shuffle`` operator is exercised in
    ``tests/test_sources_warc.py`` (fixed-seed permutation pinned
    deterministic) instead of here — the kept set is a pure function
    of ``event_id``,
    so an all-to-all bought only for demonstration would be a
    scale-killer at 10^12 rows."""
    from neuscraper_ray.functions.polyhash import int_fingerprints

    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = int_fingerprints(df["event_id"].to_numpy())
        return df[h % 20 == 0]

    return ds.map_batches(keep, batch_format="pandas")


def events_asof_join(sf_dir: str):
    """As-of join (custom operator Ray Data lacks): each purchase event
    matched to the user's most recent view event at-or-before its ts.

    Partitioning assumption (documented per the custom-operator rule):
    both sides co-partition on ``user_id % NUM_BUCKETS``, so every
    (purchase, candidate-view) pair meets inside one bucket; in-bucket
    the match is ONE vectorized ``searchsorted`` over composite
    (user-rank, ts) keys covering every user at once. Emits microsecond-exact gaps so the DuckDB
    ``ASOF JOIN`` oracle agrees bit-for-bit; ties on (user, ts) are
    payload-neutral (we emit the matched ts, not an id)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def asof_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # One vectorized pass: composite key user_rank*K + ts_rel makes
        # each user's views a contiguous sorted range, so a single
        # searchsorted over ALL views answers every purchase's as-of
        # probe; a probe landing outside the buyer's own view range
        # (user with no view at-or-before) is rejected by the user
        # equality check. No per-user Python loop.
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        if not len(df):
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype=np.int64),
                    "view_ts": pd.Series(dtype="datetime64[us]"),
                    "gap_us": pd.Series(dtype=np.int64),
                }
            )
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        ts_i = ts.astype(np.int64)
        urank = pd.factorize(df["user_id"].to_numpy())[0].astype(np.int64)
        ts_rel = ts_i - ts_i.min()
        K = ts_rel.max() + 2
        key = urank * K + ts_rel
        etype = df["event_type"].to_numpy()
        vm = etype == "view"
        bm = etype == "purchase"
        vkey, vts, vuser = key[vm], ts[vm], urank[vm]
        bkey = key[bm]
        ix = np.searchsorted(vkey, bkey, side="right") - 1
        ok = ix >= 0
        ok[ok] = vuser[ix[ok]] == urank[bm][ok]
        matched = vts[ix[ok]]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[bm][ok],
                "view_ts": matched,
                "gap_us": (ts[bm][ok] - matched)
                .astype("timedelta64[us]")
                .astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(asof_bucket, batch_format="pandas")
    )


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


def embeddings_kmeans(sf_dir: str):
    """Distributed k-means over the embeddings table (iterative
    algorithm: per-pass broadcast centroids + per-batch partial sums,
    zero shuffles, driver folds k x n_batches rows per iteration).
    Rows-only: an iterative fixpoint has no SQL oracle; determinism,
    monotone inertia and full assignment coverage are pinned in
    tests/test_functions.py."""
    from neuscraper_ray.functions.cluster import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    cent, _ = kmeans_fit(ds, k=8, iters=5)
    return kmeans_assign(ds, cent).select_columns(["vec_id", "cluster"])


def order_totals_join(sf_dir: str):
    """Large x large co-partitioned hash join (orders x per-order
    lineitem totals), the one join shape broadcast can't cover.

    The many side collapses to per-batch combiner partials (vectorized
    pandas groupby, no shuffle), and the final per-key sum runs INSIDE
    the join's own bucket (``right_prepare``), so the whole
    agg-then-join costs exactly ONE all-to-all exchange and never
    touches ``Dataset.groupby().aggregate()`` on a high-cardinality
    key (per-group Python cost — see CLAUDE.md pitfalls). Quantities
    are cast to int64 pre-sum so Ray and DuckDB agree exactly."""
    import polars as pl

    from neuscraper_ray.functions.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "qty": df["l_quantity"].to_numpy().astype(np.int64),
            }
        )
        return out.groupby("l_orderkey", sort=False, as_index=False)["qty"].sum()

    partials = li.map_batches(combiner, batch_format="pandas")
    joined = hash_join(
        orders,
        partials,
        left_on="o_orderkey",
        right_on="l_orderkey",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64()), ("qty", pa.int64())]),
        right_prepare=lambda rf: rf.group_by("o_orderkey").agg(
            pl.col("qty").sum()
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t["qty"], 100))
        return t.rename_columns(["o_orderkey", "o_custkey", "sum_qty"])

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def q5_region_volume(sf_dir: str):
    """TPC-H-Q5-shape local supplier volume: a SIX-table join
    (customer x orders x lineitem x supplier x nation x region) as two
    co-partitioned big x big hash joins plus broadcast dimensions —
    the multi-way join composition test of the engine. Revenue is
    fixed-point ``round(price*100) * (100 - round(disc*100))`` (1e-4
    dollars, exact int64 on both engines — prices carry 2 decimals so
    the cents rounding is unambiguous).

    Scale shape: region/nation/supplier broadcast once (tiny);
    customer is pre-filtered to the region's nations BEFORE its join
    (the filter commutes through the equijoin c_nationkey =
    s_nationkey); orders is date-pruned AT THE READ; lineitem is
    supplier-filtered and collapsed to per-batch (orderkey, s_nat,
    rev) combiner partials before its join. Exactly TWO all-to-all
    exchanges (orders x customer on custkey, lineitem x that on
    orderkey), then a 25-group aggregate over combiner partials."""
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    rkey = int(region.loc[region["r_name"] == Q5_REGION, "r_regionkey"].iloc[0])
    region_nations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    nation_name = dict(
        zip(nation["n_nationkey"].astype(int), nation["n_name"])
    )
    supp_nation = {
        int(s): int(n)
        for s, n in zip(supp["s_suppkey"], supp["s_nationkey"])
        if int(n) in region_nations
    }
    dims_ref = ray.put((region_nations, nation_name, supp_nation))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= pd.Timestamp(Q5_DATE_LO))
        & (pc.field("o_orderdate") < pd.Timestamp(Q5_DATE_HI)),
    )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cust_prep(df: pd.DataFrame) -> pd.DataFrame:
        nations, _, _ = ray.get(dims_ref)
        df = df[df["c_nationkey"].isin(nations)].copy()
        df["c_nationkey"] = df["c_nationkey"].astype(np.int64)
        return df

    cust_f = cust.map_batches(cust_prep, batch_format="pandas")

    ordercust = hash_join(
        orders,
        cust_f,
        left_on="o_custkey",
        right_on="c_custkey",
        left_schema=pa.schema([("o_custkey", pa.int64()), ("o_orderkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
    )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        _, _, s2n = ray.get(dims_ref)
        s_nat = df["l_suppkey"].map(s2n)
        keep = s_nat.notna().to_numpy()
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy()[keep],
                "s_nat": s_nat.to_numpy()[keep].astype(np.int64),
                "rev_e4": (cents * (100 - dpct))[keep],
            }
        )
        return out.groupby(["l_orderkey", "s_nat"], sort=False, as_index=False)[
            "rev_e4"
        ].sum()

    li_partials = li.map_batches(li_prep, batch_format="pandas")

    joined = hash_join(
        li_partials,
        ordercust,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("s_nat", pa.int64()), ("rev_e4", pa.int64())]
        ),
        right_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("c_nationkey", pa.int64()),
            ]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        _, n2name, _ = ray.get(dims_ref)
        keep = pc.equal(t["s_nat"], t["c_nationkey"])
        t = t.filter(keep)
        nats = t["s_nat"].to_numpy(zero_copy_only=False)
        names = pd.Series(nats).map(n2name)
        part = pd.DataFrame(
            {"n_name": names, "rev": t["rev_e4"].to_numpy(zero_copy_only=False)}
        ).groupby("n_name", sort=False, as_index=False)["rev"].sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    partials = joined.map_batches(finish, batch_format="pyarrow", batch_size=None)
    agg = partials.groupby("n_name").aggregate(Sum("rev", alias_name="revenue_e4"))
    df = agg.to_pandas()
    df["revenue_e4"] = df["revenue_e4"].astype("int64")
    df = df.sort_values(
        ["revenue_e4", "n_name"], ascending=[False, True], kind="mergesort"
    )
    return df[["n_name", "revenue_e4"]].reset_index(drop=True)


Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_SHIP_LO = "1996-01-01"
Q7_SHIP_HI = "1998-01-01"


def q7_volume_shipping(sf_dir: str):
    """TPC-H-Q7-shape volume shipping: revenue flowing BETWEEN two
    nations by (supp_nation, cust_nation, ship year) — the directional
    pair must cross (supplier in one nation, customer in the other,
    both directions reported separately). A new join shape vs Q5: the
    cross-pair predicate is applied AFTER the two big joins, and the
    group key includes a derived time dimension (ship year) carried
    through the lineitem combiner.

    Scale shape: nation/supplier broadcast once; customer projected to
    two int columns, pre-filtered to the two nations and broadcast as
    sorted (custkey -> nationkey) arrays probed by searchsorted inside
    the orders map (the Q3 pattern — a 2-of-25-nations customer slice
    is dimension-sized; if it ever outgrows broadcast, the
    co-partitioned ``hash_join`` on custkey is the tested fallback,
    see ``order_totals_join``); orders NOT date-pruned (Q7 filters on
    ship date, an order can straddle years) but projected to two
    columns; lineitem date-pruned AT THE READ and collapsed to
    per-batch (orderkey, s_nat, year, rev) combiner partials before
    its join. Exactly ONE all-to-all exchange — the final <=
    2x2xyears-group aggregate is fused into the join bucket
    (``post_join``) and finished on the driver over <= buckets x
    groups partial rows."""
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    nation = _read(sf_dir, "nation", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    name2key = dict(zip(nation["n_name"], nation["n_nationkey"].astype(int)))
    ka, kb = name2key[Q7_NATION_A], name2key[Q7_NATION_B]
    pair = {ka, kb}
    supp_nation = {
        int(s): int(n)
        for s, n in zip(supp["s_suppkey"], supp["s_nationkey"])
        if int(n) in pair
    }
    key2name = {ka: Q7_NATION_A, kb: Q7_NATION_B}
    # customer filtered AT THE READ (row-group predicate + distributed
    # scan) so only the 2-of-25-nations slice ever reaches the driver
    cust_pair = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(sorted(pair)),
    ).to_pandas()
    cust_keys = np.sort(cust_pair["c_custkey"].to_numpy().astype(np.int64))
    order_ck = cust_pair.sort_values("c_custkey")
    cust_nats = order_ck["c_nationkey"].to_numpy().astype(np.int64)
    dims_ref = ray.put((pair, supp_nation, key2name, cust_keys, cust_nats))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        _, _, _, ck, cn = ray.get(dims_ref)
        keys = df["o_custkey"].to_numpy().astype(np.int64)
        if len(ck) == 0:
            hit = np.zeros(len(keys), dtype=bool)
            nats = np.empty(0, np.int64)
        else:
            idx = np.minimum(np.searchsorted(ck, keys), len(ck) - 1)
            hit = ck[idx] == keys
            nats = cn[idx[hit]]
        return pd.DataFrame(
            {"o_orderkey": df["o_orderkey"].to_numpy()[hit], "c_nationkey": nats}
        )

    ordercust = orders.map_batches(orders_prep, batch_format="pandas")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pd.Timestamp(Q7_SHIP_LO))
        & (pc.field("l_shipdate") < pd.Timestamp(Q7_SHIP_HI)),
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        _, s2n, _, _, _ = ray.get(dims_ref)
        s_nat = df["l_suppkey"].map(s2n)
        keep = s_nat.notna().to_numpy()
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy()[keep],
                "s_nat": s_nat.to_numpy()[keep].astype(np.int64),
                "l_year": df["l_shipdate"].dt.year.to_numpy()[keep].astype(np.int64),
                "rev_e4": (cents * (100 - dpct))[keep],
            }
        )
        return out.groupby(
            ["l_orderkey", "s_nat", "l_year"], sort=False, as_index=False
        )["rev_e4"].sum()

    li_partials = li.map_batches(li_prep, batch_format="pandas")

    def bucket_finish(j):
        # in-bucket: the DIRECTIONAL cross-pair predicate + the final
        # aggregate collapsed to <= 2x2xyears partial rows per bucket
        import polars as pl

        return (
            j.filter(pl.col("s_nat") != pl.col("c_nationkey"))
            .group_by(["s_nat", "c_nationkey", "l_year"])
            .agg(pl.col("rev_e4").sum())
        )

    partials = hash_join(
        li_partials,
        ordercust,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("s_nat", pa.int64()),
                ("l_year", pa.int64()),
                ("rev_e4", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        post_join=bucket_finish,
    ).to_pandas()
    if partials.empty:  # tiny scales can have no crossing pair in the window
        return pd.DataFrame(
            {
                "supp_nation": pd.Series(dtype=object),
                "cust_nation": pd.Series(dtype=object),
                "l_year": pd.Series(dtype="int64"),
                "revenue_e4": pd.Series(dtype="int64"),
            }
        )
    df = pd.DataFrame(
        {
            "supp_nation": partials["s_nat"].map(key2name),
            "cust_nation": partials["c_nationkey"].map(key2name),
            "l_year": partials["l_year"].astype("int64"),
            "rev_e4": partials["rev_e4"].astype("int64"),
        }
    )
    df = df.groupby(
        ["supp_nation", "cust_nation", "l_year"], sort=False, as_index=False
    )["rev_e4"].sum().rename(columns={"rev_e4": "revenue_e4"})
    df["revenue_e4"] = df["revenue_e4"].astype("int64")
    df["l_year"] = df["l_year"].astype("int64")
    return df[
        ["supp_nation", "cust_nation", "l_year", "revenue_e4"]
    ].sort_values(
        ["supp_nation", "cust_nation", "l_year"], kind="mergesort"
    ).reset_index(drop=True)


Q8_REGION = "ASIA"
Q8_TARGET_NATION = "NATION_7"
Q8_PART_TYPE = "ECONOMY"
Q8_DATE_LO = "1996-01-01"
Q8_DATE_HI = "1998-01-01"


def q8_market_share(sf_dir: str):
    """TPC-H-Q8-shape national market share: within one region's
    customers and one part type, the target nation's suppliers' share
    of revenue per order year — a RATIO of conditional sums per group,
    the shape Q5/Q7 don't cover. Share is fixed-point ppm (int64 exact
    on both engines).

    Scale shape: part filtered to the type and broadcast as a partkey
    set (the repo's Q17/Q19 disjunctive-pushdown pattern); supplier ->
    nation broadcast; customer pre-filtered to the region's nations
    and broadcast as a sorted custkey array probed by searchsorted in
    the orders map (the Q3 pattern — hash_join on custkey is the
    tested fallback if the slice outgrows broadcast); orders
    date-pruned AT THE READ; lineitem collapsed to per-batch
    (orderkey, is_target, rev) partials before its join. ONE
    all-to-all exchange — the per-year (rev, target_rev) aggregate is
    fused into the join bucket (``post_join``) and finished on the
    driver; the ratio is computed once per year at the end, never per
    row."""
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()

    rkey = int(region.loc[region["r_name"] == Q8_REGION, "r_regionkey"].iloc[0])
    region_nations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    target_key = int(
        nation.loc[nation["n_name"] == Q8_TARGET_NATION, "n_nationkey"].iloc[0]
    )
    target_supps = set(
        supp.loc[supp["s_nationkey"] == target_key, "s_suppkey"].astype(int)
    )
    type_parts = set(part.loc[part["p_type"] == Q8_PART_TYPE, "p_partkey"].astype(int))
    # customer filtered AT THE READ — only the region's slice reaches
    # the driver, never the full table
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=pc.field("c_nationkey").isin(sorted(region_nations)),
    ).to_pandas()
    region_custs = np.sort(cust["c_custkey"].to_numpy().astype(np.int64))
    dims_ref = ray.put((region_custs, target_supps, type_parts))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= pd.Timestamp(Q8_DATE_LO))
        & (pc.field("o_orderdate") < pd.Timestamp(Q8_DATE_HI)),
    )

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        # semi-join against the broadcast region-customer key array
        # (the Q3 pattern; hash_join on custkey is the tested fallback
        # if a region's customer slice ever outgrows broadcast)
        rc, _, _ = ray.get(dims_ref)
        keys = df["o_custkey"].to_numpy().astype(np.int64)
        if len(rc) == 0:
            hit = np.zeros(len(keys), dtype=bool)
        else:
            idx = np.minimum(np.searchsorted(rc, keys), len(rc) - 1)
            hit = rc[idx] == keys
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy()[hit],
                "o_year": df["o_orderdate"].dt.year.to_numpy()[hit].astype(
                    np.int64
                ),
            }
        )

    ordercust = orders.map_batches(orders_prep, batch_format="pandas")

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        _, tsupp, tparts = ray.get(dims_ref)
        keep = df["l_partkey"].isin(tparts).to_numpy()
        df = df[keep]
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "is_target": df["l_suppkey"].isin(tsupp).to_numpy().astype(np.int64),
                "rev_e4": cents * (100 - dpct),
            }
        )
        # vectorized conditional sum (no Python lambda in the hot path)
        t = (
            out.assign(trev=out["rev_e4"] * out["is_target"])
            .groupby("l_orderkey", sort=False, as_index=False)[["rev_e4", "trev"]]
            .sum()
        )
        return t.rename(columns={"trev": "target_e4"})

    li_partials = li.map_batches(li_prep, batch_format="pandas")

    def bucket_finish(j):
        # in-bucket final aggregate: <= years partial rows per bucket
        import polars as pl

        return j.group_by("o_year").agg(
            pl.col("rev_e4").sum(), pl.col("target_e4").sum()
        )

    partials = hash_join(
        li_partials,
        ordercust,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("rev_e4", pa.int64()),
                ("target_e4", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_year", pa.int64())]
        ),
        post_join=bucket_finish,
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame(
            {
                "o_year": pd.Series(dtype="int64"),
                "revenue_e4": pd.Series(dtype="int64"),
                "target_revenue_e4": pd.Series(dtype="int64"),
                "mkt_share_ppm": pd.Series(dtype="int64"),
            }
        )
    df = (
        partials.groupby("o_year", sort=False, as_index=False)[
            ["rev_e4", "target_e4"]
        ]
        .sum()
        .rename(columns={"rev_e4": "revenue_e4", "target_e4": "target_revenue_e4"})
    )
    df["o_year"] = df["o_year"].astype("int64")
    df["revenue_e4"] = df["revenue_e4"].astype("int64")
    df["target_revenue_e4"] = df["target_revenue_e4"].astype("int64")
    df["mkt_share_ppm"] = (
        df["target_revenue_e4"].astype(object) * 1_000_000
        // df["revenue_e4"].astype(object)
    ).astype("int64")
    return df[
        ["o_year", "revenue_e4", "target_revenue_e4", "mkt_share_ppm"]
    ].sort_values("o_year", kind="mergesort").reset_index(drop=True)


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-03-15"


def q3_shipping_priority(sf_dir: str):
    """TPC-H-Q3-shape shipping priority: top-10 undelivered orders by
    revenue for one market segment. The high-cardinality-group
    pitfall solved the engine's way: the per-order revenue sum is
    finished INSIDE the join's own bucket (``right_prepare``), never
    a ``Dataset.groupby`` over orderkeys, and the top-10 is a partial
    per-block top-10 (global top-k is a subset of the union of
    per-block top-ks for ANY partitioning) merged on the driver.
    Revenue is the same fixed-point 1e-4-dollar int64 as Q5; the
    (revenue desc, o_orderdate asc, o_orderkey asc) order is total,
    so the top-10 set is unique and the SQL oracle reproduces it
    row-for-row. One all-to-all exchange end-to-end."""
    import pyarrow.compute as pc
    import polars as pl

    from neuscraper_ray.functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_keys = set(
        cust.loc[cust["c_mktsegment"] == Q3_SEGMENT, "c_custkey"].astype(int)
    )
    seg_ref = ray.put(seg_keys)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < pd.Timestamp(Q3_DATE),
    )

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(seg_ref)
        df = df[df["o_custkey"].isin(keys)]
        return df[["o_orderkey", "o_orderdate", "o_orderpriority"]]

    orders_f = orders.map_batches(orders_prep, batch_format="pandas")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > pd.Timestamp(Q3_DATE),
    )

    def li_combiner(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "revenue_e4": cents * (100 - dpct),
            }
        )
        return out.groupby("l_orderkey", sort=False, as_index=False)[
            "revenue_e4"
        ].sum()

    li_partials = li.map_batches(li_combiner, batch_format="pandas")

    joined = hash_join(
        orders_f,
        li_partials,
        left_on="o_orderkey",
        right_on="l_orderkey",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue_e4", pa.int64())]
        ),
        right_prepare=lambda rf: rf.group_by("o_orderkey").agg(
            pl.col("revenue_e4").sum()
        ),
    )

    k = 10

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["revenue_e4", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        return df.head(k)

    cand = joined.map_batches(
        block_topk, batch_format="pandas", batch_size=None
    ).to_pandas()
    cand = cand.sort_values(
        ["revenue_e4", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True],
        kind="mergesort",
    ).head(k)
    return cand[
        ["o_orderkey", "revenue_e4", "o_orderdate", "o_orderpriority"]
    ].reset_index(drop=True)


def events_distinct_users_hll(sf_dir: str):
    """Approximate distinct-user count via a mergeable HyperLogLog
    sketch (p=14, ~0.8% expected error): per-batch 16 KiB register
    partials, merged by elementwise max — the user_id column never
    leaves the tasks. Rows-only by construction (approximate, no SQL
    value oracle); the error bound vs exact distinct is pinned in
    tests/test_functions.py."""
    from neuscraper_ray.functions.sketch import distinct_count_hll

    ds = _read(sf_dir, "events", ["user_id"])
    est, _ = distinct_count_hll(ds, "user_id")
    return pd.DataFrame({"estimate": np.asarray([est], dtype=np.int64)})


def events_distinct_types(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


def events_top_users(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "value"])
    agg = _preagg_sum(ds, ["user_id"], ["value"])
    top = (
        agg.sort(["value", "user_id"], descending=[True, False]).limit(10).to_pandas()
    )
    top["total_value"] = top["value"].round(2)
    top["user_id"] = top["user_id"].astype("int64")
    return top[["user_id", "total_value"]]


# ----------------------------------------------------------- tpch-style


Q1_CUTOFF = "1998-09-02"


def q1_pricing(sf_dir: str):
    """TPC-H-Q1-style pricing summary (filter -> partial agg -> groupby)."""
    import pyarrow.compute as pc

    # shipdate cutoff pushed to the read (row-group pruning at scale)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
        filter=pc.field("l_shipdate") <= pd.Timestamp(Q1_CUTOFF),
    )

    def prep(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc,
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    agg = _preagg_sum(
        prepped,
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "disc_price"],
        count_alias="count_order",
    )
    df = agg.to_pandas().rename(
        columns={
            "l_quantity": "sum_qty",
            "l_extendedprice": "sum_base_price",
            "disc_price": "sum_disc_price",
        }
    )
    for c in ["sum_qty", "sum_base_price", "sum_disc_price"]:
        df[c] = df[c].round(2)
    df["count_order"] = df["count_order"].astype("int64")
    return df[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"]
    ]


def segment_order_value(sf_dir: str):
    """orders x customer broadcast hash join (J1) -> per-segment totals.

    customer is the small side: shipped once via ray.put, looked up per
    batch with a pandas map — no shuffle join.
    """
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        df["c_mktsegment"] = df["o_custkey"].map(lookup)
        return df[["c_mktsegment", "o_totalprice"]]

    joined = orders.map_batches(join_batch, batch_format="pandas")
    agg = _preagg_sum(joined, ["c_mktsegment"], ["o_totalprice"], count_alias="n_orders")
    df = agg.to_pandas().rename(columns={"o_totalprice": "total_value"})
    df["total_value"] = df["total_value"].round(2)
    df["n_orders"] = df["n_orders"].astype("int64")
    return df[["c_mktsegment", "n_orders", "total_value"]]


ANTI_JOIN_CUTOFF = "1995-12-01"


def customers_no_orders(sf_dir: str):
    """Anti join (J2): customers with no orders before the cutoff, via a
    broadcast key set built with predicate pushdown at the read.

    The distinct o_custkey set is bounded by customer cardinality, so it
    broadcasts; at larger dimension sizes swap in a Bloom filter."""
    import pyarrow.compute as pc

    early = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderdate") < pd.Timestamp(ANTI_JOIN_CUTOFF),
    )
    def batch_keys(t: pa.Table) -> pa.Table:
        # one list row per batch — never Dataset.unique (one Ray group
        # per distinct value); the driver unions <= n_batches lists
        u = np.unique(t.column("o_custkey").to_numpy())
        return pa.table({"ks": pa.array([u.tolist()], pa.list_(pa.int64()))})

    rows = early.map_batches(batch_keys, batch_format="pyarrow").take_all()
    keys = set(
        np.concatenate([np.asarray(r["ks"], dtype=np.int64) for r in rows]).tolist()
        if rows
        else []
    )
    keys_ref = ray.put(keys)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(keys_ref)
        return df[~df["c_custkey"].isin(k)]

    return cust.map_batches(anti, batch_format="pandas")


def order_line_concat(sf_dir: str):
    """G1 mirror: per-order return-flag string, descending line number,
    no separator — the reference's groupby-concat assembly
    (/root/reference/src/warc/get_text.py:36-37) over TPC-H shapes,
    using the same hash-bucketed map_groups pattern as page assembly."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["l_orderkey"] % NUM_BUCKETS).astype(np.int32)
        return df

    def concat_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # l_linenumber repeats within an order: tiebreak on the value
        # itself so the concat is deterministic on both engines
        df = df.sort_values(
            ["l_orderkey", "l_linenumber", "l_returnflag"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = (
            df.groupby("l_orderkey", sort=False)["l_returnflag"]
            .agg("".join)
            .rename("flags")
            .reset_index()
        )
        return out

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    return bucketed.groupby("bucket").map_groups(concat_bucket, batch_format="pandas")


def lineitem_global_metrics(sf_dir: str):
    """G3 mirror: global counters via partial + final aggregation."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "n_rows": pa.array([len(t)], pa.int64()),
                "total_qty": pa.array([pc.sum(t["l_quantity"]).as_py() or 0.0]),
                "total_revenue": pa.array([pc.sum(disc).as_py() or 0.0]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    row = partials.aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("total_qty", alias_name="total_qty"),
        Sum("total_revenue", alias_name="total_revenue"),
    )
    return pd.DataFrame(
        [
            {
                "n_rows": int(row["n_rows"]),
                "total_qty": round(row["total_qty"], 2),
                "total_revenue": round(row["total_revenue"], 2),
            }
        ]
    )


# ----------------------------------------------- window / join extensions


def orders_rank_in_customer(sf_dir: str):
    """Windowed rank / top-N per group: each customer's 3 highest-value
    orders with their rank (``row_number() OVER (PARTITION BY custkey
    ORDER BY totalprice DESC, orderkey)``).

    Scale shape: ranked-window queries do NOT need the whole partition
    when only the top N survive — a key's global top-3 is a subset of
    the union of batch-local top-3s, so each batch prunes to <= 3 rows
    per key BEFORE the shuffle (the top-k combiner), then a custkey
    bucket co-locates each key's survivors and one vectorized
    sort + cumcount ranks every key in the bucket at once. The shuffle
    moves O(3 x keys-per-batch x batches), never the orders table."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = df[df.groupby("o_custkey", sort=False).cumcount() < 3].copy()
        out["bucket"] = (out["o_custkey"] % NUM_BUCKETS).astype(np.int32)
        return out

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df["rnk"] = (df.groupby("o_custkey", sort=False).cumcount() + 1).astype(
            np.int64
        )
        return df.loc[
            df["rnk"] <= 3, ["o_custkey", "o_orderkey", "o_totalprice", "rnk"]
        ]

    return (
        ds.map_batches(prune, batch_format="pandas")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def events_type_dow_pivot(sf_dir: str):
    """Pivot / unstack: events counted per (type, day-of-week), widened
    to one ``dow_0..dow_6`` column per weekday (Monday = 0, matching
    SQL ``isodow(ts) - 1``).

    Scale shape: the long-form aggregate is a per-batch combiner plus a
    tiny |types| x 7 groupby; the pivot itself runs on the driver over
    that output-sized frame — the corpus is never reshaped."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["dow"] = df["ts"].dt.dayofweek.astype(np.int32)
        return (
            df.groupby(["event_type", "dow"], sort=False)
            .size()
            .reset_index(name="cnt")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "dow"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    types = sorted(agg["event_type"].unique())
    out = pd.DataFrame({"event_type": types})
    for d in range(7):
        sel = agg[agg["dow"] == d].set_index("event_type")["cnt"]
        out[f"dow_{d}"] = (
            out["event_type"].map(sel).fillna(0).astype("int64")
        )
    return out


Q4_START = "1997-01-01"
Q4_END = "1997-04-01"
Q4_LATE_DAYS = 30


def q4_order_priority(sf_dir: str):
    """TPC-H-Q4-shape semi-join: orders in a quarter with at least one
    "late" lineitem (shipped > 30 days after the order date), counted
    per priority — SQL ``WHERE EXISTS (...)``.

    Scale shape: the correlated EXISTS folds into a max-aggregate —
    ``exists(l_shipdate > cutoff)  ==  max(l_shipdate) > cutoff`` — so
    the semi-join becomes per-batch MAX partials on lineitem (combiner:
    one row per orderkey per batch), ONE co-partitioned ``hash_join``
    against the quarter's orders with the max finished in-bucket
    (``right_prepare``), a vectorized lateness compare, and a tiny
    priority count. The quarter filter is pushed into the parquet read;
    lineitem is never shuffled raw."""
    import polars as pl
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    left_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    right_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("max_ship", pa.timestamp("us"))]
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=[f.name for f in left_schema],
        filter=(pc.field("o_orderdate") >= pd.Timestamp(Q4_START))
        & (pc.field("o_orderdate") < pd.Timestamp(Q4_END)),
    )
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def partial_max(t: pa.Table) -> pa.Table:
        g = (
            pl.from_arrow(t)
            .group_by("l_orderkey")
            .agg(pl.col("l_shipdate").max().alias("max_ship"))
        )
        return g.to_arrow().cast(right_schema)

    def finish_max(rf):
        return rf.group_by("o_orderkey").agg(pl.col("max_ship").max())

    joined = hash_join(
        orders,
        line.map_batches(partial_max, batch_format="pyarrow"),
        "o_orderkey",
        "l_orderkey",
        left_schema,
        right_schema,
        right_prepare=finish_max,
    )

    def late_priority_counts(df: pd.DataFrame) -> pd.DataFrame:
        late = df["max_ship"] > (df["o_orderdate"] + pd.Timedelta(days=Q4_LATE_DAYS))
        return (
            df.loc[late]
            .groupby("o_orderpriority", sort=False)
            .size()
            .reset_index(name="order_count")
        )

    agg = (
        joined.map_batches(
            late_priority_counts, batch_format="pandas", batch_size=None
        )
        .groupby("o_orderpriority")
        .aggregate(Sum("order_count", alias_name="order_count"))
        .to_pandas()
    )
    agg["order_count"] = agg["order_count"].astype("int64")
    return agg[["o_orderpriority", "order_count"]]


def q13_customer_distribution(sf_dir: str):
    """TPC-H-Q13-shape LEFT OUTER join + two-level aggregate: customers
    by how many (non-urgent) orders they placed, INCLUDING the
    zero-order customers the inner join would drop.

    Scale shape: per-batch order-count partials (combiner: one row per
    custkey per batch), ONE co-partitioned ``hash_join(how="left")``
    with the count finished in-bucket (``right_prepare``) — the outer
    join's null rows materialize as typed nulls inside the bucket, so
    zero-order customers cost nothing extra — then the distribution is
    a tiny second groupby keyed on the count value (cardinality ~ max
    orders per customer, corpus-size independent)."""
    import polars as pl
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    left_schema = pa.schema([("c_custkey", pa.int64())])
    right_schema = pa.schema([("o_custkey", pa.int64()), ("cnt", pa.int64())])

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") != "1-URGENT",
    )

    def partial_cnt(t: pa.Table) -> pa.Table:
        g = pl.from_arrow(t).group_by("o_custkey").agg(pl.len().alias("cnt"))
        return g.to_arrow().cast(right_schema)

    def finish_cnt(rf):
        return rf.group_by("c_custkey").agg(pl.col("cnt").sum())

    joined = hash_join(
        cust,
        orders.map_batches(partial_cnt, batch_format="pyarrow"),
        "c_custkey",
        "o_custkey",
        left_schema,
        right_schema,
        how="left",
        right_prepare=finish_cnt,
    )

    def dist_partial(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["cnt"].fillna(0).astype(np.int64)
        return (
            df.groupby("n_orders", sort=False).size().reset_index(name="n_customers")
        )

    agg = (
        joined.map_batches(dist_partial, batch_format="pandas", batch_size=None)
        .groupby("n_orders")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .to_pandas()
    )
    agg["n_customers"] = agg["n_customers"].astype("int64")
    return agg[["n_orders", "n_customers"]]


def events_purchase_view_window(sf_dir: str):
    """Range (interval) join: per purchase event, the count of the same
    user's view events in the hour strictly before the purchase —
    ``v.ts >= p.ts - 1h AND v.ts < p.ts`` — zero-view purchases kept.

    Partitioning assumption (documented per the custom-operator rule):
    both event roles co-partition on ``user_id % NUM_BUCKETS``, so every
    (purchase, candidate-view) pair meets inside one bucket. In-bucket
    the interval probe is TWO vectorized ``searchsorted`` calls over
    composite ``user_rank * K + ts_rel`` keys with ``K > span + delta``:
    a lower probe at ``ts - delta`` can dip at most ``delta`` below the
    buyer's range start, still strictly above the previous user's range
    end, so no per-user Python loop and no cross-user bleed (same
    argument as ``events_rolling_count``)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def range_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        if not len(df):
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype=np.int64),
                    "n_views_1h": pd.Series(dtype=np.int64),
                }
            )
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        delta = np.int64(60 * 60 * 1_000_000)
        urank = pd.factorize(df["user_id"].to_numpy())[0].astype(np.int64)
        ts_rel = ts - ts.min()
        K = ts_rel.max() + delta + 2
        key = urank * K + ts_rel
        etype = df["event_type"].to_numpy()
        vm = etype == "view"
        bm = etype == "purchase"
        vkey, bkey = key[vm], key[bm]
        lo = np.searchsorted(vkey, bkey - delta, side="left")
        hi = np.searchsorted(vkey, bkey, side="left")
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[bm],
                "n_views_1h": (hi - lo).astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(range_bucket, batch_format="pandas")
    )


def docs_posting_lists(sf_dir: str):
    """Inverted-index build (the search-engine shape): for the corpus's
    top-20 terms, the document frequency and the full sorted posting
    list, serialized as a comma-joined doc-id string.

    Scale shape: the term vocabulary is first reduced to the top-k via
    the ``docs_top_terms`` combiner (k x num_buckets driver rows), the
    k-term set broadcasts via ``ray.put``, and each batch emits only
    its DISTINCT (term, doc_id) postings for those k terms — a
    vectorized polars explode + semi-join, no per-row Python. One
    term-bucket shuffle co-locates each term's postings; the in-bucket
    assembly sorts once and joins doc ids per term. Output is k rows
    regardless of corpus size; a full-vocabulary index would write
    per-bucket parquet instead of returning (same topology)."""
    import polars as pl

    from neuscraper_ray.functions.joins import str_buckets

    top = docs_top_terms(sf_dir)
    terms_ref = ray.put(set(top["term"].tolist()))

    def postings(t: pa.Table) -> pa.Table:
        keep = pl.Series("term", sorted(ray.get(terms_ref)), dtype=pl.String)
        w = (
            pl.from_arrow(t.select(["doc_id", "text"]))
            .select(
                "doc_id",
                pl.col("text").str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("term"),
            )
            .explode("term", empty_as_null=True)
            .drop_nulls("term")
            .filter(pl.col("term").is_in(keep))
            .unique(["doc_id", "term"])
        )
        out = w.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("term", pa.string())])
        )
        hb = str_buckets(out.column("term"), NUM_BUCKETS)
        return out.append_column("hb", pa.array(hb, pa.int32()))

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["term", "doc_id"], kind="mergesort")
        g = df.groupby("term", sort=False)["doc_id"]
        out = pd.DataFrame(
            {
                "df": g.size().astype("int64"),
                "doc_ids": g.agg(lambda s: ",".join(map(str, s))),
            }
        ).reset_index()
        return out[["term", "df", "doc_ids"]]

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(postings, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(assemble, batch_format="pandas")
    )


def docs_length_deciles(sf_dir: str):
    """Global rank broadcast (the NTILE-by-value shape): every document
    tagged with its corpus-wide length decile — ``decile = #{k in 1..9:
    quantile_disc(k/10) <= n_chars}``.

    Scale shape: the global distribution compresses to a (value, count)
    histogram via the ``docs_token_quantiles`` combiner (corpus-size
    independent), the 9 decile boundaries broadcast via ``ray.put``,
    and the per-doc assignment is one vectorized ``searchsorted`` per
    batch — a streaming second pass with zero shuffle, the same
    two-pass topology as ``docs_lm_buckets``."""
    import math

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_chars", sort=False).size().reset_index(name="cnt")
        g["hb"] = (g["n_chars"] % 16).astype(np.int32)
        return g

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_chars", sort=False, as_index=False)["cnt"].sum()

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("n_chars")
    )
    values = hist["n_chars"].to_numpy()
    cum = np.cumsum(hist["cnt"].to_numpy())
    n = int(cum[-1]) if len(cum) else 0
    bounds = []
    for k in range(1, 10):
        idx = max(0, math.ceil((k / 10) * n) - 1)  # DuckDB quantile_disc
        bounds.append(int(values[np.searchsorted(cum, idx + 1)]))
    bounds_ref = ray.put(np.asarray(bounds, dtype=np.int64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bounds_ref)
        df["decile"] = np.searchsorted(
            b, df["n_chars"].to_numpy(), side="right"
        ).astype(np.int64)
        return df[["doc_id", "n_chars", "decile"]]

    return ds.map_batches(assign, batch_format="pandas")


Q14_START = "1997-06-01"
Q14_END = "1997-07-01"


def q14_promo_revenue(sf_dir: str):
    """TPC-H-Q14-shape promo revenue share: of one ship-month's revenue,
    the fraction from ECONOMY-type parts, in exact ppm (fixed-point
    integer math — no float ROUND ties, per the oracle contract).

    Scale shape: lineitem is month-filtered AT THE READ (row-group
    pruning) and collapsed to per-partkey revenue partials per batch
    (combiner, ``left_prepare`` finishes the sum in-bucket); ONE
    co-partitioned ``hash_join`` attaches ``p_type`` — the part
    dimension rides the same single exchange instead of a broadcast
    (at web scale the part side is itself sharded); the share is a
    two-cell global sum of output-sized join rows."""
    import polars as pl
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    left_schema = pa.schema([("l_partkey", pa.int64()), ("rev_e4", pa.int64())])
    right_schema = pa.schema([("p_partkey", pa.int64()), ("p_type", pa.string())])

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pd.Timestamp(Q14_START))
        & (pc.field("l_shipdate") < pd.Timestamp(Q14_END)),
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def partial_rev(t: pa.Table) -> pa.Table:
        ext = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        g = (
            pl.DataFrame(
                {
                    "l_partkey": t["l_partkey"].to_numpy(),
                    "rev_e4": ext * (100 - disc),
                }
            )
            .group_by("l_partkey")
            .agg(pl.col("rev_e4").sum())
        )
        return g.to_arrow().cast(left_schema)

    def finish_rev(lf):
        return lf.group_by("l_partkey").agg(pl.col("rev_e4").sum())

    joined = hash_join(
        line.map_batches(partial_rev, batch_format="pyarrow"),
        part,
        "l_partkey",
        "p_partkey",
        left_schema,
        right_schema,
        left_prepare=finish_rev,
    )

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        promo = int(df.loc[df["p_type"] == "ECONOMY", "rev_e4"].sum())
        return pd.DataFrame(
            {
                "promo_e4": np.asarray([promo], dtype=np.int64),
                "total_e4": np.asarray([int(df["rev_e4"].sum())], dtype=np.int64),
            }
        )

    row = joined.map_batches(sums, batch_format="pandas", batch_size=None).aggregate(
        Sum("promo_e4", alias_name="promo_e4"),
        Sum("total_e4", alias_name="total_e4"),
    )
    promo, total = int(row["promo_e4"]), int(row["total_e4"])
    return pd.DataFrame(
        [
            {
                "promo_revenue_e4": promo,
                "total_revenue_e4": total,
                "promo_share_ppm": (promo * 1_000_000) // total if total else 0,
            }
        ]
    )


def events_distinct_users_by_type(sf_dir: str):
    """Distributed EXACT grouped distinct count (``count(DISTINCT
    user_id)`` per event type) — the exact counterpart of the HLL
    sketch, for when the answer must be a number, not an estimate.

    Scale shape: each batch first collapses to its distinct (type,
    user) pairs (combiner — repeat-heavy streams shrink immediately),
    pairs co-partition on a splitmix64 USER bucket so a pair's every
    occurrence lands in one bucket, the in-bucket distinct is therefore
    global, and only per-(bucket, type) count partials reach the final
    tiny groupby. The user column never leaves the cluster un-deduped;
    never ``Dataset.unique`` (one Ray group per distinct value)."""
    from neuscraper_ray.functions.sketch import splitmix64

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(["event_type", "user_id"]).copy()
        u["bucket"] = (
            splitmix64(u["user_id"].to_numpy().astype(np.uint64))
            % np.uint64(NUM_BUCKETS)
        ).astype(np.int32)
        return u

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(["event_type", "user_id"])
        return (
            u.groupby("event_type", sort=False).size().reset_index(name="n_users")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    agg["n_users"] = agg["n_users"].astype("int64")
    return agg[["event_type", "n_users"]]


def docs_cms_heavy_hitters(sf_dir: str):
    """Count-min-sketch frequency estimates for the corpus's top-20
    terms — the CMS complement to the exact ``docs_top_terms`` path:
    the sketch costs one ~256 KiB mergeable row per batch instead of a
    term shuffle, at the price of bounded overestimation.

    Rows-only by construction (approximate; no SQL value oracle): the
    CMS overestimate bound and exactness-at-this-scale are pinned in
    tests/test_functions.py. Emits the exact count next to the estimate
    so the sketch quality is self-documenting (the ANN-recall
    pattern)."""
    from neuscraper_ray.functions.sketch import cms_estimate, cms_term_counts

    top = docs_top_terms(sf_dir)
    mat = cms_term_counts(_read(sf_dir, "documents", ["text"]))
    est = cms_estimate(mat, top["term"].tolist())
    return pd.DataFrame(
        {
            "term": top["term"],
            "n_exact": top["n"].astype("int64"),
            "n_cms": est,
        }
    )


def docs_sample_per_lang(sf_dir: str):
    """Take-N-per-key (grouped reservoir-style sample, deterministic):
    5 documents per language, chosen by smallest doc-id fingerprint —
    rerun-stable, engine-independent (the SQL oracle reproduces the
    exact set via the shared polyhash contract), and unbiased because
    the fingerprint is uniform pseudo-random in the id.

    Scale shape: the same top-k combiner prune as
    ``orders_rank_in_customer`` — each batch keeps at most N rows per
    key BEFORE the shuffle (a key's global N-smallest is a subset of
    the union of batch-local N-smallest), one lang-bucket exchange,
    in-bucket vectorized sort + cumcount. The corpus never shuffles."""
    from neuscraper_ray.functions.joins import str_buckets
    from neuscraper_ray.functions.polyhash import int_fingerprints

    N = 5
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            fp=int_fingerprints(df["doc_id"].to_numpy()).astype(np.int64)
        ).sort_values(["lang", "fp", "doc_id"], kind="mergesort")
        out = df[df.groupby("lang", sort=False).cumcount() < N].copy()
        out["bucket"] = str_buckets(out["lang"].tolist(), NUM_BUCKETS)
        return out

    def take_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "fp", "doc_id"], kind="mergesort")
        df["rn"] = (df.groupby("lang", sort=False).cumcount() + 1).astype(np.int64)
        return df.loc[df["rn"] <= N, ["lang", "doc_id", "rn"]]

    return (
        ds.map_batches(prune, batch_format="pandas")
        .groupby("bucket")
        .map_groups(take_bucket, batch_format="pandas")
    )


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


def docs_lang_source_rollup(sf_dir: str):
    """ROLLUP / GROUPING SETS: doc counts and char sums at three grains
    in one result — (lang, source), (lang), and grand total — with
    ``<all>`` sentinels for the rolled-up columns.

    Scale shape: only the FINEST grain is computed distributed (the
    standard combiner + small groupby); the coarser grains derive from
    it on the driver because a rollup is a sum of its children and the
    finest aggregate is output-sized (|langs| x |sources|). One
    exchange total — never one pass per grain over the corpus."""
    agg = _preagg_sum(
        _read(sf_dir, "documents", ["lang", "source", "n_chars"]),
        ["lang", "source"],
        ["n_chars"],
        count_alias="n_docs",
    ).to_pandas()
    agg["n_docs"] = agg["n_docs"].astype("int64")
    agg["sum_chars"] = agg["n_chars"].astype("int64")
    fine = agg[["lang", "source", "n_docs", "sum_chars"]]

    by_lang = (
        fine.groupby("lang", as_index=False)[["n_docs", "sum_chars"]]
        .sum()
        .assign(source="<all>")
    )
    total = pd.DataFrame(
        [
            {
                "lang": "<all>",
                "source": "<all>",
                "n_docs": fine["n_docs"].sum(),
                "sum_chars": fine["sum_chars"].sum(),
            }
        ]
    )
    out = pd.concat([fine, by_lang, total], ignore_index=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out[["lang", "source", "n_docs", "sum_chars"]]


PACK_SEQ_LEN = 512


def docs_pack_sequences(sf_dir: str):
    """Sequence packing for LM training: documents concatenated in
    doc-id order into fixed 512-token training sequences; each doc gets
    its global token start offset and the id of the sequence containing
    its first token — i.e. a DISTRIBUTED ORDERED PREFIX SUM, the one
    aggregation shape nothing else in the engine exercises (every other
    aggregate is order-free).

    Scale shape: doc-id RANGE buckets preserve order both within and
    across buckets (bucket is monotone in doc_id), so the global scan
    decomposes into (A) per-bucket token totals — combiner partials,
    one tiny exchange — whose exclusive cumsum over B values on the
    driver gives each bucket's global starting offset, and (B) one
    in-bucket vectorized cumsum shifted by the broadcast offset. Token
    counting is recomputed in pass B rather than materializing a
    corpus-sized intermediate — recompute-over-materialize is the
    scale-honest trade for a cheap kernel."""
    from neuscraper_ray.functions.textstats import token_count_batch

    n_buckets = NUM_BUCKETS
    max_id = int(_read(sf_dir, "documents", ["doc_id"]).max("doc_id") or 0)
    span = max_id + 1

    def with_counts(t: pa.Table) -> pa.Table:
        nt = token_count_batch(t)
        ids = nt.column("doc_id").to_numpy()
        rb = (ids * n_buckets // span).astype(np.int32)
        return pa.table(
            {
                "doc_id": nt.column("doc_id"),
                "n_tokens": nt.column("n_tokens"),
                "rb": pa.array(rb),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bucket_partial(t: pa.Table) -> pd.DataFrame:
        df = with_counts(t).to_pandas()
        return df.groupby("rb", sort=False, as_index=False)["n_tokens"].sum()

    totals = (
        ds.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("rb")
        .aggregate(Sum("n_tokens", alias_name="total"))
        .to_pandas()
    )
    offsets = np.zeros(n_buckets, dtype=np.int64)
    for _, r in totals.iterrows():
        offsets[int(r["rb"])] = int(r["total"])
    offsets = np.concatenate([[0], np.cumsum(offsets)[:-1]])
    offsets_ref = ray.put(offsets)

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)
        df = df.sort_values("doc_id", kind="mergesort")
        nt = df["n_tokens"].to_numpy().astype(np.int64)
        start = off[int(df["rb"].iloc[0])] + np.cumsum(nt) - nt
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": nt,
                "start_offset": start,
                "seq_id": start // PACK_SEQ_LEN,
            }
        )

    return (
        ds.map_batches(with_counts, batch_format="pyarrow")
        .groupby("rb")
        .map_groups(scan_bucket, batch_format="pandas")
    )


# ------------------------------------------------------------ embeddings


def _ann_query_and_rest(sf_dir: str):
    """(query vector float64, Dataset of the remaining rows).

    The single query row comes via parquet predicate pushdown at the
    read; the exclusion filter is a vectorized Arrow kernel — never
    ``ds.filter(row_fn)`` (one Python call per row)."""
    import pyarrow.compute as pc

    qdf = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") == 0,
    ).to_pandas()
    query = np.asarray(qdf["embedding"].iloc[0], dtype=np.float64)
    rest = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        lambda t: t.filter(pc.not_equal(t["vec_id"], 0)),
        batch_format="pyarrow",
        batch_size=None,
    )
    return query, rest


def ann_topk(sf_dir: str):
    """Brute-force cosine top-10 around vec_id 0 (exact; float64)."""
    from neuscraper_ray.functions.ann import brute_force_topk

    query, rest = _ann_query_and_rest(sf_dir)
    top = brute_force_topk(rest, query, k=10)
    return top[["vec_id"]].astype("int64")


def _with_recall(top: pd.DataFrame, sf_dir: str) -> pd.DataFrame:
    """Attach ``recall_at_10`` (overlap with the exact ``ann_topk``
    result, fixed-point e3) to an approximate top-k frame — the
    quality of the approximation is self-documenting in the query
    output, mirroring the recall assertions in tests/test_functions.py.
    The exact pass is output-sized extra work (one brute-force top-k)."""
    exact = set(ann_topk(sf_dir)["vec_id"])
    hit = sum(1 for v in top["vec_id"] if v in exact)
    top = top.copy()
    top["recall_at_10_e3"] = np.int64(hit * 1000 // max(1, len(exact)))
    return top


def ann_topk_lsh(sf_dir: str):
    """LSH-bucketed approximate top-10 (scale path; rows-only check —
    approximate by design, quality surfaced as a recall_at_10 column)."""
    from neuscraper_ray.functions.ann import lsh_topk

    query, ds = _ann_query_and_rest(sf_dir)
    # hamming-2 multiprobe: the synthetic embeddings are near-random
    # (weak neighbor structure), so recall tracks the probed fraction;
    # clustered real corpora need far fewer probes for the same recall
    top = lsh_topk(ds, query, k=10, multiprobe_hamming=2)
    return _with_recall(top[["vec_id", "cosine"]], sf_dir)


def ann_topk_ivf(sf_dir: str):
    """IVF-probed approximate top-10 (the inverted-list scale path;
    rows-only: approximate by design — recall@10 vs the exact
    ``ann_topk`` is asserted in tests/test_functions.py AND emitted
    as a column of the result)."""
    from neuscraper_ray.functions.ann import ivf_topk

    query, ds = _ann_query_and_rest(sf_dir)
    top = ivf_topk(ds, query, k=10)
    return _with_recall(top[["vec_id", "cosine"]], sf_dir)


def embedding_near_pairs(sf_dir: str):
    """Exact all-pairs cosine >= 0.3 (embedding near-dup detector)."""
    from neuscraper_ray.functions.ann import pairwise_cosine_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = pairwise_cosine_pairs(ds, threshold=0.3).to_pandas()
    pairs = pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pairs[["id_a", "id_b"]].astype("int64")


# ---------------------------------------------------------- curation


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


def docs_contamination_frac(sf_dir: str):
    """Graded benchmark decontamination: per-doc FRACTION of distinct
    shingles found in the benchmark set, exact ppm — thresholds
    separate verbatim eval leakage from incidental phrase overlap.
    Same zero-corpus-shuffle shape as ``docs_decontaminate``
    (distributed distinct-shingle build, broadcast sorted array,
    searchsorted per batch); SQL-verified via the shared polyhash
    contract."""
    from neuscraper_ray.functions.decontam import (
        benchmark_shingle_array,
        contamination_frac,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = benchmark_shingle_array(ds)
    return contamination_frac(ds, ray.put(bench))


def docs_token_budget_mix(sf_dir: str):
    """Exact per-source token-budget selection — the data-recipe
    assembly op (Dolma/LLaMA-style mixing): each source contributes
    its docs in priority order (rule-keep desc, token count desc,
    doc_id asc) until the INCLUSIVE cumulative token count exceeds 40%
    of that source's total tokens — i.e. a distributed
    ``QUALIFY sum(...) OVER (PARTITION BY source ORDER BY ...) <=
    budget``, SQL-verified against the window-function twin. Tokens
    and keep come from the shared quality-filter contract
    (``stages/heuristics``), so the ordering is integer-exact in both
    engines; the budget compare is cross-multiplied (``10*cum <=
    4*total`` — int64-safe to ~9e17 corpus tokens).

    Scale shape (NO per-source group ever materializes — a source is
    5 TB at the target scale): pass 1 reduces the corpus to a
    (source, keep, n_words, id-range-bucket) COUNT histogram via
    combiner partials + one tiny keyed merge; the driver orders the
    per-(source, keep, n_words) groups, cumsums group token totals,
    and classifies each group FULL / NONE / PARTIAL — at most ONE
    partial group per source (cum is monotone, so after the first
    overshoot every later group fails). Only partial-group members
    need a doc_id rank, and their per-range-bucket member counts are
    already in the histogram, so rank = broadcast bucket offset +
    in-bucket position. Pass 2 recomputes the per-doc stats
    (recompute-over-materialize), merges the broadcast decision table,
    and ONE spread keyed exchange emits kept rows — full-group rows on
    a splitmix doc bucket (pass-through), partial-group rows
    co-located per (group, range-bucket) for the rank test. Text
    never moves."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    max_id = int(_read(sf_dir, "documents", ["doc_id"]).max("doc_id") or 0)
    return token_budget_mix(ds, max_id=max_id)


def token_budget_mix(
    ds: ray.data.Dataset, max_id: int | None = None
) -> ray.data.Dataset:
    """The distributed QUALIFY-cumsum engine under
    ``docs_token_budget_mix`` (see its docstring for the scale story);
    takes any Dataset with (doc_id, text, source). Planted edge cases
    (boundary ties, zero-token docs, all-zero sources, repartition
    invariance) are pinned in tests/test_functions.py."""
    from neuscraper_ray.functions.joins import _bucket_i64, str_buckets
    from neuscraper_ray.stages.heuristics import drop_reasons

    RB = 64
    if max_id is None:
        max_id = int(ds.max("doc_id") or 0)
    span = max_id + 1

    def stats(t: pa.Table) -> pd.DataFrame:
        texts = t.column("text").to_pylist()
        reason, nw = drop_reasons(texts)
        ids = t.column("doc_id").to_numpy()
        return pd.DataFrame(
            {
                "doc_id": ids.astype(np.int64),
                "source": t.column("source").to_pandas(),
                "keep": (reason == "").astype(np.int64),
                "nw": nw.astype(np.int64),
                "rb": (ids * RB // span).astype(np.int64),
            }
        )

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        g = (
            stats(t)
            .groupby(["source", "keep", "nw", "rb"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["hb"] = _bucket_i64(g["nw"].to_numpy(), 16)
        return g

    def hist_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["source", "keep", "nw", "rb"], sort=False, as_index=False
        )["n"].sum()

    h = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(hist_merge, batch_format="pandas")
        .to_pandas()
    )

    # driver: group classification (bounded rows: sources x nw values)
    grp = h.groupby(["source", "keep", "nw"], as_index=False)["n"].sum()
    grp["tok"] = grp["n"] * grp["nw"]
    total = grp.groupby("source")["tok"].transform("sum")
    grp = grp.assign(total=total).sort_values(
        ["source", "keep", "nw"], ascending=[True, False, False],
        kind="mergesort",
    )
    cum_after = grp.groupby("source")["tok"].cumsum()
    grp["cum_before"] = cum_after - grp["tok"]
    fits_all = 10 * cum_after <= 4 * grp["total"]
    nw_pos = grp["nw"] > 0
    k_max = np.where(
        nw_pos,
        (4 * grp["total"] - 10 * grp["cum_before"]) // np.maximum(10 * grp["nw"], 1),
        np.where(10 * grp["cum_before"] <= 4 * grp["total"], grp["n"], 0),
    ).astype(np.int64)
    k_max = np.clip(k_max, 0, grp["n"].to_numpy())
    # code: 0 = FULL, 1 = PARTIAL, 2 = NONE
    grp["code"] = np.where(fits_all, 0, np.where(k_max > 0, 1, 2)).astype(
        np.int64
    )
    grp["k_max"] = np.where(grp["code"] == 0, grp["n"], k_max)
    dec = grp[["source", "keep", "nw", "code", "k_max"]].reset_index(drop=True)

    # per-(partial group, rb) exclusive rank offsets from the histogram
    part_keys = dec[dec["code"] == 1][["source", "keep", "nw"]]
    ph = h.merge(part_keys, on=["source", "keep", "nw"])
    ph = ph.sort_values(["source", "keep", "nw", "rb"], kind="mergesort")
    ph["offset"] = ph.groupby(["source", "keep", "nw"])["n"].cumsum() - ph["n"]
    offsets = {
        (r.source, int(r.keep), int(r.nw), int(r.rb)): int(r.offset)
        for r in ph.itertuples()
    }
    dec_ref = ray.put(dec)
    off_ref = ray.put(offsets)
    NBX = NUM_BUCKETS

    def route(t: pa.Table) -> pd.DataFrame:
        df = stats(t).merge(
            ray.get(dec_ref), on=["source", "keep", "nw"], how="left"
        )
        df = df[df["code"] != 2]
        sb = str_buckets(pa.array(df["source"]), 1_000_003).astype(np.int64)
        group_b = _bucket_i64(
            sb * 1315423911 + df["nw"].to_numpy() * 64 + df["rb"].to_numpy(),
            NBX,
        )
        spread_b = _bucket_i64(df["doc_id"].to_numpy(), NBX)
        df["xb"] = np.where(df["code"] == 1, group_b, spread_b).astype(
            np.int32
        )
        return df[["doc_id", "source", "keep", "nw", "rb", "code", "k_max", "xb"]]

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        full = df[df["code"] == 0]
        part = df[df["code"] == 1]
        kept = [full]
        if len(part):
            part = part.sort_values(
                ["source", "keep", "nw", "rb", "doc_id"], kind="mergesort"
            )
            rank_in_rb = part.groupby(
                ["source", "keep", "nw", "rb"], sort=False
            ).cumcount()
            base = np.fromiter(
                (
                    off[(r.source, int(r.keep), int(r.nw), int(r.rb))]
                    for r in part.itertuples()
                ),
                dtype=np.int64,
                count=len(part),
            )
            kept.append(part[(base + rank_in_rb.to_numpy()) < part["k_max"].to_numpy()])
        out = pd.concat(kept, ignore_index=True)
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].astype("int64"),
                "source": out["source"],
                "keep_rule": out["keep"].astype("int64"),
                "n_tokens": out["nw"].astype("int64"),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("xb")
        .map_groups(resolve, batch_format="pandas")
    )


def docs_mix_sources(sf_dir: str):
    """Data mixing with per-source target rates (the multi-corpus
    weighting step of LLM pretraining — e.g. upweight curated sources,
    downsample crawl): source ``srcN`` keeps ``(N % 4 + 1) * 25`` % of
    its documents via the same deterministic polyhash gate as
    ``docs_stratified_sample``. Zero shuffle, streams, rerun-stable on
    any partitioning; rates are a pure function of the row so the gate
    is SQL-reproducible."""
    from neuscraper_ray.functions.polyhash import int_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        srcnum = df["source"].str.slice(3).astype(np.int64).to_numpy()
        rate = (srcnum % 4 + 1) * 25
        h = int_fingerprints(df["doc_id"].to_numpy())
        return df[h % 100 < rate]

    return ds.map_batches(keep, batch_format="pandas")


def docs_quality_percentile(sf_dir: str):
    """Global percent-rank of document length (the
    percentile-normalization step behind "keep the top X% by quality"
    filters), exact ppm: ``(#docs strictly shorter * 1e6) //
    (n - 1)``.

    Scale shape: the corpus-wide distribution compresses to a (value,
    count) histogram (combiner partials, coarse-bucket merge — the
    ``docs_length_deciles`` topology), the cumulative-below table
    broadcasts via ``ray.put``, and assignment is one vectorized
    ``searchsorted`` per batch — a zero-shuffle streaming second
    pass."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_chars", sort=False).size().reset_index(name="cnt")
        g["hb"] = (g["n_chars"] % 16).astype(np.int32)
        return g

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_chars", sort=False, as_index=False)["cnt"].sum()

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("n_chars")
    )
    values = hist["n_chars"].to_numpy()
    cnts = hist["cnt"].to_numpy()
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int64)
    n = int(cnts.sum())
    ctx_ref = ray.put((values, below, max(n - 1, 1)))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        vals, bel, denom = ray.get(ctx_ref)
        ix = np.searchsorted(vals, df["n_chars"].to_numpy())
        df["pct_rank_ppm"] = (bel[ix] * 1_000_000) // denom
        return df[["doc_id", "n_chars", "pct_rank_ppm"]]

    return ds.map_batches(assign, batch_format="pandas")


def docs_semantic_dedup(sf_dir: str):
    """SemDeDup over the embeddings table: k-means coarse clusters,
    then in-cluster cosine near-dup marking (first-wins by vec_id).
    k GROWS with the corpus (the paper's own recipe: hold n/k — the
    in-cluster |c|^2 similarity block — at ~TARGET_CLUSTER rows) so
    the operator's memory bound is corpus-size independent. The
    embeddings are materialized ONCE and shared by the k-means passes
    and the dedup pass. Rows-only: k-means is an iterative fixpoint
    with no SQL oracle; determinism and the no-surviving-near-pair
    invariant are pinned in tests/test_functions.py, and every dup row
    carries dup_sim_ppm (exact cosine to dup_of) so the output is
    self-auditing."""
    import pyarrow.parquet as _pq

    from neuscraper_ray.functions.cluster import kmeans_fit, semantic_dedup

    TARGET_CLUSTER = 512  # ~512^2 float64 sims = 2 MB per group
    n = _pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    k = max(8, n // TARGET_CLUSTER)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    cent, _ = kmeans_fit(emb, k=k, iters=5)
    return semantic_dedup(emb, cent, threshold=0.3)


def q6_forecast_revenue(sf_dir: str):
    """TPC-H-Q6-shape forecast revenue: one global sum over a
    triple-predicate slice — the predicate-pushdown benchmark. All
    three filters (ship year, discount band, quantity cap) ride the
    ``read_parquet`` filter, so only matching row groups leave storage
    and only two columns are materialized; the sum is fixed-point
    ``round(price*100) * round(disc*100)`` (1e-4 dollars) over one
    combiner row per batch. Zero shuffle."""
    import pyarrow.compute as pc

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pd.Timestamp("1997-01-01"))
        & (pc.field("l_shipdate") < pd.Timestamp("1998-01-01"))
        & (pc.field("l_discount") >= 0.05)
        & (pc.field("l_discount") <= 0.07)
        & (pc.field("l_quantity") < 24),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "revenue_e4": np.asarray([int((cents * dpct).sum())], dtype=np.int64),
                "n_items": np.asarray([len(cents)], dtype=np.int64),
            }
        )

    row = li.map_batches(partial, batch_format="pandas").aggregate(
        Sum("revenue_e4", alias_name="revenue_e4"),
        Sum("n_items", alias_name="n_items"),
    )
    row = row or {}
    return pd.DataFrame(
        [
            {
                "revenue_e4": int(row.get("revenue_e4") or 0),
                "n_items": int(row.get("n_items") or 0),
            }
        ]
    )


def orders_monthly_growth(sf_dir: str):
    """Month-over-month revenue growth in exact basis points — the
    time-series widen-at-output shape: per-month totals come from
    combiner partials + a tiny groupby (|months| rows at any corpus
    size), and the LAG window runs on the output-sized frame on the
    driver. DuckDB's integer ``//`` TRUNCATES toward zero on signed
    values while numpy floors, so negative growth months use the
    explicit sign-split truncating division below to match
    bit-for-bit."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "month": df["o_orderdate"].dt.to_period("M").dt.to_timestamp(),
                "total_e2": np.rint(df["o_totalprice"].to_numpy() * 100).astype(
                    np.int64
                ),
            }
        )
        g = out.groupby("month", sort=False, as_index=False).agg(
            total_e2=("total_e2", "sum"), n_orders=("total_e2", "size")
        )
        return g

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("month")
        .aggregate(
            Sum("total_e2", alias_name="total_e2"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )
    df = agg.to_pandas().sort_values("month").reset_index(drop=True)
    prev = df["total_e2"].shift()
    growth = np.zeros(len(df), dtype=np.int64)
    ok = prev.notna().to_numpy()
    num = (
        df["total_e2"].to_numpy()[ok] - prev.to_numpy()[ok].astype(np.int64)
    ) * 10_000
    den = prev.to_numpy()[ok].astype(np.int64)
    growth[ok] = np.sign(num) * (np.abs(num) // den)  # truncate like DuckDB
    df["growth_bp"] = growth
    df["n_orders"] = df["n_orders"].astype("int64")
    df["total_e2"] = df["total_e2"].astype("int64")
    return df[["month", "n_orders", "total_e2", "growth_bp"]]


def events_top_sessions(sf_dir: str):
    """Top-10 longest sessions (30-minute-gap sessionization), the
    composition of the streaming shape with distributed top-k: ONE
    user co-partition, in-bucket vectorized session ids (groupby-shift
    gap flags + cumsum), per-(user, session) aggregate, per-bucket
    top-10 prune, driver fold of 10 x B rows."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def top_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new_s = (prev.isna() | ((df["ts"] - prev) > pd.Timedelta(minutes=30))).astype(
            np.int64
        )
        df["sid"] = new_s.groupby(df["user_id"], sort=False).cumsum()
        g = df.groupby(["user_id", "sid"], sort=False).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        )
        g = g.reset_index()
        g["duration_us"] = (
            (g["session_end"] - g["session_start"]).dt.total_seconds() * 1_000_000
        ).round().astype(np.int64)
        g["n_events"] = g["n_events"].astype(np.int64)
        g = g.sort_values(
            ["duration_us", "user_id", "session_start"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(10)
        return g[["user_id", "session_start", "duration_us", "n_events"]]

    cand = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(top_bucket, batch_format="pandas")
        .to_pandas()
    )
    return (
        cand.sort_values(
            ["duration_us", "user_id", "session_start"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(10)
        .reset_index(drop=True)
    )


def docs_normalize_text(sf_dir: str):
    """Unicode-safe text canonicalization (the normalize-before-hash
    step of every dedup recipe): lowercase, collapse whitespace runs to
    one space, trim — entirely in ``pyarrow.compute`` kernels
    (utf8_lower + replace_substring_regex + utf8_trim_whitespace) on
    zero-copy Arrow buffers: no pandas conversion, no Python strings,
    zero shuffle."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t.column("text"))
        s = pc.replace_substring_regex(s, r"[ \t\n\x0b\x0c\r]+", " ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text_norm": s,
                "n_chars_norm": pc.utf8_length(s),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def events_value_quantiles_sketch(sf_dir: str):
    """One-pass approximate quantiles of the float ``value`` column via
    the mergeable mantissa-grid sketch (``functions/sketch.py`` —
    relative error <= 2^-11 per value). Rows-only: approximate by
    construction; the error bound vs exact ``quantile_disc`` is pinned
    in tests/test_functions.py, and the query emits the exact values
    next to the sketch so quality is visible (the exact side is
    affordable here only because the driver runs at tiny sf; at 100 TB
    only the sketch column exists)."""
    import duckdb

    from neuscraper_ray.functions.sketch import quantile_sketch

    ps = [0.25, 0.5, 0.75, 0.9, 0.99]
    ds = _read(sf_dir, "events", ["value"])
    approx = quantile_sketch(ds, "value", ps)
    exact = duckdb.query(
        f"SELECT quantile_disc(value, {ps}) FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    return pd.DataFrame(
        {
            "p": np.asarray(ps, dtype=np.float64),
            "value_sketch": np.asarray(approx, dtype=np.float64),
            "value_exact": np.asarray(exact, dtype=np.float64),
        }
    )


def docs_dsir_weights(sf_dir: str):
    """DSIR-style hashed-bigram importance weights + deterministic
    resampling against the curated target slice (sources srcN with
    N % 4 == 0). See ``functions/dsir.py`` for the integer-exact
    ratio-of-sums variant and the 100-TB shape (dense 4096-bucket
    partial per batch, broadcast count arrays, zero shuffle)."""
    from neuscraper_ray.functions.dsir import dsir_counts, dsir_score

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def is_target(t: pa.Table):
        src = t.column("source").to_pandas()
        return (src.str.slice(3).astype(np.int64) % 4 == 0).to_numpy()

    tgt, allc = dsir_counts(ds, is_target)
    return dsir_score(ds, ray.put((tgt, allc)))


def events_type_transitions(sf_dir: str):
    """Per-user event-type transition matrix (the Markov-chain /
    behavioral-bigram shape): counts of consecutive (prev_type ->
    next_type) pairs within each user's time-ordered stream, with
    same-timestamp ties broken on event_id so both engines see the
    same order.

    Scale shape: ONE user co-partition; in-bucket the ordering sort
    and the lag are one vectorized groupby-shift; each bucket emits
    |types|^2 count partials; the final groupby folds 25 rows per
    bucket."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def trans_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["event_type"].shift()
        out = pd.DataFrame(
            {"prev_type": prev, "next_type": df["event_type"]}
        ).dropna()
        return (
            out.groupby(["prev_type", "next_type"], sort=False)
            .size()
            .reset_index(name="n")
        )

    agg = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(trans_bucket, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )
    df = agg.to_pandas()
    df["n"] = df["n"].astype("int64")
    return df[["prev_type", "next_type", "n"]]


def events_daily_active_users(sf_dir: str):
    """Daily active users + trailing-7-day distinct users. The
    windowed DISTINCT-count shape: a 7-day rolling distinct is NOT the
    sum of daily distincts, so the standard trick is per-user interval
    union — each (user, day) pair covers report days [day, day+6],
    overlapping intervals of the same user merge (cap each at the
    user's next active day - 1), and the per-day distinct-user count
    is the running sum of +1/-1 interval endpoints.

    Scale shape: ONE user co-partition; in-bucket the (user, day)
    dedup is global and the interval caps come from one vectorized
    groupby-shift; each bucket emits per-day (dau, delta) partials
    (|days| rows — corpus-size independent); the driver cumsums the
    |days|-sized frame."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "day": df["ts"].dt.floor("D"),
            }
        )
        out["bucket"] = (out["user_id"] % NUM_BUCKETS).astype(np.int32)
        return out

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        du = df[["user_id", "day"]].drop_duplicates().sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        dau = du.groupby("day", sort=False).size().reset_index(name="dau")
        nxt = du.groupby("user_id", sort=False)["day"].shift(-1)
        end = du["day"] + pd.Timedelta(days=6)
        capped = np.minimum(
            end.to_numpy(), (nxt - pd.Timedelta(days=1)).fillna(end).to_numpy()
        )
        plus = pd.DataFrame({"day": du["day"].to_numpy(), "delta": 1})
        minus = pd.DataFrame(
            {"day": capped + np.timedelta64(1, "D"), "delta": -1}
        )
        deltas = (
            pd.concat([plus, minus])
            .groupby("day", sort=False, as_index=False)["delta"]
            .sum()
        )
        out = deltas.merge(dau, on="day", how="outer")
        out["delta"] = out["delta"].fillna(0).astype(np.int64)
        out["dau"] = out["dau"].fillna(0).astype(np.int64)
        return out

    agg = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(partials, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("dau", alias_name="dau"), Sum("delta", alias_name="delta"))
    )
    df = agg.to_pandas().sort_values("day").reset_index(drop=True)
    # running interval-coverage sum over the FULL calendar range, then
    # report only observed days (the SQL twin's `days` domain)
    full = pd.DataFrame(
        {"day": pd.date_range(df["day"].min(), df["day"].max(), freq="D")}
    )
    full = full.merge(df[["day", "delta"]], on="day", how="left")
    full["dau_7d"] = full["delta"].fillna(0).cumsum().astype(np.int64)
    observed = df[df["dau"] > 0][["day", "dau"]]
    out = observed.merge(full[["day", "dau_7d"]], on="day")
    out["dau"] = out["dau"].astype("int64")
    return out[["day", "dau", "dau_7d"]]


def events_funnel(sf_dir: str):
    """Ordered conversion funnel (view -> later click -> later
    purchase): how many users reach each stage, where each stage must
    happen strictly AFTER the user's earliest completion of the
    previous one — the classic product-analytics shape that plain
    per-type counts get wrong.

    Scale shape: ONE all-to-all co-partitions each user's events
    (``user_id % B``); inside the bucket the stage logic is three
    vectorized pandas groupby-min + merge passes (no per-user Python
    loop); each bucket emits ONE 3-counter partial row and the driver
    folds B rows."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def funnel_bucket(df: pd.DataFrame) -> pd.DataFrame:
        v = (
            df[df["event_type"] == "view"]
            .groupby("user_id", sort=False, as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t_view"})
        )
        c = df[df["event_type"] == "click"].merge(v, on="user_id")
        c = (
            c[c["ts"] > c["t_view"]]
            .groupby("user_id", sort=False, as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t_click"})
        )
        p = df[df["event_type"] == "purchase"].merge(c, on="user_id")
        p = p[p["ts"] > p["t_click"]]
        return pd.DataFrame(
            {
                "n_view": np.asarray([len(v)], dtype=np.int64),
                "n_click": np.asarray([len(c)], dtype=np.int64),
                "n_purchase": np.asarray([p["user_id"].nunique()], dtype=np.int64),
            }
        )

    row = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(funnel_bucket, batch_format="pandas")
        .aggregate(
            Sum("n_view", alias_name="n_view"),
            Sum("n_click", alias_name="n_click"),
            Sum("n_purchase", alias_name="n_purchase"),
        )
    )
    row = row or {}
    return pd.DataFrame(
        {
            "stage": ["view", "view>click", "view>click>purchase"],
            "n_users": np.asarray(
                [
                    int(row.get("n_view") or 0),
                    int(row.get("n_click") or 0),
                    int(row.get("n_purchase") or 0),
                ],
                dtype=np.int64,
            ),
        }
    )


def orders_retention_cohort(sf_dir: str):
    """Retention cohort matrix: customers grouped by first-order year
    (the cohort), counted in every year they ordered again — the
    warehouse shape behind retention curves.

    Scale shape: ONE all-to-all co-partitions each customer's orders
    (``o_custkey % B``); the cohort year, the distinct (customer,
    year) pairs, and the per-(cohort, year) partial counts are all
    vectorized inside the bucket (every order of a customer lands in
    one bucket, so the in-bucket first-order min and dedup are
    global); only |cohorts| x |years| partial rows per bucket reach
    the final tiny groupby."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "c": df["o_custkey"].to_numpy(),
                "yr": df["o_orderdate"].dt.year.to_numpy().astype(np.int64),
            }
        )
        out["bucket"] = (out["c"] % NUM_BUCKETS).astype(np.int32)
        return out

    def cohort_bucket(df: pd.DataFrame) -> pd.DataFrame:
        first = (
            df.groupby("c", sort=False, as_index=False)["yr"]
            .min()
            .rename(columns={"yr": "cohort_year"})
        )
        d = df.merge(first, on="c")[["c", "cohort_year", "yr"]].drop_duplicates()
        g = (
            d.groupby(["cohort_year", "yr"], sort=False)
            .size()
            .reset_index(name="n_customers")
            .rename(columns={"yr": "order_year"})
        )
        return g

    agg = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(cohort_bucket, batch_format="pandas")
        .groupby(["cohort_year", "order_year"])
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )
    df = agg.to_pandas()
    df["n_customers"] = df["n_customers"].astype("int64")
    return df[["cohort_year", "order_year", "n_customers"]]


Q18_MIN_QTY = 250


def q18_large_orders(sf_dir: str):
    """TPC-H-Q18-shape large-volume orders: orders whose lineitem
    quantity total reaches a threshold, with customer names attached.

    Scale shape: the HAVING filter runs INSIDE the join bucket —
    lineitem collapses to per-batch combiner partials, one
    co-partitioned ``hash_join`` against orders finishes the per-order
    sum AND applies ``sum_qty >= T`` in ``right_prepare``, so only
    qualifying orders (the extreme tail at any scale) leave the
    exchange. The qualifying set is output-sized, so customer names
    attach by collecting it, broadcasting its (tiny) custkey set, and
    scanning customer filtered to those keys — never broadcasting the
    full customer dimension."""
    import polars as pl

    from neuscraper_ray.functions.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "sum_qty": df["l_quantity"].to_numpy().astype(np.int64),
            }
        )
        return out.groupby("l_orderkey", sort=False, as_index=False)["sum_qty"].sum()

    partials = li.map_batches(combiner, batch_format="pandas")

    def finish_having(rf):
        g = rf.group_by("o_orderkey").agg(pl.col("sum_qty").sum())
        return g.filter(pl.col("sum_qty") >= Q18_MIN_QTY)

    qual = hash_join(
        orders,
        partials,
        left_on="o_orderkey",
        right_on="l_orderkey",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_totalprice", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64()), ("sum_qty", pa.int64())]),
        right_prepare=finish_having,
    ).to_pandas()  # output-sized: only orders past the HAVING tail

    keys_ref = ray.put(set(qual["o_custkey"].astype(int)))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["c_custkey"].isin(ray.get(keys_ref))]

    names = cust.map_batches(pick, batch_format="pandas").to_pandas()
    out = qual.merge(names, left_on="o_custkey", right_on="c_custkey")
    return out[["o_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty"]]


Q15_DATE_LO = "1996-01-01"
Q15_DATE_HI = "1996-04-01"


def q15_top_supplier(sf_dir: str):
    """TPC-H-Q15-shape top supplier: the supplier(s) achieving the
    global-max quarterly revenue — the argmax-of-an-aggregate shape.

    Scale shape: lineitem is date-pruned AT THE READ and collapsed to
    per-suppkey combiner partials per batch; the per-supplier totals
    merge in coarse crc buckets (never a high-cardinality
    ``groupby().aggregate()``) and the merged dataset — supplier
    cardinality, distributed — is materialized ONCE and scanned twice:
    pass 1 reduces to per-bucket maxima (B rows to the driver, global
    max by fold), pass 2 filters ``total == max`` in-stream. Winner
    names attach from the broadcast supplier dimension."""
    import pyarrow.compute as pc

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pd.Timestamp(Q15_DATE_LO))
        & (pc.field("l_shipdate") < pd.Timestamp(Q15_DATE_HI)),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_suppkey": df["l_suppkey"].to_numpy().astype(np.int64),
                "rev": cents * (100 - dpct),
            }
        )
        g = out.groupby("l_suppkey", sort=False, as_index=False)["rev"].sum()
        g["hb"] = (g["l_suppkey"] % 16).astype(np.int32)
        return g

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_suppkey", sort=False, as_index=False)["rev"].sum()

    totals = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
        .materialize()  # supplier-cardinality, stays distributed
    )

    def bucket_max(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m": pd.Series([], dtype="int64")})
        return pd.DataFrame({"m": [int(df["rev"].max())]})

    maxima = totals.map_batches(bucket_max, batch_format="pandas").to_pandas()
    cols = ["s_suppkey", "s_name", "total_rev_e4"]
    if len(maxima) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64" if c != "s_name" else "object") for c in cols})
    gmax = int(maxima["m"].max())
    winners = totals.filter(
        expr=f"rev == {gmax}"
    ).to_pandas()  # output-sized: ties at the global max
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = winners.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out = out.rename(columns={"rev": "total_rev_e4"})
    return out[cols]


Q10_DATE_LO = "1996-10-01"
Q10_DATE_HI = "1997-01-01"


def q10_returned_revenue(sf_dir: str):
    """TPC-H-Q10-shape returned-item report: top-20 customers by
    revenue lost to returned items in one quarter.

    Scale shape: both fact sides are pruned at the read (orders by
    date via row-group filter, lineitem to ``l_returnflag = 'R'``);
    lineitem collapses to per-orderkey revenue partials
    (``left_prepare`` finishes the sum in-bucket); ONE co-partitioned
    ``hash_join`` attaches o_custkey; per-custkey totals merge in
    coarse crc buckets with a per-bucket top-20 (driver sees 20 x B
    rows, the ``docs_top_terms`` topology); names for the final 20
    keys come from a filtered customer scan + tiny nation broadcast."""
    import polars as pl
    import pyarrow.compute as pc

    from neuscraper_ray.functions.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= pd.Timestamp(Q10_DATE_LO))
        & (pc.field("o_orderdate") < pd.Timestamp(Q10_DATE_HI)),
    )

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "rev": cents * (100 - dpct),
            }
        )
        return out.groupby("l_orderkey", sort=False, as_index=False)["rev"].sum()

    joined = hash_join(
        li.map_batches(rev_partial, batch_format="pandas"),
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        left_prepare=lambda lf: lf.group_by("l_orderkey").agg(pl.col("rev").sum()),
    )

    def cust_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "c": t["o_custkey"].to_numpy(zero_copy_only=False),
                "rev": t["rev"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("c", sort=False, as_index=False)["rev"].sum()
        g["hb"] = (g["c"] % 16).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c", sort=False, as_index=False)["rev"].sum()
        g = g.sort_values(["rev", "c"], ascending=[False, True], kind="mergesort")
        return g.head(20)

    cand = (
        joined.map_batches(cust_partial, batch_format="pyarrow", batch_size=None)
        .groupby("hb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()  # 20 x B rows
        .sort_values(["rev", "c"], ascending=[False, True], kind="mergesort")
        .head(20)
    )
    keys_ref = ray.put(set(cand["c"].astype(int)))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["c_custkey"].isin(ray.get(keys_ref))]

    names = cust.map_batches(pick, batch_format="pandas").to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    out = cand.merge(names, left_on="c", right_on="c_custkey")
    out["n_name"] = out["c_nationkey"].astype(int).map(n2name)
    out = out.rename(columns={"rev": "revenue_e4"})
    out = out.sort_values(
        ["revenue_e4", "c_custkey"], ascending=[False, True], kind="mergesort"
    )
    return out[["c_custkey", "c_name", "n_name", "revenue_e4"]].reset_index(drop=True)


Q17_BRAND = "Brand#4"


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H-Q17-shape small-quantity-order revenue: total revenue of
    one brand's lineitems whose quantity is below 20% of that part's
    average — the decorrelated correlated-aggregate shape.

    Scale shape: the brand's partkeys (a ~0.1% slice of part) broadcast
    once; pass 1 builds per-part (sum_qty, n) from combiner partials
    merged in coarse crc buckets (brand-part cardinality, collected —
    output-bounded by the brand slice); pass 2 re-scans lineitem with
    the broadcast per-part stats and keeps ``5 * qty * n < sum_qty``
    (the exact-integer form of ``qty < 0.2 * avg``, no float division
    on either engine), reducing to one global sum. Zero all-to-all
    exchanges."""
    brand = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    bkeys = brand.loc[brand["p_brand"] == Q17_BRAND, "p_partkey"].astype(int)
    bkeys_ref = ray.put(set(bkeys))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_partkey"].isin(ray.get(bkeys_ref))]
        out = pd.DataFrame(
            {
                "p": df["l_partkey"].to_numpy(),
                "s": df["l_quantity"].to_numpy().astype(np.int64),
            }
        )
        g = out.groupby("p", sort=False, as_index=False).agg(
            s=("s", "sum"), n=("s", "size")
        )
        g["hb"] = (g["p"] % 16).astype(np.int32)
        return g

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p", sort=False, as_index=False)[["s", "n"]].sum()

    stats = (
        li.map_batches(stats_partial, batch_format="pandas")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()  # brand-slice cardinality
    )
    stats_ref = ray.put(stats[["p", "s", "n"]].astype(np.int64))

    def small_qty(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(stats_ref)
        # vectorized pandas hash join against the broadcast stats frame
        m = df.merge(st, left_on="l_partkey", right_on="p", how="inner")
        qty = m["l_quantity"].to_numpy().astype(np.int64)
        keep = 5 * qty * m["n"].to_numpy() < m["s"].to_numpy()
        cents = np.rint(m["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "n_items": np.asarray([int(keep.sum())], dtype=np.int64),
                "revenue_e2": np.asarray([int(cents[keep].sum())], dtype=np.int64),
            }
        )

    row = li.map_batches(small_qty, batch_format="pandas").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_e2", alias_name="revenue_e2"),
    )
    row = row or {}
    return pd.DataFrame(
        [
            {
                "n_items": int(row.get("n_items") or 0),
                "revenue_e2": int(row.get("revenue_e2") or 0),
            }
        ]
    )


def q22_idle_rich_customers(sf_dir: str):
    """TPC-H-Q22-shape global-customer-relationship: per-nation count
    and balance of customers whose balance beats the global positive
    average and who never placed a 1-URGENT order — scalar-subquery
    broadcast + anti join + small group.

    Scale shape: the global average decorrelates into two scalars
    (sum_e2, n) from combiner partials, broadcast once; the comparison
    is the exact-integer cross-multiplication ``bal_e2 * n > sum_e2``
    (no float division on either engine); the anti join broadcasts the
    distinct-urgent-customer key set built from per-batch unique
    lists over a read pruned to the urgent slice (J2, the
    ``customers_no_orders`` machinery — swap in a Bloom filter beyond
    dimension scale); the final rollup is a 25-group aggregate over
    per-batch partials."""
    import pyarrow.compute as pc

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        bal = np.rint(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = bal[df["c_acctbal"].to_numpy() > 0]
        return pd.DataFrame(
            {
                "s": np.asarray([int(pos.sum())], dtype=np.int64),
                "n": np.asarray([len(pos)], dtype=np.int64),
            }
        )

    row = cust.map_batches(bal_partial, batch_format="pandas").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )
    s_pos, n_pos = int(row["s"] or 0), int(row["n"] or 0)

    urgent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    )

    def batch_keys(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("o_custkey").to_numpy())
        return pa.table({"ks": pa.array([u.tolist()], pa.list_(pa.int64()))})

    rows = urgent.map_batches(batch_keys, batch_format="pyarrow").take_all()
    have_urgent = set(
        np.concatenate([np.asarray(r["ks"], dtype=np.int64) for r in rows]).tolist()
        if rows
        else []
    )
    ctx_ref = ray.put((s_pos, n_pos, have_urgent))

    def nation_partial(df: pd.DataFrame) -> pd.DataFrame:
        s, n, ho = ray.get(ctx_ref)
        bal_e2 = np.rint(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
        keep = (
            (df["c_acctbal"].to_numpy() > 0)
            & (bal_e2 * n > s)
            & ~df["c_custkey"].isin(ho).to_numpy()
        )
        part = pd.DataFrame(
            {
                "c_nationkey": df["c_nationkey"].to_numpy()[keep].astype(np.int64),
                "bal_e2": bal_e2[keep],
            }
        )
        g = part.groupby("c_nationkey", sort=False, as_index=False).agg(
            n_custs=("bal_e2", "size"), total_acctbal_e2=("bal_e2", "sum")
        )
        return g

    agg = cust.map_batches(nation_partial, batch_format="pandas").groupby(
        "c_nationkey"
    ).aggregate(
        Sum("n_custs", alias_name="n_custs"),
        Sum("total_acctbal_e2", alias_name="total_acctbal_e2"),
    )
    df = agg.to_pandas()
    if df.empty:  # degenerate slice: keep the schema
        return pd.DataFrame(
            {
                "n_name": pd.Series([], dtype="object"),
                "n_custs": pd.Series([], dtype="int64"),
                "total_acctbal_e2": pd.Series([], dtype="int64"),
            }
        )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    df["n_name"] = df["c_nationkey"].astype(int).map(n2name)
    df["n_custs"] = df["n_custs"].astype("int64")
    df["total_acctbal_e2"] = df["total_acctbal_e2"].astype("int64")
    return df[["n_name", "n_custs", "total_acctbal_e2"]]


def q12_priority_class(sf_dir: str):
    """TPC-H-Q12-shape conditional aggregation over a fact-fact join:
    per lineitem return flag, how many lines belong to high-priority
    orders (1-URGENT / 2-HIGH) vs low — Q12's CASE-sum split, keyed on
    l_returnflag because the synthetic lineitem has no l_shipmode.

    Scale shape: ONE co-partitioned ``hash_join`` exchange on orderkey
    (both sides fact-sized — no broadcast), then the joined stream
    collapses to (flag, high, low) combiner partials per output block;
    the final groupby sees 3 x n_blocks rows."""
    from neuscraper_ray.functions.joins import hash_join

    li_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_returnflag", pa.string())]
    )
    o_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
    )
    joined = hash_join(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=li_schema,
        right_schema=o_schema,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hi = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"], "hi": hi})
        out = g.groupby("l_returnflag", sort=False).agg(
            high_line_count=("hi", "sum"), low_line_count=("hi", "size")
        )
        out["low_line_count"] -= out["high_line_count"]
        return out.reset_index()

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("l_returnflag", as_index=False)[
        ["high_line_count", "low_line_count"]
    ].sum()
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q19_GROUPS = [  # (brand, max_size, qty_lo, qty_hi) — OR of conjunctions
    ("Brand#1", 10, 1, 15),
    ("Brand#3", 25, 10, 30),
    ("Brand#5", 40, 20, 50),
]


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H-Q19-shape disjunctive predicate over a part x lineitem
    join: revenue from lines matching ANY of three (brand, size-range,
    quantity-range) conjunction groups — the classic OR-of-ANDs that
    defeats naive predicate pushdown.

    Scale shape: the part side is pre-filtered to the three brands AT
    THE READ and broadcast as a sorted (partkey -> group) array (the
    Q17 brand-partkeys precedent; 3/|brands| of the part table), so
    the lineitem pass is ZERO-shuffle: per batch one searchsorted
    membership probe, per-group quantity bounds applied vectorized,
    one (revenue_e4, n_lines) partial row out."""
    import pyarrow.compute as pc

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=pc.field("p_brand").isin([g[0] for g in Q19_GROUPS]),
    ).to_pandas()
    brand_idx = {g[0]: i for i, g in enumerate(Q19_GROUPS)}
    sizes = np.array([g[1] for g in Q19_GROUPS], dtype=np.int64)
    part["grp"] = part["p_brand"].map(brand_idx).astype(np.int64)
    ps = part["p_size"].to_numpy()
    # BETWEEN 1 AND hi, matching the SQL twin's lower bound exactly
    part = part[(ps >= 1) & (ps <= sizes[part["grp"].to_numpy()])]
    order = np.argsort(part["p_partkey"].to_numpy(), kind="stable")
    keys_ref = ray.put(part["p_partkey"].to_numpy()[order])
    grp_ref = ray.put(part["grp"].to_numpy()[order])
    qlo = np.array([g[2] for g in Q19_GROUPS], dtype=np.float64)
    qhi = np.array([g[3] for g in Q19_GROUPS], dtype=np.float64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, grp = ray.get(keys_ref), ray.get(grp_ref)
        pk = df["l_partkey"].to_numpy()
        if len(keys):
            pos_c = np.minimum(np.searchsorted(keys, pk), len(keys) - 1)
            m = keys[pos_c] == pk
        else:
            pos_c = np.zeros(len(pk), dtype=np.int64)
            m = np.zeros(len(pk), dtype=bool)
        qty = df["l_quantity"].to_numpy()
        g = np.where(m, grp[pos_c], 0)
        m &= (qty >= qlo[g]) & (qty <= qhi[g])
        cents = np.rint(df["l_extendedprice"].to_numpy()[m] * 100).astype(
            np.int64
        )
        dpct = np.rint(df["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "revenue_e4": [int((cents * (100 - dpct)).sum())],
                "n_lines": [int(m.sum())],
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "revenue_e4": pd.Series([parts["revenue_e4"].sum()], dtype="int64"),
            "n_lines": pd.Series([parts["n_lines"].sum()], dtype="int64"),
        }
    )


def q21_sole_failing_supplier(sf_dir: str):
    """TPC-H-Q21-shape "suppliers who kept orders waiting": for each
    supplier, count multi-supplier orders where THIS supplier had a
    returned line ('R' — the synthetic lineitem has no
    commit/receipt dates) and NO other supplier did — Q21's correlated
    EXISTS + NOT-EXISTS pair. Top 20 by count desc, suppkey asc.

    Scale shape: ONE keyed exchange on an orderkey bucket co-locates
    every line of an order, so both correlated subqueries become
    vectorized in-bucket group facts (distinct suppliers per order,
    distinct R-suppliers per order); qualifying (suppkey, n) partials
    take a SECOND tiny exchange on a coarse suppkey bucket with
    per-bucket top-k (a suppkey's total lives in one bucket), so the
    driver folds k x B rows; names attach from the broadcast supplier
    dimension."""
    import polars as pl

    from neuscraper_ray.functions.joins import _bucket_i64

    def widen(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy()
        return t.append_column(
            "ob", pa.array(_bucket_i64(ok, NUM_BUCKETS), pa.int32())
        )

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        pf = pl.from_pandas(df)
        facts = pf.group_by("l_orderkey").agg(
            pl.col("l_suppkey").n_unique().alias("n_supp"),
            pl.col("l_suppkey")
            .filter(pl.col("l_returnflag") == "R")
            .n_unique()
            .alias("n_rsupp"),
        )
        w = (
            pf.filter(pl.col("l_returnflag") == "R")
            .select(["l_orderkey", "l_suppkey"])
            .unique()
            .join(facts, on="l_orderkey")
            .filter((pl.col("n_supp") >= 2) & (pl.col("n_rsupp") == 1))
            .group_by("l_suppkey")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        out = w.to_pandas()
        out["sb"] = (out["l_suppkey"].to_numpy() % 16).astype(np.int32)
        return out

    K = 20

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_suppkey", sort=False, as_index=False)["n"].sum()
        g = g.sort_values(
            ["n", "l_suppkey"], ascending=[False, True], kind="mergesort"
        )
        return g.head(K)

    cand = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
        .map_batches(widen, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(per_order, batch_format="pandas")
        .groupby("sb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["n", "l_suppkey"], ascending=[False, True], kind="mergesort"
    ).head(K)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = cand.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["numwait"] = out["n"].astype("int64")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)


# (type, RE2 pattern) — count-only analytics over the SAME pattern set
# the scrub stage replaces with (stages/scrub.py PII_PATTERNS); counted
# independently per type (not sequentially replaced), in RE2 on BOTH
# engines: pyarrow.compute.count_substring_regex here,
# regexp_extract_all in the DuckDB twin — same library semantics.
PII_COUNT_PATTERNS = [
    ("n_email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("n_ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("n_phone", r"(?:\(\d{3}\)\s?|\b\d{3}[-.\s])\d{3}[-.\s]\d{4}\b"),
    ("n_cc", r"\b(?:\d[ -]?){12,15}\d\b"),
    ("n_ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("n_tox", r"(?i)\b(badword1|badword2|slurword|vileword)\b"),
]


def _pii_augment(doc_ids, texts) -> list[str]:
    """Deterministic PII planting (the raw synthetic corpus contains
    none): one plant family per small prime, fixed order, so every
    pattern is genuinely exercised; the SQL twin concatenates the
    identical strings."""
    out = []
    for i, t in zip(doc_ids, texts):
        if i % 7 == 0:
            t += f" contact user{i}@example.com or 192.168.0.{i % 256} now"
        if i % 11 == 0:
            t += " call 555-123-4567 soon"
        if i % 13 == 0:
            t += " ssn 123-45-6789 ok"
        if i % 17 == 0:
            t += " card 4111 1111 1111 1111 end"
        if i % 19 == 0:
            t += " plainly badword1 indeed"
        out.append(t)
    return out


def docs_pii_stats(sf_dir: str):
    """Per-source PII/toxicity exposure report: how many documents and
    how many raw hits of each PII class a source contributes — the
    audit a scrub stage is tuned against (which sources leak emails?
    where does toxicity concentrate?).

    Scale shape: zero shuffle — the six RE2 counters run per batch on
    zero-copy Arrow (``pc.count_substring_regex``), collapse to one
    row per source per batch, and only those combiner partials reach
    the tiny final groupby (|sources| x batches rows)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        aug = pa.array(
            _pii_augment(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist()
            ),
            pa.string(),
        )
        cols = {"source": t.column("source")}
        counts = {}
        for name, pat in PII_COUNT_PATTERNS:
            counts[name] = pc.cast(pc.count_substring_regex(aug, pat), pa.int64())
        pii_total = None
        for name, _ in PII_COUNT_PATTERNS[:-1]:  # toxicity is not PII
            pii_total = (
                counts[name]
                if pii_total is None
                else pc.add(pii_total, counts[name])
            )
        cols.update(counts)
        cols["docs_with_pii"] = pc.cast(
            pc.greater(pii_total, 0), pa.int64()
        )
        cols["n_docs"] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        df = pa.table(cols).to_pandas()
        return pa.Table.from_pandas(
            df.groupby("source", sort=False, as_index=False).sum(),
            preserve_index=False,
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # |sources| x batches combiner partials
        .groupby("source", as_index=False)
        .sum()
        .sort_values("source", kind="mergesort")
    )
    cols = ["source", "n_docs", "docs_with_pii"] + [
        n for n, _ in PII_COUNT_PATTERNS
    ]
    return out[cols].reset_index(drop=True)


SUBTOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n\r]"


def docs_fertility_by_lang(sf_dir: str):
    """Tokenizer-fertility report per language: subword-proxy tokens
    (BPE-ish regex: alnum runs + lone symbols) per whitespace word,
    and chars per subtoken — the granularity stats a tokenizer-budget
    plan is built on (fertility varies by language; ppm fixed-point,
    exact on both engines).

    Scale shape: zero shuffle — two RE2/substring counters per batch
    on zero-copy Arrow, one combiner row per (lang, batch), ratios
    computed once per language on the |langs|-row driver frame."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_words": pc.cast(
                    pc.add(pc.count_substring(txt, " "), 1), pa.int64()
                ),
                "n_subtokens": pc.cast(
                    pc.count_substring_regex(txt, SUBTOKEN_PATTERN), pa.int64()
                ),
                "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
            }
        ).to_pandas().groupby("lang", sort=False, as_index=False).sum().pipe(
            pa.Table.from_pandas, preserve_index=False
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # |langs| x batches partials
        .groupby("lang", as_index=False)
        .sum()
        .sort_values("lang", kind="mergesort")
    )
    out["fertility_ppm"] = (
        out["n_subtokens"] * 1_000_000 // out["n_words"]
    ).astype("int64")
    st = out["n_subtokens"].to_numpy()
    # a lang of pure-whitespace docs has 0 subtokens: define the ratio
    # as 0 (the SQL twin carries the same CASE) instead of div-by-zero
    out["chars_per_subtoken_ppm"] = np.where(
        st > 0,
        out["n_chars"].to_numpy() * 1_000_000 // np.maximum(st, 1),
        0,
    ).astype("int64")
    return out[
        [
            "lang",
            "n_docs",
            "n_words",
            "n_subtokens",
            "n_chars",
            "fertility_ppm",
            "chars_per_subtoken_ppm",
        ]
    ].reset_index(drop=True)


def docs_dedup_keep_best(sf_dir: str):
    """Near-dup dedup with a KEEP-BEST retention policy: within each
    MinHash-LSH cluster keep the longest member (most whitespace
    words; tie -> min doc_id) instead of ``docs_dedup_apply``'s
    min-id representative — the policy real curation runs prefer
    (the longest copy is usually the least-truncated one).

    Scale shape: rides the same labels-size regime as
    ``near_dup_clusters`` (cluster labels are driver-resident below
    the documented edge limit); member word-counts come from ONE
    member-pruned corpus scan (|members| rows collected), the winner
    argmax is O(|members|) driver work, and the apply pass is a
    zero-shuffle broadcast anti-filter over the corpus stream."""
    from neuscraper_ray.functions.dedup import near_dup_clusters

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    labels = near_dup_clusters(_read(sf_dir, "documents", ["doc_id", "text"]))
    if len(labels) == 0:
        return ds
    members_ref = ray.put(set(labels["doc_id"].astype(int)))

    def member_words(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"].isin(ray.get(members_ref))]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_words": (df["text"].str.count(" ") + 1).to_numpy(
                    dtype=np.int64
                ),
            }
        )

    words = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(member_words, batch_format="pandas")
        .to_pandas()  # |members| rows
    )
    m = labels.merge(words, on="doc_id")
    m = m.sort_values(
        ["cluster_id", "n_words", "doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    winners = m.groupby("cluster_id", sort=False).head(1)["doc_id"]
    drop_ref = ray.put(
        set(m["doc_id"].astype(int)) - set(winners.astype(int))
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df["doc_id"].isin(ray.get(drop_ref))]

    return ds.map_batches(keep, batch_format="pandas")


Q2_REGION = "EUROPE"
Q2_SIZE = 15
Q2_NAME_SUFFIX = "bolt"


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H-Q2-shape minimum-cost supplier (adapted: the synthetic
    schema has no partsupp table, so supply cost is each supplier's
    cheapest observed sale price — ``min(l_extendedprice)`` cents per
    (part, supplier) — among one region's suppliers; ref shape:
    correlated MIN subquery per part, top-100 by account balance).

    Scale shape: both dimension slices broadcast once (region's
    suppliers ~ |supplier|/5, filtered parts ~ |part|/250); lineitem is
    column-pruned and collapsed per batch to (part, supp) min partials;
    ONE keyed exchange on a partkey bucket co-locates every candidate
    of a part, so the correlated min resolves vectorized in-bucket with
    no second shuffle; only winner rows (output-sized) reach the
    driver."""
    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", None).to_pandas()
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_size"]).to_pandas()

    rkey = int(region.loc[region["r_name"] == Q2_REGION, "r_regionkey"].iloc[0])
    n2name = dict(
        zip(nation["n_nationkey"].astype(int), nation["n_name"])
    )
    rnations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    esupp = supp[supp["s_nationkey"].isin(rnations)]
    sinfo = {
        int(r.s_suppkey): (
            r.s_name,
            int(round(r.s_acctbal * 100)),
            n2name[int(r.s_nationkey)],
        )
        for r in esupp.itertuples()
    }
    fpart = part[
        (part["p_size"] == Q2_SIZE)
        & part["p_name"].str.endswith(Q2_NAME_SUFFIX)
    ]
    pname = dict(zip(fpart["p_partkey"].astype(int), fpart["p_name"]))
    # membership as dense boolean arrays (keys are 0..N-1 dimension
    # surrogates): one vectorized gather per batch, no hashed isin
    s_mask = np.zeros(int(supp["s_suppkey"].max()) + 1, dtype=bool)
    s_mask[np.fromiter(sinfo, dtype=np.int64)] = True
    p_mask = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
    p_mask[np.fromiter(pname, dtype=np.int64)] = True
    dims_ref = ray.put((s_mask, p_mask))

    from neuscraper_ray.functions.joins import _bucket_i64

    def cost_partial(df: pd.DataFrame) -> pd.DataFrame:
        s_m, p_m = ray.get(dims_ref)
        sk = df["l_suppkey"].to_numpy()
        pk = df["l_partkey"].to_numpy()
        keep = (
            (sk < len(s_m)) & s_m[np.minimum(sk, len(s_m) - 1)]
            & (pk < len(p_m)) & p_m[np.minimum(pk, len(p_m) - 1)]
        )
        df = df[keep]
        out = pd.DataFrame(
            {
                "l_partkey": df["l_partkey"].to_numpy(),
                "l_suppkey": df["l_suppkey"].to_numpy(),
                "cost_e2": np.rint(df["l_extendedprice"].to_numpy() * 100).astype(
                    np.int64
                ),
            }
        )
        g = out.groupby(["l_partkey", "l_suppkey"], sort=False, as_index=False)[
            "cost_e2"
        ].min()
        g["pb"] = _bucket_i64(g["l_partkey"].to_numpy(), 16)
        return g

    def bucket_winners(df: pd.DataFrame) -> pd.DataFrame:
        # every (part, supp) partial of a part is in this bucket: finish
        # the pair min, then the per-part min, keep the ties — the
        # correlated subquery, vectorized
        g = df.groupby(["l_partkey", "l_suppkey"], sort=False, as_index=False)[
            "cost_e2"
        ].min()
        pmin = g.groupby("l_partkey")["cost_e2"].transform("min")
        return g[g["cost_e2"] == pmin]

    cand = (
        _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]
        )
        .map_batches(cost_partial, batch_format="pandas")
        .groupby("pb")
        .map_groups(bucket_winners, batch_format="pandas")
        .to_pandas()  # output-sized: winners only
    )
    info = cand["l_suppkey"].astype(int).map(sinfo)
    cand["s_name"] = [t[0] for t in info]
    cand["s_acctbal_e2"] = np.array([t[1] for t in info], dtype=np.int64)
    cand["n_name"] = [t[2] for t in info]
    cand["p_name"] = cand["l_partkey"].astype(int).map(pname)
    cand = cand.rename(columns={"l_partkey": "p_partkey"})
    cand = cand.sort_values(
        ["s_acctbal_e2", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
        kind="mergesort",
    ).head(100)
    cand["p_partkey"] = cand["p_partkey"].astype("int64")
    return cand[
        ["s_acctbal_e2", "s_name", "n_name", "p_partkey", "p_name", "cost_e2"]
    ].reset_index(drop=True)


Q9_NAME_PREFIX = "red "


def q9_product_type_profit(sf_dir: str):
    """TPC-H-Q9-shape product-type profit by nation and year (adapted:
    no partsupp, so unit cost is the part's list price —
    ``p_retailprice`` cents — instead of ps_supplycost; profit =
    discounted revenue minus list-cost x quantity, exact e4 fixed
    point).

    Scale shape: filtered parts (name-prefix slice) and supplier ->
    nation broadcast once; lineitem collapses per batch to (orderkey,
    nation) profit partials — the ONE co-partitioned ``hash_join``
    attaches the order year; (nation, year) partials then merge in a
    tiny final groupby (25 x 7 groups)."""
    import polars as pl

    from neuscraper_ray.functions.joins import hash_join

    nation = _read(sf_dir, "nation", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).to_pandas()

    n2name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    # dense lookup arrays (dimension keys are 0..N-1 surrogates):
    # suppkey -> nationkey as one int gather per batch; the nation NAME
    # attaches only in the final |nations x years| fold
    s2natkey = np.full(int(supp["s_suppkey"].max()) + 1, -1, dtype=np.int64)
    s2natkey[supp["s_suppkey"].to_numpy()] = supp["s_nationkey"].to_numpy()
    fpart = part[part["p_name"].str.startswith(Q9_NAME_PREFIX)]
    retail_arr = np.full(int(part["p_partkey"].max()) + 1, -1, dtype=np.int64)
    retail_arr[fpart["p_partkey"].to_numpy()] = np.rint(
        fpart["p_retailprice"].to_numpy() * 100
    ).astype(np.int64)
    dims_ref = ray.put((s2natkey, retail_arr))

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        s2n_a, retail_a = ray.get(dims_ref)
        pk = df["l_partkey"].to_numpy()
        cost_e2 = retail_a[np.minimum(pk, len(retail_a) - 1)]
        keep = (pk < len(retail_a)) & (cost_e2 >= 0)
        df = df[keep]
        cost_e2 = cost_e2[keep]
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(),
                "natkey": s2n_a[df["l_suppkey"].to_numpy()],
                "amount_e4": cents * (100 - dpct) - cost_e2 * 100 * qty,
            }
        )
        return out.groupby(["l_orderkey", "natkey"], sort=False, as_index=False)[
            "amount_e4"
        ].sum()

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def orders_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(),
                "o_year": df["o_orderdate"].dt.year.to_numpy().astype(np.int64),
            }
        )

    joined = hash_join(
        li.map_batches(li_prep, batch_format="pandas"),
        orders.map_batches(orders_prep, batch_format="pandas"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("natkey", pa.int64()),
                ("amount_e4", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_year", pa.int64())]
        ),
        left_prepare=lambda lf: lf.group_by(["l_orderkey", "natkey"]).agg(
            pl.col("amount_e4").sum()
        ),
    )

    def year_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["natkey", "o_year"], sort=False, as_index=False)[
            "amount_e4"
        ].sum()

    out = (
        joined.map_batches(year_partial, batch_format="pandas", batch_size=None)
        .to_pandas()  # bounded: <= 25 nations x 7 years per bucket-batch
        .groupby(["natkey", "o_year"], as_index=False)["amount_e4"]
        .sum()
        .rename(columns={"amount_e4": "profit_e4"})
    )
    out["nation"] = out["natkey"].astype(int).map(n2name)
    out = out.sort_values(
        ["nation", "o_year"], ascending=[True, False], kind="mergesort"
    )
    return out[["nation", "o_year", "profit_e4"]].reset_index(drop=True)


Q11_REGION = "ASIA"
Q11_FRACTION_DEN = 1000  # keep parts with value > total/1000


def q11_important_parts(sf_dir: str):
    """TPC-H-Q11-shape important stock (adapted: no partsupp, so a
    part's "value" is one region's suppliers' discounted revenue on
    it): parts whose value exceeds 1/1000 of the region-wide total —
    the global-total scalar-subquery shape.

    Scale shape: region suppliers broadcast as a key set; lineitem
    collapses to per-partkey revenue partials merged in coarse crc
    buckets; the part-cardinality totals materialize ONCE distributed
    and are scanned twice — pass 1 folds per-bucket sums to the global
    scalar (B rows to the driver), pass 2 is a streaming threshold
    filter (output-sized result)."""
    from neuscraper_ray.functions.joins import _bucket_i64

    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    rkey = int(region.loc[region["r_name"] == Q11_REGION, "r_regionkey"].iloc[0])
    rnations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    s_mask = np.zeros(int(supp["s_suppkey"].max()) + 1, dtype=bool)
    s_mask[
        supp.loc[supp["s_nationkey"].isin(rnations), "s_suppkey"].to_numpy()
    ] = True
    skeys_ref = ray.put(s_mask)

    def value_partial(df: pd.DataFrame) -> pd.DataFrame:
        s_m = ray.get(skeys_ref)
        sk = df["l_suppkey"].to_numpy()
        df = df[(sk < len(s_m)) & s_m[np.minimum(sk, len(s_m) - 1)]]
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_partkey": df["l_partkey"].to_numpy(),
                "value_e4": cents * (100 - dpct),
            }
        )
        g = out.groupby("l_partkey", sort=False, as_index=False)["value_e4"].sum()
        g["pb"] = _bucket_i64(g["l_partkey"].to_numpy(), 16)
        return g

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_partkey", sort=False, as_index=False)["value_e4"].sum()

    totals = (
        _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
        )
        .map_batches(value_partial, batch_format="pandas")
        .groupby("pb")
        .map_groups(merge_bucket, batch_format="pandas")
        .materialize()  # part-cardinality, stays distributed
    )

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [int(df["value_e4"].sum())]})

    grand = int(
        totals.map_batches(bucket_sum, batch_format="pandas").to_pandas()["s"].sum()
    )
    # value*1000 > grand  <=>  value >= grand//1000 + 1  (integers)
    thr = grand // Q11_FRACTION_DEN + 1
    out = totals.filter(expr=f"value_e4 >= {thr}").to_pandas()  # output-sized
    if len(out) == 0:  # heavy tail can be empty (column-less empty frame)
        return pd.DataFrame(
            {
                "l_partkey": pd.Series([], dtype="int64"),
                "value_e4": pd.Series([], dtype="int64"),
            }
        )
    out = out.sort_values(
        ["value_e4", "l_partkey"], ascending=[False, True], kind="mergesort"
    )
    out["l_partkey"] = out["l_partkey"].astype("int64")
    return out[["l_partkey", "value_e4"]].reset_index(drop=True)


Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE = "ECONOMY"
Q16_SIZES = (1, 3, 9, 14, 19, 23, 36, 45)


def q16_part_supplier_counts(sf_dir: str):
    """TPC-H-Q16-shape supplier counts per part attribute group:
    distinct suppliers per (brand, type, size) over a filtered part
    slice, excluding "delinquent" suppliers (s_acctbal < 0 — the
    NOT-IN-subquery shape; the synthetic supplier has no comment
    column).

    Scale shape: part attributes and the exclusion key set broadcast
    once; per batch the (group, suppkey) projection dedups BEFORE the
    exchange (combiner-style), then ONE keyed exchange on the
    group-string bucket makes the in-bucket distinct-count global —
    the count never sees raw lineitem rows."""
    from neuscraper_ray.functions.joins import str_buckets

    part = _read(
        sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
    ).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    fpart = part[
        (part["p_brand"] != Q16_EXCL_BRAND)
        & (part["p_type"] != Q16_EXCL_TYPE)
        & part["p_size"].isin(Q16_SIZES)
    ]
    # dense attribute arrays (partkeys are 0..N-1 surrogates): three
    # vectorized gathers per batch instead of a per-row tuple map
    npart = int(part["p_partkey"].max()) + 1
    brand_arr = np.full(npart, "", dtype=object)
    type_arr = np.full(npart, "", dtype=object)
    size_arr = np.full(npart, -1, dtype=np.int64)
    fk = fpart["p_partkey"].to_numpy()
    brand_arr[fk] = fpart["p_brand"].to_numpy()
    type_arr[fk] = fpart["p_type"].to_numpy()
    size_arr[fk] = fpart["p_size"].to_numpy()
    good_mask = np.ones(int(supp["s_suppkey"].max()) + 1, dtype=bool)
    good_mask[supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].to_numpy()] = False
    dims_ref = ray.put((brand_arr, type_arr, size_arr, good_mask))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        brand_a, type_a, size_a, good_m = ray.get(dims_ref)
        pk = df["l_partkey"].to_numpy()
        sk = df["l_suppkey"].to_numpy()
        keep = (
            (pk < len(size_a)) & (size_a[np.minimum(pk, len(size_a) - 1)] >= 0)
            & (sk < len(good_m)) & good_m[np.minimum(sk, len(good_m) - 1)]
        )
        pk, sk = pk[keep], sk[keep]
        out = pd.DataFrame(
            {
                "p_brand": brand_a[pk],
                "p_type": type_a[pk],
                "p_size": size_a[pk],
                "l_suppkey": sk,
            }
        ).drop_duplicates()
        key = (
            out["p_brand"] + "|" + out["p_type"] + "|" + out["p_size"].astype(str)
        )
        out["gb"] = str_buckets(key.tolist(), 16)
        return out

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["p_brand", "p_type", "p_size", "l_suppkey"])
        g = (
            d.groupby(["p_brand", "p_type", "p_size"], sort=False)
            .size()
            .reset_index(name="supplier_cnt")
        )
        g["supplier_cnt"] = g["supplier_cnt"].astype("int64")
        return g

    out = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pair_partial, batch_format="pandas")
        .groupby("gb")
        .map_groups(bucket_count, batch_format="pandas")
        .to_pandas()  # group-cardinality: brands x types x 8 sizes
    )
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
        kind="mergesort",
    )
    return out.reset_index(drop=True)


Q20_NAME_PREFIX = "small "
Q20_REGION = "AMERICA"
Q20_YEAR_LO = "1997-01-01"
Q20_YEAR_HI = "1998-01-01"


def q20_heavy_shippers(sf_dir: str):
    """TPC-H-Q20-shape "suppliers with excess stock" (adapted: no
    partsupp availqty, so the semi-join predicate is shipping
    concentration — a supplier qualifies if, for some name-filtered
    part, MORE than half its all-time quantity shipped inside one
    year): one region's qualifying suppliers by name — the
    EXISTS-over-aggregated-subquery shape.

    Scale shape: filtered partkeys + the region's supplier keys
    broadcast once; lineitem collapses per batch to (supp, part)
    [qty_all, qty_yr] partials; ONE keyed exchange on a suppkey bucket
    finishes both sums, applies the 2x threshold and dedups to
    distinct suppkeys in-bucket — the driver sees at most |supplier|
    rows."""
    from neuscraper_ray.functions.joins import _bucket_i64

    nation = _read(sf_dir, "nation", None).to_pandas()
    region = _read(sf_dir, "region", None).to_pandas()
    supp = _read(sf_dir, "supplier", None).to_pandas()
    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    rkey = int(region.loc[region["r_name"] == Q20_REGION, "r_regionkey"].iloc[0])
    rnations = set(
        nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    rsupp = supp[supp["s_nationkey"].isin(rnations)]
    sinfo = {
        int(r.s_suppkey): (r.s_name, int(round(r.s_acctbal * 100)))
        for r in rsupp.itertuples()
    }
    s_mask = np.zeros(int(supp["s_suppkey"].max()) + 1, dtype=bool)
    s_mask[np.fromiter(sinfo, dtype=np.int64)] = True
    p_mask = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
    p_mask[
        part.loc[part["p_name"].str.startswith(Q20_NAME_PREFIX), "p_partkey"].to_numpy()
    ] = True
    dims_ref = ray.put((s_mask, p_mask))
    lo, hi = np.datetime64(Q20_YEAR_LO), np.datetime64(Q20_YEAR_HI)

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        s_m, p_m = ray.get(dims_ref)
        sk = df["l_suppkey"].to_numpy()
        pk = df["l_partkey"].to_numpy()
        keep = (
            (sk < len(s_m)) & s_m[np.minimum(sk, len(s_m) - 1)]
            & (pk < len(p_m)) & p_m[np.minimum(pk, len(p_m) - 1)]
        )
        df = df[keep]
        qty = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
        ship = df["l_shipdate"].to_numpy()
        in_yr = (ship >= lo) & (ship < hi)
        out = pd.DataFrame(
            {
                "l_suppkey": df["l_suppkey"].to_numpy(),
                "l_partkey": df["l_partkey"].to_numpy(),
                "qty_all": qty,
                "qty_yr": qty * in_yr.astype(np.int64),
            }
        )
        g = out.groupby(["l_suppkey", "l_partkey"], sort=False, as_index=False)[
            ["qty_all", "qty_yr"]
        ].sum()
        g["sb"] = _bucket_i64(g["l_suppkey"].to_numpy(), 16)
        return g

    def bucket_qualify(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_suppkey", "l_partkey"], sort=False, as_index=False)[
            ["qty_all", "qty_yr"]
        ].sum()
        ok = g.loc[2 * g["qty_yr"] > g["qty_all"], ["l_suppkey"]].drop_duplicates()
        return ok

    cand = (
        _read(
            sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"]
        )
        .map_batches(qty_partial, batch_format="pandas")
        .groupby("sb")
        .map_groups(bucket_qualify, batch_format="pandas")
        .to_pandas()  # <= |region's suppliers| rows
    )
    info = cand["l_suppkey"].astype(int).map(sinfo)
    cand["s_name"] = [t[0] for t in info]
    cand["s_acctbal_e2"] = np.array([t[1] for t in info], dtype=np.int64)
    cand = cand.sort_values("s_name", kind="mergesort")
    return cand[["s_name", "s_acctbal_e2"]].reset_index(drop=True)


ALL_QUERIES = {
    "docs_token_count": docs_token_count,
    "docs_content_hash": docs_content_hash,
    "docs_exact_dedup": docs_exact_dedup,
    "docs_exact_dedup_fp": docs_exact_dedup_fp,
    "docs_line_dedup": docs_line_dedup,
    "docs_line_dedup_apply": docs_line_dedup_apply,
    "docs_boilerplate_lines": docs_boilerplate_lines,
    "docs_ngram_coverage": docs_ngram_coverage,
    "docs_paragraph_dedup": docs_paragraph_dedup,
    "docs_soft_dedup": docs_soft_dedup,
    "docs_c4_clean": docs_c4_clean,
    "docs_url_filter": docs_url_filter,
    "docs_quality_model": docs_quality_model,
    "docs_bpe_merges": docs_bpe_merges,
    "docs_bpe_tokenize": docs_bpe_tokenize,
    "docs_incremental_dedup": docs_incremental_dedup,
    "docs_incremental_near_dedup": docs_incremental_near_dedup,
    "docs_url_dedup": docs_url_dedup,
    "docs_domain_cap": docs_domain_cap,
    "docs_domain_stats": docs_domain_stats,
    "docs_lang_stats": docs_lang_stats,
    "docs_word_stats": docs_word_stats,
    "docs_repetition_stats": docs_repetition_stats,
    "docs_quality_filter": docs_quality_filter,
    "docs_source_quality": docs_source_quality,
    "docs_lm_buckets": docs_lm_buckets,
    "docs_tfidf_terms": docs_tfidf_terms,
    "embeddings_project": embeddings_project,
    "docs_length_filter": docs_length_filter,
    "docs_scrub": docs_scrub,
    "docs_normalize_text": docs_normalize_text,
    "docs_langid": docs_langid,
    "docs_minhash_clusters": docs_minhash_clusters,
    "docs_dedup_apply": docs_dedup_apply,
    "docs_simhash_pairs": docs_simhash_pairs,
    "docs_fingerprint": docs_fingerprint,
    "docs_jaccard_pairs": docs_jaccard_pairs,
    "docs_minhash_precision": docs_minhash_precision,
    "docs_dedup_cluster_stats": docs_dedup_cluster_stats,
    "docs_cross_source_overlap": docs_cross_source_overlap,
    "docs_stratified_sample": docs_stratified_sample,
    "docs_train_split": docs_train_split,
    "docs_decontaminate": docs_decontaminate,
    "docs_contamination_frac": docs_contamination_frac,
    "docs_mix_sources": docs_mix_sources,
    "docs_temperature_mix": docs_temperature_mix,
    "docs_curation_funnel": docs_curation_funnel,
    "docs_token_budget_mix": docs_token_budget_mix,
    "docs_dsir_weights": docs_dsir_weights,
    "docs_quality_percentile": docs_quality_percentile,
    "docs_semantic_dedup": docs_semantic_dedup,
    "docs_token_quantiles": docs_token_quantiles,
    "docs_length_quantiles_by_lang": docs_length_quantiles_by_lang,
    "docs_top_terms": docs_top_terms,
    "docs_vocab_stats": docs_vocab_stats,
    "docs_bigram_pmi": docs_bigram_pmi,
    "docs_bigram_lm_score": docs_bigram_lm_score,
    "docs_chunk_dedup": docs_chunk_dedup,
    "docs_exactsubstr_dedup": docs_exactsubstr_dedup,
    "events_type_agg": events_type_agg,
    "events_hourly": events_hourly,
    "events_user_sessions": events_user_sessions,
    "events_top_sessions": events_top_sessions,
    "events_rolling_count": events_rolling_count,
    "events_sample": events_sample,
    "events_asof_join": events_asof_join,
    "events_distinct_users_hll": events_distinct_users_hll,
    "events_value_quantiles_sketch": events_value_quantiles_sketch,
    "order_totals_join": order_totals_join,
    "orders_rank_in_customer": orders_rank_in_customer,
    "events_type_dow_pivot": events_type_dow_pivot,
    "q4_order_priority": q4_order_priority,
    "q10_returned_revenue": q10_returned_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "q13_customer_distribution": q13_customer_distribution,
    "q12_priority_class": q12_priority_class,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_sole_failing_supplier": q21_sole_failing_supplier,
    "docs_pii_stats": docs_pii_stats,
    "docs_fertility_by_lang": docs_fertility_by_lang,
    "docs_dedup_keep_best": docs_dedup_keep_best,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_parts": q11_important_parts,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q20_heavy_shippers": q20_heavy_shippers,
    "events_purchase_view_window": events_purchase_view_window,
    "docs_posting_lists": docs_posting_lists,
    "docs_length_deciles": docs_length_deciles,
    "q14_promo_revenue": q14_promo_revenue,
    "events_distinct_users_by_type": events_distinct_users_by_type,
    "events_funnel": events_funnel,
    "events_daily_active_users": events_daily_active_users,
    "events_type_transitions": events_type_transitions,
    "orders_retention_cohort": orders_retention_cohort,
    "docs_cms_heavy_hitters": docs_cms_heavy_hitters,
    "docs_sample_per_lang": docs_sample_per_lang,
    "corpus_report": corpus_report,
    "docs_lang_source_rollup": docs_lang_source_rollup,
    "docs_pack_sequences": docs_pack_sequences,
    "embeddings_kmeans": embeddings_kmeans,
    "media_features": media_features,
    "events_distinct_types": events_distinct_types,
    "events_top_users": events_top_users,
    "q1_pricing": q1_pricing,
    "q6_forecast_revenue": q6_forecast_revenue,
    "orders_monthly_growth": orders_monthly_growth,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_volume": q5_region_volume,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "segment_order_value": segment_order_value,
    "customers_no_orders": customers_no_orders,
    "order_line_concat": order_line_concat,
    "lineitem_global_metrics": lineitem_global_metrics,
    "ann_topk": ann_topk,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_ivf": ann_topk_ivf,
    "embedding_near_pairs": embedding_near_pairs,
    "curate_labels": curate_labels,
    "curate_task_sweep": curate_task_sweep,
    "curate_drop_reasons": curate_drop_reasons,
    "pages_annotation_offsets": pages_annotation_offsets,
}
