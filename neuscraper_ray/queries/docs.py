"""Documents-table operators: the dedup ladder, text statistics, quality/LM scoring, sampling and mixing.

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

from neuscraper_ray.queries._shared import _preagg_sum, _read


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


def docs_unimax_mix(sf_dir: str, epoch_cap: int = 4):
    """UniMax source mixing (Chung et al. 2023, arXiv:2304.09151): the
    fairer alternative to temperature sampling — allocate a total
    token budget UNIFORMLY across sources, except no source repeats
    more than ``epoch_cap`` epochs; the budget freed by capped (small)
    sources waterfalls to the rest. Integer-exact sequential
    waterfill: sources ordered by (cap asc, source asc); at each step
    with m sources remaining and r budget left,
    ``alloc = min(cap, r // m)``. Budget = one average epoch
    (sum of all source tokens). -> per source
    (source, n_tokens, cap_tokens, alloc_tokens, epochs_e6).

    Scale shape: per-source token totals via combiner partials -> a
    tiny groupby (O(sources x batches) rows); the waterfill runs on
    the |sources|-row driver frame. The SQL twin reproduces the
    sequential fill with a recursive CTE — both engines use exact
    integer division, so the allocation agrees bit-for-bit."""
    from neuscraper_ray.functions.textstats import token_count_batch

    def tok_fn(t: pa.Table) -> pa.Table:
        return token_count_batch(t).select(["doc_id", "source", "n_tokens"])

    tok = _read(sf_dir, "documents", ["doc_id", "source", "text"]).map_batches(
        tok_fn, batch_format="pyarrow"
    )
    totals = _preagg_sum(
        tok.select_columns(["source", "n_tokens"]), ["source"], ["n_tokens"]
    ).to_pandas()

    rows = sorted(
        (
            (str(s), int(t), epoch_cap * int(t))
            for s, t in zip(totals["source"], totals["n_tokens"])
        ),
        key=lambda x: (x[2], x[0]),
    )
    r = sum(t for _, t, _ in rows)
    out = []
    for i, (s, t, cap) in enumerate(rows):
        m = len(rows) - i
        alloc = min(cap, r // m)
        r -= alloc
        out.append((s, t, cap, alloc, (alloc * 1_000_000) // t if t else 0))
    return pd.DataFrame(
        out,
        columns=["source", "n_tokens", "cap_tokens", "alloc_tokens", "epochs_e6"],
    ).sort_values("source").reset_index(drop=True)


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


def docs_span_decontaminate(sf_dir: str):
    """SPAN-level benchmark decontamination: remove only the words
    covered by a benchmark-matching word-3-gram window instead of
    dropping whole docs (the surgical companion to
    ``docs_decontaminate`` — standard practice when eval leakage is a
    sentence, not the document). -> (doc_id, n_words, n_removed,
    text_clean) per non-benchmark doc. Same zero-corpus-shuffle shape
    (broadcast sorted benchmark shingles, searchsorted per batch); the
    removal reuses the ExactSubstr span-coverage kernel. SQL-verified
    via ``polyhash.sql_span_decontaminate``."""
    from neuscraper_ray.functions.decontam import (
        benchmark_shingle_array,
        span_decontaminate,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = benchmark_shingle_array(ds)
    return span_decontaminate(ds, ray.put(bench))


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


def docs_intra_dedup(sf_dir: str, k: int = 3):
    """WITHIN-document repeated-span removal (Gopher-style repetition
    REMOVAL — the intra-doc rung below corpus-wide
    ``docs_exactsubstr_dedup``): every word-3-gram window repeating an
    earlier window of the SAME document loses its tokens; survivors
    rejoin with ' '. -> (doc_id, n_tokens, n_removed, text_dedup).
    ZERO exchanges — every decision is doc-local, so this is one
    stateless ``map_batches`` at any corpus size (the cheapest rung of
    the whole dedup ladder). Identity is the shared 61-bit rolling
    window hash, so the DuckDB twin
    (``polyhash.sql_intra_doc_dedup``) agrees bit-for-bit; at sf0.01,
    27 of 500 docs carry an intra-doc repeat, so the operator
    genuinely fires here."""
    from neuscraper_ray.functions.dedup import intra_doc_dedup

    return intra_doc_dedup(_read(sf_dir, "documents", ["doc_id", "text"]), k=k)


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


def docs_fingerprint(sf_dir: str):
    """Rolling-hash fingerprint per document (SQL-verified: DuckDB
    reproduces the base-257 mod-2^61-1 fold via list_reduce)."""
    from neuscraper_ray.functions.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"]
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
    combiner partials + one tiny keyed merge — the histogram itself
    stays DISTRIBUTED; the driver pulls only the rb-collapsed
    (source, keep, n_words) rollup (so its frame never carries the
    64x range-bucket factor) and later the <=1-per-source partial
    groups' rb rows. The driver orders the
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


NW_CLAMP = 1 << 20  # per-doc token-count cap in the budget accounting


def token_budget_mix(
    ds: ray.data.Dataset, max_id: int | None = None
) -> ray.data.Dataset:
    """The distributed QUALIFY-cumsum engine under
    ``docs_token_budget_mix`` (see its docstring for the scale story);
    takes any Dataset with (doc_id, text, source). Planted edge cases
    (boundary ties, zero-token docs, all-zero sources, repartition
    invariance) are pinned in tests/test_functions.py.

    Token counts are clamped at ``NW_CLAMP`` (2^20 — 5x the Gopher
    MAX_WORDS drop bound, so only already-dropped giants can hit it):
    a single pathological multi-GB doc then counts 1M tokens toward
    the budget instead of minting its own histogram key, which bounds
    the driver-side rollup at sources x 2 x NW_CLAMP rows no matter
    what the corpus contains. The SQL twin applies the same ``least``
    (shared constant), and the clamped value is what ``n_tokens``
    reports for such docs in both engines."""
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
                "nw": np.minimum(nw.astype(np.int64), NW_CLAMP),
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

    # the histogram STAYS distributed: the driver pulls (a) the
    # rb-collapsed (source, keep, nw) rollup for classification and
    # (b) per-rb rows for the <=1-per-source PARTIAL groups only —
    # never the full (source, keep, nw, rb) frame, whose 64x rb factor
    # is the term that grows with sources x max-doc-length at scale
    h_ds = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(hist_merge, batch_format="pandas")
        .materialize()
    )

    def rb_collapse(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "keep", "nw"], sort=False, as_index=False)[
            "n"
        ].sum()

    # driver: group classification (bounded rows: sources x nw values)
    grp = (
        h_ds.map_batches(rb_collapse, batch_format="pandas", batch_size=None)
        .to_pandas()
        .groupby(["source", "keep", "nw"], as_index=False)["n"]
        .sum()
    )
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

    # per-(partial group, rb) exclusive rank offsets: only the partial
    # groups' rows (<= sources x 64) leave the distributed histogram
    part_keys = dec[dec["code"] == 1][["source", "keep", "nw"]]
    if part_keys.empty:  # every group FULL or NONE: nothing to rank
        ph = pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "keep": pd.Series([], dtype=np.int64),
                "nw": pd.Series([], dtype=np.int64),
                "rb": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            }
        )
    else:
        pk_ref = ray.put(part_keys)

        def part_rows(df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(ray.get(pk_ref), on=["source", "keep", "nw"])

        ph = h_ds.map_batches(
            part_rows, batch_format="pandas", batch_size=None
        ).to_pandas()
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
