"""Distributed BPE tokenizer training + application.

Byte-Pair Encoding (Sennrich et al. 2016, arXiv:1508.07909) the way
production tokenizer trainers actually run it (HuggingFace tokenizers,
SentencePiece): BPE never iterates over the corpus — it iterates over
the WORD-FREQUENCY TABLE. So the distributed part is exactly one
corpus pass (the ``_term_counts`` combiner + term-bucket topology:
per-batch polars explode/group partials, one keyed exchange on a
coarse term bucket, per-bucket top-V prune) producing the top-V
``(word, count)`` vocabulary, and the merge loop runs driver-side on
that BOUNDED table — ``n_merges x O(V)`` work on ≤ V rows no matter
the corpus size. Truncating to top-V is the standard practice (the
frequency tail it drops is exactly the tail whose pair counts cannot
reach the merge threshold first; the ``top_v``-invariance of the
result on small corpora is pinned in tests).

Merges are character-level (unicode-safe without a byte fallback
table), deterministic: best pair = max count, ties broken by
lexicographically smallest (left, right) — so the trained merge table
is a pure function of the corpus, partitioning-invariant.

Application (``bpe_encode_lens``) broadcasts the merge list once via
``ray.put`` and is a zero-shuffle map; each batch encodes every
DISTINCT word once (web text repeats words massively) and scatters
token counts back per doc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from neuscraper_ray.config import NUM_BUCKETS

WORD_RE = r"[^ \t\n\x0b\x0c\r]+"  # the shared oracle word split


def corpus_word_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    top_v: int = 2**16,
    num_buckets: int = NUM_BUCKETS,
) -> pd.DataFrame:
    """ONE distributed pass -> top-V ``(word, count)`` table, count
    desc then word asc (deterministic). The global top-V is a subset
    of the union of per-bucket top-Vs (a word's global count lives
    entirely in one bucket), so the driver folds ≤ V x num_buckets
    rows — never the full web vocabulary."""
    import polars as pl

    from neuscraper_ray.functions.joins import str_buckets

    def partial(t: pa.Table) -> pa.Table:
        pf = pl.from_arrow(t.select([text_col]))
        agg = (
            pf.select(pl.col(text_col).str.extract_all(WORD_RE).alias("w"))
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
            .group_by("w")
            .agg(pl.len().alias("n"))
            .rename({"w": "word"})
        )
        out = agg.to_arrow().cast(
            pa.schema([("word", pa.string()), ("n", pa.int64())])
        )
        hb = str_buckets(out.column("word"), num_buckets)
        return out.append_column("hb", pa.array(hb, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", sort=False, as_index=False)["n"].sum()
        g = g.sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
        return g.head(top_v)

    cand = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["n", "word"], ascending=[False, True], kind="mergesort"
    )
    return cand.head(top_v).reset_index(drop=True)


def bpe_train_from_vocab(
    vocab: list[tuple[str, int]], n_merges: int, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Driver-side weighted BPE merge loop over a bounded vocabulary.
    -> ``[(left, right, pair_count), ...]`` in merge order; stops early
    when the best pair's weighted count drops below ``min_count``.
    Plain O(n_merges x total_symbols) recount per round — at V ≤ 2^16
    this is milliseconds; the incremental-pair-index optimization is
    an implementation detail, not a scale requirement, since V is
    corpus-size-independent."""
    from collections import Counter

    words: list[list[str]] = [list(w) for w, _ in vocab]
    counts = [int(c) for _, c in vocab]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in zip(words, counts):
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic argmax: count desc, then smallest (left, right)
        best, bc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if bc < min_count:
            break
        merges.append((best[0], best[1], bc))
        merged = best[0] + best[1]
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def bpe_train(
    ds: ray.data.Dataset,
    n_merges: int = 64,
    text_col: str = "text",
    top_v: int = 2**16,
) -> pd.DataFrame:
    """Corpus pass + driver merge loop.
    -> ``(rank int64, left, right, pair_count int64)``, rank = merge
    order starting at 0."""
    wc = corpus_word_counts(ds, text_col=text_col, top_v=top_v)
    merges = bpe_train_from_vocab(
        list(zip(wc["word"], wc["n"])), n_merges=n_merges
    )
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(merges)), dtype="int64"),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "pair_count": pd.Series([m[2] for m in merges], dtype="int64"),
        }
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """-> number of BPE tokens for one word (merges applied in rank
    order, the standard greedy-lowest-rank loop)."""
    syms = list(word)
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_encode_lens(
    ds: ray.data.Dataset,
    merges: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Zero-shuffle apply pass with the broadcast merge table.
    -> ``(id_col, n_words int64, n_tokens_bpe int64)`` per doc. Each
    batch encodes each DISTINCT word once, then scatters counts back
    per doc — web text's word repetition makes the per-batch encode
    table small even when batches are large."""
    import polars as pl

    ranks_ref = ray.put(
        {
            (l, r): i
            for i, (l, r) in enumerate(zip(merges["left"], merges["right"]))
        }
    )

    def encode(t: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)
        pf = pl.from_arrow(t.select([text_col]))
        w = (
            pf.select(pl.col(text_col).str.extract_all(WORD_RE).alias("w"))
            .with_row_index("i")
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
        )
        words = w["w"].to_numpy()
        docs = w["i"].to_numpy().astype(np.int64)
        uniq, inv = np.unique(words, return_inverse=True) if len(words) else (
            np.empty(0, dtype=object),
            np.empty(0, dtype=np.int64),
        )
        tok_per_uniq = np.fromiter(
            (_encode_word(u, ranks) for u in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        n = len(t)
        n_words = np.bincount(docs, minlength=n).astype(np.int64)
        n_tok = np.bincount(
            docs, weights=tok_per_uniq[inv] if len(words) else None, minlength=n
        ).astype(np.int64)
        out = t.select([id_col])
        out = out.append_column("n_words", pa.array(n_words, pa.int64()))
        out = out.append_column("n_tokens_bpe", pa.array(n_tok, pa.int64()))
        return out

    return ds.map_batches(encode, batch_format="pyarrow")
