"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All vectorized `map_batches` bodies with exact
DuckDB-SQL-expressible semantics where possible (see
``__ray_entry__.oracle_sql``): token count is defined as
``len(text.split(' '))`` (single-space split, '' -> 1) to match
``len(str_split(text, ' '))``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_count_batch(batch: pa.Table, column: str = "text", out: str = "n_tokens") -> pa.Table:
    """n_tokens = number of single-space-separated fields (DuckDB-equal)."""
    n = pc.add(pc.count_substring(batch.column(column), " "), 1)
    return batch.append_column(out, pc.cast(n, pa.int64()))


def md5_hex(texts: list, empty_as_blank: bool = False) -> list[str]:
    """Lowercase-hex md5 of each utf-8 text — the ONE md5 kernel every
    dedup/funnel/mark path shares (a per-row loop is unavoidable: no
    vectorized md5 exists, and md5 is load-bearing for the DuckDB
    ``md5()`` oracles). Two empty-text conventions exist on purpose:
    the default hashes ``""`` like DuckDB ``md5('')``; the curate path
    passes ``empty_as_blank=True`` because an empty extracted text
    means "no content" and must never join a dedup group."""
    md5 = hashlib.md5
    if empty_as_blank:
        return [md5(t.encode("utf-8")).hexdigest() if t else "" for t in texts]
    return [md5(t.encode("utf-8")).hexdigest() for t in texts]


def content_hash_batch(batch: pa.Table, column: str = "text", out: str = "content_hash") -> pa.Table:
    """Lowercase-hex md5 of the utf-8 text (DuckDB ``md5(text)``-equal)."""
    hashes = md5_hex(batch.column(column).to_pylist())
    return batch.append_column(out, pa.array(hashes, pa.string()))


def _word_stats_one(t: str) -> tuple[int, int, int]:
    """Per-doc reference implementation (the semantic contract)."""
    parts = t.split(" ")
    n = len(parts)
    return (
        n,
        len({p.lower() for p in parts}),
        (sum(len(p) for p in parts) * 10000) // n,
    )


def word_stats_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Quality-scoring stats with SQL-checkable definitions:

    - n_words     = len(split(' '))
    - n_distinct  = distinct lowercase fields of split(' ')
    - mean_word_len_e4 = (sum(len(field)) * 10000) // n_words
      (fixed-point integer so Python and SQL agree exactly — float
      ROUND ties resolve differently between engines)

    Vectorized: n_words is a pyarrow separator count; the char-sum is
    derived arithmetically (sum(len(field)) = len(text) - n_seps, since
    every non-separator char belongs to exactly one field); n_distinct
    runs one polars split/explode/group_by pass. The polars path is
    gated to ASCII rows (``pc.string_is_ascii``) so Rust vs Python
    lowercase semantics can never diverge — non-ASCII rows take the
    bit-identical per-doc fallback (``_word_stats_one``), same pattern
    as ``stages.heuristics._stats_vectorized``.
    """
    col = batch.column(column)
    n = batch.num_rows
    n_seps = pc.count_substring(col, " ").to_numpy().astype(np.int64)
    n_words = n_seps + 1
    total_len = pc.utf8_length(col).to_numpy().astype(np.int64) - n_seps
    mwl = (total_len * 10000) // n_words

    n_distinct = np.empty(n, dtype=np.int64)
    ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
    if ascii_mask.all():
        n_distinct[:] = _distinct_lower_fields(col.to_pylist())
    else:
        texts = col.to_pylist()
        idx = np.nonzero(ascii_mask)[0]
        if len(idx):
            n_distinct[idx] = _distinct_lower_fields([texts[i] for i in idx])
        for i in np.nonzero(~ascii_mask)[0]:
            n_distinct[i] = len({p.lower() for p in texts[i].split(" ")})

    out = batch.append_column("n_words", pa.array(n_words))
    out = out.append_column("n_distinct_words", pa.array(n_distinct))
    return out.append_column("mean_word_len_e4", pa.array(mwl))


def _distinct_lower_fields(texts: list[str]) -> np.ndarray:
    """Per-text count of distinct lowercase single-space-split fields,
    one polars split/explode/group_by pass (ASCII texts only — caller
    gates). ``str.split(" ")`` keeps empty fields exactly like Python
    ``str.split(" ")``, so '' and runs of spaces count identically."""
    import polars as pl

    agg = (
        pl.DataFrame({"t": pl.Series(texts, dtype=pl.String)})
        .with_row_index("i")
        .select(["i", pl.col("t").str.split(" ").alias("w")])
        .explode("w", empty_as_null=True)
        .group_by("i")
        .agg(pl.col("w").str.to_lowercase().n_unique().alias("nd"))
    )
    out = np.empty(len(texts), dtype=np.int64)
    out[agg["i"].to_numpy().astype(np.int64)] = agg["nd"].to_numpy()
    return out


def _gram_groups(dw, k: int):
    """Per-doc word-k-gram groups -> (gdoc ascending, cnt, glen).

    Gram identity is the polyhash shingle fold (h=0; h = h*1000003 +
    word_hash) WITHOUT the 32-bit mask; glen = total codepoints of the
    gram's words (max over the group, which only differs on a hash
    collision — the SQL twin takes the same max)."""
    from neuscraper_ray.functions import polyhash as ph

    h, wd = dw.h1, dw.word_doc
    z = np.empty(0, dtype=np.int64)
    if len(h) < k:
        return z, z, z
    valid = np.nonzero(wd[: len(h) - k + 1] == wd[k - 1 :])[0]
    if len(valid) == 0:
        return z, z, z
    g = np.zeros(len(valid), dtype=np.uint64)
    glen = np.zeros(len(valid), dtype=np.int64)
    for j in range(k):
        g = ph._red(ph.mulmod(g, np.uint64(ph.BASE_S)) + h[valid + j])
        glen += dw.wlen[valid + j]
    doc = wd[valid]
    order = np.lexsort((g, doc))
    gs, ds_, ls = g[order], doc[order], glen[order]
    new = np.concatenate([[True], (ds_[1:] != ds_[:-1]) | (gs[1:] != gs[:-1])])
    first = np.nonzero(new)[0]
    cnt = np.diff(np.append(first, len(gs)))
    return ds_[new], cnt, np.maximum.reduceat(ls, first)


def repetition_stats_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Gopher-style within-document repetition stats (Rae et al. 2021
    §A.1.1, adapted to word n-grams over newline-free text), integer
    -exact so DuckDB reproduces them value-for-value
    (``polyhash.sql_repetition_stats``):

    - n_words     = polyhash word count (whitespace runs — NOT the
      single-space split of ``word_stats_batch``)
    - total_chars = codepoints of the text
    - top2_cov    = max over distinct word-2-grams of
      count * gram_codepoints ("characters in the most repeated
      2-gram"; max-coverage form keeps the tie-break engine-neutral)
    - dup3_chars  = sum over word-3-grams occurring >= 2 times of
      count * gram_codepoints ("characters in duplicated 3-grams")

    One vectorized pass per batch (shared DocWords analysis), zero
    shuffle — the scale profile of a pure map stage."""
    from neuscraper_ray.functions import polyhash as ph

    texts = batch.column(column).to_pylist()
    dw = ph.DocWords(texts)
    n_words = (dw.wend - dw.wstart).astype(np.int64)
    total_chars = (dw.doc_offsets[1:] - dw.doc_offsets[:-1]).astype(np.int64)

    top2 = np.zeros(dw.n_docs, dtype=np.int64)
    gdoc, cnt, glen = _gram_groups(dw, 2)
    if len(gdoc):
        present = np.concatenate([[True], gdoc[1:] != gdoc[:-1]])
        top2[gdoc[present]] = np.maximum.reduceat(cnt * glen, np.nonzero(present)[0])

    dup3 = np.zeros(dw.n_docs, dtype=np.int64)
    gdoc, cnt, glen = _gram_groups(dw, 3)
    dup = cnt >= 2
    if dup.any():
        gdoc, cov = gdoc[dup], (cnt * glen)[dup]
        present = np.concatenate([[True], gdoc[1:] != gdoc[:-1]])
        dup3[gdoc[present]] = np.add.reduceat(cov, np.nonzero(present)[0])

    out = batch.append_column("n_words", pa.array(n_words))
    out = out.append_column("total_chars", pa.array(total_chars))
    out = out.append_column("top2_cov", pa.array(top2))
    return out.append_column("dup3_chars", pa.array(dup3))


def fingerprint_batch(batch: pa.Table, column: str = "text", out: str = "fingerprint") -> pa.Table:
    """64-bit rolling (polynomial) hash of the text — a cheap document
    fingerprint for shard-level dedup indexes. Deterministic (base 257,
    mod 2^61-1); one batched numpy pass over the whole batch's
    codepoints (``polyhash.fingerprints``), and SQL-verifiable —
    DuckDB reproduces it with a ``list_reduce`` fold
    (``polyhash.sql_fingerprint``)."""
    from neuscraper_ray.functions.polyhash import fingerprints

    fps = fingerprints(batch.column(column).to_pylist())
    return batch.append_column(out, pa.array(fps))
