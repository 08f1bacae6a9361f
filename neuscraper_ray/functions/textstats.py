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


def content_hash_batch(batch: pa.Table, column: str = "text", out: str = "content_hash") -> pa.Table:
    """Lowercase-hex md5 of the utf-8 text (DuckDB ``md5(text)``-equal)."""
    hashes = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column(column).to_pylist()
    ]
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
        .explode("w")
        .group_by("i")
        .agg(pl.col("w").str.to_lowercase().n_unique().alias("nd"))
    )
    out = np.empty(len(texts), dtype=np.int64)
    out[agg["i"].to_numpy().astype(np.int64)] = agg["nd"].to_numpy()
    return out


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
