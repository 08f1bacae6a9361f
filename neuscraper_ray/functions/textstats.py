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


def word_stats_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Quality-scoring stats with SQL-checkable definitions:

    - n_words     = len(split(' '))
    - n_distinct  = distinct lowercase fields of split(' ')
    - mean_word_len_e4 = (sum(len(field)) * 10000) // n_words
      (fixed-point integer so Python and SQL agree exactly — float
      ROUND ties resolve differently between engines)
    """
    texts = batch.column(column).to_pylist()
    n_words = np.empty(len(texts), dtype=np.int64)
    n_distinct = np.empty(len(texts), dtype=np.int64)
    mwl = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        parts = t.split(" ")
        n_words[i] = len(parts)
        n_distinct[i] = len({p.lower() for p in parts})
        mwl[i] = (sum(len(p) for p in parts) * 10000) // len(parts)
    out = batch.append_column("n_words", pa.array(n_words))
    out = out.append_column("n_distinct_words", pa.array(n_distinct))
    return out.append_column("mean_word_len_e4", pa.array(mwl))


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
