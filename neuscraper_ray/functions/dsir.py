"""DSIR-style hashed n-gram importance weighting + resampling.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every document by how much its hashed-bigram
distribution looks like a TARGET slice of the corpus, then sample with
probability proportional to the score. The published recipe hashes
n-grams into a few thousand buckets so both "language models" are
bounded count arrays regardless of corpus size; we keep that and make
the score integer-exact — the RATIO-OF-SUMS variant
``score_ppm = (sum_i tgt[b_i] * 1e6) // sum_i all[b_i]`` over the
doc's bigram-occurrence buckets ``b_i`` — so DuckDB reproduces it
value-for-value through the shared polyhash word-hash contract (no
float log-likelihoods, no ROUND ties). The sampling gate is the same
deterministic fingerprint gate as ``docs_stratified_sample``:
``fingerprint(doc_id) % 1e6 < score_ppm`` — a pure function of the
row, rerun-stable on any partitioning.

Scale shape: pass 1 folds each batch's bigram buckets into ONE dense
(2 x NB int64) partial row (NB = 4096 — 64 KiB per batch, the HLL
register topology; driver folds <= n_batches rows, zero shuffle);
the two count arrays broadcast once via ``ray.put``; pass 2 is a
zero-shuffle map — per-doc sums via one ``np.add.at`` scatter per
array. int64 holds ``st * 1e6`` while doc_bigrams x target_bigrams
< 9.2e12 (the SQL twin is HUGEINT throughout; at larger scales chunk
the per-doc sum into HUGEINT-style hi/lo pairs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from neuscraper_ray.functions import polyhash as ph

NB = 4096  # hashed-bigram bucket count (DSIR uses a comparable 1e4)


def _bigram_buckets(dw: "ph.DocWords") -> tuple[np.ndarray, np.ndarray]:
    """-> (bucket per bigram OCCURRENCE, ascending doc index per bigram).
    Gram identity is the polyhash bigram fold ``(h1[i]*BASE_S +
    h1[i+1]) % M`` — the ``repetition_stats`` contract — bucketed
    ``% NB``."""
    h, wd = dw.h1, dw.word_doc
    z = np.empty(0, dtype=np.int64)
    if len(h) < 2:
        return z, z
    valid = np.nonzero(wd[:-1] == wd[1:])[0]
    if len(valid) == 0:
        return z, z
    g = ph._red(ph.mulmod(h[valid], np.uint64(ph.BASE_S)) + h[valid + 1])
    return (g % np.uint64(NB)).astype(np.int64), wd[valid]


def dsir_counts(
    ds: ray.data.Dataset,
    is_target_fn,
    text_col: str = "text",
) -> tuple[np.ndarray, np.ndarray]:
    """-> (target_counts[NB], all_counts[NB]) int64. ``is_target_fn``
    maps a pandas-friendly column dict -> bool mask per row."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        dw = ph.DocWords(texts)
        b, bdoc = _bigram_buckets(dw)
        tgt_mask = np.asarray(is_target_fn(t), dtype=bool)
        tc = np.zeros(NB, dtype=np.int64)
        ac = np.zeros(NB, dtype=np.int64)
        if len(b):
            np.add.at(ac, b, 1)
            tb = b[tgt_mask[bdoc]]
            if len(tb):
                np.add.at(tc, tb, 1)
        return pa.table(
            {
                "tgt": pa.array([tc.tolist()], pa.list_(pa.int64())),
                "all": pa.array([ac.tolist()], pa.list_(pa.int64())),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    tgt = np.zeros(NB, dtype=np.int64)
    allc = np.zeros(NB, dtype=np.int64)
    for r in rows:
        tgt += np.asarray(r["tgt"], dtype=np.int64)
        allc += np.asarray(r["all"], dtype=np.int64)
    return tgt, allc


def dsir_score(
    ds: ray.data.Dataset,
    counts_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """-> (doc_id, n_bigrams, score_ppm, sampled). ``counts_ref`` is
    ``ray.put((target_counts, all_counts))``."""

    def score(t: pa.Table) -> pa.Table:
        tgt, allc = ray.get(counts_ref)
        ids = t.column(id_col).to_numpy()
        texts = t.column(text_col).to_pylist()
        n = len(texts)
        dw = ph.DocWords(texts)
        b, bdoc = _bigram_buckets(dw)
        nb = np.zeros(n, dtype=np.int64)
        st = np.zeros(n, dtype=np.int64)
        ss = np.zeros(n, dtype=np.int64)
        if len(b):
            np.add.at(nb, bdoc, 1)
            np.add.at(st, bdoc, tgt[b])
            np.add.at(ss, bdoc, allc[b])
        # int64 bound: st*1e6 must not wrap (numpy wraps silently).
        # st <= doc_bigrams * max-bucket-count, so the documented
        # doc_bigrams*target_bigrams < 9.2e12 bound is enforced here at
        # runtime; past it, fall back to exact Python-int division.
        if len(st) and int(st.max()) >= 2**63 // 1_000_000:
            score_ppm = np.array(
                [int(a) * 1_000_000 // int(b_) if b_ > 0 else 0
                 for a, b_ in zip(st.tolist(), ss.tolist())],
                dtype=np.int64,
            )
        else:
            score_ppm = np.where(
                ss > 0, (st * 1_000_000) // np.maximum(ss, 1), 0
            )
        fp = ph.int_fingerprints(ids)
        sampled = (fp % np.uint64(1_000_000)).astype(np.int64) < score_ppm
        return pa.table(
            {
                "doc_id": ids.astype(np.int64),
                "n_bigrams": nb,
                "score_ppm": score_ppm.astype(np.int64),
                "sampled": sampled,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def sql_dsir(table: str = "documents") -> str:
    """Full DuckDB statement, value-identical to ``dsir_counts`` +
    ``dsir_score`` with the srcN % 4 == 0 target slice: per-doc
    (doc_id, n_bigrams, score_ppm, sampled)."""
    return f"""
WITH d AS (
  SELECT doc_id, source, {ph.sql_word_list('text')} AS ws FROM {table}
),
hw AS (
  SELECT doc_id,
    (CAST(substring(source, 4) AS BIGINT) % 4 = 0) AS is_tgt,
    list_transform(ws, w -> {ph.sql_word_hash('w', ph.BASE_W1)}) AS hs
  FROM d
),
g2 AS (
  SELECT doc_id, is_tgt,
    unnest(list_transform(range(1, len(hs)),
      i -> ((hs[i]*{ph.BASE_S} + hs[i+1]) % {ph.MOD}) % {NB})) AS b
  FROM hw
),
tc AS (SELECT b, count(*)::HUGEINT AS c FROM g2 WHERE is_tgt GROUP BY b),
ac AS (SELECT b, count(*)::HUGEINT AS c FROM g2 GROUP BY b),
sc AS (
  SELECT g2.doc_id, count(*)::BIGINT AS n_bigrams,
    sum(coalesce(tc.c, 0))::HUGEINT AS st, sum(ac.c)::HUGEINT AS ss
  FROM g2 LEFT JOIN tc USING (b) JOIN ac USING (b)
  GROUP BY g2.doc_id
)
SELECT d.doc_id, coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
  coalesce((sc.st * 1000000) // sc.ss, 0)::BIGINT AS score_ppm,
  (({ph.sql_fingerprint('d.doc_id::VARCHAR')}) % 1000000)
    < coalesce((sc.st * 1000000) // sc.ss, 0) AS sampled
FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id
"""
