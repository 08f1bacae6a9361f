"""Benchmark decontamination: flag training documents that share
word-shingles with a benchmark/eval set.

The standard large-scale recipe (GPT-3 appendix C / Gopher §A.3): hash
every k-word shingle of the benchmark set into a membership structure,
broadcast it, and scan the corpus once, counting per-document overlap.
Benchmark sets are small by construction (an eval suite, not a second
corpus), so the broadcast side stays tiny even at 100 TB of corpus:
the distinct-shingle array for a benchmark of B total words is <= B
uint32s, shipped once per node via ``ray.put`` and read zero-copy by
every task. If the "benchmark" were itself corpus-sized, the right
shape is a shuffle join keyed on shingle hash (both sides bucketed by
``s32 % num_buckets``) — not implemented because it contradicts the
operator's contract.

Shingles are the SAME polyhash word-3-gram contract the MinHash
family uses (``polyhash.doc_shingles32``), so the whole operator is
value-verifiable against DuckDB (``polyhash.sql_decontaminate``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from neuscraper_ray.config import NUM_BUCKETS
from neuscraper_ray.functions.polyhash import DocWords, doc_shingles32

DEFAULT_MODULUS = 20  # doc_id % modulus == 0 -> benchmark member


def _doc_shingles(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    dw = DocWords(texts)
    return doc_shingles32(dw)


def benchmark_shingle_array(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    modulus: int = DEFAULT_MODULUS,
) -> np.ndarray:
    """Distinct shingles of the benchmark rows -> sorted uint64 array.

    Per-batch unique (map-side combiner), then a coarse-bucket
    shuffle with one vectorized np.unique per bucket (never
    ``Dataset.unique`` — one Ray group per distinct value); only the
    final distinct set (small by the operator's contract) reaches the
    driver, as one list row per bucket.
    """

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        keep = ids % modulus == 0
        if not keep.any():
            return pa.table(
                {
                    "s32": pa.array([], pa.int64()),
                    "sb": pa.array([], pa.int32()),
                }
            )
        texts = t.filter(pa.array(keep)).column(text_col).to_pylist()
        sh32, _ = _doc_shingles(texts)
        u = np.unique(sh32).astype(np.int64)
        # distinct via a coarse-bucket shuffle, NOT Dataset.unique
        # (which groups per VALUE — per-group Python at shingle
        # cardinality); in-bucket distinct is one np.unique
        return pa.table({"s32": u, "sb": (u % NUM_BUCKETS).astype(np.int32)})

    def distinct_bucket(df) -> "pa.Table":
        u = np.unique(df["s32"].to_numpy())
        return pa.table({"vals": pa.array([u.tolist()], pa.list_(pa.int64()))})

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(distinct_bucket, batch_format="pandas")
        .take_all()
    )  # <= NUM_BUCKETS rows, one distinct-shingle list per bucket
    if not rows:
        return np.empty(0, dtype=np.uint64)
    vals = np.concatenate([np.asarray(r["vals"], dtype=np.int64) for r in rows])
    return np.sort(vals.astype(np.uint64))


def decontaminate(
    ds: ray.data.Dataset,
    bench_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
    modulus: int = DEFAULT_MODULUS,
) -> ray.data.Dataset:
    """-> (doc_id, n_shared, contaminated) for non-benchmark docs.

    ``bench_ref`` is ``ray.put(benchmark_shingle_array(...))``; lookups
    are two vectorized ``searchsorted`` passes per batch. n_shared
    counts the doc's DISTINCT shingles present in the benchmark set.
    """

    def mark(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = t.column(id_col).to_numpy()
        keep = ids % modulus != 0
        ids = ids[keep]
        texts = t.filter(pa.array(keep)).column(text_col).to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                    "contaminated": pa.array([], pa.bool_()),
                }
            )
        sh32, sh_doc = _doc_shingles(texts)
        if len(bench):
            ix = np.searchsorted(bench, sh32)
            ix[ix == len(bench)] = 0
            hit = bench[ix] == sh32
        else:
            hit = np.zeros(len(sh32), dtype=bool)
        n_shared = np.bincount(sh_doc[hit], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": ids.astype(np.int64),
                "n_shared": n_shared,
                "contaminated": n_shared > 0,
            }
        )

    return ds.map_batches(mark, batch_format="pyarrow")


def span_decontaminate(
    ds: ray.data.Dataset,
    bench_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
    modulus: int = DEFAULT_MODULUS,
) -> ray.data.Dataset:
    """SPAN-level decontamination: instead of dropping a contaminated
    document (``decontaminate``), remove only the words covered by a
    benchmark-matching word-3-gram window and keep the rest — the
    surgical variant used when the corpus is too valuable to drop
    whole docs over one leaked sentence.
    -> ``(doc_id, n_words, n_removed, text_clean)`` for every
    non-benchmark doc (words rejoined with ' '; docs with 0 < n < 3
    words match on their single all-words shingle and are removed
    whole when it hits; empty docs pass through).

    Same scale shape as ``decontaminate`` — broadcast sorted benchmark
    array, vectorized searchsorted per batch, ZERO corpus shuffle; the
    removal reuses the ExactSubstr span-coverage kernel
    (``dedup._apply_span_removal``). SQL twin:
    ``polyhash.sql_span_decontaminate``."""
    from neuscraper_ray.functions import polyhash as ph
    from neuscraper_ray.functions.dedup import (
        _apply_span_removal,
        _rolling_window_hashes,
    )

    _MASK32 = np.uint64(0xFFFFFFFF)

    def clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bench = ray.get(bench_ref)
        ids = t.column(id_col).to_numpy()
        keep = ids % modulus != 0
        ids = ids[keep].astype(np.int64)
        texts = t.filter(pa.array(keep)).column(text_col).to_pylist()
        n = len(texts)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
                "text_clean": pa.array([], pa.string()),
            }
        )
        if n == 0:
            return empty

        def in_bench(s32: np.ndarray) -> np.ndarray:
            if not len(bench) or not len(s32):
                return np.zeros(len(s32), dtype=bool)
            ix = np.searchsorted(bench, s32)
            ix[ix == len(bench)] = 0
            return bench[ix] == s32

        dw = ph.DocWords(texts)
        win_doc, win_idx, wh = _rolling_window_hashes(dw, 3)
        hit = in_bench(wh.astype(np.uint64) & _MASK32)
        mdoc, mwin = ids[win_doc[hit]], win_idx[hit]
        o = np.lexsort((mwin, mdoc))
        out = _apply_span_removal(ids, texts, mdoc[o], mwin[o], 3)

        # short docs (0 < n_words < 3) carry one all-words shingle —
        # no full window exists, so they are matched (and removed
        # whole) separately; the rare-tail loop mirrors
        # polyhash.doc_shingles32's short path
        n_words = (dw.wend - dw.wstart).astype(np.int64)
        short = np.nonzero((n_words > 0) & (n_words < 3))[0]
        short_rm = np.zeros(n, dtype=bool)
        if len(short):
            folds = np.zeros(len(short), dtype=np.uint64)
            for j, d in enumerate(short):
                s = np.zeros(1, dtype=np.uint64)
                for w in range(dw.wstart[d], dw.wend[d]):
                    s = ph._red(ph.mulmod(s, np.uint64(ph.BASE_S)) + dw.h1[w])
                folds[j] = s[0]
            short_rm[short[in_bench(folds & _MASK32)]] = True

        n_tok = out.column("n_tokens").to_numpy()
        n_rem = np.where(short_rm, n_tok, out.column("n_removed").to_numpy())
        txt = pc.if_else(
            pa.array(short_rm), pa.scalar(""), out.column("text_dedup")
        )
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "n_words": pa.array(n_tok, pa.int64()),
                "n_removed": pa.array(n_rem.astype(np.int64), pa.int64()),
                "text_clean": txt,
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def contamination_frac(
    ds: ray.data.Dataset,
    bench_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
    modulus: int = DEFAULT_MODULUS,
) -> ray.data.Dataset:
    """-> (doc_id, n_shingles, n_shared, contam_ppm) for non-benchmark
    docs: the graded variant of ``decontaminate`` — instead of a binary
    flag, the FRACTION of each doc's distinct shingles found in the
    benchmark set, in exact ppm (integer division — no float ties).
    Pipelines threshold this to distinguish verbatim eval leakage
    (high ppm) from incidental phrase overlap (low ppm).

    Same scale shape as ``decontaminate``: broadcast sorted benchmark
    array, two searchsorted passes per batch, zero corpus shuffle."""

    def mark(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = t.column(id_col).to_numpy()
        keep = ids % modulus != 0
        ids = ids[keep]
        texts = t.filter(pa.array(keep)).column(text_col).to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_shingles": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                    "contam_ppm": pa.array([], pa.int64()),
                }
            )
        sh32, sh_doc = _doc_shingles(texts)
        n_shingles = np.bincount(sh_doc, minlength=n).astype(np.int64)
        if len(bench):
            ix = np.searchsorted(bench, sh32)
            ix[ix == len(bench)] = 0
            hit = bench[ix] == sh32
        else:
            hit = np.zeros(len(sh32), dtype=bool)
        n_shared = np.bincount(sh_doc[hit], minlength=n).astype(np.int64)
        # every doc contributes >= 1 shingle (zero-word docs shingle to
        # 0), so the divisor is never zero
        ppm = (n_shared * 1_000_000) // n_shingles
        return pa.table(
            {
                "doc_id": ids.astype(np.int64),
                "n_shingles": n_shingles,
                "n_shared": n_shared,
                "contam_ppm": ppm,
            }
        )

    return ds.map_batches(mark, batch_format="pyarrow")
