"""Mergeable sketches for corpus-scale statistics.

HyperLogLog distinct counting: per-batch register partials (one
16 KiB row per batch) merged by elementwise max — the canonical
mergeable-aggregate shape, so a 100 TB cardinality estimate moves
kilobytes per task instead of shuffling the key column. The hash is
SplitMix64 (public-domain finalizer, deterministic across processes —
never ``builtins.hash``), so estimates are bit-reproducible.

Approximate by construction (~1.04/sqrt(2^p) relative error, ~0.8% at
p=14): no value oracle exists; correctness is pinned by tests
asserting error bounds against exact distinct counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

HLL_P = 14
HLL_M = 1 << HLL_P
_U = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (SplitMix64 finalizer), vectorized."""
    z = x.astype(np.uint64) + _U(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
    return z ^ (z >> _U(31))


_SUFFIX_BITS = 64 - HLL_P  # 50: a suffix value is exact in float64


def hll_registers(values: np.ndarray) -> np.ndarray:
    """int64/uint64 values -> (HLL_M,) uint8 register array.

    idx = top p hash bits; rank = leading zeros of the low 50-bit
    suffix + 1 (51 for an all-zero suffix). 50-bit ints are exactly
    representable in float64, so the vectorized CLZ (floor(log2)) is
    exact after a one-sided fix-up: float rounding can only report a
    top-bit position one too HIGH (log2(2^k - eps) rounding up to k),
    detected by (w >> b) == 0.
    """
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = splitmix64(values.astype(np.uint64))
    idx = (h >> _U(_SUFFIX_BITS)).astype(np.int64)
    w = h & _U((1 << _SUFFIX_BITS) - 1)
    rank = np.full(len(h), _SUFFIX_BITS + 1, dtype=np.uint8)
    nz = w != 0
    wnz = w[nz]
    b = np.floor(np.log2(wnz.astype(np.float64))).astype(np.int64)
    over = (wnz >> b.astype(np.uint64)) == 0
    b[over] -= 1
    rank[nz] = (_SUFFIX_BITS - b).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(HLL_M, dtype=np.uint8)
    for p in parts:
        np.maximum(out, p, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator with small-range linear counting."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    e = alpha * m * m / inv.sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return int(round(e))


def distinct_count_hll(
    ds: ray.data.Dataset, column: str
) -> tuple[int, np.ndarray]:
    """-> (estimate, merged registers). Per-batch partials, driver merge
    of one small row per batch (a combiner tree; the column itself never
    leaves the tasks)."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(column).to_numpy(zero_copy_only=False)
        regs = hll_registers(np.asarray(vals))
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = hll_merge([np.asarray(r["regs"], dtype=np.uint8) for r in rows])
    return hll_estimate(merged), merged


# ------------------------------------------------- count-min sketch

CMS_WIDTH = 8192
CMS_DEPTH = 4


def _cms_rows(terms, width: int, depth: int) -> np.ndarray:
    """(depth, n_terms) column indexes — one vectorized seeded-xxhash
    pass per depth row (polars ``Series.hash``; never ``builtins.hash``,
    whose per-process salt would break partial mergeability)."""
    import polars as pl

    if not isinstance(terms, pl.Series):
        terms = pl.Series(terms, dtype=pl.String)
    return np.stack(
        [
            (terms.hash(seed=d).to_numpy() % np.uint64(width)).astype(np.int64)
            for d in range(depth)
        ]
    )


def cms_term_counts(
    ds: ray.data.Dataset,
    column: str = "text",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> np.ndarray:
    """Merged (depth, width) int64 count-min sketch of whitespace-term
    frequencies over a text column.

    The second mergeable sketch next to HLL: per-batch the word stream
    collapses to (term, n) partials (polars explode + group_by), those
    scatter-add into a fixed ``depth x width`` counter matrix, and ONE
    ~256 KiB row per batch reaches the driver, merged by elementwise
    sum — the vocabulary never leaves the tasks, so the frequency-table
    cost is corpus-size independent (vs the exact ``_term_counts``
    shuffle). Point estimates are upper bounds with overestimate
    <= 2 * total_tokens / width at probability >= 1 - 2^-depth
    (Cormode-Muthukrishnan); the bound is pinned in tests."""
    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        pf = pl.from_arrow(t.select([column]))
        w = (
            pf.select(
                pl.col(column).str.extract_all(r"[^ \t\n\x0b\x0c\r]+").alias("w")
            )
            .explode("w", empty_as_null=True)
            .drop_nulls("w")
        )
        agg = w.group_by("w").agg(pl.len().alias("n"))
        cnt = agg["n"].to_numpy().astype(np.int64)
        mat = np.zeros((depth, width), dtype=np.int64)
        if len(cnt):
            rows = _cms_rows(agg["w"], width, depth)
            for d in range(depth):
                np.add.at(mat[d], rows[d], cnt)
        return pa.table({"regs": pa.array([mat.ravel()], pa.list_(pa.int64()))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = np.zeros(depth * width, dtype=np.int64)
    for r in rows:
        out += np.asarray(r["regs"], dtype=np.int64)
    return out.reshape(depth, width)


def cms_estimate(mat: np.ndarray, terms: list[str]) -> np.ndarray:
    """Point estimates (min over depth rows) for each term."""
    depth, width = mat.shape
    if not terms:
        return np.empty(0, dtype=np.int64)
    rows = _cms_rows(terms, width, depth)
    est = mat[0][rows[0]]
    for d in range(1, depth):
        est = np.minimum(est, mat[d][rows[d]])
    return est.astype(np.int64)


# ---------------------------------------------------------------- quantiles

QS_MANT_BITS = 12  # relative error <= 2^(1-12) = 2^-11 (~0.05%)


def quantile_buckets(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """float64 values -> (sorted unique bucket representatives, counts).

    The bucket grid is value-independent and deterministic: each double
    keeps its sign, exponent, and top ``QS_MANT_BITS`` mantissa bits
    (floor toward zero) — a floating-point floor that guarantees
    ``|bucket_rep - v| <= 2^(1-QS_MANT_BITS) * |v|`` (the mantissa is
    in [0.5, 1), so a 2^-QS_MANT_BITS mantissa floor is at most
    2^(1-QS_MANT_BITS) of the value). Because the grid is
    fixed, partial (rep, count) histograms from any partitioning merge
    by summing counts per rep — the mergeable-aggregate shape (same
    topology as the HLL registers), with size bounded by the number of
    POPULATED buckets, not the row count.

    One vectorized pass: ``np.frexp`` + floor; non-finite inputs are
    dropped (pandas groupby would silently refuse to merge NaN keys —
    the sketch is defined over finite values, like SQL quantiles)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[np.isfinite(v)]
    nonzero = v != 0  # zero has no mantissa bucket; keep it verbatim
    m, e = np.frexp(v)
    scale = float(1 << QS_MANT_BITS)
    mq = np.trunc(m * scale) / scale  # toward zero: floor on |mantissa|
    b = np.where(nonzero, np.ldexp(mq, e), v)
    reps, counts = np.unique(b, return_counts=True)
    return reps, counts.astype(np.int64)


def quantile_sketch(
    ds: ray.data.Dataset,
    col: str,
    ps: list[float],
) -> "list[float]":
    """Distributed one-pass approximate quantiles of a float column
    with a RELATIVE error bound of 2^(1-QS_MANT_BITS) per value.

    Per-batch (rep, count) histogram partials (combiner), a coarse
    16-bucket in-bucket merge (never a high-cardinality groupby), and
    the quantile read-off on the aggregated histogram — the exact
    ``docs_token_quantiles`` topology generalized from small-int
    domains to arbitrary doubles via the fixed mantissa grid. Read-off
    uses the quantile_disc convention (index ceil(p*n)-1 ascending)."""
    import math

    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        reps, counts = quantile_buckets(t.column(col).to_numpy())
        hb = (reps.view(np.uint64) >> _U(40)).astype(np.int64) % 16
        return pa.table({"rep": reps, "cnt": counts, "hb": hb.astype(np.int32)})

    def merge_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.groupby("rep", sort=False, as_index=False)["cnt"].sum()

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(merge_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("rep")
    )
    reps = hist["rep"].to_numpy()
    cum = np.cumsum(hist["cnt"].to_numpy())
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for p in ps:
        if n == 0:
            out.append(float("nan"))
            continue
        idx = max(0, math.ceil(p * n) - 1)
        out.append(float(reps[np.searchsorted(cum, idx + 1)]))
    return out


# ------------------------------------------------------------ Bloom filter

def bloom_build(
    ds: ray.data.Dataset,
    col: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
) -> np.ndarray:
    """Distributed Bloom filter over an int64 key column -> packed
    uint64 bitmap (n_bits/8 bytes; 1 MiB at the 2^23 default, ~0.1%
    FPR at 500k keys with 5 hashes).

    This is the documented swap-in for the broadcast key-SET anti
    joins (``customers_no_orders``, ``q22``) once the key side outgrows
    a Python set: per-batch bitmap partials (one packed row per batch,
    the HLL register topology), elementwise-OR fold on the driver,
    ``ray.put`` once. Querying is ``bloom_maybe_contains`` — false
    positives possible (bounded, tests pin the rate), false negatives
    impossible, so an anti join keyed on it must treat "maybe" as
    "present" and verify the maybes exactly (prefilter semantics)."""
    words = n_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bits = _bloom_bits(t.column(col).to_numpy(), n_bits, n_hashes)
        bm = np.zeros(words, dtype=np.uint64)
        np.bitwise_or.at(
            bm, (bits >> _U(6)).ravel().astype(np.int64), _U(1) << (bits % _U(64)).ravel()
        )
        return pa.table({"bm": pa.array([bm.view(np.int64).tolist()],
                                        pa.list_(pa.int64()))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = np.zeros(words, dtype=np.uint64)
    for r in rows:
        out |= np.asarray(r["bm"], dtype=np.int64).view(np.uint64)
    return out


def _bloom_bits(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit indices via double hashing
    h1 + i*h2 (Kirsch–Mitzenmacher), both splitmix64-derived."""
    k = np.asarray(keys, dtype=np.uint64)
    h1 = splitmix64(k)
    h2 = splitmix64(k ^ _U(0xA5A5A5A5A5A5A5A5)) | _U(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % _U(n_bits)


def bloom_maybe_contains(
    bitmap: np.ndarray, keys: np.ndarray, n_hashes: int = 5
) -> np.ndarray:
    """Vectorized membership probe -> bool mask (True = maybe present,
    False = definitely absent)."""
    n_bits = len(bitmap) * 64
    bits = _bloom_bits(keys, n_bits, n_hashes)
    words = bitmap[(bits >> _U(6)).astype(np.int64)]
    hit = (words >> (bits % _U(64))) & _U(1)
    return hit.all(axis=1)
