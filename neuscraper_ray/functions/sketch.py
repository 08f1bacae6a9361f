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
            .explode("w")
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
