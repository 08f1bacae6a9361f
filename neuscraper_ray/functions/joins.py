"""Large x large co-partitioned hash join.

The engine's other joins are broadcast (small side shipped once via
``ray.put``) and sentinel/anti joins; this module covers the remaining
case — both sides too large to broadcast. Shape: both sides are mapped
onto one UNIFIED Arrow schema (the other side's columns become typed
nulls, so integer dtypes survive) plus ``__side`` and a splitmix64 key
bucket; the two datasets UNION (a no-op for the streaming executor:
blocks flow through unchanged), one ``groupby(bucket)`` shuffle
co-locates matching keys, and the in-bucket join runs in polars (Rust
hash join on Arrow buffers).

Scale properties: exactly one all-to-all exchange (the same budget the
flagship pipeline pays for assembly); bucket fan-out is
``num_buckets`` regardless of key cardinality; per-bucket memory is
|rows|/B per side, so B scales with cluster size via
``config.NUM_BUCKETS``. Key skew lands a hot key in one bucket — the
usual answer is to pre-aggregate the many side per key BEFORE joining
(as ``queries.order_totals_join`` does), which this module composes
with instead of joining raw skewed fact tables.

Bucketing uses the vectorized splitmix64 finalizer over the int keys —
never ``builtins.hash`` (per-process salt would split groups).

Why not ``Dataset.join`` (native in Ray >= 2.46)? Measured head-to-head
on the ``order_totals_join`` shape at sf0.01: the native hash join
costs ~4 s (it rides the hash-shuffle aggregator-actor machinery,
whose actor-pool startup dominates locally) and, more fundamentally,
cannot fuse the per-key aggregation into the join — feeding it
combiner partials joins each PARTIAL row (wrong result for an
aggregate right side), so it would require the full high-cardinality
``groupby().aggregate()`` first, the exact cost this module exists to
avoid. On a long-lived multi-node cluster where the aggregator pool
amortizes, the native join is a fine choice for plain (non-aggregating)
joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from neuscraper_ray.config import NUM_BUCKETS
from neuscraper_ray.functions.sketch import splitmix64


def _bucket_i64(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Process-stable int64 -> bucket id in one vectorized numpy pass
    (splitmix64 finalizer — never ``builtins.hash``, whose per-process
    salt would split groups; never a per-row Python crc32 loop, which
    was this join's hottest remaining Python kernel)."""
    return (splitmix64(keys.astype(np.uint64)) % np.uint64(num_buckets)).astype(
        np.int32
    )


def str_buckets(strs, num_buckets: int) -> np.ndarray:
    """Process-stable bucket ids for STRING keys in one vectorized
    polars pass (xxhash, fixed seed — deterministic across worker
    processes, unlike ``builtins.hash``; no per-row Python loop,
    unlike the fromiter-crc32 pattern this replaces). Accepts a list
    or a pyarrow (Chunked)Array (zero-copy into polars).

    In-flight partitioning only: bucket ids never persist, so
    cross-library-version hash stability is not required — only
    within-run determinism, which a seeded xxhash provides."""
    import polars as pl

    if isinstance(strs, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(strs)
        n = len(s)
    else:
        n = len(strs)
        s = pl.Series(strs, dtype=pl.String)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    return (s.hash(seed=0).to_numpy() % np.uint64(num_buckets)).astype(np.int32)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    how: str = "inner",
    num_buckets: int = NUM_BUCKETS,
    right_prepare=None,
    left_prepare=None,
    post_join=None,
) -> ray.data.Dataset:
    """Co-partitioned hash join on int64 OR string keys -> Dataset with
    the key (named ``left_on``) + both sides' payload columns. String
    keys bucket via the vectorized seeded-xxhash ``str_buckets`` pass
    (zero-copy Arrow -> polars), int keys via splitmix64.

    Schemas are passed explicitly (calling ``.schema()`` on a lazy
    upstream would execute it twice). Non-key column names must be
    disjoint; ``how`` is "inner" or "left".

    ``right_prepare`` / ``left_prepare`` (optional, polars DataFrame ->
    DataFrame, keyed by ``left_on``) run on their side INSIDE each
    bucket before the join. This fuses per-key work into the join's
    own shuffle — aggregate-before-join on the right (feed combiner
    partials, finish the sum here), dedup/filter on the left (all
    copies of a key land in one bucket, so in-bucket dedup is global)
    — one all-to-all total, and never a high-cardinality
    ``Dataset.groupby().aggregate()`` (whose per-group Python cost
    dwarfs the data at scale).

    ``post_join`` (optional, polars DataFrame -> DataFrame) runs on
    the JOINED frame inside each bucket — the fusion point for a
    low-cardinality final aggregate: emit per-bucket partials here and
    finish them on the driver (<= num_buckets x groups rows), instead
    of paying a third all-to-all for a trailing
    ``groupby().aggregate()`` whose input is already tiny.
    """
    l_payload = [f for f in left_schema if f.name != left_on]
    r_payload = [f for f in right_schema if f.name != right_on]
    overlap = {f.name for f in l_payload} & {f.name for f in r_payload}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    key_type = left_schema.field(left_on).type
    str_key = pa.types.is_string(key_type) or pa.types.is_large_string(key_type)
    unified = pa.schema(
        [pa.field(left_on, key_type)]
        + l_payload
        + r_payload
        + [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int32())]
    )
    l_names = [f.name for f in l_payload]
    r_names = [f.name for f in r_payload]

    def widen(side: int, key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            keys = (
                t.column(key_col) if str_key else t.column(key_col).to_numpy()
            )
            cols = {left_on: t.column(key_col)}
            for f in l_payload + r_payload:
                cols[f.name] = (
                    t.column(f.name)
                    if f.name in t.schema.names
                    else pa.nulls(n, f.type)
                )
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            cols["__bucket"] = pa.array(
                str_buckets(keys, num_buckets)
                if str_key
                else _bucket_i64(keys, num_buckets)
            )
            return pa.table(cols, schema=unified)

        return fn

    both = left.map_batches(widen(0, left_on), batch_format="pyarrow").union(
        right.map_batches(widen(1, right_on), batch_format="pyarrow")
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        lf = df.filter(pl.col("__side") == 0).select([left_on] + l_names)
        rf = df.filter(pl.col("__side") == 1).select([left_on] + r_names)
        if left_prepare is not None:
            lf = left_prepare(lf)
        if right_prepare is not None:
            rf = right_prepare(rf)
        joined = lf.join(rf, on=left_on, how="inner" if how == "inner" else "left")
        if post_join is not None:
            joined = post_join(joined)
        return joined.to_arrow()

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
