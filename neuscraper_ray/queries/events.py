"""Events-table operators: sessionization, windows, sketches, sampling.

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


def events_type_agg(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])
    agg = _preagg_sum(ds, ["event_type"], ["value"], count_alias="n_events")
    df = agg.to_pandas().rename(columns={"value": "total_value"})
    df["total_value"] = df["total_value"].round(2)
    df["n_events"] = df["n_events"].astype("int64")
    return df[["event_type", "n_events", "total_value"]]


def events_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "value"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.floor("h")
        return df[["hour", "value"]]

    hours = ds.map_batches(add_hour, batch_format="pandas")
    agg = _preagg_sum(hours, ["hour"], ["value"], count_alias="n_events")
    df = agg.to_pandas().rename(columns={"value": "total_value"})
    df["total_value"] = df["total_value"].round(2)
    df["n_events"] = df["n_events"].astype("int64")
    return df[["hour", "n_events", "total_value"]]


def events_user_sessions(sf_dir: str):
    """Sessionization: a new session starts after a >30-minute gap.

    Streaming-shaped operator (SURVEY §2.10): per-user ordered scan,
    expressed as groupby(user).map_groups over ts-sorted groups. At
    10^12 scale the key would be bucketed (hash(user) % B) with the
    same in-bucket pandas body.
    """
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all events of every user in this bucket: vectorized per-user scan
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new_s = prev.isna() | ((df["ts"] - prev) > pd.Timedelta(minutes=30))
        out = (
            new_s.groupby(df["user_id"], sort=False)
            .sum()
            .rename("n_sessions")
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")
    return bucketed.groupby("bucket").map_groups(
        sessions_bucket, batch_format="pandas"
    )


def events_late_arrivals(sf_dir: str, lateness_min: int = 10):
    """Watermark / late-data detection (the Beam/Flink allowed-lateness
    rule, SURVEY §2.10 streaming family): a per-user watermark tracks
    the max EVENT-time seen so far in ARRIVAL order; an event arriving
    more than ``lateness_min`` minutes behind the watermark of its
    user's earlier arrivals is LATE (a streaming engine would route it
    to a side output / trigger a window retraction).
    -> (event_id, user_id, behind_us, late) per event.

    The synthetic log is already event-time-ordered per user (storage
    order = ``event_id`` = time order), under which no event is ever
    late — so the query replays it in a DETERMINISTIC shuffled arrival
    order, ``(fingerprint(event_id) % 999983, event_id)`` (the mod
    breaks the base-257 digit fold's monotonicity in the id), the engine-
    independent permutation both sides share (``polyhash``); the
    operator body is arrival-order-agnostic.

    Scale shape: the sessionization topology — ONE keyed exchange on
    ``user_id % B``, in-bucket sort + per-user vectorized running max
    (cummax + shift); no state actor, no per-user Python. SQL twin:
    ``max(ts) OVER (PARTITION BY user_id ORDER BY fp, event_id ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)``."""
    from neuscraper_ray.functions.polyhash import int_fingerprints

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    late_us = np.int64(lateness_min * 60 * 1_000_000)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(fp=int_fingerprints(df["event_id"].to_numpy()) % 999983)
        df = df.sort_values(["user_id", "fp", "event_id"], kind="mergesort")
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        wm_prev = (
            pd.Series(ts_us, index=df.index).groupby(
                df["user_id"], sort=False
            ).cummax()
        ).groupby(df["user_id"], sort=False).shift()
        behind = (wm_prev.to_numpy() - ts_us).astype("float64")
        behind = np.nan_to_num(behind, nan=0.0)
        behind = np.maximum(behind, 0.0).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "behind_us": behind,
                "late": behind > late_us,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(mark, batch_format="pandas")
    )


def events_rolling_count(sf_dir: str):
    """Sliding window: per event, count of same-user events in the
    last 15 minutes (inclusive RANGE semantics, matching SQL
    ``RANGE BETWEEN INTERVAL 15 MINUTE PRECEDING AND CURRENT ROW``).

    Bucketed sorted scan: per-user ranges are embedded in disjoint
    composite-key intervals so TWO searchsorted calls over the whole
    bucket answer every user's window — no per-event work, no per-user
    Python loop, no state actor.
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        # One vectorized pass over the whole bucket — no per-user Python
        # loop. After sorting by (user, ts), embed each user's events in
        # a disjoint composite-key range key = user_rank*K + ts_rel with
        # K > ts_span + delta, so a single global searchsorted answers
        # every user's window query: a left probe at ts-delta can go at
        # most `delta` below the user's range start, which still lands
        # strictly above the previous user's range end.
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        delta = np.int64(15 * 60 * 1_000_000)
        urank = pd.factorize(df["user_id"].to_numpy())[0].astype(np.int64)
        ts_rel = ts - (ts.min() if len(ts) else 0)
        K = (ts_rel.max() if len(ts) else 0) + delta + 2
        key = urank * K + ts_rel
        left = np.searchsorted(key, key - delta, side="left")
        right = np.searchsorted(key, key, side="right")
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "n_15min": (right - left).astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(windows, batch_format="pandas")
    )


def events_sample(sf_dir: str):
    """Seeded shuffle (O4 parity) + DETERMINISTIC 5% hash sample: keep
    a row iff ``fingerprint(str(event_id)) % 20 == 0``.

    Unlike a seeded ``random_sample`` (engine-specific RNG, rows-only
    checkable), the kept SET is engine-independent — the DuckDB oracle
    reproduces it exactly (``sql_fingerprint(event_id::VARCHAR)``).
    Hash-sampling is also the scale-correct semantics: it streams with
    ZERO shuffle and re-runs pick the same rows, with the gate one
    vectorized ``int_fingerprints`` pass (no per-row digest loop).
    The O4 seeded ``random_shuffle`` operator is exercised in
    ``tests/test_sources_warc.py`` (fixed-seed permutation pinned
    deterministic) instead of here — the kept set is a pure function
    of ``event_id``,
    so an all-to-all bought only for demonstration would be a
    scale-killer at 10^12 rows."""
    from neuscraper_ray.functions.polyhash import int_fingerprints

    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = int_fingerprints(df["event_id"].to_numpy())
        return df[h % 20 == 0]

    return ds.map_batches(keep, batch_format="pandas")


def events_asof_join(sf_dir: str):
    """As-of join (custom operator Ray Data lacks): each purchase event
    matched to the user's most recent view event at-or-before its ts.

    Partitioning assumption (documented per the custom-operator rule):
    both sides co-partition on ``user_id % NUM_BUCKETS``, so every
    (purchase, candidate-view) pair meets inside one bucket; in-bucket
    the match is ONE vectorized ``searchsorted`` over composite
    (user-rank, ts) keys covering every user at once. Emits microsecond-exact gaps so the DuckDB
    ``ASOF JOIN`` oracle agrees bit-for-bit; ties on (user, ts) are
    payload-neutral (we emit the matched ts, not an id)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def asof_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # One vectorized pass: composite key user_rank*K + ts_rel makes
        # each user's views a contiguous sorted range, so a single
        # searchsorted over ALL views answers every purchase's as-of
        # probe; a probe landing outside the buyer's own view range
        # (user with no view at-or-before) is rejected by the user
        # equality check. No per-user Python loop.
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        if not len(df):
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype=np.int64),
                    "view_ts": pd.Series(dtype="datetime64[us]"),
                    "gap_us": pd.Series(dtype=np.int64),
                }
            )
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        ts_i = ts.astype(np.int64)
        urank = pd.factorize(df["user_id"].to_numpy())[0].astype(np.int64)
        ts_rel = ts_i - ts_i.min()
        K = ts_rel.max() + 2
        key = urank * K + ts_rel
        etype = df["event_type"].to_numpy()
        vm = etype == "view"
        bm = etype == "purchase"
        vkey, vts, vuser = key[vm], ts[vm], urank[vm]
        bkey = key[bm]
        ix = np.searchsorted(vkey, bkey, side="right") - 1
        ok = ix >= 0
        ok[ok] = vuser[ix[ok]] == urank[bm][ok]
        matched = vts[ix[ok]]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[bm][ok],
                "view_ts": matched,
                "gap_us": (ts[bm][ok] - matched)
                .astype("timedelta64[us]")
                .astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(asof_bucket, batch_format="pandas")
    )


def events_distinct_users_hll(sf_dir: str):
    """Approximate distinct-user count via a mergeable HyperLogLog
    sketch (p=14, ~0.8% expected error): per-batch 16 KiB register
    partials, merged by elementwise max — the user_id column never
    leaves the tasks. Rows-only by construction (approximate, no SQL
    value oracle); the error bound vs exact distinct is pinned in
    tests/test_functions.py."""
    from neuscraper_ray.functions.sketch import distinct_count_hll

    ds = _read(sf_dir, "events", ["user_id"])
    est, _ = distinct_count_hll(ds, "user_id")
    return pd.DataFrame({"estimate": np.asarray([est], dtype=np.int64)})


def events_distinct_types(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


def events_top_users(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "value"])
    agg = _preagg_sum(ds, ["user_id"], ["value"])
    top = (
        agg.sort(["value", "user_id"], descending=[True, False]).limit(10).to_pandas()
    )
    top["total_value"] = top["value"].round(2)
    top["user_id"] = top["user_id"].astype("int64")
    return top[["user_id", "total_value"]]


def events_type_dow_pivot(sf_dir: str):
    """Pivot / unstack: events counted per (type, day-of-week), widened
    to one ``dow_0..dow_6`` column per weekday (Monday = 0, matching
    SQL ``isodow(ts) - 1``).

    Scale shape: the long-form aggregate is a per-batch combiner plus a
    tiny |types| x 7 groupby; the pivot itself runs on the driver over
    that output-sized frame — the corpus is never reshaped."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["dow"] = df["ts"].dt.dayofweek.astype(np.int32)
        return (
            df.groupby(["event_type", "dow"], sort=False)
            .size()
            .reset_index(name="cnt")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "dow"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    types = sorted(agg["event_type"].unique())
    out = pd.DataFrame({"event_type": types})
    for d in range(7):
        sel = agg[agg["dow"] == d].set_index("event_type")["cnt"]
        out[f"dow_{d}"] = (
            out["event_type"].map(sel).fillna(0).astype("int64")
        )
    return out


def events_purchase_view_window(sf_dir: str):
    """Range (interval) join: per purchase event, the count of the same
    user's view events in the hour strictly before the purchase —
    ``v.ts >= p.ts - 1h AND v.ts < p.ts`` — zero-view purchases kept.

    Partitioning assumption (documented per the custom-operator rule):
    both event roles co-partition on ``user_id % NUM_BUCKETS``, so every
    (purchase, candidate-view) pair meets inside one bucket. In-bucket
    the interval probe is TWO vectorized ``searchsorted`` calls over
    composite ``user_rank * K + ts_rel`` keys with ``K > span + delta``:
    a lower probe at ``ts - delta`` can dip at most ``delta`` below the
    buyer's range start, still strictly above the previous user's range
    end, so no per-user Python loop and no cross-user bleed (same
    argument as ``events_rolling_count``)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def range_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        if not len(df):
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype=np.int64),
                    "n_views_1h": pd.Series(dtype=np.int64),
                }
            )
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        delta = np.int64(60 * 60 * 1_000_000)
        urank = pd.factorize(df["user_id"].to_numpy())[0].astype(np.int64)
        ts_rel = ts - ts.min()
        K = ts_rel.max() + delta + 2
        key = urank * K + ts_rel
        etype = df["event_type"].to_numpy()
        vm = etype == "view"
        bm = etype == "purchase"
        vkey, bkey = key[vm], key[bm]
        lo = np.searchsorted(vkey, bkey - delta, side="left")
        hi = np.searchsorted(vkey, bkey, side="left")
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[bm],
                "n_views_1h": (hi - lo).astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(range_bucket, batch_format="pandas")
    )


def events_distinct_users_by_type(sf_dir: str):
    """Distributed EXACT grouped distinct count (``count(DISTINCT
    user_id)`` per event type) — the exact counterpart of the HLL
    sketch, for when the answer must be a number, not an estimate.

    Scale shape: each batch first collapses to its distinct (type,
    user) pairs (combiner — repeat-heavy streams shrink immediately),
    pairs co-partition on a splitmix64 USER bucket so a pair's every
    occurrence lands in one bucket, the in-bucket distinct is therefore
    global, and only per-(bucket, type) count partials reach the final
    tiny groupby. The user column never leaves the cluster un-deduped;
    never ``Dataset.unique`` (one Ray group per distinct value)."""
    from neuscraper_ray.functions.sketch import splitmix64

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(["event_type", "user_id"]).copy()
        u["bucket"] = (
            splitmix64(u["user_id"].to_numpy().astype(np.uint64))
            % np.uint64(NUM_BUCKETS)
        ).astype(np.int32)
        return u

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(["event_type", "user_id"])
        return (
            u.groupby("event_type", sort=False).size().reset_index(name="n_users")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    agg["n_users"] = agg["n_users"].astype("int64")
    return agg[["event_type", "n_users"]]


def events_top_sessions(sf_dir: str):
    """Top-10 longest sessions (30-minute-gap sessionization), the
    composition of the streaming shape with distributed top-k: ONE
    user co-partition, in-bucket vectorized session ids (groupby-shift
    gap flags + cumsum), per-(user, session) aggregate, per-bucket
    top-10 prune, driver fold of 10 x B rows."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def top_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new_s = (prev.isna() | ((df["ts"] - prev) > pd.Timedelta(minutes=30))).astype(
            np.int64
        )
        df["sid"] = new_s.groupby(df["user_id"], sort=False).cumsum()
        g = df.groupby(["user_id", "sid"], sort=False).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        )
        g = g.reset_index()
        g["duration_us"] = (
            (g["session_end"] - g["session_start"]).dt.total_seconds() * 1_000_000
        ).round().astype(np.int64)
        g["n_events"] = g["n_events"].astype(np.int64)
        g = g.sort_values(
            ["duration_us", "user_id", "session_start"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(10)
        return g[["user_id", "session_start", "duration_us", "n_events"]]

    cand = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(top_bucket, batch_format="pandas")
        .to_pandas()
    )
    return (
        cand.sort_values(
            ["duration_us", "user_id", "session_start"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(10)
        .reset_index(drop=True)
    )


def events_value_quantiles_sketch(sf_dir: str):
    """One-pass approximate quantiles of the float ``value`` column via
    the mergeable mantissa-grid sketch (``functions/sketch.py`` —
    relative error <= 2^-11 per value). Rows-only: approximate by
    construction; the error bound vs exact ``quantile_disc`` is pinned
    in tests/test_functions.py, and the query emits the exact values
    next to the sketch so quality is visible (the exact side is
    affordable here only because the driver runs at tiny sf; at 100 TB
    only the sketch column exists)."""
    import duckdb

    from neuscraper_ray.functions.sketch import quantile_sketch

    ps = [0.25, 0.5, 0.75, 0.9, 0.99]
    ds = _read(sf_dir, "events", ["value"])
    approx = quantile_sketch(ds, "value", ps)
    exact = duckdb.query(
        f"SELECT quantile_disc(value, {ps}) FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    return pd.DataFrame(
        {
            "p": np.asarray(ps, dtype=np.float64),
            "value_sketch": np.asarray(approx, dtype=np.float64),
            "value_exact": np.asarray(exact, dtype=np.float64),
        }
    )


def events_type_transitions(sf_dir: str):
    """Per-user event-type transition matrix (the Markov-chain /
    behavioral-bigram shape): counts of consecutive (prev_type ->
    next_type) pairs within each user's time-ordered stream, with
    same-timestamp ties broken on event_id so both engines see the
    same order.

    Scale shape: ONE user co-partition; in-bucket the ordering sort
    and the lag are one vectorized groupby-shift; each bucket emits
    |types|^2 count partials; the final groupby folds 25 rows per
    bucket."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def trans_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["event_type"].shift()
        out = pd.DataFrame(
            {"prev_type": prev, "next_type": df["event_type"]}
        ).dropna()
        return (
            out.groupby(["prev_type", "next_type"], sort=False)
            .size()
            .reset_index(name="n")
        )

    agg = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(trans_bucket, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )
    df = agg.to_pandas()
    df["n"] = df["n"].astype("int64")
    return df[["prev_type", "next_type", "n"]]


def events_daily_active_users(sf_dir: str):
    """Daily active users + trailing-7-day distinct users. The
    windowed DISTINCT-count shape: a 7-day rolling distinct is NOT the
    sum of daily distincts, so the standard trick is per-user interval
    union — each (user, day) pair covers report days [day, day+6],
    overlapping intervals of the same user merge (cap each at the
    user's next active day - 1), and the per-day distinct-user count
    is the running sum of +1/-1 interval endpoints.

    Scale shape: ONE user co-partition; in-bucket the (user, day)
    dedup is global and the interval caps come from one vectorized
    groupby-shift; each bucket emits per-day (dau, delta) partials
    (|days| rows — corpus-size independent); the driver cumsums the
    |days|-sized frame."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "day": df["ts"].dt.floor("D"),
            }
        )
        out["bucket"] = (out["user_id"] % NUM_BUCKETS).astype(np.int32)
        return out

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        du = df[["user_id", "day"]].drop_duplicates().sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        dau = du.groupby("day", sort=False).size().reset_index(name="dau")
        nxt = du.groupby("user_id", sort=False)["day"].shift(-1)
        end = du["day"] + pd.Timedelta(days=6)
        capped = np.minimum(
            end.to_numpy(), (nxt - pd.Timedelta(days=1)).fillna(end).to_numpy()
        )
        plus = pd.DataFrame({"day": du["day"].to_numpy(), "delta": 1})
        minus = pd.DataFrame(
            {"day": capped + np.timedelta64(1, "D"), "delta": -1}
        )
        deltas = (
            pd.concat([plus, minus])
            .groupby("day", sort=False, as_index=False)["delta"]
            .sum()
        )
        out = deltas.merge(dau, on="day", how="outer")
        out["delta"] = out["delta"].fillna(0).astype(np.int64)
        out["dau"] = out["dau"].fillna(0).astype(np.int64)
        return out

    agg = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(partials, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("dau", alias_name="dau"), Sum("delta", alias_name="delta"))
    )
    df = agg.to_pandas().sort_values("day").reset_index(drop=True)
    # running interval-coverage sum over the FULL calendar range, then
    # report only observed days (the SQL twin's `days` domain)
    full = pd.DataFrame(
        {"day": pd.date_range(df["day"].min(), df["day"].max(), freq="D")}
    )
    full = full.merge(df[["day", "delta"]], on="day", how="left")
    full["dau_7d"] = full["delta"].fillna(0).cumsum().astype(np.int64)
    observed = df[df["dau"] > 0][["day", "dau"]]
    out = observed.merge(full[["day", "dau_7d"]], on="day")
    out["dau"] = out["dau"].astype("int64")
    return out[["day", "dau", "dau_7d"]]


def events_funnel(sf_dir: str):
    """Ordered conversion funnel (view -> later click -> later
    purchase): how many users reach each stage, where each stage must
    happen strictly AFTER the user's earliest completion of the
    previous one — the classic product-analytics shape that plain
    per-type counts get wrong.

    Scale shape: ONE all-to-all co-partitions each user's events
    (``user_id % B``); inside the bucket the stage logic is three
    vectorized pandas groupby-min + merge passes (no per-user Python
    loop); each bucket emits ONE 3-counter partial row and the driver
    folds B rows."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["user_id"] % NUM_BUCKETS).astype(np.int32)
        return df

    def funnel_bucket(df: pd.DataFrame) -> pd.DataFrame:
        v = (
            df[df["event_type"] == "view"]
            .groupby("user_id", sort=False, as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t_view"})
        )
        c = df[df["event_type"] == "click"].merge(v, on="user_id")
        c = (
            c[c["ts"] > c["t_view"]]
            .groupby("user_id", sort=False, as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t_click"})
        )
        p = df[df["event_type"] == "purchase"].merge(c, on="user_id")
        p = p[p["ts"] > p["t_click"]]
        return pd.DataFrame(
            {
                "n_view": np.asarray([len(v)], dtype=np.int64),
                "n_click": np.asarray([len(c)], dtype=np.int64),
                "n_purchase": np.asarray([p["user_id"].nunique()], dtype=np.int64),
            }
        )

    row = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(funnel_bucket, batch_format="pandas")
        .aggregate(
            Sum("n_view", alias_name="n_view"),
            Sum("n_click", alias_name="n_click"),
            Sum("n_purchase", alias_name="n_purchase"),
        )
    )
    row = row or {}
    return pd.DataFrame(
        {
            "stage": ["view", "view>click", "view>click>purchase"],
            "n_users": np.asarray(
                [
                    int(row.get("n_view") or 0),
                    int(row.get("n_click") or 0),
                    int(row.get("n_purchase") or 0),
                ],
                dtype=np.int64,
            ),
        }
    )
