"""Cross-family helpers: pruned parquet reads and map-side partial aggregation.

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


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _preagg_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    count_alias: str | None = None,
) -> ray.data.Dataset:
    """Map-side partial aggregation: one row per key per batch, then a
    small groupby over the partials — the shuffle moves O(groups x
    batches) rows instead of the full table."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False)[sum_cols].sum()
        if count_alias:
            cnt = df.groupby(keys, sort=False).size().reset_index(name=count_alias)
            g = g.merge(cnt, on=keys)
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=32768)
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)
