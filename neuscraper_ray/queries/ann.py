"""Embedding-table operators: ANN top-k (brute/LSH/IVF), near pairs, projections.

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

from neuscraper_ray.queries._shared import _read


def embeddings_project(sf_dir: str):
    """Dimensionality reduction by deterministic +-1 sign projection
    (Achlioptas-style, hash-derived signs) in fixed-point integer
    arithmetic — SQL-verified bit-for-bit. Pure map stage, zero
    shuffle; long-format (vec_id, k, comp) output."""
    from neuscraper_ray.functions.ann import project_batch

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ds.map_batches(project_batch, batch_format="pyarrow")


def embeddings_kmeans(sf_dir: str):
    """Distributed k-means over the embeddings table (iterative
    algorithm: per-pass broadcast centroids + per-batch partial sums,
    zero shuffles, driver folds k x n_batches rows per iteration).
    Rows-only: an iterative fixpoint has no SQL oracle; determinism,
    monotone inertia and full assignment coverage are pinned in
    tests/test_functions.py."""
    from neuscraper_ray.functions.cluster import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    cent, _ = kmeans_fit(ds, k=8, iters=5)
    return kmeans_assign(ds, cent).select_columns(["vec_id", "cluster"])




def _ann_query_and_rest(sf_dir: str):
    """(query vector float64, Dataset of the remaining rows).

    The single query row comes via parquet predicate pushdown at the
    read; the exclusion filter is a vectorized Arrow kernel — never
    ``ds.filter(row_fn)`` (one Python call per row)."""
    import pyarrow.compute as pc

    qdf = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") == 0,
    ).to_pandas()
    query = np.asarray(qdf["embedding"].iloc[0], dtype=np.float64)
    rest = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        lambda t: t.filter(pc.not_equal(t["vec_id"], 0)),
        batch_format="pyarrow",
        batch_size=None,
    )
    return query, rest


def ann_topk(sf_dir: str):
    """Brute-force cosine top-10 around vec_id 0 (exact; float64)."""
    from neuscraper_ray.functions.ann import brute_force_topk

    query, rest = _ann_query_and_rest(sf_dir)
    top = brute_force_topk(rest, query, k=10)
    return top[["vec_id"]].astype("int64")


def _with_recall(top: pd.DataFrame, sf_dir: str) -> pd.DataFrame:
    """Attach ``recall_at_10`` (overlap with the exact ``ann_topk``
    result, fixed-point e3) to an approximate top-k frame — the
    quality of the approximation is self-documenting in the query
    output, mirroring the recall assertions in tests/test_functions.py.
    The exact pass is output-sized extra work (one brute-force top-k)."""
    exact = set(ann_topk(sf_dir)["vec_id"])
    hit = sum(1 for v in top["vec_id"] if v in exact)
    top = top.copy()
    top["recall_at_10_e3"] = np.int64(hit * 1000 // max(1, len(exact)))
    return top


def ann_topk_lsh(sf_dir: str):
    """LSH-bucketed approximate top-10 (scale path; rows-only check —
    approximate by design, quality surfaced as a recall_at_10 column)."""
    from neuscraper_ray.functions.ann import lsh_topk

    query, ds = _ann_query_and_rest(sf_dir)
    # hamming-2 multiprobe: the synthetic embeddings are near-random
    # (weak neighbor structure), so recall tracks the probed fraction;
    # clustered real corpora need far fewer probes for the same recall
    top = lsh_topk(ds, query, k=10, multiprobe_hamming=2)
    return _with_recall(top[["vec_id", "cosine"]], sf_dir)


def ann_topk_ivf(sf_dir: str):
    """IVF-probed approximate top-10 (the inverted-list scale path;
    rows-only: approximate by design — recall@10 vs the exact
    ``ann_topk`` is asserted in tests/test_functions.py AND emitted
    as a column of the result)."""
    from neuscraper_ray.functions.ann import ivf_topk

    query, ds = _ann_query_and_rest(sf_dir)
    top = ivf_topk(ds, query, k=10)
    return _with_recall(top[["vec_id", "cosine"]], sf_dir)


def embedding_near_pairs(sf_dir: str):
    """Exact all-pairs cosine >= 0.3 (embedding near-dup detector)."""
    from neuscraper_ray.functions.ann import pairwise_cosine_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = pairwise_cosine_pairs(ds, threshold=0.3).to_pandas()
    pairs = pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pairs[["id_a", "id_b"]].astype("int64")
