"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k. The query matrix is
  broadcast once (``ray.put``); each batch does one numpy matmul and
  emits only its local top-k, which the driver merges (k rows per batch
  cross the wire, never the embeddings).
- ``lsh_topk``: random-hyperplane LSH variant — the scale path. Probes
  only the query's hash bucket(s); same merge. Falls back to multiple
  probe permutations for recall.
- ``pairwise_cosine_pairs``: exact all-pairs above a threshold, blocked
  matmul per (batch x broadcast chunk). Used as the embedding near-dup
  detector and as the exact oracle for the LSH variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _stack(batch_col, dtype=np.float32) -> np.ndarray:
    """Arrow list<float> (or Ray tensor-extension) column -> (n, d)
    matrix (zero-copy-ish)."""
    arr = batch_col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    if not hasattr(arr, "values"):  # ArrowTensorArray et al.
        return np.asarray(arr.to_numpy(zero_copy_only=False)).astype(dtype)
    values = arr.values.to_numpy(zero_copy_only=False).astype(dtype)
    n = len(arr)
    return values.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k for a single query vector.

    -> DataFrame(vec_id, cosine) sorted by (-cosine, vec_id), k rows.
    Similarities are computed in float64 end-to-end so near-ties at the
    k-th boundary rank identically to the SQL oracle's float64 cosine.
    """
    q = _normalize(query.reshape(1, -1).astype(np.float64))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize(_stack(batch.column(vec_col), dtype=np.float64))
        sims = (m @ qm.T).ravel()
        ids = batch.column(id_col).to_numpy()
        if len(ids) > k:
            part = np.argpartition(-sims, k)[:k]
        else:
            part = np.arange(len(ids))
        return pa.table({id_col: ids[part], "cosine": sims[part]})

    cand = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    cand = cand.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


class _HyperplaneHasher:
    def __init__(self, dim: int, n_bits: int = 8, seed: int = 99):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_bits).astype(np.float32)

    def hash(self, m: np.ndarray) -> np.ndarray:
        return ((m @ self.planes) > 0) @ (1 << np.arange(self.planes.shape[1]))


def lsh_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> pd.DataFrame:
    """Approximate cosine top-k: only rows whose hyperplane bucket is
    within ``multiprobe_hamming`` of the query's bucket are scored."""
    from itertools import combinations

    dim = len(query)
    hasher = _HyperplaneHasher(dim, n_bits)
    q = _normalize(query.reshape(1, -1).astype(np.float32))
    qh = int(hasher.hash(q)[0])
    # probe every bucket within Hamming distance `multiprobe_hamming`
    probe = {qh}
    for d in range(1, multiprobe_hamming + 1):
        for bits in combinations(range(n_bits), d):
            flip = 0
            for b in bits:
                flip |= 1 << b
            probe.add(qh ^ flip)
    probe_arr = np.array(sorted(probe))
    # broadcast ALL per-query state (query matrix, probe set, plane
    # matrix) once via ray.put — the hasher is not captured by the task
    # closure, so nothing is re-pickled per task
    q_ref = ray.put((q, probe_arr, hasher.planes))

    def local_topk(batch: pa.Table) -> pa.Table:
        qm, probes, planes = ray.get(q_ref)
        m = _normalize(_stack(batch.column(vec_col)))
        h = ((m @ planes) > 0) @ (1 << np.arange(planes.shape[1]))
        mask = np.isin(h, probes)
        if not mask.any():
            return pa.table({id_col: np.array([], dtype=np.int64), "cosine": np.array([], dtype=np.float64)})
        sims = (m[mask] @ qm.T).ravel().astype(np.float64)
        ids = batch.column(id_col).to_numpy()[mask]
        if len(ids) > k:
            part = np.argpartition(-sims, k)[:k]
        else:
            part = np.arange(len(ids))
        return pa.table({id_col: ids[part], "cosine": sims[part]})

    cand = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    cand = cand.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


def ivf_build(
    ds: ray.data.Dataset,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 5,
    iters: int = 10,
):
    """IVF coarse quantizer: deterministic k-means over a sample.

    Returns ``(centroids: (n_lists, d) float32, assign_fn)`` where
    ``assign_fn(matrix) -> list ids``. Centroid training samples the
    dataset (first block is enough for a coarse quantizer at scale;
    here the table is small so we take it all), fixed seed + fixed
    iterations => identical index everywhere.
    """
    sample = ds.limit(50_000).to_pandas()
    m = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float32))
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(n_lists, len(m)), replace=False)].copy()
    for _ in range(iters):
        sims = m @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "pd.DataFrame":
    """IVF-probed approximate cosine top-k: score only rows whose
    nearest centroid is among the query's ``n_probe`` closest lists.
    The centroid matrix is broadcast once; per batch one small matmul
    assigns lists and one matmul scores the probed subset."""
    cent = ivf_build(ds, n_lists, id_col, vec_col)
    q = _normalize(query.reshape(1, -1).astype(np.float32))
    probe = set(np.argsort(-(cent @ q.T).ravel())[:n_probe].tolist())
    ref = ray.put((cent, q, np.array(sorted(probe))))

    def local_topk(batch: pa.Table) -> pa.Table:
        c, qm, probes = ray.get(ref)
        m = _normalize(_stack(batch.column(vec_col)))
        assign = (m @ c.T).argmax(axis=1)
        mask = np.isin(assign, probes)
        if not mask.any():
            return pa.table(
                {id_col: np.array([], dtype=np.int64), "cosine": np.array([], dtype=np.float64)}
            )
        sims = (m[mask] @ qm.T).ravel().astype(np.float64)
        ids = batch.column(id_col).to_numpy()[mask]
        part = np.argpartition(-sims, k)[:k] if len(ids) > k else np.arange(len(ids))
        return pa.table({id_col: ids[part], "cosine": sims[part]})

    cand = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    cand = cand.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


# Above this many rows the full-matrix broadcast would hold O(n*d)
# floats in every worker AND materialize the table on the driver, so
# pairwise_cosine_pairs switches to the IVF-bucketed variant.
BROADCAST_ROW_LIMIT = 200_000


def pairwise_cosine_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
) -> ray.data.Dataset:
    """All-pairs cosine >= threshold -> Dataset(id_a, id_b, cosine).

    Size switch (both paths tested in ``tests/test_functions.py``):

    - n <= ``broadcast_row_limit``: EXACT path. The full normalized
      matrix is broadcast once via ``ray.put`` and each batch
      multiplies against it — O(n^2) flops but O(n*d) bytes moved,
      embarrassingly parallel over row blocks. This is also the oracle
      for the approximate paths.
    - above the limit: ``pairwise_cosine_pairs_bucketed`` — IVF coarse
      buckets (each vector assigned to its ``n_assign`` nearest
      centroids), exact pairs within each bucket. Reported pairs are
      exact cosines (full precision); pairs whose members share no
      common coarse list are missed (recall bound tested).
    """
    if ds.count() > broadcast_row_limit:
        return pairwise_cosine_pairs_bucketed(ds, threshold, id_col, vec_col)
    whole = ds.to_pandas()
    ids_all = whole[id_col].to_numpy()
    m_all = _normalize(np.stack(whole[vec_col].to_numpy()).astype(np.float32))
    ref = ray.put((ids_all, m_all))

    def block(batch: pa.Table) -> pa.Table:
        ids_b = batch.column(id_col).to_numpy()
        mb = _normalize(_stack(batch.column(vec_col)))
        ids_g, mg = ray.get(ref)
        sims = mb @ mg.T
        ia, ib = np.nonzero(sims >= threshold)
        keep = ids_b[ia] < ids_g[ib]  # each unordered pair once
        return pa.table(
            {
                "id_a": ids_b[ia[keep]],
                "id_b": ids_g[ib[keep]],
                "cosine": sims[ia[keep], ib[keep]].astype(np.float64),
            }
        )

    return ds.map_batches(block, batch_format="pyarrow", batch_size=2048)


def pairwise_cosine_pairs_bucketed(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int | None = None,
    n_assign: int = 2,
) -> ray.data.Dataset:
    """IVF-bucketed near-pair search — the 100-TB shape.

    ``n_lists`` defaults to ~one list per 8k assigned rows (coarse
    enough that clusters stay whole, fine enough that the in-bucket
    matmul stays cache-sized).

    Each vector is shuffled to its ``n_assign`` nearest coarse
    centroids (so near-boundary pairs still co-locate); within each
    list an exact all-pairs matmul emits pairs >= threshold; a final
    coarse-bucketed dedup drops pairs found in two shared lists. Bytes
    shuffled: n_assign x the embedding table, partitioned by list — no
    node ever holds the full matrix and the driver holds nothing.
    Misses only pairs whose members share no common list; for a
    near-dup detector (high threshold, clustered data) that tail is
    small — measured in ``tests/test_functions.py``.
    """
    if n_lists is None:
        n_lists = max(8, -(-ds.count() * n_assign // 8192))
    cent = ivf_build(ds, n_lists, id_col, vec_col)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_stack(batch.column(vec_col)))
        k = min(n_assign, len(c))
        top = np.argpartition(-(m @ c.T), k - 1, axis=1)[:, :k]
        n = len(m)
        vecs = batch.column(vec_col).combine_chunks()
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.chunk(0)
        return pa.table(
            {
                "list_id": top.reshape(-1).astype(np.int32),
                id_col: np.repeat(batch.column(id_col).to_numpy(), k),
                vec_col: vecs.take(pa.array(np.repeat(np.arange(n), k))),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        m = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float32))
        sims = m @ m.T
        ia, ib = np.nonzero(sims >= threshold)
        keep = ids[ia] < ids[ib]
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cosine": sims[ia[keep], ib[keep]].astype(np.float64),
                "pbucket": (
                    (ids[ia[keep]].astype(np.uint64) * np.uint64(2654435761)
                     ^ ids[ib[keep]].astype(np.uint64))
                    % np.uint64(64)
                ).astype(np.int32),
            }
        )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b", "cosine"]]

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("list_id")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(dedup, batch_format="pandas")
    )


# ------------------------------------------------- random projection


def projection_signs(d: int, out_dim: int) -> np.ndarray:
    """Deterministic (d, out_dim) +-1 sign matrix — an Achlioptas-style
    sparse-free sign projection with the RNG replaced by the polyhash
    Mersenne-61 cube hash, so DuckDB reproduces every sign exactly:
    sign(j, k) = parity of ((h1^2 mod M) * h1 mod M), h1 = j*BASE_S + k
    (j, k 1-indexed). The cube pushes the product past M so the
    reduction actually mixes (a single product of small factors would
    reduce to structured parity)."""
    from neuscraper_ray.functions import polyhash as ph

    j = np.arange(1, d + 1, dtype=np.uint64)[:, None]
    k = np.arange(1, out_dim + 1, dtype=np.uint64)[None, :]
    h1 = j * np.uint64(ph.BASE_S) + k
    h = ph.mulmod(ph.mulmod(h1, h1), h1)
    return np.where((h & np.uint64(1)) == 1, 1, -1).astype(np.int64)


def project_batch(batch: pa.Table, out_dim: int = 8, col: str = "embedding") -> pa.Table:
    """Fixed-point random projection: quantize each float32 component
    to round-half-up micros (``floor(x * 1e6 + 0.5)`` on the exact
    float64 promotion — the same IEEE ops DuckDB runs), then one int64
    matmul against the deterministic sign matrix. Output long-format
    (vec_id, k, comp) — integer-exact, zero shuffle."""
    emb = _stack(batch.column(col), dtype=np.float32).astype(np.float64)
    q = np.floor(emb * 1_000_000 + 0.5).astype(np.int64)
    signs = projection_signs(q.shape[1], out_dim)
    comp = q @ signs  # (n, out_dim) int64
    n = comp.shape[0]
    vec_ids = batch.column("vec_id").to_numpy()
    return pa.table(
        {
            "vec_id": pa.array(np.repeat(vec_ids, out_dim)),
            "k": pa.array(np.tile(np.arange(1, out_dim + 1, dtype=np.int64), n)),
            "comp": pa.array(comp.reshape(-1)),
        }
    )


def sql_project(table: str = "embeddings", out_dim: int = 8) -> str:
    """DuckDB twin of ``project_batch`` (HUGEINT keeps the cube exact)."""
    from neuscraper_ray.functions import polyhash as ph

    B, M = ph.BASE_S, ph.MOD
    h1 = f"(j * {B} + k)::HUGEINT"
    sign = (
        f"CASE WHEN ((({h1} * {h1}) % {M}) * {h1}) % {M} % 2 = 1 "
        "THEN 1 ELSE -1 END"
    )
    return f"""
SELECT vec_id, k::BIGINT AS k,
  list_sum(list_transform(range(1, len(embedding) + 1),
    j -> ({sign}) * floor(embedding[j]::DOUBLE * 1000000 + 0.5)::BIGINT))::BIGINT AS comp
FROM {table}, (SELECT unnest(range(1, {out_dim + 1})) AS k)
"""
