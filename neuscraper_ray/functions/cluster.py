"""Distributed k-means over an embedding column.

The iterative-algorithm shape Ray Data handles well: each iteration is
one streaming pass — centroids broadcast via ``ray.put``, every batch
emits k partial rows (per-centroid vector sum + count + inertia), and
the driver folds the partials (k x n_batches rows, corpus-size
independent) into the next centroid set. No shuffle at all; the
input is materialized once (object-store blocks, spilling under
pressure) so the ``iters`` passes re-read blocks rather than
re-running the upstream scan each iteration.

Deterministic: fixed seed picks the initial centroids from the first
block, fixed iteration count, and the driver fold sorts the partial
rows by content before the float64 summation, so results do not
depend on task completion order.

No SQL oracle exists (iterative fixpoint); tests pin determinism,
monotone non-increasing inertia, and full-coverage assignment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _stack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    # zero-copy values-buffer reshape (shared with ann._stack) — the
    # to_pylist() -> np.stack round trip paid an avoidable Python
    # object conversion per batch.
    from neuscraper_ray.functions.ann import _stack as _ann_stack

    return _ann_stack(col, dtype=np.float64)


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 10,
    vec_col: str = "embedding",
    seed: int = 3,
) -> tuple[np.ndarray, float]:
    """-> (centroids (k, d) float64, final inertia). Euclidean k-means.

    The input is materialized ONCE up front (object store, spills to
    disk under pressure) so the ``iters`` streaming passes re-read
    blocks instead of re-running the parquet scan + upstream transforms
    every iteration — at 10 iters that was 10 full scans."""
    from ray.data.dataset import MaterializedDataset

    if not isinstance(ds, MaterializedDataset):
        ds = ds.materialize()
    head = ds.limit(max(k * 20, 256)).to_pandas()
    m0 = np.stack(head[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    cent = m0[rng.choice(len(m0), size=min(k, len(m0)), replace=False)].copy()

    inertia = float("inf")
    for it in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _stack(t.column(vec_col))
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            kk, d = len(c), c.shape[1]
            sums = np.zeros((kk, d), dtype=np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            inert = np.zeros(kk, dtype=np.float64)
            np.add.at(inert, assign, d2[np.arange(len(m)), assign])
            return pa.table(
                {
                    "c": np.arange(kk, dtype=np.int64),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "n": counts,
                    "inertia": inert,
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        # content-sorted fold: float addition order independent of task
        # completion order
        rows.sort(key=lambda r: (int(r["c"]), int(r["n"]), float(r["inertia"]), tuple(r["vsum"])))
        kk, d = cent.shape
        sums = np.zeros((kk, d), dtype=np.float64)
        counts = np.zeros(kk, dtype=np.int64)
        inert_parts: list[float] = []
        for r in rows:
            c = int(r["c"])
            sums[c] += np.asarray(r["vsum"], dtype=np.float64)
            counts[c] += int(r["n"])
            inert_parts.append(float(r["inertia"]))
        inert = float(np.sum(inert_parts))
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
        inertia = inert
    return cent, inertia


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """-> (id_col, cluster int64, dist2 float64), one streaming pass."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _stack(t.column(vec_col))
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": a.astype(np.int64),
                "dist2": d2[np.arange(len(m)), a],
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): assign each
    embedding to its nearest k-means centroid, then WITHIN each cluster
    mark every vector that has a lower-id neighbor with cosine
    similarity >= threshold as a semantic duplicate of the smallest
    such neighbor. -> (vec_id, cluster, is_dup, dup_of, dup_sim_ppm)
    where dup_of is -1 and dup_sim_ppm is -1 for survivors;
    dup_sim_ppm is the EXACT cosine similarity to dup_of in parts per
    million (floor), so the rows-only query is self-auditing the same
    way the ANN queries emit recall@10.

    Scale shape: centroids broadcast via ``ray.put`` (zero-shuffle
    assignment fused into the widen pass); exactly ONE all-to-all
    co-locates each cluster (k groups — bounded, never a
    high-cardinality groupby); in-cluster dedup is one normalized
    matmul + a vectorized first-True argmax over the strict
    lower-triangle (no Python pair loop). The |cluster|^2 similarity
    block is the operator's memory bound — the paper's own recipe is
    to grow k with the corpus so n/k stays fixed, which is why k is a
    caller-supplied parameter rather than a constant.

    No SQL oracle (k-means is an iterative fixpoint); tests pin
    determinism, the no-surviving-near-pair invariant, and dup_of
    validity (lower id, similarity >= threshold, same cluster).
    """
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def widen(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _stack(t.column(vec_col))
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table(
            {
                id_col: t.column(id_col),
                vec_col: t.column(vec_col),
                "cluster": d2.argmin(axis=1).astype(np.int64),
            }
        )

    def dedup_cluster(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _stack(t.column(vec_col))[order]
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sim = mn @ mn.T
        n = len(ids)
        hit = (sim >= threshold) & np.tri(n, n, -1, dtype=bool)  # j < i only
        has_dup = hit.any(axis=1)
        first_j = hit.argmax(axis=1)  # first True per row (valid where has_dup)
        dup_of = np.where(has_dup, ids[first_j], -1).astype(np.int64)
        sim_to = sim[np.arange(n), first_j]
        dup_sim_ppm = np.where(
            has_dup, np.floor(sim_to * 1_000_000), -1
        ).astype(np.int64)
        return pa.table(
            {
                "vec_id": ids.astype(np.int64),
                "cluster": t.column("cluster").to_numpy()[order].astype(np.int64),
                "is_dup": has_dup,
                "dup_of": dup_of,
                "dup_sim_ppm": dup_sim_ppm,
            }
        )

    return (
        ds.map_batches(widen, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )
