"""Streaming exact-dedup against a shared mutable index — the ONE
place the Dataset API genuinely can't express the semantics and raw
``@ray.remote`` actors are the right tool (per the engine's design
rules; everything else in this repo is a Dataset transform).

Semantics: emit each distinct content hash's FIRST-ARRIVING row and
drop later duplicates, while the stream is still flowing — the online
contract (an ingest firehose where re-crawls must be dropped now, not
after a batch groupby barrier). The canonical survivor is therefore
arrival-order-dependent (unlike ``functions.dedup.exact_dedup``'s
deterministic min-id canonical); what IS deterministic, and what the
tests pin, is the invariant: exactly one survivor per distinct text,
no survivor dropped, on any partitioning and any task order.

Scale shape: the index is SHARDED — ``n_shards`` actors each own a
disjoint hash-space slice (shard = crc32 bucket of the digest), so
index memory and check/insert throughput scale with actor count, and
each batch issues at most ``n_shards`` actor calls (one per shard
touched, vectorized set-membership inside the actor). At 100 TB the
actors would hold bloom filters or spill to a KV store; here the slot
is an in-memory set per shard with the same interface.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
class DedupShard:
    """Owns one slice of digest space. ``check_and_insert`` is atomic
    per actor (Ray actors serialize method calls), which is exactly
    the mutual exclusion the first-wins contract needs."""

    def __init__(self) -> None:
        self._seen: set[bytes] = set()

    def check_and_insert(self, digests: list[bytes]) -> list[bool]:
        """-> per-digest True if FIRST occurrence (now inserted)."""
        out = []
        seen = self._seen
        for d in digests:
            if d in seen:
                out.append(False)
            else:
                seen.add(d)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)


class StreamingDeduper:
    """Callable batch stage holding handles to the shard actors.

    Created once on the driver (actors spawn there), then passed to
    ``map_batches`` — workers ship only the lightweight handles.
    """

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [DedupShard.remote() for _ in range(n_shards)]

    def __call__(self, t: pa.Table, text_col: str = "text") -> pa.Table:
        texts = t.column(text_col).to_pylist()
        digests = [hashlib.md5(x.encode("utf-8")).digest() for x in texts]
        shard_of = np.fromiter(
            (zlib.crc32(d) % self.n_shards for d in digests),
            dtype=np.int64,
            count=len(digests),
        )
        keep = np.zeros(len(digests), dtype=bool)
        futures = []
        index_lists = []
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx) == 0:
                continue
            futures.append(
                self.shards[s].check_and_insert.remote(
                    [digests[i] for i in idx]
                )
            )
            index_lists.append(idx)
        for idx, flags in zip(index_lists, ray.get(futures)):
            keep[idx] = flags
        return t.filter(pa.array(keep))

    def index_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))


def streaming_dedup(
    ds: ray.data.Dataset, text_col: str = "text", n_shards: int = 8
) -> tuple[ray.data.Dataset, StreamingDeduper]:
    """-> (deduped Dataset, the deduper — query ``index_size()`` after
    consumption). The stage is a plain task-pool ``map_batches``; the
    shared state lives in the shard actors, not the tasks."""
    dd = StreamingDeduper(n_shards)
    out = ds.map_batches(
        lambda t: dd(t, text_col), batch_format="pyarrow", batch_size=None
    )
    return out, dd
