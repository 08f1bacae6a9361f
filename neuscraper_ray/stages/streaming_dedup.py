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

Retry safety: ``map_batches`` tasks are stateless to Ray, so a worker
that dies AFTER its ``check_and_insert`` landed gets its batch
re-executed — and a naive seen-set would then report every digest as a
duplicate and silently drop the sole survivor. The index therefore
records, per digest, an OWNER token (a content fingerprint of the
claiming batch): a replay of the same batch presents the same token
and receives the same True answers, while a genuinely different batch
with the same digest still gets False. In-call duplicates are resolved
positionally (first occurrence wins within the call, replay-stable
because the batch content, and hence order, is identical on retry).
Residual caveat, documented: two byte-identical BATCHES (same rows,
same order — only possible when entire duplicate blocks exist) share a
token and would each keep their first row; a production deployment
keys the token on (source partition id, batch offset) from the reader
instead, which this module accepts via ``batch_key``.

Scale shape: the index is SHARDED — ``n_shards`` actors each own a
disjoint hash-space slice (shard = crc32 bucket of the digest), so
index memory and check/insert throughput scale with actor count, and
each batch issues at most ``n_shards`` actor calls (one per shard
touched, vectorized set-membership inside the actor). At 100 TB the
actors would hold bloom filters or spill to a KV store; here the slot
is an in-memory dict per shard with the same interface.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Callable

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
        self._owner: dict[bytes, bytes] = {}

    def check_and_insert(self, digests: list[bytes], owner: bytes) -> list[bool]:
        """-> per-digest True iff this call's batch owns the digest's
        first occurrence. Idempotent under replay: a digest already
        claimed by the SAME owner token answers True again (task
        retry), by a different owner False. Within one call only the
        first position of a repeated digest can win — replay-stable
        because the call's digest order is a pure function of the
        batch content."""
        out = []
        table = self._owner
        seen_in_call: set[bytes] = set()
        for d in digests:
            if d in seen_in_call:
                out.append(False)
            elif d in table:
                out.append(table[d] == owner)
            else:
                table[d] = owner
                out.append(True)
            seen_in_call.add(d)
        return out

    def size(self) -> int:
        return len(self._owner)


def _default_batch_key(t: pa.Table, digests: list[bytes]) -> bytes:
    """Replay-stable owner token: md5 over the batch's FULL Arrow IPC
    bytes (every column, not just the text digests — two batches with
    the same texts but different ids must get different tokens). A
    retried task rebuilds the identical batch => identical token."""
    import io

    import pyarrow.ipc as ipc

    sink = io.BytesIO()
    with ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return hashlib.md5(sink.getvalue()).digest()


class StreamingDeduper:
    """Callable batch stage holding handles to the shard actors.

    Created once on the driver (actors spawn there), then passed to
    ``map_batches`` — workers ship only the lightweight handles.

    ``batch_key(table, digests) -> bytes`` derives the owner token; the
    default fingerprints the batch content, a source-aware caller can
    supply (partition id, offset) instead.
    """

    def __init__(
        self,
        n_shards: int = 8,
        batch_key: Callable[[pa.Table, list[bytes]], bytes] = _default_batch_key,
    ):
        self.n_shards = n_shards
        self.batch_key = batch_key
        self.shards = [DedupShard.remote() for _ in range(n_shards)]

    def __call__(self, t: pa.Table, text_col: str = "text") -> pa.Table:
        texts = t.column(text_col).to_pylist()
        digests = [hashlib.md5(x.encode("utf-8")).digest() for x in texts]
        owner = self.batch_key(t, digests)
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
                    [digests[i] for i in idx], owner
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
