"""Resumable partitioned output: lineage + metrics manifests.

The north rule requires the pipeline to be "resumable from checkpoint
with per-partition lineage + metrics" at 10^12-document scale. The unit
of resume is an OUTPUT PARTITION = a fixed group of input shards:

    out_dir/
      part-00000/            completed partition (parquet files)
        _MANIFEST.json       lineage + metrics, written LAST
      part-00001.tmp/        in-flight partition (ignored by readers)

Protocol (crash-safe under Ray task retries and driver restarts):
1. partition output is written to ``part-i.tmp/`` (write_parquet is
   idempotent into a fresh tmp dir);
2. the manifest (input shard list, row counts, drop-reason histogram,
   byte sizes) is computed from the written files;
3. ``part-i.tmp`` -> ``part-i`` atomic rename, then ``_MANIFEST.json``
   written inside. A partition is complete iff its manifest exists;
   anything else is garbage-collected on resume.

Reruns skip completed partitions (lineage says which input shards they
cover), so a killed job re-does only in-flight work. Output is
byte-stable because the pipeline is deterministic per input shard.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass


@dataclass
class PartitionPlan:
    index: int
    input_paths: list[str]

    @property
    def name(self) -> str:
        return f"part-{self.index:05d}"


def plan_partitions(input_paths: list[str], files_per_partition: int) -> list[PartitionPlan]:
    paths = sorted(input_paths)
    return [
        PartitionPlan(i // files_per_partition, paths[i : i + files_per_partition])
        for i in range(0, len(paths), files_per_partition)
    ]


def manifest_path(out_dir: str, plan: PartitionPlan) -> str:
    return os.path.join(out_dir, plan.name, "_MANIFEST.json")


def is_complete(out_dir: str, plan: PartitionPlan) -> bool:
    """Complete iff the manifest exists AND its recorded lineage matches
    the current plan's input shards. If the input shard list changed
    between runs (file added/renamed), partition indices shift; a
    manifest covering different shards must not be skipped — it is
    treated as incomplete (gc'd and re-run)."""
    mp = manifest_path(out_dir, plan)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            manifest = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return manifest.get("input_paths") == plan.input_paths


def gc_incomplete(out_dir: str) -> list[str]:
    """Remove tmp dirs and manifest-less partition dirs (crash leftovers)."""
    removed = []
    if not os.path.isdir(out_dir):
        return removed
    for name in os.listdir(out_dir):
        p = os.path.join(out_dir, name)
        if name.endswith(".tmp") or (
            name.startswith("part-")
            and os.path.isdir(p)
            and not os.path.exists(os.path.join(p, "_MANIFEST.json"))
        ):
            shutil.rmtree(p, ignore_errors=True)
            removed.append(name)
    return removed


def commit_partition(out_dir: str, plan: PartitionPlan, tmp_dir: str, metrics: dict) -> None:
    final_dir = os.path.join(out_dir, plan.name)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp_dir, final_dir)
    manifest = {
        "partition": plan.name,
        "input_paths": plan.input_paths,
        "metrics": metrics,
        "completed_at_unix": time.time(),
        "files": sorted(os.listdir(final_dir)),
    }
    mtmp = os.path.join(final_dir, "_MANIFEST.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(mtmp, os.path.join(final_dir, "_MANIFEST.json"))


def load_manifests(out_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        mp = os.path.join(out_dir, name, "_MANIFEST.json")
        if os.path.exists(mp):
            with open(mp) as f:
                out.append(json.load(f))
    return out


def aggregate_metrics(out_dir: str) -> dict:
    """Job-level rollup of every completed partition's metrics."""
    total: dict = {"n_partitions": 0}
    for m in load_manifests(out_dir):
        total["n_partitions"] += 1
        for k, v in m["metrics"].items():
            if isinstance(v, (int, float)):
                total[k] = total.get(k, 0) + v
            elif isinstance(v, dict):
                bucket = total.setdefault(k, {})
                for kk, vv in v.items():
                    bucket[kk] = bucket.get(kk, 0) + vv
    return total
