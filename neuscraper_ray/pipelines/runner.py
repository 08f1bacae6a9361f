"""Resumable curation job runner (``ray job submit``-able).

Wraps the flagship pipeline with the partition/manifest protocol from
``neuscraper_ray.state.manifest``: the input shard list is split into
output partitions; completed partitions (manifest present) are skipped
on rerun; each partition commit records lineage (input shards) and
metrics (row counts, keep counts, drop-reason histogram, bytes).

Each partition is itself a fully parallel Ray Data pipeline — at
10^12-document scale a partition is thousands of input shards, so the
cluster stays saturated within one partition and the commit points
bound re-work after a crash to a single partition.

CLI:
    python -m neuscraper_ray.pipelines.runner \
        --input /tmp/pages_dir --output /tmp/curated \
        [--files-per-partition 32] [--num-cpus 32]
"""

from __future__ import annotations

import glob
import os

import ray
import ray.data

from neuscraper_ray.pipelines.curate import CurateConfig, curate
from neuscraper_ray.state.manifest import (
    PartitionPlan,
    commit_partition,
    gc_incomplete,
    is_complete,
    plan_partitions,
)


def _partition_metrics(part_dir: str) -> dict:
    """Metrics for one committed partition, read from its parquet files."""
    import pyarrow.dataset as pads

    import pyarrow.compute as pc

    dset = pads.dataset(part_dir, format="parquet")
    table = dset.to_table(columns=["keep", "drop_reason", "n_kept"])
    n = table.num_rows
    keep = pc.sum(table.column("keep")).as_py() or 0
    vc = pc.value_counts(table.column("drop_reason"))
    hist = {
        (d["values"] or "kept"): d["counts"] for d in vc.to_pylist()
    }
    bytes_out = sum(
        os.path.getsize(os.path.join(part_dir, f))
        for f in os.listdir(part_dir)
        if f.endswith(".parquet")
    )
    return {
        "n_docs": n,
        "n_kept": int(keep),
        "drop_reasons": hist,
        "bytes_out": bytes_out,
    }


def run_partition(plan: PartitionPlan, out_dir: str, cfg: CurateConfig) -> dict:
    tmp_dir = os.path.join(out_dir, plan.name + ".tmp")
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    pages = ray.data.read_parquet(plan.input_paths)
    curate(pages, cfg).write_parquet(tmp_dir)
    metrics = _partition_metrics(tmp_dir)
    commit_partition(out_dir, plan, tmp_dir, metrics)
    return metrics


def _pin_http_fs_probe() -> None:
    """Ray Data probes ``fsspec.implementations.http`` during every
    read/write path resolution. When that module cannot import (no
    aiohttp in this environment) Python re-executes the FAILED import
    on each retry, and two overlapped partition pipelines retrying
    concurrently can observe a partially-initialized module — a plain
    ImportError that Ray's ``except ModuleNotFoundError`` does not
    catch. Decide the probe once up front and pin the answer."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        try:
            from ray.data.datasource import path_util

            path_util._is_http_filesystem = lambda fs: False
        except (ImportError, AttributeError):
            # private Ray symbol moved (version skew): degrade to the
            # unpinned behavior rather than failing job startup
            pass


def run_resumable(
    input_paths: list[str],
    out_dir: str,
    cfg: CurateConfig | None = None,
    files_per_partition: int = 32,
    overlap: int = 2,
) -> dict:
    """Run (or resume) the curation job. Returns job-level metrics.

    ``overlap`` partitions run concurrently (each its own Ray Data
    streaming pipeline; the Ray scheduler interleaves their tasks).
    One partition pipeline pays a fixed ~13 s startup/ramp/drain tax
    (BASELINE.md round-4); overlapping two hides partition N+1's ramp
    behind partition N's drain while keeping per-partition commit
    points and resume granularity unchanged. Commits stay crash-safe:
    partitions write to independent ``.tmp`` dirs and rename on
    commit, so a crash mid-overlap loses at most ``overlap``
    partitions of work."""
    cfg = cfg or CurateConfig()
    _pin_http_fs_probe()
    os.makedirs(out_dir, exist_ok=True)
    removed = gc_incomplete(out_dir)
    plans = plan_partitions(input_paths, files_per_partition)
    todo = [plan for plan in plans if not is_complete(out_dir, plan)]
    skipped = len(plans) - len(todo)
    if overlap <= 1 or len(todo) <= 1:
        for plan in todo:
            run_partition(plan, out_dir, cfg)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=overlap) as ex:
            # list() re-raises the first failure (fail the job, not
            # silently skip a partition)
            list(ex.map(lambda plan: run_partition(plan, out_dir, cfg), todo))
    done = len(todo)
    from neuscraper_ray.state.manifest import aggregate_metrics

    agg = aggregate_metrics(out_dir)
    agg.update(
        {"partitions_run": done, "partitions_skipped": skipped, "gc_removed": removed}
    )
    return agg


def main() -> None:
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="input pages dir (parquet shards)")
    p.add_argument("--output", required=True, help="output dir (partitioned parquet)")
    p.add_argument(
        "--files-per-partition",
        type=int,
        default=32,
        help="resume granularity vs throughput: each partition is its "
        "own Ray Data pipeline with a measured ~13 s startup/ramp tax "
        "(BASELINE.md round-4), so size partitions to >= ~2 min of "
        "useful work — natural at production shard sizes, but small "
        "inputs want a larger value (the 1M-page bench uses 63).",
    )
    p.add_argument(
        "--overlap",
        type=int,
        default=2,
        help="partitions run concurrently (hides the per-partition "
        "pipeline ramp behind the previous partition's drain); 1 = "
        "strictly sequential",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args()

    if not ray.is_initialized():
        # `ray job submit` sets RAY_ADDRESS to the cluster it launched
        # the job on — honor it so the job joins that cluster instead
        # of booting a private local instance; fall back to a local
        # session for direct CLI runs.
        # num_cpus is only legal when booting a new local instance —
        # passing it while joining an existing cluster makes ray.init
        # raise, so either forward it to a local session or fail fast.
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {}
        if address == "local":
            kwargs["num_cpus"] = args.num_cpus
        elif args.num_cpus is not None:
            p.error(
                "--num-cpus only applies to a new local Ray instance; "
                f"RAY_ADDRESS={address!r} joins an existing cluster "
                "(size it with the cluster launcher instead)"
            )
        ray.init(
            address=address,
            include_dashboard=False,
            logging_level="ERROR",
            **kwargs,
        )
    ray.data.DataContext.get_current().enable_progress_bars = False
    import time

    paths = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    t0 = time.perf_counter()
    agg = run_resumable(
        paths,
        args.output,
        files_per_partition=args.files_per_partition,
        overlap=args.overlap,
    )
    wall = time.perf_counter() - t0
    agg["wall_sec"] = round(wall, 2)
    if agg.get("n_docs") and wall > 0 and agg.get("partitions_run"):
        agg["docs_per_sec"] = round(agg["n_docs"] / wall, 1)
    print(json.dumps(agg))
    ray.shutdown()


if __name__ == "__main__":
    main()
