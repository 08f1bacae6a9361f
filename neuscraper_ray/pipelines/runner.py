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


def _committed_partitions(out_dir: str) -> list[tuple[str, list[str]]]:
    """(partition name, sorted parquet files) for every committed
    partition in a runner output dir."""
    parts = []
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if (
            name.startswith("part-")
            and not name.endswith(".tmp")
            and os.path.isdir(p)
            and os.path.exists(os.path.join(p, "_MANIFEST.json"))
        ):
            files = sorted(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
            )
            parts.append((name, files))
    return parts


def run_mark_phase(
    curated_dir: str,
    marked_dir: str,
    broadcast_limit: int | None = None,
) -> dict:
    """Corpus-wide exact-duplicate mark over a COMMITTED runner output
    (phase 2 of ``--mark-duplicates``).

    Partitions are curated and committed independently, so duplicate
    groups that SPAN partitions can only be resolved by a pass that
    sees the whole corpus. The canonical index is built from a
    column-pruned ``(content_hash, url)`` read across ALL partitions
    (16-byte hashes + urls move; document text never does for pass 1),
    broadcast once via ``ray.put``, and each partition is then re-read,
    marked with a zero-shuffle vectorized map, and committed into
    ``marked_dir`` under the SAME manifest protocol — already-marked
    partitions are skipped on resume, so a crash mid-mark re-does at
    most one partition. Requires partitions curated with
    ``CurateConfig(emit_content_hash=True)``.

    If the dup-group index outgrows ``broadcast_limit`` the phase falls
    back to ONE corpus-wide content-hash-bucketed mark pipeline
    (``stages.dedup_mark`` group-mark shuffle) committed as a single
    partition — the honest all-to-all cost when the dup index itself is
    cluster-sized; per-partition resume granularity is lost for that
    run and the manifest records the fallback.
    """
    from neuscraper_ray.stages.dedup_mark import (
        BROADCAST_CANON_LIMIT,
        canonical_dups,
        mark_duplicates,
        mark_with_canon,
    )

    if broadcast_limit is None:
        broadcast_limit = BROADCAST_CANON_LIMIT
    os.makedirs(marked_dir, exist_ok=True)
    gc_incomplete(marked_dir)
    parts = _committed_partitions(curated_dir)
    if not parts:
        raise ValueError(f"no committed partitions under {curated_dir!r}")
    all_files = [f for _, files in parts for f in files]
    proj = ray.data.read_parquet(all_files, columns=["content_hash", "url"])
    canon_ds = canonical_dups(proj, hash_col="content_hash").materialize()
    n_groups = canon_ds.count()

    if n_groups > broadcast_limit:
        plan = PartitionPlan(0, all_files)
        if not is_complete(marked_dir, plan):
            tmp = os.path.join(marked_dir, plan.name + ".tmp")
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            docs = ray.data.read_parquet(all_files)
            mark_duplicates(
                docs, hash_col="content_hash", broadcast_limit=broadcast_limit
            ).write_parquet(tmp)
            metrics = _partition_metrics(tmp)
            metrics["mark_mode"] = "bucketed_fallback"
            metrics["n_dup_groups"] = int(n_groups)
            commit_partition(marked_dir, plan, tmp, metrics)
        return {"partitions_marked": 1, "n_dup_groups": int(n_groups)}

    canon = dict(
        zip(*(canon_ds.to_pandas()[c] for c in ("content_hash", "canonical_url")))
    )
    canon_ref = ray.put(canon)
    marked = 0
    for i, (name, files) in enumerate(parts):
        plan = PartitionPlan(i, files)
        assert plan.name == name, (plan.name, name)
        if is_complete(marked_dir, plan):
            continue
        tmp = os.path.join(marked_dir, name + ".tmp")
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        mark_with_canon(
            ray.data.read_parquet(files), canon_ref, hash_col="content_hash"
        ).write_parquet(tmp)
        metrics = _partition_metrics(tmp)
        metrics["n_dup_groups"] = int(n_groups)
        commit_partition(marked_dir, plan, tmp, metrics)
        marked += 1
    return {"partitions_marked": marked, "n_dup_groups": int(n_groups)}


NEAR_MARK_LABEL_LIMIT = 5_000_000
"""At or below this many (doc, cluster) label rows the near-dup mark
broadcasts two small maps (member-fp -> cluster-fp, cluster-fp ->
canonical url) and each partition marks with a zero-shuffle vectorized
map, resumable per partition. Above it the labels co-partition with
the docs through ONE corpus-wide hash_join committed as a single
partition (resume granularity lost for that run, recorded in the
manifest) — the honest cost when near-dups are a cluster-sized
fraction of the corpus."""


def run_near_mark_phase(
    curated_dir: str,
    marked_dir: str,
    label_limit: int | None = None,
) -> dict:
    """Corpus-wide NEAR-duplicate mark over a COMMITTED runner output
    (phase 2 of ``--mark-near``): MinHash-LSH clusters over the
    extracted text (the ``near_dup_clusters`` machinery — banded
    candidates, distributed min-label propagation), then ``near_dup_of``
    = the cluster's canonical url for every non-canonical member.

    Ids are the urls' Mersenne-61 polynomial fingerprints (vectorized,
    deterministic; collision odds ~2^-61 per pair — documented, not
    load-bearing for text bytes). Canonical member = minimum
    fingerprint in the cluster; its url is recovered with one filtered
    column-pruned scan (output-sized pull). Each partition is then
    re-read, marked with a zero-shuffle vectorized map, and committed
    under the same manifest protocol — already-marked partitions skip
    on resume. Mirrors :func:`run_mark_phase` (exact hashes) one rung
    up the dedup ladder."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from neuscraper_ray.functions import polyhash as ph
    from neuscraper_ray.functions.dedup import near_dup_clusters
    from neuscraper_ray.functions.textstats import md5_hex

    if label_limit is None:
        label_limit = NEAR_MARK_LABEL_LIMIT
    os.makedirs(marked_dir, exist_ok=True)
    gc_incomplete(marked_dir)
    parts = _committed_partitions(curated_dir)
    if not parts:
        raise ValueError(f"no committed partitions under {curated_dir!r}")
    all_files = [f for _, files in parts for f in files]
    proj = ray.data.read_parquet(all_files, columns=["url", "extracted_text"])

    # --- stage A: collapse EXACT duplicates to one representative per
    # distinct text (min url-fingerprint). Web corpora have huge
    # identical-text groups (empty pages, boilerplate) that would make
    # the LSH bucket self-merge quadratic; clustering representatives
    # bounds pair generation by DISTINCT texts. Empty extracted text is
    # excluded entirely (an empty doc is not a near-dup of anything —
    # same convention as the exact mark).
    def exact_rows(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        texts = t.column("extracted_text").to_pylist()
        fps = ph.fingerprints(urls)
        keep = [i for i, x in enumerate(texts) if x]
        hs = md5_hex([texts[i] for i in keep])
        hb = np.fromiter(
            (int(s[:4], 16) % 128 for s in hs), dtype=np.int32, count=len(hs)
        )
        return pa.table(
            {
                "fp": pa.array([int(fps[i]) for i in keep], pa.int64()),
                "h": pa.array(hs, pa.string()),
                "hb": pa.array(hb),
            }
        )

    def exact_members(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("h", sort=False)["fp"]
        rep = g.transform("min")
        n = g.transform("size")
        hit = (n >= 2) & (df["fp"] != rep)
        return pd.DataFrame({"fp": df.loc[hit, "fp"], "rep": rep[hit]})

    exact_pd = (
        proj.map_batches(exact_rows, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(exact_members, batch_format="pandas")
        .to_pandas()
    )
    exact_map = dict(zip(exact_pd["fp"].astype(int), exact_pd["rep"].astype(int)))
    member_set = set(exact_map)
    members_ref = ray.put(member_set)

    # --- stage B: LSH clusters over the representatives only
    def rep_rows(t: pa.Table) -> pa.Table:
        mem = ray.get(members_ref)
        urls = t.column("url").to_pylist()
        texts = t.column("extracted_text").to_pylist()
        fps = ph.fingerprints(urls)
        keep = [i for i, x in enumerate(texts) if x and int(fps[i]) not in mem]
        return pa.table(
            {
                "doc_id": pa.array([int(fps[i]) for i in keep], pa.int64()),
                "text": pa.array([texts[i] for i in keep], pa.string()),
            }
        )

    labels = near_dup_clusters(proj.map_batches(rep_rows, batch_format="pyarrow"))
    n_labeled = len(labels) + len(exact_map)
    if n_labeled > label_limit:
        raise NotImplementedError(
            f"{n_labeled} near-dup labels exceed label_limit={label_limit}; "
            "the single-join fallback mirrors run_mark_phase's bucketed "
            "arm — raise the limit or mark via docs_dedup_apply's "
            "hash_join topology"
        )
    m2c = dict(zip(labels["doc_id"].astype(int), labels["cluster_id"].astype(int)))

    # canonical fp of a doc's EXPANDED cluster: reps are already the
    # min fp of their exact group, so the cluster min over reps is the
    # global min over all expanded members
    canon_fps = set(m2c.values()) | set(exact_map.values())
    cf = canon_fps

    def canon_rows(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        fps = ph.fingerprints(urls)
        keep = [i for i, f in enumerate(fps) if int(f) in cf]
        return pa.table(
            {
                "fp": pa.array([int(fps[i]) for i in keep], pa.int64()),
                "url": pa.array([urls[i] for i in keep], pa.string()),
            }
        )

    canon_pd = (
        ray.data.read_parquet(all_files, columns=["url"])
        .map_batches(canon_rows, batch_format="pyarrow")
        .to_pandas()
    )
    canon_url = dict(zip(canon_pd["fp"].astype(int), canon_pd["url"]))
    maps_ref = ray.put((exact_map, m2c, canon_url))

    def mark(t: pa.Table) -> pa.Table:
        em, mc, c2u = ray.get(maps_ref)
        urls = t.column("url").to_pylist()
        fps = ph.fingerprints(urls)
        dup = []
        for f in fps:
            f = int(f)
            rep = em.get(f)
            if rep is not None:  # exact member: cluster of its rep
                c = mc.get(rep, rep)
            else:  # its own rep: marked only if LSH-clustered
                c = mc.get(f)
            dup.append("" if c is None or c == f else c2u.get(c, ""))
        return t.append_column("near_dup_of", pa.array(dup, pa.string()))

    marked = 0
    for i, (name, files) in enumerate(parts):
        plan = PartitionPlan(i, files)
        assert plan.name == name, (plan.name, name)
        if is_complete(marked_dir, plan):
            continue
        tmp = os.path.join(marked_dir, name + ".tmp")
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        ray.data.read_parquet(files).map_batches(
            mark, batch_format="pyarrow", batch_size=None
        ).write_parquet(tmp)
        metrics = _partition_metrics(tmp)
        metrics["n_near_labeled"] = int(n_labeled)
        metrics["n_near_clusters"] = len(canon_fps)
        commit_partition(marked_dir, plan, tmp, metrics)
        marked += 1
    return {
        "partitions_marked": marked,
        "n_near_labeled": int(n_labeled),
        "n_near_clusters": len(canon_fps),
    }


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
    p.add_argument(
        "--mark-duplicates",
        action="store_true",
        help="two-phase corpus-wide exact-dup marking: partitions are "
        "curated with content_hash, then one global mark pass commits "
        "dup_of-marked copies under --marked-output (resumable per "
        "partition in both phases)",
    )
    p.add_argument(
        "--mark-near",
        action="store_true",
        help="two-phase corpus-wide NEAR-dup marking (MinHash-LSH "
        "clusters over extracted text): near_dup_of-marked copies "
        "committed under --marked-output + '-near' (resumable per "
        "partition)",
    )
    p.add_argument(
        "--marked-output",
        default=None,
        help="output dir for the marked copies (default: <output>-marked)",
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
    cfg = CurateConfig(emit_content_hash=args.mark_duplicates)
    agg = run_resumable(
        paths,
        args.output,
        cfg=cfg,
        files_per_partition=args.files_per_partition,
        overlap=args.overlap,
    )
    if args.mark_duplicates:
        marked_dir = args.marked_output or (args.output.rstrip("/") + "-marked")
        agg.update(run_mark_phase(args.output, marked_dir))
    if args.mark_near:
        base = args.marked_output or (args.output.rstrip("/") + "-marked")
        agg.update(run_near_mark_phase(args.output, base + "-near"))
    wall = time.perf_counter() - t0
    agg["wall_sec"] = round(wall, 2)
    if agg.get("n_docs") and wall > 0 and agg.get("partitions_run"):
        agg["docs_per_sec"] = round(agg["n_docs"] / wall, 1)
    print(json.dumps(agg))
    ray.shutdown()


if __name__ == "__main__":
    main()
