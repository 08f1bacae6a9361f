"""Resume protocol: kill-after-partition-k rerun must skip completed
partitions and produce byte-identical final output (SURVEY §5 item 4)."""

import os
import shutil

import duckdb
import pytest

from neuscraper_ray.pipelines.curate import CurateConfig
from neuscraper_ray.pipelines.runner import run_partition, run_resumable
from neuscraper_ray.state.manifest import (
    aggregate_metrics,
    gc_incomplete,
    load_manifests,
    plan_partitions,
)
from neuscraper_ray.synth import write_pages

N_PAGES = 240
CFG = CurateConfig(num_buckets=8)


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    write_pages(d, N_PAGES, rows_per_file=40)  # 6 shards
    return d


def _digest(out_dir):
    q = f"SELECT md5(string_agg(url || '|' || scrubbed_text || '|' || keep, '' ORDER BY url)) FROM read_parquet('{out_dir}/part-*/[!_]*.parquet')"
    return duckdb.sql(q).fetchone()[0]


def test_full_run_then_resume_noop(pages_dir, tmp_path):
    out = str(tmp_path / "out")
    paths = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir))
    agg1 = run_resumable(paths, out, CFG, files_per_partition=2)
    assert agg1["partitions_run"] == 3 and agg1["n_docs"] == N_PAGES
    d1 = _digest(out)
    # rerun: everything skipped, identical output
    agg2 = run_resumable(paths, out, CFG, files_per_partition=2)
    assert agg2["partitions_run"] == 0 and agg2["partitions_skipped"] == 3
    assert _digest(out) == d1


def test_crash_mid_job_resumes(pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ref = str(tmp_path / "ref")
    paths = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir))
    run_resumable(paths, ref, CFG, files_per_partition=2)  # reference run

    # simulate a crash: run only partition 0, leave partition 1 half-done
    plans = plan_partitions(paths, 2)
    os.makedirs(out)
    run_partition(plans[0], out, CFG)
    os.makedirs(os.path.join(out, plans[1].name + ".tmp"))  # in-flight junk
    os.makedirs(os.path.join(out, plans[2].name))  # dir without manifest

    agg = run_resumable(paths, out, CFG, files_per_partition=2)
    assert agg["partitions_skipped"] == 1 and agg["partitions_run"] == 2
    assert sorted(agg["gc_removed"]) == [plans[1].name + ".tmp", plans[2].name]
    assert _digest(out) == _digest(ref)


def test_overlap_matches_sequential(pages_dir, tmp_path):
    """Overlapped partition pipelines (overlap=2, the default) produce
    byte-identical output to a strictly sequential run, with the same
    manifests/metrics — concurrency changes scheduling only."""
    seq = str(tmp_path / "seq")
    ov = str(tmp_path / "ov")
    paths = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir))
    a1 = run_resumable(paths, seq, CFG, files_per_partition=2, overlap=1)
    a2 = run_resumable(paths, ov, CFG, files_per_partition=2, overlap=2)
    assert a1["partitions_run"] == a2["partitions_run"] == 3
    assert _digest(seq) == _digest(ov)
    assert a1["n_kept"] == a2["n_kept"] and a1["n_docs"] == a2["n_docs"]


def test_manifest_lineage_and_metrics(pages_dir, tmp_path):
    out = str(tmp_path / "out")
    paths = sorted(os.path.join(pages_dir, f) for f in os.listdir(pages_dir))
    run_resumable(paths, out, CFG, files_per_partition=3)
    ms = load_manifests(out)
    assert len(ms) == 2
    covered = [p for m in ms for p in m["input_paths"]]
    assert sorted(covered) == paths  # lineage covers every input exactly once
    for m in ms:
        assert m["metrics"]["n_docs"] > 0
        assert "drop_reasons" in m["metrics"]
    agg = aggregate_metrics(out)
    assert agg["n_docs"] == N_PAGES
    assert agg["n_kept"] == sum(m["metrics"]["n_kept"] for m in ms)


def test_mark_phase_matches_single_pipeline(pages_dir, tmp_path):
    """Two-phase runner marking (curate partitions with content_hash,
    then one corpus-wide mark pass) must produce the IDENTICAL per-url
    dup_of as the single-pipeline curate(mark_duplicates=True) path —
    duplicate groups planted by the synth corpus span partitions, so
    this exercises the cross-partition canonical exchange."""
    import glob

    import ray.data

    from neuscraper_ray.pipelines.curate import curate
    from neuscraper_ray.pipelines.runner import run_mark_phase

    paths = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    curated = str(tmp_path / "curated")
    marked = str(tmp_path / "marked")
    cfg = CurateConfig(num_buckets=8, emit_content_hash=True)
    run_resumable(paths, curated, cfg, files_per_partition=2)
    agg = run_mark_phase(curated, marked)
    assert agg["partitions_marked"] == 3
    got = (
        duckdb.sql(
            f"SELECT url, dup_of FROM read_parquet('{marked}/part-*/[!_]*.parquet') ORDER BY url"
        )
        .fetchdf()
    )
    want = (
        curate(
            ray.data.read_parquet(paths),
            CurateConfig(num_buckets=8, mark_duplicates=True),
        )
        .to_pandas()[["url", "dup_of"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got["url"].tolist() == want["url"].tolist()
    assert got["dup_of"].tolist() == want["dup_of"].tolist()
    assert (got["dup_of"] != "").sum() > 0  # corpus plants duplicates

    # resume: a second mark run skips every committed marked partition
    agg2 = run_mark_phase(curated, marked)
    assert agg2["partitions_marked"] == 0

    # bucketed fallback (dup index "too big" to broadcast): same dup_of
    marked_fb = str(tmp_path / "marked_fb")
    run_mark_phase(curated, marked_fb, broadcast_limit=0)
    fb = (
        duckdb.sql(
            f"SELECT url, dup_of FROM read_parquet('{marked_fb}/part-*/[!_]*.parquet') ORDER BY url"
        )
        .fetchdf()
    )
    assert fb["dup_of"].tolist() == want["dup_of"].tolist()


def test_near_mark_phase(pages_dir, tmp_path):
    """Two-phase NEAR-dup marking: every near_dup_of points at the
    canonical member of the SAME MinHash cluster recomputed directly
    over the curated corpus, canonical members stay unmarked, and the
    phase resumes (a second run skips every committed partition)."""
    import glob

    import ray.data

    from neuscraper_ray.functions import polyhash as ph
    from neuscraper_ray.functions.dedup import near_dup_clusters
    from neuscraper_ray.pipelines.runner import run_near_mark_phase

    paths = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    curated = str(tmp_path / "curated")
    marked = str(tmp_path / "marked_near")
    run_resumable(paths, curated, CurateConfig(num_buckets=8), files_per_partition=2)
    agg = run_near_mark_phase(curated, marked)
    assert agg["partitions_marked"] == 3
    assert agg["n_near_labeled"] > 0

    got = duckdb.sql(
        f"SELECT url, extracted_text, near_dup_of FROM "
        f"read_parquet('{marked}/part-*/[!_]*.parquet') ORDER BY url"
    ).fetchdf()
    # independent recompute, mirroring the collapse-exact-first shape
    # with plain pandas for the exact groups: empty texts excluded,
    # min-fp representative per distinct text, LSH clusters over reps,
    # clusters expanded back over exact members
    import pandas as pd
    import pyarrow as pa

    fps = ph.fingerprints(got["url"].tolist()).astype(int)
    df = pd.DataFrame(
        {"fp": fps, "url": got["url"], "text": got["extracted_text"]}
    )
    ne = df[df["text"] != ""]
    rep = ne.groupby("text")["fp"].transform("min")
    exact_map = dict(zip(ne.loc[ne["fp"] != rep, "fp"], rep[ne["fp"] != rep]))
    reps = ne[~ne["fp"].isin(exact_map)]
    labels = near_dup_clusters(
        ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(reps["fp"].to_numpy(), pa.int64()),
                    "text": pa.array(reps["text"], pa.string()),
                }
            )
        )
    )
    m2c = dict(zip(labels["doc_id"].astype(int), labels["cluster_id"].astype(int)))
    fp2url = dict(zip(df["fp"], df["url"]))
    marked_rows = got[got["near_dup_of"] != ""]
    assert len(marked_rows) > 0  # synth corpus plants near-dups
    for u, f, d in zip(got["url"], fps, got["near_dup_of"]):
        f = int(f)
        r = exact_map.get(f)
        c = m2c.get(r, r) if r is not None else m2c.get(f)
        if c is None or c == f:
            assert d == "", u  # unclustered or canonical: unmarked
        else:
            assert d == fp2url[c], u  # member: points at canonical url

    agg2 = run_near_mark_phase(curated, marked)
    assert agg2["partitions_marked"] == 0
