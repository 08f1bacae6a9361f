"""Benchmark driver (headline: flagship curation pipeline docs/sec).

Usage:
  python bench.py               # one JSON line with headline + per-query secs
  python bench.py --scaling     # same job at num_cpus=8 and 32 in fresh
                                # processes -> throughputs + efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

This script OWNS its Ray session (the only places allowed to:
bench/CLI/test fixture).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_bench() -> dict:
    import ray
    import ray.data

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from neuscraper_ray.pipelines.curate import CurateConfig, curate
    from neuscraper_ray.queries import ALL_QUERIES, _pages_dir_for

    # ---------- headline: curation pipeline over synthetic pages ----------
    pages_dir = _pages_dir_for(sf_dir)  # generation is untimed (cached)
    # warm the page cache with one untimed read
    n_pages = ray.data.read_parquet(pages_dir).count()

    cfg = CurateConfig(
        scorer_actors=(2, max(2, num_cpus // 2)),
        ppl_actors=(1, max(1, num_cpus // 4)),
        num_buckets=max(64, num_cpus * 4),
    )
    out_dir = f"/tmp/bench_curate_out_{num_cpus}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    curate(ray.data.read_parquet(pages_dir), cfg).write_parquet(out_dir)
    headline_sec = time.perf_counter() - t0

    # ---------- representative operator queries over the sf tables ----------
    bench_queries = [
        "q1_pricing",
        "events_type_agg",
        "events_user_sessions",
        "order_line_concat",
        "docs_exact_dedup",
        "docs_minhash_clusters",
        "docs_simhash_pairs",
        "ann_topk",
        "embedding_near_pairs",
    ]
    q_times: dict[str, float] = {}
    for name in bench_queries:
        t0 = time.perf_counter()
        res = ALL_QUERIES[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()  # consume
        q_times[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "curate_docs_per_sec",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "docs_per_sec": round(n_pages / headline_sec, 1),
        "n_docs": n_pages,
        "queries": q_times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return result


def _scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 8, 32
    lo, hi = run(lo_cpus), run(hi_cpus)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "sec_8": t_lo,
                "sec_32": t_hi,
                "docs_per_sec_8": lo["docs_per_sec"],
                "docs_per_sec_32": hi["docs_per_sec"],
                "n_docs": hi["n_docs"],
                "sf": hi["sf"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    else:
        print(json.dumps(_run_bench()))
