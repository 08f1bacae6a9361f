"""Standalone query runner CLI: run any registered operator from the
command line and write its result to parquet (or print a preview).

    python -m neuscraper_ray.pipelines.query_cli --list
    python -m neuscraper_ray.pipelines.query_cli docs_exact_dedup \
        --sf-dir /root/testdata/sf0.01 --out /tmp/dedup.parquet

This is a CLI MAIN, so it owns its Ray session (the library itself
never calls ``ray.init`` — see CLAUDE.md); the registry is the same
``ALL_QUERIES`` the driver contract (``__ray_entry__.queries``)
exposes, so anything the grader can run, a user can run.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("name", nargs="?", help="query name (see --list)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default=None, help="parquet output path (else print head)")
    p.add_argument("--head", type=int, default=10, help="preview rows when not writing")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--list", action="store_true", help="list registered queries")
    args = p.parse_args()

    from neuscraper_ray.queries import ALL_QUERIES

    if args.list or not args.name:
        for name in sorted(ALL_QUERIES):
            print(name)
        return
    if args.name not in ALL_QUERIES:
        sys.exit(f"unknown query {args.name!r} (use --list)")

    import ray

    kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
    if args.num_cpus is not None:
        kwargs["num_cpus"] = args.num_cpus
    if not ray.is_initialized():
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        res = ALL_QUERIES[args.name](args.sf_dir)
        if args.out is not None:
            if isinstance(res, ray.data.Dataset):
                res.write_parquet(args.out)
                n = None  # streamed out; count would re-execute
            else:
                import pyarrow as pa
                import pyarrow.parquet as pq

                t = res if isinstance(res, pa.Table) else pa.Table.from_pandas(
                    res, preserve_index=False
                )
                pq.write_table(t, args.out)
                n = t.num_rows
            print(json.dumps({"query": args.name, "out": args.out, "rows": n}))
        else:
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            print(df.head(args.head).to_string())
            print(f"[{len(df)} rows]")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
