"""Standalone query-runner CLI (`pipelines/query_cli.py`).

Subprocess tests: the CLI owns its own Ray session (separate process,
so it cannot collide with the suite's session) and must produce the
same rows the registry function returns.
"""

import json
import subprocess
import sys

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "neuscraper_ray.pipelines.query_cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )


def test_list_contains_registry():
    proc = _run("--list")
    assert proc.returncode == 0, proc.stderr
    names = set(proc.stdout.split())
    assert {"docs_exact_dedup", "q1_pricing", "docs_pii_stats"} <= names


def test_unknown_query_errors():
    proc = _run("no_such_query", "--sf-dir", SF)
    assert proc.returncode != 0
    assert "unknown query" in proc.stderr


def test_writes_parquet(tmp_path):
    out = str(tmp_path / "fert.parquet")
    proc = _run(
        "docs_fertility_by_lang",
        "--sf-dir", SF,
        "--out", out,
        "--num-cpus", "2",
    )
    assert proc.returncode == 0, proc.stderr
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["query"] == "docs_fertility_by_lang"
    t = pq.read_table(out)
    assert t.num_rows == rec["rows"] > 0
    assert "fertility_ppm" in t.schema.names
