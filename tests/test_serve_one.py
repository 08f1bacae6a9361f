"""S6 single-url extraction CLI (`pipelines/serve_one.py`).

Pins the reference /predict/ contract (``/root/reference/app/app.py``):
input a url (+ page bytes), output a JSON object whose ``Text`` is the
joined kept spans — which for this engine must equal the flagship
pipeline's extracted_text for the same page (both call the same pure
functions)."""

import json
import subprocess
import sys

import pyarrow.parquet as pq

from neuscraper_ray.oracle import oracle_page
from neuscraper_ray.pipelines.serve_one import serve_one
from neuscraper_ray.stages.perplexity import build_logprob_table
from neuscraper_ray.synth import write_pages


def _one_page(tmp_path):
    paths = write_pages(str(tmp_path / "pages"), 8, rows_per_file=8)
    t = pq.read_table(paths[0] if isinstance(paths, list) else str(tmp_path / "pages"))
    return t.column("url")[0].as_py(), t.column("html")[0].as_py()


def test_serve_one_matches_pipeline_text(tmp_path):
    url, html = _one_page(tmp_path)
    out = serve_one(url, html)
    ref = oracle_page(url, html, build_logprob_table())
    assert out["Text"] == ref["extracted_text"]  # byte-identical
    assert out["keep"] == ref["keep"]
    assert out["scrubbed_text"] == ref["scrubbed_text"]


def test_serve_one_cli_stdin(tmp_path):
    url, html = _one_page(tmp_path)
    proc = subprocess.run(
        [sys.executable, "-m", "neuscraper_ray.pipelines.serve_one",
         "--url", url, "--html-file", "-"],
        input=html, capture_output=True, check=True,
    )
    d = json.loads(proc.stdout)
    assert d["Text"] and d["url"] == url
    assert "keep" in d and "drop_reason" in d


def test_serve_one_fetch_failure_is_clean_error(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "neuscraper_ray.pipelines.serve_one",
         "--url", "http://localhost:1/nope"],
        capture_output=True,
    )
    assert proc.returncode == 1
    assert "error" in json.loads(proc.stdout)
