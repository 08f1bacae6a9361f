"""M16 original-HTML reconstruction (`stages/original_html.py`).

The strip chain must exactly invert the deterministic instrumenter on
the synthetic corpus (byte-identical), agree token-for-token with its
DuckDB twin, and reproduce the reference's three artifact removals
(ref AnnotateHtmlApi.py:841-869)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from neuscraper_ray.stages.extract import decode_html
from neuscraper_ray.stages.original_html import (
    instrument_html,
    sql_strip_instrumentation,
    strip_instrumentation,
)
from neuscraper_ray.synth import write_pages


def _htmls(tmp_path, n=40):
    write_pages(str(tmp_path / "pages"), n, rows_per_file=n)
    t = pq.read_table(str(tmp_path / "pages"))
    return [decode_html(h) for h in t.column("html").to_pylist()]


def test_roundtrip_byte_identical(tmp_path):
    htmls = _htmls(tmp_path)
    inst = [instrument_html(h) for h in htmls]
    got = strip_instrumentation(pa.array(inst, pa.string())).to_pylist()
    assert got == htmls
    # the instrumentation really injected something to strip
    assert all(len(i) > len(h) for i, h in zip(inst, htmls))


def test_sql_twin_matches(tmp_path):
    htmls = _htmls(tmp_path, n=20)
    inst = pa.array([instrument_html(h) for h in htmls], pa.string())
    got = strip_instrumentation(inst).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"h": inst}))
    want = [r[0] for r in con.execute(
        f"SELECT {sql_strip_instrumentation('h')} FROM t"
    ).fetchall()]
    assert got == want


def test_reference_artifact_removal():
    """The three artifacts the reference's get_original_html removes:
    <html> layout attrs, per-element dcnode ids, instrument spans."""
    page = (
        '<html semanticlayout="grid" mattrdefaults="1" data-dcnode-id="0">'
        '<body data-dcnode-id="1"><p data-dcnode-id="2">'
        '<span data-dcnode-id="3" instrument_node="">hello world</span>'
        "</p></body></html>"
    )
    got = strip_instrumentation(pa.array([page], pa.string())).to_pylist()[0]
    assert got == "<html><body><p>hello world</p></body></html>"


def test_query_roundtrip_ok_everywhere():
    from neuscraper_ray.queries import pages_original_html

    out = pages_original_html("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert out["roundtrip_ok"].all()
    assert (out["n_chars"] > 0).all()
