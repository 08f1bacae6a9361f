"""S6 service form (`pipelines/serve.py`): the Serve replica handler,
exercised directly — no network, no Serve runtime (starlette is not
installed here, so build_app() must raise a clear error instead)."""

import base64

import pytest

import pyarrow.parquet as pq

from neuscraper_ray.pipelines.serve import HAVE_SERVE, ExtractorService, build_app
from neuscraper_ray.pipelines.serve_one import serve_one
from neuscraper_ray.synth import write_pages


def _one_page(tmp_path):
    write_pages(str(tmp_path / "pages"), 8, rows_per_file=8)
    t = pq.read_table(str(tmp_path / "pages"))
    return t.column("url")[0].as_py(), t.column("html")[0].as_py()


def test_handler_matches_serve_one(tmp_path):
    """predict() must equal the one-shot CLI's output (same pure
    functions; replica reuses its logprob table across requests)."""
    url, html = _one_page(tmp_path)
    svc = ExtractorService()
    got = svc.predict(url, html)
    want = serve_one(url, html)
    assert got == want
    assert "Text" in got and got["url"] == url
    # state reuse: a second request through the same replica agrees
    assert svc.predict(url, html) == got


def test_handler_request_body_contract(tmp_path):
    """The transport-free request path: JSON body with inline page
    bytes -> the reference's response shape; errors mirror the
    reference's 400 behavior as {"error": ...}."""
    url, html = _one_page(tmp_path)
    svc = ExtractorService()
    out = svc.handle_request_body(
        {"url": url, "html_b64": base64.b64encode(html).decode()}
    )
    assert out == svc.predict(url, html)
    assert svc.handle_request_body({}) == {"error": "missing 'url'"}


def test_build_app_gated_on_serve_availability():
    if HAVE_SERVE:
        app = build_app(num_replicas=1)
        assert app is not None
    else:
        with pytest.raises(RuntimeError, match="serve_one"):
            build_app()
