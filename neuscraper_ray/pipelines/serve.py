"""S6 as a long-running service: Ray Serve deployment wrapper.

The reference exposes extraction-as-a-service behind FastAPI
(``/root/reference/app/app.py:15-46``: POST {url} -> fetch -> node
sequence -> inference -> {"Text": ...}). ``pipelines/serve_one.py``
ships the identical contract as a one-shot CLI; this module promotes
it to the natural Ray-cluster shape — a ``serve.deployment`` whose
replicas hold the model state (the perplexity logprob table, built
once per replica in ``__init__``, exactly the actor-pool discipline
the batch pipeline uses) and answer the reference's request shape.

Ray Serve's HTTP stack (starlette/uvicorn) is not installed in this
container, so the deployment binding is import-gated: the HANDLER
class is plain Python, fully exercised by pytest without a network or
a Serve runtime, and ``build_app()`` raises a clear error when Serve
is unavailable. On a real cluster::

    from neuscraper_ray.pipelines.serve import build_app
    serve.run(build_app(num_replicas=4))
    # POST /  {"url": ..., "html_b64": ...} -> {"Text": ..., keep, ...}

Contract parity with the reference and the batch pipeline is pinned by
the conformance suite: the handler calls the SAME pure functions
(``oracle_page``) the Ray DAG is byte-identical to per url.
"""

from __future__ import annotations

import base64

try:  # Serve needs starlette/uvicorn — absent in this container
    from ray import serve as _serve

    HAVE_SERVE = True
except ImportError:  # pragma: no cover - environment-dependent
    _serve = None
    HAVE_SERVE = False


class ExtractorService:
    """Serve replica handler for the reference /predict/ contract.

    Replica state (the logprob table; pattern compilation happens in
    the shared pure functions' module caches) is built ONCE here —
    per-request work is pure compute. This mirrors the reference's
    module-level model load (``app/app.py:15-23``) and the batch
    pipeline's actor ``__init__`` discipline."""

    def __init__(self) -> None:
        from neuscraper_ray.stages.perplexity import build_logprob_table

        self._logprob = build_logprob_table()

    def predict(self, url: str, html_bytes: bytes) -> dict:
        """One page -> {"Text": joined kept spans, <verdict fields>}.

        Identical output to ``serve_one.serve_one`` (pinned in tests);
        the table is reused across requests instead of rebuilt."""
        from neuscraper_ray.oracle import oracle_page

        row = oracle_page(url, html_bytes, self._logprob)
        out = {"Text": row.pop("extracted_text")}
        out.update(row)
        return out

    def handle_request_body(self, body: dict) -> dict:
        """The transport-free request handler: JSON body in, JSON-able
        dict out. ``html_b64`` carries the page bytes inline (the
        offline / test path); without it the url is fetched like the
        reference's ``requests.get`` (app.py:35)."""
        url = body.get("url")
        if not url:
            return {"error": "missing 'url'"}
        if "html_b64" in body:
            html = base64.b64decode(body["html_b64"])
        else:
            from neuscraper_ray.pipelines.serve_one import fetch_url

            try:
                html = fetch_url(url)
            except Exception as e:  # reference returns 400 on fetch failure
                return {"error": f"Error fetching URL: {e}"}
        return self.predict(url, html)

    async def __call__(self, request):  # pragma: no cover - needs Serve
        """Ray Serve HTTP entry: POST JSON {"url", "html_b64"?}."""
        return self.handle_request_body(await request.json())


def build_app(num_replicas: int = 2):
    """-> a bound Serve application (``serve.run(build_app())``).

    Raises ``RuntimeError`` when Ray Serve is unavailable (this
    container) — the handler itself stays importable and testable."""
    if not HAVE_SERVE:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "ray.serve is unavailable (starlette/uvicorn not installed); "
            "use pipelines.serve_one for the one-shot CLI form"
        )
    dep = _serve.deployment(
        ExtractorService, name="neuscraper-extractor", num_replicas=num_replicas
    )
    return dep.bind()
