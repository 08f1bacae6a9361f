"""S6: single-url extraction service, CLI form (no server).

The reference exposes extraction-as-a-service behind a FastAPI
endpoint: POST {url} -> fetch -> build node sequence -> model
inference -> join kept spans -> {"Text": ...}
(``/root/reference/app/app.py:15-46``). That lifecycle is serving, not
data processing, so this repo deliberately ships it as a one-shot CLI
with the identical contract rather than an HTTP server: same input (a
url), same fetch-then-extract flow, same response shape, backed by the
SAME pure functions as the Ray pipeline (``oracle_page`` — the
conformance suite pins the Ray DAG byte-identical to it per url).

Usage::

    python -m neuscraper_ray.pipelines.serve_one --url URL
    python -m neuscraper_ray.pipelines.serve_one --url URL --html-file F
    cat page.html | python -m neuscraper_ray.pipelines.serve_one \
        --url URL --html-file -

Without ``--html-file`` the page is fetched over HTTP (stdlib urllib —
matching ``requests.get`` in the reference); with it, the bytes come
from the file (``-`` = stdin), which is also the offline-test path.
Output: one JSON object with the reference's ``Text`` key plus the
curation verdict columns this engine adds (keep, drop_reason,
scrubbed_text, ...).

No Ray session: one url is a single-process job by construction; the
heavy path stays in the Dataset pipeline (``pipelines/curate.py``).
"""

from __future__ import annotations

import argparse
import json
import sys


def fetch_url(url: str, timeout: float = 10.0) -> bytes:
    """GET the url (stdlib; reference uses requests.get — app.py:35).

    Raises with a clear message when the environment has no network;
    callers wanting offline operation pass --html-file."""
    from urllib.request import Request, urlopen

    req = Request(url, headers={"User-Agent": "neuscraper-ray/1.0"})
    with urlopen(req, timeout=timeout) as resp:  # noqa: S310 - explicit user url
        if getattr(resp, "status", 200) != 200:
            raise RuntimeError(f"error fetching url: HTTP {resp.status}")
        return resp.read()


def serve_one(url: str, html_bytes: bytes) -> dict:
    """The reference /predict/ body for one page: extract + verdict.

    Reference returns {"Text": joined kept spans} (app.py:40-46); the
    engine's verdict fields ride along under lowercase keys."""
    from neuscraper_ray.oracle import oracle_page
    from neuscraper_ray.stages.perplexity import build_logprob_table

    row = oracle_page(url, html_bytes, build_logprob_table())
    out = {"Text": row.pop("extracted_text")}
    out.update(row)
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--url", required=True)
    p.add_argument(
        "--html-file",
        help="read the page bytes from this file ('-' = stdin) instead "
        "of fetching over HTTP",
    )
    args = p.parse_args(argv)

    if args.html_file == "-":
        html = sys.stdin.buffer.read()
    elif args.html_file:
        with open(args.html_file, "rb") as f:
            html = f.read()
    else:
        try:
            html = fetch_url(args.url)
        except Exception as e:  # mirror the reference's 400 on fetch failure
            print(json.dumps({"error": f"Error fetching URL: {e}"}))
            return 1

    print(json.dumps(serve_one(args.url, html)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
