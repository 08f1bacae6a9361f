"""Deterministic synthetic Common-Crawl-style pages table.

``BASELINE.json``'s ``input_hint`` fixes the input schema:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. No such table ships in ``/root/testdata``, so we
synthesise it deterministically (fixed seed, no wall clock, no network)
at any scale, per FIXTURES.md T1: every edge case from the checklist
gets template coverage — noscript text, ol/dl/table containers, ``<br>``
runs, ``\\xa0`` padding, empty pages, a giant multi-chunk page, duplicate
content under different urls, non-English pages, PII strings, toxicity
hits, low-quality symbol spam, and a few latin-1 / bad-byte rows.

``gen_pages(n, seed)`` twice with the same arguments produces identical
bytes (FIXTURES.md checklist #10).
"""

from __future__ import annotations

import random

import pyarrow as pa

# bump when generator output changes — cache directories embed this so
# stale /tmp corpora from older generator code are never reused
SYNTH_VERSION = 2

# --- word pools (public, generic vocabulary) ---------------------------------

EN_STOP = "the of and a to in is it you that he was for on are with as".split()
EN_WORDS = (
    "data engine stream batch table column row query filter sort merge join "
    "group window vector hash scan index page node text content article "
    "system model result value record partition cluster worker memory cache "
    "network server client process thread signal buffer format schema field "
    "report market research science history culture nature energy travel "
    "music garden river mountain winter summer morning evening people city"
).split()
DE_WORDS = (
    "der die das und ist nicht mit von auf für eine haben werden sich auch "
    "nach wird bei durch über zeit jahr welt leben wasser stadt land haus"
).split()
FR_WORDS = (
    "le la les et est dans pour que une sur avec pas plus par mais nous "
    "vous temps monde vie eau ville pays maison jour nuit chose homme femme"
).split()
ES_WORDS = (
    "el la los y es en para que una con no más por pero como este tiempo "
    "mundo vida agua ciudad país casa día noche cosa hombre mujer años"
).split()
ZH_CHARS = "的一是在不了有和人这中大为上个国我以要他时来用们生到作地于出就分对成会"

TOXIC_WORDS = ["badword1", "badword2", "slurword", "vileword"]

NAV_LINKS = ["Home", "About", "Contact", "Products", "Blog", "Login", "Sign up", "Help"]
FOOTER_BITS = [
    "Copyright 2023 Example Corp",
    "All rights reserved",
    "Privacy Policy",
    "Terms of Service",
    "Cookie settings",
]

PII_SAMPLES = [
    "reach me at john.doe@example.com for details",
    "call 555-867-5309 or (212) 555-0187 today",
    "server logs show 192.168.1.77 and 10.0.0.254 connecting",
    "SSN on file: 078-05-1120 do not share",
    "card number 4111 1111 1111 1111 expires soon",
    "email support@test.org or admin@corp.example.net",
]


def _sentence(rng: random.Random, words: list[str], stop: list[str] | None = None, n: int | None = None) -> str:
    n = n or rng.randint(6, 14)
    out = []
    for _ in range(n):
        pool = stop if (stop and rng.random() < 0.35) else words
        out.append(rng.choice(pool))
    s = " ".join(out)
    return s[0].upper() + s[1:] + rng.choice([".", ".", ".", "!", "?"])


def _paragraph(rng: random.Random, words: list[str], stop: list[str] | None = None, n_sent: int | None = None) -> str:
    n_sent = n_sent or rng.randint(2, 5)
    return " ".join(_sentence(rng, words, stop) for _ in range(n_sent))


def _nav(rng: random.Random) -> str:
    links = rng.sample(NAV_LINKS, k=rng.randint(3, 6))
    items = "".join(f'<li><a href="/{w.lower().replace(" ", "-")}">{w}</a></li>' for w in links)
    return f"<nav><ul>{items}</ul></nav>"


def _footer(rng: random.Random) -> str:
    bits = rng.sample(FOOTER_BITS, k=rng.randint(2, 4))
    return "<footer>" + " | ".join(f"<span>{b}</span>" for b in bits) + "</footer>"


def _table(rng: random.Random, words: list[str]) -> str:
    rows = []
    for _ in range(rng.randint(2, 4)):
        cells = "".join(f"<td>{rng.choice(words)} {rng.randint(1, 999)}</td>" for _ in range(3))
        rows.append(f"<tr>{cells}</tr>")
    return "<table>" + "".join(rows) + "</table>"


def _ol(rng: random.Random, words: list[str]) -> str:
    items = "".join(f"<li>{_sentence(rng, words, n=rng.randint(3, 7))}</li>" for _ in range(rng.randint(2, 5)))
    return f"<ol>{items}</ol>"


def _dl(rng: random.Random, words: list[str]) -> str:
    pairs = "".join(
        f"<dt>{rng.choice(words)}</dt><dd>{_sentence(rng, words, n=rng.randint(3, 6))}</dd>"
        for _ in range(rng.randint(2, 4))
    )
    return f"<dl>{pairs}</dl>"


def _article(rng: random.Random, words: list[str], stop: list[str] | None, n_paras: int) -> str:
    paras = []
    for _ in range(n_paras):
        roll = rng.random()
        if roll < 0.08:
            paras.append(_table(rng, words))
        elif roll < 0.14:
            paras.append(_ol(rng, words))
        elif roll < 0.18:
            paras.append(_dl(rng, words))
        elif roll < 0.24:
            # <br>-separated inline runs
            lines = "<br>".join(_sentence(rng, words, stop, n=rng.randint(4, 8)) for _ in range(3))
            paras.append(f"<p>{lines}</p>")
        else:
            paras.append(f"<p>{_paragraph(rng, words, stop)}</p>")
    return "".join(paras)


def _html_page(rng: random.Random, title: str, body: str, lang: str = "en") -> str:
    head = f"<head><title>{title}</title><meta charset=\"utf-8\"></head>"
    return f'<html lang="{lang}">{head}<body>{body}</body></html>'


# page family weights: (name, weight)
_FAMILIES = [
    ("article", 46),
    ("listy", 10),
    ("nonenglish", 14),
    ("pii", 8),
    ("toxic", 4),
    ("lowq", 8),
    ("empty", 3),
    ("dup", 5),
    ("badbytes", 2),
]
_FAM_NAMES = [f for f, _ in _FAMILIES]
_FAM_WEIGHTS = [w for _, w in _FAMILIES]

_NONEN = [("de", DE_WORDS), ("fr", FR_WORDS), ("es", ES_WORDS)]


def _gen_one(i: int, seed: int) -> dict:
    """One deterministic page. Independent RNG per row => order-free."""
    rng = random.Random((seed << 20) ^ i)
    fam = rng.choices(_FAM_NAMES, weights=_FAM_WEIGHTS, k=1)[0]
    # a giant multi-chunk page every 500 rows (skew case: >384 text nodes)
    if i % 500 == 137:
        fam = "giant"
    url = f"https://www.site{i % 97:02d}.example.com/{fam}/page-{i}.html"
    ts = 1_700_000_000_000_000 + i * 1_000_000  # timestamp[us], derived from row index
    lang_claim = "en"
    title = _sentence(rng, EN_WORDS, n=rng.randint(3, 6)).rstrip(".!?")
    encoding = "utf-8"

    if fam == "article":
        # realistic web-page weight: tens of paragraphs, several KB HTML
        body = _nav(rng) + "<main>" + _article(rng, EN_WORDS, EN_STOP, rng.randint(10, 30)) + "</main>" + _footer(rng)
        if rng.random() < 0.3:
            body += "<noscript>Please enable JavaScript to view this page.</noscript>"
        if rng.random() < 0.3:
            body = body.replace("<main>", "<main><p>\xa0\xa0 \t</p><p></p>", 1)
    elif fam == "listy":
        body = _nav(rng) + _ol(rng, EN_WORDS) + _table(rng, EN_WORDS) + _dl(rng, EN_WORDS) + "<table></table>" + _footer(rng)
    elif fam == "giant":
        paras = "".join(f"<p>{_sentence(rng, EN_WORDS, EN_STOP)}</p>" for _ in range(900))
        body = _nav(rng) + "<main>" + paras + "</main>" + _footer(rng)
    elif fam == "nonenglish":
        lang_claim, words = _NONEN[i % 3]
        if rng.random() < 0.25:
            # zh page
            lang_claim = "zh"
            paras = "".join(
                "<p>" + "".join(rng.choice(ZH_CHARS) for _ in range(rng.randint(120, 400))) + "</p>"
                for _ in range(rng.randint(2, 6))
            )
            body = f"<main>{paras}</main>"
        else:
            body = _nav(rng) + "<main>" + _article(rng, words, None, rng.randint(8, 20)) + "</main>" + _footer(rng)
        if rng.random() < 0.2:
            lang_claim = "en"  # claimed lang wrong vs content
    elif fam == "pii":
        paras = _article(rng, EN_WORDS, EN_STOP, rng.randint(8, 16))
        # PII embedded mid-paragraph so the surrounding prose carries the
        # node over the scorer threshold and the scrub stage sees it
        pii = "".join(
            f"<p>{_sentence(rng, EN_WORDS, EN_STOP)} You can {rng.choice(PII_SAMPLES)} "
            f"and it is on the record. {_sentence(rng, EN_WORDS, EN_STOP)}</p>"
            for _ in range(rng.randint(1, 3))
        )
        body = _nav(rng) + "<main>" + paras + pii + "</main>" + _footer(rng)
    elif fam == "toxic":
        paras = _article(rng, EN_WORDS, EN_STOP, rng.randint(4, 10))
        tox = f"<p>this site is full of {rng.choice(TOXIC_WORDS)} and {rng.choice(TOXIC_WORDS)} content</p>"
        body = _nav(rng) + "<main>" + paras + tox + "</main>" + _footer(rng)
    elif fam == "lowq":
        roll = rng.random()
        if roll < 0.33:
            body = "<main><p>" + " ".join("###$$%%@@" for _ in range(60)) + "</p></main>"
        elif roll < 0.66:
            line = _sentence(rng, EN_WORDS, n=6)
            body = "<main>" + "".join(f"<p>{line}</p>" for _ in range(30)) + "</main>"
        else:
            body = "<main><p>" + " ".join("aa bb cc dd" for _ in range(40)) + "... ... ...</p></main>"
    elif fam == "empty":
        body = rng.choice(["", "<main></main>", "<main><p>\xa0 \t\r\n</p></main>", "<div><span></span></div>"])
    elif fam == "dup":
        # identical body content across distinct urls (dedup target)
        drng = random.Random((seed << 10) ^ (i % 7))  # 7 shared variants
        body = "<main>" + _article(drng, EN_WORDS, EN_STOP, 12) + "</main>"
        title = "Duplicate Story " + str(i % 7)
    elif fam == "badbytes":
        body = "<main><p>caf\xe9 na\xefve r\xe9sum\xe9 " + _sentence(rng, EN_WORDS) + "</p></main>"
        encoding = "latin-1"
    else:  # pragma: no cover
        raise AssertionError(fam)

    html = _html_page(rng, title, body, lang_claim)
    try:
        html_bytes = html.encode(encoding)
    except UnicodeEncodeError:
        html_bytes = html.encode("utf-8")
    # `text`: what a prior (non-neural) extraction produced; empty for some rows
    pre_text = "" if rng.random() < 0.25 else _paragraph(rng, EN_WORDS, EN_STOP, 2)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html_bytes,
        "text": pre_text,
        "lang": lang_claim,
        "family": fam,
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def gen_pages(n: int, seed: int = 42, start: int = 0, keep_family: bool = False) -> pa.Table:
    """Generate rows [start, start+n) of the deterministic pages table."""
    rows = [_gen_one(i, seed) for i in range(start, start + n)]
    cols = {
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.large_binary()),
        "text": pa.array([r["text"] for r in rows], pa.large_string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    }
    if keep_family:
        cols["family"] = pa.array([r["family"] for r in rows], pa.string())
    return pa.table(cols)


def write_pages(out_dir: str, n: int, seed: int = 42, rows_per_file: int = 2000) -> list[str]:
    """Write the pages table as a directory of parquet shards.

    Sharded so Ray's read produces many blocks (>=128 at bench scale per
    BASELINE.md); each shard is generated independently (row-index keyed
    RNG), so generation parallelises over Ray tasks when a session is
    live (falls back to sequential otherwise) and is restartable —
    finished shards are skipped.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    todo = []
    paths = []
    for start in range(0, n, rows_per_file):
        cnt = min(rows_per_file, n - start)
        p = os.path.join(out_dir, f"pages-{start:08d}.parquet")
        if not os.path.exists(p):
            todo.append((p, start, cnt))
        paths.append(p)
    if not todo:
        return paths

    import ray

    if ray.is_initialized():

        @ray.remote
        def _gen_shard(path: str, start: int, cnt: int) -> None:
            tmp = path + ".tmp"
            pq.write_table(gen_pages(cnt, seed=seed, start=start), tmp)
            os.replace(tmp, path)  # atomic: readers never see partials

        ray.get([_gen_shard.remote(p, s, c) for p, s, c in todo])
    else:
        for p, s, c in todo:
            tmp = p + ".tmp"
            pq.write_table(gen_pages(c, seed=seed, start=s), tmp)
            os.replace(tmp, p)
    return paths
