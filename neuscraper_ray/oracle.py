"""Single-process oracle: reference semantics over a pages table.

Runs the SAME pure functions as the Ray pipeline (domparse extraction,
deterministic scorer, descending-id assembly, langid, perplexity,
heuristics, scrub, verdict) sequentially over an in-memory
``pyarrow.Table`` of pages. The conformance tests assert the Ray
pipeline's output equals this byte-for-byte per url (extracted +
scrubbed text) and keep/drop F1 >= 0.99 under arbitrary partitioning —
mirroring the reference's golden-evaluation test strategy
(``/root/reference/src/eval/run_eval.py:31-51``) with the synthetic
corpus standing in for ClueWeb22 ``en0001-01``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from neuscraper_ray.domparse import extract_node_sequence
from neuscraper_ray.stages.assemble import assemble_page_text
from neuscraper_ray.stages.extract import decode_html
from neuscraper_ray.stages.heuristics import apply_rules
from neuscraper_ray.stages.langid import detect_language
from neuscraper_ray.stages.perplexity import build_logprob_table, perplexity
from neuscraper_ray.stages.scorer import THRESHOLD, score_texts
from neuscraper_ray.stages.scrub import scrub_text
from neuscraper_ray.stages.verdict import decide


def oracle_page(url: str, html_bytes: bytes, ppl_table) -> dict:
    """One page through the whole reference-semantics pipeline."""
    parse_error = False
    try:
        seq = extract_node_sequence(decode_html(html_bytes))
    except Exception:
        seq = []
        parse_error = True
    node_ids = [r[0] for r in seq]
    texts = [r[1] for r in seq]
    has_text = [r[4] for r in seq]
    scores = score_texts(texts)
    kept = [
        i
        for i, (nid, s, ht) in enumerate(zip(node_ids, scores, has_text))
        if s > THRESHOLD and nid != 0 and ht
    ]
    kept_texts = [texts[i] for i in kept]
    extracted = assemble_page_text([node_ids[i] for i in kept], kept_texts)
    lang_pred, lang_score = detect_language(extracted)
    ppl = perplexity(extracted, ppl_table)
    # Gopher line rules: kept node texts are the page's "lines"
    if kept_texts:
        bullet_ratio = sum(1.0 for t in kept_texts if t[:1] in "-*•") / len(kept_texts)
        ellipsis_ratio = sum(1.0 for t in kept_texts if t.endswith("...")) / len(kept_texts)
    else:
        bullet_ratio = ellipsis_ratio = 0.0
    flags, stats = apply_rules(extracted, bullet_ratio, ellipsis_ratio)
    scrubbed, pii, tox = scrub_text(extracted)
    keep, reason = decide(extracted, lang_pred, ppl, flags, tox, parse_error=parse_error)
    return {
        "url": url,
        "parse_error": parse_error,
        "extracted_text": extracted,
        "n_kept": len(kept),
        "lang_pred": lang_pred,
        "lang_score": lang_score,
        "ppl": ppl,
        "quality_flags": flags,
        "n_words": stats["n_words"],
        "scrubbed_text": scrubbed,
        "pii_count": pii,
        "toxic_count": tox,
        "keep": keep,
        "drop_reason": reason,
    }


def oracle_curate(pages: pa.Table) -> pd.DataFrame:
    """Full oracle run -> one row per url (labels table, FIXTURES.md T3)."""
    table = build_logprob_table()
    rows = [
        oracle_page(url, html, table)
        for url, html in zip(
            pages.column("url").to_pylist(), pages.column("html").to_pylist()
        )
    ]
    return pd.DataFrame(rows)
