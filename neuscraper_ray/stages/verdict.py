"""Final keep/drop decision combining every filter stage's evidence.

Deterministic drop_reason priority (first match wins):
  empty -> lang -> ppl -> heuristic:<rule> -> toxicity
"""

from __future__ import annotations

import pandas as pd

from neuscraper_ray.stages.perplexity import PPL_THRESHOLD

KEEP_LANG = "en"  # reference gate: /root/reference/src/warc/build.py:139-140


def decide(
    extracted_text: str,
    lang_pred: str,
    ppl: float,
    quality_flags: list[str],
    toxic_count: int,
    ppl_threshold: float = PPL_THRESHOLD,
    parse_error: bool = False,
) -> tuple[bool, str]:
    """-> (keep, drop_reason). Pure, deterministic."""
    if parse_error and not extracted_text:
        return False, "parse_error"  # error lineage beats a bare "empty"
    if not extracted_text:
        return False, "empty"
    if lang_pred != KEEP_LANG:
        return False, "lang"
    if ppl > ppl_threshold:
        return False, "ppl"
    if quality_flags:
        return False, "heuristic:" + quality_flags[0]
    if toxic_count > 0:
        return False, "toxicity"
    return True, ""


def filters_fused_batch(
    df: pd.DataFrame,
    ppl_threshold: float = PPL_THRESHOLD,
    table_ref=None,
    langid_ref=None,
    with_content_hash: bool = False,
) -> pd.DataFrame:
    """All five filter stages in one batch fn => ONE Ray operator.

    Identical semantics to chaining langid -> perplexity -> heuristics
    -> scrub -> verdict_batch; fusing them by hand removes four
    per-operator startup/queue costs from the streaming executor (they
    are cheap per-row, so there is no parallelism lost).

    ``with_content_hash=True`` additionally emits ``content_hash``
    (md5 hex of extracted_text, "" for empty) so a downstream
    ``mark_duplicates`` never re-hashes the corpus — the docs already
    stream through this pass, so the md5 loop is paid exactly once."""
    from neuscraper_ray.stages.heuristics import heuristics_batch
    from neuscraper_ray.stages.langid import langid_batch
    from neuscraper_ray.stages.perplexity import perplexity_batch
    from neuscraper_ray.stages.scrub import scrub_batch

    df = langid_batch(df, weights_ref=langid_ref)
    df = perplexity_batch(df, table_ref=table_ref)
    df = heuristics_batch(df)
    df = scrub_batch(df)
    df = verdict_batch(df, ppl_threshold)
    if with_content_hash:
        from neuscraper_ray.functions.textstats import md5_hex

        # curate convention: empty extraction -> "" (never a dedup key)
        df["content_hash"] = md5_hex(
            df["extracted_text"].tolist(), empty_as_blank=True
        )
    return df


def verdict_batch(df: pd.DataFrame, ppl_threshold: float = PPL_THRESHOLD) -> pd.DataFrame:
    perr = (
        df["parse_error"].tolist()
        if "parse_error" in df.columns
        else [False] * len(df)
    )
    decisions = [
        decide(t, lp, p, qf, tc, ppl_threshold, pe)
        for t, lp, p, qf, tc, pe in zip(
            df["extracted_text"].tolist(),
            df["lang_pred"].tolist(),
            df["ppl"].tolist(),
            df["quality_flags"].tolist(),
            df["toxic_count"].tolist(),
            perr,
        )
    ]
    df["keep"] = [d[0] for d in decisions]
    df["drop_reason"] = [d[1] for d in decisions]
    return df
