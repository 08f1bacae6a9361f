"""Gopher/C4-style heuristic quality rules (pure + vectorizable).

Rules follow the published Gopher (Rae et al. 2021, arXiv:2112.11446)
and C4 (Raffel et al. 2020) recipes, adapted to NeuScraper-assembled
text (which has NO line structure — node texts are concatenated with no
separator, ``/root/reference/src/warc/get_text.py:36-37`` — so the
line-based Gopher rules are re-expressed over words).

Each rule returns (passes: bool). ``quality_flags`` collects every
failing rule name; ``drop`` fires on the FIRST failing rule in a fixed
order so ``drop_reason`` is deterministic.
"""

from __future__ import annotations

import pandas as pd

_EN_STOP_MIN = frozenset("the be to of and that have with".split())

MIN_WORDS = 10
MAX_WORDS = 200_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0
MAX_SYMBOL_WORD_RATIO = 0.1   # '#' or '...' per word (Gopher)
MIN_ALPHA_WORD_RATIO = 0.7    # words containing >=1 alphabetic char
MIN_STOPWORD_HITS = 2         # >=2 of 8 core stopwords (Gopher)
MIN_DISTINCT_WORD_RATIO = 0.2 # repetition guard (line rules re-expressed)
REPETITION_MAX_WORDS = 1000   # Heaps'-law guard: ratio is length-biased
# Gopher line rules over kept node texts (the "lines" of an assembled
# page — computed during assembly, consumed here)
MAX_BULLET_LINE_RATIO = 0.9
MAX_ELLIPSIS_LINE_RATIO = 0.3
BRACE_CHAR = "{"              # C4: drop pages containing '{'


def quality_stats(text: str) -> dict:
    """Per-document stats feeding every rule. Pure, deterministic."""
    words = text.split()
    n = len(words)
    if n == 0:
        return {
            "n_words": 0,
            "mean_word_len": 0.0,
            "symbol_word_ratio": 0.0,
            "alpha_word_ratio": 0.0,
            "stopword_hits": 0,
            "distinct_word_ratio": 0.0,
            "has_brace": BRACE_CHAR in text,
        }
    total_len = sum(len(w) for w in words)
    n_alpha = sum(1 for w in words if any(c.isalpha() for c in w))
    n_sym = text.count("#") + text.count("...")
    lower = [w.lower() for w in words]
    hits = sum(1 for w in lower if w.strip(".,!?;:") in _EN_STOP_MIN)
    return {
        "n_words": n,
        "mean_word_len": total_len / n,
        "symbol_word_ratio": n_sym / n,
        "alpha_word_ratio": n_alpha / n,
        "stopword_hits": hits,
        "distinct_word_ratio": len(set(lower)) / n,
        "has_brace": BRACE_CHAR in text,
    }


# (rule_name, predicate over stats) in drop_reason priority order
RULES = [
    ("too_few_words", lambda s: s["n_words"] < MIN_WORDS),
    ("too_many_words", lambda s: s["n_words"] > MAX_WORDS),
    ("mean_word_len", lambda s: not (MIN_MEAN_WORD_LEN <= s["mean_word_len"] <= MAX_MEAN_WORD_LEN)),
    ("symbol_ratio", lambda s: s["symbol_word_ratio"] > MAX_SYMBOL_WORD_RATIO),
    ("alpha_ratio", lambda s: s["alpha_word_ratio"] < MIN_ALPHA_WORD_RATIO),
    ("stopwords", lambda s: s["stopword_hits"] < MIN_STOPWORD_HITS),
    (
        "repetition",
        lambda s: s["n_words"] <= REPETITION_MAX_WORDS
        and s["distinct_word_ratio"] < MIN_DISTINCT_WORD_RATIO,
    ),
    ("brace", lambda s: s["has_brace"]),
]


def apply_rules(
    text: str, bullet_ratio: float = 0.0, ellipsis_ratio: float = 0.0
) -> tuple[list[str], dict]:
    """-> (failing rule names in priority order, stats). The two line
    ratios come from assembly (node texts = lines); 0.0 when absent."""
    s = quality_stats(text)
    flags = [name for name, pred in RULES if pred(s)]
    if s["n_words"] >= MIN_WORDS:  # line rules are meaningless on empties
        if bullet_ratio > MAX_BULLET_LINE_RATIO:
            flags.append("bullet_lines")
        if ellipsis_ratio > MAX_ELLIPSIS_LINE_RATIO:
            flags.append("ellipsis_lines")
    return flags, s


def heuristics_batch(df: pd.DataFrame, column: str = "extracted_text") -> pd.DataFrame:
    flags_col: list[list[str]] = []
    n_words_col: list[int] = []
    br = df["bullet_ratio"].tolist() if "bullet_ratio" in df.columns else [0.0] * len(df)
    er = df["ellipsis_ratio"].tolist() if "ellipsis_ratio" in df.columns else [0.0] * len(df)
    for t, b, e in zip(df[column].tolist(), br, er):
        flags, s = apply_rules(t, b, e)
        flags_col.append(flags)
        n_words_col.append(s["n_words"])
    df["quality_flags"] = flags_col
    df["n_words"] = pd.Series(n_words_col, index=df.index, dtype="int32")
    return df
