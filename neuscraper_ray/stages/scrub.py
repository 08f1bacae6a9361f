"""PII / toxicity scrubbing (regex-based, deterministic).

Precompiled module-level patterns (compiled once per worker process at
import); replacement order is fixed (email, ssn, phone, credit-card,
ipv4) so overlapping matches resolve deterministically in both the Ray
stage and the oracle. Toxicity is a word-list flag: any hit drops the
document (reason "toxicity") and hits are masked in ``scrubbed_text``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# order matters: SSN before phone before credit-card (overlap resolution)
PII_PATTERNS: list[tuple[str, re.Pattern, str]] = [
    (
        "email",
        re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
        "<EMAIL>",
    ),
    ("ssn", re.compile(r"\b\d{3}-\d{2}-\d{4}\b"), "<SSN>"),
    (
        "phone",
        re.compile(r"(?:\(\d{3}\)\s?|\b\d{3}[-.\s])\d{3}[-.\s]\d{4}\b"),
        "<PHONE>",
    ),
    (
        "credit_card",
        re.compile(r"\b(?:\d[ -]?){12,15}\d\b"),
        "<CC>",
    ),
    ("ipv4", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"), "<IP>"),
]

TOXIC_LEXICON = frozenset({"badword1", "badword2", "slurword", "vileword"})
_TOXIC_RE = re.compile(
    r"\b(" + "|".join(sorted(TOXIC_LEXICON)) + r")\b", re.IGNORECASE
)


_DIGIT_RE = re.compile(r"\d")

# The exact set of non-ASCII codepoints Python's re.IGNORECASE treats
# as equivalent to an ASCII letter (exhaustively enumerated over the
# whole codepoint space): İ(U+0130)->i, ı(U+0131)->i, ſ(U+017F)->s,
# K(U+212A)->k. Folding them BEFORE .lower() keeps the substring
# prescan an exact superset of what _TOXIC_RE can match — .lower()
# alone misses them (İ lowers to 'i'+combining-dot, ſ/ı to themselves).
_RE_I_FOLD_FIX = str.maketrans({0x130: "i", 0x131: "i", 0x17F: "s", 0x212A: "k"})


def scrub_text(text: str) -> tuple[str, int, int]:
    """-> (scrubbed_text, pii_count, toxic_count). Pure, deterministic.

    Gated: each regex pass runs only when a C-speed prescan says it can
    match (email needs '@'; ssn/phone/cc/ipv4 need a digit; toxicity
    needs a lexicon substring in the fold-fixed lowercase text — see
    ``_RE_I_FOLD_FIX`` for why .lower() alone is not a superset of
    re.IGNORECASE). Replacement tokens ("<EMAIL>" etc.)
    introduce neither digits nor lexicon words, so gating on the text
    as it stands is exact — ~4-8% of real docs hit any gate, turning
    six full scans per clean doc into at most two.
    """
    pii = 0
    if "@" in text:
        text, n = PII_PATTERNS[0][1].subn(PII_PATTERNS[0][2], text)
        pii += n
    if _DIGIT_RE.search(text):
        for _name, pat, repl in PII_PATTERNS[1:]:
            text, n = pat.subn(repl, text)
            pii += n
    tox = 0
    lower = text.translate(_RE_I_FOLD_FIX).lower()
    if any(w in lower for w in TOXIC_LEXICON):
        text, tox = _TOXIC_RE.subn("<TOX>", text)
    return text, pii, tox


_FOLD_FROM = [chr(k) for k in (0x130, 0x131, 0x17F, 0x212A)]
_FOLD_TO = ["i", "i", "s", "k"]


def scrub_batch(df: pd.DataFrame, column: str = "extracted_text") -> pd.DataFrame:
    """Vectorized prescan gate + per-row exact scrub on flagged rows.

    The gate (``@`` / digit / lexicon-substring) runs in polars' Rust
    kernels over the whole batch with NO string materialization: one
    Aho-Corasick ``contains_any(..., ascii_case_insensitive=True)`` pass
    covers every A-Za-z spelling of the ASCII lexicon, and a presence
    check for the four ``_RE_I_FOLD_FIX`` codepoints (İ ı ſ K — the only
    non-ASCII codepoints re.IGNORECASE folds onto ASCII letters,
    verified exhaustively over the codepoint space) flags the rows where
    case-insensitive ASCII matching is not enough. ``scrub_text``
    re-checks its own exact gates per row, so the prescan only needs to
    be a superset; false positives cost time, never correctness. Only
    flagged rows (~4-11% of web docs) pay the Python regex path.
    """
    import polars as pl

    texts = df[column].to_numpy(dtype=object)
    c = pl.col("t")
    needs = (
        pl.DataFrame({"t": texts})
        .lazy()
        .select(
            c.str.contains("@", literal=True)
            | c.str.contains(r"\d")
            | c.str.contains_any(sorted(TOXIC_LEXICON), ascii_case_insensitive=True)
            | c.str.contains_any(_FOLD_FROM)
        )
        .collect()
        .to_series()
        .to_numpy()
    )

    out = texts.copy()
    pii = np.zeros(len(texts), dtype=np.int32)
    tox = np.zeros(len(texts), dtype=np.int32)
    for i in np.flatnonzero(needs):
        out[i], pii[i], tox[i] = scrub_text(texts[i])
    df["scrubbed_text"] = out
    df["pii_count"] = pii
    df["toxic_count"] = tox
    return df
