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


_STATS_KEYS = [
    "n_words",
    "mean_word_len",
    "symbol_word_ratio",
    "alpha_word_ratio",
    "stopword_hits",
    "distinct_word_ratio",
    "has_brace",
]

# Python str.split() treats \x1c-\x1f as whitespace; Unicode White_Space
# (what the Rust regex \S in the vectorized path uses) does not. Texts
# containing them fall back to the per-doc reference implementation.
import re as _re

_NONUNICODE_WS_RE = _re.compile("[\x1c-\x1f]")


def _counts_vectorized(texts: list[str]) -> "np.ndarray":
    """(n, 7) int64 matrix of raw per-doc counts, one polars pass:
    n_words, total_len, n_sym, n_alpha, stop_hits, n_distinct,
    has_brace. The integer substrate under both ``_stats_vectorized``
    (float ratios for curate) and ``quality_filter_batch`` (the
    integer-exact standalone filter)."""
    import numpy as np
    import polars as pl

    n = len(texts)
    pf = pl.DataFrame({"text": pl.Series(texts, dtype=pl.String)})
    doc = pf.select(
        [
            pl.col("text").str.count_matches("#", literal=True).alias("n_hash"),
            pl.col("text").str.count_matches("...", literal=True).alias("n_ell"),
            pl.col("text").str.contains(BRACE_CHAR, literal=True).alias("has_brace"),
        ]
    )
    words = (
        pf.select(pl.col("text").str.extract_all(r"\S+").alias("w"))
        .with_row_index("i")
        .explode("w", empty_as_null=True)
        .drop_nulls("w")
    )
    agg = (
        words.with_columns(
            [
                pl.col("w").str.len_chars().alias("wlen"),
                pl.col("w").str.contains(r"\p{L}").alias("alpha"),
                pl.col("w").str.to_lowercase().alias("lower"),
            ]
        )
        .with_columns(pl.col("lower").str.strip_chars(".,!?;:").alias("stripped"))
        .group_by("i")
        .agg(
            [
                pl.len().alias("n_words"),
                pl.col("wlen").sum().alias("total_len"),
                pl.col("alpha").sum().alias("n_alpha"),
                pl.col("stripped").is_in(list(_EN_STOP_MIN)).sum().alias("stop_hits"),
                pl.col("lower").n_unique().alias("n_distinct"),
            ]
        )
    )
    nw = np.zeros(n, dtype=np.int64)
    tl = np.zeros(n, dtype=np.int64)
    na = np.zeros(n, dtype=np.int64)
    sh = np.zeros(n, dtype=np.int64)
    nd = np.zeros(n, dtype=np.int64)
    ii = agg["i"].to_numpy().astype(np.int64)
    nw[ii] = agg["n_words"].to_numpy()
    tl[ii] = agg["total_len"].to_numpy()
    na[ii] = agg["n_alpha"].to_numpy()
    sh[ii] = agg["stop_hits"].to_numpy()
    nd[ii] = agg["n_distinct"].to_numpy()
    n_sym = (doc["n_hash"].to_numpy() + doc["n_ell"].to_numpy()).astype(np.int64)
    out = np.zeros((n, 7), dtype=np.int64)
    out[:, 0] = nw
    out[:, 1] = tl
    out[:, 2] = n_sym
    out[:, 3] = na
    out[:, 4] = sh
    out[:, 5] = nd
    out[:, 6] = doc["has_brace"].to_numpy()
    return out


def _stats_vectorized(texts: list[str]) -> "np.ndarray":
    """(n, 7) float64 matrix of quality_stats values, one polars pass.

    Column order is ``_STATS_KEYS``. Bit-identical to per-doc
    ``quality_stats`` (asserted in tests): the ratio divisions are the
    same IEEE float64 ops, word splitting/lowering/stripping run on the
    same Unicode definitions.
    """
    import numpy as np

    c = _counts_vectorized(texts)
    nw, tl, n_sym, na, sh, nd, brace = (c[:, j] for j in range(7))
    n = len(texts)
    safe = np.where(nw > 0, nw, 1).astype(np.float64)
    pos = nw > 0
    out = np.zeros((n, 7), dtype=np.float64)
    out[:, 0] = nw
    out[:, 1] = np.where(pos, tl / safe, 0.0)
    out[:, 2] = np.where(pos, n_sym / safe, 0.0)
    out[:, 3] = np.where(pos, na / safe, 0.0)
    out[:, 4] = np.where(pos, sh, 0)
    out[:, 5] = np.where(pos, nd / safe, 0.0)
    out[:, 6] = brace
    return out


def heuristics_batch(df: pd.DataFrame, column: str = "extracted_text") -> pd.DataFrame:
    """Vectorized batch application of ``apply_rules`` (same outputs).

    Stats run batch-wide in polars/numpy (one Rust pass over the
    exploded word list instead of per-word Python); the rule
    thresholds are then boolean masks and the per-doc flag lists are
    assembled from a small (n, n_rules) matrix. Docs containing
    \\x1c-\\x1f (Python-only whitespace) use the per-doc reference path.
    """
    import numpy as np

    texts = df[column].tolist()
    n = len(texts)
    br = (
        df["bullet_ratio"].to_numpy()
        if "bullet_ratio" in df.columns
        else np.zeros(n)
    )
    er = (
        df["ellipsis_ratio"].to_numpy()
        if "ellipsis_ratio" in df.columns
        else np.zeros(n)
    )
    m = _stats_vectorized(texts)
    for i, t in enumerate(texts):
        if _NONUNICODE_WS_RE.search(t):
            s = quality_stats(t)
            m[i] = [float(s[k]) for k in _STATS_KEYS]
    nw, mwl, swr, awr, sh, dwr, brace = (m[:, j] for j in range(7))
    checks = [
        ("too_few_words", nw < MIN_WORDS),
        ("too_many_words", nw > MAX_WORDS),
        ("mean_word_len", ~((MIN_MEAN_WORD_LEN <= mwl) & (mwl <= MAX_MEAN_WORD_LEN))),
        ("symbol_ratio", swr > MAX_SYMBOL_WORD_RATIO),
        ("alpha_ratio", awr < MIN_ALPHA_WORD_RATIO),
        ("stopwords", sh < MIN_STOPWORD_HITS),
        ("repetition", (nw <= REPETITION_MAX_WORDS) & (dwr < MIN_DISTINCT_WORD_RATIO)),
        ("brace", brace > 0),
        ("bullet_lines", (nw >= MIN_WORDS) & (br > MAX_BULLET_LINE_RATIO)),
        ("ellipsis_lines", (nw >= MIN_WORDS) & (er > MAX_ELLIPSIS_LINE_RATIO)),
    ]
    names = [c[0] for c in checks]
    mat = np.column_stack([c[1] for c in checks])
    flags_col = [[names[j] for j in np.flatnonzero(mat[i])] for i in range(n)]
    df["quality_flags"] = flags_col
    df["n_words"] = pd.Series(nw.astype("int32"), index=df.index, dtype="int32")
    return df


# ---------------------------------------------------------------------------
# Standalone corpus-level quality filter (the documents-table operator).
#
# Same Gopher thresholds as RULES, but each ratio comparison is written
# in cross-multiplied integer form — the mathematically exact predicate,
# free of float-division rounding — so DuckDB reproduces the keep/drop
# decision value-for-value (``sql_quality_filter``). No line ratios here
# (raw corpus text has no line structure).

_MWL_LO, _MWL_HI = 2, 12          # == MIN/MAX_MEAN_WORD_LEN
_SYM_NUM, _SYM_DEN = 1, 10        # n_sym/nw >  1/10  == MAX_SYMBOL_WORD_RATIO
_ALPHA_NUM, _ALPHA_DEN = 7, 10    # n_alpha/nw < 7/10 == MIN_ALPHA_WORD_RATIO
_DIST_NUM, _DIST_DEN = 2, 10     # n_distinct/nw < 2/10 == MIN_DISTINCT_WORD_RATIO

assert _MWL_LO == MIN_MEAN_WORD_LEN and _MWL_HI == MAX_MEAN_WORD_LEN
assert _SYM_NUM / _SYM_DEN == MAX_SYMBOL_WORD_RATIO
assert _ALPHA_NUM / _ALPHA_DEN == MIN_ALPHA_WORD_RATIO
assert _DIST_NUM / _DIST_DEN == MIN_DISTINCT_WORD_RATIO

_FILTER_RULES = [
    # (name, fail predicate over int64 count arrays) in priority order
    ("too_few_words", lambda c: c["nw"] < MIN_WORDS),
    ("too_many_words", lambda c: c["nw"] > MAX_WORDS),
    (
        "mean_word_len",
        lambda c: (c["tl"] < _MWL_LO * c["nw"]) | (c["tl"] > _MWL_HI * c["nw"]),
    ),
    ("symbol_ratio", lambda c: c["n_sym"] * _SYM_DEN > _SYM_NUM * c["nw"]),
    ("alpha_ratio", lambda c: c["n_alpha"] * _ALPHA_DEN < _ALPHA_NUM * c["nw"]),
    ("stopwords", lambda c: c["sh"] < MIN_STOPWORD_HITS),
    (
        "repetition",
        lambda c: (c["nw"] <= REPETITION_MAX_WORDS)
        & (c["nd"] * _DIST_DEN < _DIST_NUM * c["nw"]),
    ),
    ("brace", lambda c: c["brace"] > 0),
]


def _counts_one(text: str) -> list:
    """Per-doc reference for ``_counts_vectorized`` (the \x1c-\x1f
    whitespace fallback, same contract as ``quality_stats``)."""
    words = text.split()
    lower = [w.lower() for w in words]
    return [
        len(words),
        sum(len(w) for w in words),
        text.count("#") + text.count("..."),
        sum(1 for w in words if any(ch.isalpha() for ch in w)),
        sum(1 for w in lower if w.strip(".,!?;:") in _EN_STOP_MIN),
        len(set(lower)),
        int(BRACE_CHAR in text),
    ]


def drop_reasons(texts: list[str]):
    """-> (reason: object ndarray, '' when kept; n_words int64 ndarray).
    The shared decision kernel under ``quality_filter_batch`` and the
    per-source rollup."""
    import numpy as np

    m = _counts_vectorized(texts)
    for i, t in enumerate(texts):
        if _NONUNICODE_WS_RE.search(t):
            m[i] = _counts_one(t)
    c = {
        k: m[:, j]
        for j, k in enumerate(["nw", "tl", "n_sym", "n_alpha", "sh", "nd", "brace"])
    }
    reason = np.full(len(texts), "", dtype=object)
    for name, pred in reversed(_FILTER_RULES):
        reason[pred(c)] = name
    return reason, c["nw"]


def quality_filter_batch(batch, column: str = "text"):
    """pyarrow batch -> (doc_id, n_words, keep BIGINT, drop_reason).

    One polars counts pass (``_counts_vectorized``), integer-exact rule
    masks, first-failing-rule drop_reason ('' when kept). Pure map
    stage: zero shuffle at any corpus size."""
    import numpy as np
    import pyarrow as pa

    texts = batch.column(column).to_pylist()
    reason, nw = drop_reasons(texts)
    c = {"nw": nw}
    out = batch.select(["doc_id"])
    out = out.append_column("n_words", pa.array(c["nw"], type=pa.int64()))
    out = out.append_column(
        "keep", pa.array((reason == "").astype(np.int64), type=pa.int64())
    )
    out = out.append_column("drop_reason", pa.array(reason, type=pa.string()))
    return out


def sql_quality_filter(table: str = "documents") -> str:
    """DuckDB twin of ``quality_filter_batch`` — same word split
    (whitespace runs), same counts, same cross-multiplied integer rule
    predicates, same first-failing-rule priority."""
    stop = ", ".join(f"'{w}'" for w in sorted(_EN_STOP_MIN))
    return f"""
WITH d AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\x0c\\r]+'), w -> w != '') AS ws
  FROM {table}
),
c AS (
  SELECT doc_id,
    len(ws)::BIGINT AS nw,
    coalesce(list_sum(list_transform(ws, w -> length(w)::BIGINT)), 0)::BIGINT AS tl,
    ((length(text) - length(replace(text, '#', '')))
      + (length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS n_sym,
    coalesce(list_sum(list_transform(ws,
      w -> CASE WHEN regexp_matches(w, '\\p{{L}}') THEN 1 ELSE 0 END)), 0)::BIGINT AS n_alpha,
    coalesce(list_sum(list_transform(ws,
      w -> CASE WHEN trim(lower(w), '.,!?;:') IN ({stop}) THEN 1 ELSE 0 END)), 0)::BIGINT AS sh,
    len(list_distinct(list_transform(ws, w -> lower(w))))::BIGINT AS nd,
    CASE WHEN contains(text, '{{') THEN 1 ELSE 0 END AS brace
  FROM d
)
SELECT doc_id, nw AS n_words,
  CASE WHEN reason = '' THEN 1 ELSE 0 END::BIGINT AS keep,
  reason AS drop_reason
FROM (
  SELECT *, CASE
    WHEN nw < {MIN_WORDS} THEN 'too_few_words'
    WHEN nw > {MAX_WORDS} THEN 'too_many_words'
    WHEN tl < {_MWL_LO} * nw OR tl > {_MWL_HI} * nw THEN 'mean_word_len'
    WHEN n_sym * {_SYM_DEN} > {_SYM_NUM} * nw THEN 'symbol_ratio'
    WHEN n_alpha * {_ALPHA_DEN} < {_ALPHA_NUM} * nw THEN 'alpha_ratio'
    WHEN sh < {MIN_STOPWORD_HITS} THEN 'stopwords'
    WHEN nw <= {REPETITION_MAX_WORDS} AND nd * {_DIST_DEN} < {_DIST_NUM} * nw THEN 'repetition'
    WHEN brace = 1 THEN 'brace'
    ELSE '' END AS reason
  FROM c
)
"""


# ------------------------------------------------- C4 line-level cleaning

C4_TERMINALS = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
C4_BAD_LINE_WORD = "javascript"
C4_BAD_PAGE_PHRASE = "lorem ipsum"


def c4_clean_batch(
    batch, id_col: str = "doc_id", text_col: str = "text"
):
    """C4's line-level cleaning (Raffel et al. 2020 §2.2), one
    vectorized zero-shuffle pass per batch:

    line rules — keep a trimmed non-empty line iff it ends in terminal
    punctuation (``. ! ? "``), has >= 5 whitespace words, and does not
    contain 'javascript' (case-insensitive);
    page rules — keep the page iff the CLEANED text has >= 3 sentences
    (count of ``.!?`` characters) and the ORIGINAL text contains
    neither 'lorem ipsum' (case-insensitive) nor '{'.

    -> (doc_id, n_lines, n_kept_lines, n_sentences, text_clean, keep)
    for every input row. SQL twin :func:`sql_c4_clean` (shared
    constants). The three-sentence-span dedup from the same paper is
    the separate ``docs_chunk_dedup`` family.
    """
    import numpy as np
    import polars as pl
    import pyarrow as pa
    import pyarrow.compute as pc

    from neuscraper_ray.functions.dedup import LINE_STRIP

    text = batch.column(text_col)
    n = len(batch)
    lines = pc.split_pattern(text, "\n").combine_chunks()
    offs = lines.offsets.to_numpy()
    parents = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    trimmed = pc.utf8_trim(lines.values, LINE_STRIP)

    lf = pl.DataFrame(
        {"parent": parents, "line": pl.from_arrow(trimmed)}
    ).filter(pl.col("line") != "")
    ends = pl.any_horizontal(
        *[pl.col("line").str.ends_with(t) for t in C4_TERMINALS]
    )
    words = (
        pl.col("line")
        .str.split(" ")
        .list.eval(pl.element().filter(pl.element() != ""))
        .list.len()
    )
    bad = (
        pl.col("line")
        .str.to_lowercase()
        .str.contains(C4_BAD_LINE_WORD, literal=True)
    )
    lf = lf.with_columns(
        (ends & (words >= C4_MIN_LINE_WORDS) & ~bad).alias("kept")
    )
    agg = lf.group_by("parent", maintain_order=False).agg(
        pl.len().cast(pl.Int64).alias("n_lines"),
        pl.col("kept").sum().cast(pl.Int64).alias("n_kept_lines"),
        # row order inside a group is original line order (never sorted)
        pl.col("line").filter(pl.col("kept")).str.join("\n").alias("tc"),
    )

    n_lines = np.zeros(n, dtype=np.int64)
    n_kept = np.zeros(n, dtype=np.int64)
    tc = np.full(n, "", dtype=object)
    idx = agg["parent"].to_numpy()
    n_lines[idx] = agg["n_lines"].to_numpy()
    n_kept[idx] = agg["n_kept_lines"].to_numpy()
    tc[idx] = agg["tc"].to_numpy()

    tc_arr = pa.array(tc, pa.string())
    n_sent = np.zeros(n, dtype=np.int64)
    for ch in (".", "!", "?"):
        n_sent += pc.count_substring(tc_arr, ch).to_numpy(zero_copy_only=False)
    lower = pc.utf8_lower(text)
    lorem = pc.match_substring(lower, C4_BAD_PAGE_PHRASE).to_numpy(
        zero_copy_only=False
    )
    brace = pc.match_substring(text, "{").to_numpy(zero_copy_only=False)
    keep = (n_sent >= C4_MIN_SENTENCES) & ~lorem & ~brace
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_lines": pa.array(n_lines),
            "n_kept_lines": pa.array(n_kept),
            "n_sentences": pa.array(n_sent),
            "text_clean": tc_arr,
            "keep": pa.array(keep),
        }
    )


def sql_c4_clean(table: str = "documents", text_expr: str = "text") -> str:
    """DuckDB twin of :func:`c4_clean_batch` over ``text_expr`` (which
    lets the query layer plant deterministic rule hits the way
    ``docs_scrub`` does). Shares every constant with the batch fn."""
    term = " OR ".join(
        "line LIKE '%' || " + f"chr(34)" if t == '"' else f"line LIKE '%{t}'"
        for t in C4_TERMINALS
    )
    return f"""
WITH src AS (SELECT doc_id, {text_expr} AS text FROM {table}),
ls AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM src),
l0 AS (
  SELECT doc_id, unnest(list_transform(range(len(ls)),
    k -> struct_pack(li := k, raw := ls[(k+1)::BIGINT]))) AS s
  FROM ls
),
fl AS (
  SELECT doc_id, s.li AS line_idx,
    trim(s.raw, ' ' || chr(9) || chr(13)) AS line
  FROM l0
),
nz AS (SELECT * FROM fl WHERE line <> ''),
ck AS (
  SELECT doc_id, line_idx, line,
    (({term})
     AND len(list_filter(string_split(line, ' '), w -> w <> ''))
         >= {C4_MIN_LINE_WORDS}
     AND NOT contains(lower(line), '{C4_BAD_LINE_WORD}')) AS kept
  FROM nz
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines,
    sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept_lines,
    coalesce(string_agg(CASE WHEN kept THEN line END, chr(10)
      ORDER BY line_idx), '') AS text_clean
  FROM ck GROUP BY doc_id
),
j AS (
  SELECT s.doc_id, s.text,
    coalesce(a.n_lines, 0)::BIGINT AS n_lines,
    coalesce(a.n_kept_lines, 0)::BIGINT AS n_kept_lines,
    coalesce(a.text_clean, '') AS text_clean
  FROM src s LEFT JOIN agg a USING (doc_id)
)
SELECT doc_id, n_lines, n_kept_lines,
  (length(text_clean)
   - length(replace(replace(replace(text_clean, '.', ''), '!', ''), '?', ''))
  )::BIGINT AS n_sentences,
  text_clean,
  ((length(text_clean)
    - length(replace(replace(replace(text_clean, '.', ''), '!', ''), '?', ''))
   ) >= {C4_MIN_SENTENCES}
   AND NOT contains(lower(text), '{C4_BAD_PAGE_PHRASE}')
   AND NOT contains(text, '{{')) AS keep
FROM j
""".strip()
