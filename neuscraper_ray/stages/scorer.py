"""NeuScraper-style per-node content/noise scorer (deterministic numpy).

The reference scores each DOM text node with an XLM-R-based transformer
(``/root/reference/src/scraper/model.py:49-124``) and keeps nodes whose
``Primary`` sigmoid exceeds 0.9
(``/root/reference/src/scraper/inference.py:133``,
``src/scraper/commoncrawl.py:134``). No torch / no checkpoint exists in
this environment, so the model is re-expressed as a *deterministic*
featurized scorer with the same interface and decision rule:

  hashed char-trigram bag (32-d) -> fixed-seed 2-layer MLP  (the
  "neural" texture) combined with interpretable content-vs-boilerplate
  evidence (length, multilingual stopword density, terminal punctuation,
  digit/symbol density, CJK density) -> sigmoid -> threshold 0.9.

Both the Ray actor-pool stage and the single-process oracle call
``score_texts`` — identical bits on identical input, which is what the
F1>=0.99 conformance gate checks across arbitrary partitionings.

Reference quirks preserved:
- strictly-greater threshold (``output > thr``, ``inference.py:108``);
- node id 0 can never be predicted (dropped with padding,
  ``inference.py:116-118``).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

THRESHOLD = 0.9  # Primary @ 0.9

# multilingual function-word list (the reference model is multilingual XLM-R)
_STOPWORDS = frozenset(
    "the of and a to in is it you that he was for on are with as "  # en
    "der die das und ist nicht mit von auf für eine "  # de
    "le la les et est dans pour que une sur avec "  # fr
    "el los y es en para con no más por como".split()  # es
)

_N_HASH = 32
_HIDDEN = 16


def _mlp_weights(seed: int = 12345) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    w1 = rng.randn(_N_HASH, _HIDDEN).astype(np.float64) * 0.3
    b1 = rng.randn(_HIDDEN).astype(np.float64) * 0.1
    w2 = rng.randn(_HIDDEN).astype(np.float64) * 0.3
    b2 = np.float64(0.0)
    return w1, b1, w2, b2


_W1, _B1, _W2, _B2 = _mlp_weights()


_IS_SYMBOL = np.zeros(256, dtype=np.float64)
for _o in range(33, 127):
    if not (48 <= _o <= 57 or 65 <= _o <= 90 or 97 <= _o <= 122):
        _IS_SYMBOL[_o] = 1.0
_IS_DIGIT = np.zeros(256, dtype=np.float64)
_IS_DIGIT[48:58] = 1.0
_IS_CJKB = np.zeros(256, dtype=np.float64)
_IS_CJKB[0xE4:0xEA] = 1.0  # utf-8 lead bytes of the CJK unified block

# all three indicators packed in one int64 so the per-batch segment
# sums cost ONE gather + ONE cumsum instead of three of each. Per-text
# heads are capped at 256 bytes, so each packed field's count fits in
# 16 bits; the running int64 cumsum stays exact below 2**30 total
# bytes (max 2**30 * (1 + 2**16 + 2**32) ~= 4.6e18 < 2**63; 2**31
# would already graze the int64 edge). Guarded at use — ~4M texts per
# call, far past any real batch.
_PACK_SHIFT_SYM = 16
_PACK_SHIFT_CJK = 32
_PACKED_IND = (
    _IS_DIGIT
    + _IS_SYMBOL * float(1 << _PACK_SHIFT_SYM)
    + _IS_CJKB * float(1 << _PACK_SHIFT_CJK)
).astype(np.int64)


def score_logits(texts: list[str]) -> np.ndarray:
    """Deterministic content logit (float64) per text. Pure function.

    All byte-level features are vectorized numpy over the utf-8 head of
    each node; the hashed-trigram MLP uses a polynomial rolling hash
    computed with ``np.bincount`` (no per-trigram Python).
    """
    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    n_words = np.empty(n)
    stop_ratio = np.empty(n)
    ends_punct = np.empty(n)
    char_len = np.empty(n)
    heads: list[bytes] = [""] * n  # type: ignore[list-item]
    is_stop = _STOPWORDS.__contains__  # C-level bool sum via map below
    for i, t in enumerate(texts):
        L = len(t)
        char_len[i] = L
        heads[i] = t[:256].encode("utf-8", "replace") if L else b""
        if L == 0:
            n_words[i] = stop_ratio[i] = ends_punct[i] = 0.0
            continue
        words = t[:512].lower().split()
        nw = max(len(words), 1)
        n_words[i] = max(len(t.split()), 1) if L > 512 else nw
        head_words = words if nw <= 64 else words[:64]
        stop_ratio[i] = sum(map(is_stop, head_words)) / min(nw, 64)
        ends_punct[i] = 1.0 if t[-1] in ".!?" else 0.0

    # one pass over the concatenated utf-8 heads: segment sums via cumsum
    lens = np.fromiter(map(len, heads), dtype=np.int64, count=n)
    big = np.frombuffer(b"".join(heads), dtype=np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    hl = np.maximum(lens, 1).astype(np.float64)

    # packed-indicator segment sums: one gather + one int64 cumsum for
    # all three byte classes (exact — integer counts, no float rounding)
    if 0 < len(big) < (1 << 30):
        cs = np.concatenate([[0], np.cumsum(_PACKED_IND[big])])
        seg = cs[ends] - cs[starts]
        field = np.int64((1 << _PACK_SHIFT_SYM) - 1)
        digit_ratio = (seg & field).astype(np.float64) / hl
        symbol_ratio = ((seg >> _PACK_SHIFT_SYM) & field).astype(np.float64) / hl
        cjk_ratio = (seg >> _PACK_SHIFT_CJK).astype(np.float64) / hl
    else:  # empty batch, or past the packed cumsum's exactness bound

        def seg_sum(table: np.ndarray) -> np.ndarray:
            cs = (
                np.concatenate([[0.0], np.cumsum(table[big])])
                if len(big)
                else np.zeros(1)
            )
            return cs[ends] - cs[starts]

        digit_ratio = seg_sum(_IS_DIGIT) / hl
        symbol_ratio = seg_sum(_IS_SYMBOL) / hl
        cjk_ratio = seg_sum(_IS_CJKB) / hl

    # hashed char-trigram bag over the first 96 bytes, batched bincount
    l96 = np.minimum(lens, 96)
    e96 = np.cumsum(l96)
    s96 = e96 - l96
    # per-row index ranges [starts[i], starts[i]+l96[i]) built without a
    # Python loop: row-relative offsets + repeated row starts
    rep_l96 = np.repeat(starts - s96, l96)
    b96 = big[np.arange(int(e96[-1]) if n else 0, dtype=np.int64) + rep_l96].astype(
        np.int32
    )
    hash_feats = np.zeros((n, _N_HASH), dtype=np.float64)
    if len(b96) >= 3:
        tri = ((b96[:-2] * 131 + b96[1:-1]) * 131 + b96[2:]) & (_N_HASH - 1)
        node_of = np.repeat(np.arange(n), l96)
        valid = node_of[:-2] == node_of[2:]
        idx = node_of[:-2][valid] * _N_HASH + tri[valid]
        counts = np.bincount(idx, minlength=n * _N_HASH).reshape(n, _N_HASH)
        denom = np.maximum(l96 - 2, 1).astype(np.float64)
        hash_feats = counts / denom[:, None]
    h = np.maximum(np.tanh(hash_feats @ _W1 + _B1) @ _W2 + _B2, -1.5)
    logit = (
        -2.5
        + 0.8 * np.log1p(n_words)
        + 0.35 * np.log1p(char_len)
        + 5.5 * stop_ratio
        + 1.0 * ends_punct
        + 3.5 * cjk_ratio
        - 9.0 * digit_ratio
        - 7.0 * symbol_ratio
        + 0.6 * h
    )
    return logit


def score_texts(texts: list[str]) -> np.ndarray:
    """Deterministic content score in (0, 1) per text (the ``Primary``
    task's sigmoid). Pure function — shared by the Ray stages and the
    single-process oracle."""
    return (1.0 / (1.0 + np.exp(-score_logits(texts)))).astype(np.float32)


# ---- A2 full task x threshold sweep (ref inference.py:78-88) --------
# The reference's eval computes predictions for 6 tasks x 8 thresholds
# (eval_on_leaderboard_set_vectorized) even though save_predictions
# keeps only Primary@0.9. The reference model emits 6 sigmoids per
# node; this deterministic stand-in derives the 5 auxiliary task heads
# as fixed affine views of the shared logit (a real multi-head model
# shares its encoder the same way). Primary is the IDENTICAL
# expression as score_texts, so the Primary@0.9 slice of the sweep is
# bit-equal to the flagship decision (pinned in tests).

TASKS = ("Primary", "Heading", "Title", "Paragraph", "Table", "List")
SWEEP_THRESHOLDS = (0.1, 0.25, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
SWEEP_THR_PCT = tuple(int(round(t * 100)) for t in SWEEP_THRESHOLDS)
_TASK_AFFINE = (
    (1.0, 0.0),  # Primary — must stay (1, 0): bit-identity with score_texts
    (0.85, -0.9),  # Heading
    (0.75, -1.5),  # Title
    (1.05, 0.35),  # Paragraph
    (0.65, -2.0),  # Table
    (0.9, -0.5),  # List
)


def score_texts_tasks(texts: list[str]) -> np.ndarray:
    """(n, 6) float32 sigmoid per task; column 0 (Primary) is
    bit-identical to ``score_texts``."""
    logit = score_logits(texts)
    out = np.empty((len(texts), len(TASKS)), dtype=np.float32)
    out[:, 0] = (1.0 / (1.0 + np.exp(-logit))).astype(np.float32)
    for i, (a, b) in enumerate(_TASK_AFFINE):
        if i == 0:
            continue
        out[:, i] = (1.0 / (1.0 + np.exp(-(a * logit + b)))).astype(np.float32)
    return out


class NodeScorer:
    """Actor-pool stage: nodes -> kept predictions (+ page sentinels).

    Emits only rows that pass the threshold (plus every sentinel row), so
    the downstream per-url shuffle moves predicted nodes, not the whole
    node table — at 10^12-document scale this cuts exchange volume by the
    model's rejection rate.
    """

    def __init__(self, threshold: float = THRESHOLD):
        self.threshold = threshold
        # weights are module-level constants; per-actor init kept for parity
        # with a real model-loading stage (and future learned weights).
        self.w = (_W1, _B1, _W2, _B2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        scores = score_texts(texts)
        node_id = batch.column("node_id").to_numpy(zero_copy_only=False)
        sentinel = node_id == -1
        scores[sentinel] = 0.0
        has_text = batch.column("has_text").to_numpy(zero_copy_only=False)
        keep = sentinel | (
            (scores > self.threshold) & (node_id != 0) & has_text
        )
        out = batch.append_column("score", pa.array(scores, pa.float32()))
        return out.filter(pa.array(keep))


def extract_score_batch(
    batch: pa.Table, threshold: float = THRESHOLD, num_buckets: int | None = None
) -> pa.Table:
    """Fused pages -> kept predictions stage (extract + score in one UDF).

    Explicit fusion keeps batch granularity in PAGE units: relying on
    Ray's automatic operator fusion here would bundle inputs to the
    scorer's node-row batch size (thousands of pages per task),
    collapsing parallelism. Node rows never materialize in the object
    store; only predicted rows (plus one sentinel per page) leave the
    task — the shuffle then moves the model's acceptance rate, not the
    whole node table.
    """
    from neuscraper_ray.domparse import (
        instrument,
        node_columns_from_doc,
        parse_html,
    )
    from neuscraper_ray.stages.extract import decode_html

    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    n_pages = len(urls)
    # columnar accumulation — no per-row tuples (see node_columns_from_doc)
    ids: list[int] = []
    texts: list[str] = []
    tags: list[str] = []
    is_tns: list[bool] = []
    has_ts: list[bool] = []
    counts = np.empty(n_pages, dtype=np.int64)
    page_err = np.zeros(n_pages, dtype=bool)
    for p, hb in enumerate(htmls):
        n0 = len(ids)
        try:
            doc = parse_html(decode_html(hb))
            if instrument(doc) > 0:
                node_columns_from_doc(doc, ids, texts, tags, is_tns, has_ts)
        except Exception:
            # roll back any partially-emitted rows; error lineage rides
            # the sentinel (same semantics as page_to_node_rows)
            del ids[n0:], texts[n0:], tags[n0:], is_tns[n0:], has_ts[n0:]
            page_err[p] = True
        ids.append(-1)  # sentinel: every url survives to assembly
        texts.append("")
        has_ts.append(False)
        counts[p] = len(ids) - n0

    scores = score_texts(texts)
    node_id = np.array(ids, dtype=np.int64)
    has_text = np.fromiter(has_ts, dtype=bool, count=len(has_ts))
    sentinel = node_id == -1
    scores[sentinel] = 0.0
    keep = sentinel | ((scores > threshold) & (node_id != 0) & has_text)
    idx = np.nonzero(keep)[0]
    page_of = np.repeat(np.arange(n_pages), counts)
    kept_pages = page_of[idx]
    kept_urls = [urls[j] for j in kept_pages.tolist()]
    idx_l = idx.tolist()
    cols = {
        "url": pa.array(kept_urls, pa.string()),
        "node_id": pa.array(node_id[idx].astype(np.int32)),
        "text": pa.array([texts[i] for i in idx_l], pa.large_string()),
        "score": pa.array(scores[idx], pa.float32()),
        # error lineage: only sentinel rows can carry the error flag
        "err": pa.array(sentinel[idx] & page_err[kept_pages], pa.bool_()),
    }
    if num_buckets is not None:
        from neuscraper_ray.functions.joins import str_buckets

        cols["bucket"] = pa.array(str_buckets(kept_urls, num_buckets), pa.int32())
    return pa.table(cols)


def extract_sweep_batch(batch: pa.Table) -> pa.Table:
    """Fused pages -> full A2 grid rows: one row per (url, node_id,
    task, thr_pct) where that task's sigmoid strictly exceeds the
    threshold (ref ``inference.py:78-88``: ``output > thr``, node id 0
    removed, per-url sets). The flagship decision gate is applied
    per task (``node_id != 0 and has_text``), so the Primary@90 slice
    is exactly the flagship predicted-node set.

    The grid mask is one vectorized (n_nodes, 6, 8) broadcast compare —
    no per-threshold re-scoring (the reference recomputes the compare
    per threshold on GPU; here one compare serves all 48 cells).
    """
    from neuscraper_ray.domparse import (
        instrument,
        node_columns_from_doc,
        parse_html,
    )
    from neuscraper_ray.stages.extract import decode_html

    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    n_pages = len(urls)
    ids: list[int] = []
    texts: list[str] = []
    tags: list[str] = []
    is_tns: list[bool] = []
    has_ts: list[bool] = []
    counts = np.empty(n_pages, dtype=np.int64)
    for p, hb in enumerate(htmls):
        n0 = len(ids)
        try:
            doc = parse_html(decode_html(hb))
            if instrument(doc) > 0:
                node_columns_from_doc(doc, ids, texts, tags, is_tns, has_ts)
        except Exception:
            del ids[n0:], texts[n0:], tags[n0:], is_tns[n0:], has_ts[n0:]
        counts[p] = len(ids) - n0

    scores = score_texts_tasks(texts)  # (n, 6)
    node_id = np.array(ids, dtype=np.int64)
    has_text = np.fromiter(has_ts, dtype=bool, count=len(has_ts))
    eligible = (node_id != 0) & has_text
    thr = np.asarray(SWEEP_THRESHOLDS, dtype=np.float32)
    grid = (scores[:, :, None] > thr[None, None, :]) & eligible[:, None, None]
    ri, ti, ki = np.nonzero(grid)
    page_of = np.repeat(np.arange(n_pages), counts)
    task_arr = np.asarray(TASKS, dtype=object)
    thr_arr = np.asarray(SWEEP_THR_PCT, dtype=np.int32)
    return pa.table(
        {
            "url": pa.array(
                [urls[j] for j in page_of[ri].tolist()], pa.string()
            ),
            "node_id": pa.array(node_id[ri].astype(np.int32)),
            "task": pa.array(task_arr[ti], pa.string()),
            "thr_pct": pa.array(thr_arr[ki]),
        }
    )


def predict_node_ids(texts: list[str], node_ids: list[int], has_text: list[bool], threshold: float = THRESHOLD) -> list[int]:
    """Oracle-side decision: which node ids survive (order preserved)."""
    scores = score_texts(texts)
    return [
        nid
        for nid, s, ht in zip(node_ids, scores, has_text)
        if s > threshold and nid != 0 and ht
    ]
