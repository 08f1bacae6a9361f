"""KenLM-style character n-gram perplexity (deterministic, numpy).

CC-Net-style corpus curation scores documents with a KenLM 5-gram model;
no kenlm binary exists in this environment, so the LM is a character
*trigram* model with add-alpha smoothing whose counts come from a seeded
synthetic English corpus (built once, identical everywhere). Scoring is
fully vectorized: utf-8 bytes clipped to a 128-symbol alphabet, trigram
ids gathered from a precomputed ``128^3`` log-probability table.

The Ray stage is an actor pool (table built once per actor in
``__init__``); the oracle calls the same pure functions.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

_ALPHA = 0.1
_V = 128
_CORPUS_SEED = 7
_CORPUS_WORDS = 120_000

# default keep gate; pages above this perplexity are dropped with
# reason "ppl" (tuned on the synthetic corpus: English prose ~= 12-18,
# symbol spam / foreign scripts >> 30).
PPL_THRESHOLD = 30.0

_TABLE_CACHE: np.ndarray | None = None


def _training_corpus() -> str:
    """Deterministic English-like corpus (seeded, module-local vocab)."""
    from neuscraper_ray.synth import EN_STOP, EN_WORDS

    rng = random.Random(_CORPUS_SEED)
    out = []
    for _ in range(_CORPUS_WORDS // 10):
        n = rng.randint(6, 14)
        words = [
            rng.choice(EN_STOP) if rng.random() < 0.35 else rng.choice(EN_WORDS)
            for _ in range(n)
        ]
        s = " ".join(words)
        out.append(s[0].upper() + s[1:] + rng.choice([".", ".", "!", "?"]))
    return " ".join(out)


def _text_to_ids(text: str) -> np.ndarray:
    b = np.frombuffer(text.encode("utf-8", "replace"), dtype=np.uint8)
    return np.minimum(b, _V - 1).astype(np.int64)


def build_logprob_table() -> np.ndarray:
    """float32[128^3] table of log P(c2 | c0 c1). Deterministic."""
    ids = _text_to_ids(_training_corpus())
    tri = ids[:-2] * (_V * _V) + ids[1:-1] * _V + ids[2:]
    tri_counts = np.bincount(tri, minlength=_V**3).astype(np.float64)
    bi = ids[:-1] * _V + ids[1:]
    bi_counts = np.bincount(bi, minlength=_V**2).astype(np.float64)
    ctx = np.repeat(bi_counts, _V)  # context count for each trigram id
    table = np.log((tri_counts + _ALPHA) / (ctx + _ALPHA * _V))
    return table.astype(np.float32)


def _get_table() -> np.ndarray:
    global _TABLE_CACHE
    if _TABLE_CACHE is None:
        _TABLE_CACHE = build_logprob_table()
    return _TABLE_CACHE


_TABLE_REF = None


def get_table_ref():
    """Driver-side broadcast handle for the LM table (built + put once
    per driver process, reused by every pipeline built afterwards)."""
    global _TABLE_REF
    if _TABLE_REF is None:
        import ray

        _TABLE_REF = ray.put(_get_table())
    return _TABLE_REF


def perplexity(text: str, table: np.ndarray | None = None) -> float:
    """Per-character trigram perplexity; inf-free, deterministic.

    Empty / too-short text scores 0.0 (treated as "no evidence"; such
    pages are dropped earlier as empty).
    """
    if table is None:
        table = _get_table()
    ids = _text_to_ids(text[:8000])
    if len(ids) < 3:
        return 0.0
    tri = ids[:-2] * (_V * _V) + ids[1:-1] * _V + ids[2:]
    lp = table[tri]
    return float(np.exp(-lp.mean()))


_VEC_CHUNK = 1 << 17  # ~128 KiB of concatenated doc bytes per kernel pass


def perplexity_vec(texts: list[str], table: np.ndarray) -> np.ndarray:
    """Batch-vectorized :func:`perplexity`, bit-identical per row.

    Docs are concatenated into ~128 KiB chunks (cache-resident — one
    full-batch concat was measured 20x SLOWER on a bandwidth-starved
    box because every temporary spills to DRAM); each chunk pays one
    encode + one trigram gather. A doc's trigram at offset j uses bytes
    j..j+2 of that doc only (its slice stops at n-2), so cross-doc
    trigrams in the concatenated stream are never read. The per-doc
    ``seg.mean()`` runs on the same contiguous float32 values with the
    same numpy pairwise summation as the scalar path, so results are
    bit-identical to ``perplexity`` (pinned in tests).
    """
    enc = [t[:8000].encode("utf-8", "replace") for t in texts]
    out = np.zeros(len(enc), dtype=np.float64)
    n_docs = len(enc)
    i = 0
    while i < n_docs:
        j, tot = i, 0
        while j < n_docs and (tot == 0 or tot + len(enc[j]) <= _VEC_CHUNK):
            tot += len(enc[j])
            j += 1
        chunk = enc[i:j]
        buf = np.frombuffer(b"".join(chunk), dtype=np.uint8)
        if len(buf) >= 3:
            # int32 throughout: max trigram id 128^3-1 < 2^31
            ids = np.minimum(buf, _V - 1).astype(np.int32)
            tri = ids[:-2] * np.int32(_V * _V)
            tri += ids[1:-1] * np.int32(_V)
            tri += ids[2:]
            lp = table[tri]
            pos = 0
            for k, b in enumerate(chunk):
                n = len(b)
                if n >= 3:
                    seg = lp[pos : pos + n - 2]
                    out[i + k] = float(np.exp(-seg.mean()))
                pos += n
        i = j
    return out


def perplexity_batch(
    df: pd.DataFrame, column: str = "extracted_text", table_ref=None
) -> pd.DataFrame:
    """Stateless task-pool stage. The LM table is broadcast: built ONCE
    on the driver, ``ray.put`` into the object store, and fetched
    zero-copy by every worker (``ray.get`` of a shared-memory numpy
    array — no per-worker rebuild, no per-batch copy). Falls back to a
    per-process build when no ref is supplied (oracle / unit tests)."""
    if table_ref is not None:
        import ray

        t = ray.get(table_ref)
    else:
        t = _get_table()
    df["ppl"] = perplexity_vec(df[column].tolist(), t)
    return df


class PerplexityScorer:
    """Actor-pool variant of ``perplexity_batch`` — the right shape when
    the model state is too big for a per-process cache (e.g. a real
    KenLM binary): loaded once per actor in ``__init__``."""

    def __init__(self, column: str = "extracted_text"):
        self.column = column
        self.table = build_logprob_table()  # once per actor

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df["ppl"] = perplexity_vec(df[self.column].tolist(), self.table)
        return df
