"""fastText-style language identification (trained, deterministic).

The reference gates pages on cld2 English detection
(``/root/reference/src/warc/build.py:133-141``: drop unless
``details[0][1] == 'en'``). Neither cld2 nor fastText is installed
here, so the detector is built the way fastText builds its langid
model — a linear classifier over hashed character n-gram features —
trained at first use on a SEEDED synthetic multilingual corpus drawn
from the same public word pools the corpus generator uses (en/de/fr/es
word lists + CJK characters), frozen by determinism: same seed ->
bit-identical weights everywhere (SURVEY §7).

Features: hashed byte 2/3-grams (dim 2048), L2-normalized, computed
batch-wide with the concat+bincount trick (no per-ngram Python).
Model: multinomial logistic regression, full-batch GD, fixed epochs.
Decision: argmax softmax; ``und`` when confidence < 0.5 or no input.

The Ray stage broadcasts the trained weights via ``ray.put`` (see
``get_langid_ref``); the oracle trains the same weights in-process.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

LANGS = ["de", "en", "es", "fr", "zh"]
_DIM = 2048
_TRAIN_SEED = 13
_SENT_PER_LANG = 1200
_EPOCHS = 150
_LR = 20.0
_CONFIDENCE = 0.5
HEAD_CHARS = 600  # language ID saturates well before this many chars


_FEAT_CHUNK = 1024  # docs per kernel pass: bincount stays ~2M entries


def _featurize(texts: list[str]) -> np.ndarray:
    """(n, _DIM) float32 hashed byte-2/3-gram bag, L2-normalized.

    Large batches are processed ``_FEAT_CHUNK`` docs at a time so the
    ``n * _DIM`` bincount stays cache-sized (a 20k-row block would
    otherwise allocate a 41M-entry count array per pass — DRAM-bound on
    a bandwidth-starved box). Rows are independent, so chunking is
    bit-identical to one pass.
    """
    if len(texts) > _FEAT_CHUNK:
        return np.concatenate(
            [
                _featurize(texts[i : i + _FEAT_CHUNK])
                for i in range(0, len(texts), _FEAT_CHUNK)
            ]
        )
    n = len(texts)
    heads = [t[:HEAD_CHARS].lower().encode("utf-8", "replace") for t in texts]
    lens = np.fromiter((len(h) for h in heads), dtype=np.int64, count=n)
    big = np.frombuffer(b"".join(heads), dtype=np.uint8).astype(np.int32)
    out = np.zeros((n, _DIM), dtype=np.float32)
    if len(big) < 2:
        return out
    node_of = np.repeat(np.arange(n), lens)
    mask = _DIM - 1
    # bigrams
    bi = (big[:-1] * 131 + big[1:]) & mask
    v2 = node_of[:-1] == node_of[1:]
    idx2 = node_of[:-1][v2] * _DIM + bi[v2]
    if len(big) >= 3:
        # trigrams share the hash space; ONE bincount over the
        # concatenated index list (integer counts are exact, so summing
        # before the single float32 cast is bit-identical to casting
        # each bincount separately — and saves two 41M-element passes)
        tri = ((big[:-2] * 131 + big[1:-1]) * 131 + big[2:]) & mask
        v3 = node_of[:-2] == node_of[2:]
        idx3 = node_of[:-2][v3] * _DIM + tri[v3]
        idx2 = np.concatenate([idx2, idx3])
    counts = np.bincount(idx2, minlength=n * _DIM).astype(np.float32)
    out = counts.reshape(n, _DIM)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms  # L2: unit-scale logits => trainable in few epochs


def _training_corpus() -> tuple[list[str], np.ndarray]:
    from neuscraper_ray.synth import (
        DE_WORDS,
        EN_STOP,
        EN_WORDS,
        ES_WORDS,
        FR_WORDS,
        ZH_CHARS,
    )

    rng = random.Random(_TRAIN_SEED)
    pools = {"de": DE_WORDS, "en": EN_WORDS, "es": ES_WORDS, "fr": FR_WORDS}
    texts: list[str] = []
    labels: list[int] = []
    for li, lang in enumerate(LANGS):
        for _ in range(_SENT_PER_LANG):
            if lang == "zh":
                s = "".join(rng.choice(ZH_CHARS) for _ in range(rng.randint(20, 120)))
            else:
                nw = rng.randint(5, 30)
                words = []
                for _ in range(nw):
                    if lang == "en" and rng.random() < 0.35:
                        words.append(rng.choice(EN_STOP))
                    else:
                        words.append(rng.choice(pools[lang]))
                s = " ".join(words)
            texts.append(s)
            labels.append(li)
    return texts, np.asarray(labels)


def train_langid() -> tuple[np.ndarray, np.ndarray]:
    """-> (W: (_DIM, n_langs) float32, b: (n_langs,)). Deterministic."""
    texts, y = _training_corpus()
    X = _featurize(texts)
    n, k = len(texts), len(LANGS)
    Y = np.zeros((n, k), dtype=np.float32)
    Y[np.arange(n), y] = 1.0
    W = np.zeros((_DIM, k), dtype=np.float32)
    b = np.zeros(k, dtype=np.float32)
    for _ in range(_EPOCHS):
        logits = X @ W + b
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - Y) / n
        W -= _LR * (X.T @ g + 1e-4 * W)
        b -= _LR * g.sum(axis=0)
    return W, b


_WEIGHTS: tuple[np.ndarray, np.ndarray] | None = None
_WEIGHTS_REF = None


def _get_weights() -> tuple[np.ndarray, np.ndarray]:
    global _WEIGHTS
    if _WEIGHTS is None:
        _WEIGHTS = train_langid()
    return _WEIGHTS


def get_langid_ref():
    """Broadcast handle (train + ray.put once per driver)."""
    global _WEIGHTS_REF
    if _WEIGHTS_REF is None:
        import ray

        _WEIGHTS_REF = ray.put(_get_weights())
    return _WEIGHTS_REF


def detect_languages(
    texts: list[str], weights: tuple[np.ndarray, np.ndarray] | None = None
) -> tuple[list[str], np.ndarray]:
    """Batched detection -> (langs, confidence). Pure given weights."""
    W, b = weights if weights is not None else _get_weights()
    X = _featurize(texts)
    logits = X @ W + b
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=1, keepdims=True)
    best = p.argmax(axis=1)
    conf = p[np.arange(len(texts)), best]
    empty = X.sum(axis=1) == 0
    langs = [
        "und" if (empty[i] or conf[i] < _CONFIDENCE) else LANGS[best[i]]
        for i in range(len(texts))
    ]
    conf = np.where(empty, 0.0, conf).astype(np.float32)
    return langs, conf


def detect_language(text: str, weights=None) -> tuple[str, float]:
    """Single-document convenience wrapper."""
    langs, conf = detect_languages([text], weights)
    return langs[0], float(conf[0])


def langid_batch(
    df: pd.DataFrame, column: str = "extracted_text", weights_ref=None
) -> pd.DataFrame:
    if weights_ref is not None:
        import ray

        weights = ray.get(weights_ref)
    else:
        weights = None
    langs, conf = detect_languages(df[column].tolist(), weights)
    df["lang_pred"] = langs
    df["lang_score"] = conf
    return df
