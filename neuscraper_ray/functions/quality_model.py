"""Learned quality classifier (fastText-style linear model over hashed
n-grams), distilled from the integer-exact heuristic rules.

The standard production recipe (GPT-3 appendix A; LLaMA; CCNet §4.3):
label a corpus slice cheaply (here: the Gopher/C4 rule filter in
``stages/heuristics.py`` — in a real deployment, a wiki-vs-crawl split),
train a linear classifier on hashed n-gram counts, and apply it at full
scale where the labeling source is unavailable or too slow. The model
here is multinomial Naive Bayes — closed-form from count sums, so
"training" is ONE deterministic distributed pass with no SGD order
dependence.

Features are the shared polyhash word-hash contract (the langid /
DSIR / repetition-stats featurizer): hashed unigrams in buckets
``[0, NB)`` and hashed bigrams (the DSIR bigram fold) in
``[NB, 2*NB)`` — dimension D = 2*NB = 8192, bounded regardless of
corpus size.

Scale shape (the DSIR / HLL topology end to end):

- **train**: each batch folds its labeled n-gram occurrences into ONE
  dense (2 x D int64) partial row (~128 KiB) — zero shuffle; the
  driver folds <= n_batches rows. Counts are integers, so the fold is
  exactly associative: any partitioning yields the identical model.
- **score**: the (D,) float64 log-odds weight vector broadcasts once
  via ``ray.put``; scoring is a zero-shuffle map — per-doc logit via
  one ``np.bincount(doc_idx, weights=w[buckets])`` per batch.

Scores are float64 log-odds (sums of per-occurrence weights in fixed
in-doc order — deterministic bit-for-bit across runs/partitionings,
pinned in tests), but the MODEL depends on corpus-wide counts through
``log``, so there is no SQL twin — the query registers rows-only; the
SQL-anchored quality paths are ``docs_quality_filter`` (the teacher)
and ``docs_dsir_weights``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from neuscraper_ray.functions import polyhash as ph
from neuscraper_ray.functions.dsir import NB, _bigram_buckets

D = 2 * NB  # unigram block [0, NB) + bigram block [NB, 2*NB)


def _feature_buckets(dw: "ph.DocWords") -> tuple[np.ndarray, np.ndarray]:
    """-> (bucket per n-gram OCCURRENCE in [0, D), doc index per
    occurrence). Unigrams hash ``h1 % NB``; bigrams reuse the DSIR
    fold offset by NB."""
    ub = (dw.h1 % np.uint64(NB)).astype(np.int64)
    bb, bdoc = _bigram_buckets(dw)
    return (
        np.concatenate([ub, bb + NB]),
        np.concatenate([dw.word_doc, bdoc]),
    )


def quality_nb_train(
    ds: ray.data.Dataset,
    label_fn,
    text_col: str = "text",
) -> dict:
    """One distributed counting pass -> the closed-form NB model.

    ``label_fn(texts: list[str]) -> bool ndarray`` (True = positive /
    keep). Returns ``{"w": float64[D], "prior": float, "n_pos": int,
    "n_neg": int}`` where ``w[t] = ln((cp[t]+1)/(Np+D)) -
    ln((cn[t]+1)/(Nn+D))`` (Laplace-smoothed multinomial NB) and
    ``prior = ln((n_pos+1)/(n_neg+1))``.
    """

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        dw = ph.DocWords(texts)
        b, bdoc = _feature_buckets(dw)
        pos = np.asarray(label_fn(texts), dtype=bool)
        cp = np.zeros(D, dtype=np.int64)
        cn = np.zeros(D, dtype=np.int64)
        if len(b):
            mask = pos[bdoc]
            np.add.at(cp, b[mask], 1)
            np.add.at(cn, b[~mask], 1)
        return pa.table(
            {
                "cp": pa.array([cp.tolist()], pa.list_(pa.int64())),
                "cn": pa.array([cn.tolist()], pa.list_(pa.int64())),
                "n_pos": pa.array([int(pos.sum())], pa.int64()),
                "n_neg": pa.array([int((~pos).sum())], pa.int64()),
            }
        )

    cp = np.zeros(D, dtype=np.int64)
    cn = np.zeros(D, dtype=np.int64)
    n_pos = n_neg = 0
    for row in ds.map_batches(partial, batch_format="pyarrow").iter_rows():
        cp += np.asarray(row["cp"], dtype=np.int64)
        cn += np.asarray(row["cn"], dtype=np.int64)
        n_pos += row["n_pos"]
        n_neg += row["n_neg"]
    w = np.log((cp + 1.0) / (cp.sum() + D)) - np.log((cn + 1.0) / (cn.sum() + D))
    prior = float(np.log((n_pos + 1.0) / (n_neg + 1.0)))
    return {"w": w, "prior": prior, "n_pos": int(n_pos), "n_neg": int(n_neg)}


def quality_nb_score(
    ds: ray.data.Dataset,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_fn=None,
) -> ray.data.Dataset:
    """Zero-shuffle scoring pass with the broadcast model.
    -> ``(id_col, nb_logit float64, pred_keep bool[, teacher_keep bool])``
    — ``teacher_keep`` (the labeling rule re-evaluated per row, for
    distillation-agreement readout) only when ``label_fn`` is given.
    """
    w_ref = ray.put(model["w"])
    prior = model["prior"]

    def score(t: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        texts = t.column(text_col).to_pylist()
        dw = ph.DocWords(texts)
        b, bdoc = _feature_buckets(dw)
        logits = np.full(len(texts), prior, dtype=np.float64)
        if len(b):
            logits += np.bincount(bdoc, weights=w[b], minlength=len(texts))
        out = t.select([id_col]).append_column(
            "nb_logit", pa.array(logits, pa.float64())
        )
        out = out.append_column("pred_keep", pa.array(logits > 0.0, pa.bool_()))
        if label_fn is not None:
            out = out.append_column(
                "teacher_keep",
                pa.array(np.asarray(label_fn(texts), dtype=bool), pa.bool_()),
            )
        return out

    return ds.map_batches(score, batch_format="pyarrow")


def quality_model_distill(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Train-on-teacher + score, teacher = the Gopher/C4 rule filter
    (``stages/heuristics.drop_reasons``): two streaming passes over the
    corpus, zero shuffles total. The output carries ``teacher_keep`` so
    distillation agreement is visible in the result itself."""
    from neuscraper_ray.stages.heuristics import drop_reasons

    def teacher(texts: list[str]) -> np.ndarray:
        reason, _ = drop_reasons(texts)
        return np.asarray(reason == "", dtype=bool)

    model = quality_nb_train(ds, teacher, text_col=text_col)
    return quality_nb_score(
        ds, model, id_col=id_col, text_col=text_col, label_fn=teacher
    )
