"""Extraction-quality evaluation (G3/G4 parity, distributed).

Reference semantics (``/root/reference/src/eval/evaluator.py:27-94``):
for each url, each GOLD node text counts as a true positive if it is a
SUBSTRING of the predicted page text (after unescaping ``#N#``->\\n,
``#TAB#``->\\t, ``#R#``->\\r), per-page TP/TN/FP/FN summed over the
corpus into accuracy / precision / recall / F1 (``2tp/(2tp+fp+fn)``).

Ray-Data-first shape: per-page counts are computed in a vectorized
``map_batches`` over a bucket-joined (gold x predicted) dataset, then
reduced with a partial+final ``Sum`` — no driver-side loops.
"""

from __future__ import annotations

import pandas as pd

import ray.data
from ray.data.aggregate import Sum


def unescape_gold(text: str) -> str:
    """#N#/#TAB#/#R# unescape (evaluator.py:75,86)."""
    return text.replace("#N#", "\n").replace("#TAB#", "\t").replace("#R#", "\r")


def page_counts(pred_text: str, gold_pos: list[str], gold_neg: list[str]) -> tuple[int, int, int, int]:
    """-> (tp, tn, fp, fn) for one page. Pure (oracle-shared)."""
    tp = fn = fp = tn = 0
    for g in gold_pos:
        if unescape_gold(g) in pred_text:
            tp += 1
        else:
            fn += 1
    for g in gold_neg:
        if unescape_gold(g) in pred_text:
            fp += 1
        else:
            tn += 1
    return tp, tn, fp, fn


def metrics_from_counts(tp: int, tn: int, fp: int, fn: int) -> dict:
    total = tp + tn + fp + fn
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return {
        "accuracy": (tp + tn) / total if total else 0.0,
        "precision": prec,
        "recall": rec,
        "f1": 2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else 0.0,
        "tp": tp,
        "tn": tn,
        "fp": fp,
        "fn": fn,
    }


def evaluate(
    predicted: ray.data.Dataset,  # (url, extracted_text)
    gold: ray.data.Dataset,  # (url, text, is_primary)  one row per gold node
    num_buckets: int = 32,
) -> dict:
    """Corpus-level accuracy/precision/recall/F1, fully distributed.

    Both sides are bucketed by url hash and joined per bucket (the
    gold table is page-aligned, so this is the same keyed exchange the
    assembly stage uses — one shuffle each side, no broadcast needed
    when gold is large).
    """
    import zlib

    def bucket_of(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = [
            zlib.crc32(u.encode()) % num_buckets for u in df["url"].tolist()
        ]
        return df

    # align schemas so the union is well-typed on both sides
    ptagged = predicted.map_batches(bucket_of, batch_format="pandas").map_batches(
        lambda d: d.assign(side="p", text="", is_primary=False),
        batch_format="pandas",
    )
    gtagged = gold.map_batches(bucket_of, batch_format="pandas").map_batches(
        lambda d: d.assign(side="g", extracted_text=""),
        batch_format="pandas",
    )

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        preds = df[df["side"] == "p"]
        golds = df[df["side"] == "g"]
        pred_by_url = dict(zip(preds["url"], preds["extracted_text"]))
        rows = []
        for url, g in golds.groupby("url", sort=False):
            text = pred_by_url.get(url, "")
            pos = g[g["is_primary"]]["text"].tolist()
            neg = g[~g["is_primary"]]["text"].tolist()
            tp, tn, fp, fn = page_counts(text, pos, neg)
            rows.append((tp, tn, fp, fn))
        out = pd.DataFrame(rows, columns=["tp", "tn", "fp", "fn"])
        return pd.DataFrame([out.sum().to_dict()]) if len(out) else pd.DataFrame(
            [{"tp": 0, "tn": 0, "fp": 0, "fn": 0}]
        )

    # union the two tagged sides; schema: url, bucket, side, +payload cols
    both = ptagged.union(gtagged)
    partials = both.groupby("bucket").map_groups(count_bucket, batch_format="pandas")
    row = partials.aggregate(
        Sum("tp", alias_name="tp"),
        Sum("tn", alias_name="tn"),
        Sum("fp", alias_name="fp"),
        Sum("fn", alias_name="fn"),
    )
    return metrics_from_counts(row["tp"], row["tn"], row["fp"], row["fn"])
