"""Distributed evaluator (G3): reference substring-containment metrics."""

import pandas as pd
import ray.data

from neuscraper_ray.evaluation import (
    evaluate,
    metrics_from_counts,
    page_counts,
    unescape_gold,
)


def test_unescape():
    assert unescape_gold("a#N#b#TAB#c#R#d") == "a\nb\tc\rd"


def test_page_counts():
    tp, tn, fp, fn = page_counts(
        "hello world content here",
        gold_pos=["hello world", "missing bit"],
        gold_neg=["content here", "not present"],
    )
    assert (tp, tn, fp, fn) == (1, 1, 1, 1)


def test_metrics_formulas():
    m = metrics_from_counts(tp=8, tn=5, fp=2, fn=1)
    assert m["precision"] == 8 / 10 and m["recall"] == 8 / 9
    assert m["f1"] == 16 / (16 + 2 + 1)
    assert m["accuracy"] == 13 / 16


def test_evaluate_distributed():
    pred = ray.data.from_pandas(
        pd.DataFrame(
            {
                "url": ["u1", "u2", "u3"],
                "extracted_text": ["alpha beta gamma", "delta epsilon", ""],
            }
        )
    )
    gold = ray.data.from_pandas(
        pd.DataFrame(
            {
                "url": ["u1", "u1", "u2", "u2", "u3"],
                "text": ["alpha beta", "zeta", "delta", "alpha", "anything"],
                "is_primary": [True, True, True, False, True],
            }
        )
    )
    m = evaluate(pred, gold, num_buckets=2)
    # u1: tp(alpha beta), fn(zeta); u2: tp(delta), tn(alpha); u3: fn
    assert (m["tp"], m["tn"], m["fp"], m["fn"]) == (2, 1, 0, 2)
    assert m["f1"] == 4 / (4 + 0 + 2)
