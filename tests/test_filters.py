"""Unit tests for the filter-chain pure functions (langid, perplexity,
heuristics, scrub, verdict)."""

import pytest

from neuscraper_ray.stages.heuristics import apply_rules, quality_stats
from neuscraper_ray.stages.langid import detect_language
from neuscraper_ray.stages.perplexity import build_logprob_table, perplexity
from neuscraper_ray.stages.scrub import scrub_text
from neuscraper_ray.stages.verdict import decide


def test_langid_basics():
    assert detect_language("the quick brown fox is on the hill with a dog")[0] == "en"
    assert detect_language("der hund ist nicht mit der katze auf dem haus")[0] == "de"
    assert detect_language("le monde est dans la ville avec une maison")[0] == "fr"
    assert detect_language("el mundo es una ciudad con la casa y los perros")[0] == "es"
    assert detect_language("的一是在不了有和人这中大为上个国的一是在不了")[0] == "zh"
    assert detect_language("")[0] == "und"
    assert detect_language("zzz qqq xxx www")[0] == "und"


@pytest.fixture(scope="module")
def ppl_table():
    return build_logprob_table()


def test_perplexity_orders_text_quality(ppl_table):
    en = perplexity("The data engine is a system with a model and a result.", ppl_table)
    spam = perplexity("###$$%%@@ ###$$%%@@ ###$$%%@@ ###$$%%@@", ppl_table)
    zh = perplexity("的一是在不了有和人这中大为上个国", ppl_table)
    assert en < 10 < spam
    assert en < zh
    assert perplexity("", ppl_table) == 0.0
    assert perplexity("ab", ppl_table) == 0.0


def test_perplexity_deterministic(ppl_table):
    t2 = build_logprob_table()
    assert (ppl_table == t2).all()


def test_heuristics_rules():
    good = " ".join(["the data engine runs with a result and more values"] * 5)
    assert apply_rules(good)[0] == []
    assert "too_few_words" in apply_rules("short text here")[0]
    assert "repetition" in apply_rules(" ".join(["aa bb"] * 50))[0]
    assert "brace" in apply_rules(good + " { code }")[0]
    assert "stopwords" in apply_rules("alpha beta gamma delta " * 10)[0]
    s = quality_stats("")
    assert s["n_words"] == 0


def test_scrub_pii_and_toxicity():
    text = (
        "mail john.doe@example.com or call (212) 555-0187, "
        "ssn 078-05-1120, card 4111 1111 1111 1111, host 10.0.0.254 ok"
    )
    scrubbed, pii, tox = scrub_text(text)
    assert "<EMAIL>" in scrubbed and "<PHONE>" in scrubbed
    assert "<SSN>" in scrubbed and "<CC>" in scrubbed and "<IP>" in scrubbed
    assert pii == 5 and tox == 0
    assert "078-05-1120" not in scrubbed
    s2, p2, t2 = scrub_text("this is badword1 content with SLURWORD too")
    assert t2 == 2 and "<TOX>" in s2


def test_scrub_boundary_overlap():
    # ssn-like inside a longer digit run must resolve deterministically
    a = scrub_text("x 123-45-6789 y")[0]
    b = scrub_text("x 123-45-6789 y")[0]
    assert a == b and "<SSN>" in a


def test_verdict_priority():
    assert decide("", "en", 1.0, [], 0) == (False, "empty")
    assert decide("t", "de", 1.0, [], 0) == (False, "lang")
    assert decide("t", "en", 99.0, [], 0) == (False, "ppl")
    assert decide("t", "en", 1.0, ["stopwords"], 0) == (False, "heuristic:stopwords")
    assert decide("t", "en", 1.0, [], 2) == (False, "toxicity")
    assert decide("t", "en", 1.0, [], 0) == (True, "")
