"""fastText-style language identification (deterministic, no deps).

The reference gates pages on cld2 English detection
(``/root/reference/src/warc/build.py:133-141``: drop unless
``details[0][1] == 'en'``). Neither cld2 nor fastText is installed here,
so language ID is a deterministic profile classifier over function
words + script ranges — the same shape as fastText's linear
bag-of-features model, with hand-frozen weights instead of a trained
artifact. Shared verbatim by the Ray stage and the oracle.

Decision rule (mirrors the reference's gate): ``lang_pred != 'en'`` =>
drop with reason ``"lang"``; pages whose content defeats detection get
``"und"`` (also dropped — the reference's cld2 failure path drops too).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_PROFILES: dict[str, frozenset] = {
    "en": frozenset(
        "the of and a to in is it you that he was for on are with as at by "
        "this have from or had not but what all were when we there can an "
        "your which their said if will each about how up out them then she "
        "many some would other into has more her two like him see time".split()
    ),
    "de": frozenset(
        "der die das und ist nicht mit von auf für eine ich sie sich des dem "
        "den ein einer im zu auch nach wird bei durch aus über so wie nur "
        "haben werden hat sind war oder aber als noch wenn kann mehr schon "
        "zeit jahr welt leben wasser stadt land haus".split()
    ),
    "fr": frozenset(
        "le la les et est dans pour que une un des du au aux ce cette il elle "
        "nous vous ils sont avec pas plus par mais ou son ses leur comme tout "
        "être avoir fait été sur se ne je tu y en temps monde vie eau ville "
        "pays maison jour nuit chose homme femme".split()
    ),
    "es": frozenset(
        "el la los las y es en para que una un de del al con no más por pero "
        "como este esta son ser fue ha su sus lo se me te nos os ellos muy "
        "también hasta donde cuando tiempo mundo vida agua ciudad país casa "
        "día noche cosa hombre mujer años".split()
    ),
}
_LANGS = sorted(_PROFILES)  # deterministic tie-break order
_AMBIGUOUS = frozenset.intersection(*_PROFILES.values()) if _PROFILES else frozenset()


def detect_language(text: str) -> tuple[str, float]:
    """-> (lang, confidence). Deterministic. 'und' when no evidence."""
    if not text:
        return "und", 0.0
    head = text[:2000]
    n_cjk = sum(1 for ch in head if 0x4E00 <= ord(ch) <= 0x9FFF)
    if n_cjk / max(len(head), 1) > 0.15:
        return "zh", min(1.0, n_cjk / max(len(head), 1) * 3)
    words = head.lower().split()
    if not words:
        return "und", 0.0
    best_lang, best_hits = "und", 0
    for lang in _LANGS:
        prof = _PROFILES[lang]
        hits = sum(1 for w in words if w in prof)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits == 0:
        return "und", 0.0
    return best_lang, best_hits / len(words)


def langid_batch(df: pd.DataFrame, column: str = "extracted_text") -> pd.DataFrame:
    preds = [detect_language(t) for t in df[column].tolist()]
    df["lang_pred"] = [p[0] for p in preds]
    df["lang_score"] = np.asarray([p[1] for p in preds], dtype=np.float32)
    return df
