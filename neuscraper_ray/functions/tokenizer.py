"""Deterministic hash-vocab tokenizer (M8 parity).

The reference tokenizes node text with XLM-R (`encode_plus`,
``max_length=50``, pad-to-max, truncation —
``/root/reference/src/tokenization.py:38-68``) and at model time keeps
the first 4 sub-tokens + EOS (``processing.py:50``). No HF download is
possible here, so the tokenizer is re-expressed deterministically:
regex word/punct split -> crc32 hash into a fixed vocab space, with the
same special-token layout (BOS=0, PAD=1, EOS=2, UNK=3, hashed ids from
4) and identical pad/truncate semantics. Interface mirrors the
reference's ``TokenizerProcessor.tokenize_sequence``.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

BOS_ID = 0
PAD_ID = 1
EOS_ID = 2
UNK_ID = 3
_SPECIALS = 4

_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


class HashTokenizer:
    """Stateful tokenizer (compiled regex + params); load once per actor.

    vocab_size counts the hash space INCLUDING the 4 special ids.
    """

    def __init__(self, max_token_length: int = 50, vocab_size: int = 2**16):
        assert vocab_size > _SPECIALS
        self.max_token_length = max_token_length
        self.vocab_size = vocab_size
        self._re = _TOKEN_RE

    def token_id(self, token: str) -> int:
        h = zlib.crc32(token.lower().encode("utf-8"))
        return _SPECIALS + h % (self.vocab_size - _SPECIALS)

    def tokenize_sequence(self, text: str) -> list[int]:
        """BOS + hashed tokens + EOS, truncated+padded to max_token_length
        (reference: max_length=50, truncation, pad to max)."""
        ids = [BOS_ID]
        for tok in self._re.findall(text)[: self.max_token_length - 2]:
            ids.append(self.token_id(tok))
        ids.append(EOS_ID)
        ids += [PAD_ID] * (self.max_token_length - len(ids))
        return ids[: self.max_token_length]

    def model_time_ids(self, ids: list[int], budget: int = 5) -> list[int]:
        """Reference quirk (processing.py:50): at model time keep the
        first ``budget-1`` ids and force EOS as the last."""
        return ids[: budget - 1] + [EOS_ID]

    def mask(self, ids: list[int]) -> np.ndarray:
        """Attention mask = id != PAD (reference: ``token_id != 1``)."""
        return (np.asarray(ids) != PAD_ID).astype(np.int64)
