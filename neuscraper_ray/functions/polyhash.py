"""Shared polynomial-hash family (Mersenne prime 2^61-1) for the
near-dup / fingerprint operators — vectorized numpy kernels with
EXACTLY SQL-expressible semantics, so MinHash-LSH clusters, SimHash
pairs and document fingerprints are value-verifiable against a DuckDB
oracle (see ``__ray_entry__.oracle_sql``), not rows-only.

Semantics (the contract both numpy and SQL implement):

- ``codes(text)``   = UTF-32 codepoints of the text.
- ``lower``         = ASCII-only lowering (codepoints 65..90 -> +32);
  engine-independent, unlike locale/unicode ``str.lower``.
- ``words(text)``   = maximal runs of codepoints not in the ASCII
  whitespace set {9,10,11,12,13,32}.
- ``fingerprint``   = fold h=0; h = (h*257 + c) % M over RAW codes.
- ``word_hash(w,B)``= fold h=1; h = (h*B + c) % M over LOWERED codes
  (init 1 so leading characters are length-distinguishing).
- ``wh64(w)``       = (word_hash(w,263) mod 2^32) * 2^32
                      + (word_hash(w,271) mod 2^32)  — simhash bits.
- ``simhash(text)`` = for each of 64 bits, sum +-1 over words by that
  bit of wh64; bit set iff sum > 0; zero words -> 0. Stored int64
  (two's complement of the uint64 pattern).
- ``shingles(text,k=3)`` = word-level k-gram fold h=0;
  h = (h*1000003 + word_hash(w,263)) % M over each window; a doc with
  0 < n < k words yields ONE shingle over all n words; 0 words yields
  the single shingle 0. Each reduced mod 2^32, then unique per doc.
- ``minhash_j``     = min over shingles s of (a_j*s + b_j) % M with
  a_j in [1,2^31), b_j in [0,2^31) from RandomState(1234) — products
  stay < 2^63 so the mod-prime universal family is exact (no uint64
  wrap).
- ``band_hash``     = fold h=0; h = (h*1000003 + sig_j) % M over the 4
  signature values of a band (16 bands x 4 perms).

Everything below 2^61 stays exact in uint64 via 32-bit-limb ``mulmod``;
DuckDB replicates with HUGEINT arithmetic (SQL builders at the bottom).
"""

from __future__ import annotations

import numpy as np

MOD = (1 << 61) - 1
BASE_FP = 257
BASE_W1 = 263
BASE_W2 = 271
BASE_S = 1000003
N_PERM = 64
N_BANDS = 16
MINHASH_SEED = 1234
WHITESPACE = (9, 10, 11, 12, 13, 32)

_M = np.uint64(MOD)
_MASK32 = np.uint64(0xFFFFFFFF)
_U = np.uint64


def _red(x: np.ndarray) -> np.ndarray:
    """uint64 (any value) -> x mod M, elementwise."""
    x = (x >> _U(61)) + (x & _M)  # < M + 8
    return x - (x >= _M).astype(np.uint64) * _M


def mulmod(a, b) -> np.ndarray:
    """(a * b) mod M for uint64 operands < 2^61, exact, vectorized.

    32-bit-limb decomposition; 2^64 = 8 (mod 2^61-1)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    ah, al = a >> _U(32), a & _MASK32
    bh, bl = b >> _U(32), b & _MASK32
    m = ah * bl + al * bh  # < 2^62
    hi = ah * bh + (m >> _U(32))  # < 2^58 + 2^30
    t1 = _red(hi << _U(3))
    t2 = _red((m & _MASK32) << _U(32))
    t3 = _red(al * bl)
    return _red(t1 + t2 + t3)


_POW_CACHE: dict[int, np.ndarray] = {}


def pow_table(base: int, n: int) -> np.ndarray:
    """[base^0, .., base^(n-1)] mod M (uint64), cached + doubling-grown."""
    arr = _POW_CACHE.get(base)
    if arr is None:
        arr = np.array([1, base], dtype=np.uint64)
    while len(arr) < n:
        arr = np.concatenate([arr, mulmod(arr, mulmod(arr[-1], _U(base)))])
    _POW_CACHE[base] = arr
    return arr


# ------------------------------------------------------- batch analysis


def batch_codes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """-> (codes: concatenated uint32 codepoints, doc_offsets: (n+1,))."""
    bufs = [t.encode("utf-32-le") for t in texts]
    lens = np.fromiter((len(b) >> 2 for b in bufs), dtype=np.int64, count=len(bufs))
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    codes = (
        np.frombuffer(b"".join(bufs), dtype=np.uint32)
        if bufs
        else np.empty(0, dtype=np.uint32)
    )
    return codes, offsets


def _segsum_mod(terms: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Sum of uint64 terms (< M) over [starts_i, ends_i) mod M.

    hi/lo 32-bit split keeps the cumulative sums exact for any batch
    under 2^31 total characters (far above real batch sizes)."""
    hi = np.zeros(len(terms) + 1, dtype=np.uint64)
    lo = np.zeros(len(terms) + 1, dtype=np.uint64)
    np.cumsum(terms >> _U(32), out=hi[1:])
    np.cumsum(terms & _MASK32, out=lo[1:])
    h = _red(hi[ends] - hi[starts])
    l = _red(lo[ends] - lo[starts])
    return _red(mulmod(h, _U(1) << _U(32)) + l)


def fingerprints(texts: list[str]) -> np.ndarray:
    """Vectorized document fingerprint per text -> int64 array.

    Equals ``fold h=0; h = (h*257 + ord(c)) % M`` — the closed form
    sum_i c_i * 257^(n-1-i) mod M, one batched mulmod + segment sum."""
    codes, off = batch_codes(texts)
    n = len(texts)
    if len(codes) == 0:
        return np.zeros(n, dtype=np.int64)
    doc_len = off[1:] - off[:-1]
    pos = np.arange(len(codes), dtype=np.int64) - np.repeat(off[:-1], doc_len)
    exp = np.repeat(doc_len, doc_len) - 1 - pos
    pw = pow_table(BASE_FP, int(doc_len.max()) + 1)
    terms = mulmod(codes.astype(np.uint64), pw[exp])
    return _segsum_mod(terms, off[:-1], off[1:]).astype(np.int64)


_POW10 = np.array([10**i for i in range(20)], dtype=np.uint64)


def int_fingerprints(ids: np.ndarray) -> np.ndarray:
    """``fingerprint(str(i))`` for non-negative integer ids, with zero
    per-row Python: the decimal digits are extracted arithmetically
    (div/mod by a power-of-10 table) and folded with the same
    base-257 mod-M polynomial as ``fingerprints``. Used by the
    deterministic sampling gates — the DuckDB oracle reproduces it as
    ``sql_fingerprint('id::VARCHAR')``. Equality with
    ``fingerprints([str(i) ...])`` is pinned in tests."""
    x = np.asarray(ids, dtype=np.uint64)
    n = len(x)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    nd = np.ones(n, dtype=np.int64)  # number of decimal digits
    for k in range(1, 20):
        nd += (x >= _POW10[k]).astype(np.int64)
    h = np.zeros(n, dtype=np.uint64)
    for k in range(int(nd.max())):  # most-significant digit first
        p = nd - 1 - k
        act = p >= 0
        digit = (x[act] // _POW10[p[act]]) % _U(10)
        h[act] = _red(mulmod(h[act], _U(BASE_FP)) + digit + _U(48))
    return h.astype(np.int64)


def _word_spans(
    codes: np.ndarray, doc_offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (starts, ends, word_doc): maximal non-whitespace runs, never
    crossing document boundaries; word_doc is ascending."""
    n = len(codes)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    nonsep = ~np.isin(codes, np.array(WHITESPACE, dtype=np.uint32))
    boundary = np.zeros(n + 1, dtype=bool)  # [i] = doc break before i
    boundary[doc_offsets] = True
    prev_in = np.concatenate([[False], nonsep[:-1]]) & ~boundary[:-1]
    next_in = np.concatenate([nonsep[1:], [False]]) & ~boundary[1:]
    starts = np.nonzero(nonsep & ~prev_in)[0]
    ends = np.nonzero(nonsep & ~next_in)[0] + 1
    word_doc = np.searchsorted(doc_offsets, starts, side="right") - 1
    return starts, ends, word_doc


def _lower(codes: np.ndarray) -> np.ndarray:
    return codes + np.uint32(32) * ((codes >= 65) & (codes <= 90)).astype(np.uint32)


def _word_hashes(
    codes_l: np.ndarray, starts: np.ndarray, ends: np.ndarray, base: int
) -> np.ndarray:
    """Per-word polynomial hash (init 1) over lowered codes -> uint64 < M."""
    lengths = ends - starts
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    cum = np.cumsum(lengths)
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum - lengths, lengths)
    gidx = np.repeat(starts, lengths) + pos
    exp = np.repeat(lengths, lengths) - 1 - pos
    pw = pow_table(base, int(lengths.max()) + 1)
    terms = mulmod(codes_l[gidx].astype(np.uint64), pw[exp])
    body = _segsum_mod(terms, cum - lengths, cum)
    return _red(body + pw[lengths])  # + base^len: the init-1 term


class DocWords:
    """One pass of per-batch text analysis shared by simhash + minhash."""

    def __init__(self, texts: list[str]):
        codes, self.doc_offsets = batch_codes(texts)
        self.n_docs = len(texts)
        starts, ends, self.word_doc = _word_spans(codes, self.doc_offsets)
        self.wlen = (ends - starts).astype(np.int64)  # codepoints per word
        codes_l = _lower(codes)
        self.h1 = _word_hashes(codes_l, starts, ends, BASE_W1)
        self.h2 = _word_hashes(codes_l, starts, ends, BASE_W2)
        # word index range per doc
        self.wstart = np.searchsorted(self.word_doc, np.arange(self.n_docs), "left")
        self.wend = np.searchsorted(self.word_doc, np.arange(self.n_docs), "right")


def simhashes(dw: DocWords) -> np.ndarray:
    """64-bit SimHash per doc -> int64 array (0 for zero-word docs).

    Per bit-plane, the per-doc sign sum over n words with c set bits is
    ``2c - n``, so only the per-doc set-bit COUNT is needed — one
    masked ``np.bincount`` per plane. Transient memory is O(n_words)
    per plane (a bool mask + selected indices), not the former
    (n_words, 64) int64 sign/cumsum matrices (~1 KB per word — ~4 GB
    transient for a 4096-doc batch of 1k-word docs, enough to OOM the
    box under 32 concurrent tasks)."""
    out = np.zeros(dw.n_docs, dtype=np.uint64)
    if len(dw.h1) == 0:
        return out.view(np.int64)
    wh64 = ((dw.h1 & _MASK32) << _U(32)) | (dw.h2 & _MASK32)
    n_words = (dw.wend - dw.wstart).astype(np.int64)
    for s in range(64):
        set_docs = dw.word_doc[((wh64 >> _U(s)) & _U(1)).astype(bool)]
        cnt = np.bincount(set_docs, minlength=dw.n_docs)
        out |= ((2 * cnt - n_words) > 0).astype(np.uint64) << _U(s)
    return out.view(np.int64)


def doc_shingles32(dw: DocWords, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """-> (shingle32: uint64 < 2^32 sorted-unique within doc,
           shingle_doc: ascending doc index per shingle).

    Zero-word docs contribute the single shingle 0; docs with 0 < n < k
    words contribute one shingle over all n words."""
    n_words_per_doc = dw.wend - dw.wstart
    bs = _U(BASE_S)
    sh_parts: list[np.ndarray] = []
    doc_parts: list[np.ndarray] = []

    full = np.nonzero(n_words_per_doc >= k)[0]
    if len(full):
        h = dw.h1
        # windows fully inside one doc: start word w valid if
        # word_doc[w] == word_doc[w + k - 1]
        valid = np.nonzero(dw.word_doc[: len(h) - k + 1] == dw.word_doc[k - 1 :])[0]
        s = np.zeros(len(valid), dtype=np.uint64)
        for j in range(k):
            s = _red(mulmod(s, bs) + h[valid + j])
        sh_parts.append(s & _MASK32)
        doc_parts.append(dw.word_doc[valid])

    short = np.nonzero((n_words_per_doc > 0) & (n_words_per_doc < k))[0]
    for d in short:  # rare tail; tiny docs only
        s = np.zeros(1, dtype=np.uint64)
        for w in range(dw.wstart[d], dw.wend[d]):
            s = _red(mulmod(s, bs) + dw.h1[w])
        sh_parts.append(s & _MASK32)
        doc_parts.append(np.array([d], dtype=np.int64))

    empty = np.nonzero(n_words_per_doc == 0)[0]
    if len(empty):
        sh_parts.append(np.zeros(len(empty), dtype=np.uint64))
        doc_parts.append(empty.astype(np.int64))

    if not sh_parts:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    sh = np.concatenate(sh_parts)
    doc = np.concatenate(doc_parts)
    order = np.lexsort((sh, doc))
    sh, doc = sh[order], doc[order]
    keep = np.concatenate([[True], (doc[1:] != doc[:-1]) | (sh[1:] != sh[:-1])])
    return sh[keep], doc[keep]


def minhash_params(
    n_perm: int = N_PERM, seed: int = MINHASH_SEED
) -> tuple[np.ndarray, np.ndarray]:
    """a in [1, 2^31), b in [0, 2^31): a*s + b < 2^63 for 32-bit
    shingles, so the mod-M universal family is exact in uint64."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=n_perm).astype(np.uint64)
    b = rng.randint(0, 1 << 31, size=n_perm).astype(np.uint64)
    return a, b


def minhash_sigs(
    sh32: np.ndarray,
    sh_doc: np.ndarray,
    n_docs: int,
    a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray:
    """(n_docs, n_perm) uint64 signatures; every doc has >= 1 shingle."""
    n_perm = len(a)
    if n_docs == 0:
        return np.empty((0, n_perm), dtype=np.uint64)
    # a*s + b < 2^63 (exact), so one Mersenne shift-add reduction
    # replaces the hardware 64-bit division of ``% M`` — same values,
    # ~4x fewer cycles on the hottest matrix in the minhash path
    h = _red(a[None, :] * sh32[:, None] + b[None, :])
    starts = np.searchsorted(sh_doc, np.arange(n_docs), "left")
    return np.minimum.reduceat(h, starts, axis=0)


def band_hashes(sigs: np.ndarray, n_bands: int = N_BANDS) -> np.ndarray:
    """(n_docs, n_bands) uint64: fold of each band's signature chunk."""
    n_docs, n_perm = sigs.shape
    rows = n_perm // n_bands
    chunk = sigs.reshape(n_docs, n_bands, rows)
    bs = _U(BASE_S)
    bh = np.zeros((n_docs, n_bands), dtype=np.uint64)
    for j in range(rows):
        bh = _red(mulmod(bh, bs) + chunk[:, :, j])
    return bh


# --------------------------------------------------------- SQL builders
#
# Snippets the DuckDB oracle composes; they implement the SAME contract
# as the numpy kernels above (HUGEINT keeps every product exact).

SQL_WS_PATTERN = r"[ \t\n\v\f\r]+"  # backslashes reach RE2 uninterpreted


GATE_MIX = 1181783497276652981  # odd, < MOD
"""Mixer for ppm-resolution sampling gates: the polynomial fingerprint
of a SHORT string (decimal doc ids) stays far below MOD, so taking a
large modulus like 1e6 directly is badly skewed (measured: max 449k of
1e6 over 500 ids). One exact mod-M multiply by this constant wraps the
field ~5e17 times first, making ``% 1e6`` uniform. Must match
:func:`sql_gate_ppm` bit-for-bit."""


def gate_ppm(h: np.ndarray) -> np.ndarray:
    """Fingerprints (mod-M values) -> uniform int64 gate values in
    [0, 1e6). Use for any ``keep iff gate < rate_ppm`` sampling rule;
    NEVER gate a fine-grained rate on a raw fingerprint modulus (see
    GATE_MIX). Small moduli (<= ~100) on raw fingerprints stay fine —
    they wrap even short-string hashes many times."""
    return (
        mulmod(np.asarray(h, dtype=np.uint64), _U(GATE_MIX)) % _U(1_000_000)
    ).astype(np.int64)


def sql_gate_ppm(text_expr: str) -> str:
    """DuckDB twin of ``gate_ppm(fingerprints(text_expr))`` — HUGEINT
    keeps the 122-bit product exact before the mod-M reduction."""
    return (
        f"((({sql_fingerprint(text_expr)})::HUGEINT * {GATE_MIX}) "
        f"% {MOD}) % 1000000"
    )


def sql_word_list(text_expr: str) -> str:
    return (
        f"list_filter(string_split_regex({text_expr}, '{SQL_WS_PATTERN}'), "
        "w -> w != '')"
    )


def sql_word_hash(word_expr: str, base: int) -> str:
    """Fold init 1 over ASCII-lowered codepoints, mod M (HUGEINT)."""
    codes = (
        f"list_transform(str_split({word_expr}, ''), "
        "c -> (CASE WHEN ord(c) BETWEEN 65 AND 90 THEN ord(c)+32 "
        "ELSE ord(c) END)::HUGEINT)"
    )
    return (
        f"list_reduce(list_prepend(1::HUGEINT, {codes}), "
        f"(acc, c) -> (acc*{base} + c) % {MOD})"
    )


def sql_fingerprint(text_expr: str) -> str:
    """Fold init 0 over RAW codepoints, base 257, mod M -> BIGINT."""
    codes = f"list_transform(str_split({text_expr}, ''), c -> ord(c)::HUGEINT)"
    return (
        f"CASE WHEN {text_expr} = '' THEN 0 ELSE "
        f"list_reduce({codes}, (acc, c) -> (acc*{BASE_FP} + c) % {MOD})::BIGINT END"
    )


def sql_pow2_values() -> str:
    """Inline (bit, 2^bit) table for 64 bits, HUGEINT powers."""
    rows = ", ".join(f"({i}, {1 << i}::HUGEINT)" for i in range(64))
    return f"(VALUES {rows}) p2(bit, pw)"


def sql_minhash_perm_values() -> str:
    """Inline (j, a_j, b_j) table matching ``minhash_params()``."""
    a, b = minhash_params()
    rows = ", ".join(
        f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)" for j in range(len(a))
    )
    return f"(VALUES {rows}) perms(j, a, b)"


def sql_simhash_pairs(table: str = "documents", max_hamming: int = 3) -> str:
    """Full DuckDB statement: all pairs with Hamming(simhash) <=
    max_hamming -> (id_a, id_b, hamming BIGINT). Value-identical to
    ``dedup.simhash_near_dup_pairs`` (the 4-band blocking there is
    exhaustive for distance <= 3 by pigeonhole, so exact all-pairs SQL
    is the right oracle)."""
    return f"""
WITH w AS (
  SELECT doc_id, unnest({sql_word_list('text')}) AS word FROM {table}
),
wh AS (
  SELECT doc_id,
    (({sql_word_hash('word', BASE_W1)} % 4294967296) * 4294967296
     + ({sql_word_hash('word', BASE_W2)} % 4294967296))::HUGEINT AS wh64
  FROM w
),
bits AS (
  SELECT doc_id, p2.bit, sum(CASE WHEN (wh64 // p2.pw) % 2 = 1 THEN 1 ELSE -1 END) AS acc
  FROM wh CROSS JOIN {sql_pow2_values()} GROUP BY doc_id, p2.bit
),
simu AS (
  SELECT b.doc_id, sum(CASE WHEN b.acc > 0 THEN p2.pw ELSE 0 END)::HUGEINT AS v
  FROM bits b JOIN {sql_pow2_values()} ON b.bit = p2.bit GROUP BY b.doc_id
),
sh AS (
  SELECT d.doc_id,
    coalesce((CASE WHEN s.v >= 9223372036854775808 THEN s.v - 18446744073709551616
              ELSE s.v END)::BIGINT, 0) AS s
  FROM {table} d LEFT JOIN simu s ON d.doc_id = s.doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, bit_count(xor(a.s, b.s))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
"""


def sql_shingle_ctes(table: str = "documents") -> str:
    """The shared CTE chain text -> distinct 32-bit word-3-gram
    shingles per doc (``shu(doc_id, s32)``) — the SQL twin of
    ``doc_shingles32``; composed by the minhash-cluster and
    decontamination oracles."""
    return f"""d AS (
  SELECT doc_id, {sql_word_list('text')} AS ws FROM {table}
),
hw AS (
  SELECT doc_id, list_transform(ws, w -> {sql_word_hash('w', BASE_W1)}) AS hs FROM d
),
shin AS (
  SELECT doc_id, CASE
    WHEN len(hs) = 0 THEN [0::HUGEINT]
    WHEN len(hs) < 3 THEN [list_reduce(list_prepend(0::HUGEINT, hs),
                                       (acc,x) -> (acc*{BASE_S} + x) % {MOD})]
    ELSE list_transform(range(1, len(hs)-1),
           i -> (((hs[i]*{BASE_S} + hs[i+1]) % {MOD})*{BASE_S} + hs[i+2]) % {MOD})
  END AS sh FROM hw
),
shu AS (
  SELECT DISTINCT doc_id, sv % 4294967296 AS s32
  FROM (SELECT doc_id, unnest(sh) AS sv FROM shin)
)"""


def sql_decontaminate(table: str = "documents", modulus: int = 20) -> str:
    """Full DuckDB statement: benchmark-overlap decontamination ->
    (doc_id, n_shared BIGINT, contaminated BOOLEAN) for non-benchmark
    docs, where the benchmark set is ``doc_id % modulus = 0`` and
    n_shared counts the doc's distinct shingles that any benchmark doc
    also contains. Value-identical to ``decontam.decontaminate``."""
    return f"""
WITH {sql_shingle_ctes(table)},
bench AS (
  SELECT DISTINCT s32 FROM shu WHERE doc_id % {modulus} = 0
)
SELECT s.doc_id, count(b.s32)::BIGINT AS n_shared,
       count(b.s32) > 0 AS contaminated
FROM shu s LEFT JOIN bench b ON s.s32 = b.s32
WHERE s.doc_id % {modulus} <> 0
GROUP BY s.doc_id
"""


def sql_contamination_frac(table: str = "documents", modulus: int = 20) -> str:
    """Full DuckDB statement: graded benchmark-overlap fraction ->
    (doc_id, n_shingles, n_shared, contam_ppm BIGINT) for non-benchmark
    docs. Value-identical to ``decontam.contamination_frac`` (same
    shingle contract; ppm is integer floor division on both engines;
    ``shu`` is distinct-per-doc so count(*) is the distinct shingle
    count and is never zero — empty docs shingle to the single 0)."""
    return f"""
WITH {sql_shingle_ctes(table)},
bench AS (
  SELECT DISTINCT s32 FROM shu WHERE doc_id % {modulus} = 0
)
SELECT s.doc_id, count(*)::BIGINT AS n_shingles,
       count(b.s32)::BIGINT AS n_shared,
       ((count(b.s32) * 1000000) // count(*))::BIGINT AS contam_ppm
FROM shu s LEFT JOIN bench b ON s.s32 = b.s32
WHERE s.doc_id % {modulus} <> 0
GROUP BY s.doc_id
"""


def sql_repetition_stats(table: str = "documents") -> str:
    """Full DuckDB statement: Gopher-style repetition stats ->
    (doc_id, n_words, total_chars, top2_cov, dup3_chars BIGINT).
    Value-identical to ``textstats.repetition_stats_batch`` (same word
    hashes, same unmasked shingle fold for gram identity, same
    max-over-group gram length)."""
    return f"""
WITH d AS (
  SELECT doc_id, text, {sql_word_list('text')} AS ws FROM {table}
),
hw AS (
  SELECT doc_id, length(text)::BIGINT AS total_chars,
    list_transform(ws, w -> {sql_word_hash('w', BASE_W1)}) AS hs,
    list_transform(ws, w -> length(w)::BIGINT) AS ls
  FROM d
),
g2 AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(hs)), i -> (hs[i]*{BASE_S} + hs[i+1]) % {MOD})) AS gh,
    unnest(list_transform(range(1, len(hs)), i -> ls[i] + ls[i+1])) AS glen
  FROM hw
),
g3 AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(hs)-1),
      i -> (((hs[i]*{BASE_S} + hs[i+1]) % {MOD})*{BASE_S} + hs[i+2]) % {MOD})) AS gh,
    unnest(list_transform(range(1, len(hs)-1), i -> ls[i] + ls[i+1] + ls[i+2])) AS glen
  FROM hw
),
grp2 AS (SELECT doc_id, gh, count(*) AS cnt, max(glen) AS glen FROM g2 GROUP BY doc_id, gh),
grp3 AS (SELECT doc_id, gh, count(*) AS cnt, max(glen) AS glen FROM g3 GROUP BY doc_id, gh),
top2 AS (SELECT doc_id, max(cnt*glen) AS v FROM grp2 GROUP BY doc_id),
dup3 AS (SELECT doc_id, sum(cnt*glen) AS v FROM grp3 WHERE cnt >= 2 GROUP BY doc_id)
SELECT h.doc_id, len(h.hs)::BIGINT AS n_words, h.total_chars,
  coalesce(t.v, 0)::BIGINT AS top2_cov, coalesce(u.v, 0)::BIGINT AS dup3_chars
FROM hw h LEFT JOIN top2 t USING (doc_id) LEFT JOIN dup3 u USING (doc_id)
"""


def sql_bandsig_ctes() -> str:
    """CTE chain ``shu`` -> per-doc LSH band hashes
    (``bandsig(doc_id, band, bh)``) — the SQL twin of
    ``minhash_sigs`` + ``band_hashes``; composed by the cluster and
    jaccard-pair oracles. Appended after ``sql_shingle_ctes``."""
    return f"""sig AS (
  SELECT doc_id, perms.j, min((perms.a * s32 + perms.b) % {MOD}) AS sv
  FROM shu CROSS JOIN {sql_minhash_perm_values()} GROUP BY doc_id, perms.j
),
bandsig AS (
  SELECT doc_id, (j // 4)::INT AS band,
    list_reduce(list_prepend(0::HUGEINT, list(sv ORDER BY j)),
                (acc,x) -> (acc*{BASE_S} + x) % {MOD}) AS bh
  FROM sig GROUP BY doc_id, j // 4
)"""


def sql_jaccard_pairs(table: str = "documents", threshold_e6: int = 500_000) -> str:
    """Full DuckDB statement: LSH candidate pairs (sharing any band)
    verified with EXACT shingle-set Jaccard, fixed-point e6 ->
    (id_a, id_b, jacc_e6 BIGINT). Value-identical to
    ``dedup.jaccard_verified_pairs``."""
    return f"""
WITH {sql_shingle_ctes(table)},
{sql_bandsig_ctes()},
cand AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM bandsig a JOIN bandsig b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shu GROUP BY doc_id),
inter AS (
  SELECT c.u, c.v, count(*) AS i
  FROM cand c JOIN shu sa ON sa.doc_id = c.u JOIN shu sb ON sb.doc_id = c.v AND sa.s32 = sb.s32
  GROUP BY c.u, c.v
)
SELECT id_a, id_b, jacc_e6 FROM (
  SELECT c.u AS id_a, c.v AS id_b,
    ((coalesce(i.i, 0) * 1000000) // (na.n + nb.n - coalesce(i.i, 0)))::BIGINT AS jacc_e6
  FROM cand c
  JOIN sizes na ON na.doc_id = c.u
  JOIN sizes nb ON nb.doc_id = c.v
  LEFT JOIN inter i ON i.u = c.u AND i.v = c.v
) WHERE jacc_e6 >= {threshold_e6}
"""


def sql_minhash_precision(table: str = "documents") -> str:
    """Full DuckDB statement: for every LSH candidate pair, the
    signature-estimated Jaccard (matching positions / N_PERM) beside
    the exact shingle-set Jaccard and the absolute error ->
    (id_a, id_b, est_jacc_e6, jacc_e6, abs_err_e6 BIGINT).
    Value-identical to ``dedup.minhash_precision_pairs``."""
    return f"""
WITH {sql_shingle_ctes(table)},
{sql_bandsig_ctes()},
cand AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM bandsig a JOIN bandsig b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.u, c.v,
    (sum(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) * 1000000 // {N_PERM})::BIGINT AS est_jacc_e6
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.u
  JOIN sig sb ON sb.doc_id = c.v AND sa.j = sb.j
  GROUP BY c.u, c.v
),
sizes AS (SELECT doc_id, count(*) AS n FROM shu GROUP BY doc_id),
inter AS (
  SELECT c.u, c.v, count(*) AS i
  FROM cand c JOIN shu sa ON sa.doc_id = c.u JOIN shu sb ON sb.doc_id = c.v AND sa.s32 = sb.s32
  GROUP BY c.u, c.v
)
SELECT id_a, id_b, est_jacc_e6, jacc_e6, abs(est_jacc_e6 - jacc_e6)::BIGINT AS abs_err_e6
FROM (
  SELECT c.u AS id_a, c.v AS id_b, e.est_jacc_e6,
    ((coalesce(i.i, 0) * 1000000) // (na.n + nb.n - coalesce(i.i, 0)))::BIGINT AS jacc_e6
  FROM cand c
  JOIN est e ON e.u = c.u AND e.v = c.v
  JOIN sizes na ON na.doc_id = c.u
  JOIN sizes nb ON nb.doc_id = c.v
  LEFT JOIN inter i ON i.u = c.u AND i.v = c.v
)
"""


def sql_minhash_clusters(table: str = "documents", k: int = 3) -> str:
    """Full DuckDB statement: MinHash-LSH candidate edges -> connected
    components -> (doc_id, cluster_id BIGINT = min reachable id).
    Value-identical to ``dedup.near_dup_clusters`` (same shingles,
    signatures, band folds; closure via recursive CTE)."""
    assert k == 3, "SQL builder hard-codes the k=3 window indexing"
    return f"""
WITH RECURSIVE {sql_shingle_ctes(table)},
{sql_bandsig_ctes()},
cand AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM bandsig a JOIN bandsig b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
nodes AS (SELECT u AS id FROM cand UNION SELECT v FROM cand),
sym AS (SELECT u, v FROM cand UNION ALL SELECT v AS u, u AS v FROM cand),
reach(src, dst) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.src, e.v FROM reach r JOIN sym e ON r.dst = e.u
)
SELECT src AS doc_id, min(dst)::BIGINT AS cluster_id FROM reach GROUP BY src
"""


def sql_exactsubstr_dedup(table: str = "documents", k: int = 20) -> str:
    """Full DuckDB statement: ExactSubstr-style dedup (Lee et al. 2022,
    arXiv:2107.06499) at whitespace-token granularity -> (doc_id,
    n_tokens, n_removed BIGINT, text_dedup) for EVERY input doc.
    Value-identical to ``dedup.exactsubstr_dedup`` (same word list,
    same BASE_W1 word hashes, same base-BASE_S mod-M window fold, same
    first-occurrence-by-(doc_id, win_idx) rule). O(n_tokens * k) list
    work per doc — fine as an oracle, not a production plan."""
    return f"""
WITH d AS (
  SELECT doc_id, {sql_word_list('text')} AS ws FROM {table}
),
hw AS (
  SELECT doc_id, ws, len(ws)::BIGINT AS n,
         list_transform(ws, w -> {sql_word_hash('w', BASE_W1)}) AS hs
  FROM d
),
win AS (
  SELECT doc_id, i - 1 AS win_idx,
         list_reduce(list_prepend(0::HUGEINT, hs[i:i+{k}-1]),
                     (acc, x) -> (acc*{BASE_S} + x) % {MOD})::BIGINT AS wh
  FROM hw, unnest(range(1, n - {k} + 2)) AS u(i)
  WHERE n >= {k}
),
dups AS (
  SELECT doc_id, win_idx FROM (
    SELECT doc_id, win_idx,
           row_number() OVER (PARTITION BY wh ORDER BY doc_id, win_idx) AS rn
    FROM win)
  WHERE rn > 1
),
tok AS (
  SELECT doc_id, i - 1 AS tok_idx, ws[i] AS w
  FROM hw, unnest(range(1, n + 1)) AS u(i)
),
marked AS (
  SELECT t.doc_id, t.tok_idx, t.w,
         EXISTS (SELECT 1 FROM dups dp WHERE dp.doc_id = t.doc_id
                 AND dp.win_idx BETWEEN t.tok_idx - {k} + 1 AND t.tok_idx) AS removed
  FROM tok t
)
SELECT h.doc_id, h.n AS n_tokens,
       coalesce(sum(CASE WHEN m.removed THEN 1 ELSE 0 END), 0)::BIGINT AS n_removed,
       coalesce(string_agg(CASE WHEN m.removed THEN NULL ELSE m.w END,
                           ' ' ORDER BY m.tok_idx), '') AS text_dedup
FROM hw h LEFT JOIN marked m ON h.doc_id = m.doc_id
GROUP BY h.doc_id, h.n
"""


def sql_span_decontaminate(table: str = "documents", modulus: int = 20) -> str:
    """Full DuckDB statement: SPAN-level decontamination ->
    (doc_id, n_words, n_removed BIGINT, text_clean) for every
    non-benchmark doc (benchmark = ``doc_id % modulus = 0``).
    Value-identical to ``decontam.span_decontaminate``: the benchmark
    shingle set is the ``sql_shingle_ctes`` contract; a corpus doc's
    word-3-gram window whose 32-bit fold appears in that set has its
    words removed (short docs with 1-2 words match on their single
    all-words shingle and clear whole)."""
    return f"""
WITH {sql_shingle_ctes(f'(SELECT * FROM {table} WHERE doc_id % {modulus} = 0)')},
bench AS (SELECT DISTINCT s32 FROM shu),
d2 AS (
  SELECT doc_id, {sql_word_list('text')} AS ws FROM {table}
  WHERE doc_id % {modulus} <> 0
),
hw2 AS (
  SELECT doc_id, ws, len(ws)::BIGINT AS n,
         list_transform(ws, w -> {sql_word_hash('w', BASE_W1)}) AS hs
  FROM d2
),
win AS (
  SELECT doc_id, i - 1 AS win_idx, 3::BIGINT AS wl,
         list_reduce(list_prepend(0::HUGEINT, hs[i:i+2]),
                     (acc, x) -> (acc*{BASE_S} + x) % {MOD}) % 4294967296 AS s32
  FROM hw2, unnest(range(1, n - 1)) AS u(i)
  WHERE n >= 3
  UNION ALL
  SELECT doc_id, 0 AS win_idx, n AS wl,
         list_reduce(list_prepend(0::HUGEINT, hs),
                     (acc, x) -> (acc*{BASE_S} + x) % {MOD}) % 4294967296 AS s32
  FROM hw2 WHERE n BETWEEN 1 AND 2
),
bad AS (
  SELECT w.doc_id, w.win_idx, w.wl FROM win w JOIN bench b ON w.s32 = b.s32
),
tok AS (
  SELECT doc_id, i - 1 AS tok_idx, ws[i] AS w
  FROM hw2, unnest(range(1, n + 1)) AS u(i)
),
marked AS (
  SELECT t.doc_id, t.tok_idx, t.w,
         EXISTS (SELECT 1 FROM bad bp WHERE bp.doc_id = t.doc_id
                 AND t.tok_idx BETWEEN bp.win_idx
                                   AND bp.win_idx + bp.wl - 1) AS removed
  FROM tok t
)
SELECT h.doc_id, h.n AS n_words,
       coalesce(sum(CASE WHEN m.removed THEN 1 ELSE 0 END), 0)::BIGINT AS n_removed,
       coalesce(string_agg(CASE WHEN m.removed THEN NULL ELSE m.w END,
                           ' ' ORDER BY m.tok_idx), '') AS text_clean
FROM hw2 h LEFT JOIN marked m ON h.doc_id = m.doc_id
GROUP BY h.doc_id, h.n
"""


def sql_intra_doc_dedup(table: str = "documents", k: int = 3) -> str:
    """Full DuckDB statement: WITHIN-document repeated-span removal ->
    (doc_id, n_tokens, n_removed BIGINT, text_dedup) for every doc.
    Value-identical to ``dedup.intra_doc_dedup`` — the
    ``sql_exactsubstr_dedup`` statement with the first-occurrence
    partition narrowed from corpus (``PARTITION BY wh``) to document
    (``PARTITION BY doc_id, wh``)."""
    return f"""
WITH d AS (
  SELECT doc_id, {sql_word_list('text')} AS ws FROM {table}
),
hw AS (
  SELECT doc_id, ws, len(ws)::BIGINT AS n,
         list_transform(ws, w -> {sql_word_hash('w', BASE_W1)}) AS hs
  FROM d
),
win AS (
  SELECT doc_id, i - 1 AS win_idx,
         list_reduce(list_prepend(0::HUGEINT, hs[i:i+{k}-1]),
                     (acc, x) -> (acc*{BASE_S} + x) % {MOD})::BIGINT AS wh
  FROM hw, unnest(range(1, n - {k} + 2)) AS u(i)
  WHERE n >= {k}
),
dups AS (
  SELECT doc_id, win_idx FROM (
    SELECT doc_id, win_idx,
           row_number() OVER (PARTITION BY doc_id, wh ORDER BY win_idx) AS rn
    FROM win)
  WHERE rn > 1
),
tok AS (
  SELECT doc_id, i - 1 AS tok_idx, ws[i] AS w
  FROM hw, unnest(range(1, n + 1)) AS u(i)
),
marked AS (
  SELECT t.doc_id, t.tok_idx, t.w,
         EXISTS (SELECT 1 FROM dups dp WHERE dp.doc_id = t.doc_id
                 AND dp.win_idx BETWEEN t.tok_idx - {k} + 1 AND t.tok_idx) AS removed
  FROM tok t
)
SELECT h.doc_id, h.n AS n_tokens,
       coalesce(sum(CASE WHEN m.removed THEN 1 ELSE 0 END), 0)::BIGINT AS n_removed,
       coalesce(string_agg(CASE WHEN m.removed THEN NULL ELSE m.w END,
                           ' ' ORDER BY m.tok_idx), '') AS text_dedup
FROM hw h LEFT JOIN marked m ON h.doc_id = m.doc_id
GROUP BY h.doc_id, h.n
"""


def sql_snapshot_near_anti(
    table: str = "documents", threshold_e6: int = 500_000
) -> str:
    """Full DuckDB statement: snapshot-incremental NEAR-dup anti-join
    -> (doc_id, source) of new-crawl docs (odd-numbered sources) that
    are not LSH-candidate + exact-Jaccard-verified (>= threshold_e6)
    near-duplicates of any prior-snapshot doc (even-numbered sources).
    Value-identical to ``dedup.snapshot_near_anti_dedup`` (same
    shingles, signatures, band folds, fixed-point e6)."""
    return f"""
WITH {sql_shingle_ctes(table)},
{sql_bandsig_ctes()},
par AS (
  SELECT doc_id, source,
         CAST(substr(source, 4) AS BIGINT) % 2 AS p
  FROM {table}
),
cand AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM bandsig a JOIN par n ON a.doc_id = n.doc_id AND n.p = 1
  JOIN bandsig b ON a.band = b.band AND a.bh = b.bh
  JOIN par o ON b.doc_id = o.doc_id AND o.p = 0
),
sizes AS (SELECT doc_id, count(*) AS n FROM shu GROUP BY doc_id),
inter AS (
  SELECT c.u, c.v, count(*) AS i
  FROM cand c JOIN shu sa ON sa.doc_id = c.u
  JOIN shu sb ON sb.doc_id = c.v AND sa.s32 = sb.s32
  GROUP BY c.u, c.v
),
hits AS (
  SELECT DISTINCT u FROM (
    SELECT c.u,
      ((coalesce(i.i, 0) * 1000000) // (na.n + nb.n - coalesce(i.i, 0)))::BIGINT AS jacc_e6
    FROM cand c
    JOIN sizes na ON na.doc_id = c.u
    JOIN sizes nb ON nb.doc_id = c.v
    LEFT JOIN inter i ON i.u = c.u AND i.v = c.v
  ) WHERE jacc_e6 >= {threshold_e6}
)
SELECT n.doc_id, n.source FROM par n
WHERE n.p = 1 AND NOT EXISTS (SELECT 1 FROM hits h WHERE h.u = n.doc_id)
"""
