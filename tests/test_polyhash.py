"""polyhash contract tests: the vectorized numpy kernels must equal a
direct pure-Python implementation of the documented semantics, and the
distributed min-label propagation must match driver-side union-find on
edge lists shuffled across many blocks."""

import numpy as np
import pandas as pd
import ray.data

from neuscraper_ray.functions import polyhash as ph
from neuscraper_ray.functions.dedup import propagate_min_labels

M = ph.MOD
WS = set(ph.WHITESPACE)

TEXTS = [
    "hello world",
    "",
    "   ",
    "ONE",
    "a b",
    "The Quick BROWN fox the quick brown fox",
    "x" * 300,
    "unicode Ünïcødé ✓ mix\tTAB\nNEW lines\r\nand\x0bmore",
    "w1 w2 w3 w4 w5",
    "single",
    "dup dup dup dup",
    "\t\n leading and trailing \r\n",
]


def ref_fp(t):
    h = 0
    for c in t:
        h = (h * 257 + ord(c)) % M
    return h


def ref_words(t):
    out, cur = [], []
    for c in t:
        if ord(c) in WS:
            if cur:
                out.append(cur)
                cur = []
        else:
            cur.append(ord(c) + 32 if 65 <= ord(c) <= 90 else ord(c))
    if cur:
        out.append(cur)
    return out


def ref_wh(codes, base):
    h = 1
    for c in codes:
        h = (h * base + c) % M
    return h


def ref_simhash(t):
    ws = ref_words(t)
    if not ws:
        return 0
    acc = [0] * 64
    for w in ws:
        v = (ref_wh(w, 263) % 2**32) * 2**32 + (ref_wh(w, 271) % 2**32)
        for b in range(64):
            acc[b] += 1 if (v >> b) & 1 else -1
    u = sum((1 << b) for b in range(64) if acc[b] > 0)
    return u - 2**64 if u >= 2**63 else u


def ref_shingles(t, k=3):
    ws = [ref_wh(w, 263) for w in ref_words(t)]
    if not ws:
        sh = [0]
    elif len(ws) < k:
        h = 0
        for w in ws:
            h = (h * 1000003 + w) % M
        sh = [h]
    else:
        sh = []
        for i in range(len(ws) - k + 1):
            h = 0
            for w in ws[i : i + k]:
                h = (h * 1000003 + w) % M
            sh.append(h)
    return sorted(set(s % 2**32 for s in sh))


def test_mulmod_exact_vs_python_ints():
    rng = np.random.RandomState(0)
    a = rng.randint(0, M, size=1000).astype(np.uint64)
    b = rng.randint(0, M, size=1000).astype(np.uint64)
    got = ph.mulmod(a, b)
    for x, y, g in zip(a.tolist(), b.tolist(), got.tolist()):
        assert g == (x * y) % M


def test_fingerprints_match_reference():
    got = ph.fingerprints(TEXTS)
    for t, g in zip(TEXTS, got):
        assert int(g) == ref_fp(t), t


def test_simhash_match_reference():
    sims = ph.simhashes(ph.DocWords(TEXTS))
    for i, t in enumerate(TEXTS):
        assert int(sims[i]) == ref_simhash(t), t


def test_shingles_and_minhash_match_reference():
    dw = ph.DocWords(TEXTS)
    sh32, shdoc = ph.doc_shingles32(dw)
    a, b = ph.minhash_params()
    sigs = ph.minhash_sigs(sh32, shdoc, len(TEXTS), a, b)
    for i, t in enumerate(TEXTS):
        mine = sorted(int(s) for s in sh32[shdoc == i])
        want = ref_shingles(t)
        assert mine == want, t
        ref_sig = [
            min((int(ai) * s + int(bi)) % M for s in want) for ai, bi in zip(a, b)
        ]
        assert [int(x) for x in sigs[i]] == ref_sig, t


def test_batch_equals_single_doc_processing():
    """Batch boundaries must not leak between docs."""
    whole = ph.simhashes(ph.DocWords(TEXTS))
    singles = [ph.simhashes(ph.DocWords([t]))[0] for t in TEXTS]
    assert whole.tolist() == singles


def _union_find_labels(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_propagate_min_labels_cross_block_chain():
    """A long chain whose edges are scattered across many blocks needs
    multiple propagation rounds; labels must still equal the component
    min, matching driver-side union-find."""
    rng = np.random.RandomState(7)
    # chain 0-1-...-7 (diameter 7 -> multiple rounds), triangle, pair
    edges = [(i, i + 1) for i in range(7)]
    edges += [(100, 101), (101, 102), (100, 102), (200, 201)]
    rng.shuffle(edges)
    df = pd.DataFrame(edges, columns=["id_a", "id_b"])
    ds = ray.data.from_pandas(df).repartition(8)
    # driver_edge_limit=0 forces the distributed propagation rounds
    out = propagate_min_labels(ds, num_buckets=4, driver_edge_limit=0)
    want = _union_find_labels(edges)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == want
    # the driver-local vectorized fixpoint (default path at this size)
    # must agree with the distributed rounds
    local = propagate_min_labels(ds, num_buckets=4)
    assert dict(zip(local["doc_id"], local["cluster_id"])) == want


def test_propagate_min_labels_raises_when_unconverged():
    """Exhausting max_rounds before the fixpoint must fail loud, not
    return wrong cluster ids (diameter > max_rounds chains diverge from
    the recursive-CTE oracle silently otherwise)."""
    import pytest

    edges = [(i, i + 1) for i in range(9)]  # diameter 9
    df = pd.DataFrame(edges, columns=["id_a", "id_b"])
    ds = ray.data.from_pandas(df).repartition(4)
    with pytest.raises(RuntimeError, match="did not converge"):
        propagate_min_labels(ds, num_buckets=4, driver_edge_limit=0, max_rounds=2)
    # ...and a sufficient bound still converges to the right answer
    out = propagate_min_labels(ds, num_buckets=4, driver_edge_limit=0, max_rounds=16)
    assert set(out["cluster_id"]) == {0}


def test_propagate_min_labels_empty():
    ds = ray.data.from_pandas(
        pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
    )
    out = propagate_min_labels(ds)
    assert len(out) == 0 and list(out.columns) == ["doc_id", "cluster_id"]


# --------------------------- sketch-primitive properties (hypothesis)


import hypothesis.strategies as st
from hypothesis import given, settings


@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_quantile_buckets_property(vals):
    """Every finite value maps to a representative within the
    2^(1-QS_MANT_BITS) relative bound; counts conserve; merging two
    partials equals bucketing the concatenation (mergeability)."""
    import numpy as np

    from neuscraper_ray.functions.sketch import QS_MANT_BITS, quantile_buckets

    rel = 2.0 ** (1 - QS_MANT_BITS)
    v = np.asarray(vals, dtype=np.float64)
    reps, counts = quantile_buckets(v)
    assert counts.sum() == len(v)
    # per-value bound, vectorized via the same mantissa floor
    m, e = np.frexp(v)
    scale = float(1 << QS_MANT_BITS)
    b = np.where(v != 0, np.ldexp(np.trunc(m * scale) / scale, e), v)
    assert (np.abs(b - v) <= rel * np.abs(v)).all()
    assert set(b.tolist()) == set(reps.tolist())

    # mergeability: histogram(a) + histogram(b) == histogram(a ++ b)
    half = len(v) // 2
    ra, ca = quantile_buckets(v[:half])
    rb, cb = quantile_buckets(v[half:])
    merged = {}
    for r, c in zip(ra, ca):
        merged[r] = merged.get(r, 0) + int(c)
    for r, c in zip(rb, cb):
        merged[r] = merged.get(r, 0) + int(c)
    whole = dict(zip(quantile_buckets(v)[0].tolist(), quantile_buckets(v)[1].tolist()))
    assert merged == whole


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=300),
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=300),
)
@settings(max_examples=100, deadline=None)
def test_bloom_bits_property(inserted, probed):
    """No false negatives ever, for arbitrary int64 keys; bitmap OR of
    two partial builds equals the build over the union (mergeability)."""
    import numpy as np

    from neuscraper_ray.functions.sketch import _bloom_bits, bloom_maybe_contains

    n_bits, n_hashes = 1 << 14, 5
    words = n_bits // 64
    ins = np.asarray(inserted, dtype=np.int64)

    def build(keys):
        bm = np.zeros(words, dtype=np.uint64)
        bits = _bloom_bits(keys, n_bits, n_hashes)
        np.bitwise_or.at(
            bm,
            (bits >> np.uint64(6)).ravel().astype(np.int64),
            np.uint64(1) << (bits % np.uint64(64)).ravel(),
        )
        return bm

    bm = build(ins)
    assert bloom_maybe_contains(bm, ins, n_hashes).all()

    half = len(ins) // 2
    if half:
        merged = build(ins[:half]) | build(ins[half:])
        assert np.array_equal(merged, bm)

    # probes of non-inserted keys may be True (false positive) but the
    # function must never raise and must return one bool per key
    pr = np.asarray(probed, dtype=np.int64)
    out = bloom_maybe_contains(bm, pr, n_hashes)
    assert out.shape == (len(pr),) and out.dtype == bool
