"""Evaluation comparators: EXACT / NUMERIC_EXACT / FUZZY / HUNGARIAN.

Deterministic subset of the reference's comparator suite
(``lib/idp_common_pkg/idp_common/evaluation/comparator.py``):

* EXACT (:44-51): punctuation-insensitive, whitespace-collapsed, lowercased
  string equality.
* NUMERIC_EXACT (:104-126): strip ``$ , ( )`` (parens = negative), cast to
  float, exact compare.
* FUZZY (:290-336): Levenshtein ratio >= threshold (default 0.8,
  ``evaluation/models.py:33``).
* HUNGARIAN (:226-287): optimal bipartite assignment between expected and
  actual value lists over a pairwise-similarity matrix; scipy is not
  available in this environment so the O(n^3) Jonker-style Hungarian
  algorithm is implemented directly in numpy (public algorithm).

SEMANTIC / LLM methods (comparator.py:406+) are out of scope (remote
models).  Pure kernels; Spark dispatch in ``operators/evaluate.py``.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np

from .normalize import normalize_for_compare

DEFAULT_FUZZY_THRESHOLD = 0.8

_NUM_STRIP = re.compile(r"[$,\s]")


def compare_exact(expected: str, actual: str) -> bool:
    return normalize_for_compare(expected or "") == normalize_for_compare(actual or "")


def parse_numeric(value) -> Optional[float]:
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return float(value)
    s = _NUM_STRIP.sub("", str(value))
    neg = s.startswith("(") and s.endswith(")")
    if neg:
        s = s[1:-1]
    try:
        f = float(s)
    except ValueError:
        return None
    return -f if neg else f


def compare_numeric(expected, actual) -> bool:
    e, a = parse_numeric(expected), parse_numeric(actual)
    return e is not None and a is not None and e == a


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def fuzzy_score(expected: str, actual: str) -> float:
    e = normalize_for_compare(expected or "")
    a = normalize_for_compare(actual or "")
    if not e and not a:
        return 1.0
    denom = max(len(e), len(a))
    return 1.0 - levenshtein(e, a) / denom if denom else 1.0


def compare_fuzzy(expected, actual, threshold: float = DEFAULT_FUZZY_THRESHOLD) -> bool:
    return fuzzy_score(expected, actual) >= threshold


HASH_DIM = 256


def hashing_vector(text: str, dim: int = HASH_DIM) -> np.ndarray:
    """Deterministic hashing vectorizer (the feature-hashing trick):
    token → md5-derived bucket, counts, l2-normalized.  Engine-portable
    replacement for the reference's embedding-based SEMANTIC comparator
    (comparator.py:372-403 cosine over Bedrock embeddings, X8) — same
    interface, no remote model."""
    import hashlib as _h

    v = np.zeros(dim, dtype=np.float64)
    for tok in normalize_for_compare(text or "").split():
        b = int.from_bytes(_h.md5(tok.encode("utf-8")).digest()[:4], "big") % dim
        v[b] += 1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def semantic_score(expected: str, actual: str, dim: int = HASH_DIM) -> float:
    """Cosine similarity of hashing vectors in [0, 1]."""
    e = hashing_vector(expected, dim)
    a = hashing_vector(actual, dim)
    if not e.any() and not a.any():
        return 1.0
    return float(np.dot(e, a))


def semantic_scores_batch(expected, actual, dim: int = HASH_DIM) -> np.ndarray:
    """Vectorized SEMANTIC scoring for one Arrow batch: each unique token is
    md5-hashed ONCE per batch (cached bucket map) and per-row count vectors
    are built with ``np.bincount`` (C speed) instead of a Python
    accumulation loop.

    Cross-engine FP determinism: the cosine is computed as
    ``int_dot / sqrt(int_norm_e * int_norm_a)`` over EXACT integer counts
    (one multiply, one sqrt, one divide — the same IEEE op sequence a SQL
    oracle performs), so the score hashes identically against DuckDB;
    mathematically equal to ``semantic_score``'s normalized-vector dot."""
    import hashlib as _h
    import math as _m

    bucket_of: dict = {}

    def _vec(text):
        toks = normalize_for_compare(text or "").split()
        if not toks:
            return None
        idx = np.empty(len(toks), dtype=np.int64)
        for i, tok in enumerate(toks):
            b = bucket_of.get(tok)
            if b is None:
                b = int.from_bytes(_h.md5(tok.encode("utf-8")).digest()[:4], "big") % dim
                bucket_of[tok] = b
            idx[i] = b
        return np.bincount(idx, minlength=dim)

    out = np.empty(len(expected), dtype=np.float64)
    for i, (e, a) in enumerate(zip(expected, actual)):
        ve, va = _vec(e), _vec(a)
        if ve is None and va is None:
            out[i] = 1.0
        elif ve is None or va is None:
            out[i] = 0.0
        else:
            dot = int(ve @ va)
            out[i] = dot / _m.sqrt(float(int(ve @ ve) * int(va @ va)))
    return out


def compare_semantic(expected, actual, threshold: float = 0.8) -> bool:
    return semantic_score(expected, actual) >= threshold


def _lev_one_to_many(e: str, B: np.ndarray, blens: np.ndarray) -> np.ndarray:
    """Levenshtein distances from ``e`` to every padded row of ``B``
    (char-code matrix, (n, Lmax)) in one vectorized DP.

    The in-row dependency cur[j] = min(t[j], cur[j-1]+1) is resolved with
    the prefix-min identity cur[j] = j + min_{k<=j}(t[k] - k), so each of
    the len(e) DP rows is a handful of C-speed array ops instead of a
    Python cell loop — ~30x the scalar ``levenshtein`` on short strings.
    """
    n, L = B.shape
    prev = np.tile(np.arange(L + 1, dtype=np.int32), (n, 1))
    ar = np.arange(L + 1, dtype=np.int32)
    for i, ch in enumerate(e, 1):
        t = np.empty((n, L + 1), dtype=np.int32)
        t[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + (B != ord(ch)), out=t[:, 1:])
        prev = np.minimum.accumulate(t - ar, axis=1) + ar
    return prev[np.arange(n), blens]


def fuzzy_matrix(expected: List[str], actual: List[str]) -> np.ndarray:
    """Pairwise FUZZY similarity matrix (len(expected) x len(actual)) —
    normalized once per string, batched-DP Levenshtein per expected row;
    element-for-element equal to nested ``fuzzy_score`` calls."""
    es = [normalize_for_compare(e or "") for e in expected]
    bs = [normalize_for_compare(a or "") for a in actual]
    n_a = len(bs)
    blens = np.array([len(b) for b in bs], dtype=np.int64)
    lmax = int(blens.max()) if n_a else 0
    B = np.full((n_a, lmax), -1, dtype=np.int32)
    for r, b in enumerate(bs):
        if b:
            B[r, : len(b)] = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int32
            )
    sim = np.empty((len(es), n_a), dtype=np.float64)
    for i, e in enumerate(es):
        dist = _lev_one_to_many(e, B, blens)
        denom = np.maximum(np.maximum(len(e), blens), 1)
        row = 1.0 - dist / denom
        row[(blens == 0) & (len(e) == 0)] = 1.0
        sim[i] = row
    return sim


def hungarian_min(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Solve the rectangular assignment problem (minimize total cost).

    Classic Hungarian algorithm with potentials (O(n^2 m)); returns
    (row_indices, col_indices) like scipy.optimize.linear_sum_assignment.
    """
    cost = np.asarray(cost, dtype=float)
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape  # n <= m
    INF = float("inf")
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=int)  # p[j] = row matched to col j (1-based)
    way = np.zeros(m + 1, dtype=int)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            # inner relaxation vectorized over all unused columns (the
            # per-column Python loop was the hot spot at 30x30 matrices)
            used[j0] = True
            i0 = p[j0]
            free = ~used[1:]
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            upd = free & (cur < minv[1:])
            if upd.any():
                idx = np.flatnonzero(upd) + 1
                minv[idx] = cur[idx - 1]
                way[idx] = j0
            cand = np.where(free, minv[1:], INF)
            j1 = int(np.argmin(cand)) + 1
            delta = cand[j1 - 1]
            u[p[used]] += delta
            v[used] -= delta
            minv[~used] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0 != 0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    rows, cols = [], []
    for j in range(1, m + 1):
        if p[j] != 0:
            rows.append(p[j] - 1)
            cols.append(j - 1)
    rows = np.array(rows)
    cols = np.array(cols)
    order = np.argsort(rows)
    rows, cols = rows[order], cols[order]
    if transposed:
        return cols, rows
    return rows, cols


def hungarian_match(
    expected: List[str],
    actual: List[str],
    threshold: float = DEFAULT_FUZZY_THRESHOLD,
) -> Tuple[int, int, int, float]:
    """Optimal list matching (comparator.py:226-287 semantics).

    Returns (tp, fp, fn, mean_matched_score): pairs are assigned to maximize
    total fuzzy similarity; an assigned pair counts as a match iff its score
    >= threshold.  Unmatched actual values are false positives, unmatched
    expected values false negatives.
    """
    if not expected and not actual:
        return 0, 0, 0, 1.0
    if not expected:
        return 0, len(actual), 0, 0.0
    if not actual:
        return 0, 0, len(expected), 0.0
    sim = fuzzy_matrix(expected, actual)
    rows, cols = hungarian_min(1.0 - sim)
    tp = 0
    scores = []
    for r, c in zip(rows, cols):
        scores.append(sim[r, c])
        if sim[r, c] >= threshold:
            tp += 1
    fp = len(actual) - tp
    fn = len(expected) - tp
    mean = float(np.mean(scores)) if scores else 0.0
    return tp, fp, fn, mean


def jaro_similarity(s1: str, s2: str) -> float:
    """Jaro similarity (Jaro 1989): matches within the standard window
    ``max(|s1|,|s2|)/2 - 1``, transpositions = half the out-of-order
    matches.  Pure rational arithmetic — two independent implementations
    (this one and a SQL engine's native) agree to the last ulp on the
    same inputs, which is what lets q_record_linkage use DuckDB's
    ``jaro_similarity`` as a true differential oracle."""
    n1, n2 = len(s1), len(s2)
    # empty-side check FIRST: DuckDB scores ("", "") as 0.0, not 1.0 —
    # found by the hypothesis differential test
    if n1 == 0 or n2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(max(n1, n2) // 2 - 1, 0)
    match1 = [False] * n1
    match2 = [False] * n2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(n2, i + window + 1)
        for j in range(lo, hi):
            if not match2[j] and s2[j] == c:
                match1[i] = match2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    k = 0
    mismatched = 0
    for i in range(n1):
        if match1[i]:
            while not match2[k]:
                k += 1
            if s1[i] != s2[k]:
                mismatched += 1
            k += 1
    # transpositions = mismatched matched-positions // 2 with INTEGER
    # floor (an odd count occurs when the matched multiset permutes with
    # no fixed point) — the Apache-Commons/DuckDB convention, found by
    # the hypothesis differential test on ('ab ', 'b aaaa')
    t = mismatched // 2
    return (m / n1 + m / n2 + (m - t) / m) / 3.0


def jaro_winkler(
    s1: str,
    s2: str,
    p: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.7,
) -> float:
    """Jaro-Winkler similarity (Winkler 1990): the Jaro score boosted by
    the common prefix (capped at ``max_prefix``), applied only above the
    standard 0.7 boost threshold — the exact variant DuckDB's
    ``jaro_winkler_similarity`` implements, verified by
    tests/test_linkage.py against its textbook values."""
    j = jaro_similarity(s1, s2)
    if j <= boost_threshold:
        return j
    l = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        l += 1
    return j + l * p * (1.0 - j)


def nw_score(
    a: List[str],
    b: List[str],
    match: int = 2,
    mismatch: int = -1,
    gap: int = -1,
) -> int:
    """Needleman-Wunsch global alignment score (Needleman & Wunsch 1970)
    with integer affine-free scoring — the sequence-level comparator for
    transcript evaluation when turn indices shift (dropped/inserted
    turns), where the reference's per-index join (evaluation/service.py)
    scores every downstream turn as a miss.  Integer scores make the
    result bit-portable: the DuckDB oracle reproduces the identical DP
    via a per-row recursive CTE (q_evaluate_alignment)."""
    n, m = len(a), len(b)
    prev = [j * gap for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [i * gap] + [0] * m
        ai = a[i - 1]
        for j in range(1, m + 1):
            s = match if ai == b[j - 1] else mismatch
            cur[j] = max(prev[j - 1] + s, prev[j] + gap, cur[j - 1] + gap)
        prev = cur
    return prev[m]


def sw_score(
    a: List[str],
    b: List[str],
    match: int = 2,
    mismatch: int = -1,
    gap: int = -1,
) -> int:
    """Smith-Waterman LOCAL alignment score (Smith & Waterman 1981) with
    integer linear-gap scoring: the zero-floored DP

        h(i,j) = max(0, h(i-1,j-1)+s, h(i-1,j)+gap, h(i,j-1)+gap)

    maximized over ALL cells — the best-matching contiguous region,
    where Needleman-Wunsch (nw_score) charges a corrupted prefix/suffix
    against the whole sequence.  The comparator for "does the golden
    transcript appear INSIDE this noisy capture?".  Integer scores keep
    it bit-portable for the recursive-CTE oracle."""
    n, m = len(a), len(b)
    best = 0
    prev = [0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        ai = a[i - 1]
        for j in range(1, m + 1):
            s = match if ai == b[j - 1] else mismatch
            cur[j] = max(
                0, prev[j - 1] + s, prev[j] + gap, cur[j - 1] + gap
            )
            if cur[j] > best:
                best = cur[j]
        prev = cur
    return best
