"""Hungarian list-matching certification (J2, round-3 item #7; oracle
added round 4 per VERDICT #5).

Three layers of evidence for ``q_evaluate_hungarian``:

1. DIFFERENTIAL optimality: the numpy Hungarian kernel must equal the
   brute-force permutation optimum (reference semantics
   ``evaluation/comparator.py:226-287``) on seeded random cases + edges.
2. COMMITTED GOLDEN: the driver query's full sf0.01 output is pinned in
   ``tests/golden/hungarian_sf001.json`` (testdata is seed-42
   deterministic) — byte-exact evidence independent of the driver.
3. DRIVER ORACLE: since round 4 the query uses fixed-size groups
   (doc_id div 5, n <= 5) so a DuckDB recursive-CTE permutation
   brute-force is feasible — ``_evaluate_hungarian_sql`` hash-matches
   the kernel at sf0.01 and sf0.1 (the former rows-only gap is closed).
"""

from __future__ import annotations

import itertools
import json
import os
import random
import string

import numpy as np
import pytest

from accelerated_intelligent_document_processing_on_aws_spark.kernels.compare import (
    fuzzy_matrix,
    hungarian_match,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "hungarian_sf001.json")


def brute_force_match(expected, actual, threshold=0.8):
    """Exhaustive optimum over all assignments (small lists only)."""
    if not expected and not actual:
        return 0, 0, 0, 1.0
    if not expected:
        return 0, len(actual), 0, 0.0
    if not actual:
        return 0, 0, len(expected), 0.0
    sim = fuzzy_matrix(expected, actual)
    n, m = len(expected), len(actual)
    k = min(n, m)
    best = None
    # assign k expected rows to k actual cols, maximizing total sim
    for rows in itertools.combinations(range(n), k):
        for cols in itertools.permutations(range(m), k):
            total = sum(sim[r, c] for r, c in zip(rows, cols))
            if best is None or total > best[0] + 1e-12:
                best = (total, rows, cols)
    _, rows, cols = best
    scores = [sim[r, c] for r, c in zip(rows, cols)]
    tp = sum(1 for s in scores if s >= threshold)
    return tp, len(actual) - tp, len(expected) - tp, float(np.mean(scores))


@pytest.mark.parametrize("seed", range(20))
def test_kernel_matches_bruteforce_optimum(seed):
    rng = random.Random(seed)
    words = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 8)))
             for _ in range(6)]
    exp = rng.sample(words, rng.randint(0, 4))
    act = [w.replace("a", "4") if rng.random() < 0.5 else w
           for w in rng.sample(words, rng.randint(0, 4))]
    got = hungarian_match(exp, act)
    want = brute_force_match(exp, act)
    # assignments may differ when optima tie; totals/counts must agree
    assert got[:3] == want[:3]
    assert abs(got[3] - want[3]) < 1e-9


def test_kernel_edge_cases():
    assert hungarian_match([], []) == (0, 0, 0, 1.0)
    assert hungarian_match([], ["x"]) == (0, 1, 0, 0.0)
    assert hungarian_match(["x"], []) == (0, 0, 1, 0.0)
    assert hungarian_match(["abc"], ["abc"])[0] == 1


def test_driver_query_matches_committed_golden(spark):
    import __spark_entry__ as em

    with open(GOLDEN) as fh:
        golden = json.load(fh)
    rows = em.q_evaluate_hungarian(spark, "/root/testdata/sf0.01").collect()
    got = [
        {"group_id": r.group_id, "tp": r.tp, "fp": r.fp, "fn": r.fn,
         "mean_score": r.mean_score}
        for r in rows
    ]
    assert got == golden
