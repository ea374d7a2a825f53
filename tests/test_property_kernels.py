"""Property tests (hypothesis, no JVM) for the new arithmetic kernels.

Two kernels whose failure mode is silent numeric drift rather than a
crash: the cuckoo-filter build/probe (a false negative silently
re-crawls seen URLs) and the mix-allocation overflow-split arithmetic
(a wrong rate silently skews the training mix). Both have pure-Python/
numpy forms, so hypothesis can sweep them far wider than the Spark
tests — in milliseconds, no session needed.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.operators.cuckoo import (
    _build_table,
    _nb_for,
    contains_numpy,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(I64, I64), min_size=0, max_size=400))
def test_cuckoo_no_false_negatives_any_hashes(pairs):
    """Whatever the (h1, h2) hash values — adversarial duplicates,
    extremes, sign mixes — every inserted key must probe present unless
    the build honestly overflowed to None."""
    h1 = np.array([p[0] for p in pairs], dtype=np.int64)
    h2 = np.array([p[1] for p in pairs], dtype=np.int64)
    nb = _nb_for(len(pairs), headroom=1)
    slots = _build_table(h1, h2, nb)
    if slots is None:
        return  # overflow path: probed all-maybe by contract
    assert bool(contains_numpy(nb, slots, h1, h2).all())


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**62),
    st.integers(min_value=0, max_value=1_000_000),
    st.integers(min_value=1, max_value=2**62),
)
def test_mix_split_arithmetic_matches_bigint(budget, weight_ppm, n_tokens):
    """The PPM-split and shifted-tail formulas must track the exact
    big-int results: desired/planned splits exactly, tail within the
    documented <1 ppm of exact past the shift threshold."""
    from crawler_spark.operators.mixing import PPM, TAIL_SHIFT, TAIL_SHIFT_ABOVE

    desired_split = (budget // PPM) * weight_ppm + ((budget % PPM) * weight_ppm) // PPM
    assert desired_split == (budget * weight_ppm) // PPM  # exact, proven

    r = desired_split % n_tokens
    if n_tokens > TAIL_SHIFT_ABOVE:
        tail = ((r >> TAIL_SHIFT) * PPM) // (n_tokens >> TAIL_SHIFT)
    else:
        tail = (r * PPM) // n_tokens
        assert r * PPM < 2**63  # the unshifted branch truly fits int64
    exact_tail = (r * PPM) // n_tokens  # big-int truth
    # shifted-branch bound: relative ≤ 2·2^22/n < 2.1e-6 past the
    # threshold, plus floor slop — a wrong TAIL_SHIFT fails this
    assert abs(tail - exact_tail) <= 2 + (exact_tail * 3) // 1_000_000

    planned_split = (n_tokens // PPM) * tail + ((n_tokens % PPM) * tail) // PPM
    assert planned_split == (n_tokens * tail) // PPM  # exact, proven
    # every int64 intermediate of the Spark expressions stays in range
    shifted = ((r >> TAIL_SHIFT) * PPM, n_tokens >> TAIL_SHIFT)
    unshifted = (r * PPM,) if n_tokens <= TAIL_SHIFT_ABOVE else shifted
    for v in (
        (budget % PPM) * weight_ppm,
        (n_tokens % PPM) * tail,
        (n_tokens // PPM) * tail,
        *unshifted,
    ):
        assert -(2**63) <= v < 2**63


# ------------------------------------------------------------------ SALSA --
#
# The closed form's two THEOREM-level properties, swept over arbitrary
# digraphs (the Spark operator is separately differential-tested against
# this same twin in tests/test_salsa.py, so the chain is: invariants →
# twin → operator → DuckDB oracle).

from crawler_spark.operators.linkgraph import SALSA_SCALE
from tests.test_salsa import _py_salsa

_EDGE = st.tuples(
    st.integers(min_value=0, max_value=24), st.integers(min_value=0, max_value=24)
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_EDGE, min_size=0, max_size=120))
def test_salsa_mass_conservation_and_tkc_cap(pairs):
    edges = sorted({(a, b) for a, b in pairs if a != b})
    n = 25
    auth, hub = _py_salsa(edges, n)
    for scores, deg_nodes in (
        (auth, {v for _, v in edges}),
        (hub, {u for u, _ in edges}),
    ):
        assert all(s >= 0 for s in scores.values())
        total = sum(scores.values())
        # L1 mass: Σ = SCALE minus ≤3 truncating divisions per scored node
        if deg_nodes:
            assert SALSA_SCALE - 4 * len(deg_nodes) <= total <= SALSA_SCALE
        else:
            assert total == 0
    if not edges:
        return
    # TKC cap (the anti-link-farm theorem): a component's total authority
    # mass never exceeds its share of the authority side
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for u, v in edges:
        ra, rb = find(2 * u), find(2 * v + 1)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    auths = {v for _, v in edges}
    by_comp: dict[int, list[int]] = {}
    for v in auths:
        by_comp.setdefault(find(2 * v + 1), []).append(v)
    for members in by_comp.values():
        comp_share = len(members) * SALSA_SCALE // len(auths)
        assert sum(auth[v] for v in members) <= comp_share
