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
