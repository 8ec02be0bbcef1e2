"""Hypothesis property tests for the pure invariants the distributed
operators rely on: a falsified property here means a correctness bug
at any scale, independent of Spark."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from hybrid_cdc_demo_spark.streaming.windows import merge_topk

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@given(
    a=finite,
    b=finite,
    eps=st.floats(min_value=1e-6, max_value=1e6, allow_nan=False),
)
@settings(max_examples=500, deadline=None)
def test_band_join_bucket_coverage(a, b, eps):
    """The band join's completeness invariant under COMPUTED-double
    semantics: if the computed |a-b| <= eps, the computed eps-buckets
    differ by at most 2 — which the ±2 candidate explode covers.
    (Hypothesis originally falsified the textbook ±1 claim with a
    boundary case: a=1.0, b=-2.2e-311, eps=1.0 — the computed diff
    rounds to exactly eps while the buckets are 2 apart; that find is
    why the operator explodes 5 buckets.) Scoped to |v|/eps < 2**50,
    the operator's documented range — float bucketing is ill-defined
    beyond it."""
    if abs(a / eps) >= 2**50 or abs(b / eps) >= 2**50:
        return
    if abs(a - b) <= eps:
        ba = math.floor(a / eps)
        bb = math.floor(b / eps)
        assert abs(ba - bb) <= 2


@given(
    held=st.lists(
        st.tuples(st.integers(0, 1000), finite), max_size=10
    ),
    incoming=st.lists(
        st.tuples(st.integers(0, 1000), finite), max_size=20
    ),
    k=st.integers(1, 8),
)
@settings(max_examples=200, deadline=None)
def test_merge_topk_equals_global_sort(held, incoming, k):
    """Incremental top-k state maintenance must equal sorting the full
    union — the property that makes per-batch truncation to k safe."""
    got = merge_topk(held, incoming, k)
    want = sorted(held + incoming, key=lambda t: (-t[1], t[0]))[:k]
    assert got == want


@given(
    first=st.lists(st.tuples(st.integers(0, 100), finite), max_size=15),
    second=st.lists(st.tuples(st.integers(0, 100), finite), max_size=15),
    k=st.integers(1, 6),
)
@settings(max_examples=200, deadline=None)
def test_merge_topk_is_associative_across_batches(first, second, k):
    """Truncating to k after EVERY batch loses nothing: merging batch
    by batch equals merging everything at once (the reason O(k) state
    suffices for any stream length)."""
    stepwise = merge_topk(merge_topk([], first, k), second, k)
    at_once = merge_topk([], first + second, k)
    assert stepwise == at_once


@given(
    n=st.integers(min_value=0, max_value=400),
    chunk=st.integers(min_value=1, max_value=100),
    stride=st.integers(min_value=1, max_value=100),
)
@settings(max_examples=300, deadline=None)
def test_chunk_boundaries_cover_every_token(n, chunk, stride):
    """chunk_documents' clamped start formula must cover every token
    index exactly when stride <= chunk (overlapping or abutting
    windows), always include token 0 and the final token, and never
    emit a start past the end. (Hypothesis falsified the unclamped
    1 + ceil(max(n−chunk,0)/stride) form with n=2, chunk=1,
    stride=100 — an empty tail chunk at start 100; the least() clamp
    below is the fix.)"""
    n_chunks = min(
        1 + math.ceil(max(n - chunk, 0) / stride),
        math.ceil(max(n, 1) / stride),
    )
    n_chunks = max(n_chunks, 1)
    starts = [k * stride for k in range(n_chunks)]
    covered = set()
    for s in starts:
        covered |= set(range(s, min(s + chunk, max(n, 1))))
    if n == 0:
        assert n_chunks == 1  # one (empty-ish) chunk per doc, never zero
        return
    # no chunk starts beyond the last token (no empty tails) …
    assert all(s < n for s in starts)
    # … and with stride <= chunk (overlap/abutting, the default) the
    # final chunk reaches the last token and coverage is COMPLETE;
    # stride > chunk is gap SAMPLING — tails may be skipped by design
    if stride <= chunk:
        assert (n - 1) in range(starts[-1], starts[-1] + chunk)
        assert covered == set(range(n))


@given(data=st.data())
@settings(max_examples=200, deadline=None)
def test_hex_gate_rates_are_nested_and_proportional(data):
    """weighted_mixture's hex-digit gate: for any id set, the kept
    set at rate r is a subset of the kept set at rate r' >= r
    (stable subsampling), rate 0 keeps nothing, rate 16 everything —
    pure-Python replay of the same sha256-first-hex rule."""
    import hashlib

    ids = data.draw(st.lists(st.integers(0, 10**9), max_size=60, unique=True))
    r1 = data.draw(st.integers(0, 16))
    r2 = data.draw(st.integers(0, 16))
    lo, hi = min(r1, r2), max(r1, r2)
    hexd = "0123456789abcdefg"

    def kept(rate):
        return {
            i for i in ids
            if hashlib.sha256(str(i).encode()).hexdigest()[0] < hexd[rate]
        }

    assert kept(0) == set()
    assert kept(16) == set(ids)
    assert kept(lo) <= kept(hi)
