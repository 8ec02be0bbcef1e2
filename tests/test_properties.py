"""Property-based tests (hypothesis) for the invariants the design
leans on (SURVEY §7.3.4): latest-wins must be order-independent,
backoff math bounded, masking deterministic and null-safe, config
merge last-writer-wins, minhash signatures permutation-invariant."""

import hashlib
import json
import random

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from hybrid_cdc_demo_spark.config import deep_merge
from hybrid_cdc_demo_spark.functions.masking import mask_phi_value, mask_pii_value
from hybrid_cdc_demo_spark.streaming.retry import RetryPolicy, calculate_backoff

# --- pure-python properties (fast, many examples) ---------------------------


@given(
    attempt=st.integers(min_value=1, max_value=40),
    base=st.floats(min_value=0.001, max_value=5),
    mult=st.floats(min_value=1.0, max_value=4),
    cap=st.floats(min_value=0.01, max_value=120),
    jitter=st.floats(min_value=0, max_value=1),
)
def test_backoff_always_within_jittered_cap(attempt, base, mult, cap, jitter):
    policy = RetryPolicy(
        max_attempts=50,
        base_delay_seconds=base,
        multiplier=mult,
        max_delay_seconds=cap,
        jitter_fraction=jitter,
    )
    d = calculate_backoff(attempt, policy)
    assert 0 <= d <= cap * (1 + jitter) + 1e-9
    # un-jittered expectation: min(base * mult^(n-1), cap) ± jitter
    raw = min(base * mult ** (attempt - 1), cap)
    assert raw * (1 - jitter) - 1e-9 <= d <= raw * (1 + jitter) + 1e-9


@given(st.one_of(st.none(), st.text(max_size=200)))
def test_pii_mask_deterministic_null_safe(value):
    a, b = mask_pii_value(value), mask_pii_value(value)
    assert a == b
    if value is None:
        assert a is None
    else:
        assert a == hashlib.sha256(value.encode()).hexdigest()


@given(st.text(max_size=100), st.text(min_size=1, max_size=32))
def test_phi_mask_keyed_and_deterministic(value, key):
    assert mask_phi_value(value, key) == mask_phi_value(value, key)
    if value:  # a different key must give a different token
        assert mask_phi_value(value, key) != mask_phi_value(value, key + "x")


json_scalars = st.one_of(st.integers(), st.text(max_size=8), st.booleans())
config_dicts = st.recursive(
    st.dictionaries(st.text(min_size=1, max_size=6), json_scalars, max_size=4),
    lambda children: st.dictionaries(
        st.text(min_size=1, max_size=6), children | json_scalars, max_size=4
    ),
    max_leaves=12,
)


@given(config_dicts, config_dicts)
def test_deep_merge_override_wins_and_preserves_base(base, override):
    merged = deep_merge(base, override)
    for k, v in override.items():
        if not isinstance(v, dict):
            assert merged[k] == v  # override always wins on scalars
    for k, v in base.items():
        if k not in override:
            assert merged[k] == v  # untouched base keys survive
    assert deep_merge(merged, override) == merged  # idempotent re-apply


# --- spark-backed properties (few examples, deadline off) --------------------


def _events(keys, n, rng):
    return [
        (
            f"e{i}",
            rng.choice(keys),
            rng.randrange(1, 50),  # duplicate timestamps exercised
            f"v{i}",
        )
        for i in range(n)
    ]


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_latest_wins_is_order_independent(seed):
    """SURVEY §7.3.4: MERGE latest-wins (ts, event_id tiebreak) must
    produce identical state for ANY delivery order of the same events."""
    from hybrid_cdc_demo_spark.streaming.sinks import latest_per_key
    from hybrid_cdc_demo_spark.session import get_spark

    spark = get_spark()
    rng = random.Random(seed)
    rows = _events(["k1", "k2", "k3"], 30, rng)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    cols = ["event_id", "key", "timestamp_micros", "value"]
    a = latest_per_key(
        spark.createDataFrame(rows, cols), ["key"]
    ).orderBy("key")
    b = latest_per_key(
        spark.createDataFrame(shuffled, cols), ["key"]
    ).orderBy("key")
    assert [r.asDict() for r in a.collect()] == [r.asDict() for r in b.collect()]


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_minhash_signature_is_shingle_set_function(seed):
    """The signature must depend only on the shingle SET: shuffling
    word blocks that preserve the shingle multiset boundary cases
    aside, identical texts ⇒ identical signatures, and signatures are
    insensitive to duplicated sentences (set semantics)."""
    from hybrid_cdc_demo_spark.operators.dedup import minhash_signatures
    from hybrid_cdc_demo_spark.session import get_spark

    spark = get_spark()
    rng = random.Random(seed)
    words = [f"w{rng.randrange(40)}" for _ in range(60)]
    text = " ".join(words)
    dup = text + " " + text  # repeats every shingle (plus boundary ones)
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, dup)], ["doc_id", "text"]
    )
    sigs = {
        r["_id"]: tuple(r["signature"])
        for r in minhash_signatures(df, "text", "doc_id", 16, 3).collect()
    }
    assert sigs[1] == sigs[2]  # identical text, identical signature
    # dup's shingle set is a SUPERSET of text's (junction shingles
    # added), so each per-position minimum can only decrease — a
    # deterministic monotonicity property of min-hashing (an overlap
    # threshold here is stochastic and flakes under hypothesis seeds)
    assert all(d <= t for t, d in zip(sigs[1], sigs[3]))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.text(alphabet="ab", min_size=0, max_size=6), min_size=1, max_size=40)
)
def test_exact_dedup_matches_set_semantics(texts):
    from hybrid_cdc_demo_spark.operators.dedup import exact_dedup
    from hybrid_cdc_demo_spark.session import get_spark

    spark = get_spark()
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    assert exact_dedup(df, ["text"]).count() == len(set(texts))


# --- curation invariants (pure-python twins of the column exprs) ------------


@given(
    tokens=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=200),
    budget=st.integers(min_value=1, max_value=2048),
)
def test_pack_sequences_formula_invariants(tokens, budget):
    """Next-fit packing (floor((cum - t) / budget)) — the Python twin
    of operators.curation.pack_sequences' window expression: bins are
    monotone in document order, every doc gets exactly one bin, and a
    multi-doc bin never exceeds budget before its last doc."""
    import math

    cum = 0
    bins = []
    for t in tokens:
        bins.append(math.floor(cum / budget))
        cum += t
    assert len(bins) == len(tokens)
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    # per-bin totals minus their last doc stay under budget
    from collections import defaultdict

    per = defaultdict(list)
    for t, b in zip(tokens, bins):
        per[b].append(t)
    for docs in per.values():
        if len(docs) > 1:
            assert sum(docs[:-1]) < budget


_PII_SNIPPETS = st.sampled_from(
    [
        "bob.smith+tag@mail.example.org",
        "123-45-6789",
        "+1 (415) 555-0142",
        "987 654 3210",
        "x@y.co",
    ]
)


@given(
    parts=st.lists(
        st.one_of(st.text(max_size=40), _PII_SNIPPETS), min_size=0, max_size=8
    )
)
@settings(deadline=None)
def test_scrub_text_pii_idempotent_and_exhaustive(parts):
    """The free-text scrubber is deterministic, idempotent (replacement
    tokens can never combine with surrounding text into a new match —
    '<' is outside every pattern's character classes), and exhaustive:
    no email/SSN pattern survives in the output."""
    import re

    from hybrid_cdc_demo_spark.functions.masking import (
        TEXT_PII_PATTERNS,
        scrub_text_pii_value,
    )

    text = " ".join(parts)
    once = scrub_text_pii_value(text)
    assert once == scrub_text_pii_value(text)
    assert scrub_text_pii_value(once) == once
    email_pat, ssn_pat = TEXT_PII_PATTERNS[0][1], TEXT_PII_PATTERNS[1][1]
    phone_pat = TEXT_PII_PATTERNS[2][1]
    assert re.search(email_pat, once) is None
    assert re.search(ssn_pat, once) is None
    # phone too: replacements only remove matchable chars and insert
    # tokens whose chars are outside every pattern's classes, so any
    # surviving match would have been a match in the input
    assert re.search(phone_pat, once) is None


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_hash_split_assignment_is_pure_function_of_id(doc_id):
    """The split assignment depends only on sha256(id)'s first hex
    char (0..c train, d..e val, f test) — the Python twin of
    operators.curation.hash_split's CASE expression."""
    h = hashlib.sha256(str(doc_id).encode()).hexdigest()[0]
    split = "train" if h <= "c" else ("val" if h <= "e" else "test")
    assert split in {"train", "val", "test"}
    again = hashlib.sha256(str(doc_id).encode()).hexdigest()[0]
    assert h == again
    if h in "0123456789abc":
        assert split == "train"
    elif h in "de":
        assert split == "val"
    else:
        assert h == "f" and split == "test"
