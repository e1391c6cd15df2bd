"""Property tests (hypothesis) for the cross-engine integer devices
the continuation oracles lean on: the positive-only integer ceil, the
micro6 floor ratio, the numeric-literal micro parser, and the posting
gap encoding.  These pin the ALGEBRA, independent of any fixture."""

from __future__ import annotations

import math
import re

from hypothesis import given, strategies as st


@given(st.integers(min_value=0, max_value=10**12),
       st.sampled_from([(1, 2), (9, 10), (99, 100)]))
def test_positive_ceil_identity(n, qd):
    """(q*n + d - 1) // d == ceil(q*n/d) for non-negative n — the
    doclen_percentiles rank device (Python // floors like DuckDB //;
    Spark DIV agrees on non-negatives)."""
    q, d = qd
    assert (q * n + d - 1) // d == math.ceil(q * n / d)


@given(st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=1, max_value=10**9))
def test_micro6_floor_ratio_bounds(num, den):
    """floor(num*1e6/den) is exact integer algebra within int64 for
    num <= 1e9: never negative, <= 1e6 iff num <= den."""
    v = num * 1_000_000 // den
    assert v >= 0
    assert num * 1_000_000 <= 9_223_372_036_854_775_807
    if num <= den:
        assert v <= 1_000_000
    else:
        assert v >= 1_000_000


_NUM_RE = re.compile(r"([0-9][0-9,]*)(\.[0-9]+)?")


def _micro_ref(obj: str):
    """Python reference of the literal_profiles parse rule."""
    m = _NUM_RE.search(obj)
    if not m:
        return None
    ip = m.group(1).replace(",", "")
    fr = (m.group(2) or "").replace(".", "")
    return int(ip) * 1_000_000 + int((fr + "000000")[:6])


def test_literal_micro_parser_matches_reference(spark):
    """The Spark codegen parse in literal_profiles agrees with a
    direct Python implementation of the stated rule over 300
    deterministic noisy strings (digits, commas, dots, symbols) —
    ONE Spark job, one pred per string."""
    import random

    from ehr_relation_extraction_spark.operators.triples import (
        literal_profiles)

    rng = random.Random(42)
    alphabet = "0123456789.,$% abc"
    cases = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randint(0, 24)))
             for _ in range(300)]
    cases += ["$1,234.56", "7", "0.1234567", "", "..", ",,", "1,",
              ".5", "12.5% of 9"]
    tri = spark.createDataFrame(
        [(i, "u", "x", f"P{i}", c) for i, c in enumerate(cases)],
        "doc_id long, url string, subj string, pred string, obj string")
    rows = {int(r.pred[1:]): r for r in literal_profiles(tri).collect()}
    for i, c in enumerate(cases):
        ref = _micro_ref(c)
        r = rows[i]
        if ref is None:
            assert r.n_numeric == 0 and r.min_micro is None, (c, r)
        else:
            assert r.n_numeric == 1, (c, r)
            assert (r.min_micro == r.max_micro == r.sum_micro == ref), \
                (c, r, ref)


@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=2, max_size=30, unique=True))
def test_gap_encoding_roundtrip(ids):
    """The postings gap encoding (first gap from 0) is invertible by
    cumulative sum for any strictly increasing id list."""
    ids = sorted(ids)
    gaps = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
    acc, out = 0, []
    for g in gaps:
        acc += g
        out.append(acc)
    assert out == ids
    assert all(g >= 0 for g in gaps) and all(
        g > 0 for g in gaps[1:])
